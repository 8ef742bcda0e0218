"""Pallas TPU kernels for the hot bandwidth-bound ops.

Two kernels (with jnp fallbacks chosen automatically by size/backend):

- ``sgs_sweep``: one symmetric red-black sweep executed entirely in VMEM —
  phi, rhs, inv_diag are loaded once, the three half-sweeps run on-chip,
  phi is written once. The XLA path reads/writes phi per half-sweep (3x the
  HBM traffic). The space-time field at the reference sizes (129^2 x 33 f32
  ~ 2.2 MB) fits VMEM whole; larger grids fall back to the jnp path until
  the tiled/halo variant lands.
- ``cone_project_diff``: z = Pi_K(z2 - beta) fused over the flat cell axis,
  removing the lane padding the (..., ny, nx=2^k+1) layout pays in XLA.

Both are validated against the jnp ops in tests/test_pallas.py.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

try:  # pallas requires a TPU-capable lowering; import lazily-friendly
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

from .geometry import Geometry
from .sgs import RedBlackSGS

_VMEM_BUDGET = 4 * 1024 * 1024  # per-array cap for the whole-field kernel


def _parity_mask(shape):
    acc = jnp.zeros(shape, jnp.int32)
    for ax in range(len(shape)):
        acc = acc + jax.lax.broadcasted_iota(jnp.int32, shape, ax)
    return (acc % 2) == 0  # color A (origin class)


def _neighbor_sum_val(p, h2inv):
    """Neighbour sum on a loaded value via shift-and-mask (no pads)."""
    out = jnp.zeros_like(p)
    for ax, w in enumerate(h2inv):
        n = p.shape[ax]
        idx = jax.lax.broadcasted_iota(jnp.int32, p.shape, ax)
        # pltpu.roll requires non-negative shifts: -1 == n - 1 (circular)
        left = jnp.where(idx > 0, pltpu.roll(p, 1, axis=ax), 0.0)
        right = jnp.where(idx < n - 1, pltpu.roll(p, n - 1, axis=ax), 0.0)
        out = out + w * (left + right)
    return out


def make_sgs_sweep_pallas(geom: Geometry, D: float, dtype=jnp.float32):
    """Whole-field VMEM sweep kernel (B, A, B half-sweeps, matching
    ops/sgs.py). Returns None when the field exceeds the VMEM budget."""
    if not HAVE_PALLAS:
        return None
    nbytes = geom.n_centered * jnp.dtype(dtype).itemsize
    if nbytes > _VMEM_BUDGET:
        return None
    h2inv = tuple(float((n - 1) ** 2) for n in (geom.nt,) + geom.space)
    scale = float(D) ** 2

    def kernel(phi_ref, rhs_ref, invd_ref, out_ref):
        p = phi_ref[:]
        r = rhs_ref[:]
        invd = invd_ref[:]
        mask_a = _parity_mask(p.shape)
        for color_a in (False, True, False):
            new = (r + scale * _neighbor_sum_val(p, h2inv)) * invd
            m = mask_a if color_a else ~mask_a
            p = jnp.where(m, new, p)
        out_ref[:] = p

    @jax.jit
    def sweep(phi, rhs, inv_diag):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(phi, rhs, inv_diag)

    return sweep


class PallasSGS(RedBlackSGS):
    """RedBlackSGS whose sweep runs in a single VMEM-resident kernel."""

    # NamedTuple subclassing: carry the pallas callable separately
    _pallas_sweep = None

    def sweep(self, phi, rhs, its: int = 1, d2=None):
        fn = type(self)._pallas_sweep
        if fn is None or d2 is not None:
            # the pallas kernel bakes D^2; traced-d2 callers get the jnp path
            return super().sweep(phi, rhs, its, d2=d2)
        for _ in range(its):
            phi = fn(phi, rhs, self.inv_diag)
        return phi


def make_sgs_pallas(geom: Geometry, D: float, eps: float = 0.0,
                    dtype=jnp.float32):
    """Drop-in for ops.sgs.make_sgs with the Pallas sweep when it fits."""
    from .sgs import make_sgs

    base = make_sgs(geom, D, eps, dtype)
    fn = make_sgs_sweep_pallas(geom, D, dtype)
    if fn is None:
        return base

    cls = type("PallasSGSBound", (PallasSGS,), {"_pallas_sweep": staticmethod(fn)})
    return cls(*base)


# ---------------------------------------------------------------------------
# fused cone projection
# ---------------------------------------------------------------------------

def cone_project_diff_pallas(z2: jax.Array, beta: jax.Array) -> jax.Array:
    """z = Pi_K(z2 - beta), computed over a flat (C, M) view so the cell
    axis tiles lanes without the odd-grid padding. Shape-preserving."""
    if not HAVE_PALLAS:
        raise RuntimeError("pallas unavailable")
    C = z2.shape[0]
    shape = z2.shape
    M = z2.size // C
    TILE = 2048
    grid = (M + TILE - 1) // TILE
    pad = grid * TILE - M
    zf = z2.reshape(C, M)
    bf = beta.reshape(C, M)
    if pad:
        zf = jnp.pad(zf, ((0, 0), (0, pad)))
        bf = jnp.pad(bf, ((0, 0), (0, pad)))

    def kernel(z2_ref, b_ref, out_ref):
        v = z2_ref[:] - b_ref[:]
        z0 = v[0:1]
        w = v[1:]
        nrm = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
        safe = jnp.where(nrm > 0, nrm, 1.0)
        coef = jnp.clip(0.5 * (1.0 + z0 / safe), 0.0, 1.0)
        head = jnp.maximum(z0, coef * nrm)
        out_ref[:] = jnp.concatenate([head, coef * w], axis=0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(zf.shape, zf.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((C, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(zf, bf)
    if pad:
        out = out[:, :M]
    return out.reshape(shape)
