"""Halo-exchange layout engine: shaped arrays padded to mesh-divisible
sizes, with the five stencil ops (grad, grad^T, BF gather, BF^T adjoint,
face interpolation) running under ``shard_map`` with explicit one-slab
``ppermute`` halo pulls.

Why this exists (measured, DESIGN.md section 8): on the discretization's
odd 2^k+1 grids GSPMD shards unevenly and lowers the pad+slice shift
patterns of :class:`Ops3D`/:class:`OpsFlat` to **full-axis all-gathers** —
~10 MB per step at 65x65x17 on a y=4,x=2 mesh, ~640 MB/step extrapolated to
the 513^2x65 target, ~20x the true halo requirement. Padding every spatial
axis to a mesh-divisible size makes the shards even, and the shifts become
exactly one boundary row/column exchanged with the neighbour shard.

Layout contract (mirrors the flat engine's ghost-slot discipline,
``ops/engine.py``):

- centered fields are (nt, *P) with P_a = k_a * ceil(n_a / k_a); entries at
  coord_a >= n_a are structural zeros;
- staggered face blocks are stored cell-shaped (nt, *P) with the ghost slot
  coord_a == n_a - 1 *and* the padding pinned to zero;
- the two producers of face arrays (grad, bfd_T) re-mask their outputs; bfd
  masks its whole cone block (the +scale_d constant must not leak into pad
  cells); every other solver operation is element-wise and preserves the
  zeros, so KKT norms / dot products over padded arrays are exact.

The phi-step stays the exact matmul-DCT solve (the decision of DESIGN.md
section 8): the DCT matrices are zero-extended to the padded sizes, which
keeps coefficients and outputs zero on the pads while XLA partitions the
matmuls as plain sharded contractions.

Reference parity: the operators compute the same quantities as
``mexBFd``/``mexBFdConj``/``oper_poisson3dim``/``initialize.m:35-39`` —
see :mod:`dotsocp_tpu.ops.cone` / :mod:`dotsocp_tpu.ops.grad` for the
per-op citations; this module only changes the execution layout.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P
try:  # jax >= 0.4.35 top-level export; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from .geometry import Geometry
from .staggered import Staggered
from .poisson import make_dct_poisson

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _axis_vec(length: int, real: int, ndim: int, axis: int, dtype):
    """Broadcastable 1-D mask: 1.0 where coord < real, else 0.0."""
    v = np.zeros(length, np.dtype(jnp.dtype(dtype).name))
    v[:real] = 1.0
    shape = [1] * ndim
    shape[axis] = length
    return jnp.asarray(v.reshape(shape))


class OpsHalo:
    """Shaped engine on mesh-divisible padded grids with shard_map halos."""

    layout = "halo"

    def __init__(self, geom: Geometry, dtype, mesh):
        if mesh is None:
            raise ValueError("layout='halo' requires a mesh")
        d = geom.ndim_space
        if d not in (1, 2):
            raise NotImplementedError("halo layout supports 1D/2D grids")
        self.geom = geom
        self.dtype = dtype
        self.mesh = mesh
        self.names = ("x",) if d == 1 else ("y", "x")
        for nm in self.names:
            if nm not in mesh.axis_names:
                raise ValueError(f"mesh lacks spatial axis {nm!r}")
        self.k = tuple(int(mesh.shape[nm]) for nm in self.names)
        self.P = tuple(-(-n // k) * k for n, k in zip(geom.space, self.k))
        self.d = d

    def _pin(self, x):
        """Pin the canonical y/x sharding on an op output. Without this,
        GSPMD's propagation is free to replicate the (unconstrained)
        intermediates of reduction-only consumers like the KKT battery —
        measured as ~19 MB of full-axis all-gathers per KKT call at
        65x65x17; with the pin the reductions stay partial-then-psum."""
        from jax.sharding import NamedSharding

        spec = P(*([None] * (x.ndim - self.d) + list(self.names)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    # masks are built lazily per (ndim) and cached: broadcastable 1-D
    # factors, so the multiply fuses and costs no extra HBM stream
    def _face_mask(self, a: int, ndim: int):
        ax = ndim - self.d + a
        return _axis_vec(self.P[a], self.geom.space[a] - 1, ndim, ax,
                         self.dtype)

    def _cell_mask(self, ndim: int):
        m = None
        for a in range(self.d):
            ax = ndim - self.d + a
            v = _axis_vec(self.P[a], self.geom.space[a], ndim, ax, self.dtype)
            m = v if m is None else m * v
        return m

    # -- halo shifts ---------------------------------------------------------
    def _shift(self, x, a: int, fwd: bool):
        """fwd: y[i] = x[i-1] along spatial axis a (prev-neighbour halo,
        zeros at the global start); else y[i] = x[i+1] (next-neighbour
        halo, zeros at the global end)."""
        ax = x.ndim - self.d + a
        k = self.k[a]
        if k == 1:
            pad = [(0, 0)] * x.ndim
            n = x.shape[ax]
            if fwd:
                pad[ax] = (1, 0)
                return lax.slice_in_dim(jnp.pad(x, pad), 0, n, axis=ax)
            pad[ax] = (0, 1)
            return lax.slice_in_dim(jnp.pad(x, pad), 1, n + 1, axis=ax)

        name = self.names[a]
        spec = P(*([None] * (x.ndim - self.d) + list(self.names)))

        def f(xl):
            nl = xl.shape[ax]
            if fwd:
                edge = lax.slice_in_dim(xl, nl - 1, nl, axis=ax)
                recv = lax.ppermute(
                    edge, name, [(i, i + 1) for i in range(k - 1)]
                )
                body = lax.slice_in_dim(xl, 0, nl - 1, axis=ax)
                return jnp.concatenate([recv, body], axis=ax)
            edge = lax.slice_in_dim(xl, 0, 1, axis=ax)
            recv = lax.ppermute(
                edge, name, [(i, i - 1) for i in range(1, k)]
            )
            body = lax.slice_in_dim(xl, 1, nl, axis=ax)
            return jnp.concatenate([body, recv], axis=ax)

        return shard_map(f, mesh=self.mesh, in_specs=(spec,),
                         out_specs=spec, check_rep=False)(x)

    # -- operators -------------------------------------------------------
    def grad(self, phi):
        """A phi (``initialize.m:35-39``); face outputs re-masked."""
        geom = self.geom
        q0 = self._pin((phi[1:] - phi[:-1]) / geom.ht)
        bs = tuple(
            self._pin(((self._shift(phi, a, fwd=False) - phi) / geom.hs(a))
                      * self._face_mask(a, phi.ndim))
            for a in range(self.d)
        )
        return Staggered(q0=q0, bs=bs)

    def grad_T(self, st: Staggered):
        """A^T; ghost-zero faces supply the adjoint boundary zeros."""
        geom = self.geom
        q0 = st.q0
        pad0 = [(0, 0)] * q0.ndim
        pad_lo, pad_hi = [list(pad0) for _ in range(2)]
        pad_lo[0] = (1, 0)
        pad_hi[0] = (0, 1)
        out = (jnp.pad(q0, pad_lo) - jnp.pad(q0, pad_hi)) / geom.ht
        for a in range(self.d):
            b = st.bs[a]
            out = out + (self._shift(b, a, fwd=True) - b) / geom.hs(a)
        return self._pin(out)

    def bfd(self, q: Staggered, scale_bf, scale_d):
        """z2 = scale_bf*(BF q) + scale_d*d (``mexBFd``); the whole block is
        cell-masked so the scale_d constant never leaks into pad cells —
        that keeps z/beta pads at exact zero through proj_soc(0) = 0."""
        geom = self.geom
        nt = geom.nt
        cols = [scale_d - scale_bf * q.q0]
        s = scale_bf * _INV_SQRT2
        for a in range(self.d):
            x_lo = self._shift(q.bs[a], a, fwd=True)
            x_hi = q.bs[a]
            for t_sel in (slice(0, nt - 1), slice(1, nt)):
                cols.append(s * x_lo[t_sel])
                cols.append(s * x_hi[t_sel])
        cols.append(scale_d + scale_bf * q.q0)
        z2 = jnp.stack(cols, axis=0)
        return self._pin(z2 * self._cell_mask(z2.ndim))

    def bfd_T(self, x, scale_bf) -> Staggered:
        """q2 = scale_bf * (BF)^T x (``mexBFdConj``), scatter-free."""
        q0 = self._pin(scale_bf * (x[-1] - x[0]))
        s = scale_bf * _INV_SQRT2
        bs = []
        col = 1
        for a in range(self.d):
            acc = None
            for t_lo in (True, False):
                for x_lo in (True, False):
                    xi = x[col]
                    col += 1
                    y = self._shift(xi, a, fwd=False) if x_lo else xi
                    tpad = [(0, 1)] if t_lo else [(1, 0)]
                    y = jnp.pad(y, tpad + [(0, 0)] * (y.ndim - 1))
                    acc = y if acc is None else acc + y
            bs.append(self._pin((s * acc) * self._face_mask(a, acc.ndim)))
        return Staggered(q0=q0, bs=tuple(bs))

    def oper_q_diag(self, D, E, weight: Optional[Staggered]) -> Staggered:
        """``oper_q.m`` diagonal on real slots; ghost/pad slots hold the
        interior value (harmless: their numerators are exact zeros)."""
        geom = self.geom
        dtype = self.dtype if weight is None else weight.dtype
        tmp = jnp.asarray((E / D) ** 2, dtype=dtype)
        q0 = jnp.full((geom.nt - 1,) + self.P, 2.0 * tmp, dtype=dtype)
        bs = []
        for a in range(self.d):
            b = jnp.full((geom.nt,) + self.P, 2.0 * tmp, dtype=dtype)
            b = b.at[0].set(tmp)
            b = b.at[-1].set(tmp)
            bs.append(b)
        base = Staggered(q0=q0, bs=tuple(bs))
        if weight is None:
            return base + Staggered(
                q0=jnp.ones_like(base.q0),
                bs=tuple(jnp.ones_like(b) for b in base.bs),
            )
        return base + weight * weight

    def make_poisson(self, D):
        inner = make_dct_poisson(self.geom, D=D, dtype=self.dtype)
        return _HaloPoisson(inner, self)

    def face_interp(self, x, a: int):
        """0.5 * (x[j] + x[j+1]) at face slot j; consumers multiply by a
        ghost-zero face array, which annihilates the ghost-slot value."""
        return self._pin(0.5 * (x + self._shift(x, a, fwd=False)))

    # -- layout conversions ------------------------------------------------
    def _pad_space(self, x, extra_short_axis: Optional[int] = None,
                   value: float = 0.0):
        """Pad trailing spatial axes n_a -> P_a (``extra_short_axis`` marks a
        face array whose own axis has n_a - 1 real entries)."""
        pad = [(0, 0)] * x.ndim
        for a in range(self.d):
            ax = x.ndim - self.d + a
            real = self.geom.space[a] - (1 if a == extra_short_axis else 0)
            pad[ax] = (0, self.P[a] - real)
        return jnp.pad(x, pad, constant_values=value)

    def _slice_space(self, x, extra_short_axis: Optional[int] = None):
        for a in range(self.d):
            ax = x.ndim - self.d + a
            real = self.geom.space[a] - (1 if a == extra_short_axis else 0)
            x = lax.slice_in_dim(x, 0, real, axis=ax)
        return x

    def stag_to_internal(self, st: Staggered) -> Staggered:
        return Staggered(
            q0=self._pad_space(st.q0),
            bs=tuple(self._pad_space(st.bs[a], extra_short_axis=a)
                     for a in range(self.d)),
        )

    def stag_from_internal(self, st: Staggered) -> Staggered:
        return Staggered(
            q0=self._slice_space(st.q0),
            bs=tuple(self._slice_space(st.bs[a], extra_short_axis=a)
                     for a in range(self.d)),
        )

    def weight_to_internal(self, w: Staggered) -> Staggered:
        """Ghost/pad slots filled with 1.0 (they only multiply zeros)."""
        return Staggered(
            q0=self._pad_space(w.q0, value=1.0),
            bs=tuple(self._pad_space(w.bs[a], extra_short_axis=a, value=1.0)
                     for a in range(self.d)),
        )

    def z_to_internal(self, z):
        return self._pad_space(z)

    def z_from_internal(self, z):
        return self._slice_space(z)

    def phi_to_internal(self, phi):
        return self._pad_space(phi)

    def phi_from_internal(self, phi):
        return self._slice_space(phi)


class _HaloPoisson:
    """Exact DCT Poisson solve on the padded grid: the per-axis DCT
    matrices are zero-extended to (P_a, P_a), so spectral coefficients and
    outputs stay zero on the pads while the real block is bit-identical to
    the unpadded transform. inv_kernel pads hold 1.0 (they multiply zero
    coefficients)."""

    def __init__(self, inner, ops: OpsHalo):
        geom = ops.geom
        mats = [inner.mats[0]]  # t axis: unpadded
        for a in range(ops.d):
            n, Pn = geom.space[a], ops.P[a]
            M = np.zeros((Pn, Pn), np.dtype(jnp.dtype(ops.dtype).name))
            M[:n, :n] = np.asarray(inner.mats[1 + a])
            mats.append(jnp.asarray(M))
        self.mats = tuple(mats)
        self.inv_kernel = ops._pad_space(inner.inv_kernel, value=1.0)
        self.geom = geom

    def solve(self, rhs, scale=None):
        from .poisson import _apply_axis

        y = rhs
        for ax, C in enumerate(self.mats):
            y = _apply_axis(C, y, ax)
        inv_k = self.inv_kernel if scale is None else self.inv_kernel * scale
        y = y * inv_k
        for ax, C in enumerate(self.mats):
            y = _apply_axis(C.T, y, ax)
        return y
