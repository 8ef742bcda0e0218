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
import numpy as np

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
        # new phi writes in place into the dead input phi buffer (single
        # whole-field block; un-aliased pallas outputs pay a hidden copy
        # pass on this stack — see make_fused_flat_step)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases=(
                {} if jax.default_backend() != "tpu" else {0: 0}),
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


def make_sgs_sweep_pallas_tiled(geom: Geometry, D: float, dtype=jnp.float32,
                                tile_rows: int = 4,
                                interpret: bool | None = None):
    """Row-tiled symmetric red-black sweep for 2D fields too large for the
    whole-field VMEM kernel (513^2 x 65 f32 is a 68 MB field). The grid
    tiles the y axis; each tile carries a ``tile_rows``-row halo view on
    each side (the same HBM array passed three times with offset index
    maps — the 3 chained half-sweeps have dependence depth 3 rows). Halo
    regions are recomputed, domain edges masked by global row index.
    t and x stay whole per tile (the t axis is small; x tiles lanes)."""
    if not HAVE_PALLAS:
        return None
    if geom.ndim_space != 2:
        return None
    nt = geom.nt
    ny, nx = geom.space
    R = tile_rows
    if ny <= 3 * R:
        return None  # whole-field kernel territory
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid_n = (ny + R - 1) // R
    h2inv = tuple(float((n - 1) ** 2) for n in (geom.nt, ny, nx))
    scale = float(D) ** 2
    EROWS = 3 * R  # lo-halo R + body R + hi-halo R

    # Tiles run over the y axis moved to the FRONT: block (R, nt, nx) keeps
    # the last two block dims equal to the full array dims (the TPU
    # lowering's alignment rule), so any R works. The (t,y,x)->(y,t,x)
    # transposes around the sweep are two cheap relayout passes.
    def _nbr(p, gr):
        """Neighbour sum over (rows, t, x); Neumann-edge masking on the
        global row index ``gr``; t/x edges handled by zero pads."""
        out = jnp.zeros_like(p)
        wy = h2inv[1]
        up = jnp.pad(p[:-1], ((1, 0), (0, 0), (0, 0)))
        dn = jnp.pad(p[1:], ((0, 1), (0, 0), (0, 0)))
        out = out + wy * jnp.where(gr > 0, up, 0.0)
        out = out + wy * jnp.where(gr < ny - 1, dn, 0.0)
        wt = h2inv[0]
        out = out + wt * jnp.pad(p[:, :-1], ((0, 0), (1, 0), (0, 0)))
        out = out + wt * jnp.pad(p[:, 1:], ((0, 0), (0, 1), (0, 0)))
        wx = h2inv[2]
        out = out + wx * jnp.pad(p[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
        out = out + wx * jnp.pad(p[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
        return out

    def _inv_diag(gr, shape, dtype):
        """1/diag computed in-kernel from coordinates (saves one HBM input
        array: the sweep is bandwidth-bound, the divide is free VPU work).
        diag = D^2 * sum_axis w_a * deg_a, deg = 2 interior / 1 at edges
        (mirrors ops/sgs.make_sgs)."""
        it = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        ix = jax.lax.broadcasted_iota(jnp.int32, shape, 2)

        def deg(idx, n):
            return jnp.where((idx == 0) | (idx == n - 1), 1.0, 2.0)

        diag = (h2inv[0] * deg(it, nt) + h2inv[1] * deg(gr, ny)
                + h2inv[2] * deg(ix, nx))
        return (1.0 / (scale * diag)).astype(dtype)

    def kernel(phi_lo, phi_c, phi_hi, rhs_lo, rhs_c, rhs_hi, out_ref):
        i = pl.program_id(0)
        row0 = i * R - RH  # global row of the extended tile's first row
        p = jnp.concatenate([phi_lo[:], phi_c[:], phi_hi[:]], axis=0)
        r = jnp.concatenate([rhs_lo[:], rhs_c[:], rhs_hi[:]], axis=0)
        gr = row0 + jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        invd = _inv_diag(gr, p.shape, p.dtype)
        # parity over (y, t, x)
        acc = (gr + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
               + jax.lax.broadcasted_iota(jnp.int32, p.shape, 2))
        mask_a = (acc % 2) == 0
        valid = (gr >= 0) & (gr < ny)
        for color_a in (False, True, False):
            new = (r + scale * _nbr(p, gr)) * invd
            m = mask_a if color_a else ~mask_a
            p = jnp.where(m & valid, new, p)
        out_ref[:] = p[RH:RH + R]

    RH = R  # halo rows per side (>= 3, the half-sweep dependence depth)

    def view(off):
        # same array three times: lo (block i-1), body (i), hi (block i+1);
        # edge tiles clamp to a valid block — their contribution is masked
        # by the global-row validity test in the kernel
        def imap(i):
            j = jnp.clip(i + off, 0, grid_n - 1)
            return (j, 0, 0)

        return pl.BlockSpec((R, nt, nx), imap, memory_space=pltpu.VMEM)

    in_specs = [view(-1), view(0), view(1)] * 2
    out_spec = pl.BlockSpec((R, nt, nx), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def sweep(phi, rhs, inv_diag=None):
        # inv_diag accepted for interface parity; recomputed in-kernel
        pad = grid_n * R - ny

        def prep(x):
            x = jnp.transpose(x, (1, 0, 2))  # (ny, nt, nx)
            if pad:
                x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
            return x

        phi_p, rhs_p = prep(phi), prep(rhs)
        out = pl.pallas_call(
            kernel,
            grid=(grid_n,),
            out_shape=jax.ShapeDtypeStruct(phi_p.shape, phi.dtype),
            in_specs=in_specs,
            out_specs=out_spec,
            interpret=interpret,
        )(phi_p, phi_p, phi_p, rhs_p, rhs_p, rhs_p)
        return jnp.transpose(out[:ny], (1, 0, 2))

    return sweep


def make_sgs_pallas(geom: Geometry, D: float, eps: float = 0.0,
                    dtype=jnp.float32):
    """Drop-in for ops.sgs.make_sgs with the Pallas sweep: whole-field VMEM
    kernel when it fits, row-tiled halo kernel above the budget."""
    from .sgs import make_sgs

    base = make_sgs(geom, D, eps, dtype)
    fn = make_sgs_sweep_pallas(geom, D, dtype)
    if fn is None and geom.ndim_space == 2:
        tiled = make_sgs_sweep_pallas_tiled(geom, D, dtype)
        if tiled is not None:
            fn = tiled
    if fn is None:
        return base

    cls = type("PallasSGSBound", (PallasSGS,), {"_pallas_sweep": staticmethod(fn)})
    return cls(*base)


# ---------------------------------------------------------------------------
# fused flat-layout solver step (the SURVEY section-7 "Pallas fusion pass")
# ---------------------------------------------------------------------------
#
# The inPALM iteration after the phi DCT-solve is three bandwidth-bound
# passes over the big cone arrays: z-step (BF gather -> Lorentz projection),
# q-step (BF^T adjoint -> diagonal solve), multiplier update (BF gather ->
# dual ascent). At the 513^2x65 scale XLA compiles them to many kernels with
# every intermediate round-tripping HBM (measured 25 ms vs a ~7 ms logical
# traffic bound). Here each pass is one Pallas kernel over lane-packed flat
# blocks: per (time-full, TS-lane) tile all ten cone columns are built,
# projected and consumed in VMEM. Spatial +-1/+-stride shifts are provided
# as XLA-produced shifted copies (cheap fused passes), which keeps every
# kernel purely element-wise per tile — no halo DMA.
#
# Scope: flat layout, float32, unweighted, 1D/2D (the production bench
# path). Weighted/f64/shaped fall back to the jnp ops.

_INV_SQRT2_F = 1.0 / math.sqrt(2.0)


def _flat_sfwd(x, k, S):
    """y[..., i] = x[..., i-k] with zero fill (ops/engine.py _sfwd)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
    return jnp.pad(x, pad)[..., :S]


def _flat_sbwd(x, k, S):
    pad = [(0, 0)] * (x.ndim - 1) + [(0, k)]
    return jnp.pad(x, pad)[..., k:]


def make_pallas_shift(R, S, k, forward, dtype=jnp.float32,
                      interpret=False, ts=2048):
    """Lane-shift of a flat (R, S) field as one Pallas pass.

    Semantically identical to ``_flat_sfwd`` / ``_flat_sbwd`` (zero fill),
    but XLA lowers those pad+slice copies through an unaligned lane
    rotation that runs ~5x over the traffic bound (measured 513^2x65 v5e:
    2.0 ms for two 68 MB shifted node copies; see
    scripts/pallas_compute_vs_traffic_probe.py). Here
    each output block assembles its window from TWO input blocks of the
    same array (neighbor-block trick: the window offset TS-k / k is
    static), so the rotation happens in VMEM at streaming bandwidth.

    Returns ``shift(x, plane=None)``: x is (R, S), or a (C, R, S) cone
    array with ``plane`` selecting the column — the plane is then read
    directly out of the cone array by the block index map (no 67 MB plane
    materialization). Requires k <= TS; callers fall back to the jnp
    path for larger strides (3D coarse axes).

    Since the round-4 in-kernel shift assembly (``_asm``/``_nbr_specs`` in
    ``make_fused_flat_step``) the production step no longer materializes
    shifted copies at all; this standalone kernel is kept as the measured
    exemplar of the neighbor-block trick for tests and probe scripts
    (tests/test_pallas.py, scripts/pallas_*_probe.py)."""
    TS = min(ts, ((S + 127) // 128) * 128)
    if k > TS:
        return None
    nb = (S + TS - 1) // TS
    off = TS - k if forward else k

    def kernel(a_ref, b_ref, o_ref):
        cat = jnp.concatenate([a_ref[0], b_ref[0]], axis=-1)
        win = jax.lax.slice_in_dim(cat, off, off + TS, axis=-1)
        i = pl.program_id(0)
        gl = i * TS + jax.lax.broadcasted_iota(jnp.int32, (R, TS), 1)
        if forward:
            win = jnp.where(gl < k, jnp.zeros((), dtype), win)
        else:
            win = jnp.where(gl >= S - k, jnp.zeros((), dtype), win)
        o_ref[0] = win

    def shift(x, plane=None):
        if x.ndim == 2:
            xv = x.reshape(1, R, x.shape[-1])
            c = 0
        else:
            xv = x
            c = int(plane)
        if forward:
            a_map = lambda i: (c, 0, jnp.maximum(i - 1, 0))  # noqa: E731
            b_map = lambda i: (c, 0, i)                      # noqa: E731
        else:
            a_map = lambda i: (c, 0, i)                      # noqa: E731
            b_map = lambda i: (c, 0, jnp.minimum(i + 1, nb - 1))  # noqa: E731
        blk = (1, R, TS)
        out = pl.pallas_call(
            kernel,
            grid=(nb,),
            out_shape=jax.ShapeDtypeStruct((1, R, S), dtype),
            in_specs=[pl.BlockSpec(blk, a_map, memory_space=pltpu.VMEM),
                      pl.BlockSpec(blk, b_map, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(blk, lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(xv, xv)
        return out.reshape(R, S)

    return shift


def _specs(nt, C, TS, n_bspec, d):
    """Common BlockSpec builders for (nt,S)/(nt-1,S)/(C,nt-1,S) arrays."""
    node = pl.BlockSpec((nt, TS), lambda i: (0, i), memory_space=pltpu.VMEM)
    cell = pl.BlockSpec((nt - 1, TS), lambda i: (0, i), memory_space=pltpu.VMEM)
    cone = pl.BlockSpec((C, nt - 1, TS), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM)
    mask = pl.BlockSpec((1, TS), lambda i: (0, i), memory_space=pltpu.VMEM)
    return node, cell, cone, scal, mask


def make_fused_flat_step(geom: Geometry, strides, masks, tau: float,
                         dtype=jnp.float32, ts: int = 512,
                         interpret: bool | None = None, weight=None):
    """Build the three fused kernels (z-step, q-step+alpha, beta-step) for
    the flat layout. Returns a dict of callables operating on flat arrays:

      z  = z_step(q0, bs, beta, sbf, sd)
      q', a' = q_step(phi, z, beta, q0a(alpha), absa, diag, D, sbf, tau)
      b' = beta_step(beta, z, q0', bs', sbf, sd, tau)

    ``strides``/``masks`` come from the OpsFlat engine; scalars are traced.
    Mirrors ops/engine.py OpsFlat.{bfd, bfd_T, grad} and ops/cone.proj_soc
    exactly (same operation order, float32).

    ``weight`` (internal flat Staggered, ghost slots 1.0) switches the
    q-step to the weighted formulas ``solver_wsocp_inPALM.m:198-222``:
    q = (w*(A phi + alpha) + BF^T(z+beta)) / diag, alpha += tau*(A phi - w*q).
    The weight only enters kernel B — the z/beta kernels act on q directly."""
    if not HAVE_PALLAS:
        return None
    d = geom.ndim_space
    if d not in (1, 2, 3):
        return None
    weighted = weight is not None
    nt = geom.nt
    C = 2 + 4 * d
    S = int(np.prod(geom.space))
    # VMEM budget (~16 MB/core): the q-kernel holds ~2 cone blocks
    # (C, nt-1, TS) plus ~10 cell/node blocks, double-buffered across the
    # grid. Cone-block cap ~1.4 MB: nt<=65 runs TS=512 (the measured-best
    # 513^2x65 configuration — round-4 sweeps showed bigger tiles OOM the
    # weighted q-kernel at nt=129 and run no faster at nt=65 once shifts
    # are assembled in-kernel), nt=129 drops to TS=256.
    # DOTSOCP_PALLAS_TS overrides for sweeps.
    import os as _os

    ts = int(_os.environ.get("DOTSOCP_PALLAS_TS", ts))
    ts_cap = max(128, (1_400_000 // (4 * C * (nt - 1))) // 128 * 128)
    TS = min(ts, ts_cap, ((S + 127) // 128) * 128)
    # Packed-halo mode (round 5): when every spatial stride fits in one
    # tile, the backward shifts read a single +1-block HALO stream per
    # source array instead of per-axis neighbor/plane streams (qx: 9 -> 2
    # shift streams; q: 15 -> 3). Measured NEUTRAL on wall time at the
    # sizes probed (stream_count_probe's synthetic per-stream cost does
    # not transfer — its streams shared one buffer); kept for the smaller
    # operand lists. Growing TS to cover a just-too-big stride (513 ->
    # 640) was tried and REJECTED: the segment is a wash (ts640_probe)
    # and the non-CA q-kernel's 4 cone blocks then blow scoped VMEM by
    # 1.27 MB at 513^2x65.
    max_stride = max(int(k) for k in strides)
    PACKED = (max_stride <= TS
              and _os.environ.get("DOTSOCP_PALLAS_PACKED", "1") != "0")
    grid = ((S + TS - 1) // TS,)
    # The mosaic scoped-vmem default (16 MB) is a compiler knob, not the
    # hardware ceiling; larger tiles (bigger DMA bursts) need more
    # double-buffered block space. DOTSOCP_PALLAS_VMEM overrides (bytes).
    _vmem_limit = int(_os.environ.get("DOTSOCP_PALLAS_VMEM", 0)) or None
    _cparams = (pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit)
                if _vmem_limit else None)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    node, cell, cone, scal, mask_spec = _specs(nt, C, TS, None, d)
    # divisions below mirror the jnp ops' operation order exactly so the
    # pallas path stays numerically identical per op (f32 parity tests)
    hs = [float(geom.hs(a)) for a in range(d)]
    ht = float(geom.ht)

    # ---- in-kernel shift assembly (round 4): rather than materializing
    # shifted copies (XLA pad+slice pays an unaligned lane rotation ~5x
    # over the traffic bound, and a standalone pallas shift pays the
    # un-aliased-output copy pass), the consuming kernel receives the
    # SOURCE array again under neighbor-block index maps and assembles the
    # shifted window in VMEM (window math as in make_pallas_shift). Cost:
    # re-reading ceil(k/TS) neighbor blocks of the source; the shifted
    # arrays' HBM write+read+copy disappears entirely. In-place output
    # aliases stay safe: backward shifts read blocks AHEAD of the write
    # cursor, forward-shift sources (bns in the beta/CA kernels) are never
    # aliased as outputs.
    def _nblk(k, TSv):
        return -(-int(k) // TSv)

    def _nbr_specs(TSv, nbv, R, k, forward, plane=None):
        """Neighbor BlockSpecs for the same source array (farthest block
        first for forward shifts, nearest first for backward)."""
        n = _nblk(k, TSv)
        blk = (R, TSv) if plane is None else (1, R, TSv)
        specs = []
        js = range(n, 0, -1) if forward else range(1, n + 1)
        for j in js:
            if forward:
                def mp(i, j=j, plane=plane):
                    b = jnp.maximum(i - j, 0)
                    return (0, b) if plane is None else (plane, 0, b)
            else:
                def mp(i, j=j, plane=plane, nbv=nbv):
                    b = jnp.minimum(i + j, nbv - 1)
                    return (0, b) if plane is None else (plane, 0, b)
            specs.append(pl.BlockSpec(blk, mp, memory_space=pltpu.VMEM))
        return specs

    def _ld(v):
        """Normalize a ref OR a pre-loaded value: [:] loads a ref and is
        the identity on an array (ref tracers pass isinstance(jax.Array),
        so only slicing distinguishes them portably); cone-plane blocks
        (1, R, TS) drop their leading axis."""
        v = v[:]
        return v[0] if v.ndim == 3 else v

    def _asm(cur, nbr_vals, k, forward, TSv):
        """Shifted window of the source whose block-i slab is ``cur``:
        forward == _flat_sfwd semantics, backward == _flat_sbwd. Clamped
        neighbor blocks at the edges are masked by the global-lane
        zero-fill, so the result is bit-equal to the pad+slice shifts.
        ``nbr_vals``: loaded neighbor slabs (nearest first for backward,
        farthest first for forward) — refs are accepted too."""
        k = int(k)
        gi = pl.program_id(0)
        gl = gi * TSv + jax.lax.broadcasted_iota(jnp.int32, cur.shape,
                                                 cur.ndim - 1)
        zero = jnp.zeros((), cur.dtype)
        vals = [_ld(v) for v in nbr_vals]
        n = len(vals)
        if forward:
            cat = jnp.concatenate(vals + [cur], axis=-1)
            off = n * TSv - k
            win = jax.lax.slice_in_dim(cat, off, off + TSv, axis=-1)
            return jnp.where(gl < k, zero, win)
        cat = jnp.concatenate([cur] + vals, axis=-1)
        win = jax.lax.slice_in_dim(cat, k, k + TSv, axis=-1)
        return jnp.where(gl >= S - k, zero, win)

    def _fwd_nbr_args(srcs, TSv, nbv, R):
        """(operands, specs) for forward-shift neighbors of per-axis node
        sources ``srcs`` (the source array repeated per neighbor block)."""
        ops_, specs_ = [], []
        for a in range(d):
            sp = _nbr_specs(TSv, nbv, R, strides[a], True)
            specs_ += sp
            ops_ += [srcs[a]] * len(sp)
        return ops_, specs_

    def _halo_spec(kind):
        """One +1-block halo stream serving EVERY backward shift of a
        source array (valid when max stride <= TS): the same array again
        at block index min(i+1, nb-1); clamped edge blocks are masked by
        _asm's global-lane zero-fill. kind: 'node' (nt, S) or 'cone'
        (C, nt-1, S)."""
        nbv = grid[0]
        if kind == "node":
            return pl.BlockSpec((nt, TS),
                                lambda i: (0, jnp.minimum(i + 1, nbv - 1)),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((C, nt - 1, TS),
                            lambda i: (0, 0, jnp.minimum(i + 1, nbv - 1)),
                            memory_space=pltpu.VMEM)

    NSH = [_nblk(strides[a], TS) for a in range(d)]  # neighbor count/axis

    # ---------------- kernel A: z = proj_soc(bfd(q) - beta) --------------
    def z_kernel(sc_ref, q0_ref, *rest):
        b_refs = rest[:d]
        i = d
        nb_refs = []
        for a in range(d):
            nb_refs.append(rest[i:i + NSH[a]]); i += NSH[a]
        beta_ref = rest[i]
        z_ref = rest[i + 1]
        sbf = sc_ref[0, 0]
        sd = sc_ref[0, 1]
        s = sbf * _INV_SQRT2_F
        q0 = q0_ref[:]
        cols = [(sd - sbf * q0) - beta_ref[0]]
        ci = 1
        for a in range(d):
            b = b_refs[a][:]
            f = _asm(b, nb_refs[a], strides[a], True, TS)
            for sl in (slice(0, nt - 1), slice(1, nt)):
                cols.append(s * f[sl] - beta_ref[ci]); ci += 1
                cols.append(s * b[sl] - beta_ref[ci]); ci += 1
        cols.append((sd + sbf * q0) - beta_ref[C - 1])
        z0 = cols[0]
        nrm2 = cols[1] * cols[1]
        for c in cols[2:]:
            nrm2 = nrm2 + c * c
        nrm = jnp.sqrt(nrm2)
        safe = jnp.where(nrm > 0, nrm, 1.0)
        coef = jnp.clip(0.5 * (1.0 + z0 / safe), 0.0, 1.0)
        head = jnp.maximum(z0, coef * nrm)
        # per-column stores: jnp.stack materializes a cone-sized scratch
        # buffer (VMEM pressure + spills); column writes stream instead
        z_ref[0] = head
        for c in range(1, C):
            z_ref[c] = coef * cols[c]

    def z_step(q0, bs, beta, sbf, sd):
        sc = jnp.zeros((1, 8), jnp.float32)
        sc = sc.at[0, 0].set(sbf).at[0, 1].set(sd)
        nops, nspecs = _fwd_nbr_args(bs, TS, grid[0], nt)
        return pl.pallas_call(
            z_kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((C, nt - 1, S), dtype),
            in_specs=[scal, cell] + [node] * d + nspecs + [cone],
            out_specs=cone,
            interpret=interpret,
            compiler_params=_cparams,
        )(sc, q0, *bs, *nops, beta)

    # ------------- kernel B: q-step + alpha multiplier -------------------
    # x = z + beta; q2 = bfd_T(x); tmp = D*grad(phi);
    # q' = (tmp + alpha + q2) * diag; alpha' = alpha + tau*(tmp - q')
    # Backward shifts are assembled in-kernel: phi from its own neighbor
    # blocks; the shifted (z+beta) planes as shift(z[c])+shift(beta[c])
    # (shift is a relocation, so the sum of shifted planes is bit-equal to
    # the shifted sum).
    def q_kernel(sc_ref, phi_ref, *rest):
        i = 0
        if PACKED:
            # single +1-block halo streams: phi / z / beta
            phi_halo = rest[0]
            z_ref, beta_ref = rest[1], rest[2]
            z_halo, beta_halo = rest[3], rest[4]
            i = 5
            pnb = [[phi_halo]] * d
            zbnb = [[[z_halo[c0]], [beta_halo[c0]],
                     [z_halo[c0 + 2]], [beta_halo[c0 + 2]]]
                    for c0 in (1 + 4 * a for a in range(d))]
        else:
            pnb = []
            for a in range(d):
                pnb.append(rest[i:i + NSH[a]]); i += NSH[a]
            z_ref = rest[i]; i += 1
            beta_ref = rest[i]; i += 1
            zbnb = []
            for a in range(d):
                row = []
                for _ in range(4):  # z_lo, beta_lo, z_hi, beta_hi
                    row.append(rest[i:i + NSH[a]]); i += NSH[a]
                zbnb.append(row)
        a0_ref = rest[i]; i += 1
        ab_refs = rest[i:i + d]; i += d
        dg0_ref = rest[i]; i += 1
        dgb_refs = rest[i:i + d]; i += d
        mask_refs = rest[i:i + d]; i += d
        if weighted:
            w0_ref = rest[i]; i += 1
            wb_refs = rest[i:i + d]; i += d
        out_q0, out_a0 = rest[i], rest[i + 1]
        out_b = rest[i + 2:i + 2 + d]
        out_ab = rest[i + 2 + d:i + 2 + 2 * d]

        D = sc_ref[0, 0]
        sbf = sc_ref[0, 1]
        tau_v = sc_ref[0, 2]
        s = sbf * _INV_SQRT2_F
        phi = phi_ref[:]

        def xcol(c):
            return z_ref[c] + beta_ref[c]

        # q0 block: weighted q = (w*(tmp+alpha) + q2)/diag, alpha += tau*(tmp - w*q)
        tmp_q0 = D * ((phi[1:] - phi[:-1]) / ht)
        q2_q0 = sbf * (xcol(C - 1) - xcol(0))
        if weighted:
            w0 = w0_ref[:]
            q0n = (w0 * (tmp_q0 + a0_ref[:]) + q2_q0) * dg0_ref[:]
            out_a0[:] = a0_ref[:] + tau_v * (tmp_q0 - w0 * q0n)
        else:
            q0n = (tmp_q0 + a0_ref[:] + q2_q0) * dg0_ref[:]
            out_a0[:] = a0_ref[:] + tau_v * (tmp_q0 - q0n)
        out_q0[:] = q0n

        zpad = jnp.zeros((1, phi.shape[-1]), phi.dtype)
        for a in range(d):
            k = strides[a]
            m = mask_refs[a][:]  # (1, TS)
            phis_a = _asm(phi, pnb[a], k, False, TS)
            tmp_b = D * (((phis_a - phi) / hs[a]) * m)
            c0 = 1 + 4 * a
            zlo, blo, zhi, bhi = zbnb[a]
            lo_shift = (_asm(z_ref[c0], zlo, k, False, TS)
                        + _asm(beta_ref[c0], blo, k, False, TS))
            hi_shift = (_asm(z_ref[c0 + 2], zhi, k, False, TS)
                        + _asm(beta_ref[c0 + 2], bhi, k, False, TS))
            # cols: [t_lo&x_lo(shifted), t_lo&x_hi, t_hi&x_lo(shifted), t_hi&x_hi]
            lo_sum = lo_shift + xcol(c0 + 1)
            hi_sum = hi_shift + xcol(c0 + 3)
            acc = (jnp.concatenate([lo_sum, zpad], axis=0)
                   + jnp.concatenate([zpad, hi_sum], axis=0))
            q2_b = (s * acc) * m
            if weighted:
                wb = wb_refs[a][:]
                bn = (wb * (tmp_b + ab_refs[a][:]) + q2_b) * dgb_refs[a][:]
                out_b[a][:] = bn
                out_ab[a][:] = ab_refs[a][:] + tau_v * (tmp_b - wb * bn)
            else:
                bn = (tmp_b + ab_refs[a][:] + q2_b) * dgb_refs[a][:]
                out_b[a][:] = bn
                out_ab[a][:] = ab_refs[a][:] + tau_v * (tmp_b - bn)

    def _bwd_plane_nbrs(arrs_with_planes, TSv, nbv, R):
        """(operands, specs) for backward-shift neighbors of cone planes:
        arrs_with_planes = [(array, plane_index), ...] in operand order."""
        ops_, specs_ = [], []
        for arr, c0, k in arrs_with_planes:
            sp = _nbr_specs(TSv, nbv, R, k, False, plane=c0)
            specs_ += sp
            ops_ += [arr] * len(sp)
        return ops_, specs_

    def q_step(phi, z, beta, a0, abs_, dg0, dgbs, D, sbf, tau_v):
        sc = jnp.zeros((1, 8), jnp.float32)
        sc = sc.at[0, 0].set(D).at[0, 1].set(sbf).at[0, 2].set(tau_v)
        if PACKED:
            shift_ops = [phi, z, beta, z, beta]
            shift_specs = [_halo_spec("node"), cone, cone,
                           _halo_spec("cone"), _halo_spec("cone")]
            base = 2 + 5      # a0 operand index (sc, phi + the 5 above)
        else:
            P = sum(NSH)
            phi_nops = []
            phi_nspecs = []
            for a in range(d):
                sp = _nbr_specs(TS, grid[0], nt, strides[a], False)
                phi_nspecs += sp
                phi_nops += [phi] * len(sp)
            plane_list = []
            for a in range(d):
                c0 = 1 + 4 * a
                k = strides[a]
                plane_list += [(z, c0, k), (beta, c0, k),
                               (z, c0 + 2, k), (beta, c0 + 2, k)]
            pl_ops, pl_specs = _bwd_plane_nbrs(plane_list, TS, grid[0],
                                               nt - 1)
            shift_ops = phi_nops + [z, beta] + pl_ops
            shift_specs = phi_nspecs + [cone, cone] + pl_specs
            base = 2 + P + 2 + 4 * P     # a0 operand index
        masks2d = [m.reshape(1, S) for m in masks]
        w_args = ([weight.q0] + list(weight.bs)) if weighted else []
        w_specs = ([cell] + [node] * d) if weighted else []
        out_shape = (
            [jax.ShapeDtypeStruct((nt - 1, S), dtype),
             jax.ShapeDtypeStruct((nt - 1, S), dtype)]
            + [jax.ShapeDtypeStruct((nt, S), dtype)] * (2 * d)
        )
        # Aliases (see the round-3 discovery: un-aliased pallas outputs pay
        # a hidden copy pass): alpha0' <- a0, alpha_b' <- abs. phi is LIVE
        # after this call (carried in the state, read by the KKT battery —
        # core.py:242,346), so aliasing bns[0] onto it would force XLA to
        # copy-insert (voiding the win) or corrupt state.phi in place;
        # q0' and bns[0:] have no dead same-shaped operand and stay
        # un-aliased. One buffer may back at most ONE output, even when
        # passed as several operands. Halo streams read block i+1 — ahead
        # of every write cursor, so packed mode keeps the same guarantee.
        aliases = {} if interpret else {base: 1}
        if not interpret:
            for a in range(d):
                aliases[base + 1 + a] = 2 + d + a  # abs[a] -> abns[a]
        outs = pl.pallas_call(
            q_kernel,
            grid=grid,
            out_shape=out_shape,
            in_specs=([scal, node] + shift_specs
                      + [cell] + [node] * d
                      + [cell] + [node] * d + [mask_spec] * d + w_specs),
            out_specs=[cell, cell] + [node] * (2 * d),
            input_output_aliases=aliases,
            interpret=interpret,
            compiler_params=_cparams,
        )(sc, phi, *shift_ops, a0, *abs_, dg0, *dgbs,
          *masks2d, *w_args)
        q0n, a0n = outs[0], outs[1]
        bns = outs[2:2 + d]
        abns = outs[2 + d:]
        return q0n, list(bns), a0n, list(abns)

    # ------------- kernel C: beta multiplier -----------------------------
    # z2' = bfd(q'); beta' = beta + tau*(z - z2')
    def b_kernel(sc_ref, q0_ref, *rest):
        b_refs = rest[:d]
        i = d
        nb_refs = []
        for a in range(d):
            nb_refs.append(rest[i:i + NSH[a]]); i += NSH[a]
        beta_ref = rest[i]
        z_ref = rest[i + 1]
        out_ref = rest[i + 2]
        sbf = sc_ref[0, 0]
        sd = sc_ref[0, 1]
        tau_v = sc_ref[0, 2]
        s = sbf * _INV_SQRT2_F
        q0 = q0_ref[:]
        cols = [sd - sbf * q0]
        for a in range(d):
            b = b_refs[a][:]
            f = _asm(b, nb_refs[a], strides[a], True, TS)
            for sl in (slice(0, nt - 1), slice(1, nt)):
                cols.append(s * f[sl])
                cols.append(s * b[sl])
        cols.append(sd + sbf * q0)
        for c in range(C):
            out_ref[c] = beta_ref[c] + tau_v * (z_ref[c] - cols[c])

    def beta_step(beta, z, q0n, bns, sbf, sd, tau_v):
        sc = jnp.zeros((1, 8), jnp.float32)
        sc = sc.at[0, 0].set(sbf).at[0, 1].set(sd).at[0, 2].set(tau_v)
        nops, nspecs = _fwd_nbr_args(bns, TS, grid[0], nt)
        # beta' writes in place into beta's buffer (dead after the call) —
        # see the aliasing note in q_step
        return pl.pallas_call(
            b_kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((C, nt - 1, S), dtype),
            in_specs=[scal, cell] + [node] * d + nspecs + [cone, cone],
            out_specs=cone,
            input_output_aliases=(
                {} if interpret else {2 + d + sum(NSH): 0}),
            interpret=interpret,
            compiler_params=_cparams,
        )(sc, q0n, *bns, *nops, beta, z)

    # ------- CA kernels hold 4 cone blocks: cap their cone block at
    # ~1.6 MB. DOTSOCP_PALLAS_TS2 overrides for sweeps. --------
    ts2_cap = max(128, (1_650_000 // (4 * C * (nt - 1))) // 128 * 128)
    TS2 = min(TS, max(128, ts2_cap))
    TS2 = int(_os.environ.get("DOTSOCP_PALLAS_TS2", TS2))
    grid2 = ((S + TS2 - 1) // TS2,)
    node2, cell2, cone2, scal2, _ = _specs(nt, C, TS2, None, d)
    NSH2 = [_nblk(strides[a], TS2) for a in range(d)]

    # ---------------- x-carry variants (x = z + beta) --------------------
    # Inside a segment the q-step only ever consumes z and beta through
    # their SUM (xcol = z + beta), so carrying x instead of z halves the
    # q-step's cone reads (674 MB/iter at 513^2x65). The CA kernel forms
    # x' = z' + beta' in registers; the boundary step emits the legacy
    # stale z = x - beta so segment-edge states keep the reference layout.
    # Reconstruction (z+beta)-beta reintroduces <= 1 ulp of x — three
    # orders below the f32 KKT floor (~1e-4); parity tests pin 2e-6.

    # kernel A': x = proj_soc(bfd(q) - beta) + beta (segment prologue)
    def x_kernel(sc_ref, q0_ref, *rest):
        b_refs = rest[:d]
        i = d
        nb_refs = []
        for a in range(d):
            nb_refs.append(rest[i:i + NSH[a]]); i += NSH[a]
        beta_ref = rest[i]
        x_ref = rest[i + 1]
        sbf = sc_ref[0, 0]
        sd = sc_ref[0, 1]
        s = sbf * _INV_SQRT2_F
        q0 = q0_ref[:]
        cols = [(sd - sbf * q0) - beta_ref[0]]
        ci = 1
        for a in range(d):
            b = b_refs[a][:]
            f = _asm(b, nb_refs[a], strides[a], True, TS)
            for sl in (slice(0, nt - 1), slice(1, nt)):
                cols.append(s * f[sl] - beta_ref[ci]); ci += 1
                cols.append(s * b[sl] - beta_ref[ci]); ci += 1
        cols.append((sd + sbf * q0) - beta_ref[C - 1])
        z0 = cols[0]
        nrm2 = cols[1] * cols[1]
        for c in cols[2:]:
            nrm2 = nrm2 + c * c
        nrm = jnp.sqrt(nrm2)
        safe = jnp.where(nrm > 0, nrm, 1.0)
        coef = jnp.clip(0.5 * (1.0 + z0 / safe), 0.0, 1.0)
        head = jnp.maximum(z0, coef * nrm)
        x_ref[0] = head + beta_ref[0]
        for c in range(1, C):
            x_ref[c] = coef * cols[c] + beta_ref[c]

    def x_step(q0, bs, beta, sbf, sd):
        sc = jnp.zeros((1, 8), jnp.float32)
        sc = sc.at[0, 0].set(sbf).at[0, 1].set(sd)
        nops, nspecs = _fwd_nbr_args(bs, TS, grid[0], nt)
        return pl.pallas_call(
            x_kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((C, nt - 1, S), dtype),
            in_specs=[scal, cell] + [node] * d + nspecs + [cone],
            out_specs=cone,
            interpret=interpret,
            compiler_params=_cparams,
        )(sc, q0, *bs, *nops, beta)

    # kernel B': q-step + alpha from the carried x (one cone read)
    def qx_kernel(sc_ref, phi_ref, *rest):
        i = 0
        if PACKED:
            phi_halo, x_ref, x_halo = rest[0], rest[1], rest[2]
            i = 3
            pnb = [[phi_halo]] * d
            xnb = [[[x_halo[c0]], [x_halo[c0 + 2]]]
                   for c0 in (1 + 4 * a for a in range(d))]
        else:
            pnb = []
            for a in range(d):
                pnb.append(rest[i:i + NSH[a]]); i += NSH[a]
            x_ref = rest[i]; i += 1
            xnb = []
            for a in range(d):
                row = []
                for _ in range(2):  # x_lo, x_hi planes
                    row.append(rest[i:i + NSH[a]]); i += NSH[a]
                xnb.append(row)
        a0_ref = rest[i]; i += 1
        ab_refs = rest[i:i + d]; i += d
        dg0_ref = rest[i]; i += 1
        dgb_refs = rest[i:i + d]; i += d
        mask_refs = rest[i:i + d]; i += d
        if weighted:
            w0_ref = rest[i]; i += 1
            wb_refs = rest[i:i + d]; i += d
        out_q0, out_a0 = rest[i], rest[i + 1]
        out_b = rest[i + 2:i + 2 + d]
        out_ab = rest[i + 2 + d:i + 2 + 2 * d]

        D = sc_ref[0, 0]
        sbf = sc_ref[0, 1]
        tau_v = sc_ref[0, 2]
        s = sbf * _INV_SQRT2_F
        phi = phi_ref[:]

        tmp_q0 = D * ((phi[1:] - phi[:-1]) / ht)
        q2_q0 = sbf * (x_ref[C - 1] - x_ref[0])
        if weighted:
            w0 = w0_ref[:]
            q0n = (w0 * (tmp_q0 + a0_ref[:]) + q2_q0) * dg0_ref[:]
            out_a0[:] = a0_ref[:] + tau_v * (tmp_q0 - w0 * q0n)
        else:
            q0n = (tmp_q0 + a0_ref[:] + q2_q0) * dg0_ref[:]
            out_a0[:] = a0_ref[:] + tau_v * (tmp_q0 - q0n)
        out_q0[:] = q0n

        zpad = jnp.zeros((1, phi.shape[-1]), phi.dtype)
        for a in range(d):
            k = strides[a]
            m = mask_refs[a][:]
            phis_a = _asm(phi, pnb[a], k, False, TS)
            tmp_b = D * (((phis_a - phi) / hs[a]) * m)
            c0 = 1 + 4 * a
            lo_sum = _asm(x_ref[c0], xnb[a][0], k, False, TS) + x_ref[c0 + 1]
            hi_sum = _asm(x_ref[c0 + 2], xnb[a][1], k, False, TS) + x_ref[c0 + 3]
            acc = (jnp.concatenate([lo_sum, zpad], axis=0)
                   + jnp.concatenate([zpad, hi_sum], axis=0))
            q2_b = (s * acc) * m
            if weighted:
                wb = wb_refs[a][:]
                bn = (wb * (tmp_b + ab_refs[a][:]) + q2_b) * dgb_refs[a][:]
                out_b[a][:] = bn
                out_ab[a][:] = ab_refs[a][:] + tau_v * (tmp_b - wb * bn)
            else:
                bn = (tmp_b + ab_refs[a][:] + q2_b) * dgb_refs[a][:]
                out_b[a][:] = bn
                out_ab[a][:] = ab_refs[a][:] + tau_v * (tmp_b - bn)

    def qx_step(phi, x, a0, abs_, dg0, dgbs, D, sbf, tau_v):
        sc = jnp.zeros((1, 8), jnp.float32)
        sc = sc.at[0, 0].set(D).at[0, 1].set(sbf).at[0, 2].set(tau_v)
        if PACKED:
            shift_ops = [phi, x, x]
            shift_specs = [_halo_spec("node"), cone, _halo_spec("cone")]
            base = 2 + 3     # a0 operand index
        else:
            P = sum(NSH)
            phi_nops, phi_nspecs = [], []
            for a in range(d):
                sp = _nbr_specs(TS, grid[0], nt, strides[a], False)
                phi_nspecs += sp
                phi_nops += [phi] * len(sp)
            plane_list = []
            for a in range(d):
                c0 = 1 + 4 * a
                k = strides[a]
                plane_list += [(x, c0, k), (x, c0 + 2, k)]
            pl_ops, pl_specs = _bwd_plane_nbrs(plane_list, TS, grid[0],
                                               nt - 1)
            shift_ops = phi_nops + [x] + pl_ops
            shift_specs = phi_nspecs + [cone] + pl_specs
            base = 2 + P + 1 + 2 * P     # a0 operand index
        masks2d = [m.reshape(1, S) for m in masks]
        w_args = ([weight.q0] + list(weight.bs)) if weighted else []
        w_specs = ([cell] + [node] * d) if weighted else []
        out_shape = (
            [jax.ShapeDtypeStruct((nt - 1, S), dtype),
             jax.ShapeDtypeStruct((nt - 1, S), dtype)]
            + [jax.ShapeDtypeStruct((nt, S), dtype)] * (2 * d)
        )
        # aliases: alpha0' <- a0, alpha_b' <- abs. phi is LIVE after this
        # call (state carry + KKT reads, core.py:282,346) — see the q_step
        # note; q0' and bns stay un-aliased. Halo streams read block i+1,
        # ahead of every write cursor.
        aliases = {} if interpret else {base: 1}
        if not interpret:
            for a in range(d):
                aliases[base + 1 + a] = 2 + d + a
        outs = pl.pallas_call(
            qx_kernel,
            grid=grid,
            out_shape=out_shape,
            in_specs=([scal, node] + shift_specs
                      + [cell] + [node] * d
                      + [cell] + [node] * d + [mask_spec] * d + w_specs),
            out_specs=[cell, cell] + [node] * (2 * d),
            input_output_aliases=aliases,
            interpret=interpret,
            compiler_params=_cparams,
        )(sc, phi, *shift_ops, a0, *abs_, dg0, *dgbs, *masks2d,
          *w_args)
        q0n, a0n = outs[0], outs[1]
        return q0n, list(outs[2:2 + d]), a0n, list(outs[2 + d:])

    # kernel CA'/final: beta multiplier + next x (or the legacy stale z at
    # the segment boundary), from (beta, x)
    def make_cx_kernel(final):
        def cx_kernel(sc_ref, q0_ref, *rest):
            b_refs = rest[:d]
            i = d
            nb_refs = []
            for a in range(d):
                nb_refs.append(rest[i:i + NSH2[a]]); i += NSH2[a]
            beta_ref = rest[i]
            x_ref = rest[i + 1]
            out_beta = rest[i + 2]
            out_x = rest[i + 3]
            sbf = sc_ref[0, 0]
            sd = sc_ref[0, 1]
            tau_v = sc_ref[0, 2]
            s = sbf * _INV_SQRT2_F
            q0 = q0_ref[:]
            cols = [sd - sbf * q0]
            for a in range(d):
                b = b_refs[a][:]
                f = _asm(b, nb_refs[a], strides[a], True, TS2)
                for sl in (slice(0, nt - 1), slice(1, nt)):
                    cols.append(s * f[sl])
                    cols.append(s * b[sl])
            cols.append(sd + sbf * q0)
            zs = [x_ref[c] - beta_ref[c] for c in range(C)]  # stale z
            brows = [beta_ref[c] + tau_v * (zs[c] - cols[c])
                     for c in range(C)]
            for c in range(C):
                out_beta[c] = brows[c]
            if final:
                for c in range(C):
                    out_x[c] = zs[c]  # legacy boundary z
                return
            zc = [cols[c] - brows[c] for c in range(C)]
            z0 = zc[0]
            nrm2 = zc[1] * zc[1]
            for c in zc[2:]:
                nrm2 = nrm2 + c * c
            nrm = jnp.sqrt(nrm2)
            safe = jnp.where(nrm > 0, nrm, 1.0)
            coef = jnp.clip(0.5 * (1.0 + z0 / safe), 0.0, 1.0)
            head = jnp.maximum(z0, coef * nrm)
            out_x[0] = head + brows[0]
            for c in range(1, C):
                out_x[c] = coef * zc[c] + brows[c]

        return cx_kernel

    cx_kernel_mid = make_cx_kernel(final=False)
    cx_kernel_fin = make_cx_kernel(final=True)

    def _cx(kern, beta, x, q0n, bns, sbf, sd, tau_v):
        sc = jnp.zeros((1, 8), jnp.float32)
        sc = sc.at[0, 0].set(sbf).at[0, 1].set(sd).at[0, 2].set(tau_v)
        nops, nspecs = [], []
        for a in range(d):
            sp = _nbr_specs(TS2, grid2[0], nt, strides[a], True)
            nspecs += sp
            nops += [bns[a]] * len(sp)
        F = sum(NSH2)
        return pl.pallas_call(
            kern,
            grid=grid2,
            out_shape=[jax.ShapeDtypeStruct((C, nt - 1, S), dtype),
                       jax.ShapeDtypeStruct((C, nt - 1, S), dtype)],
            in_specs=[scal2, cell2] + [node2] * d + nspecs + [cone2, cone2],
            out_specs=[cone2, cone2],
            input_output_aliases=(
                {} if interpret else {2 + d + F: 0, 3 + d + F: 1}),
            interpret=interpret,
            compiler_params=_cparams,
        )(sc, q0n, *bns, *nops, beta, x)

    def cx_step(beta, x, q0n, bns, sbf, sd, tau_v):
        return _cx(cx_kernel_mid, beta, x, q0n, bns, sbf, sd, tau_v)

    def cx_final(beta, x, q0n, bns, sbf, sd, tau_v):
        """Returns (beta', stale z) — the legacy segment-boundary state."""
        return _cx(cx_kernel_fin, beta, x, q0n, bns, sbf, sd, tau_v)

    return {"z_step": z_step, "q_step": q_step, "beta_step": beta_step,
            "x_step": x_step, "qx_step": qx_step,
            "cx_step": cx_step, "cx_final": cx_final}


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
