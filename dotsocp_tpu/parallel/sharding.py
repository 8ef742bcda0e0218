"""Mesh construction and sharding rules for batch + spatial parallelism.

The reference is strictly single-process (SURVEY.md section 2.5); this module
is the new parallel substrate. Parallel axes of the workload:

- ``batch``: independent transport instances (data parallelism) — a leading
  axis added by ``vmap`` over the solver step.
- ``y``, ``x``: spatial domain decomposition of the space-time grid (the
  workload's "model parallelism"). Stencil ops (grad, BF, sGS) become
  halo exchanges; the matmul-DCT phi-solve becomes distributed matmuls —
  all inserted automatically by XLA's SPMD partitioner from sharding
  annotations (collectives ride ICI).

The time axis stays local: it is the smallest axis and the BF stencil
couples adjacent time slabs only.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..algorithms.core import SolverState
from ..ops.staggered import Staggered


def factorize(n: int, k: int) -> list[int]:
    """Split n into k near-balanced factors (largest first)."""
    dims = [1] * k
    remaining = n
    i = 0
    while remaining > 1:
        # smallest prime factor
        p = next(
            (d for d in range(2, int(math.isqrt(remaining)) + 1) if remaining % d == 0),
            remaining,
        )
        dims[i % k] *= p
        remaining //= p
        i += 1
    return sorted(dims, reverse=True)


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("batch", "y", "x")) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = factorize(len(devs), len(axis_names))
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def _maybe_batch(spec: P, batched: bool) -> P:
    return P("batch", *spec) if batched else P(*spec)


def state_shardings(mesh: Mesh, batched: bool = True,
                    carry_z2: bool = False,
                    ndim_space: Optional[int] = None) -> SolverState:
    """NamedSharding pytree for a (possibly batch-leading) SolverState.

    Layouts: centered/staggered fields shard (y, x) on their trailing
    spatial axes; when the mesh has a ``t`` axis the leading time axis
    shards too (the workload's "long-context" axis, SURVEY.md section 5 —
    BF couples adjacent time slabs only, so its halo is one slab, and the
    DCT-in-t becomes a distributed matmul); the cone-column axis stays
    local; scalars are replicated. ``carry_z2`` must match the kernels'
    flag (states built by kernels with ``carry_z2=False`` hold None in the
    z2 slot)."""
    names = tuple(a for a in ("z", "y", "x") if a in mesh.axis_names)
    if ndim_space is None:
        ndim_space = len(names)
    # mesh spatial axes bind to the TRAILING array axes (a 3D grid on a
    # (y, x) mesh leaves its leading nz axis unsharded)
    names = (None,) * (ndim_space - len(names)) + names
    t = "t" if "t" in mesh.axis_names else None

    def sh(*spec):
        return NamedSharding(mesh, _maybe_batch(P(*spec), batched))

    centered = sh(t, *names)            # (nt, *space)
    zlike = sh(None, t, *names)         # (C, nt-1, *space)
    stag = Staggered(
        q0=sh(t, *names),
        bs=tuple(sh(t, *names) for _ in range(ndim_space)),
    )
    scalar = NamedSharding(mesh, P("batch") if batched else P())
    return SolverState(
        phi=centered,
        q=stag,
        z=zlike,
        alpha=stag,
        beta=zlike,
        z2=zlike if carry_z2 else None,
        c=centered,
        sigma=scalar,
        cScale=scalar,
        dScale=scalar,
        norm_c=scalar,
        norm_d=scalar,
        sigmaScale=scalar,
        D=scalar,
        E=scalar,
        diag_q_inv=stag,
    )


def constrain(state, shardings):
    """Apply with_sharding_constraint over a state pytree. Must be called
    inside jit: the grids here are 2^k + 1 (odd), which GSPMD shards with
    internal padding — allowed for constraints, not for boundary
    in_shardings."""
    return jax.tree.map(
        lambda x, s: jax.lax.with_sharding_constraint(x, s), state, shardings
    )


def loop_state_shardings(ls, mesh: Mesh, carry_z2: bool = False):
    """Shardings for a device-driver ``LoopState`` (or sGS variant): the
    solver state gets the spatial y/x layout, every control/history field is
    replicated. Works on any NamedTuple whose first field ``s`` is the
    SolverState (acc drivers nest it one level deeper in an AccState)."""
    from ..algorithms.variants import AccState

    repl = NamedSharding(mesh, P())
    base = ls.s.s if isinstance(ls.s, AccState) else ls.s
    ndim_space = getattr(base.phi, "ndim", 3) - 1
    state_sh = state_shardings(mesh, batched=False, carry_z2=carry_z2,
                               ndim_space=ndim_space)

    def sh_for(obj):
        if isinstance(obj, AccState):
            blocks = (state_sh.phi, state_sh.z, state_sh.q, state_sh.alpha,
                      state_sh.beta)
            return AccState(s=state_sh, old=blocks, anchor=blocks, k=repl)
        return state_sh

    return ls._replace(
        s=sh_for(ls.s),
        **{f: repl for f in ls._fields if f != "s"},
    )




def make_sharded_step(kernels, mesh: Mesh, batched: bool = True):
    """Jit the solver step with batch + spatial shardings annotated on the
    state; XLA's SPMD partitioner inserts the halo exchanges for the
    stencils and the collectives for the distributed DCT matmuls."""
    sh = state_shardings(mesh, batched,
                         carry_z2=getattr(kernels, "carry_z2", True))
    step = jax.vmap(kernels._step) if batched else kernels._step

    @jax.jit
    def sharded_step(state):
        state = constrain(state, sh)
        out = step(state)
        return constrain(out, sh)

    return sharded_step


