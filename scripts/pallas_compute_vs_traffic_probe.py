"""Round-4 probe: are the fused kernels compute(VPU)-bound or
bandwidth-bound? Same block structure as cx_step (2 cone reads + 2 aliased
cone writes + cells), but with the arithmetic stripped to a single add.
If the stripped kernel is much faster than the real one, the gap is VPU
compute (cone projection sqrt/div + 10-column register pressure), not DMA.

  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_compute_vs_traffic_probe.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dotsocp_tpu.utils.profiling import _sync

C, NT1, S = 10, 64, 513 * 513
TS = 512
Spad = ((S + TS - 1) // TS) * TS
grid = (Spad // TS,)
cone = pl.BlockSpec((C, NT1, TS), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
cell = pl.BlockSpec((NT1, TS), lambda i: (0, i), memory_space=pltpu.VMEM)

beta = jnp.asarray(np.random.rand(C, NT1, Spad).astype(np.float32))
x = jnp.asarray(np.random.rand(C, NT1, Spad).astype(np.float32))
q0 = jnp.asarray(np.random.rand(NT1, Spad).astype(np.float32))


def timeit(name, one, args, nbytes):
    N = 20
    f = jax.jit(lambda b, x2, q: jax.lax.fori_loop(
        0, N, lambda _, c: one(c[0], c[1], c[2]), (b, x2, q)))
    r = f(*args); _sync(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); r = f(*args); _sync(r)
        best = min(best, (time.time() - t0) / N)
    print(f"{name:44s} {best*1e3:7.2f} ms  {nbytes/ (best - 40e-3/N) /1e9:6.0f} GB/s",
          flush=True)


NB = (2 * beta.size + q0.size) * 4 + 2 * beta.size * 4  # reads + writes


def stripped(b, x2, q):
    def k(q_ref, b_ref, x_ref, ob_ref, ox_ref):
        ob_ref[:] = b_ref[:] + x_ref[:]
        ox_ref[:] = x_ref[:] - b_ref[:] + q_ref[0]
    ob, ox = pl.pallas_call(
        k, grid=grid,
        out_shape=[jax.ShapeDtypeStruct(b.shape, b.dtype)] * 2,
        in_specs=[cell, cone, cone], out_specs=[cone, cone],
        input_output_aliases={1: 0, 2: 1},
    )(q, b, x2)
    return ob, ox, q


def conelike(b, x2, q):
    """Full cone-projection-shaped math (the cx_step hot path) on the same
    blocks: per-column stacks, sqrt, clip, selects."""
    def k(q_ref, b_ref, x_ref, ob_ref, ox_ref):
        q0v = q_ref[:]
        cols = [q0v * (0.1 * c + 0.5) for c in range(C)]
        zs = [x_ref[c] - b_ref[c] for c in range(C)]
        brows = [b_ref[c] + 0.9 * (zs[c] - cols[c]) for c in range(C)]
        ob_ref[:] = jnp.stack(brows, axis=0)
        zc = [cols[c] - brows[c] for c in range(C)]
        z0 = zc[0]
        nrm2 = zc[1] * zc[1]
        for c in zc[2:]:
            nrm2 = nrm2 + c * c
        nrm = jnp.sqrt(nrm2)
        safe = jnp.where(nrm > 0, nrm, 1.0)
        coef = jnp.clip(0.5 * (1.0 + z0 / safe), 0.0, 1.0)
        head = jnp.maximum(z0, coef * nrm)
        rows = [head + brows[0]] + [coef * zc[c] + brows[c]
                                    for c in range(1, C)]
        ox_ref[:] = jnp.stack(rows, axis=0)
    ob, ox = pl.pallas_call(
        k, grid=grid,
        out_shape=[jax.ShapeDtypeStruct(b.shape, b.dtype)] * 2,
        in_specs=[cell, cone, cone], out_specs=[cone, cone],
        input_output_aliases={1: 0, 2: 1},
    )(q, b, x2)
    return ob, ox, q


def xla_equiv(b, x2, q):
    ob = b + x2
    ox = x2 - b + q[None]
    return ob, ox, q


timeit("stripped cx-shaped (adds only)", stripped, (beta, x, q0), NB)
timeit("cone-math cx-shaped (sqrt/clip/stacks)", conelike, (beta, x, q0), NB)
timeit("XLA equivalent of stripped", xla_equiv, (beta, x, q0), NB)
