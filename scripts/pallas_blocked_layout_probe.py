"""Probe (round 4): is the remaining ~35% pallas read-bandwidth penalty a
STRIDED-DMA artifact of the flat layout's block geometry?

The fused-step kernels slice cone arrays (C, nt-1, S) with blocks
(C, nt-1, TS): each block row is TS*4 = 2 KB, strided S*4 ~ 1 MB apart —
640 small strided transfers per block. The round-3 alias probe measured
~792 GB/s but on blocks that spanned the full minor dimension (contiguous
2 MB chunks), so it never saw this pattern.

Candidate fix measured here: physically BLOCK the cone arrays —
(nS, C, nt-1, TS) with block (1, C, nt-1, TS) — so every DMA is one
contiguous ~1.3 MB read. Cone arrays are only touched by pallas kernels
inside fori segments, so a layout change costs two transposes per segment
(amortized over ~40 iterations).

Run on TPU:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_blocked_layout_probe.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, NT1 = 10, 64
S = 513 * 513  # 263169 (odd)


def sync(r):
    return jax.device_get(jax.tree.leaves(r)[0].ravel()[0])


def timeit(name, one, x, nbytes):
    N = 20
    f = jax.jit(lambda x: jax.lax.fori_loop(0, N, lambda _, y: one(y), x))
    try:
        r = f(x); sync(r)
    except Exception as e:
        print(f"{name:52s} FAILED: {str(e)[:120]}", flush=True)
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); r = f(x); sync(r)
        best = min(best, time.time() - t0)
    per = best / N - 40e-3 / N  # tunnel floor
    print(f"{name:52s} {best/N*1e3:7.2f} ms  {nbytes/per/1e9:6.0f} GB/s",
          flush=True)


def strided(ts):
    """Current design: (C, NT1, S) blocked (C, NT1, ts) over the minor."""
    Spad = ((S + ts - 1) // ts) * ts
    x = jnp.asarray(np.random.rand(C, NT1, Spad).astype(np.float32))
    grid = (Spad // ts,)
    spec = pl.BlockSpec((C, NT1, ts), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def one(y):
        return pl.pallas_call(
            k, grid=grid,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[spec], out_specs=spec,
            input_output_aliases={0: 0},
        )(y)

    timeit(f"strided blocks (C,{NT1},TS={ts})", one, x, 2 * x.size * 4)


def blocked(ts):
    """Candidate: physically blocked (nS, C, NT1, ts) — contiguous DMAs."""
    nS = (S + ts - 1) // ts
    x = jnp.asarray(np.random.rand(nS, C, NT1, ts).astype(np.float32))
    spec = pl.BlockSpec((1, C, NT1, ts), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def one(y):
        return pl.pallas_call(
            k, grid=(nS,),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[spec], out_specs=spec,
            input_output_aliases={0: 0},
        )(y)

    timeit(f"contiguous blocks (nS,C,{NT1},TS={ts})", one, x, 2 * x.size * 4)


def xla_baseline():
    x = jnp.asarray(np.random.rand(C, NT1, S).astype(np.float32))
    timeit("XLA x+1 (same array)", lambda y: y + 1.0, x, 2 * x.size * 4)


def transpose_cost(ts):
    """What the flat->blocked conversion itself costs (per segment edge)."""
    Spad = ((S + ts - 1) // ts) * ts
    nS = Spad // ts
    x = jnp.asarray(np.random.rand(C, NT1, Spad).astype(np.float32))

    def conv(y):
        # (C, NT1, nS, ts) -> (nS, C, NT1, ts)
        return jnp.transpose(y.reshape(C, NT1, nS, ts), (2, 0, 1, 3)) + 0.0

    def back(y):
        return jnp.transpose(y, (1, 2, 0, 3)).reshape(C, NT1, Spad) + 0.0

    N = 10
    f = jax.jit(lambda a: jax.lax.fori_loop(
        0, N, lambda _, y: conv(back(y)) , conv(x)))
    r = f(x); sync(r)
    t0 = time.time(); r = f(x); sync(r)
    per = (time.time() - t0) / N
    print(f"roundtrip transpose flat<->blocked (TS={ts})     "
          f"{per*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    xla_baseline()
    for ts in (512, 1024, 2048):
        strided(ts)
    for ts in (512, 1024, 2048):
        blocked(ts)
    transpose_cost(512)
