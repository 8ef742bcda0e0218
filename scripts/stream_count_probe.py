"""Round-5 probe: does per-kernel operand-stream count explain the
qx/cx rate gap (582/523 GB/s actual-traffic vs ~700+ for the round-4
5-stream synthetic)? Same total bytes moved, same block geometry, same
trivial math — only the number of distinct operand streams varies:
the cone array is passed as 1 whole (C,nt-1,TS) block stream, or split
into C separate (nt-1,TS) plane streams (mimicking qx's ~20 streams).

  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/stream_count_probe.py
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
plane = lambda c: pl.BlockSpec((1, NT1, TS), lambda i, c=c: (c, 0, i),
                               memory_space=pltpu.VMEM)
cell = pl.BlockSpec((NT1, TS), lambda i: (0, i), memory_space=pltpu.VMEM)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((C, NT1, Spad), np.float32))
q0 = jnp.asarray(rng.random((NT1, Spad), np.float32))
NB = (x.size + q0.size + x.size) * 4  # read x + q0, write out

N = 20


def timeit(name, one, args):
    f = jax.jit(lambda a, b: jax.lax.fori_loop(
        0, N, lambda _, c: (one(c[0], c[1]), c[1]), (a, b)))
    r = f(*args); _sync(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); r = f(*args); _sync(r)
        best = min(best, (time.time() - t0) / N)
    print(f"{name:46s} {best*1e3:7.2f} ms  {NB/best/1e9:6.0f} GB/s", flush=True)


def few_streams(xv, qv):
    def k(q_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] + q_ref[0]
    return pl.pallas_call(
        k, grid=grid, out_shape=jax.ShapeDtypeStruct(xv.shape, xv.dtype),
        in_specs=[cell, cone], out_specs=cone,
        input_output_aliases={1: 0},
    )(qv, xv)


def many_streams(xv, qv):
    # same bytes, but the cone array arrives as C separate plane streams
    def k(q_ref, *refs):
        planes = refs[:C]
        o_ref = refs[C]
        for c in range(C):
            o_ref[c] = planes[c][0] + q_ref[0]
    return pl.pallas_call(
        k, grid=grid, out_shape=jax.ShapeDtypeStruct(xv.shape, xv.dtype),
        in_specs=[cell] + [plane(c) for c in range(C)], out_specs=cone,
    )(qv, *([xv] * C))


def many_streams_aliased(xv, qv):
    def k(q_ref, *refs):
        planes = refs[:C]
        o_ref = refs[C]
        for c in range(C):
            o_ref[c] = planes[c][0] + q_ref[0]
    return pl.pallas_call(
        k, grid=grid, out_shape=jax.ShapeDtypeStruct(xv.shape, xv.dtype),
        in_specs=[cell] + [plane(c) for c in range(C)], out_specs=cone,
        input_output_aliases={1: 0},
    )(qv, *([xv] * C))


timeit("1 cone stream + 1 cell (3 streams)", few_streams, (x, q0))
timeit("10 plane streams + 1 cell (12 streams)", many_streams, (x, q0))
timeit("10 plane streams, aliased out", many_streams_aliased, (x, q0))
