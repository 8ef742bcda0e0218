"""Round-5 probe: restructure the 3-axis DCT solve so every contraction
is a first-axis or last-axis matmul, with ONE explicit transpose pair
around the y-stage instead of tensordot+moveaxis's hidden relayouts.
Times each building block and the candidate pipeline vs the shipped
solve (513^2x65 f32).

  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/dct_pipeline_probe.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from dotsocp_tpu.ops.geometry import Geometry
from dotsocp_tpu.ops.poisson import make_dct_poisson
from dotsocp_tpu.utils.profiling import _sync

nt, n = 65, 513
geom = Geometry(nt=nt, space=(n, n))
p = make_dct_poisson(geom, dtype=jnp.float32)
Mt, My, Mx = p.mats
rng = np.random.default_rng(3)
x0 = jnp.asarray(rng.standard_normal((nt, n, n)), jnp.float32)
N = 20
TUN = 40e-3 / N
PREC = jax.lax.Precision.HIGHEST


def timeit(name, fn, x):
    seg = jax.jit(lambda v: jax.lax.fori_loop(
        0, N, lambda _, c: fn(c) * jnp.float32(0.99), v))
    r = seg(x); _sync(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); r = seg(x); _sync(r)
        best = min(best, (time.time() - t0) / N)
    print(f"{name:46s} {best*1e3:7.2f} ms ({(best-TUN)*1e3:6.2f} detunneled)",
          flush=True)


timeit("transpose last two axes", lambda v: v.swapaxes(1, 2), x0)
timeit("t-transform (first axis fold)",
       lambda v: jax.lax.dot_general(
           Mt, v.reshape(nt, -1), (((1,), (0,)), ((), ())),
           precision=PREC).reshape(nt, n, n), x0)
timeit("x-transform (last axis)",
       lambda v: jax.lax.dot_general(v, Mx, (((2,), (1,)), ((), ())),
                                     precision=PREC), x0)
timeit("y via axis-1 dot_general (no moveaxis)",
       lambda v: jax.lax.dot_general(v, My, (((1,), (1,)), ((), ())),
                                     precision=PREC), x0)
timeit("y via tensordot+moveaxis (shipped)",
       lambda v: jnp.moveaxis(
           jnp.tensordot(My, v, axes=[[1], [1]], precision=PREC), 0, 1), x0)


# candidate pipeline: t, x, transpose, y, kernel, y^T, transpose, x^T, t^T
ikT = jnp.asarray(np.swapaxes(np.asarray(p.inv_kernel), 1, 2))


def pipeline(v):
    y = jax.lax.dot_general(Mt, v.reshape(nt, -1), (((1,), (0,)), ((), ())),
                            precision=PREC).reshape(nt, n, n)
    y = jax.lax.dot_general(y, Mx, (((2,), (1,)), ((), ())), precision=PREC)
    y = y.swapaxes(1, 2)
    y = jax.lax.dot_general(y, My, (((2,), (1,)), ((), ())), precision=PREC)
    y = y * ikT
    y = jax.lax.dot_general(y, My, (((2,), (0,)), ((), ())), precision=PREC)
    y = y.swapaxes(1, 2)
    y = jax.lax.dot_general(y, Mx, (((2,), (0,)), ((), ())), precision=PREC)
    y = jax.lax.dot_general(Mt.T, y.reshape(nt, -1), (((1,), (0,)), ((), ())),
                            precision=PREC).reshape(nt, n, n)
    return y


timeit("candidate pipeline solve", pipeline, x0)
timeit("shipped solve", lambda v: p.solve(v), x0)
ref = np.asarray(p.solve(x0))
got = np.asarray(pipeline(x0))
print("pipeline vs shipped rel err:",
      float(np.max(np.abs(got - ref)) / np.max(np.abs(ref))), flush=True)
