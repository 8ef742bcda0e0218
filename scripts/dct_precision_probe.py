"""Round-5 probe: the 513^2x65 DCT solve costs 5.8 ms/iter (phi_breakdown),
matmul-dominated at Precision.HIGHEST (6-pass bf16, ~13.5 effective
TFLOPs on the 513-sized operands). HIGH (3-pass) halves the passes.
Measures per-axis transform time and the end-to-end solve error vs a
CPU-f64-grade reference for HIGHEST / HIGH / DEFAULT.

  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/dct_precision_probe.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from dotsocp_tpu.ops.geometry import Geometry
from dotsocp_tpu.ops.poisson import dct_matrix, make_dct_poisson
from dotsocp_tpu.utils.profiling import _sync

nt, n = 65, 513
geom = Geometry(nt=nt, space=(n, n))
rng = np.random.default_rng(3)
rhs64 = rng.standard_normal((nt, n, n))
rhs = jnp.asarray(rhs64, jnp.float32)

# f64-grade reference solve on CPU
cpu = jax.devices("cpu")[0]
ref_p = make_dct_poisson(geom, dtype=jnp.float64)
with jax.default_device(cpu):
    want = np.asarray(jax.jit(ref_p.solve)(jnp.asarray(rhs64)))
span = float(np.abs(want).max())

N = 20
TUN = 40e-3 / N
M = dct_matrix(n, jnp.float32)


def time_axis(prec):
    def f(x):
        return jax.lax.dot_general(x, M, (((2,), (1,)), ((), ())),
                                   precision=prec)
    seg = jax.jit(lambda x: jax.lax.fori_loop(
        0, N, lambda _, c: f(c) * (1.0 / n), x))
    r = seg(rhs); _sync(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); r = seg(rhs); _sync(r)
        best = min(best, (time.time() - t0) / N)
    return (best - TUN) * 1e3


for prec in ("highest", "high", "default"):
    p = {"highest": jax.lax.Precision.HIGHEST,
         "high": jax.lax.Precision.HIGH,
         "default": jax.lax.Precision.DEFAULT}[prec]
    ms = time_axis(p)
    import dotsocp_tpu.ops.poisson as P
    old = P._apply_axis
    def patched(Mx, x, axis, _p=p):
        import jax as _j
        nd = x.ndim
        if axis == nd - 1:
            return _j.lax.dot_general(x, Mx, (((nd - 1,), (1,)), ((), ())),
                                      precision=_p)
        if axis == 0:
            sh = x.shape
            y = _j.lax.dot_general(Mx, x.reshape(sh[0], -1),
                                   (((1,), (0,)), ((), ())), precision=_p)
            return y.reshape((Mx.shape[0],) + sh[1:])
        y = jnp.tensordot(Mx, x, axes=[[1], [axis]], precision=_p)
        return jnp.moveaxis(y, 0, axis)
    P._apply_axis = patched
    try:
        sp = make_dct_poisson(geom, dtype=jnp.float32)
        got = np.asarray(jax.jit(sp.solve)(rhs))
        err = float(np.abs(got - want).max() / span)
    finally:
        P._apply_axis = old
    print(f"{prec:8s}: x-axis transform {ms:6.2f} ms, "
          f"solve rel err {err:.2e}", flush=True)
