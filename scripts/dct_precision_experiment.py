"""Does lowering the DCT matmul precision (HIGHEST -> HIGH/DEFAULT) speed
the step, and does the solve still converge at tol 1e-4 (f32)?"""
import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
import dotsocp_tpu.ops.poisson as P

results = {}
for prec_name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                        ("HIGH", jax.lax.Precision.HIGH),
                        ("DEFAULT", jax.lax.Precision.DEFAULT)):
    # monkeypatch the contraction precision
    orig = P._apply_axis

    def apply_axis(M, x, axis, _p=prec):
        y = jnp.tensordot(M, x, axes=[[1], [axis]], precision=_p)
        return jnp.moveaxis(y, 0, axis)

    P._apply_axis = apply_axis
    from importlib import reload
    from dotsocp_tpu.algorithms.core import LevelConfig
    from dotsocp_tpu.algorithms.variants import InPALMKernels
    from dotsocp_tpu.multilevel.level import initial_scaling, initialize
    from dotsocp_tpu.models.examples import get_example_2d

    rho0, rho1 = get_example_2d("DOTmark_4stitch", 129, 129)
    lv = initialize(rho0, rho1, 33, dtype=jnp.float32)
    initial_scaling(lv, scaling=True)
    cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9, dtype=jnp.float32)
    k = InPALMKernels(cfg)
    s = k.prep(lv.as_dict(), sigma=1.0)
    seg = jax.jit(lambda st: jax.lax.fori_loop(0, 10, lambda _, x: k._step(x), st))
    r = seg(s); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = seg(r)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 100 * 1e3
    # convergence probe: 300 more iters, read kkt
    for _ in range(29):
        r = seg(r)
    kkt = jax.device_get(k.kkt(r)["kkt_org"])
    results[prec_name] = (dt, float(max(kkt[0], kkt[2], kkt[5], kkt[6])))
    print(f"{prec_name:8s}: {dt:.3f} ms/iter, kkt after 400 iters: {results[prec_name][1]:.3e}", flush=True)
    P._apply_axis = orig
