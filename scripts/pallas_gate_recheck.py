"""Round-5 probe: re-validate the 2M-cell pallas auto-gate with the
current (in-kernel-shift + packed-halo) kernels: fused-CA vs XLA step at
sizes below and above the gate. Result: 129^2x33 parity (1.03x -- gate
correct), 257^2x33 2.05x / 129^2x129 2.31x (both above the gate, fused
in production).

  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_gate_recheck.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from dotsocp_tpu.algorithms.core import LevelConfig
from dotsocp_tpu.algorithms.variants import InPALMKernels
from dotsocp_tpu.multilevel.level import initial_scaling, initialize
from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.utils.profiling import _sync

N = 100
for nx, nt in ((129, 33), (257, 33), (129, 129)):
    rho0, rho1 = get_example_2d("example2", nx, nx)
    lv = initialize(rho0, rho1, nt, dtype=jnp.float32)
    initial_scaling(lv, scaling=True)
    res = {}
    for up in (False, True):
        cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9,
                          dtype=jnp.float32, layout="flat", use_pallas=up)
        k = InPALMKernels(cfg)
        s = k.prep(lv.as_dict(), sigma=1.0)
        seg = jax.jit(lambda st, k=k: k.segment_impl(st, N))
        r = seg(s); _sync(r)
        best = float("inf")
        for _ in range(4):
            t0 = time.time(); r = seg(s); _sync(r)
            best = min(best, (time.time() - t0))
        res[up] = (best, jax.device_get(r.q.q0))
    err = float(np.max(np.abs(res[True][1] - res[False][1]))
                / (np.max(np.abs(res[False][1])) or 1))
    t_x, t_p = res[False][0], res[True][0]
    print(f"{nx}^2x{nt}: XLA {t_x*1e3/N:6.3f} ms/iter  "
          f"pallas-CA {t_p*1e3/N:6.3f} ms/iter  "
          f"speedup {t_x/t_p:4.2f}x  rel_err {err:.1e}", flush=True)
