"""TS=640 probe (round 5): at 513^2 the y-stride (k=513) exceeds TS=512
by ONE lane, so every shifted operand pays a second neighbor block (a full
extra operand stream reading 131 KB/block for 1 useful lane). TS=640
covers the shift window with a single neighbor. This times the production
CA segment (qx_step + cx_step chain) at both tile sizes.

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/ts640_probe.py [TS ...]
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from dotsocp_tpu.algorithms.core import LevelConfig
from dotsocp_tpu.algorithms.variants import InPALMKernels
from dotsocp_tpu.multilevel.level import initial_scaling, initialize
from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.utils.profiling import _sync

nx = ny = 513
nt = 65
rho0, rho1 = get_example_2d("example2", nx, ny)
lv = initialize(rho0, rho1, nt, dtype=jnp.float32)
initial_scaling(lv, scaling=True)
N = 30

ts_list = [int(a) for a in sys.argv[1:]] or [512, 640]
ref = None
for ts in ts_list:
    os.environ["DOTSOCP_PALLAS_TS"] = str(ts)
    os.environ["DOTSOCP_PALLAS_TS2"] = str(ts)
    cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9,
                      dtype=jnp.float32, layout="flat", use_pallas=True)
    k = InPALMKernels(cfg)
    assert k.segment_ca
    s = k.prep(lv.as_dict(), sigma=1.0)
    seg = jax.jit(lambda st, k=k: k.segment_impl(st, N))
    r = seg(s)
    _sync(r)
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        r = seg(s)
        _sync(r)
        best = min(best, (time.time() - t0) / N)
    out = jax.device_get(r.q.q0)
    if ref is None:
        ref = out
        tag = "(ref)"
    else:
        err = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) or 1))
        tag = f"rel_err_vs_ref={err:.2e}"
    print(f"TS={ts:4d}: CA segment {best*1e3:7.2f} ms/iter  {tag}", flush=True)
