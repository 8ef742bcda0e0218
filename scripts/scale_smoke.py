"""BASELINE scale config smoke: 512x512x64 f32 on one chip — fits 16GB HBM
(~8.6GB state) and measures per-iteration wall time at production scale."""
import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from dotsocp_tpu.algorithms.core import LevelConfig
from dotsocp_tpu.algorithms.variants import InPALMKernels
from dotsocp_tpu.multilevel.level import initial_scaling, initialize
from dotsocp_tpu.models.examples import get_example_2d

nx = ny = 513
nt = 65
rho0, rho1 = get_example_2d("example2", nx, ny)
lv = initialize(rho0, rho1, nt, dtype=jnp.float32)
initial_scaling(lv, scaling=True)
layout = sys.argv[1] if len(sys.argv) > 1 else "flat"
cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9, dtype=jnp.float32,
                  layout=layout)
k = InPALMKernels(cfg)
s = k.prep(lv.as_dict(), sigma=1.0)
print("state bytes:", sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(s)) / 1e9, "GB")
seg = jax.jit(lambda st: jax.lax.fori_loop(0, 10, lambda _, x: k._step(x), st))
t0 = time.time()
r = seg(s); jax.block_until_ready(r)
print(f"compile+first 10 iters: {time.time()-t0:.1f}s")
t0 = time.time()
for _ in range(3):
    r = seg(r)
jax.block_until_ready(r)
dt = (time.time() - t0) / 30
print(f"per-iteration at 513x513x65 f32 ({layout}): {dt*1e3:.1f} ms")
res = jax.device_get(k.kkt(r)["kkt_org"])
print("kkt after 40 iters:", res)
