"""Profile per-phase device times at the bench config size."""
import sys, time
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from dotsocp_tpu.algorithms.core import LevelConfig
from dotsocp_tpu.algorithms.variants import InPALMKernels
from dotsocp_tpu.multilevel.level import initial_scaling, initialize
from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.utils.profiling import profile_phases, format_table

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 129
nt = int(sys.argv[2]) if len(sys.argv) > 2 else 33
rho0, rho1 = get_example_2d("DOTmark_4stitch", nx, nx)
lv = initialize(rho0, rho1, nt, dtype=jnp.float32)
initial_scaling(lv, scaling=True)
cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9, dtype=jnp.float32)
k = InPALMKernels(cfg)
s = k.prep(lv.as_dict(), sigma=1.0)
prof = profile_phases(k, s, iters=50)
print(format_table(prof))

seg = jax.jit(lambda st: jax.lax.fori_loop(0, 10, lambda _, x: k._step(x), st))
r = seg(s); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(10):
    r = seg(r)
jax.block_until_ready(r)
dt = time.perf_counter() - t0
print(f"10-step segment x10: {dt/10*1e3:.2f} ms/segment => {dt/100*1e3:.3f} ms/iter")

# single dispatch latency
one = jax.jit(lambda st: st.sigma + 1)
r1 = one(s); jax.block_until_ready(r1)
t0 = time.perf_counter()
for _ in range(20):
    jax.block_until_ready(one(s))
print(f"tiny dispatch roundtrip: {(time.perf_counter()-t0)/20*1e3:.2f} ms")
