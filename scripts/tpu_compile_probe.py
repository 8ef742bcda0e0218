import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
print("cache dir:", enable_compilation_cache())
import jax, jax.numpy as jnp
from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.multilevel.solve import solve_dot

t0 = time.time()
rho0, rho1 = get_example_2d("example2", 17, 17)
out, _, h = solve_dot(rho0, rho1, 5, 1, {"tol":1e-4,"maxit":200,"driver":"device"},
                      "inPALM", dtype=jnp.float32, verbose=False)
print(f"tiny device solve: {time.time()-t0:.1f}s wall, iters={out['levels'][0]['iters']}", flush=True)
t0 = time.time()
out, _, h = solve_dot(rho0, rho1, 5, 1, {"tol":1e-4,"maxit":200,"driver":"device"},
                      "inPALM", dtype=jnp.float32, verbose=False)
print(f"tiny again (same process): {time.time()-t0:.1f}s", flush=True)
