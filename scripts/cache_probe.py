import sys, time, logging
sys.path.insert(0, "/root/repo")
logging.basicConfig(level=logging.INFO)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.multilevel.solve import solve_dot
t0 = time.time()
rho0, rho1 = get_example_2d("example2", 17, 17)
out, _, h = solve_dot(rho0, rho1, 5, 1, {"tol":1e-4,"maxit":200,"driver":"device"},
                      "inPALM", dtype=jnp.float32, verbose=False)
print(f"fresh process: {time.time()-t0:.1f}s, iters={out['levels'][0]['iters']}")
