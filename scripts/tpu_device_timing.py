import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.multilevel.solve import solve_dot

t0 = time.time()
rho0, rho1 = get_example_2d("DOTmark_4stitch", 129, 129)
out, hml, h = solve_dot(rho0, rho1, 33, 1, {"tol":1e-4,"maxit":600,"driver":"device"},
                        "inPALM", dtype=jnp.float32, verbose=True)
print("total wall (incl compile):", time.time()-t0)
print("iters:", out["levels"][0]["iters"], "solve_time:", out["levels"][0]["time"])
# second run - compile cached
t0 = time.time()
out, hml, h = solve_dot(rho0, rho1, 33, 1, {"tol":1e-4,"maxit":600,"driver":"device"},
                        "inPALM", dtype=jnp.float32, verbose=False)
print("second run wall:", time.time()-t0, "iters:", out["levels"][0]["iters"])
