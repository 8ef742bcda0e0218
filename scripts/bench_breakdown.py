import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.multilevel.solve import solve_dot

rho0, rho1 = get_example_2d("DOTmark_4stitch", 129, 129)
# warm pass
solve_dot(rho0, rho1, 33, 3, {"tol":1e-4,"maxit":3000}, "inPALM",
          dtype=jnp.float32, verbose=False)
t0 = time.time()
out, hml, h = solve_dot(rho0, rho1, 33, 3, {"tol":1e-4,"maxit":3000}, "inPALM",
                        dtype=jnp.float32, verbose=True)
total = time.time() - t0
lv_times = [L["time"] for L in out["levels"]]
print(f"total={total:.2f}s, in-level={sum(lv_times):.2f}s "
      f"({[f'{t:.2f}' for t in lv_times]}), "
      f"between-levels+recover={total-sum(lv_times):.2f}s")
