import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from dotsocp_tpu.algorithms.core import LevelConfig
from dotsocp_tpu.algorithms.variants import InPALMKernels
from dotsocp_tpu.multilevel.level import initial_scaling, initialize
from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.ops.grad import grad, grad_T
from dotsocp_tpu.ops.cone import bfd, bfd_T, proj_soc

nx = ny = 129; nt = 33
rho0, rho1 = get_example_2d("DOTmark_4stitch", nx, ny)
lv = initialize(rho0, rho1, nt, dtype=jnp.float32)
initial_scaling(lv, scaling=True)
cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9, dtype=jnp.float32)
k = InPALMKernels(cfg)
s = k.prep(lv.as_dict(), sigma=1.0)
scale_bf = cfg.E / cfg.D
diag_q_inv = s.diag_q_inv
if s.z2 is None:
    s = s._replace(z2=k.ops.bfd(s.q, scale_bf, cfg.E / s.dScale))
geom = k.geom
C, M, zshape = geom.cone_cols, geom.n_cells, geom.z_shape

def step_flat(carry):
    phi, q, zf, alpha, bf, z2f, c, dScale = carry
    rhs = cfg.D * grad_T(geom, q - alpha) + c
    phi = k.poisson.solve(rhs, scale=1.0 / (cfg.D * cfg.D))
    z = proj_soc(z2f - bf)
    tmp_q = cfg.D * grad(geom, phi)
    q2 = bfd_T(geom, (z + bf).reshape(zshape), scale_bf)
    q = (tmp_q + alpha + q2) * diag_q_inv
    z2f = bfd(geom, q, scale_bf, cfg.E / dScale).reshape(C, M)
    alpha = alpha + cfg.tau * (tmp_q - q)
    bf = bf + cfg.tau * (z - z2f)
    return (phi, q, z, alpha, bf, z2f, c, dScale)

carry = (s.phi, s.q, s.z.reshape(C, M), s.alpha, s.beta.reshape(C, M),
         s.z2.reshape(C, M), s.c, s.dScale)
seg = jax.jit(lambda cr: jax.lax.fori_loop(0, 10, lambda _, x: step_flat(x), cr))
t0 = time.time()
r = seg(carry); jax.block_until_ready(r)
print(f"flat compile+first: {time.time()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(10):
    r = seg(r)
jax.block_until_ready(r)
print(f"flat layout: {(time.perf_counter()-t0)/100*1e3:.3f} ms/iter (structured baseline: 1.162)")
