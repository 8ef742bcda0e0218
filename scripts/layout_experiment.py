"""Measure: does storing z-layout arrays flat (C, M) beat the structured
(C, nt-1, ny, nx) layout? The structured layout pads lanes 129->256 (~2x
waste on the dominant arrays); flat pays two relayout copies per iteration
at the BFd boundaries instead."""
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
C = geom.cone_cols
M = geom.n_cells
zshape = geom.z_shape

def step_flat(carry):
    phi, q, zf, alpha, bf, z2f, c, dScale = carry
    rhs = cfg.D * grad_T(geom, q - alpha) + c
    phi = k.poisson.solve(rhs, scale=1.0 / (cfg.D * cfg.D))
    z = proj_soc(z2f - bf)                     # flat (C, M)
    tmp_q = cfg.D * grad(geom, phi)
    q2 = bfd_T(geom, (z + bf).reshape(zshape), scale_bf)
    q = (tmp_q + alpha + q2) * diag_q_inv
    z2f = bfd(geom, q, scale_bf, cfg.E / dScale).reshape(C, M)
    resi_beta = z - z2f
    alpha = alpha + cfg.tau * (tmp_q - q)
    bf = bf + cfg.tau * resi_beta
    return (phi, q, z, alpha, bf, z2f, c, dScale)

carry = (s.phi, s.q, s.z.reshape(C, M), s.alpha, s.beta.reshape(C, M),
         s.z2.reshape(C, M), s.c, s.dScale)

seg_flat = jax.jit(lambda cr: jax.lax.fori_loop(0, 10, lambda _, x: step_flat(x), cr))
seg_base = jax.jit(lambda st: jax.lax.fori_loop(0, 10, lambda _, x: k._step(x), st))

for name, seg, arg in (("structured", seg_base, s), ("flat", seg_flat, carry)):
    r = seg(arg); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = seg(r)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 100
    print(f"{name:11s}: {dt*1e3:.3f} ms/iter")
