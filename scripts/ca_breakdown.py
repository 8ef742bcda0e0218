"""Round-5 probe: per-piece timing of the production CA iteration at
513^2x65 (qx_step / cx_step / phi-solve / full chain), amortized over
fori segments with a device_get fence. Locates the residual gap between
the measured ~16 ms/iter CA segment and the ~9-11 ms traffic bound now
that shifts are in-kernel and tile geometry + neighbor-stream count are
ruled out (ts640_probe: TS=640 is a wash).

  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/ca_breakdown.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from dotsocp_tpu.algorithms.core import LevelConfig
from dotsocp_tpu.algorithms.variants import InPALMKernels
from dotsocp_tpu.multilevel.level import initial_scaling, initialize
from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.ops.staggered import Staggered
from dotsocp_tpu.utils.profiling import _sync

nx = ny = 513
nt = 65
rho0, rho1 = get_example_2d("example2", nx, ny)
lv = initialize(rho0, rho1, nt, dtype=jnp.float32)
initial_scaling(lv, scaling=True)
cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9, dtype=jnp.float32,
                  layout="flat", use_pallas=True)
k = InPALMKernels(cfg)
assert k.segment_ca
s0 = k.prep(lv.as_dict(), sigma=1.0)
s = s0._replace(z=k._fresh_x(s0))  # x-carry state
f = k._fused
ops = k.ops
tau_v = jnp.asarray(cfg.tau, jnp.float32)
N = 30


def timeit(name, fn, state, gb=None):
    seg = jax.jit(lambda st: jax.lax.fori_loop(0, N, lambda _, x: fn(x), st))
    r = seg(state); _sync(r)
    best = float("inf")
    for _ in range(4):
        t0 = time.time(); r = seg(state); _sync(r)
        best = min(best, (time.time() - t0) / N)
    eff = f"  {gb/best:6.0f} GB/s" if gb else ""
    print(f"{name:42s} {best*1e3:7.2f} ms/iter{eff}", flush=True)
    return best


def qx_only(st):
    q0n, bns, a0n, abns = f["qx_step"](
        st.phi, st.z, st.alpha.q0, list(st.alpha.bs),
        st.diag_q_inv.q0, list(st.diag_q_inv.bs),
        st.D, st.E / st.D, tau_v)
    return st._replace(q=Staggered(q0=q0n, bs=tuple(bns)),
                       alpha=Staggered(q0=a0n, bs=tuple(abns)))


def cx_only(st):
    beta, xnew = f["cx_step"](st.beta, st.z, st.q.q0, list(st.q.bs),
                              st.E / st.D, st.E / st.dScale, tau_v)
    return st._replace(beta=beta, z=xnew)


def phi_only(st):
    rhs = st.D * ops.grad_T(st.q - st.alpha) + st.c
    phi = k._poisson_solve(st, rhs)
    return st._replace(phi=phi)


def rhs_only(st):
    rhs = st.D * ops.grad_T(st.q - st.alpha) + st.c
    return st._replace(phi=rhs)


def full(st):
    return k._step_fused_x(st, final=False)


S4 = 513 * 513 * 4
cone = 10 * 64 * S4
node = 65 * S4
cell = 64 * S4
gb_qx = (node + cone + cell * 3 + node * 2 + cell * 2 + node * 4) / 1e9
gb_cx = (cell + node * 2 + cone * 2 + cone * 2) / 1e9
gb_phi = (cell + node * 2 + cell * 2 + node + node * 2) / 1e9  # rhs+transforms rough
timeit("full CA iteration", full, s)
timeit("qx_step alone", qx_only, s, gb=gb_qx)
timeit("cx_step alone", cx_only, s, gb=gb_cx)
timeit("phi-solve (rhs + DCT)", phi_only, s)
timeit("rhs build only (grad_T)", rhs_only, s)
