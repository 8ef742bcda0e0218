"""Round-5 probe: the phi path is the residual cost of the CA iteration
(full 14.7 ms de-tunneled vs qx 2.9 + cx 4.4 -> ~7.4 ms for rhs+DCT).
Earlier phi_only probes were loop-invariant (no carry dependence -> XLA
hoists the body out of the fori chain and measures ~0). Every variant
here feeds its output back through the next iteration's input.

  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/phi_breakdown.py
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
from dotsocp_tpu.ops.poisson import _apply_axis
from dotsocp_tpu.utils.profiling import _sync

nx = ny = 513
nt = 65
rho0, rho1 = get_example_2d("example2", nx, ny)
lv = initialize(rho0, rho1, nt, dtype=jnp.float32)
initial_scaling(lv, scaling=True)
cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9, dtype=jnp.float32,
                  layout="flat", use_pallas=True)
k = InPALMKernels(cfg)
s = k.prep(lv.as_dict(), sigma=1.0)
ops = k.ops
poisson = k.poisson
N = 30
TUNNEL = 40e-3 / N  # one ~40 ms dispatch amortized over the chain


def timeit(name, fn, state):
    seg = jax.jit(lambda st: jax.lax.fori_loop(0, N, lambda _, x: fn(x), st))
    r = seg(state); _sync(r)
    best = float("inf")
    for _ in range(4):
        t0 = time.time(); r = seg(state); _sync(r)
        best = min(best, (time.time() - t0) / N)
    print(f"{name:44s} {best*1e3:7.2f} ms/iter ({(best-TUNNEL)*1e3:6.2f} detunneled)",
          flush=True)
    return best


# carry: phi' feeds the next rhs through a tiny additive term (cannot be
# folded; keeps a data dependence without changing magnitude)
def dep(st, phi):
    return st._replace(phi=phi)


def rhs_dep(st):
    rhs = st.D * ops.grad_T(st.q - st.alpha) + st.c + 1e-30 * st.phi
    return dep(st, rhs)


def phi_full_dep(st):
    rhs = st.D * ops.grad_T(st.q - st.alpha) + st.c + 1e-30 * st.phi
    return dep(st, poisson.solve(rhs, scale=1.0 / (st.D * st.D)))


def dct_only_dep(st):
    return dep(st, poisson.solve(st.phi, scale=1.0 / (st.D * st.D)))


inner = poisson.inner if hasattr(poisson, "inner") else poisson
geom = k.geom


def one_axis(ax):
    def f(st):
        shaped = st.phi.reshape((nt,) + geom.space)
        y = _apply_axis(inner.mats[ax], shaped, ax)
        return dep(st, y.reshape(nt, -1))
    return f


timeit("rhs build (carry-dep)", rhs_dep, s)
timeit("rhs + full DCT solve (carry-dep)", phi_full_dep, s)
timeit("DCT solve only (carry-dep)", dct_only_dep, s)
timeit("one t-axis transform", one_axis(0), s)
timeit("one y-axis transform (middle)", one_axis(1), s)
timeit("one x-axis transform (last)", one_axis(2), s)
