"""Per-phase breakdown of the fused flat step at the BASELINE scale config
(513x513x65 f32, one chip). Times, amortized over fori segments:

  - the full fused step (DCT + 3 Pallas kernels + prework)
  - the step minus the phi-solve (the 3 fused kernels + shift prework)
  - each fused kernel alone (z_step / q_step / beta_step)
  - the DCT Poisson solve alone (rhs build + dctn/idctn)
  - the KKT battery

to locate the gap between the measured ~28 ms/iter (BASELINE.md round 3)
and the ~11.5 ms traffic bound. Run on TPU:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/scale_breakdown.py
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
from dotsocp_tpu.utils.profiling import _sync  # device_get fence: block_until_ready does NOT block on axon (DESIGN.md sec 11)

nx = ny = 513
nt = 65
rho0, rho1 = get_example_2d("example2", nx, ny)
lv = initialize(rho0, rho1, nt, dtype=jnp.float32)
initial_scaling(lv, scaling=True)
cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9, dtype=jnp.float32,
                  layout="flat", use_pallas=True)
k = InPALMKernels(cfg)
assert k._fused is not None, "fused pallas step not enabled"
s = k.prep(lv.as_dict(), sigma=1.0)

N = 20


def timeit(name, fn, state, n=N, reps=3):
    seg = jax.jit(lambda st: jax.lax.fori_loop(0, n, lambda _, x: fn(x), st))
    r = seg(state)
    _sync(r)  # compile + warm (hard fence; block_until_ready is a no-op on axon)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        r = seg(state)
        _sync(r)
        best = min(best, (time.time() - t0) / n)
    print(f"{name:34s} {best*1e3:8.2f} ms/iter")
    return best


f = k._fused
ops = k.ops
tau = jnp.asarray(cfg.tau, jnp.float32)

full = timeit("full fused step", k._step, s)


def no_phi(st):
    sbf = st.E / st.D
    sd = st.E / st.dScale
    z = f["z_step"](st.q.q0, list(st.q.bs), st.beta, sbf, sd)
    q0n, bns, a0n, abns = f["q_step"](
        st.phi, z, st.beta, st.alpha.q0, list(st.alpha.bs),
        st.diag_q_inv.q0, list(st.diag_q_inv.bs), st.D, sbf, tau)
    beta = f["beta_step"](st.beta, z, q0n, bns, sbf, sd, tau)
    from dotsocp_tpu.ops.staggered import Staggered
    return st._replace(q=Staggered(q0=q0n, bs=tuple(bns)),
                       alpha=Staggered(q0=a0n, bs=tuple(abns)),
                       z=z, beta=beta)


timeit("step minus phi-solve", no_phi, s)


def phi_only(st):
    rhs = st.D * ops.grad_T(k._w(st.q) - st.alpha) + st.c
    phi = k._poisson_solve(st, rhs)
    return st._replace(phi=phi)


timeit("phi-solve (rhs + DCT)", phi_only, s)


def z_only(st):
    z = f["z_step"](st.q.q0, list(st.q.bs), st.beta, st.E / st.D,
                    st.E / st.dScale)
    return st._replace(z=z)


timeit("z_step kernel", z_only, s)


def q_only(st):
    from dotsocp_tpu.ops.staggered import Staggered
    q0n, bns, a0n, abns = f["q_step"](
        st.phi, st.z, st.beta, st.alpha.q0, list(st.alpha.bs),
        st.diag_q_inv.q0, list(st.diag_q_inv.bs), st.D, st.E / st.D, tau)
    return st._replace(q=Staggered(q0=q0n, bs=tuple(bns)),
                       alpha=Staggered(q0=a0n, bs=tuple(abns)))


timeit("q_step kernel (+shift prework)", q_only, s)


def b_only(st):
    beta = f["beta_step"](st.beta, st.z, st.q.q0, list(st.q.bs),
                          st.E / st.D, st.E / st.dScale, tau)
    return st._replace(beta=beta)


timeit("beta_step kernel", b_only, s)

# KKT battery, single dispatch (runs every 3-40 iters in production)
kkt = jax.jit(k._kkt)
r = kkt(s)
_sync(r)
t0 = time.time()
for _ in range(3):
    r = kkt(s)
    _sync(r)
print(f"{'KKT battery (per call)':34s} {(time.time()-t0)/3*1e3:8.2f} ms")

gb = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(s)) / 1e9
print(f"state = {gb:.2f} GB; full step at 819 GB/s roofline needs "
      f"~{full*819/1e0:.0f} GB/iter equivalent traffic")

# x-carry kernels standalone (st.z holds x inside segments; feeding the
# outputs back through the state keeps the loop body non-hoistable)
if getattr(k, "segment_ca", False):
    from dotsocp_tpu.ops.staggered import Staggered

    def qx_only(st):
        q0n, bns, a0n, abns = f["qx_step"](
            st.phi, st.z, st.alpha.q0, list(st.alpha.bs),
            st.diag_q_inv.q0, list(st.diag_q_inv.bs), st.D,
            st.E / st.D, tau)
        return st._replace(q=Staggered(q0=q0n, bs=tuple(bns)),
                           alpha=Staggered(q0=a0n, bs=tuple(abns)))

    timeit("qx_step kernel (+shift prework)", qx_only, s)

    def cx_only(st):
        beta, xn = f["cx_step"](st.beta, st.z, st.q.q0, list(st.q.bs),
                                st.E / st.D, st.E / st.dScale, tau)
        return st._replace(beta=beta, z=xn)

    timeit("cx_step kernel (+shift prework)", cx_only, s)

# CA-fused segment (beta-step fused with next z-step): k-iteration segment
if getattr(k, "segment_ca", False):
    for n in (N, 40):
        seg = jax.jit(lambda st, n=n: k.segment_impl(st, n))
        r = seg(s)
        _sync(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            r = seg(s)
            _sync(r)
            best = min(best, (time.time() - t0) / n)
        print(f"{'CA-fused segment (k=%d)' % n:34s} {best*1e3:8.2f} ms/iter")
