"""TPU aliasing regression check (ADVICE r3): every fused Pallas kernel
writes its outputs in place via hand-computed ``input_output_aliases``
index maps, but interpret mode (the CPU test suite) DISABLES aliasing —
so an index-map regression would only surface as silent corruption or a
wedged remote compile on TPU. This script runs on the real chip and
compares a multi-iteration fused segment (aliased Pallas kernels) against
the plain XLA flat step from the SAME prepped state.

Pass criterion: max |pallas - xla| relative error <= 2e-5 on every state
leaf after K iterations (the kernels mirror the jnp op order exactly;
observed drift is FMA-contraction-level, ~1e-7/iter).

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_alias_check.py
Opt-in pytest wrapper: tests/test_tpu_alias.py (DOTSOCP_TPU_TESTS=1).
Exits 0 on pass, 1 on mismatch (printing the worst leaf).
"""
import sys

sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

from dotsocp_tpu.algorithms.core import LevelConfig
from dotsocp_tpu.algorithms.variants import InPALMKernels
from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.multilevel.level import initial_scaling, initialize

K = 10  # iterations per segment comparison
RTOL = 2e-5


def compare(nx, ny, nt, weighted=False):
    if weighted:
        from dotsocp_tpu.models.wdot2d import (
            barrier_love_heart, ensure_barrier_validity, get_example_w2d,
            get_weight_by_barrier,
        )

        rho0, rho1 = get_example_w2d("love-heart", nx, ny)
        barrier = barrier_love_heart()
        weight = get_weight_by_barrier(nx, ny, nt, barrier)
        rho0, rho1, _ = ensure_barrier_validity(rho0, rho1, barrier)
    else:
        rho0, rho1 = get_example_2d("example2", nx, ny)
        weight = None
    lv = initialize(rho0, rho1, nt, dtype=jnp.float32, weight=weight)
    initial_scaling(lv, scaling=True)

    # Two aliased paths, each compared against the plain XLA step from the
    # same prepped state:
    #   'ca'    — segment_impl (x_step / qx_step / cx_step / cx_final)
    #   'plain' — the non-CA fused step (z_step / q_step / beta_step),
    #             which _step dispatches to when _fused is built. This is
    #             the path the ADVICE r4 phi-alias finding lived on: the
    #             state carry + KKT reads of s.phi after q_step mean phi
    #             must SURVIVE the call — covered here because 'phi' is one
    #             of the compared state leaves.
    states = {}
    for use_pallas in (False, True):
        cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9,
                          dtype=jnp.float32, layout="flat",
                          use_pallas=use_pallas)
        k = InPALMKernels(cfg, weight=lv.weight)
        if use_pallas:
            assert k._fused is not None, "fused pallas step not built"
            assert k.segment_ca, "CA segment not enabled"
        s = k.prep(lv.as_dict(), sigma=1.0)
        seg = jax.jit(lambda st, k=k: k.segment_impl(st, K))
        fused = jax.jit(lambda st, k=k: jax.lax.fori_loop(
            0, K, lambda _, x: k._step(x), st))
        states[use_pallas] = {"ca": jax.device_get(seg(s)),
                              "plain": jax.device_get(fused(s))}

    ok = True
    tag = "weighted" if weighted else "plain"
    for path in ("ca", "plain"):
        worst = (0.0, "")
        sp, sx = states[True][path], states[False][path]
        for name in sp._fields:
            a, b = getattr(sp, name), getattr(sx, name)
            for leaf_a, leaf_b in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                la, lb = np.asarray(leaf_a), np.asarray(leaf_b)
                scale = np.max(np.abs(lb)) or 1.0
                err = float(np.max(np.abs(la - lb)) / scale)
                if err > worst[0]:
                    worst = (err, name)
        status = "PASS" if worst[0] <= RTOL else "FAIL"
        print(f"{status} {tag}/{path} {nx}x{ny}x{nt}: worst rel err "
              f"{worst[0]:.2e} on '{worst[1]}' after {K} aliased iterations",
              flush=True)
        ok &= worst[0] <= RTOL
    return ok


def main():
    if jax.devices()[0].platform != "tpu":
        print("SKIP: no TPU (aliases are disabled in interpret mode; "
              "this check only means something on hardware)")
        return 0
    ok = compare(65, 65, 17)
    ok &= compare(65, 65, 17, weighted=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
