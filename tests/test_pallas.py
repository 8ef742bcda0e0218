"""Pallas kernels vs their jnp counterparts (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dotsocp_tpu.ops.geometry import Geometry
from dotsocp_tpu.ops.cone import proj_soc
from dotsocp_tpu.ops.sgs import make_sgs

pltpu = pytest.importorskip("jax.experimental.pallas.tpu")


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu_mod

    with pltpu_mod.force_tpu_interpret_mode():
        yield


def test_pallas_sgs_matches_jnp(rng):
    from dotsocp_tpu.ops.pallas_kernels import make_sgs_pallas

    geom = Geometry(nt=5, space=(9, 17))
    D = 0.8
    ref = make_sgs(geom, D, dtype=jnp.float32)
    pal = make_sgs_pallas(geom, D, dtype=jnp.float32)
    phi = jnp.asarray(rng.standard_normal(geom.phi_shape), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(geom.phi_shape), jnp.float32)
    a = ref.sweep(phi, rhs, its=2)
    b = pal.sweep(phi, rhs, its=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pallas_cone_matches_jnp(rng):
    from dotsocp_tpu.ops.pallas_kernels import cone_project_diff_pallas

    z2 = jnp.asarray(rng.standard_normal((10, 4, 9, 17)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((10, 4, 9, 17)), jnp.float32)
    ref = proj_soc(z2 - beta)
    out = cone_project_diff_pallas(z2, beta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pallas_sgs_tiled_matches_jnp(rng):
    """Row-tiled halo sweep (for fields above the whole-field VMEM budget)
    vs the jnp reference, including chained sweeps and edge tiles."""
    from dotsocp_tpu.ops.pallas_kernels import make_sgs_sweep_pallas_tiled

    geom = Geometry(nt=7, space=(29, 17))
    D = 0.8
    ref = make_sgs(geom, D, dtype=jnp.float32)
    tiled = make_sgs_sweep_pallas_tiled(geom, D, jnp.float32, tile_rows=4,
                                        interpret=True)
    assert tiled is not None
    phi = jnp.asarray(rng.standard_normal(geom.phi_shape), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(geom.phi_shape), jnp.float32)
    a = phi
    b = phi
    for _ in range(2):
        a = ref.sweep(a, rhs, its=1)
        b = tiled(b, rhs)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6)


def _fused_pair(problem, n, nt, ndim):
    from dotsocp_tpu.algorithms.core import LevelConfig
    from dotsocp_tpu.algorithms.variants import InPALMKernels
    from dotsocp_tpu.multilevel.level import initial_scaling, initialize

    if ndim == 1:
        from dotsocp_tpu.models.examples import get_example_1d

        rho0, rho1 = get_example_1d(problem, n)
    else:
        from dotsocp_tpu.models.examples import get_example_2d

        rho0, rho1 = get_example_2d(problem, n, n)
    lv = initialize(rho0, rho1, nt, dtype=jnp.float32)
    initial_scaling(lv, scaling=True)

    def mk(up):
        cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9,
                          dtype=jnp.float32, layout="flat", use_pallas=up)
        return InPALMKernels(cfg)

    return mk(False), mk(True), lv


@pytest.mark.parametrize("ndim", [1, 2])
def test_fused_flat_step_matches_jnp(ndim):
    """The fused Pallas step (z-step -> q-step -> multipliers) must track
    the jnp flat path to f32 rounding over several iterations."""
    k0, k1, lv = _fused_pair(
        "gaussian" if ndim == 1 else "example2", 33 if ndim == 1 else 17, 7,
        ndim,
    )
    assert k1._fused is not None
    s0 = k0.prep(lv.as_dict(), sigma=1.0)
    s1 = k1.prep(lv.as_dict(), sigma=1.0)
    for _ in range(5):
        s0 = k0.run_one(s0)
        s1 = k1.run_one(s1)
    for name in ("phi", "z", "beta"):
        a = np.asarray(getattr(s0, name))
        b = np.asarray(getattr(s1, name))
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)
    for name in ("q", "alpha"):
        for x, y in zip(jax.tree.leaves(getattr(s0, name)),
                        jax.tree.leaves(getattr(s1, name))):
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(x), rtol=2e-5, atol=2e-6
            )


@pytest.mark.slow
def test_fused_flat_step_weighted_matches_jnp():
    """Weighted q-step kernel (w*(A phi + alpha) + BF^T x) / diag must track
    the jnp weighted flat path (``solver_wsocp_inPALM.m:198-222``)."""
    from dotsocp_tpu.algorithms.core import LevelConfig
    from dotsocp_tpu.algorithms.variants import InPALMKernels
    from dotsocp_tpu.models import wdot2d as W
    from dotsocp_tpu.multilevel.level import initial_scaling, initialize

    n, nt = 17, 7
    rho0, rho1 = W.get_example_w2d("example1", n, n)
    barrier = W.barrier_circle_pillar()
    weight = W.get_weight_by_barrier(n, n, nt, barrier)
    rho0, rho1, _ = W.ensure_barrier_validity(rho0, rho1, barrier)
    lv = initialize(rho0, rho1, nt, dtype=jnp.float32, weight=weight)
    initial_scaling(lv, scaling=True)

    def mk(up):
        cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9,
                          weighted=True, dtype=jnp.float32, layout="flat",
                          use_pallas=up)
        return InPALMKernels(cfg, lv.weight)

    k0, k1 = mk(False), mk(True)
    assert k1._fused is not None
    assert k1.segment_ca
    s0 = k0.prep(lv.as_dict(), sigma=1.0)
    s1 = k1.prep(lv.as_dict(), sigma=1.0)
    for _ in range(5):
        s0 = k0.run_one(s0)
        s1 = k1.run_one(s1)
    for name in ("phi", "z", "beta"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)), np.asarray(getattr(s0, name)),
            rtol=2e-5, atol=2e-6,
        )
    for name in ("q", "alpha"):
        for x, y in zip(jax.tree.leaves(getattr(s0, name)),
                        jax.tree.leaves(getattr(s1, name))):
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(x), rtol=2e-5, atol=2e-6
            )
    # weighted x-carry segment: boundary state matches the plain steps
    s_seg = k1.prep(lv.as_dict(), sigma=1.0)
    s_seg = k1.run_segment(s_seg, 5)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s_seg)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-6, atol=2e-6)


@pytest.mark.slow
def test_fused_flat_step_kkt_consistent():
    """KKT residuals computed on the fused-step iterate must agree with the
    jnp-step iterate (the stopping rule sees the same numbers)."""
    k0, k1, lv = _fused_pair("example2", 17, 7, 2)
    s0 = k0.prep(lv.as_dict(), sigma=1.0)
    s1 = k1.prep(lv.as_dict(), sigma=1.0)
    for _ in range(3):
        s0 = k0.run_one(s0)
        s1 = k1.run_one(s1)
    r0 = jax.device_get(k0.kkt(s0))
    r1 = jax.device_get(k1.kkt(s1))
    # atol floors numerically-zero residuals (~1e-9 at early iterations)
    np.testing.assert_allclose(r1["kkt_org"], r0["kkt_org"], rtol=1e-3,
                               atol=1e-7)


@pytest.mark.slow
@pytest.mark.parametrize("k", [1, 4])
def test_ca_fused_segment_matches_plain_steps(k):
    """The CA-fused x-carry segment (x-step prologue + cx_step iterations +
    cx_final boundary step, core.Kernels.segment_impl) must leave a
    boundary state matching k plain fused steps op for op: inside the
    segment the z slot carries x = z + beta (one cone read in the q-step),
    and the CA kernel is the beta multiplier fused with the next z-step.
    Allowed deviations: FMA contraction and the (z+beta)-beta
    reconstruction — 1-2 ulp in f32 per iteration."""
    k0, k1, lv = _fused_pair("example2", 17, 7, 2)
    assert k1.segment_ca
    assert not k0.segment_ca  # jnp path keeps the plain loop
    s_plain = k1.prep(lv.as_dict(), sigma=1.0)
    s_seg = k1.prep(lv.as_dict(), sigma=1.0)
    for _ in range(k):
        s_plain = k1.run_one(s_plain)
    s_seg = k1.run_segment(s_seg, k)
    for a, b in zip(jax.tree.leaves(s_plain), jax.tree.leaves(s_seg)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-6, atol=2e-6)


@pytest.mark.slow
def test_fused_flat_step_matches_jnp_3d():
    """3D fused step (C = 14 cone columns, three spatial stride shifts) —
    a beyond-reference capability; the kernels are dimension-generic."""
    from dotsocp_tpu.algorithms.core import LevelConfig
    from dotsocp_tpu.algorithms.variants import InPALMKernels
    from dotsocp_tpu.multilevel.level import initial_scaling, initialize

    rng = np.random.RandomState(0)
    n, nt = 9, 5
    rho0 = rng.rand(n, n, n) + 0.5
    rho1 = rng.rand(n, n, n) + 0.5
    rho0 /= rho0.mean()
    rho1 /= rho1.mean()
    lv = initialize(rho0, rho1, nt, dtype=jnp.float32)
    initial_scaling(lv, scaling=True)

    def mk(up):
        cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9,
                          dtype=jnp.float32, layout="flat", use_pallas=up)
        return InPALMKernels(cfg)

    k0, k1 = mk(False), mk(True)
    assert k1._fused is not None
    assert k1.segment_ca
    s0 = k0.prep(lv.as_dict(), sigma=1.0)
    s1 = k1.prep(lv.as_dict(), sigma=1.0)
    for _ in range(4):
        s0 = k0.run_one(s0)
        s1 = k1.run_one(s1)
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-5, atol=3e-6)
    # CA segment parity in 3D
    s_seg = k1.prep(lv.as_dict(), sigma=1.0)
    s_seg = k1.run_segment(s_seg, 4)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s_seg)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-5, atol=3e-6)


def test_pallas_shift_matches_pad_slice():
    """make_pallas_shift (neighbor-block lane shift) must be bit-equal to
    the jnp pad+slice shifts it replaces, including zero-fill edges, plane
    extraction from cone arrays, and non-divisible S."""
    from dotsocp_tpu.ops.pallas_kernels import (
        _flat_sbwd, _flat_sfwd, make_pallas_shift,
    )

    rng = np.random.default_rng(3)
    R, S = 9, 1500  # S not a multiple of the tile; forces a padded block
    x2 = jnp.asarray(rng.standard_normal((R, S)).astype(np.float32))
    cone = jnp.asarray(rng.standard_normal((6, R, S)).astype(np.float32))
    for k, ts in ((1, 512), (37, 512), (510, 512), (513, 1024)):
        for forward in (True, False):
            fn = make_pallas_shift(R, S, k, forward, jnp.float32,
                                   interpret=True, ts=ts)
            ref = (_flat_sfwd if forward else _flat_sbwd)(x2, k, S)
            np.testing.assert_array_equal(np.asarray(fn(x2)), np.asarray(ref))
            ref_p = (_flat_sfwd if forward else _flat_sbwd)(cone[4], k, S)
            np.testing.assert_array_equal(
                np.asarray(fn(cone, plane=4)), np.asarray(ref_p))
    # strides beyond the window are rejected (callers fall back to jnp)
    assert make_pallas_shift(R, S, 600, True, jnp.float32,
                             interpret=True, ts=512) is None
