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
