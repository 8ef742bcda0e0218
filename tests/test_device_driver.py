"""The device-resident while_loop driver must reproduce the host driver's
decision trajectory exactly: same iteration counts, same check points, same
final residuals (they encode the same reference state machine)."""
import numpy as np
import pytest

from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.multilevel.solve import solve_dot


@pytest.mark.parametrize("method", [
    "inPALM",
    pytest.param("PALM", marks=pytest.mark.slow),
    pytest.param("acc-ADMM", marks=pytest.mark.slow),
])
def test_device_matches_host(method):
    rho0, rho1 = get_example_2d("example2", 33, 33)
    outs = {}
    for drv in ("host", "device"):
        out, _, h = solve_dot(
            rho0, rho1, nt=9, level_n=1,
            opts={"tol": 1e-4, "maxit": 3000, "driver": drv},
            method=method, verbose=False,
        )
        outs[drv] = (out, h)
    (oh, hh), (od, hd) = outs["host"], outs["device"]
    assert oh["levels"][0]["iters"] == od["levels"][0]["iters"]
    np.testing.assert_array_equal(hh["iter"], hd["iter"])
    np.testing.assert_allclose(hh["kkt"], hd["kkt"], rtol=1e-5, atol=1e-12)
    # device sigma-table math runs in f32 (host: f64) -> harmless 1e-7-level
    # drift in the recovered field
    np.testing.assert_allclose(
        np.asarray(oh["rho"]), np.asarray(od["rho"]), rtol=1e-3, atol=1e-4
    )


@pytest.mark.slow
def test_sgs_device_matches_host():
    """The on-device sGS win-count sigma machinery reproduces the host
    driver's trajectory exactly."""
    rho0, rho1 = get_example_2d("example2", 33, 33)
    outs = {}
    for drv in ("host", "device"):
        out, _, h = solve_dot(
            rho0, rho1, nt=9, level_n=1,
            opts={"tol": 1e-4, "maxit": 6000, "driver": drv},
            method="sGS-inPALM", verbose=False,
        )
        outs[drv] = (out, h)
    (oh, hh), (od, hd) = outs["host"], outs["device"]
    assert oh["levels"][0]["iters"] == od["levels"][0]["iters"]
    np.testing.assert_array_equal(hh["iter"], hd["iter"])
    np.testing.assert_allclose(hh["kkt"], hd["kkt"], rtol=1e-4, atol=1e-12)


@pytest.mark.slow
def test_acc_sgs_device_matches_host():
    rho0, rho1 = get_example_2d("example2", 33, 33)
    outs = {}
    for drv in ("host", "device"):
        out, _, h = solve_dot(
            rho0, rho1, nt=9, level_n=1,
            opts={"tol": 1e-4, "maxit": 6000, "driver": drv},
            method="acc-sGS-ADMM", verbose=False,
        )
        outs[drv] = (out, h)
    (oh, hh), (od, hd) = outs["host"], outs["device"]
    assert oh["levels"][0]["iters"] == od["levels"][0]["iters"]
    np.testing.assert_array_equal(hh["iter"], hd["iter"])
    np.testing.assert_allclose(hh["kkt"], hd["kkt"], rtol=1e-4, atol=1e-12)


@pytest.mark.slow
def test_device_multilevel():
    rho0, rho1 = get_example_2d("example1", 33, 33)
    out, _, h = solve_dot(
        rho0, rho1, nt=9, level_n=3,
        opts={"tol": 1e-4, "maxit": 3000, "driver": "device"},
        method="inPALM", verbose=False,
    )
    k = h["kkt"][-1]
    assert max(k[0], k[2], k[5], k[6]) < 1e-4
    assert out["mass_ok"]
