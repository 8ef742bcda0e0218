"""Golden-trajectory regression tests.

Replays the canonical configs of tests/golden/generate.py on the host
driver in float64 and compares the full run history against the committed
fixtures: per-check iteration numbers must match EXACTLY (they encode the
KKT cadence, sigma-update and rescale scheduling), and the KKT residual
vectors to tight float64 tolerance. Any drift in the sigma tables, the
rescale state machine, the cadence logic, InitialScaling/E2 feedback, or
the multilevel plumbing fails here (``runHist`` content per
``solver_socp_inPALM.m:111-114``).

Regenerate after an *intentional* behavioural change:
    python tests/golden/generate.py
"""
import os

import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "golden")

_NAMES = [
    f[:-4] for f in sorted(os.listdir(FIXTURE_DIR)) if f.endswith(".npz")
]


@pytest.fixture(autouse=True)
def _procedural_assets(monkeypatch):
    monkeypatch.setenv("DOTSOCP_RESOURCES", "procedural")


# heavyweights (30-240 s each); the fast default set keeps one golden per
# family small enough for per-change runs
_SLOW_NAMES = {
    "dot2d_example2_65x17_l2_sgsinpalm",
    "dot2d_example2_65x17_l2_accadmm",
    "dot2d_dotmark_65x17_l2_inpalm",
    "wdot2d_loveheart_65x17_l2_inpalm",
}


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_NAMES else n
     for n in _NAMES],
)
def test_golden_trajectory(name):
    import sys

    sys.path.insert(0, os.path.join(FIXTURE_DIR))
    import generate

    ref = np.load(os.path.join(FIXTURE_DIR, name + ".npz"))
    got = generate.run_config(name)

    assert got["level_iters"].tolist() == ref["level_iters"].tolist(), (
        "per-level iteration counts drifted"
    )
    assert got["iter"].tolist() == ref["iter"].tolist(), (
        "KKT-check schedule drifted"
    )
    assert bool(got["mass_ok"]) == bool(ref["mass_ok"])
    # atol floors out reduction-order noise on numerically-zero residuals
    # (~1e-13 absolute from the threaded CPU matmul-DCT)
    np.testing.assert_allclose(got["kkt"], ref["kkt"], rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(
        got["pdGap"], ref["pdGap"], rtol=1e-6, atol=1e-10
    )
