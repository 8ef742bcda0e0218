"""Opt-in TPU hardware test: aliased Pallas kernels vs plain XLA step.

The CPU suite runs every kernel-parity test in interpret mode, where
``input_output_aliases`` is disabled — so the hand-computed alias index
maps (the riskiest in-place behavior in ops/pallas_kernels.py) are never
executed by default CI. This wrapper runs ``scripts/tpu_alias_check.py``
in a fresh process (the session conftest pins this process to CPU) when
``DOTSOCP_TPU_TESTS=1`` and a TPU is reachable.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("DOTSOCP_TPU_TESTS") != "1",
    reason="TPU hardware test; enable with DOTSOCP_TPU_TESTS=1",
)
def test_aliased_kernels_match_xla_on_tpu():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # drop the conftest's virtual-device flags
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (_REPO, "/root/.axon_site", env.get("PYTHONPATH"))
        if p
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "tpu_alias_check.py")],
        env=env, cwd=_REPO, timeout=1800,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    if "SKIP: no TPU" in proc.stdout:
        pytest.skip("no TPU visible from the spawned process")
    assert proc.returncode == 0, proc.stdout[-3000:]
    assert "FAIL" not in proc.stdout
