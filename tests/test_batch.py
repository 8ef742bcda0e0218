"""Batched-instance driver: all instances converge, and each matches a
single-instance solve of the same problem."""
import jax.numpy as jnp
import numpy as np

from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.multilevel.solve import solve_dot
from dotsocp_tpu.parallel.batch import solve_batch


def test_batch_converges_and_matches_single():
    a, b = get_example_2d("example2", 33, 33)
    c, d = get_example_2d("example1", 33, 33)
    r0 = np.stack([a, c])
    r1 = np.stack([b, d])
    out = solve_batch(
        r0, r1, nt=9, opts={"tol": 1e-4, "maxit": 3000},
        dtype=jnp.float64, verbose=False,
    )
    assert out["done"].all()
    assert (out["kkt"][:, [0, 2, 5, 6]].max(axis=1) < 1e-4).all()

    # instance 0 vs a standalone device solve of the same problem
    single, _, _ = solve_dot(
        a, b, 9, 1, {"tol": 1e-4, "maxit": 3000, "driver": "device"},
        "inPALM", dtype=jnp.float64, verbose=False,
    )
    rho_b = np.asarray(out["rho"][0])
    rho_s = np.asarray(single["rho"])
    rel = np.linalg.norm(rho_b - rho_s) / np.linalg.norm(rho_s)
    # batched mode aligns rescales to the check cadence (documented
    # deviation) -> same solution within solver tolerance
    assert rel < 1e-2, rel


def test_batch_multilevel():
    a, b = get_example_2d("example2", 33, 33)
    c, d = get_example_2d("example1", 33, 33)
    out = solve_batch(
        np.stack([a, c]), np.stack([b, d]), nt=9, level_n=3,
        opts={"tol": 1e-4, "maxit": 3000}, dtype=jnp.float64, verbose=False,
    )
    assert out["done"].all()
    assert (out["kkt"][:, [0, 2, 5, 6]].max(axis=1) < 1e-4).all()
