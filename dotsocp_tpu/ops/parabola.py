"""Closed-form projection onto the parabolic set (the reference's legacy
``ProjParab.m`` / ``poly_root.m`` pair, G. Peyre lineage — unused by the
shipped algorithms but kept as an independent cross-check kernel for the
cone machinery, cf. SURVEY.md section 2.2 'Unused legacy').

Given rows q = (a, b_1..b_k), returns (a - lambda, b / (1 + lambda)) where
lambda >= 0 is the largest real root of

    x^3 + (8 - a) x^2 + (16 - 8a) x - (16a + 2|b|^2) = 0

exactly as ``ProjParab.m:14-16``. The cubic is solved in closed form
(vectorized trigonometric/Cardano method) instead of the reference's
general polynomial companion solver.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _largest_real_root_cubic(b, c, d):
    """Largest real root of x^3 + b x^2 + c x + d = 0 (elementwise).

    Depressed cubic t^3 + p t + q with x = t - b/3; three-real-root case via
    the trigonometric method, single-root case via Cardano.
    """
    b = jnp.asarray(b, jnp.float64)
    c = jnp.asarray(c, jnp.float64)
    d = jnp.asarray(d, jnp.float64)
    p = c - b * b / 3.0
    q = 2.0 * b**3 / 27.0 - b * c / 3.0 + d
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # three real roots (disc <= 0): t = 2 sqrt(-p/3) cos(theta/3), theta =
    # arccos(3q / (2p) * sqrt(-3/p)); the k=0 branch is the largest root
    safe_p = jnp.minimum(p, -1e-300)
    m = 2.0 * jnp.sqrt(-safe_p / 3.0)
    arg = jnp.clip(3.0 * q / (safe_p * m), -1.0, 1.0)
    t_tri = m * jnp.cos(jnp.arccos(arg) / 3.0)

    # one real root (disc > 0): Cardano
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    t_car = u + v

    t = jnp.where(disc > 0.0, t_car, t_tri)
    return t - b / 3.0


def proj_parab(q: jax.Array) -> jax.Array:
    """Row-wise projection; q shape (n, 1 + k): columns [a, b...]."""
    a = q[:, 0].astype(jnp.float64)
    b = q[:, 1:].astype(jnp.float64)
    norm_b = jnp.linalg.norm(b, axis=1)
    lam = _largest_real_root_cubic(
        8.0 - a, 16.0 - 8.0 * a, -16.0 * a - 2.0 * norm_b
    )
    lam = jnp.maximum(lam, 0.0)
    out = jnp.concatenate(
        [(a - lam)[:, None], b / (1.0 + lam)[:, None]], axis=1
    )
    return out.astype(q.dtype)
