"""Grid-scaled norms and integrals (``normL2.m``, ``FnormL2.m``, ``integralL2.m``).

Real dtypes only: ``norm_l2``/``sdot`` use sum(x*x)/sum(x*y) instead of
vdot/linalg.norm (which ravel and force all-gathers under sharding), so they
drop the conjugation/|x|^2 semantics a complex caller would need. Every
solver field here is real; complex inputs would return wrong values.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.staggered import Staggered


def norm_l2(x, h) -> jax.Array:
    """sqrt(h) * ||x||_2 over all elements (``normL2.m`` / ``FnormL2.m``).

    Accepts arrays or :class:`Staggered` fields (the reference's flat-vector
    norm over [q0; bx; by] equals the root of the summed block squares).
    """
    if isinstance(x, Staggered):
        return jnp.sqrt(h * x.sqnorm())
    # shape-preserving reduction: reshape(-1) of a spatially-sharded array
    # forces GSPMD to all-gather it (a flattened 2-D-sharded layout has no
    # sharded representation); sum over axes reduces shard-locally + psum
    return jnp.sqrt(h * jnp.sum(jnp.square(x)))


def integral_l2(f: jax.Array, axis=None) -> jax.Array:
    """Mean-type integral: (1/n) sum over the spatial axes (``integralL2.m``).

    For a (nt, *space) density this returns the per-time-slab mass with
    h = 1 / prod(space).
    """
    if axis is None:
        axis = tuple(range(1, f.ndim))
    n = 1
    for a in axis if isinstance(axis, tuple) else (axis,):
        n *= f.shape[a]
    return f.sum(axis=axis) / n


def sdot(x, y, h=1.0) -> jax.Array:
    """h-scaled inner product; accepts Staggered or arrays."""
    if isinstance(x, Staggered):
        return h * x.dot(y)
    return h * jnp.sum(x * y)  # vdot ravels -> all-gather under sharding
