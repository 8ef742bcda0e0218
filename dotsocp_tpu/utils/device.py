"""Device/runtime helpers for the tunneled-TPU execution quirks."""
from __future__ import annotations

import jax


def force_materialize(tree) -> None:
    """Force every array in ``tree`` to be physically materialized.

    On the axon-tunneled TPU, dispatch results are deferred: a LARGE
    while_loop dispatch whose inputs are still lazy (e.g. the freshly
    prepped solver state) executes pathologically slowly — measured at
    513^2x65: the first device-driver chunk took 30-160 s on a lazy
    state vs ~2 s after this touch (round-4 probe; the touch itself costs
    the normal prep-pipeline drain once). Consuming one element per leaf
    in a tiny jitted reduction forces the producing pipeline; on healthy
    backends this is a ~no-op.
    """
    leaves = tuple(x for x in jax.tree.leaves(tree)
                   if hasattr(x, "dtype") and hasattr(x, "ravel"))
    if not leaves:
        return
    jax.device_get(_touch(leaves))


@jax.jit
def _touch(leaves):
    acc = 0.0
    for x in leaves:
        acc = acc + x.ravel()[0].astype("float32")
    return acc
