"""SPMD-partitioned HLO inspection: count collective ops and their bytes.

Wall-clock on virtual CPU devices is meaningless for multi-chip work; the
compiled HLO's collectives are what ride the ICI on real hardware, so both
the layout experiments (``scripts/*_experiment.py``) and the regression
tests (``tests/test_collectives.py``) assert on these numbers.
"""
from __future__ import annotations

import re

COLLECTIVES = ("all-gather", "all-reduce", "all-to-all", "collective-permute",
               "reduce-scatter")

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "bf16": 2, "pred": 1}


def _bytes_of(shape_str: str) -> int:
    m = re.match(r"(f32|f64|bf16|s32|pred|u32)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    n = 1
    for d in m.group(2).split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[m.group(1)]


def collective_stats(hlo: str) -> dict:
    """{collective name: (op count, total output bytes)} over an HLO dump."""
    stats = {}
    for line in hlo.splitlines():
        for coll in COLLECTIVES:
            # e.g.  %ag = f32[17,65,65] all-gather(...)
            m = re.search(rf"= ?(\S+\[[0-9,]*\][^ ]*) {coll}\(", line)
            if m:
                b = _bytes_of(m.group(1))
                c, tot = stats.get(coll, (0, 0))
                stats[coll] = (c + 1, tot + b)
    return stats


def collective_bytes(fn, *args) -> int:
    """Total collective output bytes of ``jit(fn)(*args)`` after SPMD
    partitioning (compile on the current device set)."""
    import jax

    c = jax.jit(fn).lower(*args).compile()
    return sum(v[1] for v in collective_stats(c.as_text()).values())
