"""Per-phase timing and roofline reporting.

The reference wraps every algorithm step in tic/toc and prints a named
table (Step_1_1_FFT, Step_1_2_ProjSOC, Step_2_Q_Step, Step_3_Multiplier,
KKT, Total_Time, Iters — ``solver_socp_inPALM.m:124-128,339-341``). Under
jit those phases fuse into one computation, so production runs report
segment-level time only; this module provides the *profiling mode*: each
phase jitted separately and fenced with block_until_ready, plus achieved
HBM bandwidth against the chip roofline (BASELINE.md kernel-efficiency
target).
"""
from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.cone import proj_soc

# HBM peak bandwidth per chip (GB/s)
ROOFLINE_GBPS = {
    "TPU v5 lite": 819.0,   # v5e
    "TPU v4": 1228.0,
    "TPU v6": 1640.0,
    "cpu": 50.0,
}


def _roofline() -> float:
    name = str(jax.devices()[0])
    for k, v in ROOFLINE_GBPS.items():
        if k.lower() in name.lower():
            return v
    return ROOFLINE_GBPS["cpu"]


def _nbytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def profile_phases(kernels, state, iters: int = 30) -> Dict[str, dict]:
    """Time each inPALM phase separately (jitted, fenced). Returns
    {phase: {ms, gbps, pct_roofline}} plus a fused full-step row.

    Phase byte counts are the minimal HBM traffic (each operand read once,
    each result written once) — achieved GB/s above ~60% of roofline means
    the phase is bandwidth-bound and near speed-of-light.
    """
    cfg = kernels.cfg
    ops = kernels.ops
    wmul = kernels._w

    def phi_step(s):
        rhs = cfg.D * ops.grad_T(wmul(s.q) - s.alpha) + s.c
        return kernels.poisson.solve(rhs)

    def z_step(s):
        return proj_soc(s.z2 - s.beta)

    def q_step(s):
        tmp_q = cfg.D * ops.grad(s.phi)
        q2 = ops.bfd_T(s.z + s.beta, kernels.scale_bf)
        return (wmul(tmp_q + s.alpha) + q2) * kernels.diag_q_inv

    def mult_step(s):
        tmp_q = cfg.D * ops.grad(s.phi)
        z2 = ops.bfd(s.q, kernels.scale_bf, cfg.E / s.dScale)
        alpha = s.alpha + cfg.tau * (tmp_q - wmul(s.q))
        beta = s.beta + cfg.tau * (s.z - z2)
        return alpha, beta, z2

    q_bytes = _nbytes(state.q)
    phase_bytes = {
        # rhs build: read q, alpha, c; write/read rhs through the DCT
        # matmul chain (6 transforms, each read+write) + write phi
        "phi_dct_solve": _nbytes(state.q) * 2 + _nbytes(state.c) * (1 + 12 + 1),
        # read z2, beta; write z
        "cone_projection": _nbytes(state.z2) * 3,
        # read phi, z, beta, alpha, diag; write q
        "q_step": _nbytes(state.phi) + _nbytes(state.z) * 2 + q_bytes * 3,
        # read phi, q, z, alpha, beta; write alpha, beta, z2
        "multiplier": _nbytes(state.phi) + q_bytes * 3 + _nbytes(state.z) * 4,
    }

    fns = {
        "phi_dct_solve": jax.jit(phi_step),
        "cone_projection": jax.jit(z_step),
        "q_step": jax.jit(q_step),
        "multiplier": jax.jit(mult_step),
        "kkt_battery": kernels.kkt,
        "full_step_fused": jax.jit(kernels._step),
    }

    roof = _roofline()
    out = {}
    for name, fn in fns.items():
        r = fn(state)
        jax.block_until_ready(r)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(state)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        row = {"ms": dt * 1e3}
        nb = phase_bytes.get(name)
        if nb:
            row["gbps"] = nb / dt / 1e9
            row["pct_roofline"] = 100.0 * row["gbps"] / roof
        out[name] = row
    return out


def format_table(prof: Dict[str, dict]) -> str:
    lines = [f"{'phase':<18} {'ms':>9} {'GB/s':>9} {'%roof':>7}"]
    for name, row in prof.items():
        gb = f"{row['gbps']:.1f}" if "gbps" in row else "-"
        pr = f"{row['pct_roofline']:.1f}" if "pct_roofline" in row else "-"
        lines.append(f"{name:<18} {row['ms']:>9.3f} {gb:>9} {pr:>7}")
    return "\n".join(lines)
