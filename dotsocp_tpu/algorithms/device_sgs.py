"""Device-resident driver for the sGS variants (sGS-inPALM, acc-sGS-ADMM).

Extends the device loop with the sGS sigma machinery
(``solver_socp_sGSinPALM.m:76-80,321-393``): a per-iteration FeasRatio
history kept in a ring buffer, the 19-history/12-victory win count, the
superiority gate resi_sGS < 0.95 * kkt_sGS, between-check cheap
feasibility updates when superior, the 1.10 warm-up factor before the
stable phase (it > 2500), and the scaled cadence.
"""
from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .device_driver import (
    DeviceDriver,
    _cadence_check_sgs,
    SIGMA_BOUNDS,
)
from .driver import RunHistory, SolveOptions, UPDATE_RULE_SGS

_RING = 32  # >= the 20-entry window, power of two

_RULE_SGS_XI = jnp.array([r[0] for r in UPDATE_RULE_SGS], jnp.float32)
_RULE_SGS_F = jnp.array([r[1] for r in UPDATE_RULE_SGS], jnp.float32)


def _table_factor_sgs(xi):
    xi = jnp.asarray(xi, jnp.float32)

    def pos(x):
        idx = jnp.sum(x[..., None] >= _RULE_SGS_XI, axis=-1)
        return jnp.where(idx == 0, 1.0, _RULE_SGS_F[jnp.maximum(idx - 1, 0)])

    return jnp.where(xi >= 1.0, pos(xi), 1.0 / pos(1.0 / xi))


class SgsLoopState(NamedTuple):
    s: object                  # SolverState
    it: jax.Array
    last_sigma_it: jax.Array
    use_feas_org: jax.Array
    stage: jax.Array
    max_feas: jax.Array
    rel_gap: jax.Array
    done: jax.Array
    hist: jax.Array
    hist_n: jax.Array
    # sGS machinery
    ring: jax.Array            # (RING,) FeasRatio by iteration % RING
    superior: jax.Array        # bool
    stable: jax.Array          # bool (it > 2500 seen)
    stale: jax.Array           # (5,) [denom1, denom3, kkt1, kkt2, kkt5]
    resi_sgs: jax.Array        # block residual captured in the last step
    tol: jax.Array             # f32 stopping tolerance (traced per level)


class SgsDeviceDriver(DeviceDriver):
    """sGS-inPALM on device. The step is instrumented: the phi-sweep's
    block residual is captured every iteration (one extra stencil+norm,
    needed at checks and cheap relative to the sweep)."""

    name = "Symmetric Gauss-Seidel based inPALM (device loop)"
    HIST = 19
    VICTORY = 12
    INITIAL_SIGMA_SCALE = 1.10
    VAL_GAP = 0.95

    def __init__(self, kernels, opts: SolveOptions, chunk_iters: int = 600,
                 **kw):
        self._scale = max(1.0, kernels.cfg.geom.n_centered ** (1.0 / 3.0) / 33.0)
        super().__init__(kernels, opts, chunk_iters=chunk_iters, **kw)

    # -- hooks (overridden by the acc-sGS driver) ------------------------
    def _kkt_full(self, s_base):
        return self.k._kkt(s_base)

    def _post_body(self, s):
        return s

    # -- instrumented step ----------------------------------------------
    def _step_with_resi(self, s):
        s2, aux = self.k._step_instrumented(s, False)
        return s2, aux["resi_sgs"]

    def _build_chunk(self):
        opts = self.opts
        k = self.k
        maxit = opts.maxit
        scale = self._scale
        stop_idx = (
            jnp.array([0, 2, 5, 6]) if opts.check_prim_dual_feas
            else jnp.array([0, 2, 5])
        )

        def rescale_trigger(ls):
            # identical trigger logic to the base driver, on the sGS state
            it1 = ls.it + 1
            t1 = (
                (ls.stage == 1) & (ls.max_feas < 2e-2) & (ls.rel_gap < 5e-2)
                & (it1 >= self.FIRST_ITER)
            )
            t2 = (
                (ls.stage == 2) & (ls.max_feas < 5e-3) & (ls.rel_gap < 1e-2)
                & (it1 >= self.SECOND_ITER)
            )
            periodic = (ls.stage >= 3) & (it1 % self.rescale_check_every == 0)

            def apply(ls):
                norms = k._norms(self._base(ls.s))
                norm_phis = jnp.maximum(
                    jnp.maximum(norms["normPhi"], norms["normQ"]), norms["normZ"]
                )
                norm_alps = jnp.maximum(norms["normAlpha"], norms["normBeta"])
                ratio = jnp.maximum(norm_alps, norm_phis) / jnp.maximum(
                    jnp.minimum(norm_alps, norm_phis), 1e-30
                )
                ok = jnp.where(ls.stage >= 3, ratio > self.RATIO_THRESHOLD, True)

                def do(ls):
                    return ls._replace(
                        s=self._rescale_apply(ls.s, norm_phis, norm_alps),
                        stage=ls.stage + 1,
                    )

                return jax.lax.cond(ok, do, lambda ls: ls, ls)

            return jax.lax.cond(t1 | t2 | periodic, apply, lambda ls: ls, ls)

        def ring_window_stats(ls):
            """mean / win counts over iterations max(1, it-19)..it
            (``solver_socp_sGSinPALM.m:332-335``)."""
            offs = jnp.arange(self.HIST + 1)
            its = ls.it - offs
            valid = its >= 1
            vals = ls.ring[its % _RING]
            count = jnp.maximum(jnp.sum(valid), 1)
            mean = jnp.sum(jnp.where(valid, vals, 0.0)) / count
            # MATLAB mean over a window containing Inf is Inf
            has_inf = jnp.any(valid & jnp.isinf(vals))
            mean = jnp.where(has_inf, jnp.inf, mean)
            prim = jnp.sum(jnp.where(valid & (vals < 1.0), 1, 0))
            dual = jnp.sum(jnp.where(valid & (vals > 1.0), 1, 0))
            return mean, prim, dual

        def check_block(ls: SgsLoopState) -> SgsLoopState:
            res = self._kkt_full(self._base(ls.s))
            kkt_org = res["kkt_org"]
            kkt5 = res["kkt"]
            pd_gap = res["pdGap"]
            kkt_sgs = res["kkt_sgs_blocks"]

            row = jnp.concatenate(
                [
                    kkt_org.astype(jnp.float32),
                    jnp.stack([pd_gap.astype(jnp.float32),
                               ls.it.astype(jnp.float32)]),
                ]
            )
            hist = jax.lax.dynamic_update_slice(
                ls.hist, row[None],
                (jnp.minimum(ls.hist_n, self._hist_cap - 1),
                 jnp.zeros((), jnp.int32)),
            )
            hist_n = jnp.minimum(ls.hist_n + 1, self._hist_cap)

            fresh = (
                jnp.maximum(kkt5[0], kkt5[1])
                / jnp.maximum(jnp.maximum(kkt5[2], kkt5[4]), 1e-30)
            ).astype(jnp.float32)
            ring = ls.ring.at[ls.it % _RING].set(fresh)
            ls = ls._replace(ring=ring, hist=hist, hist_n=hist_n)

            done = jnp.max(kkt_org[stop_idx]) < ls.tol
            use_org = ls.use_feas_org | (jnp.max(kkt5) < 5.0 * ls.tol)

            # stale denominators for the between-check updates
            kc = 1.0
            denom1 = jnp.where(
                use_org,
                kc * res["D"] / res["dScale"] + res["normAphi"] + res["normQ"],
                kc + res["normAphi"] + res["normQ"],
            )
            denom3 = jnp.where(
                use_org,
                kc / res["cScale"] + res["norm_c_state"],
                kc + res["norm_c_state"],
            )
            stale = jnp.stack(
                [denom1, denom3, kkt5[0], kkt5[1], kkt5[4]]
            ).astype(jnp.float32)

            superior = ls.resi_sgs < self.VAL_GAP * kkt_sgs
            error = jnp.max(kkt_org[stop_idx])
            adjust = _cadence_check_sgs(ls.it, ls.last_sigma_it, scale)

            mean, prim_w, dual_w = ring_window_stats(ls)
            adjust2 = (
                superior | (error < 5.0 * ls.tol)
                | ((dual_w >= self.VICTORY) & (mean > 1))
            )
            stable = ls.stable | (adjust & adjust2 & (ls.it > 2500))
            win = ((prim_w >= self.VICTORY) & (mean < 1)) | (
                (dual_w >= self.VICTORY) & (mean > 1)
            )

            def sigma_update(carry):
                s, last = carry
                sigma = self._base(s).sigma
                warm = jnp.where(
                    mean < 1,
                    1.0 / self.INITIAL_SIGMA_SCALE,
                    self.INITIAL_SIGMA_SCALE,
                ).astype(sigma.dtype)
                table = _table_factor_sgs(mean)
                clamped = jnp.clip(
                    sigma * table, SIGMA_BOUNDS[0], SIGMA_BOUNDS[1]
                )
                table = jnp.where(table != 1.0, clamped / sigma, 1.0).astype(
                    sigma.dtype
                )
                factor = jnp.where(stable, table, warm)
                s = jax.lax.cond(
                    factor != 1.0,
                    lambda s: self._sigma_apply(s, factor),
                    lambda s: s,
                    s,
                )
                return s, ls.it

            do_sigma = adjust & ~done & adjust2 & win
            s, last = jax.lax.cond(
                do_sigma, sigma_update, lambda c: c, (ls.s, ls.last_sigma_it)
            )
            # lastSigmaIt updates at every cadence point
            last = jnp.where(adjust, ls.it, last)

            max_feas = jnp.where(
                ls.stage > 0, jnp.max(kkt5), ls.max_feas
            ).astype(ls.max_feas.dtype)
            rel_gap = jnp.where(ls.stage > 0, pd_gap, ls.rel_gap).astype(
                ls.rel_gap.dtype
            )
            return ls._replace(
                s=s,
                last_sigma_it=last,
                use_feas_org=use_org,
                max_feas=max_feas,
                rel_gap=rel_gap,
                done=done,
                stale=stale,
                superior=superior,
                stable=stable,
            )

        def between_update(ls: SgsLoopState) -> SgsLoopState:
            """Non-check FeasRatio bookkeeping
            (``solver_socp_sGSinPALM.m:373-393``)."""

            def superior_entry(ls):
                feas = k._feas_pair(self._base(ls.s))
                denom1, denom3, k1, k2, k5 = (
                    ls.stale[0], ls.stale[1], ls.stale[2], ls.stale[3],
                    ls.stale[4],
                )
                rel = feas["primFea1"].astype(jnp.float32) / jnp.maximum(
                    denom1 * k1, 1e-30
                )
                r1 = k1 * rel
                r2 = k2 * rel
                r3 = feas["dualFea1"].astype(jnp.float32) / jnp.maximum(
                    denom3, 1e-30
                )
                ratio = jnp.maximum(r1, r2) / jnp.maximum(
                    jnp.maximum(r3, k5), 1e-30
                )
                return ls._replace(ring=ls.ring.at[ls.it % _RING].set(ratio))

            def carry_entry(ls):
                prev = ls.ring[(ls.it - 1) % _RING]
                return ls._replace(ring=ls.ring.at[ls.it % _RING].set(prev))

            return jax.lax.cond(ls.superior, superior_entry, carry_entry, ls)

        step_resi = self._step_with_resi

        def body(ls: SgsLoopState) -> SgsLoopState:
            ls = rescale_trigger(ls)
            s, resi = step_resi(ls.s)
            ls = ls._replace(s=s, it=ls.it + 1, resi_sgs=resi.astype(jnp.float32))
            check = _cadence_check_sgs(ls.it, ls.last_sigma_it, scale) | (
                ls.it >= maxit
            )
            ls = jax.lax.cond(check, check_block, between_update, ls)
            # acc-sGS: Halpern anchor averaging after the (possible) check
            return ls._replace(s=self._post_body(ls.s))

        def chunk(ls: SgsLoopState, it_end) -> SgsLoopState:
            def cond(ls):
                return (~ls.done) & (ls.it < it_end)

            return jax.lax.while_loop(cond, body, ls)

        if self.DONATE:
            return partial(jax.jit, donate_argnums=0)(chunk)
        return jax.jit(chunk)

    def init_loop_state(self, state) -> SgsLoopState:
        base = super().init_loop_state(state)
        return SgsLoopState(
            s=base.s,
            it=base.it,
            last_sigma_it=base.last_sigma_it,
            use_feas_org=base.use_feas_org,
            stage=base.stage,
            max_feas=base.max_feas,
            rel_gap=base.rel_gap,
            done=base.done,
            hist=base.hist,
            hist_n=base.hist_n,
            ring=jnp.full((_RING,), jnp.inf, jnp.float32),
            superior=jnp.zeros((), bool),
            stable=jnp.zeros((), bool),
            stale=jnp.zeros((5,), jnp.float32),
            resi_sgs=jnp.asarray(jnp.inf, jnp.float32),
            tol=base.tol,
        )


class AccSgsDeviceDriver(SgsDeviceDriver):
    """acc-sGS-ADMM on device: the sGS sigma machinery on the base iterate
    plus per-iteration Halpern averaging with anchor restarts on sigma
    changes and rescales (``solver_socp_accsGSADMM.m``)."""

    name = "Accelerated sGS based ADMM (device loop)"
    DONATE = False  # anchors alias the iterate after prep/restart

    def __init__(self, kernels, opts: SolveOptions, chunk_iters: int = 600,
                 **kw):
        super().__init__(kernels, opts, chunk_iters=chunk_iters, **kw)
        self.rescale_check_every = 200

    def _base(self, e):
        return e.s

    def _kkt_full(self, s_base):
        return self.k._kkt_sgs(s_base)

    def _step_with_resi(self, e):
        s2, aux = self.k._step_instrumented(e.s, False)
        return e._replace(s=s2), aux["resi_sgs"]

    def _post_body(self, e):
        return self.k._halpern(e)

    def _sigma_apply(self, e, factor):
        return self.k._sigma_mult_acc(e, factor)

    def _rescale_apply(self, e, d2, c2):
        return self.k._rescale_acc(e, d2, c2)
