"""Benchmark: the reference's headline 2D demo config on one TPU chip.

Config mirrors ``demo_dot2d.m:10-17,55-60``: nt=33, nx=ny=129, tol=1e-4,
3 levels, inPALM, DOTmark-4stitch densities (procedural tiles when the
DOTmark assets are absent — the source is stamped into the result, since
the fallback is a different problem with different iteration counts).
f32 on TPU (validated against the f64 CPU path in tests).

Always runs the device-resident driver (the production path). On a cold
compilation cache the three level executables are compiled concurrently
up front (opts["prewarm"]); D/E/tol/sigma are traced into the solver
state, so the compiled chunks are shape-only and every later run —
including repeat passes and other problem instances — reuses them via the
persistent cache.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": x, ...}

vs_baseline compares against the single-host CPU float64 reference-equivalent
run recorded in BASELINE.md (this repo's stand-in for the unpublished MATLAB
numbers; same algorithm, same tolerance, same iteration counts). A secondary
weighted-2D metric (``demo_wdot2d.m:10-17`` config) is attached as extra
fields unless DOTSOCP_BENCH_WDOT=0.
"""
import json
import os
import sys
import time

# Our own CPU f64 3-level run of this exact config (see BASELINE.md,
# "measured stand-in baseline") — reproduce with: python bench.py --cpu
BASELINE_CPU_SECONDS = 52.7

NT, NX, NY = 33, 129, 129
TOL = 1e-4
LEVELS = 3


def run(dtype, repeats=2, verbose=False, driver="device"):
    from dotsocp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from dotsocp_tpu.models.examples import get_example_2d
    from dotsocp_tpu.multilevel.solve import solve_dot

    rho0, rho1 = get_example_2d("DOTmark_4stitch", NX, NY)
    best = None
    info = None
    for rep in range(repeats):  # first pass warms the jit caches
        out, hml, h = solve_dot(
            rho0, rho1, NT, LEVELS,
            {"tol": TOL, "maxit": 3000, "driver": driver,
             "prewarm": rep == 0 and driver != "host"},
            "inPALM", dtype=dtype, verbose=verbose,
        )
        t = out["total_time"]
        if best is None or t < best:
            best, info = t, out
    return best, info


def run_wdot(dtype, time_limit=900.0):
    """Secondary metric: the weighted headline (129^2 x 129, tol 1e-3,
    3 levels, inPALM, love-heart barrier — ``demo_wdot2d.m:10-17,67``)."""
    from dotsocp_tpu.models.wdot2d import (
        barrier_love_heart,
        ensure_barrier_validity,
        get_example_w2d,
        get_weight_by_barrier,
    )
    from dotsocp_tpu.multilevel.solve import solve_dot

    n = 129
    rho0, rho1 = get_example_w2d("love-heart", n, n)
    barrier = barrier_love_heart()
    weight = get_weight_by_barrier(n, n, n, barrier)
    rho0, rho1, _ = ensure_barrier_validity(rho0, rho1, barrier)
    best = None
    info = None
    for rep in range(2):
        out, _, _ = solve_dot(
            rho0, rho1, n, 3,
            {"tol": 1e-3, "driver": "device", "time_limit": time_limit,
             "prewarm": rep == 0},
            "inPALM", weight=weight, barrier=barrier, dtype=dtype,
            verbose=False,
        )
        t = out["total_time"]
        if best is None or t < best:
            best, info = t, out
    return best, info


def main():
    cpu_mode = "--cpu" in sys.argv
    if cpu_mode:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp

        t, out = run(jnp.float64, repeats=1, verbose=True, driver="host")
        print(f"CPU f64 3-level solve: {t:.1f}s")
        return

    import jax
    import jax.numpy as jnp

    from dotsocp_tpu.models.examples import density_source

    driver = os.environ.get("DOTSOCP_BENCH_DRIVER", "device")
    t, out = run(jnp.float32, driver=driver)
    iters = sum(l["iters"] for l in out["levels"])
    result = {
        "metric": "dot2d_dotmark_129x129x33_tol1e-4_3level_inpalm",
        "value": round(t, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_CPU_SECONDS / t, 2),
        "iters": iters,
        "mass_ok": bool(out["mass_ok"]),
        "driver": driver,
        "density_source": density_source("DOTmark_4stitch"),
        "device": str(jax.devices()[0]),
    }
    if os.environ.get("DOTSOCP_BENCH_WDOT", "1") != "0":
        try:
            tw, outw = run_wdot(jnp.float32)
            result["wdot2d_129x129x129_tol1e-3_s"] = round(tw, 3)
            result["wdot2d_iters"] = sum(l["iters"] for l in outw["levels"])
            result["wdot2d_mass_ok"] = bool(outw["mass_ok"])
        except Exception as e:  # secondary metric must not sink the bench
            result["wdot2d_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
