"""Benchmark: the reference's headline 2D demo config on one TPU chip.

Config mirrors ``demo_dot2d.m:10-17,55-60``: nt=33, nx=ny=129, tol=1e-4,
3 levels, inPALM, DOTmark-4stitch densities (procedural tiles when the
DOTmark assets are absent — the solve cost is density-independent to first
order). f32 on TPU (validated against the f64 CPU path in tests).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": x}

vs_baseline compares against the single-host CPU float64 reference-equivalent
run recorded in BASELINE.md (this repo's stand-in for the unpublished MATLAB
numbers; same algorithm, same tolerance, same iteration counts).
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


def run(dtype, repeats=2, verbose=False, driver="auto"):
    from dotsocp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from dotsocp_tpu.models.examples import get_example_2d
    from dotsocp_tpu.multilevel.solve import solve_dot

    rho0, rho1 = get_example_2d("DOTmark_4stitch", NX, NY)
    best = None
    info = None
    for _ in range(repeats):  # first pass warms the jit caches
        out, hml, h = solve_dot(
            rho0, rho1, NT, LEVELS,
            {"tol": TOL, "maxit": 3000, "driver": driver},
            "inPALM", dtype=dtype, verbose=verbose,
        )
        t = out["total_time"]
        if best is None or t < best:
            best, info = t, out
    return best, info


def _warm_marker():
    from dotsocp_tpu.utils.cache import enable_compilation_cache

    return os.path.join(enable_compilation_cache(), "bench_device_warm")


def main():
    cpu_mode = "--cpu" in sys.argv
    if cpu_mode:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp

        t, out = run(jnp.float64, repeats=1, verbose=True)
        print(f"CPU f64 3-level solve: {t:.1f}s")
        return

    import jax
    import jax.numpy as jnp

    # The device-resident driver is ~20x faster per check but its
    # while-loop graph takes ~6 min/level to compile through the axon
    # remote compiler (one-time; cached). Use it once the cache is warm
    # (marker written by a successful device run / prewarm), else the
    # fused host driver. Override with DOTSOCP_BENCH_DRIVER.
    marker = _warm_marker()
    driver = os.environ.get(
        "DOTSOCP_BENCH_DRIVER",
        "device" if os.path.exists(marker) else "host",
    )
    t, out = run(jnp.float32, driver=driver)
    if driver == "device":
        with open(marker, "w") as f:
            f.write("ok\n")
    iters = sum(l["iters"] for l in out["levels"])
    result = {
        "metric": "dot2d_dotmark_129x129x33_tol1e-4_3level_inpalm",
        "value": round(t, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_CPU_SECONDS / t, 2),
        "iters": iters,
        "mass_ok": bool(out["mass_ok"]),
        "driver": driver,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
