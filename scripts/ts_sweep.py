"""Tile-size sweep for the fused x-carry segment at 513^2x65 (round 4).

The blocked-layout probe showed block-row burst size is the remaining
bandwidth lever (2 KB strided rows: 599 GB/s; 4 KB: ~800+). This sweeps
(DOTSOCP_PALLAS_TS, DOTSOCP_PALLAS_TS2) and times k.segment_impl over a
20-iteration fori chain (device_get-fenced).

One config per invocation (a vmem-OOM compile failure must not poison
the process):  python scripts/ts_sweep.py <TS> <TS2>
Sweep driver:  for c in "512 256" "512 512" "1024 512" "1024 640"; do
                 timeout 900 env ... python scripts/ts_sweep.py $c; done
"""
import sys, time

TS, TS2 = sys.argv[1], sys.argv[2]
import os

os.environ["DOTSOCP_PALLAS_TS"] = TS
os.environ["DOTSOCP_PALLAS_TS2"] = TS2

sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from dotsocp_tpu.algorithms.core import LevelConfig
from dotsocp_tpu.algorithms.variants import InPALMKernels
from dotsocp_tpu.multilevel.level import initial_scaling, initialize
from dotsocp_tpu.models.examples import get_example_2d
from dotsocp_tpu.utils.profiling import _sync

nx = ny = 513
nt = 65
rho0, rho1 = get_example_2d("example2", nx, ny)
lv = initialize(rho0, rho1, nt, dtype=jnp.float32)
initial_scaling(lv, scaling=True)
cfg = LevelConfig(geom=lv.geom, D=lv.D, E=lv.E, tau=1.9, dtype=jnp.float32,
                  layout="flat", use_pallas=True)
k = InPALMKernels(cfg)
assert k._fused is not None and k.segment_ca
s = k.prep(lv.as_dict(), sigma=1.0)

N = 20
seg = jax.jit(lambda st: k.segment_impl(st, N))
t0 = time.time()
r = seg(s)
_sync(r)
compile_s = time.time() - t0
best = float("inf")
for _ in range(3):
    t0 = time.time()
    r = seg(s)
    _sync(r)
    best = min(best, (time.time() - t0) / N)
print(f"TS={TS:>5} TS2={TS2:>5}  {best*1e3:7.2f} ms/iter  "
      f"(compile+warm {compile_s:.0f}s)", flush=True)
