"""Round-4 closing probe: is the residual ~1.5x per-kernel gap (qx/cx vs
their traffic bounds) caused by SUBLANE-axis work — the f[0:nt-1]/f[1:nt]
t-slices and t-concats every cone column performs on (nt, TS) tiles?

Three kernels with identical blocks/traffic, increasing sublane work:
  A: pure elementwise on (nt-1, TS) cells (no t-offsets)
  B: node loaded, two offset t-slices consumed (the bfd pattern)
  C: B plus a t-concat pair (the bfd_T/qx accumulate pattern)

  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_sublane_probe.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dotsocp_tpu.utils.profiling import _sync

NT, S = 65, 513 * 513
TS = 512
Spad = ((S + TS - 1) // TS) * TS
grid = (Spad // TS,)
node = pl.BlockSpec((NT, TS), lambda i: (0, i), memory_space=pltpu.VMEM)
cell = pl.BlockSpec((NT - 1, TS), lambda i: (0, i), memory_space=pltpu.VMEM)

f = jnp.asarray(np.random.rand(NT, Spad).astype(np.float32))
c = jnp.asarray(np.random.rand(NT - 1, Spad).astype(np.float32))


def timeit(name, one, init, nbytes, iters=100):
    fn = jax.jit(lambda x: jax.lax.fori_loop(0, iters, lambda _, y: one(y),
                                             x))
    r = fn(init); _sync(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); r = fn(init); _sync(r)
        best = min(best, (time.time() - t0) / iters)
    eff = nbytes / best / 1e9  # 100-iter chain amortizes the dispatch floor
    print(f"{name:44s} {best*1e3:7.2f} ms  {eff:6.0f} GB/s", flush=True)


NB = (c.size + c.size) * 4  # read cell + write cell

def kA(c_ref, o_ref):
    o_ref[:] = c_ref[:] * 1.0001 + 0.5

def A(x):
    return pl.pallas_call(kA, grid=grid,
        out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
        in_specs=[cell], out_specs=cell,
        input_output_aliases={0: 0})(x)

NB2 = (f.size * 3 + c.size) * 4  # node r + carry rw + cell w

def kB(f_ref, o_ref):
    v = f_ref[:]
    o_ref[:] = v[0:NT - 1] * 1.0001 + v[1:NT]

def B(x):
    o = pl.pallas_call(kB, grid=grid,
        out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
        in_specs=[node], out_specs=cell)(x)
    # real data dependence so the call cannot be hoisted out of the loop
    return x * (1.0 + o[0, 0] * 1e-12)

def kC(f_ref, o_ref):
    v = f_ref[:]
    lo = v[0:NT - 1] * 1.0001
    hi = v[1:NT] + 0.5
    zpad = jnp.zeros((1, v.shape[-1]), v.dtype)
    acc = (jnp.concatenate([lo, zpad], axis=0)
           + jnp.concatenate([zpad, hi], axis=0))
    o_ref[:] = acc[0:NT - 1] + acc[1:NT]

def C(x):
    o = pl.pallas_call(kC, grid=grid,
        out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
        in_specs=[node], out_specs=cell)(x)
    return x * (1.0 + o[0, 0] * 1e-12)

timeit("A: elementwise cells", A, c, NB)
timeit("B: node + 2 offset t-slices", B, f, NB2)
timeit("C: B + t-concat accumulate", C, f, NB2)
