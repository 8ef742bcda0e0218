"""Discovery probe (round 3): un-aliased pallas outputs on this stack pay a
hidden full copy pass (the custom call writes a fresh buffer XLA then treats
as non-donatable). Measured on a 674 MB f32 array, v5e via axon:
  XLA x+1                      ~790 GB/s
  pallas x+1 plain             ~359 GB/s
  pallas x+1 input_output_aliases={0:0}  ~792 GB/s
Manual double-buffering, deeper buffering, vmem_limit_bytes, tile shapes and
dimension_semantics all do NOT close the gap; aliasing does. Consequence:
every bandwidth-bound kernel in ops/pallas_kernels.py aliases its outputs
onto same-shaped dead inputs. Caveat: an aliased input the kernel never
reads hangs the remote compile - alias only read inputs."""
import sys, time
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANE = 327680, 512
x = jnp.asarray(np.random.rand(ROWS, LANE).astype(np.float32))
NB = x.size * 4  # one pass bytes

def sync(r):
    return jax.device_get(jax.tree.leaves(r)[0].ravel()[0])

def timeit(name, one, x, gb):
    N = 30
    f = jax.jit(lambda x: jax.lax.fori_loop(0, N, lambda _, y: one(y), x))
    try:
        r = f(x); sync(r)
    except Exception as e:
        print(f"{name:46s} FAILED: {str(e)[:140]}")
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); r = f(x); sync(r)
        best = min(best, time.time() - t0)
    per = best / N - 40e-3 / N
    print(f"{name:46s} {best/N*1e3:7.2f} ms  {gb/per:6.0f} GB/s")

CR = 1024
grid = (ROWS // CR,)
spec = pl.BlockSpec((CR, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

# write-only: out = i-th block of iota-ish constant + tiny dependence on carry scalar
sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
def wk(s_ref, o_ref):
    o_ref[:] = jnp.full((CR, LANE), 1.0, jnp.float32) * s_ref[0, 0]
def write_only(y):
    s = y[:1, :1].astype(jnp.float32)
    out = pl.pallas_call(wk, grid=grid,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
        in_specs=[sspec], out_specs=spec)(s)
    return out
timeit("pallas write-only", write_only, x, NB * 2 / 1e9)  # chain reads+writes? out feeds next iter read? yes via carry
# note: chained y -> write_only(y) only reads 1 elt; traffic per call = 1 write pass
print("  (write-only traffic = 1 write pass = %.2f GB; divide GB/s by 2)" % (NB/1e9))

# read-only: sum-reduce into (1,1) per block accumulated... use out block (1,128)
ospec = pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
def rk(x_ref, o_ref):
    i = pl.program_id(0)
    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros((1, 128), jnp.float32)
    o_ref[:] += jnp.sum(x_ref[:], axis=0, keepdims=True)[:, :128]
def read_only(y):
    r = pl.pallas_call(rk, grid=grid,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[spec], out_specs=ospec)(y)
    return y + r[0, 0]  # keep chain dependence... adds a full pass
timeit("pallas read-only (+XLA add pass)", read_only, x, NB * 3 / 1e9)

# aliased in-place add
def ak(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0
def aliased(y):
    return pl.pallas_call(ak, grid=grid,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
        in_specs=[spec], out_specs=spec,
        input_output_aliases={0: 0})(y)
timeit("pallas x+1 aliased in-place", aliased, x, NB * 2 / 1e9)

def pk(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0
def plain(y):
    return pl.pallas_call(pk, grid=grid,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
        in_specs=[spec], out_specs=spec)(y)
timeit("pallas x+1 plain", plain, x, NB * 2 / 1e9)
