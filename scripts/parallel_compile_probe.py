"""Probe: does the axon remote compiler serve concurrent compilations?

Two structurally different medium while-loop graphs are compiled (a) back to
back and (b) in two threads, with a fresh compilation-cache dir so every
compile is cold. If the threaded wall-clock is ~half the sequential one, the
bench can prewarm all three level executables concurrently.
"""
import os
import sys
import tempfile
import threading
import time

os.environ["DOTSOCP_JAX_CACHE"] = tempfile.mkdtemp(prefix="dotsocp_probe_")
sys.path.insert(0, "/root/repo")
from dotsocp_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

print("device:", jax.devices()[0])


def make_graph(n, c):
    def step(s):
        x, y = s
        x = jnp.tanh(x @ y) + c
        y = y + 0.001 * jnp.sin(x)
        return (x, y)

    def run(s, k):
        return jax.lax.while_loop(
            lambda sk: sk[1] < k, lambda sk: (step(sk[0]), sk[1] + 1), (s, 0)
        )

    f = jax.jit(run)
    x = jnp.zeros((n, n), jnp.float32)
    return f, ((x, x + 1.0), 50)


graphs = [make_graph(256, 0.1), make_graph(384, 0.2)]

t0 = time.time()
lowered = [f.lower(*a) for f, a in graphs]
print(f"lower: {time.time()-t0:.1f}s")

t0 = time.time()
c0 = lowered[0].compile()
t1 = time.time()
c1 = lowered[1].compile()
t2 = time.time()
print(f"sequential compiles: {t1-t0:.1f}s + {t2-t1:.1f}s = {t2-t0:.1f}s")

# two fresh graphs (different constants -> cache misses), threaded
graphs2 = [make_graph(512, 0.3), make_graph(640, 0.4)]
lowered2 = [f.lower(*a) for f, a in graphs2]
results = [None, None]


def compile_one(i):
    results[i] = lowered2[i].compile()


t0 = time.time()
ts = [threading.Thread(target=compile_one, args=(i,)) for i in range(2)]
for t in ts:
    t.start()
for t in ts:
    t.join()
print(f"threaded compiles (2 concurrent): {time.time()-t0:.1f}s")
