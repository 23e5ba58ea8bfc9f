"""r4: does a Mosaic kernel compiled standalone get reused when the
same pallas_call appears inside a bigger jit?  And do concurrent
compiles run in parallel?"""
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache-probe")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tpuflow.ops.tvl1_pallas import tvl1_iterate_error_padded

jax.block_until_ready(jnp.zeros((8, 128)) + 1)

B = 2
state = jnp.zeros((B, 6, 448, 1024), jnp.float32)
const = jnp.zeros((B, 4, 448, 1024), jnp.float32)

t0 = time.perf_counter()
jax.block_until_ready(
    tvl1_iterate_error_padded(state, const, 436, 1024, 1.0, 2, 0.045,
                              0.3, 0.8333)[0])
print(f"standalone 448x1024: {time.perf_counter() - t0:.1f} s", flush=True)


@jax.jit
def wrapped(state, const):
    out, err, n = tvl1_iterate_error_padded(state, const, 436, 1024, 1.0,
                                            2, 0.045, 0.3, 0.8333)
    return out + 1.0, err


t0 = time.perf_counter()
jax.block_until_ready(wrapped(state, const)[0])
print(f"wrapped (same kernel + ops): {time.perf_counter() - t0:.1f} s",
      flush=True)

# parallel compile of three different shapes
shapes = [(224, 512), (112, 256), (232, 640)]


def compile_one(hw):
    h, w = hw
    s = jnp.zeros((B, 6, h, w), jnp.float32)
    c = jnp.zeros((B, 4, h, w), jnp.float32)
    t0 = time.perf_counter()
    jax.block_until_ready(
        tvl1_iterate_error_padded(s, c, h - 4, w, 1.0, 2, 0.045, 0.3,
                                  0.8333)[0])
    return time.perf_counter() - t0


t0 = time.perf_counter()
with ThreadPoolExecutor(3) as ex:
    each = list(ex.map(compile_one, shapes))
wall = time.perf_counter() - t0
print(f"parallel 3 shapes: wall {wall:.1f} s, each {[f'{e:.1f}' for e in each]}",
      flush=True)
