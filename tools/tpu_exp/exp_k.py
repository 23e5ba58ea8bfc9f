"""Throughput sweep: batch size x ERROR_CHUNK x stop mode on real TPU."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import synth_pair
import tpuflow.models.batch as batch_mod


def run_case(B, chunk, stop):
    batch_mod.ERROR_CHUNK = chunk
    I0s, I1s = [], []
    for s in range(B):
        a, b = synth_pair(seed=100 + s)
        I0s.append(a)
        I1s.append(b)
    I0 = jnp.asarray(np.stack(I0s), dtype=jnp.float32)
    I1 = jnp.asarray(np.stack(I1s), dtype=jnp.float32)

    def run():
        u, v = batch_mod.tvl1_batched(I0, I1, stop=stop)
        return float(jnp.sum(u))

    run()
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        run()
    dt = (time.perf_counter() - t0) / n
    print(f"B={B} chunk={chunk} stop={stop}: {B/dt:.1f} fields/s", flush=True)
    # force retrace for next chunk value
    batch_mod._tvl1_batched_jit.clear_cache()


for B, chunk, stop in [
    (16, 8, "error"),
    (16, 12, "error"),
    (16, 16, "error"),
    (32, 8, "error"),
    (32, 12, "error"),
    (16, 8, "fixed"),
    (32, 8, "fixed"),
]:
    run_case(B, chunk, stop)
