"""r4: TPU cold-compile + runtime probe of the new fused stack."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if "--cache" in sys.argv:
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import synth_pair
from tpuflow.models.batch import hs_pyramidal_batched, tvl1_batched

jax.block_until_ready(jnp.zeros((8, 128)) + 1)

B = 16
pairs = [synth_pair(seed=100 + s) for s in range(B)]
I0 = jnp.asarray(np.stack([p[0] for p in pairs]), jnp.float32)
I1 = jnp.asarray(np.stack([p[1] for p in pairs]), jnp.float32)


def run(f):
    u, v = f()
    return float(jnp.sum(u))


def probe(name, f, n=5):
    t0 = time.perf_counter()
    run(f)
    t1 = time.perf_counter()
    print(f"{name}: compile+first {t1 - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        run(f)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: steady {dt * 1e3:.1f} ms/batch = "
          f"{B / dt:.1f} fields/s", flush=True)


probe("tvl1 error", lambda: tvl1_batched(I0, I1, stop="error"))
probe("tvl1 fixed", lambda: tvl1_batched(I0, I1, stop="fixed"))
probe("hs error", lambda: hs_pyramidal_batched(I0, I1, stop="error"))
probe("hs fixed", lambda: hs_pyramidal_batched(I0, I1, stop="fixed"))
