"""r4: can two processes compile TPU programs concurrently (axon)?"""
import subprocess
import sys
import time

CHILD = r"""
import time, sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache-probe")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")
from tpuflow.ops.tvl1_pallas import tvl1_iterate_error_padded
h, w = int(sys.argv[1]), int(sys.argv[2])
s = jnp.zeros((2, 6, h, w), jnp.float32)
c = jnp.zeros((2, 4, h, w), jnp.float32)
t0 = time.perf_counter()
f = jax.jit(lambda s, c: tvl1_iterate_error_padded(
    s, c, h - 4, w, 1.0, 2, 0.045, 0.3, 0.8333)[0])
f.lower(s, c).compile()
print(f"child {h}x{w}: {time.perf_counter() - t0:.1f} s", flush=True)
"""

t0 = time.perf_counter()
procs = [subprocess.Popen([sys.executable, "-c", CHILD, str(h), str(w)])
         for h, w in [(240, 768), (248, 896)]]
rcs = [p.wait() for p in procs]
print(f"2-proc wall: {time.perf_counter() - t0:.1f} s rcs={rcs}")
