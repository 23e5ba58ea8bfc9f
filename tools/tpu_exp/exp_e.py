# End-to-end batched drivers on TPU at the bench operating point.
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("benchmod", "/root/repo/bench.py")
bm = importlib.util.module_from_spec(spec); spec.loader.exec_module(bm)
from tpuflow.models.batch import tvl1_batched, hs_pyramidal_batched

B = 16
I0s, I1s = [], []
for s in range(B):
    a, b = bm.synth_pair(seed=100 + s)
    I0s.append(a); I1s.append(b)
I0 = jnp.asarray(np.stack(I0s), dtype=jnp.float32)
I1 = jnp.asarray(np.stack(I1s), dtype=jnp.float32)

def timeit(name, fn, n=5):
    t0 = time.perf_counter()
    r = fn(); 
    print(f"{name} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n): r = fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms/call = {B/dt:.1f} fields/s", flush=True)
    return r

def run_err():
    u, v = tvl1_batched(I0, I1, stop="error")
    return float(jnp.sum(u))
def run_fix():
    u, v = tvl1_batched(I0, I1, stop="fixed")
    return float(jnp.sum(u))
def run_hs():
    u, v = hs_pyramidal_batched(I0, I1, stop="error")
    return float(jnp.sum(u))

timeit("tvl1 stop=error", run_err)
timeit("tvl1 stop=fixed", run_fix)
timeit("hs   stop=error", run_hs)
