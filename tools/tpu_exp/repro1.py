import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
print("devices", jax.devices(), time.time()-t0, flush=True)
from tpuflow.ops.tvl1_pallas import tvl1_iterate_pallas
import numpy as np
B, H, W = 2, 64, 256
state = jnp.asarray(np.random.randn(B, 6, H, W), jnp.float32)
const = jnp.asarray(np.abs(np.random.randn(B, 4, H, W)), jnp.float32)
t1 = time.time()
out, err = tvl1_iterate_pallas(state, const, 3, 0.045, 0.3, 0.8333, interpret=False)
out.block_until_ready()
print("OK", out.shape, err.shape, float(err[0]), "compile+run", time.time()-t1, flush=True)
