"""r4: per-kernel cold compile-time probe (cache disabled)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def probe(name, build):
    t0 = time.perf_counter()
    build()
    print(f"{name}: {time.perf_counter() - t0:.1f} s", flush=True)


B, ny, nx = 16, 436, 1024
Hp, Wp = 448, 1024

from tpuflow.ops.tvl1_pallas import tvl1_iterate_error_padded
from tpuflow.ops.hs_pallas import hs_sor_error_quarters
from tpuflow.ops.warp_pallas import warp_planes_pallas_batched

state = jnp.zeros((B, 6, Hp, Wp), jnp.float32)
const = jnp.zeros((B, 4, Hp, Wp), jnp.float32)
probe("tvl1 unified 448x1024", lambda: jax.block_until_ready(
    tvl1_iterate_error_padded(state, const, ny, nx, 1.0, 2, 0.045, 0.3,
                              0.8333)[0]))

sq = jnp.zeros((B, 8, Hp // 2, Wp // 2), jnp.float32)
cq = jnp.zeros((B, 20, Hp // 2, Wp // 2), jnp.float32)
probe("hs unified 448x1024", lambda: jax.block_until_ready(
    hs_sor_error_quarters(sq, cq, ny, nx, 1.0, 2, 49.0)[0]))

planes = jnp.zeros((B, 3, ny, nx), jnp.float32)
u = jnp.zeros((B, ny, nx), jnp.float32)
probe("warp D=8 rbud=3 (64,128)", lambda: jax.block_until_ready(
    warp_planes_pallas_batched(planes, u, u, 8, (64, 128), None, 3)))
probe("warp D=8 rbud=2 (32,512)", lambda: jax.block_until_ready(
    warp_planes_pallas_batched(planes, u, u, 8, (32, 512), None, 2)))
probe("warp D=3 rbud=3 (64,128)", lambda: jax.block_until_ready(
    warp_planes_pallas_batched(planes, u, u, 3, (64, 128), None, 3)))
