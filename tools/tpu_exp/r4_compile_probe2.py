"""r4: what drives tvl1 kernel compile time — shape? grid? loop?"""
import time

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tpuflow.ops.tvl1_pallas import tvl1_iterate_error_padded

# warm up backend first so probe excludes device init
jax.block_until_ready(jnp.zeros((8, 128)) + 1)


def probe(name, build):
    t0 = time.perf_counter()
    build()
    print(f"{name}: {time.perf_counter() - t0:.1f} s", flush=True)


for (B, Hp, Wp) in [(16, 224, 512), (16, 112, 256), (1, 448, 1024),
                    (16, 448, 1024)]:
    state = jnp.zeros((B, 6, Hp, Wp), jnp.float32)
    const = jnp.zeros((B, 4, Hp, Wp), jnp.float32)
    probe(f"tvl1 B={B} {Hp}x{Wp}", lambda s=state, c=const, h=Hp, w=Wp:
          jax.block_until_ready(
              tvl1_iterate_error_padded(s, c, h - 12, w, 1.0, 2, 0.045,
                                        0.3, 0.8333)[0]))
