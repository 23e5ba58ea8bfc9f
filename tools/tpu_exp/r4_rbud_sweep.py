"""r4: fused warp-const kernel rbud/tile sweep on bench-like flows."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import synth_pair
from tpuflow.ops import centered_gradient
from tpuflow.ops.tvl1_pallas import pad_hw
from tpuflow.ops.warp_pallas import pick_tile, warp_const_pallas_batched

B = 32
pairs = [synth_pair(seed=100 + s) for s in range(B)]
I0 = jnp.asarray(np.stack([p[0] for p in pairs]), jnp.float32)
I1 = jnp.asarray(np.stack([p[1] for p in pairs]), jnp.float32)
I1x, I1y = centered_gradient(I1)
planes = jnp.stack([I1, I1x, I1y], axis=1)
# flow after a few warps is near the true smooth flow; emulate with the
# analytic flow field of synth_pair
ny, nx = 436, 1024
u = jnp.asarray(np.broadcast_to(
    (2.0 * np.sin(np.linspace(0, 3, nx))[None, :]).astype(np.float32),
    (B, ny, nx)))
v = jnp.asarray(np.broadcast_to(
    (1.5 * np.cos(np.linspace(0, 2, ny))[:, None]).astype(np.float32),
    (B, ny, nx)))
uv_p = pad_hw(jnp.stack([u, v], axis=1))
aux_p = pad_hw(I0)
Hp, Wp = uv_p.shape[-2:]

for tile in [(32, 512), (16, 512), (8, 512), (32, 1024)]:
    if Hp % tile[0] or Wp % tile[1]:
        continue
    for rbud in (1, 2):
        t0 = time.time()
        out, ovf = warp_const_pallas_batched(planes, uv_p, aux_p, 8,
                                             "tvl1", ny, nx, tile=tile,
                                             rbud=rbud)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        nf = int(jnp.sum(ovf))
        t0 = time.time()
        for _ in range(10):
            out, ovf = warp_const_pallas_batched(planes, uv_p, aux_p, 8,
                                                 "tvl1", ny, nx,
                                                 tile=tile, rbud=rbud)
        jax.block_until_ready(out)
        us = (time.time() - t0) / 10 / B * 1e6
        print(f"tile={tile} rbud={rbud}: {us:.0f} us/sample "
              f"flags={nf} compile={compile_s:.0f}s", flush=True)
