"""r4: correctness check of warp_const_pallas_batched (fused warp +
constants, two-base fast path + overflow flags) vs composed XLA ops.
Runs on the CPU backend in interpret mode; the TPU lane re-checks
compiled (tests/test_tpu_kernels.py)."""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tpuflow.ops import centered_gradient
from tpuflow.ops.interp import warp_planes_shift
from tpuflow.ops.tvl1_pallas import pad_hw
from tpuflow.ops.hs_pallas import pad_hw_q
from tpuflow.ops.warp_pallas import (pick_tile, warp_const_pallas_batched,
                                     warp_planes_pallas_batched)

rng = np.random.default_rng(0)
B, ny, nx = 2, 52, 300
D = 6
I1 = jnp.asarray(rng.standard_normal((B, ny, nx)) * 50 + 100, jnp.float32)
I0 = jnp.asarray(rng.standard_normal((B, ny, nx)) * 50 + 100, jnp.float32)
# smooth flow within bound + a patch of offset flow: the per-tile spread
# defeats ONE relative window but two bases cover it (flags stay 0)
u = jnp.asarray(2.0 * np.sin(np.linspace(0, 4, nx))[None, None, :]
                * np.ones((B, ny, 1)), jnp.float32)
v = jnp.asarray(1.5 * np.cos(np.linspace(0, 3, ny))[None, :, None]
                * np.ones((B, 1, nx)), jnp.float32)
wild = np.zeros((B, ny, nx), np.float32)
wild[:, 10:20, 40:60] = 3.4
u = u + jnp.asarray(wild)
I1x, I1y = centered_gradient(I1)
planes = jnp.stack([I1, I1x, I1y], axis=1)

# reference composition from the planes-mode kernel (same warp term
# order -> only the const-assembly arithmetic differs)
w = warp_planes_pallas_batched(planes, u, v, D, (32, 512), None, 2)
ws = jax.vmap(lambda p, a, b: warp_planes_shift(p, a, b, D))(planes, u, v)
print("planes kernel vs shift max err:",
      np.abs(np.asarray(w) - np.asarray(ws)).max())
I1w, I1wx, I1wy = w[:, 0], w[:, 1], w[:, 2]
grad = I1wx * I1wx + I1wy * I1wy
rho_c = I1w - I1wx * u - I1wy * v - I0
want_tvl1 = pad_hw(jnp.stack([I1wx, I1wy, rho_c, grad], axis=1))

alpha2 = 49.0
dif = I0 - I1w + I1wx * u + I1wy * v
want_hs = pad_hw_q(jnp.stack([dif * I1wx, dif * I1wy,
                              I1wx * I1wx + alpha2, I1wy * I1wy + alpha2,
                              I1wx * I1wy], axis=1))

uv_p = pad_hw(jnp.stack([u, v], axis=1))
aux_p = pad_hw(I0)
Hp, Wp = uv_p.shape[-2:]
tile = pick_tile(Hp, Wp, (32, 512))
got_tvl1, ovf = warp_const_pallas_batched(planes, uv_p, aux_p, D, "tvl1",
                                          ny, nx, tile=tile, rbud=2)
print("tvl1 flags:", int(np.asarray(ovf).sum()))
assert int(np.asarray(ovf).sum()) == 0, "two bases should cover"
err = np.abs(np.asarray(got_tvl1) - np.asarray(want_tvl1)).max()
print("tvl1 fused max err:", err)
assert err < 2e-3, "tvl1 fused mismatch"

uv_q = pad_hw_q(jnp.stack([u, v], axis=1))
aux_q = pad_hw_q(I0)
Hq, Wq = uv_q.shape[-2:]
tile_q = pick_tile(Hq, Wq, (32, 512))
got_hs, ovf_hs = warp_const_pallas_batched(planes, uv_q, aux_q, D, "hs",
                                           ny, nx, tile=tile_q, rbud=2,
                                           alpha2=alpha2)
assert int(np.asarray(ovf_hs).sum()) == 0
gh, wh_ = np.asarray(got_hs), np.asarray(want_hs)
ii = np.arange(Hq)[:, None] * np.ones((1, Wq), int)
jj = np.arange(Wq)[None, :] * np.ones((Hq, 1), int)
img = (ii < ny) & (jj < nx)
scale = np.maximum(np.abs(wh_), 1.0)
err = (np.abs(gh - wh_) / scale * img[None, None]).max()
print("hs fused max rel err (in-image):", err)
assert err < 1e-3, "hs fused mismatch"  # dif cancellation amplifies ulps

# THREE displacement clusters spanning > 4R+1 -> the end-anchored
# windows cover the extremes but not the middle -> flag must fire
u3np = np.zeros((B, ny, nx), np.float32)
u3np[:, 8:16, 40:60] = 5.4
u3np[:, 8:16, 80:100] = -5.4
uv3 = pad_hw(jnp.stack([jnp.asarray(u3np), jnp.zeros_like(u)], axis=1))
got3, ovf3 = warp_const_pallas_batched(planes, uv3, aux_p, D, "tvl1",
                                       ny, nx, tile=tile, rbud=2)
print("3-cluster flags:", int(np.asarray(ovf3).sum()))
assert int(np.asarray(ovf3).sum()) > 0, "overflow flag should fire"
print("ALL OK")
