import sys, os
os.environ.setdefault("JAX_PLATFORMS", "")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("exph", "/root/repo/tools/tpu_exp/exp_h_mod.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
from tpuflow.ops.interp import warp_planes

rng = np.random.default_rng(3)
B, H, W = 2, 96, 300
base = rng.standard_normal((H, W))
planes = jnp.asarray(np.stack([np.stack([base, base * 0.5 + 1, base ** 2])
                               for _ in range(B)]), jnp.float32)
yy, xx = np.mgrid[0:H, 0:W]
u = 5.0 * np.sin(xx / 80.0) + 2.0 * np.cos(yy / 60.0)
v = -4.0 * np.cos(xx / 90.0) + 1.5 * np.sin(yy / 50.0)
u = jnp.asarray(np.stack([u, u * 0.8]), jnp.float32)
v = jnp.asarray(np.stack([v, v * 0.8]), jnp.float32)
out = m.warp_tile_relative(planes, u, v, dmax=8, rbud=4, tile=(32, 128), interpret=True)
ref = jax.vmap(lambda p, a, b: warp_planes(p, a, b, border_out=True))(planes, u, v)
d = np.abs(np.asarray(out) - np.asarray(ref))
print("interp maxdiff:", d.max())
if d.max() > 1e-3:
    bad = np.argwhere(d[0, 0] > 1e-3)
    print("bad pixels count:", len(np.argwhere(d > 1e-3)), "first few (i,j):", bad[:10])
    print("tile grid: th=32 tw=128 -> tiles of bad:", sorted(set(map(tuple, (bad // [32,128]).tolist())))[:10])
