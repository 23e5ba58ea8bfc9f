# Relative-window warp: correctness vs exact + speed at dmax=8.
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from tpuflow.ops.warp_pallas import warp_planes_pallas_batched


def _sync(r):
    return float(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[0]))


def timeit(f, n=10):
    _sync(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    _sync(r)
    return (time.perf_counter() - t0) / n


rng = np.random.default_rng(0)
B, H, W = 16, 436, 1024
planes = jnp.asarray(rng.standard_normal((B, 3, H, W)), jnp.float32)

# smooth flow typical of coarse-to-fine (bench-like: |u| <= ~2.5)
yy, xx = np.mgrid[0:H, 0:W]
u_s = 2.0 * np.sin(3 * xx / W) + 0.3 * np.cos(5 * yy / H)
v_s = 1.5 * np.cos(2 * yy / H) + 0.2 * np.sin(4 * xx / W)
u_smooth = jnp.asarray(np.broadcast_to(u_s, (B, H, W)), jnp.float32)
v_smooth = jnp.asarray(np.broadcast_to(v_s, (B, H, W)), jnp.float32)

# larger smooth flow (|u| up to 7)
u_big = jnp.asarray(6.5 * np.broadcast_to(np.sin(2 * xx / W), (B, H, W)),
                    jnp.float32)
v_big = jnp.asarray(5.0 * np.broadcast_to(np.cos(3 * yy / H), (B, H, W)),
                    jnp.float32)

# rough flow (forces fallback in some tiles)
u_rough = jnp.asarray(rng.uniform(-7, 7, (B, H, W)), jnp.float32)
v_rough = jnp.asarray(rng.uniform(-7, 7, (B, H, W)), jnp.float32)

for name, (u, v) in [("smooth", (u_smooth, v_smooth)),
                     ("big", (u_big, v_big)),
                     ("rough", (u_rough, v_rough))]:
    exact = warp_planes_pallas_batched(planes, u, v, 8, tile=(64, 512),
                                       rbud=None)
    fast = warp_planes_pallas_batched(planes, u, v, 8, tile=(64, 512),
                                      rbud=3)
    d = float(jnp.max(jnp.abs(exact - fast)))
    print(f"correct {name}: max|exact-fast| = {d:.3e}", flush=True)

for tile in ((64, 128), (64, 256), (64, 512)):
    for rbud in (None, 3, 4):
        t = timeit(lambda: warp_planes_pallas_batched(
            planes, u_smooth, v_smooth, 8, tile=tile, rbud=rbud))
        print(f"dmax=8 tile={tile} rbud={rbud}: {t*1e3:.2f} ms = "
              f"{t*1e6/B:.0f} us/sample", flush=True)

# dmax=4 (level-1) with rbud
for rbud in (None, 3):
    t = timeit(lambda: warp_planes_pallas_batched(
        planes[:, :, :218, :512], u_smooth[:, :218, :512],
        v_smooth[:, :218, :512], 4, tile=(64, 512), rbud=rbud))
    print(f"dmax=4 218x512 rbud={rbud}: {t*1e3:.2f} ms", flush=True)
