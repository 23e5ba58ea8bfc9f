# Sweep (tile, rbud) for the rel-window warp at the two hot HS/TV-L1
# levels; smooth bench-like flows (fast path taken).
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
sys.path.insert(0, "/root/repo")
from tpuflow.ops.warp_pallas import warp_planes_pallas_batched


def _sync(r):
    return float(jnp.sum(r.ravel()[0]))


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
yy, xx = np.mgrid[0:H, 0:W]
u = jnp.asarray(np.broadcast_to(
    (2.0*np.sin(3*xx/W) + 0.3*np.cos(5*yy/H)).astype(np.float32), (B, H, W)))
v = jnp.asarray(np.broadcast_to(
    (1.5*np.cos(2*yy/H) + 0.2*np.sin(4*xx/W)).astype(np.float32), (B, H, W)))

for tile in ((64, 256), (32, 512), (64, 512), (128, 512), (64, 1024)):
    for rbud in (2, 3):
        try:
            t = timeit(lambda: warp_planes_pallas_batched(
                planes, u, v, 8, tile=tile, rbud=rbud))
            print(f"D=8 tile={tile} rbud={rbud}: {t*1e6/B:.0f} us/sample",
                  flush=True)
        except Exception as e:
            print(f"D=8 tile={tile} rbud={rbud}: FAIL "
                  f"{str(e).splitlines()[0][:90]}", flush=True)

# level-1 shape (218x512), dmax=4
p2 = planes[:, :, :218, :512]
u2, v2 = u[:, :218, :512], v[:, :218, :512]
for tile in ((64, 512), (32, 256), (64, 256)):
    for rbud in (2, 3, None):
        try:
            t = timeit(lambda: warp_planes_pallas_batched(
                p2, u2, v2, 4, tile=tile, rbud=rbud))
            print(f"D=4 218x512 tile={tile} rbud={rbud}: "
                  f"{t*1e6/B:.0f} us/sample", flush=True)
        except Exception as e:
            print(f"D=4 218x512 tile={tile} rbud={rbud}: FAIL "
                  f"{str(e).splitlines()[0][:90]}", flush=True)
