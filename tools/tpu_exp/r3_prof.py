# Round-3 profiling: where does the TV-L1 / HS batch time go?
# - per-component timing at each pyramid level shape
# - warp kernel cost vs dmax at the fine shape
import sys, time, math
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from bench import synth_pair
from tpuflow.ops import centered_gradient
from tpuflow.ops.pyramid import zoom_size
from tpuflow.ops.tvl1_pallas import pad_hw, tvl1_iterate_padded
from tpuflow.ops.hs_pallas import hs_sor_padded
from tpuflow.ops.warp_pallas import warp_planes_pallas_batched

B = 16
I0s, I1s = [], []
for s in range(B):
    a, b = synth_pair(seed=100 + s)
    I0s.append(a); I1s.append(b)
I0 = jnp.asarray(np.stack(I0s), jnp.float32)
I1 = jnp.asarray(np.stack(I1s), jnp.float32)


def _sync(r):
    # remote-tunnel runtimes: block_until_ready returns early; fetching a
    # scalar is the reliable completion barrier (see bench.py)
    leaves = jax.tree_util.tree_leaves(r)
    return float(jnp.sum(leaves[0].ravel()[0]))


def timeit(f, n=20):
    _sync(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    _sync(r)
    return (time.perf_counter() - t0) / n


# level shapes for 1024x436, zfactor .5, nscales 7
shapes = [(436, 1024)]
for s in range(6):
    ny, nx = shapes[-1]
    nx2, ny2 = zoom_size(nx, ny, 0.5)
    shapes.append((ny2, nx2))
print("level shapes:", shapes, flush=True)

rng = np.random.default_rng(0)

# --- warp cost vs dmax at fine shape ---
planes = jnp.asarray(rng.standard_normal((B, 3, 436, 1024)), jnp.float32)
u = jnp.asarray(rng.standard_normal((B, 436, 1024)), jnp.float32)
v = jnp.asarray(rng.standard_normal((B, 436, 1024)), jnp.float32)
for dmax in (3, 4, 8):
    f = jax.jit(lambda p, a, b, d=dmax: warp_planes_pallas_batched(p, a, b, d))
    dt = timeit(lambda: f(planes, u, v))
    print(f"warp fine dmax={dmax}: {dt*1e3:.2f} ms/call = {dt/B*1e6:.0f} us/sample", flush=True)

# --- warp cost per level at its dmax schedule ---
tot_warp = 0.0
for s, (ny, nx) in enumerate(shapes):
    dmax = max(3, math.ceil(8 * 0.5 ** s))
    p = jnp.asarray(rng.standard_normal((B, 3, ny, nx)), jnp.float32)
    uu = jnp.asarray(rng.standard_normal((B, ny, nx)), jnp.float32)
    if ny * nx >= 96 * 96:
        f = jax.jit(lambda p, a, b, d=dmax: warp_planes_pallas_batched(p, a, b, d))
        dt = timeit(lambda: f(p, uu, uu))
        tot_warp += dt * 5
        print(f"level {s} ({ny}x{nx}) dmax={dmax}: warp {dt*1e3:.2f} ms/call", flush=True)
print(f"total warp cost per tvl1 field (5 warps/level): {tot_warp/B*1e3:.2f} ms/sample", flush=True)

# --- tvl1 iterate cost per level ---
tot_it = 0.0
for s, (ny, nx) in enumerate(shapes):
    if ny * nx < 96 * 96:
        continue
    st = pad_hw(jnp.asarray(rng.standard_normal((B, 6, ny, nx)), jnp.float32))
    ct = pad_hw(jnp.asarray(rng.standard_normal((B, 4, ny, nx)), jnp.float32))
    f = jax.jit(lambda a, b: tvl1_iterate_padded(a, b, ny, nx, 8, 0.045, 0.3, 0.8333))
    dt = timeit(lambda: f(st, ct))
    print(f"level {s} ({ny}x{nx}): tvl1 8-iter chunk {dt*1e3:.2f} ms/call "
          f"({dt/8/B*1e6:.1f} us/it/sample)", flush=True)

# --- hs sweep cost per level ---
for s, (ny, nx) in enumerate(shapes):
    if ny * nx < 96 * 96:
        continue
    st = pad_hw(jnp.asarray(rng.standard_normal((B, 2, ny, nx)), jnp.float32))
    ct = pad_hw(jnp.asarray(rng.standard_normal((B, 5, ny, nx)), jnp.float32))
    f = jax.jit(lambda a, b: hs_sor_padded(a, b, ny, nx, 6, 49.0))
    dt = timeit(lambda: f(st, ct))
    print(f"level {s} ({ny}x{nx}): hs 6-sweep chunk {dt*1e3:.2f} ms/call "
          f"({dt/6/B*1e6:.1f} us/sweep/sample)", flush=True)
