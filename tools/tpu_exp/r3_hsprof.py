# Round-3 HS profiling: per-component cost at the bench operating point.
#  - hs_sor_quarters chunk cost at the finest shape (per sweep)
#  - warp cost per level (dmax schedule)
#  - total sweeps actually executed per warp/level in error mode
import sys, time, math
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from bench import synth_pair
from tpuflow.ops import centered_gradient
from tpuflow.ops.pyramid import zoom_size
from tpuflow.ops.hs_pallas import hs_sor_quarters, pad_hw_q, to_quarters
from tpuflow.ops.warp_pallas import warp_planes_pallas_batched

B = 16
I0s, I1s = [], []
for s in range(B):
    a, b = synth_pair(seed=100 + s)
    I0s.append(a); I1s.append(b)
I0 = jnp.asarray(np.stack(I0s), jnp.float32)
I1 = jnp.asarray(np.stack(I1s), jnp.float32)


def _sync(r):
    leaves = jax.tree_util.tree_leaves(r)
    return float(jnp.sum(leaves[0].ravel()[0]))


def timeit(f, n=10):
    _sync(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    _sync(r)
    return (time.perf_counter() - t0) / n


# --- 1. SOR chunk cost at each level shape ---
ny, nx = 436, 1024
shapes = []
for s in range(7):
    shapes.append((ny, nx))
    nx2, ny2 = zoom_size(nx, ny, 0.5)
    nx, ny = nx2, ny2

for (ly, lx) in shapes[:3]:
    rng = np.random.default_rng(0)
    st = jnp.asarray(rng.standard_normal((B, 2, ly, lx)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, 5, ly, lx)), jnp.float32)
    st_q = to_quarters(pad_hw_q(st))
    ct_q = to_quarters(pad_hw_q(ct))
    for nsw in (6, 24):
        t = timeit(lambda: hs_sor_quarters(st_q, ct_q, ly, lx, nsw, 49.0)[0])
        print(f"SOR {ly}x{lx} sweeps={nsw}: {t*1e3:.2f} ms/call = "
              f"{t/nsw*1e6/B:.1f} us/sweep/sample", flush=True)

# --- 2. warp cost per dmax at finest ---
rng = np.random.default_rng(1)
planes = jnp.asarray(rng.standard_normal((B, 3, 436, 1024)), jnp.float32)
u = jnp.asarray(2.0 * rng.standard_normal((B, 436, 1024)), jnp.float32)
v = jnp.asarray(2.0 * rng.standard_normal((B, 436, 1024)), jnp.float32)
for dmax in (3, 8):
    for tile in ((64, 128), (64, 512)):
        t = timeit(lambda: warp_planes_pallas_batched(planes, u, v, dmax,
                                                      tile=tile))
        print(f"warp dmax={dmax} tile={tile}: {t*1e3:.2f} ms = "
              f"{t*1e6/B:.0f} us/sample", flush=True)

# --- 3. sweeps actually executed per warp at each level (error mode) ---
# replicate hs_scale_batched but log the while-loop iteration count
from tpuflow.models.batch import _normalize_pair_batched, _warp3, HS_SOR_CHUNK
from tpuflow.models.common import build_pyramid

levels, sizes = build_pyramid((I0, I1), 7, 0.5)
alpha2 = 49.0
tol = 1e-4

for s in range(6, -1, -1):
    l1, l2 = levels[s]
    ly, lx = l1.shape[-2:]
    if s == 6:
        uu = jnp.zeros_like(l1)
        vv = jnp.zeros_like(l1)
    else:
        from tpuflow.models.common import upsample_flow
        uu, vv = upsample_flow(uu, vv, sizes[s], 0.5)
    dmax = max(3, math.ceil(8 * (0.5 ** s)))
    size = ly * lx
    thresh = (tol * tol) * size
    I2x, I2y = centered_gradient(l2)
    ns = []
    for wi in range(10):
        I2w, I2wx, I2wy = _warp3(l2, I2x, I2y, uu, vv, dmax)
        dif = l1 - I2w + I2wx * uu + I2wy * vv
        Au = dif * I2wx; Av = dif * I2wy
        Du = I2wx * I2wx + alpha2; Dv = I2wy * I2wy + alpha2
        D = I2wx * I2wy
        st_q = to_quarters(pad_hw_q(jnp.stack([uu, vv], axis=1)))
        ct_q = to_quarters(pad_hw_q(jnp.stack([Au, Av, Du, Dv, D], axis=1)))
        err = jnp.full((B,), jnp.inf, jnp.float32)
        n = 0
        while bool(jnp.any(err > thresh)) and n < 150:
            new_st, new_err = hs_sor_quarters(st_q, ct_q, ly, lx,
                                              HS_SOR_CHUNK, alpha2)
            act = err > thresh
            st_q = jnp.where(act[:, None, None, None], new_st, st_q)
            err = jnp.where(act, new_err, err)
            n += HS_SOR_CHUNK
        from tpuflow.ops.hs_pallas import from_quarters
        uv = from_quarters(st_q)
        uu, vv = uv[:, 0, :ly, :lx], uv[:, 1, :ly, :lx]
        ns.append(n)
    print(f"level {s} {ly}x{lx} dmax={dmax}: sweeps/warp = {ns}", flush=True)
