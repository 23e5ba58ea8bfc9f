# Round-3 warp experiments:
#  A. exact kernel with larger tiles (DMA roundup amortization)
#  B. relative-window kernel (per-tile base, residual R) with HBM source
#     and dynamic-offset DMA (round-2 attempt failed only because ANY
#     placed the source in VMEM, whose slices must be 8-aligned)
import sys, functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from tpuflow.ops.warp_pallas import warp_planes_pallas_batched, _cubic_weights, _axis_weight
from tpuflow.ops.interp import warp_planes


def _sync(r):
    leaves = jax.tree_util.tree_leaves(r)
    return float(jnp.sum(leaves[0].ravel()[0]))


def timeit(f, n=20):
    _sync(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    _sync(r)
    return (time.perf_counter() - t0) / n


rng = np.random.default_rng(0)
B, H, W = 16, 436, 1024
planes = jnp.asarray(rng.standard_normal((B, 3, H, W)), jnp.float32)
u = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)
v = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)

# --- A: tile sweep on the exact kernel ---
for tile in ((64, 128), (64, 512), (64, 1024), (128, 1024), (32, 1024)):
    for dmax in (3, 8):
        try:
            f = jax.jit(lambda p, a, b, d=dmax, t=tile:
                        warp_planes_pallas_batched(p, a, b, d, tile=t))
            dt = timeit(lambda: f(planes, u, v))
            print(f"A exact tile={tile} dmax={dmax}: {dt*1e3:.2f} ms/call "
                  f"= {dt/B*1e6:.0f} us/sample", flush=True)
        except Exception as e:
            print(f"A exact tile={tile} dmax={dmax}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


# --- B: relative-window kernel, HBM source ---
def _warp_kernel(by_ref, bx_ref, u_ref, v_ref, planes_ref, out_ref,
                 win, sem, *, rbud, th, tw, ny, nx, n_planes, p0y, p0x):
    R = rbud
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dtype = out_ref.dtype
    wh = win.shape[1]
    ww = win.shape[2]
    by = by_ref[b, i, j]
    bx = bx_ref[b, i, j]

    dma = pltpu.make_async_copy(
        planes_ref.at[b, :,
                      pl.ds(i * th + by - (R + 1) + p0y, wh),
                      pl.ds(j * tw + bx - (R + 1) + p0x, ww)],
        win, sem)
    dma.start()

    ii = (i * th + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0))
    jj = (j * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1))
    uu = u_ref[0]
    vv = v_ref[0]
    xx = jj.astype(dtype) + uu
    yy = ii.astype(dtype) + vv
    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    fx = xx - x0
    fy = yy - y0
    lrelx = x0.astype(jnp.int32) - jj - bx
    lrely = y0.astype(jnp.int32) - ii - by
    out_dom = ((xx < 1) | (x0 > nx - 3) | (yy < 1) | (y0 > ny - 3)
               | (lrelx < -R) | (lrelx > R) | (lrely < -R) | (lrely > R))

    cx = _cubic_weights(fx)
    cy = _cubic_weights(fy)
    wxs = [_axis_weight(cx, lrelx, kx) for kx in range(-R - 1, R + 3)]

    dma.wait()
    acc = [jnp.zeros((th, tw), dtype=dtype) for _ in range(n_planes)]
    for ky in range(-R - 1, R + 3):
        wy = _axis_weight(cy, lrely, ky)
        ay = ky + R + 1
        for kxi, kx in enumerate(range(-R - 1, R + 3)):
            w = wy * wxs[kxi]
            ax = kx + R + 1
            for p in range(n_planes):
                acc[p] = acc[p] + w * win[p, ay:ay + th, ax:ax + tw]
    zero = jnp.zeros((), dtype=dtype)
    for p in range(n_planes):
        out_ref[0, p] = jnp.where(out_dom, zero, acc[p])


@functools.partial(jax.jit, static_argnames=("dmax", "rbud", "tile", "interpret"))
def warp_tile_relative(planes, u, v, dmax, rbud=4, tile=(64, 512),
                       interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb, n_planes, ny, nx = planes.shape
    D = int(dmax)
    R = int(rbud)
    th, tw = tile
    th = min(th, max(8, -(-ny // 8) * 8))
    tw = min(tw, max(128, -(-nx // 128) * 128))
    gy = -(-ny // th)
    gx = -(-nx // tw)
    hyp, wxp = gy * th, gx * tw

    ru = lambda x, m: -(-x // m) * m
    wh = ru(th + 2 * R + 4, 8)
    ww = ru(tw + 2 * R + 4, 128)

    def tile_base(f):
        fp = jnp.pad(f, ((0, 0), (0, hyp - ny), (0, wxp - nx)))
        t = fp.reshape(nb, gy, th, gx, tw)
        mn = jnp.min(t, axis=(2, 4))
        mx = jnp.max(t, axis=(2, 4))
        return jnp.clip(jnp.round((mn + mx) * 0.5), -(D + 1), D + 1
                        ).astype(jnp.int32)

    by = tile_base(v)
    bx = tile_base(u)

    p0y = D + R + 2
    p0x = D + R + 2
    pad_b = max(0, (gy - 1) * th + (D + 1) + wh - (R + 1) - (ny + p0y)) + 8
    pad_r = max(0, (gx - 1) * tw + (D + 1) + ww - (R + 1) - (nx + p0x)) + 128
    planes_p = jnp.pad(planes, ((0, 0), (0, 0), (p0y, pad_b), (p0x, pad_r)),
                       mode="edge")
    if (hyp, wxp) != (ny, nx):
        u = jnp.pad(u, ((0, 0), (0, hyp - ny), (0, wxp - nx)))
        v = jnp.pad(v, ((0, 0), (0, hyp - ny), (0, wxp - nx)))

    kern = functools.partial(_warp_kernel, rbud=R, th=th, tw=tw, ny=ny,
                             nx=nx, n_planes=n_planes, p0y=p0y, p0x=p0x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, gy, gx),
        in_specs=[
            pl.BlockSpec((1, th, tw), lambda b, i, j, *_: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda b, i, j, *_: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, n_planes, th, tw),
                               lambda b, i, j, *_: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_planes, wh, ww), planes.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, n_planes, hyp, wxp),
                                       planes.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(by, bx, u, v, planes_p)
    return out[:, :, :ny, :nx]


# correctness on a smooth big-motion flow
Bc, Hc, Wc = 2, 96, 300
base = rng.standard_normal((Hc, Wc))
pl_c = jnp.asarray(np.stack([np.stack([base, base * 0.5 + 1, base ** 2])
                             for _ in range(Bc)]), jnp.float32)
yy, xx = np.mgrid[0:Hc, 0:Wc]
uc = 5.0 * np.sin(xx / 80.0) + 2.0 * np.cos(yy / 60.0)
vc = -4.0 * np.cos(xx / 90.0) + 1.5 * np.sin(yy / 50.0)
uc = jnp.asarray(np.stack([uc, uc * 0.8]), jnp.float32)
vc = jnp.asarray(np.stack([vc, vc * 0.8]), jnp.float32)
try:
    out = warp_tile_relative(pl_c, uc, vc, dmax=8, rbud=4, tile=(32, 128))
    ref = jax.vmap(lambda p, a, b: warp_planes(p, a, b, border_out=True))(pl_c, uc, vc)
    d = float(jnp.max(jnp.abs(out - ref)))
    print("B rel maxdiff vs exact bicubic:", d, flush=True)
except Exception as e:
    print(f"B rel correctness: FAIL {type(e).__name__} {str(e)[:400]}", flush=True)

for tile in ((64, 512), (64, 1024), (128, 1024), (32, 1024)):
    for R in (3, 4):
        try:
            f = lambda: warp_tile_relative(planes, u, v, dmax=8, rbud=R, tile=tile)
            dt = timeit(f)
            print(f"B rel tile={tile} R={R}: {dt*1e3:.2f} ms/call "
                  f"= {dt/B*1e6:.0f} us/sample", flush=True)
        except Exception as e:
            print(f"B rel tile={tile} R={R}: FAIL {type(e).__name__} "
                  f"{str(e)[:160]}", flush=True)
