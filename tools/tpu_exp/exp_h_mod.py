# Tile-relative warp v2: aligned dynamic DMA + in-kernel dynamic roll.
import sys, functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

def _cubic_weights(t):
    t2 = t * t
    t3 = t2 * t
    return (0.5 * (-t3 + 2 * t2 - t),
            0.5 * (3 * t3 - 5 * t2 + 2),
            0.5 * (-3 * t3 + 4 * t2 + t),
            0.5 * (t3 - t2))

def _axis_weight(c, rel, off):
    m = off - rel + 1
    w = jnp.zeros_like(c[0])
    for t in range(4):
        w = jnp.where(m == t, c[t], w)
    return w

def _warp_kernel(by_ref, bx_ref, u_ref, v_ref, planes_ref, out_ref,
                 win, sem, *, rbud, th, tw, ny, nx, n_planes, p0y, p0x):
    R = rbud
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dtype = out_ref.dtype
    by = by_ref[b, i, j]
    bx = bx_ref[b, i, j]

    oy = i * th + by - (R + 1) + p0y
    ox = j * tw + bx - (R + 1) + p0x
    oy_al = pl.multiple_of((oy // 8) * 8, 8)
    ox_al = pl.multiple_of((ox // 128) * 128, 128)
    y_mis = oy - oy_al
    x_mis = ox - ox_al

    wh2 = win.shape[1]
    ww2 = win.shape[2]
    dma = pltpu.make_async_copy(
        planes_ref.at[b, :, pl.ds(oy_al, wh2), pl.ds(ox_al, ww2)],
        win, sem)
    dma.start()

    ii = (i * th + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0))
    jj = (j * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1))
    u = u_ref[0]
    v = v_ref[0]
    xx = jj.astype(dtype) + u
    yy = ii.astype(dtype) + v
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
    wys = [_axis_weight(cy, lrely, ky) for ky in range(-R - 1, R + 3)]

    dma.wait()
    rolled = [pltpu.roll(pltpu.roll(win[p], -y_mis, 0), -x_mis, 1)
              for p in range(n_planes)]
    acc = [jnp.zeros((th, tw), dtype=dtype) for _ in range(n_planes)]
    for kxi in range(2 * R + 4):
        wx = _axis_weight(cx, lrelx, kxi - R - 1)
        cols = [rolled[p][:, kxi:kxi + tw] for p in range(n_planes)]
        for kyi in range(2 * R + 4):
            w = wx * wys[kyi]
            for p in range(n_planes):
                acc[p] = acc[p] + w * cols[p][kyi:kyi + th]
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
    wh2 = ru(th + 2 * R + 4, 8) + 8
    ww2 = ru(tw + 2 * R + 4, 128) + 128

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
    pad_b = max(0, (gy - 1) * th + (D + 1) - (R + 1) + wh2 - ny)
    pad_r = max(0, (gx - 1) * tw + (D + 1) - (R + 1) + ww2 - nx)
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
            pltpu.VMEM((n_planes, wh2, ww2), planes.dtype),
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


