"""Pallas TPU kernel for the displacement-bounded bicubic warp.

The hot op of every solver is the backward warp of an image stack by
the current flow (e.g. reference src/tvl1flow.cpp:94-96).  XLA lowers
per-pixel gathers to scalar loops (~260 ms for 3 planes at 1024x436 on
one chip), and the pure-XLA shift-select fallback
(`tpuflow.ops.interp.warp_planes_shift`) materializes each of the
(2*dmax+4)^2 shifted terms through HBM (~7-56 ms).  This kernel keeps
a (tile + halo) window of all planes in VMEM and accumulates the
one-hot-weighted static shifts entirely on the VPU — the whole
(2*dmax+4)^2 sum touches HBM once.

Semantics: identical to `warp_planes_shift` (== `warp_planes` with
border_out=True for |flow|inf <= dmax, flows beyond the bound produce
0, same class as the border_out zeroing).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cubic_weights(t):
    """Keys-cell weights per tap (reference src/bicubic_interpolation.cpp:108-123)."""
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


def _warp_kernel(u_ref, v_ref, planes_ref, out_ref, win_ref, sem, *, dmax,
                 th, tw, ny, nx, n_planes):
    D = dmax
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dtype = out_ref.dtype

    # DMA the overlapping (tile + halo) window of all planes into VMEM —
    # windows overlap by 2D+4, which BlockSpec striding cannot express.
    # Window dims are rounded up to the (8, 128) tiling.
    wh = win_ref.shape[1]
    ww = win_ref.shape[2]
    dma = pltpu.make_async_copy(
        planes_ref.at[b, :, pl.ds(i * th, wh), pl.ds(j * tw, ww)],
        win_ref, sem)
    dma.start()
    dma.wait()

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
    relx = x0.astype(jnp.int32) - jj
    rely = y0.astype(jnp.int32) - ii
    out_dom = ((xx < 1) | (x0 > nx - 3) | (yy < 1) | (y0 > ny - 3))

    cx = _cubic_weights(fx)
    cy = _cubic_weights(fy)

    # precompute the x one-hot weights once per column offset
    wxs = [_axis_weight(cx, relx, kx) for kx in range(-D - 1, D + 3)]

    acc = [jnp.zeros((th, tw), dtype=dtype) for _ in range(n_planes)]
    for ky in range(-D - 1, D + 3):
        wy = _axis_weight(cy, rely, ky)
        ay = ky + D + 1
        for kxi, kx in enumerate(range(-D - 1, D + 3)):
            w = wy * wxs[kxi]
            ax = kx + D + 1
            for p in range(n_planes):
                acc[p] = acc[p] + w * win_ref[p, ay:ay + th, ax:ax + tw]
    zero = jnp.zeros((), dtype=dtype)
    for p in range(n_planes):
        out_ref[0, p] = jnp.where(out_dom, zero, acc[p])


def warp_planes_pallas(planes, u, v, dmax, tile=(64, 128), interpret=None):
    """Warp (P, H, W) planes by one bounded flow field on the TPU VPU.

    Equivalent to warp_planes(..., border_out=True) for
    |u|inf, |v|inf <= dmax; flows beyond the bound yield 0.
    """
    out = warp_planes_pallas_batched(planes[None], u[None], v[None], dmax,
                                     tile, interpret)
    return out[0]


@functools.partial(jax.jit, static_argnames=("dmax", "tile", "interpret"))
def warp_planes_pallas_batched(planes, u, v, dmax, tile=(64, 128),
                               interpret=None):
    """Batched bounded warp: (B, P, H, W) planes, (B, H, W) flows.

    The batch is a grid dimension, so every (sample, tile) pair
    pipelines through the same kernel — the TPU throughput path for
    data-parallel batches of frame pairs.  `interpret` defaults to
    auto: interpreter mode off-TPU (tests run on the CPU backend).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb, n_planes, ny, nx = planes.shape
    D = int(dmax)
    th, tw = tile
    th = min(th, max(8, ny))
    gy = -(-ny // th)
    gx = -(-nx // tw)
    hyp = ny if ny % th == 0 else gy * th
    wxp = nx if nx % tw == 0 else gx * tw

    def round_up(x, m):
        return -(-x // m) * m

    # window = tile + halo, rounded up to the (8, 128) DMA tiling
    wh = round_up(th + 2 * D + 4, 8)
    ww = round_up(tw + 2 * D + 4, 128)

    # pad: halo D+1 before; after-pad sized so the last window fits,
    # edge-clamped — clamping never matters for in-domain pixels
    planes_p = jnp.pad(
        planes,
        ((0, 0), (0, 0),
         (D + 1, (hyp + wh - th) - (ny + D + 1)),
         (D + 1, (wxp + ww - tw) - (nx + D + 1))),
        mode="edge")
    if (hyp, wxp) != (ny, nx):
        u = jnp.pad(u, ((0, 0), (0, hyp - ny), (0, wxp - nx)))
        v = jnp.pad(v, ((0, 0), (0, hyp - ny), (0, wxp - nx)))

    kern = functools.partial(_warp_kernel, dmax=D, th=th, tw=tw, ny=ny,
                             nx=nx, n_planes=n_planes)
    out = pl.pallas_call(
        kern,
        grid=(nb, gy, gx),
        in_specs=[
            pl.BlockSpec((1, th, tw), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # windows DMA'd manually
        ],
        out_specs=pl.BlockSpec((1, n_planes, th, tw),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, n_planes, hyp, wxp),
                                       planes.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_planes, wh, ww), planes.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u, v, planes_p)
    return out[:, :, :ny, :nx]
