"""Temporally-blocked Pallas kernel for the TV-L1 inner fixed point.

One TV-L1 iteration (thresholding -> primal update -> Chambolle dual
ascent, reference src/tvl1flow.cpp:113-181) is ~40 flops/pixel over 10
arrays — pure bandwidth.  Under XLA each iteration round-trips every
array through HBM (~27 MB per 1024x436 iteration), and the per-step
stencils (divergence reads p[j-1], forward gradient reads u[j+1]) stop
cross-iteration fusion.  This kernel runs M ITERATIONS PER HBM
ROUND-TRIP: each (tile + M halo) window iterates entirely in VMEM, and
because every iteration consumes one ring of neighbor context, after M
iterations the central tile is still EXACT — classic temporal blocking
for stencils.  HBM traffic drops by ~M (the halo overlap costs
(1 + 2M/tile)^2).

Boundary semantics are the reference's, applied by global-coordinate
masks inside the window:
  * forward gradient: zero at the last row/column
    (src/operators.cpp:86-125)
  * divergence: Chambolle's rule — last row/col of the dual never
    contributes, first row/col uses +p (src/operators.cpp:35-78)

Fixed iteration counts only (the batching/throughput mode — per-sample
early exit cannot batch anyway).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRAD_IS_ZERO = 1e-10  # reference src/tvl1flow.cpp:24

# state plane order
U1, U2, P11, P12, P21, P22 = range(6)
# constant plane order
IWX, IWY, RHO_C, GRAD = range(4)


def _tvl1_iter_kernel(state_ref, const_ref, out_ref, err_ref, swin, cwin,
                      sems, *, n_iters, th, tw, ny, nx, l_t, theta, taut,
                      halo):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dtype = out_ref.dtype
    wh = swin.shape[1]
    ww = swin.shape[2]

    dma_s = pltpu.make_async_copy(
        state_ref.at[b, :, pl.ds(i * th, wh), pl.ds(j * tw, ww)], swin,
        sems.at[0])
    dma_c = pltpu.make_async_copy(
        const_ref.at[b, :, pl.ds(i * th, wh), pl.ds(j * tw, ww)], cwin,
        sems.at[1])
    dma_s.start()
    dma_c.start()
    dma_s.wait()
    dma_c.wait()

    # global coordinates of the window (origin = tile start - halo)
    gi = (i * th - halo
          + jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 0))
    gj = (j * tw - halo
          + jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 1))
    last_col = gj == nx - 1
    last_row = gi == ny - 1
    first_col = gj == 0
    first_row = gi == 0

    iwx = cwin[IWX]
    iwy = cwin[IWY]
    rho_c = cwin[RHO_C]
    grad = cwin[GRAD]
    fi = -1.0 / jnp.maximum(grad, GRAD_IS_ZERO)
    zero = jnp.zeros((), dtype=dtype)

    u1 = swin[U1]
    u2 = swin[U2]
    p11 = swin[P11]
    p12 = swin[P12]
    p21 = swin[P21]
    p22 = swin[P22]

    def shift_left(a):   # a[i, j+1], zero past the window rim
        return jnp.concatenate([a[:, 1:], jnp.zeros((wh, 1), dtype)], axis=1)

    def shift_right(a):  # a[i, j-1]
        return jnp.concatenate([jnp.zeros((wh, 1), dtype), a[:, :-1]], axis=1)

    def shift_up(a):     # a[i+1, j]
        return jnp.concatenate([a[1:], jnp.zeros((1, ww), dtype)], axis=0)

    def shift_down(a):   # a[i-1, j]
        return jnp.concatenate([jnp.zeros((1, ww), dtype), a[:-1]], axis=0)

    def divergence(pa, pb):
        a = jnp.where(last_col, zero, pa)
        bb = jnp.where(last_row, zero, pb)
        dx = a - jnp.where(first_col, zero, shift_right(a))
        dy = bb - jnp.where(first_row, zero, shift_down(bb))
        return dx + dy

    def fgrad(f):
        fx = jnp.where(last_col, zero, shift_left(f) - f)
        fy = jnp.where(last_row, zero, shift_up(f) - f)
        return fx, fy

    u1_prev = u1
    u2_prev = u2
    for it in range(n_iters):
        if it == n_iters - 1:
            u1_prev = u1
            u2_prev = u2
        rho = rho_c + iwx * u1 + iwy * u2
        lo = rho < -l_t * grad
        hi = rho > l_t * grad
        tiny = grad < GRAD_IS_ZERO
        mul = jnp.where(lo, l_t, jnp.where(hi, -l_t,
                        jnp.where(tiny, zero, rho * fi)))
        v1 = u1 + mul * iwx
        v2 = u2 + mul * iwy

        u1 = v1 + theta * divergence(p11, p12)
        u2 = v2 + theta * divergence(p21, p22)

        u1x, u1y = fgrad(u1)
        u2x, u2y = fgrad(u2)
        ng1 = 1.0 / (1.0 + taut * jnp.sqrt(u1x * u1x + u1y * u1y))
        ng2 = 1.0 / (1.0 + taut * jnp.sqrt(u2x * u2x + u2y * u2y))
        p11 = (p11 + taut * u1x) * ng1
        p12 = (p12 + taut * u1y) * ng1
        p21 = (p21 + taut * u2x) * ng2
        p22 = (p22 + taut * u2y) * ng2

    sl = (slice(halo, halo + th), slice(halo, halo + tw))
    out_ref[0, U1] = u1[sl]
    out_ref[0, U2] = u2[sl]
    out_ref[0, P11] = p11[sl]
    out_ref[0, P12] = p12[sl]
    out_ref[0, P21] = p21[sl]
    out_ref[0, P22] = p22[sl]
    # last-iteration mean-squared-update contribution of this tile (the
    # reference's stopping statistic, src/tvl1flow.cpp:150-162); padding
    # pixels beyond the image are masked out
    in_img = ((gi[sl] >= 0) & (gi[sl] < ny) & (gj[sl] >= 0) & (gj[sl] < nx))
    du = jnp.where(in_img, u1[sl] - u1_prev[sl], zero)
    dv = jnp.where(in_img, u2[sl] - u2_prev[sl], zero)
    # broadcast the tile's partial error over its (8, 128) output block
    # (Mosaic requires hardware-tiled block shapes; the caller
    # subsamples one element per tile)
    err_ref[0] = jnp.full((8, 128), jnp.sum(du * du + dv * dv), dtype=dtype)


@functools.partial(jax.jit, static_argnames=("n_iters", "l_t", "theta",
                                             "taut", "tile", "interpret"))
def tvl1_iterate_pallas(state, const, n_iters, l_t, theta, taut,
                        tile=(64, 256), interpret=None):
    """Run `n_iters` TV-L1 fixed-point iterations in one fused pass.

    state: (B, 6, H, W) = (u1, u2, p11, p12, p21, p22)
    const: (B, 4, H, W) = (I1wx, I1wy, rho_c, grad) — per-warp constants
    Returns (state, err): the updated state plus the per-sample (B,)
    sum of squared flow updates of the LAST iteration — the reference's
    stopping statistic (src/tvl1flow.cpp:150-162), enabling chunked
    data-dependent stopping in batch mode.  Results are exact (not
    approximate): the halo equals the iteration count, so the written
    tile has full neighbor context for every iteration.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb, ns, ny, nx = state.shape
    th, tw = tile
    th = min(th, max(8, ny))
    tw = min(tw, max(128, nx))
    gy = -(-ny // th)
    gx = -(-nx // tw)
    hyp = gy * th
    wxp = gx * tw
    halo = n_iters

    def round_up(x, m):
        return -(-x // m) * m

    wh = round_up(th + 2 * halo, 8)
    ww = round_up(tw + 2 * halo, 128)

    def padw(a):
        return jnp.pad(a, ((0, 0), (0, 0),
                           (halo, (hyp + wh - th) - (ny + halo)),
                           (halo, (wxp + ww - tw) - (nx + halo))))

    kern = functools.partial(_tvl1_iter_kernel, n_iters=n_iters, th=th,
                             tw=tw, ny=ny, nx=nx, l_t=float(l_t),
                             theta=float(theta), taut=float(taut), halo=halo)
    out = pl.pallas_call(
        kern,
        grid=(nb, gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 6, th, tw), lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 6, hyp, wxp), state.dtype),
            jax.ShapeDtypeStruct((nb, gy * 8, gx * 128), state.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((6, wh, ww), state.dtype),
            pltpu.VMEM((4, wh, ww), state.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(padw(state), padw(const))
    out, err = out
    return out[:, :, :ny, :nx], jnp.sum(err[:, ::8, ::128], axis=(1, 2))
