"""Fused Pallas kernel for the TV-L1 inner fixed point.

One TV-L1 iteration (thresholding -> primal update -> Chambolle dual
ascent, reference src/tvl1flow.cpp:113-181) is ~40 flops/pixel over 10
arrays — pure bandwidth.  Under XLA each iteration round-trips every
array through HBM (~27 MB per 1024x436 iteration) and the per-step
stencils (divergence reads p[j-1], forward gradient reads u[j+1]) stop
cross-iteration fusion.

This kernel exploits the v5e's large (~128 MB) VMEM: the WHOLE level
(all 6 state planes + 4 per-warp constant planes) lives in VMEM for the
full `n_iters` chunk, so HBM is touched once per chunk instead of once
per iteration, and there is no halo at all — the "window rim" is the
physical image boundary, handled by exact masks replicating the
reference's boundary semantics:

  * forward gradient: zero at the last row/column
    (src/operators.cpp:86-125)
  * divergence: Chambolle's rule — last row/col of the dual never
    contributes, first row/col uses +p (src/operators.cpp:35-78)

The grid runs over the batch, so Pallas pipelines sample b+1's HBM->VMEM
loads under sample b's compute.  The iteration loop is a
`lax.fori_loop` (constant Mosaic program size in n_iters).

The second output is the reference's stopping statistic — the LAST
iteration's summed squared flow update per sample
(src/tvl1flow.cpp:150-162) — enabling chunked per-sample
data-dependent stopping in batch mode.
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

# per-chunk VMEM budget: in(10) + out(7ish) planes double-buffered must
# stay under the chip's ~128 MB VMEM
VMEM_LIMIT_BYTES = 120 * 1024 * 1024


def fits_vmem(ny, nx, n_state=6, n_const=4, dtype_bytes=4):
    """Whether a (state, const) level fits the whole-image VMEM kernel.

    Counts double-buffered inputs + outputs + ~8 live temporaries."""
    hp = -(-ny // 8) * 8
    wp = -(-nx // 128) * 128
    planes = 2 * (n_state + n_const) + n_state + 8
    return planes * hp * wp * dtype_bytes < 100 * 1024 * 1024


def _tvl1_kernel(thresh_ref, maxiter_ref, state_ref, const_ref, out_ref,
                 stat_ref, *, ny, nx, l_t, theta, taut):
    """Whole-warp TV-L1 kernel with the reference's per-iteration
    stopping rule INSIDE the kernel: iterate until the sum of squared
    flow updates drops to `thresh` (= epsilon^2 * size) or `max_iter`
    (reference src/tvl1flow.cpp:113,150-162).  One HBM round-trip per
    warp; each batch sample is its own grid step, so every sample stops
    at exactly its own iteration — no chunk granularity.

    `thresh` and `max_iter` are RUNTIME scalars (SMEM), so one Mosaic
    program serves every pyramid level's iteration budget and both the
    fixed-schedule (thresh < 0) and error-stopping modes — the round-4
    cold-compile fix: ~18 kernel variants collapse to one per padded
    level shape."""
    dtype = out_ref.dtype
    thresh = thresh_ref[0, 0]
    max_iter = maxiter_ref[0, 0]
    Hp, Wp = state_ref.shape[2], state_ref.shape[3]
    gi = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    last_col = gj == nx - 1
    last_row = gi == ny - 1
    first_col = gj == 0
    first_row = gi == 0
    zero = jnp.zeros((), dtype)

    iwx = const_ref[0, IWX]
    iwy = const_ref[0, IWY]
    rho_c = const_ref[0, RHO_C]
    grad = const_ref[0, GRAD]
    fi = -1.0 / jnp.maximum(grad, GRAD_IS_ZERO)

    def shift_left(a):
        return jnp.concatenate([a[:, 1:], jnp.zeros((Hp, 1), dtype)], axis=1)

    def shift_right(a):
        return jnp.concatenate([jnp.zeros((Hp, 1), dtype), a[:, :-1]], axis=1)

    def shift_up(a):
        return jnp.concatenate([a[1:], jnp.zeros((1, Wp), dtype)], axis=0)

    def shift_down(a):
        return jnp.concatenate([jnp.zeros((1, Wp), dtype), a[:-1]], axis=0)

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

    def body(c):
        u1, u2, p11, p12, p21, p22, _, n = c
        rho = rho_c + iwx * u1 + iwy * u2
        lo = rho < -l_t * grad
        hi = rho > l_t * grad
        tiny = grad < GRAD_IS_ZERO
        mul = jnp.where(lo, l_t, jnp.where(hi, -l_t,
                        jnp.where(tiny, zero, rho * fi)))
        v1 = u1 + mul * iwx
        v2 = u2 + mul * iwy

        u1n = v1 + theta * divergence(p11, p12)
        u2n = v2 + theta * divergence(p21, p22)
        # pad pixels never move (their grad/rho/p are zero), so the
        # full-plane sum equals the in-image sum
        du = u1n - u1
        dv = u2n - u2
        err = jnp.sum(du * du + dv * dv)

        u1x, u1y = fgrad(u1n)
        u2x, u2y = fgrad(u2n)
        ng1 = 1.0 / (1.0 + taut * jnp.sqrt(u1x * u1x + u1y * u1y))
        ng2 = 1.0 / (1.0 + taut * jnp.sqrt(u2x * u2x + u2y * u2y))
        p11 = (p11 + taut * u1x) * ng1
        p12 = (p12 + taut * u1y) * ng1
        p21 = (p21 + taut * u2x) * ng2
        p22 = (p22 + taut * u2y) * ng2
        return u1n, u2n, p11, p12, p21, p22, err, n + 1

    def cond(c):
        return (c[6] > thresh) & (c[7] < max_iter)

    init = (state_ref[0, U1], state_ref[0, U2], state_ref[0, P11],
            state_ref[0, P12], state_ref[0, P21], state_ref[0, P22],
            jnp.asarray(jnp.inf, dtype), jnp.asarray(0, jnp.int32))
    c = jax.lax.while_loop(cond, body, init)
    u1, u2, p11, p12, p21, p22, err, n = c
    out_ref[0, U1] = u1
    out_ref[0, U2] = u2
    out_ref[0, P11] = p11
    out_ref[0, P12] = p12
    out_ref[0, P21] = p21
    out_ref[0, P22] = p22
    # stat rows: row 0 = err, row 1 = iteration count
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    stat_ref[0] = jnp.where(ri == 1, n.astype(dtype), err)


def _tvl1_call(state_p, const_p, ny, nx, thresh, max_iter, l_t, theta,
               taut, interpret):
    """Shared pallas_call for both stopping modes; `thresh`/`max_iter`
    ride in SMEM so the Mosaic program depends only on the padded
    shape."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb, _, Hp, Wp = state_p.shape
    if Hp % 8 or Wp % 128:
        raise ValueError(f"padded dims must be (8,128)-aligned, got {(Hp, Wp)}")
    kern = functools.partial(_tvl1_kernel, ny=ny, nx=nx, l_t=float(l_t),
                             theta=float(theta), taut=float(taut))
    thresh = jnp.asarray(thresh, state_p.dtype).reshape(1, 1)
    max_iter = jnp.asarray(max_iter, jnp.int32).reshape(1, 1)
    out, stat = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 6, Hp, Wp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, Hp, Wp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 6, Hp, Wp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 6, Hp, Wp), state_p.dtype),
            jax.ShapeDtypeStruct((nb, 8, 128), state_p.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(thresh, max_iter, state_p, const_p)
    return out, stat


@functools.partial(jax.jit, static_argnames=("ny", "nx", "l_t", "theta",
                                             "taut", "interpret"))
def tvl1_iterate_error_padded(state_p, const_p, ny, nx, thresh, max_iter,
                              l_t, theta, taut, interpret=None):
    """Run one warp's full inner fixed point with the reference's
    data-dependent stopping inside the kernel (see _tvl1_kernel).

    state_p: (B, 6, Hp, Wp), const_p: (B, 4, Hp, Wp), (8,128)-aligned.
    Returns (state_p, err, n_iters) with per-sample (B,) stopping
    statistics."""
    out, stat = _tvl1_call(state_p, const_p, ny, nx, thresh, max_iter,
                           l_t, theta, taut, interpret)
    return out, stat[:, 0, 0], stat[:, 1, 0].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("ny", "nx", "l_t", "theta",
                                             "taut", "interpret"))
def tvl1_iterate_padded(state_p, const_p, ny, nx, n_iters, l_t, theta, taut,
                        interpret=None):
    """Fused TV-L1 chunk on PRE-PADDED arrays (throughput path).

    state_p: (B, 6, Hp, Wp), const_p: (B, 4, Hp, Wp) with Hp % 8 == 0,
    Wp % 128 == 0; (ny, nx) is the true image size.  Returns
    (state_p, err) with the same padded layout — callers keep state
    padded across chunks of a scale and unpad once at the end, avoiding
    two extra HBM copies per chunk.  Runs exactly `n_iters` iterations
    (thresh = -1 disables the in-kernel stop)."""
    out, stat = _tvl1_call(state_p, const_p, ny, nx, -1.0, n_iters,
                           l_t, theta, taut, interpret)
    return out, stat[:, 0, 0]


def pad_hw(a, ny=None, nx=None):
    """Zero-pad the trailing (H, W) dims up to the (8, 128) tiling."""
    ny = a.shape[-2] if ny is None else ny
    nx = a.shape[-1] if nx is None else nx
    hp = -(-ny // 8) * 8
    wp = -(-nx // 128) * 128
    pad = [(0, 0)] * (a.ndim - 2) + [(0, hp - a.shape[-2]),
                                     (0, wp - a.shape[-1])]
    return jnp.pad(a, pad)


@functools.partial(jax.jit, static_argnames=("l_t", "theta",
                                             "taut", "tile", "interpret"))
def tvl1_iterate_pallas(state, const, n_iters, l_t, theta, taut,
                        tile=None, interpret=None):
    """Run `n_iters` TV-L1 fixed-point iterations in one fused pass.

    state: (B, 6, H, W) = (u1, u2, p11, p12, p21, p22)
    const: (B, 4, H, W) = (I1wx, I1wy, rho_c, grad) — per-warp constants
    Returns (state, err): the updated state plus the per-sample (B,)
    sum of squared flow updates of the LAST iteration — the reference's
    stopping statistic (src/tvl1flow.cpp:150-162).  Results are exact:
    the whole level lives in VMEM, so every iteration sees full
    neighbor context.  `tile` is accepted for backward compatibility
    and ignored (the whole-image design has no spatial tiling).
    """
    del tile
    nb, _, ny, nx = state.shape
    out, err = tvl1_iterate_padded(pad_hw(state), pad_hw(const), ny, nx,
                                   n_iters, l_t, theta, taut,
                                   interpret=interpret)
    return out[:, :, :ny, :nx], err
