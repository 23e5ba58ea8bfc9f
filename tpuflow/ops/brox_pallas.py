"""Fused Pallas kernel for the Brox-family red-black SOR.

brox_spatial, brox_temporal (per frame) and robust_expo all relax the
same coupled 5-point system on the flow INCREMENT (du, dv)
(reference sor_iteration, src/brox_optic_flow_spatial.cpp:129-172;
src/robust_expo_generic_tensor.cpp:18-167):

    du <- (1-w) du + w (Au - D dv + alpha * divp(du)) / Du
    dv <- (1-w) dv + w (Av - D du' + alpha * divp(dv)) / Dv
    divp(f) = psi1 f(i+1,j) + psi2 f(i-1,j) + psi3 f(i,j+1)
              + psi4 f(i,j-1)

with the psi_i already ZERO across the image boundary
(src/brox_spatial_mask.cpp:16-93), so neighbor clamping is exact.
Under XLA each red-black sweep round-trips ~11 full planes through HBM
and the data-dependent `sqrt(err/size) > TOL` stop (up to 300 sweeps x
15 outer iterations) keeps the op tiny — the r5 all-seven bench
measured brox_spatial at only ~1.8x the 2-vCPU reference binary while
TV-L1 (whose fixed point runs in VMEM) is ~200x.

This kernel is the HS treatment (tpuflow.ops.hs_pallas) applied to the
Brox system: every plane parity-decomposed into quarters, the whole
level resident in VMEM for the full data-dependent solve, stopping
checked in-kernel after every sweep with runtime (thresh, max_iter)
scalars (one Mosaic program serves both stopping modes and every
outer/inner iteration).  Red-black on the 5-point stencil maps onto
quarters as: RED = quarters (0,0)+(1,1), BLACK = (0,1)+(1,0) — every
5-point neighbor of a red pixel is black, matching the XLA ordering of
tpuflow.models.brox_spatial._sor_sweep exactly (du first, dv reads the
just-updated du).

Plane orders (quarter index k = 2*row_parity + col_parity):
  state_q: du(4), dv(4)                                  -> (B, 8, ...)
  const_q: Au(4), Av(4), Du(4), Dv(4), D(4),
           psi1(4), psi2(4), psi3(4), psi4(4)            -> (B, 36, ...)
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow.ops.tvl1_pallas import VMEM_LIMIT_BYTES

SOR_OMEGA = 1.9  # reference src/brox_optic_flow_spatial.cpp:25


def _brox_sor_q_kernel(thresh_ref, maxiter_ref, state_ref, const_ref,
                       out_ref, err_ref, *, ny, nx, alpha, omega):
    dtype = out_ref.dtype
    thresh = thresh_ref[0, 0]
    max_iter = maxiter_ref[0, 0]
    Hq, Wq = state_ref.shape[2], state_ref.shape[3]
    w = omega

    giq = jax.lax.broadcasted_iota(jnp.int32, (Hq, Wq), 0)
    gjq = jax.lax.broadcasted_iota(jnp.int32, (Hq, Wq), 1)
    in_img = [[(2 * giq + r < ny) & (2 * gjq + c < nx) for c in (0, 1)]
              for r in (0, 1)]

    au = [const_ref[0, k] for k in range(0, 4)]
    av = [const_ref[0, k] for k in range(4, 8)]
    # Du, Dv include the strictly positive div_d + data diagonal; the
    # guard only protects the zero-padded rim (masked out of err, and
    # its psis are 0 so it never couples back into real pixels)
    rdu = [1.0 / jnp.maximum(const_ref[0, 8 + k], 1e-30) for k in range(4)]
    rdv = [1.0 / jnp.maximum(const_ref[0, 12 + k], 1e-30) for k in range(4)]
    dd = [const_ref[0, 16 + k] for k in range(4)]
    psi1 = [const_ref[0, 20 + k] for k in range(4)]
    psi2 = [const_ref[0, 24 + k] for k in range(4)]
    psi3 = [const_ref[0, 28 + k] for k in range(4)]
    psi4 = [const_ref[0, 32 + k] for k in range(4)]

    def shl(a):
        return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)

    def shr(a):
        return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)

    def shu(a):
        return jnp.concatenate([a[:1], a[:-1]], axis=0)

    def shd(a):
        return jnp.concatenate([a[1:], a[-1:]], axis=0)

    def divp(f, r, c):
        """psi-weighted neighbor sum at quarter (r, c).  The psi_i are
        zero across the image boundary, so the clamped quarter shifts
        reproduce tpuflow.models.brox_spatial.psi_weighted_divergence's
        `_shift_clamp` semantics exactly."""
        k = 2 * r + c
        down = f[2 * (1 - r) + c] if r == 0 else shd(f[2 * (1 - r) + c])
        up = shu(f[2 * (1 - r) + c]) if r == 0 else f[2 * (1 - r) + c]
        right = f[2 * r + (1 - c)] if c == 0 else shr(f[2 * r + (1 - c)])
        left = shl(f[2 * r + (1 - c)]) if c == 0 else f[2 * r + (1 - c)]
        return (psi1[k] * down + psi2[k] * up
                + psi3[k] * right + psi4[k] * left)

    zero = jnp.zeros((), dtype)

    def one_sweep(du, dv):
        du = list(du)
        dv = list(dv)
        dup, dvp = tuple(du), tuple(dv)
        # RED = quarters (0,0) and (1,1); BLACK = (0,1) and (1,0) —
        # the (i+j) parity coloring of models.brox_spatial._red_black
        for color in (((0, 0), (1, 1)), ((0, 1), (1, 0))):
            new_u = {}
            for (r, c) in color:
                k = 2 * r + c
                dpu = divp(du, r, c)
                new_u[k] = (1.0 - w) * du[k] + w * (
                    au[k] - dd[k] * dv[k] + alpha * dpu) * rdu[k]
            for k, val in new_u.items():
                du[k] = val
            new_v = {}
            for (r, c) in color:
                k = 2 * r + c
                dpv = divp(dv, r, c)
                new_v[k] = (1.0 - w) * dv[k] + w * (
                    av[k] - dd[k] * du[k] + alpha * dpv) * rdv[k]
            for k, val in new_v.items():
                dv[k] = val
        return tuple(du), tuple(dv), dup, dvp

    def sweep_err(du, dv, dup, dvp):
        err = jnp.zeros((), dtype)
        for k in range(4):
            m = in_img[k // 2][k % 2]
            a = jnp.where(m, du[k] - dup[k], zero)
            b = jnp.where(m, dv[k] - dvp[k], zero)
            err = err + jnp.sum(a * a + b * b)
        return err

    du0 = tuple(state_ref[0, k] for k in range(4))
    dv0 = tuple(state_ref[0, 4 + k] for k in range(4))

    def body(c):
        du, dv, _, n = c
        du, dv, dup, dvp = one_sweep(du, dv)
        return du, dv, sweep_err(du, dv, dup, dvp), n + 1

    def cond(c):
        return (c[2] > thresh) & (c[3] < max_iter)

    init = (du0, dv0, jnp.asarray(jnp.inf, dtype), jnp.asarray(0, jnp.int32))
    du, dv, err, n = jax.lax.while_loop(cond, body, init)
    for k in range(4):
        out_ref[0, k] = du[k]
        out_ref[0, 4 + k] = dv[k]
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    err_ref[0] = jnp.where(ri == 1, n.astype(dtype), err)


def _brox_sor_call(state_q, const_q, ny, nx, thresh, max_iter, alpha,
                   omega, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb, _, Hq, Wq = state_q.shape
    if Hq % 8 or Wq % 128:
        raise ValueError(f"quarter dims must be (8,128)-aligned, got {(Hq, Wq)}")
    kern = functools.partial(_brox_sor_q_kernel, ny=ny, nx=nx,
                             alpha=float(alpha), omega=float(omega))
    thresh = jnp.asarray(thresh, state_q.dtype).reshape(1, 1)
    max_iter = jnp.asarray(max_iter, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, Hq, Wq), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 36, Hq, Wq), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, Hq, Wq), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 8, Hq, Wq), state_q.dtype),
            jax.ShapeDtypeStruct((nb, 8, 128), state_q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(thresh, max_iter, state_q, const_q)


@functools.partial(jax.jit, static_argnames=("ny", "nx", "alpha", "omega",
                                             "interpret"))
def brox_sor_error_quarters(state_q, const_q, ny, nx, thresh, max_iter,
                            alpha, omega=SOR_OMEGA, interpret=None):
    """One inner iteration's FULL red-black SOR solve with the
    reference's stopping rule in-kernel: sweep until the summed squared
    update <= thresh (= TOL^2 * size) or max_iter sweeps
    (src/brox_optic_flow_spatial.cpp:315-390).  thresh < 0 runs exactly
    `max_iter` sweeps.  Returns (state_q, err, n_sweeps) per sample."""
    out, stat = _brox_sor_call(state_q, const_q, ny, nx, thresh, max_iter,
                               alpha, omega, interpret)
    return out, stat[:, 0, 0], stat[:, 1, 0].astype(jnp.int32)


def fits_vmem_brox(ny, nx, dtype_bytes=4):
    """Whole-level residency: 8 state + 36 const quarters in/out
    double-buffered + temporaries."""
    hp = -(-ny // 16) * 16
    wp = -(-nx // 256) * 256
    quarters = (8 + 36) * 2 + 8 + 16
    return quarters * (hp // 2) * (wp // 2) * dtype_bytes < 100 * 1024 * 1024
