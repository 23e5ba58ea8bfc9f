"""Fused Pallas kernel for classic Horn-Schunck.

The classic method (reference src/horn_schunck_classic.cpp:99-149) is a
pure fixed-count Jacobi iteration: ubar/vbar via the 12-point weighted
neighborhood average, then a pointwise update.  Under XLA each
iteration round-trips (u, v) + constants through HBM (~40 GB over the
default 100 iterations at B=32, 1024x436 — measured 61 fields/s, the
weakest multiple of the seven).  This kernel keeps the whole image in
VMEM for all `niter` iterations (runtime scalar): one HBM round-trip
per solve.

Jacobi reads only the previous iterate, so no parity decomposition is
needed (unlike the SOR kernels); boundary folds use explicit
true-image-size masks so the (8, 128) zero padding never leaks in.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow.ops.tvl1_pallas import VMEM_LIMIT_BYTES, pad_hw


def _hsc_kernel(niter_ref, const_ref, out_ref, *, ny, nx):
    niter = niter_ref[0, 0]
    ex = const_ref[0, 0]
    ey = const_ref[0, 1]
    et = const_ref[0, 2]
    rden = const_ref[0, 3]
    H, W = ex.shape
    gi = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    last_row = gi == ny - 1
    last_col = gj == nx - 1

    def shl(a):   # value at j-1 (array-edge clamp == image clamp at j=0)
        return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)

    def shr(a):   # value at j+1; image-edge fold handled by caller mask
        return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)

    def shu(a):
        return jnp.concatenate([a[:1], a[:-1]], axis=0)

    def shd(a):
        return jnp.concatenate([a[1:], a[-1:]], axis=0)

    def bar(f):
        """12-point weighted average with Neumann folds at the TRUE
        image rim (reference compute_bar,
        src/horn_schunck_classic.cpp:79-95)."""
        right = jnp.where(last_col, f, shr(f))
        left = shl(f)
        # horizontal triple used by the diagonal rows
        h = left + right
        down = jnp.where(last_row, f, shd(f))
        up = shu(f)
        h_dn = jnp.where(last_row, h, shd(h))
        h_up = shu(h)
        return (left + right + up + down) / 6.0 + (h_up + h_dn) / 12.0

    def body(_, uv):
        u, v = uv
        ubar = bar(u)
        vbar = bar(v)
        t = (ex * ubar + ey * vbar + et) * rden
        return ubar - ex * t, vbar - ey * t

    zero = jnp.zeros_like(ex)
    u, v = jax.lax.fori_loop(0, niter, body, (zero, zero))
    out_ref[0, 0] = u
    out_ref[0, 1] = v


@functools.partial(jax.jit, static_argnames=("ny", "nx", "interpret"))
def _hsc_call(const_p, ny, nx, niter, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb, _, Hp, Wp = const_p.shape
    kern = functools.partial(_hsc_kernel, ny=ny, nx=nx)
    niter = jnp.asarray(niter, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, Hp, Wp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, Hp, Wp), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 2, Hp, Wp), const_p.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(niter, const_p)


def hs_classic_fused(Ex, Ey, Et, alpha, niter, interpret=None):
    """Run classic HS's full Jacobi solve in VMEM.

    Ex/Ey/Et: (B, H, W) cube-average derivatives (the reference
    precomputes them once, src/horn_schunck_classic.cpp:139); `niter`
    is a RUNTIME int32 scalar.  Returns (u, v) of shape (B, H, W)."""
    nb, ny, nx = Ex.shape
    den = alpha * alpha + Ex * Ex + Ey * Ey
    const_p = pad_hw(jnp.stack([Ex, Ey, Et, 1.0 / den], axis=1))
    out = _hsc_call(const_p, ny, nx, niter, interpret=interpret)
    return out[:, 0, :ny, :nx], out[:, 1, :ny, :nx]
