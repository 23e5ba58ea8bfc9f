"""Fused Pallas kernel for the pyramidal Horn-Schunck 4-color SOR.

One 4-color SOR sweep (tpuflow.models.hs_pyramidal) is four masked
quarter-updates of (u, v) with the reference's 12-point weighted
Laplacian (src/horn_schunck_pyramidal.cpp:32-71) — ~100 flops/pixel
over 7 arrays, pure bandwidth under XLA.  Like tvl1_pallas, this kernel
keeps the WHOLE level (2 state + 5 constant planes) in the v5e's large
VMEM and runs `n_sweeps` sweeps per HBM round-trip; the sweep loop is a
`lax.fori_loop` so Mosaic program size is constant in n_sweeps.

Boundary semantics: the image-edge neighbor folds back to the border
pixel (Neumann), exactly like the full-image op in
tpuflow.models.hs_pyramidal; the Laplacian is evaluated separably
(horizontal neighbor sum, then vertical shifts of it), which is
algebraically identical because per-axis clamping commutes.

Outputs the reference's stopping statistic (sum of squared updates over
the LAST sweep, all four phases; src/horn_schunck_pyramidal.cpp:143,230)
per sample for chunked data-dependent stopping in batch mode.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow.ops.tvl1_pallas import VMEM_LIMIT_BYTES, pad_hw

SOR_OMEGA = 1.9  # reference src/horn_schunck_pyramidal.cpp:21

# state plane order
U, V = 0, 1
# const plane order
AU, AV, DU, DV, DD = range(5)


def _hs_sor_kernel(state_ref, const_ref, out_ref, err_ref, *, n_sweeps,
                   ny, nx, alpha2):
    dtype = out_ref.dtype
    Hp, Wp = state_ref.shape[2], state_ref.shape[3]
    w = SOR_OMEGA
    gi = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    in_img = (gi < ny) & (gj < nx)
    zero = jnp.zeros((), dtype)
    colors = [((gi % 2 == r) & (gj % 2 == c)) for r in (0, 1) for c in (0, 1)]

    au = const_ref[0, AU]
    av = const_ref[0, AV]
    # real Du, Dv >= alpha^2 > 0; the max() only guards the zero-padded
    # rim against inf/NaN generation (pad pixels are masked from err and
    # sliced off by the caller)
    rdu = 1.0 / jnp.maximum(const_ref[0, DU], 1e-30)
    rdv = 1.0 / jnp.maximum(const_ref[0, DV], 1e-30)
    dd = const_ref[0, DD]

    # Neumann-clamped shifts: at the image border the outside neighbor
    # folds back to the border pixel (matches _shift_clamp composition in
    # the full-image op)
    def sh_l(a):  # neighbor at j-1
        s = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
        return jnp.where(gj == 0, a, s)

    def sh_r(a):  # neighbor at j+1
        s = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        return jnp.where(gj >= nx - 1, a, s)

    def sh_u(a):  # neighbor at i-1
        s = jnp.concatenate([a[:1], a[:-1]], axis=0)
        return jnp.where(gi == 0, a, s)

    def sh_d(a):  # neighbor at i+1
        s = jnp.concatenate([a[1:], a[-1:]], axis=0)
        return jnp.where(gi >= ny - 1, a, s)

    def laplacian(f):
        h = sh_l(f) + sh_r(f)
        v = sh_u(f) + sh_d(f)
        diag = sh_u(h) + sh_d(h)  # = ul+ur (row above) + dl+dr (row below)
        return diag / 12.0 + (h + v) / 6.0

    def one_sweep(c):
        u, v, _, _ = c
        up, vp = u, v
        for mask in colors:
            ula = laplacian(u)
            u_c = (1.0 - w) * u + w * (au - dd * v + alpha2 * ula) * rdu
            u = jnp.where(mask, u_c, u)
            vla = laplacian(v)
            v_c = (1.0 - w) * v + w * (av - dd * u + alpha2 * vla) * rdv
            v = jnp.where(mask, v_c, v)
        return u, v, up, vp

    init = (state_ref[0, U], state_ref[0, V],
            state_ref[0, U], state_ref[0, V])
    u, v, up, vp = jax.lax.fori_loop(0, n_sweeps, lambda i, c: one_sweep(c),
                                     init)
    out_ref[0, U] = u
    out_ref[0, V] = v
    du = jnp.where(in_img, u - up, zero)
    dv = jnp.where(in_img, v - vp, zero)
    err_ref[0] = jnp.full((8, 128), jnp.sum(du * du + dv * dv), dtype)


@functools.partial(jax.jit, static_argnames=("n_sweeps", "ny", "nx",
                                             "alpha2", "interpret"))
def hs_sor_padded(state_p, const_p, ny, nx, n_sweeps, alpha2,
                  interpret=None):
    """Fused SOR chunk on PRE-PADDED arrays (throughput path).

    state_p: (B, 2, Hp, Wp) = (u, v); const_p: (B, 5, Hp, Wp) =
    (Au, Av, Du, Dv, D), Hp % 8 == 0, Wp % 128 == 0.  Returns the padded
    state plus the per-sample last-sweep error statistic."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb, _, Hp, Wp = state_p.shape
    if Hp % 8 or Wp % 128:
        raise ValueError(f"padded dims must be (8,128)-aligned, got {(Hp, Wp)}")
    kern = functools.partial(_hs_sor_kernel, n_sweeps=n_sweeps, ny=ny,
                             nx=nx, alpha2=float(alpha2))
    out, err = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 2, Hp, Wp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, Hp, Wp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, Hp, Wp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 2, Hp, Wp), state_p.dtype),
            jax.ShapeDtypeStruct((nb, 8, 128), state_p.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(state_p, const_p)
    return out, err[:, 0, 0]


@functools.partial(jax.jit, static_argnames=("n_sweeps", "alpha2", "tile",
                                             "interpret"))
def hs_sor_pallas(state, const, n_sweeps, alpha2, tile=None, interpret=None):
    """Run `n_sweeps` 4-color SOR sweeps fused in VMEM.

    state: (B, 2, H, W) = (u, v); const: (B, 5, H, W) =
    (Au, Av, Du, Dv, D).  Returns (state, err) where err is the
    per-sample sum of squared updates of the last sweep.  `tile` is
    accepted for backward compatibility and ignored."""
    del tile
    nb, _, ny, nx = state.shape
    out, err = hs_sor_padded(pad_hw(state), pad_hw(const), ny, nx, n_sweeps,
                             alpha2, interpret=interpret)
    return out[:, :, :ny, :nx], err
