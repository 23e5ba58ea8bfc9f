"""Temporally-blocked Pallas kernel for the pyramidal Horn-Schunck SOR.

One 4-color SOR sweep (tpuflow.models.hs_pyramidal) is four masked
quarter-updates of (u, v) with the reference's 12-point weighted
Laplacian (src/horn_schunck_pyramidal.cpp:32-71) — ~100 flops/pixel
over 7 arrays, pure bandwidth under XLA.  This kernel runs M SWEEPS
PER HBM ROUND-TRIP inside VMEM windows.  Information propagates at
most 1 pixel per color phase, i.e. 4 per sweep, so a halo of 4*M makes
the written tile exact.

Outputs the reference's stopping statistic (sum of squared updates over
the LAST sweep, all four phases; src/horn_schunck_pyramidal.cpp:143,230)
per sample for chunked data-dependent stopping in batch mode.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SOR_OMEGA = 1.9  # reference src/horn_schunck_pyramidal.cpp:21

# state plane order
U, V = 0, 1
# const plane order
AU, AV, DU, DV, DD = range(5)


def _hs_sor_kernel(state_ref, const_ref, out_ref, err_ref, swin, cwin,
                   sems, *, n_sweeps, th, tw, ny, nx, alpha2, halo):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dtype = out_ref.dtype
    wh = swin.shape[1]
    ww = swin.shape[2]
    w = SOR_OMEGA

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

    gi = (i * th - halo + jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 0))
    gj = (j * tw - halo + jax.lax.broadcasted_iota(jnp.int32, (wh, ww), 1))
    colors = [(gi % 2 == r) & (gj % 2 == c)
              for r in (0, 1) for c in (0, 1)]

    au = cwin[AU]
    av = cwin[AV]
    rdu = 1.0 / cwin[DU]
    rdv = 1.0 / cwin[DV]
    dd = cwin[DD]
    zero = jnp.zeros((), dtype=dtype)

    def clamp_shift(a, dy, dx):
        # edge-clamped shift WITHIN the window; global-boundary clamping
        # is handled by clamping the global coordinate the same way the
        # full-image op does (the window rim only feeds stale pixels)
        ys = jnp.clip(jnp.arange(wh) + dy, 0, wh - 1)
        xs = jnp.clip(jnp.arange(ww) + dx, 0, ww - 1)
        return a[ys][:, xs]

    # global Neumann clamp, applied per axis exactly like the full-image
    # `_shift_clamp` composition: at the image border the "outside"
    # neighbor folds back to the border pixel
    def nshift(a, dy, dx):
        sy = clamp_shift(a, dy, 0)
        sy = jnp.where((gi + dy >= 0) & (gi + dy <= ny - 1), sy, a)
        out = clamp_shift(sy, 0, dx)
        return jnp.where((gj + dx >= 0) & (gj + dx <= nx - 1), out, sy)

    def laplacian(f):
        l = nshift(f, 0, -1)
        r = nshift(f, 0, 1)
        up = nshift(f, -1, 0)
        dn = nshift(f, 1, 0)
        ul = nshift(f, -1, -1)
        ur = nshift(f, -1, 1)
        dl = nshift(f, 1, -1)
        dr = nshift(f, 1, 1)
        return (ul + ur + dl + dr) / 12.0 + (l + r + up + dn) / 6.0

    u = swin[U]
    v = swin[V]
    err = jnp.zeros((wh, ww), dtype=dtype)
    sl = (slice(halo, halo + th), slice(halo, halo + tw))
    in_img = ((gi >= 0) & (gi < ny) & (gj >= 0) & (gj < nx))

    for s in range(n_sweeps):
        last = s == n_sweeps - 1
        for mask in colors:
            ula = laplacian(u)
            u_c = (1.0 - w) * u + w * (au - dd * v + alpha2 * ula) * rdu
            u_n = jnp.where(mask, u_c, u)
            vla = laplacian(v)
            v_c = (1.0 - w) * v + w * (av - dd * u_n + alpha2 * vla) * rdv
            v_n = jnp.where(mask, v_c, v)
            if last:
                err = err + (u_n - u) ** 2 + (v_n - v) ** 2
            u, v = u_n, v_n

    out_ref[0, U] = u[sl]
    out_ref[0, V] = v[sl]
    err = jnp.where(in_img, err, zero)
    err_ref[0] = jnp.full((8, 128), jnp.sum(err[sl]), dtype=dtype)


@functools.partial(jax.jit, static_argnames=("n_sweeps", "alpha2", "tile",
                                             "interpret"))
def hs_sor_pallas(state, const, n_sweeps, alpha2, tile=(64, 256),
                  interpret=None):
    """Run `n_sweeps` 4-color SOR sweeps fused in VMEM.

    state: (B, 2, H, W) = (u, v); const: (B, 5, H, W) =
    (Au, Av, Du, Dv, D).  Returns (state, err) where err is the
    per-sample sum of squared updates of the last sweep."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb, _, ny, nx = state.shape
    th, tw = tile
    th = min(th, max(8, ny))
    tw = min(tw, max(128, nx))
    gy = -(-ny // th)
    gx = -(-nx // tw)
    hyp = gy * th
    wxp = gx * tw
    halo = 4 * n_sweeps

    def round_up(x, m):
        return -(-x // m) * m

    wh = round_up(th + 2 * halo, 8)
    ww = round_up(tw + 2 * halo, 128)

    def padw(a):
        return jnp.pad(a, ((0, 0), (0, 0),
                           (halo, (hyp + wh - th) - (ny + halo)),
                           (halo, (wxp + ww - tw) - (nx + halo))))

    kern = functools.partial(_hs_sor_kernel, n_sweeps=n_sweeps, th=th,
                             tw=tw, ny=ny, nx=nx, alpha2=float(alpha2),
                             halo=halo)
    out, err = pl.pallas_call(
        kern,
        grid=(nb, gy, gx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, th, tw), lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 2, hyp, wxp), state.dtype),
            jax.ShapeDtypeStruct((nb, gy * 8, gx * 128), state.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, wh, ww), state.dtype),
            pltpu.VMEM((5, wh, ww), state.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(padw(state), padw(const))
    return out[:, :, :ny, :nx], jnp.sum(err[:, ::8, ::128], axis=(1, 2))
