"""Fused Pallas kernel for the pyramidal Horn-Schunck 4-color SOR.

One 4-color SOR sweep (tpuflow.models.hs_pyramidal) is four masked
quarter-updates of (u, v) with the reference's 12-point weighted
Laplacian (src/horn_schunck_pyramidal.cpp:32-71).  The round-2 kernel
evaluated the FULL-plane Laplacian for every color phase (8 full-plane
Laplacians per sweep) and masked out 3/4 of the work.  This version
stores every plane PARITY-DECOMPOSED: plane f becomes four quarter
planes f[r::2, c::2], so each color phase computes its Laplacian only
at the quarter it actually updates — the phase reads the 8 neighbor
quarters directly (each neighbor of a (r, c)-parity pixel lives at a
different parity) and needs no color masks at all.  Per sweep that is
~2 full-plane-equivalents of Laplacian work instead of 8.

Like tvl1_pallas, the whole level (2 state + 5 constant planes, each as
4 quarters) lives in the v5e's large VMEM and `n_sweeps` sweeps run per
HBM round-trip via `lax.fori_loop`.

Boundary semantics: identical to the full-image op — the image-edge
neighbor folds back to the border pixel (Neumann), and the diagonal
terms are the vertically clamp-shifted horizontal pair sums, exactly
the separable evaluation of tpuflow.models.hs_pyramidal (which is
algebraically the reference's neighbor list because per-axis clamping
commutes).  The folds live in `jnp.where` masks on the quarter planes
using the TRUE image size (ny, nx), so zero padding never leaks in.

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

# quarter-plane order within a field: index = 2*row_parity + col_parity
# state_q plane order: u(00,01,10,11), v(00,01,10,11)
# const_q plane order: Au*4, Av*4, Du*4, Dv*4, D*4


def pad_hw_q(a, ny=None, nx=None):
    """Zero-pad trailing (H, W) to the (16, 256) tiling so the quarter
    planes are themselves (8, 128)-aligned."""
    ny = a.shape[-2] if ny is None else ny
    nx = a.shape[-1] if nx is None else nx
    hp = -(-ny // 16) * 16
    wp = -(-nx // 256) * 256
    pad = [(0, 0)] * (a.ndim - 2) + [(0, hp - a.shape[-2]),
                                     (0, wp - a.shape[-1])]
    return jnp.pad(a, pad)


def to_quarters(x):
    """(B, P, Hp, Wp) -> (B, 4P, Hp/2, Wp/2), quarter index = 2r + c."""
    B, P, Hp, Wp = x.shape
    x = x.reshape(B, P, Hp // 2, 2, Wp // 2, 2)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, 4 * P, Hp // 2, Wp // 2)


def from_quarters(x):
    """Inverse of to_quarters."""
    B, P4, Hq, Wq = x.shape
    P = P4 // 4
    x = x.reshape(B, P, 2, 2, Hq, Wq)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, P, 2 * Hq, 2 * Wq)


def _hs_sor_q_kernel(thresh_ref, maxiter_ref, state_ref, const_ref, out_ref,
                     err_ref, *, ny, nx, alpha2):
    """Sweeps until the last sweep's summed squared update drops to
    `thresh` (= TOL^2 * size) or `max_iter` sweeps, the reference's
    stopping rule checked after EVERY sweep
    (src/horn_schunck_pyramidal.cpp:143,230), entirely inside the
    kernel.  `thresh`/`max_iter` are RUNTIME scalars (SMEM): thresh < 0
    gives exactly `max_iter` fixed sweeps, and one Mosaic program
    serves every level's budget in both stopping modes (round-4
    cold-compile fix)."""
    dtype = out_ref.dtype
    thresh = thresh_ref[0, 0]
    max_iter = maxiter_ref[0, 0]
    Hq, Wq = state_ref.shape[2], state_ref.shape[3]
    w = SOR_OMEGA
    c1 = 1.0 / 12.0
    c2 = 1.0 / 6.0
    giq = jax.lax.broadcasted_iota(jnp.int32, (Hq, Wq), 0)
    gjq = jax.lax.broadcasted_iota(jnp.int32, (Hq, Wq), 1)

    # per-(r, c) boundary fold masks in quarter coordinates
    first_col = gjq == 0                      # gj == 0 for c == 0
    first_row = giq == 0                      # gi == 0 for r == 0
    last_col = [2 * gjq == nx - 1, 2 * gjq + 1 == nx - 1]   # per c
    last_row = [2 * giq == ny - 1, 2 * giq + 1 == ny - 1]   # per r
    in_img = [[(2 * giq + r < ny) & (2 * gjq + c < nx) for c in (0, 1)]
              for r in (0, 1)]

    au = [const_ref[0, k] for k in range(0, 4)]
    av = [const_ref[0, k] for k in range(4, 8)]
    # real Du, Dv >= alpha^2 > 0; the max() only guards the zero-padded
    # rim against inf/NaN (pad pixels are masked from err and sliced off)
    rdu = [1.0 / jnp.maximum(const_ref[0, 8 + k], 1e-30) for k in range(4)]
    rdv = [1.0 / jnp.maximum(const_ref[0, 12 + k], 1e-30) for k in range(4)]
    dd = [const_ref[0, 16 + k] for k in range(4)]

    def shl(a):   # quarter value at jq-1 (clamp handled by caller mask)
        return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)

    def shr(a):   # quarter value at jq+1
        return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)

    def shu(a):   # quarter value at iq-1
        return jnp.concatenate([a[:1], a[:-1]], axis=0)

    def shd(a):   # quarter value at iq+1
        return jnp.concatenate([a[1:], a[-1:]], axis=0)

    def hpair(q, p, r, c):
        """Horizontal neighbor pair sum (left+right of (2i+p, 2j+c)) as a
        quarter plane over rows of parity p; folds at the image edge to
        the row's own center value q[2p + c]."""
        src = q[2 * p + (1 - c)]
        ctr = q[2 * p + c]
        if c == 0:
            left = jnp.where(first_col, ctr, shl(src))
            right = jnp.where(last_col[0], ctr, src)
        else:
            left = src
            right = jnp.where(last_col[1], ctr, shr(src))
        return left + right

    def lap(q, r, c):
        """12-point weighted Laplacian at color (r, c), quarter plane."""
        ctr = q[2 * r + c]
        h = hpair(q, r, r, c)
        h_o = hpair(q, 1 - r, r, c)
        srcv = q[2 * (1 - r) + c]
        if r == 0:
            up = jnp.where(first_row, ctr, shu(srcv))
            dn = jnp.where(last_row[0], ctr, srcv)
            hu = jnp.where(first_row, h, shu(h_o))
            hd = jnp.where(last_row[0], h, h_o)
        else:
            up = srcv
            dn = jnp.where(last_row[1], ctr, shd(srcv))
            hu = h_o
            hd = jnp.where(last_row[1], h, shd(h_o))
        return (hu + hd) * c1 + (h + up + dn) * c2

    zero = jnp.zeros((), dtype)

    def one_sweep(c):
        u = list(c[0])
        v = list(c[1])
        up, vp = tuple(u), tuple(v)
        for r in (0, 1):
            for cc in (0, 1):
                k = 2 * r + cc
                ula = lap(u, r, cc)
                u[k] = (1.0 - w) * u[k] + w * (au[k] - dd[k] * v[k]
                                               + alpha2 * ula) * rdu[k]
                vla = lap(v, r, cc)
                v[k] = (1.0 - w) * v[k] + w * (av[k] - dd[k] * u[k]
                                               + alpha2 * vla) * rdv[k]
        return tuple(u), tuple(v), up, vp

    def sweep_err(u, v, up, vp):
        err = jnp.zeros((), dtype)
        for k in range(4):
            m = in_img[k // 2][k % 2]
            du = jnp.where(m, u[k] - up[k], zero)
            dv = jnp.where(m, v[k] - vp[k], zero)
            err = err + jnp.sum(du * du + dv * dv)
        return err

    u0 = tuple(state_ref[0, k] for k in range(4))
    v0 = tuple(state_ref[0, 4 + k] for k in range(4))

    def body(c):
        u, v, _, n = c
        u, v, up, vp = one_sweep((u, v, None, None))
        return u, v, sweep_err(u, v, up, vp), n + 1

    def cond(c):
        return (c[2] > thresh) & (c[3] < max_iter)

    init = (u0, v0, jnp.asarray(jnp.inf, dtype),
            jnp.asarray(0, jnp.int32))
    u, v, err, n = jax.lax.while_loop(cond, body, init)
    for k in range(4):
        out_ref[0, k] = u[k]
        out_ref[0, 4 + k] = v[k]
    ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    err_ref[0] = jnp.where(ri == 1, n.astype(dtype), err)


def _hs_sor_call(state_q, const_q, ny, nx, thresh, max_iter, alpha2,
                 interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb, _, Hq, Wq = state_q.shape
    if Hq % 8 or Wq % 128:
        raise ValueError(f"quarter dims must be (8,128)-aligned, got {(Hq, Wq)}")
    kern = functools.partial(_hs_sor_q_kernel, ny=ny, nx=nx,
                             alpha2=float(alpha2))
    thresh = jnp.asarray(thresh, state_q.dtype).reshape(1, 1)
    max_iter = jnp.asarray(max_iter, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, Hq, Wq), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 20, Hq, Wq), lambda b: (b, 0, 0, 0),
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


@functools.partial(jax.jit, static_argnames=("ny", "nx", "alpha2",
                                             "interpret"))
def hs_sor_quarters(state_q, const_q, ny, nx, n_sweeps, alpha2,
                    interpret=None):
    """Fused SOR chunk on PARITY-DECOMPOSED arrays (throughput path).

    state_q: (B, 8, Hq, Wq) = quarters of (u, v); const_q: (B, 20, Hq,
    Wq) = quarters of (Au, Av, Du, Dv, D); Hq % 8 == 0, Wq % 128 == 0.
    Build these with `to_quarters(pad_hw_q(...))` once per warp and keep
    the state in quarter layout across the whole chunk loop.  Returns
    the quarter-layout state plus the per-sample last-sweep error
    statistic.  Runs exactly `n_sweeps` sweeps (runtime value)."""
    out, stat = _hs_sor_call(state_q, const_q, ny, nx, -1.0, n_sweeps,
                             alpha2, interpret)
    return out, stat[:, 0, 0]


@functools.partial(jax.jit, static_argnames=("ny", "nx", "alpha2",
                                             "interpret"))
def hs_sor_error_quarters(state_q, const_q, ny, nx, thresh, max_iter,
                          alpha2, interpret=None):
    """One warp's FULL SOR solve with the reference's per-sweep
    stopping rule inside the kernel: sweep until the summed squared
    update <= thresh (= TOL^2 * size) or `max_iter` sweeps
    (src/horn_schunck_pyramidal.cpp:143,230).  Per-sample exact
    stopping (each sample is its own grid step), one HBM round-trip
    per warp.  Returns (state_q, err, n_sweeps) per sample."""
    out, stat = _hs_sor_call(state_q, const_q, ny, nx, thresh, max_iter,
                             alpha2, interpret)
    return out, stat[:, 0, 0], stat[:, 1, 0].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("ny", "nx", "alpha2",
                                             "interpret"))
def hs_sor_padded(state_p, const_p, ny, nx, n_sweeps, alpha2,
                  interpret=None):
    """Compat wrapper on (8,128)-padded interleaved arrays.

    state_p: (B, 2, Hp, Wp) = (u, v); const_p: (B, 5, Hp, Wp) =
    (Au, Av, Du, Dv, D).  Converts to quarter layout around the fused
    kernel; prefer `hs_sor_quarters` in chunked loops to convert once."""
    sq = to_quarters(pad_hw_q(state_p[:, :, :ny, :nx], ny, nx))
    cq = to_quarters(pad_hw_q(const_p[:, :, :ny, :nx], ny, nx))
    out_q, err = hs_sor_quarters(sq, cq, ny, nx, n_sweeps, alpha2,
                                 interpret=interpret)
    out = from_quarters(out_q)[:, :, :ny, :nx]
    Hp, Wp = state_p.shape[-2:]
    return pad_hw(out, Hp, Wp), err


@functools.partial(jax.jit, static_argnames=("alpha2", "tile",
                                             "interpret"))
def hs_sor_pallas(state, const, n_sweeps, alpha2, tile=None, interpret=None):
    """Run `n_sweeps` 4-color SOR sweeps fused in VMEM.

    state: (B, 2, H, W) = (u, v); const: (B, 5, H, W) =
    (Au, Av, Du, Dv, D).  Returns (state, err) where err is the
    per-sample sum of squared updates of the last sweep.  `tile` is
    accepted for backward compatibility and ignored."""
    del tile
    nb, _, ny, nx = state.shape
    sq = to_quarters(pad_hw_q(state))
    cq = to_quarters(pad_hw_q(const))
    out_q, err = hs_sor_quarters(sq, cq, ny, nx, n_sweeps, alpha2,
                                 interpret=interpret)
    return from_quarters(out_q)[:, :, :ny, :nx], err
