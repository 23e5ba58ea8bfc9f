"""Pallas TPU kernels for the displacement-bounded bicubic warp.

The hot op of every solver is the backward warp of an image stack by
the current flow (e.g. reference src/tvl1flow.cpp:94-96).  XLA lowers
per-pixel gathers to scalar loops (~260 ms for 3 planes at 1024x436 on
one chip), and the pure-XLA shift-select fallback
(`tpuflow.ops.interp.warp_planes_shift`) materializes each of the
(2*dmax+4)^2 shifted terms through HBM (~7-56 ms).  These kernels keep
a (tile + halo) window of all planes in VMEM and accumulate the
one-hot-weighted static shifts entirely on the VPU — the whole sum
touches HBM once.

Two kernels share the machinery:

  * `warp_planes_pallas_batched` (mode="planes") — warped planes out,
    bit-identical to `warp_planes_shift` for every input: tiles whose
    residual displacements exceed the relative-window budget fall back
    to the exact (2*dmax+4)^2 unrolled sum IN-KERNEL.  The exact sum's
    Mosaic compile time grows steeply with dmax (~60 s at dmax=8), so
    this kernel is for moderate dmax and the TPU test lane.

  * `warp_const_pallas_batched` (mode="tvl1"/"hs") — the round-4 hot
    path: fused warp + per-warp constant assembly, emitting each
    solver's constant planes in padded layout.  FAST-PATH ONLY in
    kernel (small Mosaic program — the dmax=8 exact sum alone costs
    ~60 s of Mosaic compile): per tile, up to TWO tile-constant
    integer END-ANCHORED bases, each covering a +-rbud residual window
    (two windows absorb any spread <= 4*rbud+1 plus the bimodal spread
    of a motion boundary).  Pixels covered by neither window degrade to
    0 for that warp — the same graceful failure class as beyond-bound
    flow (strict bound: |displacement| > dmax also produces 0, unlike
    the planes kernel which inherits the shift path's partial-tap
    values in the 2-px band past the bound).  A per-tile overflow flag
    reports the degradation for diagnostics; an XLA-recompute fallback
    was tried and rejected (the (2D+4)^2-term shift graph inside the
    pyramid jit blew HBM: 36 GB of temps at B=16).
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


def _midrange_base(relx, rely, mask, lim):
    """Tile-constant integer base: clamped midrange of the masked
    offsets (minimizes the max residual over the tile)."""
    big = jnp.asarray(10_000, jnp.int32)
    rx_lo = jnp.min(jnp.where(mask, relx, big))
    rx_hi = jnp.max(jnp.where(mask, relx, -big))
    ry_lo = jnp.min(jnp.where(mask, rely, big))
    ry_hi = jnp.max(jnp.where(mask, rely, -big))
    bx = jnp.clip((rx_lo + rx_hi + 1) // 2, -lim, lim)
    by = jnp.clip((ry_lo + ry_hi + 1) // 2, -lim, lim)
    return bx, by


def _roll_window(win_ref, n_planes, by, bx):
    """In-place roll of the VMEM window by a (negated) tile-constant
    base.  pltpu.roll requires NON-NEGATIVE shifts (negative dynamic
    shifts miscompile silently), so roll-by(-b) = roll-by(size - b)."""
    sh_y = jnp.mod(-by, win_ref.shape[1])
    sh_x = jnp.mod(-bx, win_ref.shape[2])
    for p in range(n_planes):
        win_ref[p] = pltpu.roll(
            pltpu.roll(win_ref[p], shift=sh_y, axis=0),
            shift=sh_x, axis=1)


def _warp_kernel(uv_ref, *rest, dmax, rbud, th, tw, ny, nx, n_planes,
                 mode, alpha2):
    has_aux = mode in ("tvl1", "hs")
    # fast-only modes never compile the (2D+4)^2 exact fallback: two
    # end-anchored windows + overflow flag, uncovered pixels -> 0
    fast_only = mode != "planes"
    if has_aux:
        aux_ref, planes_ref, out_ref, flag_ref, win2_ref, sem = rest
        aux = aux_ref[0]
    elif fast_only:  # planes_fast
        planes_ref, out_ref, flag_ref, win2_ref, sem = rest
    else:
        planes_ref, out_ref, win2_ref, sem = rest
    D = dmax
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    gy = pl.num_programs(1)
    gx = pl.num_programs(2)
    dtype = out_ref.dtype

    # DOUBLE-BUFFERED manual DMA of the overlapping (tile + halo) window
    # of all planes — windows overlap by 2D+4, which BlockSpec striding
    # cannot express, and a blocking copy stalls every tile for the full
    # window latency (~63% of this kernel was fixed per-tile overhead in
    # the r3 sweep; r5 roofline traced the kernel at 55% of the whole
    # TV-L1 device time).  Grid steps run sequentially per core, so tile
    # t issues tile t+1's copy before computing: the next window streams
    # in during the current tile's one-hot accumulation.  Window dims
    # are rounded up to the (8, 128) tiling.
    wh = win2_ref.shape[2]
    ww = win2_ref.shape[3]
    t_flat = (b * gy + i) * gx + j
    total = pl.num_programs(0) * gy * gx

    def dma_for(t, slot):
        tb, rem = jnp.divmod(t, gy * gx)
        ti, tj = jnp.divmod(rem, gx)
        return pltpu.make_async_copy(
            planes_ref.at[tb, :, pl.ds(ti * th, wh), pl.ds(tj * tw, ww)],
            win2_ref.at[slot], sem.at[slot])

    slot = jnp.mod(t_flat, 2)

    @pl.when(t_flat == 0)
    def _first():
        dma_for(t_flat, slot).start()

    @pl.when(t_flat + 1 < total)
    def _prefetch():
        dma_for(t_flat + 1, 1 - slot).start()

    dma_for(t_flat, slot).wait()
    win_ref = win2_ref.at[slot]

    ii = (i * th + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0))
    jj = (j * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1))
    u = uv_ref[0, 0]
    v = uv_ref[0, 1]
    zero = jnp.zeros((), dtype=dtype)
    if has_aux:
        # fused modes take the flow in PADDED layout whose pad content
        # may be garbage/NaN (HS pad pixels evolve freely in the SOR
        # kernel); zero it so pad pixels are cleanly out-of-domain and
        # never poison the tile-base/overflow statistics
        in_img = (ii < ny) & (jj < nx)
        u = jnp.where(in_img, u, zero)
        v = jnp.where(in_img, v, zero)
    xx = jj.astype(dtype) + u
    yy = ii.astype(dtype) + v
    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    fx = xx - x0
    fy = yy - y0
    relx = x0.astype(jnp.int32) - jj
    rely = y0.astype(jnp.int32) - ii
    out_dom = ((xx < 1) | (x0 > nx - 3) | (yy < 1) | (y0 > ny - 3))
    if fast_only:
        # strict bound: flow beyond dmax -> 0 (border_out class)
        out_dom = out_dom | (jnp.abs(relx) > D) | (jnp.abs(rely) > D)

    cx = _cubic_weights(fx)
    cy = _cubic_weights(fy)

    def accumulate(R, rx, ry):
        """One-hot sum over (2R+4)^2 static shifts of the VMEM window
        (window origin offset D+1 is tile-constant).  Returns the
        accumulated planes as values."""
        base = D + 1
        wxs = [_axis_weight(cx, rx, kx) for kx in range(-R - 1, R + 3)]
        acc = [jnp.zeros((th, tw), dtype=dtype) for _ in range(n_planes)]
        for ky in range(-R - 1, R + 3):
            wy = _axis_weight(cy, ry, ky)
            ay = ky + base
            for kxi, kx in enumerate(range(-R - 1, R + 3)):
                w = wy * wxs[kxi]
                ax = kx + base
                for p in range(n_planes):
                    acc[p] = acc[p] + w * win_ref[p, ay:ay + th, ax:ax + tw]
        return acc

    def finish(accs):
        """Zero the out-of-domain pixels (border_out semantics,
        src/bicubic_interpolation.cpp:352-374) and assemble the
        requested per-warp constants."""
        accs = [jnp.where(out_dom, zero, a) for a in accs]
        if mode in ("planes", "planes_fast"):
            for p in range(n_planes):
                out_ref[0, p] = accs[p]
        elif mode == "tvl1":
            # (I1wx, I1wy, rho_c, grad) — src/tvl1flow.cpp:98-109
            iw, iwx, iwy = accs
            out_ref[0, 0] = iwx
            out_ref[0, 1] = iwy
            out_ref[0, 2] = iw - iwx * u - iwy * v - aux
            out_ref[0, 3] = iwx * iwx + iwy * iwy
        else:  # hs
            # (Au, Av, Du, Dv, D) — src/horn_schunck_pyramidal.cpp:128-137
            i2w, i2wx, i2wy = accs
            dif = aux - i2w + i2wx * u + i2wy * v
            out_ref[0, 0] = dif * i2wx
            out_ref[0, 1] = dif * i2wy
            out_ref[0, 2] = i2wx * i2wx + alpha2
            out_ref[0, 3] = i2wy * i2wy + alpha2
            out_ref[0, 4] = i2wx * i2wy

    R = rbud
    valid = jnp.logical_not(out_dom)

    if not fast_only:
        if R is None or R >= D:
            finish(accumulate(D, relx, rely))
            return
        bx, by = _midrange_base(relx, rely, valid, D - R)
        lrx = relx - bx
        lry = rely - by
        overflow = jnp.any(valid & ((jnp.abs(lrx) > R) | (jnp.abs(lry) > R)
                                    | (jnp.abs(relx) > D)
                                    | (jnp.abs(rely) > D)))

        @pl.when(jnp.logical_not(overflow))
        def _fast():
            _roll_window(win_ref, n_planes, by, bx)
            finish(accumulate(R, lrx, lry))

        @pl.when(overflow)
        def _exact():
            finish(accumulate(D, relx, rely))

        return

    # fused: fast-only, up to two END-ANCHORED bases, overflow flag for
    # the caller.  Window 1 anchors at the tile's LOW displacement end,
    # window 2 at the HIGH end: together they cover any spread up to
    # 4R+1 plus arbitrary two-cluster (motion boundary) tiles — the
    # midrange heuristic fails exactly there (both extremes land
    # uncovered and the midrange of the leftovers recenters on the gap).
    if R is None or R >= D:
        finish(accumulate(D, relx, rely))
        flag_ref[0, i, j] = jnp.zeros((), jnp.int32)
        return

    lim = D - R
    big = jnp.asarray(10_000, jnp.int32)
    rx_lo = jnp.min(jnp.where(valid, relx, big))
    rx_hi = jnp.max(jnp.where(valid, relx, -big))
    ry_lo = jnp.min(jnp.where(valid, rely, big))
    ry_hi = jnp.max(jnp.where(valid, rely, -big))
    bx = jnp.clip(rx_lo + R, -lim, lim)
    by = jnp.clip(ry_lo + R, -lim, lim)
    bx2 = jnp.clip(rx_hi - R, -lim, lim)
    by2 = jnp.clip(ry_hi - R, -lim, lim)
    lrx = relx - bx
    lry = rely - by
    l2x = relx - bx2
    l2y = rely - by2
    cov1 = valid & (jnp.abs(lrx) <= R) & (jnp.abs(lry) <= R)
    cov2 = valid & (jnp.abs(l2x) <= R) & (jnp.abs(l2y) <= R)
    need2 = jnp.any(valid & jnp.logical_not(cov1))
    overflow = jnp.any(valid & jnp.logical_not(cov1 | cov2))

    @pl.when(jnp.logical_not(need2))
    def _one_base():
        _roll_window(win_ref, n_planes, by, bx)
        finish(accumulate(R, lrx, lry))
        flag_ref[0, i, j] = jnp.zeros((), jnp.int32)

    @pl.when(need2)
    def _two_bases():
        _roll_window(win_ref, n_planes, by, bx)
        acc1 = accumulate(R, lrx, lry)
        # roll from base1 to base2 (relative shift)
        _roll_window(win_ref, n_planes, by2 - by, bx2 - bx)
        acc2 = accumulate(R, l2x, l2y)
        # pixels covered by neither window degrade to the border_out
        # class (0) for this warp — the same graceful failure as
        # beyond-bound flow; `overflow` flags the tile for diagnostics
        sel = [jnp.where(cov1, a1, jnp.where(cov2, a2, zero))
               for a1, a2 in zip(acc1, acc2)]
        finish(sel)
        flag_ref[0, i, j] = overflow.astype(jnp.int32)


def warp_planes_pallas(planes, u, v, dmax, tile=(64, 128), interpret=None,
                       rbud=None, fast_only=False):
    """Warp (P, H, W) planes by one bounded flow field on the TPU VPU.

    Equivalent to warp_planes(..., border_out=True) for
    |u|inf, |v|inf <= dmax; flows beyond the bound yield 0.
    """
    out = warp_planes_pallas_batched(planes[None], u[None], v[None], dmax,
                                     tile, interpret, rbud, fast_only)
    return out[0]


def _warp_call(planes, uv, aux, dmax, mode, ny, nx, tile, rbud, alpha2,
               interpret, out_pad):
    """Shared pallas_call builder for all warp modes.

    planes: (B, P, ny, nx) unpadded; uv: (B, 2, Hg, Wg) where (Hg, Wg)
    is the padded grid size (== out_pad for fused modes); aux: (B, Hg,
    Wg) or None.  Returns (B, n_out, Hg, Wg) [+ (B, gy, gx) int32
    overflow flags for fused modes]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    has_aux = mode in ("tvl1", "hs")
    fast_only = mode != "planes"
    nb, n_planes, _, _ = planes.shape
    D = int(dmax)
    rbud = None if rbud is None or rbud >= D else int(rbud)
    Hg, Wg = uv.shape[-2:]
    th, tw = tile
    th = min(th, max(8, Hg))
    gy = -(-Hg // th)
    gx = -(-Wg // tw)
    if out_pad and (Hg % th or Wg % tw):
        raise ValueError(f"tile {tile} must divide padded dims {(Hg, Wg)}")
    hyp = Hg if Hg % th == 0 else gy * th
    wxp = Wg if Wg % tw == 0 else gx * tw

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
         (D + 1, (hyp + wh - th) - (planes.shape[2] + D + 1)),
         (D + 1, (wxp + ww - tw) - (planes.shape[3] + D + 1))),
        mode="edge")
    if (hyp, wxp) != (Hg, Wg):
        uv = jnp.pad(uv, ((0, 0), (0, 0), (0, hyp - Hg), (0, wxp - Wg)))

    mode_outs = {"planes": n_planes, "planes_fast": n_planes,
                 "tvl1": 4, "hs": 5}
    n_out = mode_outs[mode]
    kern = functools.partial(_warp_kernel, dmax=D, rbud=rbud, th=th, tw=tw,
                             ny=ny, nx=nx, n_planes=n_planes, mode=mode,
                             alpha2=float(alpha2))
    in_specs = [
        pl.BlockSpec((1, 2, th, tw), lambda b, i, j: (b, 0, i, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [uv]
    if has_aux:
        in_specs.append(pl.BlockSpec((1, th, tw), lambda b, i, j: (b, i, j),
                                     memory_space=pltpu.VMEM))
        args.append(aux)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # manual DMA
    args.append(planes_p)
    out_specs = pl.BlockSpec((1, n_out, th, tw),
                             lambda b, i, j: (b, 0, i, j),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nb, n_out, hyp, wxp), planes.dtype)
    if fast_only:
        # SMEM flag block spans the sample's whole (gy, gx) grid (the
        # Mosaic block-mapping rule forbids sub-(8,128) blocks unless
        # they cover the full trailing dims); the kernel writes its own
        # (i, j) element
        out_specs = [out_specs,
                     pl.BlockSpec((1, gy, gx), lambda b, i, j: (b, 0, 0),
                                  memory_space=pltpu.SMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((nb, gy, gx), jnp.int32)]
    out = pl.pallas_call(
        kern,
        grid=(nb, gy, gx),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, n_planes, wh, ww), planes.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out


@functools.partial(jax.jit, static_argnames=("dmax", "tile", "interpret",
                                             "rbud", "fast_only",
                                             "with_flags"))
def warp_planes_pallas_batched(planes, u, v, dmax, tile=(64, 128),
                               interpret=None, rbud=3, fast_only=False,
                               with_flags=False):
    """Batched bounded warp: (B, P, H, W) planes, (B, H, W) flows.

    The batch is a grid dimension, so every (sample, tile) pair
    pipelines through the same kernel.  `interpret` defaults to auto:
    interpreter mode off-TPU (tests run on the CPU backend).

    `rbud` is the relative-window residual budget: when rbud < dmax,
    tiles whose integer displacements all fit within +-rbud of a
    tile-constant base run a (2*rbud+4)^2-term sum instead of
    (2*dmax+4)^2 (the common case for the smooth flows of coarse-to-fine
    solvers); tiles that don't fit fall back to the exact sum
    IN-KERNEL, so the result is bit-identical to rbud=None for every
    input.  NOTE: the exact fallback's Mosaic compile time grows
    steeply with dmax (~90 s at dmax=8).

    `fast_only=True` compiles NO exact fallback (the round-4 compile-
    latency mode used by the multiscale solvers on TPU): per tile up to
    two end-anchored +-rbud windows cover any displacement spread up to
    4*rbud+1 plus two-cluster motion boundaries; pixels covered by
    neither window and pixels beyond the dmax bound degrade to 0 — the
    border_out failure class (the default mode instead inherits the
    shift path's partial-tap values in the 2-px band past the bound).
    """
    nb, n_planes, ny, nx = planes.shape
    uv = jnp.stack([u, v], axis=1)
    if fast_only:
        rb = 2 if rbud is None else rbud
        out, flags = _warp_call(planes, uv, None, dmax, "planes_fast",
                                ny, nx, tile, rb, 0.0, interpret,
                                out_pad=False)
    else:
        out = _warp_call(planes, uv, None, dmax, "planes", ny, nx, tile,
                         rbud, 0.0, interpret, out_pad=False)
        flags = jnp.zeros((nb, 1, 1), jnp.int32)  # exact path never degrades
    if with_flags:
        return out[:, :, :ny, :nx], flags
    return out[:, :, :ny, :nx]


@functools.partial(jax.jit, static_argnames=("dmax", "mode", "ny", "nx",
                                             "tile", "rbud", "alpha2",
                                             "interpret"))
def warp_const_pallas_batched(planes, uv_p, aux_p, dmax, mode, ny, nx,
                              tile=(32, 512), rbud=2, alpha2=0.0,
                              interpret=None):
    """Fused warp + per-warp constant assembly, emitting padded layout.

    planes: (B, 3, ny, nx) unpadded image + gradient planes
    (I1, I1x, I1y); uv_p: (B, 2, Hp, Wp) current flow in the
    (8,128)-padded layout the iteration kernels use (pad content may be
    garbage — every pad pixel is out-of-domain by construction);
    aux_p: (B, Hp, Wp) zero-padded I0 (tvl1) / I1 (hs).

    mode="tvl1": returns (B, 4, Hp, Wp) = (I1wx, I1wy, rho_c, grad)
      (reference src/tvl1flow.cpp:94-109: three bicubic warps + the
      pointwise constants, here one kernel pass).
    mode="hs": returns (B, 5, Hp, Wp) = (Au, Av, Du, Dv, D) with
      Du/Dv including + alpha^2
      (reference src/horn_schunck_pyramidal.cpp:123-137).

    Also returns (B, gy, gx) int32 overflow flags: 1 where a tile's
    in-bound residual displacements were not covered by the two
    relative windows.  Flagged tiles are NOT recomputed — their
    uncovered pixels degrade to 0 for this warp (the border_out failure
    class; an XLA-recompute fallback was tried and rejected, see module
    docstring).  Callers aggregate the flags into their stats/diag
    surface (tpuflow.models.batch `with_stats`) so real multi-motion
    content that exceeds the two-window budget is observable rather
    than silent.

    The tile must divide (Hp, Wp); pick via `pick_tile`."""
    Hp, Wp = uv_p.shape[-2:]
    if Hp % tile[0] or Wp % tile[1]:
        raise ValueError(f"tile {tile} must divide padded {(Hp, Wp)}")
    return _warp_call(planes, uv_p, aux_p, dmax, mode, ny, nx, tile, rbud,
                      alpha2, interpret, out_pad=True)


def pick_tile(Hp, Wp, pref=(32, 512)):
    """Largest hardware-aligned tile <= pref that divides (Hp, Wp)."""
    th = next(t for t in (pref[0], 16, 8) if Hp % t == 0)
    tw = next(t for t in (pref[1], 384, 256, 128) if Wp % t == 0)
    return th, tw
