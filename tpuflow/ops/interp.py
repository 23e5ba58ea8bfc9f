"""Bicubic interpolation and backward warping.

Vectorized re-design of the reference's per-pixel interpolation
(reference src/bicubic_interpolation.cpp).  Semantics are replicated
EXACTLY, including two reference quirks that affect results:

  * coordinates are truncated toward zero, not floored
    (`(int) uu` at src/bicubic_interpolation.cpp:170), so for
    -1 < uu < 0 the cell anchor is 0 and the fraction is negative;
  * the y "minus" neighbor uses the X sign: `my = (int)vv - sx`
    (src/bicubic_interpolation.cpp:173 — a latent reference bug kept
    for bit-parity);
  * the out-of-domain flag is set iff any of the 8 tap indices clamps
    (neumann_bc, src/bicubic_interpolation.cpp:24-39); with
    `border_out=True` such pixels return 0 (warp semantics at
    src/bicubic_interpolation.cpp:352-374).

The default compile-time BC in the reference is Neumann
(BOUNDARY_CONDITION 0, src/bicubic_interpolation.cpp:14); that is the
only one any shipped solver uses, and the only one implemented here.

`warp_stack` fuses the warp of N planes (image + derivative planes) that
share one flow field: the 16 tap indices and cubic weights are computed
once and reused for every plane — the TPU answer to the reference
calling bicubic_interpolation_warp 3-6 times per warp iteration
(e.g. src/tvl1flow.cpp:94-96).
"""

import jax.numpy as jnp


def _cubic(v0, v1, v2, v3, x):
    """Keys cubic interpolation cell (reference src/bicubic_interpolation.cpp:108-123)."""
    return v1 + 0.5 * x * (
        v2 - v0 + x * (2.0 * v0 - 5.0 * v1 + 4.0 * v2 - v3 + x * (3.0 * (v1 - v2) + v3 - v0))
    )


def _tap_indices(coord, n):
    """Integer tap indices + clamped versions + out flag for one axis.

    Returns (anchor_clamped, [m, c, d, dd] clamped indices, out).
    """
    s = jnp.where(coord < 0, -1, 1).astype(jnp.int32)
    i = jnp.trunc(coord).astype(jnp.int32)
    raw = (i - s, i, i + s, i + 2 * s)
    out = jnp.zeros(coord.shape, dtype=bool)
    clamped = []
    for r in raw:
        out = out | (r < 0) | (r >= n)
        clamped.append(jnp.clip(r, 0, n - 1))
    return clamped[1], clamped, out, s


def bicubic_at(img, xx, yy, border_out=False):
    """Bicubic sample of `img` (H, W) at coordinates (xx, yy) (any shape).

    Equivalent to calling reference bicubic_interpolation_at
    (src/bicubic_interpolation.cpp:153-245) at every (xx, yy).
    """
    return warp_stack(img[None], xx, yy, border_out)[0]


def warp_stack(planes, xx, yy, border_out=False, window=None):
    """Bicubic-sample a stack of planes (N, H, W) at shared coordinates.

    The tap-index/weight computation is shared across planes; each plane
    costs only its 16 gathers.  Returns (N,) + xx.shape.

    `window=(origin_y, origin_x, global_ny, global_nx)` supports tiled
    execution: `planes` then holds only the window starting at the given
    global origin, while coordinates/clamping/out-of-domain detection
    use the GLOBAL extent (tpuflow.parallel feeds halo-padded tiles
    through this).  Taps falling outside the window clamp to its rim —
    exact whenever the halo covers the displacement.
    """
    n_planes, wny, wnx = planes.shape
    dtype = planes.dtype
    if window is None:
        oy = ox = 0
        ny, nx = wny, wnx
    else:
        oy, ox, ny, nx = window

    cx, xs, out_x, sx = _tap_indices(xx, nx)
    # reference bug: the y minus-neighbor offset uses sx, replicate it
    sy = jnp.where(yy < 0, -1, 1).astype(jnp.int32)
    yi = jnp.trunc(yy).astype(jnp.int32)
    raw_y = (yi - sx, yi, yi + sy, yi + 2 * sy)
    out_y = jnp.zeros(yy.shape, dtype=bool)
    ys = []
    for r in raw_y:
        out_y = out_y | (r < 0) | (r >= ny)
        ys.append(jnp.clip(r, 0, ny - 1))
    cy = ys[1]

    out = out_x | out_y
    fx = (xx - cx.astype(dtype)).astype(dtype)
    fy = (yy - cy.astype(dtype)).astype(dtype)

    if window is not None:
        xs = [jnp.clip(x - ox, 0, wnx - 1) for x in xs]
        ys = [jnp.clip(y - oy, 0, wny - 1) for y in ys]

    flat = planes.reshape(n_planes, wny * wnx)
    # linear indices for the 16 taps, shared by all planes
    lin = [[(ys[m] * wnx + xs[l]).ravel() for m in range(4)] for l in range(4)]

    results = []
    for p in range(n_planes):
        fp = flat[p]
        cols = []
        for l in range(4):  # x-offset l: interpolate along y first
            t0 = jnp.take(fp, lin[l][0]).reshape(xx.shape)
            t1 = jnp.take(fp, lin[l][1]).reshape(xx.shape)
            t2 = jnp.take(fp, lin[l][2]).reshape(xx.shape)
            t3 = jnp.take(fp, lin[l][3]).reshape(xx.shape)
            cols.append(_cubic(t0, t1, t2, t3, fy))
        val = _cubic(cols[0], cols[1], cols[2], cols[3], fx)
        if border_out:
            val = jnp.where(out, jnp.zeros((), dtype=dtype), val)
        results.append(val)
    return jnp.stack(results)


def warp(img, u, v, border_out=True):
    """Backward-warp `img` by flow (u, v): out(x) = img(x + u(x)).

    Matches reference bicubic_interpolation_warp
    (src/bicubic_interpolation.cpp:352-374).
    """
    ny, nx = img.shape[-2:]
    dtype = img.dtype
    jj = jnp.arange(nx, dtype=dtype)[None, :]
    ii = jnp.arange(ny, dtype=dtype)[:, None]
    xx = jj + u
    yy = ii + v
    if img.ndim == 2:
        return warp_stack(img[None], xx, yy, border_out)[0]
    return warp_stack(img, xx, yy, border_out)


def warp_planes(planes, u, v, border_out=True):
    """Warp a (N, H, W) stack by one flow field, sharing tap computation."""
    ny, nx = planes.shape[-2:]
    dtype = planes.dtype
    jj = jnp.arange(nx, dtype=dtype)[None, :]
    ii = jnp.arange(ny, dtype=dtype)[:, None]
    return warp_stack(planes, jj + u, ii + v, border_out)
