"""Median filtering as a vectorized sort over stacked windows.

Replaces the reference's per-pixel qsort median (me_median_filtering,
reference src/utils.cpp:150-213) with a single `jnp.sort` over the
window axis — for the 3x3 case XLA lowers the 9-element sort to a
bitonic network on the VPU.  Boundary folding matches the reference:
xx<0 -> -xx-1 and xx>=n -> 2n-xx-1, i.e. numpy 'symmetric' padding.
The output picks sorted[w*w // 2], identical to the reference's
`median_vector[i/2]` (src/utils.cpp:201).
"""

import jax.numpy as jnp


def median_filter(I, wsize=3):
    """Median filter of (..., H, W) with a wsize x wsize window."""
    border = wsize // 2
    pad = [(0, 0)] * (I.ndim - 2) + [(border, border), (border, border)]
    p = jnp.pad(I, pad, mode="symmetric")
    ny, nx = I.shape[-2:]
    windows = []
    for dy in range(wsize):
        for dx in range(wsize):
            windows.append(p[..., dy : dy + ny, dx : dx + nx])
    stack = jnp.stack(windows, axis=-1)
    return jnp.sort(stack, axis=-1)[..., (wsize * wsize) // 2]
