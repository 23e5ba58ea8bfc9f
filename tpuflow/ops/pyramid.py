"""Gaussian pyramid resampling (zoom in/out).

Matches reference src/zoom.cpp:

  * `zoom_size`: round(n * factor) via the +0.5 trick (src/zoom.cpp:22-34)
  * `zoom_out`:  presmooth with sigma = 0.6*sqrt(1/factor^2 - 1)
    (ZOOM_SIGMA_ZERO, src/zoom.cpp:15,61) then bicubic-sample at
    (j/factor, i/factor) with border_out=False (src/zoom.cpp:41-78)
  * `zoom_in`:   bicubic-sample at (j/factorx, i/factory) where
    factor = new/old per axis (src/zoom.cpp:132-155)

The reference's `zoom_out_color` presmooths only a single-channel-sized
buffer of interleaved data (src/zoom.cpp:95-99) — a latent bug we do not
replicate; multi-channel inputs here are smoothed per channel.

All shapes are static: pyramid level sizes are computed host-side with
`pyramid_sizes`, so each level jit-compiles once per input geometry.
"""

import math

import jax.numpy as jnp

from tpuflow.ops.gaussian import gaussian
from tpuflow.ops.interp import bicubic_at, warp_stack

ZOOM_SIGMA_ZERO = 0.6


def zoom_size(nx, ny, factor):
    """(nx, ny) -> zoomed size, reference src/zoom.cpp:22-34."""
    return int(nx * factor + 0.5), int(ny * factor + 0.5)


def pyramid_sizes(nx, ny, factor, nscales):
    """Per-scale (nx, ny) list, finest first."""
    sizes = [(nx, ny)]
    for _ in range(1, nscales):
        sizes.append(zoom_size(*sizes[-1], factor))
    return sizes


def clamp_nscales(nx, ny, factor, nscales, min_size=16, use_hypot=True):
    """Auto-clamp nscales so the coarsest scale stays >= min_size px.

    tvl1flow uses hypot(nx, ny) (src/tvl1flow_main.cpp:185-187), the
    Brox mains use min(nx, ny) (src/brox_spatial_main.cpp:154).
    """
    base = math.hypot(nx, ny) if use_hypot else min(nx, ny)
    n_max = int(1 + math.log(base / min_size) / math.log(1.0 / factor))
    return max(1, min(nscales, n_max))


def _sample_grid(nxx, nyy, fx, fy, dtype):
    xx = (jnp.arange(nxx, dtype=dtype) / fx)[None, :] * jnp.ones((nyy, 1), dtype=dtype)
    yy = (jnp.arange(nyy, dtype=dtype) / fy)[:, None] * jnp.ones((1, nxx), dtype=dtype)
    return xx, yy


def zoom_out(I, factor, out_size=None):
    """Downsample (..., H, W) by `factor` in (0, 1); returns the
    presmoothed-and-resampled image of size zoom_size(...)."""
    ny, nx = I.shape[-2:]
    if out_size is None:
        nxx, nyy = zoom_size(nx, ny, factor)
    else:
        nxx, nyy = out_size
    sigma = ZOOM_SIGMA_ZERO * math.sqrt(1.0 / (factor * factor) - 1.0)
    Is = gaussian(I, sigma)
    xx, yy = _sample_grid(nxx, nyy, factor, factor, I.dtype)
    if I.ndim == 2:
        return bicubic_at(Is, xx, yy, border_out=False)
    flat = Is.reshape((-1,) + Is.shape[-2:])
    out = warp_stack(flat, xx, yy, border_out=False)
    return out.reshape(I.shape[:-2] + (nyy, nxx))


def zoom_in(I, out_size):
    """Bicubic-upsample (..., H, W) to out_size = (nxx, nyy)."""
    ny, nx = I.shape[-2:]
    nxx, nyy = out_size
    fx = nxx / nx
    fy = nyy / ny
    xx, yy = _sample_grid(nxx, nyy, fx, fy, I.dtype)
    if I.ndim == 2:
        return bicubic_at(I, xx, yy, border_out=False)
    flat = I.reshape((-1,) + I.shape[-2:])
    out = warp_stack(flat, xx, yy, border_out=False)
    return out.reshape(I.shape[:-2] + (nyy, nxx))
