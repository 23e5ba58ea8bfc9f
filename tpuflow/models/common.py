"""Shared solver machinery: the coarse-to-fine pyramid driver.

Every multiscale method in the reference follows the same shape
(e.g. Dual_TVL1_optic_flow_multiscale, reference src/tvl1flow.cpp:219-328;
horn_schunck_pyramidal, src/horn_schunck_pyramidal.cpp:258-370):

  1. jointly normalize the inputs to [0, 255]
  2. presmooth with sigma = 0.8
  3. build a Gaussian pyramid with zoom_out (factor in (0,1))
  4. solve coarse -> fine; after each scale, bicubic-upsample the flow
     to the next finer size and multiply by 1/zfactor

The TPU design runs the per-scale solver inside one jit per level
(static shapes; at most `nscales` compilations per input geometry,
cached across calls), while the scale loop itself is host-side Python —
the levels have different shapes by construction, and the coarse levels
are microseconds of work.
"""

import jax.numpy as jnp

from tpuflow.ops import gaussian, normalize_joint, pyramid_sizes, zoom_in, zoom_out

PRESMOOTHING_SIGMA = 0.8  # reference src/tvl1flow.cpp:23, horn_schunck_pyramidal.cpp:22


def build_pyramid(images, nscales, zfactor, presmooth=PRESMOOTHING_SIGMA,
                  normalize=True):
    """Normalize + presmooth + pyramid for a tuple of same-shape images.

    Returns (levels, sizes): `levels[s]` is a tuple of images at scale s
    (finest first), `sizes[s]` the (nx, ny) of that scale.
    """
    if normalize:
        images = normalize_joint(*images)
    if presmooth:
        images = tuple(gaussian(im, presmooth) for im in images)
    ny, nx = images[0].shape[-2:]
    sizes = pyramid_sizes(nx, ny, zfactor, nscales)
    levels = [images]
    for s in range(1, nscales):
        levels.append(tuple(zoom_out(im, zfactor, out_size=sizes[s])
                            for im in levels[-1]))
    return levels, sizes


def upsample_flow(u1, u2, out_size, zfactor):
    """Flow upsample between pyramid levels: bicubic zoom + 1/zfactor
    magnitude rescale (reference src/tvl1flow.cpp:302-309)."""
    inv = 1.0 / zfactor
    return zoom_in(u1, out_size) * inv, zoom_in(u2, out_size) * inv


def run_pyramid(images, nscales, zfactor, solve_scale,
                presmooth=PRESMOOTHING_SIGMA, normalize=True,
                level_callback=None, resume=None, trace_name=None):
    """Build the pyramid and run `solve_scale` coarse -> fine.

    `solve_scale(images_at_scale, u1, u2)` returns (u1, u2) or
    (u1, u2, extras); the final level's extras are returned as-is.

    `level_callback(scale, {"u1": ..., "u2": ...})` runs after each
    solved level (checkpointing/observability hook; see
    tpuflow.utils.checkpoint).  `resume=(scale, u1, u2)` restarts the
    coarse-to-fine loop below `scale` with the given already-solved
    flow for that scale.  `trace_name` wraps each level in a named
    profiler scope.
    """
    from tpuflow.utils.trace import trace_scope

    levels, sizes = build_pyramid(images, nscales, zfactor, presmooth, normalize)
    dtype = images[0].dtype
    extras = None
    if resume is not None:
        start, u1, u2 = resume
        u1 = jnp.asarray(u1, dtype=dtype)
        u2 = jnp.asarray(u2, dtype=dtype)
        if start > 0:
            u1, u2 = upsample_flow(u1, u2, sizes[start - 1], zfactor)
        start -= 1
    else:
        nx, ny = sizes[-1]
        u1 = jnp.zeros((ny, nx), dtype=dtype)
        u2 = jnp.zeros((ny, nx), dtype=dtype)
        start = nscales - 1
    import inspect

    takes_scale = "scale" in inspect.signature(solve_scale).parameters
    for s in range(start, -1, -1):
        scope = f"{trace_name or 'pyramid'}/level_{s}"
        with trace_scope(scope):
            if takes_scale:
                out = solve_scale(levels[s], u1, u2, scale=s)
            else:
                out = solve_scale(levels[s], u1, u2)
        u1, u2 = out[0], out[1]
        extras = out[2:] if len(out) > 2 else None
        if level_callback is not None:
            level_callback(s, {"u1": u1, "u2": u2})
        if s > 0:
            u1, u2 = upsample_flow(u1, u2, sizes[s - 1], zfactor)
    return u1, u2, extras
