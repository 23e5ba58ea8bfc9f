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


def default_flow_state(size, dtype, batch_shape=()):
    """Zero (u1, u2) state at the coarsest level; `size` is (nx, ny)."""
    nx, ny = size
    z = jnp.zeros(batch_shape + (ny, nx), dtype=dtype)
    return {"u1": z, "u2": z}


def default_upsample_state(state, out_size, zfactor):
    """Bicubic flow upsample of the u1/u2 keys (everything else passes
    through unchanged — solver-specific drivers override this for
    fields with different rescale rules, e.g. the occlusion map)."""
    u1, u2 = upsample_flow(state["u1"], state["u2"], out_size, zfactor)
    return dict(state, u1=u1, u2=u2)


def run_pyramid_state(images, nscales, zfactor, solve_scale,
                      presmooth=PRESMOOTHING_SIGMA, preprocess="normalize",
                      state_init=default_flow_state,
                      upsample_state=default_upsample_state,
                      level_callback=None, resume=None, trace_name=None):
    """Generalized coarse-to-fine driver over a dict flow state.

    Every multiscale method — including the ones whose state is more
    than (u1, u2): tvl1occflow carries chi, the batched drivers carry a
    batch axis — shares this loop, so checkpoint/resume/tracing hooks
    behave identically across all seven solvers (SURVEY.md §5.4).

      preprocess    "normalize" = joint [0,255] (image_normalization_2,
                    reference src/utils.cpp:283-326), None = raw, or a
                    callable(images) -> images for custom schemes
      state_init    fn(size=(nx,ny), dtype) -> dict at the coarsest size
      solve_scale   fn(images_at_scale, state, scale=s) -> state
      upsample_state  fn(state, out_size, zfactor) -> state one level up
      level_callback  fn(scale, state_dict) after each solved level
      resume        (scale, state_dict): restart below `scale` from its
                    already-solved state
    """
    from tpuflow.utils.trace import trace_scope

    if callable(preprocess):
        images = preprocess(images)
        normalize = False
    else:
        normalize = preprocess == "normalize"
    levels, sizes = build_pyramid(images, nscales, zfactor, presmooth,
                                  normalize)
    dtype = images[0].dtype
    if resume is not None:
        start, state = resume
        state = {k: jnp.asarray(v, dtype=dtype) for k, v in state.items()}
        if start > 0:
            state = upsample_state(state, sizes[start - 1], zfactor)
        start -= 1
    else:
        state = state_init(sizes[-1], dtype)
        start = nscales - 1
    for s in range(start, -1, -1):
        scope = f"{trace_name or 'pyramid'}/level_{s}"
        with trace_scope(scope):
            state = solve_scale(levels[s], state, scale=s)
        if level_callback is not None:
            level_callback(s, state)
        if s > 0:
            state = upsample_state(state, sizes[s - 1], zfactor)
    return state


def run_pyramid(images, nscales, zfactor, solve_scale,
                presmooth=PRESMOOTHING_SIGMA, normalize=True,
                level_callback=None, resume=None, trace_name=None):
    """Build the pyramid and run `solve_scale` coarse -> fine.

    (u1, u2)-state wrapper over `run_pyramid_state` for the common
    two-field solvers.  `solve_scale(images_at_scale, u1, u2)` returns
    (u1, u2) or (u1, u2, extras); the final level's extras are returned
    as-is.

    `level_callback(scale, {"u1": ..., "u2": ...})` runs after each
    solved level (checkpointing/observability hook; see
    tpuflow.utils.checkpoint).  `resume=(scale, u1, u2)` restarts the
    coarse-to-fine loop below `scale` with the given already-solved
    flow for that scale.  `trace_name` wraps each level in a named
    profiler scope.
    """
    import inspect

    takes_scale = "scale" in inspect.signature(solve_scale).parameters
    extras_box = [None]

    def solve(level_images, state, scale):
        if takes_scale:
            out = solve_scale(level_images, state["u1"], state["u2"],
                              scale=scale)
        else:
            out = solve_scale(level_images, state["u1"], state["u2"])
        extras_box[0] = out[2:] if len(out) > 2 else None
        return {"u1": out[0], "u2": out[1]}

    if resume is not None:
        resume = (resume[0], {"u1": resume[1], "u2": resume[2]})
    state = run_pyramid_state(
        images, nscales, zfactor, solve,
        presmooth=presmooth,
        preprocess="normalize" if normalize else None,
        level_callback=level_callback, resume=resume, trace_name=trace_name)
    return state["u1"], state["u2"], extras_box[0]
