"""Joint [0, 255] image normalization.

Matches the reference's image_normalization_{1,2,3,4} family
(src/utils.cpp:251-502): min/max over ALL inputs jointly, then
x -> 255*(x - min)/(max - min); inputs pass through unchanged when the
range is empty.  image_normalization_3 (src/utils.cpp:412-450) skips
the den>0 guard in the reference; we keep the guard everywhere (the
divide-by-zero there is clearly unintended).

For multi-channel inputs, normalization is per channel over the joint
image set, matching image_normalization_2_color (src/utils.cpp:334-404)
with channels as the leading axis.
"""

import jax.numpy as jnp


def normalize_joint(*images):
    """Normalize any number of same-shape images jointly to [0, 255].

    Per-channel when inputs are (C, H, W): reduction runs over the last
    two axes plus the image set, separately for each leading index.
    """
    stack = jnp.stack(images)
    if stack.ndim == 3:  # (N, H, W): global reduction
        reduce_axes = (0, 1, 2)
    else:  # (N, C, H, W): keep channel axis
        reduce_axes = (0,) + tuple(range(2, stack.ndim))
    mn = jnp.min(stack, axis=reduce_axes, keepdims=True)
    mx = jnp.max(stack, axis=reduce_axes, keepdims=True)
    den = mx - mn
    out = jnp.where(den > 0, 255.0 * (stack - mn) / jnp.where(den > 0, den, 1.0), stack)
    return tuple(out[i] for i in range(len(images)))
