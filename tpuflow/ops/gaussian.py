"""Separable Gaussian smoothing with the reference's exact kernel + BCs.

Replicates reference src/operators.cpp:506-624:

  * one-sided kernel length  size = int(window*sigma) + 1  (window=5)
  * weights B[j] = exp(-j^2 / (2 sigma^2)), normalized by (2*sum - B[0])
  * full kernel covers offsets -(size-1) .. +(size-1)
  * 'reflecting' (default) boundary is ASYMMETRIC in the reference:
    the left/top pad mirrors WITHOUT repeating the edge pixel
    (x[-m] = x[m]) while the right/bottom pad mirrors WITH the edge
    (x[n-1+m] = x[n-m]); we replicate that exactly.
  * 'dirichlet' pads with zeros.
  * the reference's 'periodic' column pass has a copy-paste bug
    (src/operators.cpp:605 uses bdx for the y bound) and no solver uses
    periodic, so it is not provided.

The separable pass is expressed as shift-and-add over padded rows, which
XLA fuses into a single vectorized loop per axis — no gather, no
explicit convolution op needed for half-widths this small (<= ~13).
"""

import math

import jax.numpy as jnp
import numpy as np

DEFAULT_WINDOW = 5  # reference src/operators.h:120


def gaussian_kernel_1d(sigma, window=DEFAULT_WINDOW, dtype=np.float64):
    """One-sided weights B[0..size-1] per reference src/operators.cpp:524-539."""
    size = int(window * sigma) + 1
    j = np.arange(size, dtype=np.float64)
    b = np.exp(-(j * j) / (2.0 * sigma * sigma))
    norm = 2.0 * b.sum() - b[0]
    return (b / norm).astype(dtype), size


def _pad_reflecting(a, size, axis):
    """Reference 'reflecting' pad: left mirror-no-edge, right mirror-with-edge."""
    n = a.shape[axis]
    if size > n:
        raise ValueError(f"gaussian: pad {size} exceeds dim {n} (sigma too large)")
    idx = [slice(None)] * a.ndim
    # left pad: indices size, size-1, ..., 1  ->  flip of a[1 : size+1]
    idx[axis] = slice(1, size + 1)
    left = jnp.flip(a[tuple(idx)], axis=axis)
    # right pad: indices n-1, n-2, ..., n-size  ->  flip of a[n-size : n]
    idx[axis] = slice(n - size, n)
    right = jnp.flip(a[tuple(idx)], axis=axis)
    return jnp.concatenate([left, a, right], axis=axis)


def _pad_dirichlet(a, size, axis):
    shape = list(a.shape)
    shape[axis] = size
    z = jnp.zeros(shape, dtype=a.dtype)
    return jnp.concatenate([z, a, z], axis=axis)


def _conv_axis(a, weights, size, axis, bc):
    if bc == "reflecting":
        p = _pad_reflecting(a, size, axis)
    elif bc == "dirichlet":
        p = _pad_dirichlet(a, size, axis)
    else:
        raise ValueError(f"unknown boundary condition {bc!r}")
    n = a.shape[axis]
    idx = [slice(None)] * a.ndim

    def window(off):  # offset relative to center; p index = size + off
        idx[axis] = slice(size + off, size + off + n)
        return p[tuple(idx)]

    out = weights[0] * window(0)
    for j in range(1, size):
        out = out + weights[j] * (window(-j) + window(j))
    return out


def gaussian(I, sigma, bc="reflecting", window=DEFAULT_WINDOW):
    """Separable Gaussian smoothing of (..., H, W) arrays.

    Matches reference `gaussian()` (src/operators.cpp:506-624) to
    floating-point accuracy, including its asymmetric reflecting pad.
    """
    if sigma <= 0:
        return I
    w_np, size = gaussian_kernel_1d(sigma, window)
    weights = [jnp.asarray(w, dtype=I.dtype) for w in w_np]
    if size <= 1:
        return I * weights[0]
    out = _conv_axis(I, weights, size, -1, bc)   # rows first,
    out = _conv_axis(out, weights, size, -2, bc)  # then columns
    return out


def sgauss_kernel(std, n, dtype=np.float64):
    """Symmetric n-tap Gaussian kernel per reference src/utils.cpp:15-45
    (me_sgauss): sampled at i - (n-1)/2, normalized to unit mass."""
    if n == 1:
        return np.ones(1, dtype=dtype)
    i = np.arange(n, dtype=np.float64)
    v = (i - 0.5 * (n - 1)) / std
    out = np.exp(-0.5 * v * v)
    return (out / out.sum()).astype(dtype)


def sepconvol(I, filter_x, filter_y):
    """Separable convolution with mirror-no-edge BC, x then y.

    Matches reference me_sepconvol (src/utils.cpp:47-127): the sample at
    position s outside [0, n-1] folds as s<0 -> -s-1 and s>n-1 ->
    2n-s-1 ... i.e. numpy 'symmetric' padding.
    """
    fx = np.asarray(filter_x, dtype=np.float64)
    fy = np.asarray(filter_y, dtype=np.float64)
    out = I
    for f, axis in ((fx, -1), (fy, -2)):
        size = len(f)
        org = (size - 1) // 2
        n = out.shape[axis]
        # out[x] = sum_i f[i] * in[x - (i - org)]; in-index spans
        # [x-(size-1-org), x+org] so pad (size-1-org) left, org right
        pad = [(0, 0)] * out.ndim
        pad[axis] = (size - 1 - org, org)
        p = jnp.pad(out, pad, mode="symmetric")
        idx = [slice(None)] * out.ndim
        acc = None
        for i in range(size):
            idx[axis] = slice(size - 1 - i, size - 1 - i + n)
            term = jnp.asarray(f[i], dtype=I.dtype) * p[tuple(idx)]
            acc = term if acc is None else acc + term
        out = acc
    return out
