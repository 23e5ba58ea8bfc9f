"""robust_expo_methods vs the reference oracle.

Grayscale runs replicate the reference exactly (incl. its buggy
presmooth: sigma = channel count, Dirichlet BC).  RGB runs have a
looser budget because the reference's multichannel path hits genuine
undefined behavior we do not replicate (uninitialized first-row dx in
centered_gradient src/operators.cpp:363, out-of-bounds reads in
zoom_out_color src/zoom.cpp:95-120) — see
tpuflow/models/robust_expo.py docstring."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.models.robust_expo import robust_expo


def _epe(u1, v1, u2, v2):
    return float(np.mean(np.hypot(np.asarray(u1) - u2, np.asarray(v1) - v2)))


@pytest.fixture(scope="session")
def re_goldens():
    here = os.path.dirname(os.path.abspath(__file__))
    return dict(np.load(os.path.join(here, "goldens", "robust_expo.npz")))


@pytest.mark.parametrize("method", [1, 2, 3])
def test_gray_multiscale_vs_reference(re_goldens, method):
    g = re_goldens
    u, v = robust_expo(jnp.asarray(g["I0"]), jnp.asarray(g["I1"]),
                       method_type=method, nscales=3, clamp_scales=False)
    epe = _epe(u, v, g[f"gray_m{method}_u"], g[f"gray_m{method}_v"])
    assert epe < 5e-3, epe


def test_gray_f32(re_goldens):
    g = re_goldens
    u, v = robust_expo(
        jnp.asarray(g["I0"], dtype=jnp.float32),
        jnp.asarray(g["I1"], dtype=jnp.float32),
        method_type=1, nscales=3, clamp_scales=False)
    assert u.dtype == jnp.float32
    epe = _epe(u, v, g["gray_m1_u"], g["gray_m1_v"])
    assert epe < 1e-2, epe


def test_rgb_single_scale_vs_reference(re_goldens):
    g = re_goldens
    rgb0 = jnp.moveaxis(jnp.asarray(g["rgb0"]), -1, 0)
    rgb1 = jnp.moveaxis(jnp.asarray(g["rgb1"]), -1, 0)
    u, v = robust_expo(rgb0, rgb1, method_type=1, nscales=1,
                       clamp_scales=False)
    # looser: the reference's RGB gradient/zoom paths are UB (docstring)
    epe = _epe(u, v, g["rgb_m1_u"], g["rgb_m1_v"])
    assert epe < 0.03, epe


def test_clean_presmooth_recovers_truth(re_goldens):
    """The 'clean' presmooth (sigma=0.8, reflecting — the intended
    behavior) is a different operating point from the reference's
    buggy sigma=1.0 Dirichlet smooth (the exponential diffusivity is
    sensitive to gradient magnitudes), so we check ground-truth
    recovery instead of oracle parity."""
    g = re_goldens
    u, v = robust_expo(jnp.asarray(g["I0"]), jnp.asarray(g["I1"]),
                       method_type=1, nscales=3, clamp_scales=False,
                       presmooth_mode="clean")
    epe_clean = _epe(u, v, g["true_u"], g["true_v"])
    epe_ref = _epe(g["gray_m1_u"], g["gray_m1_v"], g["true_u"], g["true_v"])
    assert epe_clean < epe_ref * 1.5 + 0.05, (epe_clean, epe_ref)
