"""Brox spatial (red-black SOR) vs the reference's sequential
Gauss-Seidel oracle.

The SOR orderings differ, but both converge to the unique solution of
each inner linear system, so results agree to ~stopping-tolerance
levels (far below the 0.05 EPE parity budget)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.models.brox_spatial import brox_spatial


def _epe(u1, v1, u2, v2):
    return float(np.mean(np.hypot(np.asarray(u1) - u2, np.asarray(v1) - v2)))


@pytest.fixture(scope="session")
def brox_goldens():
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    return dict(np.load(os.path.join(here, "goldens", "brox.npz")))


def test_brox_single_scale_vs_reference(brox_goldens):
    g = brox_goldens
    u, v = brox_spatial(jnp.asarray(g["I0"]), jnp.asarray(g["I1"]),
                        nscales=1, clamp_scales=False)
    epe = _epe(u, v, g["spatial_s1_u"], g["spatial_s1_v"])
    assert epe < 5e-3, epe


def test_brox_pyramid_vs_reference(brox_goldens):
    g = brox_goldens
    u, v = brox_spatial(jnp.asarray(g["I0"]), jnp.asarray(g["I1"]),
                        nscales=3, clamp_scales=False)
    epe = _epe(u, v, g["spatial_s3_u"], g["spatial_s3_v"])
    assert epe < 5e-3, epe


def test_brox_f32(brox_goldens):
    g = brox_goldens
    u, v = brox_spatial(
        jnp.asarray(g["I0"], dtype=jnp.float32),
        jnp.asarray(g["I1"], dtype=jnp.float32),
        nscales=3, clamp_scales=False)
    assert u.dtype == jnp.float32
    epe = _epe(u, v, g["spatial_s3_u"], g["spatial_s3_v"])
    assert epe < 1e-2, epe


def test_brox_recovers_truth(brox_goldens):
    """End-to-end sanity: the estimated flow recovers the synthetic
    ground truth about as well as the reference does."""
    g = brox_goldens
    u, v = brox_spatial(jnp.asarray(g["I0"]), jnp.asarray(g["I1"]),
                        nscales=3, clamp_scales=False)
    epe_ours = _epe(u, v, g["true_u"], g["true_v"])
    epe_ref = _epe(g["spatial_s3_u"], g["spatial_s3_v"],
                   g["true_u"], g["true_v"])
    assert epe_ours < epe_ref * 1.1 + 0.02, (epe_ours, epe_ref)
