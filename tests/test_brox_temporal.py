"""Brox spatio-temporal solver vs the reference oracle (3D red-black
SOR vs the reference's frame-sequential sweep — same fixed point)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.models.brox_temporal import brox_temporal


def _epe(u1, v1, u2, v2):
    return float(np.mean(np.hypot(np.asarray(u1) - u2, np.asarray(v1) - v2)))


@pytest.fixture(scope="session")
def bt_goldens():
    here = os.path.dirname(os.path.abspath(__file__))
    return dict(np.load(os.path.join(here, "goldens", "brox_temporal.npz")))


def test_single_scale_vs_reference(bt_goldens):
    g = bt_goldens
    u, v = brox_temporal(jnp.asarray(g["vol"]), nscales=1, clamp_scales=False)
    assert u.shape == (g["vol"].shape[0] - 1,) + g["vol"].shape[1:]
    epe = _epe(u, v, g["s1_u"], g["s1_v"])
    assert epe < 5e-3, epe


def test_pyramid_vs_reference(bt_goldens):
    g = bt_goldens
    u, v = brox_temporal(jnp.asarray(g["vol"]), nscales=2, clamp_scales=False)
    epe = _epe(u, v, g["s2_u"], g["s2_v"])
    assert epe < 5e-3, epe


def test_f32(bt_goldens):
    g = bt_goldens
    u, v = brox_temporal(jnp.asarray(g["vol"], dtype=jnp.float32),
                         nscales=2, clamp_scales=False)
    assert u.dtype == jnp.float32
    epe = _epe(u, v, g["s2_u"], g["s2_v"])
    assert epe < 1e-2, epe


def test_needs_three_frames(bt_goldens):
    g = bt_goldens
    with pytest.raises(ValueError):
        brox_temporal(jnp.asarray(g["vol"][:2]))


def test_recovers_truth(bt_goldens):
    """Each estimated field should recover the constant per-pair motion
    (true_u, true_v) reasonably well."""
    g = bt_goldens
    u, v = brox_temporal(jnp.asarray(g["vol"]), nscales=2, clamp_scales=False)
    epe = _epe(u, v, np.broadcast_to(g["true_u"], u.shape),
               np.broadcast_to(g["true_v"], v.shape))
    epe_ref = _epe(g["s2_u"], g["s2_v"],
                   np.broadcast_to(g["true_u"], u.shape),
                   np.broadcast_to(g["true_v"], v.shape))
    assert epe < epe_ref * 1.1 + 0.02, (epe, epe_ref)
