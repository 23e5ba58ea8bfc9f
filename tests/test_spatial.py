"""GSPMD spatial-sharding lane (tpuflow.parallel.spatial): the 4K
multiscale tiled configs of BASELINE config 5, exercised on the
8-device CPU mesh at reduced size.

Sharded runs execute the identical solver code on (y, x)-tiled inputs;
agreement with the unsharded run is asserted at tight tolerance (the
partitioner may reassociate f32/f64 reductions)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuflow.parallel.spatial import (
    make_spatial_mesh,
    robust_expo_spatial,
    tvl1_spatial,
    tvl1occflow_spatial,
)


def _synth(ny, nx, seed=0, shift=(1, 1)):
    rng = np.random.default_rng(seed)
    pad = 4
    base = 128 + 50 * np.real(np.fft.ifft2(
        np.fft.fft2(rng.standard_normal((ny + 2 * pad, nx + 2 * pad)))
        * np.exp(-((np.fft.fftfreq(nx + 2 * pad)[None, :] ** 2
                    + np.fft.fftfreq(ny + 2 * pad)[:, None] ** 2)) * 500)))
    sy, sx = shift
    I0 = base[pad:pad + ny, pad:pad + nx]
    I1 = base[pad + sy:pad + sy + ny, pad + sx:pad + sx + nx]
    Im1 = base[pad - sy:pad - sy + ny, pad - sx:pad - sx + nx]
    return (jnp.asarray(Im1), jnp.asarray(I0), jnp.asarray(I1))


def test_mesh_factorization():
    mesh = make_spatial_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("y", "x")


def test_tvl1_spatial_matches_unsharded():
    from tpuflow.models.tvl1 import tvl1_multiscale

    _, I0, I1 = _synth(64, 128, seed=3)
    u_ref, v_ref = tvl1_multiscale(I0, I1, nscales=3, warp_mode="fast")
    u_sh, v_sh = tvl1_spatial(I0, I1, nscales=3)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref),
                               atol=1e-8)


def test_tvl1occflow_spatial_matches_unsharded():
    from tpuflow.models.tvl1occflow import tvl1occflow

    Im1, I0, I1 = _synth(48, 96, seed=5)
    u_ref, v_ref, chi_ref = tvl1occflow(Im1, I0, I1, nscales=2,
                                        warp_mode="fast")
    u_sh, v_sh, chi_sh = tvl1occflow_spatial(Im1, I0, I1, nscales=2)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref),
                               atol=1e-8)
    np.testing.assert_array_equal(np.asarray(chi_sh), np.asarray(chi_ref))


def test_robust_expo_spatial_matches_unsharded():
    from tpuflow.models.robust_expo import robust_expo

    _, I0, I1 = _synth(48, 96, seed=7)
    u_ref, v_ref = robust_expo(I0, I1, nscales=2, outer_iter=3,
                               warp_mode="fast")
    u_sh, v_sh = robust_expo_spatial(I0, I1, nscales=2, outer_iter=3)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref),
                               atol=1e-8)


def test_tvl1occflow_spatial_f32():
    """The TPU dtype: f32 sharded vs f32 unsharded.  The partitioner
    may reassociate f32 reductions (parallel/spatial.py docstring), so
    agreement is asserted at EPE level rather than elementwise
    bitwise — this is the tolerance story the 4K chip runs rely on."""
    from tpuflow.models.tvl1occflow import tvl1occflow

    Im1, I0, I1 = (a.astype(jnp.float32) for a in _synth(48, 96, seed=11))
    u_ref, v_ref, chi_ref = tvl1occflow(Im1, I0, I1, nscales=2,
                                        warp_mode="fast")
    u_sh, v_sh, chi_sh = tvl1occflow_spatial(Im1, I0, I1, nscales=2)
    epe = np.hypot(np.asarray(u_sh - u_ref, np.float64),
                   np.asarray(v_sh - v_ref, np.float64)).mean()
    assert epe < 1e-4, epe
    assert np.mean(np.asarray(chi_sh) != np.asarray(chi_ref)) < 0.01


def test_robust_expo_spatial_f32():
    from tpuflow.models.robust_expo import robust_expo

    _, I0, I1 = (a.astype(jnp.float32) for a in _synth(48, 96, seed=13))
    u_ref, v_ref = robust_expo(I0, I1, nscales=2, outer_iter=3,
                               warp_mode="fast")
    u_sh, v_sh = robust_expo_spatial(I0, I1, nscales=2, outer_iter=3)
    epe = np.hypot(np.asarray(u_sh - u_ref, np.float64),
                   np.asarray(v_sh - v_ref, np.float64)).mean()
    assert epe < 1e-4, epe


def test_robust_expo_spatial_df_auto():
    """DF-AUTO's percentile sort is the one global op — the partitioner
    must all-gather for it without changing the result."""
    from tpuflow.models.robust_expo import robust_expo

    _, I0, I1 = _synth(48, 96, seed=9)
    u_ref, v_ref = robust_expo(I0, I1, method_type=3, nscales=2,
                               outer_iter=2, warp_mode="fast")
    u_sh, v_sh = robust_expo_spatial(I0, I1, method_type=3, nscales=2,
                                     outer_iter=2)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               atol=1e-8)
