"""Frame-axis (sequence-parallel) Brox temporal vs the single-device
solver on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.models.brox_temporal import brox_temporal_scale
from tpuflow.parallel.mesh import make_mesh
from tpuflow.parallel.temporal import brox_temporal_sharded


def _volume(frames=5, ny=24, nx=32, seed=3):
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal((ny, nx))
    fy = np.fft.fftfreq(ny)[:, None]
    fx = np.fft.fftfreq(nx)[None, :]
    base = np.real(np.fft.ifft2(np.fft.fft2(noise)
                                * np.exp(-(fx ** 2 + fy ** 2) * 500.0)))
    base = 128 + 90 * base / np.abs(base).max()
    vol = np.stack([np.roll(base, f, axis=1) for f in range(frames)])
    return jnp.asarray(vol)


@pytest.mark.parametrize("t_shards", [2, 4])
def test_sharded_matches_single_device(t_shards):
    vol = _volume()
    mesh = make_mesh({"t": t_shards, "rest": -1})
    # fixed sweep counts so both sides run the identical iteration
    kw = dict(outer_iter=3, inner_iter=1, stop="fixed", maxiter=12)
    u0 = jnp.zeros((vol.shape[0] - 1,) + vol.shape[1:], dtype=vol.dtype)
    u_ref, v_ref = brox_temporal_scale(vol, u0, u0, **kw)
    u_sh, v_sh = brox_temporal_sharded(vol, mesh, **kw)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref),
                               atol=1e-10)


@pytest.mark.parametrize("frames", [4, 6, 7])
def test_sharded_uneven_fields(frames):
    """(T-1) not divisible by the mesh axis: padded fields are frozen
    and real fields clamp temporal neighbors by global index, so the
    result is still exactly the single-device one."""
    vol = _volume(frames=frames)
    mesh = make_mesh({"t": 4, "rest": -1})
    kw = dict(outer_iter=2, inner_iter=1, stop="fixed", maxiter=8)
    u0 = jnp.zeros((vol.shape[0] - 1,) + vol.shape[1:], dtype=vol.dtype)
    u_ref, v_ref = brox_temporal_scale(vol, u0, u0, **kw)
    u_sh, v_sh = brox_temporal_sharded(vol, mesh, **kw)
    assert u_sh.shape == (frames - 1,) + vol.shape[1:]
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref),
                               atol=1e-10)


def test_sharded_error_stop():
    vol = _volume(frames=5)
    mesh = make_mesh({"t": 2, "rest": -1})
    u_sh, v_sh = brox_temporal_sharded(vol, mesh, stop="error",
                                       outer_iter=2, inner_iter=1)
    u0 = jnp.zeros((vol.shape[0] - 1,) + vol.shape[1:], dtype=vol.dtype)
    u_ref, v_ref = brox_temporal_scale(vol, u0, u0, stop="error",
                                       outer_iter=2, inner_iter=1)
    epe = float(np.mean(np.hypot(np.asarray(u_sh) - np.asarray(u_ref),
                                 np.asarray(v_sh) - np.asarray(v_ref))))
    assert epe < 1e-8, epe


def test_multiscale_sharded_matches_single_device():
    """Pyramid wrapper over the sharded per-scale solver vs the full
    single-device multiscale (reference pyramid:
    src/brox_optic_flow_temporal.cpp:566-601)."""
    from tpuflow.models.brox_temporal import brox_temporal
    from tpuflow.parallel.temporal import brox_temporal_multiscale_sharded

    vol = _volume(frames=5, ny=40, nx=48)
    mesh = make_mesh({"t": 4, "rest": -1})
    kw = dict(nscales=2, outer_iter=2, inner_iter=1, stop="fixed",
              maxiter=8)
    u_ref, v_ref = brox_temporal(vol, **kw)
    u_sh, v_sh = brox_temporal_multiscale_sharded(vol, mesh, **kw)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref),
                               atol=1e-9)
