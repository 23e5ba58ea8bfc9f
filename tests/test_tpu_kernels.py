"""Compiled-on-TPU kernel smoke tests (`TPUFLOW_TEST_TPU=1 pytest -m
tpu`): compile and run every Pallas kernel at a bench-like shape and
assert against the pure-XLA path.

This closes the round-1/2 regression class — Mosaic-only miscompiles
that interpret-mode CPU tests cannot see (e.g. the negative-dynamic-
shift pltpu.roll miscompile found in round 3: interpret mode was
correct, compiled silently wrong).  Run this BEFORE benching.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.tpu

B, H, W = 2, 436, 1024


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.standard_normal((B, 3, H, W)), jnp.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    u = jnp.asarray(np.broadcast_to(
        (2.0 * np.sin(3 * xx / W) + 0.3 * np.cos(5 * yy / H)).astype(np.float32),
        (B, H, W)))
    v = jnp.asarray(np.broadcast_to(
        (1.5 * np.cos(2 * yy / H) + 0.2 * np.sin(4 * xx / W)).astype(np.float32),
        (B, H, W)))
    return planes, u, v


def test_backend_is_tpu():
    assert jax.default_backend() == "tpu"


# dmax for the planes-kernel tests: the unrolled exact fallback's
# Mosaic compile time grows steeply with dmax (~90 s at 8); D=5
# exercises the same code paths (fast window, in-kernel exact
# fallback) at a fraction of the lane's wall time.  The bench hot path
# (fused warp_const kernel, fast-only) is tested at D=8 below.
D_PLANES = 5


def test_warp_kernel_compiled(batch):
    from tpuflow.ops.interp import warp_planes_shift
    from tpuflow.ops.warp_pallas import warp_planes_pallas_batched

    planes, u, v = batch
    ref = jax.vmap(lambda p, a, b: warp_planes_shift(p, a, b, D_PLANES))(
        planes, u, v)
    for rbud in (None, 3):
        got = warp_planes_pallas_batched(planes, u, v, D_PLANES,
                                         tile=(64, 512), rbud=rbud)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4,
                                   err_msg=f"rbud={rbud}")


def test_warp_kernel_fallback_exact(batch):
    """Rough flow forces the per-tile fallback; result must equal the
    exact kernel bit-for-bit."""
    from tpuflow.ops.warp_pallas import warp_planes_pallas_batched

    planes, _, _ = batch
    rng = np.random.default_rng(1)
    lim = D_PLANES - 1.1
    u = jnp.asarray(rng.uniform(-lim, lim, (B, H, W)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-lim, lim, (B, H, W)).astype(np.float32))
    exact = warp_planes_pallas_batched(planes, u, v, D_PLANES,
                                       tile=(64, 512), rbud=None)
    fast = warp_planes_pallas_batched(planes, u, v, D_PLANES,
                                      tile=(64, 512), rbud=3)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(exact))


def test_warp_fast_only_mode_compiled(batch):
    """fast_only planes mode (the multiscale solvers' TPU warp):
    identical to the exact-fallback planes kernel wherever the flow is
    window-covered — which the smooth bench flow is everywhere."""
    from tpuflow.ops.warp_pallas import warp_planes_pallas_batched

    planes, u, v = batch
    ref = warp_planes_pallas_batched(planes, u, v, D_PLANES,
                                     tile=(32, 512), rbud=2)
    got = warp_planes_pallas_batched(planes, u, v, D_PLANES,
                                     tile=(32, 512), rbud=2,
                                     fast_only=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_warp_const_kernel_compiled(batch):
    """Fused warp+constants kernel (round 4) vs constants composed from
    the planes-mode kernel's output — same warp term order, so only the
    const-assembly arithmetic differs (ulp-level)."""
    from tpuflow.ops.hs_pallas import pad_hw_q
    from tpuflow.ops.tvl1_pallas import pad_hw
    from tpuflow.ops.warp_pallas import (pick_tile,
                                         warp_const_pallas_batched,
                                         warp_planes_pallas_batched)

    planes, u, v = batch
    I0 = planes[:, 0] + 1.0
    D = 8
    w = warp_planes_pallas_batched(planes, u, v, D, tile=(32, 512), rbud=2)
    I1w, I1wx, I1wy = w[:, 0], w[:, 1], w[:, 2]
    grad = I1wx * I1wx + I1wy * I1wy
    rho_c = I1w - I1wx * u - I1wy * v - I0
    want = pad_hw(jnp.stack([I1wx, I1wy, rho_c, grad], axis=1))

    uv_p = pad_hw(jnp.stack([u, v], axis=1))
    aux_p = pad_hw(I0)
    tile = pick_tile(*uv_p.shape[-2:])
    got, ovf = warp_const_pallas_batched(planes, uv_p, aux_p, D, "tvl1",
                                         H, W, tile=tile, rbud=2)
    assert int(np.asarray(ovf).sum()) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3)

    alpha2 = 49.0
    dif = I0 - I1w + I1wx * u + I1wy * v
    want_hs = pad_hw_q(jnp.stack(
        [dif * I1wx, dif * I1wy, I1wx * I1wx + alpha2,
         I1wy * I1wy + alpha2, I1wx * I1wy], axis=1))
    uv_q = pad_hw_q(jnp.stack([u, v], axis=1))
    aux_q = pad_hw_q(I0)
    tile_q = pick_tile(*uv_q.shape[-2:])
    got_hs, ovf_hs = warp_const_pallas_batched(
        planes, uv_q, aux_q, D, "hs", H, W, tile=tile_q, rbud=2,
        alpha2=alpha2)
    assert int(np.asarray(ovf_hs).sum()) == 0
    gh = np.asarray(got_hs)
    wh_ = np.asarray(want_hs)
    scale = np.maximum(np.abs(wh_), 1.0)
    Hq, Wq = gh.shape[-2:]
    img = (np.arange(Hq)[:, None] < H) & (np.arange(Wq)[None, :] < W)
    assert (np.abs(gh - wh_) / scale * img).max() < 1e-3


def test_tvl1_kernel_compiled(batch):
    from tpuflow.models.tvl1 import _inner_step
    from tpuflow.ops.tvl1_pallas import (pad_hw, tvl1_iterate_error_padded,
                                         tvl1_iterate_padded)

    planes, u, v = batch
    rng = np.random.default_rng(2)
    state = jnp.asarray(rng.standard_normal((B, 6, H, W)) * 0.1, jnp.float32)
    const = jnp.asarray(
        np.stack([np.asarray(planes[:, 1]), np.asarray(planes[:, 2]),
                  rng.standard_normal((B, H, W)) * 5,
                  rng.uniform(0.1, 4.0, (B, H, W))], axis=1), jnp.float32)
    l_t, theta, taut = 0.045, 0.3, 0.25 / 0.3
    n_iters = 8

    # XLA reference
    parts = tuple(state[:, k] for k in range(6))
    for _ in range(n_iters):
        parts = _inner_step(*parts, const[:, 0], const[:, 1], const[:, 2],
                            const[:, 3], l_t, theta, taut)[:6]
    ref = jnp.stack(parts, axis=1)

    out, err = tvl1_iterate_padded(pad_hw(state), pad_hw(const), H, W,
                                   n_iters, l_t, theta, taut)
    np.testing.assert_allclose(np.asarray(out[:, :, :H, :W]),
                               np.asarray(ref), atol=2e-4)

    # error kernel with a huge threshold stops after 1 iteration
    out1, err1, n1 = tvl1_iterate_error_padded(
        pad_hw(state), pad_hw(const), H, W, 1e30, 300, l_t, theta, taut)
    assert np.all(np.asarray(n1) == 1)
    # with threshold 0 it runs to max_iter
    out2, err2, n2 = tvl1_iterate_error_padded(
        pad_hw(state), pad_hw(const), H, W, 0.0, n_iters, l_t, theta, taut)
    assert np.all(np.asarray(n2) == n_iters)
    np.testing.assert_allclose(np.asarray(out2[:, :, :H, :W]),
                               np.asarray(ref), atol=2e-4)


def test_hs_kernel_compiled(batch):
    from tpuflow.models.hs_pyramidal import _four_colors, _sor_sweep
    from tpuflow.ops.hs_pallas import (from_quarters, hs_sor_error_quarters,
                                       hs_sor_quarters, pad_hw_q,
                                       to_quarters)

    planes, u, v = batch
    rng = np.random.default_rng(3)
    alpha2 = 49.0
    I2wx = np.asarray(planes[:, 1])
    I2wy = np.asarray(planes[:, 2])
    Au = rng.standard_normal((B, H, W)).astype(np.float32)
    Av = rng.standard_normal((B, H, W)).astype(np.float32)
    Du = (I2wx * I2wx + alpha2).astype(np.float32)
    Dv = (I2wy * I2wy + alpha2).astype(np.float32)
    D = (I2wx * I2wy).astype(np.float32)
    const = jnp.asarray(np.stack([Au, Av, Du, Dv, D], axis=1))
    state = jnp.asarray(
        rng.standard_normal((B, 2, H, W)).astype(np.float32) * 0.1)
    n_sweeps = 4

    colors = _four_colors((H, W))
    uu, vv = state[:, 0], state[:, 1]
    for _ in range(n_sweeps):
        uu, vv, _ = _sor_sweep(uu, vv, const[:, 0], const[:, 1],
                               const[:, 2], const[:, 3], const[:, 4],
                               alpha2, colors)

    sq = to_quarters(pad_hw_q(state))
    cq = to_quarters(pad_hw_q(const))
    out_q, err = hs_sor_quarters(sq, cq, H, W, n_sweeps, alpha2)
    got = from_quarters(out_q)[:, :, :H, :W]
    np.testing.assert_allclose(np.asarray(got[:, 0]), np.asarray(uu),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[:, 1]), np.asarray(vv),
                               atol=2e-4)

    out_e, err_e, n_e = hs_sor_error_quarters(sq, cq, H, W, 0.0, n_sweeps,
                                              alpha2)
    assert np.all(np.asarray(n_e) == n_sweeps)
    got_e = from_quarters(out_e)[:, :, :H, :W]
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(got),
                               atol=1e-5)


def test_tvl1_fixed_schedule_matches_error_mode():
    """The calibrated per-size iteration schedule
    (tools/tvl1_calibration.json; tpuflow.models.batch.tvl1_iter_schedule)
    lands within EPE 0.05 of the reference-faithful error-stopping mode
    at the bench geometry."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import synth_pair
    from tpuflow.models.batch import tvl1_batched

    pairs = [synth_pair(seed=100 + s) for s in range(2)]
    I0 = jnp.asarray(np.stack([p[0] for p in pairs]), jnp.float32)
    I1 = jnp.asarray(np.stack([p[1] for p in pairs]), jnp.float32)
    u_e, v_e = tvl1_batched(I0, I1, stop="error")
    u_f, v_f = tvl1_batched(I0, I1, stop="fixed")
    epe = np.hypot(np.asarray(u_f - u_e), np.asarray(v_f - v_e)).mean()
    assert epe < 0.05, epe


def test_hs_fixed_schedule_matches_error_mode():
    """The calibrated per-size sweep schedule (tools/hs_calibration.json;
    tpuflow.models.batch.hs_sweep_schedule) lands within EPE 0.05 of the
    reference-faithful error-stopping mode at the bench geometry."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import synth_pair
    from tpuflow.models.batch import hs_pyramidal_batched

    pairs = [synth_pair(seed=100 + s) for s in range(2)]
    I0 = jnp.asarray(np.stack([p[0] for p in pairs]), jnp.float32)
    I1 = jnp.asarray(np.stack([p[1] for p in pairs]), jnp.float32)
    u_e, v_e = hs_pyramidal_batched(I0, I1, stop="error")
    u_f, v_f = hs_pyramidal_batched(I0, I1, stop="fixed")
    epe = np.hypot(np.asarray(u_f - u_e), np.asarray(v_f - v_e)).mean()
    assert epe < 0.05, epe


def test_brox_sor_kernel_compiled():
    """r5: the fused Brox/robust_expo red-black SOR kernel
    (tpuflow.ops.brox_pallas) compiled on the chip vs the XLA sweep at
    a bench-like level size — same ordering, so agreement is
    float-level."""
    from tpuflow.models.brox_spatial import (_red_black, _sor_solve,
                                             psi_divergence)

    rng = np.random.default_rng(5)
    ny, nx = 218, 512

    def plane(scale=1.0, off=0.0):
        return jnp.asarray(rng.standard_normal((ny, nx)) * scale + off,
                           jnp.float32)

    psis = 1.0 / jnp.sqrt(jnp.abs(plane()) + 0.3)
    psi1, psi2, psi3, psi4 = psi_divergence(psis)
    alpha = 50.0
    div_d = alpha * (psi1 + psi2 + psi3 + psi4)
    args = (plane(2.0), plane(2.0),
            jnp.abs(plane()) + div_d + 0.5, jnp.abs(plane()) + div_d + 0.5,
            plane(0.3))
    du, dv = plane(0.1), plane(0.1)
    colors = _red_black((ny, nx))
    ref = _sor_solve(du, dv, *args, alpha, (psi1, psi2, psi3, psi4),
                     colors, 1e-3, ny * nx, "error", 40, fused=False)
    got = _sor_solve(du, dv, *args, alpha, (psi1, psi2, psi3, psi4),
                     colors, 1e-3, ny * nx, "error", 40, fused=True)
    assert int(got[2]) == int(ref[2])
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=0, atol=5e-4)
