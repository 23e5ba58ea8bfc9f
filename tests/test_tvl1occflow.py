"""tvl1occflow vs the reference oracle.

The oracle is the reference built with eta zero-initialized (the
reference's Solver_wrt_chi reads its static eta buffers UNINITIALIZED
on first use — its own #warning at src/tvl1occflow_solvers.cpp:262 —
so unpatched golden outputs depend on heap garbage; see
tools/build_reference.sh).

Flow parity is asserted against the EPE budget.  The binary occlusion
map is noise-dominated at default parameters (on the structured-
occlusion golden the REFERENCE detects zero pixels of the true occluded
band while marking ~23% scattered false positives), and the chi<0.5 /
chi>0.75 threshold branches amplify the remaining ROF sweep-ordering
differences chaotically — so chi is validated statistically (occluded
fraction, gross agreement), not pixelwise.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.models.tvl1occflow import tvl1occ_scale, tvl1occflow


def _epe(u1, v1, u2, v2):
    return float(np.mean(np.hypot(np.asarray(u1) - u2, np.asarray(v1) - v2)))


@pytest.fixture(scope="session")
def occ_goldens():
    here = os.path.dirname(os.path.abspath(__file__))
    return dict(np.load(os.path.join(here, "goldens", "tvl1occ.npz")))


@pytest.fixture(scope="session")
def occ_square():
    here = os.path.dirname(os.path.abspath(__file__))
    return dict(np.load(os.path.join(here, "goldens", "tvl1occ_square.npz")))


def test_single_scale_vs_reference(occ_goldens):
    g = occ_goldens
    I = [jnp.asarray(g[k]) for k in ("Im1", "I0", "I1")]
    z = jnp.zeros_like(I[1])
    u1, u2, chi = tvl1occ_scale(I[0], I[1], I[2], I[1], z, z, z)
    epe = _epe(u1, u2, g["s1_u"], g["s1_v"])
    assert epe < 0.05, epe


def test_multiscale_vs_reference(occ_goldens):
    g = occ_goldens
    I = [jnp.asarray(g[k]) for k in ("Im1", "I0", "I1")]
    u1, u2, chi = tvl1occflow(I[0], I[1], I[2], nscales=3, clamp_scales=False)
    epe = _epe(u1, u2, g["m3_u"], g["m3_v"])
    assert epe < 0.05, epe
    chi = np.asarray(chi)
    assert set(np.unique(chi)) <= {0.0, 1.0}
    assert abs(chi.mean() - g["m3_chi"].mean()) < 0.08
    assert (chi == g["m3_chi"]).mean() > 0.55


def test_structured_occlusion(occ_square):
    g = occ_square
    u1, u2, chi = tvl1occflow(jnp.asarray(g["Im1"]), jnp.asarray(g["I0"]),
                              jnp.asarray(g["I1"]), nscales=3,
                              clamp_scales=False)
    epe = _epe(u1, u2, g["u"], g["v"])
    assert epe < 0.05, epe
    # flow inside the moving square must be ~(disp, 0) — matching what
    # the reference estimates there, not the unstable chi map
    y0, y1, x0, x1 = g["square"]
    d = float(g["disp"])
    inner_u = np.asarray(u1)[y0 + 4:y1 - 4, x0 + 4:x1 - 4]
    ref_u = g["u"][y0 + 4:y1 - 4, x0 + 4:x1 - 4]
    assert abs(inner_u.mean() - ref_u.mean()) < 0.1
    assert abs(np.asarray(chi).mean() - g["chi"].mean()) < 0.08


def test_f32(occ_goldens):
    g = occ_goldens
    I = [jnp.asarray(g[k], dtype=jnp.float32) for k in ("Im1", "I0", "I1")]
    u1, u2, chi = tvl1occflow(I[0], I[1], I[2], nscales=3, clamp_scales=False)
    assert u1.dtype == jnp.float32
    epe = _epe(u1, u2, g["m3_u"], g["m3_v"])
    assert epe < 0.06, epe


def test_fast_warp_mode_vs_reference_binary(occ_goldens):
    """warp_mode="fast" — the TPU default since r5 (the CLI previously
    ran the exact gather while only the bench measured fast, VERDICT r4
    item 3) — must hold the same EPE budget against the reference
    binary's golden output as the exact mode."""
    g = occ_goldens
    I = [jnp.asarray(g[k], dtype=jnp.float32) for k in ("Im1", "I0", "I1")]
    u1, u2, chi = tvl1occflow(I[0], I[1], I[2], nscales=3,
                              clamp_scales=False, warp_mode="fast")
    epe = _epe(u1, u2, g["m3_u"], g["m3_v"])
    assert epe < 0.05, epe
    chi = np.asarray(chi)
    assert set(np.unique(chi)) <= {0.0, 1.0}
    assert abs(chi.mean() - g["m3_chi"].mean()) < 0.08
