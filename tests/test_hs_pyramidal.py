"""Horn-Schunck pyramidal (red-black SOR) vs the reference's sequential
Gauss-Seidel oracle.

The orderings differ, but both converge to the unique solution of each
warp's linear system, so results must agree to ~stopping-tolerance
levels (far below the 0.05 EPE parity budget)."""

import jax.numpy as jnp
import numpy as np

from tpuflow.models.hs_pyramidal import hs_pyramidal, hs_scale


def _epe(u1, v1, u2, v2):
    return float(np.mean(np.hypot(np.asarray(u1) - u2, np.asarray(v1) - v2)))


def test_hs_scale_vs_reference(solver_goldens):
    g = solver_goldens
    u0 = jnp.zeros_like(jnp.asarray(g["n0"]))
    u, v = hs_scale(jnp.asarray(g["n0"]), jnp.asarray(g["n1"]), u0, u0,
                    alpha=7.0, warps=2, tol=1e-4, maxiter=150)
    epe = _epe(u, v, g["hs_flow_u"], g["hs_flow_v"])
    assert epe < 5e-3, epe


def test_hs_pyramidal_vs_reference(solver_goldens):
    g = solver_goldens
    u, v = hs_pyramidal(jnp.asarray(g["I0"]), jnp.asarray(g["I1"]),
                        alpha=7.0, nscales=3, zfactor=0.5, warps=10,
                        tol=1e-4, maxiter=150, clamp_scales=False)
    epe = _epe(u, v, g["hs_pyramidal_u"], g["hs_pyramidal_v"])
    assert epe < 5e-3, epe


def test_hs_pyramidal_f32(solver_goldens):
    g = solver_goldens
    u, v = hs_pyramidal(
        jnp.asarray(g["I0"], dtype=jnp.float32),
        jnp.asarray(g["I1"], dtype=jnp.float32),
        alpha=7.0, nscales=3, zfactor=0.5, warps=10, clamp_scales=False)
    assert u.dtype == jnp.float32
    epe = _epe(u, v, g["hs_pyramidal_u"], g["hs_pyramidal_v"])
    assert epe < 1e-2, epe
