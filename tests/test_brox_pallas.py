"""The fused Brox/robust_expo red-black SOR kernel vs the XLA sweep
(interpret mode on CPU — same red-black ordering, so agreement is
floating-point-level, not just fixed-point-level)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.models.brox_spatial import (_red_black, _sor_solve,
                                         psi_divergence)


def _system(ny=96, nx=128, seed=0):
    rng = np.random.default_rng(seed)

    def plane(scale=1.0, off=0.0):
        return jnp.asarray(rng.standard_normal((ny, nx)) * scale + off,
                           jnp.float32)

    psis = 1.0 / jnp.sqrt(jnp.abs(plane()) + 0.3)
    psi1, psi2, psi3, psi4 = psi_divergence(psis)
    alpha = 50.0
    div_d = alpha * (psi1 + psi2 + psi3 + psi4)
    Au = plane(2.0)
    Av = plane(2.0)
    Du = jnp.abs(plane(1.0)) + div_d + 0.5
    Dv = jnp.abs(plane(1.0)) + div_d + 0.5
    D = plane(0.3)
    du = plane(0.1)
    dv = plane(0.1)
    return du, dv, Au, Av, Du, Dv, D, alpha, (psi1, psi2, psi3, psi4)


@pytest.mark.parametrize("stop,maxiter", [("fixed", 4), ("error", 60)])
def test_fused_sor_matches_xla(stop, maxiter):
    du, dv, Au, Av, Du, Dv, D, alpha, psis = _system()
    colors = _red_black(du.shape)
    tol = 1e-3
    size = du.size
    ref = _sor_solve(du, dv, Au, Av, Du, Dv, D, alpha, psis, colors, tol,
                     size, stop, maxiter, fused=False)
    got = _sor_solve(du, dv, Au, Av, Du, Dv, D, alpha, psis, colors, tol,
                     size, stop, maxiter, fused=True)
    assert int(got[2]) == int(ref[2]), (int(got[2]), int(ref[2]))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(float(got[3]), float(ref[3]),
                               rtol=1e-3, atol=1e-6)


def test_fused_sor_odd_size():
    """Non-(16,256)-aligned sizes exercise the pad/mask rim."""
    du, dv, Au, Av, Du, Dv, D, alpha, psis = _system(ny=101, nx=131, seed=3)
    colors = _red_black(du.shape)
    ref = _sor_solve(du, dv, Au, Av, Du, Dv, D, alpha, psis, colors, 1e-3,
                     du.size, "fixed", 3, fused=False)
    got = _sor_solve(du, dv, Au, Av, Du, Dv, D, alpha, psis, colors, 1e-3,
                     du.size, "fixed", 3, fused=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=0, atol=2e-4)
