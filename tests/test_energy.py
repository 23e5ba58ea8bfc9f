"""Energy-based validation for the two substituted iterations (SURVEY
§4.3 / §7 hard-part 6).

The rebuild replaces two reference iteration orderings with different
iterations that share the same fixed point:

  * the 4-color SOR sweep for pyramidal Horn-Schunck (the reference
    sweeps in-place lexicographically with OpenMP races,
    src/horn_schunck_pyramidal.cpp:143-231), and
  * the red-black box relaxation for the scalar ROF problem of
    tvl1occflow's Solver_wrt_u (the reference sweeps cells
    lexicographically, src/tvl1occflow_tv_rof_box.cpp:22-645).

EPE tests elsewhere pin the fixed points; these tests validate the
ITERATIONS by the reference's own objective: the discrete energy each
scheme minimizes must be non-increasing across sweeps on the golden
inputs.

HS energy (the quadratic whose stationarity conditions are exactly the
reference's sor_iteration linear system, src/horn_schunck_pyramidal.cpp
:54-66 with the per-warp constants of :128-137):

    E(u, v) = 1/2 sum_p (I2wx u + I2wy v - dif)^2
              + alpha^2/2 * (R(u) + R(v)),
    R(f) = 1/2 sum_p sum_{q in clamped N8(p)} w_pq (f_p - f_q)^2,
    w = 1/6 direct + 1/12 diagonal.

The system matrix is symmetric positive definite (weak diagonal
dominance of the clamped Laplacian + the alpha^2 data diagonal), so SOR
with 0 < omega = 1.9 < 2 must decrease E at every sweep — a sharp test:
an ordering error (e.g. red-black under this 8-neighbor stencil, which
degenerates to over-relaxed Jacobi) diverges.

ROF energy (the modified Rudin-Osher-Fatemi objective of Solver_wrt_u,
src/tvl1occflow_solvers.cpp:196-215 with lambda = theta):

    E(u) = 1/(2*lambda) ||u - lambda f||^2 + sum_p g_p |grad u|_p

whose dual fixed point is the box scheme's primal recovery
u = lambda (f + div p) (tv_rof_box.cpp:609-635).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tpuflow.models.hs_pyramidal import _four_colors, _sor_sweep
from tpuflow.models.tvl1occ_rof import rof_box_cell_centered
from tpuflow.ops.gradients import centered_gradient
from tpuflow.ops.interp import warp

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _hs_energy(u, v, I2wx, I2wy, dif, alpha2):
    data = 0.5 * jnp.sum((I2wx * u + I2wy * v - dif) ** 2)

    def R(f):
        ny, nx = f.shape
        tot = 0.0
        for dy, dx, w in [(0, 1, 1 / 6), (0, -1, 1 / 6), (1, 0, 1 / 6),
                          (-1, 0, 1 / 6), (1, 1, 1 / 12), (1, -1, 1 / 12),
                          (-1, 1, 1 / 12), (-1, -1, 1 / 12)]:
            ii = jnp.clip(jnp.arange(ny) + dy, 0, ny - 1)
            jj = jnp.clip(jnp.arange(nx) + dx, 0, nx - 1)
            tot = tot + 0.5 * w * jnp.sum((f - f[ii][:, jj]) ** 2)
        return tot

    return float(data + 0.5 * alpha2 * (R(u) + R(v)))


def test_hs_sor_energy_monotone():
    d = np.load(os.path.join(GOLDENS, "solvers.npz"))
    I1 = jnp.asarray(d["n0"], jnp.float64)
    I2 = jnp.asarray(d["n1"], jnp.float64)
    # start from a deliberately wrong flow so the sweep has work to do
    u = jnp.asarray(d["true_u"] * 0.5, jnp.float64)
    v = jnp.asarray(d["true_v"] * 0.5, jnp.float64)
    alpha2 = 7.0 ** 2
    I2x, I2y = centered_gradient(I2)
    I2wx = warp(I2x, u, v)
    I2wy = warp(I2y, u, v)
    dif = I1 - warp(I2, u, v) + I2wx * u + I2wy * v
    Au, Av = dif * I2wx, dif * I2wy
    Du, Dv = I2wx ** 2 + alpha2, I2wy ** 2 + alpha2
    D = I2wx * I2wy
    colors = _four_colors(I1.shape)

    Es = [_hs_energy(u, v, I2wx, I2wy, dif, alpha2)]
    for _ in range(30):
        u, v, _ = _sor_sweep(u, v, Au, Av, Du, Dv, D, alpha2, colors)
        Es.append(_hs_energy(u, v, I2wx, I2wy, dif, alpha2))
    Es = np.asarray(Es)
    # SPD system + 0 < omega < 2: strictly non-increasing (f64 slack)
    assert np.all(np.diff(Es) <= 1e-9 * abs(Es[0]))
    # and it actually makes progress
    assert Es[-1] < 0.95 * Es[0]


def _rof_energy(u, f, g, lam):
    ux = jnp.pad(u[:, 1:] - u[:, :-1], ((0, 0), (0, 1)))
    uy = jnp.pad(u[1:] - u[:-1], ((0, 1), (0, 0)))
    return float(0.5 / lam * jnp.sum((u - lam * f) ** 2)
                 + jnp.sum(g * jnp.sqrt(ux ** 2 + uy ** 2)))


@pytest.mark.parametrize("seed,lam", [(3, 0.3), (11, 0.15)])
def test_rof_box_energy_monotone(seed, lam):
    rng = np.random.default_rng(seed)
    ny, nx = 48, 64
    f = jnp.asarray(rng.standard_normal((ny, nx)) * 2.0, jnp.float64)
    yy, xx = np.mgrid[0:ny, 0:nx]
    g = jnp.asarray(
        1.0 / (1.0 + 2.0 * np.hypot(np.sin(xx / 7.0), np.cos(yy / 5.0))),
        jnp.float64)
    # Solver_wrt_u's initialization: p = 0, u = lambda * f
    u = lam * f
    p1 = jnp.zeros((ny, nx), jnp.float64)
    p2 = jnp.zeros((ny, nx), jnp.float64)
    Es = [_rof_energy(u, f, g, lam)]
    for _ in range(30):
        u, p1, p2 = rof_box_cell_centered(u, f, p1, p2, g, lam, n_iter=1)
        Es.append(_rof_energy(u, f, g, lam))
    Es = np.asarray(Es)
    assert np.all(np.diff(Es) <= 1e-9 * abs(Es[0]))
    assert Es[-1] < 0.9 * Es[0]
