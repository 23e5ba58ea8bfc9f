"""Round-5 probe: is the discrete energy monotone under (a) the 4-color
HS SOR sweep and (b) the red-black ROF box relaxation?  Informs
tests/test_energy.py tolerances before committing the tests."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tpuflow.models.hs_pyramidal import _four_colors, _sor_sweep
from tpuflow.models.tvl1occ_rof import rof_box_cell_centered
from tpuflow.ops.gradients import centered_gradient
from tpuflow.ops.interp import warp


def hs_energy(u, v, I2wx, I2wy, dif, alpha2):
    """E = 1/2 sum (I2wx u + I2wy v - dif)^2 + alpha2/2 * R(u) + R(v),
    R(f) = 1/2 sum_{ordered (p,q in clamped N8)} w_pq (f_p - f_q)^2,
    w = 1/6 direct + 1/12 diagonal (reference sor_iteration weights,
    src/horn_schunck_pyramidal.cpp:54-58)."""
    data = 0.5 * jnp.sum((I2wx * u + I2wy * v - dif) ** 2)

    def R(f):
        tot = 0.0
        for dy, dx, w in [(0, 1, 1 / 6), (0, -1, 1 / 6), (1, 0, 1 / 6),
                          (-1, 0, 1 / 6), (1, 1, 1 / 12), (1, -1, 1 / 12),
                          (-1, 1, 1 / 12), (-1, -1, 1 / 12)]:
            ny, nx = f.shape
            ii = jnp.clip(jnp.arange(ny) + dy, 0, ny - 1)
            jj = jnp.clip(jnp.arange(nx) + dx, 0, nx - 1)
            fq = f[ii][:, jj]
            tot = tot + 0.5 * w * jnp.sum((f - fq) ** 2)
        return tot

    return data + 0.5 * alpha2 * (R(u) + R(v))


def probe_hs():
    d = np.load(os.path.join(os.path.dirname(__file__), "..", "..",
                             "tests", "goldens", "solvers.npz"))
    I1 = jnp.asarray(d["n0"], jnp.float64)
    I2 = jnp.asarray(d["n1"], jnp.float64)
    u = jnp.asarray(d["true_u"] * 0.5, jnp.float64)
    v = jnp.asarray(d["true_v"] * 0.5, jnp.float64)
    alpha2 = 7.0 ** 2
    I2x, I2y = centered_gradient(I2)
    I2w = warp(I2, u, v)
    I2wx = warp(I2x, u, v)
    I2wy = warp(I2y, u, v)
    dif = I1 - I2w + I2wx * u + I2wy * v
    Au = dif * I2wx
    Av = dif * I2wy
    Du = I2wx ** 2 + alpha2
    Dv = I2wy ** 2 + alpha2
    D = I2wx * I2wy
    colors = _four_colors(I1.shape)
    Es = [float(hs_energy(u, v, I2wx, I2wy, dif, alpha2))]
    for _ in range(60):
        u, v, _ = _sor_sweep(u, v, Au, Av, Du, Dv, D, alpha2, colors)
        Es.append(float(hs_energy(u, v, I2wx, I2wy, dif, alpha2)))
    dEs = np.diff(Es)
    print("HS energies:", [f"{e:.6f}" for e in Es[:8]], "...", Es[-1])
    print("HS max increase:", dEs.max(), " (scale:", abs(Es[0]), ")")


def rof_energy(u, f, g, lam):
    ux = jnp.pad(u[:, 1:] - u[:, :-1], ((0, 0), (0, 1)))
    uy = jnp.pad(u[1:] - u[:-1], ((0, 1), (0, 0)))
    tv = jnp.sum(g * jnp.sqrt(ux ** 2 + uy ** 2))
    return float(0.5 / lam * jnp.sum((u - lam * f) ** 2) + tv)


def probe_rof():
    rng = np.random.default_rng(3)
    ny, nx = 48, 64
    f = jnp.asarray(rng.standard_normal((ny, nx)) * 2.0, jnp.float64)
    yy, xx = np.mgrid[0:ny, 0:nx]
    gnp = 1.0 / (1.0 + 0.05 * np.hypot(np.sin(xx / 7.0), np.cos(yy / 5.0)) * 40)
    g = jnp.asarray(gnp, jnp.float64)
    lam = 0.3
    u = lam * f  # p=0 primal recovery (Solver_wrt_u init)
    p1 = jnp.zeros((ny, nx), jnp.float64)
    p2 = jnp.zeros((ny, nx), jnp.float64)
    Es = [rof_energy(u, f, g, lam)]
    for _ in range(60):
        u, p1, p2 = rof_box_cell_centered(u, f, p1, p2, g, lam, n_iter=1)
        Es.append(rof_energy(u, f, g, lam))
    dEs = np.diff(Es)
    print("ROF energies:", [f"{e:.6f}" for e in Es[:8]], "...", Es[-1])
    print("ROF max increase:", dEs.max(), " (scale:", abs(Es[0]), ")")
    print("ROF increases at iters:", np.nonzero(dEs > 0)[0][:20])


if __name__ == "__main__":
    probe_hs()
    probe_rof()
