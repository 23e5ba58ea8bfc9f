"""Tiled (halo-exchanged) ops vs single-device ops on an 8-device CPU
mesh — results must match bitwise (same dtype, same op order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpuflow import ops
from tpuflow.models.tvl1 import tvl1_scale
from tpuflow.parallel.mesh import make_mesh
from tpuflow.parallel.tiled import (
    TileGeom,
    centered_gradient_tiled,
    divergence_tiled,
    forward_gradient_tiled,
    gaussian_tiled,
    tvl1_scale_tiled,
    warp_planes_tiled,
)

NY, NX = 64, 96


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"y": 2, "x": 4})


@pytest.fixture(scope="module")
def geom(mesh):
    return TileGeom("y", 2, "x", 4, NY // 2, NX // 4)


def _field(seed, shape=(NY, NX), amp=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(amp * rng.standard_normal(shape))


def _shard_map(mesh, fn, n_in, n_out=1):
    spec = P("y", "x")
    return jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * n_in,
                         out_specs=(spec,) * n_out if n_out > 1 else spec)


def test_centered_gradient_tiled(mesh, geom):
    I = _field(0)
    dx_t, dy_t = _shard_map(mesh, lambda a: centered_gradient_tiled(a, geom), 1, 2)(I)
    dx, dy = ops.centered_gradient(I)
    np.testing.assert_array_equal(np.asarray(dx_t), np.asarray(dx))
    np.testing.assert_array_equal(np.asarray(dy_t), np.asarray(dy))


def test_forward_gradient_tiled(mesh, geom):
    f = _field(1)
    fx_t, fy_t = _shard_map(mesh, lambda a: forward_gradient_tiled(a, geom), 1, 2)(f)
    fx, fy = ops.forward_gradient(f)
    np.testing.assert_array_equal(np.asarray(fx_t), np.asarray(fx))
    np.testing.assert_array_equal(np.asarray(fy_t), np.asarray(fy))


def test_divergence_tiled(mesh, geom):
    v1, v2 = _field(2), _field(3)
    div_t = _shard_map(mesh, lambda a, b: divergence_tiled(a, b, geom), 2)(v1, v2)
    div = ops.divergence(v1, v2)
    np.testing.assert_allclose(np.asarray(div_t), np.asarray(div), atol=0)


@pytest.mark.parametrize("sigma", [0.8, 1.5])
def test_gaussian_tiled(mesh, geom, sigma):
    I = _field(4, amp=100.0)
    out_t = _shard_map(mesh, lambda a: gaussian_tiled(a, sigma, geom), 1)(I)
    out = ops.gaussian(I, sigma)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out), atol=1e-12)


def test_warp_tiled(mesh, geom):
    I = _field(5, amp=100.0)
    # |flow| must stay <= halo - 3 for exactness (8 - 3 = 5 here)
    u = jnp.clip(_field(6, amp=3.0), -5.0, 5.0)
    v = jnp.clip(_field(7, amp=3.0), -5.0, 5.0)

    def tiled(a, uu, vv):
        return warp_planes_tiled(a[None], uu, vv, geom, halo=8)[0]

    out_t = _shard_map(mesh, tiled, 3)(I, u, v)
    out = ops.warp(I, u, v, border_out=True)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out), atol=1e-12)


def test_tvl1_scale_tiled_matches_single_device(mesh, geom, solver_goldens):
    g = solver_goldens
    n0 = jnp.asarray(g["n0"])
    n1 = jnp.asarray(g["n1"])
    zero = jnp.zeros_like(n0)

    def tiled(a, b, uu, vv):
        return tvl1_scale_tiled(a, b, uu, vv, geom, warp_halo=8, warps=3)

    sharding = NamedSharding(mesh, P("y", "x"))
    args = [jax.device_put(x, sharding) for x in (n0, n1, zero, zero)]
    u_t, v_t = jax.jit(_shard_map(mesh, tiled, 4, 2))(*args)

    u_s, v_s = tvl1_scale(n0, n1, zero, zero, warps=3)
    epe = np.mean(np.hypot(np.asarray(u_t) - np.asarray(u_s),
                           np.asarray(v_t) - np.asarray(v_s)))
    assert epe < 1e-12, epe
