"""r4 experiment: can Mosaic deinterleave (stride-2 slice) in-kernel?

Decides whether the warp kernel can emit quarter-plane (parity
decomposed) outputs directly, skipping the XLA to_quarters transpose
per warp in the HS hot path.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 448, 1024


def timeit(f, n=20):
    f()
    t0 = time.perf_counter()
    for _ in range(n):
        f()
    return (time.perf_counter() - t0) / n * 1e6


def run(name, kern, out_shape, check):
    try:
        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        x = jnp.asarray(np.random.default_rng(0).standard_normal((H, W)),
                        jnp.float32)
        got = jax.jit(fn)(x)
        jax.block_until_ready(got)
        ok = np.allclose(np.asarray(got), check(np.asarray(x)))
        us = timeit(lambda: jax.block_until_ready(jax.jit(fn)(x)))
        print(f"{name}: ok={ok} {us:.1f} us")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


# 1. stride-2 lane slice
def k_lane_stride(x_ref, o_ref):
    o_ref[:] = x_ref[:][:, 0::2]

run("lane stride-2 (even)", k_lane_stride, (H, W // 2), lambda x: x[:, 0::2])


def k_lane_stride_odd(x_ref, o_ref):
    o_ref[:] = x_ref[:][:, 1::2]

run("lane stride-2 (odd)", k_lane_stride_odd, (H, W // 2), lambda x: x[:, 1::2])


# 2. sublane stride-2
def k_sub_stride(x_ref, o_ref):
    o_ref[:] = x_ref[:][0::2, :]

run("sublane stride-2", k_sub_stride, (H // 2, W), lambda x: x[0::2, :])


# 3. reshape trick for lanes
def k_lane_reshape(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(H, W // 2, 2)[:, :, 0]

run("lane reshape", k_lane_reshape, (H, W // 2),
    lambda x: x.reshape(H, W // 2, 2)[:, :, 0])


# 4. full quarter extraction (both axes)
def k_quarter(x_ref, o_ref):
    o_ref[:] = x_ref[:][0::2, 1::2]

run("quarter (0,1)", k_quarter, (H // 2, W // 2), lambda x: x[0::2, 1::2])


# 5. interleave (inverse): quarters -> full rows
def k_interleave(x_ref, o_ref):
    a = x_ref[:][:, : W // 2]
    b = x_ref[:][:, W // 2:]
    o_ref[:] = jnp.stack([a, b], axis=-1).reshape(H, W)

run("lane interleave", k_interleave, (H, W),
    lambda x: np.stack([x[:, : W // 2], x[:, W // 2:]], axis=-1).reshape(H, W))
