# Characterize dynamic pltpu.roll: negative vs positive shifts, shapes.
import sys, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")

def make(shape, mode):
    H, W = shape
    def kern(s_ref, x_ref, o_ref):
        sy = s_ref[0]
        sx = s_ref[1]
        if mode == "neg":
            r = pltpu.roll(x_ref[:], -sy, 0)
            o_ref[:] = pltpu.roll(r, -sx, 1)
        else:
            r = pltpu.roll(x_ref[:], H - sy, 0)
            o_ref[:] = pltpu.roll(r, W - sx, 1)
    @jax.jit
    def run(x, s):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(s, x)
    return run

for shape in ((32, 256), (24, 384), (16, 384), (24, 256), (48, 640)):
    H, W = shape
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    for sy, sx in ((5, 37), (0, 3), (7, 127)):
        ref = jnp.roll(jnp.roll(x, -sy, 0), -sx, 1)
        for mode in ("neg", "pos"):
            out = make(shape, mode)(x, jnp.asarray([sy, sx], jnp.int32))
            d = float(jnp.max(jnp.abs(out - ref)))
            print(f"EXP_J shape={shape} s=({sy},{sx}) {mode}: maxdiff={d}", flush=True)
