# Micro-test: dynamic-shift pltpu.roll on TPU.
import sys, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")

def kern(s_ref, x_ref, o_ref):
    sy = s_ref[0]
    sx = s_ref[1]
    r = pltpu.roll(x_ref[:], -sy, 0)
    o_ref[:] = pltpu.roll(r, -sx, 1)

@jax.jit
def run(x, s):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(s, x)

x = jnp.arange(32*256, dtype=jnp.float32).reshape(32, 256)
s = jnp.asarray([5, 37], jnp.int32)
out = run(x, s)
ref = jnp.roll(jnp.roll(x, -5, 0), -37, 1)
print("EXP_G dynamic roll maxdiff:", float(jnp.max(jnp.abs(out - ref))), flush=True)
