# Variant B: VMEM capacity probe.
import sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")

mb = int(sys.argv[1])
n = mb * 1024 * 1024 // 4 // 512  # rows of 512 f32 lanes
def kern(x_ref, o_ref, scratch):
    scratch[:] = jnp.zeros_like(scratch)
    o_ref[:] = x_ref[:] + scratch[0:8, 0:128]
x = jnp.ones((8,128), jnp.float32)
out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)], out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((n,512), jnp.float32)],
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=134217728),
)(x)
out.block_until_ready()
print(f"EXP_B OK {mb} MB scratch", flush=True)
