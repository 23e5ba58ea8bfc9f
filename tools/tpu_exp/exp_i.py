# Bisect: dynamic-offset DMA + dynamic roll, identity check.
import sys, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")

H, W = 128, 1024
TH, TW = 16, 256

def kern(off_ref, src_ref, out_ref, win, sem):
    i = pl.program_id(0)
    oy = off_ref[i, 0]
    ox = off_ref[i, 1]
    oy_al = pl.multiple_of((oy // 8) * 8, 8)
    ox_al = pl.multiple_of((ox // 128) * 128, 128)
    y_mis = oy - oy_al
    x_mis = ox - ox_al
    dma = pltpu.make_async_copy(
        src_ref.at[pl.ds(oy_al, TH + 8), pl.ds(ox_al, TW + 128)], win, sem)
    dma.start()
    dma.wait()
    r = pltpu.roll(pltpu.roll(win[:], -y_mis, 0), -x_mis, 1)
    out_ref[0] = r[:TH, :TW]

@jax.jit
def run(src, offs):
    n = offs.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, TH, TW), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TH + 8, TW + 128), src.dtype),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, TH, TW), src.dtype),
    )(offs, src)

src = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
offs = jnp.asarray([[0, 0], [5, 37], [23, 700], [96, 131]], jnp.int32)
out = np.asarray(run(src, offs))
srcn = np.asarray(src)
for k, (oy, ox) in enumerate(np.asarray(offs)):
    ref = srcn[oy:oy+TH, ox:ox+TW]
    d = np.abs(out[k] - ref).max()
    print(f"EXP_I off=({oy},{ox}) maxdiff={d}", flush=True)

k = 3  # off (96,131): x_mis=3 only
oy, ox = 96, 131
ref = srcn[oy:oy+TH, ox:ox+TW]
print("row0 out :", out[k][0, :8], out[k][0, 124:132], flush=True)
print("row0 ref :", ref[0, :8], ref[0, 124:132], flush=True)
print("col0 out :", out[k][:8, 0], flush=True)
print("col0 ref :", ref[:8, 0], flush=True)
k = 1  # off (5,37)
oy, ox = 5, 37
ref = srcn[oy:oy+TH, ox:ox+TW]
print("K1 row0 out:", out[k][0, :6], flush=True)
print("K1 row0 ref:", ref[0, :6], flush=True)
print("K1 col0 out:", out[k][:10, 0], flush=True)
print("K1 col0 ref:", ref[:10, 0], flush=True)
