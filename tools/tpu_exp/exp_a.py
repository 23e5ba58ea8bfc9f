# Variant A: current kernel but with the err output REMOVED entirely.
import time, sys, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")

def kern(state_ref, const_ref, out_ref, swin, cwin, sems, *, n_iters, th, tw, ny, nx, halo):
    b = pl.program_id(0); i = pl.program_id(1); j = pl.program_id(2)
    dtype = out_ref.dtype
    wh, ww = swin.shape[1], swin.shape[2]
    dma_s = pltpu.make_async_copy(state_ref.at[b, :, pl.ds(i*th, wh), pl.ds(j*tw, ww)], swin, sems.at[0])
    dma_c = pltpu.make_async_copy(const_ref.at[b, :, pl.ds(i*th, wh), pl.ds(j*tw, ww)], cwin, sems.at[1])
    dma_s.start(); dma_c.start(); dma_s.wait(); dma_c.wait()
    u1 = swin[0]
    for it in range(n_iters):
        u1 = u1 + cwin[0] * 0.01
    sl = (slice(halo, halo+th), slice(halo, halo+tw))
    for k in range(6):
        out_ref[0, k] = (swin[k] + u1)[sl]

def run(B=2, H=64, W=256, n_iters=3):
    state = jnp.ones((B, 6, H, W), jnp.float32)
    const = jnp.ones((B, 4, H, W), jnp.float32)
    th, tw = 64, 256
    th = min(th, max(8, H)); tw = min(tw, max(128, W))
    gy = -(-H // th); gx = -(-W // tw)
    hyp, wxp = gy*th, gx*tw
    halo = n_iters
    ru = lambda x, m: -(-x//m)*m
    wh = ru(th + 2*halo, 8); ww = ru(tw + 2*halo, 128)
    padw = lambda a: jnp.pad(a, ((0,0),(0,0),(halo,(hyp+wh-th)-(H+halo)),(halo,(wxp+ww-tw)-(W+halo))))
    k = functools.partial(kern, n_iters=n_iters, th=th, tw=tw, ny=H, nx=W, halo=halo)
    out = pl.pallas_call(k, grid=(B, gy, gx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM), pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1,6,th,tw), lambda b,i,j:(b,0,i,j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B,6,hyp,wxp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((6,wh,ww), jnp.float32), pltpu.VMEM((4,wh,ww), jnp.float32), pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(padw(state), padw(const))
    return out

out = run()
out.block_until_ready()
print("EXP_A OK", out.shape, float(out[0,0,5,5]), flush=True)
