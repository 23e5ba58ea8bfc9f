"""r4: does rbud=3 (vs 2) recover tvl1occflow's 1080p convergence
speed under the fast-only warp?  (Zero-degraded pixels outside the
relative windows weaken the data term and can cost outer
alternations.)"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import tpuflow.ops.interp as interp
from tpuflow.ops.warp_pallas import warp_planes_pallas

RBUD = int(sys.argv[1]) if len(sys.argv) > 1 else 3

_shift = interp.warp_planes_shift


def patched(planes, u, v, dmax, interpret=None, border_out=True):
    if border_out and planes.shape[-2] * planes.shape[-1] >= 96 * 96:
        return warp_planes_pallas(planes, u, v, dmax, tile=(32, 512),
                                  interpret=interpret, rbud=RBUD,
                                  fast_only=True)
    return _shift(planes, u, v, dmax, border_out=border_out)


interp.warp_planes_bounded = patched

from tools.bench_4k import synth_pair3
from tpuflow.models.tvl1occflow import tvl1occflow

for (ny, nx) in [(2160, 3840)]:
    Im1, I0, I1 = (jnp.asarray(a) for a in synth_pair3(ny, nx))
    t0 = time.time()
    u, v, chi = tvl1occflow(Im1, I0, I1, warp_mode="fast")
    float(jnp.sum(u))
    first = time.time() - t0
    t0 = time.time()
    u, v, chi = tvl1occflow(Im1, I0, I1, warp_mode="fast")
    float(jnp.sum(u))
    print(f"rbud={RBUD} {nx}x{ny}: steady {time.time()-t0:.2f} s "
          f"(first {first:.0f} s)", flush=True)
