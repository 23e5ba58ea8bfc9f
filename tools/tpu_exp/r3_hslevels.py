# Per-level timing of the HS batched solver + small-level path compare:
# where do the 22 ms/sample go?
import sys, time, math
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
sys.path.insert(0, "/root/repo")

from bench import synth_pair
from tpuflow.models.batch import hs_scale_batched, _normalize_pair_batched
from tpuflow.models.common import build_pyramid, upsample_flow

B = 16
pairs = [synth_pair(seed=100 + s) for s in range(B)]
I0 = jnp.asarray(np.stack([p[0] for p in pairs]), jnp.float32)
I1 = jnp.asarray(np.stack([p[1] for p in pairs]), jnp.float32)


def _sync(r):
    return float(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[0]))


def timeit(f, n=5):
    _sync(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    _sync(r)
    return (time.perf_counter() - t0) / n


levels, sizes = build_pyramid((I0, I1), 7, 0.5)

import functools


@functools.partial(jax.jit, static_argnames=("dmax", "stop"))
def solve_level(l1, l2, u, v, dmax, stop):
    return hs_scale_batched(l1, l2, u, v, dmax=dmax, stop=stop)


uu = jnp.zeros_like(levels[6][0])
vv = jnp.zeros_like(levels[6][0])
total = 0.0
for s in range(6, -1, -1):
    l1, l2 = levels[s]
    ly, lx = l1.shape[-2:]
    if s < 6:
        uu, vv = upsample_flow(uu, vv, sizes[s], 0.5)
    dmax = max(3, math.ceil(8 * (0.5 ** s)))
    t = timeit(lambda: solve_level(l1, l2, uu, vv, dmax, "error"))
    total += t
    print(f"level {s} {ly}x{lx} dmax={dmax}: {t*1e3:.2f} ms/batch "
          f"({t*1e6/B:.0f} us/sample)", flush=True)
    uu, vv = solve_level(l1, l2, uu, vv, dmax, "error")
print(f"total: {total*1e3:.1f} ms/batch = {total*1e6/B:.0f} us/sample",
      flush=True)
