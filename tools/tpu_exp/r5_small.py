"""Round-5 probe: crossover of the fused Pallas path vs the XLA
shift/while path on SMALL pyramid levels.  The r5 trace shows ~17 ms
of tiny XLA fusions (3k+ micro-ops) on levels 3-6 of a 57 ms TV-L1
program.  Runs bench's TV-L1 at several TPUFLOW_PALLAS_MIN_PIXELS
thresholds (subprocess each — the threshold is read at import)."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, "..", ".."))

BODY = r"""
import sys, time
sys.path.insert(0, {root!r})
from tpuflow.utils.cache import configure_cache
configure_cache()
import jax.numpy as jnp
import numpy as np
from bench import B, synth_pair
from tpuflow.models.batch import tvl1_batched, pallas_min_pixels

I0 = jnp.asarray(np.stack([synth_pair(seed=100+s)[0] for s in range(B)]))
I1 = jnp.asarray(np.stack([synth_pair(seed=100+s)[1] for s in range(B)]))

def run():
    u, v = tvl1_batched(I0, I1, stop="error")
    return float(jnp.sum(u))

run()
times = []
for _ in range(5):
    t0 = time.perf_counter(); run(); times.append(time.perf_counter()-t0)
m = sum(times)/len(times)
print(f"threshold={{pallas_min_pixels()}}: {{m*1e3:.1f}} ms -> "
      f"{{B/m:.1f}} fields/s  reps={{[round(t*1e3,1) for t in times]}}",
      flush=True)
""".format(root=ROOT)

for thresh in (96 * 96, 40 * 96, 24 * 56, 8 * 16):
    env = dict(os.environ, TPUFLOW_PALLAS_MIN_PIXELS=str(thresh))
    subprocess.run([sys.executable, "-c", BODY], env=env, check=False)
