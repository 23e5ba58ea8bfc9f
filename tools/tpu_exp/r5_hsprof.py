"""Round-5 probe: where does HS-pyramidal's device time go?
Captures a profiler trace of one bench batch and prints the parsed
per-op table (reuses tools/roofline.py's parser)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from tpuflow.utils.cache import configure_cache

configure_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import B, synth_pair
from tools.roofline import parse_trace


def main():
    from tpuflow.models.batch import hs_pyramidal_batched

    I0 = jnp.asarray(np.stack([synth_pair(seed=100 + s)[0]
                               for s in range(B)]))
    I1 = jnp.asarray(np.stack([synth_pair(seed=100 + s)[1]
                               for s in range(B)]))
    u, v = hs_pyramidal_batched(I0, I1, stop="error")
    float(jnp.sum(u))
    d = "/tmp/hs_trace"
    with jax.profiler.trace(d):
        u, v = hs_pyramidal_batched(I0, I1, stop="error")
        float(jnp.sum(u))
    import json
    print(json.dumps(parse_trace(d), indent=1), flush=True)


if __name__ == "__main__":
    main()
