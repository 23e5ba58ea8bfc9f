"""Round-5 probe: where does brox_spatial's 0.5 s/pair go?"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from tpuflow.utils.cache import configure_cache

configure_cache()

import jax
import jax.numpy as jnp

from bench import synth_pair
from tools.roofline import parse_trace


def main():
    import json

    from tpuflow.models.brox_spatial import brox_spatial

    I0h, I1h = synth_pair()
    I0 = jnp.asarray(I0h)
    I1 = jnp.asarray(I1h)
    u, v = brox_spatial(I0, I1)
    float(jnp.sum(u))
    d = "/tmp/brox_trace"
    with jax.profiler.trace(d):
        u, v = brox_spatial(I0, I1)
        float(jnp.sum(u))
    print(json.dumps(parse_trace(d), indent=1), flush=True)


if __name__ == "__main__":
    main()
