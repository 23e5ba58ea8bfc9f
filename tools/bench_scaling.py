#!/usr/bin/env python3
"""Data-parallel scaling-efficiency harness (BASELINE.md ≥80% target).

Runs the batched TV-L1 step over 1/2/4/8 devices with a fixed
per-device batch and reports weak-scaling efficiency.  On this
container real multi-chip hardware is unavailable, so the default lane
is the standard virtual mesh (8 CPU devices via
--xla_force_host_platform_device_count, SURVEY.md §4.4); on a real pod
slice the same code paths run unchanged after
tpuflow.parallel.distributed.initialize().

Writes tools/scaling_measured.json and prints a markdown table.
"""

import json
import os
import sys

if "--tpu" not in sys.argv:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from bench import synth_pair  # noqa: E402
from tpuflow.models.batch import tvl1_batched  # noqa: E402
from tpuflow.parallel.distributed import dp_efficiency, initialize  # noqa: E402

ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling_measured.json")


def main():
    initialize()  # no-op single-process; pod-slice entry point
    on_tpu = jax.default_backend() == "tpu"
    # virtual CPU devices: small shape + fixed schedule keep the harness
    # fast; the DP communication pattern (scatter/gather only) is
    # identical to the full-size TPU run
    ny, nx = (436, 1024) if on_tpu else (64, 128)
    per_dev = 8 if on_tpu else 2

    def make_batch(B):
        pairs = [synth_pair(ny=ny, nx=nx, seed=100 + s) for s in range(B)]
        return (np.stack([p[0] for p in pairs]).astype(np.float32),
                np.stack([p[1] for p in pairs]).astype(np.float32))

    def step(I0, I1):
        return tvl1_batched(I0, I1, stop="fixed", nscales=3)

    results = dp_efficiency(step, make_batch, per_dev)
    artifact = {
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
        "shape": f"{nx}x{ny}",
        "per_device_batch": per_dev,
        "weak_scaling": results,
    }
    with open(ARTIFACT, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")

    print(f"backend={jax.default_backend()} shape={nx}x{ny} "
          f"per-device batch={per_dev}")
    print("| devices | fields/s | efficiency |")
    print("|---|---|---|")
    for n, r in results.items():
        print(f"| {n} | {r['fields_per_sec']} | {r['efficiency']:.1%} |")


if __name__ == "__main__":
    main()
