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


def measure_sharding_overhead(step, make_batch, total_batch):
    """Pure DP-sharding overhead on the virtual mesh: the same total
    batch timed unsharded (1 device) vs sharded over all 8 virtual
    devices.  Total COMPUTE is identical and runs on the same physical
    cores either way, so the ratio isolates the partitioning/dispatch/
    collective cost of the DP path — the quantity that determines real
    multi-chip efficiency.  (Weak-scaling walltime on a virtual mesh is
    bounded by the container's physical cores instead, so it measures
    oversubscription, not the DP code path.)"""
    import time

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tpuflow.parallel.distributed import _sync, dp_shard

    I0, I1 = make_batch(total_batch)
    devices = jax.devices()

    mesh1 = Mesh(np.asarray(devices[:1]), ("batch",))
    I0a, I1a = dp_shard((jnp.asarray(I0), jnp.asarray(I1)), mesh1)
    meshN = Mesh(np.asarray(devices), ("batch",))
    I0b, I1b = dp_shard((jnp.asarray(I0), jnp.asarray(I1)), meshN)

    def timeit(a, b, n=3):
        _sync(step(a, b))
        t0 = time.perf_counter()
        for _ in range(n):
            _sync(step(a, b))
        return (time.perf_counter() - t0) / n

    t1 = timeit(I0a, I1a)
    tN = timeit(I0b, I1b)
    return {"unsharded_s": round(t1, 4), "sharded_s": round(tN, 4),
            "overhead": round(tN / t1 - 1.0, 4),
            "devices": len(devices)}


def batch_sweep_tpu(make_batch, Bs=(1, 2, 4, 8, 16, 32, 64, 128)):
    """Single-chip scaling signal: per-device throughput vs batch size.
    Real multi-chip DP is pure batch parallelism (independent samples,
    zero cross-device traffic on the hot path), so per-chip throughput
    FLATNESS over B is the one scaling property measurable on one chip:
    a chip at B=16 doing >= ~B/16 x the B=1 rate shows the batch axis
    scales; N chips then multiply it (the dryrun validates the sharded
    program compiles+runs)."""
    import time

    from tpuflow.utils.cache import configure_cache
    configure_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    out = {}
    for B in Bs:
        I0, I1 = make_batch(B)
        I0 = jnp.asarray(I0)
        I1 = jnp.asarray(I1)

        def run():
            u, v = tvl1_batched(I0, I1, stop="error")
            return float(jnp.sum(u))

        run()
        n = 3 if B >= 16 else 5
        t0 = time.perf_counter()
        for _ in range(n):
            run()
        dt = (time.perf_counter() - t0) / n
        out[B] = {"fields_per_sec": round(B / dt, 2),
                  "ms_per_field": round(dt / B * 1e3, 2)}
        print(f"B={B}: {out[B]['fields_per_sec']} fields/s "
              f"({out[B]['ms_per_field']} ms/field)", flush=True)
    base = out[max(out)]["fields_per_sec"]
    for B, r in out.items():
        r["throughput_vs_best"] = round(r["fields_per_sec"] / base, 3)
    return out


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

    physical_cores = os.cpu_count()
    if on_tpu:
        # one real chip: the measurable scaling signal is the
        # batch-size throughput curve (see batch_sweep_tpu); the
        # multi-device program itself is validated by dryrun_multichip
        sweep = batch_sweep_tpu(make_batch)
        artifact = {
            "backend": "tpu",
            "devices": len(jax.devices()),
            "device": str(jax.devices()[0]),
            "shape": f"{nx}x{ny}",
            "mode": "error (reference operating point)",
            "batch_sweep": sweep,
        }
        with open(ARTIFACT.replace(".json", "_tpu.json"), "w") as f:
            json.dump(artifact, f, indent=1)
            f.write("\n")
        print("| B | fields/s | ms/field |")
        print("|---|---|---|")
        for B, r in sweep.items():
            print(f"| {B} | {r['fields_per_sec']} | {r['ms_per_field']} |")
        return

    results = dp_efficiency(step, make_batch, per_dev)
    artifact = {
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
        "physical_cores": physical_cores,
        "shape": f"{nx}x{ny}",
        "per_device_batch": per_dev,
        "weak_scaling": results,
    }
    if not on_tpu:
        artifact["note"] = (
            "virtual 8-device CPU mesh on a "
            f"{physical_cores}-core container: weak-scaling walltime is "
            "compute-bound by the physical cores, so `weak_scaling` "
            "beyond that count measures oversubscription, not the DP "
            "path; `sharding_overhead` isolates the DP partitioning/"
            "dispatch cost at constant total compute")
        artifact["sharding_overhead"] = measure_sharding_overhead(
            step, make_batch, 16)
    with open(ARTIFACT, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")

    print(f"backend={jax.default_backend()} shape={nx}x{ny} "
          f"per-device batch={per_dev}")
    print("| devices | fields/s | efficiency |")
    print("|---|---|---|")
    for n, r in results.items():
        print(f"| {n} | {r['fields_per_sec']} | {r['efficiency']:.1%} |")
    if not on_tpu:
        so = artifact["sharding_overhead"]
        print(f"sharding overhead at constant compute "
              f"({so['devices']} virtual devices): {so['overhead']:.1%}")


if __name__ == "__main__":
    main()
