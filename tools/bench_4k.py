#!/usr/bin/env python3
"""BASELINE config 5 at real size: tvl1occflow + robust_expo at
1920x1080 and 3840x2160 on the chip (single 1-device mesh), plus an
accuracy cross-check of the same TPU f32 path vs the CPU f64 oracle at
a reduced size.  Writes tools/bench_4k.json.

Reference solvers: src/tvl1occflow.cpp:143-328,
src/robust_expo_methods.cpp:161-455.

Usage: python tools/bench_4k.py [--sizes 1080 2160] [--skip-oracle]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_4k.json")


def synth_pair3(ny, nx, seed=7):
    """Three consecutive frames under a smooth flow (for occflow) —
    same construction as bench.synth_pair, with the middle frame warped
    both ways."""
    from bench import synth_pair

    I0, I1 = synth_pair(ny, nx, seed)
    # third frame: warp I1 by the same (implicit) flow once more — for
    # benchmarking purposes frame realism only matters for convergence
    # behavior, not accuracy vs reference (which is measured elsewhere)
    _, I2 = synth_pair(ny, nx, seed + 1)
    return I0, I1, I2


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tpuflow.models.robust_expo import robust_expo
    from tpuflow.models.tvl1occflow import tvl1occflow

    sizes = [(1080, 1920), (2160, 3840)]
    if "--sizes" in sys.argv:
        i = sys.argv.index("--sizes")
        picked = [int(s) for s in sys.argv[i + 1:] if s.isdigit()]
        sizes = [(h, {1080: 1920, 2160: 3840}.get(h, 2 * h)) for h in picked]

    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0]), "configs": []}

    for ny, nx in sizes:
        Im1, I0, I1 = synth_pair3(ny, nx)
        Im1, I0, I1 = (jnp.asarray(a, jnp.float32) for a in (Im1, I0, I1))

        t0 = time.perf_counter()
        u, v, chi = tvl1occflow(Im1, I0, I1, warp_mode="fast")
        s = float(jnp.sum(u))  # completion barrier
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        u, v, chi = tvl1occflow(Im1, I0, I1, warp_mode="fast")
        float(jnp.sum(u))
        t_occ = time.perf_counter() - t0
        occ_frac = float(jnp.mean(chi))
        assert bool(jnp.isfinite(u).all() & jnp.isfinite(v).all())

        t0 = time.perf_counter()
        ru, rv = robust_expo(I0, I1, warp_mode="fast")
        float(jnp.sum(ru))
        t_first_re = time.perf_counter() - t0
        t0 = time.perf_counter()
        ru, rv = robust_expo(I0, I1, warp_mode="fast")
        float(jnp.sum(ru))
        t_re = time.perf_counter() - t0
        assert bool(jnp.isfinite(ru).all() & jnp.isfinite(rv).all())

        cfg = {"size": f"{nx}x{ny}",
               "tvl1occflow_s": round(t_occ, 2),
               "tvl1occflow_first_call_s": round(t_first, 1),
               "tvl1occflow_occlusion_frac": round(occ_frac, 4),
               "robust_expo_s": round(t_re, 2),
               "robust_expo_first_call_s": round(t_first_re, 1)}
        results["configs"].append(cfg)
        print(json.dumps(cfg), flush=True)

    if "--skip-oracle" not in sys.argv:
        # accuracy: same TPU f32 path vs CPU f64 oracle at reduced size
        # (the full-size CPU f64 oracle would take hours on 2 vCPUs)
        ny, nx = 270, 480
        Im1, I0, I1 = synth_pair3(ny, nx)
        u, v, chi = tvl1occflow(*(jnp.asarray(a, jnp.float32)
                                  for a in (Im1, I0, I1)),
                                warp_mode="fast")
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            uo, vo, chio = tvl1occflow(*(jnp.asarray(a, jnp.float64)
                                         for a in (Im1, I0, I1)),
                                       warp_mode="exact")
        epe = float(np.hypot(np.asarray(u, np.float64) - np.asarray(uo),
                             np.asarray(v, np.float64) - np.asarray(vo)).mean())
        results["oracle_check"] = {"size": f"{nx}x{ny}",
                                   "epe_f32_tpu_vs_f64_cpu": round(epe, 5)}
        print(json.dumps(results["oracle_check"]), flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
