#!/usr/bin/env python3
"""Chip-measured steady-state performance for ALL SEVEN methods at the
bench geometry (1024x436), r5 VERDICT item 2.

Covers the two methods the headline bench already tracks (TV-L1,
pyramidal HS — batched engines) plus the five that previously had
partial or no chip numbers: horn_schunck_classic, brox_spatial,
brox_temporal (>= 8 frame pairs), tvl1occflow (now defaulting to the
fast warp on TPU, VERDICT item 3), robust_expo_methods.  Reference CLI
default parameters throughout.  Writes tools/bench_all7.json.

Timing: first call compiles (recorded as *_first_call_s where cheap to
keep), then mean of `REPS` steady-state calls with a scalar fetch as
the completion barrier (block_until_ready is unreliable through the
tunneled runtime).
"""

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from tpuflow.utils.cache import configure_cache  # noqa: E402

configure_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import NX, NY, synth_pair  # noqa: E402

REPS = 3


def _sync(*xs):
    return float(jnp.sum(xs[0]))


def steady(fn, reps=REPS):
    t0 = time.perf_counter()
    _sync(*fn())
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        _sync(*fn())
    return (time.perf_counter() - t0) / reps, first


def main():
    out = {"geometry": {"ny": NY, "nx": NX},
           "note": "steady-state seconds on one TPU v5e chip, reference "
                   "CLI default parameters; *_fields_per_s for the "
                   "batched throughput engines"}

    I0h, I1h = synth_pair(seed=100)
    I0 = jnp.asarray(I0h)
    I1 = jnp.asarray(I1h)

    # 1/2: batched engines (north stars; B=32 as in bench.py)
    from bench import B

    from tpuflow.models.batch import hs_pyramidal_batched, tvl1_batched

    I0b = jnp.asarray(np.stack([synth_pair(seed=100 + s)[0]
                                for s in range(B)]))
    I1b = jnp.asarray(np.stack([synth_pair(seed=100 + s)[1]
                                for s in range(B)]))
    t, _ = steady(lambda: tvl1_batched(I0b, I1b, stop="error"))
    out["tvl1flow"] = {"batch": B, "s_per_batch": t, "fields_per_s": B / t}
    print("tvl1", out["tvl1flow"], flush=True)
    t, _ = steady(lambda: hs_pyramidal_batched(I0b, I1b, stop="error"))
    out["horn_schunck_pyramidal"] = {"batch": B, "s_per_batch": t,
                                     "fields_per_s": B / t}
    print("hs_pyr", out["horn_schunck_pyramidal"], flush=True)

    # 3: classic HS (no pyramid; IPOL-typical niter=100 alpha=7),
    # batched through the fused whole-image-in-VMEM kernel (r5)
    from tpuflow.models.hs_classic import hs_classic_batched

    t, first = steady(lambda: hs_classic_batched(I0b, I1b, 100, 7.0))
    out["horn_schunck_classic"] = {
        "batch": B, "niter": 100, "alpha": 7.0, "s_per_batch": t,
        "fields_per_s": B / t, "first_call_s": first}
    print("hs_classic", out["horn_schunck_classic"], flush=True)

    # 4: Brox spatial, default params (alpha=50 gamma=10 nscales=10
    # zfactor=0.5 TOL=1e-4 inner=1 outer=15), warp auto->fast on TPU
    from tpuflow.models.brox_spatial import brox_spatial

    t, first = steady(lambda: brox_spatial(I0, I1))
    out["brox_spatial"] = {"s_per_pair": t, "first_call_s": first,
                           "warp_mode": "auto(fast)"}
    print("brox_spatial", out["brox_spatial"], flush=True)

    # 5: Brox temporal, 9 frames = 8 frame pairs (alpha=18 gamma=7
    # zfactor=0.75), fast warp on the frame axis (r5)
    from tpuflow.models.brox_temporal import brox_temporal

    T = 9
    rng = np.random.default_rng(3)
    drift_u = 2.0 * np.sin(np.linspace(0, 3, NX))[None, :]
    drift_v = 1.5 * np.cos(np.linspace(0, 2, NY))[:, None]
    yy, xx = np.mgrid[0:NY, 0:NX].astype(np.float64)
    frames = [I0h.astype(np.float64)]
    for _ in range(T - 1):
        sx = np.clip(xx + drift_u, 0, NX - 1)
        sy = np.clip(yy + drift_v, 0, NY - 1)
        x0 = np.clip(np.floor(sx).astype(int), 0, NX - 2)
        y0 = np.clip(np.floor(sy).astype(int), 0, NY - 2)
        fx, fy = sx - x0, sy - y0
        prev = frames[-1]
        frames.append(prev[y0, x0] * (1 - fx) * (1 - fy)
                      + prev[y0, x0 + 1] * fx * (1 - fy)
                      + prev[y0 + 1, x0] * (1 - fx) * fy
                      + prev[y0 + 1, x0 + 1] * fx * fy)
    vol = jnp.asarray(np.stack(frames), jnp.float32)
    t, first = steady(lambda: brox_temporal(vol))
    out["brox_temporal"] = {
        "frames": T, "s_per_volume": t, "s_per_frame_pair": t / (T - 1),
        "first_call_s": first, "warp_mode": "auto(fast)"}
    print("brox_temporal", out["brox_temporal"], flush=True)

    # 6: tvl1occflow triplet — CLI-default params, warp auto->fast on
    # TPU (the r5 default; previously only the bench forced fast)
    from tpuflow.models.tvl1occflow import tvl1occflow

    Im1 = jnp.asarray(np.roll(I0h, 1, axis=1))
    t, first = steady(lambda: tvl1occflow(Im1, I0, I1)[:2])
    out["tvl1occflow"] = {"s_per_triplet": t, "first_call_s": first,
                          "warp_mode": "auto(fast)"}
    print("tvl1occflow", out["tvl1occflow"], flush=True)

    # 7: robust_expo (method_type=1 DF), warp auto->fast
    from tpuflow.models.robust_expo import robust_expo

    t, first = steady(lambda: robust_expo(I0, I1))
    out["robust_expo_methods"] = {"s_per_pair": t, "first_call_s": first,
                                  "warp_mode": "auto(fast)"}
    print("robust_expo", out["robust_expo_methods"], flush=True)

    with open(os.path.join(_ROOT, "tools", "bench_all7.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote tools/bench_all7.json", flush=True)


if __name__ == "__main__":
    main()
