#!/usr/bin/env python3
"""Per-phase / per-kernel roofline accounting of the TV-L1 and HS hot
paths (round-5, VERDICT item 1).  Writes tools/roofline.json.

Decomposes the headline bench config (B=32, 1024x436, reference default
parameters) three ways:

  1. full batched solves (error + fixed modes) — the bench numbers —
     plus the empty-program round trip (the ~26-29 ms dispatch+sync
     floor of this tunneled runtime; every host-visible call pays it);
  2. a `jax.profiler` trace of one bench batch, parsed into per-op
     device time (the authoritative where-does-device-time-go table;
     the raw trace artifact is left under tools/trace_r5/);
  3. dispatch-amortized standalone kernel timings: each kernel chained
     K=32 times inside ONE jit with a data dependency through its own
     output, so the dispatch floor divides by K — naive per-call
     timing on this runtime measures only the floor (per-level phase
     timing in an earlier revision reported ~26-33 ms for levels whose
     true device time is microseconds).

For each kernel the analytic HBM bytes and VPU flops are tabled
(counts documented inline; FMA = 2 flops) against the v5e public peaks
(819 GB/s HBM; VPU f32 ~= 8x128 lanes x 4 ALUs x 2 (FMA) x ~0.94 GHz
~= 7.7e12 flop/s upper bound, ~3.9e12 without FMA pairing).

Round-5 findings this file records (see README "Roofline"):
  * the fused warp+constants kernel was 55% of TV-L1 device time
    (5 calls x 12.6 ms at level 0 of a 140 ms program) while the
    whole-level iterate kernel was ~5% — the warp kernel, not the
    fixed point, was the binding cost;
  * double-buffering the warp kernel's window DMA cut it ~23%
    (14.9 -> 11.5 ms/call at level 0);
  * warp-level early exit (reference's own data: warps 2-5 converge in
    1-2 iterations) removes ~3 of 5 warp kernels per level in error
    mode; together: 190 -> ~375 fields/s.
"""

import collections
import gzip
import json
import math
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from tpuflow.utils.cache import configure_cache  # noqa: E402

configure_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import B, NX, NY, synth_pair  # noqa: E402

HBM_PEAK = 819e9
VPU_PEAK_FMA = 7.7e12
VPU_PEAK = 3.9e12
K = 32  # in-jit chain length for dispatch amortization


def _sync(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    return float(jnp.sum(x))


def timeit(fn, reps=5, warm=1):
    for _ in range(warm):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        _sync(fn())
    return (time.perf_counter() - t0) / reps


def parse_trace(trace_dir):
    """Sum per-op device time from the newest trace.json.gz under
    `trace_dir`.  Returns (device_total_ms, top ops table)."""
    newest = None
    for root, _, fs in os.walk(trace_dir):
        for f in fs:
            if f.endswith("trace.json.gz"):
                p = os.path.join(root, f)
                if newest is None or os.path.getmtime(p) > os.path.getmtime(newest):
                    newest = p
    if newest is None:
        return None
    with gzip.open(newest) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    procs = {e["pid"]: e["args"]["name"] for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.defaultdict(float)
    cnt = collections.Counter()
    jit_total = 0.0
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in procs.get(e.get("pid"), ""):
            continue
        name = e["name"]
        if name.startswith("jit_"):
            jit_total += e.get("dur", 0)
            continue
        # fold ssa suffixes: warp_const_pallas_batched.23 -> ...batched
        base = name.rsplit(".", 1)[0] if name.rsplit(".", 1)[-1].isdigit() \
            else name
        dur[base] += e.get("dur", 0)
        cnt[base] += 1
    top = [{"op": n, "ms": round(t / 1e3, 3), "calls": cnt[n]}
           for n, t in sorted(dur.items(), key=lambda kv: -kv[1])[:14]]
    return {"trace_file": os.path.relpath(newest, _ROOT),
            "device_total_ms": round(jit_total / 1e3, 3),
            "top_ops": top}


def main():
    result = {"config": {"B": B, "ny": NY, "nx": NX},
              "peaks": {"hbm_Bps": HBM_PEAK,
                        "vpu_f32_flops_fma": VPU_PEAK_FMA,
                        "vpu_f32_flops": VPU_PEAK}}
    I0s, I1s = [], []
    for s in range(B):
        a, b = synth_pair(seed=100 + s)
        I0s.append(a)
        I1s.append(b)
    I0 = jnp.asarray(np.stack(I0s), jnp.float32)
    I1 = jnp.asarray(np.stack(I1s), jnp.float32)

    # ---- dispatch floor -------------------------------------------------
    tiny = jnp.zeros((8, 128), jnp.float32)
    f_empty = jax.jit(lambda x: x + 1.0)
    result["empty_roundtrip_ms"] = round(
        timeit(lambda: f_empty(tiny), reps=20) * 1e3, 2)
    print("dispatch floor", result["empty_roundtrip_ms"], "ms", flush=True)

    # ---- full solves ----------------------------------------------------
    from tpuflow.models.batch import hs_pyramidal_batched, tvl1_batched

    t_err = timeit(lambda: tvl1_batched(I0, I1, stop="error"))
    t_faith = timeit(lambda: tvl1_batched(I0, I1, stop="error",
                                          warp_early_exit=False))
    t_fix = timeit(lambda: tvl1_batched(I0, I1, stop="fixed"))
    result["tvl1_full"] = {
        "error_ms": round(t_err * 1e3, 2),
        "error_no_early_exit_ms": round(t_faith * 1e3, 2),
        "fixed_ms": round(t_fix * 1e3, 2),
        "error_fields_per_s": round(B / t_err, 1),
        "error_no_early_exit_fields_per_s": round(B / t_faith, 1),
        "fixed_fields_per_s": round(B / t_fix, 1)}
    print("tvl1 full", result["tvl1_full"], flush=True)

    t_hs = timeit(lambda: hs_pyramidal_batched(I0, I1, stop="error"))
    result["hs_full"] = {"error_ms": round(t_hs * 1e3, 2),
                         "error_fields_per_s": round(B / t_hs, 1)}
    print("hs full", result["hs_full"], flush=True)

    # ---- profiler trace of one bench batch ------------------------------
    trace_dir = os.path.join(_ROOT, "tools", "trace_r5")
    try:
        with jax.profiler.trace(trace_dir):
            _sync(tvl1_batched(I0, I1, stop="error")[0])
        result["trace"] = parse_trace(trace_dir)
        print("trace:", json.dumps(result["trace"])[:400], flush=True)
    except Exception as e:  # tracing may be unsupported on some runtimes
        result["trace"] = {"error": str(e)}

    # ---- dispatch-amortized kernel split --------------------------------
    from tpuflow.models.batch import _normalize_pair_batched
    from tpuflow.models.common import build_pyramid
    from tpuflow.ops import centered_gradient, clamp_nscales
    from tpuflow.ops.tvl1_pallas import pad_hw, tvl1_iterate_error_padded
    from tpuflow.ops.warp_pallas import pick_tile, warp_const_pallas_batched

    nscales = clamp_nscales(NX, NY, 0.5, 100, use_hypot=True)
    levels, _ = build_pyramid(_normalize_pair_batched(I0, I1), nscales, 0.5,
                              normalize=False)
    t_disp = result["empty_roundtrip_ms"] / 1e3

    pyr = jax.jit(lambda a, b: build_pyramid(
        _normalize_pair_batched(a, b), nscales, 0.5, normalize=False)[0][0][0])
    result["pyramid_build_device_ms"] = round(
        (timeit(lambda: pyr(I0, I1)) - t_disp) * 1e3, 2)
    print("pyramid", result["pyramid_build_device_ms"], "ms", flush=True)

    kernels = []
    for s in (0, 1, 2):
        l0, l1 = levels[s]
        cny, cnx = l0.shape[-2:]
        dmax = max(3, math.ceil(8 * 0.5 ** s))
        gx, gy = centered_gradient(l1)
        planes3 = jnp.stack([l1, gx, gy], axis=1)
        zero = jnp.zeros_like(l0)
        state_p = pad_hw(jnp.stack([zero] * 6, axis=1))
        aux_p = pad_hw(l0)
        Hp, Wp = aux_p.shape[-2:]
        tile = pick_tile(Hp, Wp, (32, 512))

        @jax.jit
        def warp_chain(planes, uv0, aux):
            def body(i, uv):
                const_p, _ = warp_const_pallas_batched(
                    planes, uv, aux, dmax, "tvl1", cny, cnx, tile=tile,
                    rbud=2)
                # 1e-30-scaled feedback keeps a data dependency between
                # chain steps (prevents loop-invariant hoisting) without
                # perturbing the operating point
                return uv + 1e-30 * const_p[:, :2]

            return jax.lax.fori_loop(0, K, body, uv0)

        tw_ = (timeit(lambda: warp_chain(planes3, state_p[:, :2], aux_p))
               - t_disp) / K

        def make_chain(cap):
            c = jnp.asarray(cap, jnp.int32)
            th = jnp.asarray(-1.0, jnp.float32)

            @jax.jit
            def chain(sp, cp):
                def body(i, sp):
                    sp, _, _ = tvl1_iterate_error_padded(
                        sp, cp, cny, cnx, th, c, 0.045, 0.3, 0.8333)
                    return sp

                return jax.lax.fori_loop(0, K, body, sp)

            return chain

        const_p, _ = jax.jit(lambda p, uv, ax: warp_const_pallas_batched(
            p, uv, ax, dmax, "tvl1", cny, cnx, tile=tile, rbud=2))(
                planes3, state_p[:, :2], aux_p)
        c4, c24 = make_chain(4), make_chain(24)
        t4 = (timeit(lambda: c4(state_p, const_p)) - t_disp) / K
        t24 = (timeit(lambda: c24(state_p, const_p)) - t_disp) / K
        per_iter = (t24 - t4) / 20
        ovh = t4 - 4 * per_iter

        px = B * Hp * Wp
        # iterate kernel HBM: reads 6 state + 4 const planes, writes 6
        # (whole level resident in VMEM for the chunk); ~40 flop/px/iter
        it_bytes = px * 4 * (6 + 4 + 6)
        it_flops = px * 40
        # warp kernel HBM: window-halo'd 3 planes + 2 flow + 1 aux in,
        # 4 const planes out; compute = (2*rbud+4)^2 one-hot terms x
        # (3-plane FMA + ~8 weight/select ops)
        th_, tw_t = tile
        wh = -(-(th_ + 2 * dmax + 4) // 8) * 8
        ww = -(-(tw_t + 2 * dmax + 4) // 128) * 128
        overlap = (wh * ww) / (th_ * tw_t)
        w_bytes = px * 4 * (3 * overlap + 2 + 1 + 4)
        terms = (2 * 2 + 4) ** 2
        w_flops = px * terms * (3 * 2 + 8)

        kernels.append({
            "scale": s, "ny": cny, "nx": cnx,
            "warp_const_ms_per_call": round(tw_ * 1e3, 3),
            "warp_const_analytic_hbm_MB": round(w_bytes / 1e6, 1),
            "warp_const_hbm_frac": round(w_bytes / tw_ / HBM_PEAK, 3),
            "warp_const_vpu_frac_fma": round(w_flops / tw_ / VPU_PEAK_FMA, 3),
            "iterate_ms_per_iter": round(per_iter * 1e3, 4),
            "iterate_ms_call_overhead": round(ovh * 1e3, 3),
            "iterate_analytic_hbm_MB_per_call": round(it_bytes / 1e6, 1),
            "iterate_vpu_frac_fma": round(it_flops / per_iter / VPU_PEAK_FMA,
                                          3),
            "iterate_vpu_frac": round(it_flops / per_iter / VPU_PEAK, 3),
        })
        print("kernels", kernels[-1], flush=True)
    result["tvl1_kernels"] = kernels

    with open(os.path.join(_ROOT, "tools", "tvl1_calibration.json")) as f:
        result["reference_iter_envelope"] = json.load(f)["sizes"]

    out = os.path.join(_ROOT, "tools", "roofline.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
