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
    """Three TEMPORALLY CONSISTENT frames (I_-1, I0, I1) under a smooth
    analytic flow: I0 is a band-limited random image, I_-1/I1 are its
    backward/forward bilinear warps — the occflow problem is then
    well-posed (same construction as bench.synth_pair, both signs)."""
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal((ny, nx))
    fy = np.fft.fftfreq(ny)[:, None]
    fx = np.fft.fftfreq(nx)[None, :]
    base = np.real(np.fft.ifft2(np.fft.fft2(noise)
                                * np.exp(-(fx**2 + fy**2) * 800.0)))
    base = 128 + 100 * base / np.abs(base).max()
    u = 2.0 * np.sin(np.linspace(0, 3, nx))[None, :] * np.ones((ny, 1))
    v = 1.5 * np.cos(np.linspace(0, 2, ny))[:, None] * np.ones((1, nx))
    yy, xx = np.mgrid[0:ny, 0:nx].astype(np.float64)

    def warp(sign):
        sx = np.clip(xx + sign * u, 0, nx - 1)
        sy = np.clip(yy + sign * v, 0, ny - 1)
        x0 = np.clip(np.floor(sx).astype(int), 0, nx - 2)
        y0 = np.clip(np.floor(sy).astype(int), 0, ny - 2)
        fx_ = sx - x0
        fy_ = sy - y0
        return (base[y0, x0] * (1 - fx_) * (1 - fy_)
                + base[y0, x0 + 1] * fx_ * (1 - fy_)
                + base[y0 + 1, x0] * (1 - fx_) * fy_
                + base[y0 + 1, x0 + 1] * fx_ * fy_)

    return (warp(-1).astype(np.float32), base.astype(np.float32),
            warp(+1).astype(np.float32))


def main():
    import jax
    import jax.numpy as jnp

    from tpuflow.utils.cache import configure_cache

    configure_cache()

    from tpuflow.models.robust_expo import robust_expo
    from tpuflow.models.tvl1occflow import tvl1occflow
    from tpuflow.utils.warmup import warmup

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

        # r5 (VERDICT item 4): parallel per-level AOT warm-up of both
        # spatial configs; "first call" below then measures the warmed
        # cold-process experience (executable loads, not compiles)
        t_warm = warmup(geometries=[(1, ny, nx)],
                        methods=("occflow", "robust_expo"), timeout=900)

        def reps(fn, n=3):
            """min + raw list over n steady reps (1-rep numbers on the
            tunneled runtime hide multi-second load gaps; r4's single
            rep made round-over-round comparison noise-limited)."""
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            return min(ts), [round(t, 2) for t in ts]

        t0 = time.perf_counter()
        u, v, chi = tvl1occflow(Im1, I0, I1, warp_mode="fast")
        s = float(jnp.sum(u))  # completion barrier
        t_first = time.perf_counter() - t0
        t_occ, occ_reps = reps(lambda: float(jnp.sum(
            tvl1occflow(Im1, I0, I1, warp_mode="fast")[0])))
        occ_frac = float(jnp.mean(chi))
        assert bool(jnp.isfinite(u).all() & jnp.isfinite(v).all())

        t0 = time.perf_counter()
        ru, rv = robust_expo(I0, I1, warp_mode="fast")
        float(jnp.sum(ru))
        t_first_re = time.perf_counter() - t0
        t_re, re_reps = reps(lambda: float(jnp.sum(
            robust_expo(I0, I1, warp_mode="fast")[0])))
        assert bool(jnp.isfinite(ru).all() & jnp.isfinite(rv).all())

        # r5 (VERDICT item 8): at-size degradation statistics for the
        # two-window fast warp — per-scale counts of warp tiles whose
        # displacement spread exceeded the kernel's coverage (their
        # uncovered pixels contributed 0 for that warp).  robust_expo's
        # fast path runs the Pallas two-window kernel; tvl1occflow's
        # border_out=False fast path is the XLA shift warp, which is
        # exact within the displacement bound (no such class).
        _, _, diags = robust_expo(I0, I1, warp_mode="fast", with_diag=True)
        n_tiles_l0 = (-(-ny // 8) * 8 // 32) * (-(-nx // 128) * 128 // 512)
        oflow = {f"scale{s_}": int(d["warp_overflow_tiles"])
                 for s_, d in enumerate(diags) if d is not None}

        cfg = {"size": f"{nx}x{ny}",
               "warmup_s": round(t_warm, 1),
               "tvl1occflow_s": round(t_occ, 2),
               "tvl1occflow_rep_s": occ_reps,
               "tvl1occflow_first_call_s": round(t_first, 1),
               "tvl1occflow_occlusion_frac": round(occ_frac, 4),
               "robust_expo_s": round(t_re, 2),
               "robust_expo_rep_s": re_reps,
               "robust_expo_first_call_s": round(t_first_re, 1),
               "robust_expo_warp_overflow_tiles_per_scale": oflow,
               "warp_tiles_level0_per_call": n_tiles_l0}
        results["configs"].append(cfg)
        print(json.dumps(cfg), flush=True)

    if "--skip-oracle" in sys.argv:
        # keep a previously measured oracle row (the f64 oracle takes
        # ~20 min on 2 vCPUs; perf-only reruns shouldn't drop it)
        try:
            with open(OUT) as f:
                prev = json.load(f).get("oracle_check")
            if prev:
                results["oracle_check"] = dict(prev, carried_forward=True)
        except (OSError, ValueError):
            pass
    if "--skip-oracle" not in sys.argv:
        # accuracy: same TPU f32 fast-warp path vs a CPU f64 exact-warp
        # oracle at reduced size (the full-size f64 oracle would take
        # hours on 2 vCPUs); the oracle runs in a subprocess so x64 can
        # be enabled cleanly
        import subprocess
        import tempfile

        ny, nx = 270, 480
        Im1, I0, I1 = synth_pair3(ny, nx)
        u, v, chi = tvl1occflow(*(jnp.asarray(a, jnp.float32)
                                  for a in (Im1, I0, I1)),
                                warp_mode="fast")
        with tempfile.TemporaryDirectory() as tmp:
            fin = os.path.join(tmp, "in.npz")
            fout = os.path.join(tmp, "out.npz")
            np.savez(fin, Im1=Im1, I0=I0, I1=I1)
            ru, rv = robust_expo(jnp.asarray(I0, jnp.float32),
                                 jnp.asarray(I1, jnp.float32),
                                 warp_mode="fast")
            code = (
                "import jax, numpy as np;"
                "jax.config.update('jax_platforms','cpu');"
                "jax.config.update('jax_enable_x64',True);"
                "import jax.numpy as jnp, sys;"
                f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r});"
                "from tpuflow.models.tvl1occflow import tvl1occflow;"
                "from tpuflow.models.robust_expo import robust_expo;"
                f"d=np.load({fin!r});"
                "u,v,chi=tvl1occflow(*(jnp.asarray(d[k],jnp.float64)"
                " for k in ('Im1','I0','I1')), warp_mode='exact');"
                "ru,rv=robust_expo(jnp.asarray(d['I0'],jnp.float64),"
                " jnp.asarray(d['I1'],jnp.float64), warp_mode='exact');"
                f"np.savez({fout!r}, u=np.asarray(u), v=np.asarray(v),"
                " ru=np.asarray(ru), rv=np.asarray(rv))")
            subprocess.run([sys.executable, "-c", code], check=True,
                           timeout=3000)
            d = np.load(fout)
            uo, vo, ruo, rvo = d["u"], d["v"], d["ru"], d["rv"]
        epe = float(np.hypot(np.asarray(u, np.float64) - uo,
                             np.asarray(v, np.float64) - vo).mean())
        epe_re = float(np.hypot(np.asarray(ru, np.float64) - ruo,
                                np.asarray(rv, np.float64) - rvo).mean())
        results["oracle_check"] = {
            "size": f"{nx}x{ny}",
            "epe_f32_tpu_vs_f64_cpu": round(epe, 5),
            "robust_expo_epe_f32_tpu_vs_f64_cpu": round(epe_re, 5)}
        print(json.dumps(results["oracle_check"]), flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
