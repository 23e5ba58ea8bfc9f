"""Batched solvers — the TPU throughput path.

The reference processes one frame pair per process (OpenMP threads
inside one pair); the TPU-native throughput axis is BATCH: many pairs
per chip, data-parallel across chips (SURVEY.md §2 parallelism table).

Two stopping modes share ONE compiled program per batch geometry:
  * stop="error" — the reference CLI's operating point: per-sample
    data-dependent stopping (src/tvl1flow.cpp:113,150-162;
    src/horn_schunck_pyramidal.cpp:143,230) runs INSIDE the fused
    Pallas kernels, so each sample stops at exactly its own iteration.
  * stop="fixed" — a fixed per-warp iteration schedule calibrated as an
    upper envelope of the reference's observed stopping iterations.
Mode differences (stopping threshold, per-warp iteration caps) are
RUNTIME scalars threaded through the jit, so switching modes never
recompiles — a deliberate cold-start design (round 4): the Mosaic
kernels' compile time is the dominant cost of a cold process.

Per warp a level runs exactly TWO fused kernels: warp+constants
(tpuflow.ops.warp_pallas: bounded bicubic warp emitting each solver's
per-warp constant planes in padded layout) and the whole-level-in-VMEM
iteration kernel (tvl1_pallas / hs_pallas).  The warp loop is a lax
loop, so each Mosaic program appears once per level.

The displacement bound follows the pyramid: flow magnitude at level s
scales as max_motion * zfactor**s.  Flows beyond the bound behave like
border_out pixels (contribute 0) — the same graceful degradation the
reference has for out-of-frame motion.  Small pyramid levels fall back
to pure-XLA compute (kernel launch overhead dominates there).
"""

import math
import os
from functools import partial

import jax
import jax.numpy as jnp

from tpuflow.models.tvl1 import _inner_step
from tpuflow.ops import centered_gradient, clamp_nscales
from tpuflow.ops.interp import warp_planes_shift
from tpuflow.ops.tvl1_pallas import (fits_vmem, pad_hw,
                                     tvl1_iterate_error_padded)
from tpuflow.ops.warp_pallas import (pick_tile, warp_const_pallas_batched,
                                     warp_planes_pallas_batched)

# per-warp inner-iteration schedule: upper envelope of the reference's
# observed data-dependent stopping at default params (epsilon=0.01);
# used when the caller pins one schedule for every level
DEFAULT_ITER_SCHEDULE = (30, 20, 10, 6, 6)


def tvl1_iter_schedule(ny, nx):
    """Per-warp iteration schedule for stop="fixed", calibrated as a
    1.3x envelope of the reference binary's observed data-dependent
    stopping iterations at default params (tau=.25 lambda=.15 theta=.3
    nwarps=5 epsilon=.01) over bench-geometry pairs — raw data in
    tools/tvl1_calibration.json (tools/calibrate_tvl1.py).  Like the HS
    analog (hs_sweep_schedule), convergence tracks the LEVEL SIZE:
    coarse levels iterate longest (their stopping threshold
    epsilon^2*size is smallest) and fine levels collapse after the
    first warp."""
    px = ny * nx
    if px <= 32 * 64:
        return (30, 20, 10, 8, 8)
    if px <= 55 * 128:
        return (30, 16, 8, 6, 8)
    if px <= 109 * 256:
        return (16, 7, 4, 4, 4)
    if px <= 218 * 512:
        return (8, 3, 3, 3, 3)
    return (20, 3, 6, 3, 3)
# minimum level size for the fused Pallas path.  The r5 sweep
# (tools/tpu_exp/r5_small.py) showed the fused kernels beat the XLA
# shift/while path at EVERY pyramid level on the chip — the small
# levels' thousands of micro-fusions cost more than kernel launches
# (388 -> 446 fields/s moving the threshold 96*96 -> 128) — so on TPU
# only the sub-(8,128)-tile floor remains.  Off-TPU (the interpret-
# mode CPU test lane) small levels keep the XLA path: interpreted
# kernels are orders slower than compiled XLA.  Env-overridable for
# experiments.
def pallas_min_pixels():
    env = os.environ.get("TPUFLOW_PALLAS_MIN_PIXELS")
    if env is not None:
        return int(env)
    return 128 if jax.default_backend() == "tpu" else 96 * 96
# relative-window residual budget / tile for the fused warp kernels.
# r5 re-sweep UNDER double buffering (tools/tpu_exp/r5_warptile.py):
# rbud=1 beats 2 by ~30% at every tile (7.5 vs 10.1 ms/call at level 0,
# tile (32,512)); two +-1 end-anchored windows still cover any smooth
# spread <= 5 px plus two-cluster tiles, and degradation stays
# observable via with_stats.  Rows pad to 32 so the preferred tile
# divides (436 -> 448; the r3-era (8,128) padding forced th=8).
WARP_RBUD = 1
WARP_TILE = (32, 512)


def _pad32(ny):
    return -(-ny // 32) * 32


def _normalize_pair_batched(I0, I1):
    """Joint [0,255] normalization per batch sample
    (image_normalization_2 semantics, reference src/utils.cpp:283-326,
    applied per sample)."""
    mn = jnp.minimum(jnp.min(I0, axis=(-2, -1), keepdims=True),
                     jnp.min(I1, axis=(-2, -1), keepdims=True))
    mx = jnp.maximum(jnp.max(I0, axis=(-2, -1), keepdims=True),
                     jnp.max(I1, axis=(-2, -1), keepdims=True))
    den = mx - mn
    ok = den > 0
    den = jnp.where(ok, den, 1.0)
    return (jnp.where(ok, 255.0 * (I0 - mn) / den, I0),
            jnp.where(ok, 255.0 * (I1 - mn) / den, I1))


def _warp3(I1, I1x, I1y, u1, u2, dmax):
    """Displacement-bounded batched 3-plane warp: (B, H, W) images and
    flows.  Pallas kernel on big levels (batch = grid dimension), XLA
    shift-select on small ones (kernel launch overhead dominates)."""
    planes = jnp.stack([I1, I1x, I1y], axis=1)  # (B, 3, H, W)
    if I1.shape[-2] * I1.shape[-1] >= pallas_min_pixels():
        w = warp_planes_pallas_batched(planes, u1, u2, dmax)
    else:
        w = jax.vmap(lambda p, a, b: warp_planes_shift(p, a, b, dmax))(
            planes, u1, u2)
    return w[:, 0], w[:, 1], w[:, 2]


def _use_fused(shape):
    ny, nx = shape[-2:]
    return ny * nx >= pallas_min_pixels() and fits_vmem(ny, nx)




def tvl1_scale_batched(I0, I1, u1, u2, dmax, tau, lam, theta, thresh, caps,
                       ee=None):
    """Batched single-scale TV-L1 with bounded-displacement warps.

    `thresh` (runtime scalar) is the reference's stopping threshold
    epsilon^2 * size (src/tvl1flow.cpp:113,150-162); thresh < 0
    disables stopping so each warp runs exactly its cap.  `caps` is a
    (warps,) int32 array of per-warp iteration caps.  Big levels run
    each warp as warp-constants kernel + whole-level-in-VMEM iteration
    kernel (one HBM round-trip each).

    `ee` (runtime int32 scalar, default 2) is the warp-level early-exit
    iteration threshold (r5): when stopping is enabled and every
    sample's inner fixed point converged within `ee` iterations, the
    remaining warps are skipped — the reference's own operating data
    (tools/tvl1_calibration.json) shows warps 2-5 converging in 1-2
    iterations at every level size, and the fused warp+constants
    kernel they would launch is the single most expensive kernel of
    the solve (tools/roofline.json).  The skipped relinearizations are
    a parity-budget-level deviation, not a bitwise no-op: EPE vs the
    full schedule is ~0.017 on adversarial constant-shift synthetics
    and ~0.007 end-to-end vs the reference binary on smooth content
    (budget: 0.05).  ee <= 0 disables the exit (strictly
    reference-faithful warp count).

    Returns (u1, u2, oflow): `oflow` is the int32 count of warp tiles
    whose residual displacements exceeded the fused kernel's two-window
    budget (their uncovered pixels degraded to 0 for that warp — the
    accepted-degradation class documented in
    tpuflow.ops.warp_pallas); always 0 on the small-level path."""
    l_t = lam * theta
    taut = tau / theta
    ny, nx = I0.shape[-2:]
    warps = caps.shape[0]
    I1x, I1y = centered_gradient(I1)
    zero = jnp.zeros_like(u1)
    big = _use_fused(I0.shape)
    state = jnp.stack([u1, u2, zero, zero, zero, zero], axis=1)
    B = I0.shape[0]
    if ee is None:
        ee = jnp.asarray(2, jnp.int32)

    if big:
        state_p = pad_hw(state, _pad32(ny))
        I1s = jnp.stack([I1, I1x, I1y], axis=1)
        aux_p = pad_hw(I0, _pad32(ny))
        Hp, Wp = state_p.shape[-2:]
        tile = pick_tile(Hp, Wp, WARP_TILE)

        def cond(c):
            return (c[1] < warps) & jnp.logical_not(c[2])

        def body(c):
            state_p, wi, _, oflow = c
            const_p, flags = warp_const_pallas_batched(
                I1s, state_p[:, :2], aux_p, dmax, "tvl1", ny, nx,
                tile=tile, rbud=WARP_RBUD)
            state_p, _, n = tvl1_iterate_error_padded(
                state_p, const_p, ny, nx, thresh, caps[wi], l_t, theta,
                taut)
            done = (jnp.max(n) <= ee) & (thresh > 0) & (ee > 0)
            return (state_p, wi + 1, done,
                    oflow + jnp.sum(flags, dtype=jnp.int32))

        state_p, _, _, oflow = jax.lax.while_loop(
            cond, body, (state_p, jnp.asarray(0, jnp.int32),
                         jnp.asarray(False), jnp.zeros((), jnp.int32)))
        return state_p[:, 0, :ny, :nx], state_p[:, 1, :ny, :nx], oflow

    def warp_body(wi, state):
        u1, u2 = state[:, 0], state[:, 1]
        I1w, I1wx, I1wy = _warp3(I1, I1x, I1y, u1, u2, dmax)
        grad = I1wx * I1wx + I1wy * I1wy
        rho_c = I1w - I1wx * u1 - I1wy * u2 - I0

        def cond(c):
            return jnp.any(c[1] > thresh) & (c[2] < caps[wi])

        def body(c):
            state, err, n = c
            parts = _inner_step(*(state[:, k] for k in range(6)),
                                I1wx, I1wy, rho_c, grad, l_t, theta,
                                taut)
            new_state = jnp.stack(parts[:6], axis=1)
            new_err = jnp.sum(
                (new_state[:, 0] - state[:, 0]) ** 2
                + (new_state[:, 1] - state[:, 1]) ** 2, axis=(-2, -1))
            active = err > thresh
            state = jnp.where(active[:, None, None, None], new_state,
                              state)
            err = jnp.where(active, new_err, err)
            return state, err, n + 1

        init = (state, jnp.full((B,), jnp.inf, dtype=I0.dtype),
                jnp.asarray(0, jnp.int32))
        state, _, _ = jax.lax.while_loop(cond, body, init)
        return state

    state = jax.lax.fori_loop(0, warps, warp_body, state)
    return state[:, 0], state[:, 1], jnp.zeros((), jnp.int32)


def _tvl1_pyramid(I0, I1, tau, lam, theta, nscales, zfactor, max_motion,
                  thresh_base, caps_all, ee, level_callback=None,
                  resume=None):
    """Shared batched TV-L1 pyramid over run_pyramid_state (SURVEY §5.4:
    one driver = uniform checkpoint/resume/trace hooks).

    thresh_base: runtime scalar — epsilon^2 (error mode) or -1 (fixed);
    per level thresh = thresh_base * level_size.
    caps_all: (nscales, warps) runtime int32 per-warp iteration caps."""
    from tpuflow.models.common import run_pyramid_state

    B, ny, nx = I0.shape

    def state_init(size, dtype):
        cnx, cny = size
        z = jnp.zeros((B, cny, cnx), dtype=dtype)
        return {"u1": z, "u2": z, "oflow": jnp.zeros((), jnp.int32)}

    def solve(level_images, state, scale):
        dmax = max(3, math.ceil(max_motion * (zfactor ** scale)))
        l0, l1 = level_images
        cny, cnx = l0.shape[-2:]
        thresh = thresh_base * (cny * cnx)
        u1, u2, oflow = tvl1_scale_batched(l0, l1, state["u1"], state["u2"],
                                           dmax=dmax, tau=tau, lam=lam,
                                           theta=theta, thresh=thresh,
                                           caps=caps_all[scale], ee=ee)
        prev = state.get("oflow", jnp.zeros((), jnp.int32))  # resume compat
        return {"u1": u1, "u2": u2, "oflow": prev + oflow}

    state = run_pyramid_state(
        (I0, I1), nscales, zfactor, solve, presmooth=0.8,
        preprocess=lambda ims: _normalize_pair_batched(*ims),
        state_init=state_init, level_callback=level_callback,
        resume=resume, trace_name="tvl1_batched")
    return state["u1"], state["u2"], state["oflow"]


@partial(jax.jit, static_argnames=("tau", "lam", "theta", "nscales",
                                   "zfactor", "max_motion"))
def _tvl1_batched_jit(I0, I1, tau, lam, theta, nscales, zfactor,
                      max_motion, thresh_base, caps_all, ee):
    return _tvl1_pyramid(I0, I1, tau, lam, theta, nscales, zfactor,
                         max_motion, thresh_base, caps_all, ee)


def _tvl1_mode_scalars(stop, epsilon, max_iterations, iter_schedule,
                       warps, nscales, zfactor, ny, nx, dtype):
    """Map a stopping mode onto the two runtime values that distinguish
    it — the whole point being that BOTH modes share one compiled
    program (the scalars ride through the jit as inputs)."""
    if stop == "error":
        thresh_base = jnp.asarray(epsilon * epsilon, dtype)
        caps = jnp.full((nscales, warps), max_iterations, jnp.int32)
    elif stop == "fixed":
        from tpuflow.ops.pyramid import zoom_size

        thresh_base = jnp.asarray(-1.0, dtype)
        if iter_schedule is None:
            # calibrated per-level schedule (tvl1_iter_schedule)
            rows = []
            cnx, cny = nx, ny
            for _ in range(nscales):
                sched = tvl1_iter_schedule(cny, cnx)
                rows.append(sched[:warps]
                            + sched[-1:] * max(0, warps - len(sched)))
                cnx, cny = zoom_size(cnx, cny, zfactor)
            caps = jnp.asarray(rows, jnp.int32)
        else:
            caps = jnp.broadcast_to(
                jnp.asarray(iter_schedule, jnp.int32)[None, :],
                (nscales, len(iter_schedule))).copy()
    else:
        raise ValueError(f"unknown stop mode {stop!r}")
    return thresh_base, caps


def tvl1_batched(I0, I1, tau=0.25, lam=0.15, theta=0.3, nscales=None,
                 zfactor=0.5, iter_schedule=None,
                 max_motion=8, stop="error", warps=5, epsilon=0.01,
                 max_iterations=300, level_callback=None, resume=None,
                 with_stats=False, warp_early_exit=True):
    """Batched multiscale TV-L1: (B, H, W) pairs -> (B, H, W) flows.

    One jit covers the whole pyramid (static level shapes), so a call is
    a single device program — no host sync between levels.  Per-level
    displacement bound: max(3, ceil(max_motion * zfactor**s)).

    stop="error" (default) reproduces the reference CLI's operating
    point: per-sample data-dependent stopping at epsilon, exact to the
    iteration (inside the fused kernel on big levels).
    stop="fixed" runs a fixed per-warp iteration budget: the calibrated
    per-level-size schedule (`tvl1_iter_schedule`,
    tools/tvl1_calibration.json) by default, or `iter_schedule`
    verbatim for every level if given.  Both modes share one compiled
    program per batch geometry (the budgets are runtime inputs).

    `level_callback(scale, state)` / `resume=(scale, state)` enable
    per-level checkpointing; that path runs the pyramid level-by-level
    on the host (each level's solve still compiled) so flows are
    materialized between levels.

    `with_stats=True` returns (u1, u2, stats) where
    stats["warp_overflow_tiles"] counts warp tiles (summed over the
    batch, all warps, all levels) whose displacements exceeded the
    fused warp kernel's two-window budget and partially degraded to 0
    (tpuflow.ops.warp_pallas) — the diagnostic for real multi-motion
    content beyond the kernel's coverage class.

    DELIBERATE DEVIATION (default on, r5): in stop="error" mode a
    level's warp loop exits early once every sample's inner fixed point
    converges within 2 iterations, whereas the reference always runs
    all `warps` warps (src/tvl1flow.cpp:92).  At the reference's own
    operating points warps 2-5 converge in 1-2 iterations at every
    level (tools/tvl1_calibration.json); skipping them is a
    parity-budget-level deviation (EPE ~0.007-0.017 vs the full
    schedule, budget 0.05 — tests/test_batch.py
    test_warp_early_exit_equivalence).  Pass
    `warp_early_exit=False` for the strictly reference-faithful
    schedule — a runtime scalar, so toggling never recompiles.
    """
    ny, nx = I0.shape[-2:]
    if nscales is None:
        nscales = clamp_nscales(nx, ny, zfactor, 100, use_hypot=True)
    if stop == "fixed" and iter_schedule is not None:
        warps = len(iter_schedule)
    thresh_base, caps_all = _tvl1_mode_scalars(
        stop, epsilon, max_iterations, iter_schedule, warps, nscales,
        zfactor, ny, nx,
        I0.dtype if hasattr(I0, "dtype") else jnp.float32)
    ee = jnp.asarray(2 if warp_early_exit else 0, jnp.int32)
    if level_callback is None and resume is None:
        u1, u2, oflow = _tvl1_batched_jit(I0, I1, tau, lam, theta, nscales,
                                          zfactor, max_motion, thresh_base,
                                          caps_all, ee)
    else:
        u1, u2, oflow = _tvl1_pyramid(I0, I1, tau, lam, theta, nscales,
                                      zfactor, max_motion, thresh_base,
                                      caps_all, ee,
                                      level_callback=level_callback,
                                      resume=resume)
    if with_stats:
        return u1, u2, {"warp_overflow_tiles": oflow}
    return u1, u2


def hs_sweep_schedule(ny, nx):
    """Per-warp sweep schedule for stop="fixed", calibrated as a ~1.3x
    envelope of the reference binary's observed per-warp stopping
    sweeps at default parameters (tol=1e-4, alpha=7, 10 warps) over
    bench-geometry pairs — raw data in tools/hs_calibration.json.
    Convergence counts track the LEVEL SIZE (the stopping threshold is
    tol^2 * size, so small levels need more sweeps); fine levels
    collapse after the first warp."""
    px = ny * nx
    if px <= 64 * 128:       # coarse levels (<= 55x128): nearly free
        return (104, 104, 96, 88, 80, 80, 80, 76, 76, 76)
    if px <= 109 * 256:
        return (96, 78, 60, 46, 35, 25, 16, 10, 7, 6)
    if px <= 218 * 512:
        return (80, 40, 11, 5, 3, 2, 3, 2, 2, 6)
    return (73, 12, 6, 4, 4, 3, 3, 4, 4, 4)


def hs_scale_batched(I1, I2, u, v, dmax, alpha, thresh, caps, ee=None):
    """Batched single-scale warping Horn-Schunck.

    `thresh` (runtime scalar) = TOL^2 * size
    (src/horn_schunck_pyramidal.cpp:143,230); thresh < 0 disables the
    in-kernel stop so each warp runs exactly its cap.  `caps` is a
    (warps,) int32 array of per-warp sweep caps.

    Big levels run the whole warp loop as a lax while_loop over TWO
    fused kernels per warp — warp+constants (warp_const_pallas_batched)
    and the in-VMEM quarter-plane SOR — with the state held in quarter
    layout across the level.  `ee` (runtime int32 scalar, default 2)
    is the warp-level early-exit sweep threshold: when stopping is
    enabled the warp loop exits once a warp's SOR converges within
    `ee` sweeps for every sample — the reference's own operating data
    (tools/hs_calibration.json) shows late warps converging in 1-4
    sweeps, at which point the remaining warps are numerical no-ops
    (EPE-validated vs the reference binary in the TPU test lane).
    ee <= 0 disables the exit (strictly reference-faithful: all warps
    always run).

    Returns (u, v, oflow); `oflow` counts two-window-degraded warp
    tiles as in tvl1_scale_batched.

    Reference per-warp system constants:
    src/horn_schunck_pyramidal.cpp:128-137."""
    from tpuflow.models.hs_pyramidal import _four_colors, _sor_sweep
    from tpuflow.ops.hs_pallas import (from_quarters, hs_sor_error_quarters,
                                       pad_hw_q, to_quarters)

    alpha2 = alpha * alpha
    ny, nx = I1.shape[-2:]
    warps = caps.shape[0]
    big = _use_fused(I1.shape)
    I2x, I2y = centered_gradient(I2)
    B = I1.shape[0]
    if ee is None:
        ee = jnp.asarray(2, jnp.int32)

    if big:
        I2s = jnp.stack([I2, I2x, I2y], axis=1)
        aux_p = pad_hw_q(I1)
        state_q = to_quarters(pad_hw_q(jnp.stack([u, v], axis=1)))
        Hp, Wp = aux_p.shape[-2:]
        tile = pick_tile(Hp, Wp, WARP_TILE)

        def cond(c):
            return (c[1] < warps) & jnp.logical_not(c[2])

        def body(c):
            state_q, wi, _, oflow = c
            uv_p = from_quarters(state_q)
            const_p, flags = warp_const_pallas_batched(
                I2s, uv_p, aux_p, dmax, "hs", ny, nx, tile=tile,
                rbud=WARP_RBUD, alpha2=alpha2)
            const_q = to_quarters(const_p)
            state_q, _, n = hs_sor_error_quarters(
                state_q, const_q, ny, nx, thresh, caps[wi], alpha2)
            done = (jnp.max(n) <= ee) & (thresh > 0) & (ee > 0)
            return state_q, wi + 1, done, oflow + jnp.sum(flags, dtype=jnp.int32)

        state_q, _, _, oflow = jax.lax.while_loop(
            cond, body, (state_q, jnp.asarray(0, jnp.int32),
                         jnp.asarray(False), jnp.zeros((), jnp.int32)))
        uv = from_quarters(state_q)
        return uv[:, 0, :ny, :nx], uv[:, 1, :ny, :nx], oflow

    colors = _four_colors(I1.shape[-2:])

    def warp_body(wi, uv):
        u, v = uv
        I2w, I2wx, I2wy = _warp3(I2, I2x, I2y, u, v, dmax)
        dif = I1 - I2w + I2wx * u + I2wy * v
        Au = dif * I2wx
        Av = dif * I2wy
        Du = I2wx * I2wx + alpha2
        Dv = I2wy * I2wy + alpha2
        D = I2wx * I2wy

        def cond(c):
            return jnp.any(c[2] > thresh) & (c[3] < caps[wi])

        def body(c):
            u, v, err, n = c
            u_n, v_n, errs = _sor_sweep(u, v, Au, Av, Du, Dv, D, alpha2,
                                        colors)
            # per-sample sum (the shared helper returns a global sum
            # for unbatched use; recompute per sample)
            new_err = jnp.sum((u_n - u) ** 2 + (v_n - v) ** 2,
                              axis=(-2, -1))
            active = err > thresh
            u = jnp.where(active[:, None, None], u_n, u)
            v = jnp.where(active[:, None, None], v_n, v)
            err = jnp.where(active, new_err, err)
            return u, v, err, n + 1

        init = (u, v, jnp.full((B,), jnp.inf, dtype=I1.dtype),
                jnp.asarray(0, jnp.int32))
        u, v, _, _ = jax.lax.while_loop(cond, body, init)
        return u, v

    u, v = jax.lax.fori_loop(0, warps, warp_body, (u, v))
    return u, v, jnp.zeros((), jnp.int32)


def _hs_pyramid(I1, I2, alpha, nscales, zfactor, max_motion, thresh_base,
                caps_all, ee, level_callback=None, resume=None):
    from tpuflow.models.common import run_pyramid_state

    B, ny, nx = I1.shape

    def state_init(size, dtype):
        cnx, cny = size
        z = jnp.zeros((B, cny, cnx), dtype=dtype)
        return {"u1": z, "u2": z, "oflow": jnp.zeros((), jnp.int32)}

    def solve(level_images, state, scale):
        dmax = max(3, math.ceil(max_motion * (zfactor ** scale)))
        l1, l2 = level_images
        cny, cnx = l1.shape[-2:]
        thresh = thresh_base * (cny * cnx)
        u, v, oflow = hs_scale_batched(l1, l2, state["u1"], state["u2"],
                                       dmax=dmax, alpha=alpha,
                                       thresh=thresh, caps=caps_all[scale],
                                       ee=ee)
        prev = state.get("oflow", jnp.zeros((), jnp.int32))  # resume compat
        return {"u1": u, "u2": v, "oflow": prev + oflow}

    state = run_pyramid_state(
        (I1, I2), nscales, zfactor, solve, presmooth=0.8,
        preprocess=lambda ims: _normalize_pair_batched(*ims),
        state_init=state_init, level_callback=level_callback,
        resume=resume, trace_name="hs_batched")
    return state["u1"], state["u2"], state["oflow"]


@partial(jax.jit, static_argnames=("alpha", "nscales", "zfactor",
                                   "max_motion"))
def _hs_batched_jit(I1, I2, alpha, nscales, zfactor, max_motion,
                    thresh_base, caps_all, ee):
    return _hs_pyramid(I1, I2, alpha, nscales, zfactor, max_motion,
                       thresh_base, caps_all, ee)


def _hs_mode_scalars(stop, tol, maxiter, warps, nscales, zfactor, ny, nx,
                     dtype):
    if stop == "error":
        thresh_base = jnp.asarray(tol * tol, dtype)
        caps = jnp.full((nscales, warps), maxiter, jnp.int32)
    elif stop == "fixed":
        thresh_base = jnp.asarray(-1.0, dtype)
        rows = []
        from tpuflow.ops.pyramid import zoom_size
        cnx, cny = nx, ny
        for s in range(nscales):
            sched = hs_sweep_schedule(cny, cnx)
            rows.append(sched[:warps] + sched[-1:] * max(0, warps
                                                         - len(sched)))
            cnx, cny = zoom_size(cnx, cny, zfactor)
        caps = jnp.asarray(rows, jnp.int32)
    else:
        raise ValueError(f"unknown stop mode {stop!r}")
    return thresh_base, caps


def hs_pyramidal_batched(I1, I2, alpha=7.0, nscales=None, zfactor=0.5,
                         warps=10, tol=1e-4, maxiter=150, max_motion=8,
                         stop="error", level_callback=None, resume=None,
                         warp_early_exit=True, with_stats=False):
    """Batched multiscale warping Horn-Schunck: (B, H, W) -> (B, H, W).

    The second throughput config of BASELINE.md (reference
    src/horn_schunck_pyramidal.cpp).  Same pyramid/driver design,
    checkpoint hooks, and one-program-for-both-modes stopping design as
    `tvl1_batched`.

    DELIBERATE DEVIATION (default on): in stop="error" mode the warp
    loop exits early once a warp's SOR converges within 2 sweeps for
    every sample, whereas the reference always runs all `warps` warps
    (src/horn_schunck_pyramidal.cpp:111-240).  The remaining warps are
    numerical no-ops at the reference's operating points
    (EPE-validated; tools/hs_calibration.json shows late warps
    converging in 1-4 sweeps).  Pass `warp_early_exit=False` for the
    strictly reference-faithful schedule — it is a runtime scalar, so
    toggling never recompiles.

    `with_stats=True` returns (u, v, stats) with
    stats["warp_overflow_tiles"] as in `tvl1_batched`."""
    ny, nx = I1.shape[-2:]
    if nscales is None:
        nscales = clamp_nscales(nx, ny, zfactor, 10, use_hypot=True)
    thresh_base, caps_all = _hs_mode_scalars(
        stop, tol, maxiter, warps, nscales, zfactor, ny, nx,
        I1.dtype if hasattr(I1, "dtype") else jnp.float32)
    ee = jnp.asarray(2 if warp_early_exit else 0, jnp.int32)
    if level_callback is None and resume is None:
        u, v, oflow = _hs_batched_jit(I1, I2, alpha, nscales, zfactor,
                                      max_motion, thresh_base, caps_all, ee)
    else:
        u, v, oflow = _hs_pyramid(I1, I2, alpha, nscales, zfactor,
                                  max_motion, thresh_base, caps_all, ee,
                                  level_callback=level_callback,
                                  resume=resume)
    if with_stats:
        return u, v, {"warp_overflow_tiles": oflow}
    return u, v
