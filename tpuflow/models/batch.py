"""Batched fixed-iteration solvers — the TPU throughput path.

The reference processes one frame pair per process (OpenMP threads
inside one pair); the TPU-native throughput axis is BATCH: many pairs
per chip, data-parallel across chips (SURVEY.md §2 parallelism table).
Data-dependent stopping cannot batch (each sample would stop at its own
iteration), so this driver runs a FIXED per-warp iteration schedule
calibrated as an upper envelope of the reference's observed stopping
iterations at default parameters (tvl1flow verbose runs converge in
1-20 inner iterations per warp, nowhere near the 300 cap:
src/tvl1flow.cpp:22).

The warp uses the displacement-bounded Pallas kernel
(tpuflow.ops.warp_pallas) with a per-level bound following the pyramid:
flow magnitude at level s scales as max_motion * zfactor**s.  Flows
beyond the bound behave like border_out pixels (contribute 0) — the
same graceful degradation the reference has for out-of-frame motion.
Small pyramid levels fall back to the pure-XLA shift-select warp
(kernel launch overhead dominates there).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from tpuflow.models.tvl1 import _inner_step
from tpuflow.ops import centered_gradient, clamp_nscales
from tpuflow.ops.interp import warp_planes_shift
from tpuflow.ops.tvl1_pallas import (fits_vmem, pad_hw,
                                     tvl1_iterate_error_padded,
                                     tvl1_iterate_padded)
from tpuflow.ops.warp_pallas import warp_planes_pallas_batched

# per-warp inner-iteration schedule: upper envelope of the reference's
# observed data-dependent stopping at default params (epsilon=0.01)
DEFAULT_ITER_SCHEDULE = (30, 20, 10, 6, 6)
PALLAS_MIN_PIXELS = 96 * 96


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
    if I1.shape[-2] * I1.shape[-1] >= PALLAS_MIN_PIXELS:
        w = warp_planes_pallas_batched(planes, u1, u2, dmax)
    else:
        w = jax.vmap(lambda p, a, b: warp_planes_shift(p, a, b, dmax))(
            planes, u1, u2)
    return w[:, 0], w[:, 1], w[:, 2]


ERROR_CHUNK = 8  # iterations between convergence checks in error mode


def _use_fused(shape):
    ny, nx = shape[-2:]
    return ny * nx >= PALLAS_MIN_PIXELS and fits_vmem(ny, nx)


def tvl1_scale_fixed(I0, I1, u1, u2, dmax, tau=0.25, lam=0.15, theta=0.3,
                     iter_schedule=DEFAULT_ITER_SCHEDULE):
    """Single-scale TV-L1 with a fixed per-warp iteration schedule and
    bounded-displacement warps.  Batched (B, H, W) arrays.

    Big levels run the inner fixed point through the whole-level-in-VMEM
    Pallas kernel (tpuflow.ops.tvl1_pallas): each warp's full iteration
    budget is ONE fused kernel call (one HBM round-trip), and the state
    stays (8, 128)-padded across the whole scale so no pad/unpad copies
    sit in the hot loop."""
    l_t = lam * theta
    taut = tau / theta
    ny, nx = I0.shape[-2:]
    I1x, I1y = centered_gradient(I1)
    zero = jnp.zeros_like(u1)
    big = _use_fused(I0.shape)
    state = jnp.stack([u1, u2, zero, zero, zero, zero], axis=1)

    if big:
        state_p = pad_hw(state)
        for iters in iter_schedule:
            u1 = state_p[:, 0, :ny, :nx]
            u2 = state_p[:, 1, :ny, :nx]
            I1w, I1wx, I1wy = _warp3(I1, I1x, I1y, u1, u2, dmax)
            grad = I1wx * I1wx + I1wy * I1wy
            rho_c = I1w - I1wx * u1 - I1wy * u2 - I0
            const_p = pad_hw(jnp.stack([I1wx, I1wy, rho_c, grad], axis=1))
            state_p, _ = tvl1_iterate_padded(state_p, const_p, ny, nx,
                                             iters, l_t, theta, taut)
        return state_p[:, 0, :ny, :nx], state_p[:, 1, :ny, :nx]

    for iters in iter_schedule:
        u1, u2 = state[:, 0], state[:, 1]
        I1w, I1wx, I1wy = _warp3(I1, I1x, I1y, u1, u2, dmax)
        grad = I1wx * I1wx + I1wy * I1wy
        rho_c = I1w - I1wx * u1 - I1wy * u2 - I0

        def body(_, c):
            return _inner_step(c[0], c[1], c[2], c[3], c[4], c[5],
                               I1wx, I1wy, rho_c, grad, l_t, theta,
                               taut)[:6]

        parts = jax.lax.fori_loop(
            0, iters, body, tuple(state[:, k] for k in range(6)))
        state = jnp.stack(parts, axis=1)
    return state[:, 0], state[:, 1]


def tvl1_scale_error(I0, I1, u1, u2, dmax, tau=0.25, lam=0.15, theta=0.3,
                     warps=5, epsilon=0.01, max_iterations=300):
    """Batched single-scale TV-L1 with PER-SAMPLE data-dependent
    stopping: the reference's `mean squared flow update > epsilon^2`
    rule (src/tvl1flow.cpp:113,150-162), checked every ERROR_CHUNK
    iterations; converged samples freeze while the rest of the batch
    keeps iterating.  Within a check granularity of ERROR_CHUNK this is
    the reference operating point, batched."""
    l_t = lam * theta
    taut = tau / theta
    ny, nx = I0.shape[-2:]
    size = ny * nx
    thresh = epsilon * epsilon * size
    I1x, I1y = centered_gradient(I1)
    zero = jnp.zeros_like(u1)
    big = _use_fused(I0.shape)
    state = jnp.stack([u1, u2, zero, zero, zero, zero], axis=1)
    B = I0.shape[0]

    if big:
        # whole warp inside ONE kernel call: the reference's
        # per-iteration stopping runs inside the Pallas kernel, so each
        # sample stops at exactly its own iteration (no chunk
        # granularity) and each warp costs one HBM round-trip
        state_p = pad_hw(state)
        for _ in range(warps):
            u1 = state_p[:, 0, :ny, :nx]
            u2 = state_p[:, 1, :ny, :nx]
            I1w, I1wx, I1wy = _warp3(I1, I1x, I1y, u1, u2, dmax)
            grad = I1wx * I1wx + I1wy * I1wy
            rho_c = I1w - I1wx * u1 - I1wy * u2 - I0
            const_p = pad_hw(jnp.stack([I1wx, I1wy, rho_c, grad], axis=1))
            state_p, _, _ = tvl1_iterate_error_padded(
                state_p, const_p, ny, nx, thresh, max_iterations, l_t,
                theta, taut)
        return state_p[:, 0, :ny, :nx], state_p[:, 1, :ny, :nx]

    for _ in range(warps):
        u1, u2 = state[:, 0], state[:, 1]
        I1w, I1wx, I1wy = _warp3(I1, I1x, I1y, u1, u2, dmax)
        grad = I1wx * I1wx + I1wy * I1wy
        rho_c = I1w - I1wx * u1 - I1wy * u2 - I0

        def cond(c):
            return jnp.any(c[1] > thresh) & (c[2] < max_iterations)

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
    return state[:, 0], state[:, 1]


def _tvl1_pyramid(I0, I1, tau, lam, theta, nscales, zfactor, iter_schedule,
                  max_motion, stop, warps, epsilon, max_iterations,
                  level_callback=None, resume=None):
    """Shared batched TV-L1 pyramid over run_pyramid_state (SURVEY §5.4:
    one driver = uniform checkpoint/resume/trace hooks)."""
    from tpuflow.models.common import run_pyramid_state

    B, ny, nx = I0.shape
    if nscales is None:
        nscales = clamp_nscales(nx, ny, zfactor, 100, use_hypot=True)

    def state_init(size, dtype):
        cnx, cny = size
        z = jnp.zeros((B, cny, cnx), dtype=dtype)
        return {"u1": z, "u2": z}

    def solve(level_images, state, scale):
        dmax = max(3, math.ceil(max_motion * (zfactor ** scale)))
        l0, l1 = level_images
        u1, u2 = state["u1"], state["u2"]
        if stop == "error":
            u1, u2 = tvl1_scale_error(l0, l1, u1, u2, dmax=dmax, tau=tau,
                                      lam=lam, theta=theta, warps=warps,
                                      epsilon=epsilon,
                                      max_iterations=max_iterations)
        else:
            u1, u2 = tvl1_scale_fixed(l0, l1, u1, u2, dmax=dmax, tau=tau,
                                      lam=lam, theta=theta,
                                      iter_schedule=iter_schedule)
        return {"u1": u1, "u2": u2}

    state = run_pyramid_state(
        (I0, I1), nscales, zfactor, solve, presmooth=0.8,
        preprocess=lambda ims: _normalize_pair_batched(*ims),
        state_init=state_init, level_callback=level_callback,
        resume=resume, trace_name="tvl1_batched")
    return state["u1"], state["u2"]


@partial(jax.jit, static_argnames=("tau", "lam", "theta", "nscales",
                                   "zfactor", "iter_schedule", "max_motion",
                                   "stop", "warps", "epsilon",
                                   "max_iterations"))
def _tvl1_batched_jit(I0, I1, tau, lam, theta, nscales, zfactor,
                      iter_schedule, max_motion, stop, warps, epsilon,
                      max_iterations):
    return _tvl1_pyramid(I0, I1, tau, lam, theta, nscales, zfactor,
                         iter_schedule, max_motion, stop, warps, epsilon,
                         max_iterations)


def tvl1_batched(I0, I1, tau=0.25, lam=0.15, theta=0.3, nscales=None,
                 zfactor=0.5, iter_schedule=DEFAULT_ITER_SCHEDULE,
                 max_motion=8, stop="error", warps=5, epsilon=0.01,
                 max_iterations=300, level_callback=None, resume=None):
    """Batched multiscale TV-L1: (B, H, W) pairs -> (B, H, W) flows.

    One jit covers the whole pyramid (static level shapes), so a call is
    a single device program — no host sync between levels.  Per-level
    displacement bound: max(3, ceil(max_motion * zfactor**s)).

    stop="error" (default) reproduces the reference CLI's operating
    point: per-sample data-dependent stopping at epsilon, checked every
    ERROR_CHUNK iterations with converged samples frozen.
    stop="fixed" runs `iter_schedule` per warp — fully static, fastest.

    `level_callback(scale, state)` / `resume=(scale, state)` enable
    per-level checkpointing; that path runs the pyramid level-by-level
    on the host (each level's solve still compiled) so flows are
    materialized between levels.
    """
    if level_callback is None and resume is None:
        return _tvl1_batched_jit(I0, I1, tau, lam, theta, nscales, zfactor,
                                 iter_schedule, max_motion, stop, warps,
                                 epsilon, max_iterations)
    return _tvl1_pyramid(I0, I1, tau, lam, theta, nscales, zfactor,
                         iter_schedule, max_motion, stop, warps, epsilon,
                         max_iterations, level_callback=level_callback,
                         resume=resume)


HS_SOR_CHUNK = 6  # sweeps per fused kernel call in error mode


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


def hs_scale_batched(I1, I2, u, v, dmax, alpha=7.0, warps=10, tol=1e-4,
                     maxiter=150, stop="error", sweep_schedule=None):
    """Batched single-scale warping Horn-Schunck with the fused 4-color
    SOR kernel (tpuflow.ops.hs_pallas) on big levels.

    Reference per-warp system constants:
    src/horn_schunck_pyramidal.cpp:128-137."""
    from tpuflow.models.hs_pyramidal import _four_colors, _sor_sweep
    from tpuflow.ops.hs_pallas import (from_quarters, hs_sor_error_quarters,
                                       hs_sor_quarters, pad_hw_q,
                                       to_quarters)

    alpha2 = alpha * alpha
    ny, nx = I1.shape[-2:]
    if sweep_schedule is None:
        sweep_schedule = hs_sweep_schedule(ny, nx)
    size = ny * nx
    thresh = (tol * tol) * size  # sqrt(err/size) > tol  <=>  err > tol^2*size
    big = _use_fused(I1.shape)
    I2x, I2y = centered_gradient(I2)
    B = I1.shape[0]

    for wi in range(warps):
        I2w, I2wx, I2wy = _warp3(I2, I2x, I2y, u, v, dmax)
        dif = I1 - I2w + I2wx * u + I2wy * v
        Au = dif * I2wx
        Av = dif * I2wy
        Du = I2wx * I2wx + alpha2
        Dv = I2wy * I2wy + alpha2
        D = I2wx * I2wy

        if big:
            # quarter (parity-decomposed) layout once per warp; the
            # chunked SOR loop stays in that layout (ops/hs_pallas.py)
            state_q = to_quarters(pad_hw_q(jnp.stack([u, v], axis=1)))
            const_q = to_quarters(pad_hw_q(
                jnp.stack([Au, Av, Du, Dv, D], axis=1)))
            if stop == "error":
                # reference stopping per sweep, inside the kernel
                state_q, _, _ = hs_sor_error_quarters(
                    state_q, const_q, ny, nx, thresh, maxiter, alpha2)
            else:
                m = sweep_schedule[min(wi, len(sweep_schedule) - 1)]
                state_q, _ = hs_sor_quarters(state_q, const_q, ny, nx, m,
                                             alpha2)
            uv = from_quarters(state_q)
            u, v = uv[:, 0, :ny, :nx], uv[:, 1, :ny, :nx]
        elif stop == "error":
            colors = _four_colors(I1.shape[-2:])

            def cond(c):
                return jnp.any(c[2] > thresh) & (c[3] < maxiter)

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
        else:
            colors = _four_colors(I1.shape[-2:])
            m = sweep_schedule[min(wi, len(sweep_schedule) - 1)]

            def fbody(_, c):
                u, v = c
                u, v, _ = _sor_sweep(u, v, Au, Av, Du, Dv, D, alpha2,
                                     colors)
                return u, v

            u, v = jax.lax.fori_loop(0, m, fbody, (u, v))
    return u, v


def _hs_pyramid(I1, I2, alpha, nscales, zfactor, warps, tol, maxiter,
                max_motion, stop, level_callback=None, resume=None):
    from tpuflow.models.common import run_pyramid_state

    B, ny, nx = I1.shape
    if nscales is None:
        nscales = clamp_nscales(nx, ny, zfactor, 10, use_hypot=True)

    def state_init(size, dtype):
        cnx, cny = size
        z = jnp.zeros((B, cny, cnx), dtype=dtype)
        return {"u1": z, "u2": z}

    def solve(level_images, state, scale):
        dmax = max(3, math.ceil(max_motion * (zfactor ** scale)))
        l1, l2 = level_images
        u, v = hs_scale_batched(l1, l2, state["u1"], state["u2"], dmax=dmax,
                                alpha=alpha, warps=warps, tol=tol,
                                maxiter=maxiter, stop=stop)
        return {"u1": u, "u2": v}

    state = run_pyramid_state(
        (I1, I2), nscales, zfactor, solve, presmooth=0.8,
        preprocess=lambda ims: _normalize_pair_batched(*ims),
        state_init=state_init, level_callback=level_callback,
        resume=resume, trace_name="hs_batched")
    return state["u1"], state["u2"]


@partial(jax.jit, static_argnames=("alpha", "nscales", "zfactor", "warps",
                                   "tol", "maxiter", "max_motion", "stop"))
def _hs_batched_jit(I1, I2, alpha, nscales, zfactor, warps, tol, maxiter,
                    max_motion, stop):
    return _hs_pyramid(I1, I2, alpha, nscales, zfactor, warps, tol, maxiter,
                       max_motion, stop)


def hs_pyramidal_batched(I1, I2, alpha=7.0, nscales=None, zfactor=0.5,
                         warps=10, tol=1e-4, maxiter=150, max_motion=8,
                         stop="error", level_callback=None, resume=None):
    """Batched multiscale warping Horn-Schunck: (B, H, W) -> (B, H, W).

    The second throughput config of BASELINE.md (reference
    src/horn_schunck_pyramidal.cpp).  Same pyramid/driver design and
    checkpoint hooks as `tvl1_batched`."""
    if level_callback is None and resume is None:
        return _hs_batched_jit(I1, I2, alpha, nscales, zfactor, warps, tol,
                               maxiter, max_motion, stop)
    return _hs_pyramid(I1, I2, alpha, nscales, zfactor, warps, tol, maxiter,
                       max_motion, stop, level_callback=level_callback,
                       resume=resume)
