"""Round-5 probe: dispatch-amortized kernel timings for the TV-L1 hot
path.  Each kernel is chained K times INSIDE one jit (data dependency
via its own output, preventing loop-invariant hoisting), so the ~26 ms
tunneled-runtime dispatch floor divides by K."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from tpuflow.utils.cache import configure_cache

configure_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import B, NX, NY, synth_pair

K = 32


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *a, reps=5):
    sync(fn(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn(*a))
    return (time.perf_counter() - t0) / reps


def main():
    from tpuflow.models.batch import _normalize_pair_batched
    from tpuflow.models.common import build_pyramid
    from tpuflow.ops import centered_gradient, clamp_nscales
    from tpuflow.ops.tvl1_pallas import pad_hw, tvl1_iterate_error_padded
    from tpuflow.ops.warp_pallas import pick_tile, warp_const_pallas_batched

    I0s, I1s = [], []
    for s in range(B):
        a, b = synth_pair(seed=100 + s)
        I0s.append(a)
        I1s.append(b)
    I0 = jnp.asarray(np.stack(I0s), jnp.float32)
    I1 = jnp.asarray(np.stack(I1s), jnp.float32)

    nscales = clamp_nscales(NX, NY, 0.5, 100, use_hypot=True)
    pre = _normalize_pair_batched(I0, I1)
    levels, _ = build_pyramid(pre, nscales, 0.5, normalize=False)

    # dispatch floor
    f_empty = jax.jit(lambda x: x + 1.0)
    t_disp = timeit(f_empty, jnp.zeros((8, 128), jnp.float32), reps=20)
    print(f"dispatch {t_disp*1e3:.2f} ms", flush=True)

    # pyramid build in ONE jit
    pyr = jax.jit(lambda a, b: build_pyramid(
        _normalize_pair_batched(a, b), nscales, 0.5, normalize=False)[0][0][0])
    t_pyr = timeit(pyr, I0, I1)
    print(f"pyramid-in-one-jit {(t_pyr - t_disp)*1e3:.1f} ms (device)",
          flush=True)

    for s in (0, 1, 2):
        l0, l1 = levels[s]
        cny, cnx = l0.shape[-2:]
        dmax = max(3, -(-8 * 2 ** -s // 1).__int__())
        import math
        dmax = max(3, math.ceil(8 * 0.5 ** s))
        gx, gy = centered_gradient(l1)
        I1s_ = jnp.stack([l1, gx, gy], axis=1)
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
                return uv + 1e-30 * const_p[:, :2]

            return jax.lax.fori_loop(0, K, body, uv0)[0, 0, 0]

        t = timeit(warp_chain, I1s_, state_p[:, :2], aux_p)
        warp_ms = (t - t_disp) / K * 1e3
        print(f"L{s} {cny}x{cnx} warp_const: {warp_ms:.3f} ms/call", flush=True)

        def make_chain(cap):
            c = jnp.asarray(cap, jnp.int32)
            th = jnp.asarray(-1.0, jnp.float32)

            @jax.jit
            def chain(sp, cp):
                def body(i, sp):
                    sp, _, _ = tvl1_iterate_error_padded(
                        sp, cp, cny, cnx, th, c, 0.045, 0.3, 0.8333)
                    return sp

                return jax.lax.fori_loop(0, K, body, sp)[0, 0, 0, 0]

            return chain

        const_p, _ = jax.jit(lambda p, uv, ax: warp_const_pallas_batched(
            p, uv, ax, dmax, "tvl1", cny, cnx, tile=tile, rbud=2))(
                I1s_, state_p[:, :2], aux_p)
        c4 = make_chain(4)
        c24 = make_chain(24)
        t4 = (timeit(c4, state_p, const_p) - t_disp) / K
        t24 = (timeit(c24, state_p, const_p) - t_disp) / K
        per_iter = (t24 - t4) / 20
        ovh = t4 - 4 * per_iter
        print(f"L{s} iterate: {per_iter*1e3:.4f} ms/iter, "
              f"{ovh*1e3:.3f} ms/call-overhead", flush=True)


if __name__ == "__main__":
    main()
