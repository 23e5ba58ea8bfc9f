"""Round-5 probe: tile/rbud sweep of the fused warp+constants kernel
UNDER double buffering (the r3 sweep that chose (32,512)/rbud=2
predates it).  Dispatch-amortized chained timing at the level-0 bench
geometry."""

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


def main():
    from tpuflow.models.batch import _normalize_pair_batched
    from tpuflow.ops import centered_gradient
    from tpuflow.ops.tvl1_pallas import pad_hw
    from tpuflow.ops.warp_pallas import warp_const_pallas_batched

    I0 = jnp.asarray(np.stack([synth_pair(seed=100 + s)[0]
                               for s in range(B)]))
    I1 = jnp.asarray(np.stack([synth_pair(seed=100 + s)[1]
                               for s in range(B)]))
    I0, I1 = _normalize_pair_batched(I0, I1)
    gx, gy = centered_gradient(I1)
    planes = jnp.stack([I1, gx, gy], axis=1)
    zero = jnp.zeros_like(I0)
    # pad rows to 448 so tall tiles divide (production pads to 440 and
    # pick_tile lands on th=8; this sweep asks whether taller is better)
    state_p = pad_hw(jnp.stack([zero] * 6, axis=1), ny=448)
    aux_p = pad_hw(I0, ny=448)
    uv0 = state_p[:, :2]

    f_empty = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)

    def sync(v):
        return float(jnp.sum(v))

    def timeit(fn, *a, reps=5):
        sync(fn(*a))
        t0 = time.perf_counter()
        for _ in range(reps):
            sync(fn(*a))
        return (time.perf_counter() - t0) / reps

    t_disp = timeit(f_empty, x, reps=20)

    for tile in ((8, 512), (16, 512), (32, 512), (64, 512), (32, 1024)):
        for rbud in (1, 2, 3):
            try:
                @jax.jit
                def chain(p, uv, ax, tile=tile, rbud=rbud):
                    def body(i, uv):
                        c, _ = warp_const_pallas_batched(
                            p, uv, ax, 8, "tvl1", NY, NX, tile=tile,
                            rbud=rbud)
                        return uv + 1e-30 * c[:, :2]

                    return jax.lax.fori_loop(0, K, body, uv)

                t = (timeit(chain, planes, uv0, aux_p) - t_disp) / K
                print(f"tile={tile} rbud={rbud}: {t*1e3:.3f} ms/call",
                      flush=True)
            except Exception as e:
                print(f"tile={tile} rbud={rbud}: FAIL {str(e)[:80]}",
                      flush=True)


if __name__ == "__main__":
    main()
