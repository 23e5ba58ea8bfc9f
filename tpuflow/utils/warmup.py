"""Parallel ahead-of-time compilation warm-up.

A cold process pays the Mosaic kernel compiles of every program it
touches (tens of seconds per full-resolution program, serial within
one XLA compilation).  Two facts make warm-up effective
(tools/tpu_exp/r4_cache_probe.py, r4_mp_compile.py):

  * the persistent compilation cache is PROGRAM-level and works across
    processes, and
  * separate processes can AOT-compile (`jit.lower(...).compile()`)
    concurrently without holding the chip.

`warmup()` therefore spawns one subprocess per (method, geometry) that
AOT-compiles the batched engine's program into the persistent cache;
the caller's first real run then loads executables instead of
compiling.  Both stopping modes share one program per geometry by
design (tpuflow.models.batch), so one warm-up covers them both, and
the single-pair CLI path (B=1 delegation) is covered by warming B=1.
"""

import os
import subprocess
import sys
import time

def _configure_cache():
    from tpuflow.utils.cache import configure_cache

    configure_cache()


def _warm_one(method, B, ny, nx):
    """AOT-compile one method's batched program (subprocess entry)."""
    _configure_cache()
    import jax.numpy as jnp

    from tpuflow.models import batch as mb
    from tpuflow.ops import clamp_nscales

    I = jnp.zeros((B, ny, nx), jnp.float32)
    if method == "tvl1":
        ns = clamp_nscales(nx, ny, 0.5, 100, use_hypot=True)
        tb, caps = mb._tvl1_mode_scalars("error", 0.01, 300, None, 5, ns,
                                         0.5, ny, nx, jnp.float32)
        mb._tvl1_batched_jit.lower(I, I, 0.25, 0.15, 0.3, ns, 0.5, 8,
                                   tb, caps).compile()
    elif method == "hs":
        ns = clamp_nscales(nx, ny, 0.5, 10, use_hypot=True)
        tb, caps = mb._hs_mode_scalars("error", 1e-4, 150, 10, ns, 0.5,
                                       ny, nx, jnp.float32)
        mb._hs_batched_jit.lower(I, I, 7.0, ns, 0.5, 8, tb, caps,
                                 jnp.asarray(2, jnp.int32)).compile()
    else:
        raise ValueError(f"unknown method {method!r}")


def warmup(geometries=((16, 436, 1024),), methods=("tvl1", "hs"),
           timeout=600, verbose=False):
    """Pre-compile the batched engines for the given (B, H, W)
    geometries into the persistent cache, one subprocess per (method,
    geometry), all concurrent.  Returns the wall seconds spent.

    Call once per deployment shape, e.g.::

        import tpuflow
        tpuflow.warmup([(16, 436, 1024), (1, 436, 1024)])
    """
    t0 = time.perf_counter()
    procs = []
    out = None if verbose else subprocess.DEVNULL
    for method in methods:
        for (B, ny, nx) in geometries:
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "tpuflow.utils.warmup",
                 method, str(B), str(ny), str(nx)],
                stdout=out, stderr=out,
                env=dict(os.environ, PYTHONPATH=os.pathsep.join(
                    [os.path.dirname(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))))]
                    + [p for p in
                       os.environ.get("PYTHONPATH", "").split(os.pathsep)
                       if p]))))
    deadline = time.time() + timeout
    for p in procs:
        try:
            p.wait(timeout=max(1, deadline - time.time()))
        except subprocess.TimeoutExpired:
            p.kill()
    return time.perf_counter() - t0


if __name__ == "__main__":
    _warm_one(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
              int(sys.argv[4]))
