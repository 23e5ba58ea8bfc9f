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


SPATIAL_METHODS = ("occflow", "robust_expo", "brox_spatial",
                   "brox_temporal")


def _warm_one(method, B, ny, nx, scale=None):
    """AOT-compile one method's default whole-pyramid program
    (subprocess entry) with exactly the static arguments the public
    driver passes at CLI defaults, so a cold process's first call loads
    the executable from the persistent cache instead of compiling.
    `scale` is accepted for CLI compatibility and unused (r5 moved the
    spatial methods from per-level jits to one whole-pyramid jit)."""
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
                                   tb, caps,
                                   jnp.asarray(2, jnp.int32)).compile()
    elif method == "hs":
        ns = clamp_nscales(nx, ny, 0.5, 10, use_hypot=True)
        tb, caps = mb._hs_mode_scalars("error", 1e-4, 150, 10, ns, 0.5,
                                       ny, nx, jnp.float32)
        mb._hs_batched_jit.lower(I, I, 7.0, ns, 0.5, 8, tb, caps,
                                 jnp.asarray(2, jnp.int32)).compile()
    elif method in SPATIAL_METHODS:
        # the default TPU surface is the WHOLE-pyramid jit (r5 — no
        # host round-trip between levels); warm exactly that program
        # with the CLI-default statics
        L = jnp.zeros((ny, nx), jnp.float32)
        if method == "occflow":
            from tpuflow.models.tvl1occflow import _tvl1occflow_whole
            _tvl1occflow_whole.lower(
                L, L, L, L, 0.15, 0.01, 0.15, 0.3, 100, 0.5, 2, 0.01,
                "error", 20, True, "fast", 8).compile()
        elif method == "robust_expo":
            from tpuflow.models.robust_expo import _robust_expo_whole
            _robust_expo_whole.lower(
                L, L, 1, 50.0, 10.0, 0.2, 10, 0.5, 1e-4, 1, 15, "error",
                300, True, "reference", "fast", 8).compile()
        elif method == "brox_spatial":
            from tpuflow.models.brox_spatial import _brox_spatial_whole
            _brox_spatial_whole.lower(
                L, L, 50.0, 10.0, 10, 0.5, 1e-4, 1, 15, "error", 300,
                True, "fast", 8).compile()
        else:  # brox_temporal — the geometry's B slot = FRAME count
            from tpuflow.models.brox_temporal import _brox_temporal_whole
            V = jnp.zeros((B, ny, nx), jnp.float32)
            _brox_temporal_whole.lower(
                V, 18.0, 7.0, 100, 0.75, 1e-4, 1, 15, "error", 300,
                True, "fast", 8).compile()
    else:
        raise ValueError(f"unknown method {method!r}")


def warmup(geometries=((16, 436, 1024),), methods=("tvl1", "hs"),
           timeout=600, verbose=False):
    """Pre-compile solver programs for the given (B, H, W) geometries
    into the persistent cache, all subprocesses concurrent.  Returns
    the wall seconds spent.

    methods: any of "tvl1"/"hs" (batched engines: one subprocess per
    (method, geometry), whole pyramid in one program; B used) and
    "occflow"/"robust_expo"/"brox_spatial"/"brox_temporal"
    (single-pair multiscale spatial configs at CLI defaults: the
    whole-pyramid program, B ignored — addresses the 1080p/4K
    first-call compiles that previously paid a serial ~4 min, VERDICT
    r4 item 4).  For brox_temporal the geometry's B slot is the FRAME
    count.

    Call once per deployment shape, e.g.::

        import tpuflow
        tpuflow.warmup([(16, 436, 1024), (1, 436, 1024)])
        tpuflow.warmup([(1, 1080, 1920)], methods=("occflow", "robust_expo"))
    """
    t0 = time.perf_counter()
    procs = []
    out = None if verbose else subprocess.DEVNULL
    jobs = []
    for method in methods:
        for (B, ny, nx) in geometries:
            jobs.append((method, B, ny, nx, None))
    for (method, B, ny, nx, s) in jobs:
        args = [method, str(B), str(ny), str(nx)]
        if s is not None:
            args.append(str(s))
        procs.append(subprocess.Popen(
                [sys.executable, "-m", "tpuflow.utils.warmup", *args],
                stdout=out, stderr=out,
                env=dict(os.environ, PYTHONPATH=os.pathsep.join(
                    [os.path.dirname(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))))]
                    + [p for p in
                       os.environ.get("PYTHONPATH", "").split(os.pathsep)
                       if p]))))
    deadline = time.time() + timeout
    failed = 0
    for p, job in zip(procs, jobs):
        try:
            rc = p.wait(timeout=max(1, deadline - time.time()))
        except subprocess.TimeoutExpired:
            p.kill()
            rc = -1
        if rc != 0:
            failed += 1
            print(f"warmup: job {job} exited rc={rc}", file=sys.stderr)
    if failed:
        print(f"warmup: {failed}/{len(procs)} jobs failed "
              "(run with verbose=True for their output)", file=sys.stderr)
    return time.perf_counter() - t0


if __name__ == "__main__":
    _warm_one(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
              int(sys.argv[4]),
              int(sys.argv[5]) if len(sys.argv) > 5 else None)
