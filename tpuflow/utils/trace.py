"""Profiling hooks.

The reference has no tracing at all — only `verbose` flags printing
scale/warp/iteration/error to stderr (SURVEY.md §5.1, e.g. reference
src/tvl1flow.cpp:184-188).  tpuflow wraps solver phases in
`jax.profiler` trace annotations so device timelines (XProf/TensorBoard)
show pyramid levels and warp loops by name; the same scopes are cheap
no-ops when no profiler is attached.
"""

import contextlib

import jax


@contextlib.contextmanager
def trace_scope(name):
    """Named profiler scope around a solver phase (host-side trace
    annotation; shows up in captured device profiles)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_server(port=9999):
    """Start the on-demand profiler server (connect with XProf)."""
    jax.profiler.start_server(port)
