"""Device tracing hooks (the reference has wall-clock meters only).

The reference's observability is AverageMeter prints (utils.py:47-63);
its TPU-native upgrade is a real device trace.  ``trace_steps`` wraps a
window of training steps in a ``jax.profiler`` trace (viewable in
TensorBoard / Perfetto), and ``annotate`` names host-side phases so data
time vs. device time is attributable in the trace.

Usage (wired into the drivers via ``GLL_PROFILE_DIR``):

    with trace_steps(profile_dir, enabled=epoch == 2):
        for batch in loader: ...
"""
from __future__ import annotations

import contextlib

import jax

__all__ = ["trace_steps", "annotate"]


@contextlib.contextmanager
def trace_steps(trace_dir: str | None, enabled: bool = True):
    """Trace the enclosed steps to ``trace_dir`` (no-op if dir is falsy)."""
    if not trace_dir or not enabled:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {trace_dir}")


def annotate(name: str):
    """Named host-phase annotation appearing on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)
