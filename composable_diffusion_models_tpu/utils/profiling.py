"""Tracing / profiling hooks (SURVEY.md §5.1 — new capability; the reference
has only tqdm bars). Wraps jax.profiler for Perfetto traces plus a simple
step-time context, exposed through the CLI --profile flag."""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def maybe_profile(enabled: bool, out_dir: str = "outputs/profile"):
    """Capture a Perfetto/XPlane trace of the enclosed block when enabled."""
    if not enabled:
        yield
        return
    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labelling regions inside a profile."""
    return jax.profiler.TraceAnnotation(name)
