"""Profiling — first-class, unlike the reference's commented-out wall-clock
probes (src/xview_et/agent.py:514,579-585). Wraps ``jax.profiler`` traces."""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a jax profiler trace (viewable in TensorBoard / Perfetto) for
    the enclosed block. No-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
