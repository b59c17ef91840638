"""Profiling helpers: jax.profiler traces and step timing.

The reference's only performance instrumentation is wall-clock prints
(SURVEY §5); here tracing is a first-class utility — wrap any hot region in
:func:`trace` to get a TensorBoard-compatible profile with XLA op/fusion
breakdowns, or annotate sections with :func:`annotate`.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/t2igan_profile"):
    """Capture a jax.profiler trace of the enclosed region.

    View with ``tensorboard --logdir <log_dir>`` (the profile plugin) or
    xprof.  Usage::

        with trace("/tmp/prof"):
            for _ in range(10):
                state, _ = step(state, batch)
            jax.block_until_ready(state)
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation context for profile readability."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def timed(label: str, result: dict | None = None):
    """Host wall-clock timer; writes seconds into ``result[label]``."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if result is not None:
        result[label] = dt
