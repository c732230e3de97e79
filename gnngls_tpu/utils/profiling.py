"""Profiling helpers: device traces + named regions.

The reference's only tracing is wall-clock {time, cost} rows appended per
accepted move (gnngls/algorithms.py:127-130) — reproduced on-device by
search/local_search.Trace.  This module adds the TPU-native layer on top:
XLA/TPU profiler traces (viewable in TensorBoard / Perfetto) and named
regions so search chunks and train steps show up labeled on the timeline.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (host + device timelines) into logdir."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region context for the profiler timeline (host-side scope)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def step_annotation(name: str, step: int):
    """Step marker so repeated regions group in trace viewers."""
    with jax.profiler.StepTraceAnnotation(name, step_num=step):
        yield
