"""Structured logging and profiling hooks.

The reference has no tracing/profiling story beyond bare prints
(SURVEY.md §5).  Here every pipeline stage and hot entry point can be
wrapped in :func:`timed` (wall-clock + structured logger) and, when a
trace directory is configured, in an XLA profiler trace viewable in
TensorBoard/Perfetto (``jax.profiler``).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

logger = logging.getLogger("cora_tpu")

_TRACE_DIR = os.environ.get("CORA_TPU_TRACE_DIR")


def set_trace_dir(path: str | None):
    """Enable (or disable with None) XLA profiler traces for timed blocks."""
    global _TRACE_DIR
    _TRACE_DIR = path


@contextlib.contextmanager
def timed(name: str, level: int = logging.INFO, **fields):
    """Time a block; log ``name took 1.23s`` plus structured fields.

    If a trace directory is set (``CORA_TPU_TRACE_DIR`` or
    :func:`set_trace_dir`), the block also runs under
    ``jax.profiler.trace`` so device timelines land on disk.
    """
    ctx = contextlib.nullcontext()
    if _TRACE_DIR:
        import jax

        ctx = jax.profiler.trace(_TRACE_DIR)
    t0 = time.perf_counter()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    extra = "".join(f" {k}={v}" for k, v in fields.items())
    logger.log(level, "%s took %.3fs%s", name, dt, extra)


def annotate(name: str):
    """Named XLA trace annotation for a sub-region of a jitted program."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def stage(name: str):
    """Name a traced sub-region of a jitted program (jax.named_scope).

    Zero runtime cost: the name lands in HLO op metadata, so XLA profiles
    (``timed`` with a trace dir, or ``jax.profiler``) attribute device time
    to synthesis stages (draw / legendre / ring_eq / ring_cap / ...).
    """
    import jax

    return jax.named_scope(name)
