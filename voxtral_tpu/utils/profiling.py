"""Profiling hooks (parity with the reference's tracing-chrome sink,
``/root/reference/src/profiling.rs``).

Two sinks, like the reference:
* stage-level spans -> structured logs (the ``tracing_subscriber::fmt``
  analogue; always available via :func:`span`);
* :func:`trace` -> a TensorBoard/Perfetto-compatible trace directory via
  ``jax.profiler`` (the ``tracing-chrome`` -> chrome://tracing analogue).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator

log = logging.getLogger("voxtral_tpu.profiling")


@contextlib.contextmanager
def span(name: str, **fields) -> Iterator[None]:
    """Log a timed span: encode_audio / prefill / decode etc.

    Mirrors the reference's tracing spans on the hot path
    (gguf/model.rs:784,878,909,936).
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        elapsed_ms = (time.perf_counter() - t0) * 1000
        extra = " ".join(f"{k}={v}" for k, v in fields.items())
        log.info("span %s elapsed_ms=%.1f %s", name, elapsed_ms, extra)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/voxtral_trace") -> Iterator[str]:
    """Capture a jax.profiler trace (view in TensorBoard or Perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", logdir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a jax.profiler trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
