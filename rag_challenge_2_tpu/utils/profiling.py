"""Device profiling helpers.

The reference's observability is hand-rolled wall-clock dicts
(SURVEY.md §5); utils/timing.py keeps that contract, and this module adds
the device-side story the reference never had: ``jax.profiler`` traces
(viewable in TensorBoard / Perfetto) scoped around any pipeline stage.
"""

from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(trace_dir: Path | str, label: Optional[str] = None) -> Iterator[None]:
    """Capture an XLA/device trace for the enclosed block.

    Usage::

        with device_trace("traces/search"):
            engine.search(...)

    Writes a Perfetto/TensorBoard-compatible trace under ``trace_dir``.
    """
    trace_dir = str(trace_dir)
    Path(trace_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        if label:
            with jax.profiler.TraceAnnotation(label):
                yield
        else:
            yield


@contextlib.contextmanager
def annotate(label: str) -> Iterator[None]:
    """Named region inside an active trace (shows up on the timeline)."""
    with jax.profiler.TraceAnnotation(label):
        yield
