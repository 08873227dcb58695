"""Stage-timing contract.

The reference threads hand-rolled wall-clock dicts through every layer
(reference src/retrieval.py:813-818, src/questions_processing.py:588-598) and
surfaces them in the UI.  We keep that *contract* — a flat ``dict[str, float]``
of stage → seconds — but measure device work correctly by blocking on
computation results before stopping the clock.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulates per-stage wall seconds; device-aware."""

    def __init__(self) -> None:
        self.stages: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def record(self, name: str, seconds: float) -> None:
        self.stages[name] = self.stages.get(name, 0.0) + seconds

    def as_dict(self) -> Dict[str, float]:
        return dict(self.stages)


@contextlib.contextmanager
def timed(out: Optional[Dict[str, float]], name: str, block_on=None):
    """Lightweight one-off variant writing into a caller-supplied dict."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block_on is not None:
            jax.block_until_ready(block_on)
        if out is not None:
            out[name] = out.get(name, 0.0) + time.perf_counter() - t0
