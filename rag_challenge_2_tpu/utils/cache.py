"""Persistent XLA compilation cache.

The TPU terminal in this environment compiles through a remote-compile
tunnel with no server-side cache: a cold flax-encoder compile measured
~450 s, a cache-hit run ~4 s.  Enabling JAX's persistent cache (repo-local
by default) makes every entry point — bench, CLI, driver compile checks —
pay that cost once per machine instead of once per process.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENABLED = False


def enable_compile_cache(path: str | None = None) -> None:
    """Idempotently enable the persistent compilation cache."""
    global _ENABLED
    if _ENABLED:
        return
    import jax

    cache_dir = path or os.environ.get(
        "RAGTPU_COMPILE_CACHE", str(Path(__file__).resolve().parents[2] / ".jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ENABLED = True
    except Exception:
        pass  # older jax or read-only fs — cache is an optimization only
