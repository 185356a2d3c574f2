"""Persistent XLA compilation cache.

Remote compiles of the large kernel-bearing programs take minutes through
the axon TPU tunnel and have crashed the TPU worker mid-compile (2026-08);
a persistent on-disk cache makes every entry point (bench.py, the CLI, the
protocol runner) resilient: each program is compiled at most once per
machine, and re-runs load in seconds.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "PSYS_JAX_CACHE", os.path.expanduser("~/.cache/psys_jax")
)


def enable_persistent_cache(path: str | None = None) -> str:
    """Idempotently point jax at an on-disk compilation cache."""
    import jax

    d = path or _DEFAULT_DIR
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
    return d
