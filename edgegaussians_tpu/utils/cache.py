"""Persistent XLA compilation cache setup.

First compiles over the remote-TPU link are slow (minutes); the persistent
cache makes every subsequent process reuse them. Called by the CLIs and
bench.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.path.expanduser("~/.cache/edgegaussians_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
