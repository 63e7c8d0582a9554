"""Persistent XLA compilation cache setup.

First compiles over the remote-TPU link are slow (minutes); the persistent
cache makes every subsequent process reuse them. Called by the CLIs and
bench.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("EDGEGAUSSIANS_NO_COMPILE_CACHE"):
        return
    # The axon remote-compile service stalls (observed: >25 min for a graph
    # that compiles in ~5 min cacheless) when the persistent cache is on;
    # skip it there.
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE"):
        return
    import jax

    path = path or os.path.expanduser("~/.cache/edgegaussians_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
