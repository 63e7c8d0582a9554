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
    # Under the axon remote-compile service, cache POPULATION is ~17x
    # slower than a plain compile (measured: 528 s vs ~30 s for the train
    # step) but cache HITS from later processes take ~5 s. Default to off
    # there; EDGEGAUSSIANS_COMPILE_CACHE=1 opts in — worth it for
    # multi-scan sweeps, where every scan reuses the same shapes.
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") and \
            not os.environ.get("EDGEGAUSSIANS_COMPILE_CACHE"):
        return
    import jax

    path = path or os.path.expanduser("~/.cache/edgegaussians_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
