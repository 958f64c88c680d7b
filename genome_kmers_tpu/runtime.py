"""Runtime/session helpers (no reference analog — the reference has no
compiled-code cache concern; Numba caches in-process only)."""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a repo-local directory.

    Remote-TPU compiles of the sort pipeline run ~2.5-8 min per shape;
    caching them makes every repeat run (bench, profiling CLI, application
    tools) start in seconds. Verified to hit across processes on the axon
    backend. Safe to call multiple times; failures are ignored (e.g. a
    backend without cache support).
    """
    import jax

    try:
        if cache_dir is None:
            cache_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
