"""JAX runtime setup shared by all CLI entry points.

Persistent compiled programs are a serving requirement (SURVEY.md §7: "p50 ≤10 ms
serving requires persistent compiled programs — no per-query retrace"): the on-disk
compilation cache makes warm-up a one-time cost per machine instead of per process.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/aiis_tpu/jax_compilation")


def enable_persistent_compile_cache(cache_dir: str = "") -> None:
    # Respect an explicit JAX_COMPILATION_CACHE_DIR: silently redirecting to the
    # module default split compiles across two cache dirs and cost a ~4-minute
    # recompile for anything warmed under the other one.
    cache_dir = (
        cache_dir
        or os.environ.get("AIIS_JAX_CACHE_DIR")
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_CACHE_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    # An explicit JAX_PLATFORMS env request is authoritative: some PJRT plugin
    # hooks (e.g. the axon TPU relay's get_backend override) initialize their
    # backend regardless of the env var and hang forever when unreachable;
    # only the config value stops them. No-op when they already agree.
    plats = os.environ.get("JAX_PLATFORMS")
    if plats and jax.config.jax_platforms != plats:
        jax.config.update("jax_platforms", plats)

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
