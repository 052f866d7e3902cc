"""Persistent XLA compilation cache setup.

The scatter/one-hot-heavy preprocessing programs take minutes to compile the
first time (especially through the tunneled TPU backend); the persistent
cache makes that a once-per-machine cost.  Call early, before the first jit.
"""

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> None:
    path = path or os.environ.get("POINTNAV_VO_TPU_CACHE", _DEFAULT)
    # PNVO_FORCE_CPU=1: run on host CPU even where the accelerator plugin
    # ignores the JAX_PLATFORMS env var (the tunneled-TPU image does; only
    # the config knob is honored).  Every example/tool calls this before
    # first jit, so this is the one switch that works everywhere.
    if os.environ.get("PNVO_FORCE_CPU", "0") == "1":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
