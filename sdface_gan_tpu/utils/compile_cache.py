"""Persistent XLA compilation cache.

First compiles of the big train/eval programs take minutes on TPU; the
persistent cache makes every later process start warm.  Call once at CLI
entry (no-op if the backend rejects it).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/sdface_gan_tpu/xla") -> None:
    try:
        import jax

        cache_dir = os.path.expanduser(path)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax or unsupported backend — compile uncached
