"""Persistent XLA compilation cache.

First compiles of the big train/eval programs take minutes on TPU; the
persistent cache makes every later process start warm.  Call once at CLI
entry (no-op if the backend rejects it).
"""

from __future__ import annotations

import hashlib
import os


def host_cpu_feature_tag() -> str:
    """Short hash of the host CPU feature flags (``/proc/cpuinfo``).

    Persistent-cache entries for the CPU backend embed AOT host code
    specialized to the build machine's CPU features; loading them on a
    host with a different feature set makes XLA warn about a machine
    mismatch and can SIGILL outright.  Hashing the (sorted) ``flags``
    line gives a stable per-feature-set key: a matching host reuses the
    committed cache, a mismatched host falls back to a cold compile.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "nocpuinfo"


def enable_compilation_cache(
    path: str = "~/.cache/sdface_gan_tpu/xla", host_keyed: bool = False
) -> None:
    try:
        import jax

        cache_dir = os.path.expanduser(path)
        if host_keyed:
            cache_dir = os.path.join(cache_dir, host_cpu_feature_tag())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax or unsupported backend — compile uncached
