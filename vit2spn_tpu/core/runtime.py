"""Process-level runtime setup shared by the user-facing entry points.

The reference has no equivalent (each script re-pays full warmup;
`cudnn.benchmark=True` at ssp_vit2spn_tiny.py:28 is its only compile-time
lever). On TPU the full train-step AOT compile is host-CPU-bound and takes
3-8 minutes, dominating short protocol runs — JAX's persistent compilation
cache removes it for every process after the first. Verified to round-trip
through the axon remote-compile path: a second identical `bench.py` run
drops from ~570 s to ~101 s (VALIDATION.md).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache at `path`.

    Respects an existing JAX_COMPILATION_CACHE_DIR environment setting (jax
    reads it itself — nothing to do). Returns the cache directory in use,
    or None if configuration failed (never fatal: the cache is an
    optimization, not a requirement).
    """
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        return env
    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "vit2spn_tpu", "xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # default threshold is 1 s; raise slightly so the cache holds the
        # big train/eval executables rather than thousands of tiny ones
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        return path
    except Exception:  # pragma: no cover - best-effort
        return None
