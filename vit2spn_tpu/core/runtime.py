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

# hit/miss observability: a cache that silently recompiles is worse than no
# cache (round-2 finding: the warm ft-octmnist rerun recompiled fold 0 with
# no visible signal). Per-module names come from the jax._src.compiler log
# points (every lookup); the monitoring-event counters only fire for
# compiles long enough to be persisted, so they are the fallback when the
# private log-point wrap is unavailable.
_STATS = {"event_hits": 0, "event_misses": 0,
          "hit_modules": [], "miss_modules": [],
          "wrap_failed": False}
_INSTALLED = False


def _on_event(event: str, **kw) -> None:
    if event == "/jax/compilation_cache/cache_hits":
        _STATS["event_hits"] += 1
    elif event == "/jax/compilation_cache/cache_misses":
        _STATS["event_misses"] += 1


def _install_observers() -> None:
    global _INSTALLED
    if _INSTALLED:
        return
    from jax._src import monitoring

    monitoring.register_event_listener(_on_event)
    # per-executable names: wrap the compiler's hit/miss log points rather
    # than forcing the logger to DEBUG (which floods stderr under handlers
    # configured by the runtime). Private API — guarded, counters above
    # still work without it.
    try:
        from jax._src import compiler as _compiler

        _orig_hit = _compiler.log_persistent_cache_hit
        _orig_miss = _compiler.log_persistent_cache_miss

        # variadic: a jax-internal signature change must degrade the
        # observability, not crash the compile path at call time
        def _hit(*args, **kwargs):
            if args:
                _STATS["hit_modules"].append(str(args[0]))
            _orig_hit(*args, **kwargs)

        def _miss(*args, **kwargs):
            if args:
                _STATS["miss_modules"].append(str(args[0]))
            _orig_miss(*args, **kwargs)

        _compiler.log_persistent_cache_hit = _hit
        _compiler.log_persistent_cache_miss = _miss
    except Exception:  # pragma: no cover - names are best-effort
        # remember the degradation so report_cache can say counts come from
        # the event counters (which only see persist-threshold compiles) —
        # a silently weaker counter source must be visible (ADVICE r3)
        _STATS["wrap_failed"] = True
    _INSTALLED = True


def cache_stats() -> dict:
    """Persistent-cache counters for THIS process: executables served from
    the cache (hits) vs compiled (misses), with module names. Counts derive
    from the per-lookup module lists so they match the names shown; if the
    log-point wrap failed, fall back to jax's monitoring events (which only
    count compiles long enough to be persisted)."""
    hit_m, miss_m = _STATS["hit_modules"], _STATS["miss_modules"]
    wrapped = bool(hit_m or miss_m)
    return {
        "hits": len(hit_m) if wrapped else _STATS["event_hits"],
        "misses": len(miss_m) if wrapped else _STATS["event_misses"],
        "hit_modules": list(hit_m),
        "miss_modules": list(miss_m),
    }


def report_cache(echo=print) -> dict:
    """One-line end-of-run cache summary (+ a loud note on misses so a
    silently-bypassed cache is visible without a stopwatch)."""
    s = cache_stats()
    if _STATS["wrap_failed"]:
        echo(
            "[compilation-cache] note: per-module log points unavailable in "
            "this jax version — counts fall back to event counters, which "
            "only see compiles long enough to be persisted"
        )
    if s["hits"] or s["misses"]:
        echo(
            f"[compilation-cache] {s['hits']} hit(s), {s['misses']} miss(es)"
            + (
                "; missed: " + ", ".join(sorted(set(s["miss_modules"]))[:8])
                if s["miss_modules"] else ""
            )
        )
        # warn on the event counter: it fires only for compiles long enough
        # to be persisted, so one trivial sub-threshold miss (which could
        # never have hit) doesn't cry wolf
        if _STATS["event_misses"] and s["hits"] == 0 and _warm_dir_nonempty():
            echo(
                "[compilation-cache] WARNING: cache directory is non-empty "
                "but nothing hit — artifacts were rejected or keys changed "
                "(rerun with JAX_EXPLAIN_CACHE_MISSES=1 for per-key detail)"
            )
    return s


def _warm_dir_nonempty() -> bool:
    import jax

    d = jax.config.jax_compilation_cache_dir
    try:
        return bool(d) and any(os.scandir(d))
    except OSError:
        return False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache at `path` + hit/miss
    observability (cache_stats/report_cache).

    Respects an existing JAX_COMPILATION_CACHE_DIR environment setting (jax
    reads it itself — we still install the observers). Returns the cache
    directory in use, or None if configuration failed (never fatal: the
    cache is an optimization, not a requirement).
    """
    try:
        _install_observers()
        if os.environ.get("JAX_EXPLAIN_CACHE_MISSES"):
            import jax

            jax.config.update("jax_explain_cache_misses", True)
    except Exception:  # pragma: no cover - observability is best-effort
        pass
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
