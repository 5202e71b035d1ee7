"""core/runtime.py — persistent-compilation-cache setup."""

import os

from vit2spn_tpu.core.runtime import enable_compilation_cache


def test_respects_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "envdir"))
    # jax reads the env var itself; the helper must not override it
    assert enable_compilation_cache(str(tmp_path / "other")) == str(
        tmp_path / "envdir"
    )
    assert not (tmp_path / "other").exists()


def test_creates_and_configures_default_dir(monkeypatch, tmp_path):
    import jax

    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    target = tmp_path / "xla-cache"
    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        got = enable_compilation_cache(str(target))
        assert got == str(target)
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 5.0
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)


def test_cache_stats_count_hits_and_misses(monkeypatch, tmp_path):
    """Hit/miss observability: a fresh compile is a miss, a second process's
    compile would be a hit — simulated here by clearing jax's in-memory
    executable cache so the persistent layer serves the second lookup."""
    import jax
    import jax.numpy as jnp

    from vit2spn_tpu.core import runtime

    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        runtime.enable_compilation_cache(str(tmp_path / "cache"))
        # let even sub-second compiles persist for the test
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        base = runtime.cache_stats()

        f = jax.jit(lambda x: jnp.sin(x) @ x.T + 3)
        f(jnp.ones((64, 64))).block_until_ready()
        s1 = runtime.cache_stats()
        assert s1["misses"] >= base["misses"] + 1

        jax.clear_caches()  # forces a persistent-cache lookup on re-jit
        f2 = jax.jit(lambda x: jnp.sin(x) @ x.T + 3)
        f2(jnp.ones((64, 64))).block_until_ready()
        s2 = runtime.cache_stats()
        assert s2["hits"] >= s1["hits"] + 1

        lines = []
        out = runtime.report_cache(echo=lines.append)
        assert lines and "[compilation-cache]" in lines[0]
        assert out["hits"] == s2["hits"]
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
