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
