"""The CLI device backends must persist compiles across processes (the
reference binary has zero warm-up; VERDICT round-1 item 5)."""

import os

import jax

from lzani_tpu.matcher import _enable_compile_cache


def test_cache_dir_configured(tmp_path, monkeypatch):
    loc = str(tmp_path / "cache")
    monkeypatch.setenv("LZANI_TPU_CACHE", loc)
    _enable_compile_cache()
    assert jax.config.jax_compilation_cache_dir == loc
    assert os.path.isdir(loc)


def test_cache_disable(monkeypatch):
    monkeypatch.setenv("LZANI_TPU_CACHE", "0")
    before = jax.config.jax_compilation_cache_dir
    _enable_compile_cache()
    assert jax.config.jax_compilation_cache_dir == before
