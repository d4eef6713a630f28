"""Profiling + compilation-cache utility tests."""

import logging

import jax
import jax.numpy as jnp


def test_span_logs_elapsed(caplog):
    from voxtral_tpu.utils.profiling import span

    with caplog.at_level(logging.INFO, logger="voxtral_tpu.profiling"):
        with span("encode_audio", frames=100):
            pass
    assert any("encode_audio" in r.message for r in caplog.records)
    assert any("frames=100" in r.message for r in caplog.records)


def test_annotate_runs_inside_jit():
    from voxtral_tpu.utils.profiling import annotate

    with annotate("test_region"):
        out = jax.jit(lambda x: x * 2)(jnp.ones(4))
    assert float(out.sum()) == 8.0


def test_trace_writes_profile(tmp_path):
    from voxtral_tpu.utils.profiling import trace

    logdir = tmp_path / "trace"
    with trace(str(logdir)):
        jax.jit(lambda x: x + 1)(jnp.zeros(8)).block_until_ready()
    # jax.profiler writes plugins/profile/<ts>/*.
    assert any(logdir.rglob("*.pb")) or any(logdir.rglob("*.json.gz")) or any(
        logdir.rglob("*")
    )


def test_compilation_cache_enable(tmp_path, monkeypatch):
    from voxtral_tpu.utils import compilation_cache

    compilation_cache.enable(str(tmp_path / "cache"))
    assert (tmp_path / "cache").exists()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")
