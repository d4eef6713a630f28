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


def test_hot_path_spans_fire(caplog):
    """The pipeline + model must emit the reference's stage spans
    (encode/prefill/decode analogue: mel / transcribe_dispatch /
    transcribe_fetch / decode_tokens, gguf/model.rs:784-936)."""
    import numpy as np

    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )
    tokenizer = VoxtralTokenizer([b"x "] * 500, {}, 500)
    pipe = TranscribePipeline(model, tokenizer, PipelineConfig())
    samples = (0.1 * np.sin(np.arange(16000 * 11) * 0.05)).astype(np.float32)
    with caplog.at_level(logging.INFO, logger="voxtral_tpu.profiling"):
        pipe.transcribe_samples(samples, 16000)
    messages = [r.getMessage() for r in caplog.records]
    for name in ("span mel", "span transcribe_dispatch",
                 "span transcribe_fetch", "span decode_tokens"):
        assert any(name in m for m in messages), (name, messages)

    with caplog.at_level(logging.INFO, logger="voxtral_tpu.profiling"):
        mel = np.zeros((1, 128, 64 * 16), np.float32)
        model.encode_audio(mel)
        model.transcribe_streaming(mel)
    messages = [r.getMessage() for r in caplog.records]
    assert any("span encode_audio" in m for m in messages)
    assert any("span transcribe_streaming" in m for m in messages)


def test_compilation_cache_enable(tmp_path, monkeypatch):
    from voxtral_tpu.utils import compilation_cache

    compilation_cache.enable(str(tmp_path / "cache"))
    assert (tmp_path / "cache").exists()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")
