"""Speculative one-shot transcribe (the CLI / pipeline / bench path).

``transcribe_streaming(speculative=K)`` replaces the per-position decode
scan with a while-loop of ``decode_stack_step(spec=K)`` passes — each
pass verifies K drafted tokens per batch row in ONE weight pass, each
row advancing by its own exact-greedy accepted count.  Tokens must be
IDENTICAL to the sequential scan for any draft policy, any K, any
weight mode (w8 / q4g / bf16), solo or batched — the draft only moves
throughput.  The streaming-session analogue is pinned in
tests/test_spec_decode.py; this file covers the one-shot path the
reference's e2e bench exercises (/root/reference/src/bin/e2e_bench.rs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxtral_tpu.config import (
    AdapterConfig,
    AudioEncoderConfig,
    AudioInputConfig,
    LanguageModelConfig,
    VoxtralConfig,
)
from voxtral_tpu.models.voxtral import VoxtralModel


def _tiny_cfg() -> VoxtralConfig:
    return VoxtralConfig(
        audio_encoder=AudioEncoderConfig(
            dim=64, n_layers=2, n_heads=4, n_kv_heads=4, head_dim=16,
            hidden_dim=128, sliding_window=32,
        ),
        language_model=LanguageModelConfig(
            dim=64, n_layers=2, n_heads=4, n_kv_heads=2, head_dim=16,
            hidden_dim=128, vocab_size=512, sliding_window=64,
        ),
        adapter=AdapterConfig(input_dim=256, hidden_dim=64, output_dim=64),
        audio=AudioInputConfig(),
        ada_rms_norm_t_cond_dim=8,
        downsample_factor=4,
    )


def _g32_cfg() -> VoxtralConfig:
    """q4g needs every contraction dim % 128."""
    return VoxtralConfig(
        audio_encoder=AudioEncoderConfig(
            dim=128, n_layers=2, n_heads=2, n_kv_heads=2, head_dim=64,
            hidden_dim=256, sliding_window=64,
        ),
        language_model=LanguageModelConfig(
            dim=128, n_layers=2, n_heads=2, n_kv_heads=1, head_dim=64,
            hidden_dim=256, vocab_size=1280, sliding_window=64,
        ),
        adapter=AdapterConfig(input_dim=512, hidden_dim=128,
                              output_dim=128),
        audio=AudioInputConfig(),
        ada_rms_norm_t_cond_dim=8,
        downsample_factor=4,
    )


def _mel(cfg, frames=64 * 16, b=1, seed=5, scale=0.3):
    return jax.random.normal(
        jax.random.PRNGKey(seed), (b, cfg.audio.num_mel_bins, frames),
        jnp.float32) * scale


@pytest.fixture(scope="module")
def w8_model():
    import os

    from voxtral_tpu.utils.quantize import quantize_params_w8

    prev = os.environ.get("VOXTRAL_MEGAKERNEL")
    os.environ["VOXTRAL_MEGAKERNEL"] = "force"
    try:
        cfg = _tiny_cfg()
        dense = VoxtralModel.init_random(
            jax.random.PRNGKey(0), cfg, dtype=jnp.float32).params
        m = VoxtralModel(quantize_params_w8(dense), cfg)
        assert m.fused_decode is not None
        yield m
    finally:
        if prev is None:
            os.environ.pop("VOXTRAL_MEGAKERNEL", None)
        else:
            os.environ["VOXTRAL_MEGAKERNEL"] = prev


@pytest.mark.parametrize("spec_k", [2, 4, 8])
@pytest.mark.parametrize("draft", ["pad", "ngram"])
def test_spec_transcribe_matches_sequential(w8_model, spec_k, draft):
    mel = _mel(w8_model.config)
    ref = w8_model.transcribe_streaming(mel)
    assert len(ref) > 0
    got = w8_model.transcribe_streaming(mel, speculative=spec_k,
                                        draft=draft)
    np.testing.assert_array_equal(got, ref)


def test_spec_transcribe_batched(w8_model):
    mel = _mel(w8_model.config)
    mel3 = jnp.concatenate([mel, mel * 0.9, mel * 1.1], axis=0)
    ref = w8_model.transcribe_streaming_batch(mel3)
    got = w8_model.transcribe_streaming_batch(mel3, speculative=4)
    np.testing.assert_array_equal(got, ref)
    # Rows must advance independently: different audio -> different rows.
    assert got.shape[0] == 3


def test_spec_transcribe_short_windows(w8_model):
    """K > n_steps (adv clamps to the remaining positions) and
    n_steps == 0 (spec gate refuses; sequential scan handles the single
    prefill token) must both match the sequential path."""
    mel41 = _mel(w8_model.config, frames=41 * 16)  # n_steps = 2 < K = 8
    np.testing.assert_array_equal(
        w8_model.transcribe_streaming(mel41, speculative=8),
        w8_model.transcribe_streaming(mel41))
    mel39 = _mel(w8_model.config, frames=39 * 16)  # n_steps = 0
    np.testing.assert_array_equal(
        w8_model.transcribe_streaming(mel39, speculative=8),
        w8_model.transcribe_streaming(mel39))


def test_spec_transcribe_sampling_falls_back(w8_model):
    """temperature > 0 must ride the sequential scan (spec is greedy-only)
    and still produce valid tokens."""
    mel = _mel(w8_model.config)
    toks = w8_model.transcribe_streaming(
        mel, temperature=0.8, top_k=4, speculative=4)
    assert toks.shape == w8_model.transcribe_streaming(mel).shape


def test_spec_transcribe_bad_draft_policy(w8_model):
    mel = _mel(w8_model.config)
    with pytest.raises(ValueError, match="draft policy"):
        w8_model.transcribe_streaming(mel, speculative=4, draft="oracle")


def test_spec_transcribe_q4g(monkeypatch):
    """Exact-Q4_0 (g32) stack mode composes with the spec while-loop."""
    from voxtral_tpu.utils.quantize import quantize_params_q4

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = _g32_cfg()
    dense = VoxtralModel.init_random(
        jax.random.PRNGKey(2), cfg, dtype=jnp.float32).params
    q4g = quantize_params_q4(
        jax.tree_util.tree_map(np.asarray, dense), pack=False)
    m = VoxtralModel(q4g, cfg)
    assert m.megakernel_weights == "q4g"
    mel = _mel(cfg, seed=6)
    ref = m.transcribe_streaming(mel)
    got = m.transcribe_streaming(mel, speculative=4)
    np.testing.assert_array_equal(got, ref)


def test_spec_transcribe_bf16(monkeypatch):
    """Dense bf16 stack mode composes with the spec while-loop."""
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = _g32_cfg()
    m = VoxtralModel.init_random(jax.random.PRNGKey(2), cfg,
                                 dtype=jnp.bfloat16)
    assert m.megakernel_weights == "bf16"
    mel = _mel(cfg, seed=6)
    ref = m.transcribe_streaming(mel)
    got = m.transcribe_streaming(mel, speculative=4)
    np.testing.assert_array_equal(got, ref)


def test_spec_transcribe_dp_mesh(monkeypatch):
    """Spec rows shard over a data-parallel mesh in whole streams
    (dp_decode_stack_step(spec=K)); tokens identical to the solo
    single-device spec AND the sequential scan."""
    from voxtral_tpu.parallel import make_mesh
    from voxtral_tpu.utils.quantize import quantize_params_w8

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = _tiny_cfg()
    dense = VoxtralModel.init_random(
        jax.random.PRNGKey(0), cfg, dtype=jnp.float32).params
    w8 = quantize_params_w8(dense)
    solo = VoxtralModel(w8, cfg)
    mel = _mel(cfg)
    mel2 = jnp.concatenate([mel, mel * 0.9], axis=0)
    ref = solo.transcribe_streaming_batch(mel2)

    mesh = make_mesh(n_data=2, n_model=1)
    dp = VoxtralModel(w8, cfg, mesh=mesh)
    assert dp.fused_decode is not None
    got = dp.transcribe_streaming_batch(mel2, speculative=4)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("draft", ["pad", "ngram"])
def test_spec_transcribe_tp_mesh(monkeypatch, draft):
    """Spec passes ride the TP half-kernels + the vocab-sharded greedy
    lm fold (tp_decode_step(spec=K) — psums carry batch*K rows); tokens
    identical to the sequential TP scan (whose identity vs the solo
    single-device path is pinned in tests/test_parallel.py)."""
    from voxtral_tpu.parallel import make_mesh
    from voxtral_tpu.utils.quantize import quantize_params_w8

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = _tiny_cfg()
    dense = VoxtralModel.init_random(
        jax.random.PRNGKey(0), cfg, dtype=jnp.float32).params
    mesh = make_mesh(n_data=1, n_model=2)
    tp = VoxtralModel(quantize_params_w8(dense), cfg, mesh=mesh)
    assert tp.fused_tp is not None
    mel = _mel(cfg)
    ref = tp.transcribe_streaming(mel)
    got = tp.transcribe_streaming(mel, speculative=4, draft=draft)
    np.testing.assert_array_equal(got, ref)


def test_spec_transcribe_dp_tp_mesh(monkeypatch):
    """dp x tp composition: whole rows shard over the data axis
    (data_axis= on the spec half-kernels and the lm fold), heads/F rows
    over the model axis."""
    from voxtral_tpu.parallel import make_mesh
    from voxtral_tpu.utils.quantize import quantize_params_w8

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = _tiny_cfg()
    dense = VoxtralModel.init_random(
        jax.random.PRNGKey(0), cfg, dtype=jnp.float32).params
    mesh = make_mesh(n_data=2, n_model=2)
    m = VoxtralModel(quantize_params_w8(dense), cfg, mesh=mesh)
    assert m.fused_tp is not None
    mel = _mel(cfg)
    mel2 = jnp.concatenate([mel, mel * 0.9], axis=0)
    ref = m.transcribe_streaming_batch(mel2)
    got = m.transcribe_streaming_batch(mel2, speculative=4)
    np.testing.assert_array_equal(got, ref)


def test_spec_pipeline_end_to_end(w8_model):
    """PipelineConfig(speculative=K) rides the chunked pipeline and
    produces the same text as the sequential pipeline."""
    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    tok = VoxtralTokenizer([None] * 2000, {}, 2000)
    rng = np.random.default_rng(7)
    audio = rng.normal(size=16000 * 8).astype(np.float32) * 0.25
    seq = TranscribePipeline(
        w8_model, tok, PipelineConfig(max_mel_frames=400))
    spec = TranscribePipeline(
        w8_model, tok,
        PipelineConfig(max_mel_frames=400, speculative=4))
    assert spec.transcribe_samples(audio, 16000) == \
        seq.transcribe_samples(audio, 16000)
