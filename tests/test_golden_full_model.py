"""Full-model golden test: mel -> token IDs pinned on a synthetic checkpoint.

The per-component golden fixtures (tests/test_golden_fixtures.py) cannot
catch a silent regression in the COMPOSED pipeline — prefix-38 semantics,
position arithmetic, or the quantized-leaf dispatch.  This pins the exact
greedy token output of the whole model (reference protocol:
``scripts/reference_forward.py:1-27`` + the position-38 anomaly contract,
``voxtral.rs:275-294``) for every weight path, on a deterministic
SafeTensors checkpoint + a deterministic dual-tone input.

The pins were generated on the CPU backend (tests always force CPU,
conftest.py); XLA CPU numerics are deterministic for a fixed jax version.
If a jax upgrade legitimately shifts them, regenerate with
``python -m tests.test_golden_full_model`` and review the diff.
"""

from __future__ import annotations

import numpy as np
import pytest

from voxtral_tpu.audio import AudioBuffer, MelSpectrogram, PadConfig, pad_audio
from voxtral_tpu.config import (
    AdapterConfig,
    AudioEncoderConfig,
    AudioInputConfig,
    LanguageModelConfig,
    VoxtralConfig,
)
from voxtral_tpu.loaders.safetensors_loader import load_voxtral_params
from voxtral_tpu.models.voxtral import VoxtralModel

# Pinned greedy outputs (18 tokens each, seq 56 incl. the 38 prefix).
GOLDEN = {
    "f32": [231, 984, 231, 231, 231, 231, 231, 231, 231, 231, 104, 231,
            231, 231, 231, 231, 231, 231],
    "bf16": [231, 231, 231, 231, 231, 231, 231, 231, 231, 231, 104, 231,
             231, 231, 231, 231, 231, 231],
    "w8": [231, 984, 231, 231, 231, 231, 231, 231, 231, 231, 104, 231,
           231, 231, 231, 231, 231, 231],
    "q4": [984, 984, 624, 984, 624, 984, 624, 231, 984, 231, 624, 231,
           624, 231, 624, 231, 624, 231],
}


def golden_cfg() -> VoxtralConfig:
    """Tiny but production-structured: GQA (2Q/1KV), ADA, sliding windows,
    and dims that qualify for q4 (K % 32 == 0)."""
    return VoxtralConfig(
        audio_encoder=AudioEncoderConfig(
            dim=64, n_layers=2, n_heads=2, n_kv_heads=2, head_dim=32,
            hidden_dim=128, sliding_window=64,
        ),
        language_model=LanguageModelConfig(
            dim=64, n_layers=2, n_heads=2, n_kv_heads=1, head_dim=32,
            hidden_dim=128, vocab_size=1280, sliding_window=64,
        ),
        adapter=AdapterConfig(input_dim=256, hidden_dim=64, output_dim=64),
        audio=AudioInputConfig(),
        ada_rms_norm_t_cond_dim=8,
        downsample_factor=4,
    )


def golden_mel() -> np.ndarray:
    """Deterministic 1.5 s dual-tone -> padded log-mel [1, 128, 896]."""
    sr = 16000
    t = np.arange(int(1.5 * sr)) / sr
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1320 * t)).astype(np.float32)
    buf = AudioBuffer(sig, sr)
    buf.peak_normalize(0.95)
    padded = pad_audio(buf, PadConfig.voxtral())
    return MelSpectrogram.voxtral().compute_log_batch(padded.samples)


@pytest.fixture(scope="module")
def golden_env(tmp_path_factory):
    from safetensors.numpy import save_file

    from tests.test_safetensors_loader import synth_checkpoint

    cfg = golden_cfg()
    tensors = synth_checkpoint(cfg, np.random.default_rng(42))
    tensors = {k: (v * 0.25).astype(np.float32) for k, v in tensors.items()}
    path = tmp_path_factory.mktemp("golden") / "consolidated.safetensors"
    save_file(tensors, str(path))
    return cfg, str(path), golden_mel()


def _model(path, cfg, fmt) -> VoxtralModel:
    if fmt in ("f32", "bf16"):
        dtype = "float32" if fmt == "f32" else "bfloat16"
        return VoxtralModel(load_voxtral_params(path, cfg, dtype=dtype), cfg)
    dense = load_voxtral_params(path, cfg, dtype="float32", to_device=False)
    if fmt == "w8":
        from voxtral_tpu.utils.quantize import quantize_params_w8

        return VoxtralModel(quantize_params_w8(dense), cfg)
    from voxtral_tpu.utils.quantize import quantize_params_q4

    return VoxtralModel(quantize_params_q4(dense), cfg)


@pytest.mark.parametrize("fmt", ["f32", "bf16", "w8", "q4"])
def test_full_model_golden_tokens(golden_env, fmt):
    cfg, path, mel = golden_env
    model = _model(path, cfg, fmt)
    toks = model.transcribe_streaming(mel)
    assert toks.tolist() == GOLDEN[fmt], (fmt, toks.tolist())


def test_batch_matches_streaming_golden(golden_env):
    """Batched decode must be bit-identical to the single-stream path."""
    cfg, path, mel = golden_env
    model = _model(path, cfg, "f32")
    batch = model.transcribe_streaming_batch(np.concatenate([mel, mel], 0))
    assert batch[0].tolist() == GOLDEN["f32"]
    assert batch[1].tolist() == GOLDEN["f32"]


if __name__ == "__main__":  # fixture regeneration helper
    import tempfile

    from safetensors.numpy import save_file

    from tests.test_safetensors_loader import synth_checkpoint

    cfg = golden_cfg()
    tensors = synth_checkpoint(cfg, np.random.default_rng(42))
    tensors = {k: (v * 0.25).astype(np.float32) for k, v in tensors.items()}
    d = tempfile.mkdtemp()
    p = f"{d}/consolidated.safetensors"
    save_file(tensors, p)
    mel = golden_mel()
    for fmt in ("f32", "bf16", "w8", "q4"):
        print(fmt, _model(p, cfg, fmt).transcribe_streaming(mel).tolist())


# Streaming-session golden (same checkpoint + dual-tone, fed through
# StreamingSession in 3 pieces then finish()): the batch w8 pin plus the
# finish() right-pad rounded up to the 8-position step grid (6 more
# silence positions decoding [STREAMING_PAD]-adjacent text token 231).
STREAM_GOLDEN = GOLDEN["w8"] + [231] * 6


@pytest.mark.parametrize(
    "route", ["solo_xla", "pool_xla", "solo_ring", "solo_fused",
              "pool_fused", "pool_fused_ring"])
def test_streaming_routes_golden_tokens(golden_env, monkeypatch, route):
    """Pin the exact greedy tokens of EVERY streaming decode route on the
    synthetic checkpoint: solo/pooled, XLA/whole-stack-kernel,
    bounded/head+ring caches.  Token identity across routes is asserted
    pairwise elsewhere; this pins the actual sequences (VERDICT r2 #4a)."""
    from voxtral_tpu.streaming import StreamingSession, StreamPool

    cfg, path, _ = golden_env
    fused = route in ("solo_fused", "pool_fused", "pool_fused_ring")
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force" if fused else "0")
    model = _model(path, cfg, "w8")
    assert (model.fused_decode is not None) == fused

    sr = 16000
    t = np.arange(int(1.5 * sr)) / sr
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1320 * t)).astype(np.float32)
    sig = sig / np.abs(sig).max() * 0.95

    pool = None
    unbounded = route == "solo_ring"
    if route.startswith("pool"):
        pool = StreamPool(model, max_streams=2, step_positions=8,
                          max_duration_s=30,
                          unbounded=route.endswith("ring"))
        if fused:
            assert pool._fused is not None
    session = StreamingSession(model, step_positions=8, pool=pool,
                               unbounded=unbounded, max_duration_s=30)
    for piece in np.array_split(sig, 3):
        session.feed(piece)
    session.finish()
    assert session.tokens == STREAM_GOLDEN, (route, session.tokens)
