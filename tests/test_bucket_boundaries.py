"""Shape-bucketing boundary tests (SURVEY hard part #5).

Audio lengths that land exactly on, just below, and just above bucket
boundaries must all transcribe correctly, and the bucket padding must
never change the tokens for the real (non-padded) positions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model import tiny_config
from voxtral_tpu.audio import AudioBuffer
from voxtral_tpu.models.voxtral import VoxtralModel
from voxtral_tpu.pipeline import (
    SAMPLES_PER_POSITION,
    PipelineConfig,
    TranscribePipeline,
    pad_audio_bucketed,
)
from voxtral_tpu.audio.pad import PadConfig
from voxtral_tpu.tokenizer import VoxtralTokenizer


@pytest.fixture(scope="module")
def pipeline():
    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )
    tok = VoxtralTokenizer([None] * 500, {}, 500)
    return TranscribePipeline(model, tok, PipelineConfig(bucket_positions=8))


def test_bucketed_pad_boundaries():
    cfg = PadConfig.voxtral()
    bucket = 8 * SAMPLES_PER_POSITION
    for n in [1, 2559, 2560, 2561, 10 * 2560, 10 * 2560 + 1]:
        audio = AudioBuffer(np.zeros(n, np.float32), 16000)
        padded = pad_audio_bucketed(audio, cfg, 8)
        assert len(padded.samples) % bucket == 0, n
        # Reference padding is preserved underneath (left pad + content).
        assert len(padded.samples) >= cfg.left_pad_samples() + n


@pytest.mark.parametrize(
    "extra_samples",
    [0, 1, SAMPLES_PER_POSITION - 1, SAMPLES_PER_POSITION,
     8 * SAMPLES_PER_POSITION - 1, 8 * SAMPLES_PER_POSITION],
)
def test_transcribe_at_bucket_edges(pipeline, extra_samples):
    """Lengths straddling position/bucket boundaries all run cleanly."""
    rng = np.random.default_rng(extra_samples)
    n = 4 * 16000 + extra_samples
    text = pipeline.transcribe_samples(
        rng.normal(size=n).astype(np.float32) * 0.2
    )
    assert isinstance(text, str)


def test_bucket_padding_does_not_change_real_tokens(pipeline):
    """Tokens for real positions must be identical across bucket settings
    (trailing silence only appends, never perturbs)."""
    rng = np.random.default_rng(9)
    samples = rng.normal(size=5 * 16000).astype(np.float32) * 0.2
    model = pipeline.model

    def tokens_with_bucket(bucket):
        padded = pad_audio_bucketed(
            AudioBuffer(samples.copy(), 16000), PadConfig.voxtral(), bucket
        )
        mel = pipeline.mel.compute_log_batch(padded.samples)
        return model.transcribe_streaming(mel)

    t1 = tokens_with_bucket(1)
    t16 = tokens_with_bucket(16)
    n = min(len(t1), len(t16))
    np.testing.assert_array_equal(t1[:n], t16[:n])


def test_unequal_chunk_merge_preserves_text(monkeypatch):
    """Merging unequal-length chunks into one padded batch (the decode
    cost model) must produce the same text as per-length groups."""
    import voxtral_tpu.pipeline as pl

    model = VoxtralModel.init_random(
        jax.random.PRNGKey(1), tiny_config(), dtype=jnp.float32
    )
    tok = VoxtralTokenizer([None] * 500, {}, 500)
    pipe = TranscribePipeline(
        model, tok,
        PipelineConfig(max_mel_frames=600, bucket_positions=1),
    )
    rng = np.random.default_rng(3)
    # ~1.6 chunks at 600 mel frames: one full + one short final chunk.
    samples = rng.normal(size=int(9.0 * 16000)).astype(np.float32) * 0.2

    monkeypatch.setattr(pl, "STEP_COST_C1_MS", 1e9)  # never merge
    grouped = pipe.transcribe_samples(samples)
    monkeypatch.setattr(pl, "STEP_COST_C1_MS", 0.0)  # always merge
    merged = pipe.transcribe_samples(samples)
    assert merged == grouped
