"""End-to-end model tests at tiny dims (mirrors reference voxtral.rs tests)."""

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
from voxtral_tpu.models.time_embedding import time_embedding
from voxtral_tpu.models.voxtral import (
    PREFIX_LEN,
    VoxtralModel,
    make_prefix_ids,
)


def tiny_config() -> VoxtralConfig:
    return VoxtralConfig(
        audio_encoder=AudioEncoderConfig(
            dim=64, n_layers=2, n_heads=4, n_kv_heads=4, head_dim=16,
            hidden_dim=128, sliding_window=32,
        ),
        language_model=LanguageModelConfig(
            dim=32, n_layers=2, n_heads=4, n_kv_heads=2, head_dim=8,
            hidden_dim=64, vocab_size=500, sliding_window=32,
        ),
        adapter=AdapterConfig(input_dim=64 * 4, hidden_dim=32, output_dim=32),
        audio=AudioInputConfig(),
        ada_rms_norm_t_cond_dim=8,
        downsample_factor=4,
    )


@pytest.fixture(scope="module")
def tiny_model():
    return VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )


def test_prefix():
    ids = make_prefix_ids()
    assert len(ids) == PREFIX_LEN == 38
    assert ids[0] == 1
    assert np.all(ids[1:] == 32)


def test_time_embedding_values():
    emb = time_embedding(1.0, 4)
    assert emb.shape == (1, 1, 4)
    # inv_freq = [1.0, 0.01]; [cos(1), cos(0.01), sin(1), sin(0.01)]
    np.testing.assert_allclose(
        emb[0, 0], [np.cos(1), np.cos(0.01), np.sin(1), np.sin(0.01)], atol=1e-6
    )


def test_encode_audio_shape(tiny_model):
    # mel time 64 -> conv /4 -> 16 -> reshape /4 -> 4 positions of llm dim.
    mel = jnp.zeros((1, 128, 64), jnp.float32)
    out = tiny_model.encode_audio(mel)
    assert out.shape == (1, 4, 32)


def test_forward_shape(tiny_model):
    mel = jnp.zeros((1, 128, 64), jnp.float32)
    t_embed = tiny_model.t_embed(6.0)
    logits = tiny_model.forward(mel, t_embed)
    assert logits.shape == (1, 4, 500)


def test_forward_streaming_shape(tiny_model):
    mel = jnp.zeros((1, 128, 64), jnp.float32)
    tokens = jnp.full((1, 4), 32, jnp.int32)
    logits = tiny_model.forward_streaming(mel, tokens, tiny_model.t_embed())
    assert logits.shape == (1, 4, 500)


def test_transcribe_too_short_returns_empty(tiny_model):
    mel = jnp.zeros((1, 128, 64), jnp.float32)  # 4 positions < 39
    out = tiny_model.transcribe_streaming(mel)
    assert out.shape == (0,)


def test_transcribe_streaming_runs(tiny_model):
    # Need S >= 39 decoder positions -> mel T >= 39*16 = 624.
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 42 * 16), jnp.float32)
    out = tiny_model.transcribe_streaming(mel)
    assert out.shape == (42 - PREFIX_LEN,)
    assert out.dtype == np.int32
    assert np.all(out >= 0) and np.all(out < 500)


def test_transcribe_batch_matches_single(tiny_model):
    """Batched chunk decode must equal per-chunk single decode."""
    mel_a = jax.random.normal(jax.random.PRNGKey(5), (1, 128, 41 * 16), jnp.float32) * 0.3
    mel_b = jax.random.normal(jax.random.PRNGKey(6), (1, 128, 41 * 16), jnp.float32) * 0.3

    single_a = tiny_model.transcribe_streaming(mel_a)
    single_b = tiny_model.transcribe_streaming(mel_b)

    batch = tiny_model.transcribe_streaming_batch(
        jnp.concatenate([mel_a, mel_b], axis=0)
    )
    assert batch.shape == (2, 41 - PREFIX_LEN)
    np.testing.assert_array_equal(batch[0], single_a)
    np.testing.assert_array_equal(batch[1], single_b)


def test_transcribe_matches_naive_loop(tiny_model):
    """The scanned on-device loop must match a step-by-step host loop built
    from the cache-free full forward (greedy feedback equivalence)."""
    from voxtral_tpu.models.voxtral import encode_audio_fn

    cfg = tiny_model.config
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 41 * 16), jnp.float32) * 0.3
    t_embed = tiny_model.t_embed(6.0)

    fast = tiny_model.transcribe_streaming(mel)

    # Naive reference: at each position, run the FULL cache-free forward over
    # all inputs so far and take the last logits (O(n^2), like the reference's
    # non-cached path).
    from voxtral_tpu.models.decoder import (
        decoder_forward_hidden,
        embed_tokens,
        lm_head,
    )

    audio = encode_audio_fn(tiny_model.params, mel, cfg)
    s = audio.shape[1]
    generated = list(make_prefix_ids())
    for pos in range(PREFIX_LEN, s):
        ids = jnp.asarray(generated, jnp.int32)[None, :]
        text = embed_tokens(tiny_model.params["decoder"], ids)
        inputs = audio[:, :pos, :] + text
        hidden = decoder_forward_hidden(
            tiny_model.params["decoder"], inputs, t_embed, cfg.language_model
        )
        logits = lm_head(tiny_model.params["decoder"], hidden)
        generated.append(int(jnp.argmax(logits[0, -1])))

    np.testing.assert_array_equal(fast, np.array(generated[PREFIX_LEN:], np.int32))


def test_sampling_transcribe(tiny_model):
    """temperature>0 produces valid tokens; temperature=0 stays greedy
    and bit-identical to the default path; sampling is seed-deterministic."""
    rng = np.random.default_rng(4)
    mel = (rng.normal(size=(1, 128, 48 * 16)) * 0.3).astype(np.float32)

    greedy = tiny_model.transcribe_streaming(mel)
    greedy2 = tiny_model.transcribe_streaming(mel, temperature=0.0)
    assert np.array_equal(greedy, greedy2)

    s1 = tiny_model.transcribe_streaming(mel, temperature=0.8, top_k=8, seed=1)
    s2 = tiny_model.transcribe_streaming(mel, temperature=0.8, top_k=8, seed=1)
    s3 = tiny_model.transcribe_streaming(mel, temperature=0.8, top_k=8, seed=2)
    assert s1.shape == greedy.shape
    assert np.array_equal(s1, s2), "sampling must be seed-deterministic"
    assert s1.dtype == np.int32
    vocab = tiny_model.config.language_model.vocab_size
    assert s1.min() >= 0 and s1.max() < vocab
    # different seeds should (overwhelmingly) differ on a random model
    assert not np.array_equal(s1, s3) or len(s1) < 4
