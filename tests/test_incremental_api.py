"""Cache-level API parity tests (reference voxtral.rs:216-269)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model import tiny_config, tiny_model  # noqa: F401
from voxtral_tpu.models.voxtral import VoxtralModel


@pytest.fixture(scope="module")
def model():
    return VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )


def test_encode_audio_with_cache_single_chunk_matches_batch(model):
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 64), jnp.float32)
    full = model.encode_audio(mel)
    cache = model.create_encoder_cache(max_seq=16)
    inc, cache = model.encode_audio_with_cache(mel, cache)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(inc), rtol=1e-4, atol=1e-5
    )
    assert int(cache.length) == 16


def test_forward_with_cache_runs(model):
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 64), jnp.float32)
    enc_cache = model.create_encoder_cache(max_seq=32)
    dec_cache = model.create_decoder_cache(max_seq=32)
    logits, enc_cache, dec_cache = model.forward_with_cache(
        mel, model.t_embed(), enc_cache, dec_cache
    )
    assert logits.shape == (1, 4, model.config.language_model.vocab_size)
    assert int(dec_cache.length) == 4


def test_generate_step_with_cache_matches_full(model):
    """Token-by-token cached decoding == cache-free full forward."""
    from voxtral_tpu.models.decoder import (
        decoder_forward_hidden,
        embed_tokens,
        lm_head,
    )

    ids = jnp.asarray([[1, 32, 32, 40, 41]], jnp.int32)
    t = model.t_embed()

    text = embed_tokens(model.params["decoder"], ids)
    hidden = decoder_forward_hidden(
        model.params["decoder"], text, t, model.config.language_model
    )
    full_logits = lm_head(model.params["decoder"], hidden)

    cache = model.create_decoder_cache(max_seq=8)
    outs = []
    for i in range(ids.shape[1]):
        logits, cache = model.generate_step_with_cache(ids[:, i : i + 1], t, cache)
        outs.append(logits)
    step_logits = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(step_logits), rtol=1e-3, atol=1e-3
    )
