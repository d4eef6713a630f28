"""Converted-parameter cache roundtrip tests."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_model import tiny_config
from voxtral_tpu.loaders.param_cache import load_params, save_params
from voxtral_tpu.models.voxtral import VoxtralModel
from voxtral_tpu.utils.quantize import quantize_params_w8


def test_roundtrip_dense_bf16(tmp_path):
    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.bfloat16
    )
    save_params(model.params, tmp_path / "params")
    loaded = load_params(tmp_path / "params", to_device=False)

    ref_leaves = jax.tree_util.tree_leaves_with_path(model.params)
    got_leaves = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(ref_leaves) == len(got_leaves)
    for (pa, a), (pb, b) in zip(ref_leaves, got_leaves):
        assert pa == pb
        assert str(np.asarray(a).dtype) == str(b.dtype), pa
        np.testing.assert_array_equal(
            np.asarray(a).view(np.uint16) if str(b.dtype) == "bfloat16" else np.asarray(a),
            b.view(np.uint16) if str(b.dtype) == "bfloat16" else b,
        )


def test_roundtrip_w8_and_forward(tmp_path):
    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )
    w8 = quantize_params_w8(model.params)
    save_params(w8, tmp_path / "w8")
    loaded = load_params(tmp_path / "w8")

    m1 = VoxtralModel(w8, model.config)
    m2 = VoxtralModel(loaded, model.config)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 64), jnp.float32)
    a = np.asarray(m1.forward(mel, m1.t_embed()))
    b = np.asarray(m2.forward(mel, m2.t_embed()))
    np.testing.assert_array_equal(a, b)
