"""Golden-fixture tests against real-weight torch outputs.

Consume ``test_data/*.npy`` written by ``scripts/generate_fixtures.py``
(which needs the downloaded model) and SKIP when absent — the same
protocol as the reference (``src/test_utils.rs:19-41``; skip pattern at
rope.rs:168-175 etc.).  Real weights are unavailable in the zero-egress
build environment, so these run wherever the model has been downloaded.
"""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

TEST_DATA = Path(__file__).parent.parent / "test_data"
MODEL_DIR = Path(__file__).parent.parent / "models" / "voxtral"

pytestmark = pytest.mark.skipif(
    not (TEST_DATA / "rms_norm.npy").exists(),
    reason="golden fixtures not generated (run scripts/generate_fixtures.py)",
)


def _load(name):
    return np.load(TEST_DATA / name)


@pytest.fixture(scope="module")
def st():
    from voxtral_tpu.loaders.safetensors_loader import SafeTensorsFile

    path = MODEL_DIR / "consolidated.safetensors"
    if not path.exists():
        pytest.skip("model weights not downloaded")
    return SafeTensorsFile(path)


def test_rms_norm_golden(st):
    from voxtral_tpu.loaders import names as N
    from voxtral_tpu.models.layers import rms_norm

    x = jnp.asarray(_load("input_enc.npy"))
    w = jnp.asarray(st.tensor(N.encoder_layer_names(0)["attention_norm"], np.float32))
    got = np.asarray(rms_norm(x, w))
    np.testing.assert_allclose(got, _load("rms_norm.npy"), rtol=1e-5, atol=1e-5)


def test_swiglu_golden(st):
    from voxtral_tpu.loaders import names as N
    from voxtral_tpu.models.layers import swiglu

    nm = N.decoder_layer_names(0)
    x = jnp.asarray(_load("input_dec.npy"))
    p = {
        "w1": jnp.asarray(st.tensor(nm["w1_weight"], np.float32).T),
        "w2": jnp.asarray(st.tensor(nm["w2_weight"], np.float32).T),
        "w3": jnp.asarray(st.tensor(nm["w3_weight"], np.float32).T),
    }
    got = np.asarray(swiglu(x, p))
    np.testing.assert_allclose(got, _load("swiglu.npy"), rtol=1e-4, atol=1e-4)


def test_ada_golden(st):
    from voxtral_tpu.loaders import names as N
    from voxtral_tpu.models.layers import ada_modulate

    nm = N.decoder_layer_names(0)
    x = jnp.asarray(_load("input_dec.npy"))
    t_embed = jnp.asarray(_load("input_t_embed.npy"))
    p = {
        "w0": jnp.asarray(st.tensor(nm["ada_norm_down"], np.float32).T),
        "w2": jnp.asarray(st.tensor(nm["ada_norm_up"], np.float32).T),
    }
    got = np.asarray(ada_modulate(x, t_embed, p))
    np.testing.assert_allclose(got, _load("ada_rms_norm.npy"), rtol=1e-4, atol=1e-5)


def test_conv_golden(st):
    from voxtral_tpu.loaders import names as N
    from voxtral_tpu.models.layers import conv_downsample

    cv = N.conv_names()
    mel = jnp.asarray(_load("input_mel.npy"))
    p = {
        "conv1": jnp.asarray(st.tensor(cv["conv1_weight"], np.float32)),
        "conv1_b": jnp.asarray(st.tensor(cv["conv1_bias"], np.float32)),
        "conv2": jnp.asarray(st.tensor(cv["conv2_weight"], np.float32)),
        "conv2_b": jnp.asarray(st.tensor(cv["conv2_bias"], np.float32)),
    }
    got = np.asarray(conv_downsample(mel, p))
    np.testing.assert_allclose(got, _load("conv.npy"), rtol=1e-4, atol=1e-4)
