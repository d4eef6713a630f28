"""W8A8 path tests: matmul vs f32 reference, model integration, GGUF->W8."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxtral_tpu.ops.w8 import (
    quantize_w8_rowwise,
    w8_dequant_rows,
    w8_matmul,
)


def test_quantize_w8_rowwise():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 64)).astype(np.float32)
    q = quantize_w8_rowwise(w)["w8"]
    assert q["codes"].dtype == np.int8
    assert q["scale"].shape == (8,)
    deq = q["codes"].astype(np.float32) * q["scale"][:, None]
    # Rowwise int8: error <= scale/2 per element.
    assert np.all(np.abs(deq - w) <= q["scale"][:, None] * 0.51 + 1e-7)
    # Zero row stays zero without NaNs.
    q0 = quantize_w8_rowwise(np.zeros((1, 32), np.float32))["w8"]
    assert np.all(q0["codes"] == 0) and np.isfinite(q0["scale"]).all()


@pytest.mark.parametrize("m", [1, 7])
def test_w8_matmul_matches_f32(m):
    rng = np.random.default_rng(1)
    n, k = 48, 128
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(m, k)).astype(np.float32)
    q = quantize_w8_rowwise(w)
    got = np.asarray(w8_matmul(jnp.asarray(x), jax.tree_util.tree_map(jnp.asarray, q)["w8"]))
    expected = x @ w.T
    # W8 (0.4%) + A8 (0.4%) accumulated over K=128.
    np.testing.assert_allclose(
        got, expected, rtol=3e-2, atol=0.02 * np.abs(expected).max()
    )


def test_w8_dequant_rows():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(16, 32)).astype(np.float32)
    q = jax.tree_util.tree_map(jnp.asarray, quantize_w8_rowwise(w))
    rows = jnp.asarray([[0, 3], [15, 3]])
    got = np.asarray(w8_dequant_rows(q["w8"], rows, dtype=jnp.float32))
    assert got.shape == (2, 2, 32)
    np.testing.assert_allclose(got, w[np.asarray(rows)], rtol=1e-2, atol=2e-2)


def test_w8_model_forward():
    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.utils.quantize import quantize_params_w8

    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )
    w8_params = quantize_params_w8(model.params)
    w8_model = VoxtralModel(w8_params, model.config, compute_dtype=jnp.float32)
    assert "w8" in w8_params["decoder"]["layers"]["attention"]["wq"]
    assert "w8" in w8_params["decoder"]["tok_embeddings"]

    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 64), jnp.float32) * 0.2
    ref = np.asarray(model.forward(mel, model.t_embed()))
    got = np.asarray(w8_model.forward(mel, w8_model.t_embed()))
    cos = np.sum(got * ref) / (np.linalg.norm(got) * np.linalg.norm(ref))
    # int8 rowwise is far tighter than int4: near-f32 agreement even on
    # unstructured random weights.
    assert cos > 0.995, cos


def test_w8_transcribe_runs():
    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.utils.quantize import quantize_params_w8

    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )
    w8_model = VoxtralModel(quantize_params_w8(model.params), model.config)
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 41 * 16), jnp.float32) * 0.3
    tokens = w8_model.transcribe_streaming(mel)
    assert tokens.shape == (3,)


def test_gguf_w8_loading():
    import tempfile
    from tests.test_model import tiny_config
    from tests.test_safetensors_loader import synth_checkpoint
    from voxtral_tpu.loaders import names as N
    from voxtral_tpu.loaders.gguf import GGML_F32, GGML_Q4_0, write_gguf
    from voxtral_tpu.loaders.gguf_loader import load_q4_model
    from voxtral_tpu.ops.q4 import quantize_q4_0

    cfg = tiny_config()  # decoder dim 32 / hidden 64: K%32==0 for w1/w2/w3
    tensors = synth_checkpoint(cfg, np.random.default_rng(3))
    gguf_tensors = {}
    q4_names = {N.TOK_EMBEDDINGS}
    for i in range(cfg.language_model.n_layers):
        nm = N.decoder_layer_names(i)
        q4_names |= {nm["w1_weight"], nm["w2_weight"], nm["w3_weight"]}
    for name, arr in tensors.items():
        if name in q4_names and arr.shape[-1] % 32 == 0:
            gguf_tensors[name] = (arr.shape, GGML_Q4_0, quantize_q4_0(arr))
        else:
            gguf_tensors[name] = (arr.shape, GGML_F32, arr.tobytes())

    with tempfile.NamedTemporaryFile(suffix=".gguf") as f:
        write_gguf(f, gguf_tensors)
        f.flush()
        model = load_q4_model(f.name, cfg, weight_format="w8")
    assert "w8" in model.params["decoder"]["layers"]["ffn"]["w1"]
    mel = jnp.zeros((1, 128, 64), jnp.float32)
    logits = model.forward(mel, model.t_embed())
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_w8_pallas_matches_xla():
    """Pallas int8 kernel must match the XLA epilogue path (int math is
    exact; f32 epilogue within one ulp-ish).  The kernel is opt-in at
    model scale (see ops/w8.py) but stays correctness-tested."""
    from voxtral_tpu.ops.w8 import _quantize_activations
    from voxtral_tpu.ops.w8_pallas import w8_matmul_pallas, w8_pallas_supported

    rng = np.random.default_rng(4)
    for m, n, k in [(1, 128, 256), (8, 256, 512), (64, 384, 256)]:
        w = rng.normal(size=(n, k)).astype(np.float32)
        x = rng.normal(size=(m, k)).astype(np.float32)
        q = jax.tree_util.tree_map(jnp.asarray, quantize_w8_rowwise(w))["w8"]
        xq, sx = _quantize_activations(jnp.asarray(x))
        assert w8_pallas_supported(xq, q["codes"])

        got = np.asarray(w8_matmul_pallas(xq, sx, q["codes"], q["scale"]))
        z = np.asarray(xq, np.int32) @ np.asarray(q["codes"], np.int32).T
        expected = z.astype(np.float32) * np.asarray(sx) * np.asarray(q["scale"])
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_w8_pallas_gate():
    from voxtral_tpu.ops.w8_pallas import w8_pallas_supported

    assert not w8_pallas_supported(
        jnp.zeros((1, 32), jnp.int8), jnp.zeros((32, 32), jnp.int8)
    )  # K too small
    assert not w8_pallas_supported(
        jnp.zeros((1, 256), jnp.int8), jnp.zeros((48, 256), jnp.int8)
    )  # N % 128 != 0
