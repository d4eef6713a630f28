"""SafeTensors loader tests against synthetic checkpoints (reference weights.rs)."""

import numpy as np
import pytest

from voxtral_tpu.config import (
    AdapterConfig,
    AudioEncoderConfig,
    AudioInputConfig,
    LanguageModelConfig,
    VoxtralConfig,
)
from voxtral_tpu.loaders import names as N
from voxtral_tpu.loaders.safetensors_loader import (
    SafeTensorsFile,
    load_voxtral_params,
)


def tiny_cfg() -> VoxtralConfig:
    return VoxtralConfig(
        audio_encoder=AudioEncoderConfig(
            dim=16, n_layers=2, n_heads=2, n_kv_heads=2, head_dim=8, hidden_dim=32
        ),
        language_model=LanguageModelConfig(
            dim=8, n_layers=2, n_heads=2, n_kv_heads=1, head_dim=4,
            hidden_dim=16, vocab_size=64,
        ),
        adapter=AdapterConfig(input_dim=64, hidden_dim=8, output_dim=8),
        audio=AudioInputConfig(),
        ada_rms_norm_t_cond_dim=4,
        downsample_factor=4,
    )


def synth_checkpoint(cfg: VoxtralConfig, rng) -> dict[str, np.ndarray]:
    """All tensors with reference names, PyTorch layouts ([out, in] linears)."""
    e, l = cfg.audio_encoder, cfg.language_model
    t = {}
    r = lambda *s: rng.normal(size=s).astype(np.float32)

    cv = N.conv_names()
    t[cv["conv1_weight"]] = r(e.dim, 128, 3)
    t[cv["conv1_bias"]] = r(e.dim)
    t[cv["conv2_weight"]] = r(e.dim, e.dim, 3)
    t[cv["conv2_bias"]] = r(e.dim)
    t[N.ENCODER_FINAL_NORM] = r(e.dim)

    qd = e.n_heads * e.head_dim
    for i in range(e.n_layers):
        nm = N.encoder_layer_names(i)
        t[nm["attention_norm"]] = r(e.dim)
        t[nm["wq_weight"]] = r(qd, e.dim)
        t[nm["wq_bias"]] = r(qd)
        t[nm["wk_weight"]] = r(qd, e.dim)
        t[nm["wv_weight"]] = r(qd, e.dim)
        t[nm["wv_bias"]] = r(qd)
        t[nm["wo_weight"]] = r(e.dim, qd)
        t[nm["wo_bias"]] = r(e.dim)
        t[nm["ffn_norm"]] = r(e.dim)
        t[nm["w1_weight"]] = r(e.hidden_dim, e.dim)
        t[nm["w2_weight"]] = r(e.dim, e.hidden_dim)
        t[nm["w2_bias"]] = r(e.dim)
        t[nm["w3_weight"]] = r(e.hidden_dim, e.dim)

    t[N.TOK_EMBEDDINGS] = r(l.vocab_size, l.dim)
    t[N.FINAL_NORM] = r(l.dim)
    qd = l.n_heads * l.head_dim
    kvd = l.n_kv_heads * l.head_dim
    tc = cfg.ada_rms_norm_t_cond_dim
    for i in range(l.n_layers):
        nm = N.decoder_layer_names(i)
        t[nm["ada_norm_down"]] = r(tc, l.dim)
        t[nm["ada_norm_up"]] = r(l.dim, tc)
        t[nm["attention_norm"]] = r(l.dim)
        t[nm["wq_weight"]] = r(qd, l.dim)
        t[nm["wk_weight"]] = r(kvd, l.dim)
        t[nm["wv_weight"]] = r(kvd, l.dim)
        t[nm["wo_weight"]] = r(l.dim, qd)
        t[nm["ffn_norm"]] = r(l.dim)
        t[nm["w1_weight"]] = r(l.hidden_dim, l.dim)
        t[nm["w2_weight"]] = r(l.dim, l.hidden_dim)
        t[nm["w3_weight"]] = r(l.hidden_dim, l.dim)

    an = N.adapter_names()
    t[an["linear1_weight"]] = r(cfg.adapter.output_dim, cfg.adapter.input_dim)
    t[an["linear2_weight"]] = r(cfg.adapter.output_dim, cfg.adapter.output_dim)
    return t


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    from safetensors.numpy import save_file

    cfg = tiny_cfg()
    tensors = synth_checkpoint(cfg, np.random.default_rng(0))
    path = tmp_path_factory.mktemp("st") / "consolidated.safetensors"
    save_file(tensors, str(path))
    return cfg, tensors, path


def test_safetensors_file_reader(checkpoint):
    cfg, tensors, path = checkpoint
    st = SafeTensorsFile(path)
    assert set(st.names()) == set(tensors.keys())
    name = N.TOK_EMBEDDINGS
    assert st.tensor_meta(name) == ("F32", tensors[name].shape)
    np.testing.assert_array_equal(st.tensor(name), tensors[name])


def test_load_params_shapes_and_transpose(checkpoint):
    cfg, tensors, path = checkpoint
    params = load_voxtral_params(path, cfg, dtype="float32", to_device=False)

    e, l = cfg.audio_encoder, cfg.language_model
    # Stacked layer axes.
    assert params["encoder"]["layers"]["attention"]["wq"].shape == (
        e.n_layers, e.dim, e.n_heads * e.head_dim,
    )
    assert params["decoder"]["layers"]["ffn"]["w2"].shape == (
        l.n_layers, l.hidden_dim, l.dim,
    )
    assert params["decoder"]["layers"]["ada"]["w0"].shape == (
        l.n_layers, l.dim, cfg.ada_rms_norm_t_cond_dim,
    )
    # Embeddings NOT transposed.
    np.testing.assert_array_equal(
        params["decoder"]["tok_embeddings"], tensors[N.TOK_EMBEDDINGS]
    )
    # Linears ARE transposed ([out, in] -> [in, out]).
    nm = N.decoder_layer_names(1)
    np.testing.assert_array_equal(
        params["decoder"]["layers"]["attention"]["wq"][1],
        tensors[nm["wq_weight"]].T,
    )
    # Conv weights keep PyTorch [out, in, k].
    np.testing.assert_array_equal(
        params["encoder"]["conv"]["conv1"], tensors[N.conv_names()["conv1_weight"]]
    )
    # ADA: down [t_cond, d] -> w0 [d, t_cond]; up [d, t_cond] -> w2 [t_cond, d].
    np.testing.assert_array_equal(
        params["decoder"]["layers"]["ada"]["w0"][0],
        tensors[N.decoder_layer_names(0)["ada_norm_down"]].T,
    )


def test_load_bf16_checkpoint(tmp_path):
    """bf16 tensors load via the manual header parse (torch-written file)."""
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file as save_torch

    cfg = tiny_cfg()
    tensors = synth_checkpoint(cfg, np.random.default_rng(1))
    tt = {k: torch.from_numpy(v).to(torch.bfloat16) for k, v in tensors.items()}
    path = tmp_path / "bf16.safetensors"
    save_torch(tt, str(path))

    st = SafeTensorsFile(path)
    name = N.FINAL_NORM
    dtype, shape = st.tensor_meta(name)
    assert dtype == "BF16"
    got = st.tensor(name, np.float32)
    expected = tt[name].to(torch.float32).numpy()
    np.testing.assert_array_equal(got, expected)

    params = load_voxtral_params(path, cfg, dtype="bfloat16", to_device=False)
    assert str(params["decoder"]["tok_embeddings"].dtype) == "bfloat16"


def test_vocab_truncation(checkpoint):
    cfg, tensors, path = checkpoint
    params = load_voxtral_params(
        path, cfg, dtype="float32", max_vocab_size=16, to_device=False
    )
    assert params["decoder"]["tok_embeddings"].shape == (16, cfg.language_model.dim)


def test_loaded_params_run_forward(checkpoint):
    """Loaded pytree must drop straight into the model forward."""
    import jax.numpy as jnp

    from voxtral_tpu.models.voxtral import VoxtralModel

    cfg, _, path = checkpoint
    params = load_voxtral_params(path, cfg, dtype="float32")
    model = VoxtralModel(params, cfg)
    mel = jnp.zeros((1, 128, 64), jnp.float32)
    logits = model.forward(mel, model.t_embed(6.0))
    assert logits.shape == (1, 4, cfg.language_model.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))
