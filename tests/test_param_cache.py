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


def test_load_or_build_hits_and_misses(tmp_path):
    """Second load with the same (source, tag) skips the builder; a
    source touch or a different tag misses."""
    import time

    from voxtral_tpu.loaders.param_cache import cache_entry, load_or_build

    src = tmp_path / "weights.bin"
    src.write_bytes(b"x" * 64)
    calls = []

    def build():
        calls.append(1)
        return {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
                "sub": {"s": np.float16([1.5, 2.5])}}

    p1 = load_or_build(tmp_path / "cache", src, "w8", build,
                       to_device=False)
    p2 = load_or_build(tmp_path / "cache", src, "w8", build,
                       to_device=False)
    assert len(calls) == 1
    np.testing.assert_array_equal(p1["a"], p2["a"])
    assert p2["sub"]["s"].dtype == np.float16

    load_or_build(tmp_path / "cache", src, "q4g", build, to_device=False)
    assert len(calls) == 2  # different format -> different entry

    e1 = cache_entry(tmp_path / "cache", src, "w8")
    time.sleep(0.01)
    src.write_bytes(b"y" * 65)  # size+mtime change -> new key
    assert cache_entry(tmp_path / "cache", src, "w8") != e1
    load_or_build(tmp_path / "cache", src, "w8", build, to_device=False)
    assert len(calls) == 3


def test_corrupt_entry_rebuilds(tmp_path):
    from voxtral_tpu.loaders.param_cache import cache_entry, load_or_build

    src = tmp_path / "weights.bin"
    src.write_bytes(b"x")
    base = cache_entry(tmp_path / "cache", src, "w8")
    (base.parent / (base.name + ".npd")).mkdir(parents=True)
    (base.parent / (base.name + ".npd") / "0.npy").write_bytes(b"junk")
    (base.parent / (base.name + ".json")).write_text(
        '{"skeleton": {"a": {"__leaf__": "a", "dtype": "float32"}}, '
        '"index": {"a": 0}}')
    got = load_or_build(tmp_path / "cache", src, "w8",
                        lambda: {"a": np.ones(3, np.float32)},
                        to_device=False)
    np.testing.assert_array_equal(got["a"], np.ones(3, np.float32))


def _tiny_gguf(tmp_path):
    """Tiny synthetic Q4_0 GGUF (same construction as
    tests/test_q4.py::q4_checkpoint)."""
    from tests.test_safetensors_loader import synth_checkpoint, tiny_cfg
    from voxtral_tpu.loaders import names as N
    from voxtral_tpu.loaders.gguf import GGML_F32, GGML_Q4_0, write_gguf
    from voxtral_tpu.ops.q4 import quantize_q4_0

    cfg = tiny_cfg()
    tensors = synth_checkpoint(cfg, np.random.default_rng(9))
    q4_names = {N.TOK_EMBEDDINGS} | set(N.adapter_names().values())
    for i in range(cfg.audio_encoder.n_layers):
        nm = N.encoder_layer_names(i)
        q4_names |= {nm[x] for x in ("wq_weight", "wk_weight", "wv_weight",
                                     "wo_weight", "w1_weight", "w2_weight",
                                     "w3_weight")}
    for i in range(cfg.language_model.n_layers):
        nm = N.decoder_layer_names(i)
        q4_names |= {nm[x] for x in ("ada_norm_down", "ada_norm_up",
                                     "wq_weight", "wk_weight", "wv_weight",
                                     "wo_weight", "w1_weight", "w2_weight",
                                     "w3_weight")}
    gguf_tensors = {}
    for name, arr in tensors.items():
        if name in q4_names and arr.shape[-1] % 32 == 0:
            gguf_tensors[name] = (arr.shape, GGML_Q4_0, quantize_q4_0(arr))
        else:
            gguf_tensors[name] = (arr.shape, GGML_F32,
                                  arr.astype(np.float32).tobytes())
    path = tmp_path / "tiny_q4.gguf"
    with open(path, "wb") as f:
        write_gguf(f, gguf_tensors)
    return cfg, path


def test_from_gguf_cache_roundtrip(tmp_path):
    """Cold vs warm GGUF load through the cache: identical pytrees
    (q4/q4g leaves incl. f16 scales survive the npz roundtrip) and
    identical model outputs; the warm path never calls the builder."""
    cfg, path = _tiny_gguf(tmp_path)
    from voxtral_tpu.loaders.gguf_loader import Q4ModelLoader
    from voxtral_tpu.loaders.param_cache import load_or_build

    loader = Q4ModelLoader.from_file(path, cfg=cfg, weight_format="q4g")
    host = loader.load(to_device=False)
    tmp_dir = tmp_path / "pcache"
    cached = load_or_build(tmp_dir, path, "q4g",
                           lambda: host, to_device=False)
    ref_leaves = jax.tree_util.tree_leaves_with_path(host)
    got_leaves = jax.tree_util.tree_leaves_with_path(cached)
    assert len(ref_leaves) == len(got_leaves)
    for (pa, a), (pb, b) in zip(ref_leaves, got_leaves):
        assert pa == pb
        a = np.asarray(a)
        assert str(a.dtype) == str(b.dtype), pa
        np.testing.assert_array_equal(
            a.view(np.uint16) if str(a.dtype) == "bfloat16" else a,
            b.view(np.uint16) if str(b.dtype) == "bfloat16" else b)
    # warm hit: load again straight from the cache entry
    warm = load_or_build(tmp_dir, path, "q4g",
                         lambda: (_ for _ in ()).throw(AssertionError),
                         to_device=True)
    m1 = VoxtralModel(jax.tree_util.tree_map(jnp.asarray, host), cfg)
    m2 = VoxtralModel(warm, cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 64),
                            jnp.float32) * 0.2
    np.testing.assert_array_equal(
        np.asarray(m1.forward(mel, m1.t_embed())),
        np.asarray(m2.forward(mel, m2.t_embed())))
