"""Q4_0 path tests: quantize/dequant roundtrip, packing, GGUF io, fused
matmul vs dequantized reference, Pallas kernel (interpret mode), and the
full Q4 model pipeline from a synthetic GGUF.

Mirrors the reference test tiers (gguf/tests.rs:89-478,
tests/gguf_integration.rs).
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxtral_tpu.loaders.gguf import (
    GGML_F32,
    GGML_Q4_0,
    GgufReader,
    write_gguf,
)
from voxtral_tpu.ops.q4 import (
    Q4_BLOCK,
    dequantize_q4_0,
    q4_dequant_rows,
    q4_matmul,
    quantize_q4_0,
    quantize_to_q4_params,
    repack_q4_0,
)
from voxtral_tpu.ops.q4_pallas import (
    pack_codes,
    pallas_supported,
    q4_matmul_pallas,
    q4_packed_dequant_full,
    transpose_scales,
    unpack_codes,
)


def q4_ref_dequant(w: np.ndarray) -> np.ndarray:
    """Quantize f32 -> Q4_0 -> dequantize (the values the kernels must match)."""
    return dequantize_q4_0(quantize_q4_0(w), w.size).reshape(w.shape)


# -- quantize / dequantize ----------------------------------------------------


def test_q4_roundtrip_error_bound():
    """Dequantized values within half a quantization step (ref gguf/tests.rs:191)."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 64)).astype(np.float32)
    deq = q4_ref_dequant(w)
    # Per-block scale = absmax/8; max error ~= scale/2 + f16 rounding.
    blocks = w.reshape(-1, Q4_BLOCK)
    deq_blocks = deq.reshape(-1, Q4_BLOCK)
    scales = np.abs(blocks).max(axis=1) / 8.0
    err = np.abs(blocks - deq_blocks).max(axis=1)
    assert np.all(err <= scales * 0.51 + 1e-3), (err / scales).max()


def test_q4_zeros_and_extremes():
    z = np.zeros((1, 32), np.float32)
    np.testing.assert_array_equal(q4_ref_dequant(z), z)
    # The block's absmax element must be reconstructed (nearly) exactly.
    w = np.zeros((1, 32), np.float32)
    w[0, 7] = -3.7
    deq = q4_ref_dequant(w)
    assert abs(deq[0, 7] - (-3.7)) < 3.7 * 0.002 + 1e-6


def test_repack_matches_reference_dequant():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(16, 96)).astype(np.float32)
    raw = quantize_q4_0(w)
    q4 = repack_q4_0(raw, w.shape)
    assert q4["codes"].shape == (16, 96)
    assert q4["scales"].shape == (16, 3)
    deq_ref = dequantize_q4_0(raw, w.size).reshape(w.shape)
    deq_repack = q4["codes"].astype(np.float32) * np.repeat(
        q4["scales"].astype(np.float32), Q4_BLOCK, axis=1
    )
    np.testing.assert_allclose(deq_repack, deq_ref, rtol=0, atol=1e-6)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(2)
    codes = rng.integers(-8, 8, size=(32, 128), dtype=np.int8)
    packed = pack_codes(codes)
    assert packed.shape == (16, 32)  # [K/8, N] int32 words
    assert packed.dtype == np.int32
    np.testing.assert_array_equal(unpack_codes(packed), codes)


# -- GGUF io ------------------------------------------------------------------


def test_gguf_write_read_roundtrip():
    rng = np.random.default_rng(3)
    w_q4 = rng.normal(size=(8, 64)).astype(np.float32)
    w_f32 = rng.normal(size=(5,)).astype(np.float32)

    buf = io.BytesIO()
    write_gguf(
        buf,
        {
            "a.weight": (w_q4.shape, GGML_Q4_0, quantize_q4_0(w_q4)),
            "b.norm": (w_f32.shape, GGML_F32, w_f32.tobytes()),
        },
    )
    reader = GgufReader.from_bytes(buf.getvalue())
    assert reader.version == 3
    assert reader.tensor_count == 2
    assert set(reader.tensor_names()) == {"a.weight", "b.norm"}

    info = reader.tensor_info("a.weight")
    assert info.dtype == GGML_Q4_0
    assert info.torch_shape == (8, 64)  # dims reversed back to torch order
    assert info.shape == (64, 8)  # innermost-first on disk

    np.testing.assert_array_equal(reader.tensor_f32("b.norm"), w_f32)
    deq = dequantize_q4_0(
        np.asarray(reader.tensor_data("a.weight")), w_q4.size
    ).reshape(8, 64)
    np.testing.assert_allclose(deq, q4_ref_dequant(w_q4), atol=1e-6)


def test_gguf_bad_magic_and_version():
    with pytest.raises(ValueError, match="magic"):
        GgufReader.from_bytes(b"\x00" * 64)
    buf = io.BytesIO()
    write_gguf(buf, {}, version=7)
    with pytest.raises(ValueError, match="version"):
        GgufReader.from_bytes(buf.getvalue())


# -- fused matmul -------------------------------------------------------------


@pytest.mark.parametrize("m", [1, 4, 37])  # decode + prefill paths
def test_q4_matmul_matches_dequantized_reference(m):
    rng = np.random.default_rng(4)
    n, k = 48, 128
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(m, k)).astype(np.float32)

    q4 = quantize_to_q4_params(w)["q4"]
    got = np.asarray(q4_matmul(jnp.asarray(x), q4))
    expected = x @ q4_ref_dequant(w).T
    # bf16 inputs: tolerance scales with output magnitude.
    np.testing.assert_allclose(
        got, expected, rtol=2e-2, atol=0.01 * np.abs(expected).max()
    )


def test_q4_matmul_batched_input():
    rng = np.random.default_rng(5)
    w = rng.normal(size=(32, 64)).astype(np.float32)
    x = rng.normal(size=(2, 3, 64)).astype(np.float32)
    q4 = quantize_to_q4_params(w)["q4"]
    got = np.asarray(q4_matmul(jnp.asarray(x), q4))
    assert got.shape == (2, 3, 32)
    expected = x @ q4_ref_dequant(w).T
    np.testing.assert_allclose(
        got, expected, rtol=2e-2, atol=0.01 * np.abs(expected).max()
    )


def test_q4_dequant_rows_both_variants():
    rng = np.random.default_rng(6)
    w = rng.normal(size=(64, 256)).astype(np.float32)
    raw = quantize_q4_0(w)
    q4 = repack_q4_0(raw, w.shape)
    rows = jnp.asarray([0, 5, 63, 5])
    expected = q4_ref_dequant(w)[np.asarray(rows)]

    got = np.asarray(q4_dequant_rows(q4, rows, dtype=jnp.float32))
    np.testing.assert_allclose(got, expected, rtol=1e-2, atol=1e-2)

    q4p = {"codes_packed": pack_codes(q4["codes"]),
           "scales_t": transpose_scales(q4["scales"])}
    got_packed = np.asarray(q4_dequant_rows(q4p, rows, dtype=jnp.float32))
    np.testing.assert_allclose(got_packed, expected, rtol=1e-2, atol=1e-2)

    # 2D row indices (token batches).
    rows2 = jnp.asarray([[0, 1], [2, 3]])
    got2 = np.asarray(q4_dequant_rows(q4p, rows2, dtype=jnp.float32))
    assert got2.shape == (2, 2, 256)
    np.testing.assert_allclose(
        got2, q4_ref_dequant(w)[np.asarray(rows2)], rtol=1e-2, atol=1e-2
    )


# -- Pallas kernel (interpret mode on CPU) ------------------------------------


@pytest.mark.parametrize("m,n,k", [(1, 128, 256), (8, 256, 512), (64, 128, 1280)])
def test_pallas_kernel_matches_reference(m, n, k):
    rng = np.random.default_rng(7)
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(m, k)).astype(np.float32) * 0.5

    q4 = repack_q4_0(quantize_q4_0(w), w.shape)
    q4p = {"codes_packed": jnp.asarray(pack_codes(q4["codes"])),
           "scales_t": jnp.asarray(transpose_scales(q4["scales"]))}
    assert pallas_supported(jnp.asarray(x), q4p)

    got = np.asarray(q4_matmul_pallas(jnp.asarray(x), q4p))
    expected = x.astype(np.float32) @ q4_ref_dequant(w).T
    # bf16 x and bf16 dequant inside the kernel.
    np.testing.assert_allclose(
        got, expected, rtol=3e-2, atol=0.015 * np.abs(expected).max()
    )


def test_pallas_gate_rejects_bad_shapes():
    q4p = {"codes_packed": np.zeros((16, 32), np.uint8),
           "scales_t": np.zeros((1, 32), np.float32)}
    assert not pallas_supported(jnp.zeros((1, 32)), q4p)  # K=32 too small


def test_packed_dequant_full():
    rng = np.random.default_rng(8)
    w = rng.normal(size=(128, 256)).astype(np.float32)
    q4 = repack_q4_0(quantize_q4_0(w), w.shape)
    q4p = {"codes_packed": jnp.asarray(pack_codes(q4["codes"])),
           "scales_t": jnp.asarray(transpose_scales(q4["scales"]))}
    got = np.asarray(q4_packed_dequant_full(q4p, dtype=jnp.float32))
    np.testing.assert_allclose(got, q4_ref_dequant(w), rtol=1e-2, atol=1e-2)


# -- full Q4 model from synthetic GGUF ---------------------------------------


@pytest.fixture(scope="module")
def q4_checkpoint(tmp_path_factory):
    """Synthetic GGUF built from the tiny f32 checkpoint fixture."""
    from tests.test_safetensors_loader import synth_checkpoint, tiny_cfg
    from voxtral_tpu.loaders import names as N

    cfg = tiny_cfg()
    tensors_f32 = synth_checkpoint(cfg, np.random.default_rng(9))

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
    for name, arr in tensors_f32.items():
        # Tiny dims: tensors whose K is not a multiple of 32 stay F32
        # (the production model always has K % 32 == 0).
        if name in q4_names and arr.shape[-1] % 32 == 0:
            gguf_tensors[name] = (arr.shape, GGML_Q4_0, quantize_q4_0(arr))
        else:
            gguf_tensors[name] = (arr.shape, GGML_F32,
                                  arr.astype(np.float32).tobytes())

    path = tmp_path_factory.mktemp("gguf") / "tiny_q4.gguf"
    with open(path, "wb") as f:
        write_gguf(f, gguf_tensors)
    return cfg, tensors_f32, path


def test_q4_model_load_and_forward(q4_checkpoint):
    from voxtral_tpu.loaders.gguf_loader import load_q4_model

    cfg, _, path = q4_checkpoint
    model = load_q4_model(path, cfg)
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 64), jnp.float32) * 0.2
    logits = model.forward(mel, model.t_embed(6.0))
    assert logits.shape == (1, 4, cfg.language_model.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_q4_model_matches_dequantized_f32_model(q4_checkpoint):
    """Q4 forward must track the f32 model built from the SAME dequantized
    weights (the kernel-vs-dequant contract, ref tests/gguf_integration.rs:171)."""
    from safetensors.numpy import save_file

    from voxtral_tpu.loaders.gguf_loader import load_q4_model
    from voxtral_tpu.loaders.safetensors_loader import load_voxtral_params
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.loaders import names as N

    cfg, tensors_f32, path = q4_checkpoint
    q4_model = load_q4_model(path, cfg)

    # Build the f32 reference from dequantized Q4 values.
    import tempfile

    deq_tensors = {}
    from voxtral_tpu.loaders.gguf import GgufReader

    reader = GgufReader.from_file(path)
    for name, arr in tensors_f32.items():
        info = reader.tensor_info(name)
        if info.dtype == GGML_Q4_0:
            deq_tensors[name] = dequantize_q4_0(
                np.asarray(reader.tensor_data(name)), arr.size
            ).reshape(arr.shape)
        else:
            deq_tensors[name] = arr
    with tempfile.TemporaryDirectory() as td:
        st_path = f"{td}/deq.safetensors"
        save_file(deq_tensors, st_path)
        f32_params = load_voxtral_params(st_path, cfg, dtype="float32")
    f32_model = VoxtralModel(f32_params, cfg)

    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 64), jnp.float32) * 0.2
    t = f32_model.t_embed(6.0)
    ref = np.asarray(f32_model.forward(mel, t))

    # Matched (f32) activations isolate the Q4 kernels: tight agreement.
    from voxtral_tpu.models.voxtral import VoxtralModel as VM

    q4_f32 = VM(q4_model.params, cfg, compute_dtype=jnp.float32)
    got = np.asarray(q4_f32.forward(mel, t))
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05 * np.abs(ref).std())

    # Default bf16 activations: directionally consistent logits.
    got_bf16 = np.asarray(q4_model.forward(mel, t)).astype(np.float32)
    cos = np.sum(got_bf16 * ref) / (
        np.linalg.norm(got_bf16) * np.linalg.norm(ref)
    )
    # Random tiny-dim weights amplify bf16 drift; trained models sit much
    # closer — this is a sanity floor, not the parity bar.
    assert cos > 0.97, cos


def test_q4_transcribe_streaming_runs(q4_checkpoint):
    from voxtral_tpu.loaders.gguf_loader import load_q4_model

    cfg, _, path = q4_checkpoint
    model = load_q4_model(path, cfg)
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 41 * 16), jnp.float32) * 0.3
    tokens = model.transcribe_streaming(mel)
    assert tokens.shape == (3,)
