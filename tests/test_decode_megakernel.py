"""Decode megakernel (one pallas_call per decoder layer) equivalence tests.

Runs the fused kernel in interpret mode on production-structured small
dims and asserts it matches the standard XLA decode layer (same w8
quantized weights, same single-token cached-attention semantics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxtral_tpu.models.layers import (
    AttentionSpec,
    decoder_block_with_cache,
    rope_tables,
)
from voxtral_tpu.ops.decode_step_pallas import (
    ada_vectors,
    decode_layer_step,
    fuse_decode_weights,
    rope_pair_vectors,
    supports_megakernel,
)
from voxtral_tpu.ops.w8 import quantize_w8_rowwise

L, B, S, D = 3, 2, 16, 256
N_HEADS, N_KV, HEAD_DIM, HIDDEN = 8, 2, 32, 512
T_COND = 8
OFFSET = 7
EPS = 1e-5


def _w8_stack(rng, n, k):
    per = [quantize_w8_rowwise(
        (rng.normal(size=(n, k)) * 0.05).astype(np.float32))["w8"]
        for _ in range(L)]
    return {"w8": {
        "codes": jnp.asarray(np.stack([p["codes"] for p in per])),
        "scale": jnp.asarray(np.stack([p["scale"] for p in per])),
    }}


def build_setup():
    rng = np.random.default_rng(0)
    nq, nkv = N_HEADS * HEAD_DIM, N_KV * HEAD_DIM
    params = {
        "layers": {
            "ada": {
                "w0": jnp.asarray(rng.normal(size=(L, D, T_COND)) * 0.05,
                                  jnp.float32),
                "w2": jnp.asarray(rng.normal(size=(L, T_COND, D)) * 0.05,
                                  jnp.float32),
            },
            "attention_norm": jnp.asarray(
                1.0 + rng.normal(size=(L, D)) * 0.1, jnp.float32),
            "attention": {
                "wq": _w8_stack(rng, nq, D),
                "wk": _w8_stack(rng, nkv, D),
                "wv": _w8_stack(rng, nkv, D),
                "wo": _w8_stack(rng, D, nq),
            },
            "ffn_norm": jnp.asarray(
                1.0 + rng.normal(size=(L, D)) * 0.1, jnp.float32),
            "ffn": {
                "w1": _w8_stack(rng, HIDDEN, D),
                "w2": _w8_stack(rng, D, HIDDEN),
                "w3": _w8_stack(rng, HIDDEN, D),
            },
        },
    }
    t_embed = jnp.asarray(rng.normal(size=(1, 1, D)) * 0.3, jnp.float32)
    k_cache = jnp.asarray(rng.normal(size=(L, B, S, N_KV, HEAD_DIM)) * 0.4,
                          jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(L, B, S, N_KV, HEAD_DIM)) * 0.4,
                          jnp.float32)
    # Zero out unwritten slots like a real cache (masked anyway).
    mask = (np.arange(S) < OFFSET)[None, None, :, None, None]
    k_cache = k_cache * mask
    v_cache = v_cache * mask
    x = jnp.asarray(rng.normal(size=(B, D)) * 0.5, jnp.float32)
    return params, t_embed, k_cache, v_cache, x


@pytest.fixture(scope="module")
def setup():
    return build_setup()


def test_supports_megakernel(setup):
    params, *_ = setup
    assert supports_megakernel(params, HEAD_DIM)
    assert not supports_megakernel({"layers": {"attention": {"wq": jnp.ones(1)}}}, HEAD_DIM)


def test_rope_pair_vectors_match_tables():
    cos, sin = rope_tables(HEAD_DIM, 32, theta=1e6)
    for pos in (0, 5, 31):
        c, s = rope_pair_vectors(jnp.asarray(pos), HEAD_DIM, theta=1e6)
        # interleaved-pair contract: c[2i] = cos[pos, i], s[2i+1] = sin[pos, i]
        np.testing.assert_allclose(np.asarray(c[0::2]), np.asarray(cos[pos]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(c[1::2]), np.asarray(cos[pos]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s[0::2]), -np.asarray(sin[pos]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s[1::2]), np.asarray(sin[pos]),
                                   rtol=1e-6)


def test_megakernel_matches_xla_layer(setup):
    params, t_embed, k_cache, v_cache, x = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    assert adav.shape == (L, D)

    spec = AttentionSpec(n_heads=N_HEADS, n_kv_heads=N_KV,
                         head_dim=HEAD_DIM, sliding_window=None, causal=True)
    cos, sin = rope_tables(HEAD_DIM, S, theta=1e6)
    offset = jnp.asarray(OFFSET, jnp.int32)
    cos_p, sin_p = rope_pair_vectors(offset, HEAD_DIM, theta=1e6)

    for l in range(L):
        layer_params = jax.tree_util.tree_map(lambda a: a[l], lyr)

        # Reference: standard XLA decode layer on one token.
        ref_x, ref_k, ref_v = decoder_block_with_cache(
            x[:, None, :], t_embed, layer_params, spec, cos, sin,
            k_cache[l], v_cache[l], offset, EPS,
        )

        # Megakernel (interpret mode).
        out_x, k_new, v_new = decode_layer_step(
            x, jnp.asarray(l, jnp.int32), offset,
            lyr["attention_norm"][l], lyr["ffn_norm"][l], adav[l],
            fused["sqkv"][l], fused["so"][l], fused["s13"][l], fused["s2"][l],
            cos_p, sin_p,
            k_cache[l], v_cache[l],
            fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
            n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
            interpret=True,
        )

        np.testing.assert_allclose(
            np.asarray(out_x), np.asarray(ref_x[:, 0, :]),
            rtol=2e-3, atol=2e-3, err_msg=f"layer {l} hidden mismatch",
        )
        # The reference wrote K/V at OFFSET inside its cache copy.
        np.testing.assert_allclose(
            np.asarray(k_new), np.asarray(ref_k[:, OFFSET]),
            rtol=2e-3, atol=2e-3, err_msg=f"layer {l} k mismatch",
        )
        np.testing.assert_allclose(
            np.asarray(v_new), np.asarray(ref_v[:, OFFSET]),
            rtol=2e-3, atol=2e-3, err_msg=f"layer {l} v mismatch",
        )


def test_megakernel_sliding_window(setup):
    """window= must reproduce the banded mask (diff <= w) of the XLA
    layer — the lower bound binds when offset > window."""
    params, t_embed, k_cache, v_cache, x = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)

    WINDOW = 4
    assert OFFSET > WINDOW  # the lower bound must actually bind
    spec = AttentionSpec(n_heads=N_HEADS, n_kv_heads=N_KV,
                         head_dim=HEAD_DIM, sliding_window=WINDOW,
                         causal=True)
    cos, sin = rope_tables(HEAD_DIM, S, theta=1e6)
    offset = jnp.asarray(OFFSET, jnp.int32)
    cos_p, sin_p = rope_pair_vectors(offset, HEAD_DIM, theta=1e6)

    l = 0
    layer_params = jax.tree_util.tree_map(lambda a: a[l], lyr)
    ref_x, _, _ = decoder_block_with_cache(
        x[:, None, :], t_embed, layer_params, spec, cos, sin,
        k_cache[l], v_cache[l], offset, EPS,
    )
    out_x, _, _ = decode_layer_step(
        x, jnp.asarray(l, jnp.int32), offset,
        lyr["attention_norm"][l], lyr["ffn_norm"][l], adav[l],
        fused["sqkv"][l], fused["so"][l], fused["s13"][l], fused["s2"][l],
        cos_p, sin_p, k_cache[l], v_cache[l],
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
        n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
        interpret=True, window=WINDOW,
    )
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x[:, 0, :]),
                               rtol=2e-3, atol=2e-3)
    # Sanity: without the window the result must differ (the mask binds).
    out_nw, _, _ = decode_layer_step(
        x, jnp.asarray(l, jnp.int32), offset,
        lyr["attention_norm"][l], lyr["ffn_norm"][l], adav[l],
        fused["sqkv"][l], fused["so"][l], fused["s13"][l], fused["s2"][l],
        cos_p, sin_p, k_cache[l], v_cache[l],
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
        n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
        interpret=True,
    )
    assert not np.allclose(np.asarray(out_nw), np.asarray(ref_x[:, 0, :]),
                           rtol=2e-3, atol=2e-3)


def test_stack_kernel_per_row_offsets(setup):
    """Vector offsets + per-row RoPE: each batch row must behave exactly
    as a scalar-offset call at that row's position (pooled sessions)."""
    from voxtral_tpu.ops.decode_step_pallas import decode_stack_step

    params, t_embed, k_cache, v_cache, x = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    assert B == 2

    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))
    offs = jnp.asarray([OFFSET, 3], jnp.int32)
    cs = [rope_pair_vectors(offs[b], HEAD_DIM, theta=1e6) for b in range(B)]
    cos_b = jnp.stack([c for c, _ in cs])
    sin_b = jnp.stack([s for _, s in cs])

    common = dict(n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
                  interpret=True, window=4)
    vec_x, vec_k, vec_v = decode_stack_step(
        x, offs,
        lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_b, sin_b, kt, vt,
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"], **common)

    for b in range(B):
        # Scalar call on a B=2 batch built from row b duplicated (the
        # kernel's dims are batch-uniform; row b of the result is exact).
        dup = lambda a, axis: jnp.stack([a, a], axis=axis)  # noqa: E731
        sx, sk, sv = decode_stack_step(
            dup(x[b], 0), offs[b],
            lyr["attention_norm"], lyr["ffn_norm"], adav,
            fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
            cos_b[b], sin_b[b], dup(kt[:, b], 1), dup(vt[:, b], 1),
            fused["wqkv"], fused["wo"], fused["w13"], fused["w2"], **common)
        np.testing.assert_allclose(np.asarray(vec_x[b]), np.asarray(sx[0]),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"row {b} hidden")
        np.testing.assert_allclose(np.asarray(vec_k[:, b]),
                                   np.asarray(sk[:, 0]),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(vec_v[:, b]),
                                   np.asarray(sv[:, 0]),
                                   rtol=2e-3, atol=2e-3)


def test_stack_kernel_matches_per_layer(setup):
    """decode_stack_step (grid over layers, one pallas_call) must match
    running decode_layer_step sequentially with cache appends."""
    from voxtral_tpu.ops.decode_step_pallas import (
        decode_stack_step,
        supports_stack_kernel,
    )

    params, t_embed, k_cache, v_cache, x = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    offset = jnp.asarray(OFFSET, jnp.int32)
    cos_p, sin_p = rope_pair_vectors(offset, HEAD_DIM, theta=1e6)

    class _LM:
        dim, n_heads, n_kv_heads = D, N_HEADS, N_KV
        head_dim, hidden_dim = HEAD_DIM, HIDDEN

    assert supports_stack_kernel(_LM)

    # Reference: per-layer megakernel chained through the residual stream
    # (caches are per-layer independent at a single decode position).
    ref_x = x
    ref_k, ref_v = [], []
    for l in range(L):
        ref_x, k_new, v_new = decode_layer_step(
            ref_x, jnp.asarray(l, jnp.int32), offset,
            lyr["attention_norm"][l], lyr["ffn_norm"][l], adav[l],
            fused["sqkv"][l], fused["so"][l], fused["s13"][l],
            fused["s2"][l], cos_p, sin_p,
            k_cache[l], v_cache[l],
            fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
            n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
            interpret=True,
        )
        ref_k.append(k_new)
        ref_v.append(v_new)

    out_x, kn, vn = decode_stack_step(
        x, offset,
        lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_p, sin_p,
        jnp.transpose(k_cache, (0, 1, 3, 2, 4)),  # head-major layout
        jnp.transpose(v_cache, (0, 1, 3, 2, 4)),
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
        n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
        interpret=True,
    )

    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(kn), np.asarray(jnp.stack(ref_k)),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(vn), np.asarray(jnp.stack(ref_v)),
                               rtol=2e-3, atol=2e-3)


def test_stack_kernel_lm_fold(setup):
    """Folded final-norm + lm_head grid step must match running the
    stack kernel followed by XLA rms_norm + w8 lm_head."""
    from voxtral_tpu.models.layers import rms_norm
    from voxtral_tpu.ops.decode_step_pallas import decode_stack_step
    from voxtral_tpu.ops.w8 import w8_matmul

    params, t_embed, k_cache, v_cache, x = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    offset = jnp.asarray(OFFSET, jnp.int32)
    cos_p, sin_p = rope_pair_vectors(offset, HEAD_DIM, theta=1e6)

    V = 1024
    rng = np.random.default_rng(7)
    lm_w8 = quantize_w8_rowwise(
        (rng.normal(size=(V, D)) * 0.05).astype(np.float32))["w8"]
    final_norm = jnp.asarray(1.0 + rng.normal(size=(D,)) * 0.1, jnp.float32)

    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))
    args = (
        x, offset,
        lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_p, sin_p, kt, vt,
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
    )
    kw = dict(n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
              interpret=True)

    ref_x, ref_k, ref_v = decode_stack_step(*args, **kw)
    hidden = rms_norm(ref_x, final_norm, EPS)
    ref_logits = w8_matmul(
        hidden, {"codes": jnp.asarray(lm_w8["codes"]),
                 "scale": jnp.asarray(lm_w8["scale"])})

    out_x, kn, vn, logits = decode_stack_step(
        *args, final_norm=final_norm,
        lm_codes=jnp.asarray(lm_w8["codes"]),
        lm_scale=jnp.asarray(lm_w8["scale"]), **kw)

    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(kn), np.asarray(ref_k),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=5e-3, atol=5e-3)
    assert int(jnp.argmax(logits[0])) == int(jnp.argmax(ref_logits[0]))


def test_fused_transcribe_matches_xla_path(monkeypatch):
    """Full transcribe with the megakernel (interpret mode) must produce
    the same tokens as the standard XLA w8 path on the golden model."""
    from tests.test_golden_full_model import golden_cfg, golden_mel
    from tests.test_safetensors_loader import synth_checkpoint
    from safetensors.numpy import save_file
    from voxtral_tpu.loaders.safetensors_loader import load_voxtral_params
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.utils.quantize import quantize_params_w8
    import tempfile, os

    cfg = golden_cfg()
    tensors = synth_checkpoint(cfg, np.random.default_rng(42))
    tensors = {k: (v * 0.25).astype(np.float32) for k, v in tensors.items()}
    d = tempfile.mkdtemp()
    path = f"{d}/consolidated.safetensors"
    save_file(tensors, path)
    mel = golden_mel()

    def build():
        dense = load_voxtral_params(path, cfg, dtype="float32",
                                    to_device=False)
        return VoxtralModel(quantize_params_w8(dense), cfg)

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    plain = build()
    assert plain.fused_decode is None
    ref_tokens = plain.transcribe_streaming(mel)

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    fused = build()
    assert fused.fused_decode is not None
    mk_tokens = fused.transcribe_streaming(mel)

    assert mk_tokens.tolist() == ref_tokens.tolist(), (
        mk_tokens.tolist(), ref_tokens.tolist())


def test_fused_transcribe_vmem_gate_falls_back(monkeypatch):
    """When the batch geometry exceeds the stack kernel's VMEM budget
    (e.g. the pipeline merged many chunks into one batch), transcribe
    must drop the lm fold / whole-stack kernel and still produce the
    same tokens through the per-layer fused path."""
    from tests.test_golden_full_model import golden_cfg, golden_mel
    from tests.test_safetensors_loader import synth_checkpoint
    from safetensors.numpy import save_file
    from voxtral_tpu.loaders.safetensors_loader import load_voxtral_params
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.utils.quantize import quantize_params_w8
    import voxtral_tpu.ops.decode_step_pallas as dsp
    import tempfile

    cfg = golden_cfg()
    tensors = synth_checkpoint(cfg, np.random.default_rng(42))
    tensors = {k: (v * 0.25).astype(np.float32) for k, v in tensors.items()}
    d = tempfile.mkdtemp()
    path = f"{d}/consolidated.safetensors"
    save_file(tensors, path)
    mel = golden_mel()

    def build():
        dense = load_voxtral_params(path, cfg, dtype="float32",
                                    to_device=False)
        return VoxtralModel(quantize_params_w8(dense), cfg)

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    ref_tokens = build().transcribe_streaming(mel)

    # Gate the whole stack kernel off: the per-layer fused fallback must
    # produce identical tokens (fresh model instance = fresh jit cache).
    monkeypatch.setattr(dsp, "STACK_VMEM_CAP", 1)
    gated_tokens = build().transcribe_streaming(mel)
    assert gated_tokens.tolist() == ref_tokens.tolist()


def test_stack_kernel_int8_cache_matches_bf16(setup):
    """int8 KV cache (per-vector scales; both attention dots on the int8
    MXU) must track the float-cache stack kernel within quantization
    noise and agree on the folded-lm_head argmax."""
    from voxtral_tpu.ops.decode_step_pallas import (
        decode_stack_step,
        quantize_kv,
    )

    params, t_embed, k_cache, v_cache, x = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    offs = jnp.asarray([OFFSET, 5], jnp.int32)
    cs = [rope_pair_vectors(offs[b], HEAD_DIM, theta=1e6) for b in range(B)]
    cos_b = jnp.stack([c for c, _ in cs])
    sin_b = jnp.stack([s for _, s in cs])
    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))  # head-major
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))

    rng = np.random.default_rng(9)
    V = 1024
    lm_w8 = quantize_w8_rowwise(
        (rng.normal(size=(V, D)) * 0.05).astype(np.float32))["w8"]
    lm_kw = dict(final_norm=jnp.ones((D,), jnp.float32),
                 lm_codes=jnp.asarray(lm_w8["codes"]),
                 lm_scale=jnp.asarray(lm_w8["scale"]))
    common = dict(n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
                  interpret=True, window=8)

    args = (x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
            fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
            cos_b, sin_b)
    weights = (fused["wqkv"], fused["wo"], fused["w13"], fused["w2"])
    ref_x, ref_k, ref_v, ref_logits = decode_stack_step(
        *args, kt, vt, *weights, **lm_kw, **common)

    kq, ks = quantize_kv(kt)
    vq, vs = quantize_kv(vt)
    out_x, kn, vn, logits = decode_stack_step(
        *args, kq, vq, *weights, **lm_kw,
        k_scales=ks, v_scales=vs, **common)

    assert kn.dtype == jnp.bfloat16  # caller quantizes the appends
    # Layer 0's fresh K comes from the SAME pre-cache QKV matmul — only
    # bf16 output rounding separates it from the f32-cache reference.
    np.testing.assert_allclose(np.asarray(kn[0], np.float32),
                               np.asarray(ref_k[0], np.float32),
                               rtol=1e-2, atol=1e-2)
    # Deeper layers inherit the residual stream's cache-quant noise
    # (int8 per-vector K/V: ~0.5%/layer; wrong-mask/slot bugs are O(1)).
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(ref_k, np.float32),
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x),
                               rtol=0.1, atol=0.12)
    assert float(np.abs(np.asarray(out_x) - np.asarray(ref_x)).max()) < 0.12
    assert (np.argmax(np.asarray(logits), -1)
            == np.argmax(np.asarray(ref_logits), -1)).all()


def test_stack_kernel_lm_argmax_fold(setup):
    """In-kernel greedy argmax (running max/first-index over vocab tiles)
    must equal argmax over the materialized logits, including ties."""
    from voxtral_tpu.ops.decode_step_pallas import decode_stack_step

    params, t_embed, k_cache, v_cache, x = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    offs = jnp.asarray([OFFSET, 5], jnp.int32)
    cs = [rope_pair_vectors(offs[b], HEAD_DIM, theta=1e6) for b in range(B)]
    cos_b = jnp.stack([c for c, _ in cs])
    sin_b = jnp.stack([s for _, s in cs])
    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))

    rng = np.random.default_rng(11)
    V = 1024
    lm_w8 = quantize_w8_rowwise(
        (rng.normal(size=(V, D)) * 0.05).astype(np.float32))["w8"]
    lm_kw = dict(final_norm=jnp.ones((D,), jnp.float32),
                 lm_codes=jnp.asarray(lm_w8["codes"]),
                 lm_scale=jnp.asarray(lm_w8["scale"]))
    common = dict(n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
                  interpret=True, window=8)
    args = (x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
            fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
            cos_b, sin_b, kt, vt,
            fused["wqkv"], fused["wo"], fused["w13"], fused["w2"])

    _, _, _, logits = decode_stack_step(*args, **lm_kw, **common)
    _, _, _, tok = decode_stack_step(*args, **lm_kw, lm_argmax=True,
                                     **common)
    assert tok.shape == (B, 1) and tok.dtype == jnp.int32
    np.testing.assert_array_equal(
        np.asarray(tok)[:, 0], np.argmax(np.asarray(logits), axis=-1))


@pytest.mark.parametrize("qkv_pre,lm_pre", [(3, 1), (1, 3)])
def test_stack_kernel_asymmetric_prefetch_depths(setup, monkeypatch,
                                                 qkv_pre, lm_pre):
    """The w2-tail must pre-issue each stream's tiles gated by that
    stream's OWN depth: with VOXTRAL_STACK_PRE/VOXTRAL_LM_PRE set to
    different values, issuing range(max(qkv, lm)) into both streams
    double-starts the shallower stream's DMA into an in-use rotating
    slot.  Regression for the schedule-generation fix — results under
    asymmetric depths must match the default schedule."""
    import voxtral_tpu.ops.decode_step_pallas as dsp

    params, t_embed, k_cache, v_cache, x = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    offset = jnp.asarray(OFFSET, jnp.int32)
    cos_p, sin_p = rope_pair_vectors(offset, HEAD_DIM, theta=1e6)
    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))

    rng = np.random.default_rng(23)
    V = 1024
    lm_w8 = quantize_w8_rowwise(
        (rng.normal(size=(V, D)) * 0.05).astype(np.float32))["w8"]
    args = (x, offset, lyr["attention_norm"], lyr["ffn_norm"], adav,
            fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
            cos_p, sin_p, kt, vt,
            fused["wqkv"], fused["wo"], fused["w13"], fused["w2"])
    kw = dict(final_norm=jnp.ones((D,), jnp.float32),
              lm_codes=jnp.asarray(lm_w8["codes"]),
              lm_scale=jnp.asarray(lm_w8["scale"]),
              n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
              interpret=True)

    ref = dsp.decode_stack_step(*args, **kw)

    pre = dict(dsp.STACK_PRE, qkv=qkv_pre)
    monkeypatch.setattr(dsp, "STACK_PRE", pre)
    monkeypatch.setattr(dsp, "STACK_SLOTS", {p: pre[p] + 2 for p in pre})
    monkeypatch.setattr(dsp, "STACK_TAILS", dsp._build_schedule(pre))
    monkeypatch.setattr(dsp, "LM_PRE", lm_pre)
    monkeypatch.setattr(dsp, "LM_SLOTS", lm_pre + 2)

    out = dsp.decode_stack_step(*args, **kw)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_stack_kernel_chunked_cache_matches_resident(setup):
    """HBM-chunked cache attention (online softmax over S-chunks) must
    match the VMEM-resident path, including ring mode with the cache
    padded past head+size (dead slots masked by the r < size guard) and
    the int8-cache variant."""
    from voxtral_tpu.ops.decode_step_pallas import (
        decode_stack_step,
        quantize_kv,
    )

    params, t_embed, k_cache, v_cache, x = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    offs = jnp.asarray([OFFSET, 5], jnp.int32)
    cs = [rope_pair_vectors(offs[b], HEAD_DIM, theta=1e6) for b in range(B)]
    cos_b = jnp.stack([c for c, _ in cs])
    sin_b = jnp.stack([s for _, s in cs])
    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))  # [L, B, Hkv, S, hd]
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))

    common = dict(n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
                  interpret=True, window=8)
    args = (x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
            fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
            cos_b, sin_b)
    weights = (fused["wqkv"], fused["wo"], fused["w13"], fused["w2"])

    # -- plain bounded cache, chunk 8 over S=16 ---------------------------
    ref = decode_stack_step(*args, kt, vt, *weights, **common)
    out = decode_stack_step(*args, kt, vt, *weights, cache_chunk=8,
                            **common)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r, np.float32),
                                   np.asarray(o, np.float32),
                                   rtol=2e-5, atol=2e-5)

    # -- ring cache PADDED past head+size (ring=(4, 8) -> valid slots
    #    [0, 12); slots [12, 16) are dead and must be masked) -------------
    ring = (4, 8)
    roffs = jnp.asarray([13, 9], jnp.int32)  # wrapped ring offsets
    rcs = [rope_pair_vectors(roffs[b], HEAD_DIM, theta=1e6)
           for b in range(B)]
    rargs = (x, roffs, lyr["attention_norm"], lyr["ffn_norm"], adav,
             fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
             jnp.stack([c for c, _ in rcs]), jnp.stack([s for _, s in rcs]))
    # Poison the dead slots: resident path uses the exact-size cache,
    # chunked uses the padded one with garbage — results must agree.
    kt12, vt12 = kt[:, :, :, :12], vt[:, :, :, :12]
    kt_pad = kt.at[:, :, :, 12:].set(1e3)
    vt_pad = vt.at[:, :, :, 12:].set(1e3)
    ref_r = decode_stack_step(*rargs, kt12, vt12, *weights, ring=ring,
                              **common)
    out_r = decode_stack_step(*rargs, kt_pad, vt_pad, *weights, ring=ring,
                              cache_chunk=8, **common)
    for r, o in zip(ref_r, out_r):
        np.testing.assert_allclose(np.asarray(r, np.float32),
                                   np.asarray(o, np.float32),
                                   rtol=2e-5, atol=2e-5)

    # -- int8 cache + chunks ----------------------------------------------
    kq, ks = quantize_kv(kt)
    vq, vs = quantize_kv(vt)
    ref_q = decode_stack_step(*args, kq, vq, *weights,
                              k_scales=ks, v_scales=vs, **common)
    out_q = decode_stack_step(*args, kq, vq, *weights,
                              k_scales=ks, v_scales=vs, cache_chunk=8,
                              **common)
    # Chunked int8 requantizes the softmax weights PER CHUNK (finer
    # granularity than the resident single pass) — near-equal.
    for r, o in zip(ref_q, out_q):
        np.testing.assert_allclose(np.asarray(r, np.float32),
                                   np.asarray(o, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_stack_kernel_chunked_cache_skips_dead_chunks(setup):
    """The chunked cache loop has DYNAMIC bounds: chunks wholly outside
    the union of the rows' valid slot ranges are never DMA'd.  Poison
    them with NaN — any read would propagate through 0*NaN in the
    masked V contraction, so a match proves the skip."""
    from voxtral_tpu.ops.decode_step_pallas import decode_stack_step

    params, t_embed, k_cache, v_cache, x = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))  # [L, B, Hkv, S, hd]
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))
    weights = (fused["wqkv"], fused["wo"], fused["w13"], fused["w2"])
    common = dict(n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
                  interpret=True)

    def run(offs, k, v, window, **kw):
        cs = [rope_pair_vectors(offs[b], HEAD_DIM, theta=1e6)
              for b in range(B)]
        args = (x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
                fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
                jnp.stack([c for c, _ in cs]),
                jnp.stack([s for _, s in cs]))
        return decode_stack_step(*args, k, v, *weights, window=window,
                                 **common, **kw)

    # Trailing chunks beyond max(offs)=7 (chunk 8 over S=16: chunk 1
    # is dead for both rows).
    offs = jnp.asarray([OFFSET, 5], jnp.int32)
    ref = run(offs, kt, vt, 8)
    k_nan = kt.at[:, :, :, 8:].set(jnp.nan)
    v_nan = vt.at[:, :, :, 8:].set(jnp.nan)
    out = run(offs, k_nan, v_nan, 8, cache_chunk=8)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r, np.float32),
                                   np.asarray(o, np.float32),
                                   rtol=2e-5, atol=2e-5)

    # Leading chunks below every row's window band (offs 15/14, window
    # 4, chunk 4: valid band [10, 15) -> chunks 0-1 dead, 2-3 live).
    offs_w = jnp.asarray([15, 14], jnp.int32)
    ref_w = run(offs_w, kt, vt, 4)
    k_lo = kt.at[:, :, :, :8].set(jnp.nan)
    v_lo = vt.at[:, :, :, :8].set(jnp.nan)
    out_w = run(offs_w, k_lo, v_lo, 4, cache_chunk=4)
    for r, o in zip(ref_w, out_w):
        np.testing.assert_allclose(np.asarray(r, np.float32),
                                   np.asarray(o, np.float32),
                                   rtol=2e-5, atol=2e-5)
