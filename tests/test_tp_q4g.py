"""Tensor-parallel g32 (exact-Q4_0) half-kernel tests.

The TP halves' g32 mode (ops/decode_tp_pallas.py, 5D stacks with a
leading shard axis) must carry the same exactness contract as the
single-chip stack kernel's g32 mode (tests/test_q4g_stack.py): weights
contribute NO quantization error beyond Q4_0 itself (reference dequant
semantics /root/reference/src/gguf/tensor.rs:88-113; VERDICT r4 #1b).

Equivalence strategy: with uniform group scales, g32 math == w8 rowwise
math exactly (same per-shard A8 activation quantization, same integer
dots), so TP g32 runs are compared against TP w8 runs of the SAME
effective weights — exact to f32 accumulation order — across the whole
cache ladder (f32 / spec / HBM-chunked / int8 KV).
"""

import numpy as np

import jax
import jax.numpy as jnp

import tests.test_q4g_stack as tq
from tests.test_parallel import make_mesh, requires_8_devices
from voxtral_tpu.ops.decode_step_pallas import (
    ada_vectors,
    fuse_decode_weights,
    fuse_decode_weights_q4g,
    quantize_kv,
    rope_pair_vectors,
)
from voxtral_tpu.ops.decode_tp_pallas import (
    tp_decode_step,
    tp_lm_head_token,
    tp_shard_fused_weights,
    tp_shard_fused_weights_q4g,
    tp_shard_lm_head_q4g,
)


def _setup(seed=11):
    rng = np.random.default_rng(seed)
    q4_params, w8_params = tq.build_params(
        rng, lambda l, n, g: np.ones((l, n, g)))
    t_embed, k_cache, v_cache, x = tq._inputs(rng)
    fused_g = fuse_decode_weights_q4g(q4_params)
    fused_w = fuse_decode_weights(w8_params)
    adav = ada_vectors(q4_params, t_embed)
    offs = jnp.asarray([tq.OFFSET, 5], jnp.int32)
    cs = [rope_pair_vectors(offs[b], tq.HEAD_DIM, theta=1e6)
          for b in range(tq.B)]
    cos_b = jnp.stack([c for c, _ in cs])
    sin_b = jnp.stack([s for _, s in cs])
    tp_g = tp_shard_fused_weights_q4g(
        fused_g, tq.N_HEADS, tq.N_KV, tq.HEAD_DIM, tq.HIDDEN, tp=2)
    tp_w = tp_shard_fused_weights(
        fused_w, tq.N_HEADS, tq.N_KV, tq.HEAD_DIM, tq.HIDDEN, tp=2)
    kw = dict(n_heads=tq.N_HEADS, n_kv=tq.N_KV, head_dim=tq.HEAD_DIM,
              eps=tq.EPS, interpret=True)
    return (rng, q4_params, w8_params, fused_g, adav, offs,
            cos_b, sin_b, k_cache, v_cache, tp_g, tp_w, kw)


def _run_pair(mesh, x, offs, q4p, w8p, adav, tp_g, tp_w,
              cos_b, sin_b, kc, vc, kw, **extra):
    g = tp_decode_step(
        mesh, x, offs, q4p["layers"]["attention_norm"],
        q4p["layers"]["ffn_norm"], adav,
        tp_g, cos_b, sin_b, kc, vc, **kw, **extra)
    w = tp_decode_step(
        mesh, x, offs, w8p["layers"]["attention_norm"],
        w8p["layers"]["ffn_norm"], adav,
        tp_w, cos_b, sin_b, kc, vc, **kw, **extra)
    return g, w


def test_tp_shard_q4g_layout():
    """Sharding then dequantizing == dequantizing then slicing — pins
    the column-parallel segment gather AND the row-parallel r-major
    scale re-gather in tp_shard_fused_weights_q4g."""
    rng = np.random.default_rng(5)
    q4_params, _ = tq.build_params(
        rng, lambda l, n, g: 2.0 ** rng.integers(0, 3, size=(l, n, g)))
    fused = fuse_decode_weights_q4g(q4_params)
    tp_g = tp_shard_fused_weights_q4g(
        fused, tq.N_HEADS, tq.N_KV, tq.HEAD_DIM, tq.HIDDEN, tp=2)

    def deq(codes, scales):
        # codes [L, SB, N, 128] + scales [L, 4*SB, 1, N] (r-major) ->
        # effective weights [L, N, K] (K = 128*SB, group g = 4*sb + r).
        ll, sb, n, _ = codes.shape
        c = np.transpose(np.asarray(codes, np.float32),
                         (0, 2, 1, 3)).reshape(ll, n, sb, 4, 32)
        s = np.asarray(scales, np.float32).reshape(ll, 4, sb, n)
        s = np.transpose(s, (0, 3, 2, 1))  # [L, N, SB, 4]
        return (c * s[..., None]).reshape(ll, n, sb * 128)

    nq = tq.N_HEADS * tq.HEAD_DIM
    nkv = tq.N_KV * tq.HEAD_DIM
    full_qkv = deq(fused["wqkv"], fused["sqkv"])
    for i in range(2):
        sh = deq(tp_g["wqkv"][i], tp_g["sqkv"][i])
        want = np.concatenate([
            full_qkv[:, i * nq // 2:(i + 1) * nq // 2],
            full_qkv[:, nq + i * nkv // 2:nq + (i + 1) * nkv // 2],
            full_qkv[:, nq + nkv + i * nkv // 2:
                     nq + nkv + (i + 1) * nkv // 2],
        ], axis=1)
        np.testing.assert_array_equal(sh, want)
    full_wo = deq(fused["wo"], fused["so"])
    for i in range(2):
        sh = deq(tp_g["wo"][i], tp_g["so"][i])
        np.testing.assert_array_equal(
            sh, full_wo[:, :, i * nq // 2:(i + 1) * nq // 2])
    full_w2 = deq(fused["w2"], fused["s2"])
    fl = tq.HIDDEN // 2
    for i in range(2):
        sh = deq(tp_g["w2"][i], tp_g["s2"][i])
        np.testing.assert_array_equal(
            sh, full_w2[:, :, i * fl:(i + 1) * fl])


@requires_8_devices
def test_tp_q4g_matches_w8_equivalent():
    """TP g32 halves == TP w8 halves on identical effective weights
    (uniform group scales): exact to f32 accumulation order, every
    layer — any slice/mask/scale-layout bug would be O(1)."""
    (_, q4p, w8p, _, adav, offs, cos_b, sin_b, kc, vc,
     tp_g, tp_w, kw) = _setup()
    mesh = make_mesh(n_data=1, n_model=2)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(tq.B, tq.D)) * 0.5,
        jnp.float32)
    (gx, gk, gv), (wx, wk, wv) = _run_pair(
        mesh, x, offs, q4p, w8p, adav, tp_g, tp_w,
        cos_b, sin_b, kc, vc, kw)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(wk),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                               rtol=1e-5, atol=1e-5)


@requires_8_devices
def test_tp_q4g_chunked_matches_w8_equivalent():
    """HBM-chunked cache mode under TP g32 (double-buffered S-chunks +
    online softmax) keeps the w8-equivalence exactness."""
    (_, q4p, w8p, _, adav, offs, cos_b, sin_b, kc, vc,
     tp_g, tp_w, kw) = _setup()
    mesh = make_mesh(n_data=1, n_model=2)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(tq.B, tq.D)) * 0.5,
        jnp.float32)
    (gx, _, _), (wx, _, _) = _run_pair(
        mesh, x, offs, q4p, w8p, adav, tp_g, tp_w,
        cos_b, sin_b, kc, vc, kw, cache_chunk=8)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                               rtol=1e-5, atol=1e-5)


@requires_8_devices
def test_tp_q4g_spec_matches_w8_equivalent():
    """Speculative K=2 rows through the TP g32 halves keep the
    w8-equivalence exactness (stream-major row groups, fresh-row
    cross-attention included)."""
    (_, q4p, w8p, _, adav, offs, cos_b, sin_b, kc, vc,
     tp_g, tp_w, kw) = _setup()
    mesh = make_mesh(n_data=1, n_model=2)
    rng = np.random.default_rng(2)
    x4 = jnp.asarray(rng.normal(size=(2 * tq.B, tq.D)) * 0.5, jnp.float32)
    cos4 = jnp.concatenate([cos_b, cos_b])
    sin4 = jnp.concatenate([sin_b, sin_b])
    (gx, gk, _), (wx, wk, _) = _run_pair(
        mesh, x4, offs, q4p, w8p, adav, tp_g, tp_w,
        cos4, sin4, kc, vc, kw, spec=2)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(wk),
                               rtol=1e-5, atol=1e-5)


@requires_8_devices
def test_tp_q4g_int8_kv():
    """int8 KV cache under TP g32: fresh K/V rows (bf16) must be
    BIT-IDENTICAL to the w8-equivalent run (same integer QKV dots, same
    bf16 rounding); the residual stream may drift only via A8
    activation-quant round ties (~1 code), bounded well below any
    layout-bug failure mode."""
    (_, q4p, w8p, _, adav, offs, cos_b, sin_b, kc, vc,
     tp_g, tp_w, kw) = _setup()
    mesh = make_mesh(n_data=1, n_model=2)
    kq, ks = quantize_kv(kc)
    vq, vs = quantize_kv(vc)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(tq.B, tq.D)) * 0.5,
        jnp.float32)
    (gx, gk, gv), (wx, wk, wv) = _run_pair(
        mesh, x, offs, q4p, w8p, adav, tp_g, tp_w,
        cos_b, sin_b, kq, vq, kw, k_scales=ks, v_scales=vs)
    np.testing.assert_array_equal(
        np.asarray(gk.astype(jnp.float32)),
        np.asarray(wk.astype(jnp.float32)))
    np.testing.assert_array_equal(
        np.asarray(gv.astype(jnp.float32)),
        np.asarray(wv.astype(jnp.float32)))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                               rtol=0.02, atol=0.02)


@requires_8_devices
def test_tp_q4g_lm_fold():
    """Vocab-sharded g32 lm fold: greedy token == argmax of the XLA g32
    reference logits (q4g_matmul_a8) on the final-norm output —
    non-uniform f16 scales, exact group path per shard + pmax/pmin
    resolution."""
    from voxtral_tpu.ops.q4 import q4g_matmul_a8

    (_, q4p, _, _, adav, offs, cos_b, sin_b, kc, vc,
     tp_g, tp_w, kw) = _setup()
    rng = np.random.default_rng(7)
    V = 384
    emb_codes = rng.integers(-8, 8, size=(V, tq.D), dtype=np.int8)
    emb_scales = (0.005 + rng.random((V, tq.D // 32)) * 0.03
                  ).astype(np.float16)
    q4p = dict(q4p)
    q4p["tok_embeddings"] = tq._q4_leaf_from(emb_codes, emb_scales)
    q4p["norm"] = jnp.asarray(
        1.0 + rng.normal(size=(tq.D,)) * 0.1, jnp.float32)
    fused = fuse_decode_weights_q4g(q4p)
    lm_tp = tp_shard_lm_head_q4g(fused["lm_codes"], fused["lm_scale"], 2)

    mesh = make_mesh(n_data=1, n_model=2)
    x = jnp.asarray(rng.normal(size=(tq.B, tq.D)) * 0.5, jnp.float32)
    tok = tp_lm_head_token(mesh, x, q4p["norm"], lm_tp["codes"],
                           lm_tp["scale"], eps=tq.EPS, interpret=True)

    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    h = xf * jax.lax.rsqrt(var + tq.EPS) * q4p["norm"]
    logits = q4g_matmul_a8(h, jnp.asarray(emb_codes),
                           jnp.asarray(emb_scales))
    np.testing.assert_array_equal(np.asarray(tok),
                                  np.argmax(np.asarray(logits), -1))


def _tp_cfg():
    """q4g-qualifying geometry whose LOCAL dims stay % 128 at tp=2."""
    from voxtral_tpu.config import (
        AdapterConfig,
        AudioEncoderConfig,
        AudioInputConfig,
        LanguageModelConfig,
        VoxtralConfig,
    )

    return VoxtralConfig(
        audio_encoder=AudioEncoderConfig(
            dim=128, n_layers=2, n_heads=2, n_kv_heads=2, head_dim=64,
            hidden_dim=256, sliding_window=64,
        ),
        language_model=LanguageModelConfig(
            dim=128, n_layers=2, n_heads=4, n_kv_heads=2, head_dim=64,
            hidden_dim=256, vocab_size=1280, sliding_window=64,
        ),
        adapter=AdapterConfig(input_dim=512, hidden_dim=128,
                              output_dim=128),
        audio=AudioInputConfig(),
        ada_rms_norm_t_cond_dim=8,
        downsample_factor=4,
    )


@requires_8_devices
def test_tp_q4g_full_transcribe(monkeypatch):
    """Full-model routing on a tp=2 mesh: a q4g model keeps its fused
    mode (5D TP stacks + vocab-sharded g32 lm fold) and the TP
    transcribe agrees with the single-chip q4g transcribe (identical
    weight numerics; only per-shard A8 activation quantization
    differs)."""
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.utils.quantize import quantize_params_q4

    cfg = _tp_cfg()
    dense = VoxtralModel.init_random(
        jax.random.PRNGKey(0), cfg, dtype=np.float32).params
    q4 = quantize_params_q4(
        jax.tree_util.tree_map(np.asarray, dense), pack=False)
    mel = jax.random.normal(
        jax.random.PRNGKey(6), (1, cfg.audio.num_mel_bins, 41 * 16),
        jnp.float32) * 0.3

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    ref_m = VoxtralModel(q4, cfg)
    assert ref_m.megakernel_weights == "q4g"
    ref = ref_m.transcribe_streaming(mel).tolist()

    mesh = make_mesh(n_data=1, n_model=2)
    m = VoxtralModel(q4, cfg, mesh=mesh)
    assert m.megakernel_weights == "q4g"
    assert m.fused_tp is not None
    assert m.fused_tp["wqkv"].ndim == 5
    assert "lm_codes" in m.fused_tp
    got = m.transcribe_streaming(mel).tolist()
    diverged = sum(a != b for a, b in zip(ref, got))
    assert diverged / max(1, len(ref)) <= 0.1, (ref, got)


@requires_8_devices
def test_tp_q4g_gate_falls_back():
    """Local contraction dims not % 128 (nq/tp = 64) must drop the
    fused path entirely — the model rides the GSPMD XLA step."""
    from scripts.q4_error_report import error_cfg

    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.utils.quantize import quantize_params_q4

    cfg = error_cfg()  # lm nq = 128 -> nq/tp = 64
    dense = VoxtralModel.init_random(
        jax.random.PRNGKey(1), cfg, dtype=np.float32).params
    q4 = quantize_params_q4(
        jax.tree_util.tree_map(np.asarray, dense), pack=False)
    mesh = make_mesh(n_data=1, n_model=2)
    m = VoxtralModel(q4, cfg, mesh=mesh)
    assert m.megakernel_weights is None
    assert m.fused_tp is None and m.fused_decode is None
    mel = jax.random.normal(
        jax.random.PRNGKey(2), (1, cfg.audio.num_mel_bins, 41 * 16),
        jnp.float32) * 0.3
    toks = m.transcribe_streaming(mel)
    assert toks.shape[0] > 0


@requires_8_devices
def test_tp_q4g_pooled_streaming_matches_solo(monkeypatch):
    """StreamPool on a tp=2 mesh with a q4g model rides the g32 TP
    halves + vocab-sharded g32 lm fold (streaming._fused_plan wg gate);
    pooled tokens must equal a solo TP session token-for-token (same
    kernels, same per-row activation quant)."""
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession, StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_q4

    cfg = _tp_cfg()
    dense = VoxtralModel.init_random(
        jax.random.PRNGKey(4), cfg, dtype=np.float32).params
    q4 = quantize_params_q4(
        jax.tree_util.tree_map(np.asarray, dense), pack=False)

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    mesh = make_mesh(n_data=1, n_model=2)
    m = VoxtralModel(q4, cfg, mesh=mesh)
    assert m.megakernel_weights == "q4g"
    assert m.fused_tp is not None and "lm_codes" in m.fused_tp

    rng = np.random.default_rng(8)
    audio_a = rng.normal(size=16000 * 3).astype(np.float32) * 0.25
    audio_b = rng.normal(size=16000 * 2).astype(np.float32) * 0.3

    def solo(audio):
        s = StreamingSession(m, step_positions=8, max_duration_s=30)
        s.feed(audio)
        s.finish()
        return s.tokens

    sa, sb = solo(audio_a), solo(audio_b)

    pool = StreamPool(m, max_streams=2, step_positions=8,
                      max_duration_s=30)
    assert pool._fused is not None and pool._tp_mesh is not None
    pa = StreamingSession(m, step_positions=8, pool=pool)
    pb = StreamingSession(m, step_positions=8, pool=pool)
    for qa, qb in zip(np.array_split(audio_a, 2),
                      np.array_split(audio_b, 2)):
        pa.feed(qa)
        pb.feed(qb)
    pa.finish()
    pb.finish()
    assert pa.tokens == sa, (pa.tokens, sa)
    assert pb.tokens == sb, (pb.tokens, sb)
