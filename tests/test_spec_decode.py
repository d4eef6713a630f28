"""Speculative K-token decode (VERDICT r3 next #1, ROADMAP r4 #5).

``decode_stack_step(spec=K)`` verifies K drafted tokens in ONE weight
pass: rows (stream b, draft slot j) share stream b's cache and row j
attends the fresh K/V of rows i <= j in-register.  Exactness is
draft-independent — the kernel's row-j outputs must equal running the
non-speculative step j times with the drafted feedback, for ARBITRARY
inputs.  The streaming integration (``StreamingSession(speculative=K)``,
all-[STREAMING_PAD] draft policy) must be token-identical to the
sequential session on any audio; acceptance only moves throughput.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_decode_megakernel import (
    B,
    D,
    HEAD_DIM,
    EPS,
    L,
    N_HEADS,
    N_KV,
    S,
    build_setup,
)
from voxtral_tpu.ops.decode_step_pallas import (
    ada_vectors,
    decode_stack_step,
    fuse_decode_weights,
    quantize_kv,
    rope_pair_vectors,
)

OFF = 5


@pytest.fixture(scope="module")
def setup():
    return build_setup()


def _append(kc, vc, kn, vn, off):
    z = jnp.zeros((), jnp.int32)
    o = jnp.asarray(off, jnp.int32)
    kc = jax.lax.dynamic_update_slice(
        kc, kn[:, :, :, None].astype(kc.dtype), (z, z, z, o, z))
    vc = jax.lax.dynamic_update_slice(
        vc, vn[:, :, :, None].astype(vc.dtype), (z, z, z, o, z))
    return kc, vc


def _sequential_reference(lyr, fused, adav, xs, kt, vt, K, common):
    """K non-speculative steps with cache appends (the exact semantics
    the spec kernel must reproduce)."""
    kc, vc = kt, vt
    ref_x, ref_k, ref_v = [], [], []
    for j in range(K):
        off = jnp.asarray(OFF + j, jnp.int32)
        cos, sin = rope_pair_vectors(off, HEAD_DIM, theta=1e6)
        ox, kn, vn = decode_stack_step(
            xs[:, j], off, lyr["attention_norm"], lyr["ffn_norm"], adav,
            fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
            cos, sin, kc, vc,
            fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
            **common)
        ref_x.append(ox)
        ref_k.append(kn)
        ref_v.append(vn)
        kc, vc = _append(kc, vc, kn, vn, OFF + j)
    return ref_x, ref_k, ref_v


def _spec_rope(K):
    cs = [rope_pair_vectors(jnp.asarray(OFF + j, jnp.int32), HEAD_DIM,
                            theta=1e6) for j in range(K)]
    cos_r = jnp.tile(jnp.stack([c for c, _ in cs]), (B, 1))
    sin_r = jnp.tile(jnp.stack([s for _, s in cs]), (B, 1))
    return cos_r, sin_r


@pytest.mark.parametrize("window", [None, 4])
def test_spec_kernel_matches_sequential(setup, window):
    """spec=K row outputs == K sequential steps, arbitrary inputs,
    with and without a binding sliding window."""
    params, t_embed, k_cache, v_cache, _ = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    K = 3
    rng = np.random.default_rng(5)
    xs = jnp.asarray(rng.normal(size=(B, K, D)) * 0.5, jnp.float32)

    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))
    mask = (np.arange(S) < OFF)[None, None, None, :, None]
    kt, vt = kt * mask, vt * mask

    common = dict(n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
                  interpret=True, window=window)
    ref_x, ref_k, ref_v = _sequential_reference(
        lyr, fused, adav, xs, kt, vt, K, common)

    cos_r, sin_r = _spec_rope(K)
    sx, skn, svn = decode_stack_step(
        xs.reshape(B * K, D), jnp.full((B,), OFF, jnp.int32),
        lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_r, sin_r, kt, vt,
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
        spec=K, **common)

    for j in range(K):
        np.testing.assert_allclose(
            np.asarray(sx.reshape(B, K, D)[:, j]), np.asarray(ref_x[j]),
            rtol=2e-3, atol=2e-3, err_msg=f"x j={j}")
        np.testing.assert_allclose(
            np.asarray(skn.reshape(L, B, K, N_KV, HEAD_DIM)[:, :, j]),
            np.asarray(ref_k[j]), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(svn.reshape(L, B, K, N_KV, HEAD_DIM)[:, :, j]),
            np.asarray(ref_v[j]), rtol=2e-3, atol=2e-3)


def _append_q(kc, ks, kn, off):
    """int8 cache append: quantize the fresh bf16 row exactly like the
    streaming path (quantize_kv at the k_new/v_new output dtype)."""
    kq, ksc = quantize_kv(kn)
    z = jnp.zeros((), jnp.int32)
    o = jnp.asarray(off, jnp.int32)
    kc = jax.lax.dynamic_update_slice(
        kc, kq[:, :, :, None], (z, z, z, o, z))
    ks = jax.lax.dynamic_update_slice(
        ks, ksc[:, :, :, None], (z, z, z, o))
    return kc, ks


@pytest.mark.parametrize("window", [None, 32])
def test_spec_kernel_matches_sequential_int8(setup, window):
    """spec=K with the int8 KV cache == K sequential int8 steps: the
    kernel roundtrips fresh rows i<j through the bf16 output dtype and
    the quantize_kv append quantization, and joins them into the same
    softmax-weight requant group the sequential ctx_of uses — so the
    draft rows read earlier drafts EXACTLY as the sequential step reads
    them back from the quantized cache."""
    params, t_embed, k_cache, v_cache, _ = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    K = 3
    rng = np.random.default_rng(9)
    xs = jnp.asarray(rng.normal(size=(B, K, D)) * 0.5, jnp.float32)

    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))
    vt = jnp.transpose(v_cache, (0, 1, 3, 2, 4))
    mask = (np.arange(S) < OFF)[None, None, None, :, None]
    kq0, ks0 = quantize_kv(kt * mask)
    vq0, vs0 = quantize_kv(vt * mask)

    common = dict(n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
                  interpret=True, window=window)

    # Sequential int8 reference: K non-spec steps, each appending the
    # quantized fresh row (the exact semantics spec must reproduce).
    kc, ks, vc, vs = kq0, ks0, vq0, vs0
    ref_x, ref_k, ref_v = [], [], []
    for j in range(K):
        off = jnp.asarray(OFF + j, jnp.int32)
        cos, sin = rope_pair_vectors(off, HEAD_DIM, theta=1e6)
        ox, kn, vn = decode_stack_step(
            xs[:, j], off, lyr["attention_norm"], lyr["ffn_norm"], adav,
            fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
            cos, sin, kc, vc,
            fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
            k_scales=ks, v_scales=vs, **common)
        ref_x.append(ox)
        ref_k.append(kn)
        ref_v.append(vn)
        kc, ks = _append_q(kc, ks, kn, OFF + j)
        vc, vs = _append_q(vc, vs, vn, OFF + j)

    cos_r, sin_r = _spec_rope(K)
    sx, skn, svn = decode_stack_step(
        xs.reshape(B * K, D), jnp.full((B,), OFF, jnp.int32),
        lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_r, sin_r, kq0, vq0,
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
        k_scales=ks0, v_scales=vs0, spec=K, **common)

    for j in range(K):
        np.testing.assert_allclose(
            np.asarray(sx.reshape(B, K, D)[:, j]), np.asarray(ref_x[j]),
            rtol=2e-3, atol=2e-3, err_msg=f"x j={j}")
        np.testing.assert_allclose(
            np.asarray(skn.reshape(L, B, K, N_KV, HEAD_DIM)[:, :, j]
                       ).astype(np.float32),
            np.asarray(ref_k[j]).astype(np.float32),
            rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(svn.reshape(L, B, K, N_KV, HEAD_DIM)[:, :, j]
                       ).astype(np.float32),
            np.asarray(ref_v[j]).astype(np.float32),
            rtol=2e-3, atol=2e-3)


def test_spec_rejects_chunked_cache(setup):
    params, t_embed, k_cache, v_cache, _ = setup
    lyr = params["layers"]
    fused = fuse_decode_weights(params)
    adav = ada_vectors(params, t_embed)
    kt = jnp.transpose(k_cache, (0, 1, 3, 2, 4))
    cos_r, sin_r = _spec_rope(2)
    with pytest.raises(ValueError, match="cache_chunk"):
        decode_stack_step(
            jnp.zeros((B * 2, D), jnp.float32), jnp.full((B,), OFF),
            lyr["attention_norm"], lyr["ffn_norm"], adav,
            fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
            cos_r, sin_r, kt, kt,
            fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
            spec=2, cache_chunk=8, n_heads=N_HEADS, n_kv=N_KV,
            head_dim=HEAD_DIM, eps=EPS, interpret=True)


# ---------------------------------------------------------------------------
# Streaming integration
# ---------------------------------------------------------------------------


def _spec_env(monkeypatch):
    import dataclasses

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.utils.quantize import quantize_params_w8

    cfg = VoxtralConfig.from_file("tests/fixtures/params_tiny.json")
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    model = VoxtralModel(w8, cfg)
    assert model.fused_decode is not None
    rng = np.random.default_rng(11)
    # Noise then silence: exercises both rejection and full acceptance.
    audio = np.concatenate([
        rng.normal(size=16000 * 3).astype(np.float32) * 0.25,
        np.zeros(16000 * 3, np.float32)])
    return model, audio


@pytest.mark.parametrize("k", [2, 8])
def test_streaming_speculative_token_identity(monkeypatch, k):
    from voxtral_tpu.streaming import StreamingSession

    model, audio = _spec_env(monkeypatch)
    ref = StreamingSession(model, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()
    s = StreamingSession(model, step_positions=8, max_duration_s=30,
                         speculative=k)
    s.feed(audio)
    s.finish()
    assert s.tokens == ref.tokens


def test_streaming_speculative_unbounded(monkeypatch):
    from voxtral_tpu.streaming import StreamingSession

    model, audio = _spec_env(monkeypatch)
    ref = StreamingSession(model, step_positions=8, unbounded=True)
    ref.feed(audio)
    ref.finish()
    s = StreamingSession(model, step_positions=8, unbounded=True,
                         speculative=4)
    s.feed(audio)
    s.finish()
    assert s.tokens == ref.tokens


def test_speculative_guards(monkeypatch):
    from voxtral_tpu.streaming import StreamingSession, StreamPool

    model, _ = _spec_env(monkeypatch)
    with pytest.raises(ValueError, match="<= step_positions"):
        StreamingSession(model, step_positions=8, speculative=9)
    pool = StreamPool(model, max_streams=2, step_positions=8,
                      max_duration_s=30)
    with pytest.raises(ValueError, match="solo-session"):
        StreamingSession(model, step_positions=8, pool=pool,
                         speculative=2)
    # Without fused weights the flag must refuse, not silently fall back
    # (the XLA path has no spec step).
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    from voxtral_tpu.models.voxtral import VoxtralModel

    plain = VoxtralModel(model.params, model.config)
    with pytest.raises(ValueError, match="fused"):
        StreamingSession(plain, step_positions=8, speculative=2)


def test_speculative_checkpoint_cross_path(monkeypatch, tmp_path):
    """A snapshot taken mid-stream on a SPECULATIVE session restores
    onto the sequential path (and vice versa) with token-identical
    continuations — the session state layout is path-independent."""
    from voxtral_tpu.streaming import StreamingSession

    model, audio = _spec_env(monkeypatch)
    ref = StreamingSession(model, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()

    # spec -> sequential
    a = StreamingSession(model, step_positions=8, max_duration_s=30,
                         speculative=4)
    a.feed(audio[:60000])
    assert a.positions_done > 0
    b = StreamingSession.restore(model, a.state_dict())
    assert b.speculative == 0
    b.feed(audio[60000:])
    b.finish()
    assert b.tokens == ref.tokens

    # sequential -> spec
    c = StreamingSession(model, step_positions=8, max_duration_s=30)
    c.feed(audio[:60000])
    d = StreamingSession.restore(model, c.state_dict(), speculative=4)
    assert d.speculative == 4
    d.feed(audio[60000:])
    d.finish()
    assert d.tokens == ref.tokens


def test_pool_speculative_matches_solo(monkeypatch):
    """A speculative pool (per-slot draft-verify, per-slot variable
    advance) must be token-identical to solo sequential sessions,
    including MIXED-PROGRESS slots (staggered feeds: one slot finishes
    its window while the other keeps verifying)."""
    from voxtral_tpu.streaming import StreamingSession, StreamPool

    model, audio_a = _spec_env(monkeypatch)
    rng = np.random.default_rng(7)
    audio_b = np.concatenate([
        rng.normal(size=16000 * 2).astype(np.float32) * 0.3,
        np.zeros(16000 * 2, np.float32)])

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    from voxtral_tpu.models.voxtral import VoxtralModel

    m0 = VoxtralModel(model.params, model.config)
    ra = StreamingSession(m0, step_positions=8, max_duration_s=30)
    ra.feed(audio_a)
    ra.finish()
    rb = StreamingSession(m0, step_positions=8, max_duration_s=30)
    rb.feed(audio_b)
    rb.finish()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    pool = StreamPool(model, max_streams=2, step_positions=8,
                      max_duration_s=30, speculative=4)
    assert pool._fused is not None and pool.speculative == 4
    a = StreamingSession(model, step_positions=8, pool=pool)
    b = StreamingSession(model, step_positions=8, pool=pool)
    pa = np.array_split(audio_a, 3)
    pb = np.array_split(audio_b, 2)
    a.feed(pa[0])
    a.feed(pa[1])
    b.feed(pb[0])
    a.feed(pa[2])
    a.finish()
    b.feed(pb[1])
    b.finish()
    assert a.tokens == ra.tokens
    assert b.tokens == rb.tokens


def test_pool_speculative_int8_matches_sequential_pool(monkeypatch):
    """An int8-KV speculative pool must be token-identical to the
    SEQUENTIAL int8 pool (the int8 ladder changes numerics vs bf16, so
    the identity contract is against the same-cache sequential path) —
    the kernel's fresh-row quantization roundtrip at work."""
    from voxtral_tpu.streaming import StreamingSession, StreamPool

    model, audio_a = _spec_env(monkeypatch)
    rng = np.random.default_rng(21)
    audio_b = np.concatenate([
        rng.normal(size=16000 * 2).astype(np.float32) * 0.3,
        np.zeros(16000 * 2, np.float32)])

    def run(spec):
        pool = StreamPool(model, max_streams=2, step_positions=8,
                          max_duration_s=30, speculative=spec,
                          kv_dtype="int8")
        assert pool.cache_int8 and pool._fused is not None
        a = StreamingSession(model, step_positions=8, pool=pool)
        b = StreamingSession(model, step_positions=8, pool=pool)
        a.feed(audio_a)
        b.feed(audio_b)
        a.finish()
        b.finish()
        return a.tokens, b.tokens

    ref_a, ref_b = run(0)
    spec_a, spec_b = run(4)
    assert spec_a == ref_a
    assert spec_b == ref_b


def test_pool_speculative_guards(monkeypatch):
    from voxtral_tpu.streaming import StreamPool

    model, _ = _spec_env(monkeypatch)
    with pytest.raises(ValueError, match="<= step_positions"):
        StreamPool(model, max_streams=2, step_positions=8,
                   max_duration_s=30, speculative=9)
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    from voxtral_tpu.models.voxtral import VoxtralModel

    plain = VoxtralModel(model.params, model.config)
    with pytest.raises(ValueError, match="fused"):
        StreamPool(plain, max_streams=2, step_positions=8,
                   max_duration_s=30, speculative=4)


def test_streaming_ngram_token_identity_and_acceptance(monkeypatch):
    """The ngram draft policy is token-identical to the sequential
    session (exactness is draft-independent) AND accepts strictly more
    than the pad policy on this model: random weights make the silence
    token arbitrary (!= [STREAMING_PAD]), so pad drafts accept ~nothing
    while the bigram table learns the cycle after one pass."""
    from voxtral_tpu.streaming import StreamingSession

    model, audio = _spec_env(monkeypatch)
    ref = StreamingSession(model, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()

    def run(draft):
        s = StreamingSession(model, step_positions=8, max_duration_s=30,
                             speculative=4, draft=draft)
        s.feed(audio)
        s.finish()
        return s.tokens, s.spec_metrics()

    toks_pad, m_pad = run("pad")
    toks_ng, m_ng = run("ngram")
    assert toks_pad == ref.tokens
    assert toks_ng == ref.tokens
    # Both ran the same positions; better acceptance = fewer passes.
    assert m_ng["passes"] < m_pad["passes"], (m_ng, m_pad)
    assert m_ng["tokens_per_pass"] > m_pad["tokens_per_pass"]
    # Counters are consistent: accepted rows == decoded positions.
    assert m_ng["accepted_rows"] == m_pad["accepted_rows"]


def test_pool_ngram_matches_sequential_pool(monkeypatch):
    """ngram-drafted int8 spec pool == sequential int8 pool tokens, with
    the shared table improving pool acceptance over pad drafts."""
    from voxtral_tpu.streaming import StreamingSession, StreamPool

    model, audio_a = _spec_env(monkeypatch)
    rng = np.random.default_rng(31)
    audio_b = np.concatenate([
        rng.normal(size=16000 * 2).astype(np.float32) * 0.3,
        np.zeros(16000 * 2, np.float32)])

    def run(spec, draft="pad"):
        pool = StreamPool(model, max_streams=2, step_positions=8,
                          max_duration_s=30, speculative=spec,
                          kv_dtype="int8", draft=draft)
        a = StreamingSession(model, step_positions=8, pool=pool)
        b = StreamingSession(model, step_positions=8, pool=pool)
        a.feed(audio_a)
        b.feed(audio_b)
        a.finish()
        b.finish()
        return a.tokens, b.tokens, pool.spec_metrics()

    ref_a, ref_b, _ = run(0)
    ng_a, ng_b, m_ng = run(4, "ngram")
    assert ng_a == ref_a
    assert ng_b == ref_b
    pad_a, pad_b, m_pad = run(4, "pad")
    assert pad_a == ref_a
    assert m_ng["passes"] < m_pad["passes"], (m_ng, m_pad)


def test_draft_policy_guard(monkeypatch):
    from voxtral_tpu.streaming import StreamingSession, StreamPool

    model, _ = _spec_env(monkeypatch)
    with pytest.raises(ValueError, match="pad|ngram"):
        StreamingSession(model, step_positions=8, speculative=2,
                         draft="markov")
    with pytest.raises(ValueError, match="pad|ngram"):
        StreamPool(model, max_streams=2, step_positions=8,
                   max_duration_s=30, speculative=2, draft="markov")


def test_speculative_bf16_weights(monkeypatch):
    """Speculative decode composes with the bf16 weight mode (the
    dense-model fast path): token identity vs the sequential session."""
    from tests.test_bf16_stack import _tiny_bf16_cfg
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession

    cfg = _tiny_bf16_cfg()
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    model = VoxtralModel.init_random(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
    assert model.megakernel_weights == "bf16"
    rng = np.random.default_rng(5)
    audio = np.concatenate([
        rng.normal(size=16000 * 2).astype(np.float32) * 0.25,
        np.zeros(16000 * 2, np.float32)])
    ref = StreamingSession(model, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()
    s = StreamingSession(model, step_positions=8, max_duration_s=30,
                         speculative=4)
    s.feed(audio)
    s.finish()
    assert s.tokens == ref.tokens
