"""g32 (exact-Q4_0) stack-kernel mode tests.

The g32 mode streams int8 codes (= Q4_0 nibble - 8) with the on-disk f16
block scales — the EXACT re-encoding of Q4_0 (VERDICT r4 #1b; reference
dequant semantics /root/reference/src/gguf/tensor.rs:88-113) — so the
fused decode path carries no weight quantization beyond Q4_0 itself.

Equivalence strategy (interpret mode, CPU):

* uniform group scales  -> g32 math == w8 rowwise math exactly (same A8
  activation quantization, same integer dots), so the full stack kernel
  is compared mode-vs-mode.
* non-uniform group scales with w8-representable products (codes*mult
  fits int8) -> both modes still compute the same weights, pinning the
  r-major scale layout and group mapping through every phase.
* lm fold with zero layer codes -> logits == q4g_matmul_a8 of the
  final-norm output, pinning the lm-head group path directly.
* full-model transcribe on a synthetic q4 checkpoint -> fused q4g vs
  per-op XLA q4 greedy tokens compared (A8-vs-float activations; the
  divergence RATE is asserted small and the run is the regression pin).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from voxtral_tpu.ops.decode_step_pallas import (
    ada_vectors,
    decode_stack_step,
    fuse_decode_weights,
    fuse_decode_weights_q4g,
    megakernel_mode,
    q4g_geometry_ok,
    rope_pair_vectors,
)

L, B, S, D = 3, 2, 16, 256
N_HEADS, N_KV, HEAD_DIM, HIDDEN = 8, 2, 32, 512
T_COND = 8
OFFSET = 7
EPS = 1e-5


def _q4_leaf_from(codes, gscales):
    """int8 codes [L, N, K] + f16 scales [L, N, K//32] -> q4 leaf."""
    return {"q4": {"codes": jnp.asarray(codes),
                   "scales": jnp.asarray(gscales)}}


def _w8_leaf_equiv(codes, gscales, rowscale):
    """The w8 leaf computing the SAME weights: codes' = codes * mult,
    scale = rowscale, where gscales = rowscale[:, :, None] * mult and
    mult is a small integer per group."""
    mult = (gscales.astype(np.float64)
            / rowscale[:, :, None].astype(np.float64))
    mult_i = np.rint(mult).astype(np.int64)
    assert np.allclose(mult, mult_i), "test setup: mult must be integral"
    c64 = codes.astype(np.int64) * np.repeat(mult_i, 32, axis=-1)
    assert np.abs(c64).max() <= 127, "test setup: product must fit int8"
    return {"w8": {"codes": jnp.asarray(c64.astype(np.int8)),
                   "scale": jnp.asarray(rowscale.astype(np.float32))}}


def build_params(rng, mults):
    """Build decoder param trees (q4-leaf and equivalent w8-leaf) whose
    effective weights are IDENTICAL.  ``mults``: per-leaf callable giving
    integer group multipliers (1 = uniform)."""
    nq, nkv = N_HEADS * HEAD_DIM, N_KV * HEAD_DIM

    def pair(n, k):
        codes = rng.integers(-3, 4, size=(L, n, k), dtype=np.int8)
        rowscale = (0.01 + rng.random((L, n)) * 0.02).astype(np.float32)
        m = mults(L, n, k // 32)
        gs = (rowscale[:, :, None] * m).astype(np.float16)
        # f16 rounding breaks exact w8 equivalence unless rowscale*m is
        # exactly representable; re-derive rowscale from the f16 scales.
        gs32 = gs.astype(np.float32)
        rows = gs32[..., 0] / m[..., 0] if m.ndim == 3 else gs32[..., 0]
        return (_q4_leaf_from(codes, gs),
                _w8_leaf_equiv(codes, gs32, rows.astype(np.float32)))

    names = {
        "wq": (nq, D), "wk": (nkv, D), "wv": (nkv, D), "wo": (D, nq),
        "w1": (HIDDEN, D), "w2": (D, HIDDEN), "w3": (HIDDEN, D),
    }
    q4_leaves, w8_leaves = {}, {}
    for nm, (n, k) in names.items():
        q4_leaves[nm], w8_leaves[nm] = pair(n, k)

    common = {
        "ada": {
            "w0": jnp.asarray(rng.normal(size=(L, D, T_COND)) * 0.05,
                              jnp.float32),
            "w2": jnp.asarray(rng.normal(size=(L, T_COND, D)) * 0.05,
                              jnp.float32),
        },
        "attention_norm": jnp.asarray(
            1.0 + rng.normal(size=(L, D)) * 0.1, jnp.float32),
        "ffn_norm": jnp.asarray(
            1.0 + rng.normal(size=(L, D)) * 0.1, jnp.float32),
    }

    def tree(leaves):
        return {"layers": {
            **common,
            "attention": {k: leaves[k] for k in ("wq", "wk", "wv", "wo")},
            "ffn": {k: leaves[k] for k in ("w1", "w2", "w3")},
        }}

    return tree(q4_leaves), tree(w8_leaves)


def _inputs(rng):
    t_embed = jnp.asarray(rng.normal(size=(1, 1, D)) * 0.3, jnp.float32)
    k_cache = jnp.asarray(rng.normal(size=(L, B, N_KV, S, HEAD_DIM)) * 0.4,
                          jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(L, B, N_KV, S, HEAD_DIM)) * 0.4,
                          jnp.float32)
    mask = (np.arange(S) < OFFSET)[None, None, None, :, None]
    x = jnp.asarray(rng.normal(size=(B, D)) * 0.5, jnp.float32)
    return t_embed, k_cache * mask, v_cache * mask, x


def _run_stack(params, fused, adav, x, k_cache, v_cache, **kw):
    offset = jnp.asarray(OFFSET, jnp.int32)
    cos_p, sin_p = rope_pair_vectors(offset, HEAD_DIM, theta=1e6)
    lyr = params["layers"]
    return decode_stack_step(
        x, offset,
        lyr["attention_norm"], lyr["ffn_norm"], adav,
        fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
        cos_p, sin_p, k_cache, v_cache,
        fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
        n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
        interpret=True, **kw,
    )


@pytest.mark.parametrize("uniform", [True, False])
def test_q4g_stack_matches_w8_equivalent(uniform):
    """g32 stack kernel == w8 stack kernel when the q4 group scales
    encode the same effective weights (uniform or integer-multiple
    group scales) — pins the r-major layout and every phase's group
    mapping."""
    rng = np.random.default_rng(1 if uniform else 2)

    def mults(l, n, g):
        if uniform:
            return np.ones((l, n, g))
        # Small power-of-two multipliers: codes in [-3, 3] * {1, 2, 4}
        # fit int8 and f16 scale products stay exact.
        return 2.0 ** rng.integers(0, 3, size=(l, n, g))

    q4_params, w8_params = build_params(rng, mults)
    t_embed, k_cache, v_cache, x = _inputs(rng)

    assert megakernel_mode(q4_params, HEAD_DIM) == "q4g"
    fused_g = fuse_decode_weights_q4g(q4_params)
    fused_w8 = fuse_decode_weights(w8_params)
    adav = ada_vectors(q4_params, t_embed)

    gx, gk, gv = _run_stack(q4_params, fused_g, adav, x, k_cache, v_cache)
    wx, wk, wv = _run_stack(w8_params, fused_w8, adav, x, k_cache, v_cache)

    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(wk),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                               rtol=2e-4, atol=2e-4)


def test_q4g_lm_fold_group_scales():
    """Zero layer codes pass the residual through; the folded lm_head's
    logits must equal the XLA g32 reference (q4g_matmul_a8) on the
    final-norm output — non-uniform f16 scales, direct group-path pin."""
    from voxtral_tpu.ops.q4 import q4g_matmul_a8

    rng = np.random.default_rng(3)
    q4_params, _ = build_params(
        rng, lambda l, n, g: np.ones((l, n, g)))
    # Zero every layer code: attention/FFN contributions vanish.
    for grp in ("attention", "ffn"):
        for leaf in q4_params["layers"][grp].values():
            leaf["q4"]["codes"] = jnp.zeros_like(leaf["q4"]["codes"])
    V = 384
    emb_codes = rng.integers(-8, 8, size=(V, D), dtype=np.int8)
    emb_scales = (0.005 + rng.random((V, D // 32)) * 0.03
                  ).astype(np.float16)
    q4_params["tok_embeddings"] = _q4_leaf_from(emb_codes, emb_scales)
    q4_params["norm"] = jnp.asarray(
        1.0 + rng.normal(size=(D,)) * 0.1, jnp.float32)

    t_embed, k_cache, v_cache, x = _inputs(rng)
    fused = fuse_decode_weights_q4g(q4_params)
    assert "lm_codes" in fused
    adav = ada_vectors(q4_params, t_embed)

    out = _run_stack(
        q4_params, fused, adav, x, k_cache, v_cache,
        final_norm=q4_params["norm"], lm_codes=fused["lm_codes"],
        lm_scale=fused["lm_scale"],
    )
    gx, gk, gv, logits = out
    np.testing.assert_allclose(np.asarray(gx), np.asarray(x),
                               rtol=1e-5, atol=1e-5)

    h = np.asarray(gx, np.float64)
    var = (h * h).mean(-1, keepdims=True)
    hn = jnp.asarray(h / np.sqrt(var + EPS) * np.asarray(q4_params["norm"]),
                     jnp.float32)
    ref = q4g_matmul_a8(hn, jnp.asarray(emb_codes),
                        jnp.asarray(emb_scales))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_q4g_spec_and_int8_cache_compose():
    """g32 weights compose with speculative rows and the int8 KV cache
    (the cache machinery is weight-mode-agnostic): spec=2 g32 == spec=2
    w8-equivalent, int8 caches + per-vector scales."""
    from voxtral_tpu.ops.decode_step_pallas import quantize_kv

    rng = np.random.default_rng(4)
    q4_params, w8_params = build_params(
        rng, lambda l, n, g: 2.0 ** rng.integers(0, 3, size=(l, n, g)))
    t_embed, k_cache, v_cache, x = _inputs(rng)
    # B rows = streams(1) * spec(2): collapse cache to 1 stream.
    kq, ks = quantize_kv(k_cache[:, :1])
    vq, vs = quantize_kv(v_cache[:, :1])

    fused_g = fuse_decode_weights_q4g(q4_params)
    fused_w8 = fuse_decode_weights(w8_params)
    adav = ada_vectors(q4_params, t_embed)
    offs = jnp.asarray([OFFSET], jnp.int32)
    cs = [rope_pair_vectors(jnp.asarray(OFFSET + j, jnp.int32), HEAD_DIM,
                            theta=1e6) for j in range(2)]
    cos_p = jnp.stack([c for c, _ in cs])
    sin_p = jnp.stack([s for _, s in cs])
    lyr = q4_params["layers"]

    def run(fused):
        return decode_stack_step(
            x, offs,
            lyr["attention_norm"], lyr["ffn_norm"], adav,
            fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
            cos_p, sin_p, kq, vq,
            fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
            k_scales=ks, v_scales=vs,
            n_heads=N_HEADS, n_kv=N_KV, head_dim=HEAD_DIM, eps=EPS,
            interpret=True, spec=2,
        )

    gx, gk, gv = run(fused_g)
    wx, wk, wv = run(fused_w8)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(wk),
                               rtol=2e-4, atol=2e-4)


def test_q4g_geometry_gate():
    class _LM:
        dim, n_heads, n_kv_heads = D, N_HEADS, N_KV
        head_dim, hidden_dim = HEAD_DIM, HIDDEN

    assert q4g_geometry_ok(_LM)

    class _Bad:
        dim, n_heads, n_kv_heads = 192, 4, 2
        head_dim, hidden_dim = 48, 384

    assert not q4g_geometry_ok(_Bad)


def test_q4g_full_transcribe_routing_and_agreement(monkeypatch):
    """Full-model routing: a q4 checkpoint with q4g-qualifying geometry
    selects megakernel mode "q4g" under VOXTRAL_MEGAKERNEL=force, the
    fused transcribe runs end-to-end, and its greedy tokens agree with
    the per-op XLA q4 path (weight numerics identical; only the A8
    activation quantization differs — measured 0 divergence on synthetic
    checkpoints, wer_eval_work/r05/q4_error_report.json; a small bound
    keeps the pin robust across jax versions)."""
    import os
    import sys

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.q4_error_report import error_cfg, make_audio

    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.utils.quantize import quantize_params_q4

    cfg = error_cfg()
    key = jax.random.PRNGKey(0)
    dense = VoxtralModel.init_random(key, cfg, dtype=np.float32).params
    q4 = quantize_params_q4(
        jax.tree_util.tree_map(np.asarray, dense), pack=False)

    mel = make_audio("dual_tone", 1.5)

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    ref = VoxtralModel(q4, cfg).transcribe_streaming(mel).tolist()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    m = VoxtralModel(q4, cfg)
    assert m.megakernel_weights == "q4g"
    assert "lm_codes" in m.fused_decode
    got = m.transcribe_streaming(mel).tolist()

    diverged = sum(a != b for a, b in zip(ref, got))
    assert diverged / max(1, len(ref)) <= 0.1, (ref, got)


def test_q4g_packed_leaves_stay_per_op():
    """Packed q4 leaves (bf16-rounded scales) must NOT claim q4g."""
    leaf = {"q4": {"codes_packed": jnp.zeros((8, 4), jnp.int32),
                   "scales_t": jnp.zeros((4, 8), jnp.bfloat16)}}
    params = {"layers": {"attention": {"wq": leaf}, "ffn": {"w1": leaf}}}
    assert megakernel_mode(params, HEAD_DIM) is None
