"""Layer-level tests: shapes, cache-vs-full equivalence, golden math checks.

Mirrors the reference's GPU unit tier (attention.rs:367-473,
decoder_layer.rs:233-273, kv_cache.rs) but runs on the CPU backend.
Golden checks validate RoPE/SwiGLU/RMSNorm/ADA math against an independent
torch implementation built from the reference's documented formulas.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voxtral_tpu.models.layers import (
    AttentionSpec,
    ada_modulate,
    apply_rope,
    attention,
    attention_with_cache,
    conv_downsample,
    rms_norm,
    rope_tables,
    swiglu,
)

DTYPE = jnp.float32


def rand(key, *shape, scale=0.5):
    return (jax.random.normal(key, shape, dtype=jnp.float32) * scale).astype(DTYPE)


# -- rms_norm ----------------------------------------------------------------


def test_rms_norm_matches_formula():
    key = jax.random.PRNGKey(0)
    x = rand(key, 2, 5, 16)
    w = rand(jax.random.PRNGKey(1), 16) + 1.0
    out = rms_norm(x, w, eps=1e-5)

    xf = np.asarray(x, dtype=np.float64)
    expected = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-5) * np.asarray(w)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


# -- RoPE --------------------------------------------------------------------


def test_rope_interleaved_matches_reference_formula():
    """Interleaved-pair rotation: pairs (x[2i], x[2i+1]) rotated by pos*freq_i."""
    head_dim, max_seq = 8, 16
    cos, sin = rope_tables(head_dim, max_seq, theta=1_000_000.0)

    x = np.zeros((1, 3, 1, head_dim), dtype=np.float32)
    x[0, :, 0, 0] = 1.0  # even lane of pair 0
    out = apply_rope(jnp.asarray(x), cos, sin, jnp.arange(3))

    # Pair 0 has inv_freq = 1.0 -> angle = position.
    for pos in range(3):
        assert abs(out[0, pos, 0, 0] - np.cos(pos)) < 1e-5
        assert abs(out[0, pos, 0, 1] - np.sin(pos)) < 1e-5

    # Rotation preserves norm.
    key = jax.random.PRNGKey(2)
    x = rand(key, 2, 5, 4, head_dim)
    out = apply_rope(x, cos, sin, jnp.arange(5))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-4,
    )


def test_rope_offset_consistency():
    """Roping position p via offset must equal roping it in a longer pass."""
    head_dim = 16
    cos, sin = rope_tables(head_dim, 64)
    x = rand(jax.random.PRNGKey(3), 1, 8, 2, head_dim)
    full = apply_rope(x, cos, sin, jnp.arange(8))
    part = apply_rope(x[:, 5:, :, :], cos, sin, jnp.arange(5, 8))
    np.testing.assert_allclose(
        np.asarray(full[:, 5:, :, :]), np.asarray(part), rtol=1e-5, atol=1e-6
    )


# -- SwiGLU / ADA ------------------------------------------------------------


def test_swiglu_matches_formula():
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 4)
    d, f = 8, 16
    p = {"w1": rand(ks[0], d, f), "w2": rand(ks[1], f, d), "w3": rand(ks[2], d, f)}
    x = rand(ks[3], 1, 3, d)
    out = swiglu(x, p)

    xf = np.asarray(x, dtype=np.float64)
    gate = xf @ np.asarray(p["w1"])
    silu = gate / (1.0 + np.exp(-gate))
    expected = (silu * (xf @ np.asarray(p["w3"]))) @ np.asarray(p["w2"])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_ada_modulate_matches_formula():
    """x * (1 + w2(gelu(w0 t))) with EXACT (erf) gelu."""
    from scipy.special import erf

    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 3)
    d, t_dim = 8, 4
    p = {"w0": rand(ks[0], d, t_dim), "w2": rand(ks[1], t_dim, d)}
    x = rand(ks[2], 1, 3, d)
    t = rand(jax.random.PRNGKey(6), 1, 1, d)

    out = ada_modulate(x, t, p)

    tf = np.asarray(t, dtype=np.float64)
    h = tf @ np.asarray(p["w0"])
    h = 0.5 * h * (1.0 + erf(h / np.sqrt(2.0)))  # exact gelu
    scale = h @ np.asarray(p["w2"])
    expected = np.asarray(x) * (1.0 + scale)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


# -- attention ---------------------------------------------------------------


def make_attn_params(key, d, hq, hkv, hd, bias=False):
    ks = jax.random.split(key, 8)
    p = {
        "wq": rand(ks[0], d, hq * hd),
        "wk": rand(ks[1], d, hkv * hd),
        "wv": rand(ks[2], d, hkv * hd),
        "wo": rand(ks[3], hq * hd, d),
    }
    if bias:
        p["wq_b"] = rand(ks[4], hq * hd, scale=0.1)
        p["wv_b"] = rand(ks[5], hkv * hd, scale=0.1)
        p["wo_b"] = rand(ks[6], d, scale=0.1)
    return p


def test_attention_shapes_mha_and_gqa():
    d, hd = 32, 8
    cos, sin = rope_tables(hd, 64)
    x = rand(jax.random.PRNGKey(7), 2, 10, d)
    for hq, hkv in [(4, 4), (4, 2), (4, 1)]:
        spec = AttentionSpec(hq, hkv, hd, sliding_window=None)
        p = make_attn_params(jax.random.PRNGKey(8), d, hq, hkv, hd)
        out = attention(x, p, spec, cos, sin, jnp.arange(10))
        assert out.shape == (2, 10, d)


def test_attention_causality():
    """Changing future inputs must not change past outputs."""
    d, hd = 16, 8
    spec = AttentionSpec(2, 2, hd, sliding_window=None, causal=True)
    cos, sin = rope_tables(hd, 32)
    p = make_attn_params(jax.random.PRNGKey(9), d, 2, 2, hd)

    x1 = rand(jax.random.PRNGKey(10), 1, 8, d)
    x2 = np.asarray(x1).copy()
    x2[0, 6:, :] += 1.0  # perturb the future

    o1 = attention(x1, p, spec, cos, sin, jnp.arange(8))
    o2 = attention(jnp.asarray(x2), p, spec, cos, sin, jnp.arange(8))
    np.testing.assert_allclose(
        np.asarray(o1[:, :6]), np.asarray(o2[:, :6]), rtol=1e-5, atol=1e-6
    )
    assert not np.allclose(np.asarray(o1[:, 6:]), np.asarray(o2[:, 6:]))


def test_sliding_window_mask():
    """With window w, output at i must ignore keys before i-w."""
    d, hd, s, w = 16, 8, 12, 3
    spec_win = AttentionSpec(2, 2, hd, sliding_window=w)
    spec_full = AttentionSpec(2, 2, hd, sliding_window=None)
    p = make_attn_params(jax.random.PRNGKey(11), d, 2, 2, hd)
    cos, sin = rope_tables(hd, 32)

    x1 = rand(jax.random.PRNGKey(12), 1, s, d)
    x2 = np.asarray(x1).copy()
    x2[0, 0, :] += 5.0  # perturb position 0

    # Windowed attention at last position is unaffected by position 0.
    o1 = attention(x1, p, spec_win, cos, sin, jnp.arange(s))
    o2 = attention(jnp.asarray(x2), p, spec_win, cos, sin, jnp.arange(s))
    np.testing.assert_allclose(
        np.asarray(o1[:, -1]), np.asarray(o2[:, -1]), rtol=1e-5, atol=1e-6
    )
    # Full attention IS affected.
    o1f = attention(x1, p, spec_full, cos, sin, jnp.arange(s))
    o2f = attention(jnp.asarray(x2), p, spec_full, cos, sin, jnp.arange(s))
    assert not np.allclose(np.asarray(o1f[:, -1]), np.asarray(o2f[:, -1]))


@pytest.mark.parametrize("window", [None, 4])
def test_cache_vs_full_equivalence(window):
    """Cached incremental attention must match the full forward (ref attention.rs:429-473)."""
    d, hd, hq, hkv, s = 16, 8, 4, 2, 10
    spec = AttentionSpec(hq, hkv, hd, sliding_window=window)
    p = make_attn_params(jax.random.PRNGKey(13), d, hq, hkv, hd)
    cos, sin = rope_tables(hd, 32)
    x = rand(jax.random.PRNGKey(14), 1, s, d)

    full = attention(x, p, spec, cos, sin, jnp.arange(s))

    # Incremental: prefill 4, then one token at a time.
    k_cache = jnp.zeros((1, s, hkv, hd), DTYPE)
    v_cache = jnp.zeros((1, s, hkv, hd), DTYPE)
    outs = []
    out, k_cache, v_cache = attention_with_cache(
        x[:, :4], p, spec, cos, sin, k_cache, v_cache, jnp.int32(0)
    )
    outs.append(out)
    for i in range(4, s):
        out, k_cache, v_cache = attention_with_cache(
            x[:, i : i + 1], p, spec, cos, sin, k_cache, v_cache, jnp.int32(i)
        )
        outs.append(out)
    incremental = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(incremental), rtol=1e-4, atol=1e-5
    )


# -- conv --------------------------------------------------------------------


def test_conv_downsampler_shape():
    key = jax.random.PRNGKey(15)
    ks = jax.random.split(key, 2)
    p = {
        "conv1": rand(ks[0], 12, 8, 3),
        "conv1_b": jnp.zeros((12,), DTYPE),
        "conv2": rand(ks[1], 12, 12, 3),
        "conv2_b": jnp.zeros((12,), DTYPE),
    }
    x = rand(jax.random.PRNGKey(16), 1, 8, 100)
    out = conv_downsample(x, p)
    # (100 + 2 - 3) // 2 + 1 = 50, then 25 (reference conv.rs test).
    assert out.shape == (1, 12, 25)


def test_conv_matches_torch():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    w1 = rng.normal(size=(6, 4, 3)).astype(np.float32)
    b1 = rng.normal(size=(6,)).astype(np.float32)
    w2 = rng.normal(size=(6, 6, 3)).astype(np.float32)
    b2 = rng.normal(size=(6,)).astype(np.float32)
    x = rng.normal(size=(2, 4, 20)).astype(np.float32)

    ours = conv_downsample(
        jnp.asarray(x),
        {
            "conv1": jnp.asarray(w1),
            "conv1_b": jnp.asarray(b1),
            "conv2": jnp.asarray(w2),
            "conv2_b": jnp.asarray(b2),
        },
    )

    with torch.no_grad():
        t = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w1), torch.from_numpy(b1),
            stride=2, padding=1,
        )
        t = torch.nn.functional.gelu(t)
        t = torch.nn.functional.conv1d(
            t, torch.from_numpy(w2), torch.from_numpy(b2), stride=2, padding=1
        )
        t = torch.nn.functional.gelu(t)
    np.testing.assert_allclose(np.asarray(ours), t.numpy(), rtol=1e-4, atol=1e-5)


def test_ring_k_positions():
    from voxtral_tpu.models.layers import ring_k_positions, ring_slot

    head, size = 4, 6
    # After 4 writes: head only.
    p, v = ring_k_positions(head, size, jnp.asarray(4))
    assert p.tolist()[:4] == [0, 1, 2, 3]
    assert v.tolist() == [True] * 4 + [False] * 6
    # After 13 writes: ring holds positions 4..12 in slots (p-4) % 6.
    p, v = ring_k_positions(head, size, jnp.asarray(13))
    expect = {4 + (q - 4) % 6: q for q in range(4, 13)}  # slot->latest pos
    for slot in range(4, 10):
        assert bool(v[slot])
        assert int(p[slot]) == expect[slot], (slot, p.tolist())
    # Slot math agrees with ring_slot.
    for pos in range(4, 13):
        s = int(ring_slot(jnp.asarray(pos), head, size))
        assert int(p[s]) >= pos or int(p[s]) == pos or (pos + size > 13)
    # Head slots always map to themselves.
    assert int(ring_slot(jnp.asarray(2), head, size)) == 2


def test_ring_attention_matches_windowed_full():
    """Single-position cached attention through a head+ring cache must
    equal full windowed attention once the stream exceeds ring capacity."""
    from voxtral_tpu.models.layers import (
        AttentionSpec,
        attention,
        attention_with_cache,
        rope_tables,
    )

    rng = np.random.default_rng(3)
    d_model, heads, hd = 16, 2, 8
    spec = AttentionSpec(n_heads=heads, n_kv_heads=heads, head_dim=hd,
                         sliding_window=5, causal=True)
    p = {
        "wq": jnp.asarray(rng.normal(size=(d_model, heads * hd)) * 0.2, jnp.float32),
        "wk": jnp.asarray(rng.normal(size=(d_model, heads * hd)) * 0.2, jnp.float32),
        "wv": jnp.asarray(rng.normal(size=(d_model, heads * hd)) * 0.2, jnp.float32),
        "wo": jnp.asarray(rng.normal(size=(heads * hd, d_model)) * 0.2, jnp.float32),
    }
    total = 24
    x = jnp.asarray(rng.normal(size=(1, total, d_model)) * 0.5, jnp.float32)
    cos, sin = rope_tables(hd, total)

    full = attention(x, p, spec, cos, sin, jnp.arange(total, dtype=jnp.int32))

    head, size = 3, 7  # ring capacity 10 << 24 positions
    kc = jnp.zeros((1, head + size, heads, hd), jnp.float32)
    vc = jnp.zeros_like(kc)
    # Prefill the 3 head positions in one write, then single steps.
    out0, kc, vc = attention_with_cache(
        x[:, :head], p, spec, cos, sin, kc, vc,
        jnp.asarray(0, jnp.int32), 0, (head, size),
    )
    outs = [out0]
    for pos in range(head, total):
        o, kc, vc = attention_with_cache(
            x[:, pos:pos + 1], p, spec, cos, sin, kc, vc,
            jnp.asarray(pos, jnp.int32), 0, (head, size),
        )
        outs.append(o)
    ring_out = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(ring_out), np.asarray(full),
                               atol=2e-5)
