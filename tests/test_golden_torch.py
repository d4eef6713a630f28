"""Golden cross-checks vs independent torch implementations.

The reference validates against torch-computed ``.npy`` fixtures
(scripts/reference_forward.py); weights aren't downloadable here, so the
torch references are built in-process from the documented formulas —
written against the REFERENCE's description (interleaved RoPE, ADA
modulation, pre-LN residuals), not by translating our JAX code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def torch_rope_interleaved(x, theta=1e6, offset=0):
    """x: [B, S, H, D] torch. Interleaved-pair rotation (rope.rs:103-141)."""
    b, s, h, d = x.shape
    half = d // 2
    inv_freq = 1.0 / (theta ** (torch.arange(half, dtype=torch.float64) * 2 / d))
    pos = torch.arange(offset, offset + s, dtype=torch.float64)
    freqs = torch.outer(pos, inv_freq)  # [S, half]
    cos = torch.cos(freqs)[None, :, None, :]
    sin = torch.sin(freqs)[None, :, None, :]
    xp = x.double().reshape(b, s, h, half, 2)
    xr, xi = xp[..., 0], xp[..., 1]
    out = torch.stack([xr * cos - xi * sin, xr * sin + xi * cos], dim=-1)
    return out.reshape(b, s, h, d).float()


def torch_attention(x, wq, wk, wv, wo, n_heads, n_kv, head_dim, window=None):
    """GQA attention per the reference (attention.rs:124-184), f32 torch."""
    b, s, d = x.shape
    q = (x @ wq).reshape(b, s, n_heads, head_dim)
    k = (x @ wk).reshape(b, s, n_kv, head_dim)
    v = (x @ wv).reshape(b, s, n_kv, head_dim)
    q = torch_rope_interleaved(q)
    k = torch_rope_interleaved(k)
    q, k, v = (t.permute(0, 2, 1, 3) for t in (q, k, v))  # [B, H, S, D]
    if n_heads != n_kv:
        rep = n_heads // n_kv
        k = k.repeat_interleave(rep, dim=1)
        v = v.repeat_interleave(rep, dim=1)
    scores = (q @ k.transpose(-1, -2)) * head_dim**-0.5
    i = torch.arange(s)[:, None]
    j = torch.arange(s)[None, :]
    allowed = j <= i
    if window is not None:
        allowed &= (i - j) <= window
    scores = scores.masked_fill(~allowed, float("-inf"))
    attn = torch.softmax(scores, dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(b, s, n_heads * head_dim)
    return out @ wo


@pytest.mark.parametrize("n_kv,window", [(4, None), (2, None), (2, 3)])
def test_attention_matches_torch(n_kv, window):
    from voxtral_tpu.models.layers import AttentionSpec, attention, rope_tables

    rng = np.random.default_rng(0)
    d, hq, hd, s = 32, 4, 8, 10
    x = rng.normal(size=(2, s, d)).astype(np.float32) * 0.5
    wq = rng.normal(size=(d, hq * hd)).astype(np.float32) * 0.2
    wk = rng.normal(size=(d, n_kv * hd)).astype(np.float32) * 0.2
    wv = rng.normal(size=(d, n_kv * hd)).astype(np.float32) * 0.2
    wo = rng.normal(size=(hq * hd, d)).astype(np.float32) * 0.2

    ref = torch_attention(
        *(torch.from_numpy(a) for a in (x, wq, wk, wv, wo)),
        n_heads=hq, n_kv=n_kv, head_dim=hd, window=window,
    ).numpy()

    spec = AttentionSpec(hq, n_kv, hd, sliding_window=window)
    cos, sin = rope_tables(hd, s)
    got = np.asarray(attention(
        jnp.asarray(x),
        {"wq": jnp.asarray(wq), "wk": jnp.asarray(wk),
         "wv": jnp.asarray(wv), "wo": jnp.asarray(wo)},
        spec, cos, sin, jnp.arange(s),
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_decoder_layer_matches_torch():
    """Full decoder block: preLN attn residual, then ffn_norm -> ADA
    modulation -> SwiGLU residual (decoder_layer.rs:170-190)."""
    from voxtral_tpu.models.layers import (
        AttentionSpec,
        decoder_block,
        rope_tables,
    )

    rng = np.random.default_rng(1)
    d, hq, n_kv, hd, f, tc, s = 16, 2, 1, 8, 32, 4, 6
    mk = lambda *sh: rng.normal(size=sh).astype(np.float32) * 0.2

    p = {
        "attention_norm": mk(d) + 1.0,
        "attention": {"wq": mk(d, hq * hd), "wk": mk(d, n_kv * hd),
                      "wv": mk(d, n_kv * hd), "wo": mk(hq * hd, d)},
        "ffn_norm": mk(d) + 1.0,
        "ada": {"w0": mk(d, tc), "w2": mk(tc, d)},
        "ffn": {"w1": mk(d, f), "w2": mk(f, d), "w3": mk(d, f)},
    }
    x = mk(1, s, d) * 2
    t_embed = mk(1, 1, d)

    # torch reference
    tx = torch.from_numpy(x)
    tt = torch.from_numpy(t_embed)

    def rms(v, w):
        return v * torch.rsqrt((v**2).mean(-1, keepdim=True) + 1e-5) * torch.from_numpy(w)

    h = rms(tx, p["attention_norm"])
    attn = torch_attention(
        h, *(torch.from_numpy(p["attention"][k]) for k in ("wq", "wk", "wv", "wo")),
        n_heads=hq, n_kv=n_kv, head_dim=hd,
    )
    tx1 = tx + attn
    h = rms(tx1, p["ffn_norm"])
    scale = torch.nn.functional.gelu(tt @ torch.from_numpy(p["ada"]["w0"])) @ torch.from_numpy(p["ada"]["w2"])
    h = h * (1 + scale)
    gate = torch.nn.functional.silu(h @ torch.from_numpy(p["ffn"]["w1"]))
    up = h @ torch.from_numpy(p["ffn"]["w3"])
    ref = (tx1 + (gate * up) @ torch.from_numpy(p["ffn"]["w2"])).numpy()

    spec = AttentionSpec(hq, n_kv, hd, sliding_window=None)
    cos, sin = rope_tables(hd, s)
    jp = jax.tree_util.tree_map(jnp.asarray, p)
    got = np.asarray(decoder_block(
        jnp.asarray(x), jnp.asarray(t_embed), jp, spec, cos, sin,
        jnp.arange(s), 1e-5,
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
