"""Causal audio encoder (32-layer, MHA 32 heads, sliding window 750).

TPU-first redesign of the reference encoder
(``/root/reference/src/models/encoder.rs``): the 32 identical layers are a
stacked parameter pytree run under ``lax.scan`` so XLA compiles ONE layer
body; masks are banded iota comparisons on device.

Flow (encoder.rs:146-161):
    mel [B, 128, T] -> conv 4x downsample -> [B, T/4, 1280]
    -> 32 x (preLN attention + SwiGLU) -> final RMSNorm
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from voxtral_tpu.config import AudioEncoderConfig
from voxtral_tpu.models.layers import (
    AttentionSpec,
    KVCache,
    attention_with_cache,
    conv_downsample,
    encoder_block,
    rms_norm,
    rope_tables,
    swiglu,
)

Params = dict[str, Any]


def encoder_spec(cfg: AudioEncoderConfig) -> AttentionSpec:
    return AttentionSpec(
        n_heads=cfg.n_heads,
        n_kv_heads=cfg.n_kv_heads,
        head_dim=cfg.head_dim,
        sliding_window=cfg.sliding_window,
        causal=cfg.causal,
    )


def encoder_forward(
    params: Params, mel: jax.Array, cfg: AudioEncoderConfig
) -> jax.Array:
    """mel [B, n_mels, T] -> hidden [B, T/4, d_model]."""
    spec = encoder_spec(cfg)

    x = conv_downsample(mel, params["conv"])  # [B, D, T/4]
    x = jnp.swapaxes(x, 1, 2)  # [B, T/4, D]

    s = x.shape[1]
    positions = jnp.arange(s, dtype=jnp.int32)
    cos, sin = rope_tables(cfg.head_dim, s, cfg.rope_theta)

    def body(h, layer_params):
        h = encoder_block(h, layer_params, spec, cos, sin, positions, cfg.norm_eps)
        return h, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return rms_norm(x, params["norm"], cfg.norm_eps)


def create_encoder_cache(
    cfg: AudioEncoderConfig, batch: int, max_seq: int, dtype=jnp.bfloat16
) -> KVCache:
    return KVCache.create(
        cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim, dtype
    )


def encoder_layers_with_cache(
    params: Params,
    x: jax.Array,
    cache: KVCache,
    cfg: AudioEncoderConfig,
    rope: Optional[tuple[jax.Array, jax.Array]] = None,
    pos_base=0,
    ring: Optional[tuple[int, int]] = None,
) -> tuple[jax.Array, KVCache]:
    """Run the transformer stack incrementally over pre-conv features.

    x: [B, S_new, d_model] (conv output for the NEW frames only);
    appends K/V at ``cache.length``.  Used by the streaming path, where the
    conv window is handled outside (it needs 3 mel frames of lookahead).
    ``ring``: static (head, size) head+ring cache layout (see
    layers.attention_with_cache).
    """
    spec = encoder_spec(cfg)
    if rope is None:
        rope = rope_tables(cfg.head_dim, cache.max_seq, cfg.rope_theta)
    cos, sin = rope
    offset = cache.length

    def body(h, inp):
        layer_params, k_cache, v_cache = inp
        hn = rms_norm(h, layer_params["attention_norm"], cfg.norm_eps)
        attn, k_cache, v_cache = attention_with_cache(
            hn, layer_params["attention"], spec, cos, sin,
            k_cache, v_cache, offset, pos_base, ring,
        )
        h = h + attn
        hn = rms_norm(h, layer_params["ffn_norm"], cfg.norm_eps)
        h = h + swiglu(hn, layer_params["ffn"])
        return h, (k_cache, v_cache)

    x, (k_new, v_new) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
    new_cache = KVCache(k=k_new, v=v_new, length=offset + x.shape[1])
    return rms_norm(x, params["norm"], cfg.norm_eps), new_cache


def encoder_forward_with_cache(
    params: Params,
    mel: jax.Array,
    cache: KVCache,
    cfg: AudioEncoderConfig,
    rope: Optional[tuple[jax.Array, jax.Array]] = None,
) -> tuple[jax.Array, KVCache]:
    """Chunk-incremental encoder (API parity with encoder.rs:171-190).

    Like the reference, the conv downsampler runs per chunk (boundary
    effects at chunk edges are accepted); attention K/V continue from the
    cache.  For the boundary-exact streaming path use
    :func:`encoder_layers_with_cache` with an overlapping conv window.
    """
    x = conv_downsample(mel, params["conv"])
    x = jnp.swapaxes(x, 1, 2)
    return encoder_layers_with_cache(params, x, cache, cfg, rope)


def init_encoder_params(
    key: jax.Array, cfg: AudioEncoderConfig, dtype=jnp.bfloat16
) -> Params:
    """Random params with the exact production shapes (for tests/benches)."""
    k = jax.random.split(key, 16)
    d, hd, nh, f = cfg.dim, cfg.head_dim, cfg.n_heads, cfg.hidden_dim
    L = cfg.n_layers
    init = lambda kk, *shape: (
        jax.random.normal(kk, shape, dtype=jnp.float32) * 0.02
    ).astype(dtype)

    return {
        "conv": {
            "conv1": init(k[0], d, 128, 3),
            "conv1_b": jnp.zeros((d,), dtype),
            "conv2": init(k[1], d, d, 3),
            "conv2_b": jnp.zeros((d,), dtype),
        },
        "layers": {
            "attention_norm": jnp.ones((L, d), dtype),
            "attention": {
                "wq": init(k[2], L, d, nh * hd),
                "wq_b": jnp.zeros((L, nh * hd), dtype),
                "wk": init(k[3], L, d, nh * hd),
                "wv": init(k[4], L, d, nh * hd),
                "wv_b": jnp.zeros((L, nh * hd), dtype),
                "wo": init(k[5], L, nh * hd, d),
                "wo_b": jnp.zeros((L, d), dtype),
            },
            "ffn_norm": jnp.ones((L, d), dtype),
            "ffn": {
                "w1": init(k[6], L, d, f),
                "w2": init(k[7], L, f, d),
                "w2_b": jnp.zeros((L, d), dtype),
                "w3": init(k[8], L, d, f),
            },
        },
        "norm": jnp.ones((d,), dtype),
    }
