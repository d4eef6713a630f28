"""Language-model decoder (26-layer GQA 32Q/8KV, ADA t-conditioning).

TPU-first redesign of the reference decoder
(``/root/reference/src/models/decoder.rs``):

* the 26 layers are a stacked pytree scanned with ``lax.scan`` — both in
  prefill and in the single-token decode step, so the whole step is one
  compiled body;
* the KV cache is a fixed-shape ``[L, B, max_seq, Hkv, D]`` array pair
  updated with ``lax.dynamic_update_slice`` (functional equivalent of the
  reference's preallocated cache, kv_cache.rs:116-142);
* the tied LM head is ``hidden @ tok_embeddings.T`` (decoder.rs:283-297).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from voxtral_tpu.config import LanguageModelConfig
from voxtral_tpu.models.layers import (
    AttentionSpec,
    KVCache,
    decoder_block,
    decoder_block_with_cache,
    rms_norm,
    rope_tables,
)

Params = dict[str, Any]

# RoPE table length for the decoder (reference gguf/loader.rs builds 16384).
DECODER_ROPE_MAX_SEQ = 16384


def decoder_spec(cfg: LanguageModelConfig) -> AttentionSpec:
    return AttentionSpec(
        n_heads=cfg.n_heads,
        n_kv_heads=cfg.n_kv_heads,
        head_dim=cfg.head_dim,
        sliding_window=cfg.sliding_window,
        causal=cfg.causal,
    )


def embed_tokens(params: Params, token_ids: jax.Array) -> jax.Array:
    """[B, S] int32 -> [B, S, d_model] embeddings.

    For the Q4 path the packed table is gathered + dequantized on device
    (the reference needs a CPU-side row lookup only because of WebGPU
    buffer limits — gguf/model.rs:584-618).
    """
    emb = params["tok_embeddings"]
    if isinstance(emb, dict):
        if "q4" in emb:
            from voxtral_tpu.ops.q4 import q4_dequant_rows

            return q4_dequant_rows(emb["q4"], token_ids)
        from voxtral_tpu.ops.w8 import w8_dequant_rows

        return w8_dequant_rows(emb["w8"], token_ids)
    return emb[token_ids]


def lm_head(params: Params, hidden: jax.Array,
            xla_only: bool = False) -> jax.Array:
    """Tied embeddings: logits = hidden @ E^T, f32 accumulation.

    ``xla_only`` forces the plain XLA contraction for quantized tables —
    mandatory when the params are mesh-sharded (GSPMD partitions the
    dot from the parameter shardings; a ``pallas_call`` cannot be
    auto-partitioned).
    """
    emb = params["tok_embeddings"]
    if isinstance(emb, dict):
        if "q4" in emb:
            from voxtral_tpu.ops.q4 import q4_matmul

            return q4_matmul(hidden, emb["q4"],
                             prefer_pallas=not xla_only)
        from voxtral_tpu.ops.w8 import w8_matmul

        return w8_matmul(hidden, emb["w8"], prefer_pallas=not xla_only)
    return jnp.einsum(
        "...d,vd->...v", hidden, emb, preferred_element_type=jnp.float32
    )


def decoder_forward_hidden(
    params: Params,
    hidden: jax.Array,
    t_embed: jax.Array,
    cfg: LanguageModelConfig,
    offset: int = 0,
) -> jax.Array:
    """Cache-free forward over externally supplied hidden states."""
    spec = decoder_spec(cfg)
    s = hidden.shape[1]
    positions = offset + jnp.arange(s, dtype=jnp.int32)
    cos, sin = rope_tables(cfg.head_dim, offset + s, cfg.rope_theta)

    def body(h, layer_params):
        h = decoder_block(
            h, t_embed, layer_params, spec, cos, sin, positions, cfg.norm_eps
        )
        return h, None

    x, _ = jax.lax.scan(body, hidden, params["layers"])
    return rms_norm(x, params["norm"], cfg.norm_eps)


def decoder_forward_hidden_with_cache(
    params: Params,
    hidden: jax.Array,
    t_embed: jax.Array,
    cache: KVCache,
    cfg: LanguageModelConfig,
    rope: Optional[tuple[jax.Array, jax.Array]] = None,
    pos_base=0,
    ring: Optional[tuple[int, int]] = None,
) -> tuple[jax.Array, KVCache]:
    """Forward with KV cache; appends at ``cache.length``.

    hidden: [B, S, d_model].  ``pos_base`` = absolute position of cache
    slot 0 (nonzero after cache shifts in unbounded streaming).
    ``ring``: static (head, size) head+ring cache layout — unbounded
    streaming without shifts (see layers.attention_with_cache).
    Returns (normed hidden, updated cache).
    """
    spec = decoder_spec(cfg)
    if rope is None:
        rope = rope_tables(cfg.head_dim, cache.max_seq, cfg.rope_theta)
    cos, sin = rope
    offset = cache.length

    def body(h, inp):
        layer_params, k_cache, v_cache = inp
        h, k_cache, v_cache = decoder_block_with_cache(
            h, t_embed, layer_params, spec, cos, sin,
            k_cache, v_cache, offset, cfg.norm_eps, pos_base, ring,
        )
        return h, (k_cache, v_cache)

    x, (k_new, v_new) = jax.lax.scan(body, hidden, (params["layers"], cache.k, cache.v))
    new_cache = KVCache(k=k_new, v=v_new, length=offset + hidden.shape[1])
    return rms_norm(x, params["norm"], cfg.norm_eps), new_cache


def create_cache(
    cfg: LanguageModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16
) -> KVCache:
    return KVCache.create(
        cfg.n_layers, batch, max_seq, cfg.n_kv_heads, cfg.head_dim, dtype
    )


def init_decoder_params(
    key: jax.Array,
    cfg: LanguageModelConfig,
    t_cond_dim: int = 32,
    dtype=jnp.bfloat16,
    vocab_size: Optional[int] = None,
) -> Params:
    """Random params with production shapes (tests/benches)."""
    v = vocab_size if vocab_size is not None else cfg.vocab_size
    d, hd, nh, nkv, f = cfg.dim, cfg.head_dim, cfg.n_heads, cfg.n_kv_heads, cfg.hidden_dim
    L = cfg.n_layers
    k = jax.random.split(key, 16)
    init = lambda kk, *shape: (
        jax.random.normal(kk, shape, dtype=jnp.float32) * 0.02
    ).astype(dtype)

    return {
        "tok_embeddings": init(k[0], v, d),
        "layers": {
            "ada": {
                "w0": init(k[1], L, d, t_cond_dim),
                "w2": init(k[2], L, t_cond_dim, d),
            },
            "attention_norm": jnp.ones((L, d), dtype),
            "attention": {
                "wq": init(k[3], L, d, nh * hd),
                "wk": init(k[4], L, d, nkv * hd),
                "wv": init(k[5], L, d, nkv * hd),
                "wo": init(k[6], L, nh * hd, d),
            },
            "ffn_norm": jnp.ones((L, d), dtype),
            "ffn": {
                "w1": init(k[7], L, d, f),
                "w2": init(k[8], L, f, d),
                "w3": init(k[9], L, d, f),
            },
        },
        "norm": jnp.ones((d,), dtype),
    }
