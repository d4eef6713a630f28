"""Shared model layers, TPU-first functional JAX.

Re-designs the reference's layer library (``/root/reference/src/models/layers/``)
for XLA:

* Parameters are plain pytrees (dicts of ``jnp`` arrays); per-layer stacks
  carry a leading layer axis so encoder/decoder blocks run under
  ``lax.scan`` (one compiled layer body instead of 32/26 unrolled ones).
* Linear weights are stored **[in, out]** (``y = x @ w``); loaders transpose
  from the PyTorch/SafeTensors ``[out, in]`` convention
  (reference weights.rs:251-263 does the same for Burn).
* Attention masks are banded iota comparisons built on device — replacing
  the reference's CPU-built additive masks (masking.rs) which it uploads
  per call.
* Matmuls run in the model compute dtype (bf16 by default) with f32
  accumulation (``preferred_element_type``); softmax and norms are f32.
* KV caches are fixed-shape arrays updated via ``lax.dynamic_update_slice``
  — the moral equivalent of the reference's preallocated cache
  (kv_cache.rs:116-142) but functional and jit-friendly.

Reference parity notes:
  - RoPE uses **interleaved** pair rotation (even/odd lanes), θ=1e6
    (rope.rs:103-141).
  - AdaRmsNorm is modulation only: ``x * (1 + w2(gelu(w0(t))))`` with GELU,
    not SiLU (rms_norm.rs:61-119).
  - SwiGLU: ``w2(silu(w1 x) * w3 x)`` (swiglu.rs:24-77).
  - Encoder attention biases: q/v/o yes, k no; FFN bias on w2 only
    (encoder_layer.rs:66-80). Decoder: no biases (decoder_layer.rs:80-95).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Basic ops
# ---------------------------------------------------------------------------


def linear(x: jax.Array, w, b: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ w (+ b). Accumulates in f32 on the MXU.

    ``w`` is either a dense [in, out] array, a Q4_0 dict
    ``{"q4": {codes, scales, ...}}`` (stored [out, in] — see
    :mod:`voxtral_tpu.ops.q4`) dispatched to the fused dequant matmul,
    a w8 dict likewise, or ``{"nt": w}`` — a dense [out, in] array (the
    bf16 stack kernel's streaming layout, shared buffer-for-buffer with
    the fused decode stacks; see
    ops.decode_step_pallas.fuse_decode_weights_bf16) contracted directly
    without materializing a transpose.
    """
    if isinstance(w, dict):
        if "q4" in w:
            from voxtral_tpu.ops.q4 import q4_matmul

            y = q4_matmul(x, w["q4"])
        elif "nt" in w:
            wt = w["nt"]
            y = jax.lax.dot_general(
                x, wt,
                dimension_numbers=(((x.ndim - 1,), (wt.ndim - 1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            from voxtral_tpu.ops.w8 import w8_matmul

            y = w8_matmul(x, w["w8"])
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """x * w / sqrt(mean(x^2) + eps), computed in f32."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def swiglu(x: jax.Array, p: Params) -> jax.Array:
    """w2(silu(w1 x) * w3 x); optional biases under keys w{1,2,3}_b."""
    gate = linear(x, p["w1"], p.get("w1_b"))
    up = linear(x, p["w3"], p.get("w3_b"))
    h = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    return linear(h, p["w2"], p.get("w2_b"))


def ada_modulate(x: jax.Array, t_embed: jax.Array, p: Params) -> jax.Array:
    """ADA t-conditioning: x * (1 + w2(gelu(w0(t_embed)))).

    NOT a normalization — pure modulation (reference rms_norm.rs:61-119).
    t_embed: [B, 1, d_model].
    """
    scale = linear(t_embed, p["w0"])
    scale = jax.nn.gelu(scale.astype(jnp.float32), approximate=False).astype(x.dtype)
    scale = linear(scale, p["w2"])
    return x * (scale.astype(x.dtype) + jnp.asarray(1.0, x.dtype))


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU, matching burn/torch defaults."""
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


# ---------------------------------------------------------------------------
# RoPE (interleaved pairs, θ = 1e6)
# ---------------------------------------------------------------------------


def rope_tables(head_dim: int, max_seq: int, theta: float = 1_000_000.0):
    """Precompute cos/sin tables [max_seq, head_dim//2] in f32."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) * 2.0 / head_dim))
    pos = jnp.arange(max_seq, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)  # [max_seq, half]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array, positions: jax.Array
) -> jax.Array:
    """Interleaved-pair RoPE.

    x: [B, S, H, D]; positions: [S] absolute positions (int32).
    Even lanes are the real part, odd lanes the imaginary part
    (reference rope.rs:103-141).
    """
    b, s, h, d = x.shape
    half = d // 2
    c = cos[positions][None, :, None, :]  # [1, S, 1, half] f32
    si = sin[positions][None, :, None, :]

    xf = x.astype(jnp.float32).reshape(b, s, h, half, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    out_r = xr * c - xi * si
    out_i = xr * si + xi * c
    out = jnp.stack([out_r, out_i], axis=-1).reshape(b, s, h, d)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Attention (MHA / GQA) with banded on-device masks
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AttentionSpec:
    n_heads: int
    n_kv_heads: int
    head_dim: int
    sliding_window: Optional[int]
    causal: bool = True

    @property
    def scale(self) -> float:
        return self.head_dim**-0.5


def _band_mask_bias(
    q_pos: jax.Array, k_pos: jax.Array, window: Optional[int], causal: bool
) -> jax.Array:
    """Additive f32 mask bias [Sq, Sk]: 0 where allowed, -inf elsewhere.

    allowed = (k <= q) & (q - k <= window).  Built from iota comparisons on
    device (replacing the reference's CPU mask loops, masking.rs:9-107).
    """
    diff = q_pos[:, None] - k_pos[None, :]  # [Sq, Sk]
    allowed = jnp.ones(diff.shape, dtype=bool)
    if causal:
        allowed &= diff >= 0
    if window is not None:
        allowed &= diff <= window
    return jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)


def attention(
    x: jax.Array,
    p: Params,
    spec: AttentionSpec,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,
    kv_positions: Optional[jax.Array] = None,
    kv: Optional[tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Full-sequence attention (no cache).

    x: [B, S, d_model].  Weights under keys wq/wk/wv/wo (+_b biases).
    If ``kv`` is given, uses those K/V (already roped) with ``kv_positions``.
    """
    b, s, _ = x.shape
    q = linear(x, p["wq"], p.get("wq_b")).reshape(b, s, spec.n_heads, spec.head_dim)
    q = apply_rope(q, cos, sin, positions)

    if kv is None:
        k = linear(x, p["wk"], p.get("wk_b")).reshape(
            b, s, spec.n_kv_heads, spec.head_dim
        )
        v = linear(x, p["wv"], p.get("wv_b")).reshape(
            b, s, spec.n_kv_heads, spec.head_dim
        )
        k = apply_rope(k, cos, sin, positions)
        kv_positions = positions
    else:
        k, v = kv
        assert kv_positions is not None

    out = _sdpa(q, k, v, spec, positions, kv_positions)
    out = out.reshape(b, s, spec.n_heads * spec.head_dim)
    return linear(out, p["wo"], p.get("wo_b"))


def _sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    spec: AttentionSpec,
    q_pos: jax.Array,
    k_pos: jax.Array,
    k_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Grouped scaled-dot-product attention.

    q: [B, Sq, Hq, D], k/v: [B, Sk, Hkv, D] -> [B, Sq, Hq, D].
    Scores/softmax in f32.  ``k_valid`` optionally masks cache slots that
    have not been written yet ([Sk] bool).
    """
    b, sq, hq, d = q.shape
    sk = k.shape[1]
    groups = hq // spec.n_kv_heads

    qg = q.reshape(b, sq, spec.n_kv_heads, groups, d)
    # [B, Hkv, G, Sq, Sk]
    scores = jnp.einsum(
        "bsigd,btid->bigst", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * spec.scale

    bias = _band_mask_bias(q_pos, k_pos, spec.sliding_window, spec.causal)
    if k_valid is not None:
        bias = jnp.where(k_valid[None, :], bias, -jnp.inf)
    scores = scores + bias[None, None, None, :, :]

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bigst,btid->bsigd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype).reshape(b, sq, hq, d)


# ---------------------------------------------------------------------------
# KV cache (functional, fixed shape)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """Preallocated KV cache for a stack of layers.

    k, v: [L, B, max_seq, n_kv_heads, head_dim]
    length: scalar int32 — number of valid positions.
    """

    k: jax.Array
    v: jax.Array
    length: jax.Array

    @classmethod
    def create(
        cls,
        n_layers: int,
        batch: int,
        max_seq: int,
        n_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        shape = (n_layers, batch, max_seq, n_kv_heads, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype=dtype),
            v=jnp.zeros(shape, dtype=dtype),
            length=jnp.zeros((), dtype=jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]

    def tree_flatten(self):
        return (self.k, self.v, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def cache_update_layer(
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    offset: jax.Array,
):
    """Write k_new/v_new ([B, S, Hkv, D]) at position ``offset`` of one
    layer's cache ([B, max_seq, Hkv, D]); returns updated (k, v)."""
    zero = jnp.zeros((), dtype=jnp.int32)
    start = (zero, offset.astype(jnp.int32), zero, zero)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype), start)
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype), start)
    return k_cache, v_cache


def ring_slot(offset: jax.Array, head: int, size: int) -> jax.Array:
    """Physical slot for absolute position ``offset`` in a head+ring cache.

    Slots [0, head) hold positions [0, head) permanently; slots
    [head, head+size) hold position p >= head at head + (p - head) % size.
    """
    off = offset.astype(jnp.int32)
    return jnp.where(off < head, off, head + (off - head) % size)


def ring_k_positions(head: int, size: int, written: jax.Array):
    """(absolute position, validity) per slot of a head+ring cache after
    ``written`` total positions have been appended.

    Ring slot r was last written by the largest p = head + r + size*c that
    is < written; unwritten slots get a negative position and valid=False.
    """
    j = jnp.arange(head + size, dtype=jnp.int32)
    in_head = j < head
    r = j - head
    wr = written.astype(jnp.int32) - head
    cycles = (wr - 1 - r) // size
    p = jnp.where(in_head, j, head + r + size * cycles)
    valid = jnp.where(in_head, j < written, r < wr)
    return p, valid


def attention_with_cache(
    x: jax.Array,
    p: Params,
    spec: AttentionSpec,
    cos: jax.Array,
    sin: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    offset: jax.Array,
    pos_base=0,
    ring: Optional[tuple[int, int]] = None,
):
    """Incremental attention: append this block's K/V to the cache, attend
    over everything written so far.

    x: [B, S, d_model]; k_cache/v_cache: [B, max_seq, Hkv, D];
    offset: scalar int32 (= total positions appended so far).
    ``pos_base``: absolute position of cache slot 0 — nonzero after the
    cache has been shifted (unbounded streaming); RoPE and the banded
    masks always see ABSOLUTE positions.

    ``ring``: static ``(head, size)`` turns the cache into a head+ring
    buffer (cache shape [B, head+size, Hkv, D]): positions < head are
    permanent, later ones wrap modulo ``size`` — the on-device
    replacement for host-level :func:`cache_shift` (the reference's
    dynamic eviction, kv_cache.rs:176-203, without the copies).  The
    write must fit one region: ``offset + S <= head`` or
    ``offset >= head`` with S <= size (callers align writes).  ``size``
    must cover every live query's window (size >= window + write
    granularity).  ``pos_base`` must be 0 in ring mode (positions are
    absolute by construction).
    """
    b, s, _ = x.shape
    positions = pos_base + offset + jnp.arange(s, dtype=jnp.int32)

    q = linear(x, p["wq"], p.get("wq_b")).reshape(b, s, spec.n_heads, spec.head_dim)
    k = linear(x, p["wk"], p.get("wk_b")).reshape(b, s, spec.n_kv_heads, spec.head_dim)
    v = linear(x, p["wv"], p.get("wv_b")).reshape(b, s, spec.n_kv_heads, spec.head_dim)
    q = apply_rope(q, cos, sin, positions)
    k = apply_rope(k, cos, sin, positions)

    if ring is None:
        k_cache, v_cache = cache_update_layer(k_cache, v_cache, k, v, offset)
        max_seq = k_cache.shape[1]
        k_pos = pos_base + jnp.arange(max_seq, dtype=jnp.int32)
        k_valid = jnp.arange(max_seq, dtype=jnp.int32) < (offset + s)
    else:
        head, size = ring
        slot = ring_slot(offset, head, size)
        k_cache, v_cache = cache_update_layer(k_cache, v_cache, k, v, slot)
        k_pos, k_valid = ring_k_positions(head, size, offset + s)

    out = _sdpa(q, k_cache, v_cache, spec, positions, k_pos, k_valid)
    out = out.reshape(b, s, spec.n_heads * spec.head_dim)
    out = linear(out, p["wo"], p.get("wo_b"))
    return out, k_cache, v_cache


def cache_shift(cache: "KVCache", shift: int) -> "KVCache":
    """Drop the oldest ``shift`` positions of a stacked-layer cache
    ([L, B, S, H, D]), sliding the rest to slot 0.  The caller advances
    its ``pos_base`` by the same amount; valid when every attended query
    stays within its sliding window of the retained positions."""
    k = jnp.concatenate(
        [cache.k[:, :, shift:], jnp.zeros_like(cache.k[:, :, :shift])], axis=2
    )
    v = jnp.concatenate(
        [cache.v[:, :, shift:], jnp.zeros_like(cache.v[:, :, :shift])], axis=2
    )
    return KVCache(k=k, v=v, length=cache.length - shift)


# ---------------------------------------------------------------------------
# Conv downsampler (2x Conv1d k=3 s=2 p=1 + GELU)
# ---------------------------------------------------------------------------


def conv_downsample(x: jax.Array, p: Params) -> jax.Array:
    """[B, n_mels, T] -> [B, out_channels, T/4].

    Two Conv1d(k=3, s=2, p=1) + exact GELU each (reference conv.rs:44-83).
    Weights: conv{1,2} [out_ch, in_ch, k] (PyTorch layout), conv{1,2}_b [out_ch].
    """

    def conv1d(x, w, b):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCH", "OIH", "NCH"))
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            w.astype(jnp.float32),
            window_strides=(2,),
            padding=[(1, 1)],
            dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        return y + b.astype(jnp.float32)[None, :, None]

    y = conv1d(x, p["conv1"], p["conv1_b"])
    y = jax.nn.gelu(y, approximate=False)
    y = conv1d(y.astype(x.dtype), p["conv2"], p["conv2_b"])
    y = jax.nn.gelu(y, approximate=False)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Transformer blocks
# ---------------------------------------------------------------------------


def encoder_block(
    x: jax.Array,
    p: Params,
    spec: AttentionSpec,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,
    eps: float,
) -> jax.Array:
    """Pre-LN encoder layer: x + Attn(RMS(x)); x + SwiGLU(RMS(x))."""
    h = rms_norm(x, p["attention_norm"], eps)
    x = x + attention(h, p["attention"], spec, cos, sin, positions)
    h = rms_norm(x, p["ffn_norm"], eps)
    return x + swiglu(h, p["ffn"])


def decoder_block_with_cache(
    x: jax.Array,
    t_embed: jax.Array,
    p: Params,
    spec: AttentionSpec,
    cos: jax.Array,
    sin: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    offset: jax.Array,
    eps: float,
    pos_base=0,
    ring: Optional[tuple[int, int]] = None,
):
    """Decoder layer with KV cache.

    ADA modulation sits AFTER ffn_norm, BEFORE SwiGLU
    (reference decoder_layer.rs:176-190, per vLLM).
    """
    h = rms_norm(x, p["attention_norm"], eps)
    attn_out, k_cache, v_cache = attention_with_cache(
        h, p["attention"], spec, cos, sin, k_cache, v_cache, offset, pos_base,
        ring,
    )
    x = x + attn_out
    h = rms_norm(x, p["ffn_norm"], eps)
    h = ada_modulate(h, t_embed, p["ada"])
    x = x + swiglu(h, p["ffn"])
    return x, k_cache, v_cache


def decoder_block(
    x: jax.Array,
    t_embed: jax.Array,
    p: Params,
    spec: AttentionSpec,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,
    eps: float,
) -> jax.Array:
    """Cache-free decoder layer (full-sequence forward)."""
    h = rms_norm(x, p["attention_norm"], eps)
    x = x + attention(h, p["attention"], spec, cos, sin, positions)
    h = rms_norm(x, p["ffn_norm"], eps)
    h = ada_modulate(h, t_embed, p["ada"])
    return x + swiglu(h, p["ffn"])
