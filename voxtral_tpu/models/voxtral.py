"""Complete Voxtral Realtime model with an on-device greedy decode loop.

The reference (``/root/reference/src/models/voxtral.rs``) drives decoding
from the host: one GPU readback per generated token
(voxtral.rs:365-396, gguf/model.rs:938-960).  Here the ENTIRE greedy loop —
prefill, per-step 26-layer forward, 131k-vocab LM head, argmax feedback —
is a single jitted program using ``lax.scan``; only the final token array
crosses the host boundary.

Behavioral contract kept bit-for-bit from the reference:

* Prefix length **38** (not 39): BOS=1 + 37 x ``[STREAMING_PAD]``=32.
  Position 38 is anomalous when last (it sits exactly at the trained
  n_left_pad(32) + delay(6) boundary and predicts ``[STREAMING_PAD]``
  regardless of audio), so generation starts from position 37's logits
  (voxtral.rs:275-294).
* Per-step input = ``audio_embeds[pos-1] + embed(prev_token)``
  (voxtral.rs:365-396).
* Greedy argmax; every position up to the audio length is decoded.

Timing accounting (matches the reference's conv/reshape math, NOT its
docs): mel 100 Hz -> conv 4x -> 25 Hz -> reshape 4x -> 6.25 Hz, so one
decoder position covers 2560 samples (160 ms) = two 12.5 Hz mistral-common
"audio tokens".  The 76-token left pad therefore covers exactly the
38-position decoder prefix.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.models.adapter import adapter_forward, reshape_encoder_output
from voxtral_tpu.models.decoder import (
    create_cache,
    decoder_forward_hidden,
    decoder_forward_hidden_with_cache,
    embed_tokens,
    lm_head,
)
from voxtral_tpu.models.encoder import encoder_forward
from voxtral_tpu.models.layers import KVCache, cache_update_layer, rope_tables
from voxtral_tpu.models.time_embedding import time_embedding
from voxtral_tpu.tokenizer import BOS_TOKEN, STREAMING_PAD
from voxtral_tpu.utils.profiling import span

Params = dict[str, Any]

PREFIX_LEN = 38


def make_prefix_ids() -> np.ndarray:
    """BOS + 37 x [STREAMING_PAD] (38 total)."""
    return np.array([BOS_TOKEN] + [STREAMING_PAD] * (PREFIX_LEN - 1), dtype=np.int32)


# ---------------------------------------------------------------------------
# Speculative-decode helpers (shared with voxtral_tpu.streaming)
# ---------------------------------------------------------------------------


def ngram_table_init(vocab: int, draft_token: int = STREAMING_PAD):
    """Device-resident bigram draft table for speculative decode: entry t
    = the most recently VERIFIED continuation of token t, initialized to
    the [STREAMING_PAD] fallback (so an untrained table degenerates to
    the pad policy).  512 KB at the production vocab — lives in HBM and
    updates inside the jitted step (a host-side n-gram table would force
    a sync per verification pass; the table makes drafting a chain of
    K-1 device gathers instead).  Beyond reference parity (the
    reference has no speculative decode)."""
    return jnp.full((vocab,), draft_token, jnp.int32)


def ngram_drafts(table, prev, K: int):
    """Chained bigram drafts: d0 = prev, d_{j+1} = table[d_j].
    ``prev`` [] or [B] -> drafts [K] or [B, K] (leading axis preserved)."""
    d = [prev]
    for _ in range(K - 1):
        d.append(table[d[-1]])
    return jnp.stack(d, axis=-1)


def append_rows(cache, new, offs):
    """Per-row cache append: write ``new`` [L, B, H, hd] at position
    ``offs[b]`` along the S axis of ``cache`` [L, B, H, S, hd]."""

    def one(c, n, o):  # c [L, H, S, hd], n [L, H, hd]
        z = jnp.zeros((), jnp.int32)
        return jax.lax.dynamic_update_slice(
            c, n[:, :, None].astype(c.dtype), (z, z, o, z))

    return jax.vmap(one, in_axes=(1, 1, 0), out_axes=1)(cache, new, offs)


# ---------------------------------------------------------------------------
# Pure functions (jitted by VoxtralModel with params donated/closed over)
# ---------------------------------------------------------------------------


def select_token(logits, key=None, temperature: float = 0.0, top_k: int = 0):
    """Greedy argmax, or temperature/top-k sampling when temperature > 0.

    Beyond reference parity (the reference is greedy-only,
    voxtral.rs:365-396); temperature/top_k are STATIC so the greedy path
    compiles with zero sampling overhead.  logits [B, V] -> int32 [B].
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    l = logits.astype(jnp.float32) / temperature
    if top_k > 0:
        kth = jax.lax.top_k(l, top_k)[0][..., -1:]
        l = jnp.where(l < kth, -jnp.inf, l)
    return jax.random.categorical(key, l, axis=-1).astype(jnp.int32)


def encode_audio_fn(params: Params, mel: jax.Array, cfg: VoxtralConfig) -> jax.Array:
    """mel [B, n_mels, T] -> audio embeds [B, T/16, llm_dim]."""
    enc = encoder_forward(params["encoder"], mel, cfg.audio_encoder)
    reshaped = reshape_encoder_output(enc, cfg.downsample_factor)
    return adapter_forward(params["adapter"], reshaped)


def forward_fn(
    params: Params, mel: jax.Array, t_embed: jax.Array, cfg: VoxtralConfig
) -> jax.Array:
    """Full forward (legacy mode, audio only) -> logits [B, S, vocab]."""
    audio_hidden = encode_audio_fn(params, mel, cfg)
    hidden = decoder_forward_hidden(
        params["decoder"], audio_hidden, t_embed, cfg.language_model
    )
    return lm_head(params["decoder"], hidden)


def forward_streaming_fn(
    params: Params,
    mel: jax.Array,
    token_ids: jax.Array,
    t_embed: jax.Array,
    cfg: VoxtralConfig,
) -> jax.Array:
    """Streaming-mode forward: inputs = audio_embeds + embed(token_ids)."""
    audio_embeds = encode_audio_fn(params, mel, cfg)
    text_embeds = embed_tokens(params["decoder"], token_ids)
    hidden = decoder_forward_hidden(
        params["decoder"], audio_embeds + text_embeds, t_embed, cfg.language_model
    )
    return lm_head(params["decoder"], hidden)


def transcribe_streaming_fn(
    params: Params,
    mel: jax.Array,
    t_embed: jax.Array,
    cfg: VoxtralConfig,
    cache_dtype=jnp.bfloat16,
    fused=None,
    mk_interpret: bool = False,
    temperature: float = 0.0,
    top_k: int = 0,
    seed: int = 0,
    parallel=None,
    speculative: int = 0,
    draft: str = "ngram",
) -> jax.Array:
    """Greedy streaming transcription, fully on device, batched.

    ``speculative=K >= 2`` (greedy only): the decode scan becomes a
    while-loop of ``decode_stack_step(spec=K)`` passes — each pass
    verifies K drafted tokens per batch row in ONE weight pass and each
    row advances by its own accepted count (EXACT greedy tokens for any
    draft; the draft only moves throughput — same machinery as
    ``StreamingSession(speculative=K)``).  ``draft``: "ngram" (a
    per-call device-resident bigram table, trained in place by every
    verification pass) or "pad" (all-[STREAMING_PAD] drafts).  Rides the
    single-chip / DP-meshed stack kernel, or the TP half-kernels +
    vocab-sharded greedy lm fold (``tp_decode_step(spec=K)`` — per-shard
    spec attention over the local heads, psums carry batch*K rows); XLA
    / sampling configurations fall back to the sequential scan.

    mel: [B, n_mels, T].  Returns int32 tokens [B, S - PREFIX_LEN] where
    S = T//16 is the decoder sequence length (requires S >= PREFIX_LEN + 1;
    the host wrapper checks).

    Decode is HBM-bound on the weights, so batching B independent chunks
    into one scan makes the extra chunks nearly free — the pipeline packs
    ALL chunks of a file into a single call.

    ``fused``: prepared stacked megakernel weights
    (ops.decode_step_pallas.fuse_decode_weights) — when given, each decode
    step runs 26 fused per-layer Pallas kernels instead of ~200 XLA ops,
    keeping the weight DMA pipelined through the attention/VPU work.

    ``parallel``: a :class:`voxtral_tpu.parallel.ParallelPlan` (closed
    over, never traced).  With ``tp > 1`` the fused decode step runs the
    tensor-parallel half-kernels (``fused`` must then be the model's
    ``fused_tp`` dict with a leading shard axis); with ``dp > 1`` the
    whole-stack kernel runs under a batch-sharded ``shard_map``.  The XLA
    (non-fused) paths need no routing — they partition automatically from
    the parameter shardings (reference has no distributed runtime at all,
    SURVEY.md §2.6).
    """
    if draft not in ("pad", "ngram"):
        raise ValueError(f"draft policy must be pad|ngram, got {draft!r}")
    lm_cfg = cfg.language_model
    # Mesh-sharded params must never reach the Pallas lm_head dispatch
    # (pallas_call is opaque to GSPMD); the XLA dot partitions from the
    # parameter shardings.  TP greedy decode uses the vocab-sharded
    # Pallas fold below instead.
    lm_xla = parallel is not None

    audio_embeds = encode_audio_fn(params, mel, cfg)  # [B, S, D]
    batch, seq_len = audio_embeds.shape[0], audio_embeds.shape[1]

    prefix_ids = jnp.tile(jnp.asarray(make_prefix_ids())[None, :], (batch, 1))
    prefix_text = embed_tokens(params["decoder"], prefix_ids)
    prefix_inputs = audio_embeds[:, :PREFIX_LEN, :] + prefix_text

    cache = create_cache(lm_cfg, batch, seq_len, dtype=cache_dtype)
    rope = rope_tables(lm_cfg.head_dim, seq_len, lm_cfg.rope_theta)

    # Prefill: fills cache positions 0..37, predicts the token at 38.
    hidden, cache = decoder_forward_hidden_with_cache(
        params["decoder"], prefix_inputs, t_embed, cache, lm_cfg, rope
    )
    first_logits = lm_head(params["decoder"], hidden[:, -1, :],
                           xla_only=lm_xla)  # [B, V]
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    first_token = select_token(first_logits, k0, temperature, top_k)  # [B]

    use_spec = False
    if fused is not None:
        from voxtral_tpu.models.layers import rms_norm
        from voxtral_tpu.ops.decode_step_pallas import (
            ada_vectors,
            decode_layer_step,
            decode_stack_step,
            rope_pair_vectors,
            supports_stack_kernel,
        )

        ada_vecs = ada_vectors(params["decoder"], t_embed)  # [L, D]
        n_layers = lm_cfg.n_layers
        # Parallel routing (trace-time statics).  TP replaces the stack
        # kernel with the attn/ffn half-kernels (+psum at the layer's two
        # reduction points); DP wraps the stack kernel in a batch-sharded
        # shard_map.  tp takes precedence on a combined mesh (dp x tp
        # fused composition rides the XLA path).
        bf16_w = isinstance(fused["wqkv"], tuple)
        # Single-chip g32 (exact-Q4_0) stacks carry 4D group-scale
        # stacks; the TP half-kernel stacks are 4D (w8, scales 2D/3D) or
        # 5D (g32 with a leading shard axis, scales 5D).
        wg = (not bf16_w and fused.get("sqkv") is not None
              and fused["sqkv"].ndim == 4 and fused["wqkv"].ndim == 4)
        witem = 2 if bf16_w else (1.125 if wg else 1)
        use_tp = (parallel is not None and parallel.tp > 1
                  and not bf16_w and not wg
                  and fused["wqkv"].ndim in (4, 5))
        use_dp = (parallel is not None and not use_tp and parallel.dp > 1
                  and batch % parallel.dp == 0)
        use_stack = not use_tp and supports_stack_kernel(lm_cfg, witem)
        # Fold final norm + tied lm_head into the stack kernel when the
        # embedding table matches the weight mode (w8 dict / dense bf16)
        # and the vocab tiles cleanly.
        from voxtral_tpu.ops.decode_step_pallas import (
            STACK_VMEM_CAP,
            _lm_tile,
            stack_vmem_need,
        )

        emb = params["decoder"]["tok_embeddings"]
        lm_w8 = (emb.get("w8") if isinstance(emb, dict) and not wg
                 else None)
        lm_dense = (emb if bf16_w and not isinstance(emb, dict) else None)
        lm_g32 = fused.get("lm_codes") if wg else None
        fold_lm = use_stack and (
            (lm_w8 is not None and not bf16_w
             and _lm_tile(lm_w8["codes"].shape[0], lm_cfg.dim) is not None)
            or (lm_dense is not None
                and _lm_tile(lm_dense.shape[0], lm_cfg.dim, witem)
                is not None)
            or (lm_g32 is not None
                and _lm_tile(lm_g32.shape[1], lm_cfg.dim, witem)
                is not None)
        )
        # VMEM gate (same rule as streaming._fused_plan): the pipeline can
        # merge many chunks into one batch, and per-row cache + logits VMEM
        # grows with B — an oversized geometry would hard-fail the Mosaic
        # compile at runtime.  Drop the lm fold first (its buffers + [B, V]
        # logits block are the biggest optional term), then the stack
        # kernel entirely, falling back to the per-layer fused path.
        if use_stack:
            itemsize = jnp.dtype(cache_dtype).itemsize
            # Under DP each shard sees batch/dp rows.
            gate_batch = batch // parallel.dp if use_dp else batch

            def _need(vocab):
                return stack_vmem_need(
                    gate_batch, seq_len, lm_cfg.dim, lm_cfg.n_heads,
                    lm_cfg.n_kv_heads, lm_cfg.head_dim, lm_cfg.hidden_dim,
                    vocab, itemsize, weight_itemsize=witem,
                )

            if fold_lm:
                if lm_dense is not None:
                    vocab = lm_dense.shape[0]
                elif lm_g32 is not None:
                    vocab = lm_g32.shape[1]
                else:
                    vocab = lm_w8["codes"].shape[0]
                need = _need(vocab)
                if need is None or need > STACK_VMEM_CAP:
                    fold_lm = False
            if not fold_lm:
                need = _need(None)
                if need is None or need > STACK_VMEM_CAP:
                    use_stack = False
        # Speculative K-token transcribe: greedy-only, fused-path-only.
        # The stack kernel (single-chip or DP) verifies batch*K rows
        # with per-row offsets; on a TP mesh the spec-capable
        # half-kernels + vocab-sharded lm fold do (tp_decode_step
        # (spec=K) — per-shard spec attention over the local heads).
        # Re-gate VMEM at batch*K query rows and a K-1-slot cache tail
        # (the last pass's K appends land at positions up to
        # seq_len+K-2).
        spec_ok = (speculative >= 2 and temperature <= 0.0
                   and seq_len - PREFIX_LEN - 1 >= 1)
        if use_tp and spec_ok:
            from voxtral_tpu.ops.decode_tp_pallas import (
                TP_VMEM_CAP,
                tp_vmem_need,
            )

            itemsize = jnp.dtype(cache_dtype).itemsize
            rows = (batch // parallel.dp
                    if parallel.dp > 1 and batch % parallel.dp == 0
                    else batch)
            need = tp_vmem_need(
                rows * speculative, seq_len + speculative - 1,
                lm_cfg.dim, lm_cfg.n_heads, lm_cfg.n_kv_heads,
                lm_cfg.head_dim, lm_cfg.hidden_dim, parallel.tp,
                itemsize, spec=speculative,
                wg=fused["wqkv"].ndim == 5,
            )
            use_spec = need is not None and need <= TP_VMEM_CAP
        if (use_stack and spec_ok):
            if fold_lm:
                if lm_dense is not None:
                    sv = lm_dense.shape[0]
                elif lm_g32 is not None:
                    sv = lm_g32.shape[1]
                else:
                    sv = lm_w8["codes"].shape[0]
            else:
                sv = None
            itemsize = jnp.dtype(cache_dtype).itemsize
            gate_batch = batch // parallel.dp if use_dp else batch
            need = stack_vmem_need(
                gate_batch * speculative, seq_len + speculative - 1,
                lm_cfg.dim, lm_cfg.n_heads, lm_cfg.n_kv_heads,
                lm_cfg.head_dim, lm_cfg.hidden_dim, sv, itemsize,
                weight_itemsize=witem, spec=speculative,
            )
            use_spec = need is not None and need <= STACK_VMEM_CAP
        if (bf16_w or wg) and not use_stack:
            # The per-layer fallback kernel is w8-only; dense/q4g models
            # without a stack plan ride the XLA step.
            fused = None
        use_dp = use_dp and use_stack
        if fused is not None and parallel is not None \
                and not (use_tp or use_stack):
            # A sharded model must never hit the per-layer Pallas fallback
            # (pallas_call cannot be auto-partitioned); the XLA step path
            # below partitions automatically from the parameter shardings.
            fused = None
        # Stack-kernel folded lm_head kwargs (trace-time statics), shared
        # by the sequential step and the speculative while-loop body.
        stack_lm_kw = {}
        if fused is not None and use_stack and fold_lm:
            if lm_dense is not None:
                stack_lm_kw = dict(
                    final_norm=params["decoder"]["norm"],
                    lm_codes=lm_dense.astype(jnp.bfloat16),
                    lm_scale=None,
                )
            elif lm_g32 is not None:
                stack_lm_kw = dict(
                    final_norm=params["decoder"]["norm"],
                    lm_codes=lm_g32,
                    lm_scale=fused["lm_scale"],
                )
            else:
                stack_lm_kw = dict(
                    final_norm=params["decoder"]["norm"],
                    lm_codes=lm_w8["codes"],
                    lm_scale=lm_w8["scale"],
                )

    if fused is not None:
        def step(carry, i):
            prev_token, cache, key = carry
            key, kstep = jax.random.split(key)
            audio_pos = jax.lax.dynamic_slice_in_dim(
                audio_embeds, PREFIX_LEN + i, 1, axis=1
            )
            text = embed_tokens(params["decoder"], prev_token[:, None])
            x = (audio_pos + text)[:, 0, :].astype(jnp.float32)
            offset = cache.length
            cos_p, sin_p = rope_pair_vectors(
                offset, lm_cfg.head_dim, lm_cfg.rope_theta
            )

            def append(cache, k_new, v_new):
                # k_new/v_new [L, B, Hkv, hd] -> head-major cache slot
                # ``offset`` along S for every layer at once.
                zero = jnp.zeros((), jnp.int32)
                start = (zero, zero, zero, offset, zero)
                k_c = jax.lax.dynamic_update_slice(
                    cache.k, k_new[:, :, :, None].astype(cache.k.dtype),
                    start)
                v_c = jax.lax.dynamic_update_slice(
                    cache.v, v_new[:, :, :, None].astype(cache.v.dtype),
                    start)
                return KVCache(k_c, v_c, offset + 1)

            if use_tp:
                from voxtral_tpu.ops.decode_tp_pallas import tp_decode_step

                # DP x TP composition: on a combined mesh with enough
                # batch rows, the batch dim ALSO shards over the data
                # axis (zero extra collectives — psums stay model-only).
                da = ("data" if parallel.dp > 1
                      and batch % parallel.dp == 0 else None)
                xo, k_new, v_new = tp_decode_step(
                    parallel.mesh, x, offset,
                    fused["attn_norm"], fused["ffn_norm"], ada_vecs,
                    fused, cos_p, sin_p, cache.k, cache.v,
                    n_heads=lm_cfg.n_heads, n_kv=lm_cfg.n_kv_heads,
                    head_dim=lm_cfg.head_dim, eps=lm_cfg.norm_eps,
                    interpret=mk_interpret, window=lm_cfg.sliding_window,
                    data_axis=da,
                )
                cache = append(cache, k_new, v_new)
                if temperature <= 0.0 and "lm_codes" in fused:
                    # Vocab-sharded greedy lm_head: per-shard Pallas
                    # (max, argmax) fold + pmax/pmin resolution — the
                    # [B, 131k] logits never materialize on any chip.
                    from voxtral_tpu.ops.decode_tp_pallas import (
                        tp_lm_head_token,
                    )

                    token = tp_lm_head_token(
                        parallel.mesh, xo, params["decoder"]["norm"],
                        fused["lm_codes"], fused["lm_scale"],
                        eps=lm_cfg.norm_eps, interpret=mk_interpret,
                        data_axis=da,
                    )
                    return (token, cache, key), token
                hidden = rms_norm(
                    xo, params["decoder"]["norm"], lm_cfg.norm_eps)
                logits = lm_head(params["decoder"], hidden, xla_only=True)
                token = select_token(logits, kstep, temperature, top_k)
                return (token, cache, key), token

            if use_stack:
                # Whole stack in one kernel: weight DMA never drains
                # across phase or layer boundaries.  The fused path
                # carries the cache head-major ([L, B, Hkv, S, hd]) so
                # the kernel's attention dots need no transpose.
                lm_kw = stack_lm_kw
                kernel_kw = dict(
                    n_heads=lm_cfg.n_heads, n_kv=lm_cfg.n_kv_heads,
                    head_dim=lm_cfg.head_dim, eps=lm_cfg.norm_eps,
                    interpret=mk_interpret,
                    window=lm_cfg.sliding_window,
                )
                if use_dp:
                    from voxtral_tpu.parallel.dp_decode import (
                        dp_decode_stack_step,
                    )

                    out = dp_decode_stack_step(
                        parallel.mesh, x,
                        jnp.full((batch,), offset, jnp.int32),
                        fused["attn_norm"], fused["ffn_norm"], ada_vecs,
                        fused["sqkv"], fused["so"], fused["s13"],
                        fused["s2"], cos_p, sin_p, cache.k, cache.v,
                        fused["wqkv"], fused["wo"], fused["w13"],
                        fused["w2"], **lm_kw, **kernel_kw,
                    )
                else:
                    out = decode_stack_step(
                        x, offset,
                        fused["attn_norm"], fused["ffn_norm"], ada_vecs,
                        fused["sqkv"], fused["so"], fused["s13"],
                        fused["s2"], cos_p, sin_p, cache.k, cache.v,
                        fused["wqkv"], fused["wo"], fused["w13"],
                        fused["w2"], **lm_kw, **kernel_kw,
                    )
                if fold_lm:
                    x, k_new, v_new, logits = out
                else:
                    x, k_new, v_new = out
                cache = append(cache, k_new, v_new)
                if not fold_lm:
                    hidden = rms_norm(
                        x, params["decoder"]["norm"], lm_cfg.norm_eps)
                    logits = lm_head(params["decoder"], hidden,
                                     xla_only=lm_xla)
                token = select_token(logits, kstep, temperature, top_k)
                return (token, cache, key), token

            def layer_body(xc, inp):
                (l, attn_norm, ffn_norm, ada_vec,
                 sqkv, so, s13, s2, k_l, v_l) = inp
                x_out, k_new, v_new = decode_layer_step(
                    xc, l, offset, attn_norm, ffn_norm, ada_vec,
                    sqkv, so, s13, s2, cos_p, sin_p, k_l, v_l,
                    fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
                    n_heads=lm_cfg.n_heads, n_kv=lm_cfg.n_kv_heads,
                    head_dim=lm_cfg.head_dim, eps=lm_cfg.norm_eps,
                    interpret=mk_interpret,
                    window=lm_cfg.sliding_window,
                )
                k_l, v_l = cache_update_layer(
                    k_l, v_l, k_new[:, None], v_new[:, None], offset
                )
                return x_out, (k_l, v_l)

            xs = (
                jnp.arange(n_layers, dtype=jnp.int32),
                fused["attn_norm"], fused["ffn_norm"], ada_vecs,
                fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
                cache.k, cache.v,
            )
            x, (k_new, v_new) = jax.lax.scan(layer_body, x, xs)
            cache = KVCache(k_new, v_new, offset + 1)
            hidden = rms_norm(x, params["decoder"]["norm"], lm_cfg.norm_eps)
            logits = lm_head(params["decoder"], hidden, xla_only=lm_xla)
            token = select_token(logits, kstep, temperature, top_k)
            return (token, cache, key), token
    else:
        def step(carry, i):
            prev_token, cache, key = carry
            key, kstep = jax.random.split(key)
            # Input position = PREFIX_LEN + i; predicts token PREFIX_LEN+i+1.
            audio_pos = jax.lax.dynamic_slice_in_dim(
                audio_embeds, PREFIX_LEN + i, 1, axis=1
            )  # [B, 1, D]
            text = embed_tokens(params["decoder"], prev_token[:, None])
            hidden, cache = decoder_forward_hidden_with_cache(
                params["decoder"], audio_pos + text, t_embed, cache, lm_cfg,
                rope,
            )
            logits = lm_head(params["decoder"], hidden[:, 0, :],
                             xla_only=lm_xla)  # [B, V]
            token = select_token(logits, kstep, temperature, top_k)
            return (token, cache, key), token

    if fused is not None and (use_stack or use_tp):
        # One-time head-major transpose of the prefilled cache for the
        # stack / TP half kernels ([L, B, S, Hkv, hd] -> [L, B, Hkv, S, hd]).
        cache = KVCache(
            jnp.transpose(cache.k, (0, 1, 3, 2, 4)),
            jnp.transpose(cache.v, (0, 1, 3, 2, 4)),
            cache.length,
        )

    n_steps = seq_len - PREFIX_LEN - 1

    if fused is not None and use_spec:
        # Speculative decode: a while-loop of spec-K stack-kernel passes;
        # each pass verifies K drafted tokens per row in ONE weight pass
        # and each row advances by its own exact-greedy accepted count.
        # Same machinery as streaming._pool_step_spec, minus the ready
        # mask / ring / int8 rungs (the one-shot cache is bf16 bounded).
        # On a TP mesh the pass is tp_decode_step(spec=K): the psums
        # carry batch*K rows (same 2/layer) and greedy tokens come from
        # the vocab-sharded lm fold; a data axis shards whole rows.
        K = speculative
        ngram = draft == "ngram"
        spec_da = ("data" if use_tp and parallel.dp > 1
                   and batch % parallel.dp == 0 else None)
        tp_fold = use_tp and "lm_codes" in fused
        # The last pass at pos = n_steps-1 appends K rows at positions
        # up to seq_len-2+K: give the cache a K-1-slot tail (rows past
        # each query's offset are masked by the kernel's validity mask).
        pad_s = [(0, 0)] * 5
        pad_s[3] = (0, K - 1)
        dk = jnp.pad(cache.k, pad_s)
        dv = jnp.pad(cache.v, pad_s)
        # Input row for generated index i = audio_embeds[PREFIX_LEN+i]
        # + embed(token_i); pad the audio rows so the K-row slice at
        # pos = n_steps-1 stays in bounds (padded rows never accepted).
        inputs = audio_embeds[:, PREFIX_LEN:PREFIX_LEN + n_steps, :]
        inputs = jnp.concatenate(
            [inputs, jnp.tile(inputs[:, -1:, :], (1, K - 1, 1))], axis=1)
        spec_kernel_kw = dict(
            n_heads=lm_cfg.n_heads, n_kv=lm_cfg.n_kv_heads,
            head_dim=lm_cfg.head_dim, eps=lm_cfg.norm_eps,
            interpret=mk_interpret, window=lm_cfg.sliding_window,
            spec=K, **stack_lm_kw,
        )

        def spec_body(st):
            pos, prev, dk, dv, toks, table = st
            offs = PREFIX_LEN + pos  # [B] per-row absolute positions
            a = jax.vmap(
                lambda inp, q: jax.lax.dynamic_slice_in_dim(
                    inp, q, K, axis=0)
            )(inputs, pos)  # [B, K, D]
            if ngram:
                drafts = ngram_drafts(table, prev, K)  # [B, K]
            else:
                drafts = jnp.concatenate(
                    [prev[:, None],
                     jnp.full((batch, K - 1), STREAMING_PAD, jnp.int32)],
                    axis=1)
            text = embed_tokens(params["decoder"], drafts)
            x = (a + text).reshape(batch * K, lm_cfg.dim).astype(
                jnp.float32)
            pos_rows = (offs[:, None]
                        + jnp.arange(K, dtype=jnp.int32)[None, :]
                        ).reshape(-1)
            cos, sin = jax.vmap(
                lambda q: rope_pair_vectors(
                    q, lm_cfg.head_dim, lm_cfg.rope_theta)
            )(pos_rows)
            if use_tp:
                from voxtral_tpu.ops.decode_tp_pallas import (
                    tp_decode_step,
                    tp_lm_head_token,
                )

                xo, k_new, v_new = tp_decode_step(
                    parallel.mesh, x, offs,
                    fused["attn_norm"], fused["ffn_norm"], ada_vecs,
                    fused, cos, sin, dk, dv,
                    n_heads=lm_cfg.n_heads, n_kv=lm_cfg.n_kv_heads,
                    head_dim=lm_cfg.head_dim, eps=lm_cfg.norm_eps,
                    interpret=mk_interpret,
                    window=lm_cfg.sliding_window,
                    spec=K, data_axis=spec_da,
                )
                if tp_fold:
                    y = tp_lm_head_token(
                        parallel.mesh, xo, params["decoder"]["norm"],
                        fused["lm_codes"], fused["lm_scale"],
                        eps=lm_cfg.norm_eps, interpret=mk_interpret,
                        data_axis=spec_da,
                    ).reshape(batch, K).astype(jnp.int32)
                else:
                    hidden = rms_norm(
                        xo, params["decoder"]["norm"], lm_cfg.norm_eps)
                    logits = lm_head(params["decoder"], hidden,
                                     xla_only=True)
                    y = jnp.argmax(logits, axis=-1).reshape(
                        batch, K).astype(jnp.int32)
            else:
                spec_args = (
                    x, offs,
                    fused["attn_norm"], fused["ffn_norm"], ada_vecs,
                    fused["sqkv"], fused["so"], fused["s13"],
                    fused["s2"], cos, sin, dk, dv,
                    fused["wqkv"], fused["wo"], fused["w13"],
                    fused["w2"],
                )
                if use_dp:
                    from voxtral_tpu.parallel.dp_decode import (
                        dp_decode_stack_step,
                    )

                    out = dp_decode_stack_step(
                        parallel.mesh, *spec_args, **spec_kernel_kw)
                else:
                    out = decode_stack_step(*spec_args, **spec_kernel_kw)
                if fold_lm:
                    _, k_new, v_new, logits = out
                else:
                    xo, k_new, v_new = out
                    hidden = rms_norm(
                        xo, params["decoder"]["norm"], lm_cfg.norm_eps)
                    logits = lm_head(params["decoder"], hidden,
                                     xla_only=lm_xla)
                y = jnp.argmax(logits, axis=-1).reshape(batch, K).astype(
                    jnp.int32)
            # Exact-greedy acceptance: y[:, j] is valid iff every earlier
            # draft matched its verified token; y[:, 0] always is.
            match = (y[:, : K - 1] == drafts[:, 1:]).astype(jnp.int32)
            n_acc = 1 + jnp.sum(jnp.cumprod(match, axis=1), axis=1)
            adv = jnp.where(pos < n_steps,
                            jnp.minimum(n_acc, n_steps - pos), 0)
            # Append ALL K fresh rows per row at offs+j: rows past the
            # accepted count are invisible (validity masks slots >= off)
            # and are overwritten by later appends at the same positions.
            nL = k_new.shape[0]
            kS = k_new.reshape(nL, batch, K, lm_cfg.n_kv_heads,
                               lm_cfg.head_dim)
            vS = v_new.reshape(nL, batch, K, lm_cfg.n_kv_heads,
                               lm_cfg.head_dim)
            for j in range(K):
                dk = append_rows(dk, kS[:, :, j], offs + j)
                dv = append_rows(dv, vS[:, :, j], offs + j)
            # Finished rows keep riding with pos frozen at n_steps: their
            # writes land in the buffer's K-1 padding tail.
            toks = jax.vmap(
                lambda t, yk, q: jax.lax.dynamic_update_slice(
                    t, yk, (q,))
            )(toks, y, pos)
            idx = jnp.clip(adv - 1, 0, K - 1)
            picked = jnp.take_along_axis(y, idx[:, None], axis=1)[:, 0]
            prev = jnp.where(adv > 0, picked, prev)
            if ngram:
                # Train on live rows' verified continuations only; dead
                # rows' writes route to entry 0 with its current value
                # (a no-op scatter).
                live = pos < n_steps
                tgt = jnp.where(live[:, None], drafts, 0)
                val = jnp.where(live[:, None], y, table[0])
                table = table.at[tgt.reshape(-1)].set(val.reshape(-1))
            return pos + adv, prev, dk, dv, toks, table

        table0 = (ngram_table_init(lm_cfg.vocab_size) if ngram
                  else jnp.zeros((1,), jnp.int32))
        st = (jnp.zeros((batch,), jnp.int32), first_token, dk, dv,
              jnp.zeros((batch, n_steps + K - 1), jnp.int32), table0)
        st = jax.lax.while_loop(
            lambda s: jnp.any(s[0] < n_steps), spec_body, st)
        return jnp.concatenate(
            [first_token[:, None], st[4][:, :n_steps]], axis=1)

    (_, _, _), rest = jax.lax.scan(
        step, (first_token, cache, key), jnp.arange(n_steps, dtype=jnp.int32)
    )  # rest: [n_steps, B]
    return jnp.concatenate([first_token[None, :], rest]).T  # [B, S-PREFIX]


def transcribe_from_samples_fn(
    params: Params,
    samples: jax.Array,
    mel_window: jax.Array,
    mel_basis: jax.Array,
    t_embed: jax.Array,
    cfg: VoxtralConfig,
    n_fft: int = 400,
    hop: int = 160,
    log_mel_max: float = 1.5,
    compute_dtype=jnp.bfloat16,
    **kw,
) -> jax.Array:
    """Fused frontend: padded samples [B, N] -> greedy tokens, ONE program.

    Folds the log-mel frontend (``audio.mel.mel_log_jax_batch``) into the
    same jitted program as encode + decode, so a transcription is a single
    dispatch with one host fetch — the reference pays a CPU mel stage + a
    GPU upload per chunk (transcribe.rs:279-306) and the round-2 pipeline
    paid a host mel + an extra transfer + dispatch.
    """
    from voxtral_tpu.audio.mel import mel_log_jax_batch

    mel = mel_log_jax_batch(
        samples, mel_window, mel_basis,
        n_fft=n_fft, hop=hop, log_mel_max=log_mel_max,
    ).astype(compute_dtype)
    return transcribe_streaming_fn(params, mel, t_embed, cfg, **kw)


# ---------------------------------------------------------------------------
# Model wrapper
# ---------------------------------------------------------------------------


class VoxtralModel:
    """Holds a parameter pytree + config, exposes jitted entry points.

    Jitted callables are cached per input shape (mel length buckets keep
    the number of distinct compilations small — see
    :meth:`transcribe_streaming`).
    """

    def __init__(self, params: Params, config: Optional[VoxtralConfig] = None,
                 cache_dtype=None, compute_dtype=None, mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` with ("data", "model")
        axes (see :func:`voxtral_tpu.parallel.make_mesh`).  When given,
        the parameters are TP/DP-sharded onto it and the transcribe path
        routes fused decode through the TP half-kernels (tp > 1) or the
        batch-sharded DP shard_map (dp > 1).  Beyond reference parity —
        the reference is single-device only (SURVEY.md §2.6)."""
        self.params = params
        self.config = config or VoxtralConfig.voxtral()
        # Activation dtype: follows the dense weights, bf16 on the Q4 path.
        # (Inputs are cast on entry — activations drive MXU throughput.)
        if compute_dtype is None:
            w1 = params["adapter"]["w1"]
            compute_dtype = jnp.bfloat16 if isinstance(w1, dict) else w1.dtype
        self.compute_dtype = compute_dtype
        # KV cache dtype defaults to the compute dtype (f32 models keep
        # exact cache-vs-full equivalence; bf16/quantized models use bf16).
        self.cache_dtype = cache_dtype if cache_dtype is not None else compute_dtype

        cfg = self.config

        # Decode megakernel (per-layer fused Pallas step): enabled on TPU
        # for w8 models at the production head_dim; VOXTRAL_MEGAKERNEL=0
        # disables, =force enables off-TPU (interpret mode, tests only).
        import os

        from voxtral_tpu.ops.decode_step_pallas import megakernel_mode

        mk_env = os.environ.get("VOXTRAL_MEGAKERNEL", "1")
        on_tpu = jax.default_backend() == "tpu"
        lm = cfg.language_model
        mode = megakernel_mode(params["decoder"], lm.head_dim)
        use_mk = (
            mk_env != "0"
            and mode is not None
            and ((on_tpu and lm.head_dim == 128) or mk_env == "force")
        )
        if mode == "bf16" and mesh is not None:
            # Sharded dense models ride the GSPMD-partitioned XLA path;
            # the nt-rewrite would break the named sharding specs.
            use_mk = False
        if mode == "q4g":
            from voxtral_tpu.ops.decode_step_pallas import q4g_geometry_ok

            if not q4g_geometry_ok(lm):
                use_mk = False
        self.fused_decode = None
        self.megakernel_weights = None
        self._mk_interpret = False
        if use_mk:
            if mode == "w8":
                from voxtral_tpu.ops.decode_step_pallas import (
                    fuse_decode_weights,
                )

                self.fused_decode = fuse_decode_weights(params["decoder"])
            elif mode == "q4g":
                from voxtral_tpu.ops.decode_step_pallas import (
                    fuse_decode_weights_q4g,
                )

                self.fused_decode = fuse_decode_weights_q4g(
                    params["decoder"])
            else:
                # bf16 dense: memory-neutral — the decoder layer leaves
                # are rewritten in place to the kernel's [L, N, K]
                # layout ({"nt": w}), shared by prefill and the kernel.
                from voxtral_tpu.ops.decode_step_pallas import (
                    fuse_decode_weights_bf16,
                )

                self.fused_decode = fuse_decode_weights_bf16(
                    params["decoder"])
            self.megakernel_weights = mode
            self._mk_interpret = not on_tpu

        # Multi-chip surface: shard the params onto the mesh and prepare
        # the TP-resharded fused stacks (built from the fused weights
        # BEFORE sharding, then placed with a leading model-axis shard).
        self.parallel = None
        self.fused_tp = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from voxtral_tpu.parallel import (
                MODEL_AXIS,
                ParallelPlan,
                shard_params,
            )

            plan = ParallelPlan.from_mesh(mesh)
            self.parallel = plan
            wg = self.megakernel_weights == "q4g"
            if plan.tp > 1 and wg:
                # The g32 TP halves contract whole 128-lane superblocks:
                # the LOCAL contraction dims must stay % 128 or the
                # model rides the GSPMD-partitioned XLA step instead.
                nq = lm.n_heads * lm.head_dim
                if (lm.n_kv_heads % plan.tp or lm.hidden_dim % plan.tp
                        or (nq // plan.tp) % 128
                        or (lm.hidden_dim // plan.tp) % 128):
                    self.fused_decode = None
                    self.megakernel_weights = None
                    wg = False
            if plan.tp > 1 and self.fused_decode is not None:
                if (lm.n_kv_heads % plan.tp == 0
                        and lm.hidden_dim % plan.tp == 0):
                    from voxtral_tpu.ops.decode_tp_pallas import (
                        tp_shard_fused_weights,
                        tp_shard_fused_weights_q4g,
                    )

                    shard_fused = (tp_shard_fused_weights_q4g if wg
                                   else tp_shard_fused_weights)
                    tp_w = shard_fused(
                        self.fused_decode, lm.n_heads, lm.n_kv_heads,
                        lm.head_dim, lm.hidden_dim, plan.tp)
                    rep = NamedSharding(mesh, P())

                    def put(a):
                        spec = P(MODEL_AXIS, *([None] * (a.ndim - 1)))
                        return jax.device_put(a, NamedSharding(mesh, spec))

                    self.fused_tp = {k: put(v) for k, v in tp_w.items()}
                    for name in ("attn_norm", "ffn_norm"):
                        self.fused_tp[name] = jax.device_put(
                            self.fused_decode[name], rep)
                    # Vocab-sharded tied lm_head for the greedy TP fold
                    # (tp_lm_head_token) — when the table matches the
                    # weight mode (w8 dict / g32 stacks) and the
                    # per-shard vocab tiles cleanly.
                    emb_p = params["decoder"]["tok_embeddings"]
                    emb_w8 = (emb_p.get("w8")
                              if isinstance(emb_p, dict) and not wg
                              else None)
                    lm_g32 = self.fused_decode.get("lm_codes") if wg \
                        else None
                    from voxtral_tpu.ops.decode_step_pallas import (
                        _lm_tile,
                    )

                    if emb_w8 is not None:
                        from voxtral_tpu.ops.decode_tp_pallas import (
                            tp_shard_lm_head,
                        )

                        V = emb_w8["codes"].shape[0]
                        if (V % plan.tp == 0
                                and _lm_tile(V // plan.tp, lm.dim)
                                is not None):
                            lm_tp = tp_shard_lm_head(emb_w8, plan.tp)
                            self.fused_tp["lm_codes"] = put(lm_tp["codes"])
                            self.fused_tp["lm_scale"] = put(lm_tp["scale"])
                    elif lm_g32 is not None:
                        from voxtral_tpu.ops.decode_tp_pallas import (
                            tp_shard_lm_head_q4g,
                        )

                        V = lm_g32.shape[1]
                        if (V % plan.tp == 0
                                and _lm_tile(V // plan.tp, lm.dim, 1.125)
                                is not None):
                            lm_tp = tp_shard_lm_head_q4g(
                                lm_g32, self.fused_decode["lm_scale"],
                                plan.tp)
                            self.fused_tp["lm_codes"] = put(lm_tp["codes"])
                            self.fused_tp["lm_scale"] = put(lm_tp["scale"])
                # TP sessions/pools would feed decode_stack_step sharded
                # caches; drop the single-chip fused stacks so streaming
                # rides the auto-partitioned XLA path instead.
                self.fused_decode = None
            elif plan.dp > 1 and self.fused_decode is not None:
                rep = NamedSharding(mesh, P())
                self.fused_decode = {
                    k: jax.device_put(v, rep)
                    for k, v in self.fused_decode.items()
                }
            self.params = shard_params(params, mesh)

        self._encode = jax.jit(partial(encode_audio_fn, cfg=cfg))
        self._forward = jax.jit(partial(forward_fn, cfg=cfg))
        self._forward_streaming = jax.jit(partial(forward_streaming_fn, cfg=cfg))
        self._transcribe_jits: dict = {}
        self._transcribe = self._get_transcribe()  # greedy default

    def _get_transcribe(self, temperature: float = 0.0, top_k: int = 0,
                        speculative: int = 0, draft: str = "ngram"):
        """Jitted transcribe for a (temperature, top_k, speculative,
        draft) setting (cached)."""
        key = (float(temperature), int(top_k), int(speculative), draft)
        if key not in self._transcribe_jits:
            self._transcribe_jits[key] = jax.jit(
                partial(transcribe_streaming_fn, cfg=self.config,
                        cache_dtype=self.cache_dtype,
                        mk_interpret=self._mk_interpret,
                        temperature=float(temperature), top_k=int(top_k),
                        parallel=self.parallel,
                        speculative=int(speculative), draft=draft)
            )
        return self._transcribe_jits[key]

    @property
    def _transcribe_fused(self):
        """Fused weights for the transcribe path: the TP-resharded stacks
        under a tp mesh, the single-chip stacks otherwise."""
        return self.fused_tp if self.fused_tp is not None else self.fused_decode

    # -- constructors -------------------------------------------------------

    @classmethod
    def init_random(
        cls,
        key: jax.Array,
        config: Optional[VoxtralConfig] = None,
        dtype=jnp.bfloat16,
        vocab_size: Optional[int] = None,
        mesh=None,
    ) -> "VoxtralModel":
        """Random production-shape weights (tests / benchmarks)."""
        from voxtral_tpu.models.adapter import init_adapter_params
        from voxtral_tpu.models.decoder import init_decoder_params
        from voxtral_tpu.models.encoder import init_encoder_params

        config = config or VoxtralConfig.voxtral()
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "encoder": init_encoder_params(k1, config.audio_encoder, dtype),
            "decoder": init_decoder_params(
                k2,
                config.language_model,
                t_cond_dim=config.ada_rms_norm_t_cond_dim or 32,
                dtype=dtype,
                vocab_size=vocab_size,
            ),
            "adapter": init_adapter_params(
                k3,
                config.adapter.input_dim,
                config.language_model.dim,
                config.adapter.output_dim,
                dtype,
            ),
        }
        return cls(params, config, mesh=mesh)

    # -- API ----------------------------------------------------------------

    def t_embed(self, delay_tokens: float = 6.0) -> jax.Array:
        emb = time_embedding(delay_tokens, self.config.language_model.dim)
        return jnp.asarray(emb, dtype=self.compute_dtype)

    def _cast_mel(self, mel) -> jax.Array:
        return jnp.asarray(mel).astype(self.compute_dtype)

    def _pad_dp_rows(self, mel_batch):
        """Pad the batch with silence rows to a multiple of the mesh's
        data axis (the DP shard_map needs B % dp == 0); the padded rows'
        tokens are trimmed by the caller.  Returns (mel, real_batch)."""
        b = mel_batch.shape[0]
        if self.parallel is None or self.parallel.dp <= 1:
            return mel_batch, b
        pad = (-b) % self.parallel.dp
        if pad == 0:
            return mel_batch, b
        return (
            jnp.concatenate(
                [mel_batch,
                 jnp.zeros((pad, *mel_batch.shape[1:]), mel_batch.dtype)],
                axis=0,
            ),
            b,
        )

    def encode_audio(self, mel: jax.Array) -> jax.Array:
        with span("encode_audio", mel_frames=int(mel.shape[-1])):
            return self._encode(self.params, self._cast_mel(mel))

    def forward(self, mel: jax.Array, t_embed: jax.Array) -> jax.Array:
        return self._forward(self.params, self._cast_mel(mel), t_embed)

    def forward_streaming(
        self, mel: jax.Array, token_ids: jax.Array, t_embed: jax.Array
    ) -> jax.Array:
        return self._forward_streaming(
            self.params, self._cast_mel(mel), jnp.asarray(token_ids), t_embed
        )

    # -- incremental / cache-level API (parity with voxtral.rs:216-269) ----

    def create_encoder_cache(self, max_seq: int) -> KVCache:
        from voxtral_tpu.models.encoder import create_encoder_cache

        return create_encoder_cache(
            self.config.audio_encoder, 1, max_seq, self.cache_dtype
        )

    def create_decoder_cache(self, max_seq: int) -> KVCache:
        from voxtral_tpu.models.decoder import create_cache

        return create_cache(self.config.language_model, 1, max_seq,
                            self.cache_dtype)

    def encode_audio_with_cache(
        self, mel: jax.Array, encoder_cache: KVCache
    ) -> tuple[jax.Array, KVCache]:
        """Chunk-incremental encode (reference voxtral.rs:216-224)."""
        from voxtral_tpu.models.encoder import encoder_forward_with_cache

        hidden, cache = encoder_forward_with_cache(
            self.params["encoder"], self._cast_mel(mel), encoder_cache,
            self.config.audio_encoder,
        )
        reshaped = reshape_encoder_output(hidden, self.config.downsample_factor)
        return adapter_forward(self.params["adapter"], reshaped), cache

    def forward_with_cache(
        self,
        mel: jax.Array,
        t_embed: jax.Array,
        encoder_cache: KVCache,
        decoder_cache: KVCache,
    ) -> tuple[jax.Array, KVCache, KVCache]:
        """Incremental full forward -> logits (voxtral.rs:236-248)."""
        audio, encoder_cache = self.encode_audio_with_cache(mel, encoder_cache)
        hidden, decoder_cache = decoder_forward_hidden_with_cache(
            self.params["decoder"], audio, t_embed, decoder_cache,
            self.config.language_model,
        )
        return lm_head(self.params["decoder"], hidden), encoder_cache, decoder_cache

    def generate_step_with_cache(
        self, token_ids: jax.Array, t_embed: jax.Array, decoder_cache: KVCache
    ) -> tuple[jax.Array, KVCache]:
        """Autoregressive step over token ids (voxtral.rs:259-269)."""
        text = embed_tokens(self.params["decoder"], jnp.asarray(token_ids))
        hidden, decoder_cache = decoder_forward_hidden_with_cache(
            self.params["decoder"], text, t_embed, decoder_cache,
            self.config.language_model,
        )
        return lm_head(self.params["decoder"], hidden), decoder_cache

    def decoder_seq_len(self, mel_frames: int) -> int:
        """Decoder positions for a mel length: floor(floor(T/4)/4) on even T."""
        t1 = (mel_frames + 1) // 2
        t2 = (t1 + 1) // 2
        return t2 // self.config.downsample_factor

    def transcribe_streaming(
        self, mel: jax.Array, delay_tokens: float = 6.0,
        temperature: float = 0.0, top_k: int = 0, seed: int = 0,
        speculative: int = 0, draft: str = "ngram",
    ) -> np.ndarray:
        """Transcription of one mel chunk -> int32 token IDs.

        Greedy by default (reference semantics); ``temperature`` > 0
        switches the on-device scan to temperature/top-k sampling
        (beyond parity — the argmax site is the only difference).
        ``speculative=K >= 2`` (greedy only) verifies K drafted tokens
        per weight pass — EXACT greedy tokens, fewer decode passes when
        the draft hits (see :func:`transcribe_streaming_fn`).
        Returns the generated tokens after the 38-token prefix (control
        tokens included, exactly like the reference's Vec<i32>).
        """
        mel = self._cast_mel(mel)
        seq = self.decoder_seq_len(mel.shape[-1])
        if seq < PREFIX_LEN + 1:
            return np.zeros((0,), dtype=np.int32)
        t_embed = self.t_embed(delay_tokens)
        fn = self._get_transcribe(temperature, top_k, speculative, draft)
        mel, real_b = self._pad_dp_rows(mel)
        with span("transcribe_streaming", mel_frames=int(mel.shape[-1]),
                  tokens=seq - PREFIX_LEN):
            tokens = fn(
                self.params, mel, t_embed, fused=self._transcribe_fused,
                seed=seed,
            )
            return np.asarray(jax.device_get(tokens))[0]

    def transcribe_streaming_batch_async(
        self, mel_batch: jax.Array, delay_tokens: float = 6.0,
        speculative: int = 0, draft: str = "ngram",
    ):
        """Dispatch a batched transcription WITHOUT fetching the result.

        Returns a device array (or a host zeros array for too-short mels);
        fetch with ``np.asarray``.  Lets callers enqueue several chunk
        groups back-to-back and overlap the dispatch roundtrips.
        """
        mel_batch = self._cast_mel(mel_batch)
        if self.decoder_seq_len(mel_batch.shape[-1]) < PREFIX_LEN + 1:
            return np.zeros((mel_batch.shape[0], 0), dtype=np.int32)
        t_embed = self.t_embed(delay_tokens)
        mel_batch, real_b = self._pad_dp_rows(mel_batch)
        fn = (self._get_transcribe(0.0, 0, speculative, draft)
              if speculative >= 2 else self._transcribe)
        tokens = fn(
            self.params, mel_batch, t_embed, fused=self._transcribe_fused
        )
        return tokens[:real_b] if real_b != tokens.shape[0] else tokens

    def _get_transcribe_samples(self, mel_cfg, temperature: float = 0.0,
                                top_k: int = 0, speculative: int = 0,
                                draft: str = "ngram"):
        """Jitted fused-frontend transcribe (samples -> tokens), cached."""
        key = ("samples", mel_cfg.n_fft, mel_cfg.hop_length,
               mel_cfg.log_mel_max, float(temperature), int(top_k),
               int(speculative), draft)
        if key not in self._transcribe_jits:
            self._transcribe_jits[key] = jax.jit(
                partial(transcribe_from_samples_fn, cfg=self.config,
                        n_fft=mel_cfg.n_fft, hop=mel_cfg.hop_length,
                        log_mel_max=mel_cfg.log_mel_max,
                        compute_dtype=self.compute_dtype,
                        cache_dtype=self.cache_dtype,
                        mk_interpret=self._mk_interpret,
                        temperature=float(temperature), top_k=int(top_k),
                        parallel=self.parallel,
                        speculative=int(speculative), draft=draft)
            )
        return self._transcribe_jits[key]

    def transcribe_streaming_batch_samples_async(
        self, samples: jax.Array, mel_spec, delay_tokens: float = 6.0,
        speculative: int = 0, draft: str = "ngram",
    ):
        """Fused-frontend batched transcription dispatch (no fetch).

        ``samples`` [B, N] f32, already reference-padded (76 left /
        align+17 right) and bucketed; ``mel_spec`` a
        :class:`~voxtral_tpu.audio.MelSpectrogram`.  The log-mel frontend
        runs INSIDE the jitted program (one dispatch, one fetch) — see
        :func:`transcribe_from_samples_fn`.
        """
        samples = jnp.asarray(samples, jnp.float32)
        t = mel_spec.num_frames(samples.shape[-1])
        if self.decoder_seq_len(t) < PREFIX_LEN + 1:
            return np.zeros((samples.shape[0], 0), dtype=np.int32)
        t_embed = self.t_embed(delay_tokens)
        window, basis = mel_spec.device_arrays()
        samples, real_b = self._pad_dp_rows(samples)
        fn = self._get_transcribe_samples(mel_spec.config,
                                          speculative=speculative,
                                          draft=draft)
        tokens = fn(
            self.params, samples, window, basis, t_embed,
            fused=self._transcribe_fused,
        )
        return tokens[:real_b] if real_b != tokens.shape[0] else tokens

    def transcribe_streaming_batch(
        self, mel_batch: jax.Array, delay_tokens: float = 6.0,
        speculative: int = 0, draft: str = "ngram",
    ) -> np.ndarray:
        """Batched greedy transcription of B equal-length mel chunks.

        mel_batch: [B, n_mels, T] -> int32 tokens [B, S - PREFIX_LEN].
        The pipeline uses this to decode all equal-length chunks of a
        file in one on-device scan.
        """
        return np.asarray(
            jax.device_get(
                self.transcribe_streaming_batch_async(
                    mel_batch, delay_tokens, speculative=speculative,
                    draft=draft)
            )
        )
