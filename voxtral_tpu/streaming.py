"""Real-time incremental transcription.

The reference exposes incremental building blocks
(``encode_audio_with_cache`` / ``forward_with_cache``,
voxtral.rs:216-269) but its CLI and browser demo transcribe whole
recordings.  :class:`StreamingSession` goes further: audio is fed in
arbitrary-sized pieces and text comes back with the model's native delay
(~(delay+1) x 160 ms behind real time), with every step a fixed-shape jitted
program so the steady state never recompiles.

Boundary-exactness: each step recomputes the conv over an overlapping mel
window (the stride-2 k=3 p=1 conv pair needs 3 mel frames of lookahead and
3 of lookback — conv frame j depends on mel[4j-3 .. 4j+3]), and each mel
window carries 4 frames of STFT margin, so the streamed encoder input is
bit-identical to the batch computation.  Token-for-token equivalence with
``transcribe_streaming`` is tested in ``tests/test_streaming.py``.

Step layout (P = ``step_positions`` decoder positions per step):

    samples -- mel window --> conv --> [4P enc frames] --encoder cache-->
    reshape(4) --> adapter --> [P audio embeds] --decoder cache + scan-->
    P greedy tokens

The 76-token silence left-pad is prepended automatically (pad.rs
semantics), which exactly covers the 38-position prefill.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from voxtral_tpu.audio.mel import MelSpectrogram
from voxtral_tpu.audio.pad import PadConfig
from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.models.adapter import adapter_forward, reshape_encoder_output
from voxtral_tpu.models.decoder import (
    DECODER_ROPE_MAX_SEQ,
    create_cache,
    decoder_forward_hidden_with_cache,
    embed_tokens,
    lm_head,
)
from voxtral_tpu.models.encoder import create_encoder_cache, encoder_layers_with_cache
from voxtral_tpu.models.layers import KVCache, conv_downsample, rope_tables
from voxtral_tpu.models.voxtral import (
    PREFIX_LEN,
    VoxtralModel,
    append_rows,
    make_prefix_ids,
    ngram_drafts,
    ngram_table_init,
)
from voxtral_tpu.tokenizer import STREAMING_PAD, VoxtralTokenizer
from voxtral_tpu.utils.profiling import span

Params = dict[str, Any]

MEL_HOP = 160
MEL_MARGIN = 4  # STFT frames of margin so window-interior frames are exact
SAMPLES_PER_POSITION = 2560  # 16 mel frames
# S-chunk size for the HBM-chunked cache attention (decode_stack_step
# cache_chunk=): pool caches round up to a multiple of this.
CACHE_CHUNK = 512


def _mel_frames_needed(last_frame: int) -> int:
    """Samples required so mel frames [0, last_frame) are computable."""
    return MEL_HOP * (last_frame - 1) + 200 + MEL_HOP


# Speculative-decode helpers shared with the one-shot transcribe path
# (models/voxtral.py owns them; streaming keeps the historical names).
_ngram_table_init = ngram_table_init
_ngram_drafts = ngram_drafts


def _decode_scan(params, audio_inputs, prev_token, dec_cache, t_embed, cfg,
                 rope, dec_base=0, ring=None):
    """Greedy-decode len(audio_inputs) tokens with the decoder cache.

    audio_inputs: [1, P, D] — audio embeds for input positions
    p0-1 .. p0+P-2 (the input for token p is audio[p-1] + embed(token[p-1])).
    """

    def step(carry, i):
        prev, cache = carry
        a = jax.lax.dynamic_slice_in_dim(audio_inputs, i, 1, axis=1)
        text = embed_tokens(params["decoder"], prev[None, None])
        hidden, cache = decoder_forward_hidden_with_cache(
            params["decoder"], a + text, t_embed, cache, cfg.language_model,
            rope, dec_base, ring,
        )
        logits = lm_head(params["decoder"], hidden)
        token = jnp.argmax(logits[0, 0, :], axis=-1).astype(jnp.int32)
        return (token, cache), token

    n = audio_inputs.shape[1]
    (last, dec_cache), tokens = jax.lax.scan(
        step, (prev_token, dec_cache), jnp.arange(n, dtype=jnp.int32)
    )
    return tokens, last, dec_cache


def _encode_window(params, mel_win, enc_cache, cfg, enc_rope, n_frames: int,
                   enc_base=0, enc_ring=None):
    """Conv over an overlapping mel window; append exactly ``n_frames``
    encoder frames (local conv frames [1, 1+n_frames) — interior, so no
    boundary effect).  Returns (audio_embeds [1, n_frames//4, D], cache)."""
    x = conv_downsample(mel_win, params["encoder"]["conv"])  # [1, D, W/4]
    x = jnp.swapaxes(x, 1, 2)[:, 1 : 1 + n_frames, :]
    hidden, enc_cache = encoder_layers_with_cache(
        params["encoder"], x, enc_cache, cfg.audio_encoder, enc_rope,
        enc_base, enc_ring,
    )
    reshaped = reshape_encoder_output(hidden, cfg.downsample_factor)
    return adapter_forward(params["adapter"], reshaped), enc_cache


def _init_step_fn(params, mel0, t_embed, cfg, enc_rope, dec_rope,
                  enc_cache, dec_cache, n_positions: int,
                  enc_ring=None, dec_ring=None):
    """First step: encoder frames [0, 4*n_positions), prefill 38 positions,
    decode positions 38..n_positions-1.  mel0 covers frames
    [0, 16*n_positions + 8) so the LAST conv frame has its lookahead."""
    x = conv_downsample(mel0, params["encoder"]["conv"])
    x = jnp.swapaxes(x, 1, 2)[:, : 4 * n_positions, :]
    if enc_ring is None:
        hidden, enc_cache = encoder_layers_with_cache(
            params["encoder"], x, enc_cache, cfg.audio_encoder, enc_rope
        )
    else:
        # Ring caches need single-region writes: the first 4*PREFIX_LEN
        # frames land in the permanent head, the remainder starts the ring
        # (sequential cached calls are exactly equivalent to one call).
        head = enc_ring[0]
        h1, enc_cache = encoder_layers_with_cache(
            params["encoder"], x[:, :head, :], enc_cache, cfg.audio_encoder,
            enc_rope, 0, enc_ring,
        )
        h2, enc_cache = encoder_layers_with_cache(
            params["encoder"], x[:, head:, :], enc_cache, cfg.audio_encoder,
            enc_rope, 0, enc_ring,
        )
        hidden = jnp.concatenate([h1, h2], axis=1)
    audio = adapter_forward(
        params["adapter"], reshape_encoder_output(hidden, cfg.downsample_factor)
    )  # [1, n_positions, D]

    prefix_ids = jnp.asarray(make_prefix_ids())[None, :]
    prefix_inputs = audio[:, :PREFIX_LEN, :] + embed_tokens(
        params["decoder"], prefix_ids
    )
    hidden, dec_cache = decoder_forward_hidden_with_cache(
        params["decoder"], prefix_inputs, t_embed, dec_cache,
        cfg.language_model, dec_rope, 0, dec_ring,
    )
    first_logits = lm_head(params["decoder"], hidden[:, -1:, :])
    first_token = jnp.argmax(first_logits[0, 0, :], axis=-1).astype(jnp.int32)

    # Decode positions 39..n_positions-1 (inputs 38..n_positions-2).
    rest, last, dec_cache = _decode_scan(
        params, audio[:, PREFIX_LEN:-1, :], first_token, dec_cache,
        t_embed, cfg, dec_rope, 0, dec_ring,
    )
    tokens = jnp.concatenate([first_token[None], rest])
    prev_audio = audio[:, -1:, :]
    return tokens, last, prev_audio, enc_cache, dec_cache


def _stream_step_fn(params, mel_win, prev_token, prev_audio, t_embed,
                    enc_base, dec_base, cfg,
                    enc_rope, dec_rope, enc_cache, dec_cache, n_positions: int,
                    enc_ring=None, dec_ring=None):
    """Steady-state step: P more positions.  mel_win covers mel frames
    [16*p0 - 4, 16*(p0+P) + 4) (length 16P + 8).  ``enc_base``/``dec_base``
    are the absolute positions of cache slot 0 (always 0 in ring mode)."""
    audio, enc_cache = _encode_window(
        params, mel_win, enc_cache, cfg, enc_rope, 4 * n_positions, enc_base,
        enc_ring,
    )  # [1, P, D] — positions p0..p0+P-1
    inputs = jnp.concatenate([prev_audio, audio[:, :-1, :]], axis=1)
    tokens, last, dec_cache = _decode_scan(
        params, inputs, prev_token, dec_cache, t_embed, cfg, dec_rope,
        dec_base, dec_ring,
    )
    return tokens, last, audio[:, -1:, :], enc_cache, dec_cache


def _stream_step_fused_fn(params, fused_w, ada_vecs, mel_win, prev_token,
                          prev_audio, enc_base, cfg, enc_rope, enc_cache,
                          dec_cache, n_positions: int,
                          enc_ring=None, dec_ring=None, fold=False,
                          mk_interpret=False, tp_mesh=None):
    """Steady-state step with the decode half in the whole-stack Pallas
    kernel (solo session, B=1).  ``dec_cache`` is HEAD-MAJOR
    ([L, 1, Hkv, S, hd]); ``dec_ring`` selects the in-kernel head+ring
    validity mask (layers.ring_k_positions semantics) for unbounded
    streams.  Token-identical to the XLA path (tests/test_streaming.py).
    ``tp_mesh``: run the decode through the tensor-parallel half-kernels
    + vocab-sharded lm fold instead of the single-chip stack kernel
    (``fused_w`` is then the model's ``fused_tp`` dict)."""
    from voxtral_tpu.models.layers import ring_slot, rms_norm
    from voxtral_tpu.ops.decode_step_pallas import (
        decode_stack_step,
        rope_pair_vectors,
    )

    lmc = cfg.language_model
    audio, enc_cache = _encode_window(
        params, mel_win, enc_cache, cfg, enc_rope, 4 * n_positions, enc_base,
        enc_ring,
    )  # [1, P, D]
    inputs = jnp.concatenate([prev_audio, audio[:, :-1, :]], axis=1)
    lm_kw = _fused_lm_kwargs(params, fold and tp_mesh is None,
                             fused_w)

    def dstep(carry, i):
        prev, dk, dv, off = carry
        a = jax.lax.dynamic_slice_in_dim(inputs, i, 1, axis=1)[:, 0]
        text = embed_tokens(params["decoder"], prev[None, None])[:, 0]
        x = (a + text).astype(jnp.float32)
        cos, sin = rope_pair_vectors(off, lmc.head_dim, lmc.rope_theta)
        if tp_mesh is not None:
            from voxtral_tpu.ops.decode_tp_pallas import (
                tp_decode_step,
                tp_lm_head_token,
            )

            xo, k_new, v_new = tp_decode_step(
                tp_mesh, x, off,
                fused_w["attn_norm"], fused_w["ffn_norm"], ada_vecs,
                fused_w, cos, sin, dk, dv,
                n_heads=lmc.n_heads, n_kv=lmc.n_kv_heads,
                head_dim=lmc.head_dim, eps=lmc.norm_eps,
                interpret=mk_interpret, window=lmc.sliding_window,
                ring=dec_ring,
            )
            if fold:
                token = tp_lm_head_token(
                    tp_mesh, xo, params["decoder"]["norm"],
                    fused_w["lm_codes"], fused_w["lm_scale"],
                    eps=lmc.norm_eps, interpret=mk_interpret)[0]
            else:
                hidden = rms_norm(xo, params["decoder"]["norm"],
                                  lmc.norm_eps)
                logits = lm_head(params["decoder"], hidden, xla_only=True)
                token = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
            slot = (ring_slot(off, *dec_ring) if dec_ring is not None
                    else off)
            z = jnp.zeros((), jnp.int32)
            dk = jax.lax.dynamic_update_slice(
                dk, k_new[:, :, :, None].astype(dk.dtype),
                (z, z, z, slot, z))
            dv = jax.lax.dynamic_update_slice(
                dv, v_new[:, :, :, None].astype(dv.dtype),
                (z, z, z, slot, z))
            return (token, dk, dv, off + 1), token
        out = decode_stack_step(
            x, off,
            fused_w["attn_norm"], fused_w["ffn_norm"], ada_vecs,
            fused_w["sqkv"], fused_w["so"], fused_w["s13"], fused_w["s2"],
            cos, sin, dk, dv,
            fused_w["wqkv"], fused_w["wo"], fused_w["w13"], fused_w["w2"],
            n_heads=lmc.n_heads, n_kv=lmc.n_kv_heads,
            head_dim=lmc.head_dim, eps=lmc.norm_eps,
            interpret=mk_interpret, window=lmc.sliding_window,
            ring=dec_ring, **lm_kw,
        )
        if fold:
            _, k_new, v_new, logits = out
        else:
            xo, k_new, v_new = out
            hidden = rms_norm(xo, params["decoder"]["norm"], lmc.norm_eps)
            logits = lm_head(params["decoder"], hidden)
        token = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
        slot = (ring_slot(off, *dec_ring) if dec_ring is not None else off)
        z = jnp.zeros((), jnp.int32)
        dk = jax.lax.dynamic_update_slice(
            dk, k_new[:, :, :, None].astype(dk.dtype), (z, z, z, slot, z))
        dv = jax.lax.dynamic_update_slice(
            dv, v_new[:, :, :, None].astype(dv.dtype), (z, z, z, slot, z))
        return (token, dk, dv, off + 1), token

    (last, dk, dv, off), tokens = jax.lax.scan(
        dstep,
        (prev_token, dec_cache.k, dec_cache.v, dec_cache.length),
        jnp.arange(n_positions, dtype=jnp.int32))
    dec_cache = KVCache(dk, dv, off)
    return tokens, last, audio[:, -1:, :], enc_cache, dec_cache


def _stream_step_spec_fn(params, fused_w, ada_vecs, mel_win, prev_token,
                         prev_audio, enc_base, cfg, enc_rope, enc_cache,
                         dec_cache, n_positions: int, spec_k: int,
                         enc_ring=None, dec_ring=None, fold=False,
                         mk_interpret=False, draft_token=STREAMING_PAD,
                         tp_mesh=None, draft_table=None, spec_stats=None):
    """Speculative steady-state step (solo session, B=1): each while-loop
    iteration verifies ``spec_k`` drafted tokens in ONE stack-kernel
    weight pass (``decode_stack_step(spec=K)``) and advances by the
    accepted count — EXACT greedy tokens regardless of draft quality
    (the draft only moves throughput; token identity pinned in
    tests/test_spec_decode.py).  Draft policies:

    * pad (``draft_table=None``) — all-``[STREAMING_PAD]`` drafts (the
      model emits 32 for silence, the dominant streaming regime), so
      silence decodes at up to K tokens per weight pass at unchanged
      pass latency — the pass is weight-stream-bound.
    * ngram (``draft_table`` = ``_ngram_table_init`` array) — chained
      bigram drafts from the device-resident table, which every
      verification pass trains in place (table[d_j] := y_j; all K rows
      are model-verified continuations).  Covers repetition during
      SPEECH too — e.g. a model that settles into any per-token cycle
      gets K tokens/pass once the table has seen the cycle — and
      degenerates to the pad policy while untrained.

    Worst case (zero acceptance) degrades to 1 token/pass = exactly the
    non-speculative cost.  ``spec_stats`` [2] int32 (passes, accepted
    rows) accumulates on device across steps — fetch-free acceptance
    counters for /metrics.  ``tp_mesh``: run each verification pass
    through the spec-capable TP half-kernels + the vocab-sharded lm
    fold (K query rows per shard, weight traffic /tp) instead of the
    single-chip stack kernel."""
    from voxtral_tpu.models.layers import ring_slot, rms_norm
    from voxtral_tpu.ops.decode_step_pallas import (
        decode_stack_step,
        rope_pair_vectors,
    )

    lmc = cfg.language_model
    P, K = n_positions, spec_k
    audio, enc_cache = _encode_window(
        params, mel_win, enc_cache, cfg, enc_rope, 4 * P, enc_base,
        enc_ring,
    )
    inputs = jnp.concatenate([prev_audio, audio[:, :-1, :]], axis=1)
    # Pad so the K-row slice at pos = P-1 stays in bounds; the padded
    # rows' outputs are never accepted (n_acc is clamped to P - pos).
    inputs = jnp.concatenate(
        [inputs, jnp.tile(inputs[:, -1:, :], (1, K - 1, 1))], axis=1)
    lm_kw = _fused_lm_kwargs(params, fold and tp_mesh is None,
                             fused_w)

    ngram = draft_table is not None

    def body(st):
        pos, prev, dk, dv, off, toks, table, stats = st
        a = jax.lax.dynamic_slice_in_dim(inputs, pos, K, axis=1)[0]
        if ngram:
            drafts = _ngram_drafts(table, prev, K)
        else:
            drafts = jnp.concatenate(
                [prev[None], jnp.full((K - 1,), draft_token, jnp.int32)])
        text = embed_tokens(params["decoder"], drafts[None])[0]
        x = (a + text).astype(jnp.float32)  # [K, D] rows (stream 0, j)
        cs = [rope_pair_vectors(off + j, lmc.head_dim, lmc.rope_theta)
              for j in range(K)]
        cos_r = jnp.stack([c for c, _ in cs])
        sin_r = jnp.stack([s for _, s in cs])
        if tp_mesh is not None:
            from voxtral_tpu.ops.decode_tp_pallas import (
                tp_decode_step,
                tp_lm_head_token,
            )

            xo, k_new, v_new = tp_decode_step(
                tp_mesh, x, off,
                fused_w["attn_norm"], fused_w["ffn_norm"], ada_vecs,
                fused_w, cos_r, sin_r, dk, dv,
                n_heads=lmc.n_heads, n_kv=lmc.n_kv_heads,
                head_dim=lmc.head_dim, eps=lmc.norm_eps,
                interpret=mk_interpret, window=lmc.sliding_window,
                ring=dec_ring, spec=K,
            )
            if fold:
                y = tp_lm_head_token(
                    tp_mesh, xo, params["decoder"]["norm"],
                    fused_w["lm_codes"], fused_w["lm_scale"],
                    eps=lmc.norm_eps,
                    interpret=mk_interpret).astype(jnp.int32)  # [K]
            else:
                hidden = rms_norm(xo, params["decoder"]["norm"],
                                  lmc.norm_eps)
                logits = lm_head(params["decoder"], hidden,
                                 xla_only=True)
                y = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            out = decode_stack_step(
                x, off,
                fused_w["attn_norm"], fused_w["ffn_norm"], ada_vecs,
                fused_w["sqkv"], fused_w["so"], fused_w["s13"],
                fused_w["s2"],
                cos_r, sin_r, dk, dv,
                fused_w["wqkv"], fused_w["wo"], fused_w["w13"],
                fused_w["w2"],
                n_heads=lmc.n_heads, n_kv=lmc.n_kv_heads,
                head_dim=lmc.head_dim, eps=lmc.norm_eps,
                interpret=mk_interpret, window=lmc.sliding_window,
                ring=dec_ring, spec=K, **lm_kw,
            )
            if fold:
                _, k_new, v_new, logits = out
            else:
                xo, k_new, v_new = out
                hidden = rms_norm(xo, params["decoder"]["norm"],
                                  lmc.norm_eps)
                logits = lm_head(params["decoder"], hidden)
            y = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [K]
        # Exact-greedy acceptance: y[j] is valid iff every earlier draft
        # matched its verified token; y[0] is always valid.
        match = (y[: K - 1] == drafts[1:]).astype(jnp.int32)
        n_acc = 1 + jnp.sum(jnp.cumprod(match))
        n_acc = jnp.minimum(n_acc, P - pos)
        # Append ALL K fresh K/V rows at positions off..off+K-1: rows
        # past the accepted count are invisible (validity masks slots
        # >= off) and are overwritten by later appends at the same
        # positions (ring slots map deterministically from position).
        z = jnp.zeros((), jnp.int32)
        for j in range(K):
            slot = (ring_slot(off + j, *dec_ring)
                    if dec_ring is not None else off + j)
            kj = k_new[:, j][:, None, :, None, :].astype(dk.dtype)
            vj = v_new[:, j][:, None, :, None, :].astype(dv.dtype)
            dk = jax.lax.dynamic_update_slice(dk, kj, (z, z, z, slot, z))
            dv = jax.lax.dynamic_update_slice(dv, vj, (z, z, z, slot, z))
        toks = jax.lax.dynamic_update_slice(toks, y, (pos,))
        prev = jnp.take(y, n_acc - 1)
        if ngram:
            # Train the table on every verified row: y[j] IS the model's
            # greedy continuation of drafts[j] in row j's context.
            table = table.at[drafts].set(y)
        stats = stats + jnp.stack(
            [jnp.ones((), jnp.int32), n_acc])
        return (pos + n_acc, prev, dk, dv, off + n_acc, toks, table,
                stats)

    toks0 = jnp.zeros((P + K - 1,), jnp.int32)
    table0 = (draft_table if ngram
              else jnp.zeros((1,), jnp.int32))
    stats0 = (spec_stats if spec_stats is not None
              else jnp.zeros((2,), jnp.int32))
    st = (jnp.zeros((), jnp.int32), prev_token,
          dec_cache.k, dec_cache.v, dec_cache.length, toks0, table0,
          stats0)
    st = jax.lax.while_loop(lambda s: s[0] < P, body, st)
    _, last, dk, dv, off, toks, table, stats = st
    dec_cache = KVCache(dk, dv, off)
    return (toks[:P], last, audio[:, -1:, :], enc_cache, dec_cache,
            table if ngram else None, stats)


_STEP_JIT_CACHE: "dict" = {}
_STEP_JIT_CACHE_MAX = 16  # FIFO-evicted; live sessions keep their refs


def _jit_cache_put(key, value):
    if len(_STEP_JIT_CACHE) >= _STEP_JIT_CACHE_MAX:
        _STEP_JIT_CACHE.pop(next(iter(_STEP_JIT_CACHE)))
    _STEP_JIT_CACHE[key] = value
    return value


def _session_jits(cfg: VoxtralConfig, P: int, enc_ring, dec_ring,
                  rope_positions: int, fold: bool, mk_interpret: bool,
                  tp_mesh=None, spec: int = 0,
                  draft_token: int = STREAMING_PAD):
    """Jitted (init, step, fused_step) + rope tables for a session
    geometry, shared ACROSS sessions.

    A fresh ``jax.jit(partial(...))`` per session would re-trace and
    re-hit the compile cache on every session construction (seconds per
    session on TPU); everything these programs close over is
    weight-independent (config + rope tables), so sessions with the
    same geometry share one set of compiled programs — weights/caches
    are ordinary call arguments.  The step programs DONATE their cache
    arguments: a backlogged pump enqueues many steps without a host
    sync, and donation keeps the in-flight cache generations bounded
    (the init program is shared with StreamPool, which reuses a zero
    cache across slot inits — it must NOT donate).  fold/mk_interpret
    only affect the fused step, so init/step sharing is keyed without
    them (a pool and solo sessions that disagree on fold still share)."""
    base_key = (dataclasses.astuple(cfg), P, enc_ring, dec_ring,
                rope_positions)
    base = _STEP_JIT_CACHE.get(("base", base_key))
    if base is None:
        enc, lm = cfg.audio_encoder, cfg.language_model
        enc_rope = rope_tables(enc.head_dim, 4 * rope_positions,
                               enc.rope_theta)
        dec_rope = rope_tables(lm.head_dim, rope_positions, lm.rope_theta)
        init = jax.jit(partial(_init_step_fn, cfg=cfg, enc_rope=enc_rope,
                               dec_rope=dec_rope, n_positions=PREFIX_LEN + P,
                               enc_ring=enc_ring, dec_ring=dec_ring))
        step = jax.jit(partial(_stream_step_fn, cfg=cfg, enc_rope=enc_rope,
                               dec_rope=dec_rope, n_positions=P,
                               enc_ring=enc_ring, dec_ring=dec_ring),
                       donate_argnames=("enc_cache", "dec_cache"))
        base = _jit_cache_put(("base", base_key),
                              (init, step, enc_rope, dec_rope))
    init, step, enc_rope, dec_rope = base

    fkey = ("fstep", base_key, fold, mk_interpret, tp_mesh, spec,
            draft_token)
    fstep = _STEP_JIT_CACHE.get(fkey)
    if fstep is None:
        if spec > 1:
            fstep = jax.jit(
                partial(_stream_step_spec_fn, cfg=cfg,
                        enc_rope=enc_rope, n_positions=P, spec_k=spec,
                        enc_ring=enc_ring, dec_ring=dec_ring,
                        fold=fold, mk_interpret=mk_interpret,
                        draft_token=draft_token, tp_mesh=tp_mesh),
                donate_argnames=("enc_cache", "dec_cache",
                                 "draft_table", "spec_stats"))
        else:
            fstep = jax.jit(
                partial(_stream_step_fused_fn, cfg=cfg,
                        enc_rope=enc_rope, n_positions=P,
                        enc_ring=enc_ring, dec_ring=dec_ring,
                        fold=fold, mk_interpret=mk_interpret,
                        tp_mesh=tp_mesh),
                donate_argnames=("enc_cache", "dec_cache"))
        fstep = _jit_cache_put(fkey, fstep)
    return init, step, fstep, enc_rope, dec_rope


def _fused_plan(model, batch: int, cache_s: int, itemsize: int = None,
                chunk: int = None, pool: bool = False, spec: int = 1):
    """Stack-kernel decode plan ({"w", "fold"}) for ``batch`` rows and a
    ``cache_s``-position cache, or None when the model lacks fused
    weights, the geometry doesn't tile, or the caches would blow the
    kernel's VMEM budget.  Shared by solo sessions and StreamPool so
    the fused-path selection can never diverge between them.
    ``itemsize=1`` evaluates the int8-KV-cache variant; ``chunk``
    evaluates the HBM-chunked cache variant (VMEM no longer bounds S).
    ``pool=True`` marks the StreamPool call site, which can run meshed
    variants (DP row sharding; TP half-kernels)."""
    par = getattr(model, "parallel", None)
    if par is not None and par.tp > 1:
        # Tensor-parallel fused decode (solo sessions AND pools): the
        # attn/ffn half-kernels under shard_map (ring-capable), greedy
        # tokens via the vocab-sharded lm fold.  The halves take the
        # same cache ladder as the single-chip stack kernel: int8 KV
        # (itemsize=1, per-vector scales) and/or the HBM-chunked cache.
        if getattr(model, "fused_tp", None) is None:
            return None
        if pool and par.dp > 1 and batch % par.dp:
            return None
        if spec > 1 and chunk:
            return None  # per-chunk requant groups can't be joined
        from voxtral_tpu.ops.decode_tp_pallas import (
            TP_VMEM_CAP,
            tp_vmem_need,
        )

        lm = model.config.language_model
        rows = batch // par.dp if pool and par.dp > 1 else batch
        if itemsize is None:
            itemsize = jnp.dtype(model.cache_dtype).itemsize
        need = tp_vmem_need(
            rows, cache_s, lm.dim,
            lm.n_heads, lm.n_kv_heads, lm.head_dim, lm.hidden_dim,
            par.tp, itemsize, cache_chunk=chunk, spec=spec,
            wg=getattr(model, "megakernel_weights", None) == "q4g")
        if need is None or need > TP_VMEM_CAP:
            return None
        return {"w": model.fused_tp, "tp": par.tp,
                "fold": "lm_codes" in model.fused_tp}
    if model.fused_decode is None:
        return None
    gate_batch = batch
    if par is not None:
        # A data-parallel mesh CAN run pooled fused decode: batch rows
        # shard over the data axis (dp_decode_stack_step) and the VMEM
        # gate sees the per-shard row count — the scaling lever past
        # the single-chip pool ceiling.  DP meshes the batch doesn't
        # divide ride the auto-partitioned XLA path: the fused stacks
        # are mesh-placed for transcribe and a pallas_call is opaque to
        # GSPMD.
        if not pool or par.dp <= 1 or batch % par.dp:
            return None
        gate_batch = batch // par.dp
    from voxtral_tpu.ops.decode_step_pallas import (
        STACK_VMEM_CAP,
        _lm_tile,
        stack_vmem_need,
        supports_stack_kernel,
    )

    lm = model.config.language_model
    bf16_w = isinstance(model.fused_decode.get("wqkv"), tuple)
    wg = (not bf16_w and model.fused_decode.get("sqkv") is not None
          and model.fused_decode["sqkv"].ndim == 4)
    witem = 2 if bf16_w else (1.125 if wg else 1)
    emb = model.params["decoder"]["tok_embeddings"]
    lm_w8 = (emb.get("w8") if isinstance(emb, dict) and not wg else None)
    if bf16_w:
        fold = (not isinstance(emb, dict)
                and _lm_tile(emb.shape[0], lm.dim, witem) is not None)
        vocab = emb.shape[0] if fold else None
    elif wg:
        lm_g = model.fused_decode.get("lm_codes")
        fold = (lm_g is not None
                and _lm_tile(lm_g.shape[1], lm.dim, witem) is not None)
        vocab = lm_g.shape[1] if fold else None
    else:
        fold = (lm_w8 is not None
                and _lm_tile(lm_w8["codes"].shape[0], lm.dim) is not None)
        vocab = lm_w8["codes"].shape[0] if fold else None
    if itemsize is None:
        itemsize = jnp.dtype(model.cache_dtype).itemsize
    need = stack_vmem_need(
        gate_batch, cache_s, lm.dim, lm.n_heads, lm.n_kv_heads,
        lm.head_dim, lm.hidden_dim, vocab,
        itemsize, cache_chunk=chunk, weight_itemsize=witem, spec=spec,
    )
    if (not supports_stack_kernel(lm, witem) or need is None
            or need > STACK_VMEM_CAP):
        return None
    return {"w": model.fused_decode, "fold": fold}


def _fused_lm_kwargs(params, fold: bool, fused_w=None):
    """kwargs folding final norm + tied lm_head (w8, dense bf16, or g32)
    into the kernel.  g32 fused dicts (exact-Q4_0 stacks,
    ops.decode_step_pallas.fuse_decode_weights_q4g) carry their own
    pre-transposed lm_codes/lm_scale."""
    if not fold:
        return {}
    if (fused_w is not None and fused_w.get("sqkv") is not None
            and not isinstance(fused_w.get("wqkv"), tuple)
            and fused_w["sqkv"].ndim == 4):
        return dict(
            final_norm=params["decoder"]["norm"],
            lm_codes=fused_w["lm_codes"],
            lm_scale=fused_w["lm_scale"],
        )
    emb = params["decoder"]["tok_embeddings"]
    if not isinstance(emb, dict):
        return dict(
            final_norm=params["decoder"]["norm"],
            lm_codes=emb.astype(jnp.bfloat16),
            lm_scale=None,
        )
    emb_w8 = emb["w8"]
    return dict(
        final_norm=params["decoder"]["norm"],
        lm_codes=emb_w8["codes"],
        lm_scale=emb_w8["scale"],
    )


def _append_scales(arr, new, offs):
    """Per-row scale append: write ``new`` [L, B, H] at position
    ``offs[b]`` along the S axis of ``arr`` [L, B, H, S]."""

    def one(a, n, o):  # a [L, H, S], n [L, H]
        z = jnp.zeros((), jnp.int32)
        return jax.lax.dynamic_update_slice(a, n[:, :, None], (z, z, o))

    return jax.vmap(one, in_axes=(1, 1, 0), out_axes=1)(arr, new, offs)


_append_rows = append_rows  # shared with models/voxtral.py's spec path


def _ring_remap(src: np.ndarray, head: int, src_size: int, dst_size: int,
                written: int) -> np.ndarray:
    """Re-lay a head+ring cache onto a different ring size.

    ``src`` is ``[..., head + src_size, ...]`` with the ring axis at -3
    (position axis of an ``[L, 1, S, H, hd]`` cache).  Position p >= head
    lives at slot ``head + (p - head) % size`` (models/layers.py
    ``ring_slot``).  Only the last ``min(src_size, dst_size)`` positions
    survive — both rings are at least window + P, so every position a
    future query's sliding window can reach is preserved; older target
    slots stay zero and are already outside every window.
    """
    out_shape = list(src.shape)
    out_shape[2] = head + dst_size
    dst = np.zeros(out_shape, src.dtype)
    dst[:, :, :head] = src[:, :, :head]
    lo = max(head, written - min(src_size, dst_size))
    ps = np.arange(lo, written)
    if ps.size:
        dst[:, :, head + (ps - head) % dst_size] = \
            src[:, :, head + (ps - head) % src_size]
    return dst


class StreamPool:
    """Coalesces concurrent streaming sessions into BATCHED decode steps.

    Decode is HBM-bound on the weights, so stepping B sessions in one
    vmapped program costs far less than B separate steps (measured:
    B=2 ~1.6x B=1).  The pool owns [B]-leading KV-cache arrays; sessions
    attach to free slots and their steady-state steps run together —
    sessions that are not ready for a step are masked by pointing their
    cache writes at a sacrificial trash slot and discarding their tokens,
    so mixed-progress pools stay correct (each slot keeps its own cache
    lengths and positions).

    When the model carries fused megakernel weights (W8 on TPU) and the
    pool geometry fits the stack kernel's VMEM budget, the decode half
    of each pooled step runs through ``decode_stack_step`` with PER-ROW
    cache offsets and RoPE positions — one Pallas kernel per token for
    the whole batch, each row masking its own cache validity — instead
    of the vmapped XLA layer chain (~2x decode-step cost).  The decoder
    caches are then held head-major ([L, B, Hkv, S, hd]).

    Beyond reference parity: the reference serializes whole requests on
    one wgpu queue (serve.mjs is static-only; native CLI is 1-stream).
    """

    def __init__(
        self,
        model: VoxtralModel,
        max_streams: int = 4,
        step_positions: int = 8,
        max_duration_s: float = 120.0,
        delay_tokens: float = 6.0,
        unbounded: bool = False,
        kv_dtype: str = "auto",
        speculative: int = 0,
        draft_token: int = STREAMING_PAD,
        draft: str = "pad",
    ):
        """``speculative=K >= 2``: every pooled decode pass verifies K
        drafted tokens PER SLOT in one stack-kernel weight pass
        (``decode_stack_step(spec=K)`` — rows (slot, draft) share the
        slot's cache); slots advance by their own accepted count, so a
        silence-heavy pool catches up at up to K positions per pass at
        unchanged pass latency.  Exact greedy tokens always.  Rides the
        resident cache ladder — model dtype or int8 KV (the kernel
        roundtrips fresh rows through the append quantization, so int8
        spec pools stay token-identical to sequential int8 pools); the
        HBM-chunked cache is refused (per-chunk requant groups).
        Scales over ANY mesh: data-parallel (whole streams per shard,
        zero collectives), tensor-parallel (the spec-capable attn/ffn
        half-kernels + the vocab-sharded lm fold over streams*K rows),
        and dp x tp (both at once).

        ``unbounded=True`` lays every slot's KV caches out as head+ring
        buffers (same in-kernel eviction as unbounded solo sessions), so
        pooled streams never hit ``max_duration_s`` — step time stays flat
        and a slot is bounded only by the RoPE tables (~43 min).  Masked
        (not-ready) slots then write their garbage K/V at their OWN next
        append position instead of a trash slot: that slot is either
        not-yet-valid (bounded semantics) or holds a position already
        outside the sliding window (ring size = window + granule), and the
        next real step overwrites it — so no sacrificial slots are needed
        and correctness is unchanged.  Closes the reference gap where its
        dynamic eviction (kv_cache.rs:176-203) never stops a stream."""
        self.model = model
        self.cfg = model.config
        self.B = max_streams
        self.P = step_positions
        self.max_duration_s = max_duration_s
        self.delay_tokens = delay_tokens
        self.unbounded = unbounded
        self.speculative = int(speculative or 0)
        self._draft_token = int(draft_token)
        if draft not in ("pad", "ngram"):
            raise ValueError(f"draft policy must be pad|ngram, got {draft}")
        self.draft = draft
        # One bigram draft table SHARED across slots (concurrent streams
        # usually speak the same language; cross-slot writes are benign
        # heuristics — exactness never depends on the draft).  Dummy
        # 1-entry table on the pad policy keeps the jitted arity fixed.
        self._draft_table = None
        self._spec_stats = None
        if self.speculative > 1:
            self._spec_stats = jnp.zeros((2,), jnp.int32)
            self._draft_table = (
                _ngram_table_init(self.cfg.language_model.vocab_size,
                                  self._draft_token)
                if draft == "ngram" else jnp.zeros((1,), jnp.int32))
        if self.speculative > self.P:
            raise ValueError(
                f"speculative={self.speculative} must be <= "
                f"step_positions={self.P}")
        lm, enc = self.cfg.language_model, self.cfg.audio_encoder
        if unbounded:
            gran = 4 * self.P
            dec_ring_sz = lm.sliding_window + self.P
            enc_ring_sz = -(-(enc.sliding_window + gran) // gran) * gran
            self._dec_ring = (PREFIX_LEN, dec_ring_sz)
            self._enc_ring = (4 * PREFIX_LEN, enc_ring_sz)
            self.max_dec = DECODER_ROPE_MAX_SEQ  # RoPE-table bound
            s_dec = PREFIX_LEN + dec_ring_sz
            s_enc = 4 * PREFIX_LEN + enc_ring_sz
            rope_positions = DECODER_ROPE_MAX_SEQ
        else:
            self._dec_ring = self._enc_ring = None
            self.max_dec = int(max_duration_s * 6.25) + PREFIX_LEN + 2 * self.P
            # +1 write granule of sacrificial slots for masked steps;
            # speculative passes can overshoot by up to 2K-2 further
            # (a just-finished slot keeps appending at its frozen
            # position + draft offsets until every slot reaches P).
            s_dec = self.max_dec + self.P + 2 * self.speculative
            s_enc = 4 * self.max_dec + 4 * self.P
            rope_positions = self.max_dec
        self.max_enc = 4 * self.max_dec
        cdt = model.cache_dtype
        shape_e = (self.B, enc.n_layers, 1, s_enc, enc.n_kv_heads, enc.head_dim)

        # Fused pooled decode: route the decode half of each pooled step
        # through the whole-stack Pallas kernel (per-row offsets/RoPE)
        # when the model has fused weights and the geometry fits VMEM.
        # kv_dtype: "model" = the model's cache dtype; "int8" = per-vector
        # int8 KV (halves the kernel's dominant VMEM term AND the HBM
        # cache — the lever for bigger pools / longer bounded sessions);
        # "auto" = model dtype if it fits the VMEM gate, else int8.
        self._mk_interpret = getattr(model, "_mk_interpret", False)
        self.cache_int8 = False
        self._cache_chunk = None
        # Candidate ladder per kv_dtype, each (itemsize, chunk): resident
        # first (fastest), then the HBM-chunked cache (removes the VMEM
        # bound on S entirely — big pools / long ring windows keep the
        # fused path; at long S the cache DMA dominates HBM, so chunked
        # prefers int8).  The cache length rounds up to the chunk size
        # (dead slots are masked in-kernel).
        if self.speculative > 1:
            # Spec rides the resident cache ladder (model dtype or int8
            # — the kernel's fresh-row roundtrip keeps int8 spec
            # token-identical to sequential int8) but not the
            # HBM-chunked cache (its per-chunk requant groups cannot be
            # joined exactly).
            ladder = {"model": [(None, None)], "int8": [(1, None)],
                      "auto": [(None, None), (1, None)]}.get(kv_dtype)
            if ladder is None:
                raise ValueError(
                    f"kv_dtype must be 'auto', 'model' or 'int8', got "
                    f"{kv_dtype!r}"
                )
        elif kv_dtype == "int8":
            ladder = [(1, None), (1, CACHE_CHUNK)]
        elif kv_dtype == "model":
            ladder = [(None, None), (None, CACHE_CHUNK)]
        elif kv_dtype == "auto":
            ladder = [(None, None), (1, None), (1, CACHE_CHUNK)]
        else:
            raise ValueError(
                f"kv_dtype must be 'auto', 'model' or 'int8', got "
                f"{kv_dtype!r}"
            )
        self._fused = None
        spec = max(1, self.speculative)
        for item, chunk in ladder:
            s_try = s_dec if chunk is None else -(-s_dec // chunk) * chunk
            p = _fused_plan(model, self.B * spec, s_try, itemsize=item,
                            chunk=chunk, pool=True, spec=spec)
            if p is not None:
                self._fused = p
                self.cache_int8 = item == 1
                self._cache_chunk = chunk
                s_dec = s_try
                if chunk is not None and unbounded:
                    # Grow the ring so head + size == the padded S: a
                    # ring larger than window+P is semantically fine
                    # (older-than-window entries are masked by the
                    # window bound), and the XLA init path's
                    # ring_k_positions arrays stay cache-sized.
                    self._dec_ring = (PREFIX_LEN, s_dec - PREFIX_LEN)
                break
        if self.speculative > 1:
            if self._fused is None:
                raise ValueError(
                    "speculative pools need the fused stack kernel "
                    "(w8/bf16 megakernel weights; geometry must fit "
                    "the VMEM budget at B*K query rows per shard)")
            par_ = getattr(model, "parallel", None)
            if par_ is not None and par_.dp > 1 and self.B % par_.dp:
                raise ValueError(
                    f"speculative meshed pools need max_streams "
                    f"({self.B}) divisible by the data axis "
                    f"({par_.dp}) so every stream's K draft rows "
                    f"shard with its cache")
        if self._fused is not None:
            from voxtral_tpu.ops.decode_step_pallas import ada_vectors

            self._fused["ada"] = ada_vectors(
                model.params["decoder"], model.t_embed(delay_tokens))
        # Meshed pooled decode: _fused_plan only returns a plan for a
        # meshed model when the geometry shards cleanly, so a non-None
        # plan + mesh means the decode half runs either the TP
        # half-kernels ("tp" in plan — weights sharded over model,
        # greedy tokens via the vocab-sharded lm fold) or
        # dp_decode_stack_step (rows/dp per chip — the scaling lever
        # past the single-chip pool ceiling; ROADMAP r3 #8).  DP and TP
        # compose: a (dp x tp) mesh also row-shards the TP halves.
        par = getattr(model, "parallel", None)
        self._tp_mesh = (par.mesh if self._fused is not None
                         and self._fused.get("tp") else None)
        self._dp_mesh = (par.mesh if self._fused is not None
                         and par is not None and self._tp_mesh is None
                         else None)
        self._pool_data_axis = (
            "data" if par is not None and par.dp > 1
            and self._tp_mesh is not None else None)

        # HBM admission: refuse geometries whose rings + weights exceed
        # the device (the XLA OOM they would hit at runtime is opaque;
        # measured ceiling: 16 unbounded int8 rings + w8 weights OOM a
        # v5e — utils/hbm.py, VERDICT r3 #6).  Computed from the EXACT
        # shapes allocated below.
        import math as _math

        from voxtral_tpu.utils.hbm import check_hbm

        cds = jnp.dtype(cdt).itemsize
        cache_bytes = 2 * _math.prod(shape_e) * cds
        if self._fused is not None:
            fitem = 1 if self.cache_int8 else cds
            cache_bytes += (2 * lm.n_layers * self.B * lm.n_kv_heads
                            * s_dec * lm.head_dim * fitem)
            if self.cache_int8:
                cache_bytes += (2 * lm.n_layers * self.B * lm.n_kv_heads
                                * s_dec * 4)
            cache_bytes += (2 * lm.n_layers * s_dec * lm.n_kv_heads
                            * lm.head_dim * cds)  # shared init-zero slot
        else:
            cache_bytes += (2 * self.B * lm.n_layers * s_dec
                            * lm.n_kv_heads * lm.head_dim * cds)
        dp = (par.dp if par is not None and self._tp_mesh is None
              and par.dp > 1 else 1)
        check_hbm(model, cache_bytes,
                  f"StreamPool(max_streams={self.B}, "
                  f"unbounded={unbounded}, kv_dtype={kv_dtype!r})",
                  rows=self.B, dp=dp)

        self.enc_k = jnp.zeros(shape_e, cdt)
        self.enc_v = jnp.zeros(shape_e, cdt)
        if self._fused is not None:
            # Head-major stacked layout for the stack kernel.
            shape_f = (lm.n_layers, self.B, lm.n_kv_heads, s_dec, lm.head_dim)
            fdt = jnp.int8 if self.cache_int8 else cdt
            self.dec_k = jnp.zeros(shape_f, fdt)
            self.dec_v = jnp.zeros(shape_f, fdt)
            if self.cache_int8:
                shape_s = (lm.n_layers, self.B, lm.n_kv_heads, s_dec)
                self.dec_ks = jnp.zeros(shape_s, jnp.float32)
                self.dec_vs = jnp.zeros(shape_s, jnp.float32)
            # Reusable zero per-slot cache for the (generic) init step.
            shape_i = (lm.n_layers, 1, s_dec, lm.n_kv_heads, lm.head_dim)
            self._init_dec_zero = KVCache(
                jnp.zeros(shape_i, cdt), jnp.zeros(shape_i, cdt),
                jnp.zeros((), jnp.int32),
            )
        else:
            shape_d = (self.B, lm.n_layers, 1, s_dec,
                       lm.n_kv_heads, lm.head_dim)
            self.dec_k = jnp.zeros(shape_d, cdt)
            self.dec_v = jnp.zeros(shape_d, cdt)
        self.prev_tok = jnp.zeros((self.B,), jnp.int32)
        self.prev_audio = jnp.zeros((1, 1, lm.dim), model.compute_dtype)
        self.prev_audio = jnp.tile(self.prev_audio[None], (self.B, 1, 1, 1))
        self._enc_rope = rope_tables(enc.head_dim, 4 * self.max_dec,
                                     enc.rope_theta)
        self._dec_rope = rope_tables(lm.head_dim, self.max_dec, lm.rope_theta)
        self._t_embed = model.t_embed(delay_tokens)
        self.sessions: list[Optional["StreamingSession"]] = [None] * self.B

        def _one_step(mel_win, prev_token, prev_audio, enc_k, enc_v, enc_len,
                      dec_k, dec_v, dec_len, params, t_embed):
            enc_cache = KVCache(enc_k, enc_v, enc_len)
            dec_cache = KVCache(dec_k, dec_v, dec_len)
            tokens, last, pa, enc_cache, dec_cache = _stream_step_fn(
                params, mel_win, prev_token, prev_audio, t_embed,
                jnp.int32(0), jnp.int32(0), self.cfg,
                self._enc_rope, self._dec_rope, enc_cache, dec_cache, self.P,
                enc_ring=self._enc_ring, dec_ring=self._dec_ring,
            )
            return tokens, last, pa, enc_cache.k, enc_cache.v, dec_cache.k, dec_cache.v

        def _pool_step(params, mel_wins, prev_tok, prev_audio, ready,
                       enc_k, enc_v, enc_len, dec_k, dec_v, dec_len, t_embed):
            out = jax.vmap(
                _one_step, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None, None)
            )(mel_wins, prev_tok, prev_audio, enc_k, enc_v, enc_len,
              dec_k, dec_v, dec_len, params, t_embed)
            tokens, last, pa, enc_k, enc_v, dec_k, dec_v = out
            # Not-ready slots keep their feedback state (their cache writes
            # went to the trash slots and their tokens are discarded).
            last = jnp.where(ready, last, prev_tok)
            pa = jnp.where(ready[:, None, None, None], pa, prev_audio)
            return tokens, last, pa, enc_k, enc_v, dec_k, dec_v

        def _pool_step_fused(params, fused_w, ada_vecs, mel_wins, prev_tok,
                             prev_audio, ready, enc_k, enc_v, enc_len,
                             dec_k, dec_v, dec_len, *dec_scales):
            """Pooled step with the decode half in ONE stack kernel per
            token (per-row cache offsets + RoPE positions).  With the
            int8 KV cache, ``dec_scales`` = (k_scales, v_scales) and the
            fresh K/V are per-vector-quantized at each append."""
            from voxtral_tpu.models.layers import rms_norm
            from voxtral_tpu.ops.decode_step_pallas import (
                decode_stack_step,
                quantize_kv,
                rope_pair_vectors,
            )

            lmc = self.cfg.language_model
            fold = self._fused["fold"]
            int8 = self.cache_int8

            def enc_one(mel_win, ek, ev, el, params):
                cache = KVCache(ek, ev, el)
                audio, cache = _encode_window(
                    params, mel_win, cache, self.cfg, self._enc_rope,
                    4 * self.P, 0, self._enc_ring,
                )
                return audio[0], cache.k, cache.v

            audio, enc_k, enc_v = jax.vmap(
                enc_one, in_axes=(0, 0, 0, 0, None)
            )(mel_wins, enc_k, enc_v, enc_len, params)  # audio [B, P, D]
            inputs = jnp.concatenate(
                [prev_audio[:, 0, :, :], audio[:, :-1, :]], axis=1)
            tp = self._tp_mesh is not None
            lm_kw = _fused_lm_kwargs(params, fold and not tp, fused_w)

            def dstep(carry, i):
                if int8:
                    prev, dk, dv, dks, dvs = carry
                    scale_kw = dict(k_scales=dks, v_scales=dvs)
                else:
                    prev, dk, dv = carry
                    scale_kw = {}
                offs = dec_len + i  # [B] per-row absolute positions
                a = jax.lax.dynamic_slice_in_dim(inputs, i, 1, axis=1)[:, 0]
                text = embed_tokens(params["decoder"], prev[:, None])[:, 0]
                x = (a + text).astype(jnp.float32)
                cos, sin = jax.vmap(
                    lambda p: rope_pair_vectors(
                        p, lmc.head_dim, lmc.rope_theta)
                )(offs)
                step_args = (
                    x, offs,
                    fused_w["attn_norm"], fused_w["ffn_norm"], ada_vecs,
                    fused_w["sqkv"], fused_w["so"], fused_w["s13"],
                    fused_w["s2"], cos, sin, dk, dv,
                    fused_w["wqkv"], fused_w["wo"], fused_w["w13"],
                    fused_w["w2"],
                )
                step_kw = dict(
                    n_heads=lmc.n_heads, n_kv=lmc.n_kv_heads,
                    head_dim=lmc.head_dim, eps=lmc.norm_eps,
                    interpret=self._mk_interpret,
                    window=lmc.sliding_window, ring=self._dec_ring,
                    cache_chunk=self._cache_chunk,
                    **scale_kw, **lm_kw,
                )
                if tp:
                    from voxtral_tpu.ops.decode_tp_pallas import (
                        tp_decode_step,
                        tp_lm_head_token,
                    )

                    xo, k_new, v_new = tp_decode_step(
                        self._tp_mesh, x, offs,
                        fused_w["attn_norm"], fused_w["ffn_norm"],
                        ada_vecs, fused_w, cos, sin, dk, dv,
                        data_axis=self._pool_data_axis, **step_kw)
                    if fold:
                        token = tp_lm_head_token(
                            self._tp_mesh, xo, params["decoder"]["norm"],
                            fused_w["lm_codes"], fused_w["lm_scale"],
                            eps=lmc.norm_eps,
                            interpret=self._mk_interpret,
                            data_axis=self._pool_data_axis)
                    else:
                        hidden = rms_norm(
                            xo, params["decoder"]["norm"], lmc.norm_eps)
                        logits = lm_head(params["decoder"], hidden,
                                         xla_only=True)
                        token = jnp.argmax(logits, axis=-1
                                           ).astype(jnp.int32)
                elif self._dp_mesh is not None:
                    from voxtral_tpu.parallel.dp_decode import (
                        dp_decode_stack_step,
                    )

                    out = dp_decode_stack_step(
                        self._dp_mesh, *step_args, **step_kw)
                else:
                    out = decode_stack_step(*step_args, **step_kw)
                if not tp:
                    if fold:
                        _, k_new, v_new, logits = out
                    else:
                        xo, k_new, v_new = out
                        hidden = rms_norm(
                            xo, params["decoder"]["norm"], lmc.norm_eps)
                        logits = lm_head(params["decoder"], hidden,
                                         xla_only=self._dp_mesh
                                         is not None)
                    token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                if self._dec_ring is not None:
                    from voxtral_tpu.models.layers import ring_slot

                    slots = jax.vmap(
                        lambda o: ring_slot(o, *self._dec_ring))(offs)
                else:
                    slots = offs
                if int8:
                    kq, ksc = quantize_kv(k_new)
                    vq, vsc = quantize_kv(v_new)
                    dk = _append_rows(dk, kq, slots)
                    dv = _append_rows(dv, vq, slots)
                    dks = _append_scales(dks, ksc, slots)
                    dvs = _append_scales(dvs, vsc, slots)
                    return (token, dk, dv, dks, dvs), token
                dk = _append_rows(dk, k_new, slots)
                dv = _append_rows(dv, v_new, slots)
                return (token, dk, dv), token

            carry0 = ((prev_tok, dec_k, dec_v) + tuple(dec_scales)
                      if int8 else (prev_tok, dec_k, dec_v))
            carry, toks = jax.lax.scan(
                dstep, carry0, jnp.arange(self.P, dtype=jnp.int32))
            last, dec_k, dec_v = carry[:3]
            tokens = toks.T  # [B, P]
            pa = audio[:, None, -1:, :]  # [B, 1, 1, D]
            last = jnp.where(ready, last, prev_tok)
            pa = jnp.where(ready[:, None, None, None], pa, prev_audio)
            return (tokens, last, pa, enc_k, enc_v, dec_k, dec_v) + carry[3:]

        def _pool_step_spec(params, fused_w, ada_vecs, mel_wins, prev_tok,
                            prev_audio, ready, enc_k, enc_v, enc_len,
                            dec_k, dec_v, dec_len, draft_table, spec_stats,
                            *dec_scales):
            """Pooled SPECULATIVE step: a while-loop of spec-K kernel
            passes; each pass verifies K drafted tokens per slot and
            each slot advances by its own accepted count until every
            ready slot has decoded P positions.  Slots that finish (or
            are not ready) keep riding the pass with frozen positions —
            their appends land at their own future positions (masked by
            validity, overwritten by the next true append) and their
            token writes land in the buffer's padding tail (finished)
            or are discarded by the ready mask (not ready).  With the
            int8 KV cache, ``dec_scales`` = (k_scales, v_scales) and
            all K fresh rows per slot are per-vector-quantized at each
            append (the kernel reads them back roundtripped, so tokens
            match the sequential int8 pool)."""
            from voxtral_tpu.models.layers import ring_slot, rms_norm
            from voxtral_tpu.ops.decode_step_pallas import (
                decode_stack_step,
                quantize_kv,
                rope_pair_vectors,
            )

            lmc = self.cfg.language_model
            fold = self._fused["fold"]
            int8 = self.cache_int8
            K, B, P = self.speculative, self.B, self.P
            tp = self._tp_mesh is not None
            ngram = self.draft == "ngram"

            def enc_one(mel_win, ek, ev, el, params):
                cache = KVCache(ek, ev, el)
                audio, cache = _encode_window(
                    params, mel_win, cache, self.cfg, self._enc_rope,
                    4 * P, 0, self._enc_ring,
                )
                return audio[0], cache.k, cache.v

            audio, enc_k, enc_v = jax.vmap(
                enc_one, in_axes=(0, 0, 0, 0, None)
            )(mel_wins, enc_k, enc_v, enc_len, params)  # [B, P, D]
            inputs = jnp.concatenate(
                [prev_audio[:, 0, :, :], audio[:, :-1, :]], axis=1)
            inputs = jnp.concatenate(
                [inputs, jnp.tile(inputs[:, -1:, :], (1, K - 1, 1))],
                axis=1)  # [B, P+K-1, D]
            lm_kw = _fused_lm_kwargs(params, fold and not tp, fused_w)

            def cond(st):
                pos = st[0]
                return jnp.any(ready & (pos < P))

            def body(st):
                if int8:
                    pos, prev, dk, dv, dks, dvs, toks, table, stats = st
                    scale_kw = dict(k_scales=dks, v_scales=dvs)
                else:
                    pos, prev, dk, dv, toks, table, stats = st
                    scale_kw = {}
                offs = dec_len + pos  # [B] per-slot absolute positions
                a = jax.vmap(
                    lambda inp, q: jax.lax.dynamic_slice_in_dim(
                        inp, q, K, axis=0)
                )(inputs, pos)  # [B, K, D]
                if ngram:
                    drafts = _ngram_drafts(table, prev, K)  # [B, K]
                else:
                    drafts = jnp.concatenate(
                        [prev[:, None],
                         jnp.full((B, K - 1), self._draft_token,
                                  jnp.int32)],
                        axis=1)  # [B, K]
                text = embed_tokens(params["decoder"], drafts)
                x = (a + text).reshape(B * K, lmc.dim).astype(jnp.float32)
                pos_rows = (offs[:, None]
                            + jnp.arange(K, dtype=jnp.int32)[None, :]
                            ).reshape(-1)
                cos, sin = jax.vmap(
                    lambda q: rope_pair_vectors(
                        q, lmc.head_dim, lmc.rope_theta)
                )(pos_rows)
                if tp:
                    # The spec-capable TP half-kernels: streams*K query
                    # rows over this shard's heads/F rows, caches one
                    # row per stream; greedy tokens per row via the
                    # vocab-sharded lm fold (row-independent).
                    from voxtral_tpu.ops.decode_tp_pallas import (
                        tp_decode_step,
                        tp_lm_head_token,
                    )

                    xo, k_new, v_new = tp_decode_step(
                        self._tp_mesh, x, offs,
                        fused_w["attn_norm"], fused_w["ffn_norm"],
                        ada_vecs, fused_w, cos, sin, dk, dv,
                        n_heads=lmc.n_heads, n_kv=lmc.n_kv_heads,
                        head_dim=lmc.head_dim, eps=lmc.norm_eps,
                        interpret=self._mk_interpret,
                        window=lmc.sliding_window, ring=self._dec_ring,
                        spec=K, data_axis=self._pool_data_axis,
                        **scale_kw)
                    if fold:
                        toks_flat = tp_lm_head_token(
                            self._tp_mesh, xo, params["decoder"]["norm"],
                            fused_w["lm_codes"], fused_w["lm_scale"],
                            eps=lmc.norm_eps,
                            interpret=self._mk_interpret,
                            data_axis=self._pool_data_axis)
                        y = toks_flat.reshape(B, K).astype(jnp.int32)
                    else:
                        hidden = rms_norm(
                            xo, params["decoder"]["norm"], lmc.norm_eps)
                        logits = lm_head(params["decoder"], hidden,
                                         xla_only=True)
                        y = jnp.argmax(logits, axis=-1).reshape(
                            B, K).astype(jnp.int32)
                else:
                    spec_args = (
                        x, offs,
                        fused_w["attn_norm"], fused_w["ffn_norm"],
                        ada_vecs,
                        fused_w["sqkv"], fused_w["so"], fused_w["s13"],
                        fused_w["s2"], cos, sin, dk, dv,
                        fused_w["wqkv"], fused_w["wo"], fused_w["w13"],
                        fused_w["w2"],
                    )
                    spec_kw = dict(
                        n_heads=lmc.n_heads, n_kv=lmc.n_kv_heads,
                        head_dim=lmc.head_dim, eps=lmc.norm_eps,
                        interpret=self._mk_interpret,
                        window=lmc.sliding_window, ring=self._dec_ring,
                        spec=K, **scale_kw, **lm_kw,
                    )
                    if self._dp_mesh is not None:
                        # Rows (stream, draft) shard over the data axis
                        # in whole streams; each shard verifies its own
                        # slots (zero collectives; shards whose slots
                        # finished ride masked until the global
                        # while-loop exits).
                        from voxtral_tpu.parallel.dp_decode import (
                            dp_decode_stack_step,
                        )

                        out = dp_decode_stack_step(
                            self._dp_mesh, *spec_args, **spec_kw)
                    else:
                        out = decode_stack_step(*spec_args, **spec_kw)
                    if fold:
                        _, k_new, v_new, logits = out
                    else:
                        xo, k_new, v_new = out
                        hidden = rms_norm(
                            xo, params["decoder"]["norm"], lmc.norm_eps)
                        logits = lm_head(
                            params["decoder"], hidden,
                            xla_only=self._dp_mesh is not None)
                    y = jnp.argmax(logits, axis=-1).reshape(B, K).astype(
                        jnp.int32)
                match = (y[:, : K - 1] == drafts[:, 1:]).astype(jnp.int32)
                n_acc = 1 + jnp.sum(jnp.cumprod(match, axis=1), axis=1)
                adv = jnp.where(ready & (pos < P),
                                jnp.minimum(n_acc, P - pos), 0)
                # Append ALL K fresh rows per slot at offs+j.
                nL = k_new.shape[0]
                kS = k_new.reshape(nL, B, K, lmc.n_kv_heads, lmc.head_dim)
                vS = v_new.reshape(nL, B, K, lmc.n_kv_heads, lmc.head_dim)
                for j in range(K):
                    off_j = offs + j
                    if self._dec_ring is not None:
                        slot_j = jax.vmap(
                            lambda o: ring_slot(o, *self._dec_ring)
                        )(off_j)
                    else:
                        slot_j = off_j
                    if int8:
                        kq, ksc = quantize_kv(kS[:, :, j])
                        vq, vsc = quantize_kv(vS[:, :, j])
                        dk = _append_rows(dk, kq, slot_j)
                        dv = _append_rows(dv, vq, slot_j)
                        dks = _append_scales(dks, ksc, slot_j)
                        dvs = _append_scales(dvs, vsc, slot_j)
                    else:
                        dk = _append_rows(dk, kS[:, :, j], slot_j)
                        dv = _append_rows(dv, vS[:, :, j], slot_j)
                toks = jax.vmap(
                    lambda t, yk, q: jax.lax.dynamic_update_slice(
                        t, yk, (q,))
                )(toks, y, pos)
                idx = jnp.clip(adv - 1, 0, K - 1)
                picked = jnp.take_along_axis(y, idx[:, None], axis=1)[:, 0]
                prev = jnp.where(adv > 0, picked, prev)
                if ngram:
                    # Train on ready slots' verified rows only (masked
                    # slots' y comes from garbage audio context): dead
                    # slots' writes are routed to entry 0 with entry 0's
                    # current value — a no-op scatter.
                    live = ready & (pos < P)
                    tgt = jnp.where(live[:, None], drafts, 0)
                    val = jnp.where(live[:, None], y, table[0])
                    table = table.at[tgt.reshape(-1)].set(val.reshape(-1))
                stats = stats + jnp.stack(
                    [jnp.ones((), jnp.int32), jnp.sum(adv)])
                if int8:
                    return (pos + adv, prev, dk, dv, dks, dvs, toks,
                            table, stats)
                return (pos + adv, prev, dk, dv, toks, table, stats)

            st0 = (jnp.zeros((B,), jnp.int32), prev_tok, dec_k, dec_v)
            if int8:
                st0 = st0 + tuple(dec_scales)
            st = jax.lax.while_loop(
                cond, body, st0 + (jnp.zeros((B, P + K - 1), jnp.int32),
                                   draft_table, spec_stats))
            pos, last, dec_k, dec_v = st[:4]
            toks, table, stats = st[-3:]
            tokens = toks[:, :P]
            pa = audio[:, None, -1:, :]
            last = jnp.where(ready, last, prev_tok)
            pa = jnp.where(ready[:, None, None, None], pa, prev_audio)
            return ((tokens, last, pa, enc_k, enc_v, dec_k, dec_v)
                    + st[4:-3] + (table, stats))

        if self._fused is not None:
            self._pool_step_jit = None
            donate = (7, 8, 10, 11) + ((13, 14) if self.cache_int8 else ())
            if self.speculative > 1:
                # + the draft table (13) and stats (14); scales shift.
                donate = (7, 8, 10, 11, 13, 14) + (
                    (15, 16) if self.cache_int8 else ())
                self._pool_step_fused_jit = jax.jit(
                    _pool_step_spec, donate_argnums=donate)
            else:
                self._pool_step_fused_jit = jax.jit(
                    _pool_step_fused, donate_argnums=donate)
        else:
            self._pool_step_fused_jit = None
            self._pool_step_jit = jax.jit(
                _pool_step, donate_argnums=(5, 6, 8, 9))
        # The init step is identical to a solo session's (same ring and
        # rope geometry) — share the jitted program via the session cache.
        self._init_jit = _session_jits(
            self.cfg, self.P, self._enc_ring, self._dec_ring,
            rope_positions,
            bool(self._fused and self._fused["fold"]),
            self._mk_interpret,
        )[0]

    # -- slots ---------------------------------------------------------------

    def attach(self, session: "StreamingSession") -> int:
        for b in range(self.B):
            if self.sessions[b] is None:
                self.sessions[b] = session
                return b
        raise RuntimeError(f"stream pool full ({self.B} slots)")

    def detach(self, slot: int) -> None:
        self.sessions[slot] = None

    @property
    def free_slots(self) -> int:
        return sum(1 for s in self.sessions if s is None)

    # -- slot checkpointing --------------------------------------------------

    def _solo_geometry(self) -> tuple[int, int]:
        """(solo max_dec, solo dec ring size) a checkpoint of this pool
        normalizes to — the geometry ``StreamingSession.__init__`` would
        build solo (the pool's dec ring may be chunk-grown; its bounded
        caches carry a +P sacrificial granule; both are pool-local)."""
        lm = self.cfg.language_model
        if self.unbounded:
            ring = lm.sliding_window + self.P
            return PREFIX_LEN + ring, ring
        return self.max_dec, 0

    def slot_state(self, sess: "StreamingSession") -> dict:
        """Portable snapshot of one pooled session in SOLO layout
        (position-major caches, solo ring/bounded geometry), so
        ``StreamingSession.restore`` can rebuild it either solo or
        attached to another pool.  int8 pool caches dequantize on the
        way out; per-vector requantization on the way back into an int8
        pool is exact (the max element of each vector maps to ±127, so
        scale and codes round-trip)."""
        b = sess._slot
        p0 = sess._positions_done
        solo_max_dec, solo_ring = self._solo_geometry()
        enc_k = np.asarray(self.enc_k[b])  # [L, 1, s_enc, H, hd]
        enc_v = np.asarray(self.enc_v[b])
        if self._fused is not None:
            km = np.asarray(self.dec_k[:, b])  # head-major [L, H, S, hd]
            vm = np.asarray(self.dec_v[:, b])
            if self.cache_int8:
                km = km.astype(np.float32) * \
                    np.asarray(self.dec_ks[:, b])[..., None]
                vm = vm.astype(np.float32) * \
                    np.asarray(self.dec_vs[:, b])[..., None]
            dk = km.transpose(0, 2, 1, 3)[:, None]  # [L, 1, S, H, hd]
            dv = vm.transpose(0, 2, 1, 3)[:, None]
        else:
            dk = np.asarray(self.dec_k[b])
            dv = np.asarray(self.dec_v[b])
        if self.unbounded:
            if self._dec_ring[1] != solo_ring:
                dk = _ring_remap(dk, PREFIX_LEN, self._dec_ring[1],
                                 solo_ring, p0)
                dv = _ring_remap(dv, PREFIX_LEN, self._dec_ring[1],
                                 solo_ring, p0)
            # Encoder ring geometry is identical solo vs pooled.
        else:
            dk = dk[:, :, :solo_max_dec]  # drop the sacrificial granule
            dv = dv[:, :, :solo_max_dec]
            enc_k = enc_k[:, :, :4 * solo_max_dec]
            enc_v = enc_v[:, :, :4 * solo_max_dec]
        return {
            "version": StreamingSession.CHECKPOINT_VERSION,
            "P": self.P,
            "unbounded": self.unbounded,
            "max_dec": solo_max_dec,
            "delay_tokens": self.delay_tokens,
            "samples": np.asarray(sess._samples, np.float32),
            "samples_base": sess._samples_base,
            "positions_done": p0,
            "tokens": np.asarray(sess.tokens, np.int32),
            "text": sess._text,
            "finished": sess._finished,
            "prev_token": int(np.asarray(self.prev_tok[b])),
            "prev_audio": np.asarray(self.prev_audio[b], np.float32),
            "enc_k": enc_k,
            "enc_v": enc_v,
            "enc_len": 4 * p0,
            "dec_k": dk,
            "dec_v": dv,
            "dec_len": p0,
            "endpoint_mark": getattr(sess, "_endpoint_mark", 0),
        }

    def write_slot(self, b: int, state: dict) -> None:
        """Load a solo-layout checkpoint into slot ``b``'s share of the
        pool caches (inverse of :meth:`slot_state`)."""
        p0 = int(state["positions_done"])
        cdt = self.model.cache_dtype
        solo_max_dec, solo_ring = self._solo_geometry()
        dk = np.asarray(state["dec_k"], np.float32)  # [L, 1, S, H, hd]
        dv = np.asarray(state["dec_v"], np.float32)
        enc_k = np.asarray(state["enc_k"], np.float32)
        enc_v = np.asarray(state["enc_v"], np.float32)
        if self.unbounded:
            if self._dec_ring[1] != solo_ring:
                dk = _ring_remap(dk, PREFIX_LEN, solo_ring,
                                 self._dec_ring[1], p0)
                dv = _ring_remap(dv, PREFIX_LEN, solo_ring,
                                 self._dec_ring[1], p0)
        else:
            # Position axis is index 3 in both layouts ([L,B,H,S,hd]
            # fused, [B,L,1,S,H,hd] generic).
            pad = self.dec_k.shape[3] - dk.shape[2]
            dk = np.pad(dk, [(0, 0), (0, 0), (0, pad), (0, 0), (0, 0)])
            dv = np.pad(dv, [(0, 0), (0, 0), (0, pad), (0, 0), (0, 0)])
            epad = self.enc_k.shape[3] - enc_k.shape[2]
            enc_k = np.pad(enc_k,
                           [(0, 0), (0, 0), (0, epad), (0, 0), (0, 0)])
            enc_v = np.pad(enc_v,
                           [(0, 0), (0, 0), (0, epad), (0, 0), (0, 0)])
        if self._fused is not None:
            km = jnp.asarray(dk[:, 0].transpose(0, 2, 1, 3))  # [L,H,S,hd]
            vm = jnp.asarray(dv[:, 0].transpose(0, 2, 1, 3))
            if self.cache_int8:
                from voxtral_tpu.ops.decode_step_pallas import quantize_kv

                kq, ks = quantize_kv(km)
                vq, vs = quantize_kv(vm)
                self.dec_k = self.dec_k.at[:, b].set(kq)
                self.dec_v = self.dec_v.at[:, b].set(vq)
                self.dec_ks = self.dec_ks.at[:, b].set(ks)
                self.dec_vs = self.dec_vs.at[:, b].set(vs)
            else:
                self.dec_k = self.dec_k.at[:, b].set(km.astype(cdt))
                self.dec_v = self.dec_v.at[:, b].set(vm.astype(cdt))
        else:
            self.dec_k = self.dec_k.at[b].set(jnp.asarray(dk, cdt))
            self.dec_v = self.dec_v.at[b].set(jnp.asarray(dv, cdt))
        self.enc_k = self.enc_k.at[b].set(jnp.asarray(enc_k, cdt))
        self.enc_v = self.enc_v.at[b].set(jnp.asarray(enc_v, cdt))
        self.prev_tok = self.prev_tok.at[b].set(
            jnp.int32(int(state["prev_token"])))
        self.prev_audio = self.prev_audio.at[b].set(
            jnp.asarray(state["prev_audio"], self.model.compute_dtype))

    # -- stepping ------------------------------------------------------------

    def _slot_init(self, b: int, sess: "StreamingSession") -> None:
        need = PREFIX_LEN + self.P
        mel0 = sess._mel_window(0, 16 * need + 8)
        dec0 = (self._init_dec_zero if self._fused is not None
                else KVCache(self.dec_k[b], self.dec_v[b],
                             jnp.zeros((), jnp.int32)))
        out = self._init_jit(
            self.model.params, jnp.asarray(mel0, self.model.compute_dtype),
            self._t_embed,
            enc_cache=KVCache(self.enc_k[b], self.enc_v[b],
                              jnp.zeros((), jnp.int32)),
            dec_cache=dec0,
        )
        tokens, last, prev_audio, enc_cache, dec_cache = out
        self.enc_k = self.enc_k.at[b].set(enc_cache.k)
        self.enc_v = self.enc_v.at[b].set(enc_cache.v)
        if self._fused is not None:
            # Head-major transpose into the fused slot ([L, 1, S, H, hd]
            # -> [L, H, S, hd]); int8 mode quantizes the prefilled rows
            # per position vector (zeros quantize to zeros).
            km = jnp.transpose(dec_cache.k[:, 0], (0, 2, 1, 3))
            vm = jnp.transpose(dec_cache.v[:, 0], (0, 2, 1, 3))
            if self.cache_int8:
                from voxtral_tpu.ops.decode_step_pallas import quantize_kv

                kq, ks = quantize_kv(km)
                vq, vs = quantize_kv(vm)
                self.dec_k = self.dec_k.at[:, b].set(kq)
                self.dec_v = self.dec_v.at[:, b].set(vq)
                self.dec_ks = self.dec_ks.at[:, b].set(ks)
                self.dec_vs = self.dec_vs.at[:, b].set(vs)
            else:
                self.dec_k = self.dec_k.at[:, b].set(km)
                self.dec_v = self.dec_v.at[:, b].set(vm)
        else:
            self.dec_k = self.dec_k.at[b].set(dec_cache.k)
            self.dec_v = self.dec_v.at[b].set(dec_cache.v)
        self.prev_tok = self.prev_tok.at[b].set(last)
        self.prev_audio = self.prev_audio.at[b].set(prev_audio)
        sess.tokens.extend(np.asarray(tokens).tolist())
        sess._positions_done = need

    def pump(self) -> None:
        """Run every step that has audio available, batching across ready
        sessions; loops until no session can advance.

        Token fetches are DEFERRED to pump exit: the next step's inputs
        live on device (prev_tok/prev_audio/caches), so back-to-back
        catch-up steps dispatch without paying a host roundtrip each —
        on a tunneled chip that roundtrip dominates the step."""
        pending: list[tuple] = []  # (tokens_dev, ready) in step order

        def flush():
            for toks_dev, rdy in pending:
                toks = np.asarray(toks_dev)
                for b, sess in enumerate(self.sessions):
                    if rdy[b] and sess is not None:
                        sess.tokens.extend(toks[b].tolist())
            pending.clear()

        try:
            self._pump_loop(pending)
        finally:
            # Tokens from completed steps survive any mid-pump error
            # (positions already advanced; dropping them would leave
            # permanent transcript gaps).
            flush()

    def _pump_loop(self, pending: list) -> None:
        while True:
            progressed = False
            for b, sess in enumerate(self.sessions):
                if (sess is not None and sess._positions_done == 0
                        and sess._available_positions() >= PREFIX_LEN + self.P):
                    self._slot_init(b, sess)
                    progressed = True

            ready = np.zeros(self.B, bool)
            for b, sess in enumerate(self.sessions):
                if sess is None or sess._positions_done == 0:
                    continue
                if sess._positions_done + self.P > self.max_dec:
                    # Mark instead of raising: one overlong stream must not
                    # stall the other pooled sessions.  (Unbounded pools
                    # only hit this at the RoPE-table bound, ~43 min.)
                    sess.overrun = True
                    continue
                if sess._available_positions() >= sess._positions_done + self.P:
                    ready[b] = True
            if not ready.any():
                if not progressed:
                    return
                continue

            n_mels = self.cfg.audio.num_mel_bins
            w = 16 * self.P + 8
            mel_wins = np.zeros((self.B, 1, n_mels, w), np.float32)
            if self.unbounded:
                # Ring mode has no trash slots: masked rows write their
                # garbage K/V at their OWN next append slot — not yet
                # valid / already outside the window, and overwritten by
                # their next real step (see __init__ docstring).
                enc_len = np.zeros(self.B, np.int32)
                dec_len = np.zeros(self.B, np.int32)
                for b, sess in enumerate(self.sessions):
                    if sess is not None and sess._positions_done > 0:
                        enc_len[b] = 4 * sess._positions_done
                        dec_len[b] = sess._positions_done
            else:
                enc_len = np.full(self.B, self.max_enc, np.int32)  # trash
                dec_len = np.full(self.B, self.max_dec, np.int32)
            with span("pool_mel", ready=int(ready.sum())):
                for b, sess in enumerate(self.sessions):
                    if ready[b]:
                        p0 = sess._positions_done
                        mel_wins[b] = sess._mel_window(
                            16 * p0 - MEL_MARGIN,
                            16 * (p0 + self.P) + MEL_MARGIN,
                        )
                        enc_len[b] = 4 * p0
                        dec_len[b] = p0

            with span("pool_step", ready=int(ready.sum()),
                      fused=self._fused is not None):
                if self._fused is not None:
                    scales = ((self.dec_ks, self.dec_vs)
                              if self.cache_int8 else ())
                    spec_extra = ((self._draft_table, self._spec_stats)
                                  if self.speculative > 1 else ())
                    out = self._pool_step_fused_jit(
                        self.model.params, self._fused["w"],
                        self._fused["ada"],
                        jnp.asarray(mel_wins, self.model.compute_dtype),
                        self.prev_tok, self.prev_audio, jnp.asarray(ready),
                        self.enc_k, self.enc_v, jnp.asarray(enc_len),
                        self.dec_k, self.dec_v, jnp.asarray(dec_len),
                        *spec_extra, *scales,
                    )
                    if self.speculative > 1:
                        self._draft_table, self._spec_stats = out[-2:]
                        out = out[:-2]
                    if self.cache_int8:
                        self.dec_ks, self.dec_vs = out[7:9]
                        out = out[:7]
                else:
                    out = self._pool_step_jit(
                        self.model.params,
                        jnp.asarray(mel_wins, self.model.compute_dtype),
                        self.prev_tok, self.prev_audio, jnp.asarray(ready),
                        self.enc_k, self.enc_v, jnp.asarray(enc_len),
                        self.dec_k, self.dec_v, jnp.asarray(dec_len),
                        self._t_embed,
                    )
                tokens, self.prev_tok, self.prev_audio, \
                    self.enc_k, self.enc_v, self.dec_k, self.dec_v = out
            pending.append((tokens, ready))
            for b, sess in enumerate(self.sessions):
                if ready[b]:
                    sess._positions_done += self.P
                    if self.unbounded:
                        sess._trim_samples()

    def spec_metrics(self) -> Optional[dict]:
        """Pool-level speculative acceptance counters (one host fetch;
        None when spec is off).  ``accepted_rows`` sums per-slot
        advances, so ``tokens_per_pass`` is the POOL aggregate (up to
        ready_slots * K)."""
        if self.speculative <= 1 or self._spec_stats is None:
            return None
        passes, accepted = (int(x) for x in np.asarray(self._spec_stats))
        return {
            "passes": passes,
            "accepted_rows": accepted,
            "tokens_per_pass": round(accepted / max(1, passes), 3),
            "draft": self.draft,
        }


class StreamingSession:
    """Incremental transcription over a live 16 kHz mono stream."""

    def __init__(
        self,
        model: VoxtralModel,
        tokenizer: Optional[VoxtralTokenizer] = None,
        delay_tokens: float = 6.0,
        step_positions: int = 8,  # 8 x 160 ms = 1.28 s per step
        max_duration_s: float = 120.0,
        pad_config: Optional[PadConfig] = None,
        unbounded: bool = False,
        pool: Optional[StreamPool] = None,
        speculative: int = 0,
        draft_token: int = STREAMING_PAD,
        draft: str = "pad",
    ):
        """``unbounded=True`` lays the KV caches out as head+ring buffers
        INSIDE the jitted step (permanent 38-position prefix head + a
        modular ring covering the sliding window), so history eviction is
        free — no host-level cache copies, flat steady-state step time —
        and session length is limited only by the RoPE tables (~43 min of
        decoder positions).  The decoder window (8192 positions) makes the
        unbounded decoder cache ~1.8 GB.  On-device replacement for the
        reference's dynamic eviction (kv_cache.rs:176-203).
        """
        self.model = model
        self.tokenizer = tokenizer
        self.cfg = model.config
        self.P = step_positions
        self.pad_config = pad_config or PadConfig.voxtral()
        self._mel = MelSpectrogram.voxtral()
        self.unbounded = unbounded
        self._delay_tokens = delay_tokens
        self._pool = pool
        self._slot: Optional[int] = None

        if pool is not None:
            if speculative:
                raise ValueError(
                    "speculative decode is solo-session only (pooled "
                    "steps already amortize the weight stream over rows)"
                )
            if unbounded and not pool.unbounded:
                raise ValueError(
                    "unbounded pooled sessions need an unbounded pool "
                    "(StreamPool(unbounded=True))"
                )
            self.unbounded = pool.unbounded
            self.P = pool.P
            self._max_dec = pool.max_dec
            # The pool's t_embed/ada drive the actual decode, so the
            # session's effective delay IS the pool's — inherit it (it
            # feeds the words-timestamp correction and checkpoints).
            self._delay_tokens = pool.delay_tokens
            self._slot = pool.attach(self)
            self._samples = np.zeros(
                self.pad_config.left_pad_samples(), np.float32
            )
            self._samples_base = 0
            self._positions_done = 0
            self.tokens = []
            self._text = ""
            self._finished = False
            self.overrun = False
            self._fused = None  # pooled sessions decode via the pool
            return

        cache_dtype = model.cache_dtype
        lm = self.cfg.language_model
        enc = self.cfg.audio_encoder
        if unbounded:
            # Ring sizes: window + one write granule (decoder writes 1
            # position at a time, encoder 4P frames), encoder ring rounded
            # to the 4P write granule so ring writes never wrap mid-block.
            gran = 4 * self.P
            dec_ring = lm.sliding_window + self.P
            enc_ring = -(-(enc.sliding_window + gran) // gran) * gran
            self._dec_ring = (PREFIX_LEN, dec_ring)
            self._enc_ring = (4 * PREFIX_LEN, enc_ring)
            self._max_dec = PREFIX_LEN + dec_ring
            self._max_enc = 4 * PREFIX_LEN + enc_ring
            rope_positions = DECODER_ROPE_MAX_SEQ
        else:
            self._dec_ring = self._enc_ring = None
            self._max_dec = int(max_duration_s * 6.25) + PREFIX_LEN + 2 * self.P
            self._max_enc = 4 * self._max_dec
            rope_positions = self._max_dec
        # HBM admission (same gate as StreamPool; utils/hbm.py): a solo
        # unbounded session allocates window-sized rings up front.
        from voxtral_tpu.utils.hbm import check_hbm

        cds = jnp.dtype(cache_dtype).itemsize
        cache_bytes = (
            2 * enc.n_layers * self._max_enc * enc.n_kv_heads
            * enc.head_dim * cds
            + 2 * lm.n_layers * self._max_dec * lm.n_kv_heads
            * lm.head_dim * cds
        )
        check_hbm(model, cache_bytes,
                  f"StreamingSession(unbounded={unbounded}, "
                  f"max_duration_s={max_duration_s})", rows=1)

        self.enc_cache = create_encoder_cache(enc, 1, self._max_enc, cache_dtype)
        self.dec_cache = create_cache(lm, 1, self._max_dec, cache_dtype)
        self._t_embed = model.t_embed(delay_tokens)
        self._enc_base = 0
        self._dec_base = 0
        self._samples_base = 0  # samples trimmed from the head of the buffer

        # Audio buffer starts with the 76-token silence left pad
        # (= exactly the 38-position prefill).
        self._samples = np.zeros(self.pad_config.left_pad_samples(), np.float32)
        assert self._samples.size == PREFIX_LEN * SAMPLES_PER_POSITION

        self._positions_done = 0
        self._prev_token = jnp.zeros((), jnp.int32)
        # Placeholder only; replaced by the init step's output before use.
        self._prev_audio = jnp.zeros((1, 1, lm.dim), model.compute_dtype)
        self.tokens: list[int] = []
        self._text = ""
        self._finished = False
        self.overrun = False  # pooled mode: stream exceeded max_duration_s

        # Solo fused decode: steady-state steps run the whole-stack
        # Pallas kernel (ring-masked in unbounded mode) when the model
        # carries fused weights and the cache fits the VMEM budget.
        # ``speculative=K >= 2`` verifies K STREAMING_PAD-drafted tokens
        # per weight pass (exact greedy; up to K x decode throughput in
        # silence) — requires the fused plan and K <= P.
        self._mk_interpret = getattr(model, "_mk_interpret", False)
        self.speculative = int(speculative or 0)
        self._draft_token = int(draft_token)
        if draft not in ("pad", "ngram"):
            raise ValueError(f"draft policy must be pad|ngram, got {draft}")
        self.draft = draft
        self._draft_table = None
        self._spec_stats = None
        if self.speculative > 1:
            self._spec_stats = jnp.zeros((2,), jnp.int32)
            if draft == "ngram":
                self._draft_table = _ngram_table_init(
                    self.cfg.language_model.vocab_size, self._draft_token)
        if self.speculative > self.P:
            raise ValueError(
                f"speculative={self.speculative} must be <= "
                f"step_positions={self.P}")
        # The spec step carries K query rows + [K, V] logits; gate the
        # VMEM plan at that row count (cache rows stay 1 — the estimate
        # is conservative about the shared-cache term).
        self._fused = _fused_plan(model, max(1, self.speculative),
                                  self._max_dec,
                                  spec=max(1, self.speculative))
        if self.speculative > 1 and self._fused is None:
            raise ValueError(
                "speculative decode needs the fused stack kernel or the "
                "TP half-kernels (w8/bf16 megakernel weights, geometry "
                "within the VMEM budget at K query rows)")
        if self._fused is not None:
            from voxtral_tpu.ops.decode_step_pallas import ada_vectors

            self._fused["ada"] = ada_vectors(
                model.params["decoder"], self._t_embed)

        # Jitted step programs + rope tables are shared across sessions
        # of the same geometry (fresh per-session jits would re-trace
        # and re-hit the compile cache on every construction).
        (self._init_jit, self._step_jit, self._fstep_jit,
         self._enc_rope, self._dec_rope) = _session_jits(
            self.cfg, self.P, self._enc_ring, self._dec_ring,
            rope_positions,
            bool(self._fused and self._fused["fold"]),
            self._mk_interpret,
            tp_mesh=(model.parallel.mesh
                     if self._fused is not None and self._fused.get("tp")
                     else None),
            spec=self.speculative,
            draft_token=self._draft_token,
        )

    # -- internals ----------------------------------------------------------

    def _mel_window(self, frame_lo: int, frame_hi: int) -> np.ndarray:
        """Mel frames [frame_lo, frame_hi), exact vs the global computation.
        Frame/sample indices are absolute; the buffer head may be trimmed
        (``_samples_base``)."""
        base = self._samples_base
        if frame_lo == 0:
            logmel = self._mel.compute_log(
                self._samples[: _mel_frames_needed(frame_hi) - base]
            )
            return logmel[:frame_hi].T[None]
        lo = frame_lo - MEL_MARGIN
        s0 = MEL_HOP * lo - base
        assert s0 >= 0, "audio buffer trimmed past the needed window"
        samples = self._samples[s0 : _mel_frames_needed(frame_hi) - base]
        logmel = self._mel.compute_log(samples)
        return logmel[MEL_MARGIN : MEL_MARGIN + (frame_hi - frame_lo)].T[None]

    def _available_positions(self) -> int:
        """Positions whose encoder frames (incl. conv+STFT lookahead) are
        computable from the buffered samples."""
        # Need mel frames up to 16*pos + 8 => samples up to that frame's end.
        n = len(self._samples) + self._samples_base
        # Invert _mel_frames_needed: frames f computable if 160*(f-1)+360 <= n
        max_frame = (n - 360) // MEL_HOP + 1
        return max(0, (max_frame - 8) // 16)

    def _run_ready_steps(self) -> None:
        if self._pool is not None:
            self._pool.pump()
            return
        # Deferred token fetches: a backlogged session dispatches its
        # catch-up steps back-to-back (device-resident carries) and pays
        # ONE host sync at the end instead of a roundtrip per step.
        pending: list = []
        try:
            self._step_loop(pending)
        finally:
            # Completed steps' tokens survive mid-loop errors (e.g. the
            # max_duration / RoPE-bound RuntimeErrors) — positions have
            # already advanced, so dropping them would leave gaps.
            for toks_dev in pending:
                self.tokens.extend(np.asarray(toks_dev).tolist())
            pending.clear()

    def _step_loop(self, pending: list) -> None:
        while True:
            avail = self._available_positions()
            if self._positions_done == 0:
                need = PREFIX_LEN + self.P
                if avail < need:
                    return
                mel0 = self._mel_window(0, 16 * need + 8)
                out = self._init_jit(
                    self.model.params,
                    jnp.asarray(mel0, self.model.compute_dtype),
                    self._t_embed,
                    enc_cache=self.enc_cache, dec_cache=self.dec_cache,
                )
                tokens, self._prev_token, self._prev_audio, self.enc_cache, self.dec_cache = out
                if self._fused is not None:
                    # One-time head-major transpose for the stack kernel
                    # ([L, 1, S, H, hd] -> [L, 1, H, S, hd]).
                    self.dec_cache = KVCache(
                        jnp.transpose(self.dec_cache.k, (0, 1, 3, 2, 4)),
                        jnp.transpose(self.dec_cache.v, (0, 1, 3, 2, 4)),
                        self.dec_cache.length,
                    )
                self.tokens.extend(np.asarray(tokens).tolist())
                self._positions_done = need
            elif avail >= self._positions_done + self.P:
                self._maybe_shift()
                p0 = self._positions_done
                mel_win = self._mel_window(16 * p0 - 4, 16 * (p0 + self.P) + 4)
                if self._fused is not None and self.speculative > 1:
                    out = self._fstep_jit(
                        self.model.params, self._fused["w"],
                        self._fused["ada"],
                        jnp.asarray(mel_win, self.model.compute_dtype),
                        self._prev_token, self._prev_audio,
                        jnp.int32(self._enc_base),
                        enc_cache=self.enc_cache, dec_cache=self.dec_cache,
                        draft_table=self._draft_table,
                        spec_stats=self._spec_stats,
                    )
                    (tokens, self._prev_token, self._prev_audio,
                     self.enc_cache, self.dec_cache, table,
                     self._spec_stats) = out
                    if table is not None:
                        self._draft_table = table
                    pending.append(tokens)
                    self._positions_done = p0 + self.P
                    continue
                if self._fused is not None:
                    out = self._fstep_jit(
                        self.model.params, self._fused["w"],
                        self._fused["ada"],
                        jnp.asarray(mel_win, self.model.compute_dtype),
                        self._prev_token, self._prev_audio,
                        jnp.int32(self._enc_base),
                        enc_cache=self.enc_cache, dec_cache=self.dec_cache,
                    )
                else:
                    out = self._step_jit(
                        self.model.params,
                        jnp.asarray(mel_win, self.model.compute_dtype),
                        self._prev_token, self._prev_audio, self._t_embed,
                        jnp.int32(self._enc_base), jnp.int32(self._dec_base),
                        enc_cache=self.enc_cache, dec_cache=self.dec_cache,
                    )
                tokens, self._prev_token, self._prev_audio, self.enc_cache, self.dec_cache = out
                pending.append(tokens)
                self._positions_done = p0 + self.P
            else:
                return

    def _maybe_shift(self) -> None:
        """Unbounded mode: ring caches evict on device; here only guard
        the RoPE bound and trim the host-side sample buffer."""
        if not self.unbounded:
            if self._positions_done + self.P > self._max_dec:
                raise RuntimeError(
                    "stream exceeded max_duration_s; use unbounded=True"
                )
            return
        if self._positions_done + self.P > DECODER_ROPE_MAX_SEQ:
            # Gather would clamp silently past the RoPE table.
            raise RuntimeError(
                f"stream exceeded {DECODER_ROPE_MAX_SEQ} decoder positions "
                "(~43 min) — the current RoPE table bound"
            )
        self._trim_samples()

    def _trim_samples(self) -> None:
        """Trim the host audio buffer: future mel windows start at frame
        16*p0 - MEL_MARGIN at the earliest.  Called by unbounded solo
        steps and by the pool pump for unbounded pooled sessions."""
        keep_from = max(
            0, MEL_HOP * (16 * self._positions_done - 2 * MEL_MARGIN) - 400
        )
        if keep_from - self._samples_base > 10 * 16000:
            drop = keep_from - self._samples_base
            self._samples = self._samples[drop:]
            self._samples_base += drop

    def _emit(self) -> str:
        if self.tokenizer is None:
            return ""
        text = self.tokenizer.decode([t for t in self.tokens if t >= 1000])
        if not self._finished:
            # A multi-byte UTF-8 character split across tokens decodes to a
            # trailing U+FFFD now and the real character later; emitting it
            # would freeze the replacement char in already-sent deltas.
            # Hold trailing replacement chars back until completed (or
            # until finish(), when genuine invalid bytes are emitted as-is).
            while text.endswith("�"):
                text = text[:-1]
        delta = text[len(self._text):]
        self._text = text
        return delta

    # -- public API ---------------------------------------------------------

    def feed(self, samples: np.ndarray, pump: bool = True) -> str:
        """Append 16 kHz mono samples; returns newly decoded text.

        ``pump=False`` only buffers the samples (no decode) — used by
        coalescing callers (the serving layer / StreamPool benchmarks)
        that batch steps across sessions before pumping once.
        """
        if self._finished:
            raise RuntimeError("session already finished")
        self._samples = np.concatenate(
            [self._samples, np.asarray(samples, np.float32)]
        )
        if not pump:
            return ""
        self._run_ready_steps()
        return self._emit()

    def finish(self) -> str:
        """Flush: right-pad with silence (alignment + 17 tokens, pad.rs
        semantics) and decode every remaining position."""
        if self._finished:
            return ""
        self._finished = True
        total_abs = self._samples_base + len(self._samples)
        right = self.pad_config.right_pad_samples(total_abs)
        # Extra tail so the final step's conv/STFT lookahead is satisfied,
        # then round the target up to a whole step.
        total = total_abs + right
        target_positions = total // SAMPLES_PER_POSITION
        # Steps land on PREFIX_LEN + k*P positions — round up on that grid.
        over = max(target_positions - PREFIX_LEN, self.P)
        rounded = PREFIX_LEN + (-(-over // self.P)) * self.P
        needed = _mel_frames_needed(16 * rounded + 8)
        pad = max(0, needed - self._samples_base - len(self._samples))
        self._samples = np.concatenate(
            [self._samples, np.zeros(pad, np.float32)]
        )
        self._run_ready_steps()
        if self._pool is not None and self._slot is not None:
            self._pool.detach(self._slot)
            self._slot = None
        return self._emit()

    @property
    def text(self) -> str:
        return self._text

    @property
    def words(self) -> list[dict]:
        """Word-level timestamps for the tokens decoded so far
        (``tokenizer.decode_words`` semantics: [STREAMING_WORD] marks
        word starts, 160 ms per decoder position, delay-corrected).
        Times are relative to the session's audio start; an in-progress
        trailing word is included with its current extent."""
        if self.tokenizer is None:
            return []
        return self.tokenizer.decode_words(
            self.tokens, delay_s=self._delay_tokens * 0.08)

    @property
    def positions_done(self) -> int:
        return self._positions_done

    def spec_metrics(self) -> Optional[dict]:
        """Speculative acceptance counters (one host fetch; None when
        spec is off or no spec step ran yet): passes, accepted verify
        rows, tokens/pass, and the draft acceptance rate ((accepted -
        passes) / ((K-1) * passes) — the fraction of the K-1 true
        drafts per pass the model agreed with)."""
        if self.speculative <= 1 or self._spec_stats is None:
            return None
        passes, accepted = (int(x) for x in np.asarray(self._spec_stats))
        if passes == 0:
            return {"passes": 0, "accepted_rows": 0,
                    "tokens_per_pass": 0.0, "draft_acceptance": 0.0}
        return {
            "passes": passes,
            "accepted_rows": accepted,
            "tokens_per_pass": round(accepted / passes, 3),
            "draft_acceptance": round(
                (accepted - passes) / ((self.speculative - 1) * passes), 4),
        }

    # -- checkpoint / restore ------------------------------------------------
    #
    # Live-session migration for elastic serving: snapshot a mid-stream
    # session to host memory / disk, restore it in ANOTHER process (even
    # one whose model uses a different decode path), and continue with
    # token-identical output.  The reference has no analogue (its
    # checkpointing is weight loading only — SURVEY §5); this is the
    # piece a TPU serving deployment needs for drain/restart without
    # dropping live streams.

    CHECKPOINT_VERSION = 1

    def state_dict(self) -> dict:
        """Portable snapshot of a live session.

        Device caches land as numpy in a canonical SOLO layout: the
        decoder cache is normalized to position-major ``[L, 1, S, H,
        hd]`` regardless of whether this session's decode path had
        transposed it head-major, pooled sessions extract their slot
        from the shared pool caches (dequantizing int8 pool caches and
        normalizing ring geometry), so any checkpoint restores onto any
        decode path — solo or pooled, fused stack kernel or generic
        XLA."""
        if self._pool is not None:
            return self._pool.slot_state(self)
        dk = np.asarray(self.dec_cache.k)
        dv = np.asarray(self.dec_cache.v)
        if self._fused is not None and self._positions_done > 0:
            dk = dk.transpose(0, 1, 3, 2, 4)  # head-major -> position-major
            dv = dv.transpose(0, 1, 3, 2, 4)
        return {
            "version": self.CHECKPOINT_VERSION,
            "P": self.P,
            "unbounded": self.unbounded,
            "max_dec": self._max_dec,
            "delay_tokens": self._delay_tokens,
            "samples": np.asarray(self._samples, np.float32),
            "samples_base": self._samples_base,
            "positions_done": self._positions_done,
            "tokens": np.asarray(self.tokens, np.int32),
            "text": self._text,
            "finished": self._finished,
            "prev_token": int(np.asarray(self._prev_token)),
            "prev_audio": np.asarray(self._prev_audio, np.float32),
            "enc_k": np.asarray(self.enc_cache.k),
            "enc_v": np.asarray(self.enc_cache.v),
            "enc_len": int(np.asarray(self.enc_cache.length)),
            "dec_k": dk,
            "dec_v": dv,
            "dec_len": int(np.asarray(self.dec_cache.length)),
            "endpoint_mark": getattr(self, "_endpoint_mark", 0),
        }

    def save(self, path) -> None:
        """``state_dict()`` as a compressed ``.npz`` (one file, portable).

        bfloat16 caches widen to float32 on disk: npz round-trips
        ml_dtypes arrays as raw void records that nothing can cast, and
        bf16 -> f32 -> bf16 is exact."""
        out = {}
        for k, v in self.state_dict().items():
            a = np.asarray(v)
            if a.dtype.kind not in "biufUS":  # e.g. ml_dtypes.bfloat16
                a = a.astype(np.float32)
            out[k] = a
        np.savez_compressed(path, **out)

    @classmethod
    def restore(cls, model: "VoxtralModel", state: dict,
                tokenizer: Optional[VoxtralTokenizer] = None,
                pool: Optional["StreamPool"] = None,
                speculative: int = 0,
                draft: str = "pad",
                ) -> "StreamingSession":
        """Rebuild a live session from :meth:`state_dict` output.

        ``model`` must share the checkpointed session's architecture;
        its decode path (fused stack kernel vs generic XLA) and cache
        dtype may differ — caches are re-laid-out and cast on entry.
        With ``pool=`` the session attaches to a slot of that pool and
        the caches are written into the pool's shared arrays instead
        (the serving drain/restart path)."""
        if int(state["version"]) != cls.CHECKPOINT_VERSION:
            raise ValueError(
                f"unsupported checkpoint version {state['version']}"
            )
        P = int(state["P"])
        unbounded = bool(state["unbounded"])
        if pool is not None:
            if pool.P != P or pool.unbounded != unbounded:
                raise ValueError(
                    f"pool geometry mismatch: checkpoint P={P} "
                    f"unbounded={unbounded}, pool P={pool.P} "
                    f"unbounded={pool.unbounded}"
                )
            if pool._solo_geometry()[0] != int(state["max_dec"]):
                raise ValueError(
                    f"cache geometry mismatch: checkpoint max_dec="
                    f"{state['max_dec']}, pool normalizes to "
                    f"{pool._solo_geometry()[0]}"
                )
            if float(pool.delay_tokens) != float(state["delay_tokens"]):
                raise ValueError(
                    f"delay_tokens mismatch: checkpoint "
                    f"{state['delay_tokens']}, pool {pool.delay_tokens} "
                    "(the pool's time embedding would change the output)"
                )
            s = cls(model, tokenizer, pool=pool)
            s._samples = np.asarray(state["samples"], np.float32)
            s._samples_base = int(state["samples_base"])
            s._positions_done = int(state["positions_done"])
            s.tokens = [int(t) for t in np.asarray(state["tokens"])]
            s._text = str(state["text"])
            s._finished = bool(state["finished"])
            s._endpoint_mark = int(state["endpoint_mark"])
            pool.write_slot(s._slot, state)
            return s
        # __init__ derives _max_dec = int(mds * 6.25) + ...; invert with a
        # +0.5 nudge so int() truncation under float error (6.25 = 25/4 is
        # not binary-exact) cannot land one position short.
        mds = (int(state["max_dec"]) - PREFIX_LEN - 2 * P + 0.5) / 6.25
        s = cls(model, tokenizer, delay_tokens=float(state["delay_tokens"]),
                step_positions=P, max_duration_s=mds, unbounded=unbounded,
                speculative=speculative, draft=draft)
        if s._max_dec != int(state["max_dec"]):
            raise ValueError(
                f"cache geometry mismatch: checkpoint max_dec="
                f"{state['max_dec']}, rebuilt {s._max_dec} "
                "(architecture/config differs from the checkpointed model)"
            )
        s._samples = np.asarray(state["samples"], np.float32)
        s._samples_base = int(state["samples_base"])
        s._positions_done = int(state["positions_done"])
        s.tokens = [int(t) for t in np.asarray(state["tokens"])]
        s._text = str(state["text"])
        s._finished = bool(state["finished"])
        s._prev_token = jnp.asarray(int(state["prev_token"]), jnp.int32)
        s._prev_audio = jnp.asarray(state["prev_audio"],
                                    model.compute_dtype)
        s._endpoint_mark = int(state["endpoint_mark"])
        cache_dtype = model.cache_dtype
        s.enc_cache = KVCache(
            jnp.asarray(state["enc_k"], cache_dtype),
            jnp.asarray(state["enc_v"], cache_dtype),
            jnp.asarray(int(state["enc_len"]), jnp.int32),
        )
        dk = np.asarray(state["dec_k"])
        dv = np.asarray(state["dec_v"])
        if s._fused is not None and s._positions_done > 0:
            dk = dk.transpose(0, 1, 3, 2, 4)  # position-major -> head-major
            dv = dv.transpose(0, 1, 3, 2, 4)
        s.dec_cache = KVCache(
            jnp.asarray(dk, cache_dtype),
            jnp.asarray(dv, cache_dtype),
            jnp.asarray(int(state["dec_len"]), jnp.int32),
        )
        return s

    @classmethod
    def load(cls, model: "VoxtralModel", path,
             tokenizer: Optional[VoxtralTokenizer] = None,
             pool: Optional["StreamPool"] = None,
             ) -> "StreamingSession":
        """Restore from a :meth:`save` file."""
        with np.load(path, allow_pickle=False) as z:
            state = {k: z[k] for k in z.files}
        # 0-d arrays back to scalars/strings.
        for k in ("version", "P", "unbounded", "max_dec", "delay_tokens",
                  "samples_base", "positions_done", "finished",
                  "prev_token", "enc_len", "dec_len", "endpoint_mark"):
            state[k] = state[k].item()
        state["text"] = str(state["text"])
        return cls.restore(model, state, tokenizer, pool=pool)

    def endpoint(self, min_pad_run: int = 8) -> bool:
        """Speech-aware endpoint detection.

        True when the decoder has emitted text since the last endpoint
        and the stream has since gone silent for ``min_pad_run`` decoder
        positions (the model emits ``[STREAMING_PAD]`` = 32 for silence;
        8 positions = 1.28 s).  Callers (e.g. the serving layer) use this
        to finalize an utterance — beyond reference parity (its demo only
        transcribes whole recordings).

        Consuming an endpoint: call :meth:`consume_endpoint` so the next
        utterance is detected independently.
        """
        if not hasattr(self, "_endpoint_mark"):
            self._endpoint_mark = 0
        toks = self.tokens[self._endpoint_mark:]
        if len(toks) < min_pad_run:
            return False
        tail = toks[-min_pad_run:]
        if any(t != STREAMING_PAD for t in tail):
            return False
        return any(t >= 1000 for t in toks)

    def consume_endpoint(self) -> None:
        """Mark the current utterance boundary as handled."""
        self._endpoint_mark = len(self.tokens)
