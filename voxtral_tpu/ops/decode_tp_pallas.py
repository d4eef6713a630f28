"""Tensor-parallel decode halves for the stack kernel.

The whole-stack kernel (``decode_step_pallas.decode_stack_step``) cannot
be tensor-parallelized as ONE kernel: a decoder layer has two reduction
points (after WO and after W2) where TP shards must exchange partial
sums, and collectives cannot run mid-kernel.  This module splits the
layer at exactly those points into two Pallas half-kernels — each still
streaming its weight shard through rotating DMA buffers onto the int8
MXU — so :func:`tp_decode_step` can run them under ``shard_map`` with
one ``psum`` per half:

    attn half (per shard): rms_norm -> QKV (local heads) -> RoPE ->
        cached GQA attention over the LOCAL KV-head shard -> WO partial
    psum over the model axis, residual add (replicated)
    ffn half (per shard): ffn_norm -> ADA -> W1/W3 (local F shard) ->
        SwiGLU -> W2 partial
    psum, residual add

Per-chip weight traffic drops by 1/tp (decode is HBM-bound, so this is
the multi-chip LATENCY axis; the zero-collective throughput axis is DP,
``parallel/dp_decode.py``).  Megatron-style sharding: Q/K/V and W1/W3
column-parallel (heads / F rows), WO and W2 row-parallel — the same
layout ``parallel/mesh.py`` uses for the XLA path, here applied to the
fused stacked arrays by :func:`tp_shard_fused_weights`.

Validated against the single-chip stack kernel on a virtual CPU mesh in
``tests/test_parallel.py`` (interpret mode, tp=2); both half-kernels
also Mosaic-compile and run on a real v5e at production tp=2 local
shapes (multi-chip execution needs real multi-chip hardware).  Requires
``n_kv_heads % tp == 0`` and ``hidden % tp == 0``.

The greedy final-norm + tied lm_head is ALSO tensor-parallel:
:func:`tp_lm_head_token` shards the 131k-vocab embedding table on the
vocab axis ([V/tp, D] per chip), runs a per-shard Pallas matvec that
folds the running (max, first-argmax) across its vocab tiles — the
[B, V/tp] logits never materialize — and resolves the global argmax
with one pmax + pmin pair over the model axis (ties break to the
lowest global index, matching ``jnp.argmax``).  Sampling paths keep the
XLA lm_head, which GSPMD partitions from the parameter shardings.
Head+ring caches (unbounded streams) are supported via ``ring=``, same
semantics as the single-chip stack kernel.

Numerics: each shard quantizes its attention/SwiGLU activations with
its LOCAL row absmax — a finer-grained (not bit-identical) W8A8 scheme
than the single-chip kernel, so TP outputs agree to quantization noise,
not bitwise (the QKV activations ARE identically quantized; layer-0 K/V
match the single-chip kernel tightly).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxtral_tpu.ops.decode_step_pallas import (
    _MultiCopy,
    _g32_mask_codes,
    _g32_matmul_tile,
    _quant,
    _quant_f,
    _rope_swap,
)

Params = dict[str, Any]


def _half_plan(phases: dict[str, tuple[int, int]], wg: bool = False):
    """{name: (n_out, k_in)} -> {name: (tile, n_tiles, k_in)} or None.

    ``wg`` budgets the f32 group-scale tiles that ride along with g32
    code tiles (+12.5% bytes, decode_step_pallas g32 mode)."""
    plan = {}
    for name, (n_out, k_in) in phases.items():
        t = 512
        item = 1.125 if wg else 1.0
        while t >= 8 and (n_out % t or int(t * k_in * item) > 3 * 2**19):
            t //= 2
        if t < 8:
            return None
        plan[name] = (t, n_out // t, k_in)
    return plan


def _stream_factory(layer, plan, bufs, sems, wg=False, sbufs=None,
                    sems_s=None):
    """Double-buffered row-streaming matmul over stacked HBM weights
    (same scheme as the v1 layer kernel, one buffer per phase).

    w8 mode: weights [L, N, K] int8 + rowwise ``scale_ref`` [1, N] VMEM;
    ``xq`` is int8 activation codes.  ``wg`` (g32, exact Q4_0): weights
    [L, SB, N, 128] int8; ``scale_ref`` is the HBM group-scale stack
    [L, 4*SB, 1, N] whose tiles DMA alongside the code tiles; ``xq`` is
    f32 activation codes (``_quant_f``) masked per phase into the 4
    lane-masked stacks the group-32 dots contract."""

    def stream(name, xq, sx, w_hbm, scale_ref, n_out):
        tile_n, n_tiles, k_in = plan[name]
        buf, sem = bufs[name], sems[name]
        if wg:
            sbuf, sem_s = sbufs[name], sems_s[name]
            xms = _g32_mask_codes(xq, k_in, xq.shape[0])

            def dma(slot, j):
                return _MultiCopy([
                    pltpu.make_async_copy(
                        w_hbm.at[layer, :, pl.ds(j * tile_n, tile_n), :],
                        buf.at[slot], sem.at[slot]),
                    pltpu.make_async_copy(
                        scale_ref.at[layer, :, :,
                                     pl.ds(j * tile_n, tile_n)],
                        sbuf.at[slot], sem_s.at[slot]),
                ])
        else:
            def dma(slot, j):
                return pltpu.make_async_copy(
                    w_hbm.at[layer, pl.ds(j * tile_n, tile_n), :],
                    buf.at[slot], sem.at[slot])

        dma(0, 0).start()
        outs = []
        for j in range(n_tiles):
            if j + 1 < n_tiles:
                dma((j + 1) % 2, j + 1).start()
            dma(j % 2, j).wait()
            if wg:
                outs.append(_g32_matmul_tile(xms, sx, buf[j % 2],
                                             sbuf[j % 2]))
                continue
            z = jax.lax.dot_general(
                xq, buf[j % 2],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            outs.append(z.astype(jnp.float32) * sx
                        * scale_ref[0, j * tile_n:(j + 1) * tile_n][None, :])
        return jnp.concatenate(outs, axis=-1)

    return stream


def _spec_attn(q, k, v, kc_ref, vc_ref, ks_ref, vs_ref, offs_ref,
               B, spec, n_heads_l, n_kv_l, head_dim, window, ring,
               cache_q):
    """Speculative attention over this shard's local heads: the stack
    kernel's spec block (decode_step_pallas.py) with n_kv -> n_kv_l.

    Rows are (stream b, draft slot j), row = b*spec + j; all K rows of
    a stream share ONE cache row (``kc_ref``/``offs_ref`` carry B/spec
    rows).  Row j's query sits at offs[b] + j and additionally attends
    the FRESH K/V of rows i <= j of the same stream — a tiny causal
    block among the drafts computed in-register (K(K+1)/2 VPU dots).
    With ``cache_q``, fresh rows i < j roundtrip through the bf16
    k_new/v_new output dtype + the quantize_kv per-vector formula and
    join the cache slots' requant group, so tokens match the
    sequential int8 TP step exactly (integer-domain f32 math — codes
    are exact small integers, dots stay < 2^24)."""
    S = kc_ref.shape[-2]
    groups = n_heads_l // n_kv_l
    nq = n_heads_l * head_dim
    scale = head_dim ** -0.5
    Bl = B // spec
    kcS = kc_ref[:].reshape(Bl * n_kv_l, S, head_dim)
    vcS = vc_ref[:].reshape(Bl * n_kv_l, S, head_dim)
    if cache_q:
        ksS = ks_ref[:].reshape(Bl * n_kv_l, S)
        vsS = vs_ref[:].reshape(Bl * n_kv_l, S)
    qS = q.reshape(Bl, spec, n_heads_l, head_dim)
    kS = k.reshape(Bl, spec, n_kv_l, head_dim)
    vS = v.reshape(Bl, spec, n_kv_l, head_dim)

    def valid_spec(shape, j):
        """Cache validity for draft row j (query position offs[b] + j);
        same mask layout rules as build_valid (SMEM offsets selected
        with static-B where over a row iota — Mosaic constraints)."""
        pos = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        off3 = jnp.full(shape, jnp.int32(0))
        for b in range(Bl):
            off3 = jnp.where(row // n_kv_l == b, offs_ref[b], off3)
        if ring is None:
            p_abs = pos
            valid = pos < off3
        else:
            head_n, size = ring
            r = pos - head_n
            wr = off3 - head_n
            cycles = jnp.maximum(wr - 1 - r, 0) // size
            in_head = pos < head_n
            p_abs = jnp.where(in_head, pos, head_n + r + size * cycles)
            valid = ((in_head & (pos < off3))
                     | ((pos >= head_n) & (r < size) & (r < wr)))
        if window is not None:
            valid &= (off3 + j - p_abs) <= window
        return valid

    if cache_q:
        kbr = kS.astype(jnp.bfloat16).astype(jnp.float32)
        vbr = vS.astype(jnp.bfloat16).astype(jnp.float32)
        ksf = jnp.maximum(
            jnp.max(jnp.abs(kbr), axis=-1, keepdims=True), 1e-8) / 127.0
        kqf = jnp.clip(jnp.round(kbr / ksf), -127, 127)
        vsf = jnp.maximum(
            jnp.max(jnp.abs(vbr), axis=-1, keepdims=True), 1e-8) / 127.0
        vqf = jnp.clip(jnp.round(vbr / vsf), -127, 127)

    attn_js = []
    for j in range(spec):
        qj = qS[:, j].reshape(Bl * n_kv_l, groups, head_dim) * scale
        if cache_q:
            qa = jnp.max(jnp.abs(qj), axis=-1, keepdims=True)
            sqj = jnp.maximum(qa, 1e-8) / 127.0
            qqf = jnp.clip(jnp.round(qj / sqj), -127, 127)
            sj = jax.lax.dot_general(
                qqf.astype(jnp.int8), kcS,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * sqj * ksS[:, None, :]
        else:
            sj = jax.lax.dot_general(
                qj.astype(kcS.dtype), kcS,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        sj = jnp.where(valid_spec(sj.shape, j), sj, -jnp.inf)

        prevs = []  # fresh rows i < j within the window
        for i in range(j):
            if window is not None and (j - i) > window:
                continue  # static: drafts beyond the band
            if cache_q:
                kqi = kqf[:, i].reshape(Bl * n_kv_l, 1, head_dim)
                si = (jnp.sum(qqf * kqi, axis=-1) * sqj[..., 0]
                      * ksf[:, i].reshape(Bl * n_kv_l, 1))
            else:
                ki = kS[:, i].reshape(Bl * n_kv_l, 1, head_dim)
                si = jnp.sum(qj * ki, axis=-1)  # [Bl*Hkv_l, G]
            prevs.append((i, si))
        # Row j's own fresh K/V stays full-precision — the sequential
        # step's self_s/e_self path.
        s_self = jnp.sum(
            qj * kS[:, j].reshape(Bl * n_kv_l, 1, head_dim), axis=-1)

        m = jnp.maximum(jnp.max(sj, axis=-1), s_self)
        for _, si in prevs:
            m = jnp.maximum(m, si)
        e_cache = jnp.exp(sj - m[..., None])
        denom = jnp.sum(e_cache, axis=-1)
        if cache_q:
            # ONE requant scale group across cache slots AND fresh rows
            # i < j — in the sequential step they all sit in the same
            # cache row when ctx_of requantizes the softmax weights.
            e_w = e_cache * vsS[:, None, :]
            ea = jnp.max(jnp.abs(e_w), axis=-1, keepdims=True)
            fresh = []
            for i, si in prevs:
                e_i = jnp.exp(si - m)
                ew_i = e_i * vsf[:, i].reshape(Bl * n_kv_l, 1)
                ea = jnp.maximum(ea, jnp.abs(ew_i)[..., None])
                fresh.append((i, e_i, ew_i))
            se = jnp.maximum(ea, 1e-30) / 127.0
            eq = jnp.clip(jnp.round(e_w / se), -127, 127).astype(jnp.int8)
            ctx = jax.lax.dot_general(
                eq, vcS,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * se
            for i, e_i, ew_i in fresh:
                denom = denom + e_i
                eqi = jnp.clip(jnp.round(ew_i / se[..., 0]), -127, 127)
                ctx = ctx + (eqi[..., None]
                             * vqf[:, i].reshape(Bl * n_kv_l, 1, head_dim)
                             * se)
        else:
            ctx = jax.lax.dot_general(
                e_cache.astype(vcS.dtype), vcS,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            for i, si in prevs:
                e_i = jnp.exp(si - m)
                denom = denom + e_i
                ctx = ctx + e_i[..., None] * vS[:, i].reshape(
                    Bl * n_kv_l, 1, head_dim)
        e_self = jnp.exp(s_self - m)
        denom = denom + e_self
        ctx = ctx + e_self[..., None] * vS[:, j].reshape(
            Bl * n_kv_l, 1, head_dim)
        attn_js.append((ctx / denom[..., None]).reshape(Bl, nq))
    return jnp.stack(attn_js, axis=1).reshape(B, nq)


def _make_attn_half(B, D, S, n_heads_l, n_kv_l, head_dim, plan, eps, window,
                    ring, cache_q=False, cache_chunk=None, spec=1,
                    wg=False):
    """Attention half on a head shard; emits the WO PARTIAL (no residual
    add — the caller psums partials across shards first).

    ``cache_q``: int8 KV cache with per-vector scales (both attention
    contractions ride the int8 MXU — the K scale factors out of the
    head_dim dot, the V scale folds into the requantized softmax
    weights), same scheme as the single-chip stack kernel.
    ``cache_chunk``: the cache stays in HBM (the kernel receives the
    FULL local stack [L, B, Hkv_l, S, hd] plus the layer index) and
    streams through double-buffered S-chunks with an online softmax —
    VMEM no longer bounds S on the TP latency axis either.
    ``spec=K > 1``: speculative K-token verification on this head shard
    — rows are (stream b, draft slot j), row = b*spec + j; the cache
    refs and ``offs_ref`` carry ONE row per stream (B/spec), and row j
    additionally attends the fresh K/V of rows i <= j of its stream
    (decode_step_pallas.py's spec contract applied to the local heads).
    ``wg``: g32 (exact-Q4_0) weight mode — the qkv/wo stacks are
    [L, SB, N_l, 128] int8 codes and the scale operands are the HBM
    group-scale stacks [L, 4*SB, 1, N_l] (decode_step_pallas g32 mode
    applied per shard); activations quantize via ``_quant_f``.
    """
    nq = n_heads_l * head_dim
    nkv = n_kv_l * head_dim
    nqkv = nq + 2 * nkv
    groups = n_heads_l // n_kv_l
    scale = head_dim ** -0.5
    prep = _quant_f if wg else _quant

    def kernel(*refs):
        # Optional int8-cache scale refs sit right after vc_ref; g32 mode
        # appends its scale buffers + semaphores, then chunked mode's
        # (kbuf, vbuf, sem_kv) scratch at the very end.
        if cache_chunk:
            kbuf, vbuf, sem_kv = refs[-3:]
            refs = refs[:-3]
        if wg:
            sbuf_qkv, sbuf_wo, sem_s_qkv, sem_s_wo = refs[-4:]
            refs = refs[:-4]
        (layer_ref, offs_ref,
         x_ref, attn_norm_ref, sqkv_ref, so_ref, cos_ref, sin_ref,
         kc_ref, vc_ref) = refs[:10]
        idx = 10
        if cache_q:
            ks_ref, vs_ref = refs[idx:idx + 2]
            idx += 2
        (wqkv_hbm, wo_hbm,
         yo_ref, kn_ref, vn_ref,
         buf_qkv, buf_wo, sem_qkv, sem_wo) = refs[idx:idx + 9]
        layer = layer_ref[0]
        stream = _stream_factory(
            layer, plan,
            {"qkv": buf_qkv, "wo": buf_wo},
            {"qkv": sem_qkv, "wo": sem_wo},
            wg=wg,
            sbufs={"qkv": sbuf_qkv, "wo": sbuf_wo} if wg else None,
            sems_s={"qkv": sem_s_qkv, "wo": sem_s_wo} if wg else None)

        x = x_ref[:].astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        h = x * jax.lax.rsqrt(var + eps) * attn_norm_ref[0][None, :]
        xq, sx = prep(h)
        qkv = stream("qkv", xq, sx, wqkv_hbm, sqkv_ref, nqkv)
        q = qkv[:, :nq].reshape(B, n_heads_l, head_dim)
        k = qkv[:, nq:nq + nkv].reshape(B, n_kv_l, head_dim)
        v = qkv[:, nq + nkv:].reshape(B, n_kv_l, head_dim)

        c, s = cos_ref[:], sin_ref[:]
        q = q * c + _rope_swap(q) * s
        ck, sk_ = cos_ref[:, :n_kv_l, :], sin_ref[:, :n_kv_l, :]
        k = k * ck + _rope_swap(k) * sk_
        kn_ref[:] = k.astype(kn_ref.dtype)
        vn_ref[:] = v.astype(vn_ref.dtype)

        if spec > 1:
            attn = _spec_attn(
                q, k, v, kc_ref, vc_ref,
                ks_ref if cache_q else None,
                vs_ref if cache_q else None,
                offs_ref, B, spec, n_heads_l, n_kv_l, head_dim,
                window, ring, cache_q)
            xq, sx = prep(attn)
            yo_ref[:] = stream("wo", xq, sx, wo_hbm, so_ref, D)
            return

        # Head-major local cache [B, Hkv_l, S, hd]; MXU contractions.
        qg = q.reshape(B * n_kv_l, groups, head_dim) * scale
        if cache_q:
            qa = jnp.max(jnp.abs(qg), axis=-1, keepdims=True)
            sq = jnp.maximum(qa, 1e-8) / 127.0
            qq = jnp.clip(jnp.round(qg / sq), -127, 127).astype(jnp.int8)

        def build_valid(shape, base):
            """Per-row validity for a score tile whose slot axis maps to
            absolute cache slot base + s (same mask composition as the
            single-chip stack kernel: SMEM offsets selected with
            static-B where over a row iota; ring map and window bound
            as pure &/| — Mosaic layout constraints)."""
            pos = base + jax.lax.broadcasted_iota(jnp.int32, shape, 2)
            row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            off3 = jnp.full(shape, jnp.int32(0))
            for b in range(B):
                off3 = jnp.where(row // n_kv_l == b, offs_ref[b], off3)
            if ring is None:
                p_abs = pos
                valid = pos < off3
            else:
                # Head+ring cache, same slot->position map as the
                # single-chip stack kernel: slots [0, head) are
                # permanent; ring slot r holds the largest
                # p = head + r + size*c below offs.
                head_n, size = ring
                r = pos - head_n
                wr = off3 - head_n
                cycles = jnp.maximum(wr - 1 - r, 0) // size
                in_head = pos < head_n
                p_abs = jnp.where(in_head, pos, head_n + r + size * cycles)
                valid = ((in_head & (pos < off3))
                         | ((pos >= head_n) & (r < size) & (r < wr)))
            if window is not None:
                valid &= (off3 - p_abs) <= window
            return valid

        def scores_of(kcc, sc, base):
            """Masked scores for one K tile [B*Hkv_l, Sc, hd]."""
            if cache_q:
                sc_ = jax.lax.dot_general(
                    qq, kcc,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * sq * sc[:, None, :]
            else:
                sc_ = jax.lax.dot_general(
                    qg.astype(kcc.dtype), kcc,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [B*Hkv_l, G, Sc]
            return jnp.where(build_valid(sc_.shape, base), sc_, -jnp.inf)

        def ctx_of(e, vcc, vsc):
            """softmax-weight x V tile contraction (int8 folds the
            per-position V scale into the weights and requantizes)."""
            if cache_q:
                e_w = e * vsc[:, None, :]
                ea = jnp.max(jnp.abs(e_w), axis=-1, keepdims=True)
                se = jnp.maximum(ea, 1e-30) / 127.0
                eq = jnp.clip(jnp.round(e_w / se), -127, 127
                              ).astype(jnp.int8)
                return jax.lax.dot_general(
                    eq, vcc,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * se
            return jax.lax.dot_general(
                e.astype(vcc.dtype), vcc,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        kf = k.reshape(B * n_kv_l, 1, head_dim)
        self_s = jnp.sum(qg * kf, axis=-1)

        if cache_chunk:
            # HBM-resident local cache stack, streamed in double-buffered
            # S-chunks with an online softmax (decode_step_pallas's
            # chunked mode applied to the head shard).  Dynamic chunk
            # bounds: only chunks intersecting the union of the rows'
            # valid slot ranges are streamed.
            Sc = cache_chunk
            n_ch = S // Sc
            max_off = offs_ref[0]
            min_off = offs_ref[0]
            for b in range(1, B):
                max_off = jnp.maximum(max_off, offs_ref[b])
                min_off = jnp.minimum(min_off, offs_ref[b])
            if ring is None:
                used = max_off
                lo_pos = (jnp.maximum(min_off - window, 0)
                          if window is not None else 0)
            else:
                used = jnp.minimum(max_off, ring[0] + ring[1])
                lo_pos = 0
            c_lo = lo_pos // Sc
            n_used = jnp.minimum((used + Sc - 1) // Sc, n_ch)

            def kv_dma(ci, slot):
                return (
                    pltpu.make_async_copy(
                        kc_ref.at[layer, :, :, pl.ds(ci * Sc, Sc), :],
                        kbuf.at[slot], sem_kv.at[0, slot]),
                    pltpu.make_async_copy(
                        vc_ref.at[layer, :, :, pl.ds(ci * Sc, Sc), :],
                        vbuf.at[slot], sem_kv.at[1, slot]),
                )

            @pl.when(c_lo < n_used)
            def _():
                for cp in kv_dma(c_lo, jax.lax.rem(c_lo, 2)):
                    cp.start()

            # Finite -1e30 init keeps every carry finite (an all-masked
            # chunk leaves m at -1e30; its weights are exactly 0).
            m0 = jnp.full((B * n_kv_l, groups), -1e30, jnp.float32)
            d0 = jnp.zeros((B * n_kv_l, groups), jnp.float32)
            c0 = jnp.zeros((B * n_kv_l, groups, head_dim), jnp.float32)

            def chunk_body(ci, carry):
                m_r, d_r, ctx_r = carry

                @pl.when(ci + 1 < n_used)
                def _():
                    nxt = jax.lax.rem(ci + 1, 2)
                    for cp in kv_dma(ci + 1, nxt):
                        cp.start()

                slot = jax.lax.rem(ci, 2)
                for cp in kv_dma(ci, slot):
                    cp.wait()
                kcc = kbuf[slot].reshape(B * n_kv_l, Sc, head_dim)
                vcc = vbuf[slot].reshape(B * n_kv_l, Sc, head_dim)
                if cache_q:
                    ksc = ks_ref[:, :, pl.ds(ci * Sc, Sc)].reshape(
                        B * n_kv_l, Sc)
                    vsc = vs_ref[:, :, pl.ds(ci * Sc, Sc)].reshape(
                        B * n_kv_l, Sc)
                else:
                    ksc = vsc = None
                sc_ = scores_of(kcc, ksc, ci * Sc)
                m_new = jnp.maximum(m_r, jnp.max(sc_, axis=-1))
                alpha = jnp.exp(m_r - m_new)
                e = jnp.exp(sc_ - m_new[..., None])
                d_new = d_r * alpha + jnp.sum(e, axis=-1)
                ctx_new = ctx_r * alpha[..., None] + ctx_of(e, vcc, vsc)
                return m_new, d_new, ctx_new

            m, denom, ctx = jax.lax.fori_loop(
                c_lo, n_used, chunk_body, (m0, d0, c0))
            m_f = jnp.maximum(m, self_s)
            alpha = jnp.exp(m - m_f)
            e_self = jnp.exp(self_s - m_f)
            denom = denom * alpha + e_self
            ctx = (ctx * alpha[..., None]
                   + e_self[..., None] * v.reshape(B * n_kv_l, 1, head_dim))
        else:
            kc = kc_ref[:].reshape(B * n_kv_l, S, head_dim)
            vc = vc_ref[:].reshape(B * n_kv_l, S, head_dim)
            if cache_q:
                ks = ks_ref[:].reshape(B * n_kv_l, S)
                vs = vs_ref[:].reshape(B * n_kv_l, S)
            else:
                ks = vs = None
            scores = scores_of(kc, ks, 0)
            m = jnp.maximum(jnp.max(scores, axis=-1), self_s)
            e_cache = jnp.exp(scores - m[..., None])
            e_self = jnp.exp(self_s - m)
            denom = jnp.sum(e_cache, axis=-1) + e_self
            ctx = ctx_of(e_cache, vc, vs)
            ctx = ctx + e_self[..., None] * v.reshape(B * n_kv_l, 1,
                                                      head_dim)
        attn = (ctx / denom[..., None]).reshape(B, nq)

        xq, sx = prep(attn)
        yo_ref[:] = stream("wo", xq, sx, wo_hbm, so_ref, D)

    return kernel


def _make_ffn_half(B, D, hidden_l, plan, eps, wg=False):
    """FFN half on an F shard; emits the W2 PARTIAL.  ``wg``: g32
    weight mode (same contract as :func:`_make_attn_half`)."""
    prep = _quant_f if wg else _quant

    def kernel(*refs):
        if wg:
            sbuf_13, sbuf_2, sem_s_13, sem_s_2 = refs[-4:]
            refs = refs[:-4]
        (layer_ref,
         x_ref, ffn_norm_ref, ada_ref, s13_ref, s2_ref,
         w13_hbm, w2_hbm,
         zo_ref,
         buf_13, buf_2, sem_13, sem_2) = refs
        layer = layer_ref[0]
        stream = _stream_factory(
            layer, plan,
            {"w13": buf_13, "w2": buf_2},
            {"w13": sem_13, "w2": sem_2},
            wg=wg,
            sbufs={"w13": sbuf_13, "w2": sbuf_2} if wg else None,
            sems_s={"w13": sem_s_13, "w2": sem_s_2} if wg else None)

        x = x_ref[:].astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        h = x * jax.lax.rsqrt(var + eps) * ffn_norm_ref[0][None, :]
        h = h * ada_ref[0][None, :]
        xq, sx = prep(h)
        up = stream("w13", xq, sx, w13_hbm, s13_ref, 2 * hidden_l)
        gate, upv = up[:, :hidden_l], up[:, hidden_l:]
        hmid = gate * jax.nn.sigmoid(gate) * upv
        xq, sx = prep(hmid)
        zo_ref[:] = stream("w2", xq, sx, w2_hbm, s2_ref, D)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_heads_l", "n_kv_l", "head_dim", "eps", "interpret",
                     "window", "ring", "cache_chunk", "spec"),
)
def attn_half_step(
    x, layer, offsets, attn_norm, sqkv, so, cos_b, sin_b,
    k_cache_l, v_cache_l, wqkv, wo,
    k_scales_l=None, v_scales_l=None,
    n_heads_l=16, n_kv_l=4, head_dim=128, eps=1e-5, interpret=False,
    window=None, ring=None, cache_chunk=None, spec=1,
):
    """One layer's attention half on this shard's heads.

    x [B, D]; per-layer vectors attn_norm [D], sqkv [nqkv_l], so [D];
    per-layer LOCAL head-major caches [B, Hkv_l, S, hd]; stacked local
    weights wqkv [L, nqkv_l, D] int8, wo [L, D, nq_l]; cos_b/sin_b [hd]
    or per-row [B, hd].  offsets scalar or per-row [B].
    Returns (wo_partial [B, D], k_new, v_new [B, Hkv_l, hd]).

    int8 KV cache: pass int8 caches + per-vector ``k_scales_l`` /
    ``v_scales_l`` [B, Hkv_l, S] f32 — k_new/v_new come back bf16 for
    the caller to quantize + append (decode_stack_step semantics).
    ``cache_chunk``: the caches are the FULL local stacks
    [L, B, Hkv_l, S, hd], kept in HBM and streamed through
    double-buffered S-chunks (S must be a multiple of the chunk).
    ``spec=K > 1``: speculative verification — x/cos/sin carry
    B = streams*K rows while caches/scales/offsets carry one row per
    STREAM (B/spec); incompatible with ``cache_chunk`` (per-chunk
    requant groups cannot be joined exactly).

    g32 (exact-Q4_0) weight mode is selected by shape: ``wqkv``
    [L, SB_D, nqkv_l, 128] int8 / ``wo`` [L, SB_nq, D, 128] int8 with
    ``sqkv``/``so`` the matching HBM group-scale stacks [L, 4*SB, 1, N]
    (tp_shard_fused_weights_q4g); needs D % 128 and nq_l % 128.
    """
    B, D = x.shape
    S = k_cache_l.shape[-2]
    nq = n_heads_l * head_dim
    nqkv = nq + 2 * n_kv_l * head_dim
    wg = wqkv.ndim == 4
    if wg and (D % 128 or nq % 128):
        raise ValueError(
            f"g32 attn half needs D ({D}) and local nq ({nq}) % 128")
    plan = _half_plan({"qkv": (nqkv, D), "wo": (D, nq)}, wg=wg)
    if plan is None:
        raise ValueError("attn_half_step: dims not tileable")
    cache_q = k_cache_l.dtype == jnp.int8
    if cache_q and (k_scales_l is None or v_scales_l is None):
        raise ValueError("int8 KV cache needs k_scales_l/v_scales_l")
    if spec > 1:
        if B % spec:
            raise ValueError(f"spec={spec} must divide the row count {B}")
        if cache_chunk is not None:
            raise ValueError("speculative decode + cache_chunk unsupported")
    Bc = B // spec  # cache rows (= logical streams)
    if cache_chunk is None and k_cache_l.shape[0] != Bc:
        raise ValueError(
            f"cache rows {k_cache_l.shape[0]} != streams {Bc} (= B/spec)")
    if cache_chunk is not None:
        if S % cache_chunk:
            raise ValueError(
                f"cache_chunk {cache_chunk} must divide S {S}")
        if k_cache_l.ndim != 5:
            raise ValueError(
                "chunked mode takes the full [L, B, Hkv_l, S, hd] stacks")
    kernel = _make_attn_half(B, D, S, n_heads_l, n_kv_l, head_dim, plan,
                             eps, window, ring, cache_q=cache_q,
                             cache_chunk=cache_chunk, spec=spec, wg=wg)

    offs = jnp.broadcast_to(jnp.asarray(offsets, jnp.int32).reshape(-1),
                            (Bc,))
    cos3 = jnp.broadcast_to(
        jnp.asarray(cos_b, jnp.float32).reshape(-1, 1, head_dim),
        (B, n_heads_l, head_dim))
    sin3 = jnp.broadcast_to(
        jnp.asarray(sin_b, jnp.float32).reshape(-1, 1, head_dim),
        (B, n_heads_l, head_dim))

    cache_space = pl.ANY if cache_chunk else pltpu.VMEM
    scale_space = pl.ANY if wg else pltpu.VMEM  # g32: HBM scale stacks
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=scale_space)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=cache_space)] * 2
        + ([pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 if cache_q else [])
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2
    )
    if wg:
        scratch = [
            pltpu.VMEM((2, D // 128, plan["qkv"][0], 128), jnp.int8),
            pltpu.VMEM((2, nq // 128, plan["wo"][0], 128), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        scratch = [
            pltpu.VMEM((2, plan["qkv"][0], D), jnp.int8),
            pltpu.VMEM((2, plan["wo"][0], nq), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if wg:
        scratch += [
            pltpu.VMEM((2, 4 * (D // 128), 1, plan["qkv"][0]), jnp.float32),
            pltpu.VMEM((2, 4 * (nq // 128), 1, plan["wo"][0]), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if cache_chunk:
        scratch += [
            pltpu.VMEM((2, B, n_kv_l, cache_chunk, head_dim),
                       k_cache_l.dtype),
            pltpu.VMEM((2, B, n_kv_l, cache_chunk, head_dim),
                       v_cache_l.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        scratch_shapes=scratch,
    )
    kv_out = jnp.bfloat16 if cache_q else k_cache_l.dtype
    operands = [
        x.astype(jnp.float32),
        attn_norm.astype(jnp.float32).reshape(1, D),
        (sqkv if wg else sqkv.astype(jnp.float32).reshape(1, nqkv)),
        (so if wg else so.astype(jnp.float32).reshape(1, D)),
        cos3, sin3,
        k_cache_l, v_cache_l,
    ]
    if cache_q:
        operands += [
            k_scales_l.astype(jnp.float32).reshape(Bc, n_kv_l, S),
            v_scales_l.astype(jnp.float32).reshape(Bc, n_kv_l, S),
        ]
    need = tp_attn_half_vmem(B, S, D, n_heads_l, n_kv_l, head_dim,
                             jnp.dtype(k_cache_l.dtype).itemsize,
                             cache_chunk, spec=spec)
    limit = max(64 * 2**20, min(116 * 2**20, need))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, n_kv_l, head_dim), kv_out),
            jax.ShapeDtypeStruct((B, n_kv_l, head_dim), kv_out),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=limit),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1), offs,
        *operands,
        wqkv, wo,
    )


@functools.partial(
    jax.jit,
    static_argnames=("eps", "interpret"),
)
def ffn_half_step(
    x, layer, ffn_norm, ada_vec, s13, s2, w13, w2,
    eps=1e-5, interpret=False,
):
    """One layer's FFN half on this shard's F rows.

    x [B, D] (post-psum attention residual); per-layer vectors
    ffn_norm/ada_vec [D], s13 [2F_l], s2 [D]; stacked local weights
    w13 [L, 2F_l, D] int8, w2 [L, D, F_l].  Returns w2_partial [B, D].

    g32 (exact-Q4_0) mode is selected by shape: w13 [L, SB_D, 2F_l, 128]
    / w2 [L, SB_F, D, 128] int8 codes with s13/s2 the HBM group-scale
    stacks [L, 4*SB, 1, N]; needs D % 128 and F_l % 128.
    """
    B, D = x.shape
    wg = w13.ndim == 4
    hidden_l = (w13.shape[2] // 2) if wg else w2.shape[2]
    if wg and (D % 128 or hidden_l % 128):
        raise ValueError(
            f"g32 ffn half needs D ({D}) and local F ({hidden_l}) % 128")
    plan = _half_plan({"w13": (2 * hidden_l, D), "w2": (D, hidden_l)},
                      wg=wg)
    if plan is None:
        raise ValueError("ffn_half_step: dims not tileable")
    kernel = _make_ffn_half(B, D, hidden_l, plan, eps, wg=wg)

    scale_space = pl.ANY if wg else pltpu.VMEM
    if wg:
        scratch = [
            pltpu.VMEM((2, D // 128, plan["w13"][0], 128), jnp.int8),
            pltpu.VMEM((2, hidden_l // 128, plan["w2"][0], 128), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 4 * (D // 128), 1, plan["w13"][0]), jnp.float32),
            pltpu.VMEM((2, 4 * (hidden_l // 128), 1, plan["w2"][0]),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        scratch = [
            pltpu.VMEM((2, plan["w13"][0], D), jnp.int8),
            pltpu.VMEM((2, plan["w2"][0], hidden_l), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=scale_space)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),),
        scratch_shapes=scratch,
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, D), jnp.float32),),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x.astype(jnp.float32),
        ffn_norm.astype(jnp.float32).reshape(1, D),
        ada_vec.astype(jnp.float32).reshape(1, D),
        (s13 if wg else s13.astype(jnp.float32).reshape(1, 2 * hidden_l)),
        (s2 if wg else s2.astype(jnp.float32).reshape(1, D)),
        w13, w2,
    )
    return out


def tp_shard_fused_weights(fused: Params, n_heads: int, n_kv: int,
                           head_dim: int, hidden: int, tp: int) -> Params:
    """Reshard the fused stacked decode weights for ``tp`` shards.

    Returns arrays with a LEADING shard axis (shard_map slices it via
    ``P('model', ...)``): wqkv [tp, L, nqkv_l, D] (the q/k/v segments of
    each shard re-concatenated), wo [tp, L, D, nq_l], w13
    [tp, L, 2*F_l, D] (w1/w3 halves re-concatenated), w2
    [tp, L, D, F_l], plus matching scale stacks.
    """
    if n_kv % tp or hidden % tp:
        raise ValueError(f"tp={tp} must divide n_kv={n_kv} and "
                         f"hidden={hidden}")
    nq, nkv = n_heads * head_dim, n_kv * head_dim
    nq_l, nkv_l = nq // tp, nkv // tp
    f = hidden

    def seg3(a, starts_sizes):
        # Slice segments along axis 1 of [L, N, ...] and re-concat.
        return jnp.concatenate(
            [jax.lax.slice_in_dim(a, s, s + n, axis=1)
             for s, n in starts_sizes], axis=1)

    def shard_qkv(a, i):
        return seg3(a, [(i * nq_l, nq_l),
                        (nq + i * nkv_l, nkv_l),
                        (nq + nkv + i * nkv_l, nkv_l)])

    def shard_13(a, i):
        fl = f // tp
        return seg3(a, [(i * fl, fl), (f + i * fl, fl)])

    out = {
        "wqkv": jnp.stack([shard_qkv(fused["wqkv"], i) for i in range(tp)]),
        "sqkv": jnp.stack([shard_qkv(fused["sqkv"][:, :, None], i)[:, :, 0]
                           if fused["sqkv"].ndim == 2
                           else shard_qkv(fused["sqkv"], i)
                           for i in range(tp)]),
        "wo": jnp.stack([fused["wo"][:, :, i * nq_l:(i + 1) * nq_l]
                         for i in range(tp)]),
        "so": jnp.stack([fused["so"]] * tp),  # full-D rows, replicated
        "w13": jnp.stack([shard_13(fused["w13"], i) for i in range(tp)]),
        "s13": jnp.stack([shard_13(fused["s13"][:, :, None], i)[:, :, 0]
                          if fused["s13"].ndim == 2
                          else shard_13(fused["s13"], i)
                          for i in range(tp)]),
        "w2": jnp.stack([fused["w2"][:, :, i * (f // tp):(i + 1) * (f // tp)]
                         for i in range(tp)]),
        "s2": jnp.stack([fused["s2"]] * tp),
    }
    return out


def tp_shard_fused_weights_q4g(fused: Params, n_heads: int, n_kv: int,
                               head_dim: int, hidden: int, tp: int) -> Params:
    """Reshard g32 (exact-Q4_0) fused stacks for ``tp`` shards.

    ``fused`` from ``decode_step_pallas.fuse_decode_weights_q4g``: codes
    [L, SB, N, 128] int8 + group scales [L, 4*SB, 1, N] f32 per phase.
    Megatron layout like :func:`tp_shard_fused_weights` — qkv/w13
    column-parallel (the N axis, in q/k/v and w1/w3 segments), wo/w2
    row-parallel (the contraction axis = whole superblocks, with the
    r-major scale rows re-gathered per shard).  Returns arrays with a
    LEADING shard axis: codes [tp, L, SB_l, N_l, 128], scales
    [tp, L, 4*SB_l, 1, N_l].  Requires the LOCAL contraction dims % 128
    (nq/tp and hidden/tp) — the group-32 dots contract whole 128-lane
    superblocks.
    """
    if n_kv % tp or hidden % tp:
        raise ValueError(f"tp={tp} must divide n_kv={n_kv} and "
                         f"hidden={hidden}")
    nq, nkv = n_heads * head_dim, n_kv * head_dim
    nq_l, nkv_l = nq // tp, nkv // tp
    f = hidden
    fl = f // tp
    if nq_l % 128 or fl % 128:
        raise ValueError(
            f"q4g TP needs local contraction dims % 128 "
            f"(nq/tp={nq_l}, hidden/tp={fl})")

    def segN(a, starts_sizes, axis):
        return jnp.concatenate(
            [jax.lax.slice_in_dim(a, s, s + n, axis=axis)
             for s, n in starts_sizes], axis=axis)

    def shard_qkv(a, i, axis):
        return segN(a, [(i * nq_l, nq_l),
                        (nq + i * nkv_l, nkv_l),
                        (nq + nkv + i * nkv_l, nkv_l)], axis)

    def shard_13(a, i, axis):
        return segN(a, [(i * fl, fl), (f + i * fl, fl)], axis)

    def shard_k(codes, scales, i, k_l):
        # Row-parallel: shard whole superblocks of the contraction axis.
        # The r-major scale layout interleaves the 4 in-superblock groups
        # ([L, 4, SB, 1, N] flattened), so re-gather the shard's rows.
        sbl = k_l // 128
        c = jax.lax.slice_in_dim(codes, i * sbl, (i + 1) * sbl, axis=1)
        ll, sb4, one, n = scales.shape
        s = scales.reshape(ll, 4, sb4 // 4, 1, n)[:, :, i * sbl:(i + 1) * sbl]
        return c, s.reshape(ll, 4 * sbl, 1, n)

    wo_sh = [shard_k(fused["wo"], fused["so"], i, nq_l) for i in range(tp)]
    w2_sh = [shard_k(fused["w2"], fused["s2"], i, fl) for i in range(tp)]
    return {
        "wqkv": jnp.stack([shard_qkv(fused["wqkv"], i, 2)
                           for i in range(tp)]),
        "sqkv": jnp.stack([shard_qkv(fused["sqkv"], i, 3)
                           for i in range(tp)]),
        "wo": jnp.stack([c for c, _ in wo_sh]),
        "so": jnp.stack([s for _, s in wo_sh]),
        "w13": jnp.stack([shard_13(fused["w13"], i, 2)
                          for i in range(tp)]),
        "s13": jnp.stack([shard_13(fused["s13"], i, 3)
                          for i in range(tp)]),
        "w2": jnp.stack([c for c, _ in w2_sh]),
        "s2": jnp.stack([s for _, s in w2_sh]),
    }


def tp_decode_step(
    mesh, x, offsets,
    attn_norms, ffn_norms, ada_vecs, tp_w,
    cos_b, sin_b, k_cache, v_cache,
    k_scales=None, v_scales=None,
    n_heads=32, n_kv=8, head_dim=128, eps=1e-5, interpret=False,
    window=None, ring=None, cache_chunk=None, spec=1,
    model_axis="model", data_axis=None,
):
    """All decoder layers of one decode token, tensor-parallel.

    ``tp_w`` from :func:`tp_shard_fused_weights` (leading shard axis);
    caches head-major [L, B, Hkv, S, hd] sharded on the KV-head axis;
    x/norms replicated.  Runs the attn/ffn half-kernels per layer under
    ``shard_map`` with a psum at each reduction point.  Returns
    (x_out [B, D], k_new, v_new [L, B, Hkv, hd]) like the single-chip
    stack kernel.  The final norm / lm_head are the caller's: greedy
    decoding uses :func:`tp_lm_head_token` (vocab-sharded fold), other
    paths the auto-partitioned XLA lm_head.  ``ring``: static
    (head, size) head+ring cache layout for unbounded streams, same
    slot->position semantics as the single-chip stack kernel.

    int8 KV cache: int8 caches + per-vector ``k_scales``/``v_scales``
    [L, B, Hkv, S] f32 (sharded on the head axis like the caches);
    k_new/v_new come back bf16 for the caller to quantize + append —
    exactly decode_stack_step's contract.  ``cache_chunk`` keeps the
    caches in HBM, streamed through double-buffered S-chunks inside the
    attention halves (VMEM no longer bounds S under TP).

    ``data_axis``: optionally ALSO shard the batch dimension over a
    second mesh axis (DP x TP composition on one mesh — each (data,
    model) shard decodes B/dp rows against its weight shard; the psums
    stay model-axis-only, so the data axis adds zero collectives).
    Requires ``B % mesh.shape[data_axis] == 0``.

    ``spec=K > 1``: speculative K-token verification — x/cos/sin carry
    B = streams*K rows (stream-major) while offsets/caches/scales carry
    one row per STREAM; with ``data_axis`` the STREAM count must divide
    it so every (stream, draft) row group lands on one shard with its
    cache.  Incompatible with ``cache_chunk``.
    """
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape[model_axis]
    n_heads_l, n_kv_l = n_heads // tp, n_kv // tp
    L = attn_norms.shape[0]
    cache_q = k_cache.dtype == jnp.int8
    if cache_q and (k_scales is None or v_scales is None):
        raise ValueError("int8 KV cache needs k_scales/v_scales")
    if spec > 1:
        if x.shape[0] % spec:
            raise ValueError(
                f"spec={spec} must divide the row count {x.shape[0]}")
        if cache_chunk:
            raise ValueError("speculative decode + cache_chunk unsupported")
    Bc = x.shape[0] // spec  # cache rows (= logical streams)
    offs = jnp.broadcast_to(
        jnp.asarray(offsets, jnp.int32).reshape(-1), (Bc,))
    cos2 = jnp.broadcast_to(
        jnp.asarray(cos_b, jnp.float32).reshape(-1, head_dim),
        (x.shape[0], head_dim))
    sin2 = jnp.broadcast_to(
        jnp.asarray(sin_b, jnp.float32).reshape(-1, head_dim),
        (x.shape[0], head_dim))

    da = data_axis
    if da is not None and Bc % mesh.shape[da]:
        raise ValueError(
            f"streams {Bc} (rows {x.shape[0]} / spec {spec}) not "
            f"divisible by mesh axis {da}={mesh.shape[da]}")
    rep = P(da, None) if da is not None else P()
    offs_spec = P(da) if da is not None else P()
    vec_spec = P()                  # per-layer norm/scale vectors
    shard0 = P(model_axis)          # leading shard axis (squeezed inside)
    cache_spec = P(None, da, model_axis, None, None)
    scale_spec = P(None, da, model_axis, None)

    # g32 (exact-Q4_0) TP stacks: codes [tp, L, SB, N_l, 128] (5D) with
    # matching group-scale stacks — the scale stacks stay whole (the
    # half-kernels DMA their tiles from HBM per layer) instead of being
    # scanned as per-layer VMEM vectors.
    wg = tp_w["wqkv"].ndim == 5

    def shard_fn(x, offs, cos2, sin2, an, fn, ad,
                 wqkv, sqkv, wo, so, w13, s13, w2, s2, kc, vc, ks, vs):
        wqkv, sqkv, wo, so = wqkv[0], sqkv[0], wo[0], so[0]
        w13, s13, w2, s2 = w13[0], s13[0], w2[0], s2[0]

        def layer_body(xc, inp):
            if cache_chunk:
                # Chunked mode: the attention half DMA-slices layer l
                # out of the FULL HBM-resident local stacks itself —
                # scanning the caches would materialize an HBM->VMEM
                # copy of a whole layer's cache per step.
                (l, an_l, fn_l, ad_l, *per_l) = inp
                k_l, v_l = kc, vc
            else:
                (l, an_l, fn_l, ad_l, *per_l) = inp
                k_l, v_l = per_l[0], per_l[1]
                per_l = per_l[2:]
            if wg:
                sq_l, so_l, s13_l, s2_l = sqkv, so, s13, s2
            else:
                sq_l, so_l, s13_l, s2_l = per_l[:4]
                per_l = per_l[4:]
            scale_kw = (dict(k_scales_l=per_l[-2], v_scales_l=per_l[-1])
                        if cache_q else {})
            y, k_new, v_new = attn_half_step(
                xc, l, offs, an_l, sq_l, so_l, cos2, sin2, k_l, v_l,
                wqkv, wo, n_heads_l=n_heads_l, n_kv_l=n_kv_l,
                head_dim=head_dim, eps=eps, interpret=interpret,
                window=window, ring=ring, cache_chunk=cache_chunk,
                spec=spec, **scale_kw)
            xc = xc + jax.lax.psum(y, model_axis)
            z = ffn_half_step(
                xc, l, fn_l, ad_l, s13_l, s2_l, w13, w2,
                eps=eps, interpret=interpret)
            xc = xc + jax.lax.psum(z, model_axis)
            return xc, (k_new, v_new)

        xs = (jnp.arange(L, dtype=jnp.int32), an, fn, ad)
        if not cache_chunk:
            xs += (kc, vc)
        if not wg:
            xs += (sqkv, so, s13, s2)
        if cache_q:
            xs += (ks, vs)
        x_out, (kn, vn) = jax.lax.scan(layer_body, x, xs)
        return x_out, kn, vn

    if not cache_q:
        # Zero-size placeholders keep shard_fn's arity static (shard_map
        # in_specs must match positionally).
        k_scales = v_scales = jnp.zeros((L, Bc, n_kv, 0), jnp.float32)
    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep, offs_spec, rep, rep, vec_spec, vec_spec, vec_spec,
                  shard0, shard0, shard0, shard0,
                  shard0, shard0, shard0, shard0,
                  cache_spec, cache_spec, scale_spec, scale_spec),
        out_specs=(rep,
                   P(None, da, model_axis, None),
                   P(None, da, model_axis, None)),
        check_vma=False,
    )(x, offs, cos2, sin2,
      attn_norms.astype(jnp.float32), ffn_norms.astype(jnp.float32),
      ada_vecs.astype(jnp.float32),
      tp_w["wqkv"], tp_w["sqkv"], tp_w["wo"], tp_w["so"],
      tp_w["w13"], tp_w["s13"], tp_w["w2"], tp_w["s2"],
      k_cache, v_cache, k_scales, v_scales)


# ---------------------------------------------------------------------------
# Tensor-parallel greedy lm_head: vocab-sharded table, per-shard Pallas
# matvec with an in-kernel (max, first-argmax) fold, one pmax+pmin pair
# to resolve the global token.
# ---------------------------------------------------------------------------


def tp_attn_half_vmem(B, S, D, n_heads_l, n_kv_l, head_dim,
                      cache_itemsize=2, cache_chunk=None, spec=1) -> int:
    """VMEM bytes the attention half-kernel needs at this LOCAL shard
    geometry (cache blocks or chunk double-buffers + weight tile buffers
    + activations) — used to size its ``vmem_limit_bytes``.  ``spec``:
    B counts QUERY rows (streams*K); the cache terms use B/spec."""
    Bc = B // spec
    if cache_chunk:
        cache = 4 * Bc * n_kv_l * cache_chunk * head_dim * cache_itemsize
        if cache_itemsize == 1:
            cache += 2 * Bc * n_kv_l * S * 4  # resident scale operands
    else:
        cache = 2 * Bc * n_kv_l * S * head_dim * cache_itemsize
        if cache_itemsize == 1:
            cache += 2 * Bc * n_kv_l * S * 4
    bufs = 2 * 2 * 3 * 2**19          # 2 phases x 2 slots x tile budget
    nqkv_l = (n_heads_l + 2 * n_kv_l) * head_dim
    acts = 4 * B * max(D, nqkv_l) * 4
    return cache + bufs + acts + 4 * 2**20


def tp_vmem_need(B, S, D, n_heads, n_kv, head_dim, hidden, tp,
                 cache_itemsize=2, cache_chunk=None,
                 spec=1, wg=False) -> Optional[int]:
    """Estimated per-layer VMEM bytes for the TP half-kernels at this
    geometry (the binding term is the attention half's local K+V cache
    blocks [B, Hkv/tp, S, hd], VMEM-resident per call — unless
    ``cache_chunk`` keeps the cache in HBM, in which case only the
    double-buffered S-chunks (+ resident int8 scale blocks) count; the
    rotating weight buffers are bounded by the 3*2^19 tile budget).
    ``cache_itemsize=1`` is the int8-KV variant, which adds per-vector
    f32 scale blocks.  ``spec``: B counts QUERY rows (streams*K); the
    cache terms use B/spec; spec + cache_chunk is unsupported.  Callers
    gate on ``need <= TP_VMEM_CAP`` before choosing the TP-fused pooled
    path.  Returns None when the shard dims don't tile."""
    if n_kv % tp or hidden % tp:
        return None
    if B % spec or (spec > 1 and cache_chunk):
        return None
    Bc = B // spec
    nq_l = (n_heads // tp) * head_dim
    nqkv_l = nq_l + 2 * (n_kv // tp) * head_dim
    if wg and (D % 128 or nq_l % 128 or (hidden // tp) % 128):
        return None
    if _half_plan({"qkv": (nqkv_l, D), "wo": (D, nq_l),
                   "w13": (2 * hidden // tp, D),
                   "w2": (D, hidden // tp)}, wg=wg) is None:
        return None
    if cache_chunk and S % cache_chunk:
        return None
    if cache_chunk:
        cache = 4 * Bc * (n_kv // tp) * cache_chunk * head_dim * cache_itemsize
        if cache_itemsize == 1:
            cache += 2 * Bc * (n_kv // tp) * S * 4
    else:
        cache = 2 * Bc * (n_kv // tp) * S * head_dim * cache_itemsize
        if cache_itemsize == 1:
            cache += 2 * Bc * (n_kv // tp) * S * 4
    bufs = 4 * 2 * 3 * 2**19          # 4 phases x 2 slots x tile budget
    acts = 4 * B * max(D, 2 * hidden // tp, nqkv_l) * 4
    return cache + bufs + acts


# The half-kernels raise vmem_limit_bytes up to 116 MB for big cache
# geometries (decode_stack_step's validated ceiling on v5e); leave
# headroom for Mosaic's own allocations.
TP_VMEM_CAP = 108 * 2**20


def tp_shard_lm_head(w8: Params, tp: int) -> Params:
    """Split a rowwise-w8 tied embedding table on the vocab axis.

    ``w8``: {"codes": [V, D] int8, "scale": [V]}.  Returns arrays with a
    leading shard axis for ``shard_map``: codes [tp, V/tp, D], scale
    [tp, V/tp].  Reference keeps the 131k lm_head whole on one device
    (gguf/model.rs:476-482); vocab-sharding it is the TPU mesh seam's
    beyond-parity lever (SURVEY.md §2.6).
    """
    codes, scale = w8["codes"], w8["scale"]
    V, D = codes.shape
    if V % tp:
        raise ValueError(f"tp={tp} must divide vocab={V}")
    return {
        "codes": jnp.asarray(codes).reshape(tp, V // tp, D),
        "scale": jnp.asarray(scale).reshape(tp, V // tp),
    }


def tp_shard_lm_head_q4g(lm_codes, lm_scale, tp: int) -> Params:
    """Vocab-shard a g32 tied embedding table (exact-Q4_0 lm fold).

    ``lm_codes`` [SB, V, 128] int8 / ``lm_scale`` [4*SB, 1, V] f32 from
    ``fuse_decode_weights_q4g``.  Returns codes [tp, SB, V/tp, 128] and
    scales [tp, 4*SB, 1, V/tp] — contiguous ascending vocab shards, so
    :func:`tp_lm_head_token`'s tie resolution keeps ``jnp.argmax``
    semantics.
    """
    sb, V, _ = lm_codes.shape
    if V % tp:
        raise ValueError(f"tp={tp} must divide vocab={V}")
    vl = V // tp
    return {
        "codes": jnp.stack(
            [jax.lax.slice_in_dim(lm_codes, i * vl, (i + 1) * vl, axis=1)
             for i in range(tp)]),
        "scale": jnp.stack(
            [jax.lax.slice_in_dim(lm_scale, i * vl, (i + 1) * vl, axis=2)
             for i in range(tp)]),
    }


def _make_lm_half(n_tiles, t, wg=False):
    """Per-shard lm_head matvec over the LOCAL vocab shard, folding the
    greedy (max, first-argmax) across vocab tiles so the [B, V_l] logits
    never materialize (the whole-stack kernel's ``lm_argmax`` fold,
    decode_step_pallas.py, applied per shard).  Grid over vocab tiles —
    Pallas auto-pipelines the [t, D] weight-tile DMA (same structure as
    ops/w8_pallas.py, which streams at ~760 GB/s; a manual
    fori_loop+DMA variant of this kernel measured only ~33 GB/s on v5e)
    — with the running fold carried in VMEM scratch across grid steps.
    ``wg``: g32 (exact-Q4_0) table — the activation arrives as the 4
    pre-masked code stacks (built in XLA by ``_g32_mask_codes``) and the
    tile contraction is the group-32 dot with f16-exact group scales.
    """

    def kernel(*refs):
        if wg:
            (xm0, xm1, xm2, xm3, sx_ref, scale_ref, w_ref,
             vmax_ref, vidx_ref, acc_v, acc_i) = refs
        else:
            (xq_ref, sx_ref, scale_ref, w_ref,
             vmax_ref, vidx_ref, acc_v, acc_i) = refs
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_v[:] = jnp.full(acc_v.shape, -jnp.inf, jnp.float32)
            acc_i[:] = jnp.zeros(acc_i.shape, jnp.int32)

        if wg:
            vals = _g32_matmul_tile(
                [xm0[:], xm1[:], xm2[:], xm3[:]], sx_ref[:],
                w_ref[:], scale_ref[:])  # [B, t]
        else:
            z = jax.lax.dot_general(
                xq_ref[:], w_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            vals = z.astype(jnp.float32) * sx_ref[:] * scale_ref[:]
        idx = j * t + jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
        tb = jnp.max(vals, axis=1, keepdims=True)
        ti = jnp.min(jnp.where(vals >= tb, idx, jnp.int32(2**30)),
                     axis=1, keepdims=True)
        upd = tb > acc_v[:]  # strict: ties keep the earlier tile
        acc_i[:] = jnp.where(upd, ti, acc_i[:])
        acc_v[:] = jnp.maximum(acc_v[:], tb)

        @pl.when(j == n_tiles - 1)
        def _():
            vmax_ref[:] = acc_v[:]
            vidx_ref[:] = acc_i[:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("eps", "interpret"),
)
def lm_half_argmax(x, final_norm, lm_scale_l, lm_codes_l,
                   eps=1e-5, interpret=False):
    """This shard's greedy lm_head over its local vocab rows.

    x [B, D] (post-stack residual, replicated); final_norm [D];
    lm_codes_l [V_l, D] int8 streamed tile-by-tile through the grid
    pipeline; lm_scale_l [V_l].  The final norm + activation quant run
    in XLA (identical math to the w8_matmul reference path); the kernel
    does the int8 MXU contraction + f32 epilogue + greedy fold.
    Returns (max_logit [B, 1] f32, local_argmax [B, 1] i32).

    g32 (exact-Q4_0) table, selected by shape: lm_codes_l [SB, V_l, 128]
    int8 + lm_scale_l [4*SB, 1, V_l] f32 (tp_shard_lm_head_q4g) — the
    activation masks into the 4 lane-masked stacks in XLA and the kernel
    runs the group-32 dots with the f16-exact scales.
    """
    from voxtral_tpu.ops.decode_step_pallas import _lm_tile
    from voxtral_tpu.ops.w8 import _quantize_activations

    B, D = x.shape
    wg = lm_codes_l.ndim == 3
    V_l = lm_codes_l.shape[1] if wg else lm_codes_l.shape[0]
    t = _lm_tile(V_l, D, 1.125 if wg else 1)
    if t is None:
        raise ValueError(f"lm_half_argmax: vocab shard {V_l} not tileable")
    n_tiles = V_l // t

    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    h = xf * jax.lax.rsqrt(var + eps) * final_norm.astype(jnp.float32)
    if wg:
        xqf, sx = _quant_f(h)
        xms = _g32_mask_codes(xqf, D, B)  # 4 x [SB, B, 128] int8
        sb = D // 128
        act_operands = list(xms) + [sx.astype(jnp.float32)]
        act_specs = (
            [pl.BlockSpec((sb, B, 128), lambda j: (0, 0, 0),
                          memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec((B, 1), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)]
        )
        scale_spec = pl.BlockSpec((4 * sb, 1, t), lambda j: (0, 0, j),
                                  memory_space=pltpu.VMEM)
        w_spec = pl.BlockSpec((sb, t, 128), lambda j: (0, j, 0),
                              memory_space=pltpu.VMEM)
        scale_operand = lm_scale_l.astype(jnp.float32)
        bytes_w = V_l * D + (V_l * D) // 8
    else:
        xq, sx = _quantize_activations(h)
        act_operands = [xq, sx.astype(jnp.float32)]
        act_specs = [
            pl.BlockSpec((B, D), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        scale_spec = pl.BlockSpec((1, t), lambda j: (0, j),
                                  memory_space=pltpu.VMEM)
        w_spec = pl.BlockSpec((t, D), lambda j: (j, 0),
                              memory_space=pltpu.VMEM)
        scale_operand = lm_scale_l.astype(jnp.float32).reshape(1, V_l)
        bytes_w = V_l * D + 4 * V_l

    kernel = _make_lm_half(n_tiles, t, wg=wg)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_tiles,),
            in_specs=act_specs + [scale_spec, w_spec],
            out_specs=(
                pl.BlockSpec((B, 1), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((B, 1), jnp.float32),
                pltpu.VMEM((B, 1), jnp.int32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * V_l * D,
            bytes_accessed=bytes_w + B * D,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        *act_operands,
        scale_operand,
        lm_codes_l,
    )


def tp_lm_head_token(
    mesh, x, final_norm, lm_codes_sh, lm_scale_sh,
    eps=1e-5, interpret=False, model_axis="model", data_axis=None,
):
    """Greedy token from a vocab-sharded tied lm_head, [B] int32.

    ``lm_codes_sh``/``lm_scale_sh`` from :func:`tp_shard_lm_head`
    (leading shard axis).  Each shard folds its local (max, argmax) in
    one Pallas matvec; the global winner is one ``pmax`` (value) plus
    one ``pmin`` (candidate global index) over the model axis — ties
    resolve to the LOWEST global index, exactly ``jnp.argmax``'s
    first-match semantics (vocab shards are contiguous ascending).
    ``data_axis``: optionally shard the batch rows over a second mesh
    axis (the DP x TP composition of :func:`tp_decode_step`).

    g32 tables (exact-Q4_0, ``tp_shard_lm_head_q4g``) are selected by
    shape: codes [tp, SB, V_l, 128] / scales [tp, 4*SB, 1, V_l].
    """
    from jax.sharding import PartitionSpec as P

    V_l = (lm_codes_sh.shape[2] if lm_codes_sh.ndim == 4
           else lm_codes_sh.shape[1])
    da = data_axis
    x_spec = P(da, None) if da is not None else P()

    def shard_fn(x, fn, codes, scale):
        best_v, best_i = lm_half_argmax(
            x, fn, scale[0], codes[0], eps=eps, interpret=interpret)
        shard = jax.lax.axis_index(model_axis)
        gmax = jax.lax.pmax(best_v, model_axis)
        cand = jnp.where(best_v >= gmax, best_i + shard * V_l,
                         jnp.int32(2**30))
        return jax.lax.pmin(cand, model_axis)[:, 0]

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(x_spec, P(), P(model_axis), P(model_axis)),
        out_specs=P(da) if da is not None else P(),
        check_vma=False,
    )(x, final_norm.astype(jnp.float32), lm_codes_sh, lm_scale_sh)
