"""Decode megakernels: the per-layer kernel (v1) and the whole-stack
kernel (v2, ``decode_stack_step`` — the production path).

Why: kernel microbenches (``benches/kernel_bench.py``) show the isolated
W8A8 matmuls already stream weights at 590-740 GB/s, and one layer's
matmul work sums to ~165 us — but the real decode step costs ~2x that,
because between XLA ops the weight DMA drains (quantize / RoPE / attention
/ epilogues sit on the VPU while HBM idles).  Fusing the ENTIRE layer —
rms_norm -> QKV (int8 MXU) -> RoPE -> cached attention -> WO -> residual
-> ffn_norm -> ADA -> W1/W3 -> SwiGLU -> W2 -> residual — into one kernel
with rotating weight-tile DMA buffers keeps the HBM pipe busy through
all of it, and the v2 stack kernel extends this across ALL layers plus
the final norm + tied lm_head (grid over layers; static cross-phase
prefetch schedule).  This is the TPU-native replacement for the
reference's per-op WGSL kernel launches (op.rs:139-206 dispatches ~200
q4_matmul launches per token; here a token is ONE kernel).  Measured on
v5e: 4.56 ms/step = 753 GB/s effective (92% of spec), vs ~11 ms for the
unfused XLA step chain at round 1.

Weight layout: the stacked per-layer int8 codes ([L, N, K], rowwise
scales [L, N]) are fused at model-prep time into
    wqkv [L, Nq+2Nkv, D], wo [L, D, Nq], w13 [L, 2F, D], w2 [L, D, F]
and the kernel receives the FULL stacked arrays in HBM plus a layer
index — the DMA slices tiles of layer ``l`` directly, so ``lax.scan``
over layers never materializes a per-layer weight copy.

RoPE uses the adjacent-pair formulation with lane rolls (interleaved
pairs, rope.rs:103-141): out = x * C + swap(x) * S where
C[2i]=C[2i+1]=cos_i, S[2i]=-sin_i, S[2i+1]=+sin_i, and swap exchanges
adjacent lanes.  C/S are precomputed per position outside the kernel.

The kernel attends over the OLD cache (positions < offset) plus the
fresh K/V of this token in-register (self-attention term), and returns
k_new/v_new for the caller's cache append — the cache itself is
read-only here.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = dict[str, Any]


def _quant(x):
    """Per-row symmetric int8 activation quantization ([B, K] f32)."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _quant_f(x):
    """_quant keeping the codes in f32 (the g32 path reshapes/transposes
    them before the int8 cast — Mosaic has no int8 shape casts)."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    return jnp.clip(jnp.round(x / sx), -127, 127), sx


class _MultiCopy:
    """start()/wait() over several async copies as one unit (the g32
    path DMAs a weight tile and its group-scale tile together)."""

    def __init__(self, cps):
        self._cps = cps

    def start(self):
        for c in self._cps:
            c.start()

    def wait(self):
        for c in self._cps:
            c.wait()


def _g32_mask_codes(xqf, k_in, rows):
    """f32 activation codes [rows, k_in] -> 4 lane-masked int8 stacks
    [SB, rows, 128] for the group-32 batched dots (SB = k_in // 128;
    group g = 4*sb + r covers lanes r*32..r*32+31 of superblock sb).

    All layout-changing ops stay in f32 (Mosaic rejects int8 shape
    casts); the int8 cast happens last, elementwise.
    """
    sb = k_in // 128
    x3t = jnp.transpose(xqf.reshape(rows, sb, 128), (1, 0, 2))
    lane = jax.lax.broadcasted_iota(jnp.int32, (sb, rows, 128), 2)
    return [
        jnp.where((lane // 32) == r, x3t, 0.0).astype(jnp.int8)
        for r in range(4)
    ]


def _g32_matmul_tile(xms, sx, ctile, stile):
    """One group-32 tile contraction: y[b, n] = sx[b] *
    sum_g d[g, n] * sum_j xq[b, g*32+j] * c[n, g*32+j].

    xms: 4 masked int8 stacks [SB, B, 128]; ctile [SB, t, 128] int8;
    stile [4*SB, 1, t] f32 (r-major: row r*SB + sb = scale group
    4*sb + r).  Returns [B, t] f32.  The per-group dots ride the int8
    MXU batched over superblocks; the products xq*c are exact in int32
    and the f16-exact scales multiply in f32 — the WEIGHTS contribute
    no quantization error beyond Q4_0 itself (VERDICT r4 #1b).
    """
    sb = ctile.shape[0]
    acc = None
    for r in range(4):
        z = jax.lax.dot_general(
            xms[r], ctile,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # [SB, B, t]
        term = jnp.sum(
            z.astype(jnp.float32) * stile[r * sb:(r + 1) * sb], axis=0)
        acc = term if acc is None else acc + term
    return acc * sx


def _rope_swap(v):
    """Adjacent-lane swap for pair RoPE ([..., 2i] <-> [..., 2i+1])."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    even = (lane % 2) == 0
    d = v.shape[-1]
    # pltpu.roll needs shift >= 0: roll by d-1 == roll by -1 (wraparound).
    return jnp.where(even, pltpu.roll(v, d - 1, axis=v.ndim - 1),
                     pltpu.roll(v, 1, axis=v.ndim - 1))


def _rope_pairs(v, c, s):
    """Adjacent-pair RoPE: v [B, H, D]; c/s [1, D] pair-expanded."""
    return v * c[None] + _rope_swap(v) * s[None]


def _phase_tiles(D, nqkv, nq, hidden):
    """Weight-DMA buffer plan: one double buffer per distinct contraction
    dim K, tile height the largest power of two that divides every N
    streamed through it while keeping a tile near ~2 MB (VMEM is the
    scarce resource — the whole kernel must stay under XLA's ~31 MB
    scoped-vmem pool for fusions containing the pallas call).

    Phases: qkv (N=nqkv, K=D), wo (N=D, K=nq), w13 (N=2F, K=D),
    w2 (N=D, K=F).  Returns ({k: (tile, buf_index)}, [buffer shapes]).
    """
    by_k: dict[int, list[int]] = {}
    for n_out, k_in in ((nqkv, D), (D, nq), (2 * hidden, D), (D, hidden)):
        by_k.setdefault(k_in, []).append(n_out)
    plan = {}
    shapes = []
    for idx, (k, n_list) in enumerate(sorted(by_k.items())):
        t = 512
        while t > 8 and (any(n % t for n in n_list) or t * k > 2 * 2**20):
            t //= 2
        plan[k] = (t, idx)
        shapes.append((2, t, k))
    return plan, shapes


def _make_kernel(B, D, S, n_heads, n_kv, head_dim, hidden, plan, n_bufs, eps,
                 window):
    """Build the layer kernel for static dims.

    Shapes: x [B, D]; caches [B, S, Hkv, hd]; wqkv [L, NQKV, D];
    wo [L, D, NQ]; w13 [L, 2F, D]; w2 [L, D, F].
    """
    nq = n_heads * head_dim
    nkv = n_kv * head_dim
    nqkv = nq + 2 * nkv
    groups = n_heads // n_kv
    scale = head_dim ** -0.5

    def kernel(
        # scalar prefetch
        layer_ref, off_ref,
        # VMEM inputs
        x_ref, attn_norm_ref, ffn_norm_ref, ada_ref,
        sqkv_ref, so_ref, s13_ref, s2_ref, cos_ref, sin_ref,
        kc_ref, vc_ref,
        # HBM stacked weights
        wqkv_hbm, wo_hbm, w13_hbm, w2_hbm,
        # outputs
        xo_ref, kn_ref, vn_ref,
        # scratch: one double buffer per distinct K + DMA semaphores
        *scratch,
    ):
        bufs, sem = scratch[:n_bufs], scratch[n_bufs]
        layer = layer_ref[0]
        off = off_ref[0]

        def stream_matmul(xq, sx, w_hbm, scale_row, n_out, k_in):
            """y[B, n_out] = dequant(xq @ W_l^T); W rows DMA'd in tiles."""
            tile_n, buf_idx = plan[k_in]
            buf = bufs[buf_idx]
            n_tiles = n_out // tile_n

            def dma(slot, j):
                return pltpu.make_async_copy(
                    w_hbm.at[layer, pl.ds(j * tile_n, tile_n), :],
                    buf.at[slot],
                    sem.at[slot],
                )

            dma(0, 0).start()
            outs = []
            for j in range(n_tiles):
                if j + 1 < n_tiles:
                    dma((j + 1) % 2, j + 1).start()
                dma(j % 2, j).wait()
                z = jax.lax.dot_general(
                    xq, buf[j % 2],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # [B, tile_n]
                outs.append(
                    z.astype(jnp.float32) * sx
                    * scale_row[0, j * tile_n:(j + 1) * tile_n][None, :]
                )
            return jnp.concatenate(outs, axis=-1)

        x = x_ref[:].astype(jnp.float32)  # [B, D] residual stream

        # ---- attention block ------------------------------------------------
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        h = x * jax.lax.rsqrt(var + eps) * attn_norm_ref[0][None, :]
        xq, sx = _quant(h)
        qkv = stream_matmul(xq, sx, wqkv_hbm, sqkv_ref, nqkv, D)
        q = qkv[:, :nq].reshape(B, n_heads, head_dim)
        k = qkv[:, nq:nq + nkv].reshape(B, n_kv, head_dim)
        v = qkv[:, nq + nkv:].reshape(B, n_kv, head_dim)

        c, s = cos_ref[:], sin_ref[:]
        q = _rope_pairs(q, c, s)
        k = _rope_pairs(k, c, s)
        kn_ref[:] = k.astype(kn_ref.dtype)
        vn_ref[:] = v.astype(vn_ref.dtype)

        # Grouped attention over cache (< off) + self term, all f32 VPU.
        qg = q.reshape(B, n_kv, groups, head_dim) * scale
        kc = kc_ref[:].astype(jnp.float32)  # [B, S, Hkv, hd]
        vc = vc_ref[:].astype(jnp.float32)
        kct = jnp.transpose(kc, (0, 2, 1, 3))  # [B, Hkv, S, hd]
        vct = jnp.transpose(vc, (0, 2, 1, 3))
        scores = jnp.sum(qg[:, :, :, None, :] * kct[:, :, None, :, :],
                         axis=-1)  # [B, Hkv, G, S]
        pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 3)
        valid = pos < off
        if window is not None:
            # Sliding window (layers._band_mask_bias semantics, diff <= w):
            # the query sits at position ``off``.
            valid &= (off - pos) <= window
        scores = jnp.where(valid, scores, -jnp.inf)
        self_s = jnp.sum(qg * k[:, :, None, :], axis=-1)  # [B, Hkv, G]

        m = jnp.maximum(jnp.max(scores, axis=-1), self_s)
        e_cache = jnp.exp(scores - m[..., None])
        e_self = jnp.exp(self_s - m)
        denom = jnp.sum(e_cache, axis=-1) + e_self
        ctx = jnp.sum(e_cache[..., None] * vct[:, :, None, :, :], axis=3)
        ctx = ctx + e_self[..., None] * v[:, :, None, :]
        attn = (ctx / denom[..., None]).reshape(B, nq)

        xq, sx = _quant(attn)
        x = x + stream_matmul(xq, sx, wo_hbm, so_ref, D, nq)

        # ---- FFN block ------------------------------------------------------
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        h = x * jax.lax.rsqrt(var + eps) * ffn_norm_ref[0][None, :]
        h = h * ada_ref[0][None, :]  # precomputed 1 + w2(gelu(w0 t))
        xq, sx = _quant(h)
        up = stream_matmul(xq, sx, w13_hbm, s13_ref, 2 * hidden, D)
        gate, upv = up[:, :hidden], up[:, hidden:]
        hmid = gate * jax.nn.sigmoid(gate) * upv  # silu(gate) * up
        xq, sx = _quant(hmid)
        x = x + stream_matmul(xq, sx, w2_hbm, s2_ref, D, hidden)

        xo_ref[:] = x

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv", "head_dim", "eps", "interpret",
                     "window"),
)
def decode_layer_step(
    x, layer, offset,
    attn_norm, ffn_norm, ada_vec,
    sqkv, so, s13, s2, cos_p, sin_p,
    k_cache, v_cache,
    wqkv, wo, w13, w2,
    n_heads=32, n_kv=8, head_dim=128, eps=1e-5, interpret=False,
    window=None,
):
    """One decoder layer of a single-token decode step, fused.

    x [B, D] f32; layer/offset scalars; caches [B, S, Hkv, hd];
    stacked weights wqkv [L, NQKV, D] int8 (+ scales per layer given
    pre-sliced: sqkv [NQKV] f32 etc.); cos_p/sin_p [hd] pair-expanded.
    Returns (x_out [B, D] f32, k_new, v_new [B, Hkv, hd]).
    """
    B, D = x.shape
    S = k_cache.shape[1]
    hidden = w2.shape[2]
    nq = n_heads * head_dim
    nqkv = nq + 2 * n_kv * head_dim
    plan, buf_shapes = _phase_tiles(D, nqkv, nq, hidden)

    kernel = _make_kernel(B, D, S, n_heads, n_kv, head_dim, hidden,
                          plan, len(buf_shapes), eps, window)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # attn_norm [1, D]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ffn_norm
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ada
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sqkv [1, NQKV]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # so [1, D]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # s13 [1, 2F]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # s2 [1, D]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cos [1, hd]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sin [1, hd]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k_cache
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v_cache
            pl.BlockSpec(memory_space=pl.ANY),    # wqkv (HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # wo
            pl.BlockSpec(memory_space=pl.ANY),    # w13
            pl.BlockSpec(memory_space=pl.ANY),    # w2
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM(s, jnp.int8) for s in buf_shapes]
        + [pltpu.SemaphoreType.DMA((2,))],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, n_kv, head_dim), k_cache.dtype),
            jax.ShapeDtypeStruct((B, n_kv, head_dim), v_cache.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=30 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(offset, jnp.int32).reshape(1),
        x.astype(jnp.float32),
        attn_norm.astype(jnp.float32).reshape(1, D),
        ffn_norm.astype(jnp.float32).reshape(1, D),
        ada_vec.astype(jnp.float32).reshape(1, D),
        sqkv.astype(jnp.float32).reshape(1, nqkv),
        so.astype(jnp.float32).reshape(1, D),
        s13.astype(jnp.float32).reshape(1, 2 * hidden),
        s2.astype(jnp.float32).reshape(1, D),
        cos_p.astype(jnp.float32).reshape(1, head_dim),
        sin_p.astype(jnp.float32).reshape(1, head_dim),
        k_cache, v_cache,
        wqkv, wo, w13, w2,
    )
    return out


# ---------------------------------------------------------------------------
# v2: whole-stack kernel — grid over layers, DMA never drains
# ---------------------------------------------------------------------------


def _stack_segs(nqkv, nq, nkv, hidden, wq8: bool):
    """Per-phase HBM source segments (row counts along the streamed N
    axis).  The w8 path streams CONCATENATED stacks (one array per
    phase); the bf16 path streams each transposed dense leaf directly
    (wq/wk/wv, w1/w3) so fusing never duplicates the 6 GB of decoder
    weights — the same arrays serve prefill via the ``{"nt": w}``
    leaves (models/layers.linear)."""
    if wq8:
        return {"qkv": [nqkv], "wo": [nq], "w13": [2 * hidden],
                "w2": [hidden]}
    return {"qkv": [nq, nkv, nkv], "wo": [nq], "w13": [hidden, hidden],
            "w2": [hidden]}


def _stack_plan(D, nqkv, nq, hidden, itemsize=1, segs=None):
    """Per-phase weight-tile plan for the stacked kernel.

    Each phase (qkv, wo, w13, w2) gets its OWN rotating buffer
    (STACK_SLOTS[p] deep): PRE tiles stay in flight at all times, and the
    next phases' leading tiles prefetch during the current phase's last
    iterations — so the DMA pipe stays busy through the inter-phase
    epilogues (attention / SwiGLU VPU work) and across layer boundaries.

    ``itemsize`` is the WEIGHT dtype's (1 = int8, 2 = bf16 — the tile
    budget is in bytes, so bf16 tiles carry half the rows).  ``segs``
    optionally lists per-phase HBM segment row counts (bf16 streams
    separate per-leaf arrays); a tile must never straddle a segment
    boundary, so the tile height must divide every segment.
    Returns {phase: (tile, n_tiles, K, N)} or None if any phase can't
    tile.
    """
    phases = {
        "qkv": (nqkv, D),
        "wo": (D, nq),
        "w13": (2 * hidden, D),
        "w2": (D, hidden),
    }
    plan = {}
    for name, (n_out, k_in) in phases.items():
        rows = segs[name] if segs else [n_out]
        t = 512
        # The 1.5 MB tile budget is LOAD-BEARING: raising it to 2 MB
        # (wo -> 512x4096 tiles) hard-faults the TPU worker ("kernel
        # fault", r2 + r3 tuning experiments) — do not bump without a
        # fault-isolated bisect.  VOXTRAL_STACK_TILE_KB overrides for
        # such experiments only.  Measured healthy: 4.48 ms/step.
        while t >= 8 and (any(r % t for r in rows)
                          or t * k_in * itemsize > _TILE_BUDGET):
            t //= 2
        if t < 8:
            return None
        plan[name] = (t, n_out // t, k_in, n_out)
    return plan


def _env_int(name, default):
    import os

    v = os.environ.get(name)
    return int(v) if v else default


_TILE_BUDGET = _env_int("VOXTRAL_STACK_TILE_KB", 1536) * 1024


def _build_schedule(pre):
    """Prefetch schedule from per-phase PRE depths.

    PRE[p] tiles of phase p are issued by EARLIER phases' tail
    iterations, so p's stream starts with PRE tiles already in flight
    and the DMA pipe stays busy through the inter-phase VPU epilogues
    (attention needs the deepest cover, hence wo/w13 default to 4).
    Each phase's rotating buffer has PRE+2 slots: at iteration j tiles
    j..j+PRE are outstanding (PRE+1) and the in-loop issue of tile j+PRE
    reuses the slot whose occupant (tile j+PRE-slots = j-2) was consumed
    two iterations ago — no write-after-read hazard.

    Tail distribution: qkv's tail issues ALL of wo's pre tiles plus the
    first half of w13's (issue order matters — tiles queue on one DMA
    engine, so later phases' tiles go as late as correctness allows);
    wo's tail issues the rest of w13's; w13's tail issues w2's.  w2's
    tail issues the NEXT layer's qkv (or the lm_head's) leading tiles —
    built in-kernel because it needs the layer index.
    """
    spill = pre["w13"] // 2
    tails = {
        "qkv": [("wo", i) for i in range(pre["wo"])]
        + [("w13", i) for i in range(spill)],
        "wo": [("w13", i) for i in range(spill, pre["w13"])],
        "w13": [("w2", i) for i in range(pre["w2"])],
    }
    return tails


# Overridable for on-TPU schedule sweeps: VOXTRAL_STACK_PRE="2,4,4,2"
# (qkv,wo,w13,w2 depths).  Defaults are the tuned production schedule.
def _env_pre():
    import os

    v = os.environ.get("VOXTRAL_STACK_PRE")
    if not v:
        return {"qkv": 2, "wo": 4, "w13": 4, "w2": 2}
    q, wo, w13, w2 = (int(x) for x in v.split(","))
    return {"qkv": q, "wo": wo, "w13": w13, "w2": w2}


STACK_PRE = _env_pre()
STACK_SLOTS = {p: STACK_PRE[p] + 2 for p in STACK_PRE}
LM_PRE, LM_SLOTS = _env_int("VOXTRAL_LM_PRE", 2), _env_int("VOXTRAL_LM_PRE", 2) + 2
STACK_TAILS = _build_schedule(STACK_PRE)


def _lm_tile(V, D, itemsize=1):
    """Row-tile for the folded lm_head phase (own rotating buffer)."""
    t = 512
    while t >= 8 and (V % t or t * D * itemsize > 2 * 2**20):
        t //= 2
    return t if t >= 8 else None


# v5e VMEM is 128 MB; leave headroom for Mosaic's own allocations.
STACK_VMEM_CAP = 116 * 2**20


def stack_vmem_need(B, S, D, n_heads, n_kv, head_dim, hidden,
                    vocab=None, cache_itemsize=2,
                    cache_chunk=None, weight_itemsize=1,
                    spec=1) -> Optional[int]:
    """Estimated VMEM bytes for ``decode_stack_step`` at this geometry.

    Dominated by (a) the per-layer weight-tile rotating buffers and
    (b) the K/V cache blocks ([B, Hkv, S, hd] bf16 each), which Pallas
    double-buffers across grid steps — unless ``cache_chunk`` is set,
    in which case the caches stay in HBM and only the double-buffered
    S-chunks (+ resident int8 scale blocks) count.  ``vocab`` adds the
    folded lm_head's buffer + logits block.  Returns None if
    untileable.  Callers (e.g. the pooled streaming path) gate on
    ``need <= STACK_VMEM_CAP`` before choosing the fused path.
    """
    nq = n_heads * head_dim
    nkv = n_kv * head_dim
    nqkv = nq + 2 * nkv
    plan = _stack_plan(D, nqkv, nq, hidden, itemsize=weight_itemsize,
                       segs=_stack_segs(nqkv, nq, nkv, hidden,
                                        weight_itemsize < 2))
    if plan is None:
        return None
    need = sum(STACK_SLOTS[n] * plan[n][0] * plan[n][2] * weight_itemsize
               for n in plan)
    Bc = B // spec  # cache rows: speculative rows share their stream's
    if cache_chunk:
        # k+v chunk double buffers (cache itself stays in HBM).
        need += 4 * Bc * n_kv * cache_chunk * head_dim * cache_itemsize
        if cache_itemsize == 1:
            # scale blocks stay VMEM-resident, double-buffered.
            need += 4 * Bc * n_kv * S * 4
    else:
        # k+v blocks, double-buffered across grid steps
        need += 4 * Bc * n_kv * S * head_dim * cache_itemsize
        if cache_itemsize == 1:
            # int8 cache carries per-position f32 scale blocks.
            need += 4 * Bc * n_kv * S * 4
    if vocab is not None:
        t = _lm_tile(vocab, D, weight_itemsize)
        if t is None:
            return None
        # lm buffer + logits
        need += LM_SLOTS * t * D * weight_itemsize + 2 * B * vocab * 4
    need += 8 * 2**20  # x scratch, vector blocks, margin
    return need


def _make_stack_kernel(B, D, S, L, n_heads, n_kv, head_dim, hidden, plan,
                       eps, lm, window, ring, cache_q=False,
                       lm_argmax=False, cache_chunk=None, wq8=True,
                       seg_rows=None, spec=1, wg=False):
    """Kernel body for one grid step = one decoder layer.

    The residual stream lives in VMEM scratch across grid steps (the TPU
    grid is sequential); per-layer norms/scales/caches arrive as blocked
    inputs (Pallas auto-prefetches layer l+1's blocks during layer l);
    weights stay in HBM and stream through per-phase double buffers with
    an explicit prefetch chain qkv -> wo -> w13 -> w2 -> next layer's
    qkv, so the HBM pipe stays busy through attention/SwiGLU and across
    layer boundaries.

    ``lm`` = (V, lm_tile) folds the final RMSNorm + tied lm_head into a
    final grid step (grid = L + 1): the lm_head's first weight tile
    prefetches during the last layer's w2 stream, so the DMA pipe stays
    busy from the first qkv tile to the last vocab tile of the step.
    """
    nq = n_heads * head_dim
    nkv = n_kv * head_dim
    nqkv = nq + 2 * nkv
    groups = n_heads // n_kv
    scale = head_dim ** -0.5
    order = ("qkv", "wo", "w13", "w2")
    pidx = {name: i for i, name in enumerate(order)}
    if seg_rows is None:
        seg_rows = _stack_segs(nqkv, nq, nkv, hidden, wq8)
    n_wrefs = sum(len(seg_rows[name]) for name in order)

    def kernel(*refs):
        # Optional int8-cache scale refs sit right after vc_ref; chunked
        # mode appends (kbuf, vbuf, sem_kv) scratch at the very end; g32
        # mode appends its scale buffers + semaphore just before those.
        nsc = 2 if cache_q else 0
        if cache_chunk:
            kbuf, vbuf, sem_kv = refs[-3:]
            refs = refs[:-3]
        if wg:
            sem_s = refs[-1]
            n_sb = 5 if lm is not None else 4
            sb_list = refs[-1 - n_sb:-1]
            refs = refs[:-1 - n_sb]
            sbufs = dict(zip(("qkv", "wo", "w13", "w2"), sb_list))
            if lm is not None:
                sbuf_lm = sb_list[4]
        (offs_ref,
         x_ref, attn_norm_ref, ffn_norm_ref, ada_ref,
         sqkv_ref, so_ref, s13_ref, s2_ref, cos_ref, sin_ref,
         kc_ref, vc_ref) = refs[:13]
        rest = list(refs[13 + nsc:])
        if lm is not None:
            fnorm_ref, lms_ref = rest[:2]
            rest = rest[2:]
        w_refs, rest = rest[:n_wrefs], rest[n_wrefs:]
        if lm is not None:
            lm_hbm = rest[0]
            (xo_ref, kn_ref, vn_ref, logits_ref,
             buf_qkv, buf_wo, buf_w13, buf_w2, buf_lm, x_s, sem) = rest[1:]
        else:
            (xo_ref, kn_ref, vn_ref,
             buf_qkv, buf_wo, buf_w13, buf_w2, x_s, sem) = rest
        if cache_q:
            ks_ref, vs_ref = refs[13:15]
        sref_by = {"qkv": sqkv_ref, "wo": so_ref, "w13": s13_ref,
                   "w2": s2_ref}

        l = pl.program_id(0)
        hbm = {}
        wi = 0
        for name in order:
            n = len(seg_rows[name])
            hbm[name] = list(zip(w_refs[wi:wi + n], seg_rows[name]))
            wi += n
        bufs = {"qkv": buf_qkv, "wo": buf_wo, "w13": buf_w13, "w2": buf_w2}

        def dma(name, li, j):
            # Tile j of the phase's virtual N axis may live in any of the
            # phase's HBM segments (bf16 streams separate per-leaf
            # arrays); the plan guarantees a tile never straddles a
            # boundary, so the segment walk is static Python.
            t = plan[name][0]
            s = STACK_SLOTS[name]
            row = j * t
            if wg:
                # g32 layouts: codes [L, SB, N, 128] (single segment),
                # scales [L, 4*SB, 1, N] — both tiled along N.
                ref = hbm[name][0][0]
                return _MultiCopy([
                    pltpu.make_async_copy(
                        ref.at[li, :, pl.ds(row, t), :],
                        bufs[name].at[j % s],
                        sem.at[pidx[name], j % s]),
                    pltpu.make_async_copy(
                        sref_by[name].at[li, :, :, pl.ds(row, t)],
                        sbufs[name].at[j % s],
                        sem_s.at[pidx[name], j % s]),
                ])
            src = None
            for ref, rows in hbm[name]:
                if row < rows:
                    src = ref.at[li, pl.ds(row, t), :]
                    break
                row -= rows
            return pltpu.make_async_copy(
                src,
                bufs[name].at[j % s],
                sem.at[pidx[name], j % s],
            )

        def prep(h):
            """Activation prep for the streamed matmuls: int8 rowwise
            quant on the w8 path (f32 codes on the g32 path — the
            stream reshapes them per phase before the int8 cast); a
            bf16 cast (f32 MXU accumulate) on the dense path."""
            if wg:
                return _quant_f(h)
            if wq8:
                return _quant(h)
            return h.astype(jnp.bfloat16), None

        def lm_dma(j):
            t = lm[1]
            if wg:
                return _MultiCopy([
                    pltpu.make_async_copy(
                        lm_hbm.at[:, pl.ds(j * t, t), :],
                        buf_lm.at[j % LM_SLOTS],
                        sem.at[4, j % LM_SLOTS]),
                    pltpu.make_async_copy(
                        lms_ref.at[:, :, pl.ds(j * t, t)],
                        sbuf_lm.at[j % LM_SLOTS],
                        sem_s.at[4, j % LM_SLOTS]),
                ])
            return pltpu.make_async_copy(
                lm_hbm.at[pl.ds(j * t, t), :],
                buf_lm.at[j % LM_SLOTS],
                sem.at[4, j % LM_SLOTS],
            )

        @pl.when(l == 0)
        def _():
            for i in range(min(STACK_PRE["qkv"], plan["qkv"][1])):
                dma("qkv", 0, i).start()

        @pl.when(l < L)
        def _layer():
            def chain(name, idx):
                """Tail callback: prefetch tile ``idx`` of phase
                ``name`` of the current layer (if it exists)."""
                def issue():
                    if idx < plan[name][1]:
                        dma(name, l, idx).start()
                return issue

            def stream(name, xq, sx, scale_ref, tail):
                """y = dequant(xq @ W_l^T).

                Tiles 0..PRE-1 were pre-issued by earlier phases' tails;
                iteration j issues tile j+PRE, then waits on tile j.
                The last len(tail) iterations additionally run the tail
                callbacks (prefetching later phases' leading tiles), so
                the DMA pipe stays loaded through this phase's epilogue.
                Short phases (n_tiles < len(tail)) fire the whole tail
                on the last iteration — correct, just less overlap."""
                t, n_tiles, k_in, _ = plan[name]
                pre = STACK_PRE[name]
                if wg:
                    xms = _g32_mask_codes(xq, k_in, xq.shape[0])
                outs = []
                for j in range(n_tiles):
                    if j + pre < n_tiles:
                        dma(name, l, j + pre).start()
                    if n_tiles >= len(tail):
                        if j >= n_tiles - len(tail):
                            tail[j - (n_tiles - len(tail))]()
                    elif j == n_tiles - 1:
                        for cb in tail:
                            cb()
                    dma(name, l, j).wait()
                    slot = j % STACK_SLOTS[name]
                    if wg:
                        outs.append(_g32_matmul_tile(
                            xms, sx, bufs[name][slot], sbufs[name][slot]))
                        continue
                    z = jax.lax.dot_general(
                        xq, bufs[name][slot],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=(jnp.int32 if wq8
                                                else jnp.float32),
                    )
                    if wq8:
                        outs.append(
                            z.astype(jnp.float32) * sx
                            * scale_ref[0, 0, j * t:(j + 1) * t][None, :]
                        )
                    else:
                        outs.append(z)  # bf16 weights carry no row scales
                return jnp.concatenate(outs, axis=-1)

            tails = {
                name: [chain(tgt, idx) for tgt, idx in tail_spec]
                for name, tail_spec in STACK_TAILS.items()
            }

            x = jnp.where(l == 0, x_ref[:], x_s[:])  # [B, D] f32 residual

            # ---- attention block -----------------------------------------
            var = jnp.mean(x * x, axis=-1, keepdims=True)
            h = x * jax.lax.rsqrt(var + eps) * attn_norm_ref[0]
            xq, sx = prep(h)
            qkv = stream("qkv", xq, sx, sqkv_ref, tails["qkv"])
            q = qkv[:, :nq].reshape(B, n_heads, head_dim)
            k = qkv[:, nq:nq + nkv].reshape(B, n_kv, head_dim)
            v = qkv[:, nq + nkv:].reshape(B, n_kv, head_dim)

            # Per-row RoPE ([B, H, hd], pre-broadcast over heads outside
            # the kernel — pooled sessions sit at different absolute
            # positions, and Mosaic dislikes [B, hd] -> [B, 1, hd]
            # shape casts, so the kernel sees exact elementwise shapes).
            c, s = cos_ref[:], sin_ref[:]
            q = q * c + _rope_swap(q) * s
            ck, sk_ = cos_ref[:, :n_kv, :], sin_ref[:, :n_kv, :]
            k = k * ck + _rope_swap(k) * sk_
            kn_ref[0] = k.astype(kn_ref.dtype)
            vn_ref[0] = v.astype(vn_ref.dtype)

            if spec > 1:
                # ---- speculative K-token verification --------------------
                # Rows are (stream b, draft slot j): row = b*spec + j.
                # All K rows of a stream share ONE cache (positions
                # < offs[b]); row j's query sits at offs[b] + j and
                # additionally attends the FRESH K/V of rows i <= j of
                # the same stream — a tiny causal block among the drafts
                # computed in-register (K(K+1)/2 VPU dots).  One weight
                # pass verifies K drafted tokens: exact greedy semantics
                # regardless of draft quality (the caller accepts the
                # longest matching prefix).  ROADMAP r4 #5.
                Bl = B // spec
                kcS = kc_ref[0].reshape(Bl * n_kv, S, head_dim)
                vcS = vc_ref[0].reshape(Bl * n_kv, S, head_dim)
                if cache_q:
                    ksS = ks_ref[0].reshape(Bl * n_kv, S)
                    vsS = vs_ref[0].reshape(Bl * n_kv, S)
                qS = q.reshape(Bl, spec, n_heads, head_dim)
                kS = k.reshape(Bl, spec, n_kv, head_dim)
                vS = v.reshape(Bl, spec, n_kv, head_dim)

                def valid_spec(shape, j):
                    """Cache validity for draft row j (query position
                    offs[b] + j); same layout rules as build_valid."""
                    pos = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
                    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                    off3 = jnp.full(shape, jnp.int32(0))
                    for b in range(Bl):
                        off3 = jnp.where(row // n_kv == b, offs_ref[b],
                                         off3)
                    if ring is None:
                        p_abs = pos
                        valid = pos < off3
                    else:
                        head_n, size = ring
                        r = pos - head_n
                        wr = off3 - head_n
                        cycles = jnp.maximum(wr - 1 - r, 0) // size
                        in_head = pos < head_n
                        p_abs = jnp.where(in_head, pos,
                                          head_n + r + size * cycles)
                        valid = ((in_head & (pos < off3))
                                 | ((pos >= head_n) & (r < size)
                                    & (r < wr)))
                    if window is not None:
                        valid &= (off3 + j - p_abs) <= window
                    return valid

                if cache_q:
                    # Fresh rows i < j must read EXACTLY like the
                    # sequential step reads them back from the int8
                    # cache: roundtrip through the k_new/v_new output
                    # dtype (bf16 — the host quantizes THOSE values at
                    # append) and the quantize_kv per-vector formula.
                    # Integer-domain f32 math (codes are exact small
                    # integers; dots stay < 2^24) reproduces the int8
                    # MXU accumulation exactly without int8 VPU ops,
                    # which Mosaic lowers poorly.
                    kbr = kS.astype(jnp.bfloat16).astype(jnp.float32)
                    vbr = vS.astype(jnp.bfloat16).astype(jnp.float32)
                    ksf = jnp.maximum(
                        jnp.max(jnp.abs(kbr), axis=-1, keepdims=True),
                        1e-8) / 127.0
                    kqf = jnp.clip(jnp.round(kbr / ksf), -127, 127)
                    vsf = jnp.maximum(
                        jnp.max(jnp.abs(vbr), axis=-1, keepdims=True),
                        1e-8) / 127.0
                    vqf = jnp.clip(jnp.round(vbr / vsf), -127, 127)

                attn_js = []
                for j in range(spec):
                    qj = qS[:, j].reshape(Bl * n_kv, groups,
                                          head_dim) * scale
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
                            preferred_element_type=jnp.float32,
                        )
                    sj = jnp.where(valid_spec(sj.shape, j), sj, -jnp.inf)

                    prevs = []  # fresh rows i < j within the window
                    for i in range(j):
                        if window is not None and (j - i) > window:
                            continue  # static: drafts beyond the band
                        if cache_q:
                            # score = (q codes · k codes) * sq * ks —
                            # the int8 score the sequential step gets
                            # from the cache slot at offs[b] + i.
                            kqi = kqf[:, i].reshape(Bl * n_kv, 1,
                                                    head_dim)
                            si = (jnp.sum(qqf * kqi, axis=-1)
                                  * sqj[..., 0]
                                  * ksf[:, i].reshape(Bl * n_kv, 1))
                        else:
                            ki = kS[:, i].reshape(Bl * n_kv, 1, head_dim)
                            si = jnp.sum(qj * ki, axis=-1)  # [Bl*Hkv, G]
                        prevs.append((i, si))
                    # Row j's own fresh K/V stays full-precision — the
                    # sequential step's self_s/e_self path.
                    s_self = jnp.sum(
                        qj * kS[:, j].reshape(Bl * n_kv, 1, head_dim),
                        axis=-1)

                    m = jnp.maximum(jnp.max(sj, axis=-1), s_self)
                    for _, si in prevs:
                        m = jnp.maximum(m, si)
                    e_cache = jnp.exp(sj - m[..., None])
                    denom = jnp.sum(e_cache, axis=-1)
                    if cache_q:
                        # ONE requant scale group across cache slots AND
                        # fresh rows i < j — in the sequential step they
                        # all sit in the same cache row when ctx_of
                        # requantizes the softmax weights.
                        e_w = e_cache * vsS[:, None, :]
                        ea = jnp.max(jnp.abs(e_w), axis=-1, keepdims=True)
                        fresh = []
                        for i, si in prevs:
                            e_i = jnp.exp(si - m)
                            ew_i = e_i * vsf[:, i].reshape(Bl * n_kv, 1)
                            ea = jnp.maximum(ea, jnp.abs(ew_i)[..., None])
                            fresh.append((i, e_i, ew_i))
                        se = jnp.maximum(ea, 1e-30) / 127.0
                        eq = jnp.clip(jnp.round(e_w / se), -127, 127
                                      ).astype(jnp.int8)
                        ctx = jax.lax.dot_general(
                            eq, vcS,
                            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.int32,
                        ).astype(jnp.float32) * se
                        for i, e_i, ew_i in fresh:
                            denom = denom + e_i
                            eqi = jnp.clip(jnp.round(ew_i / se[..., 0]),
                                           -127, 127)
                            ctx = ctx + (eqi[..., None]
                                         * vqf[:, i].reshape(
                                             Bl * n_kv, 1, head_dim)
                                         * se)
                    else:
                        ctx = jax.lax.dot_general(
                            e_cache.astype(vcS.dtype), vcS,
                            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                        )
                        for i, si in prevs:
                            e_i = jnp.exp(si - m)
                            denom = denom + e_i
                            ctx = ctx + e_i[..., None] * vS[:, i].reshape(
                                Bl * n_kv, 1, head_dim)
                    e_self = jnp.exp(s_self - m)
                    denom = denom + e_self
                    ctx = ctx + e_self[..., None] * vS[:, j].reshape(
                        Bl * n_kv, 1, head_dim)
                    attn_js.append(
                        (ctx / denom[..., None]).reshape(Bl, nq))
                attn = jnp.stack(attn_js, axis=1).reshape(B, nq)

                xq, sx = prep(attn)
                x = x + stream("wo", xq, sx, so_ref, tails["wo"])

                # ---- FFN block -----------------------------------------
                var = jnp.mean(x * x, axis=-1, keepdims=True)
                h = x * jax.lax.rsqrt(var + eps) * ffn_norm_ref[0]
                h = h * ada_ref[0]
                xq, sx = prep(h)
                up = stream("w13", xq, sx, s13_ref, tails["w13"])
                gate, upv = up[:, :hidden], up[:, hidden:]
                hmid = gate * jax.nn.sigmoid(gate) * upv
                xq, sx = prep(hmid)

                def issue_next_spec(i):
                    def issue():
                        if i < STACK_PRE["qkv"]:
                            @pl.when(l + 1 < L)
                            def _():
                                if i < plan["qkv"][1]:
                                    dma("qkv", l + 1, i).start()

                        if lm is not None and i < LM_PRE:
                            @pl.when(l + 1 == L)
                            def _():
                                if i < lm[0] // lm[1]:
                                    lm_dma(i).start()
                    return issue

                w2_tail = [issue_next_spec(i)
                           for i in range(max(STACK_PRE["qkv"], LM_PRE))]
                x = x + stream("w2", xq, sx, s2_ref, w2_tail)

                x_s[:] = x

                @pl.when(l == L - 1)
                def _():
                    xo_ref[:] = x
                return

            # Cache arrives pre-transposed [B, Hkv, S, hd] so score/ctx
            # contractions hit the MXU directly (no per-step VPU
            # transpose — the v2.0 kernel's transposes stalled the DMA
            # pipe during the attention phase).
            # Mosaic matmul allows at most ONE batch dim: fold (B, Hkv)
            # into a single leading batch axis for both contractions.
            qg = q.reshape(B * n_kv, groups, head_dim) * scale
            if cache_q:
                # int8 cache: K/V rows were quantized per (layer, row,
                # head, position) vector; the per-position scale factors
                # OUT of the head_dim contraction, so scores ride the
                # int8 MXU and the scale multiplies the score matrix.
                qa = jnp.max(jnp.abs(qg), axis=-1, keepdims=True)
                sq = jnp.maximum(qa, 1e-8) / 127.0
                qq = jnp.clip(jnp.round(qg / sq), -127, 127
                              ).astype(jnp.int8)

            def build_valid(shape, base):
                """Per-row validity for a score tile whose slot axis s
                maps to absolute cache slot base + s: row b attends to
                positions < offs[b] (mixed-progress batches each mask
                their own), bounded below by the sliding window
                (diff <= w, matching layers._band_mask_bias; the query
                sits at offs[b]).  offs live in SMEM (scalar prefetch);
                the per-row value is materialized with static-B scalar
                selects over a row iota — Mosaic has no layout for
                [B] -> [B*Hkv, 1, 1] casts."""
                pos = base + jax.lax.broadcasted_iota(jnp.int32, shape, 2)
                row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                off3 = jnp.full(shape, jnp.int32(0))
                for b in range(B):
                    off3 = jnp.where(row // n_kv == b, offs_ref[b], off3)
                if ring is None:
                    p_abs = pos
                    valid = pos < off3
                else:
                    # Head+ring cache (layers.ring_k_positions
                    # semantics): slots [0, head) hold positions
                    # [0, head) permanently; ring slot r holds the
                    # largest p = head + r + size*c below offs.  The
                    # r < size guard masks dead slots when S is padded
                    # past head+size (chunk-size rounding).  Pure &/|
                    # composition — Mosaic cannot lower a select with
                    # i1 operands ("unsupported bitwidth truncation").
                    head_n, size = ring
                    r = pos - head_n
                    wr = off3 - head_n
                    cycles = jnp.maximum(wr - 1 - r, 0) // size
                    in_head = pos < head_n
                    p_abs = jnp.where(in_head, pos,
                                      head_n + r + size * cycles)
                    valid = ((in_head & (pos < off3))
                             | ((pos >= head_n) & (r < size) & (r < wr)))
                if window is not None:
                    valid &= (off3 - p_abs) <= window
                return valid

            def scores_of(kcc, sc, base):
                """Masked scores for one K tile [B*Hkv, Sc, hd]."""
                if cache_q:
                    s = jax.lax.dot_general(
                        qq, kcc,
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * sq * sc[:, None, :]
                else:
                    s = jax.lax.dot_general(
                        qg.astype(kcc.dtype), kcc,
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )  # [B*Hkv, G, Sc]
                return jnp.where(build_valid(s.shape, base), s, -jnp.inf)

            def ctx_of(e, vcc, vsc):
                """softmax-weight x V tile contraction (int8 folds the
                per-position V scale into the weights, requantizes per
                row, and keeps the dot on the int8 MXU)."""
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
                    preferred_element_type=jnp.float32,
                )  # [B*Hkv, G, hd]

            kf = k.reshape(B * n_kv, 1, head_dim)
            self_s = jnp.sum(qg * kf, axis=-1)  # [B*Hkv, G]

            if cache_chunk:
                # HBM-resident cache, streamed in double-buffered
                # S-chunks with an online softmax — the kernel's VMEM
                # no longer bounds S, so big pools / long ring windows
                # keep the fused path (HBM traffic is identical to the
                # resident layout; the chunks ride the same DMA engine
                # as the weight tiles).
                Sc = cache_chunk
                n_ch = S // Sc

                # Dynamic chunk bounds: only chunks intersecting the
                # UNION of the rows' valid slot ranges are streamed.
                # Valid slots are contiguous from 0 in both layouts
                # (bounded: [0, max_off); ring: head + min(wr, size)
                # slots always hold the most recent window), so an
                # unbounded pool's cost grows with actual ring FILL,
                # not the allocated 8192-slot window — early/mid-stream
                # steps cost the same as a bounded pool.  The window's
                # lower bound additionally skips leading chunks wholly
                # below every row's attention band (bounded mode only;
                # ring slots never age out by slot index).
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

                def kv_dma(c, slot):
                    return (
                        pltpu.make_async_copy(
                            kc_ref.at[l, :, :, pl.ds(c * Sc, Sc), :],
                            kbuf.at[slot], sem_kv.at[0, slot]),
                        pltpu.make_async_copy(
                            vc_ref.at[l, :, :, pl.ds(c * Sc, Sc), :],
                            vbuf.at[slot], sem_kv.at[1, slot]),
                    )

                @pl.when(c_lo < n_used)
                def _():
                    for cp in kv_dma(c_lo, jax.lax.rem(c_lo, 2)):
                        cp.start()

                # Finite -1e30 init keeps every carry finite (an
                # all-masked chunk leaves m at -1e30 and its exp(-inf -
                # (-1e30)) weights at exactly 0 — no inf-inf NaNs).
                m0 = jnp.full((B * n_kv, groups), -1e30, jnp.float32)
                d0 = jnp.zeros((B * n_kv, groups), jnp.float32)
                c0 = jnp.zeros((B * n_kv, groups, head_dim), jnp.float32)

                def chunk_body(c, carry):
                    m_r, d_r, ctx_r = carry

                    @pl.when(c + 1 < n_used)
                    def _():
                        nxt = jax.lax.rem(c + 1, 2)
                        for cp in kv_dma(c + 1, nxt):
                            cp.start()

                    slot = jax.lax.rem(c, 2)
                    for cp in kv_dma(c, slot):
                        cp.wait()
                    kcc = kbuf[slot].reshape(B * n_kv, Sc, head_dim)
                    vcc = vbuf[slot].reshape(B * n_kv, Sc, head_dim)
                    if cache_q:
                        ksc = ks_ref[0, :, :, pl.ds(c * Sc, Sc)].reshape(
                            B * n_kv, Sc)
                        vsc = vs_ref[0, :, :, pl.ds(c * Sc, Sc)].reshape(
                            B * n_kv, Sc)
                    else:
                        ksc = vsc = None
                    s = scores_of(kcc, ksc, c * Sc)
                    m_new = jnp.maximum(m_r, jnp.max(s, axis=-1))
                    alpha = jnp.exp(m_r - m_new)
                    e = jnp.exp(s - m_new[..., None])
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
                       + e_self[..., None] * v.reshape(B * n_kv, 1,
                                                       head_dim))
            else:
                kc = kc_ref[0].reshape(B * n_kv, S, head_dim)
                vc = vc_ref[0].reshape(B * n_kv, S, head_dim)
                if cache_q:
                    ks = ks_ref[0].reshape(B * n_kv, S)
                    vs = vs_ref[0].reshape(B * n_kv, S)
                else:
                    ks = vs = None
                scores = scores_of(kc, ks, 0)
                m = jnp.maximum(jnp.max(scores, axis=-1), self_s)
                e_cache = jnp.exp(scores - m[..., None])
                e_self = jnp.exp(self_s - m)
                denom = jnp.sum(e_cache, axis=-1) + e_self
                ctx = ctx_of(e_cache, vc, vs)
                ctx = ctx + e_self[..., None] * v.reshape(B * n_kv, 1,
                                                          head_dim)
            attn = (ctx / denom[..., None]).reshape(B, nq)

            xq, sx = prep(attn)
            x = x + stream("wo", xq, sx, so_ref, tails["wo"])

            # ---- FFN block -----------------------------------------------
            var = jnp.mean(x * x, axis=-1, keepdims=True)
            h = x * jax.lax.rsqrt(var + eps) * ffn_norm_ref[0]
            h = h * ada_ref[0]
            xq, sx = prep(h)
            up = stream("w13", xq, sx, s13_ref, tails["w13"])
            gate, upv = up[:, :hidden], up[:, hidden:]
            hmid = gate * jax.nn.sigmoid(gate) * upv
            xq, sx = prep(hmid)

            def issue_next(i):
                def issue():
                    # Each branch is gated by ITS OWN prefetch depth:
                    # the qkv stream's loop issues j+STACK_PRE['qkv']
                    # from iteration 0 and the lm loop issues j+LM_PRE,
                    # so pre-issuing a tile at or beyond a stream's own
                    # depth would double-start its DMA into an in-use
                    # rotating slot when the env-overridable depths
                    # differ (VOXTRAL_STACK_PRE vs VOXTRAL_LM_PRE).
                    if i < STACK_PRE["qkv"]:
                        @pl.when(l + 1 < L)
                        def _():
                            if i < plan["qkv"][1]:
                                dma("qkv", l + 1, i).start()

                    if lm is not None and i < LM_PRE:
                        @pl.when(l + 1 == L)
                        def _():
                            if i < lm[0] // lm[1]:
                                lm_dma(i).start()
                return issue

            # w2's tail pre-issues BOTH the next layer's leading qkv
            # tiles and (on the last layer) the lm phase's LM_PRE tiles
            # — the tail must be as deep as the larger of the two, or
            # the lm stream would wait on a tile never issued.
            w2_tail = [issue_next(i)
                       for i in range(max(STACK_PRE["qkv"], LM_PRE))]
            x = x + stream("w2", xq, sx, s2_ref, w2_tail)

            x_s[:] = x

            @pl.when(l == L - 1)
            def _():
                xo_ref[:] = x

        if lm is not None:
            @pl.when(l == L)
            def _lm_head():
                V, t = lm
                n_tiles = V // t
                x = x_s[:]
                var = jnp.mean(x * x, axis=-1, keepdims=True)
                h = x * jax.lax.rsqrt(var + eps) * fnorm_ref[0]
                xq, sx = prep(h)
                if wg:
                    xms_lm = _g32_mask_codes(xq, D, xq.shape[0])

                # Tiles 0..LM_PRE-1 were pre-issued during the last
                # layer's w2 tail; issuing j+LM_PRE before waiting on j
                # never touches an in-use slot of the LM_SLOTS-deep
                # rotating buffer.
                def tile_logits(j):
                    @pl.when(j + LM_PRE < n_tiles)
                    def _():
                        lm_dma(j + LM_PRE).start()

                    slot = jax.lax.rem(j, LM_SLOTS)
                    lm_dma(j).wait()
                    if wg:
                        return _g32_matmul_tile(
                            xms_lm, sx, buf_lm[slot], sbuf_lm[slot])
                    z = jax.lax.dot_general(
                        xq, buf_lm[slot],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=(jnp.int32 if wq8
                                                else jnp.float32),
                    )
                    if not wq8:
                        return z  # dense bf16 table: no row scales
                    return (z.astype(jnp.float32) * sx
                            * lms_ref[0, pl.ds(j * t, t)][None, :])

                if lm_argmax:
                    # Greedy fold: running (max, first-argmax) across the
                    # vocab tiles — the [B, V] logits never materialize
                    # and the XLA argmax pass after the kernel is gone.
                    def body(j, carry):
                        best_v, best_i = carry
                        vals = tile_logits(j)  # [B, t]
                        idx = j * t + jax.lax.broadcasted_iota(
                            jnp.int32, vals.shape, 1)
                        tb = jnp.max(vals, axis=1, keepdims=True)
                        ti = jnp.min(
                            jnp.where(vals >= tb, idx, jnp.int32(2**30)),
                            axis=1, keepdims=True)
                        upd = tb > best_v  # strict: ties keep 1st tile
                        return (jnp.maximum(best_v, tb),
                                jnp.where(upd, ti, best_i))

                    init = (jnp.full((B, 1), -jnp.inf, jnp.float32),
                            jnp.zeros((B, 1), jnp.int32))
                    _, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
                    logits_ref[:] = best_i
                else:
                    def body(j, _):
                        logits_ref[:, pl.ds(j * t, t)] = tile_logits(j)
                        return 0

                    jax.lax.fori_loop(0, n_tiles, body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv", "head_dim", "eps", "interpret",
                     "window", "ring", "lm_argmax", "cache_chunk", "spec"),
)
def decode_stack_step(
    x, offset,
    attn_norms, ffn_norms, ada_vecs,
    sqkv, so, s13, s2, cos_p, sin_p,
    k_cache, v_cache,
    wqkv, wo, w13, w2,
    final_norm=None, lm_codes=None, lm_scale=None,
    k_scales=None, v_scales=None,
    n_heads=32, n_kv=8, head_dim=128, eps=1e-5, interpret=False,
    window=None, ring=None, lm_argmax=False, cache_chunk=None, spec=1,
):
    """All decoder layers of a single-token decode step in ONE kernel.

    x [B, D] f32; caches PRE-TRANSPOSED [L, B, Hkv, S, hd] (head-major,
    so in-kernel attention contractions are MXU dots with no transpose);
    stacked weights wqkv [L, NQKV, D] int8 etc. with per-layer scale
    stacks (sqkv [L, NQKV] f32, ...); norm stacks [L, D].

    ``offset`` may be a scalar or a PER-ROW [B] vector, and cos_p/sin_p
    may be [hd] or per-row [B, hd] — mixed-progress batches (pooled
    streaming sessions) each mask their own cache validity and rotate at
    their own absolute position.  Returns (x_out [B, D] f32, k_new,
    v_new [L, B, Hkv, hd]) — the caller appends k_new/v_new at
    ``offset`` (axis 3, per row) across all layers at once.

    When ``final_norm`` [D] + ``lm_codes`` [V, D] int8 + ``lm_scale``
    [V] are given, the final RMSNorm and tied lm_head run as one extra
    grid step and a 4th output ``logits`` [B, V] f32 is returned — the
    whole decode step (minus argmax/embed feedback) is then a single
    kernel whose weight DMA never drains.

    ``lm_argmax=True`` (with the lm fold) runs the greedy argmax INSIDE
    the lm grid step — a running (max, first-index) across vocab tiles —
    so the 4th output is int32 token indices [B, 1] and the [B, V]
    logits never materialize (greedy decode only; sampling needs the
    logits).

    int8 KV cache (halves the dominant VMEM term, the TPU-native lever
    for bigger pools / longer bounded sessions): pass int8 caches plus
    ``k_scales``/``v_scales`` [L, B, Hkv, S] f32 — per-appended-vector
    scales (quantized by the CALLER at append time).  Both attention
    contractions then ride the int8 MXU: the K scale factors out of the
    head_dim dot, and the V scale folds into the softmax weights before
    they are requantized.  k_new/v_new come back bf16 for the caller to
    quantize + append.

    bf16 weight mode (the W8A8 accuracy hedge — dense models keep the
    fused single-kernel step): pass ``wqkv`` as a TUPLE (wq, wk, wv) of
    [L, N, K] bf16 arrays and ``w13`` as (w1, w3) (the transposed dense
    leaves from :func:`fuse_decode_weights_bf16` — streamed directly so
    nothing is duplicated), ``wo``/``w2`` as single bf16 arrays, and the
    scale stacks as None.  The matmuls then run bf16 x bf16 with f32
    accumulation on the MXU; the tile schedule is identical (tiles carry
    half the rows — the byte budget is what matters).  A folded lm_head
    takes ``lm_codes`` as the bf16 [V, D] embedding table with
    ``lm_scale=None``.

    Speculative K-token verification (``spec=K > 1``): x carries
    B_l * K rows ordered (stream b, draft slot j); the caches keep
    B_l rows (one per stream, shared by its K draft rows); ``offset``
    is per-STREAM [B_l]; cos_p/sin_p are per-ROW at positions
    offs[b] + j.  Row j attends the shared cache (positions < offs[b])
    plus the fresh K/V of rows i <= j of its stream — exact greedy
    logits for K drafted tokens in ONE weight pass (the weight stream
    dominates the step, so K rides nearly free).  The caller accepts
    the longest prefix where argmax matches the draft and appends all
    K fresh K/V rows at slots offs[b]..offs[b]+K-1 (rows past the
    accepted count are overwritten by later appends and masked by
    validity meanwhile).  With the int8 KV cache, the kernel reads the
    fresh rows i < j EXACTLY as the sequential step would read them
    back from the cache — roundtripped through the bf16 k_new/v_new
    output dtype and the ``quantize_kv`` append quantization, with the
    softmax-weight requantization sharing ONE scale group across cache
    slots and fresh rows (matching ``ctx_of``'s per-row group) — so
    spec + int8 pools stay token-identical to sequential int8 pools.
    Not supported with ``cache_chunk`` (the sequential chunked path's
    requant groups are per-chunk; fresh rows cannot join them exactly).
    """
    B, D = x.shape
    L, _, _, S = k_cache.shape[:4]
    if spec > 1:
        if B % spec:
            raise ValueError(f"spec={spec} must divide the row count {B}")
        if cache_chunk is not None:
            raise ValueError("speculative decode + cache_chunk unsupported")
    Bc = B // spec  # cache rows (= logical streams)
    if k_cache.shape[1] != Bc:
        raise ValueError(
            f"cache rows {k_cache.shape[1]} != streams {Bc} (= B/spec)")
    wqkv_segs = wqkv if isinstance(wqkv, tuple) else (wqkv,)
    wo_segs = wo if isinstance(wo, tuple) else (wo,)
    w13_segs = w13 if isinstance(w13, tuple) else (w13,)
    w2_segs = w2 if isinstance(w2, tuple) else (w2,)
    wdtype = wqkv_segs[0].dtype
    # g32 mode (exact Q4_0 numerics, VERDICT r4 #1b): codes arrive
    # pre-transposed [L, SB, N, 128] int8 with f32 group scales
    # [L, 4*SB, 1, N] in the scale-stack slots (fuse_decode_weights_q4g).
    wg = not isinstance(wqkv, tuple) and wqkv.ndim == 4
    wq8 = wdtype == jnp.int8
    if wg:
        if not wq8:
            raise ValueError("g32 stack weights must be int8 codes")
        if any(len(s) != 1 for s in (wqkv_segs, wo_segs, w13_segs, w2_segs)):
            raise ValueError("g32 mode streams single concatenated stacks")
        for s in (sqkv, so, s13, s2):
            if s is None or s.ndim != 4:
                raise ValueError(
                    "g32 mode needs [L, 4*SB, 1, N] group-scale stacks")
    witem = jnp.dtype(wdtype).itemsize
    # Tile budgeting charges the scale tiles that ride along with g32
    # code tiles (f32 per 32 weights = +12.5% bytes).
    plan_item = 1.125 if wg else witem
    hidden = w2_segs[0].shape[1] * 128 if wg else w2_segs[0].shape[2]
    nq = n_heads * head_dim
    nqkv = nq + 2 * n_kv * head_dim
    n_axis = 2 if wg else 1
    seg_rows = {
        "qkv": [w.shape[n_axis] for w in wqkv_segs],
        "wo": [w.shape[n_axis] for w in wo_segs],
        "w13": [w.shape[n_axis] for w in w13_segs],
        "w2": [w.shape[n_axis] for w in w2_segs],
    }
    plan = _stack_plan(D, nqkv, nq, hidden, itemsize=plan_item,
                       segs=seg_rows)
    if plan is None:
        raise ValueError("decode_stack_step: dims not tileable")
    if wg and any(plan[n][2] % 128 for n in plan):
        raise ValueError("g32 mode needs contraction dims % 128 == 0")
    cache_q = k_cache.dtype == jnp.int8
    if cache_q and (k_scales is None or v_scales is None):
        raise ValueError("int8 KV cache needs k_scales/v_scales")
    if not wq8:
        # Dense weights carry no row scales; the kernel never reads the
        # scale refs in bf16 mode, but the ref plumbing stays uniform.
        sqkv = jnp.ones((L, nqkv), jnp.float32) if sqkv is None else sqkv
        so = jnp.ones((L, D), jnp.float32) if so is None else so
        s13 = jnp.ones((L, 2 * hidden), jnp.float32) if s13 is None else s13
        s2 = jnp.ones((L, D), jnp.float32) if s2 is None else s2

    lm = None
    if lm_codes is not None:
        if (lm_codes.dtype == jnp.int8) != wq8:
            raise ValueError("lm_codes dtype must match the weight mode")
        if wg:
            if lm_codes.ndim != 3 or lm_scale is None or lm_scale.ndim != 3:
                raise ValueError(
                    "g32 lm fold needs codes [SB, V, 128] + scales "
                    "[4*SB, 1, V] (q4g_lm_head)")
            V = lm_codes.shape[1]
        else:
            V = lm_codes.shape[0]
        t_lm = _lm_tile(V, D, plan_item)
        if t_lm is None:
            raise ValueError("decode_stack_step: vocab not tileable")
        lm = (V, t_lm)
        if not wq8 and lm_scale is None:
            lm_scale = jnp.ones((V,), jnp.float32)

    lm_argmax = bool(lm_argmax and lm is not None)
    if cache_chunk is not None and S % cache_chunk:
        raise ValueError(
            f"cache_chunk {cache_chunk} must divide S {S} (pad the cache)")
    kernel = _make_stack_kernel(
        B, D, S, L, n_heads, n_kv, head_dim, hidden, plan, eps, lm,
        window, ring, cache_q=cache_q, lm_argmax=lm_argmax,
        cache_chunk=cache_chunk, wq8=wq8, seg_rows=seg_rows, spec=spec,
        wg=wg)

    def vmem(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    const2 = lambda l, offs: (0, 0)  # noqa: E731
    const3 = lambda l, offs: (0, 0, 0)  # noqa: E731
    if lm is None:
        # Per-layer vectors ride as [L, 1, dim] so the (1, 1, dim)
        # block's last two dims satisfy the TPU (8, 128)-or-full-dim
        # block rule.
        perl3 = lambda l, offs: (l, 0, 0)  # noqa: E731
        perl5 = lambda l, offs: (l, 0, 0, 0, 0)  # noqa: E731
        perl4 = lambda l, offs: (l, 0, 0, 0)  # noqa: E731
    else:
        # Grid runs one step past the last layer (the lm_head step);
        # clamp so Pallas doesn't prefetch an out-of-range block (the
        # unchanged index means no refetch happens at l == L).
        clamp = lambda l: jnp.minimum(l, L - 1)  # noqa: E731
        perl3 = lambda l, offs: (clamp(l), 0, 0)  # noqa: E731
        perl5 = lambda l, offs: (clamp(l), 0, 0, 0, 0)  # noqa: E731
        perl4 = lambda l, offs: (clamp(l), 0, 0, 0)  # noqa: E731

    in_specs = [
        vmem((B, D), const2),                       # x
        vmem((1, 1, D), perl3),                     # attn_norm
        vmem((1, 1, D), perl3),                     # ffn_norm
        vmem((1, 1, D), perl3),                     # ada
    ] + (
        # g32 group scales stay in HBM and stream with the code tiles.
        [pl.BlockSpec(memory_space=pl.ANY)] * 4
        if wg else
        [vmem((1, 1, nqkv), perl3),                 # sqkv
         vmem((1, 1, D), perl3),                    # so
         vmem((1, 1, 2 * hidden), perl3),           # s13
         vmem((1, 1, D), perl3)]                    # s2
    ) + [
        vmem((B, n_heads, head_dim), const3),       # cos (per-row, per-head)
        vmem((B, n_heads, head_dim), const3),       # sin
    ] + (
        # Chunked mode keeps the caches in HBM (manual S-chunk DMA);
        # resident mode gives Pallas the whole per-layer block.
        [pl.BlockSpec(memory_space=pl.ANY)] * 2
        if cache_chunk else
        [vmem((1, Bc, n_kv, S, head_dim), perl5),   # k cache (head-major)
         vmem((1, Bc, n_kv, S, head_dim), perl5)]   # v cache
    )
    if cache_q:
        in_specs += [
            vmem((1, Bc, n_kv, S), perl4),          # k scales
            vmem((1, Bc, n_kv, S), perl4),          # v scales
        ]
    offs = jnp.broadcast_to(
        jnp.asarray(offset, jnp.int32).reshape(-1), (Bc,))
    cos_b = jnp.broadcast_to(
        cos_p.astype(jnp.float32).reshape(-1, 1, head_dim),
        (B, n_heads, head_dim))
    sin_b = jnp.broadcast_to(
        sin_p.astype(jnp.float32).reshape(-1, 1, head_dim),
        (B, n_heads, head_dim))
    operands = [
        x.astype(jnp.float32),
        attn_norms.astype(jnp.float32).reshape(L, 1, D),
        ffn_norms.astype(jnp.float32).reshape(L, 1, D),
        ada_vecs.astype(jnp.float32).reshape(L, 1, D),
    ] + (
        [sqkv.astype(jnp.float32), so.astype(jnp.float32),
         s13.astype(jnp.float32), s2.astype(jnp.float32)]
        if wg else
        [sqkv.astype(jnp.float32).reshape(L, 1, nqkv),
         so.astype(jnp.float32).reshape(L, 1, D),
         s13.astype(jnp.float32).reshape(L, 1, 2 * hidden),
         s2.astype(jnp.float32).reshape(L, 1, D)]
    ) + [
        cos_b,
        sin_b,
        k_cache, v_cache,
    ]
    if cache_q:
        operands += [
            k_scales.astype(jnp.float32).reshape(L, Bc, n_kv, S),
            v_scales.astype(jnp.float32).reshape(L, Bc, n_kv, S),
        ]
    kv_out = jnp.bfloat16 if cache_q else k_cache.dtype
    out_specs = [
        vmem((B, D), const2),
        vmem((1, B, n_kv, head_dim), perl4),
        vmem((1, B, n_kv, head_dim), perl4),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, D), jnp.float32),
        jax.ShapeDtypeStruct((L, B, n_kv, head_dim), kv_out),
        jax.ShapeDtypeStruct((L, B, n_kv, head_dim), kv_out),
    ]
    if wg:
        scratch = [
            pltpu.VMEM((STACK_SLOTS[name], plan[name][2] // 128,
                        plan[name][0], 128), wdtype)
            for name in ("qkv", "wo", "w13", "w2")
        ]
    else:
        scratch = [
            pltpu.VMEM((STACK_SLOTS[name], plan[name][0], plan[name][2]),
                       wdtype)
            for name in ("qkv", "wo", "w13", "w2")
        ]
    if lm is not None:
        V, t_lm = lm
        in_specs += [
            vmem((1, D), const2),                   # final norm
            (pl.BlockSpec(memory_space=pl.ANY) if wg
             else vmem((1, V), const2)),            # lm scales
        ]
        operands += [
            final_norm.astype(jnp.float32).reshape(1, D),
            (lm_scale.astype(jnp.float32) if wg
             else lm_scale.astype(jnp.float32).reshape(1, V)),
        ]
        if lm_argmax:
            # Greedy token indices [B, 1] instead of [B, V] logits.
            out_specs.append(vmem((B, 1), const2))
            out_shape.append(jax.ShapeDtypeStruct((B, 1), jnp.int32))
        else:
            out_specs.append(vmem((B, V), const2))  # logits
            out_shape.append(jax.ShapeDtypeStruct((B, V), jnp.float32))
        scratch.append(
            pltpu.VMEM((LM_SLOTS, D // 128, t_lm, 128), wdtype) if wg
            else pltpu.VMEM((LM_SLOTS, t_lm, D), wdtype))

    weights = [*wqkv_segs, *wo_segs, *w13_segs, *w2_segs] + (
        [lm_codes] if lm is not None else [])
    weight_specs = [pl.BlockSpec(memory_space=pl.ANY)] * len(weights)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L + 1,) if lm is not None else (L,),
        in_specs=in_specs + weight_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch + [
            pltpu.VMEM((B, D), jnp.float32),
            pltpu.SemaphoreType.DMA((5, max(max(STACK_SLOTS.values()),
                                LM_SLOTS))),
        ] + ([
            # g32 scale-tile rotating buffers (one per phase, + lm) and
            # their own DMA semaphore set.
            pltpu.VMEM((STACK_SLOTS[name], plan[name][2] // 32, 1,
                        plan[name][0]), jnp.float32)
            for name in ("qkv", "wo", "w13", "w2")
        ] + ([pltpu.VMEM((LM_SLOTS, D // 32, 1, lm[1]), jnp.float32)]
             if lm is not None else [])
        + [pltpu.SemaphoreType.DMA((5, max(max(STACK_SLOTS.values()),
                                           LM_SLOTS)))]
        if wg else []) + ([
            pltpu.VMEM((2, B, n_kv, cache_chunk, head_dim), k_cache.dtype),
            pltpu.VMEM((2, B, n_kv, cache_chunk, head_dim), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ] if cache_chunk else []),
    )

    # VMEM limit: the tuned 64 MB default covers transcribe shapes; big
    # pooled caches (large B*S) raise it up to the v5e headroom cap.
    need = stack_vmem_need(B, S, D, n_heads, n_kv, head_dim, hidden,
                           lm[0] if lm is not None else None,
                           jnp.dtype(k_cache.dtype).itemsize,
                           cache_chunk=cache_chunk,
                           weight_itemsize=plan_item, spec=spec)
    limit = max(64 * 2**20, min(STACK_VMEM_CAP, need))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=limit,
        ),
        interpret=interpret,
    )(offs, *operands, *weights)
    return out


def quantize_kv(vecs):
    """Per-vector int8 quantization for the int8 KV cache option.

    vecs [..., hd] (any float dtype) -> (codes int8 same shape,
    scales f32 [...]).  Used both to convert a prefilled bf16 cache
    (axis -1 over every position) and to quantize the fresh k_new/v_new
    at each append.
    """
    v = vecs.astype(jnp.float32)
    a = jnp.max(jnp.abs(v), axis=-1)
    s = jnp.maximum(a, 1e-8) / 127.0
    q = jnp.clip(jnp.round(v / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def supports_stack_kernel(lm_cfg, weight_itemsize: int = 1) -> bool:
    """True when the whole-stack kernel can tile this geometry
    (``weight_itemsize``: 1 = w8 concatenated stacks, 2 = bf16 per-leaf
    segments)."""
    nq = lm_cfg.n_heads * lm_cfg.head_dim
    nkv = lm_cfg.n_kv_heads * lm_cfg.head_dim
    nqkv = nq + 2 * nkv
    segs = _stack_segs(nqkv, nq, nkv, lm_cfg.hidden_dim,
                       weight_itemsize < 2)
    return _stack_plan(lm_cfg.dim, nqkv, nq, lm_cfg.hidden_dim,
                       itemsize=weight_itemsize, segs=segs) is not None


def rope_pair_vectors(position, head_dim, theta=1_000_000.0):
    """C/S vectors for the adjacent-pair RoPE formulation at ``position``.

    Returns (c [hd], s [hd]) with c[2i]=c[2i+1]=cos(p*f_i),
    s[2i]=-sin(p*f_i), s[2i+1]=+sin(p*f_i) — matches layers.apply_rope's
    interleaved-pair semantics for a single position.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (
        jnp.arange(half, dtype=jnp.float32) * 2.0 / head_dim))
    ang = position.astype(jnp.float32) * inv_freq  # [half]
    c = jnp.repeat(jnp.cos(ang), 2)
    s = jnp.stack([-jnp.sin(ang), jnp.sin(ang)], axis=-1).reshape(-1)
    return c, s


def fuse_decode_weights(decoder_params: Params) -> Params:
    """Prepare the megakernel's fused stacked weights from w8 params.

    decoder_params["layers"] carries w8 dicts with codes [L, N, K] /
    scale [L, N]; returns the fused HBM arrays + per-layer norm/scale
    stacks the step function scans over.
    """
    lyr = decoder_params["layers"]
    att, ffn = lyr["attention"], lyr["ffn"]

    def codes(leaf):
        return leaf["w8"]["codes"]

    def scales(leaf):
        return leaf["w8"]["scale"].astype(jnp.float32)

    wqkv = jnp.concatenate(
        [codes(att["wq"]), codes(att["wk"]), codes(att["wv"])], axis=1)
    sqkv = jnp.concatenate(
        [scales(att["wq"]), scales(att["wk"]), scales(att["wv"])], axis=1)
    w13 = jnp.concatenate([codes(ffn["w1"]), codes(ffn["w3"])], axis=1)
    s13 = jnp.concatenate([scales(ffn["w1"]), scales(ffn["w3"])], axis=1)
    return {
        "wqkv": wqkv, "sqkv": sqkv,
        "wo": codes(att["wo"]), "so": scales(att["wo"]),
        "w13": w13, "s13": s13,
        "w2": codes(ffn["w2"]), "s2": scales(ffn["w2"]),
        "attn_norm": lyr["attention_norm"].astype(jnp.float32),
        "ffn_norm": lyr["ffn_norm"].astype(jnp.float32),
    }


def _g32_codes(codes) -> jax.Array:
    """int8 codes [..., N, K] -> the g32 streaming layout
    [..., SB, N, 128] (SB = K // 128)."""
    c = jnp.asarray(codes)
    *lead, n, k = c.shape
    return jnp.swapaxes(c.reshape(*lead, n, k // 128, 128), -3, -2)


def _g32_scales(scales) -> jax.Array:
    """f16 group scales [..., N, K/32] -> the g32 streaming layout
    [..., 4*SB, 1, N] f32, r-major: row r*SB + sb = scale of group
    4*sb + r (lanes r*32..r*32+31 of superblock sb).  f16 -> f32 is
    exact — the fused path keeps Q4_0's own scale precision."""
    s = jnp.asarray(scales, jnp.float32)
    *lead, n, g = s.shape
    s4 = s.reshape(*lead, n, g // 4, 4)
    axes = tuple(range(len(lead))) + tuple(
        len(lead) + i for i in (2, 1, 0))  # [..., 4, SB, N]
    return jnp.transpose(s4, axes).reshape(*lead, g, 1, n)


def fuse_decode_weights_q4g(decoder_params: Params) -> Params:
    """Prepare g32 (exact-Q4_0) fused stacks from q4 decoder params.

    The unpacked q4 leaves ({"codes": int8 [L, N, K], "scales": f16
    [L, N, K/32]}) ARE the exact group-32 int8 re-encoding of Q4_0
    (codes = nibble - 8, scales = the on-disk f16 block scales —
    reference /root/reference/src/gguf/tensor.rs:88-113), so the fused
    decode path computes with the reference's exact weight numerics;
    only the dynamic A8 activation quantization differs from the
    reference's f32-activation WGSL kernels (shader.wgsl:90-124).

    Returns the stacked HBM arrays for ``decode_stack_step``'s g32 mode:
    wqkv/wo/w13/w2 as [L, SB, N, 128] int8 with scale stacks
    [L, 4*SB, 1, N] f32, plus lm_codes/lm_scale when the token-embedding
    table is q4 (the tied lm_head folds into the kernel).
    """
    lyr = decoder_params["layers"]
    att, ffn = lyr["attention"], lyr["ffn"]

    def parts(leaf):
        q4 = leaf["q4"]
        if "codes" not in q4:
            raise ValueError(
                "q4g fusing needs unpacked q4 leaves (codes + f16 scales);"
                " packed codes carry bf16-rounded scales and stay per-op"
                " (load with pack_nibbles=False)")
        return q4["codes"], q4["scales"]

    def gc(leaf):
        return _g32_codes(parts(leaf)[0])

    def gs(leaf):
        return _g32_scales(parts(leaf)[1])

    out = {
        "wqkv": jnp.concatenate(
            [gc(att["wq"]), gc(att["wk"]), gc(att["wv"])], axis=2),
        "sqkv": jnp.concatenate(
            [gs(att["wq"]), gs(att["wk"]), gs(att["wv"])], axis=3),
        "wo": gc(att["wo"]), "so": gs(att["wo"]),
        "w13": jnp.concatenate([gc(ffn["w1"]), gc(ffn["w3"])], axis=2),
        "s13": jnp.concatenate([gs(ffn["w1"]), gs(ffn["w3"])], axis=3),
        "w2": gc(ffn["w2"]), "s2": gs(ffn["w2"]),
        "attn_norm": lyr["attention_norm"].astype(jnp.float32),
        "ffn_norm": lyr["ffn_norm"].astype(jnp.float32),
    }
    emb = decoder_params.get("tok_embeddings")
    if isinstance(emb, dict) and "q4" in emb and "codes" in emb["q4"]:
        out["lm_codes"] = _g32_codes(emb["q4"]["codes"])
        out["lm_scale"] = _g32_scales(emb["q4"]["scales"])
    return out


def q4g_geometry_ok(lm_cfg) -> bool:
    """g32 mode needs every streamed contraction dim % 128 == 0."""
    nq = lm_cfg.n_heads * lm_cfg.head_dim
    return not (lm_cfg.dim % 128 or nq % 128 or lm_cfg.hidden_dim % 128)


def supports_megakernel(decoder_params: Params, head_dim: int) -> bool:
    """The fused W8A8 kernel needs w8 layers and even head_dim."""
    return megakernel_mode(decoder_params, head_dim) == "w8"


def megakernel_mode(decoder_params: Params, head_dim: int):
    """Which stack-kernel weight mode this model supports.

    Returns "w8" (rowwise-int8 leaves -> the 4.48 ms W8A8 path), "q4g"
    (unpacked q4 leaves -> the exact-Q4_0 group-32 path, +12.5% scale
    bytes/step over w8), "bf16" (dense bf16/f32 leaves, or already
    nt-rewritten — the accuracy-hedge dense path, ~2x the bytes/step),
    or None (packed q4 dicts / odd head_dim — pair RoPE needs even
    lanes).
    """
    if head_dim % 2:
        return None
    lyr = decoder_params.get("layers", {})
    att, ffn = lyr.get("attention", {}), lyr.get("ffn", {})
    wq, w1 = att.get("wq"), ffn.get("w1")
    if wq is None or w1 is None:
        return None
    if isinstance(wq, dict):
        if "w8" in wq and isinstance(w1, dict) and "w8" in w1:
            return "w8"
        if "nt" in wq and isinstance(w1, dict) and "nt" in w1:
            return "bf16"
        if ("q4" in wq and isinstance(w1, dict) and "q4" in w1
                and "codes" in wq["q4"] and "codes" in w1["q4"]
                and wq["q4"]["codes"].shape[-1] % 128 == 0
                and w1["q4"]["codes"].shape[-1] % 128 == 0):
            return "q4g"
        return None
    if wq.dtype == jnp.bfloat16 and not isinstance(w1, dict):
        # f32 dense models keep the exact XLA path (the kernel computes
        # in bf16); bf16 models lose nothing to the fused step.
        return "bf16"
    return None


def fuse_decode_weights_bf16(decoder_params: Params) -> Params:
    """Prepare bf16 fused stacks from DENSE decoder params, memory-neutrally.

    Each dense [L, K, N] leaf is transposed once to the kernel's
    [L, N, K] layout (bf16) and the ORIGINAL leaf is replaced in-place by
    ``{"nt": w}`` — the prefill/XLA paths contract the transposed layout
    directly (models/layers.linear), so the 6 GB of decoder weights exist
    exactly once.  The returned fused dict references the SAME arrays:
    ``wqkv`` is the tuple (wq, wk, wv) and ``w13`` is (w1, w3) — the
    kernel streams the segments in sequence instead of a concatenated
    copy.  Scale keys are None (dense weights carry no row scales).

    Peak extra memory during the rewrite = one transposed leaf (~1.5 GB
    for w1/w3 at production shapes), freed leaf-by-leaf.
    """
    lyr = decoder_params["layers"]
    att, ffn = lyr["attention"], lyr["ffn"]

    def nt(leaf_dict, name):
        w = leaf_dict[name]
        if isinstance(w, dict):  # already rewritten
            return w["nt"]
        wt = jnp.swapaxes(w, 1, 2).astype(jnp.bfloat16)
        leaf_dict[name] = {"nt": wt}  # frees the [L, K, N] original
        return wt

    wq, wk, wv = nt(att, "wq"), nt(att, "wk"), nt(att, "wv")
    wo = nt(att, "wo")
    w1, w3 = nt(ffn, "w1"), nt(ffn, "w3")
    w2 = nt(ffn, "w2")
    return {
        "wqkv": (wq, wk, wv), "sqkv": None,
        "wo": wo, "so": None,
        "w13": (w1, w3), "s13": None,
        "w2": w2, "s2": None,
        "attn_norm": lyr["attention_norm"].astype(jnp.float32),
        "ffn_norm": lyr["ffn_norm"].astype(jnp.float32),
    }


def ada_vectors(decoder_params: Params, t_embed) -> jax.Array:
    """Precompute the per-layer ADA modulation vector 1 + w2(gelu(w0 t)).

    t_embed: [1, 1, D].  ADA weights are tiny (d->32->d) and may be dense
    or w8; evaluated with the standard linear() dispatch once per
    transcription — t does not change across decode steps, so the
    megakernel folds ADA into a single elementwise multiply.
    Returns [L, D] f32.
    """
    from voxtral_tpu.models.layers import linear

    ada = decoder_params["layers"]["ada"]

    def one(w0, w2):
        h = linear(t_embed[0].astype(jnp.float32), w0)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
        return 1.0 + linear(h, w2)[0].astype(jnp.float32)

    return jax.vmap(one)(ada["w0"], ada["w2"])  # [L, D]
