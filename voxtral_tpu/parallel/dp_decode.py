"""Data-parallel decode through the whole-stack Pallas kernel.

Decode is HBM-bound on weights (3.43 GB/token), so the linear-scaling
multi-chip axis for serving throughput is DATA parallelism: shard the
pooled batch rows over the mesh's ``data`` axis, replicate the weights,
and let every chip stream its own copy at full local HBM bandwidth —
zero collectives per token (the reference has no distributed runtime at
all; its serving is one wgpu queue).  Tensor-parallel decode would need
the kernel split at its two psum points (after WO / after W2) — see
ROADMAP; the XLA-path TP seam lives in :mod:`voxtral_tpu.parallel.mesh`.

``shard_map`` is required because ``pallas_call`` is opaque to the
partitioner — each shard runs the full kernel on its local rows with a
statically smaller B.  Validated against the unsharded kernel on a
virtual CPU mesh in ``tests/test_parallel.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from voxtral_tpu.parallel.mesh import DATA_AXIS


def dp_decode_stack_step(
    mesh: Mesh,
    x, offsets,
    attn_norms, ffn_norms, ada_vecs,
    sqkv, so, s13, s2, cos_b, sin_b,
    k_cache, v_cache,
    wqkv, wo, w13, w2,
    final_norm=None, lm_codes=None, lm_scale=None,
    k_scales=None, v_scales=None,
    n_heads=32, n_kv=8, head_dim=128, eps=1e-5, interpret=False,
    window=None, ring=None, lm_argmax=False, cache_chunk=None, spec=1,
):
    """``decode_stack_step`` with batch rows sharded over ``data``.

    Per-row forms are required (they are what pooled serving uses):
    ``offsets`` [B] int32, ``cos_b``/``sin_b`` [B, head_dim]; caches
    [L, B, Hkv, S, hd]; B must divide by the mesh's data-axis size.
    Weights/norms/scales are replicated.  ``k_scales``/``v_scales``
    ([L, B, Hkv, S], int8 KV cache mode) and ``cache_chunk`` (HBM-
    resident chunked cache) shard/forward like the caches, so the
    DP-pooled serving path keeps every single-chip cache variant.
    Returns the same outputs as the single-chip kernel with the batch
    axis sharded.

    ``spec=K > 1`` forwards speculative K-token verification: x and
    cos/sin carry B = streams*K rows while offsets/caches/scales carry
    one row per STREAM; the STREAM count must divide the data axis so
    every (stream, draft) row group lands on one shard with its cache.
    Zero collectives either way — each shard verifies its own streams.
    """
    from voxtral_tpu.ops.decode_step_pallas import decode_stack_step

    ndp = mesh.shape[DATA_AXIS]
    B = x.shape[0]
    Bc = B // spec
    if B % spec or Bc % ndp:
        raise ValueError(
            f"rows {B} (= streams x spec {spec}) must split into whole "
            f"streams per shard over the data axis {ndp}")

    fold = lm_codes is not None
    int8 = k_scales is not None
    rep = P()
    row = P(DATA_AXIS)
    rowfirst = P(DATA_AXIS, None)
    cache_s = P(None, DATA_AXIS, None, None, None)

    in_specs = [
        rowfirst,                       # x [B, D]
        row,                            # offsets [B]
        rep, rep, rep,                  # norm stacks / ada
        rep, rep, rep, rep,             # scale stacks
        rowfirst, rowfirst,             # cos/sin [B, hd]
        cache_s, cache_s,               # caches
        rep, rep, rep, rep,             # weights
    ]
    out_specs = [rowfirst,              # x_out
                 P(None, DATA_AXIS, None, None),   # k_new [L, B, Hkv, hd]
                 P(None, DATA_AXIS, None, None)]   # v_new
    operands = [x, jnp.asarray(offsets, jnp.int32).reshape(Bc),
                attn_norms, ffn_norms, ada_vecs, sqkv, so, s13, s2,
                jnp.broadcast_to(
                    jnp.asarray(cos_b, jnp.float32).reshape(-1, head_dim),
                    (B, head_dim)),
                jnp.broadcast_to(
                    jnp.asarray(sin_b, jnp.float32).reshape(-1, head_dim),
                    (B, head_dim)),
                k_cache, v_cache, wqkv, wo, w13, w2]
    if fold:
        in_specs += [rep, rep, rep]
        operands += [final_norm, lm_codes, lm_scale]
        # Folded output: token [B, 1] under lm_argmax, else logits [B, V].
        out_specs.append(rowfirst)
    if int8:
        scale_spec = P(None, DATA_AXIS, None, None)
        in_specs += [scale_spec, scale_spec]
        operands += [k_scales, v_scales]

    def shard_fn(*args):
        args = list(args)
        lm_kw = {}
        scale_kw = {}
        if int8:
            vs = args.pop()
            ks = args.pop()
            scale_kw = dict(k_scales=ks, v_scales=vs)
        if fold:
            lms = args.pop()
            lmc = args.pop()
            fnorm = args.pop()
            lm_kw = dict(final_norm=fnorm, lm_codes=lmc, lm_scale=lms)
        (xs, offs, an, fn_, ad, q, o, s1, s2_, c, s,
         kc, vc, w0, w1, w2_, w3) = args
        return decode_stack_step(
            xs, offs, an, fn_, ad, q, o, s1, s2_, c, s, kc, vc,
            w0, w1, w2_, w3,
            n_heads=n_heads, n_kv=n_kv, head_dim=head_dim, eps=eps,
            interpret=interpret, window=window, ring=ring,
            lm_argmax=lm_argmax, cache_chunk=cache_chunk, spec=spec,
            **lm_kw, **scale_kw)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=tuple(in_specs), out_specs=tuple(out_specs),
        check_vma=False,
    )(*operands)
