"""Op-level microbenchmarks at the real decode shapes.

The TPU analogue of the reference's Criterion kernel benches
(``/root/reference/benches/q4_ops.rs:1-95``, ``q4_pipeline.rs``): every
number a kernel docstring cites must be reproducible by one command:

    python benches/kernel_bench.py                 # all suites, TPU
    python benches/kernel_bench.py --suite matmul --m 1,2,4,8
    python benches/kernel_bench.py --suite step --batch 1,2,4

Timing discipline (CLAUDE.md "Environment gotchas"): the axon tunnel's
``block_until_ready`` does not block and identical-input repeat loops get
algebraically folded by XLA, so every suite

* chains iterations through a data dependency (``lax.scan`` whose carry
  feeds the next iteration's input),
* passes weights as jit ARGUMENTS (closure constants show ~10x lower
  effective bandwidth),
* fetches one value at the end (the only true synchronization), and
* reports the slope between two scan lengths (subtracts dispatch +
  constant overhead).

Effective GB/s counts the weight bytes that must cross HBM per iteration
(activations are negligible at decode M).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Decode-path weight shapes [N(out), K(in)] of the production model.
DECODE_SHAPES = {
    "wq": (4096, 3072),
    "wk": (1024, 3072),
    "wo": (3072, 4096),
    "w1/w3": (9216, 3072),
    "w2": (3072, 9216),
    "lm_head": (131072, 3072),
}
# One decoder layer's matmul weights (wk == wv).
LAYER_SHAPES = [
    (4096, 3072), (1024, 3072), (1024, 3072), (3072, 4096),
    (9216, 3072), (9216, 3072), (3072, 9216),
]


def _fold(y, k):
    """Map a [M, N] f32 output back onto a [M, K] input (data dependency
    that XLA cannot fold away across iterations)."""
    import jax.numpy as jnp

    n = y.shape[-1]
    if n >= k:
        return y[..., :k]
    reps = -(-k // n)
    return jnp.tile(y, (1, reps))[..., :k]


def _timed_slope(run, short: int, long: int, reps: int = 3) -> float:
    """Per-iteration seconds via the slope between two chained scan
    lengths (one value fetch each — the only real sync over axon).

    Dispatch/tunnel noise is several ms, so callers must size
    ``long - short`` to tens of ms of real work; min-of-reps suppresses
    the remaining jitter.
    """
    np.asarray(run(short))  # warmup/compile for the short program
    np.asarray(run(long))   # warmup/compile for the long program

    def best(length):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(length))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(long) - best(short)) / (long - short)


def bench_matmul_variant(name, make_fn, m, n, k, weight_bytes,
                         short=None, long=None):
    """Generic chained matmul bench.  ``make_fn(key)`` returns
    (fn, weights) with fn(x, *weights) -> [M, N] f32-ish."""
    import jax
    import jax.numpy as jnp

    if short is None or long is None:
        # Size the measured iteration delta to ~40 GB of weight traffic
        # (~60 ms at HBM speed) so tunnel jitter cannot swamp the slope.
        diff = max(64, min(4000, int(4e10 / weight_bytes)))
        short, long = max(8, diff // 10), max(8, diff // 10) + diff

    fn, weights = make_fn()
    # Device-resident ONCE: numpy args would re-upload the weights over
    # the tunnel on every call, swamping the slope with transfer noise.
    weights = tuple(jnp.asarray(w) for w in weights)
    x0 = jnp.asarray(
        (np.random.RandomState(0).randn(m, k) * 0.5).astype(np.float32)
    )

    def run_body(x0, length, *w):
        def body(x, _):
            y = fn(x, *w)
            # Perturbation must exceed bf16 epsilon at |x0|~0.5 (~4e-3):
            # smaller deltas round away in low-precision variants and XLA
            # hoists the then-loop-invariant dot out of the scan entirely
            # (observed as impossible TB/s numbers).
            x2 = x0 + 5e-2 * _fold(y.astype(jnp.float32), k)
            return x2, ()
        x, _ = jax.lax.scan(body, x0, None, length=length)
        return x[0, 0]

    import functools

    @functools.lru_cache(maxsize=None)
    def _jitted(length):
        # length must be static: one jitted program per scan length.
        return jax.jit(lambda x0, *w: run_body(x0, length, *w))

    def runner(length):
        return _jitted(length)(x0, *weights)

    per_iter = _timed_slope(runner, short, long)
    gbps = weight_bytes / per_iter / 1e9
    return {
        "bench": name, "m": m, "n": n, "k": k,
        "us": round(per_iter * 1e6, 1),
        "eff_gbps": round(gbps, 1),
    }


def make_w8_xla(n, k):
    from voxtral_tpu.ops.w8 import quantize_w8_rowwise, w8_matmul

    w = (np.random.RandomState(1).randn(n, k) * 0.05).astype(np.float32)
    q = quantize_w8_rowwise(w)["w8"]

    def fn(x, codes, scale):
        return w8_matmul(x, {"codes": codes, "scale": scale})

    return fn, (q["codes"], q["scale"])


def make_w8_pallas(n, k):
    from voxtral_tpu.ops.w8 import _quantize_activations, quantize_w8_rowwise
    from voxtral_tpu.ops.w8_pallas import w8_matmul_pallas

    w = (np.random.RandomState(1).randn(n, k) * 0.05).astype(np.float32)
    q = quantize_w8_rowwise(w)["w8"]

    def fn(x, codes, scale):
        xq, sx = _quantize_activations(x)
        return w8_matmul_pallas(xq, sx, codes, scale)

    return fn, (q["codes"], q["scale"])


def make_bf16(n, k):
    import jax.numpy as jnp

    w = (np.random.RandomState(1).randn(k, n) * 0.05).astype(np.float32)
    wb = np.asarray(w, dtype=jnp.bfloat16)

    def fn(x, w):
        return jnp.dot(x.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32)

    return fn, (wb,)


def make_q4_packed(n, k):
    from voxtral_tpu.ops.q4 import q4_matmul
    from voxtral_tpu.utils.quantize import _quantize_matrix

    w = (np.random.RandomState(1).randn(n, k) * 0.05).astype(np.float32)
    q4 = _quantize_matrix(w)["q4"]
    keys = sorted(q4.keys())

    def fn(x, *leaves):
        # Rebuild the dict from flattened leaves (weights must be args).
        return q4_matmul(x.astype("bfloat16"), dict(zip(keys, leaves)))

    return fn, tuple(q4[kk] for kk in keys)


def suite_matmul(ms, include_q4):
    results = []
    for m in ms:
        for shape_name, (n, k) in DECODE_SHAPES.items():
            wb = n * k + 4 * n
            r = bench_matmul_variant(
                f"w8_xla:{shape_name}", lambda n=n, k=k: make_w8_xla(n, k),
                m, n, k, wb)
            results.append(r)
            print(json.dumps(r), flush=True)
            try:
                r = bench_matmul_variant(
                    f"w8_pallas:{shape_name}",
                    lambda n=n, k=k: make_w8_pallas(n, k), m, n, k, wb)
                results.append(r)
                print(json.dumps(r), flush=True)
            except Exception as e:  # pragma: no cover - kernel support varies
                print(f"# w8_pallas:{shape_name} m={m} failed: {e}",
                      file=sys.stderr)
            if shape_name in ("w1/w3", "lm_head"):
                r = bench_matmul_variant(
                    f"bf16:{shape_name}", lambda n=n, k=k: make_bf16(n, k),
                    m, n, k, 2 * n * k)
                results.append(r)
                print(json.dumps(r), flush=True)
            if include_q4 and shape_name in ("w1/w3", "lm_head"):
                try:
                    # packed int32 [K/8, N] + f16 scales [K/32, N]
                    wb_q4 = n * k // 2 + 2 * n * (k // 32)
                    r = bench_matmul_variant(
                        f"q4_packed:{shape_name}",
                        lambda n=n, k=k: make_q4_packed(n, k), m, n, k, wb_q4)
                    results.append(r)
                    print(json.dumps(r), flush=True)
                except Exception as e:  # pragma: no cover
                    print(f"# q4_packed:{shape_name} m={m} failed: {e}",
                          file=sys.stderr)
    return results


def suite_step(batches, seq=160, short=8, long=40):
    """Full single-token decode step (26 layers + lm_head + argmax +
    embed feedback) per-step cost at each batch size.

    Isolates decode from encode/prefill: random prefilled cache, random
    audio embeds; steps chain through (token, cache) exactly like
    transcribe_streaming_fn.
    """
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.decoder import (
        create_cache,
        decoder_forward_hidden_with_cache,
        embed_tokens,
        lm_head,
    )
    from voxtral_tpu.models.layers import rope_tables
    from voxtral_tpu.utils.quantize import random_w8_params

    cfg = VoxtralConfig.voxtral()
    lm_cfg = cfg.language_model
    params = random_w8_params(cfg)["decoder"]
    t_embed = jnp.zeros((1, 1, lm_cfg.dim), jnp.bfloat16)

    results = []
    for b in batches:
        audio = jnp.asarray(
            np.random.RandomState(0).randn(b, seq, lm_cfg.dim) * 0.05,
            jnp.bfloat16,
        )

        cache0 = create_cache(lm_cfg, b, seq, dtype=jnp.bfloat16)
        rope = rope_tables(lm_cfg.head_dim, seq, lm_cfg.rope_theta)

        def run(params, audio, cache_k, cache_v, length, b):
            from voxtral_tpu.models.layers import KVCache

            # Pretend 38 positions already prefilled.
            cache = KVCache(cache_k, cache_v, jnp.asarray(38, jnp.int32))
            tok0 = jnp.full((b,), 32, jnp.int32)

            def step(carry, i):
                prev, cache = carry
                apos = jax.lax.dynamic_slice_in_dim(audio, 38, 1, axis=1)
                text = embed_tokens(params, prev[:, None])
                hidden, cache = decoder_forward_hidden_with_cache(
                    params, apos + text, t_embed, cache, lm_cfg, rope
                )
                logits = lm_head(params, hidden[:, 0, :])
                token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (token, cache), token

            (_, _), toks = jax.lax.scan(
                step, (tok0, cache), jnp.arange(length, dtype=jnp.int32)
            )
            return toks[-1, 0]

        import functools

        @functools.lru_cache(maxsize=None)
        def _jitted(length, b):
            return jax.jit(functools.partial(run, length=length, b=b))

        def runner(length, b=b, audio=audio):
            return _jitted(length, b)(params, audio, cache0.k, cache0.v)

        per_step = _timed_slope(runner, short, long)
        # int8 weight bytes streamed per step (+ scales, + lm_head).
        layer_bytes = sum(n * k + 4 * n for n, k in LAYER_SHAPES)
        step_bytes = 26 * layer_bytes + 131072 * 3072 + 4 * 131072
        r = {
            "bench": "decode_step", "batch": b, "seq": seq,
            "ms_per_step": round(per_step * 1e3, 3),
            "eff_gbps": round(step_bytes / per_step / 1e9, 1),
            "tok_s_equiv": round(b / per_step, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)
    return results


def suite_step_fused(batches, seq=160, short=8, long=40, lm_argmax=False):
    """Same full decode step as ``suite_step`` but through the WHOLE-STACK
    Pallas kernel (``ops/decode_step_pallas.py::decode_stack_step``): the
    26 layers plus the folded final-norm + tied w8 lm_head run as ONE
    pallas_call per token (argmax + embed feedback stay XLA).  The delta
    vs ``decode_step`` is exactly the inter-op DMA-drain overhead the
    stack kernel exists to remove."""
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.decoder import create_cache, embed_tokens
    from voxtral_tpu.models.layers import KVCache
    from voxtral_tpu.ops.decode_step_pallas import (
        decode_stack_step,
        fuse_decode_weights,
        rope_pair_vectors,
    )
    from voxtral_tpu.utils.quantize import random_w8_params

    cfg = VoxtralConfig.voxtral()
    lm_cfg = cfg.language_model
    params = random_w8_params(cfg)["decoder"]
    fused = fuse_decode_weights(params)
    ada_vecs = jnp.ones((lm_cfg.n_layers, lm_cfg.dim), jnp.float32)

    results = []
    for b in batches:
        audio = jnp.asarray(
            np.random.RandomState(0).randn(b, seq, lm_cfg.dim) * 0.05,
            jnp.bfloat16,
        )
        cache0 = create_cache(lm_cfg, b, seq, dtype=jnp.bfloat16)
        # Head-major cache layout for the stack kernel.
        ck0 = jnp.transpose(cache0.k, (0, 1, 3, 2, 4))
        cv0 = jnp.transpose(cache0.v, (0, 1, 3, 2, 4))

        def run(params, fused, ada_vecs, audio, cache_k, cache_v, length, b):
            tok0 = jnp.full((b,), 32, jnp.int32)
            cache = KVCache(cache_k, cache_v, jnp.asarray(38, jnp.int32))

            def step(carry, i):
                prev, cache = carry
                offset = cache.length
                apos = jax.lax.dynamic_slice_in_dim(audio, 38, 1, axis=1)
                text = embed_tokens(params, prev[:, None])
                x = (apos + text)[:, 0, :].astype(jnp.float32)
                cos_p, sin_p = rope_pair_vectors(
                    offset, lm_cfg.head_dim, lm_cfg.rope_theta)

                emb = params["tok_embeddings"]["w8"]
                x, k_new, v_new, out4 = decode_stack_step(
                    x, offset,
                    fused["attn_norm"], fused["ffn_norm"], ada_vecs,
                    fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
                    cos_p, sin_p, cache.k, cache.v,
                    fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
                    final_norm=params["norm"], lm_codes=emb["codes"],
                    lm_scale=emb["scale"], lm_argmax=lm_argmax,
                    n_heads=lm_cfg.n_heads, n_kv=lm_cfg.n_kv_heads,
                    head_dim=lm_cfg.head_dim, eps=lm_cfg.norm_eps,
                )
                zero = jnp.zeros((), jnp.int32)
                start = (zero, zero, zero, offset, zero)
                k_c = jax.lax.dynamic_update_slice(
                    cache.k, k_new[:, :, :, None].astype(cache.k.dtype),
                    start)
                v_c = jax.lax.dynamic_update_slice(
                    cache.v, v_new[:, :, :, None].astype(cache.v.dtype),
                    start)
                cache = KVCache(k_c, v_c, offset + 1)
                token = (out4[:, 0] if lm_argmax
                         else jnp.argmax(out4, axis=-1).astype(jnp.int32))
                return (token, cache), token

            (_, _), toks = jax.lax.scan(
                step, (tok0, cache), jnp.arange(length, dtype=jnp.int32))
            return toks[-1, 0]

        import functools

        @functools.lru_cache(maxsize=None)
        def _jitted(length, b):
            return jax.jit(functools.partial(run, length=length, b=b))

        def runner(length, b=b, audio=audio, ck0=ck0, cv0=cv0):
            return _jitted(length, b)(
                params, fused, ada_vecs, audio, ck0, cv0)

        per_step = _timed_slope(runner, short, long)
        layer_bytes = sum(n * k + 4 * n for n, k in LAYER_SHAPES)
        step_bytes = 26 * layer_bytes + 131072 * 3072 + 4 * 131072
        r = {
            "bench": "decode_step_fused", "batch": b, "seq": seq,
            "lm_argmax": lm_argmax,
            "ms_per_step": round(per_step * 1e3, 3),
            "eff_gbps": round(step_bytes / per_step / 1e9, 1),
            "tok_s_equiv": round(b / per_step, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)
    return results


def suite_step_q4g(batches, seq=160, short=8, long=40, lm_argmax=False):
    """``suite_step_fused`` through the g32 (exact-Q4_0) stack-kernel
    mode: int8 codes = nibble - 8 with the f16 block scales streamed
    alongside (+12.5% bytes vs w8) and 4 lane-masked group dots per
    tile.  The delta vs ``decode_step_fused`` is the price of exact
    Q4_0 weight numerics on the fused path (VERDICT r4 #1b)."""
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.decoder import create_cache, embed_tokens
    from voxtral_tpu.models.layers import KVCache
    from voxtral_tpu.ops.decode_step_pallas import (
        decode_stack_step,
        fuse_decode_weights_q4g,
        rope_pair_vectors,
    )
    from voxtral_tpu.utils.quantize import random_q4_params

    cfg = VoxtralConfig.voxtral()
    lm_cfg = cfg.language_model
    params = random_q4_params(cfg, pack=False)["decoder"]
    fused = fuse_decode_weights_q4g(params)
    ada_vecs = jnp.ones((lm_cfg.n_layers, lm_cfg.dim), jnp.float32)

    results = []
    for b in batches:
        audio = jnp.asarray(
            np.random.RandomState(0).randn(b, seq, lm_cfg.dim) * 0.05,
            jnp.bfloat16,
        )
        cache0 = create_cache(lm_cfg, b, seq, dtype=jnp.bfloat16)
        ck0 = jnp.transpose(cache0.k, (0, 1, 3, 2, 4))
        cv0 = jnp.transpose(cache0.v, (0, 1, 3, 2, 4))

        def run(params, fused, ada_vecs, audio, cache_k, cache_v, length, b):
            tok0 = jnp.full((b,), 32, jnp.int32)
            cache = KVCache(cache_k, cache_v, jnp.asarray(38, jnp.int32))

            def step(carry, i):
                prev, cache = carry
                offset = cache.length
                apos = jax.lax.dynamic_slice_in_dim(audio, 38, 1, axis=1)
                text = embed_tokens(params, prev[:, None])
                x = (apos + text)[:, 0, :].astype(jnp.float32)
                cos_p, sin_p = rope_pair_vectors(
                    offset, lm_cfg.head_dim, lm_cfg.rope_theta)

                x, k_new, v_new, out4 = decode_stack_step(
                    x, offset,
                    fused["attn_norm"], fused["ffn_norm"], ada_vecs,
                    fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
                    cos_p, sin_p, cache.k, cache.v,
                    fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
                    final_norm=params["norm"],
                    lm_codes=fused["lm_codes"],
                    lm_scale=fused["lm_scale"], lm_argmax=lm_argmax,
                    n_heads=lm_cfg.n_heads, n_kv=lm_cfg.n_kv_heads,
                    head_dim=lm_cfg.head_dim, eps=lm_cfg.norm_eps,
                )
                zero = jnp.zeros((), jnp.int32)
                start = (zero, zero, zero, offset, zero)
                k_c = jax.lax.dynamic_update_slice(
                    cache.k, k_new[:, :, :, None].astype(cache.k.dtype),
                    start)
                v_c = jax.lax.dynamic_update_slice(
                    cache.v, v_new[:, :, :, None].astype(cache.v.dtype),
                    start)
                cache = KVCache(k_c, v_c, offset + 1)
                token = (out4[:, 0] if lm_argmax
                         else jnp.argmax(out4, axis=-1).astype(jnp.int32))
                return (token, cache), token

            (_, _), toks = jax.lax.scan(
                step, (tok0, cache), jnp.arange(length, dtype=jnp.int32))
            return toks[-1, 0]

        import functools

        @functools.lru_cache(maxsize=None)
        def _jitted(length, b):
            return jax.jit(functools.partial(run, length=length, b=b))

        def runner(length, b=b, audio=audio, ck0=ck0, cv0=cv0):
            return _jitted(length, b)(
                params, fused, ada_vecs, audio, ck0, cv0)

        per_step = _timed_slope(runner, short, long)
        # codes 1 B/weight + f32 group scales per 32 weights = x1.125
        layer_bytes = sum(int(n * k * 1.125) for n, k in LAYER_SHAPES)
        step_bytes = 26 * layer_bytes + int(131072 * 3072 * 1.125)
        r = {
            "bench": "decode_step_q4g", "batch": b, "seq": seq,
            "lm_argmax": lm_argmax,
            "ms_per_step": round(per_step * 1e3, 3),
            "eff_gbps": round(step_bytes / per_step / 1e9, 1),
            "tok_s_equiv": round(b / per_step, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)
    return results


def suite_step_bf16(batches, seq=160, short=None, long=None):
    """Full decode step through the stack kernel with DENSE bf16 weights
    (the W8A8 accuracy hedge — ops/decode_step_pallas.py bf16 mode):
    same schedule, bf16 weight tiles (256 rows vs 512 at the same byte
    budget), bf16 x bf16 MXU dots, folded dense lm_head (the bf16
    embedding table streams directly, no scales).  Expected ~2x the w8
    step's bytes: 26 bf16 layers (~5.9 GB) + the 805 MB lm table
    ~= 6.7 GB/step -> ~9 ms at the w8 path's 750 GB/s.  Slope windows
    auto-size to ~60 GB of traffic (bench-timing contract)."""
    import functools

    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.decoder import (
        create_cache,
        embed_tokens,
        init_decoder_params,
    )
    from voxtral_tpu.models.layers import KVCache
    from voxtral_tpu.ops.decode_step_pallas import (
        decode_stack_step,
        fuse_decode_weights_bf16,
        rope_pair_vectors,
    )

    cfg = VoxtralConfig.voxtral()
    lm_cfg = cfg.language_model
    params = init_decoder_params(jax.random.PRNGKey(0), lm_cfg,
                                 dtype=jnp.bfloat16)
    fused = fuse_decode_weights_bf16(params)  # in-place nt rewrite
    ada_vecs = jnp.ones((lm_cfg.n_layers, lm_cfg.dim), jnp.float32)

    nq = lm_cfg.n_heads * lm_cfg.head_dim
    nkv = lm_cfg.n_kv_heads * lm_cfg.head_dim
    layer_bytes = 2 * (lm_cfg.dim * (nq + 2 * nkv) + nq * lm_cfg.dim
                       + 3 * lm_cfg.dim * lm_cfg.hidden_dim)
    step_bytes = lm_cfg.n_layers * layer_bytes \
        + 2 * lm_cfg.vocab_size * lm_cfg.dim

    results = []
    for b in batches:
        audio = jnp.asarray(
            np.random.RandomState(0).randn(b, seq, lm_cfg.dim) * 0.05,
            jnp.bfloat16,
        )
        cache0 = create_cache(lm_cfg, b, seq, dtype=jnp.bfloat16)
        ck0 = jnp.transpose(cache0.k, (0, 1, 3, 2, 4))
        cv0 = jnp.transpose(cache0.v, (0, 1, 3, 2, 4))

        def run(params, fused, ada_vecs, audio, cache_k, cache_v, length, b):
            tok0 = jnp.full((b,), 32, jnp.int32)
            cache = KVCache(cache_k, cache_v, jnp.asarray(38, jnp.int32))

            def step(carry, i):
                prev, cache = carry
                offset = cache.length
                apos = jax.lax.dynamic_slice_in_dim(audio, 38, 1, axis=1)
                text = embed_tokens(params, prev[:, None])
                x = (apos + text)[:, 0, :].astype(jnp.float32)
                cos_p, sin_p = rope_pair_vectors(
                    offset, lm_cfg.head_dim, lm_cfg.rope_theta)

                x, k_new, v_new, logits = decode_stack_step(
                    x, offset,
                    fused["attn_norm"], fused["ffn_norm"], ada_vecs,
                    None, None, None, None,
                    cos_p, sin_p, cache.k, cache.v,
                    fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
                    final_norm=params["norm"],
                    lm_codes=params["tok_embeddings"], lm_scale=None,
                    n_heads=lm_cfg.n_heads, n_kv=lm_cfg.n_kv_heads,
                    head_dim=lm_cfg.head_dim, eps=lm_cfg.norm_eps,
                )
                zero = jnp.zeros((), jnp.int32)
                start = (zero, zero, zero, offset, zero)
                k_c = jax.lax.dynamic_update_slice(
                    cache.k, k_new[:, :, :, None].astype(cache.k.dtype),
                    start)
                v_c = jax.lax.dynamic_update_slice(
                    cache.v, v_new[:, :, :, None].astype(cache.v.dtype),
                    start)
                cache = KVCache(k_c, v_c, offset + 1)
                token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (token, cache), token

            (_, _), toks = jax.lax.scan(
                step, (tok0, cache), jnp.arange(length, dtype=jnp.int32))
            return toks[-1, 0]

        @functools.lru_cache(maxsize=None)
        def _jitted(length, b):
            return jax.jit(functools.partial(run, length=length, b=b))

        def runner(length, b=b, audio=audio, ck0=ck0, cv0=cv0):
            return _jitted(length, b)(
                params, fused, ada_vecs, audio, ck0, cv0)

        if short is None or long is None:
            diff = max(6, int(6e10 / step_bytes))
            lo, hi = max(3, diff // 4), max(3, diff // 4) + diff
        else:
            lo, hi = short, long
        per_step = _timed_slope(runner, lo, hi)
        r = {
            "bench": "decode_step_bf16", "batch": b, "seq": seq,
            "ms_per_step": round(per_step * 1e3, 3),
            "eff_gbps": round(step_bytes / per_step / 1e9, 1),
            "tok_s_equiv": round(b / per_step, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)
    return results


def suite_step_spec(ks=(2, 4, 8), streams=1, seq=1024, short=None,
                    long=None, int8=False, weights="w8"):
    """Speculative K-token decode step (``decode_stack_step(spec=K)``)
    at forced full acceptance: every chained step verifies K drafts in
    ONE weight pass and advances the cache by K — the K-x throughput
    CEILING during silence (the dominant streaming regime; real
    acceptance needs real weights).  The chain feeds each step's argmax
    tokens back as the next step's drafts, so XLA cannot fold steps.
    Weight bytes per step are identical to spec=1 (the stream dominates)
    -> expect ms/step ~flat in K and tok_s_equiv ~K-x.

    ``int8=True`` runs the int8-KV-cache variant (per-vector scales,
    quantize-at-append, fresh-row roundtrip in-kernel) — the pooled
    speculative serving point (streams=8, seq=804, K<=4 is the v5e
    VMEM ceiling: B*K query rows + the int8 cache blocks; pool16xK=4
    measured 139 MB of 128 MB and the stack_vmem_need gate refuses
    it).  ``weights="q4g"`` runs the exact-Q4_0 group-32 mode instead
    of w8 (the accuracy-exact speculative ceiling)."""
    import functools

    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.decoder import create_cache, embed_tokens
    from voxtral_tpu.models.layers import KVCache
    from voxtral_tpu.ops.decode_step_pallas import (
        decode_stack_step,
        quantize_kv,
        rope_pair_vectors,
    )
    from voxtral_tpu.ops.decode_step_pallas import fuse_decode_weights

    cfg = VoxtralConfig.voxtral()
    lm_cfg = cfg.language_model
    if weights == "q4g":
        from voxtral_tpu.ops.decode_step_pallas import (
            fuse_decode_weights_q4g,
        )
        from voxtral_tpu.utils.quantize import random_q4_params

        params = random_q4_params(cfg, pack=False)["decoder"]
        fused = fuse_decode_weights_q4g(params)
        lm_fold = dict(lm_codes=fused["lm_codes"],
                       lm_scale=fused["lm_scale"])
        witem = 1.125
    else:
        from voxtral_tpu.utils.quantize import random_w8_params

        params = random_w8_params(cfg)["decoder"]
        fused = fuse_decode_weights(params)
        lm_fold = None
        witem = 1.0
    ada_vecs = jnp.ones((lm_cfg.n_layers, lm_cfg.dim), jnp.float32)

    layer_bytes = sum(int(n * k * witem) + 4 * n for n, k in LAYER_SHAPES)
    step_bytes = 26 * layer_bytes + int(131072 * 3072 * witem) + 4 * 131072
    if int8:
        step_bytes += (2 * 26 * streams * lm_cfg.n_kv_heads * seq
                       * (lm_cfg.head_dim + 4))

    results = []
    for K in ks:
        b = streams
        rows = b * K
        audio = jnp.asarray(
            np.random.RandomState(0).randn(b, seq, lm_cfg.dim) * 0.05,
            jnp.bfloat16,
        )
        cache0 = create_cache(lm_cfg, b, seq, dtype=jnp.bfloat16)
        ck0 = jnp.transpose(cache0.k, (0, 1, 3, 2, 4))
        cv0 = jnp.transpose(cache0.v, (0, 1, 3, 2, 4))
        if int8:
            ck0, ks0 = quantize_kv(ck0)
            cv0, vs0 = quantize_kv(cv0)
        else:
            ks0 = vs0 = None

        def run(params, fused, ada_vecs, audio, cache_k, cache_v,
                k_sc, v_sc, length, b=b, K=K, rows=rows):
            tok0 = jnp.full((rows,), 32, jnp.int32)
            cache = KVCache(cache_k, cache_v, jnp.asarray(38, jnp.int32))

            def step(carry, i):
                drafts, cache, k_sc, v_sc = carry
                offset = cache.length  # per-stream scalar
                # Row (b, j) input: audio slice + embed(draft row).
                apos = jax.lax.dynamic_slice_in_dim(audio, 38, K, axis=1)
                text = embed_tokens(params, drafts.reshape(b, K))
                x = (apos + text).reshape(rows, lm_cfg.dim).astype(
                    jnp.float32)
                # Per-row RoPE at offs + j.
                cs = [rope_pair_vectors(offset + j, lm_cfg.head_dim,
                                        lm_cfg.rope_theta)
                      for j in range(K)]
                cos_r = jnp.tile(jnp.stack([c for c, _ in cs]), (b, 1))
                sin_r = jnp.tile(jnp.stack([sv for _, sv in cs]), (b, 1))

                # lm table from the ARG params dict — a closure constant
                # would be serialized into the program (tunnel 413).
                if lm_fold is not None:
                    lm_kw = dict(lm_fold)
                else:
                    emb = params["tok_embeddings"]["w8"]
                    lm_kw = dict(lm_codes=emb["codes"],
                                 lm_scale=emb["scale"])
                scale_kw = (dict(k_scales=k_sc, v_scales=v_sc)
                            if int8 else {})
                x, k_new, v_new, tok = decode_stack_step(
                    x, jnp.full((b,), offset, jnp.int32),
                    fused["attn_norm"], fused["ffn_norm"], ada_vecs,
                    fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
                    cos_r, sin_r, cache.k, cache.v,
                    fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
                    final_norm=params["norm"], **lm_kw,
                    lm_argmax=True, spec=K,
                    n_heads=lm_cfg.n_heads, n_kv=lm_cfg.n_kv_heads,
                    head_dim=lm_cfg.head_dim, eps=lm_cfg.norm_eps,
                    **scale_kw,
                )
                # Append all K fresh rows at offs..offs+K-1 (head-major:
                # [L, rows, Hkv, hd] -> [L, b, Hkv, K, hd] slice update).
                kn = jnp.transpose(
                    k_new.reshape(-1, b, K, lm_cfg.n_kv_heads,
                                  lm_cfg.head_dim), (0, 1, 3, 2, 4))
                vn = jnp.transpose(
                    v_new.reshape(-1, b, K, lm_cfg.n_kv_heads,
                                  lm_cfg.head_dim), (0, 1, 3, 2, 4))
                zero = jnp.zeros((), jnp.int32)
                start = (zero, zero, zero, offset, zero)
                if int8:
                    kn, kns = quantize_kv(kn)
                    vn, vns = quantize_kv(vn)
                    k_sc = jax.lax.dynamic_update_slice(
                        k_sc, kns, (zero, zero, zero, offset))
                    v_sc = jax.lax.dynamic_update_slice(
                        v_sc, vns, (zero, zero, zero, offset))
                k_c = jax.lax.dynamic_update_slice(
                    cache.k, kn.astype(cache.k.dtype), start)
                v_c = jax.lax.dynamic_update_slice(
                    cache.v, vn.astype(cache.v.dtype), start)
                # Forced acceptance: advance by K, next drafts = tokens.
                cache = KVCache(k_c, v_c, offset + K)
                return (tok[:, 0], cache, k_sc, v_sc), tok[:, 0]

            zs = jnp.zeros((0,), jnp.float32)
            (_, _, _, _), toks = jax.lax.scan(
                step, (tok0, cache,
                       k_sc if int8 else zs, v_sc if int8 else zs),
                jnp.arange(length, dtype=jnp.int32))
            return toks[-1, 0]

        @functools.lru_cache(maxsize=None)
        def _jitted(length, K=K):
            return jax.jit(functools.partial(run, length=length))

        def runner(length):
            return _jitted(length)(
                params, fused, ada_vecs, audio, ck0, cv0, ks0, vs0)

        if short is None or long is None:
            diff = max(8, int(6e10 / step_bytes))
            lo, hi = max(4, diff // 4), max(4, diff // 4) + diff
        else:
            lo, hi = short, long
        # The cache must hold prefix + hi*K appended positions.
        hi = min(hi, (seq - 40) // K)
        lo = min(lo, max(2, hi // 4))
        per_step = _timed_slope(runner, lo, hi)
        r = {
            "bench": (("decode_step_spec_q4g" if weights == "q4g" else
                       "decode_step_spec_int8") if int8 or weights == "q4g"
                      else "decode_step_spec"),
            "k": K, "streams": b, "seq": seq,
            "ms_per_step": round(per_step * 1e3, 3),
            "eff_gbps": round(step_bytes / per_step / 1e9, 1),
            "tok_s_ceiling": round(b * K / per_step, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)
    return results


def suite_step_int8kv(batches, seq=160, short=8, long=40):
    """Whole-stack decode step with the int8 KV cache (per-vector scales,
    both attention contractions on the int8 MXU, quantize-at-append).
    Same protocol as ``suite_step_fused`` so the delta is exactly the
    int8-cache cost/benefit; also proves large-pool geometries (e.g.
    B=16 bounded) that the bf16 cache cannot fit in VMEM."""
    import functools

    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.decoder import create_cache, embed_tokens
    from voxtral_tpu.models.layers import KVCache
    from voxtral_tpu.ops.decode_step_pallas import (
        decode_stack_step,
        fuse_decode_weights,
        quantize_kv,
        rope_pair_vectors,
    )
    from voxtral_tpu.utils.quantize import random_w8_params

    cfg = VoxtralConfig.voxtral()
    lm_cfg = cfg.language_model
    params = random_w8_params(cfg)["decoder"]
    fused = fuse_decode_weights(params)
    ada_vecs = jnp.ones((lm_cfg.n_layers, lm_cfg.dim), jnp.float32)

    results = []
    for b in batches:
        audio = jnp.asarray(
            np.random.RandomState(0).randn(b, seq, lm_cfg.dim) * 0.05,
            jnp.bfloat16,
        )
        cache0 = create_cache(lm_cfg, b, seq, dtype=jnp.bfloat16)
        ck0, ks0 = quantize_kv(jnp.transpose(cache0.k, (0, 1, 3, 2, 4)))
        cv0, vs0 = quantize_kv(jnp.transpose(cache0.v, (0, 1, 3, 2, 4)))

        def run(params, fused, ada_vecs, audio, ck, cv, ks, vs, length, b):
            tok0 = jnp.full((b,), 32, jnp.int32)

            def step(carry, i):
                prev, ck, cv, ks, vs, offset = carry
                apos = jax.lax.dynamic_slice_in_dim(audio, 38, 1, axis=1)
                text = embed_tokens(params, prev[:, None])
                x = (apos + text)[:, 0, :].astype(jnp.float32)
                cos_p, sin_p = rope_pair_vectors(
                    offset, lm_cfg.head_dim, lm_cfg.rope_theta)

                emb = params["tok_embeddings"]["w8"]
                x, k_new, v_new, logits = decode_stack_step(
                    x, offset,
                    fused["attn_norm"], fused["ffn_norm"], ada_vecs,
                    fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
                    cos_p, sin_p, ck, cv,
                    fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
                    final_norm=params["norm"], lm_codes=emb["codes"],
                    lm_scale=emb["scale"], k_scales=ks, v_scales=vs,
                    n_heads=lm_cfg.n_heads, n_kv=lm_cfg.n_kv_heads,
                    head_dim=lm_cfg.head_dim, eps=lm_cfg.norm_eps,
                )
                kq, ksc = quantize_kv(k_new)
                vq, vsc = quantize_kv(v_new)
                zero = jnp.zeros((), jnp.int32)
                start = (zero, zero, zero, offset, zero)
                ck = jax.lax.dynamic_update_slice(
                    ck, kq[:, :, :, None], start)
                cv = jax.lax.dynamic_update_slice(
                    cv, vq[:, :, :, None], start)
                start3 = (zero, zero, zero, offset)
                ks = jax.lax.dynamic_update_slice(
                    ks, ksc[:, :, :, None], start3)
                vs = jax.lax.dynamic_update_slice(
                    vs, vsc[:, :, :, None], start3)
                token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (token, ck, cv, ks, vs, offset + 1), token

            carry0 = (tok0, ck, cv, ks, vs, jnp.asarray(38, jnp.int32))
            _, toks = jax.lax.scan(
                step, carry0, jnp.arange(length, dtype=jnp.int32))
            return toks[-1, 0]

        @functools.lru_cache(maxsize=None)
        def _jitted(length, b):
            return jax.jit(functools.partial(run, length=length, b=b))

        def runner(length, b=b):
            return _jitted(length, b)(
                params, fused, ada_vecs, audio, ck0, cv0, ks0, vs0)

        per_step = _timed_slope(runner, short, long)
        layer_bytes = sum(n * k + 4 * n for n, k in LAYER_SHAPES)
        step_bytes = 26 * layer_bytes + 131072 * 3072 + 4 * 131072
        r = {
            "bench": "decode_step_int8kv", "batch": b, "seq": seq,
            "ms_per_step": round(per_step * 1e3, 3),
            "eff_gbps": round(step_bytes / per_step / 1e9, 1),
            "tok_s_equiv": round(b / per_step, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)
    return results


def suite_step_chunked(batches, seq=8704, fills=(512, 4096, 8192),
                       chunk=512, short=8, long=40):
    """Whole-stack decode step with the HBM-chunked int8 KV cache
    (``cache_chunk=``): the cache never enters the kernel's VMEM budget
    and the chunk loop has DYNAMIC bounds, so the per-step cost grows
    with the FILL level (max row offset), not the allocated cache size.
    This is the unbounded-StreamPool operating point — ``seq`` defaults
    to the padded 8192-position ring window.  Protocol of
    ``suite_step_int8kv``; the fill sweep shows cost ∝ fill."""
    import functools

    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.decoder import embed_tokens
    from voxtral_tpu.ops.decode_step_pallas import (
        decode_stack_step,
        fuse_decode_weights,
        quantize_kv,
        rope_pair_vectors,
    )
    from voxtral_tpu.utils.quantize import random_w8_params

    cfg = VoxtralConfig.voxtral()
    lm_cfg = cfg.language_model
    params = random_w8_params(cfg)["decoder"]
    fused = fuse_decode_weights(params)
    # The kernel reads only the FUSED copies; drop the raw layer stacks
    # so the 8k-position caches fit in HBM next to the weights.
    params = {k: v for k, v in params.items() if k != "layers"}
    ada_vecs = jnp.ones((lm_cfg.n_layers, lm_cfg.dim), jnp.float32)

    results = []
    for b in batches:
        for fill in fills:
            fill = min(fill, seq - long - 2)
            audio = jnp.asarray(
                np.random.RandomState(0).randn(b, 160, lm_cfg.dim) * 0.05,
                jnp.bfloat16,
            )
            # int8 cache built directly (content is masked garbage —
            # a bf16 cache + quantize pass would double the HBM peak).
            shape = (lm_cfg.n_layers, b, lm_cfg.n_kv_heads, seq,
                     lm_cfg.head_dim)
            ck0 = jnp.zeros(shape, jnp.int8)
            cv0 = jnp.zeros(shape, jnp.int8)
            ks0 = jnp.ones(shape[:-1], jnp.float32)
            vs0 = jnp.ones(shape[:-1], jnp.float32)

            def run(params, fused, ada_vecs, audio, ck, cv, ks, vs,
                    length, b, fill):
                tok0 = jnp.full((b,), 32, jnp.int32)

                def step(carry, i):
                    prev, ck, cv, ks, vs, offset = carry
                    apos = jax.lax.dynamic_slice_in_dim(audio, 38, 1, axis=1)
                    text = embed_tokens(params, prev[:, None])
                    x = (apos + text)[:, 0, :].astype(jnp.float32)
                    cos_p, sin_p = rope_pair_vectors(
                        offset, lm_cfg.head_dim, lm_cfg.rope_theta)

                    emb = params["tok_embeddings"]["w8"]
                    x, k_new, v_new, logits = decode_stack_step(
                        x, offset,
                        fused["attn_norm"], fused["ffn_norm"], ada_vecs,
                        fused["sqkv"], fused["so"], fused["s13"],
                        fused["s2"], cos_p, sin_p, ck, cv,
                        fused["wqkv"], fused["wo"], fused["w13"],
                        fused["w2"],
                        final_norm=params["norm"], lm_codes=emb["codes"],
                        lm_scale=emb["scale"], k_scales=ks, v_scales=vs,
                        n_heads=lm_cfg.n_heads, n_kv=lm_cfg.n_kv_heads,
                        head_dim=lm_cfg.head_dim, eps=lm_cfg.norm_eps,
                        window=lm_cfg.sliding_window, cache_chunk=chunk,
                    )
                    kq, ksc = quantize_kv(k_new)
                    vq, vsc = quantize_kv(v_new)
                    zero = jnp.zeros((), jnp.int32)
                    start = (zero, zero, zero, offset, zero)
                    ck = jax.lax.dynamic_update_slice(
                        ck, kq[:, :, :, None], start)
                    cv = jax.lax.dynamic_update_slice(
                        cv, vq[:, :, :, None], start)
                    start3 = (zero, zero, zero, offset)
                    ks = jax.lax.dynamic_update_slice(
                        ks, ksc[:, :, :, None], start3)
                    vs = jax.lax.dynamic_update_slice(
                        vs, vsc[:, :, :, None], start3)
                    token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return (token, ck, cv, ks, vs, offset + 1), token

                carry0 = (tok0, ck, cv, ks, vs,
                          jnp.asarray(fill, jnp.int32))
                _, toks = jax.lax.scan(
                    step, carry0, jnp.arange(length, dtype=jnp.int32))
                return toks[-1, 0]

            @functools.lru_cache(maxsize=None)
            def _jitted(length, b=b, fill=fill):
                return jax.jit(functools.partial(
                    run, length=length, b=b, fill=fill))

            def runner(length, b=b, fill=fill):
                return _jitted(length)(
                    params, fused, ada_vecs, audio, ck0, cv0, ks0, vs0)

            per_step = _timed_slope(runner, short, long)
            layer_bytes = sum(n * k + 4 * n for n, k in LAYER_SHAPES)
            n_read = -(-min(fill + 1, seq) // chunk) * chunk
            cache_bytes = 26 * 2 * b * lm_cfg.n_kv_heads * n_read * (
                lm_cfg.head_dim + 4)
            step_bytes = (26 * layer_bytes + 131072 * 3072 + 4 * 131072
                          + cache_bytes)
            r = {
                "bench": "decode_step_chunked", "batch": b, "seq": seq,
                "fill": fill, "chunk": chunk,
                "ms_per_step": round(per_step * 1e3, 3),
                "eff_gbps": round(step_bytes / per_step / 1e9, 1),
                "tok_s_equiv": round(b / per_step, 1),
            }
            results.append(r)
            print(json.dumps(r), flush=True)
    return results


def suite_encode(mel_frames=(2344,), short=4, long=12):
    """Full audio-encode stage (conv + 32 layers + reshape + adapter) via
    the chained-slope method — the e2e bench's per-stage sync over the
    tunneled transport inflates stage wall-times, so this is the honest
    on-device encode cost."""
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.voxtral import encode_audio_fn
    from voxtral_tpu.utils.quantize import random_w8_params

    cfg = VoxtralConfig.voxtral()
    params = random_w8_params(cfg)
    results = []
    for t in mel_frames:
        mel0 = jnp.asarray(
            np.random.RandomState(0).randn(1, 128, t) * 0.3, jnp.bfloat16)

        def run(params, mel0, length):
            def body(mel, _):
                out = encode_audio_fn(params, mel, cfg)  # [1, S, D]
                # fold [1, S, D] back onto [1, 128, T] (data dependency)
                flat = out.reshape(-1)
                n = 128 * t
                reps = -(-n // flat.shape[0])
                mel2 = mel0 + 5e-2 * jnp.tile(flat, reps)[:n].reshape(
                    1, 128, t).astype(mel0.dtype)
                return mel2, ()
            mel, _ = jax.lax.scan(body, mel0, None, length=length)
            return mel[0, 0, 0]

        import functools

        @functools.lru_cache(maxsize=None)
        def _jitted(length):
            return jax.jit(functools.partial(run, length=length))

        def runner(length):
            return _jitted(length)(params, mel0)

        per_iter = _timed_slope(runner, short, long)
        r = {"bench": "encode", "mel_frames": t,
             "ms": round(per_iter * 1e3, 2)}
        results.append(r)
        print(json.dumps(r), flush=True)
    return results


def suite_tp_lm(tps=(2, 4, 8), batches=(1, 8), short=20, long=220):
    """Per-shard cost of the tensor-parallel greedy lm_head fold
    (ops/decode_tp_pallas.lm_half_argmax) at production vocab-shard
    shapes — the single-chip-measurable half of tp_lm_head_token (the
    pmax/pmin resolution needs real multi-chip ICI).  Streams the
    [131072/tp, 3072] int8 shard through the grid pipeline with the
    in-kernel (max, argmax) fold."""
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.ops.decode_tp_pallas import lm_half_argmax

    D, V = 3072, 131072
    results = []
    rng = np.random.RandomState(0)
    for tp in tps:
        V_l = V // tp
        codes = jnp.asarray(rng.randint(-127, 128, (V_l, D)), jnp.int8)
        scale = jnp.asarray(rng.rand(V_l) * 1e-3, jnp.float32)
        fnorm = jnp.asarray(1.0 + rng.randn(D) * 0.1, jnp.float32)
        for b in batches:
            x0 = jnp.asarray(rng.randn(b, D) * 0.5, jnp.float32)

            interp = jax.default_backend() != "tpu"

            # Weights must be jit ARGUMENTS, not closure constants
            # (constants measure ~10x lower bandwidth — CLAUDE.md).
            def run_body(x0, codes, scale, fnorm, length):
                def body(x, _):
                    bv, bi = lm_half_argmax(x, fnorm, scale, codes,
                                            interpret=interp)
                    x2 = x0 + 1e-1 * (bv + bi.astype(jnp.float32)
                                      ) * jnp.ones((b, D))
                    return x2, ()
                x, _ = jax.lax.scan(body, x0, None, length=length)
                return x[0, 0]

            import functools

            @functools.lru_cache(maxsize=None)
            def _jitted(length):
                return jax.jit(functools.partial(run_body, length=length))

            def runner(length):
                return _jitted(length)(x0, codes, scale, fnorm)

            per = _timed_slope(runner, short, long)
            r = {"bench": "tp_lm_half", "tp": tp, "batch": b,
                 "v_local": V_l,
                 "ms_per_step": round(per * 1e3, 3),
                 "eff_gbps": round(V_l * D / per / 1e9, 1)}
            results.append(r)
            print(json.dumps(r), flush=True)
    return results


def suite_tp_halves(tps=(2, 4), batches=(1, 4), seq=160,
                    variants=("bf16", "int8", "int8-chunk",
                              "spec4", "int8-spec4",
                              "q4g", "q4g-spec4"),
                    short=None, long=None, chunk=512):
    """Per-shard cost of ONE decoder layer under tensor parallelism —
    attn_half_step + ffn_half_step chained at production tp-local
    shapes, for each cache variant (bf16/int8 resident, int8
    HBM-chunked).  This is the single-chip-measurable half of
    tp_decode_step (the two psums need real multi-chip ICI); it is ALSO
    the Mosaic compile+run validation for the TP cache modes (interpret
    mode does not catch layout faults — CLAUDE.md).  The chunked
    variant runs at ring-scale fill (S ~ 8.7k) since that is its
    production geometry.

    short/long (scan lengths) default to auto-sizing per shape: the
    measured delta targets ~25 GB of layer traffic (~35 ms at HBM
    speed) so tunnel jitter cannot swamp the slope (_timed_slope
    contract) — at tp=4 a HALF-kernel shard (one attn or ffn half) is
    <15 MB (~29 MB for the full layer shard, ~58 MB at tp=2) so fixed
    small windows produce garbage.

    TP step projection (explicit, so the ICI assumption is auditable):

        t_step = 26 * ms_per_layer + t_lm_fold + N_psum * t_psum
        N_psum = 26 layers * 2 (post-attn-half, post-ffn-half)
                 + 2 (lm fold pmax/pmin pair)  ~= 54
        t_psum = ASSUMED 5-25 us on v5e ICI for a [B,3072] bf16
                 activation (~6 KB/row): latency-bound small-message
                 allreduce, NOT measured — this box has one chip.

    At t_psum=10 us: tp=2 ~= 2.6 + 0.54 ~= 3.2 ms; tp=4 ~= 1.5 + 0.8
    (larger ring) ~= 2.3 ms.  At 25 us, tp=2 ~= 4.0 ms — barely under
    the 4.48 ms single-chip step, so TP only clearly pays if psums are
    cheap/fusable.  tp=4 per-shard bandwidth already sags (553-641
    GB/s vs 643-713 at tp=2); treat its projection as an upper bound
    of benefit until real multi-chip hardware.

    "spec4"/"int8-spec4" variants run the speculative K=4 verification
    path (batch counts STREAMS; the halves see streams*4 query rows
    against per-stream caches) — the layer should cost the same as
    sequential (weight-stream-bound), making TP spec the latency x
    throughput composition; these are also the Mosaic validation for
    the spec halves.

    "q4g"/"q4g-spec4" stream the g32 (exact-Q4_0) weight layout —
    [L, SB, N_l, 128] codes + [L, 4*SB, 1, N_l] group-scale stacks
    DMA'd alongside (+12.5%% bytes) — the Mosaic validation for the TP
    g32 halves (tests/test_tp_q4g.py pins their numerics in interpret
    mode; only a real-TPU compile catches layout faults)."""
    import functools

    import jax
    import jax.numpy as jnp

    from voxtral_tpu.ops.decode_step_pallas import (
        quantize_kv,
        rope_pair_vectors,
    )
    from voxtral_tpu.ops.decode_tp_pallas import (
        attn_half_step,
        ffn_half_step,
    )

    D, H, HKV, HD, F = 3072, 32, 8, 128, 9216
    L = 2  # stacked layers: alternate indices to exercise the DMA slicing
    results = []
    rng = np.random.RandomState(0)
    for tp in tps:
        h_l, hkv_l, f_l = H // tp, HKV // tp, F // tp
        nq_l = h_l * HD
        nqkv_l = nq_l + 2 * hkv_l * HD
        w = {
            "wqkv": jnp.asarray(rng.randint(-127, 128, (L, nqkv_l, D)),
                                jnp.int8),
            "sqkv": jnp.asarray(rng.rand(nqkv_l) * 1e-3, jnp.float32),
            "wo": jnp.asarray(rng.randint(-127, 128, (L, D, nq_l)),
                              jnp.int8),
            "so": jnp.asarray(rng.rand(D) * 1e-3, jnp.float32),
            "w13": jnp.asarray(rng.randint(-127, 128, (L, 2 * f_l, D)),
                               jnp.int8),
            "s13": jnp.asarray(rng.rand(2 * f_l) * 1e-3, jnp.float32),
            "w2": jnp.asarray(rng.randint(-127, 128, (L, D, f_l)),
                              jnp.int8),
            "s2": jnp.asarray(rng.rand(D) * 1e-3, jnp.float32),
            "norm": jnp.asarray(1 + rng.randn(D) * 0.05, jnp.float32),
            "ada": jnp.asarray(1 + rng.randn(D) * 0.05, jnp.float32),
        }

        def _g32(n, k):
            # g32 layout at local shapes: codes [L, K/128, N, 128] +
            # r-major group scales [L, 4*(K/128), 1, N] f32.
            sb = k // 128
            return (
                jnp.asarray(rng.randint(-8, 8, (L, sb, n, 128)), jnp.int8),
                jnp.asarray(rng.rand(L, 4 * sb, 1, n) * 1e-3, jnp.float32),
            )

        wq_c, wq_s = _g32(nqkv_l, D)
        wo_c, wo_s = _g32(D, nq_l)
        w13_c, w13_s = _g32(2 * f_l, D)
        w2_c, w2_s = _g32(D, f_l)
        w_g32 = {**w, "wqkv": wq_c, "sqkv": wq_s, "wo": wo_c, "so": wo_s,
                 "w13": w13_c, "s13": w13_s, "w2": w2_c, "s2": w2_s}
        interp = jax.default_backend() != "tpu"
        for variant in variants:
            chunked = variant.endswith("chunk")
            int8 = variant.startswith("int8")
            wg = variant.startswith("q4g")
            spec = 4 if "spec" in variant else 1
            S = -(-8448 // chunk) * chunk if chunked else seq
            for b in batches:
                kv = rng.randn(L, b, hkv_l, S, HD).astype(np.float32) * 0.3
                kc_f = jnp.asarray(kv, jnp.bfloat16)
                vc_f = jnp.asarray(kv[..., ::-1], jnp.bfloat16)
                if int8:
                    kc, ks = quantize_kv(kc_f)
                    vc, vs = quantize_kv(vc_f)
                else:
                    kc, vc = kc_f, vc_f
                    ks = vs = jnp.zeros((L, b, hkv_l, S), jnp.float32)
                rows = b * spec
                x0 = jnp.asarray(rng.randn(rows, D) * 0.5, jnp.float32)
                offs = jnp.full((b,), S - 8, jnp.int32)
                if spec > 1:
                    cs = [rope_pair_vectors(jnp.asarray(S - 8 + j), HD,
                                            1e6) for j in range(spec)]
                    cos_p = jnp.tile(jnp.stack([c for c, _ in cs]),
                                     (b, 1))
                    sin_p = jnp.tile(jnp.stack([s for _, s in cs]),
                                     (b, 1))
                else:
                    cos_p, sin_p = rope_pair_vectors(
                        jnp.asarray(S - 8), HD, 1e6)
                kw = dict(n_heads_l=h_l, n_kv_l=hkv_l, head_dim=HD,
                          eps=1e-5, interpret=interp, window=8192,
                          cache_chunk=chunk if chunked else None,
                          spec=spec)

                def run(x0, w, kc, vc, ks, vs, length, rows=rows, kw=kw):
                    def body(x, i):
                        li = jax.lax.rem(i, L)
                        k_l = kc if kw["cache_chunk"] else kc[li]
                        v_l = vc if kw["cache_chunk"] else vc[li]
                        sc = (dict(k_scales_l=ks[li], v_scales_l=vs[li])
                              if int8 else {})
                        y, kn, vn = attn_half_step(
                            x, li, offs, w["norm"], w["sqkv"], w["so"],
                            cos_p, sin_p, k_l, v_l,
                            w["wqkv"], w["wo"], **sc, **kw)
                        x = x + y
                        z = ffn_half_step(
                            x, li, w["norm"], w["ada"], w["s13"],
                            w["s2"], w["w13"], w["w2"], eps=1e-5,
                            interpret=kw["interpret"])
                        # Data-chain the next iteration through the
                        # outputs (defeats XLA folding across steps).
                        x = x + z + 1e-6 * jnp.mean(
                            kn.astype(jnp.float32)) * jnp.ones((rows, D))
                        return x, ()

                    x, _ = jax.lax.scan(
                        body, x0, jnp.arange(length, dtype=jnp.int32))
                    return x[0, 0]

                @functools.lru_cache(maxsize=None)
                def _jitted(length, run=run):
                    return jax.jit(functools.partial(run, length=length))

                wt = w_g32 if wg else w

                def runner(length, wt=wt):
                    return _jitted(length)(x0, wt, kc, vc, ks, vs)

                wbytes = (nqkv_l * D + D * nq_l + 2 * f_l * D + D * f_l)
                if wg:
                    wbytes = int(wbytes * 1.125)
                cbytes = 2 * b * hkv_l * S * HD * (1 if int8 else 2)
                if int8:
                    cbytes += 2 * b * hkv_l * S * 4
                if short is None or long is None:
                    diff = max(64, min(6000, int(25e9 / (wbytes + cbytes))))
                    lo, hi = max(16, diff // 10), max(16, diff // 10) + diff
                else:
                    lo, hi = short, long
                per = _timed_slope(runner, lo, hi)
                r = {"bench": "tp_halves", "tp": tp, "variant": variant,
                     "batch": b, "seq": S,
                     "ms_per_layer": round(per * 1e3, 3),
                     "eff_gbps": round((wbytes + cbytes) / per / 1e9, 1)}
                results.append(r)
                print(json.dumps(r), flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="all",
                    choices=["all", "matmul", "step", "step-fused", "step-q4g",
                             "step-bf16", "step-spec", "step-spec-int8",
                             "step-spec-q4g",
                             "step-int8kv", "step-chunked", "encode",
                             "tp-lm", "tp-halves"])
    ap.add_argument("--m", default="1,2,8")
    ap.add_argument("--batch", default="1,2,4")
    ap.add_argument("--streams", type=int, default=8,
                    help="step-spec-int8: pooled streams (B).  pool8 is "
                    "the v5e VMEM ceiling for spec-K<=4 at S=804 "
                    "(pool16xK=4 measured 139 MB of 128 MB VMEM; the "
                    "stack_vmem_need gate refuses it)")
    ap.add_argument("--seq", type=int, default=160,
                    help="cache positions for the step suites")
    ap.add_argument("--lm-argmax", action="store_true",
                    help="step-fused: fold the greedy argmax into "
                    "the kernel's lm grid step")
    ap.add_argument("--q4", action="store_true",
                    help="include packed-q4 kernels in the matmul suite")
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (cpu for smoke tests)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from voxtral_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    import jax

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)

    if args.suite in ("all", "matmul"):
        suite_matmul([int(x) for x in args.m.split(",")], args.q4)
    if args.suite in ("all", "step"):
        suite_step([int(x) for x in args.batch.split(",")])
    if args.suite == "step-fused":
        suite_step_fused([int(x) for x in args.batch.split(",")],
                         seq=args.seq, lm_argmax=args.lm_argmax)
    if args.suite == "step-q4g":
        suite_step_q4g([int(x) for x in args.batch.split(",")],
                       seq=args.seq, lm_argmax=args.lm_argmax)
    if args.suite == "step-bf16":
        suite_step_bf16([int(x) for x in args.batch.split(",")],
                        seq=args.seq)
    if args.suite == "step-spec":
        suite_step_spec(ks=[int(x) for x in args.batch.split(",")],
                        seq=args.seq)
    if args.suite == "step-spec-q4g":
        # Exact-Q4_0 speculative ceiling (g32 weights, bf16 KV).
        suite_step_spec(ks=[int(x) for x in args.batch.split(",")],
                        streams=args.streams, seq=args.seq, weights="q4g")
    if args.suite == "step-spec-int8":
        # The pooled speculative serving point: int8-KV streams at the
        # bounded-pool S=804 geometry, K drafts per slot.
        suite_step_spec(ks=[int(x) for x in args.batch.split(",")],
                        streams=args.streams, seq=args.seq, int8=True)
    if args.suite == "step-int8kv":
        suite_step_int8kv([int(x) for x in args.batch.split(",")],
                          seq=args.seq)
    if args.suite == "step-chunked":
        suite_step_chunked([int(x) for x in args.batch.split(",")])
    if args.suite == "encode":
        suite_encode()
    if args.suite == "tp-lm":
        suite_tp_lm(batches=[int(x) for x in args.batch.split(",")])
    if args.suite == "tp-halves":
        suite_tp_halves(batches=[int(x) for x in args.batch.split(",")],
                        seq=args.seq)


if __name__ == "__main__":
    main()
