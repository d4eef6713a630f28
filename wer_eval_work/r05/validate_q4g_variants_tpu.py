"""Real-TPU validation of the q4g stack-kernel VARIANTS (Mosaic lowering
differs from the scalar-offset bench): per-row offsets (pooled), spec=K
draft rows, int8 KV cache, folded lm_head — interpret mode can't catch
layout errors (CLAUDE.md), so each variant must compile+run on hardware
once before it counts.

Run from /root/repo (TPU):  python wer_eval_work/r05/validate_q4g_variants_tpu.py
Appends one JSON line per variant to wer_eval_work/r05/q4g_variants.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())  # run from /root/repo (no PYTHONPATH on TPU)

import numpy as np

import jax
import jax.numpy as jnp

from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.ops.decode_step_pallas import (
    decode_stack_step,
    fuse_decode_weights_q4g,
    quantize_kv,
    rope_pair_vectors,
)
from voxtral_tpu.utils.quantize import random_q4_params

OUT = "wer_eval_work/r05/q4g_variants.jsonl"


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    cfg = VoxtralConfig.voxtral()
    lm = cfg.language_model
    params = random_q4_params(cfg, pack=False)["decoder"]
    fused = fuse_decode_weights_q4g(params)
    adav = jnp.ones((lm.n_layers, lm.dim), jnp.float32)

    S = 160
    results = []
    for name, B, spec, int8 in (
        ("pooled_rows", 4, 1, False),
        ("spec2", 2, 2, False),
        ("spec2_int8kv", 2, 2, True),
    ):
        rows = B * spec
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(rows, lm.dim)) * 0.1, jnp.float32)
        offs = jnp.asarray(40 + 7 * np.arange(B), jnp.int32)
        pos_rows = (offs[:, None] + np.arange(spec)[None, :]).reshape(-1)
        cs = jax.vmap(lambda p: rope_pair_vectors(
            p, lm.head_dim, lm.rope_theta))(pos_rows)
        kc = jnp.asarray(
            rng.normal(size=(lm.n_layers, B, lm.n_kv_heads, S,
                             lm.head_dim)) * 0.3, jnp.bfloat16)
        vc = kc * 0.5
        kw = {}
        if int8:
            kc, ks = quantize_kv(kc)
            vc, vs = quantize_kv(vc)
            kw = dict(k_scales=ks, v_scales=vs)

        @jax.jit
        def step(x, offs, kc, vc, fused, adav, kw=kw, spec=spec):
            return decode_stack_step(
                x, offs,
                fused["attn_norm"], fused["ffn_norm"], adav,
                fused["sqkv"], fused["so"], fused["s13"], fused["s2"],
                cs[0], cs[1], kc, vc,
                fused["wqkv"], fused["wo"], fused["w13"], fused["w2"],
                final_norm=jnp.ones((lm.dim,), jnp.float32),
                lm_codes=fused["lm_codes"], lm_scale=fused["lm_scale"],
                lm_argmax=True,
                n_heads=lm.n_heads, n_kv=lm.n_kv_heads,
                head_dim=lm.head_dim, eps=lm.norm_eps,
                window=lm.sliding_window, spec=spec, **kw,
            )

        t0 = time.time()
        out = step(x, offs, kc, vc, fused, adav)
        toks = np.asarray(out[-1])
        compile_s = time.time() - t0
        xo = np.asarray(out[0])
        ok = bool(np.isfinite(xo).all())
        r = {"variant": name, "rows": rows, "spec": spec, "int8kv": int8,
             "finite": ok, "tokens": toks.reshape(-1)[:4].tolist(),
             "compile_s": round(compile_s, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)
        assert ok, name

    with open(OUT, "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    print("ALL q4g TPU VARIANTS OK")


if __name__ == "__main__":
    main()
