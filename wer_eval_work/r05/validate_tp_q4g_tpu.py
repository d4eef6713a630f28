"""Real-TPU validation of the g32 (exact-Q4_0) TP half-kernels.

Interpret mode can't catch Mosaic layout faults (CLAUDE.md), so the TP
g32 halves must compile+run on hardware before the milestone counts.
The psums need real multi-chip ICI; the HALVES are single-chip
measurable (same contract as the r3/r4 tp-halves validation).

Exactness on hardware via the w8-equivalence trick
(tests/test_tp_q4g.py): with uniform group scales the g32 math equals
the (already hardware-validated) w8 rowwise math exactly — both runs
execute ON THE TPU and must agree to f32 accumulation order.

Run from /root/repo (TPU):
    python wer_eval_work/r05/validate_tp_q4g_tpu.py
Appends JSON lines to wer_eval_work/r05/tp_q4g_tpu.jsonl, then runs the
kernel_bench tp-halves q4g perf variants (chained-slope timing).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())  # run from /root/repo (no PYTHONPATH on TPU)

import numpy as np

import jax
import jax.numpy as jnp

from voxtral_tpu.ops.decode_step_pallas import rope_pair_vectors
from voxtral_tpu.ops.decode_tp_pallas import (
    attn_half_step,
    ffn_half_step,
    lm_half_argmax,
)

OUT = "wer_eval_work/r05/tp_q4g_tpu.jsonl"
D, H, HKV, HD, F = 3072, 32, 8, 128, 9216
L = 2


def equiv_pair(rng, n, k, ll=L):
    """g32 stacks (uniform group scales) + the exact w8 equivalent."""
    sb = k // 128
    codes = rng.integers(-8, 8, size=(ll, sb, n, 128), dtype=np.int8)
    rows = (0.005 + rng.random((ll, n)) * 0.02).astype(np.float32)
    gs = np.broadcast_to(
        rows[:, None, None, :], (ll, 4 * sb, 1, n)).copy()
    w8 = np.transpose(codes, (0, 2, 1, 3)).reshape(ll, n, k)
    return ((jnp.asarray(codes), jnp.asarray(gs)),
            (jnp.asarray(w8), jnp.asarray(rows)))


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    results = []
    for tp in (2, 4):
        h_l, hkv_l, f_l = H // tp, HKV // tp, F // tp
        nq_l = h_l * HD
        nqkv_l = nq_l + 2 * hkv_l * HD
        rng = np.random.default_rng(tp)
        (gq_c, gq_s), (wq_c, wq_s) = equiv_pair(rng, nqkv_l, D)
        (go_c, go_s), (wo_c, wo_s) = equiv_pair(rng, D, nq_l)
        (g13_c, g13_s), (w13_c, w13_s) = equiv_pair(rng, 2 * f_l, D)
        (g2_c, g2_s), (w2_c, w2_s) = equiv_pair(rng, D, f_l)
        norm = jnp.asarray(1 + rng.normal(size=(D,)) * 0.05, jnp.float32)
        ada = jnp.asarray(1 + rng.normal(size=(D,)) * 0.05, jnp.float32)

        B, S = 2, 160
        x = jnp.asarray(rng.normal(size=(B, D)) * 0.3, jnp.float32)
        offs = jnp.asarray([40, 33], jnp.int32)
        kc = jnp.asarray(
            rng.normal(size=(L, B, hkv_l, S, HD)) * 0.3, jnp.bfloat16)
        vc = kc * 0.5
        cs = jax.vmap(lambda p: rope_pair_vectors(p, HD, 1e6))(offs)
        kw = dict(n_heads_l=h_l, n_kv_l=hkv_l, head_dim=HD, eps=1e-5,
                  window=8192)

        @jax.jit
        def run(x, kc, vc, qc, qs, oc, os_, c13, s13, c2, s2, kw=kw):
            y, kn, vn = attn_half_step(
                x, 1, offs, norm, qs, os_, cs[0], cs[1],
                kc[1], vc[1], qc, oc, **kw)
            h = x + y
            z = ffn_half_step(h, 1, norm, ada, s13, s2, c13, c2, eps=1e-5)
            return h + z, kn, vn

        t0 = time.time()
        gx, gk, gv = run(x, kc, vc, gq_c, gq_s, go_c, go_s,
                         g13_c, g13_s, g2_c, g2_s)
        gx = np.asarray(gx)
        compile_s = time.time() - t0
        # w8 halves take the PER-LAYER scale vector (the TP scan slices
        # them); g32 passes the whole HBM stack (layer-indexed inside).
        wx, wk, wv = run(x, kc, vc, wq_c, wq_s[1], wo_c, wo_s[1],
                         w13_c, w13_s[1], w2_c, w2_s[1])
        wx = np.asarray(wx)
        dx = float(np.max(np.abs(gx - wx)))
        dk = float(jnp.max(jnp.abs(gk.astype(jnp.float32)
                                   - wk.astype(jnp.float32))))
        scale = float(np.max(np.abs(wx)))
        r = {"check": "halves_w8_equiv", "tp": tp, "max_dx": dx,
             "max_dk": dk, "x_scale": round(scale, 3),
             "compile_s": round(compile_s, 1),
             "finite": bool(np.isfinite(gx).all())}
        results.append(r)
        print(json.dumps(r), flush=True)
        assert r["finite"] and dx <= 1e-4 * max(1.0, scale), r

    # g32 vocab-sharded lm fold at real shard geometry (V/2 of 131072).
    rng = np.random.default_rng(9)
    V_l = 65536
    (lc, ls), (wc, ws) = equiv_pair(rng, V_l, D, ll=1)
    fnorm = jnp.asarray(1 + rng.normal(size=(D,)) * 0.05, jnp.float32)
    xb = jnp.asarray(rng.normal(size=(2, D)) * 0.3, jnp.float32)
    t0 = time.time()
    gv_, gi = lm_half_argmax(xb, fnorm, ls[0], lc[0], eps=1e-5)
    gi = np.asarray(gi)
    compile_s = time.time() - t0
    wv_, wi = lm_half_argmax(xb, fnorm, ws[0], wc[0], eps=1e-5)
    r = {"check": "lm_fold_w8_equiv", "V_l": V_l,
         "tokens_equal": bool((gi == np.asarray(wi)).all()),
         "max_dv": float(jnp.max(jnp.abs(gv_ - wv_))),
         "compile_s": round(compile_s, 1)}
    results.append(r)
    print(json.dumps(r), flush=True)
    assert r["tokens_equal"], r

    with open(OUT, "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    print("TP g32 EXACTNESS OK — running perf variants")

    from benches.kernel_bench import suite_tp_halves

    perf = suite_tp_halves(tps=(2, 4), batches=(1, 4),
                           variants=("q4g", "q4g-spec4"))
    with open(OUT, "a") as f:
        for r in perf:
            f.write(json.dumps(r) + "\n")
    print("ALL TP g32 TPU CHECKS OK")


if __name__ == "__main__":
    main()
