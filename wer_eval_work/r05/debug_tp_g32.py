"""Repro: TP g32 halves vs TP w8-equivalent halves (uniform scales).

Both modes quantize activations identically (per-shard local absmax), so
with uniform group scales the two TP runs should be numerically
identical (same integer dots, same f32 epilogues).  Layer-by-layer
comparison to localize any divergence.
"""
import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import sys
sys.path.insert(0, "tests"); sys.path.insert(0, ".")
import test_q4g_stack as tq
from voxtral_tpu.ops.decode_step_pallas import (
    ada_vectors,
    fuse_decode_weights,
    fuse_decode_weights_q4g,
    rope_pair_vectors,
)
from voxtral_tpu.ops.decode_tp_pallas import (
    tp_decode_step,
    tp_shard_fused_weights,
    tp_shard_fused_weights_q4g,
)
from test_parallel import make_mesh

rng = np.random.default_rng(11)
q4_params, w8_params = tq.build_params(
    rng, lambda l, n, g: np.ones((l, n, g)))
t_embed, k_cache, v_cache, x = tq._inputs(rng)

fused_g = fuse_decode_weights_q4g(q4_params)
fused_w = fuse_decode_weights(w8_params)
adav = ada_vectors(q4_params, t_embed)

offs = jnp.asarray([tq.OFFSET, 5], jnp.int32)
cs = [rope_pair_vectors(offs[b], tq.HEAD_DIM, theta=1e6)
      for b in range(tq.B)]
cos_b = jnp.stack([c for c, _ in cs])
sin_b = jnp.stack([s for _, s in cs])

tp_g = tp_shard_fused_weights_q4g(
    fused_g, tq.N_HEADS, tq.N_KV, tq.HEAD_DIM, tq.HIDDEN, tp=2)
tp_w = tp_shard_fused_weights(
    fused_w, tq.N_HEADS, tq.N_KV, tq.HEAD_DIM, tq.HIDDEN, tp=2)

mesh = make_mesh(n_data=1, n_model=2)
lyr = q4_params["layers"]
kw = dict(n_heads=tq.N_HEADS, n_kv=tq.N_KV, head_dim=tq.HEAD_DIM,
          eps=tq.EPS, interpret=True)

gx, gk, gv = tp_decode_step(
    mesh, x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
    tp_g, cos_b, sin_b, k_cache, v_cache, **kw)
wx, wk, wv = tp_decode_step(
    mesh, x, offs, w8_params["layers"]["attention_norm"],
    w8_params["layers"]["ffn_norm"], adav,
    tp_w, cos_b, sin_b, k_cache, v_cache, **kw)

print("x   max|d|:", float(jnp.max(jnp.abs(gx - wx))))
for l in range(tq.L):
    print(f"k[{l}] max|d|:", float(jnp.max(jnp.abs(gk[l] - wk[l]))),
          f" v[{l}] max|d|:", float(jnp.max(jnp.abs(gv[l] - wv[l]))))

# ---- g32 TP lm fold ----
from voxtral_tpu.ops.decode_tp_pallas import (
    tp_lm_head_token,
    tp_shard_lm_head,
    tp_shard_lm_head_q4g,
)

V = 384
emb_codes = rng.integers(-8, 8, size=(V, tq.D), dtype=np.int8)
emb_scales = (0.005 + rng.random((V, tq.D // 32)) * 0.03).astype(np.float16)
q4p = dict(q4_params)
q4p["tok_embeddings"] = tq._q4_leaf_from(emb_codes, emb_scales)
q4p["norm"] = jnp.asarray(1.0 + rng.normal(size=(tq.D,)) * 0.1, jnp.float32)
fused_lm = fuse_decode_weights_q4g(q4p)
lm_tp = tp_shard_lm_head_q4g(fused_lm["lm_codes"], fused_lm["lm_scale"], 2)

tok = tp_lm_head_token(mesh, gx, q4p["norm"], lm_tp["codes"],
                       lm_tp["scale"], eps=tq.EPS, interpret=True)

# Reference: final norm + q4g_matmul_a8 logits argmax
from voxtral_tpu.ops.q4 import q4g_matmul_a8
xf = gx.astype(jnp.float32)
var = jnp.mean(xf * xf, axis=-1, keepdims=True)
h = xf * jax.lax.rsqrt(var + tq.EPS) * q4p["norm"]
logits = q4g_matmul_a8(h, emb_codes, emb_scales)
ref_tok = jnp.argmax(logits, -1)
print("lm fold tokens:", np.asarray(tok), "ref:", np.asarray(ref_tok),
      "match:", bool((tok == ref_tok).all()))

# ---- spec=2 ----
x4 = jnp.concatenate([x, x * 0.7 + 0.1])  # 4 rows = 2 streams x K=2
cos4 = jnp.concatenate([cos_b, cos_b])
sin4 = jnp.concatenate([sin_b, sin_b])
gx2, gk2, gv2 = tp_decode_step(
    mesh, x4, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
    tp_g, cos4, sin4, k_cache, v_cache, spec=2, **kw)
wx2, wk2, wv2 = tp_decode_step(
    mesh, x4, offs, w8_params["layers"]["attention_norm"],
    w8_params["layers"]["ffn_norm"], adav,
    tp_w, cos4, sin4, k_cache, v_cache, spec=2, **kw)
print("spec2 x max|d|:", float(jnp.max(jnp.abs(gx2 - wx2))),
      " k:", float(jnp.max(jnp.abs(gk2 - wk2))))

# ---- int8 KV ----
from voxtral_tpu.ops.decode_step_pallas import quantize_kv
kq, ks = quantize_kv(k_cache)
vq, vs = quantize_kv(v_cache)
gxq, _, _ = tp_decode_step(
    mesh, x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
    tp_g, cos_b, sin_b, kq, vq, k_scales=ks, v_scales=vs, **kw)
wxq, _, _ = tp_decode_step(
    mesh, x, offs, w8_params["layers"]["attention_norm"],
    w8_params["layers"]["ffn_norm"], adav,
    tp_w, cos_b, sin_b, kq, vq, k_scales=ks, v_scales=vs, **kw)
print("int8kv x max|d|:", float(jnp.max(jnp.abs(gxq - wxq))))

# ---- chunked (HBM cache) ----
gxc, _, _ = tp_decode_step(
    mesh, x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
    tp_g, cos_b, sin_b, k_cache, v_cache, cache_chunk=8, **kw)
wxc, _, _ = tp_decode_step(
    mesh, x, offs, w8_params["layers"]["attention_norm"],
    w8_params["layers"]["ffn_norm"], adav,
    tp_w, cos_b, sin_b, k_cache, v_cache, cache_chunk=8, **kw)
print("chunked x max|d|:", float(jnp.max(jnp.abs(gxc - wxc))))

print("|x| scale:", float(jnp.max(jnp.abs(gxq))),
      "rel d:", float(jnp.max(jnp.abs(gxq - wxq)) / jnp.max(jnp.abs(gxq))))
# int8kv drift source check: same cache, so only fresh-row bf16
# rounding can differ.  Compare fresh K bf16 rows directly.
_, gkn, gvn = tp_decode_step(
    mesh, x, offs, lyr["attention_norm"], lyr["ffn_norm"], adav,
    tp_g, cos_b, sin_b, kq, vq, k_scales=ks, v_scales=vs, **kw)
_, wkn, wvn = tp_decode_step(
    mesh, x, offs, w8_params["layers"]["attention_norm"],
    w8_params["layers"]["ffn_norm"], adav,
    tp_w, cos_b, sin_b, kq, vq, k_scales=ks, v_scales=vs, **kw)
print("fresh k bf16 max|d|:", float(jnp.max(jnp.abs(
    gkn.astype(jnp.float32) - wkn.astype(jnp.float32)))))
