"""On-the-fly Q4_0 quantization of a dense parameter pytree.

Produces the same parameter format as the GGUF loader — used by
benchmarks (random weights at production shapes) and by users who want a
Q4 model without writing a GGUF file first.  Dense linears are stored
[in, out]; Q4 stores [out, in], so weights are transposed back before
quantizing along K (the in-features axis), matching the GGUF layout.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from voxtral_tpu.ops.q4 import quantize_q4_0, repack_q4_0
from voxtral_tpu.ops.q4_pallas import pack_codes, transpose_scales

Params = dict[str, Any]

# Leaf names that are weight matrices, per parent dict.
_LINEAR_KEYS = {
    "attention": {"wq", "wk", "wv", "wo"},
    "ffn": {"w1", "w2", "w3"},
    "ada": {"w0", "w2"},
    "adapter": {"w1", "w2"},
}


def _quantize_matrix(w_nk: np.ndarray, pack: bool = True) -> dict:
    """[N, K] f32 -> q4 dict (packed when the Pallas kernel supports it).

    ``pack=False`` keeps the unpacked {codes, f16 scales} form — the
    exact group-32 re-encoding the g32 stack-kernel mode streams
    (ops.decode_step_pallas.fuse_decode_weights_q4g)."""
    n, k = w_nk.shape
    if k % 32 != 0:
        return None  # not quantizable; keep dense
    q4 = repack_q4_0(quantize_q4_0(w_nk), (n, k))
    if pack and k % 256 == 0 and n % 128 == 0:
        q4 = {
            "codes_packed": pack_codes(q4["codes"]),
            "scales_t": transpose_scales(q4["scales"]),
        }
    return {"q4": q4}


def _rand_w8(rng, *shape) -> dict:
    """Random {"w8": ...} leaf; shape = ([L,] N, K).

    Stacked layers tile ONE random matrix (benchmarks are value-
    independent; generating 4B+ random ints dominates init time).
    """
    if len(shape) == 3:
        layer = rng.integers(-127, 128, size=shape[1:], dtype=np.int8)
        codes = np.broadcast_to(layer, shape).copy()
    else:
        codes = rng.integers(-127, 128, size=shape, dtype=np.int8)
    return {"w8": {
        "codes": codes,
        "scale": np.full(shape[:-1], 2e-4, dtype=np.float32),
    }}


def random_w8_params(cfg, seed: int = 0, to_device: bool = True) -> Params:
    """Random production-shape W8A8 params (host-built, for benchmarks)."""
    import ml_dtypes

    rng = np.random.default_rng(seed)
    e, l, a = cfg.audio_encoder, cfg.language_model, cfg.adapter
    tc = cfg.ada_rms_norm_t_cond_dim or 32
    bf16 = np.dtype(ml_dtypes.bfloat16)
    rand_dense = lambda *s: (rng.normal(size=s).astype(np.float32) * 0.02).astype(bf16)

    qd_e = e.n_heads * e.head_dim
    encoder = {
        "conv": {
            "conv1": rand_dense(e.dim, 128, 3), "conv1_b": np.zeros(e.dim, bf16),
            "conv2": rand_dense(e.dim, e.dim, 3), "conv2_b": np.zeros(e.dim, bf16),
        },
        "layers": {
            "attention_norm": np.ones((e.n_layers, e.dim), bf16),
            "attention": {
                "wq": _rand_w8(rng, e.n_layers, qd_e, e.dim),
                "wq_b": np.zeros((e.n_layers, qd_e), bf16),
                "wk": _rand_w8(rng, e.n_layers, qd_e, e.dim),
                "wv": _rand_w8(rng, e.n_layers, qd_e, e.dim),
                "wv_b": np.zeros((e.n_layers, qd_e), bf16),
                "wo": _rand_w8(rng, e.n_layers, e.dim, qd_e),
                "wo_b": np.zeros((e.n_layers, e.dim), bf16),
            },
            "ffn_norm": np.ones((e.n_layers, e.dim), bf16),
            "ffn": {
                "w1": _rand_w8(rng, e.n_layers, e.hidden_dim, e.dim),
                "w2": _rand_w8(rng, e.n_layers, e.dim, e.hidden_dim),
                "w2_b": np.zeros((e.n_layers, e.dim), bf16),
                "w3": _rand_w8(rng, e.n_layers, e.hidden_dim, e.dim),
            },
        },
        "norm": np.ones(e.dim, bf16),
    }
    qd = l.n_heads * l.head_dim
    kvd = l.n_kv_heads * l.head_dim
    decoder = {
        "tok_embeddings": _rand_w8(rng, l.vocab_size, l.dim),
        "layers": {
            "ada": {
                "w0": _rand_w8(rng, l.n_layers, tc, l.dim),
                "w2": _rand_w8(rng, l.n_layers, l.dim, tc),
            },
            "attention_norm": np.ones((l.n_layers, l.dim), bf16),
            "attention": {
                "wq": _rand_w8(rng, l.n_layers, qd, l.dim),
                "wk": _rand_w8(rng, l.n_layers, kvd, l.dim),
                "wv": _rand_w8(rng, l.n_layers, kvd, l.dim),
                "wo": _rand_w8(rng, l.n_layers, l.dim, qd),
            },
            "ffn_norm": np.ones((l.n_layers, l.dim), bf16),
            "ffn": {
                "w1": _rand_w8(rng, l.n_layers, l.hidden_dim, l.dim),
                "w2": _rand_w8(rng, l.n_layers, l.dim, l.hidden_dim),
                "w3": _rand_w8(rng, l.n_layers, l.hidden_dim, l.dim),
            },
        },
        "norm": np.ones(l.dim, bf16),
    }
    adapter = {
        "w1": _rand_w8(rng, a.output_dim, a.input_dim),
        "w2": _rand_w8(rng, a.output_dim, a.output_dim),
    }
    params = {"encoder": encoder, "decoder": decoder, "adapter": adapter}
    if to_device:
        import jax
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(jnp.asarray, params)
    return params


def quantize_params_w8(params: Params, to_device: bool = True) -> Params:
    """Quantize a dense pytree's linears + embeddings to rowwise int8."""
    from voxtral_tpu.ops.w8 import quantize_w8_rowwise

    def q_matrix(w_nk):
        return quantize_w8_rowwise(np.asarray(w_nk, dtype=np.float32))

    def walk(node, parent_key: str):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, val in node.items():
            if isinstance(val, dict):
                out[key] = walk(val, key)
            elif key == "tok_embeddings":
                out[key] = q_matrix(val)  # [V, D]
            elif key in _LINEAR_KEYS.get(parent_key, set()) and getattr(val, "ndim", 0) >= 2:
                w = np.asarray(val, dtype=np.float32)
                if w.ndim == 3:  # [L, in, out] -> per-layer [out, in]
                    per = [q_matrix(w[i].T)["w8"] for i in range(w.shape[0])]
                    out[key] = {"w8": {
                        "codes": np.stack([p["codes"] for p in per]),
                        "scale": np.stack([p["scale"] for p in per]),
                    }}
                else:
                    out[key] = q_matrix(w.T)
            else:
                out[key] = val
        return out

    result = {
        "encoder": walk(params["encoder"], "encoder"),
        "decoder": walk(params["decoder"], "decoder"),
        "adapter": walk(params["adapter"], "adapter"),
    }
    if to_device:
        import jax
        import jax.numpy as jnp

        result = jax.tree_util.tree_map(jnp.asarray, result)
    return result


def random_q4_params(cfg, seed: int = 0, to_device: bool = True,
                     pack: bool = True) -> Params:
    """Random production-shape Q4 params built ENTIRELY on the host.

    For benchmarks: avoids generating 9 GB of dense weights on device and
    hauling them to the host for quantization — only the packed arrays
    (~2.2 GB) ever cross to the device.  ``pack=False`` keeps unpacked
    {codes, f16 scales} leaves (the g32 fused-decode form).
    """
    import ml_dtypes

    rng = np.random.default_rng(seed)
    e, l, a = cfg.audio_encoder, cfg.language_model, cfg.adapter
    tc = cfg.ada_rms_norm_t_cond_dim or 32
    bf16 = np.dtype(ml_dtypes.bfloat16)

    def rand_q4_stack(n_layers, n, k):
        """Stacked Q4 leaves without materializing f32 for all layers."""
        qs = [_quantize_matrix(
            rng.normal(size=(n, k)).astype(np.float32) * 0.02, pack=pack)
              for _ in range(n_layers)]
        return {"q4": {kk: np.stack([q["q4"][kk] for q in qs]) for kk in qs[0]["q4"]}}

    def rand_q4(n, k):
        return _quantize_matrix(
            rng.normal(size=(n, k)).astype(np.float32) * 0.02, pack=pack)

    def rand_dense(*shape):
        return (rng.normal(size=shape).astype(np.float32) * 0.02).astype(bf16)

    qd_e = e.n_heads * e.head_dim
    encoder = {
        "conv": {
            "conv1": rand_dense(e.dim, 128, 3), "conv1_b": np.zeros(e.dim, bf16),
            "conv2": rand_dense(e.dim, e.dim, 3), "conv2_b": np.zeros(e.dim, bf16),
        },
        "layers": {
            "attention_norm": np.ones((e.n_layers, e.dim), bf16),
            "attention": {
                "wq": rand_q4_stack(e.n_layers, qd_e, e.dim),
                "wq_b": np.zeros((e.n_layers, qd_e), bf16),
                "wk": rand_q4_stack(e.n_layers, qd_e, e.dim),
                "wv": rand_q4_stack(e.n_layers, qd_e, e.dim),
                "wv_b": np.zeros((e.n_layers, qd_e), bf16),
                "wo": rand_q4_stack(e.n_layers, e.dim, qd_e),
                "wo_b": np.zeros((e.n_layers, e.dim), bf16),
            },
            "ffn_norm": np.ones((e.n_layers, e.dim), bf16),
            "ffn": {
                "w1": rand_q4_stack(e.n_layers, e.hidden_dim, e.dim),
                "w2": rand_q4_stack(e.n_layers, e.dim, e.hidden_dim),
                "w2_b": np.zeros((e.n_layers, e.dim), bf16),
                "w3": rand_q4_stack(e.n_layers, e.hidden_dim, e.dim),
            },
        },
        "norm": np.ones(e.dim, bf16),
    }

    qd = l.n_heads * l.head_dim
    kvd = l.n_kv_heads * l.head_dim
    decoder = {
        "tok_embeddings": rand_q4(l.vocab_size, l.dim),
        "layers": {
            "ada": {
                "w0": rand_q4_stack(l.n_layers, tc, l.dim),
                "w2": rand_q4_stack(l.n_layers, l.dim, tc),
            },
            "attention_norm": np.ones((l.n_layers, l.dim), bf16),
            "attention": {
                "wq": rand_q4_stack(l.n_layers, qd, l.dim),
                "wk": rand_q4_stack(l.n_layers, kvd, l.dim),
                "wv": rand_q4_stack(l.n_layers, kvd, l.dim),
                "wo": rand_q4_stack(l.n_layers, l.dim, qd),
            },
            "ffn_norm": np.ones((l.n_layers, l.dim), bf16),
            "ffn": {
                "w1": rand_q4_stack(l.n_layers, l.hidden_dim, l.dim),
                "w2": rand_q4_stack(l.n_layers, l.dim, l.hidden_dim),
                "w3": rand_q4_stack(l.n_layers, l.hidden_dim, l.dim),
            },
        },
        "norm": np.ones(l.dim, bf16),
    }

    adapter = {
        "w1": rand_q4(a.output_dim, a.input_dim),
        "w2": rand_q4(a.output_dim, a.output_dim),
    }

    params = {"encoder": encoder, "decoder": decoder, "adapter": adapter}
    if to_device:
        import jax
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(jnp.asarray, params)
    return params


def quantize_params_q4(params: Params, to_device: bool = True,
                       pack: bool = True) -> Params:
    """Quantize attention/FFN/ADA/adapter linears + tok_embeddings to Q4_0.

    Norms, biases and the conv downsampler stay dense, mirroring the GGUF
    export (reference gguf/loader.rs:263-275).  ``pack=False`` keeps the
    unpacked g32 form for the exact-Q4_0 fused decode path.
    """

    def walk(node, parent_key: str):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, val in node.items():
            if isinstance(val, dict):
                out[key] = walk(val, key)
            elif key == "tok_embeddings":
                w = np.asarray(val, dtype=np.float32)  # [V, D] — K = D
                q = _quantize_matrix(w, pack=pack)
                out[key] = q if q is not None else val
            elif (
                key in _LINEAR_KEYS.get(parent_key, set())
                or (parent_key == "adapter" and key in ("w1", "w2"))
            ) and getattr(val, "ndim", 0) >= 2:
                w = np.asarray(val, dtype=np.float32)
                if w.ndim == 3:  # stacked layers [L, in, out]
                    qs = [_quantize_matrix(w[i].T, pack=pack)
                          for i in range(w.shape[0])]
                    if any(q is None for q in qs):
                        out[key] = val
                    else:
                        out[key] = {
                            "q4": {
                                kk: np.stack([q["q4"][kk] for q in qs])
                                for kk in qs[0]["q4"]
                            }
                        }
                else:  # [in, out]
                    q = _quantize_matrix(w.T, pack=pack)
                    out[key] = q if q is not None else val
            else:
                out[key] = val
        return out

    result = {
        "encoder": walk(params["encoder"], "encoder"),
        "decoder": walk(params["decoder"], "decoder"),
        "adapter": walk(params["adapter"], "adapter"),
    }
    if to_device:
        import jax
        import jax.numpy as jnp

        result = jax.tree_util.tree_map(jnp.asarray, result)
    return result
