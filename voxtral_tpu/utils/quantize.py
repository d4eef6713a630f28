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


def _quantize_matrix(w_nk: np.ndarray) -> dict:
    """[N, K] f32 -> q4 dict (packed when the Pallas kernel supports it)."""
    n, k = w_nk.shape
    if k % 32 != 0:
        return None  # not quantizable; keep dense
    q4 = repack_q4_0(quantize_q4_0(w_nk), (n, k))
    if k % 256 == 0 and n % 128 == 0:
        q4 = {
            "codes_packed": pack_codes(q4["codes"]),
            "scales_t": transpose_scales(q4["scales"]),
        }
    return {"q4": q4}


def quantize_params_q4(params: Params, to_device: bool = True) -> Params:
    """Quantize attention/FFN/ADA/adapter linears + tok_embeddings to Q4_0.

    Norms, biases and the conv downsampler stay dense, mirroring the GGUF
    export (reference gguf/loader.rs:263-275).
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
                q = _quantize_matrix(w)
                out[key] = q if q is not None else val
            elif (
                key in _LINEAR_KEYS.get(parent_key, set())
                or (parent_key == "adapter" and key in ("w1", "w2"))
            ) and getattr(val, "ndim", 0) >= 2:
                w = np.asarray(val, dtype=np.float32)
                if w.ndim == 3:  # stacked layers [L, in, out]
                    qs = [_quantize_matrix(w[i].T) for i in range(w.shape[0])]
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
                    q = _quantize_matrix(w.T)
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
