"""W8A8 fast path: rowwise-int8 weights x dynamically-quantized activations
on the native int8 MXU.

Measured on v5e: the int8 MXU contraction beats both bf16 (1.4x) and every
int4 VPU-dequant variant (the nibble unpack is VPU-bound at ~6 lane-ops
per weight, which caps int4 decode below the bf16 path).  So the serving
sweet spot on this hardware is: **Q4_0 on disk** (2.5 GB artifact, fast
load) -> **int8 in HBM** (half of bf16 traffic) -> **int8 MXU**.

Format (pytree leaf): {"w8": {"codes": int8[N, K], "scale": f32[N]}}
    W[n, k] ~= codes[n, k] * scale[n]

Activations are quantized per call with a single dynamic absmax scale
(A8, symmetric); the dot accumulates in int32 and the two scales fold
into the f32 epilogue.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


def quantize_w8_rowwise(w_nk: np.ndarray) -> dict:
    """f32 [N, K] -> {"w8": {codes, scale}} with symmetric rowwise scales."""
    absmax = np.abs(w_nk).max(axis=1)
    scale = (absmax / 127.0).astype(np.float32)
    inv = np.where(scale > 0, 1.0 / np.maximum(scale, 1e-30), 0.0)
    codes = np.clip(np.rint(w_nk * inv[:, None]), -127, 127).astype(np.int8)
    return {"w8": {"codes": codes, "scale": scale}}


def _quantize_activations(x: jax.Array):
    """Symmetric PER-TOKEN int8 quantization (per-row absmax scales —
    robust to activation outliers in long prefills; decode rows are
    single tokens either way)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx  # sx: [..., 1]


def w8_matmul(x: jax.Array, w8: dict, prefer_pallas: bool = True) -> jax.Array:
    """y = x @ W^T; x [..., K] -> [..., N] f32, int8 MXU contraction.

    The Pallas kernel variant (ops/w8_pallas.py) wins isolated
    microbenches (+35% streaming BW) but LOSES at full-model scale —
    per-call pipeline warm-up x 9 matmuls/layer outweighs it while XLA
    overlaps DMA across ops (e2e RTF 0.0545 vs 0.0467).  It stays opt-in
    via VOXTRAL_W8_PALLAS=1 for future re-evaluation.

    ``prefer_pallas=False`` forces the XLA path — required when the
    weights carry a mesh sharding (``pallas_call`` cannot be
    auto-partitioned by GSPMD; the XLA dot partitions from the parameter
    shardings).
    """
    codes, scale = w8["codes"], w8["scale"]
    xq, sx = _quantize_activations(x)

    import os

    rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    env = os.environ.get("VOXTRAL_W8_PALLAS", "auto")
    # "auto": Pallas only for huge-N decode matvecs (the 131k lm_head,
    # measured 759 vs 518 GB/s at M=1 — benches/kernel_bench.py); per-layer
    # matmuls stay on XLA (round-1 finding: per-call pipeline warm-up x 9
    # matmuls/layer loses e2e) — the megakernel covers those now.
    use_pallas = prefer_pallas and (env == "1" or (
        env == "auto" and rows <= 8 and codes.shape[0] >= 32768
        and jax.default_backend() == "tpu"
    ))
    if use_pallas and env != "0":
        from voxtral_tpu.ops.w8_pallas import (
            w8_matmul_pallas,
            w8_pallas_supported,
        )

        if w8_pallas_supported(xq, codes):
            return w8_matmul_pallas(xq, sx, codes, scale)

    z = jax.lax.dot_general(
        xq, codes,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Epilogue: per-row activation scale x per-column weight scale.
    return z.astype(jnp.float32) * sx * scale.astype(jnp.float32)


def w8_dequant_rows(w8: dict, rows: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Gather + dequantize rows (embedding lookups)."""
    codes = w8["codes"][rows]
    scale = w8["scale"][rows]
    return codes.astype(dtype) * scale[..., None].astype(dtype)
