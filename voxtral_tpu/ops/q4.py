"""Q4_0 quantized weights: repacking, dequant, and fused matmul.

GGUF Q4_0 on-disk format (reference ``/root/reference/src/gguf/reader.rs:42-48``,
``tensor.rs:88-113``): 18 bytes per block of 32 elements along the
innermost (K) axis — a little-endian f16 scale followed by 16 bytes of
packed nibbles; byte ``i`` holds element ``i`` in its low nibble and
element ``i+16`` in its high nibble; ``value = (nibble - 8) * scale``.

TPU-side representation (we own the repack; the on-disk format is
untouched): a pytree dict

    {"q4": {"codes": int8[N, K]  (values -8..7),
            "scales": bf16[N, K//32]}}

``N`` = out features, ``K`` = in features (PyTorch orientation — NOT
transposed like f32 linears, so ``y = x @ W^T`` contracts over the packed
axis).  int8 codes halve HBM traffic vs bf16 weights; the Pallas kernel
(``voxtral_tpu.ops.q4_pallas``) goes further with 2-nibble-per-byte packing.

The fused matmul has two strategies, mirroring the reference's dual-path
WGSL dispatch (op.rs:139-206):

* **decode** (few rows): exact blocked contraction
  ``y[.., n] = Σ_b scales[n, b] · (x[.., b·32:(b+1)·32] @ codes[n, b·32:..])``
  — never materializes the dequantized weight; XLA fuses the int8→f32
  upconvert into the dot so HBM reads stay at 1 byte/weight.
* **prefill** (many rows): dequantize tile-wise into the matmul
  (compute-bound regime; the MXU wants one big contraction).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Q4_BLOCK = 32
_BYTES_PER_BLOCK = 18

# Row threshold between the decode (blocked) and prefill (dequant) paths.
DECODE_MAX_ROWS = 8


# ---------------------------------------------------------------------------
# Host-side (numpy) packing / unpacking
# ---------------------------------------------------------------------------


def dequantize_q4_0(raw: bytes | np.ndarray, num_elements: int) -> np.ndarray:
    """Reference CPU dequant of raw Q4_0 bytes -> f32 (tensor.rs:88-113)."""
    raw = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, bytes) else raw
    n_blocks = num_elements // Q4_BLOCK
    blocks = raw[: n_blocks * _BYTES_PER_BLOCK].reshape(n_blocks, _BYTES_PER_BLOCK)
    scales = blocks[:, :2].copy().view(np.float16).astype(np.float32)  # [B, 1]
    packed = blocks[:, 2:]  # [B, 16]
    lo = (packed & 0x0F).astype(np.int8) - 8
    hi = ((packed >> 4) & 0x0F).astype(np.int8) - 8
    codes = np.concatenate([lo, hi], axis=1)  # [B, 32] in element order
    return (codes.astype(np.float32) * scales).reshape(-1)


def quantize_q4_0(values: np.ndarray) -> bytes:
    """Quantize f32 -> raw Q4_0 bytes (for tests; mirrors llama.cpp Q4_0)."""
    flat = np.asarray(values, dtype=np.float32).reshape(-1)
    assert flat.size % Q4_BLOCK == 0, "Q4_0 needs multiples of 32 elements"
    blocks = flat.reshape(-1, Q4_BLOCK)
    # llama.cpp: scale = max_abs_elem / -8 (signed; keeps the extreme exact).
    absmax_idx = np.argmax(np.abs(blocks), axis=1)
    maxval = blocks[np.arange(blocks.shape[0]), absmax_idx]
    d = maxval / -8.0
    d16 = d.astype(np.float16)
    d32 = d16.astype(np.float32)
    with np.errstate(divide="ignore"):
        inv_d = np.where(d32 != 0, np.divide(1.0, np.where(d32 != 0, d32, 1.0)), 0.0)
    q = np.clip(blocks * inv_d[:, None] + 8.5, 0.0, 15.0).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    packed = (lo | (hi << 4)).astype(np.uint8)
    out = np.empty((blocks.shape[0], _BYTES_PER_BLOCK), dtype=np.uint8)
    out[:, :2] = d16[:, None].view(np.uint8).reshape(-1, 2)
    out[:, 2:] = packed
    return out.tobytes()


def repack_q4_0(
    raw: bytes | np.ndarray, shape: tuple[int, int]
) -> dict[str, np.ndarray]:
    """Raw Q4_0 bytes -> {"codes": int8[N, K], "scales": f16[N, K//32]}.

    Scales stay in float16 — the exact on-disk representation (converting
    to bf16 would round them); kernels cast at use.
    ``shape`` = [N, K] (out, in) — already dim-reversed from GGUF order by
    the caller (gguf stores dims innermost-first, loader.rs:493-499).
    """
    n, k = shape
    assert k % Q4_BLOCK == 0, f"K={k} not a multiple of {Q4_BLOCK}"
    raw = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, bytes) else raw
    n_blocks = (n * k) // Q4_BLOCK
    blocks = raw[: n_blocks * _BYTES_PER_BLOCK].reshape(n_blocks, _BYTES_PER_BLOCK)

    scales = blocks[:, :2].copy().view(np.float16).reshape(n, k // Q4_BLOCK)
    packed = blocks[:, 2:]
    lo = (packed & 0x0F).astype(np.int8) - 8
    hi = ((packed >> 4) & 0x0F).astype(np.int8) - 8
    codes = np.concatenate([lo, hi], axis=1).reshape(n, k)
    return {"codes": codes, "scales": scales}


def quantize_to_q4_params(w: np.ndarray) -> dict[str, Any]:
    """f32 [N, K] -> {"q4": {...}} pytree leaf (tests / on-the-fly quant)."""
    raw = quantize_q4_0(w)
    return {"q4": repack_q4_0(raw, w.shape)}


# ---------------------------------------------------------------------------
# Device-side ops
# ---------------------------------------------------------------------------


def is_q4(w: Any) -> bool:
    return isinstance(w, dict) and "q4" in w


def q4_dequant_rows(q4: dict[str, jax.Array], rows: jax.Array, dtype=jnp.bfloat16):
    """Gather + dequantize rows of a Q4 matrix (embedding lookups).

    rows: int32 [...]; returns [..., K].  The reference needs a CPU-side
    lookup here to dodge WebGPU buffer limits (gguf/model.rs:584-618);
    on TPU the packed table lives in HBM and the gather runs on device.
    """
    if "codes_packed" in q4:
        from voxtral_tpu.ops.q4_pallas import q4_packed_dequant_rows

        return q4_packed_dequant_rows(q4, rows, dtype)
    codes = q4["codes"][rows]  # [..., K] int8
    scales = q4["scales"][rows]  # [..., K//32]
    k = codes.shape[-1]
    deq = codes.astype(dtype) * jnp.repeat(scales.astype(dtype), Q4_BLOCK, axis=-1)
    return deq.reshape(*codes.shape[:-1], k)


def _q4_matmul_blocked(x: jax.Array, codes: jax.Array, scales: jax.Array):
    """Decode path: exact blocked contraction, no weight materialization.

    x: [..., K]; codes: [N, K] int8; scales: [N, K//32].
    """
    n, k = codes.shape
    nb = k // Q4_BLOCK
    xb = x.reshape(*x.shape[:-1], nb, Q4_BLOCK)
    cb = codes.reshape(n, nb, Q4_BLOCK)
    # Per-block partial dots in f32, then scale and reduce over blocks.
    z = jnp.einsum(
        "...bk,nbk->...nb",
        xb.astype(jnp.bfloat16),
        cb.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum(
        "...nb,nb->...n", z, scales.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


def q4g_matmul_a8(x: jax.Array, codes: jax.Array, scales: jax.Array):
    """XLA reference of the stack kernel's g32 (exact-Q4_0 W, A8) math.

    Per-row dynamic int8 activation quantization (the W8A8 path's
    ``_quant`` formula), int32 group dots, f16-exact group scales in the
    f32 epilogue — the fused kernel's ``_g32_matmul_tile`` computes the
    same sums (tile/group association differences only).  Used by tests
    and as the decode-path XLA fallback reference.

    x: [..., K] float; codes: [N, K] int8 (nibble - 8); scales:
    [N, K//32] f16 (the on-disk Q4_0 block scales,
    /root/reference/src/gguf/tensor.rs:88-113).
    """
    n, k = codes.shape
    nb = k // Q4_BLOCK
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    z = jnp.einsum(
        "...bk,nbk->...nb",
        xq.reshape(*x.shape[:-1], nb, Q4_BLOCK),
        codes.reshape(n, nb, Q4_BLOCK),
        preferred_element_type=jnp.int32,
    )
    y = jnp.einsum(
        "...nb,nb->...n", z.astype(jnp.float32),
        scales.astype(jnp.float32), preferred_element_type=jnp.float32,
    )
    return y * sx


def _q4_matmul_dequant(x: jax.Array, codes: jax.Array, scales: jax.Array):
    """Prefill path: dequantize into one big MXU contraction."""
    n, k = codes.shape
    w = codes.astype(jnp.bfloat16) * jnp.repeat(
        scales.astype(jnp.bfloat16), Q4_BLOCK, axis=-1
    )
    return jnp.einsum(
        "...k,nk->...n", x.astype(jnp.bfloat16), w,
        preferred_element_type=jnp.float32,
    )


def q4_matmul(x: jax.Array, q4: dict[str, jax.Array], prefer_pallas: bool = True):
    """y = x @ W_q4^T with in-flight dequant.  x: [..., K] -> [..., N].

    Dispatches decode vs prefill on the static row count, like the
    reference's dual WGSL kernels (op.rs:139-206).  Uses the Pallas int4
    kernel when packed codes are present and the shape qualifies.
    """
    rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1

    if "codes_packed" in q4:
        from voxtral_tpu.ops.q4_pallas import (
            pallas_supported,
            q4_matmul_pallas,
            q4_packed_dequant_full,
        )

        # The Pallas kernel re-dequantizes per call; for prefill (many
        # rows) a single XLA dequant feeding one big MXU contraction wins
        # — the same decode/prefill dispatch as the reference's dual WGSL
        # kernels (op.rs:139-206).
        if prefer_pallas and rows <= DECODE_MAX_ROWS and pallas_supported(x, q4):
            return q4_matmul_pallas(x, q4)
        w = q4_packed_dequant_full(q4)
        return jnp.einsum(
            "...k,nk->...n", x.astype(jnp.bfloat16), w,
            preferred_element_type=jnp.float32,
        )

    codes, scales = q4["codes"], q4["scales"]
    if rows <= DECODE_MAX_ROWS:
        return _q4_matmul_blocked(x, codes, scales)
    return _q4_matmul_dequant(x, codes, scales)
