"""Pallas TPU kernel: fused Q4_0 dequant + matmul.

TPU-native replacement for the reference's WGSL shaders
(``/root/reference/src/gguf/shader.wgsl`` tiled / ``shader_naive.wgsl`` —
op.rs:79-206): dequantize int4 blocks in registers, never materializing the
full-precision weight in HBM.

Layout (we own the repack — ops/q4.py; the on-disk GGUF is untouched):

* ``codes_packed`` int32 ``[K/8, N]`` — transposed weight; lane (i, n)
  packs elements k = 8i..8i+7 as nibbles (c+8) << 4j, j = k - 8i.
* ``scales_t`` bfloat16 ``[K/32, N]`` — transposed groupwise scales
  (bf16 because Mosaic has no f16; one rounding at repack, <=0.4%).

Kernel strategy — **plane decomposition, zero relayouts**:

    y = x @ W^T,  W[n, k] = (c[n, k] - 8) * s[n, k//32]

split k by position within the packed word: k = 8i + j.  For each j,
``plane_j = (packed >> 4j) & 0xF`` is a pure LANEWISE op on the natural
``[K/8, TN]`` i32 tile (no sublane shuffles — this is the whole point;
widening u8->i32 or interleaving nibble planes back into ``[K, TN]``
costs Mosaic a relayout per step and dominated the v1 kernel).  Then

    y = sum_j  xp_j @ (plane_j * s4)  -  (8 * xb) @ scales_t

where ``xp_j = x[:, j::8]`` (tiny, precomputed outside), ``s4`` is the
scale tile broadcast x4 along the major axis (cheap), and the second term
— the exact contribution of the constant ``-8`` offset — collapses into
ONE small dot against the per-block sums of x (``xb[m, b] = sum x-block``).
~4 lanewise VPU ops per weight, 8+1 MXU dots per tile, HBM traffic
0.56 byte/weight.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------


def pack_codes(codes: np.ndarray) -> np.ndarray:
    """int8 codes [N, K] (-8..7) -> transposed packed int32 [K/8, N].

    Word (i, n) = sum_j (codes[n, 8i+j] + 8) << (4*j).
    """
    n, k = codes.shape
    assert k % 8 == 0
    c = (codes.astype(np.int64) + 8).T.reshape(k // 8, 8, n)  # [K/8, 8, N]
    shifts = (4 * np.arange(8, dtype=np.int64))[None, :, None]
    words = np.sum(c << shifts, axis=1)
    return words.astype(np.uint32).view(np.int32)


def unpack_codes(packed: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pack_codes` -> int8 [N, K]."""
    k8, n = packed.shape
    u = packed.view(np.uint32).astype(np.int64)  # [K/8, N]
    planes = [((u >> (4 * j)) & 0xF) - 8 for j in range(8)]
    out = np.stack(planes, axis=1).reshape(8 * k8, n)  # [K, N]
    return out.T.astype(np.int8).copy()


def transpose_scales(scales: np.ndarray) -> np.ndarray:
    """[N, K/32] f16 -> [K/32, N] bf16.

    Mosaic has no f16 support in VMEM, so the packed format carries bf16
    scales (one round-to-nearest at repack; <=0.4% relative, far below the
    int4 quantization noise and on par with bf16 activation rounding).
    """
    import ml_dtypes

    return np.ascontiguousarray(scales.T.astype(ml_dtypes.bfloat16))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _q4_matmul_kernel(
    xp_ref, xb8_ref, packed_ref, scales_ref, o_ref, *, k: int, tn: int
):
    k8, k32 = k // 8, k // 32
    s_small = scales_ref[:]  # [K/32, TN] bf16

    # Exact -8 offset correction: (8*xb) @ s_small.
    acc = -jnp.dot(
        xb8_ref[:], s_small.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )

    p = packed_ref[:]  # [K/8, TN] int32
    # Nibble planes, concatenated along the SUBLANE axis (contiguous
    # blocks — no interleave relayout).  xp outside is permuted to match.
    planes = [((p >> (4 * j)) & 0xF) for j in range(8)]
    w = jnp.concatenate(planes, axis=0).astype(jnp.bfloat16)  # [K, TN]
    # One scale tile covers 4 packed words; the same s4 applies to every
    # plane block: broadcast [K/32, TN] -> [8, K/8, TN] -> [K, TN].
    s4 = jnp.broadcast_to(s_small[:, None, :], (k32, 4, tn)).reshape(k8, tn)
    s_cat = jnp.broadcast_to(s4[None, :, :], (8, k8, tn)).reshape(k, tn)

    acc += jnp.dot(
        xp_ref[:], w * s_cat, preferred_element_type=jnp.float32
    )
    o_ref[:] = acc.astype(o_ref.dtype)


def _tile_n(k: int, n: int) -> int:
    # Keep per-tile VMEM (packed i32 + f32 plane/scale temps, ~2.5 bytes
    # per weight-in-tile) comfortably under the scoped limit, and divide
    # N exactly (the support gate guarantees n % 128 == 0).
    tn = 128 if k > 5120 else 256
    while n % tn != 0:
        tn //= 2
    return tn


@functools.partial(jax.jit, static_argnames=("interpret",))
def _q4_matmul_2d(x, packed, scales_t, interpret=False):
    """x [M, K] @ deq(packed [K/8, N], scales_t [K/32, N]) -> [M, N] f32."""
    m, k = x.shape
    n = packed.shape[1]
    tn = _tile_n(k, n)
    tm = min(256, max(8, m))

    xf = x.astype(jnp.float32)
    # Plane-permuted x: column order (plane j major, word i minor) matches
    # the kernel's sublane-concatenated weight tile.
    xp = (
        jnp.transpose(xf.reshape(m, k // 8, 8), (0, 2, 1))
        .reshape(m, k)
        .astype(jnp.bfloat16)
    )
    # Per-block sums, pre-scaled by 8 (for the offset correction).
    xb8 = (xf.reshape(m, k // 32, 32).sum(axis=-1) * 8.0).astype(jnp.float32)

    grid = (pl.cdiv(m, tm), n // tn)
    kernel = functools.partial(_q4_matmul_kernel, k=k, tn=tn)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, k // 32), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k // 8, tn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k // 32, tn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(k // 2) * n + (k // 32) * n * 2 + m * k * 2 + m * n * 4,
            transcendentals=0,
        ),
        # f32 plane/scale temps push the scoped stack past the 16 MB
        # default; v5e has 128 MB of VMEM — allow up to 64 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, xb8, packed, scales_t)


def pallas_supported(x, q4) -> bool:
    """Shape gate for the kernel (tiny ADA matmuls fall back to XLA)."""
    if "codes_packed" not in q4:
        return False
    k8, n = q4["codes_packed"].shape
    k = 8 * k8
    return k % 256 == 0 and n % 128 == 0 and x.shape[-1] == k


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def q4_matmul_pallas(x: jax.Array, q4: dict) -> jax.Array:
    """y = x @ W^T for packed Q4 weights; x [..., K] -> [..., N] f32."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    y = _q4_matmul_2d(
        x2, q4["codes_packed"], q4["scales_t"], interpret=_use_interpret()
    )
    return y.reshape(*lead, y.shape[-1])


# ---------------------------------------------------------------------------
# Packed-format helpers for XLA-side consumers (embedding gather, fallback)
# ---------------------------------------------------------------------------


def _unpack_planes(packed: jax.Array) -> jax.Array:
    """int32 [K/8, ...] -> codes [K, ...] (int32, -8..7) via plane stack."""
    k8 = packed.shape[0]
    planes = [((packed >> (4 * j)) & 0xF) - 8 for j in range(8)]
    return jnp.stack(planes, axis=1).reshape(8 * k8, *packed.shape[1:])


def q4_packed_dequant_rows(q4: dict, rows: jax.Array, dtype=jnp.bfloat16):
    """Gather + dequant rows (along N) of a packed table -> [..., K]."""
    packed = q4["codes_packed"][:, rows]  # [K/8, ...]
    scales = q4["scales_t"][:, rows]  # [K/32, ...]
    codes = _unpack_planes(packed)  # [K, ...]
    scales_full = jnp.repeat(scales, 32, axis=0)
    deq = codes.astype(dtype) * scales_full.astype(dtype)  # [K, ...]
    return jnp.moveaxis(deq, 0, -1)


def q4_packed_dequant_full(q4: dict, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the dequantized weight [N, K] (XLA fallback path)."""
    codes = _unpack_planes(q4["codes_packed"])  # [K, N]
    scales_full = jnp.repeat(q4["scales_t"].astype(dtype), 32, axis=0)
    return (codes.astype(dtype) * scales_full).T  # [N, K]
