"""TPU compute kernels: Q4_0 quantized matmul (XLA + Pallas paths)."""

from voxtral_tpu.ops.q4 import (
    Q4_BLOCK,
    dequantize_q4_0,
    q4_dequant_rows,
    q4_matmul,
    quantize_q4_0,
    repack_q4_0,
)

__all__ = [
    "Q4_BLOCK",
    "dequantize_q4_0",
    "q4_dequant_rows",
    "q4_matmul",
    "quantize_q4_0",
    "repack_q4_0",
]
