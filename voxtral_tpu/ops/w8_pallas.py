"""Pallas TPU kernel for the W8A8 matmul (int8 MXU + fused f32 epilogue).

Replaces ``jax.lax.dot_general`` on the decode hot path: Pallas's
automatic block pipelining double-buffers the weight-tile DMA, measured
~35% higher effective HBM bandwidth than XLA's int8 dot in the
layer-streaming decode pattern (248 vs 183 GB/s at [8,3072]x[3072,9216]).

The kernel contracts int8 activations against int8 weight tiles on the
MXU (exact int32 accumulation) and applies the per-row activation scale x
per-column weight scale epilogue in f32 before writing the output tile —
one pass, no int32 intermediate in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w8_kernel(x_ref, sx_ref, w_ref, scale_ref, o_ref):
    z = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),  # contract K with K
        preferred_element_type=jnp.int32,
    )  # [TM, TN]
    o_ref[:] = z.astype(jnp.float32) * sx_ref[:] * scale_ref[:]


def _tile_n(k: int, n: int) -> int:
    # Weight tile [TN, K] int8 (x2 pipeline buffers) within VMEM budget.
    tn = 512 if k <= 4096 else 256
    while n % tn != 0:
        tn //= 2
    return tn


@functools.partial(jax.jit, static_argnames=("interpret",))
def _w8_matmul_2d(xq, sx, codes, scale, interpret=False):
    """xq [M, K] i8, sx [M, 1] f32, codes [N, K] i8, scale [N] f32
    -> [M, N] f32."""
    m, k = xq.shape
    n = codes.shape[0]
    tn = _tile_n(k, n)
    tm = min(256, max(8, m))
    scale2d = scale.astype(jnp.float32).reshape(1, n)

    return pl.pallas_call(
        _w8_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(m, tm), n // tn),
            in_specs=[
                pl.BlockSpec((tm, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, k), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=n * k + m * k + m * n * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xq, sx, codes, scale2d)


def w8_pallas_supported(xq: jax.Array, codes: jax.Array) -> bool:
    n, k = codes.shape[-2], codes.shape[-1]
    return k % 256 == 0 and n % 128 == 0


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def w8_matmul_pallas(xq, sx, codes, scale) -> jax.Array:
    """xq [..., K] i8 (+ sx [..., 1] f32) @ codes [N, K] -> [..., N] f32."""
    lead = xq.shape[:-1]
    k = xq.shape[-1]
    y = _w8_matmul_2d(
        xq.reshape(-1, k),
        sx.reshape(-1, 1).astype(jnp.float32),
        codes,
        scale,
        interpret=_use_interpret(),
    )
    return y.reshape(*lead, y.shape[-1])
