"""Prototype: group-32-scaled int8 matmul inside a Pallas TPU kernel.

Validates the Mosaic-risky pieces of the planned exact-Q4_0 stack-kernel
mode (VERDICT r4 #1b) before touching the production kernel.

Variant C (the one that fits Mosaic's layout rules — straight 32-wide
group reshapes are "unsupported shape cast"): keep the lane dim at 128.
K splits into SB = K/128 superblocks (batch dim of the dot); each
superblock holds 4 scale groups (r = 0..3, lanes r*32..r*32+31).  Four
batched dots with lane-masked activations separate the groups:

  P_r[sb, b, n] = sum_{j<128} xm_r[sb, b, j] * c[sb, n, j]
  y[b, n] = sx[b] * sum_r sum_sb d_r[sb, n] * P_r[sb, b, n]

Mosaic pieces exercised:
  P1. f32 reshape [B, K] -> [B, SB, 128] (lane split keeping lane=128)
  P2. f32 transpose [B, SB, 128] -> [SB, B, 128], int8 cast in 3D
  P3. batched dot ((0,),(0,)): [SB,B,128] x [SB,t,128] -> [SB,B,t] int32
  P4. lane-iota masking of activations per group phase r
  P5. epilogue [SB,B,t] * [SB,1,t] broadcast + sum over the major axis
  P6. 4D async-copy slices codes [SB, N, 128] -> [SB, t, 128], scales
      [4*SB, 1, N] -> [4*SB, 1, t]

Usage:  python wer_eval_work/r05/proto_g32.py [--tpu]
"""

import argparse

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--tpu", action="store_true")
args = p.parse_args()

if not args.tpu:
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, K, T = 4, 1024, 3072, 512
SB = K // 128
G = K // 32
INTERPRET = not args.tpu


def kernel_g32(x_ref, codes_hbm, scales_hbm, y_ref, cbuf, sbuf, sem):
    x = x_ref[:].astype(jnp.float32)  # [B, K]
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    # Quantize in 2D (broadcast [B,1] against [B,K]), reshape/transpose in
    # f32 (int8 shape casts are unsupported), cast to int8 in 3D.
    xqf = jnp.clip(jnp.round(x / sx), -127, 127)  # f32 codes [B, K]
    x3 = xqf.reshape(B, SB, 128)                   # P1
    x3t = jnp.transpose(x3, (1, 0, 2))             # P2 -> [SB, B, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (SB, B, 128), 2)
    xm = [
        jnp.where((lane // 32) == r, x3t, 0.0).astype(jnp.int8)  # P4
        for r in range(4)
    ]

    n_tiles = N // T

    def dma(j, slot):
        return (
            pltpu.make_async_copy(
                codes_hbm.at[:, pl.ds(j * T, T), :], cbuf.at[slot],
                sem.at[0, slot]),
            pltpu.make_async_copy(
                scales_hbm.at[:, :, pl.ds(j * T, T)], sbuf.at[slot],
                sem.at[1, slot]),
        )

    for cp in dma(0, 0):
        cp.start()
    outs = []
    for j in range(n_tiles):
        if j + 1 < n_tiles:
            for cp in dma(j + 1, (j + 1) % 2):
                cp.start()
        for cp in dma(j, j % 2):
            cp.wait()
        acc = jnp.zeros((B, T), jnp.float32)
        for r in range(4):
            z = jax.lax.dot_general(
                xm[r], cbuf[j % 2],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # P3 -> [SB, B, T]
            st = sbuf[j % 2][r * SB:(r + 1) * SB]  # [SB, 1, T] f32
            acc = acc + jnp.sum(z.astype(jnp.float32) * st, axis=0)  # P5
        outs.append(acc * sx)
    y_ref[:] = jnp.concatenate(outs, axis=-1)


def run():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, K)).astype(np.float32)
    codes = rng.integers(-8, 8, size=(N, K), dtype=np.int8)
    scales = (rng.standard_normal((N, G)).astype(np.float16).astype(np.float32)
              * 0.01)
    # HBM layouts: codes [SB, N, 128]; scales r-major [4*SB, 1, N] with
    # row r*SB + sb = d[:, 4*sb + r].
    codes_g = np.ascontiguousarray(
        codes.reshape(N, SB, 128).transpose(1, 0, 2))
    s4 = scales.T.reshape(SB, 4, N)           # [sb, r, n]
    scales_g = np.ascontiguousarray(
        s4.transpose(1, 0, 2).reshape(4 * SB, 1, N))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SB, T, 128), jnp.int8),
            pltpu.VMEM((2, 4 * SB, 1, T), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    fn = pl.pallas_call(
        kernel_g32,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=INTERPRET,
    )
    y = jax.jit(fn)(jnp.asarray(x), jnp.asarray(codes_g),
                    jnp.asarray(scales_g))
    y = np.asarray(y)

    # Reference: same A8 quantization, exact group-scale math in f64.
    absmax = np.abs(x).max(axis=-1, keepdims=True)
    sx = np.maximum(absmax, 1e-8) / 127.0
    xq = np.clip(np.rint(x / sx), -127, 127).astype(np.int8)
    p_ref = np.einsum(
        "bgj,ngj->bng", xq.reshape(B, G, 32).astype(np.int64),
        codes.reshape(N, G, 32).astype(np.int64))
    y_ref = (p_ref.astype(np.float64) * scales.astype(np.float64)[None]
             ).sum(-1) * sx
    err = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    print(f"variant=C interpret={INTERPRET} max rel err = {err:.3e}")
    assert err < 1e-5, "MISMATCH"
    print("OK")


run()
