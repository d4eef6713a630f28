"""Audio-language adapter + encoder-output reshape.

Mirrors the reference (``/root/reference/src/models/adapter.rs``):
``reshape_encoder_output`` truncates the sequence to a multiple of the
reshape factor (4) and concatenates adjacent frames
([B,S,D] -> [B,S/4,4D]); the adapter is
Linear(5120->3072) -> GELU -> Linear(3072->3072), no biases.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from voxtral_tpu.models.layers import gelu, linear

Params = dict[str, Any]


def reshape_encoder_output(x: jax.Array, factor: int = 4) -> jax.Array:
    """[B, S, D] -> [B, S//factor, D*factor], truncating trailing frames."""
    b, s, d = x.shape
    new_s = s // factor
    x = x[:, : new_s * factor, :]
    return x.reshape(b, new_s, d * factor)


def adapter_forward(params: Params, x: jax.Array) -> jax.Array:
    """Linear -> GELU -> Linear (adapter.rs:89-93)."""
    x = linear(x, params["w1"])
    x = gelu(x)
    return linear(x, params["w2"])


def init_adapter_params(
    key: jax.Array, in_dim: int, hidden_dim: int, out_dim: int, dtype=jnp.bfloat16
) -> Params:
    k1, k2 = jax.random.split(key)
    init = lambda kk, *shape: (
        jax.random.normal(kk, shape, dtype=jnp.float32) * 0.02
    ).astype(dtype)
    return {"w1": init(k1, in_dim, hidden_dim), "w2": init(k2, hidden_dim, out_dim)}
