"""Sinusoidal time embedding encoding the transcription delay.

Mirrors the reference (``/root/reference/src/models/time_embedding.rs``):
``[cos(t * f) ‖ sin(t * f)]`` with ``f_i = exp(-ln(theta) * i / (dim/2))``,
θ = 10000, t = number of delay tokens (default 6 → 480 ms).
"""

from __future__ import annotations

import numpy as np


def time_embedding(t: float, dim: int, theta: float = 10000.0) -> np.ndarray:
    """Returns [1, 1, dim] float32: [cos(t*inv_freq) ‖ sin(t*inv_freq)]."""
    half = dim // 2
    inv_freq = np.exp(-np.log(theta) * np.arange(half, dtype=np.float64) / half)
    angle = t * inv_freq
    emb = np.concatenate([np.cos(angle), np.sin(angle)]).astype(np.float32)
    return emb.reshape(1, 1, dim)
