"""ctypes bindings for the native C++ runtime components.

The shared library builds on first use (``ensure_built()``; plain g++ -O3,
no external deps).  All entry points have behavior-identical numpy
fallbacks in :mod:`voxtral_tpu.audio.mel` and :mod:`voxtral_tpu.ops.q4`;
callers use :func:`available` to pick the fast path.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger("voxtral_tpu.native")

_DIR = Path(__file__).parent
_SRC = _DIR / "voxtral_native.cpp"
_LIB = _DIR / "libvoxtral_native.so"

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def ensure_built(force: bool = False) -> bool:
    """Compile the shared library if needed; returns success."""
    global _build_failed
    if _LIB.exists() and not force:
        if _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return True
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", "-o", str(_LIB), str(_SRC),
            ],
            check=True, capture_output=True, text=True, timeout=120,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        stderr = getattr(e, "stderr", "")
        log.warning("native build failed (%s); using numpy fallbacks", stderr)
        _build_failed = True
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB.exists() and not ensure_built():
        return None
    lib = ctypes.CDLL(str(_LIB))

    i64, i32, f32 = ctypes.c_int64, ctypes.c_int32, ctypes.c_float
    fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")

    lib.voxtral_mel_compute_log.restype = i64
    lib.voxtral_mel_compute_log.argtypes = [
        fp, i64, fp, fp, fp, fp, i32, i32, i32, i32, f32, fp, i64,
    ]
    lib.voxtral_q4_repack_packed.restype = ctypes.c_int
    lib.voxtral_q4_repack_packed.argtypes = [u8p, i64, i64, u32p, u16p]
    lib.voxtral_q4_repack_int8.restype = ctypes.c_int
    lib.voxtral_q4_repack_int8.argtypes = [u8p, i64, i64, i8p, u16p]
    lib.voxtral_q4_dequant_f32.restype = ctypes.c_int
    lib.voxtral_q4_dequant_f32.argtypes = [u8p, i64, fp]

    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# High-level wrappers
# ---------------------------------------------------------------------------


import functools


@functools.lru_cache(maxsize=4)
def _dft_twiddles(n_fft: int, n_bins: int):
    t = np.arange(n_fft, dtype=np.float64)
    freqs = np.arange(n_bins, dtype=np.float64)
    angle = 2.0 * np.pi * np.outer(freqs, t) / n_fft
    return (
        np.ascontiguousarray(np.cos(angle), dtype=np.float32),
        np.ascontiguousarray(-np.sin(angle), dtype=np.float32),
    )


def mel_compute_log(
    samples: np.ndarray,
    window: np.ndarray,
    mel_basis: np.ndarray,
    n_fft: int = 400,
    hop: int = 160,
    log_mel_max: float = 1.5,
) -> np.ndarray:
    """Native log-mel; same contract as MelSpectrogram.compute_log."""
    lib = _load()
    assert lib is not None
    n_bins = n_fft // 2 + 1
    n_mels = mel_basis.shape[0]
    cos_t, sin_t = _dft_twiddles(n_fft, n_bins)

    samples = np.ascontiguousarray(samples, dtype=np.float32)
    max_frames = (len(samples) + 2 * (n_fft // 2) - n_fft) // hop + 1
    out = np.empty((max_frames, n_mels), dtype=np.float32)
    n_frames = lib.voxtral_mel_compute_log(
        samples, len(samples),
        np.ascontiguousarray(window, np.float32), cos_t, sin_t,
        np.ascontiguousarray(mel_basis, np.float32),
        n_fft, hop, n_bins, n_mels, log_mel_max, out, max_frames,
    )
    if n_frames < 0:
        raise RuntimeError("native mel: frame buffer overflow")
    return out[:n_frames]


def q4_repack_packed(raw: np.ndarray, n: int, k: int):
    """Raw Q4_0 -> (codes_packed i32 [K/8, N], scales_t bf16 [K/32, N])."""
    import ml_dtypes

    lib = _load()
    assert lib is not None
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    codes = np.empty((k // 8, n), dtype=np.uint32)
    scales = np.empty((k // 32, n), dtype=np.uint16)
    if lib.voxtral_q4_repack_packed(raw, n, k, codes, scales) != 0:
        raise ValueError(f"K={k} not a multiple of 32")
    return codes.view(np.int32), scales.view(ml_dtypes.bfloat16)


def q4_repack_int8(raw: np.ndarray, n: int, k: int):
    """Raw Q4_0 -> (codes int8 [N, K], scales f16 [N, K/32])."""
    lib = _load()
    assert lib is not None
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    codes = np.empty((n, k), dtype=np.int8)
    scales = np.empty((n, k // 32), dtype=np.uint16)
    if lib.voxtral_q4_repack_int8(raw, n, k, codes, scales) != 0:
        raise ValueError(f"K={k} not a multiple of 32")
    return codes, scales.view(np.float16)


def q4_dequant_f32(raw: np.ndarray, n_elements: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty(n_elements, dtype=np.float32)
    if lib.voxtral_q4_dequant_f32(raw, n_elements, out) != 0:
        raise ValueError("n_elements not a multiple of 32")
    return out
