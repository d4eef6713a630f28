"""Native C++ component tests: build, then verify bit/tolerance equivalence
with the numpy reference implementations."""

import numpy as np
import pytest

from voxtral_tpu import native

pytestmark = pytest.mark.skipif(
    not native.ensure_built(), reason="no C++ toolchain available"
)


def test_native_mel_matches_numpy():
    from voxtral_tpu.audio.mel import MelSpectrogram

    mel = MelSpectrogram.voxtral()
    rng = np.random.default_rng(0)
    samples = rng.normal(size=48000).astype(np.float32) * 0.3

    ref = mel.compute_log(samples)
    got = native.mel_compute_log(
        samples, mel.window, mel.mel_basis,
        n_fft=400, hop=160, log_mel_max=1.5,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4)


def test_native_mel_short_input_reflect_edges():
    from voxtral_tpu.audio.mel import MelSpectrogram

    mel = MelSpectrogram.voxtral()
    samples = np.sin(np.arange(1200) * 0.05).astype(np.float32)
    ref = mel.compute_log(samples)
    got = native.mel_compute_log(samples, mel.window, mel.mel_basis)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4)


def test_native_q4_repack_packed_matches_numpy():
    from voxtral_tpu.ops.q4 import quantize_q4_0, repack_q4_0
    from voxtral_tpu.ops.q4_pallas import pack_codes, transpose_scales

    rng = np.random.default_rng(1)
    n, k = 64, 256
    w = rng.normal(size=(n, k)).astype(np.float32)
    raw = np.frombuffer(quantize_q4_0(w), dtype=np.uint8)

    ref = repack_q4_0(raw, (n, k))
    ref_packed = pack_codes(ref["codes"])
    ref_scales = transpose_scales(ref["scales"])

    got_packed, got_scales = native.q4_repack_packed(raw, n, k)
    np.testing.assert_array_equal(got_packed, ref_packed)
    np.testing.assert_array_equal(
        got_scales.view(np.uint16), ref_scales.view(np.uint16)
    )


def test_native_q4_repack_int8_matches_numpy():
    from voxtral_tpu.ops.q4 import quantize_q4_0, repack_q4_0

    rng = np.random.default_rng(2)
    n, k = 48, 96
    w = rng.normal(size=(n, k)).astype(np.float32)
    raw = np.frombuffer(quantize_q4_0(w), dtype=np.uint8)

    ref = repack_q4_0(raw, (n, k))
    codes, scales = native.q4_repack_int8(raw, n, k)
    np.testing.assert_array_equal(codes, ref["codes"])
    np.testing.assert_array_equal(scales, ref["scales"])


def test_native_q4_dequant_matches_numpy():
    from voxtral_tpu.ops.q4 import dequantize_q4_0, quantize_q4_0

    rng = np.random.default_rng(3)
    w = rng.normal(size=2048).astype(np.float32)
    raw = np.frombuffer(quantize_q4_0(w), dtype=np.uint8)
    ref = dequantize_q4_0(raw, 2048)
    got = native.q4_dequant_f32(raw, 2048)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-7)


def test_f16_edge_cases_via_dequant():
    """Subnormal/zero f16 scales must convert exactly."""
    from voxtral_tpu.ops.q4 import dequantize_q4_0

    # Hand-build blocks with special scales.
    for scale_bits in [0x0000, 0x0001, 0x03FF, 0x0400, 0x7BFF, 0x8001]:
        block = np.zeros(18, dtype=np.uint8)
        block[0] = scale_bits & 0xFF
        block[1] = scale_bits >> 8
        block[2:] = 0xA7  # arbitrary nibbles
        ref = dequantize_q4_0(block.tobytes(), 32)
        got = native.q4_dequant_f32(block, 32)
        np.testing.assert_allclose(got, ref, rtol=0, atol=0)
