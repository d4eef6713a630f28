"""Audio frontend tests, ported from reference mel.rs/pad.rs/chunk.rs/io.rs tests.

The STFT path is additionally golden-tested against torch.stft (the
reference validates against torch/vLLM fixtures; we compute the same
reference in-process with the CPU torch that ships in this image).
"""

import numpy as np
import pytest

from voxtral_tpu.audio import (
    AudioBuffer,
    ChunkConfig,
    MelConfig,
    MelSpectrogram,
    PadConfig,
    chunk_audio,
    load_wav,
    needs_chunking,
    num_audio_tokens,
    num_chunks,
    pad_audio,
    save_wav,
)
from voxtral_tpu.audio.mel import hann_window_periodic, hz_to_mel, mel_to_hz


# -- mel config ---------------------------------------------------------------


def test_mel_config_voxtral():
    c = MelConfig.voxtral()
    assert c.sample_rate == 16000
    assert c.n_fft == 400
    assert c.hop_length == 160
    assert c.n_mels == 128
    assert abs(c.log_mel_max - 1.5) < 1e-6


def test_mel_spectrogram_creation():
    mel = MelSpectrogram.voxtral()
    assert mel.mel_basis.shape == (128, 201)  # n_fft/2 + 1


def test_hann_window_periodic():
    w4 = hann_window_periodic(4)
    assert np.allclose(w4, [0.0, 0.5, 1.0, 0.5], atol=1e-6)
    w400 = hann_window_periodic(400)
    # torch.hann_window(400, periodic=True)[1] = 6.1690807e-05
    assert abs(w400[1] - 6.1690807e-05) < 1e-8


def test_hz_mel_roundtrip():
    for hz, tol in [(100.0, 1.0), (1000.0, 1.0), (8000.0, 10.0)]:
        assert abs(float(mel_to_hz(hz_to_mel(hz))) - hz) < tol


def test_compute_mel_silence():
    mel = MelSpectrogram.voxtral()
    result = mel.compute(np.zeros(16000, dtype=np.float32))
    assert result.shape[1] == 128
    assert np.all(result < 1e-6)


def test_compute_log_mel_range():
    mel = MelSpectrogram.voxtral()
    t = np.arange(16000) / 16000.0
    samples = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    result = mel.compute_log(samples)
    assert result.size > 0
    # Unclamped vLLM normalization stays in roughly [-2, 3].
    assert result.min() >= -2.0 and result.max() <= 3.0
    # Silence floor maps to ((1.5 - 8) + 4) / 4 = -0.625.
    silence = mel.compute_log(np.zeros(16000, dtype=np.float32))
    assert np.allclose(silence, -0.625, atol=1e-6)


def test_num_frames():
    mel = MelSpectrogram.voxtral()
    # 1 s at 16 kHz -> ~100 frames (dropping the last torch frame).
    assert 99 <= mel.num_frames(16000) <= 101
    # num_frames must agree with the actual computation.
    for n in [16000, 16001, 255168, 1280 * 5]:
        samples = np.random.default_rng(0).normal(size=n).astype(np.float32)
        assert mel.compute(samples).shape[0] == mel.num_frames(n)


def test_stft_matches_torch():
    """Power spectrogram must match torch.stft center=True minus last frame."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(42)
    samples = rng.normal(size=16000).astype(np.float32)

    mel = MelSpectrogram.voxtral()
    ours = mel.stft_power(samples)

    window = torch.hann_window(400, periodic=True)
    ref = torch.stft(
        torch.from_numpy(samples),
        n_fft=400,
        hop_length=160,
        window=window,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )  # [freq, frames]
    ref_power = (ref.abs() ** 2).numpy().T[:-1]  # drop last frame

    assert ours.shape == ref_power.shape
    np.testing.assert_allclose(ours, ref_power, rtol=1e-4, atol=1e-4)


def test_jax_mel_matches_numpy():
    rng = np.random.default_rng(7)
    samples = rng.normal(size=32000).astype(np.float32) * 0.3
    mel = MelSpectrogram.voxtral()
    ours_np = mel.compute_log(samples)
    ours_jax = np.asarray(mel.compute_log_jax(samples))
    np.testing.assert_allclose(ours_np, ours_jax, rtol=1e-3, atol=2e-4)


# -- padding ------------------------------------------------------------------


def test_pad_config_defaults():
    c = PadConfig.voxtral()
    assert c.sample_rate == 16000
    assert c.n_left_pad_tokens == 76
    assert abs(c.frame_rate - 12.5) < 1e-9
    assert c.samples_per_token() == 1280
    assert c.left_pad_samples() == 76 * 1280


def test_right_pad_alignment():
    c = PadConfig.voxtral()
    extra = 17 * 1280
    assert c.right_pad_samples(1280 * 10) == extra
    assert c.right_pad_samples(1280 * 10 + 100) == 1180 + extra
    assert c.right_pad_samples(1280 * 10 + 1) == 1279 + extra


def test_pad_audio():
    c = PadConfig.voxtral()
    audio = AudioBuffer(np.full(255168, 0.5, dtype=np.float32), 16000)
    padded = pad_audio(audio, c)
    left = c.left_pad_samples()
    assert left == 97280
    assert np.all(padded.samples[:left] == 0.0)
    assert padded.samples[left] == 0.5
    assert np.all(padded.samples[left : left + 255168] == 0.5)
    assert np.all(padded.samples[left + 255168 :] == 0.0)
    assert len(padded.samples) % c.samples_per_token() == 0
    # 97280 + 255168 + 832 (align) + 21760 (17 extra) = 375040 = 293 tokens
    assert len(padded.samples) == 375040
    assert num_audio_tokens(len(padded.samples), c) == 293


# -- chunking -----------------------------------------------------------------


def test_chunk_config():
    c = ChunkConfig.voxtral()
    assert c.max_mel_frames == 1500
    assert c.max_samples_per_chunk() == 240000
    assert abs(c.max_duration_secs() - 15.0) < 1e-6
    assert c.with_max_frames(1200).max_samples_per_chunk() == 192000


def test_chunking_short_audio_single_chunk():
    c = ChunkConfig.voxtral()
    samples = np.zeros(1000, dtype=np.float32)
    assert not needs_chunking(len(samples), c)
    chunks = chunk_audio(samples, c)
    assert len(chunks) == 1
    assert chunks[0].is_last
    assert chunks[0].start_sample == 0
    assert chunks[0].end_sample == 1000


def test_chunking_long_audio():
    c = ChunkConfig.voxtral()
    n = 500000  # > 2 chunks of 240000
    samples = np.arange(n, dtype=np.float32)
    assert needs_chunking(n, c)
    chunks = chunk_audio(samples, c)
    assert len(chunks) == num_chunks(n, c) == 3
    assert chunks[0].end_sample == 240000
    assert chunks[1].start_sample == 240000
    assert chunks[2].is_last and not chunks[0].is_last
    # Chunks tile the input exactly with no overlap.
    reassembled = np.concatenate([ch.samples for ch in chunks])
    np.testing.assert_array_equal(reassembled, samples)


def test_chunking_with_overlap():
    c = ChunkConfig.voxtral().with_overlap(100)
    assert c.step_samples() == (1500 - 100) * 160
    chunks = chunk_audio(np.zeros(500000, dtype=np.float32), c)
    assert chunks[1].start_sample == c.step_samples()


# -- io -----------------------------------------------------------------------


def test_wav_roundtrip(tmp_path):
    t = np.arange(16000) / 16000.0
    samples = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    buf = AudioBuffer(samples, 16000)
    path = tmp_path / "test.wav"
    save_wav(buf, path)
    loaded = load_wav(path)
    assert loaded.sample_rate == 16000
    assert len(loaded.samples) == 16000
    np.testing.assert_allclose(loaded.samples, samples, atol=1e-3)


def test_peak_normalize():
    buf = AudioBuffer(np.array([0.1, -0.2, 0.05], dtype=np.float32), 16000)
    buf.peak_normalize(0.95)
    assert abs(np.max(np.abs(buf.samples)) - 0.95) < 1e-6
    # Silence is untouched.
    silent = AudioBuffer(np.zeros(10, dtype=np.float32), 16000)
    silent.peak_normalize(0.95)
    assert np.all(silent.samples == 0.0)


def test_resample():
    from voxtral_tpu.audio import resample_to_16k

    t = np.arange(48000) / 48000.0
    buf = AudioBuffer(np.sin(2 * np.pi * 440 * t).astype(np.float32), 48000)
    out = resample_to_16k(buf)
    assert out.sample_rate == 16000
    assert abs(len(out.samples) - 16000) <= 2
    # Same-rate input is passed through untouched.
    buf16 = AudioBuffer(np.zeros(100, dtype=np.float32), 16000)
    assert resample_to_16k(buf16) is buf16


def _mel_db(samples: np.ndarray) -> np.ndarray:
    """Log-mel features for resampler-parity comparison."""
    from voxtral_tpu.audio import MelSpectrogram

    return np.asarray(MelSpectrogram.voxtral().compute_log(samples))


@pytest.mark.parametrize("kind", ["chirp", "speech_noise"])
@pytest.mark.parametrize("src_rate", [44100, 48000, 22050])
def test_resampler_parity_vs_fft(src_rate, kind):
    """Polyphase resampler vs a high-quality FFT reference on a chirp.

    The reference uses rubato's FFT resampler (src/audio/resample.rs:11-30);
    ours is scipy polyphase.  WER silently eats frontend drift (the
    reference's peak-normalize saga went 44.59%->8.49%, CHANGELOG.md:33-37),
    so assert mel-domain agreement: a sweep over the full speech band must
    produce near-identical log-mel features after either resampler.
    """
    from scipy.signal import resample as fft_resample

    from voxtral_tpu.audio import resample_to_16k

    dur = 2.0
    t = np.arange(int(dur * src_rate)) / src_rate
    # 100 Hz -> 7.6 kHz linear chirp: covers the whole retained band but
    # stays below the new Nyquist (8 kHz) so both anti-alias filters are
    # compared in their passband.
    f0, f1 = 100.0, 7600.0
    if kind == "chirp":
        sig = (0.5 * np.sin(2 * np.pi * (f0 + (f1 - f0) / (2 * dur) * t)
                            * t))
    else:
        # Speech-shaped noise: low-passed noise with 4 Hz amplitude
        # modulation (broadband content through the mel bank, unlike the
        # single-line chirp).
        rng = np.random.default_rng(13)
        n = rng.standard_normal(t.size)
        k = np.hanning(int(src_rate / 16000 * 65) | 1)
        n = np.convolve(n, k / k.sum(), mode="same")
        sig = 0.5 * n / max(1e-9, np.abs(n).max()) * (
            0.6 + 0.4 * np.sin(2 * np.pi * 4.0 * t))
    sig = sig.astype(np.float32)

    ours = resample_to_16k(AudioBuffer(sig, src_rate)).samples
    n_ref = int(round(len(sig) * 16000 / src_rate))
    ref = fft_resample(sig.astype(np.float64), n_ref).astype(np.float32)

    n = min(len(ours), len(ref))
    # Trim filter edge transients (2 frames per side).
    mel_ours = _mel_db(ours[:n])[2:-3]
    mel_ref = _mel_db(ref[:n])[2:-3]

    diff = np.abs(mel_ours - mel_ref)
    # vLLM normalization maps ~8 log10-decades onto [~-1, 1.375]; 5e-3
    # mean is <0.5% of the usable dynamic range — well under the golden-
    # fixture tolerance used for whole-stack comparisons (1e-2).
    assert float(diff.mean()) < 5e-3, diff.mean()
    # Max deviation is only meaningful where there IS energy: at the log
    # floor (global_max - 8 decades) both resamplers see ~zero power and
    # the log amplifies filter-tail noise into large deltas the model
    # never attends to.  Compare cells within 6 decades of the peak.
    energized = mel_ref > mel_ref.max() - 6.0 / 4.0  # /4: vLLM (x+4)/4
    assert float(diff[energized].max()) < 0.1, diff[energized].max()
