"""CLI/pipeline edge cases: odd sample rates, stereo, non-WAV input,
very short audio, empty-ish audio."""

import numpy as np

from pathlib import Path

from tests.test_cli import run_cli
from voxtral_tpu.audio import AudioBuffer, save_wav

FIXTURES = Path(__file__).parent / "fixtures"
TINY = ["--random-weights", "--params", str(FIXTURES / "params_tiny.json"),
        "--dtype", "float32"]


def test_8khz_wav_resampled(tmp_path):
    t = np.arange(16000) / 8000.0
    sig = (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    path = tmp_path / "low.wav"
    save_wav(AudioBuffer(sig, 8000), path)
    code, out, err = run_cli("--audio", str(path), *TINY)
    assert code == 0
    assert len(out.splitlines()) == 1


def test_stereo_wav(tmp_path):
    from scipy.io import wavfile

    t = np.arange(32000) / 16000.0
    left = 0.4 * np.sin(2 * np.pi * 300 * t)
    right = 0.4 * np.sin(2 * np.pi * 310 * t)
    stereo = (np.stack([left, right], axis=1) * 32767).astype(np.int16)
    path = tmp_path / "stereo.wav"
    wavfile.write(str(path), 16000, stereo)
    code, out, err = run_cli("--audio", str(path), *TINY)
    assert code == 0


def test_non_wav_file(tmp_path):
    path = tmp_path / "not_audio.wav"
    path.write_bytes(b"this is not a wav file at all" * 10)
    code, out, err = run_cli("--audio", str(path), *TINY)
    assert code == 1  # per-file error, empty output line, continues
    assert "failed" in err.lower() or "error" in err.lower()


def test_very_short_audio(tmp_path):
    """0.1 s clip: too short for the 38-position prefix -> empty line."""
    path = tmp_path / "blip.wav"
    save_wav(AudioBuffer(np.zeros(1600, np.float32), 16000), path)
    code, out, err = run_cli("--audio", str(path), *TINY)
    assert code == 0
    assert out == "\n"


def test_silence(tmp_path):
    path = tmp_path / "silence.wav"
    save_wav(AudioBuffer(np.zeros(32000, np.float32), 16000), path)
    code, out, err = run_cli("--audio", str(path), *TINY)
    assert code == 0  # peak_normalize must not divide by zero
