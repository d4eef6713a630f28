"""On-device (fused-frontend) mel path: parity with the host numpy mel.

The transcribe pipeline can fold the log-mel frontend into the jitted
encode+decode program (``PipelineConfig.mel_device``, auto-on for TPU) so
a chunk group is ONE dispatch with one host fetch.  These tests pin that
the fused frontend is token- and text-identical to the host-mel path
(reference keeps mel on CPU + uploads per chunk, transcribe.rs:279-306).
"""

import numpy as np

from voxtral_tpu.audio import AudioBuffer, MelSpectrogram, PadConfig, pad_audio
from voxtral_tpu.audio.mel import mel_log_jax_batch


def test_batched_jax_mel_matches_numpy_rows():
    """mel_log_jax_batch on a [B, N] batch == per-row compute_log."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    batch = np.stack([
        rng.normal(size=24000).astype(np.float32) * 0.3,
        np.sin(2 * np.pi * 440 * np.arange(24000) / 16000).astype(np.float32),
    ])
    mel = MelSpectrogram.voxtral()
    out = np.asarray(mel_log_jax_batch(
        jnp.asarray(batch), jnp.asarray(mel.window),
        jnp.asarray(mel.mel_basis),
        n_fft=mel.config.n_fft, hop=mel.config.hop_length,
        log_mel_max=mel.config.log_mel_max,
    ))
    assert out.shape[0] == 2 and out.shape[1] == 128
    for b in range(2):
        ref = mel.compute_log(batch[b]).T  # [n_mels, T]
        np.testing.assert_allclose(out[b], ref, rtol=1e-3, atol=2e-4)


def _golden_model(tmp_path, fmt="f32"):
    from safetensors.numpy import save_file

    from tests.test_golden_full_model import golden_cfg
    from tests.test_safetensors_loader import synth_checkpoint
    from voxtral_tpu.loaders.safetensors_loader import load_voxtral_params
    from voxtral_tpu.models.voxtral import VoxtralModel

    cfg = golden_cfg()
    tensors = synth_checkpoint(cfg, np.random.default_rng(42))
    tensors = {k: (v * 0.25).astype(np.float32) for k, v in tensors.items()}
    path = tmp_path / "consolidated.safetensors"
    save_file(tensors, str(path))
    if fmt == "w8":
        from voxtral_tpu.utils.quantize import quantize_params_w8

        dense = load_voxtral_params(str(path), cfg, dtype="float32",
                                    to_device=False)
        return VoxtralModel(quantize_params_w8(dense), cfg)
    return VoxtralModel(
        load_voxtral_params(str(path), cfg, dtype="float32"), cfg)


def _padded_tone():
    sr = 16000
    t = np.arange(int(1.5 * sr)) / sr
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1320 * t)).astype(np.float32)
    buf = AudioBuffer(sig, sr)
    buf.peak_normalize(0.95)
    return pad_audio(buf, PadConfig.voxtral()).samples


def test_fused_frontend_tokens_match_host_mel(tmp_path):
    """samples->tokens (one program) == host mel -> mel->tokens."""
    model = _golden_model(tmp_path)
    mel_spec = MelSpectrogram.voxtral()
    samples = _padded_tone()

    mel = mel_spec.compute_log_batch(samples)
    ref = model.transcribe_streaming_batch(mel)

    got = np.asarray(model.transcribe_streaming_batch_samples_async(
        samples[None, :], mel_spec))
    assert got.tolist() == ref.tolist()


def test_fused_frontend_tokens_match_host_mel_megakernel(tmp_path,
                                                         monkeypatch):
    """Same parity through the whole-stack kernel (w8, interpret)."""
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    model = _golden_model(tmp_path, fmt="w8")
    assert model.fused_decode is not None
    mel_spec = MelSpectrogram.voxtral()
    samples = _padded_tone()

    ref = model.transcribe_streaming_batch(mel_spec.compute_log_batch(samples))
    got = np.asarray(model.transcribe_streaming_batch_samples_async(
        samples[None, :], mel_spec))
    assert got.tolist() == ref.tolist()


def test_pipeline_mel_device_matches_host(tmp_path):
    """TranscribePipeline with mel_device=True must produce the same text
    (and exercise the single-dispatch group path) as the host-mel mode."""
    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    model = _golden_model(tmp_path)
    tok = VoxtralTokenizer([b"x "] * 1280, {}, 1280)
    sig = _padded_tone()  # already padded, but the pipeline re-pads raw
    raw = sig[76 * 1280: -1280]  # arbitrary interior slice as "audio"

    host = TranscribePipeline(
        model, tok, PipelineConfig(mel_device=False)
    ).transcribe_samples(raw)
    dev = TranscribePipeline(
        model, tok, PipelineConfig(mel_device=True)
    ).transcribe_samples(raw)
    assert dev == host
