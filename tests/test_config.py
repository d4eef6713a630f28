"""Config parsing tests, ported from reference config.rs:537-722."""

from pathlib import Path

from voxtral_tpu.config import (
    AdapterConfig,
    AudioEncoderConfig,
    AudioInputConfig,
    LanguageModelConfig,
    VoxtralConfig,
)

FIXTURES = Path(__file__).parent / "fixtures"


def test_audio_encoder_defaults():
    c = AudioEncoderConfig()
    assert c.dim == 1280
    assert c.n_layers == 32
    assert c.n_heads == 32
    assert c.n_kv_heads == 32
    assert c.head_dim == 64
    assert c.hidden_dim == 5120
    assert c.sliding_window == 750
    assert c.use_biases
    assert c.causal
    assert c.max_source_positions == 1500
    assert c.max_encoder_positions() == 375
    assert c.effective_max_positions() == 375


def test_language_model_defaults():
    c = LanguageModelConfig()
    assert c.dim == 3072
    assert c.n_layers == 26
    assert c.n_heads == 32
    assert c.n_kv_heads == 8
    assert c.head_dim == 128
    assert c.hidden_dim == 9216
    assert c.vocab_size == 131072
    assert c.sliding_window == 8192
    assert c.gqa_groups() == 4
    assert not c.use_biases
    assert c.causal


def test_adapter_defaults():
    c = AdapterConfig()
    assert c.input_dim == 5120
    assert c.hidden_dim == 5120
    assert c.output_dim == 3072


def test_audio_input_defaults():
    c = AudioInputConfig()
    assert c.sampling_rate == 16000
    assert c.num_mel_bins == 128
    assert c.hop_length == 160
    assert c.window_size == 400
    assert abs(c.global_log_mel_max - 1.5) < 1e-6
    assert abs(c.frame_rate - 12.5) < 1e-6
    assert abs(c.ms_per_token() - 80.0) < 1e-6
    assert c.samples_per_token() == 1280
    assert abs(c.raw_frame_rate() - 100.0) < 1e-6


def test_voxtral_config_defaults():
    c = VoxtralConfig()
    assert c.audio_encoder.dim == 1280
    assert c.language_model.dim == 3072
    assert c.adapter.output_dim == 3072
    assert c.audio.sampling_rate == 16000
    assert c.ada_rms_norm_t_cond_dim == 0
    assert not c.has_ada_rms_norm()


def test_gqa_calculation():
    assert LanguageModelConfig(n_heads=32, n_kv_heads=8).gqa_groups() == 4
    assert LanguageModelConfig(n_heads=32, n_kv_heads=32).gqa_groups() == 1


def test_parse_actual_params_json():
    c = VoxtralConfig.from_file(FIXTURES / "params.json")

    lm = c.language_model
    assert lm.dim == 3072
    assert lm.n_layers == 26
    assert lm.n_heads == 32
    assert lm.n_kv_heads == 8
    assert lm.head_dim == 128
    assert lm.hidden_dim == 9216
    assert lm.vocab_size == 131072
    assert lm.sliding_window == 8192
    assert not lm.use_biases
    assert lm.tied_embeddings

    enc = c.audio_encoder
    assert enc.dim == 1280
    assert enc.n_layers == 32
    assert enc.n_heads == 32
    assert enc.n_kv_heads == 32
    assert enc.head_dim == 64
    assert enc.hidden_dim == 5120
    assert enc.sliding_window == 750
    assert enc.use_biases
    assert enc.causal
    assert enc.ffn_type == "swiglu"
    assert enc.norm_type == "rms_norm"
    # null max_source_positions falls back to 1500
    assert enc.max_source_positions == 1500

    aud = c.audio
    assert aud.sampling_rate == 16000
    assert aud.num_mel_bins == 128
    assert aud.hop_length == 160
    assert aud.window_size == 400
    assert abs(aud.global_log_mel_max - 1.5) < 1e-6
    assert abs(aud.frame_rate - 12.5) < 1e-6
    assert aud.transcription_format == "streaming"

    assert c.adapter.input_dim == 5120  # 1280 * 4
    assert c.adapter.output_dim == 3072

    assert c.has_ada_rms_norm()
    assert c.ada_rms_norm_t_cond_dim == 32
    assert c.downsample_factor == 4
