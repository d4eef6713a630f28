"""Audio frontend: WAV io, resampling, mel spectrogram, padding, chunking.

CPU-side preprocessing mirroring the reference's ``src/audio/`` modules;
the mel transform also has an on-device JAX path.
"""

from voxtral_tpu.audio.io import AudioBuffer, load_wav, save_wav
from voxtral_tpu.audio.resample import resample, resample_to_16k
from voxtral_tpu.audio.mel import MelConfig, MelSpectrogram
from voxtral_tpu.audio.pad import PadConfig, pad_audio, num_audio_tokens
from voxtral_tpu.audio.chunk import (
    AudioChunk,
    ChunkConfig,
    chunk_audio,
    needs_chunking,
    num_chunks,
)

__all__ = [
    "AudioBuffer",
    "load_wav",
    "save_wav",
    "resample",
    "resample_to_16k",
    "MelConfig",
    "MelSpectrogram",
    "PadConfig",
    "pad_audio",
    "num_audio_tokens",
    "AudioChunk",
    "ChunkConfig",
    "chunk_audio",
    "needs_chunking",
    "num_chunks",
]
