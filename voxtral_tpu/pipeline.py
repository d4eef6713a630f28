"""High-level transcription pipeline: audio file -> text.

The Python counterpart of the reference CLI's per-file flow
(``/root/reference/src/bin/transcribe.rs:187-276``):
load -> resample to 16 kHz -> peak_normalize(0.95) -> chunk (1200 mel
frames) -> per chunk: pad(76/17) -> log-mel -> transcribe_streaming ->
decode (filter control tokens) -> join chunk texts with spaces.

TPU-specific addition: decoder sequence lengths are **bucketed** — the
padded audio is extended with silence so the decoder length rounds up to a
multiple of ``bucket_positions``.  This caps the number of distinct XLA
compilations across a corpus (variable shapes would otherwise recompile
per file; reference GPUs pay no such cost but TPUs trace once per shape).
Trailing silence decodes to [STREAMING_PAD] and is dropped by the
tokenizer's control-token filter.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Optional

import numpy as np

from voxtral_tpu.audio import (
    AudioBuffer,
    ChunkConfig,
    MelSpectrogram,
    PadConfig,
    chunk_audio,
    load_wav,
    resample_to_16k,
)
from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.models.voxtral import PREFIX_LEN, VoxtralModel
from voxtral_tpu.tokenizer import VoxtralTokenizer
from voxtral_tpu.utils.profiling import span

log = logging.getLogger("voxtral_tpu")

SAMPLES_PER_POSITION = 2560  # one decoder position = 2560 samples (160 ms)

# Batched decode-step cost model (measured on v5e with the fused stack
# kernel, benches/kernel_bench.py --suite step-fused --batch 1,2,4,8):
# one step at batch B costs ~ C0 + C1*B ms — decode streams the same
# weights regardless of B, so extra rows ride nearly free.  Used to
# decide whether unequal-length chunks should be padded to a common
# length and decoded as ONE batch.
# Measured: B=1: 4.60, B=2: 4.61, B=4: 4.62, B=8: 5.06 ms/step.
STEP_COST_C0_MS = 4.55
STEP_COST_C1_MS = 0.07
# Encoder cost per padded-in decoder position (merging pads short chunks
# with silence that still gets encoded: 7.88 ms / 2344 mel frames measured
# on v5e = ~3.4 us per mel frame = ~0.054 ms per 16-frame position).
ENC_COST_PER_POS_MS = 0.06


@dataclasses.dataclass
class PipelineConfig:
    delay_tokens: float = 6.0
    # Chunk cap.  The reference uses 1200-1500 to fit WebGPU
    # shared-memory limits (transcribe.rs:56-57); TPUs have no such
    # limit, and every extra chunk re-pays the 38-position silence
    # prefix in decode steps, so the TPU default is larger (3000 frames
    # = 30 s of audio per chunk; encoder scores at S=750 are ~72 MB).
    max_mel_frames: int = 3000
    # Decoder-length bucket granularity.  Non-final chunks always have the
    # same shape (max_mel_frames), so bucketing only pads the FINAL chunk
    # of each file; 8 positions (1.28 s) balances compile count vs waste.
    bucket_positions: int = 8
    peak_normalize: Optional[float] = 0.95
    # On-device mel frontend: fold log-mel into the jitted encode+decode
    # program (one dispatch, one fetch per chunk group).  None = auto
    # (on for TPU backends; CPU keeps the host numpy mel, whose pocketfft
    # beats XLA CPU).  Tokens are identical up to f32 FFT rounding;
    # parity is pinned in tests/test_pipeline_device_mel.py.
    mel_device: Optional[bool] = None
    # Speculative K-token decode (greedy only, K >= 2): each decode pass
    # verifies K drafted tokens per chunk row in one weight pass — EXACT
    # greedy tokens for any draft (models/voxtral.py spec while-loop);
    # ignored where the stack kernel can't run (TP meshes, sampling).
    speculative: int = 0
    draft: str = "ngram"


class TranscribePipeline:
    """Shared by the CLI, the WER harness and the serving surface."""

    def __init__(
        self,
        model: VoxtralModel,
        tokenizer: VoxtralTokenizer,
        pipeline_config: Optional[PipelineConfig] = None,
    ):
        self.model = model
        self.tokenizer = tokenizer
        self.pcfg = pipeline_config or PipelineConfig()
        self.mel = MelSpectrogram.voxtral()
        self.pad_config = PadConfig.voxtral()
        self.chunk_config = ChunkConfig.voxtral().with_max_frames(
            self.pcfg.max_mel_frames
        )

    # -- loading ------------------------------------------------------------

    @classmethod
    def from_model_dir(
        cls,
        model_dir: str | Path,
        dtype: str = "bfloat16",
        pipeline_config: Optional[PipelineConfig] = None,
        mesh=None,
        params_cache: Optional[str | Path] = None,
    ) -> "TranscribePipeline":
        """SafeTensors path: dir with consolidated.safetensors, params.json,
        tekken.json.  dtype: "bfloat16" | "float32" | "w8" (rowwise-int8
        requantized at load — the fast decode path without a GGUF step).
        ``mesh``: optional device mesh for TP/DP (CLI ``--tp/--dp``).
        ``params_cache``: directory caching the CONVERTED pytree so warm
        restarts skip the w8 requantization (``--params-cache``); dense
        dtypes load via memmap already and bypass the cache."""
        from voxtral_tpu.loaders.safetensors_loader import load_voxtral_params

        model_dir = Path(model_dir)
        cfg = VoxtralConfig.from_model_dir(model_dir)
        t0 = time.time()
        if dtype == "w8":
            from voxtral_tpu.utils.quantize import quantize_params_w8

            def build():
                dense = load_voxtral_params(
                    model_dir / "consolidated.safetensors", cfg,
                    dtype="float32", to_device=False,
                )
                return quantize_params_w8(dense, to_device=False)

            if params_cache:
                from voxtral_tpu.loaders.param_cache import load_or_build

                params = load_or_build(
                    params_cache, model_dir / "consolidated.safetensors",
                    "w8", build)
            else:
                import jax
                import jax.numpy as jnp

                params = jax.tree_util.tree_map(jnp.asarray, build())
        else:
            params = load_voxtral_params(
                model_dir / "consolidated.safetensors", cfg, dtype=dtype
            )
        log.info("loaded safetensors weights (%s) in %.1fs", dtype,
                 time.time() - t0)
        tokenizer = VoxtralTokenizer.from_model_dir(model_dir)
        return cls(VoxtralModel(params, cfg, mesh=mesh), tokenizer,
                   pipeline_config)

    @classmethod
    def from_gguf(
        cls,
        gguf_path: str | Path,
        tokenizer_path: str | Path,
        pipeline_config: Optional[PipelineConfig] = None,
        config: Optional[VoxtralConfig] = None,
        weight_format: str = "q4",
        mesh=None,
        params_cache: Optional[str | Path] = None,
    ) -> "TranscribePipeline":
        """Q4_0 GGUF path.

        Architecture config: explicit ``config`` > a ``params.json`` next to
        the GGUF file > production defaults (the reference hardcodes the
        defaults, gguf/loader.rs).  ``params_cache``: directory caching the
        repacked/requantized pytree so warm restarts skip the conversion
        (``--params-cache``).
        """
        from voxtral_tpu.loaders.gguf_loader import Q4ModelLoader
        from voxtral_tpu.models.voxtral import VoxtralModel

        gguf_path = Path(gguf_path)
        if config is None:
            sidecar = gguf_path.parent / "params.json"
            if sidecar.exists():
                config = VoxtralConfig.from_file(sidecar)
                log.info("using architecture config from %s", sidecar)
        t0 = time.time()
        if params_cache:
            from voxtral_tpu.loaders.param_cache import load_or_build

            loader = [None]

            def build():
                loader[0] = Q4ModelLoader.from_file(
                    gguf_path, cfg=config, weight_format=weight_format)
                return loader[0].load(to_device=False)

            params = load_or_build(
                params_cache, gguf_path, weight_format, build)
            cfg = loader[0].cfg if loader[0] else (
                config or VoxtralConfig.voxtral())
            model = VoxtralModel(params, cfg, mesh=mesh)
        else:
            loader = Q4ModelLoader.from_file(
                gguf_path, cfg=config, weight_format=weight_format)
            model = VoxtralModel(loader.load(), loader.cfg, mesh=mesh)
        log.info("loaded GGUF Q4 weights (%s) in %.1fs", weight_format,
                 time.time() - t0)
        tokenizer = VoxtralTokenizer.from_file(tokenizer_path)
        return cls(model, tokenizer, pipeline_config)

    # -- transcription ------------------------------------------------------

    def _bucketed_pad(self, audio: AudioBuffer) -> AudioBuffer:
        padded = pad_audio_bucketed(
            audio, self.pad_config, self.pcfg.bucket_positions
        )
        return padded

    def transcribe_samples(self, samples: np.ndarray, sample_rate: int = 16000) -> str:
        """Transcribe a mono float32 sample buffer."""
        _, chunk_tokens = self._chunk_tokens(samples, sample_rate)
        with span("decode_tokens", chunks=len(chunk_tokens)):
            texts = []
            for toks in chunk_tokens:
                text = self.decode_tokens(toks)
                if text.strip():
                    texts.append(text.strip())
        return " ".join(texts)

    def transcribe_samples_words(
        self, samples: np.ndarray, sample_rate: int = 16000
    ) -> dict:
        """Transcribe with word-level timestamps.

        Returns ``{"text": str, "words": [{"word", "start", "end"}]}``
        — times in seconds of the original audio, derived from the
        model's streaming control tokens ([STREAMING_WORD] marks each
        word's start position; 1 position = 160 ms) with the configured
        decode delay subtracted.  Chunked files report absolute times
        via each chunk's start offset.  Beyond reference parity.
        """
        chunks, chunk_tokens = self._chunk_tokens(samples, sample_rate)
        delay_s = self.pcfg.delay_tokens * 0.08
        words: list[dict] = []
        texts = []
        for ch, toks in zip(chunks, chunk_tokens):
            words.extend(self.tokenizer.decode_words(
                toks, delay_s=delay_s, offset_s=ch.start_time(16000)))
            text = self.decode_tokens(toks)
            if text.strip():
                texts.append(text.strip())
        return {"text": " ".join(texts), "words": words}

    def _chunk_tokens(self, samples: np.ndarray, sample_rate: int):
        """(chunks, per-chunk token arrays) for a sample buffer — the
        shared chunk/pad/batch/dispatch machinery behind both the text
        and the word-timestamp surfaces."""
        audio = AudioBuffer(np.asarray(samples, dtype=np.float32), sample_rate)
        if audio.sample_rate != 16000:
            audio = resample_to_16k(audio)
        if self.pcfg.peak_normalize is not None:
            audio.peak_normalize(self.pcfg.peak_normalize)

        chunks = chunk_audio(audio.samples, self.chunk_config)
        if len(chunks) > 1:
            log.info(
                "audio exceeds %d mel frames; %d chunks",
                self.chunk_config.max_mel_frames,
                len(chunks),
            )

        # Chunks of the SAME padded length decode in one batched on-device
        # scan (all non-final chunks are exactly max_mel_frames long, so a
        # long file becomes one big batch + one short final chunk).
        padded = [
            self._bucketed_pad(AudioBuffer(ch.samples, 16000)) for ch in chunks
        ]
        # True decode-token count per chunk (decode is causal, so a chunk
        # padded with extra silence to join a longer batch produces the
        # SAME tokens at its real positions — trim at fetch).
        tok_counts = [
            self.model.decoder_seq_len(self.mel.num_frames(len(p.samples)))
            - PREFIX_LEN
            for p in padded
        ]
        groups: dict[int, list[int]] = {}
        for idx, p in enumerate(padded):
            groups.setdefault(len(p.samples), []).append(idx)

        # Decode is HBM-bound on the weights: a batched step costs
        # ~C0 + C1*B ms, so folding unequal-length chunks into ONE batch
        # (padding the short ones with silence) wins whenever the merged
        # cost beats the per-length groups.
        if len(groups) > 1:
            def step_cost(b: int) -> float:
                return STEP_COST_C0_MS + STEP_COST_C1_MS * b

            grouped_cost = sum(
                max(tok_counts[i] for i in idxs) * step_cost(len(idxs))
                for idxs in groups.values()
            )
            # Merging pads every short chunk to the longest: those silent
            # positions are still encoded, so charge the encoder for them
            # (decode cost alone would over-merge very unequal groups).
            extra_positions = sum(max(tok_counts) - tc for tc in tok_counts)
            merged_cost = (
                max(tok_counts) * step_cost(len(padded))
                + ENC_COST_PER_POS_MS * extra_positions
            )
            if merged_cost < grouped_cost:
                target = max(len(p.samples) for p in padded)
                padded = [
                    AudioBuffer(
                        np.pad(p.samples, (0, target - len(p.samples))), 16000
                    )
                    if len(p.samples) < target else p
                    for p in padded
                ]
                groups = {target: list(range(len(padded)))}
                log.info(
                    "merged %d unequal chunks into one batch "
                    "(est. %.0f ms vs %.0f ms grouped)",
                    len(padded), merged_cost, grouped_cost,
                )

        # Dispatch every group first (async), fetch afterwards — overlaps
        # the dispatch roundtrips and lets the device queue run ahead.
        chunk_tokens: list[np.ndarray] = [None] * len(padded)  # type: ignore
        pending = []
        for length, idxs in groups.items():
            if len(idxs) > 1:
                log.info(
                    "decoding %d equal-length chunks in one batched scan",
                    len(idxs),
                )
            pending.append((idxs, self._dispatch_batch(
                [padded[i].samples for i in idxs]
            )))
        with span("transcribe_fetch", groups=len(pending)):
            for idxs, dev_tokens in pending:
                for i, toks in zip(idxs, np.asarray(dev_tokens)):
                    chunk_tokens[i] = toks[:tok_counts[i]]
        return chunks, chunk_tokens

    def _device_mel(self) -> bool:
        if self.pcfg.mel_device is not None:
            return self.pcfg.mel_device
        import jax

        return jax.default_backend() == "tpu"

    def _dispatch_batch(self, sample_rows: list[np.ndarray]):
        """Dispatch one equal-length batch of padded sample rows (async).

        Fused frontend (``mel_device``): raw samples in, tokens out, one
        jitted program; otherwise host numpy mel + batched decode.
        """
        n = len(sample_rows)
        if self._device_mel():
            batch = np.stack(sample_rows)
            with span("transcribe_dispatch", batch=n,
                      samples=batch.shape[-1], device_mel=True):
                return self.model.transcribe_streaming_batch_samples_async(
                    batch, self.mel, delay_tokens=self.pcfg.delay_tokens,
                    speculative=self.pcfg.speculative, draft=self.pcfg.draft,
                )
        with span("mel", chunks=n, samples=len(sample_rows[0])):
            mels = np.concatenate(
                [self.mel.compute_log_batch(s) for s in sample_rows], axis=0
            )
        with span("transcribe_dispatch", batch=n,
                  mel_frames=mels.shape[-1]):
            return self.model.transcribe_streaming_batch_async(
                mels, delay_tokens=self.pcfg.delay_tokens,
                speculative=self.pcfg.speculative, draft=self.pcfg.draft,
            )

    def transcribe_file(self, path: str | Path) -> str:
        audio = load_wav(path)
        return self.transcribe_samples(audio.samples, audio.sample_rate)

    def transcribe_file_words(self, path: str | Path) -> dict:
        audio = load_wav(path)
        return self.transcribe_samples_words(audio.samples, audio.sample_rate)

    def transcribe_files_batched(
        self, paths: list, batch_size: int = 8
    ) -> list[str]:
        """Batched multi-file transcription — the WER harness's batch/DP
        seam (SURVEY.md §2.6 "DP (batch WER eval)").  File-loading front
        of :meth:`transcribe_samples_batched`.
        """
        audios = [load_wav(p) for p in paths]
        return self.transcribe_samples_batched(
            [(a.samples, a.sample_rate) for a in audios],
            batch_size=batch_size)

    def transcribe_samples_batched(
        self, buffers: list, batch_size: int = 8
    ) -> list[str]:
        """Batched multi-utterance transcription over raw sample buffers
        (``buffers``: list of ``(samples, sample_rate)``).

        Decode streams the same weights regardless of batch, so grouping
        same-padded-length utterances from DIFFERENT requests into one
        on-device scan cuts wall-time nearly ``batch_size``-fold
        (measured 1304 tok/s aggregate at B=8 vs 220 solo; one extra
        batch row costs ~0.07 ms/step).  Serving coalesces concurrent
        /transcribe POSTs through this (the batched-serving role of
        /root/reference/serve.mjs:41-104 + e2e_bench.rs batch
        semantics).  Buffers longer than one chunk fall back to
        :meth:`transcribe_samples`.  Under a ``--dp`` mesh the batch
        rows shard over the data axis.
        """
        results: list[Optional[str]] = [None] * len(buffers)
        singles: list[tuple[int, AudioBuffer]] = []
        for i, (samples, rate) in enumerate(buffers):
            audio = AudioBuffer(np.asarray(samples, np.float32), rate)
            if audio.sample_rate != 16000:
                audio = resample_to_16k(audio)
            if self.pcfg.peak_normalize is not None:
                audio.peak_normalize(self.pcfg.peak_normalize)
            chunks = chunk_audio(audio.samples, self.chunk_config)
            if len(chunks) > 1:
                results[i] = self.transcribe_samples(audio.samples, 16000)
                continue
            singles.append(
                (i, self._bucketed_pad(AudioBuffer(chunks[0].samples, 16000)))
            )

        groups: dict[int, list[int]] = {}
        padded = {i: buf for i, buf in singles}
        for i, buf in singles:
            groups.setdefault(len(buf.samples), []).append(i)

        pending = []
        for length, idxs in groups.items():
            for lo in range(0, len(idxs), batch_size):
                part = idxs[lo:lo + batch_size]
                pending.append((part, self._dispatch_batch(
                    [padded[i].samples for i in part]
                )))
        with span("transcribe_fetch", groups=len(pending)):
            for idxs, dev_tokens in pending:
                for i, toks in zip(idxs, np.asarray(dev_tokens)):
                    n_tok = (
                        self.model.decoder_seq_len(
                            self.mel.num_frames(len(padded[i].samples)))
                        - PREFIX_LEN
                    )
                    results[i] = self.decode_tokens(toks[:n_tok]).strip()
        return [r if r is not None else "" for r in results]

    def decode_tokens(self, tokens: np.ndarray) -> str:
        """Filter control tokens (<1000) and decode (transcribe.rs:309-318)."""
        return self.tokenizer.decode([int(t) for t in tokens if t >= 1000])


def pad_audio_bucketed(
    audio: AudioBuffer, pad_config: PadConfig, bucket_positions: int
) -> AudioBuffer:
    """Reference padding (76 left / align+17 right), then extend with silence
    to the next decoder-length bucket."""
    from voxtral_tpu.audio import pad_audio

    padded = pad_audio(audio, pad_config)
    if bucket_positions <= 1:
        return padded
    bucket_samples = bucket_positions * SAMPLES_PER_POSITION
    n = len(padded.samples)
    target = -(-n // bucket_samples) * bucket_samples
    if target > n:
        padded.samples = np.concatenate(
            [padded.samples, np.zeros(target - n, dtype=np.float32)]
        )
    return padded
