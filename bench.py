"""Headline benchmark: streaming transcription RTF on 16 s of audio.

Mirrors the reference's e2e-bench protocol (``/root/reference/src/bin/e2e_bench.rs``):
16 s test audio, full pipeline (chunk -> pad -> mel -> encode -> greedy
decode), warmup + averaged timed iterations.  Weights are random at the
exact production shapes — throughput is weight-value independent.

Measures the recommended serving configuration: Q4_0 on disk ->
rowwise-int8 in HBM -> native int8 MXU (the W8A8 path; see
docs/QUANTIZATION.md).  Weights are random at the exact production shapes.

Prints ONE JSON line:
    {"metric": "rtf_16s", "value": <RTF>, "unit": "ratio",
     "vs_baseline": <baseline_rtf / ours — how many x faster than the
                     reference's Q4 RTF 0.416 on DGX Spark GB10>}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_RTF = 0.416  # reference Q4 GGUF native, 16 s audio (README.md:14)
AUDIO_SECS = 16.0
ITERATIONS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()

    from voxtral_tpu.audio import (
        AudioBuffer,
        MelSpectrogram,
        chunk_audio,
        pad_audio,
    )
    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.voxtral import VoxtralModel

    backend = jax.default_backend()
    print(f"# backend: {backend}, devices: {jax.devices()}", file=sys.stderr)

    from voxtral_tpu.utils.quantize import random_w8_params

    cfg = VoxtralConfig.voxtral()
    t0 = time.time()
    # Generating + quantizing ~4.7 GB of random production-shape weights
    # on the host costs minutes; the params cache (VOXTRAL_PARAMS_CACHE,
    # loaders/param_cache.py) makes reruns warm — same machinery as the
    # CLI/serving --params-cache flag.
    import os

    cache_dir = os.environ.get(
        "VOXTRAL_PARAMS_CACHE",
        os.path.expanduser("~/.cache/voxtral_tpu/params"))
    if cache_dir and cache_dir != "0":
        from voxtral_tpu.loaders.param_cache import (
            cache_entry_key,
            load_or_build_at,
        )

        params = load_or_build_at(
            cache_entry_key(cache_dir, "bench-random-w8",
                            f"random_w8:{cfg.to_params_json()}"),
            lambda: random_w8_params(cfg, to_device=False))
    else:
        params = random_w8_params(cfg)
    model = VoxtralModel(params, cfg)
    jax.block_until_ready(model.params)
    print(f"# model init (w8): {time.time()-t0:.1f}s", file=sys.stderr)

    # 16 s test signal (speech-band chirp so mel is non-degenerate).
    sr = 16000
    t = np.arange(int(AUDIO_SECS * sr)) / sr
    sig = (0.5 * np.sin(2 * np.pi * (200 + 150 * t) * t)).astype(np.float32)
    audio = AudioBuffer(sig, sr)
    audio.peak_normalize(0.95)

    # Time the REAL user surface: the full pipeline (chunk -> mel -> 
    # transcribe, with CPU mel prefetch overlapping TPU work).
    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    tokenizer = VoxtralTokenizer([None] * 131072, {}, 131072)
    pipeline = TranscribePipeline(
        model, tokenizer,
        PipelineConfig(delay_tokens=6.0, max_mel_frames=3000, bucket_positions=1),
    )

    from voxtral_tpu.audio import chunk_audio as _chunks
    from voxtral_tpu.models.voxtral import PREFIX_LEN
    from voxtral_tpu.pipeline import pad_audio_bucketed

    n_tokens_total = 0
    for ch in _chunks(audio.samples, pipeline.chunk_config):
        padded = pad_audio_bucketed(
            AudioBuffer(ch.samples, sr), pipeline.pad_config,
            pipeline.pcfg.bucket_positions,
        )
        n_tokens_total += model.decoder_seq_len(len(padded.samples) // 160) - PREFIX_LEN

    def run_once():
        pipeline.transcribe_samples(audio.samples, sr)
        return n_tokens_total

    # Warmup (compile).
    t0 = time.time()
    n_tokens = run_once()
    print(
        f"# warmup (incl. compile): {time.time()-t0:.1f}s, {n_tokens} tokens",
        file=sys.stderr,
    )

    times = []
    for i in range(ITERATIONS):
        t0 = time.time()
        n_tokens = run_once()
        times.append(time.time() - t0)
        print(f"# iter {i}: {times[-1]*1000:.0f} ms", file=sys.stderr)

    total = float(np.mean(times))
    rtf = total / AUDIO_SECS
    tok_s = n_tokens / total

    # Speculative greedy decode (K drafted tokens verified per weight
    # pass; EXACT same tokens — identity is asserted in-run below, and
    # the sequential number is the fallback if it ever diverges or is
    # slower).  The draft is the device-resident bigram table; the
    # pipeline surface is `--speculative K` on the CLI / PipelineConfig.
    rtf_seq, rtf_spec, spec_identical = rtf, None, None
    try:
        spec_pipeline = TranscribePipeline(
            model, tokenizer,
            PipelineConfig(delay_tokens=6.0, max_mel_frames=3000,
                           bucket_positions=1, speculative=8),
        )
        text_seq = pipeline.transcribe_samples(audio.samples, sr)
        t0 = time.time()
        text_spec = spec_pipeline.transcribe_samples(audio.samples, sr)
        print(f"# spec warmup (incl. compile): {time.time()-t0:.1f}s",
              file=sys.stderr)
        spec_identical = text_spec == text_seq
        if spec_identical:
            spec_times = []
            for i in range(ITERATIONS):
                t0 = time.time()
                spec_pipeline.transcribe_samples(audio.samples, sr)
                spec_times.append(time.time() - t0)
                print(f"# spec iter {i}: {spec_times[-1]*1000:.0f} ms",
                      file=sys.stderr)
            rtf_spec = float(np.mean(spec_times)) / AUDIO_SECS
            if rtf_spec < rtf:
                rtf = rtf_spec
                tok_s = n_tokens / (rtf_spec * AUDIO_SECS)
        else:
            print("# spec tokens DIVERGED from sequential — reporting "
                  "the sequential number", file=sys.stderr)
    except Exception as e:  # pragma: no cover - bench resilience
        print(f"# spec path unavailable ({e!r}); sequential headline",
              file=sys.stderr)

    # Decode-stage tok/s — the reference's tok/s definition
    # (e2e_bench.rs:236: tokens / decode-stage time).  Stage split via
    # forced value fetches, same methodology as benches/e2e_bench.py.
    from voxtral_tpu.audio import MelSpectrogram

    mel_x = MelSpectrogram.voxtral()
    chunks = chunk_audio(audio.samples, pipeline.chunk_config)
    decode_s, stage_tokens = 0.0, 0

    def stage_pass(spec=0):
        dec, toks = 0.0, 0
        for ch in chunks:
            padded = pad_audio(AudioBuffer(ch.samples, sr),
                               pipeline.pad_config)
            logmel = mel_x.compute_log_batch(padded.samples)
            t0 = time.perf_counter()
            embeds = model.encode_audio(model._cast_mel(logmel))
            np.asarray(embeds[0, 0, :1])  # true sync (tunnel-safe)
            enc = time.perf_counter() - t0
            t0 = time.perf_counter()
            tokens = model.transcribe_streaming(logmel, delay_tokens=6.0,
                                                speculative=spec)
            full = time.perf_counter() - t0
            dec += max(0.0, full - enc)
            toks += len(tokens)
        return dec, toks

    stage_pass()  # warmup (separate encode entry point compiles here)
    stage_runs = [stage_pass() for _ in range(ITERATIONS)]
    decode_s = float(np.median([d for d, _ in stage_runs]))
    stage_tokens = stage_runs[0][1]
    tok_s_decode = stage_tokens / max(decode_s, 1e-9)
    print(f"# decode stage: {decode_s*1000:.0f} ms, {stage_tokens} tokens "
          f"-> {tok_s_decode:.1f} tok/s (reference definition)",
          file=sys.stderr)

    tok_s_decode_spec = None
    if spec_identical:
        stage_pass(spec=8)  # warmup/compile
        spec_stage = [stage_pass(spec=8) for _ in range(ITERATIONS)]
        dec_spec = float(np.median([d for d, _ in spec_stage]))
        tok_s_decode_spec = stage_tokens / max(dec_spec, 1e-9)
        print(f"# decode stage (spec K=8): {dec_spec*1000:.0f} ms -> "
              f"{tok_s_decode_spec:.1f} tok/s", file=sys.stderr)
        if tok_s_decode_spec > tok_s_decode:
            tok_s_decode = tok_s_decode_spec

    # Batch-8 aggregate throughput (one on-device scan decodes 8 files;
    # decode weights stream once per step for the whole batch).
    batch8_tok_s = None
    if len(chunks) == 1:
        padded = pad_audio(AudioBuffer(chunks[0].samples, sr),
                           pipeline.pad_config)
        logmel = mel_x.compute_log_batch(padded.samples)
        mel8 = jnp.tile(jnp.asarray(logmel), (8, 1, 1))
        tok8 = model.transcribe_streaming_batch(mel8, 6.0)  # warm/compile
        bt = []
        for _ in range(ITERATIONS):
            t0 = time.perf_counter()
            tok8 = model.transcribe_streaming_batch(mel8, 6.0)
            bt.append(time.perf_counter() - t0)
        bsecs = float(np.median(bt))
        batch8_tok_s = int(tok8.shape[0] * tok8.shape[1]) / bsecs
        print(f"# batch 8: {bsecs*1000:.0f} ms -> {batch8_tok_s:.0f} tok/s "
              f"aggregate", file=sys.stderr)

    # Definitions (they differ, and the reference reports the second):
    #  * tok/s (total)  = tokens / WALL time of the whole pipeline call —
    #    mel + encode + decode + tunnel roundtrip + host fetch.
    #  * tok/s (decode) = tokens / decode-stage time, the reference's
    #    definition (e2e_bench.rs:236) — measured by benches/e2e_bench.py
    #    and the chained-slope kernel bench (1000/ms_per_step).
    print(
        f"# total {total*1000:.0f} ms | RTF {rtf:.4f} "
        f"| {tok_s:.1f} tok/s (tokens/total-walltime incl. tunnel; the "
        f"reference's tok/s is tokens/decode-stage — see "
        f"benches/e2e_bench.py) | {n_tokens} tokens "
        f"| baseline RTF {BASELINE_RTF}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "rtf_16s",
                "value": round(rtf, 5),
                "unit": "ratio",
                "vs_baseline": round(BASELINE_RTF / rtf, 2),
                "tok_s_total_walltime": round(tok_s, 1),
                "tok_s_decode_stage": round(tok_s_decode, 1),
                "batch8_tok_s_aggregate": (
                    round(batch8_tok_s, 1) if batch8_tok_s else None
                ),
                "rtf_16s_sequential": round(rtf_seq, 5),
                "rtf_16s_speculative": (
                    round(rtf_spec, 5) if rtf_spec else None
                ),
                "speculative": {"k": 8, "draft": "ngram",
                                "tokens_identical": spec_identical},
                "definition": "RTF = wall/audio on the full pipeline "
                "(mel+encode+decode+fetch, 16 s audio); tok_s_decode_stage "
                "= tokens/decode-stage time (the reference's tok/s, "
                "e2e_bench.rs:236)",
            }
        )
    )


if __name__ == "__main__":
    main()
