#!/usr/bin/env python
"""Stage-timed end-to-end benchmark (clone of the reference e2e-bench,
``/root/reference/src/bin/e2e_bench.rs``): preprocess / encode / decode ms,
RTF, tok/s, peak RSS, warmup + N averaged iterations, table + JSON report.

Stages are separated with explicit value-fetch syncs, mirroring the
reference's forced GPU syncs (e2e_bench.rs:166).  NOTE: per-stage syncs
break device-queue pipelining (and run the encoder once standalone), so
the stage SPLIT is diagnostic; the deployable end-to-end wall time is
what ``bench.py`` measures (the async full pipeline).

Usage:
  python benches/e2e_bench.py [--model DIR | --gguf F --tokenizer T |
                               --random-weights] [--seconds 16]
                              [--iterations 3] [--json out.json]
                              [--platform default|cpu|tpu] [--params P]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def peak_rss_mb() -> float:
    """Peak resident set from /proc/self/status (e2e_bench.rs:62-95)."""
    try:
        for line in Path("/proc/self/status").read_text().splitlines():
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "w8"],
                    help="weights for --model (w8 = fast decode path)")
    ap.add_argument("--gguf")
    ap.add_argument("--tokenizer")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--params", help="params.json for --random-weights")
    ap.add_argument("--q4-random", action="store_true",
                    help="random weights quantized to Q4_0 (kernel path)")
    ap.add_argument("--w8-random", action="store_true",
                    help="random rowwise-int8 weights (int8 MXU path)")
    ap.add_argument("--q4g-random", action="store_true",
                    help="random Q4_0 weights kept in the exact group-32 "
                    "form (the q4g fused stack-kernel mode)")
    ap.add_argument("--seconds", type=float, default=16.0)
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--delay", type=float, default=6.0)
    ap.add_argument("--batch", type=int, default=1,
                    help=">1: additionally measure batched transcribe "
                    "throughput (N files decoded in one on-device scan; "
                    "decode weights stream once per step for the whole "
                    "batch)")
    ap.add_argument("--max-mel-frames", type=int, default=3000,
                    help="chunk cap (TPU product default; the reference's "
                    "1500 is a WebGPU shared-memory artifact)")
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="verify K drafted tokens per decode weight pass "
                    "(EXACT greedy tokens; bigram drafts trained "
                    "in-run).  Token identity vs the sequential scan is "
                    "asserted on the first iteration")
    ap.add_argument("--json")
    ap.add_argument("--platform", choices=["default", "cpu", "tpu"],
                    default="default")
    args = ap.parse_args()

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()

    from voxtral_tpu.audio import (
        AudioBuffer,
        ChunkConfig,
        MelSpectrogram,
        PadConfig,
        chunk_audio,
        pad_audio,
    )
    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.voxtral import VoxtralModel

    t0 = time.time()
    if args.model:
        from voxtral_tpu.pipeline import TranscribePipeline

        pipe = TranscribePipeline.from_model_dir(args.model, args.dtype)
        model = pipe.model
        mode = args.dtype
    elif args.gguf:
        from voxtral_tpu.loaders.gguf_loader import load_q4_model

        model = load_q4_model(args.gguf)
        mode = "q4"
    else:
        cfg = (
            VoxtralConfig.from_file(args.params)
            if args.params
            else VoxtralConfig.voxtral()
        )
        if args.w8_random:
            from voxtral_tpu.utils.quantize import random_w8_params

            model = VoxtralModel(random_w8_params(cfg), cfg)
            mode = "random-w8"
        elif args.q4_random:
            from voxtral_tpu.utils.quantize import random_q4_params

            model = VoxtralModel(random_q4_params(cfg), cfg)
            mode = "random-q4"
        elif args.q4g_random:
            from voxtral_tpu.utils.quantize import random_q4_params

            model = VoxtralModel(random_q4_params(cfg, pack=False), cfg)
            assert model.megakernel_weights == "q4g", "q4g routing lost"
            mode = "random-q4g"
        else:
            model = VoxtralModel.init_random(jax.random.PRNGKey(0), cfg,
                                             dtype=jnp.bfloat16)
            mode = "random-bf16"
    load_s = time.time() - t0
    print(f"# model loaded ({mode}) in {load_s:.1f}s, "
          f"backend={jax.default_backend()}", file=sys.stderr)

    sr = 16000
    t = np.arange(int(args.seconds * sr)) / sr
    sig = (0.5 * np.sin(2 * np.pi * (180 + 120 * t) * t)).astype(np.float32)
    audio = AudioBuffer(sig, sr)
    audio.peak_normalize(0.95)

    mel_x = MelSpectrogram.voxtral()
    pad_cfg = PadConfig.voxtral()
    chunks = chunk_audio(
        audio.samples,
        ChunkConfig.voxtral().with_max_frames(args.max_mel_frames),
    )

    def iteration():
        stages = {"preprocess": 0.0, "encode": 0.0, "decode": 0.0}
        n_tokens = 0
        for ch in chunks:
            t0 = time.perf_counter()
            padded = pad_audio(AudioBuffer(ch.samples, sr), pad_cfg)
            logmel = mel_x.compute_log_batch(padded.samples)
            stages["preprocess"] += time.perf_counter() - t0

            # Encode stage timed separately with a forced device sync.
            # NOTE: a VALUE FETCH, not block_until_ready — the latter does
            # not actually block over tunneled TPU transports.
            t0 = time.perf_counter()
            mel_dev = model._cast_mel(logmel)
            embeds = model.encode_audio(mel_dev)
            np.asarray(embeds[0, 0, :1])
            chunk_encode = time.perf_counter() - t0
            stages["encode"] += chunk_encode

            # Decode = full transcribe minus THIS CHUNK's encode; the
            # jitted program fuses both, so time the whole and subtract.
            t0 = time.perf_counter()
            tokens = model.transcribe_streaming(
                logmel, delay_tokens=args.delay,
                speculative=args.speculative)
            full = time.perf_counter() - t0
            stages["decode"] += max(0.0, full - chunk_encode)
            n_tokens += len(tokens)
        return stages, n_tokens

    # Warmup (compiles both entry points).
    t0 = time.time()
    iteration()
    print(f"# warmup {time.time()-t0:.1f}s", file=sys.stderr)

    if args.speculative >= 2:
        # Speculative decode must be invisible in the tokens.
        for ch in chunks[:1]:
            padded = pad_audio(AudioBuffer(ch.samples, sr), pad_cfg)
            logmel = mel_x.compute_log_batch(padded.samples)
            seq = model.transcribe_streaming(logmel, delay_tokens=args.delay)
            spc = model.transcribe_streaming(
                logmel, delay_tokens=args.delay,
                speculative=args.speculative)
            assert (seq == spc).all(), "speculative tokens diverged"
        print("# speculative tokens identical to sequential",
              file=sys.stderr)

    agg = {"preprocess": [], "encode": [], "decode": [], "total": []}
    n_tokens = 0
    for i in range(args.iterations):
        stages, n_tokens = iteration()
        total = sum(stages.values())
        for k, v in stages.items():
            agg[k].append(v)
        agg["total"].append(total)
        print(f"# iter {i}: total {total*1000:.0f} ms", file=sys.stderr)

    mean = {k: float(np.mean(v)) for k, v in agg.items()}
    rtf = mean["total"] / args.seconds
    tok_s = n_tokens / max(mean["decode"], 1e-9)

    report = {
        "mode": mode,
        "audio_seconds": args.seconds,
        "chunks": len(chunks),
        "tokens": n_tokens,
        "preprocess_ms": round(mean["preprocess"] * 1000, 1),
        "encode_ms": round(mean["encode"] * 1000, 1),
        "decode_ms": round(mean["decode"] * 1000, 1),
        "total_ms": round(mean["total"] * 1000, 1),
        "rtf": round(rtf, 4),
        "tok_per_s": round(tok_s, 1),
        "peak_rss_mb": round(peak_rss_mb(), 1),
        "backend": jax.default_backend(),
        "model_load_s": round(load_s, 1),
        "speculative": args.speculative,
    }

    print(f"\n{'stage':<12}{'ms':>10}")
    for k in ("preprocess", "encode", "decode", "total"):
        print(f"{k:<12}{mean[k]*1000:>10.1f}")
    print(f"\nRTF {rtf:.4f} | {tok_s:.1f} tok/s | {n_tokens} tokens "
          f"| peak RSS {report['peak_rss_mb']:.0f} MB")

    if args.batch > 1 and len(chunks) == 1:
        # Batched-file throughput: B copies of the mel decoded in one
        # on-device scan — weights stream ONCE per decode step for the
        # whole batch (the HBM-bound regime, so B rides nearly free).
        padded = pad_audio(AudioBuffer(chunks[0].samples, sr), pad_cfg)
        logmel = mel_x.compute_log_batch(padded.samples)
        mel_b = jnp.tile(jnp.asarray(logmel), (args.batch, 1, 1))
        tok_b = model.transcribe_streaming_batch(mel_b, args.delay)  # warm
        times = []
        for _ in range(args.iterations):
            t0 = time.perf_counter()
            tok_b = model.transcribe_streaming_batch(mel_b, args.delay)
            times.append(time.perf_counter() - t0)
        bt = float(np.median(times))
        total_tokens = int(tok_b.shape[0] * tok_b.shape[1])
        report.update({
            "batch": args.batch,
            "batch_total_ms": round(bt * 1000, 1),
            "batch_tok_per_s": round(total_tokens / bt, 1),
            "batch_rtf_per_file": round(bt / (args.seconds * args.batch), 4),
        })
        print(f"batch {args.batch}: {bt*1000:.0f} ms | "
              f"{report['batch_tok_per_s']:.0f} tok/s aggregate | "
              f"RTF/file {report['batch_rtf_per_file']:.4f}")

    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=2))
        print(f"# wrote {args.json}", file=sys.stderr)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
