#!/usr/bin/env python
"""WER evaluation harness (clone of the reference ``scripts/eval_wer.py``).

Flow (reference eval_wer.py:328-381): load a dataset -> write N wav files +
``audio_list.txt`` -> run the CLI ONCE over the list (model loads once; one
stdout line per file — the contract with the CLI) -> normalize + compute
per-utterance and aggregate WER/CER + RTF -> JSON report.

Datasets: FLEURS-en / LibriSpeech via HuggingFace ``datasets`` (needs
network), or ``--local-dir`` with ``<name>.wav`` + ``<name>.txt`` pairs for
air-gapped runs.  WER/CER are computed in-process
(:mod:`voxtral_tpu.utils.wer`; jiwer-equivalent normalization).

Usage:
  python scripts/eval_wer.py --local-dir data/ --model models/voxtral
  python scripts/eval_wer.py --dataset fleurs --num-samples 647 \
      --gguf model.gguf --tokenizer tekken.json --delay 6
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from voxtral_tpu.utils.wer import aggregate_wer


def load_local(local_dir: Path, limit: int) -> list[tuple[Path, str]]:
    pairs = []
    for wav in sorted(local_dir.glob("*.wav"))[:limit]:
        txt = wav.with_suffix(".txt")
        if txt.exists():
            pairs.append((wav, txt.read_text().strip()))
    return pairs


def load_hf_dataset(name: str, limit: int, workdir: Path) -> list[tuple[Path, str]]:
    """FLEURS-en / LibriSpeech via HF datasets (reference eval_wer.py:100-133)."""
    import datasets

    from voxtral_tpu.audio import AudioBuffer, save_wav

    if name == "fleurs":
        ds = datasets.load_dataset(
            "google/fleurs", "en_us", split="test", streaming=True
        )
        text_key = "transcription"
    elif name == "librispeech":
        ds = datasets.load_dataset(
            "openslr/librispeech_asr", "clean", split="test", streaming=True
        )
        text_key = "text"
    else:
        raise ValueError(f"Unknown dataset: {name}")

    pairs = []
    for i, ex in enumerate(ds):
        if i >= limit:
            break
        audio = ex["audio"]
        samples = np.asarray(audio["array"], dtype=np.float32)
        sr = int(audio["sampling_rate"])
        path = workdir / f"utt_{i:05d}.wav"
        save_wav(AudioBuffer(samples, sr), path)
        pairs.append((path, ex[text_key]))
    return pairs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["fleurs", "librispeech"])
    ap.add_argument("--local-dir", help="dir of <name>.wav + <name>.txt pairs")
    ap.add_argument("--num-samples", type=int, default=100)
    ap.add_argument("--model")
    ap.add_argument("--gguf")
    ap.add_argument("--tokenizer")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--params")
    ap.add_argument("--delay", type=float, default=6.0)
    ap.add_argument("--max-mel-frames", type=int, default=1200)
    ap.add_argument("--platform", default="default")
    ap.add_argument("--workdir", default="wer_eval_work")
    ap.add_argument("--output", default="wer_report.json")
    ap.add_argument("--batch", type=int, default=8,
                    help="in-process batched eval: decode up to N "
                    "same-length utterances in one on-device scan "
                    "(~Nx faster; 0 = shell the CLI per-list, the "
                    "reference contract)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "w8"],
                    help="SafeTensors weights (in-process mode)")
    ap.add_argument("--weight-format", default="w8",
                    choices=["q4", "q4g", "w8"],
                    help="GGUF weight handling (in-process mode; q4g = "
                    "exact Q4_0 on the fused stack kernel)")
    ap.add_argument("--speculative", type=int, default=0,
                    help="verify K drafted tokens per decode weight pass "
                    "(EXACT greedy tokens — WER is unchanged by "
                    "construction; only eval throughput moves)")
    ap.add_argument("--draft-policy", choices=["ngram", "pad"],
                    default="ngram")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel ways: shard eval batch rows over "
                    "the mesh's data axis (in-process mode)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel ways (in-process mode)")
    args = ap.parse_args()

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    if args.local_dir:
        pairs = load_local(Path(args.local_dir), args.num_samples)
    elif args.dataset:
        pairs = load_hf_dataset(args.dataset, args.num_samples, workdir)
    else:
        print("error: need --dataset or --local-dir", file=sys.stderr)
        return 2
    if not pairs:
        print("error: no (wav, transcript) pairs found", file=sys.stderr)
        return 2
    print(f"# {len(pairs)} utterances", file=sys.stderr)

    audio_list = workdir / "audio_list.txt"
    audio_list.write_text("\n".join(str(p) for p, _ in pairs) + "\n")

    def wav_duration_s(path: Path) -> float:
        """Header-only duration for PCM WAVs; full decode as fallback
        (float/24-bit formats, nonstandard chunks)."""
        import wave

        try:
            with wave.open(str(path), "rb") as w:
                return w.getnframes() / w.getframerate()
        except Exception:
            from voxtral_tpu.audio import load_wav

            return load_wav(path).duration_secs

    total_audio_s = sum(wav_duration_s(p) for p, _ in pairs)

    if args.batch > 0:
        hyps, elapsed = run_batched(args, pairs)
        if hyps is None:
            return 2
    else:
        out = run_cli_subprocess(args, audio_list, total_audio_s)
        if isinstance(out, int):
            return out
        hyps, elapsed = out
        if len(hyps) != len(pairs):
            print(
                f"error: expected {len(pairs)} output lines, got {len(hyps)}",
                file=sys.stderr,
            )
            return 1

    refs = [text for _, text in pairs]
    result = aggregate_wer(refs, hyps)
    rtf = elapsed / max(total_audio_s, 1e-9)

    report = {
        "wer": round(result["wer"], 4),
        "cer": round(result["cer"], 4),
        "utterances": result["utterances"],
        "word_errors": result["word_errors"],
        "words": result["words"],
        "audio_seconds": round(total_audio_s, 1),
        "wall_seconds": round(elapsed, 1),
        "rtf": round(rtf, 4),
        "delay": args.delay,
        "batch": args.batch,
        "per_utterance": [
            {"path": str(p), "ref": r, "hyp": h, **m}
            for (p, r), h, m in zip(pairs, hyps, result["per_utterance"])
        ],
    }
    Path(args.output).write_text(json.dumps(report, indent=2))
    print(
        f"WER {result['wer']*100:.2f}% | CER {result['cer']*100:.2f}% | "
        f"{result['utterances']} utts | RTF {rtf:.3f} | report -> {args.output}"
    )
    return 0


def run_batched(args, pairs):
    """In-process batched eval through TranscribePipeline (the SURVEY §2.6
    "DP (batch WER eval)" seam): model loads once, same-length utterances
    decode in one scan, optional --dp/--tp mesh."""
    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline
    from voxtral_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    mesh = None
    if args.tp * args.dp > 1:
        from voxtral_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=args.dp, n_model=args.tp)

    pcfg = PipelineConfig(delay_tokens=args.delay,
                          max_mel_frames=args.max_mel_frames,
                          speculative=args.speculative,
                          draft=args.draft_policy)
    if args.gguf:
        if not args.tokenizer:
            print("error: --gguf requires --tokenizer", file=sys.stderr)
            return None, 0.0
        pipeline = TranscribePipeline.from_gguf(
            args.gguf, args.tokenizer, pcfg,
            weight_format=args.weight_format, mesh=mesh)
    elif args.model:
        pipeline = TranscribePipeline.from_model_dir(
            args.model, args.dtype, pcfg, mesh=mesh)
    elif args.random_weights:
        import jax
        import jax.numpy as jnp

        from voxtral_tpu.config import VoxtralConfig
        from voxtral_tpu.models.voxtral import VoxtralModel
        from voxtral_tpu.tokenizer import VoxtralTokenizer

        cfg = (VoxtralConfig.from_file(args.params) if args.params
               else VoxtralConfig.voxtral())
        model = VoxtralModel.init_random(
            jax.random.PRNGKey(0), cfg,
            jnp.float32 if args.dtype == "float32" else jnp.bfloat16,
            mesh=mesh)
        pipeline = TranscribePipeline(
            model, VoxtralTokenizer([None] * 131072, {}, 131072), pcfg)
    else:
        print("error: need --model, --gguf or --random-weights",
              file=sys.stderr)
        return None, 0.0

    t0 = time.time()
    hyps = pipeline.transcribe_files_batched(
        [p for p, _ in pairs], batch_size=args.batch)
    return hyps, time.time() - t0


def run_cli_subprocess(args, audio_list, total_audio_s):
    """Reference-contract mode: shell the CLI once over the list
    (one stdout line per file — eval_wer.py:183-204)."""
    cmd = [
        sys.executable, "-m", "voxtral_tpu.cli",
        "--audio-list", str(audio_list),
        "--delay", str(args.delay),
        "--max-mel-frames", str(args.max_mel_frames),
        "--platform", args.platform,
    ]
    if args.gguf:
        if not args.tokenizer:
            print("error: --gguf requires --tokenizer", file=sys.stderr)
            return 2
        cmd += ["--gguf", args.gguf, "--tokenizer", args.tokenizer]
    elif args.model:
        cmd += ["--model", args.model]
    elif args.random_weights:
        cmd += ["--random-weights"]
        if args.params:
            cmd += ["--params", args.params]
    else:
        print("error: need --model, --gguf or --random-weights", file=sys.stderr)
        return 2

    # Timeout scaled to audio duration (reference eval_wer.py:193-204).
    timeout = max(600, int(total_audio_s * 4) + 300)

    t0 = time.time()
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout,
        cwd=Path(__file__).parent.parent,
    )
    elapsed = time.time() - t0
    if proc.returncode != 0:
        print(proc.stderr[-3000:], file=sys.stderr)
        return proc.returncode
    return proc.stdout.splitlines(), elapsed


if __name__ == "__main__":
    sys.exit(main())
