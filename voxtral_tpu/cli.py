"""voxtral-transcribe CLI.

Flag contract mirrors the reference (``/root/reference/src/bin/transcribe.rs:27-58``):
``--audio`` (repeatable) / ``--audio-list`` batch file, ``--model`` dir or
``--gguf`` + ``--tokenizer``, ``--delay`` (default 6), ``--max-mel-frames``
(default 1200).  The model loads once; one line of text per audio file on
stdout; logs on stderr.

Extensions: ``--dtype`` (bfloat16|float32) for the SafeTensors path, and
``--random-weights`` to exercise the full pipeline without downloaded
weights (CI / smoke tests).

Usage:  python -m voxtral_tpu.cli --audio x.wav --model models/voxtral
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="voxtral-transcribe",
        description="Transcribe audio using Voxtral Mini 4B Realtime (TPU)",
    )
    p.add_argument(
        "-a", "--audio", action="append", default=[],
        help="Path to WAV audio file; repeatable for batch processing",
    )
    p.add_argument(
        "--audio-list",
        help="File containing audio paths (one per line); model loads once",
    )
    p.add_argument(
        "-m", "--model", default="models/voxtral",
        help="f32 model directory (consolidated.safetensors + tekken.json)",
    )
    p.add_argument(
        "--gguf", help="Q4 GGUF model file (instead of --model)",
    )
    p.add_argument(
        "--tokenizer", help="Tokenizer JSON path (default: <model>/tekken.json)",
    )
    p.add_argument(
        "-d", "--delay", type=float, default=6.0,
        help="Delay in tokens (1 token = 80 ms); default 6 = 480 ms",
    )
    p.add_argument(
        "--batch-files", type=int, default=0, metavar="N",
        help="Decode up to N same-length files in one on-device scan "
        "(multi-file throughput; output order is preserved).  0 = "
        "sequential per-file (the reference's behavior)",
    )
    p.add_argument(
        "--max-mel-frames", type=int, default=3000,
        help="Max mel frames per chunk (reference defaults to 1200 for "
        "WebGPU shared-memory limits, transcribe.rs:56-57; TPU has no "
        "such limit and each extra chunk re-pays the decode prefix)",
    )
    p.add_argument(
        "--dtype", choices=["bfloat16", "float32", "w8"], default="bfloat16",
        help="SafeTensors path weights: bfloat16/float32, or w8 "
        "(rowwise-int8 requantized at load — fastest decode)",
    )
    p.add_argument(
        "--random-weights", action="store_true",
        help="Run with random production-shape weights (no model download)",
    )
    p.add_argument(
        "--params",
        help="params.json overriding the architecture (with --random-weights)",
    )
    p.add_argument(
        "--weight-format", choices=["q4", "q4g", "w8"], default="w8",
        help="GGUF path: q4 keeps int4 (min HBM, per-op kernels); q4g "
        "keeps exact Q4_0 numerics on the fused stack kernel (codes + "
        "f16 group scales, +12.5%% HBM bytes/step vs w8); w8 requantizes "
        "to rowwise int8 at load (fastest decode on v5e; default)",
    )
    p.add_argument(
        "--platform", choices=["default", "cpu", "tpu"], default="default",
        help="Force the JAX platform (the JAX_PLATFORMS env var is "
        "unreliable when a TPU plugin is installed)",
    )
    p.add_argument(
        "--tp", type=int, default=1,
        help="Tensor-parallel ways (shards attention heads / FFN / the "
        "131k-vocab lm_head over the mesh's model axis; needs tp*dp "
        "devices).  Beyond reference parity — it is single-device only",
    )
    p.add_argument(
        "--dp", type=int, default=1,
        help="Data-parallel ways (shards batched chunk rows over the "
        "mesh's data axis; the WER harness's batch eval axis)",
    )
    p.add_argument(
        "--timestamps", action="store_true",
        help="Emit word-level timestamps (one JSON line per file: "
        "{file, text, words:[{word, start, end}]}), derived from the "
        "model's [STREAMING_WORD] markers (1 decoder position = 160 ms, "
        "delay-corrected).  Beyond reference parity",
    )
    p.add_argument(
        "--params-cache", metavar="DIR",
        help="Directory caching converted/quantized weight pytrees: the "
        "first load pays GGUF repack / w8 requantization and saves the "
        "device-format tree; later runs memmap-restore it (the reference's "
        "staged-load role, gguf/loader.rs:130-188)",
    )
    p.add_argument(
        "--speculative", type=int, default=0, metavar="K",
        help="Verify K drafted tokens per decode weight pass (greedy "
        "only; EXACT same tokens, fewer passes when drafts hit — up to "
        "Kx decode throughput on repetitive output).  Needs the fused "
        "stack-kernel path; ignored elsewhere.  Beyond reference parity",
    )
    p.add_argument(
        "--draft-policy", choices=["ngram", "pad"], default="ngram",
        help="Speculative draft source: ngram = device-resident bigram "
        "table trained in place per verification pass; pad = constant "
        "[STREAMING_PAD] drafts (silence regime only)",
    )
    p.add_argument(
        "--server", metavar="URL",
        help="Transcribe via a running voxtral-serve host "
        "(http://host:port) instead of loading weights locally — no JAX "
        "or model download needed on this machine; supports --audio/"
        "--audio-list and --timestamps.  Beyond reference parity",
    )
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def _run_remote(args, audio_paths: list[str]) -> int:
    """--server mode: thin client over voxtral_tpu.client (stdlib-only;
    no JAX import) with the same per-file output/exit-code contract as
    local decoding."""
    import json

    from voxtral_tpu.client import ServerError, VoxtralClient

    try:
        client = VoxtralClient(args.server)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    status = 0
    for path in audio_paths:
        if not Path(path).exists():
            print(f"error: audio file not found: {path}", file=sys.stderr)
            status = 1
            print("")
            continue
        try:
            result = client.transcribe(path, timestamps=args.timestamps)
        except (ServerError, OSError) as e:
            print(f"error: transcription failed for {path}: {e}",
                  file=sys.stderr)
            status = 1
            print("")
            continue
        if args.timestamps:
            print(json.dumps({"file": str(path), "text": result["text"],
                              "words": result.get("words", [])}),
                  flush=True)
        else:
            print(result["text"], flush=True)
    return status


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    logging.basicConfig(
        stream=sys.stderr,
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
    )
    log = logging.getLogger("voxtral_tpu")

    if args.audio_list:
        if args.audio:
            print("error: --audio conflicts with --audio-list", file=sys.stderr)
            return 2
        list_path = Path(args.audio_list)
        if not list_path.exists():
            print(f"error: audio list not found: {list_path}", file=sys.stderr)
            return 2
        audio_paths = [
            line.strip()
            for line in list_path.read_text().splitlines()
            if line.strip()
        ]
    else:
        audio_paths = args.audio

    if not audio_paths:
        print("error: no audio files specified (--audio or --audio-list)", file=sys.stderr)
        return 2
    if args.max_mel_frames <= 0:
        print("error: --max-mel-frames must be greater than 0", file=sys.stderr)
        return 2
    if args.gguf and not (args.tokenizer or args.random_weights):
        print("error: --gguf requires --tokenizer", file=sys.stderr)
        return 2
    if args.timestamps and args.batch_files > 0:
        # Pure flag validation — must run before any model construction.
        print("error: --timestamps is per-file (drop --batch-files)",
              file=sys.stderr)
        return 2
    if args.server:
        for flag, given in (("--gguf", args.gguf),
                            ("--random-weights", args.random_weights),
                            ("--batch-files", args.batch_files > 0),
                            ("--tp", args.tp > 1), ("--dp", args.dp > 1)):
            if given:
                print(f"error: {flag} conflicts with --server (decode "
                      "configuration lives on the serving host)",
                      file=sys.stderr)
                return 2
        return _run_remote(args, audio_paths)

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)

    from voxtral_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()

    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline

    pcfg = PipelineConfig(
        delay_tokens=args.delay, max_mel_frames=args.max_mel_frames,
        speculative=args.speculative, draft=args.draft_policy,
    )

    mesh = None
    if args.tp < 1 or args.dp < 1:
        print("error: --tp/--dp must be >= 1", file=sys.stderr)
        return 2
    if args.tp * args.dp > 1:
        import jax

        from voxtral_tpu.parallel import make_mesh

        n_dev = len(jax.devices())
        if args.tp * args.dp > n_dev:
            print(
                f"error: --tp {args.tp} x --dp {args.dp} needs "
                f"{args.tp * args.dp} devices, found {n_dev}",
                file=sys.stderr,
            )
            return 2
        mesh = make_mesh(n_data=args.dp, n_model=args.tp)
        log.info("mesh: %d data x %d model over %d devices",
                 args.dp, args.tp, args.dp * args.tp)

    if args.random_weights:
        import jax
        import jax.numpy as jnp

        from voxtral_tpu.config import VoxtralConfig
        from voxtral_tpu.models.voxtral import VoxtralModel
        from voxtral_tpu.tokenizer import VoxtralTokenizer

        log.info("initializing random production-shape weights (--random-weights)")
        cfg = (
            VoxtralConfig.from_file(args.params)
            if args.params
            else VoxtralConfig.voxtral()
        )
        if args.dtype == "w8":
            from voxtral_tpu.utils.quantize import random_w8_params

            model = VoxtralModel(random_w8_params(cfg), cfg, mesh=mesh)
        else:
            model = VoxtralModel.init_random(
                jax.random.PRNGKey(0),
                cfg,
                dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                else jnp.float32,
                mesh=mesh,
            )
        if args.tokenizer:
            tokenizer = VoxtralTokenizer.from_file(args.tokenizer)
        else:
            tokenizer = VoxtralTokenizer(
                [None] * 131072, {1: "<s>", 32: "[STREAMING_PAD]"}, 131072
            )
        pipeline = TranscribePipeline(model, tokenizer, pcfg)
    elif args.gguf:
        if not Path(args.gguf).exists():
            print(f"error: GGUF file not found: {args.gguf}", file=sys.stderr)
            return 2
        from voxtral_tpu.config import VoxtralConfig

        cfg = VoxtralConfig.from_file(args.params) if args.params else None
        try:
            pipeline = TranscribePipeline.from_gguf(
                args.gguf, args.tokenizer, pcfg, config=cfg,
                weight_format=args.weight_format, mesh=mesh,
                params_cache=args.params_cache,
            )
        except (ValueError, EOFError, KeyError) as e:
            print(f"error: failed to load GGUF model: {e}", file=sys.stderr)
            return 2
    else:
        model_dir = Path(args.model)
        if not (model_dir / "consolidated.safetensors").exists():
            print(
                f"error: model not found at {model_dir} "
                "(expected consolidated.safetensors)",
                file=sys.stderr,
            )
            return 2
        pipeline = TranscribePipeline.from_model_dir(
            model_dir, args.dtype, pcfg, mesh=mesh,
            params_cache=args.params_cache)

    if args.batch_files > 0:
        missing = [p for p in audio_paths if not Path(p).exists()]
        for p in missing:
            print(f"error: audio file not found: {p}", file=sys.stderr)
        present = [p for p in audio_paths if Path(p).exists()]
        try:
            texts = dict(zip(present, pipeline.transcribe_files_batched(
                present, batch_size=args.batch_files)))
        except Exception as e:
            print(f"error: batched transcription failed: {e}",
                  file=sys.stderr)
            return 1
        for p in audio_paths:
            print(texts.get(p, ""), flush=True)
        return 1 if missing else 0

    status = 0
    for path in audio_paths:
        if not Path(path).exists():
            print(f"error: audio file not found: {path}", file=sys.stderr)
            status = 1
            print("")
            continue
        try:
            if args.timestamps:
                import json

                result = pipeline.transcribe_file_words(path)
                print(json.dumps({"file": str(path), **result}), flush=True)
                continue
            text = pipeline.transcribe_file(path)
        except Exception as e:
            # The reference converts GPU shared-memory panics into an
            # actionable hint (transcribe.rs:327-359); same idea for
            # device OOM on long chunks.
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
                print(
                    f"error: device out of memory on {path}; try a smaller "
                    f"--max-mel-frames (current {args.max_mel_frames})",
                    file=sys.stderr,
                )
            else:
                print(f"error: transcription failed for {path}: {e}",
                      file=sys.stderr)
            status = 1
            print("")
            continue
        print(text, flush=True)
    return status


if __name__ == "__main__":
    sys.exit(main())
