#!/usr/bin/env python
"""Multi-host data-parallel batched transcription worker.

One process per host; batch rows shard across hosts over the mesh's
data axis (weights replicated — the DP decode needs zero collectives,
parallel/dp_decode.py) while any ``--tp`` model groups stay intra-host.
Each process feeds ONLY its local rows and fetches ONLY its local
tokens.  With ``--num-processes 1`` this is a plain single-process DP
run (the reference output for ``tests/test_multihost.py``).

Launch (one command per host, same flags except --process-id):

    python scripts/multihost_dp.py \
        --coordinator host0:9999 --num-processes 2 --process-id $I \
        --model models/voxtral --dtype w8 --audio-list files.txt \
        --out rows_$I.json

The CPU harness (no TPU pod needed) adds ``--platform cpu
--virtual-devices 4`` per process.  Beyond reference parity: the
reference serializes everything on one wgpu queue
(/root/reference/src/bin/transcribe.rs); SURVEY.md §2.6 names DP batch
eval as the mesh seam's purpose.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (omit for single-process)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--init-timeout", type=int, default=None,
                   help="seconds to wait for the full cluster at startup "
                   "(fail fast on dead/missing workers)")
    p.add_argument("--platform", choices=["default", "cpu", "tpu"],
                   default="default")
    p.add_argument("--virtual-devices", type=int, default=0,
                   help="CPU harness: per-process virtual device count")
    p.add_argument("--tp", type=int, default=1,
                   help="model-parallel ways WITHIN each host")
    p.add_argument("--model", help="f32/bf16 model dir (safetensors)")
    p.add_argument("--gguf", help="Q4 GGUF model file")
    p.add_argument("--tokenizer", help="tekken.json (with --model/--gguf)")
    p.add_argument("--dtype", choices=["bfloat16", "float32", "w8"],
                   default="w8")
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--params", help="params.json architecture override")
    p.add_argument("--audio", action="append", default=[],
                   help="WAV path; repeatable — rows shard across hosts")
    p.add_argument("--audio-list", help="file of WAV paths, one per line")
    p.add_argument("--synthetic-rows", type=int, default=0,
                   help="generate N deterministic synthetic rows instead "
                   "of reading audio (validation/benchmark mode)")
    p.add_argument("--seconds", type=float, default=4.0,
                   help="synthetic row duration")
    p.add_argument("--delay", type=float, default=6.0)
    p.add_argument("--out", help="write {global_row: tokens} JSON here")
    return p


def _synthetic_row(i: int, seconds: float) -> "np.ndarray":
    """Deterministic per-global-row audio (all hosts can regenerate any
    row, so only the row INDICES need coordinating)."""
    import numpy as np

    rng = np.random.default_rng(1000 + i)
    n = int(16000 * seconds)
    t = np.arange(n) / 16000.0
    f = 220.0 * (1 + (i % 5))
    return (0.35 * np.sin(2 * np.pi * f * t)
            + 0.15 * rng.normal(size=n)).astype(np.float32)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform != "default":
        os.environ["JAX_PLATFORMS"] = args.platform
    if args.virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.virtual_devices}").strip()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    from voxtral_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    if args.num_processes > 1:
        if not args.coordinator:
            print("error: --coordinator required with --num-processes > 1",
                  file=sys.stderr)
            return 2
        from voxtral_tpu.parallel.multihost import init_multihost

        init_multihost(args.coordinator, args.num_processes,
                       args.process_id,
                       initialization_timeout=args.init_timeout)

    import numpy as np
    import jax.numpy as jnp

    from voxtral_tpu.audio.mel import MelSpectrogram
    from voxtral_tpu.audio.pad import PadConfig, pad_audio
    from voxtral_tpu.parallel.multihost import (
        global_batch,
        local_rows,
        make_multihost_mesh,
        process_row_range,
    )

    mesh = make_multihost_mesh(n_model=args.tp)
    dp = mesh.shape["data"]
    print(f"[{args.process_id}] mesh: {dp} data x {args.tp} model over "
          f"{jax.device_count()} devices ({jax.process_count()} hosts)",
          flush=True)

    # -- model (every process constructs identically; shard_params places
    #    each host's slice of the global shardings) ------------------------
    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.voxtral import VoxtralModel

    if args.random_weights:
        cfg = (VoxtralConfig.from_file(args.params) if args.params
               else VoxtralConfig.voxtral())
        if args.dtype == "w8":
            from voxtral_tpu.utils.quantize import random_w8_params

            model = VoxtralModel(random_w8_params(cfg), cfg, mesh=mesh)
        else:
            model = VoxtralModel.init_random(
                jax.random.PRNGKey(0), cfg,
                dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                else jnp.float32,
                mesh=mesh)
    elif args.gguf:
        from voxtral_tpu.pipeline import TranscribePipeline

        model = TranscribePipeline.from_gguf(
            args.gguf, args.tokenizer, weight_format="w8", mesh=mesh).model
    elif args.model:
        from voxtral_tpu.pipeline import TranscribePipeline

        model = TranscribePipeline.from_model_dir(
            args.model, dtype=args.dtype, mesh=mesh).model
    else:
        print("error: need --model, --gguf or --random-weights",
              file=sys.stderr)
        return 2

    # -- batch rows --------------------------------------------------------
    if args.synthetic_rows:
        n_rows = args.synthetic_rows
        if n_rows % dp:
            print(f"error: --synthetic-rows {n_rows} must divide over the "
                  f"data axis ({dp})", file=sys.stderr)
            return 2
        lo, hi = process_row_range(n_rows)
        samples = [_synthetic_row(i, args.seconds) for i in range(lo, hi)]
    else:
        paths = list(args.audio)
        if args.audio_list:
            paths += [ln.strip()
                      for ln in open(args.audio_list).read().splitlines()
                      if ln.strip()]
        if not paths:
            print("error: no rows (--audio/--audio-list/--synthetic-rows)",
                  file=sys.stderr)
            return 2
        if len(paths) % dp:
            print(f"error: {len(paths)} rows must divide over the data "
                  f"axis ({dp}); pad the file list", file=sys.stderr)
            return 2
        from voxtral_tpu.audio.io import load_wav
        from voxtral_tpu.audio.resample import resample_to_16k

        lo, hi = process_row_range(len(paths))
        samples = [
            resample_to_16k(load_wav(p)).peak_normalize(0.95).samples
            for p in paths[lo:hi]]
        # Equal-length rows: every host pads to the GLOBAL max sample
        # count (each host only loads its own slice, so the max is
        # agreed with one tiny allgather).
        local_max = max(s.size for s in samples)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            gmax = int(multihost_utils.process_allgather(
                np.int32(local_max)).max())
        else:
            gmax = local_max
        samples = [np.pad(s, (0, gmax - s.size)) for s in samples]

    from voxtral_tpu.audio.io import AudioBuffer

    pad_cfg = PadConfig.voxtral()
    padded = [pad_audio(AudioBuffer(s, 16000), pad_cfg).samples
              for s in samples]
    width = max(p.size for p in padded)
    rows_pcm = [np.pad(p, (0, width - p.size)) for p in padded]
    mel = MelSpectrogram.voxtral()
    logmel = np.concatenate(
        [mel.compute_log_batch(r) for r in rows_pcm], axis=0
    )  # [rows_local, n_mels, T]
    print(f"[{args.process_id}] local rows {lo}..{hi - 1}, mel "
          f"{logmel.shape}", flush=True)

    gmel = global_batch(mesh, np.asarray(logmel))
    tokens = model.transcribe_streaming_batch_async(
        jnp.asarray(gmel, model.compute_dtype), delay_tokens=args.delay)
    rows = {int(k): np.asarray(v).tolist()
            for k, v in local_rows(tokens).items()}
    print(f"[{args.process_id}] decoded rows {sorted(rows)}", flush=True)
    if args.out:
        json.dump(rows, open(args.out, "w"))
    else:
        print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
