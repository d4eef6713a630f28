#!/usr/bin/env python
"""Real-time streaming latency benchmark.

Feeds audio into a StreamingSession in real-time-sized pieces and reports
the steady-state step wall time — the time from a step's audio being
available to its tokens being decoded.  For true real-time operation the
step time must stay under the step's audio span (P x 160 ms).

Weights: full-size random W8 by default; pass --params <params.json> for
a small dense random model (CPU smoke runs).

Usage: python benches/streaming_bench.py [--seconds 30] [--step 8]
       [--platform ...] [--params tiny.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--step", type=int, default=8)
    ap.add_argument("--platform", default="default")
    ap.add_argument("--params")
    ap.add_argument("--sessions", type=int, default=1,
                    help=">1: coalesce N lockstep sessions through a "
                    "StreamPool and report the batched step time")
    ap.add_argument("--unbounded", action="store_true",
                    help="head+ring KV caches (in-kernel eviction); "
                    "with --sessions N > 1 the POOL is unbounded")
    ap.add_argument("--kv", default="auto",
                    choices=["auto", "model", "int8"],
                    help="pooled KV cache dtype (int8 halves VMEM/HBM)")
    ap.add_argument("--burst", action="store_true",
                    help="catch-up throughput: feed ALL audio at once and "
                    "time one backlogged pump (deferred token fetches "
                    "overlap the per-step host roundtrips)")
    ap.add_argument("--speculative", type=int, default=0,
                    help="K>=2: solo sessions verify K drafted tokens per "
                    "weight pass (exact greedy)")
    ap.add_argument("--draft-token", default="32",
                    help="draft token id, or 'auto' = probe the model's "
                    "dominant output on a warmup clip (random weights "
                    "emit a constant token, so 'auto' yields the "
                    "forced-acceptance throughput CEILING; real weights "
                    "keep the default [STREAMING_PAD]=32 silence draft)")
    args = ap.parse_args()

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.utils.compilation_cache import enable

    enable()

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession
    from voxtral_tpu.utils.quantize import random_w8_params

    cfg = (
        VoxtralConfig.from_file(args.params)
        if args.params
        else VoxtralConfig.voxtral()
    )
    t0 = time.time()
    if args.params:
        model = VoxtralModel.init_random(jax.random.PRNGKey(0), cfg, jnp.float32)
    else:
        model = VoxtralModel(random_w8_params(cfg), cfg)
    print(f"# model ready in {time.time()-t0:.0f}s, "
          f"backend={jax.default_backend()}", file=sys.stderr)

    step_audio_ms = args.step * 160.0
    rng = np.random.default_rng(0)
    total = int(args.seconds * 16000)
    piece = int(step_audio_ms / 1000 * 16000)  # one step of audio per feed

    draft_token = 32
    if args.speculative > 1 and args.draft_token == "auto":
        # Probe the model's dominant output token: the streaming-level
        # acceptance ceiling with random weights (real weights would
        # draft [STREAMING_PAD] and accept through silence instead).
        probe = StreamingSession(model, step_positions=args.step)
        probe.feed(rng.normal(size=16000 * 4).astype(np.float32) * 0.2)
        probe.finish()
        vals, counts = np.unique(np.asarray(probe.tokens),
                                 return_counts=True)
        draft_token = int(vals[np.argmax(counts)])
        frac = counts.max() / counts.sum()
        print(f"# draft-token auto: {draft_token} "
              f"({frac:.0%} of probe output)", file=sys.stderr)
    elif args.draft_token != "auto":
        draft_token = int(args.draft_token)
    spec_kw = ({"speculative": args.speculative,
                "draft_token": draft_token}
               if args.speculative > 1 else {})

    if args.sessions > 1:
        from voxtral_tpu.streaming import StreamPool

        pool = StreamPool(model, max_streams=args.sessions,
                          step_positions=args.step,
                          max_duration_s=args.seconds + 10,
                          unbounded=args.unbounded, kv_dtype=args.kv,
                          **spec_kw)
        sessions = [
            StreamingSession(model, step_positions=args.step, pool=pool)
            for _ in range(args.sessions)
        ]
    else:
        sessions = [StreamingSession(model, step_positions=args.step,
                                     unbounded=args.unbounded, **spec_kw)]

    if args.burst:
        # Warmup session compiles init + steady step, then a fresh
        # session replays the whole recording in ONE backlogged pump.
        audio_w = rng.normal(size=total).astype(np.float32) * 0.2
        for s in sessions[1:]:
            s.feed(audio_w, pump=False)
        sessions[0].feed(audio_w)
        for s in sessions:
            s.finish()
        if args.sessions > 1:
            burst_sessions = [
                StreamingSession(model, step_positions=args.step, pool=pool)
                for _ in range(args.sessions)]
        else:
            burst_sessions = [StreamingSession(
                model, step_positions=args.step, unbounded=args.unbounded,
                **spec_kw)]
        audio = rng.normal(size=total).astype(np.float32) * 0.2
        t0 = time.perf_counter()
        for s in burst_sessions[1:]:
            s.feed(audio, pump=False)
        burst_sessions[0].feed(audio)
        for s in burst_sessions:
            s.finish()
        dt = time.perf_counter() - t0
        audio_total = args.seconds * len(burst_sessions)
        fused = (pool._fused if args.sessions > 1
                 else burst_sessions[0]._fused) is not None
        report = {
            "mode": "burst",
            "sessions": args.sessions,
            "speculative": args.speculative,
            "fused_decode": fused,
            "audio_seconds_total": audio_total,
            "wall_s": round(dt, 2),
            "catchup_x_realtime": round(audio_total / dt, 1),
            "tokens": sum(len(s.tokens) for s in burst_sessions),
            "backend": jax.default_backend(),
        }
        print(f"# burst: {audio_total:.0f} s of audio in {dt:.2f} s = "
              f"{report['catchup_x_realtime']}x realtime catch-up",
              file=sys.stderr)
        print(json.dumps(report))
        return 0

    step_times = []
    fed = 0
    while fed < total:
        samples = rng.normal(size=piece).astype(np.float32) * 0.2
        before = sessions[0].positions_done
        # Buffer every session's audio first, then one timed pump —
        # the coalescing pattern the serving layer uses.
        for s in sessions[1:]:
            s.feed(samples, pump=False)
        t0 = time.perf_counter()
        sessions[0].feed(samples)
        dt = (time.perf_counter() - t0) * 1000
        if sessions[0].positions_done > before and before > 0:
            step_times.append(dt)
        fed += piece
    for s in sessions:
        s.finish()

    steady = np.asarray(step_times[1:]) if len(step_times) > 1 else np.asarray(step_times)
    if steady.size == 0:
        print("error: run too short for steady-state steps — need "
              f"> {(38 + 2 * args.step) * 0.16:.1f}s of audio", file=sys.stderr)
        return 2
    fused = (pool._fused if args.sessions > 1
             else sessions[0]._fused) is not None
    report = {
        "sessions": args.sessions,
        "unbounded": args.unbounded,
        "speculative": args.speculative,
        "fused_decode": fused,
        "step_audio_ms": step_audio_ms,
        "steady_step_ms_p50": round(float(np.percentile(steady, 50)), 1),
        "steady_step_ms_p95": round(float(np.percentile(steady, 95)), 1),
        "realtime_factor": round(float(np.percentile(steady, 50)) / step_audio_ms, 3),
        "steps": int(steady.size),
        "tokens": sum(len(s.tokens) for s in sessions),
        "backend": jax.default_backend(),
    }
    print(f"# sessions {args.sessions} | step audio {step_audio_ms:.0f} ms "
          f"| p50 {report['steady_step_ms_p50']} ms "
          f"| p95 {report['steady_step_ms_p95']} ms | "
          f"{report['realtime_factor']*100:.1f}% of realtime budget",
          file=sys.stderr)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
