"""Real-TPU serving smoke: the full HTTP serving stack on production
shapes (random w8 weights, fused stack kernel) driven through
voxtral_tpu.client — whole-file /transcribe, /v1 json, /v1 SSE
streaming, and a live /stream session.  Run from /root/repo:

    python wer_eval_work/r05/serving_smoke_tpu.py

Writes wer_eval_work/r05/serving_tpu.json.  Previous TPU validation
drove the library; this is the first hardware pass through the HTTP
layer itself (sockets + locks + pool pump + SSE writes over the real
device).
"""
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, ".")

import numpy as np


def _write(out):
    Path("wer_eval_work/r05/serving_tpu.json").write_text(
        json.dumps(out, indent=2))


def main():
    import jax

    from voxtral_tpu.audio import AudioBuffer, save_wav
    from voxtral_tpu.client import VoxtralClient
    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline
    from voxtral_tpu.serving import make_server
    from voxtral_tpu.tokenizer import VoxtralTokenizer
    from voxtral_tpu.utils.compilation_cache import enable as enable_cache
    from voxtral_tpu.utils.quantize import random_w8_params

    enable_cache()
    out = {"backend": jax.default_backend()}
    cfg = VoxtralConfig.voxtral()
    t0 = time.time()
    model = VoxtralModel(random_w8_params(cfg), cfg)
    assert model.megakernel_weights == "w8"
    tokenizer = VoxtralTokenizer([None] * 131072,
                                 {1: "<s>", 32: "[STREAMING_PAD]"}, 131072)
    pipeline = TranscribePipeline(model, tokenizer, PipelineConfig())
    out["model_load_s"] = round(time.time() - t0, 1)

    srv = make_server(pipeline, "127.0.0.1", 0, pool_streams=4)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    c = VoxtralClient(f"http://127.0.0.1:{srv.server_address[1]}",
                      timeout=3600)

    # 16 s dual-tone (the bench clip protocol).
    sr = 16000
    t = np.arange(16 * sr) / sr
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1320 * t)).astype(np.float32)
    wav_path = Path("wer_eval_work/r05/_smoke16.wav")
    save_wav(AudioBuffer(sig, sr), wav_path)
    wav = wav_path.read_bytes()

    # Warm each program once (compile), then time.
    t0 = time.time()
    c.transcribe(wav)
    out["transcribe_cold_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    r = c.transcribe(wav)
    out["transcribe_warm_s"] = round(time.time() - t0, 3)
    out["transcribe_rtf"] = round((time.time() - t0) / 16.0, 4)
    out["audio_seconds"] = r["audio_seconds"]

    t0 = time.time()
    assert c.transcriptions(wav)["text"] == r["text"]
    out["v1_json_warm_s"] = round(time.time() - t0, 3)

    # SSE streaming: time-to-first-event and total.
    t0 = time.time()
    first = None
    deltas = []
    for d in c.stream_file(wav):
        if first is None:
            first = time.time() - t0
        deltas.append(d)
    out["sse_total_s"] = round(time.time() - t0, 2)
    out["sse_first_delta_s"] = round(first, 2) if first else None
    out["sse_deltas"] = len(deltas)

    _write(out)

    # Live session: 16 x 1 s feeds (realtime pacing ignored — feed as
    # fast as the server accepts; per-feed p50 is the serving step).
    # Phase-resilient: the whole-file programs above already hold HBM
    # buffers; if a later phase hits the device ceiling, record WHERE.
    from voxtral_tpu.client import ServerError

    feed_times = []
    try:
        with c.open_stream() as s:
            for i in range(16):
                chunk = sig[i * sr:(i + 1) * sr]
                t0 = time.time()
                s.feed(chunk)
                feed_times.append(time.time() - t0)
            s.finish()
        out["live_session"] = "ok"
    except ServerError as e:
        out["live_session"] = f"HTTP {e.status}: {e}"[:200]
    if feed_times:
        out["feed_p50_s"] = round(float(np.median(feed_times)), 3)
        out["feed_max_s"] = round(float(np.max(feed_times)), 3)
        out["feeds_before_error"] = len(feed_times)

    srv.shutdown()
    wav_path.unlink()
    _write(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
