"""Mixed-endpoint concurrency soak: every serving surface at once.

The server composes several synchronization layers — the model lock,
the /transcribe leader-elected coalescer, the StreamPool pump thread,
per-request SSE writes, and session TTL eviction.  A deadlock or a
slot leak between any two of them only shows under MIXED concurrent
load, which no single-endpoint test exercises (serving role of the
reference's dev server, ``serve.mjs:41-104``, under its browser E2E
``tests/e2e_browser.spec.ts:38-116``).
"""

import io
import json
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def soak_server():
    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline
    from voxtral_tpu.serving import make_server
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )
    tokenizer = VoxtralTokenizer([None] * 500, {}, 500)
    pipeline = TranscribePipeline(model, tokenizer, PipelineConfig())
    srv = make_server(pipeline, "127.0.0.1", 0, pool_streams=2)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv.server_address
    srv.shutdown()


def _wav_bytes(seconds=1.5, freq=300.0, rate=16000):
    from scipy.io import wavfile

    t = np.arange(int(seconds * rate)) / rate
    sig = (0.4 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, rate, sig)
    return buf.getvalue()


def test_mixed_endpoint_soak(soak_server):
    from voxtral_tpu.client import VoxtralClient

    url = f"http://{soak_server[0]}:{soak_server[1]}"
    wav = _wav_bytes()
    errors: list = []
    done: list = []

    def guard(fn):
        def run():
            try:
                c = VoxtralClient(url, timeout=600)
                fn(c)
                done.append(fn.__name__)
            except Exception as e:  # surfaced after join
                errors.append((fn.__name__, repr(e)))
        return run

    @guard
    def whole_file(c):
        for _ in range(2):
            assert "text" in c.transcribe(wav)

    @guard
    def whole_file_words(c):
        assert "words" in c.transcribe(wav, timestamps=True)

    @guard
    def pcm(c):
        samples = (np.random.default_rng(5).normal(size=16000) * 0.2
                   ).astype(np.float32)
        for _ in range(2):
            assert "text" in c.transcribe_pcm(samples)

    @guard
    def openai_json(c):
        for _ in range(2):
            assert "text" in c.transcriptions(wav)

    @guard
    def openai_sse(c):
        text = "".join(c.stream_file(wav))
        assert isinstance(text, str)

    @guard
    def live_session(c):
        rng = np.random.default_rng(9)
        with c.open_stream() as s:
            for _ in range(3):
                s.feed((rng.normal(size=16000) * 0.2).astype(np.float32))
        assert s.finished

    @guard
    def live_session_2(c):
        with c.open_stream() as s:
            s.feed(np.zeros(16000, np.float32))

    @guard
    def health_poll(c):
        for _ in range(10):
            assert c.healthz()["status"] == "ok"

    fns = [whole_file, whole_file_words, pcm, openai_json,
           openai_sse, live_session, live_session_2, health_poll]
    threads = [threading.Thread(target=f) for f in fns]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    alive = [t for t in threads if t.is_alive()]
    assert not alive, f"soak threads hung (deadlock?): {len(alive)}"
    assert not errors, errors
    assert len(done) == len(fns)

    # No leaked sessions or pool slots after the storm.
    import http.client

    conn = http.client.HTTPConnection(*soak_server, timeout=60)
    conn.request("GET", "/metrics")
    body = conn.getresponse().read().decode()
    conn.close()
    gauges = {}
    for line in body.splitlines():
        if line and not line.startswith("#"):
            name = line.split("{")[0].split(" ")[0]
            gauges[name] = line.rsplit(" ", 1)[-1]
    assert float(gauges["voxtral_sessions_active"]) == 0
    assert float(gauges["voxtral_pool_free_slots"]) == 2
    conn = http.client.HTTPConnection(*soak_server, timeout=60)
    conn.request("GET", "/healthz")
    payload = json.loads(conn.getresponse().read())
    conn.close()
    assert payload["sessions"] == 0
