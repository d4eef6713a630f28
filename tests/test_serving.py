"""HTTP serving tests: real server on a local port, driven with http.client."""

import io
import json
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def server():
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
    srv = make_server(pipeline, "127.0.0.1", 0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv.server_address
    srv.shutdown()


def request(addr, method, path, body=None):
    import http.client

    conn = http.client.HTTPConnection(*addr, timeout=300)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_healthz(server):
    status, data = request(server, "GET", "/healthz")
    assert status == 200
    payload = json.loads(data)
    assert payload["status"] == "ok"


def test_index_page(server):
    status, data = request(server, "GET", "/")
    assert status == 200
    assert b"Voxtral" in data


def test_transcribe_wav(server):
    from scipy.io import wavfile

    t = np.arange(32000) / 16000.0
    sig = (0.4 * np.sin(2 * np.pi * 300 * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, 16000, sig)

    status, data = request(server, "POST", "/transcribe", buf.getvalue())
    assert status == 200
    payload = json.loads(data)
    assert "text" in payload
    assert payload["audio_seconds"] == 2.0


def test_transcribe_pcm(server):
    samples = (np.random.default_rng(0).normal(size=32000) * 0.2).astype(np.float32)
    status, data = request(
        server, "POST", "/transcribe_pcm?rate=16000", samples.tobytes()
    )
    assert status == 200
    assert "text" in json.loads(data)


def test_streaming_protocol(server):
    status, data = request(server, "POST", "/stream/start")
    assert status == 200
    sid = json.loads(data)["session"]

    rng = np.random.default_rng(1)
    for _ in range(4):
        chunk = (rng.normal(size=16000) * 0.2).astype(np.float32)
        status, data = request(
            server, "POST", f"/stream/{sid}/feed", chunk.tobytes()
        )
        assert status == 200
        assert "delta" in json.loads(data)

    status, data = request(server, "POST", f"/stream/{sid}/finish")
    assert status == 200
    payload = json.loads(data)
    assert payload["tokens"] > 0

    # Session is gone after finish.
    status, _ = request(server, "POST", f"/stream/{sid}/feed", b"")
    assert status == 404


def test_error_paths(server):
    status, _ = request(server, "GET", "/nope")
    assert status == 404
    status, data = request(server, "POST", "/transcribe", b"tiny")
    assert status == 400
    status, _ = request(server, "POST", "/stream/unknown/feed", b"")
    assert status == 404
    status, data = request(server, "POST", "/transcribe_pcm", b"")
    assert status == 400


@pytest.fixture(scope="module")
def pooled_server():
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


def test_pooled_concurrent_streams(pooled_server):
    """Two concurrent /stream sessions through the coalescing pool must
    both transcribe; a third falls back to a solo session and still works."""
    sids = []
    for _ in range(3):
        status, data = request(pooled_server, "POST", "/stream/start")
        assert status == 200
        sids.append(json.loads(data)["session"])

    rng = np.random.default_rng(5)
    chunks = {sid: (rng.normal(size=16000 * 9) * 0.2).astype(np.float32)
              for sid in sids}

    errors = []

    def drive(sid):
        try:
            for piece in np.array_split(chunks[sid], 6):
                status, data = request(
                    pooled_server, "POST", f"/stream/{sid}/feed",
                    piece.astype(np.float32).tobytes(),
                )
                assert status == 200, data
            status, data = request(pooled_server, "POST", f"/stream/{sid}/finish")
            assert status == 200, data
            assert json.loads(data)["tokens"] > 0
        except Exception as e:  # noqa: BLE001
            errors.append((sid, e))

    threads = [threading.Thread(target=drive, args=(sid,)) for sid in sids]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors


def _parse_metrics(text):
    """Prometheus text -> {series_line_prefix: float} (last wins)."""
    out = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, _, val = line.rpartition(" ")
        out[name] = float(val)
    return out


def test_metrics_endpoint(server):
    """/metrics exposes Prometheus counters/gauges/histograms and they
    move with traffic (requests, audio seconds, tokens, latency hist)."""
    samples = (np.random.default_rng(2).normal(size=16000) * 0.2
               ).astype(np.float32)
    status, _ = request(server, "POST", "/transcribe_pcm?rate=16000",
                        samples.tobytes())
    assert status == 200

    status, data = request(server, "GET", "/metrics")
    assert status == 200
    m0 = _parse_metrics(data.decode())
    pcm_key = ('voxtral_requests_total{endpoint="/transcribe_pcm",'
               'status="2xx"}')
    assert m0[pcm_key] >= 1
    assert m0['voxtral_audio_seconds_total{path="batch"}'] >= 1.0
    assert m0["voxtral_transcribe_seconds_count"] >= 1
    assert "voxtral_transcribe_seconds_sum" in m0
    assert 'voxtral_transcribe_seconds_bucket{le="+Inf"}' in m0

    # A streaming session moves the stream-side series.
    status, data = request(server, "POST", "/stream/start")
    sid = json.loads(data)["session"]
    status, _ = request(server, "POST", f"/stream/{sid}/feed",
                        samples.tobytes())
    assert status == 200
    status, data = request(server, "POST", f"/stream/{sid}/finish")
    assert status == 200

    status, data = request(server, "GET", "/metrics")
    m1 = _parse_metrics(data.decode())
    assert m1["voxtral_sessions_started_total"] >= 1
    assert m1['voxtral_sessions_closed_total{reason="finished"}'] >= 1
    assert m1['voxtral_audio_seconds_total{path="stream"}'] >= 0.9
    assert m1["voxtral_sessions_active"] == 0
    # 4xx/5xx classes are labeled distinctly.
    status, _ = request(server, "POST", "/stream/unknown/feed", b"")
    assert status == 404
    status, data = request(server, "GET", "/metrics")
    m2 = _parse_metrics(data.decode())
    bad_key = ('voxtral_requests_total{endpoint="/stream/<id>/feed",'
               'status="4xx"}')
    assert m2[bad_key] >= 1


def test_metrics_pool_gauges(pooled_server):
    """Pooled servers expose pump latency and free-slot gauges."""
    status, data = request(pooled_server, "POST", "/stream/start")
    sid = json.loads(data)["session"]
    samples = (np.random.default_rng(3).normal(size=32000) * 0.2
               ).astype(np.float32)
    status, _ = request(pooled_server, "POST", f"/stream/{sid}/feed",
                        samples.tobytes())
    assert status == 200
    status, data = request(pooled_server, "GET", "/metrics")
    m = _parse_metrics(data.decode())
    assert m["voxtral_pool_free_slots"] <= 2
    assert m["voxtral_pump_seconds_count"] >= 1
    request(pooled_server, "POST", f"/stream/{sid}/finish")


def _pipeline():
    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )
    tokenizer = VoxtralTokenizer([None] * 500, {}, 500)
    return TranscribePipeline(model, tokenizer, PipelineConfig())


@pytest.mark.parametrize("pool_streams", [0, 2])
def test_drain_restore_roundtrip(tmp_path, pool_streams):
    """Graceful restart: server A drains a mid-stream session to
    state_dir, server B (fresh process stand-in, pooled or not) resumes
    it under the SAME session id, and the finished transcript matches an
    uninterrupted session token-for-token."""
    from voxtral_tpu.serving import make_server
    from voxtral_tpu.streaming import StreamingSession

    pipeline = _pipeline()
    rng = np.random.default_rng(41)
    audio = (rng.normal(size=16000 * 6) * 0.25).astype(np.float32)

    ref = StreamingSession(pipeline.model, pipeline.tokenizer,
                           step_positions=8)
    ref.feed(audio)
    ref.finish()

    sd = str(tmp_path / "drain")
    srv_a = make_server(pipeline, "127.0.0.1", 0,
                        pool_streams=pool_streams, state_dir=sd)
    ta = threading.Thread(target=srv_a.serve_forever, daemon=True)
    ta.start()
    status, data = request(srv_a.server_address, "POST", "/stream/start")
    sid = json.loads(data)["session"]
    status, _ = request(srv_a.server_address, "POST",
                        f"/stream/{sid}/feed", audio[:60000].tobytes())
    assert status == 200
    srv_a.shutdown()
    assert srv_a.drain() == 1
    assert (tmp_path / "drain" / f"{sid}.npz").exists()

    srv_b = make_server(pipeline, "127.0.0.1", 0,
                        pool_streams=pool_streams, state_dir=sd)
    tb = threading.Thread(target=srv_b.serve_forever, daemon=True)
    tb.start()
    try:
        # Snapshot consumed; session resumed under its original id.
        assert not (tmp_path / "drain" / f"{sid}.npz").exists()
        status, _ = request(srv_b.server_address, "POST",
                            f"/stream/{sid}/feed", audio[60000:].tobytes())
        assert status == 200
        status, data = request(srv_b.server_address, "POST",
                               f"/stream/{sid}/finish")
        assert status == 200
        status, data2 = request(srv_b.server_address, "GET", "/metrics")
        m = _parse_metrics(data2.decode())
        assert m["voxtral_sessions_restored_total"] == 1
    finally:
        srv_b.shutdown()
    # Token identity vs the uninterrupted reference session.
    sess_tokens = json.loads(data)["tokens"]
    assert sess_tokens == len(ref.tokens)


def test_transcribe_pcm_timestamps(server):
    """?timestamps=1 adds a words list derived from the streaming
    control tokens (delay-corrected 160 ms positions)."""
    samples = (np.random.default_rng(1).normal(size=32000) * 0.2
               ).astype(np.float32)
    status, data = request(
        server, "POST", "/transcribe_pcm?rate=16000&timestamps=1",
        samples.tobytes())
    assert status == 200
    payload = json.loads(data)
    assert "text" in payload and isinstance(payload["words"], list)
    for w in payload["words"]:
        assert set(w) == {"word", "start", "end"}
        assert 0.0 <= w["start"] <= w["end"]


def test_stream_finish_timestamps(server):
    """/stream/<id>/finish?timestamps=1 returns word timings."""
    status, data = request(server, "POST", "/stream/start")
    sid = json.loads(data)["session"]
    pcm = (np.random.default_rng(2).normal(size=32000) * 0.2
           ).astype(np.float32)
    status, _ = request(server, "POST", f"/stream/{sid}/feed", pcm.tobytes())
    assert status == 200
    status, data = request(server, "POST",
                           f"/stream/{sid}/finish?timestamps=1")
    assert status == 200
    payload = json.loads(data)
    assert isinstance(payload["words"], list)
    for w in payload["words"]:
        assert 0.0 <= w["start"] <= w["end"]


def test_body_size_cap(server):
    """A huge declared Content-Length is rejected with 413 before any
    allocation (monkeypatch-free: the header lies about the size)."""
    import http.client

    conn = http.client.HTTPConnection(*server, timeout=300)
    conn.putrequest("POST", "/transcribe_pcm?rate=16000")
    conn.putheader("Content-Length", str(10 * 2**30))  # claims 10 GB
    conn.endheaders()
    # Send nothing further; the server must answer from the header alone.
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    assert resp.status == 413
    assert b"exceeds" in data


def test_body_cap_closes_connection(server, monkeypatch):
    """A 413 on a body that was actually sent must close the HTTP/1.1
    connection — keeping it alive would desync the protocol (unread
    body bytes parse as request lines)."""
    import http.client

    from voxtral_tpu.serving.server import _Handler

    monkeypatch.setattr(_Handler, "MAX_BODY_BYTES", 1024)
    conn = http.client.HTTPConnection(*server, timeout=300)
    conn.request("POST", "/transcribe_pcm?rate=16000", body=b"\x00" * 4096)
    resp = conn.getresponse()
    resp.read()
    assert resp.status == 413
    assert (resp.getheader("Connection") or "").lower() == "close"
    assert resp.will_close  # the client will not reuse this socket
    conn.close()


def test_transcribe_coalesces_concurrent_posts(server):
    """N concurrent whole-file POSTs must be served by ONE batched
    decode (transcribe_samples_batched) — the serving analogue of the
    reference's batch semantics (serve.mjs:41-104, e2e_bench.rs).
    Asserts the observable contract: concurrent posts all succeed,
    identical audio yields identical transcripts, and the coalesced
    counter surfaces in /metrics."""
    import http.client

    samples = (np.random.default_rng(3).normal(size=16000) * 0.2
               ).astype(np.float32)
    results = [None] * 4
    errors = []

    def post(i):
        try:
            conn = http.client.HTTPConnection(*server, timeout=300)
            conn.request("POST", "/transcribe_pcm?rate=16000",
                         body=samples.tobytes())
            resp = conn.getresponse()
            results[i] = (resp.status, json.loads(resp.read()))
            conn.close()
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    texts = set()
    for status, payload in results:
        assert status == 200
        assert "text" in payload
        texts.add(payload["text"])
    assert len(texts) == 1  # identical audio -> identical transcript

    status, data = request(server, "GET", "/metrics")
    assert status == 200
    body = data.decode()
    # At least one group of >= 2 requests shared a batched decode.
    for line in body.splitlines():
        if line.startswith("voxtral_transcribe_coalesced_total"):
            assert float(line.split()[-1]) >= 2
            break
    else:
        raise AssertionError(
            f"coalesced counter missing from /metrics:\n{body}")


# -- OpenAI-compatible surface (/v1) ----------------------------------------


def _wav_bytes(seconds=2.0, freq=300.0, rate=16000):
    from scipy.io import wavfile

    t = np.arange(int(seconds * rate)) / rate
    sig = (0.4 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, rate, sig)
    return buf.getvalue()


def _multipart(fields):
    """Encode {name: bytes | (filename, bytes)} as multipart/form-data."""
    boundary = "voxtraltestboundary42"
    out = io.BytesIO()
    for name, value in fields.items():
        out.write(f"--{boundary}\r\n".encode())
        if isinstance(value, tuple):
            filename, data = value
            out.write(
                f'Content-Disposition: form-data; name="{name}"; '
                f'filename="{filename}"\r\n'
                "Content-Type: application/octet-stream\r\n\r\n".encode())
            out.write(data)
        else:
            out.write(
                f'Content-Disposition: form-data; name="{name}"\r\n'
                "\r\n".encode())
            out.write(value)
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return (out.getvalue(),
            f"multipart/form-data; boundary={boundary}")


def _post_multipart(addr, path, fields):
    import http.client

    body, ctype = _multipart(fields)
    conn = http.client.HTTPConnection(*addr, timeout=300)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": ctype})
    resp = conn.getresponse()
    data = resp.read()
    headers = dict(resp.getheaders())
    conn.close()
    return resp.status, data, headers


def test_openai_models_listing(server):
    status, data = request(server, "GET", "/v1/models")
    assert status == 200
    payload = json.loads(data)
    assert payload["object"] == "list"
    assert payload["data"][0]["object"] == "model"
    assert payload["data"][0]["id"]


def test_openai_transcription_json(server):
    status, data, headers = _post_multipart(
        server, "/v1/audio/transcriptions",
        {"file": ("tone.wav", _wav_bytes()),
         "model": b"voxtral-mini-realtime",
         "temperature": b"0"})
    assert status == 200
    payload = json.loads(data)
    assert set(payload) == {"text"}  # OpenAI json shape: text only
    assert isinstance(payload["text"], str)


def test_openai_transcription_text(server):
    status, data, headers = _post_multipart(
        server, "/v1/audio/transcriptions",
        {"file": ("tone.wav", _wav_bytes()),
         "response_format": b"text"})
    assert status == 200
    assert headers["Content-Type"].startswith("text/plain")
    assert data.endswith(b"\n")


def test_openai_transcription_verbose_json(server):
    status, data, _ = _post_multipart(
        server, "/v1/audio/transcriptions",
        {"file": ("tone.wav", _wav_bytes()),
         "response_format": b"verbose_json",
         "language": b"en"})
    assert status == 200
    payload = json.loads(data)
    assert payload["task"] == "transcribe"
    assert payload["language"] == "english"
    assert payload["duration"] == 2.0
    assert isinstance(payload["words"], list)
    assert isinstance(payload["segments"], list)
    for w in payload["words"]:
        assert set(w) == {"word", "start", "end"}
        assert 0 <= w["start"] <= w["end"] <= payload["duration"] + 1e-6


def test_openai_transcription_errors(server):
    # Missing file part.
    status, data, _ = _post_multipart(
        server, "/v1/audio/transcriptions", {"model": b"x"})
    assert status == 400
    err = json.loads(data)["error"]
    assert err["type"] == "invalid_request_error"
    assert err["param"] == "file"

    # Unsupported response_format.
    status, data, _ = _post_multipart(
        server, "/v1/audio/transcriptions",
        {"file": ("t.wav", _wav_bytes()), "response_format": b"srt"})
    assert status == 400
    assert json.loads(data)["error"]["param"] == "response_format"

    # Unsupported language.
    status, data, _ = _post_multipart(
        server, "/v1/audio/transcriptions",
        {"file": ("t.wav", _wav_bytes()), "language": b"fr"})
    assert status == 400
    assert json.loads(data)["error"]["param"] == "language"

    # Not a WAV payload.
    status, data, _ = _post_multipart(
        server, "/v1/audio/transcriptions",
        {"file": ("t.mp3", b"\xff\xfb" + b"0" * 100)})
    assert status == 400
    assert "WAV" in json.loads(data)["error"]["message"]

    # Non-multipart body.
    status, data = request(
        server, "POST", "/v1/audio/transcriptions", b"{}")
    assert status == 400
    assert json.loads(data)["error"]["type"] == "invalid_request_error"


def _sse_events(data: bytes):
    events = []
    for block in data.decode().split("\n\n"):
        block = block.strip()
        if block.startswith("data: "):
            events.append(json.loads(block[len("data: "):]))
    return events


def _sse_transcribe(addr):
    status, data, headers = _post_multipart(
        addr, "/v1/audio/transcriptions",
        {"file": ("tone.wav", _wav_bytes(seconds=3.0)),
         "stream": b"true"})
    assert status == 200
    assert headers["Content-Type"].startswith("text/event-stream")
    events = _sse_events(data)
    assert events, "no SSE events"
    assert events[-1]["type"] == "transcript.text.done"
    assert isinstance(events[-1]["text"], str)
    deltas = [e for e in events[:-1]]
    for e in deltas:
        assert e["type"] == "transcript.text.delta"
        assert e["delta"]  # only non-empty deltas are emitted
    assert "".join(e["delta"] for e in deltas) == events[-1]["text"]


def test_openai_transcription_sse(server):
    _sse_transcribe(server)


def test_openai_transcription_sse_pooled(pooled_server):
    # Rides the pool's coalesced decode; slot must be released after.
    _sse_transcribe(pooled_server)
    status, data = request(pooled_server, "GET", "/metrics")
    assert status == 200
    for line in data.decode().splitlines():
        if line.startswith("voxtral_pool_free_slots"):
            assert float(line.split()[-1]) == 2.0
            break
    else:
        raise AssertionError("pool gauge missing")


def test_openai_sse_rejects_non_json_format(server):
    status, data, _ = _post_multipart(
        server, "/v1/audio/transcriptions",
        {"file": ("t.wav", _wav_bytes()), "stream": b"true",
         "response_format": b"verbose_json"})
    assert status == 400
    assert json.loads(data)["error"]["param"] == "stream"


# -- Python client (voxtral_tpu.client) --------------------------------------


def test_client_whole_file(server):
    from voxtral_tpu.client import ServerError, VoxtralClient

    c = VoxtralClient(f"http://{server[0]}:{server[1]}")
    assert c.healthz()["status"] == "ok"
    assert c.models()[0]["id"]

    out = c.transcribe(_wav_bytes())
    assert set(out) >= {"text", "audio_seconds"}
    out = c.transcribe(_wav_bytes(), timestamps=True)
    assert "words" in out

    samples = (np.random.default_rng(7).normal(size=16000) * 0.2
               ).astype(np.float32)
    assert "text" in c.transcribe_pcm(samples)

    # /v1 formats through the client.
    assert set(c.transcriptions(_wav_bytes())) == {"text"}
    assert isinstance(c.transcriptions(_wav_bytes(),
                                       response_format="text"), str)
    verbose = c.transcriptions(_wav_bytes(),
                               response_format="verbose_json")
    assert verbose["task"] == "transcribe"

    # Typed errors with the server's message.
    with pytest.raises(ServerError) as e:
        c.transcribe(b"not a wav")
    assert e.value.status == 400
    with pytest.raises(ValueError):
        VoxtralClient("https://example.com")  # TLS refused up front


def test_client_streaming(server):
    from voxtral_tpu.client import VoxtralClient

    c = VoxtralClient(f"http://{server[0]}:{server[1]}")

    # SSE file streaming: deltas join to the non-streamed /v1 text.
    wav = _wav_bytes(seconds=3.0)
    streamed = "".join(c.stream_file(wav))
    assert streamed == c.transcriptions(wav)["text"]

    # Live session: feed chunks, context manager finishes.
    rng = np.random.default_rng(11)
    with c.open_stream() as s:
        for _ in range(3):
            chunk = (rng.normal(size=16000) * 0.2).astype(np.float32)
            s.feed(chunk)
        final_delta = s.finish()
        assert isinstance(final_delta, str)
        assert s.finished
    # finish() is idempotent through __exit__; session is gone server-side.
    status, _ = request(server, "POST", f"/stream/{s.session_id}/feed", b"")
    assert status == 404


def test_client_stream_handle_releases_on_exit(pooled_server):
    from voxtral_tpu.client import VoxtralClient

    c = VoxtralClient(f"http://{pooled_server[0]}:{pooled_server[1]}")
    with c.open_stream() as s:
        s.feed(np.zeros(16000, np.float32))
    status, data = request(pooled_server, "GET", "/metrics")
    assert status == 200
    for line in data.decode().splitlines():
        if line.startswith("voxtral_pool_free_slots"):
            assert float(line.split()[-1]) == 2.0
            break
    else:
        raise AssertionError("pool gauge missing")


def test_prewarm_server():
    """make_server(prewarm=True) compiles the serving programs before
    returning: /healthz carries the report and first requests work."""
    import threading

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
    srv = make_server(pipeline, "127.0.0.1", 0, pool_streams=2,
                      prewarm=True)
    assert set(srv.state.prewarm_report) == {
        "full_chunk_s", "short_bucket_s", "session_s"}
    # The prewarm session must not leak a pool slot.
    assert srv.state.pool.free_slots == 2
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        status, data = request(srv.server_address, "GET", "/healthz")
        assert status == 200
        assert json.loads(data)["prewarm"] == srv.state.prewarm_report
        status, data = request(srv.server_address, "POST",
                               "/transcribe", _wav_bytes())
        assert status == 200
    finally:
        srv.shutdown()
