"""Streaming/incremental path tests: encoder cache equivalence, mel-window
exactness, and token-for-token agreement between the real-time session and
the batch transcribe loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model import tiny_config
from voxtral_tpu.audio import AudioBuffer, pad_audio
from voxtral_tpu.audio.mel import MelSpectrogram
from voxtral_tpu.models.encoder import (
    create_encoder_cache,
    encoder_forward,
    encoder_layers_with_cache,
)
from voxtral_tpu.models.layers import conv_downsample, rope_tables
from voxtral_tpu.models.voxtral import PREFIX_LEN, VoxtralModel
from voxtral_tpu.streaming import StreamingSession


@pytest.fixture(scope="module")
def model():
    return VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )


def test_encoder_incremental_matches_full(model):
    """Cached layer stack over feature chunks == full forward (conv shared)."""
    cfg = model.config.audio_encoder
    params = model.params["encoder"]
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 64), jnp.float32)

    full = encoder_forward(params, mel, cfg)  # [1, 16, d]

    feats = jnp.swapaxes(conv_downsample(mel, params["conv"]), 1, 2)
    cache = create_encoder_cache(cfg, 1, 16, jnp.float32)
    rope = rope_tables(cfg.head_dim, 16, cfg.rope_theta)
    outs = []
    for lo, hi in [(0, 6), (6, 7), (7, 16)]:
        out, cache = encoder_layers_with_cache(
            params, feats[:, lo:hi], cache, cfg, rope
        )
        outs.append(out)
    incremental = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(incremental), rtol=1e-4, atol=1e-5
    )


def test_mel_windows_exact(model):
    """Session mel windows must equal slices of the global mel computation."""
    rng = np.random.default_rng(2)
    samples = rng.normal(size=16000 * 12).astype(np.float32) * 0.3

    session = StreamingSession(model, step_positions=8, max_duration_s=30)
    session._samples = np.concatenate([session._samples, samples])

    global_mel = MelSpectrogram.voxtral().compute_log(session._samples)

    for lo, hi in [(0, 744), (740, 876), (1000, 1136)]:
        win = session._mel_window(lo, hi)[0].T  # [frames, mels]
        np.testing.assert_allclose(
            win, global_mel[lo:hi], rtol=1e-5, atol=1e-6,
            err_msg=f"window [{lo},{hi})",
        )


def test_streaming_session_matches_batch(model):
    """Tokens from the live session == tokens from batch transcribe."""
    rng = np.random.default_rng(3)
    samples = (rng.normal(size=16000 * 8).astype(np.float32) * 0.25)

    # Batch: reference padding -> mel -> one-shot transcribe.
    padded = pad_audio(AudioBuffer(samples.copy(), 16000))
    mel = MelSpectrogram.voxtral().compute_log_batch(padded.samples)
    batch_tokens = model.transcribe_streaming(mel)

    # Streaming: feed in ragged pieces, then flush.
    session = StreamingSession(model, step_positions=8, max_duration_s=30)
    pieces = np.array_split(samples, [1000, 5000, 30000, 31000, 90000])
    for p in pieces:
        session.feed(p)
    assert session.positions_done > PREFIX_LEN  # produced tokens mid-stream
    session.finish()

    stream_tokens = np.asarray(session.tokens)
    n = min(len(stream_tokens), len(batch_tokens))
    assert n >= len(batch_tokens) - 1
    agree = (stream_tokens[:n] == np.asarray(batch_tokens)[:n]).mean()
    assert agree == 1.0, (
        f"only {agree:.2%} agreement\nstream: {stream_tokens[:n]}\n"
        f"batch:  {np.asarray(batch_tokens)[:n]}"
    )


def test_feed_after_finish_raises(model):
    session = StreamingSession(model, step_positions=8, max_duration_s=30)
    session.feed(np.zeros(1000, np.float32))
    session.finish()
    with pytest.raises(RuntimeError):
        session.feed(np.zeros(10, np.float32))
    # finish() is idempotent.
    assert session.finish() == ""


def test_unbounded_session_matches_batch(model):
    """Unbounded mode (head+ring KV caches + buffer trimming) must still
    match batch transcription exactly — the ring only overwrites history
    outside every query's sliding window (tiny config: window 32)."""
    rng = np.random.default_rng(7)
    samples = (rng.normal(size=16000 * 30).astype(np.float32) * 0.25)

    padded = pad_audio(AudioBuffer(samples.copy(), 16000))
    mel = MelSpectrogram.voxtral().compute_log_batch(padded.samples)
    batch_tokens = model.transcribe_streaming(mel)

    session = StreamingSession(
        model, step_positions=8, unbounded=True
    )
    # Tiny caches force ring wraparound: window 32 + margins.
    assert session._max_dec < 200  # sanity: eviction will actually happen
    for piece in np.array_split(samples, 23):
        session.feed(piece)
    session.finish()
    assert session.positions_done > session._max_dec, "decoder ring never wrapped"
    assert 4 * session.positions_done > session._max_enc, "encoder ring never wrapped"

    stream_tokens = np.asarray(session.tokens)
    n = min(len(stream_tokens), len(batch_tokens))
    assert n >= len(batch_tokens) - 1
    agree = (stream_tokens[:n] == np.asarray(batch_tokens)[:n]).mean()
    assert agree == 1.0, (
        f"only {agree:.2%} agreement\nstream: {stream_tokens[:n]}\n"
        f"batch:  {np.asarray(batch_tokens)[:n]}"
    )


def test_emit_holds_back_split_utf8(model):
    """A multi-byte char split across decode steps must not freeze a
    replacement char into the emitted deltas."""
    import base64
    import json

    from voxtral_tpu.tokenizer import VoxtralTokenizer

    e = "é".encode("utf-8")
    vocab = [
        {"rank": 1000, "token_bytes": base64.b64encode(b"caf").decode(), "is_control": False},
        {"rank": 1001, "token_bytes": base64.b64encode(e[:1]).decode(), "is_control": False},
        {"rank": 1002, "token_bytes": base64.b64encode(e[1:]).decode(), "is_control": False},
    ]
    tok = VoxtralTokenizer.from_json(json.dumps({
        "config": {"pattern": ".", "num_vocab_tokens": 3,
                   "default_vocab_size": 131072,
                   "default_num_special_tokens": 1000, "version": "v7"},
        "vocab": vocab,
    }))

    session = StreamingSession(model, tok, step_positions=8, max_duration_s=30)
    # Simulate decode output arriving split across emits.
    session.tokens = [1000, 1001]  # "caf" + first byte of "é"
    d1 = session._emit()
    assert d1 == "caf"  # the dangling byte is held back
    session.tokens = [1000, 1001, 1002]
    d2 = session._emit()
    assert d2 == "é"
    assert session.text == "café"


def test_stream_pool_matches_solo(model):
    """Pooled (batched) sessions must be token-identical to solo sessions,
    including when they join staggered and advance at different rates."""
    from voxtral_tpu.streaming import StreamPool

    rng = np.random.default_rng(11)
    audio_a = (rng.normal(size=16000 * 9).astype(np.float32) * 0.25)
    audio_b = (rng.normal(size=16000 * 7).astype(np.float32) * 0.3)

    solo_a = StreamingSession(model, step_positions=8)
    solo_a.feed(audio_a)
    solo_a.finish()
    solo_b = StreamingSession(model, step_positions=8)
    solo_b.feed(audio_b)
    solo_b.finish()

    pool = StreamPool(model, max_streams=3, step_positions=8)
    pa = StreamingSession(model, step_positions=8, pool=pool)
    pb = StreamingSession(model, step_positions=8, pool=pool)
    assert pool.free_slots == 1
    # Staggered feeding: a gets audio first, b catches up, then both.
    pieces_a = np.array_split(audio_a, 5)
    pieces_b = np.array_split(audio_b, 4)
    pa.feed(pieces_a[0])
    pa.feed(pieces_a[1])
    pb.feed(pieces_b[0])
    pa.feed(pieces_a[2])
    pb.feed(pieces_b[1])
    pb.feed(pieces_b[2])
    pa.feed(pieces_a[3])
    pa.feed(pieces_a[4])
    pa.finish()
    pb.feed(pieces_b[3])
    pb.finish()
    assert pool.free_slots == 3

    assert pa.tokens == solo_a.tokens, (pa.tokens, solo_a.tokens)
    assert pb.tokens == solo_b.tokens, (pb.tokens, solo_b.tokens)

    # A third session can attach after the others detached; a 4th at
    # capacity raises.
    pc = StreamingSession(model, step_positions=8, pool=pool)
    StreamingSession(model, step_positions=8, pool=pool)
    StreamingSession(model, step_positions=8, pool=pool)
    with pytest.raises(RuntimeError, match="pool full"):
        StreamingSession(model, step_positions=8, pool=pool)
    pc.feed(audio_b[: 16000 * 7])
    pc.finish()
    assert pc.tokens == solo_b.tokens


def test_stream_pool_fused_matches_solo(monkeypatch):
    """Pooled sessions routed through the stack kernel (per-row offsets +
    per-row RoPE, interpret mode) must be token-identical to solo sessions
    on the generic XLA path — including mixed-progress (staggered) pools."""
    import dataclasses

    from voxtral_tpu.streaming import StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = tiny_config()
    # Vocab divisible by a >=8 power-of-two tile so the folded lm_head
    # (final norm + tied head inside the kernel) is exercised too.
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    fmodel = VoxtralModel(w8, cfg)
    assert fmodel.fused_decode is not None

    rng = np.random.default_rng(21)
    audio_a = rng.normal(size=16000 * 8).astype(np.float32) * 0.25
    audio_b = rng.normal(size=16000 * 6).astype(np.float32) * 0.3

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    assert gmodel.fused_decode is None
    solo_a = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo_a.feed(audio_a)
    solo_a.finish()
    solo_b = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo_b.feed(audio_b)
    solo_b.finish()

    pool = StreamPool(fmodel, max_streams=2, step_positions=8,
                      max_duration_s=30)
    assert pool._fused is not None and pool._fused["fold"]
    pa = StreamingSession(fmodel, step_positions=8, pool=pool)
    pb = StreamingSession(fmodel, step_positions=8, pool=pool)
    # Staggered: a starts first, then both advance at different rates.
    pieces_a = np.array_split(audio_a, 4)
    pieces_b = np.array_split(audio_b, 3)
    pa.feed(pieces_a[0])
    pa.feed(pieces_a[1])
    pb.feed(pieces_b[0])
    pb.feed(pieces_b[1])
    pa.feed(pieces_a[2])
    pa.feed(pieces_a[3])
    pa.finish()
    pb.feed(pieces_b[2])
    pb.finish()

    assert pa.tokens == solo_a.tokens, (pa.tokens, solo_a.tokens)
    assert pb.tokens == solo_b.tokens, (pb.tokens, solo_b.tokens)


def test_fused_solo_sessions_match_generic(monkeypatch):
    """Solo sessions routed through the stack kernel must be
    token-identical to the generic XLA path — bounded (contiguous mask)
    AND unbounded (in-kernel head+ring validity mask)."""
    import dataclasses

    from voxtral_tpu.utils.quantize import quantize_params_w8

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(5), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    fmodel = VoxtralModel(w8, cfg)
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)

    rng = np.random.default_rng(31)
    # Long enough that the decoder sliding window (32) binds and the
    # unbounded ring wraps (ring size = 32 + 8 = 40 < positions used).
    audio = rng.normal(size=16000 * 14).astype(np.float32) * 0.25

    for unbounded in (False, True):
        gsess = StreamingSession(gmodel, step_positions=8,
                                 max_duration_s=30, unbounded=unbounded)
        assert gsess._fused is None
        gsess.feed(audio)
        gsess.finish()

        fsess = StreamingSession(fmodel, step_positions=8,
                                 max_duration_s=30, unbounded=unbounded)
        assert fsess._fused is not None and fsess._fused["fold"]
        fsess.feed(audio)
        fsess.finish()

        assert fsess.tokens == gsess.tokens, (
            unbounded, fsess.tokens, gsess.tokens)


def test_tokens_survive_mid_pump_error(model):
    """Deferred token fetches must flush on ERROR paths too: when a
    bounded session exceeds max_duration_s mid-pump, every step decoded
    before the limit must still reach session.tokens (dropping them
    would leave permanent transcript gaps — positions have advanced)."""
    rng = np.random.default_rng(41)
    short = StreamingSession(model, step_positions=8, max_duration_s=10)
    # ~10 s limit -> max_dec = 62+38+16; feed 30 s in ONE call so the
    # backlogged pump decodes several steps and then hits the limit.
    audio = rng.normal(size=16000 * 30).astype(np.float32) * 0.25
    with pytest.raises(RuntimeError, match="max_duration"):
        short.feed(audio)
    decoded_positions = short.positions_done
    assert decoded_positions > 0
    assert len(short.tokens) == decoded_positions - PREFIX_LEN, (
        len(short.tokens), decoded_positions)

    # The successfully decoded prefix must equal an unconstrained
    # session's tokens over the same audio.
    ok = StreamingSession(model, step_positions=8, max_duration_s=60)
    ok.feed(audio)
    n = len(short.tokens)
    assert short.tokens == ok.tokens[:n]


def test_endpoint_detection(model):
    """Endpoint fires after text followed by a run of [STREAMING_PAD]s,
    and re-arms after consume_endpoint()."""
    session = StreamingSession(model, step_positions=8, max_duration_s=30)
    assert not session.endpoint()
    session.tokens = [32] * 10                     # silence only: no text yet
    assert not session.endpoint(min_pad_run=4)
    session.tokens = [32, 1500, 1501, 32, 32, 32, 32]  # text then silence
    assert session.endpoint(min_pad_run=4)
    assert not session.endpoint(min_pad_run=8)     # run too short for 8
    session.consume_endpoint()
    assert not session.endpoint(min_pad_run=4)     # consumed
    session.tokens += [1502] + [32] * 4            # next utterance
    assert session.endpoint(min_pad_run=4)


def test_stream_pool_unbounded_matches_solo_ring(model):
    """Pooled sessions with head+ring caches must be token-identical to
    solo unbounded sessions — including PAST the length where a bounded
    pool of the same window would overrun (the serving gap VERDICT r2
    missing #5: pooled /stream died at max_duration_s)."""
    from voxtral_tpu.streaming import StreamPool

    rng = np.random.default_rng(17)
    # tiny lm window=32, P=8 -> dec ring = 40, cache = 78 positions
    # (~12.5 s).  20 s of audio (125 positions) forces ring wraparound.
    audio_a = rng.normal(size=16000 * 20).astype(np.float32) * 0.25
    audio_b = rng.normal(size=16000 * 16).astype(np.float32) * 0.3

    solo_a = StreamingSession(model, step_positions=8, unbounded=True)
    solo_a.feed(audio_a)
    solo_a.finish()
    solo_b = StreamingSession(model, step_positions=8, unbounded=True)
    solo_b.feed(audio_b)
    solo_b.finish()

    pool = StreamPool(model, max_streams=2, step_positions=8, unbounded=True)
    assert pool.sessions == [None, None]
    pa = StreamingSession(model, step_positions=8, pool=pool)
    pb = StreamingSession(model, step_positions=8, pool=pool)
    assert pa.unbounded and pb.unbounded
    pieces_a = np.array_split(audio_a, 5)
    pieces_b = np.array_split(audio_b, 4)
    pa.feed(pieces_a[0])
    pa.feed(pieces_a[1])
    pb.feed(pieces_b[0])
    pa.feed(pieces_a[2])
    pb.feed(pieces_b[1])
    pb.feed(pieces_b[2])
    pa.feed(pieces_a[3])
    pa.feed(pieces_a[4])
    pa.finish()
    pb.feed(pieces_b[3])
    pb.finish()

    assert not pa.overrun and not pb.overrun
    # Streams really exceeded the ring capacity (eviction happened).
    assert pa.positions_done > 78
    assert pa.tokens == solo_a.tokens, (pa.tokens[:20], solo_a.tokens[:20])
    assert pb.tokens == solo_b.tokens


def test_stream_pool_unbounded_fused_matches_solo(monkeypatch):
    """Unbounded pool through the stack kernel: per-row offsets + the
    in-kernel head+ring validity mask + per-row ring-slot appends,
    token-identical to the solo unbounded XLA path past wraparound."""
    import dataclasses

    from voxtral_tpu.streaming import StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    fmodel = VoxtralModel(w8, cfg)
    assert fmodel.fused_decode is not None

    rng = np.random.default_rng(23)
    audio_a = rng.normal(size=16000 * 18).astype(np.float32) * 0.25
    audio_b = rng.normal(size=16000 * 14).astype(np.float32) * 0.3

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo_a = StreamingSession(gmodel, step_positions=8, unbounded=True)
    solo_a.feed(audio_a)
    solo_a.finish()
    solo_b = StreamingSession(gmodel, step_positions=8, unbounded=True)
    solo_b.feed(audio_b)
    solo_b.finish()

    pool = StreamPool(fmodel, max_streams=2, step_positions=8,
                      unbounded=True)
    assert pool._fused is not None and pool._fused["fold"]
    pa = StreamingSession(fmodel, step_positions=8, pool=pool)
    pb = StreamingSession(fmodel, step_positions=8, pool=pool)
    pieces_a = np.array_split(audio_a, 4)
    pieces_b = np.array_split(audio_b, 3)
    pa.feed(pieces_a[0])
    pa.feed(pieces_a[1])
    pb.feed(pieces_b[0])
    pb.feed(pieces_b[1])
    pa.feed(pieces_a[2])
    pa.feed(pieces_a[3])
    pa.finish()
    pb.feed(pieces_b[2])
    pb.finish()

    assert not pa.overrun and not pb.overrun
    assert pa.positions_done > 78  # past ring wraparound
    assert pa.tokens == solo_a.tokens, (pa.tokens[:20], solo_a.tokens[:20])
    assert pb.tokens == solo_b.tokens


def test_unbounded_session_rejects_bounded_pool(model):
    from voxtral_tpu.streaming import StreamPool

    pool = StreamPool(model, max_streams=2, step_positions=8)
    with pytest.raises(ValueError, match="unbounded"):
        StreamingSession(model, step_positions=8, pool=pool, unbounded=True)


def test_stream_pool_int8_kv_matches_solo(monkeypatch):
    """Pooled decode with the int8 KV cache (per-vector scales, both
    attention dots on the int8 MXU) must track the solo generic path —
    cache quantization can flip only near-tie argmaxes, so the seed is
    fixed; structural bugs (slot/scale misalignment) break everything."""
    import dataclasses

    from voxtral_tpu.streaming import StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    fmodel = VoxtralModel(w8, cfg)

    rng = np.random.default_rng(29)
    audio = rng.normal(size=16000 * 8).astype(np.float32) * 0.25

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo.feed(audio)
    solo.finish()

    pool = StreamPool(fmodel, max_streams=2, step_positions=8,
                      max_duration_s=30, kv_dtype="int8")
    assert pool._fused is not None and pool.cache_int8
    assert pool.dec_k.dtype == jnp.int8
    ps = StreamingSession(fmodel, step_positions=8, pool=pool)
    for piece in np.array_split(audio, 3):
        ps.feed(piece)
    ps.finish()
    assert ps.tokens == solo.tokens, (ps.tokens, solo.tokens)


def test_stream_pool_int8_ring_matches_solo(monkeypatch):
    """int8 KV composes with the unbounded head+ring pool (scales ride
    the same per-row ring slots)."""
    import dataclasses

    from voxtral_tpu.streaming import StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(7), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    fmodel = VoxtralModel(w8, cfg)

    rng = np.random.default_rng(31)
    audio = rng.normal(size=16000 * 15).astype(np.float32) * 0.25

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo = StreamingSession(gmodel, step_positions=8, unbounded=True)
    solo.feed(audio)
    solo.finish()

    pool = StreamPool(fmodel, max_streams=2, step_positions=8,
                      unbounded=True, kv_dtype="int8")
    assert pool.cache_int8
    ps = StreamingSession(fmodel, step_positions=8, pool=pool)
    for piece in np.array_split(audio, 3):
        ps.feed(piece)
    ps.finish()
    assert ps.positions_done > 78  # past ring wraparound
    assert ps.tokens == solo.tokens, (ps.tokens[:20], solo.tokens[:20])


def test_stream_pool_auto_kv_falls_back_to_int8(monkeypatch):
    """kv_dtype="auto": when the model-dtype cache blows the stack
    kernel's VMEM gate but the int8 cache fits, the pool must pick the
    fused path with cache_int8 (the pool16 unlock)."""
    import dataclasses

    import voxtral_tpu.ops.decode_step_pallas as dsp
    from voxtral_tpu.streaming import StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    fmodel = VoxtralModel(quantize_params_w8(f32.params), cfg)

    # Cap between the int8 need and the model-dtype (bf16 cache) need.
    lm = cfg.language_model
    pool_probe = StreamPool(fmodel, max_streams=2, step_positions=8,
                            max_duration_s=30)
    s_dec = pool_probe.max_dec + 8
    item_model = jnp.dtype(fmodel.cache_dtype).itemsize
    need_model = dsp.stack_vmem_need(2, s_dec, lm.dim, lm.n_heads,
                                     lm.n_kv_heads, lm.head_dim,
                                     lm.hidden_dim, lm.vocab_size,
                                     item_model)
    need_int8 = dsp.stack_vmem_need(2, s_dec, lm.dim, lm.n_heads,
                                    lm.n_kv_heads, lm.head_dim,
                                    lm.hidden_dim, lm.vocab_size, 1)
    assert need_int8 < need_model
    monkeypatch.setattr(dsp, "STACK_VMEM_CAP",
                        (need_int8 + need_model) // 2)

    pool = StreamPool(fmodel, max_streams=2, step_positions=8,
                      max_duration_s=30, kv_dtype="auto")
    assert pool._fused is not None and pool.cache_int8

    # "model" keeps the strict dtype and must fall off the fused path.
    pool_m = StreamPool(fmodel, max_streams=2, step_positions=8,
                        max_duration_s=30, kv_dtype="model")
    assert pool_m._fused is None


def test_stream_pool_chunked_cache_matches_solo(monkeypatch):
    """Pool forced onto the HBM-chunked int8 cache (the big-pool / long
    ring-window fused path) must stay token-identical to the solo
    generic path — bounded AND unbounded (ring) modes."""
    import dataclasses

    import voxtral_tpu.streaming as streaming
    from voxtral_tpu.streaming import StreamPool
    from voxtral_tpu.utils.quantize import quantize_params_w8

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    fmodel = VoxtralModel(w8, cfg)

    # Force the ladder onto the chunked candidates, with a small chunk
    # so multiple online-softmax chunks are exercised.
    orig = streaming._fused_plan

    def chunk_only(model, batch, cache_s, itemsize=None, chunk=None,
                   **kw):
        if chunk is None and batch > 1:
            return None  # pool candidates must go chunked
        return orig(model, batch, cache_s, itemsize=itemsize, chunk=chunk,
                    **kw)

    monkeypatch.setattr(streaming, "_fused_plan", chunk_only)
    monkeypatch.setattr(streaming, "CACHE_CHUNK", 64)

    rng = np.random.default_rng(41)
    audio = rng.normal(size=16000 * 8).astype(np.float32) * 0.25
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    solo = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    solo.feed(audio)
    solo.finish()

    pool = StreamPool(fmodel, max_streams=2, step_positions=8,
                      max_duration_s=30)
    assert pool._fused is not None and pool._cache_chunk == 64
    assert pool.cache_int8 and pool.dec_k.shape[3] % 64 == 0
    ps = StreamingSession(fmodel, step_positions=8, pool=pool)
    for piece in np.array_split(audio, 3):
        ps.feed(piece)
    ps.finish()
    assert ps.tokens == solo.tokens, (ps.tokens, solo.tokens)

    # Ring mode on the padded cache (dead slots masked by r < size).
    audio_l = rng.normal(size=16000 * 15).astype(np.float32) * 0.25
    solo_r = StreamingSession(gmodel, step_positions=8, unbounded=True)
    solo_r.feed(audio_l)
    solo_r.finish()
    pool_r = StreamPool(fmodel, max_streams=2, step_positions=8,
                        unbounded=True)
    assert pool_r._cache_chunk == 64 and pool_r.cache_int8
    pr = StreamingSession(fmodel, step_positions=8, pool=pool_r)
    for piece in np.array_split(audio_l, 3):
        pr.feed(piece)
    pr.finish()
    assert pr.positions_done > 78  # past ring wraparound
    assert pr.tokens == solo_r.tokens, (pr.tokens[:20], solo_r.tokens[:20])


def test_session_words_timestamps(model):
    """session.words maps the decoded token stream to delay-corrected
    word timings (tokenizer.decode_words semantics)."""
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    tok = VoxtralTokenizer([b"hi", b" there"], {}, 131072)
    session = StreamingSession(model, tok, step_positions=8,
                               max_duration_s=30, delay_tokens=0.0)
    session.tokens = [32, 33, 1000, 32, 33, 1001, 1001]
    words = session.words
    assert [w["word"] for w in words] == ["hi", "there there"]
    assert words[0]["start"] == 0.16 and words[0]["end"] == 0.48
    assert words[1]["start"] == 0.64
    assert words == tok.decode_words(session.tokens)


def test_pooled_session_inherits_pool_delay(model):
    """A pooled session's effective decode delay is the POOL's (its
    t_embed/ada drive the decode), so words/checkpoints must use it."""
    from voxtral_tpu.streaming import StreamPool

    pool = StreamPool(model, max_streams=1, step_positions=8,
                      max_duration_s=30, delay_tokens=2.0)
    sess = StreamingSession(model, step_positions=8, pool=pool)
    assert sess._delay_tokens == 2.0
