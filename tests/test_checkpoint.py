"""Live-session checkpoint/restore tests.

A mid-stream ``StreamingSession`` snapshot (``state_dict``/``save``) must
restore — in another process, possibly onto a model using a DIFFERENT
decode path — and continue with token-identical output.  The reference
has no analogue (its checkpointing is weight loading only); this is the
drain/restart piece a serving deployment needs.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_model import tiny_config
from voxtral_tpu.models.voxtral import PREFIX_LEN, VoxtralModel
from voxtral_tpu.streaming import StreamingSession, StreamPool


@pytest.fixture(scope="module")
def model():
    return VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )


def _audio(seconds=8, seed=3):
    rng = np.random.default_rng(seed)
    return rng.normal(size=16000 * seconds).astype(np.float32) * 0.25


def _run_split(model, audio, split, unbounded=False, via_file=None,
               restore_model=None):
    """Feed audio[:split], snapshot, restore, feed audio[split:]."""
    a = StreamingSession(model, step_positions=8, max_duration_s=30,
                         unbounded=unbounded)
    a.feed(audio[:split])
    assert a.positions_done > 0, "no steps ran before the checkpoint"
    if via_file is not None:
        a.save(via_file)
        b = StreamingSession.load(restore_model or model, via_file)
    else:
        b = StreamingSession.restore(restore_model or model, a.state_dict())
    b.feed(audio[split:])
    b.finish()
    return b


def test_restore_matches_uninterrupted(model):
    """save -> restore mid-stream == never interrupted (token identity)."""
    audio = _audio()
    ref = StreamingSession(model, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()

    b = _run_split(model, audio, split=60000)
    assert b.tokens == ref.tokens, (b.tokens, ref.tokens)
    assert b.positions_done == ref.positions_done


def test_save_load_file_roundtrip(model, tmp_path):
    """The .npz file path produces the same continuation as state_dict."""
    audio = _audio(seed=5)
    ref = StreamingSession(model, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()

    b = _run_split(model, audio, split=50000,
                   via_file=tmp_path / "sess.npz")
    assert b.tokens == ref.tokens


def test_restore_unbounded_ring(model):
    """Unbounded (head+ring cache) sessions checkpoint/restore across a
    ring wrap: snapshot AFTER the decoder ring has wrapped, continue,
    and match the uninterrupted session."""
    audio = _audio(seconds=20, seed=7)
    ref = StreamingSession(model, step_positions=8, unbounded=True)
    ref.feed(audio)
    ref.finish()
    assert ref.positions_done > ref._max_dec  # the ring actually wrapped

    # Split late enough that the ring wrapped before the snapshot.
    b = _run_split(model, audio, split=16000 * 16, unbounded=True)
    assert b.tokens == ref.tokens


def test_restore_cross_decode_path(monkeypatch, tmp_path):
    """A checkpoint taken on the fused stack-kernel path (head-major
    cache layout) restores onto the generic XLA path and vice versa,
    with token-identical continuations.  The fused->generic leg goes
    through a .npz file so bf16 caches exercise the f32 disk widening."""
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

    audio = _audio(seed=31)
    ref = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()

    # fused -> generic (via file: bf16 cache -> f32 on disk -> bf16)
    fg = _run_split(fmodel, audio, split=60000, restore_model=gmodel,
                    via_file=tmp_path / "cross.npz")
    assert fg._fused is None
    assert fg.tokens == ref.tokens, (fg.tokens, ref.tokens)

    # generic -> fused
    gf = _run_split(gmodel, audio, split=60000, restore_model=fmodel)
    assert gf._fused is not None
    assert gf.tokens == ref.tokens, (gf.tokens, ref.tokens)


def test_restore_before_first_step(model):
    """A snapshot taken before any decode step (buffer-only state)
    restores and produces the full transcription."""
    audio = _audio(seed=11)
    ref = StreamingSession(model, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()

    a = StreamingSession(model, step_positions=8, max_duration_s=30)
    a.feed(audio[:4000])  # < 38 positions: no step possible yet
    assert a.positions_done == 0
    b = StreamingSession.restore(model, a.state_dict())
    b.feed(audio[4000:])
    b.finish()
    assert b.tokens == ref.tokens


def test_pooled_to_solo_restore(model):
    """A pooled session's slot extracts to a solo-layout checkpoint that
    restores as a solo session with token-identical continuation —
    including with a concurrent neighbor keeping the pool batched."""
    audio = _audio(seed=13)
    other = _audio(seconds=6, seed=14)
    ref = StreamingSession(model, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()

    pool = StreamPool(model, max_streams=2, step_positions=8,
                      max_duration_s=30)
    pa = StreamingSession(model, step_positions=8, pool=pool)
    pb = StreamingSession(model, step_positions=8, pool=pool)
    pa.feed(audio[:60000])
    pb.feed(other)
    assert pa.positions_done > 0
    state = pa.state_dict()

    solo = StreamingSession.restore(model, state)
    solo.feed(audio[60000:])
    solo.finish()
    assert solo.tokens == ref.tokens, (solo.tokens, ref.tokens)


def test_solo_to_pooled_restore(model):
    """A solo checkpoint restores INTO a pool slot and continues
    token-identically through batched pool steps."""
    audio = _audio(seed=17)
    ref = StreamingSession(model, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()

    a = StreamingSession(model, step_positions=8, max_duration_s=30)
    a.feed(audio[:50000])
    pool = StreamPool(model, max_streams=2, step_positions=8,
                      max_duration_s=30)
    b = StreamingSession.restore(model, a.state_dict(), pool=pool)
    assert b._pool is pool and pool.free_slots == 1
    # A fresh neighbor joins so continuation steps are genuinely batched.
    nb = StreamingSession(model, step_positions=8, pool=pool)
    nb.feed(_audio(seconds=4, seed=18))
    b.feed(audio[50000:])
    b.finish()
    nb.finish()
    assert b.tokens == ref.tokens, (b.tokens, ref.tokens)


def test_pooled_to_pooled_restore_via_file(model, tmp_path):
    """The serving restart path: snapshot a pooled session to disk, load
    it into a NEW pool in a "new process", continue token-identically."""
    audio = _audio(seed=19)
    ref = StreamingSession(model, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()

    pool_a = StreamPool(model, max_streams=2, step_positions=8,
                        max_duration_s=30)
    pa = StreamingSession(model, step_positions=8, pool=pool_a)
    pa.feed(audio[:60000])
    pa.save(tmp_path / "pooled.npz")

    pool_b = StreamPool(model, max_streams=2, step_positions=8,
                        max_duration_s=30)
    pb = StreamingSession.load(model, tmp_path / "pooled.npz", pool=pool_b)
    pb.feed(audio[60000:])
    pb.finish()
    assert pb.tokens == ref.tokens, (pb.tokens, ref.tokens)


def test_pooled_fused_int8_checkpoint_roundtrip(monkeypatch):
    """int8 fused pool -> checkpoint (dequantized, position-major) ->
    restore into another int8 fused pool: the per-vector requantization
    round-trips exactly (max element maps to ±127), so the continuation
    stays token-identical to the uninterrupted pooled run."""
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

    audio = _audio(seed=29)
    pool_ref = StreamPool(fmodel, max_streams=2, step_positions=8,
                          max_duration_s=30, kv_dtype="int8")
    assert pool_ref._fused is not None and pool_ref.cache_int8
    pr = StreamingSession(fmodel, step_positions=8, pool=pool_ref)
    pr.feed(audio)
    pr.finish()

    pool_a = StreamPool(fmodel, max_streams=2, step_positions=8,
                        max_duration_s=30, kv_dtype="int8")
    pa = StreamingSession(fmodel, step_positions=8, pool=pool_a)
    pa.feed(audio[:60000])
    state = pa.state_dict()
    assert state["dec_k"].dtype == np.float32  # dequantized on the way out

    pool_b = StreamPool(fmodel, max_streams=2, step_positions=8,
                        max_duration_s=30, kv_dtype="int8")
    pb = StreamingSession.restore(fmodel, state, pool=pool_b)
    pb.feed(audio[60000:])
    pb.finish()
    assert pb.tokens == pr.tokens, (pb.tokens, pr.tokens)


def test_pooled_unbounded_ring_checkpoint(model):
    """Unbounded pooled slot (head+ring caches) checkpoints after a ring
    wrap and restores solo with token-identical continuation (ring
    geometry normalized through the solo layout)."""
    audio = _audio(seconds=20, seed=23)
    ref = StreamingSession(model, step_positions=8, unbounded=True)
    ref.feed(audio)
    ref.finish()
    assert ref.positions_done > ref._max_dec

    pool = StreamPool(model, max_streams=2, step_positions=8,
                      unbounded=True)
    pa = StreamingSession(model, step_positions=8, pool=pool)
    pa.feed(audio[:16000 * 16])
    assert pa.positions_done > PREFIX_LEN + pool._dec_ring[1]  # wrapped
    state = pa.state_dict()

    solo = StreamingSession.restore(model, state)
    solo.feed(audio[16000 * 16:])
    solo.finish()
    assert solo.tokens == ref.tokens, (solo.tokens[:20], ref.tokens[:20])


def test_pooled_restore_rejects_geometry_mismatch(model):
    a = StreamingSession(model, step_positions=8, max_duration_s=30)
    a.feed(_audio(seconds=3))
    state = a.state_dict()
    pool = StreamPool(model, max_streams=2, step_positions=4,
                      max_duration_s=30)
    with pytest.raises(ValueError, match="geometry"):
        StreamingSession.restore(model, state, pool=pool)
    pool2 = StreamPool(model, max_streams=2, step_positions=8,
                       max_duration_s=60)
    with pytest.raises(ValueError, match="geometry"):
        StreamingSession.restore(model, state, pool=pool2)


def test_restore_rejects_mismatched_geometry(model):
    """Unbounded cache geometry derives from the model's sliding window;
    restoring a checkpoint whose ring size disagrees must fail loudly
    (bounded max_dec is free — any value is reachable via max_duration)."""
    a = StreamingSession(model, step_positions=8, unbounded=True)
    a.feed(_audio(seconds=2))
    state = a.state_dict()
    state["max_dec"] = state["max_dec"] + 8  # a different ring size
    with pytest.raises(ValueError, match="geometry"):
        StreamingSession.restore(model, state)


def test_restore_rejects_unknown_version(model):
    a = StreamingSession(model, step_positions=8, max_duration_s=30)
    state = a.state_dict()
    state["version"] = 99
    with pytest.raises(ValueError, match="version"):
        StreamingSession.restore(model, state)


def test_meshed_pool_to_solo_restore(monkeypatch):
    """A session pooled on a MESH (dp x tp — sharded caches, TP
    half-kernel decode) snapshots to the portable solo layout (gathers
    the sharded slots) and restores as a single-device solo session
    with token-identical continuation."""
    from voxtral_tpu.parallel import make_mesh
    from voxtral_tpu.utils.quantize import quantize_params_w8

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    w8 = quantize_params_w8(f32.params)
    audio = _audio(seed=23)

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    gmodel = VoxtralModel(w8, cfg)
    ref = StreamingSession(gmodel, step_positions=8, max_duration_s=30)
    ref.feed(audio)
    ref.finish()

    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    mesh = make_mesh(n_data=2, n_model=2)
    mmodel = VoxtralModel(w8, cfg, mesh=mesh)
    pool = StreamPool(mmodel, max_streams=2, step_positions=8,
                      max_duration_s=30)
    assert pool._tp_mesh is not None
    pa = StreamingSession(mmodel, step_positions=8, pool=pool)
    pb = StreamingSession(mmodel, step_positions=8, pool=pool)
    pa.feed(audio[:60000])
    pb.feed(_audio(seconds=4, seed=24))
    assert pa.positions_done > 0
    state = pa.state_dict()

    solo = StreamingSession.restore(gmodel, state)
    solo.feed(audio[60000:])
    solo.finish()
    assert solo.tokens == ref.tokens, (solo.tokens, ref.tokens)
