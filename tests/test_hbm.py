"""Device-HBM admission control (utils/hbm.py, VERDICT r3 next #6).

An operator must get a clean refusal (with the dp-sharding suggestion),
not an opaque XLA OOM, when a pool/session geometry cannot fit the
chip's HBM.  Budget is injected via VOXTRAL_HBM_BYTES so the gate is
testable on the CPU backend (where no budget applies by default).
"""

import json
import threading

import pytest

import jax
import jax.numpy as jnp

from voxtral_tpu.utils.hbm import (
    HBMBudgetError,
    check_hbm,
    device_hbm_budget,
    model_hbm_bytes,
    tree_unique_bytes,
)


def test_budget_env_override(monkeypatch):
    monkeypatch.setenv("VOXTRAL_HBM_BYTES", "12345")
    assert device_hbm_budget() == 12345
    monkeypatch.delenv("VOXTRAL_HBM_BYTES")
    # CPU backend: no budget applies.
    assert device_hbm_budget() is None


def test_tree_unique_bytes_dedupes_shared_buffers():
    a = jnp.zeros((16, 16), jnp.float32)  # 1024 B
    b = jnp.zeros((8,), jnp.int8)         # 8 B
    assert tree_unique_bytes({"x": a, "y": b}) == 1024 + 8
    # The SAME array referenced from two trees counts once (the bf16
    # megakernel fuse shares buffers between fused stacks and params).
    assert tree_unique_bytes({"x": a}, {"nt": a, "z": b}) == 1024 + 8


def test_model_bytes_bf16_fuse_is_memory_neutral(monkeypatch):
    """fused_decode after the bf16 nt-rewrite must not add bytes."""
    from tests.test_bf16_stack import _tiny_bf16_cfg
    from voxtral_tpu.models.voxtral import VoxtralModel

    cfg = _tiny_bf16_cfg()
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "0")
    plain = VoxtralModel.init_random(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
    base = tree_unique_bytes(plain.params)
    monkeypatch.setenv("VOXTRAL_MEGAKERNEL", "force")
    fused = VoxtralModel.init_random(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
    assert fused.megakernel_weights == "bf16"
    # Same bytes up to the f32 norm-stack copies in the fused dict.
    slack = 4 * 2 * cfg.language_model.n_layers * cfg.language_model.dim
    assert model_hbm_bytes(fused) <= base + slack


def test_check_hbm_raises_with_suggestions(monkeypatch):
    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel

    model = VoxtralModel.init_random(jax.random.PRNGKey(0), tiny_config(),
                                     dtype=jnp.float32)
    monkeypatch.setenv("VOXTRAL_HBM_BYTES", str(256 * 2**20))
    with pytest.raises(HBMBudgetError) as ei:
        check_hbm(model, 64 * 2**30, "StreamPool(max_streams=16)",
                  rows=16)
    msg = str(ei.value)
    assert "data-parallel" in msg and "int8" in msg
    # Fits fine under a real-sized budget.
    monkeypatch.setenv("VOXTRAL_HBM_BYTES", str(128 * 2**30))
    check_hbm(model, 64 * 2**30, "StreamPool", rows=16)


def test_pool_construction_refused(monkeypatch):
    """A pool whose rings exceed the budget must refuse at construction
    (the '17th ring' case) — and succeed once the budget is realistic."""
    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamPool

    model = VoxtralModel.init_random(jax.random.PRNGKey(0), tiny_config(),
                                     dtype=jnp.float32)
    # Budget barely above weights + workspace: the pool caches tip it.
    floor = model_hbm_bytes(model) + 1 * 2**30
    monkeypatch.setenv("VOXTRAL_HBM_BYTES", str(floor + 1 * 2**20))
    with pytest.raises(HBMBudgetError):
        StreamPool(model, max_streams=64, max_duration_s=3000.0)
    monkeypatch.setenv("VOXTRAL_HBM_BYTES", str(floor + 16 * 2**30))
    pool = StreamPool(model, max_streams=2, step_positions=8)
    assert pool.free_slots == 2


def test_solo_session_refused(monkeypatch):
    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.streaming import StreamingSession

    model = VoxtralModel.init_random(jax.random.PRNGKey(0), tiny_config(),
                                     dtype=jnp.float32)
    monkeypatch.setenv("VOXTRAL_HBM_BYTES", "1")
    with pytest.raises(HBMBudgetError):
        StreamingSession(model, step_positions=8, max_duration_s=30)


def test_server_returns_503(monkeypatch):
    """/stream/start under an exhausted budget -> 503 + the hint, not an
    XLA OOM (VERDICT r3 #6 'done' criterion)."""
    from tests.test_model import tiny_config
    from tests.test_serving import request
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline
    from voxtral_tpu.serving import make_server
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    model = VoxtralModel.init_random(jax.random.PRNGKey(0), tiny_config(),
                                     dtype=jnp.float32)
    tokenizer = VoxtralTokenizer([None] * 500, {}, 500)
    pipeline = TranscribePipeline(model, tokenizer, PipelineConfig())
    srv = make_server(pipeline, "127.0.0.1", 0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        monkeypatch.setenv("VOXTRAL_HBM_BYTES", "1")
        status, data = request(srv.server_address, "POST", "/stream/start")
        assert status == 503
        assert "HBM" in json.loads(data)["error"]
        # With the budget lifted the same endpoint works.
        monkeypatch.delenv("VOXTRAL_HBM_BYTES")
        status, data = request(srv.server_address, "POST", "/stream/start")
        assert status == 200
    finally:
        srv.shutdown()
