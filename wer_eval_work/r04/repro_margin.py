"""Confirm ULP-noise theory: big-window config + logit margin probe."""
import os
import sys
sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
import jax.numpy as jnp
import numpy as np

from tests.test_model import tiny_config
from voxtral_tpu.models.voxtral import VoxtralModel
from voxtral_tpu.streaming import StreamingSession, StreamPool
from voxtral_tpu.utils.quantize import quantize_params_w8

rng = np.random.default_rng(31)
audio_a = np.concatenate([
    rng.normal(size=16000 * 3).astype(np.float32) * 0.25,
    np.zeros(16000 * 2, np.float32)])
os.environ["VOXTRAL_MEGAKERNEL"] = "force"


def build(window):
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, language_model=dataclasses.replace(
            cfg.language_model, vocab_size=1280, sliding_window=window))
    f32 = VoxtralModel.init_random(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
    return VoxtralModel(quantize_params_w8(f32.params), cfg)


def run(model, spec):
    kw = dict(speculative=spec) if spec else {}
    pool = StreamPool(model, max_streams=1, step_positions=8,
                      max_duration_s=30, kv_dtype="model", **kw)
    s = StreamingSession(model, step_positions=8, pool=pool)
    s.feed(audio_a)
    s.finish()
    return list(s.tokens)


def first_diff(a, b):
    for i, (u, v) in enumerate(zip(a, b)):
        if u != v:
            return i
    return None


for w in (8192, 32):
    m = build(w)
    ref = run(m, 0)
    sp = run(m, 4)
    print(f"window={w}: spec==seq {sp == ref} diff {first_diff(sp, ref)}")
