"""Benchmark tooling tests: e2e bench runs end-to-end; on-the-fly Q4
quantization of a dense pytree matches GGUF-loaded behavior."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
FIXTURES = Path(__file__).parent / "fixtures"


def test_quantize_params_q4_roundtrip():
    import jax
    import jax.numpy as jnp

    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.utils.quantize import quantize_params_q4

    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32
    )
    qparams = quantize_params_q4(model.params)
    qmodel = VoxtralModel(qparams, model.config, compute_dtype=jnp.float32)

    # Structure: decoder attention weights became q4 dicts.
    assert "q4" in qparams["decoder"]["layers"]["attention"]["wq"]
    assert "q4" in qparams["decoder"]["tok_embeddings"]

    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 64), jnp.float32) * 0.2
    ref = np.asarray(model.forward(mel, model.t_embed()))
    got = np.asarray(qmodel.forward(mel, qmodel.t_embed()))
    cos = np.sum(got * ref) / (np.linalg.norm(got) * np.linalg.norm(ref))
    # Unstructured random weights are the worst case for int4 (~9% per-weight
    # error compounding over layers); trained checkpoints sit far closer.
    assert cos > 0.95, cos


def test_e2e_bench_runs():
    out = subprocess.run(
        [
            sys.executable, "benches/e2e_bench.py",
            "--random-weights", "--params", str(FIXTURES / "params_tiny.json"),
            "--platform", "cpu", "--seconds", "4", "--iterations", "1",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    for key in ("rtf", "tok_per_s", "encode_ms", "decode_ms", "preprocess_ms",
                "peak_rss_mb", "tokens"):
        assert key in report
    assert report["tokens"] > 0
    assert report["rtf"] > 0
