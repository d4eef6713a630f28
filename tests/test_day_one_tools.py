"""Day-one validation tooling dry runs (VERDICT r3 next #3 and #10).

These must work NOW against synthetic checkpoints so that on the day
real weights arrive, the only unknown is the weights: the one-shot
validator (scripts/validate_real.py), the weight-name forensic dump
(scripts/dump_weight_names.py), and the staged full-forward compare
(scripts/compare_forward_stages.py).
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    from tests.test_golden_full_model import golden_cfg
    from tests.test_safetensors_loader import synth_checkpoint

    cfg = golden_cfg()
    d = tmp_path_factory.mktemp("dayone")
    tensors = synth_checkpoint(cfg, np.random.default_rng(42))
    tensors = {k: (v * 0.25).astype(np.float32) for k, v in tensors.items()}
    save_file(tensors, str(d / "consolidated.safetensors"))
    (d / "params.json").write_text(cfg.to_params_json())
    return d


def test_dump_weight_names_clean(synth_dir):
    r = subprocess.run(
        [sys.executable, "scripts/dump_weight_names.py", str(synth_dir),
         "--quiet"],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-1000:]
    assert "missing: 0" in r.stdout and "unexpected: 0" in r.stdout


def test_dump_weight_names_detects_missing(synth_dir, tmp_path):
    """Dropping a tensor must be reported and exit nonzero."""
    from safetensors.numpy import load_file, save_file

    tensors = load_file(synth_dir / "consolidated.safetensors")
    victim = next(k for k in tensors if "layers.0.attention.wq" in k)
    del tensors[victim]
    d = tmp_path / "broken"
    d.mkdir()
    save_file(tensors, str(d / "consolidated.safetensors"))
    (d / "params.json").write_text(
        (synth_dir / "params.json").read_text())
    r = subprocess.run(
        [sys.executable, "scripts/dump_weight_names.py", str(d), "--quiet"],
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert r.returncode == 1
    assert victim in r.stdout and "MISSING" in r.stdout


def test_compare_forward_stages_all_match(synth_dir):
    r = subprocess.run(
        [sys.executable, "scripts/compare_forward_stages.py",
         str(synth_dir), "--seconds", "1.0"],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-500:]
    assert "all stages match" in r.stdout
    for stage in ("conv", "encoder", "adapter", "decoder_layer0",
                  "final_hidden", "logits_last"):
        assert stage in r.stdout


def test_compare_forward_stages_reports_first_divergence(synth_dir):
    """The divergence report must name the FIRST failing stage and exit
    nonzero.  (Both implementations read the same weights, so a real
    divergence needs an implementation bug; an impossible tolerance
    exercises the reporting path.)"""
    r = subprocess.run(
        [sys.executable, "scripts/compare_forward_stages.py",
         str(synth_dir), "--seconds", "1.0", "--tol", "-1"],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert r.returncode == 1
    assert "FIRST DIVERGING STAGE: conv" in r.stdout


def test_validate_real_synthetic_dry_run(tmp_path):
    """The one-shot validator must pass end-to-end on a synthetic
    checkpoint with the WER stage skipping cleanly (zero-egress)."""
    out = tmp_path / "verdict.json"
    r = subprocess.run(
        [sys.executable, "scripts/validate_real.py", "--synthetic",
         "--skip-fixtures",  # exercised separately by the tests above
         "--output", str(out)],
        cwd=REPO, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    verdict = json.loads(out.read_text())
    assert verdict["pass"] is True
    assert verdict["stages"]["weights"]["status"] == "pass"
    assert verdict["stages"]["clip"]["status"] == "pass"
    assert verdict["stages"]["wer"]["status"] == "skipped"
    # The serving stage boots a real server on the synthetic weights
    # and drives every endpoint family through the client.
    assert verdict["stages"]["serving"]["status"] == "pass"
    assert verdict["stages"]["serving"]["texts"].keys() == {
        "transcribe", "v1_json", "v1_sse", "stream_session"}
