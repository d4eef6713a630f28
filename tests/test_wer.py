"""WER utilities + harness tests."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from voxtral_tpu.utils.wer import aggregate_wer, cer, edit_distance, normalize_text, wer

REPO = Path(__file__).parent.parent
FIXTURES = Path(__file__).parent / "fixtures"


def test_normalize():
    assert normalize_text("Hello, World!") == "hello world"
    # jiwer.RemovePunctuation deletes apostrophes with no space substitution
    # (reference eval_wer.py:93-96): "don't" scores as "dont".
    assert normalize_text("don't  stop") == "dont stop"
    assert normalize_text("'quoted' words") == "quoted words"
    assert normalize_text("a\tb\nc") == "a b c"
    assert normalize_text("end.Start") == "endstart"
    # Unicode punctuation (category P*) is removed too.
    assert normalize_text("naïve — café’s") == "naïve cafés"


def test_normalize_matches_jiwer():
    """Bit-exact vs jiwer on a punctuation-heavy corpus (skips if absent)."""
    jiwer = pytest.importorskip("jiwer")

    def jiwer_norm(text):
        return jiwer.RemoveMultipleSpaces()(
            jiwer.Strip()(jiwer.ToLowerCase()(jiwer.RemovePunctuation()(text)))
        )

    corpus = [
        "Don't stop -- it's John's dog!",
        "Hello,   World?!  (yes)",
        "end.Start; semi:colon — em–dash ‘curly’ “quotes”",
        "  leading/trailing  ",
        "numbers 1,234.56 and 100%",
        "café's naïve résumé...",
    ]
    for text in corpus:
        assert normalize_text(text) == jiwer_norm(text), text


def test_edit_distance():
    assert edit_distance([], []) == 0
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert edit_distance(["a", "b"], ["a", "b"]) == 0
    assert edit_distance(["a"], []) == 1


def test_wer_cer():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the bat sat") == pytest.approx(1 / 3)
    assert wer("", "") == 0.0
    assert wer("", "word") == 1.0
    assert cer("abc", "abd") == pytest.approx(1 / 3)
    # Normalization folds case/punctuation differences.
    assert wer("Hello, world!", "hello world") == 0.0


def test_aggregate():
    out = aggregate_wer(["a b c", "d e"], ["a b c", "d x"])
    assert out["wer"] == pytest.approx(1 / 5)
    assert out["utterances"] == 2
    assert out["per_utterance"][0]["wer"] == 0.0


def test_eval_harness_end_to_end(tmp_path):
    """Harness over a local dir with tiny random weights (full plumbing)."""
    from voxtral_tpu.audio import AudioBuffer, save_wav

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        t = np.arange(24000) / 16000.0
        sig = (0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        save_wav(AudioBuffer(sig, 16000), data / f"utt{i}.wav")
        (data / f"utt{i}.txt").write_text("some reference words")

    out = subprocess.run(
        [
            sys.executable, "scripts/eval_wer.py",
            "--local-dir", str(data),
            "--random-weights", "--params", str(FIXTURES / "params_tiny.json"),
            "--platform", "cpu",
            "--workdir", str(tmp_path / "work"),
            "--output", str(tmp_path / "report.json"),
        ],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import json

    report = json.loads((tmp_path / "report.json").read_text())
    assert report["utterances"] == 2
    assert 0.0 <= report["wer"] <= 1.0 or report["wer"] >= 1.0  # random weights
    assert len(report["per_utterance"]) == 2
    assert "rtf" in report


def test_transcribe_files_batched_matches_per_file(tmp_path):
    """Batched multi-file eval (the WER harness's batch seam) must produce
    the same per-utterance tokens/text as one-file-at-a-time transcription,
    across mixed lengths (grouped + batch-sliced dispatch)."""
    from tests.test_pipeline_device_mel import _golden_model
    from voxtral_tpu.audio import AudioBuffer, save_wav
    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    model = _golden_model(tmp_path)
    tok = VoxtralTokenizer([b"x "] * 1280, {}, 1280)
    pipeline = TranscribePipeline(model, tok, PipelineConfig())

    paths = []
    for i, secs in enumerate((1.5, 1.5, 2.5)):
        t = np.arange(int(secs * 16000)) / 16000.0
        sig = (0.4 * np.sin(2 * np.pi * (300 + 100 * i) * t)).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        save_wav(AudioBuffer(sig, 16000), p)
        paths.append(str(p))

    captured = []
    orig = pipeline.decode_tokens
    pipeline.decode_tokens = (
        lambda toks: (captured.append(tuple(np.asarray(toks).tolist())), orig(toks))[1]
    )

    batched = pipeline.transcribe_files_batched(paths, batch_size=2)
    batch_tokens = set(captured)
    captured.clear()
    per_file = [pipeline.transcribe_file(p) for p in paths]
    solo_tokens = set(captured)

    assert batched == per_file
    assert batch_tokens == solo_tokens
    assert len(batch_tokens) >= 2  # mixed lengths actually decoded
