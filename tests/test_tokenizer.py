"""Tokenizer tests against a synthetic tekken.json (reference tokenizer/mod.rs)."""

import base64
import json

from voxtral_tpu.tokenizer import (
    BOS_TOKEN,
    STREAMING_PAD,
    STREAMING_WORD,
    TEXT_TOKEN_OFFSET,
    VoxtralTokenizer,
)


def make_tekken_json() -> str:
    """Synthetic tekken.json: 4 control tokens + a small text vocab."""
    vocab = []
    # Control tokens occupy the first vocab slots with rank = token ID.
    for rank, name in [(0, "<unk>"), (1, "<s>"), (32, "[STREAMING_PAD]"), (33, "[STREAMING_WORD]")]:
        vocab.append({"rank": rank, "token_str": name, "is_control": True})
    # Text tokens: vocab index = len at insertion; token ID = index + 1000.
    words = [b"hello", b" world", b"!", b" mary", b" lamb", "é".encode("utf-8")]
    for i, w in enumerate(words):
        vocab.append(
            {
                "rank": 1000 + len(vocab),
                "token_bytes": base64.b64encode(w).decode("ascii"),
                "is_control": False,
            }
        )
    return json.dumps(
        {
            "config": {
                "pattern": ".",
                "num_vocab_tokens": len(vocab),
                "default_vocab_size": 131072,
                "default_num_special_tokens": 1000,
                "version": "v7",
            },
            "vocab": vocab,
        }
    )


def test_special_token_constants():
    assert BOS_TOKEN == 1
    assert STREAMING_PAD == 32
    assert STREAMING_WORD == 33
    assert TEXT_TOKEN_OFFSET == 1000


def test_decode_skips_control_tokens():
    tok = VoxtralTokenizer.from_json(make_tekken_json())
    assert tok.vocab_size == 131072
    # vocab indices: controls at 0..3, text at 4.. => token IDs 1004..
    ids = [1, 32, 1004, 1005, 33, 1006]
    assert tok.decode(ids) == "hello world!"


def test_decode_token():
    tok = VoxtralTokenizer.from_json(make_tekken_json())
    assert tok.decode_token(32) == "[STREAMING_PAD]"
    assert tok.decode_token(33) == "[STREAMING_WORD]"
    assert tok.decode_token(1) == "<s>"
    assert tok.decode_token(1004) == "hello"
    assert tok.decode_token(1009) == "é"
    assert tok.decode_token(999) is None  # unknown control
    assert tok.decode_token(5_000_000) is None  # out of range


def test_decode_unknown_ids_silently_skipped():
    tok = VoxtralTokenizer.from_json(make_tekken_json())
    # IDs mapping past the synthetic vocab are skipped, not errors.
    assert tok.decode([1004, 999999]) == "hello"


def test_utf8_multibyte_across_tokens():
    """Multi-byte UTF-8 split across tokens must reassemble correctly."""
    e_acute = "é".encode("utf-8")  # 2 bytes
    vocab = [
        {"rank": 1, "token_str": "<s>", "is_control": True},
        {"rank": 1000, "token_bytes": base64.b64encode(e_acute[:1]).decode(), "is_control": False},
        {"rank": 1001, "token_bytes": base64.b64encode(e_acute[1:]).decode(), "is_control": False},
    ]
    tok = VoxtralTokenizer.from_json(
        json.dumps(
            {
                "config": {
                    "pattern": ".",
                    "num_vocab_tokens": 3,
                    "default_vocab_size": 131072,
                    "default_num_special_tokens": 1000,
                    "version": "v7",
                },
                "vocab": vocab,
            }
        )
    )
    assert tok.decode([1001, 1002]) == "é"


def test_decode_words_timestamps():
    """Word segmentation on [STREAMING_WORD]/[STREAMING_PAD] with
    160 ms-per-position timing, delay correction and chunk offsets."""
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    vocab = [b"he", b"llo", b" wor", b"ld"]
    tok = VoxtralTokenizer(vocab, {}, 131072)

    #        0   1     2     3   4   5     6
    ids = [33, 1000, 1001, 32, 33, 1002, 1003]
    words = tok.decode_words(ids)
    assert [w["word"] for w in words] == ["hello", "world"]
    assert words[0]["start"] == 0.0           # marker span start, 0*0.16
    assert words[0]["end"] == 0.48            # pad at index 3 -> 3*0.16
    assert words[1]["start"] == 0.64          # marker at index 4
    assert words[1]["end"] == 1.12            # runs to end of ids -> 7*0.16

    # Delay correction clamps at zero; offset shifts chunked files.
    w = tok.decode_words(ids, delay_s=0.48)
    assert w[0]["start"] == 0.0 and w[1]["start"] == 0.16
    w = tok.decode_words(ids, offset_s=10.0)
    assert w[0]["start"] == 10.0 and w[0]["end"] == 10.48

    # Text without a leading word marker still opens a word.
    w = tok.decode_words([1000, 1001, 32])
    assert len(w) == 1 and w[0]["word"] == "hello"
    # Pure silence yields no words.
    assert tok.decode_words([32, 32, 32]) == []


def test_pipeline_words_surface():
    """transcribe_samples_words returns {text, words} with consistent
    text and well-formed timings on the tiny random model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tests.test_model import tiny_config
    from voxtral_tpu.models.voxtral import VoxtralModel
    from voxtral_tpu.pipeline import PipelineConfig, TranscribePipeline
    from voxtral_tpu.tokenizer import VoxtralTokenizer

    model = VoxtralModel.init_random(
        jax.random.PRNGKey(0), tiny_config(), dtype=jnp.float32)
    tok = VoxtralTokenizer([b"w%d" % i for i in range(500)], {}, 500)
    pipe = TranscribePipeline(model, tok, PipelineConfig())
    sig = (0.4 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000)
           ).astype(np.float32)
    out = pipe.transcribe_samples_words(sig, 16000)
    assert set(out) == {"text", "words"}
    assert out["text"] == pipe.transcribe_samples(sig, 16000)
    for w in out["words"]:
        assert set(w) == {"word", "start", "end"}
        assert 0.0 <= w["start"] <= w["end"]
