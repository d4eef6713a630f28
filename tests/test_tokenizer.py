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
