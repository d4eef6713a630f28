"""Tekken tokenizer (decode-only) for Voxtral.

Behavioral contract mirrors the reference
(``/root/reference/src/tokenizer/mod.rs``):

* ``tekken.json`` holds a ``config`` block and a ``vocab`` list whose
  entries carry base64 ``token_bytes`` (text tokens) or ``token_str`` with
  ``is_control: true`` (special tokens).
* Text token ID = vocab index + 1000.  IDs 0-999 are special/control tokens
  (BOS=1, ``[STREAMING_PAD]``=32, ``[STREAMING_WORD]``=33) and are skipped by
  :meth:`VoxtralTokenizer.decode`.
* Accumulated bytes are decoded as UTF-8 with invalid sequences replaced.
"""

from __future__ import annotations

import base64
import json
from pathlib import Path
from typing import Iterable, Optional

TEXT_TOKEN_OFFSET = 1000

BOS_TOKEN = 1
STREAMING_PAD = 32
STREAMING_WORD = 33


class VoxtralTokenizer:
    """Decode-only Tekken tokenizer (vocab 131072)."""

    def __init__(
        self,
        vocab_bytes: list[Optional[bytes]],
        special_tokens: dict[int, str],
        vocab_size: int,
    ):
        self._vocab_bytes = vocab_bytes
        self._special_tokens = special_tokens
        self._vocab_size = vocab_size

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_json(cls, text: str) -> "VoxtralTokenizer":
        tekken = json.loads(text)
        vocab_size = int(tekken["config"]["default_vocab_size"])
        vocab = tekken["vocab"]

        vocab_bytes: list[Optional[bytes]] = [None] * len(vocab)
        special_tokens: dict[int, str] = {}

        for idx, entry in enumerate(vocab):
            if entry.get("is_control", False):
                s = entry.get("token_str")
                if s is not None:
                    # Special tokens use their rank directly as the token ID.
                    special_tokens[int(entry["rank"])] = s
                continue

            b64 = entry.get("token_bytes")
            if b64 is not None:
                try:
                    vocab_bytes[idx] = base64.b64decode(b64)
                    continue
                except Exception:
                    pass

            s = entry.get("token_str")
            if s is not None:
                vocab_bytes[idx] = s.encode("utf-8")

        return cls(vocab_bytes, special_tokens, vocab_size)

    @classmethod
    def from_file(cls, path: str | Path) -> "VoxtralTokenizer":
        return cls.from_json(Path(path).read_text())

    @classmethod
    def from_model_dir(cls, dirpath: str | Path) -> "VoxtralTokenizer":
        return cls.from_file(Path(dirpath) / "tekken.json")

    # -- decoding -----------------------------------------------------------

    def decode(self, ids: Iterable[int]) -> str:
        """Decode token IDs to text, skipping control tokens (< 1000)."""
        out = bytearray()
        n = len(self._vocab_bytes)
        for tid in ids:
            tid = int(tid)
            if tid < TEXT_TOKEN_OFFSET:
                continue
            vocab_idx = tid - TEXT_TOKEN_OFFSET
            if vocab_idx < n:
                b = self._vocab_bytes[vocab_idx]
                if b is not None:
                    out += b
        return out.decode("utf-8", errors="replace")

    def decode_token(self, tid: int) -> Optional[str]:
        """Decode one token ID; special tokens return their string name."""
        tid = int(tid)
        if tid < TEXT_TOKEN_OFFSET:
            return self._special_tokens.get(tid)
        vocab_idx = tid - TEXT_TOKEN_OFFSET
        if vocab_idx < len(self._vocab_bytes):
            b = self._vocab_bytes[vocab_idx]
            if b is not None:
                return b.decode("utf-8", errors="replace")
        return None

    @property
    def vocab_size(self) -> int:
        return self._vocab_size
