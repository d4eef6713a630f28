"""SafeTensors weight loading into the voxtral_tpu parameter pytree.

Hand-parses the SafeTensors header and memory-maps the data section —
the same approach as the reference's ``load_tensor_raw``
(``/root/reference/src/models/weights.rs:75-154``), which exists there to
dodge a wasm32 overflow; here it lets us read bf16 straight into
``ml_dtypes.bfloat16`` without a torch round-trip and slice layer-stacked
views lazily from the memmap.

Layout conversions applied while loading (weights.rs:251-263):
* Linear weights: PyTorch ``[out, in]`` -> ours ``[in, out]`` (transpose).
* Conv1d weights stay ``[out, in, k]``.
* Per-layer tensors are stacked along a leading axis for ``lax.scan``.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Optional

import numpy as np

try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BF16 = None

from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.loaders import names as N

Params = dict[str, Any]

_DTYPES = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": _BF16,
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "BOOL": np.dtype(np.bool_),
}


class SafeTensorsFile:
    """Read-only memory-mapped SafeTensors file."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        with open(self.path, "rb") as f:
            (header_len,) = struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(header_len))
        header.pop("__metadata__", None)
        self._index = header
        self._data_offset = 8 + header_len
        self._mmap = np.memmap(self.path, dtype=np.uint8, mode="r")

    def names(self) -> list[str]:
        return list(self._index.keys())

    def has_tensor(self, name: str) -> bool:
        return name in self._index

    def tensor_meta(self, name: str) -> tuple[str, tuple[int, ...]]:
        info = self._index[name]
        return info["dtype"], tuple(info["shape"])

    def tensor(self, name: str, dtype: Optional[np.dtype] = None) -> np.ndarray:
        """Load one tensor as a numpy array (zero-copy view of the mmap
        unless a dtype conversion is requested)."""
        if name not in self._index:
            raise KeyError(f"Tensor '{name}' not found in {self.path}")
        info = self._index[name]
        src_dtype = _DTYPES.get(info["dtype"])
        if src_dtype is None:
            raise ValueError(f"Unsupported SafeTensors dtype {info['dtype']!r}")
        start, end = info["data_offsets"]
        raw = self._mmap[self._data_offset + start : self._data_offset + end]
        arr = raw.view(src_dtype).reshape(info["shape"])
        if dtype is not None and arr.dtype != dtype:
            arr = arr.astype(dtype)
        return arr


def _linear(st: SafeTensorsFile, name: str, dtype) -> np.ndarray:
    """PyTorch [out, in] -> [in, out]."""
    return np.ascontiguousarray(st.tensor(name, dtype).T)


def _stack(arrays: list[np.ndarray]) -> np.ndarray:
    return np.stack(arrays, axis=0)


def load_encoder_params(st: SafeTensorsFile, cfg: VoxtralConfig, dtype) -> Params:
    cv = N.conv_names()
    enc = {
        "conv": {
            "conv1": st.tensor(cv["conv1_weight"], dtype),
            "conv1_b": st.tensor(cv["conv1_bias"], dtype),
            "conv2": st.tensor(cv["conv2_weight"], dtype),
            "conv2_b": st.tensor(cv["conv2_bias"], dtype),
        },
        "norm": st.tensor(N.ENCODER_FINAL_NORM, dtype),
    }

    per = {
        "attention_norm": [], "ffn_norm": [],
        "wq": [], "wq_b": [], "wk": [], "wv": [], "wv_b": [], "wo": [], "wo_b": [],
        "w1": [], "w2": [], "w2_b": [], "w3": [],
    }
    for i in range(cfg.audio_encoder.n_layers):
        nm = N.encoder_layer_names(i)
        per["attention_norm"].append(st.tensor(nm["attention_norm"], dtype))
        per["wq"].append(_linear(st, nm["wq_weight"], dtype))
        per["wq_b"].append(st.tensor(nm["wq_bias"], dtype))
        per["wk"].append(_linear(st, nm["wk_weight"], dtype))
        per["wv"].append(_linear(st, nm["wv_weight"], dtype))
        per["wv_b"].append(st.tensor(nm["wv_bias"], dtype))
        per["wo"].append(_linear(st, nm["wo_weight"], dtype))
        per["wo_b"].append(st.tensor(nm["wo_bias"], dtype))
        per["ffn_norm"].append(st.tensor(nm["ffn_norm"], dtype))
        per["w1"].append(_linear(st, nm["w1_weight"], dtype))
        per["w2"].append(_linear(st, nm["w2_weight"], dtype))
        per["w2_b"].append(st.tensor(nm["w2_bias"], dtype))
        per["w3"].append(_linear(st, nm["w3_weight"], dtype))

    enc["layers"] = {
        "attention_norm": _stack(per["attention_norm"]),
        "attention": {
            "wq": _stack(per["wq"]), "wq_b": _stack(per["wq_b"]),
            "wk": _stack(per["wk"]),
            "wv": _stack(per["wv"]), "wv_b": _stack(per["wv_b"]),
            "wo": _stack(per["wo"]), "wo_b": _stack(per["wo_b"]),
        },
        "ffn_norm": _stack(per["ffn_norm"]),
        "ffn": {
            "w1": _stack(per["w1"]),
            "w2": _stack(per["w2"]), "w2_b": _stack(per["w2_b"]),
            "w3": _stack(per["w3"]),
        },
    }
    return enc


def load_decoder_params(
    st: SafeTensorsFile,
    cfg: VoxtralConfig,
    dtype,
    max_vocab_size: Optional[int] = None,
) -> Params:
    tok = st.tensor(N.TOK_EMBEDDINGS, dtype)
    if max_vocab_size is not None and tok.shape[0] > max_vocab_size:
        # Vocab truncation (reference loader.rs:205-218) — saves memory when
        # the tail of the 131k vocab is not needed.
        tok = tok[:max_vocab_size]

    per = {
        "ada_w0": [], "ada_w2": [], "attention_norm": [], "ffn_norm": [],
        "wq": [], "wk": [], "wv": [], "wo": [], "w1": [], "w2": [], "w3": [],
    }
    for i in range(cfg.language_model.n_layers):
        nm = N.decoder_layer_names(i)
        # ada_norm_down [t_cond, d] -> w0 [d, t_cond]; ada_norm_up [d, t_cond]
        # -> w2 [t_cond, d] (decoder_layer.rs:108-133).
        per["ada_w0"].append(_linear(st, nm["ada_norm_down"], dtype))
        per["ada_w2"].append(_linear(st, nm["ada_norm_up"], dtype))
        per["attention_norm"].append(st.tensor(nm["attention_norm"], dtype))
        per["wq"].append(_linear(st, nm["wq_weight"], dtype))
        per["wk"].append(_linear(st, nm["wk_weight"], dtype))
        per["wv"].append(_linear(st, nm["wv_weight"], dtype))
        per["wo"].append(_linear(st, nm["wo_weight"], dtype))
        per["ffn_norm"].append(st.tensor(nm["ffn_norm"], dtype))
        per["w1"].append(_linear(st, nm["w1_weight"], dtype))
        per["w2"].append(_linear(st, nm["w2_weight"], dtype))
        per["w3"].append(_linear(st, nm["w3_weight"], dtype))

    return {
        "tok_embeddings": tok,
        "layers": {
            "ada": {"w0": _stack(per["ada_w0"]), "w2": _stack(per["ada_w2"])},
            "attention_norm": _stack(per["attention_norm"]),
            "attention": {
                "wq": _stack(per["wq"]), "wk": _stack(per["wk"]),
                "wv": _stack(per["wv"]), "wo": _stack(per["wo"]),
            },
            "ffn_norm": _stack(per["ffn_norm"]),
            "ffn": {
                "w1": _stack(per["w1"]), "w2": _stack(per["w2"]),
                "w3": _stack(per["w3"]),
            },
        },
        "norm": st.tensor(N.FINAL_NORM, dtype),
    }


def load_adapter_params(st: SafeTensorsFile, dtype) -> Params:
    nm = N.adapter_names()
    return {
        "w1": _linear(st, nm["linear1_weight"], dtype),
        "w2": _linear(st, nm["linear2_weight"], dtype),
    }


def load_voxtral_params(
    path: str | Path,
    cfg: Optional[VoxtralConfig] = None,
    dtype: str = "bfloat16",
    max_vocab_size: Optional[int] = None,
    to_device: bool = True,
) -> Params:
    """Load the full parameter pytree from ``consolidated.safetensors``.

    dtype: target compute dtype ("bfloat16" or "float32").
    Returns numpy arrays (to_device=False) or device arrays.
    """
    cfg = cfg or VoxtralConfig.voxtral()
    np_dtype = _BF16 if dtype == "bfloat16" else np.dtype(np.float32)

    st = SafeTensorsFile(path)
    params = {
        "encoder": load_encoder_params(st, cfg, np_dtype),
        "decoder": load_decoder_params(st, cfg, np_dtype, max_vocab_size),
        "adapter": load_adapter_params(st, np_dtype),
    }

    if to_device:
        import jax
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(jnp.asarray, params)
    return params
