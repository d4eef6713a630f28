"""Q4_0 GGUF model loading into the voxtral_tpu parameter pytree.

Mirrors the reference Q4 loader's structure
(``/root/reference/src/gguf/loader.rs``): the GGUF export uses the same
tensor names as the SafeTensors checkpoint; weight-heavy linears and the
token-embedding table are Q4_0, while norms, biases and the conv
downsampler stay F32 (gguf/loader.rs:263-275).  Dims are reversed from
GGUF order (loader.rs:493-499).

Q4 linears become ``{"q4": {codes, scales}}`` pytree leaves (repacked for
TPU — see :mod:`voxtral_tpu.ops.q4`); the model's ``linear()`` dispatches
on the leaf type, so encoder/decoder code is shared between f32 and Q4
paths (the reference maintains a parallel Q4 model tree, model.rs:1-6).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import numpy as np

from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.loaders import names as N
from voxtral_tpu.loaders.gguf import GGML_Q4_0, GgufReader
from voxtral_tpu.ops.q4 import repack_q4_0

Params = dict[str, Any]


class Q4ModelLoader:
    """Loads GGUF Q4_0 checkpoints.

    weight_format:
      * "q4" — keep int4 (packed for the Pallas kernel); minimum HBM.
      * "q4g" — keep the unpacked group-32 form ({codes = nibble − 8,
        f16 block scales} — the EXACT re-encoding of on-disk Q4_0,
        reference gguf/tensor.rs:88-113) so decode rides the fused stack
        kernel's g32 mode with the reference's exact weight numerics
        (ops/decode_step_pallas.fuse_decode_weights_q4g).
      * "w8" — requantize to rowwise int8 at load for the native int8 MXU
        path (fastest decode on v5e; see ops/w8.py) — a second, lossy
        quantization (measured: scripts/q4_error_report.py).
    """

    def __init__(self, reader: GgufReader, cfg: Optional[VoxtralConfig] = None,
                 pack_nibbles: bool = True, weight_format: str = "q4"):
        assert weight_format in ("q4", "q4g", "w8"), weight_format
        self.reader = reader
        self.cfg = cfg or VoxtralConfig.voxtral()
        # q4g streams int8 codes + f16 scales; nibble-packing would round
        # the scales to bf16 and lock the leaves out of the fused path.
        self.pack_nibbles = pack_nibbles and weight_format != "q4g"
        self.weight_format = weight_format

    @classmethod
    def from_file(cls, path: str | Path, **kw) -> "Q4ModelLoader":
        return cls(GgufReader.from_file(path), **kw)

    @classmethod
    def from_bytes(cls, data: bytes, **kw) -> "Q4ModelLoader":
        return cls(GgufReader.from_bytes(data), **kw)

    @staticmethod
    def _native():
        """The C++ repacker when available (one streaming pass, no copies)."""
        try:
            from voxtral_tpu import native

            return native if native.available() else None
        except Exception:
            return None

    # -- primitives ---------------------------------------------------------

    def _weight(self, name: str, transpose: bool = True):
        """Load a weight: Q4_0 -> q4 dict ([out, in]); F32/F16 -> dense
        [in, out] (transposed to the JAX convention unless ``transpose``
        is False, e.g. the embedding table which stays [vocab, d])."""
        info = self.reader.tensor_info(name)
        if info is None:
            raise KeyError(f"Tensor '{name}' not found in GGUF")
        if info.dtype == GGML_Q4_0:
            shape = info.torch_shape
            assert len(shape) == 2, (name, shape)
            n, k = shape
            raw = self.reader.tensor_data(name)
            if self.weight_format == "w8":
                from voxtral_tpu.ops.q4 import dequantize_q4_0
                from voxtral_tpu.ops.w8 import quantize_w8_rowwise

                native = self._native()
                if native is not None:
                    deq = native.q4_dequant_f32(raw, n * k).reshape(n, k)
                else:
                    deq = dequantize_q4_0(np.asarray(raw), n * k).reshape(n, k)
                return quantize_w8_rowwise(deq)
            # Shapes the Pallas kernel accepts store ONLY the packed form
            # (halves HBM); tiny matmuls (ADA) keep int8 codes for XLA.
            use_packed = self.pack_nibbles and k % 256 == 0 and n % 128 == 0
            native = self._native()
            if use_packed:
                if native is not None:
                    codes_packed, scales_t = native.q4_repack_packed(raw, n, k)
                    q4 = {"codes_packed": codes_packed, "scales_t": scales_t}
                else:
                    from voxtral_tpu.ops.q4_pallas import (
                        pack_codes,
                        transpose_scales,
                    )

                    r = repack_q4_0(raw, shape)
                    q4 = {
                        "codes_packed": pack_codes(r["codes"]),
                        "scales_t": transpose_scales(r["scales"]),
                    }
            elif native is not None:
                codes, scales = native.q4_repack_int8(raw, n, k)
                q4 = {"codes": codes, "scales": scales}
            else:
                q4 = repack_q4_0(raw, shape)
            return {"q4": q4}
        w = self.reader.tensor_f32(name)
        return np.ascontiguousarray(w.T) if transpose else w

    def _f32(self, name: str) -> np.ndarray:
        return self.reader.tensor_f32(name)

    def _opt_f32(self, name: str) -> Optional[np.ndarray]:
        return self._f32(name) if self.reader.tensor_info(name) else None

    def _stack(self, leaves: list):
        """Stack per-layer leaves (dense arrays or q4/w8 dicts) along axis 0."""
        if isinstance(leaves[0], dict):
            fmt = next(iter(leaves[0]))  # "q4" or "w8"
            return {
                fmt: {
                    key: np.stack([l[fmt][key] for l in leaves], axis=0)
                    for key in leaves[0][fmt]
                }
            }
        return np.stack(leaves, axis=0)

    # -- components ---------------------------------------------------------

    def load_encoder(self) -> Params:
        cfg = self.cfg.audio_encoder
        cv = N.conv_names()
        per: dict[str, list] = {k: [] for k in (
            "attention_norm", "ffn_norm", "wq", "wq_b", "wk", "wv", "wv_b",
            "wo", "wo_b", "w1", "w2", "w2_b", "w3",
        )}
        for i in range(cfg.n_layers):
            nm = N.encoder_layer_names(i)
            per["attention_norm"].append(self._f32(nm["attention_norm"]))
            per["wq"].append(self._weight(nm["wq_weight"]))
            per["wq_b"].append(self._f32(nm["wq_bias"]))
            per["wk"].append(self._weight(nm["wk_weight"]))
            per["wv"].append(self._weight(nm["wv_weight"]))
            per["wv_b"].append(self._f32(nm["wv_bias"]))
            per["wo"].append(self._weight(nm["wo_weight"]))
            per["wo_b"].append(self._f32(nm["wo_bias"]))
            per["ffn_norm"].append(self._f32(nm["ffn_norm"]))
            per["w1"].append(self._weight(nm["w1_weight"]))
            per["w2"].append(self._weight(nm["w2_weight"]))
            per["w2_b"].append(self._f32(nm["w2_bias"]))
            per["w3"].append(self._weight(nm["w3_weight"]))

        return {
            "conv": {
                "conv1": self._f32(cv["conv1_weight"]),
                "conv1_b": self._f32(cv["conv1_bias"]),
                "conv2": self._f32(cv["conv2_weight"]),
                "conv2_b": self._f32(cv["conv2_bias"]),
            },
            "layers": {
                "attention_norm": self._stack(per["attention_norm"]),
                "attention": {
                    "wq": self._stack(per["wq"]), "wq_b": self._stack(per["wq_b"]),
                    "wk": self._stack(per["wk"]),
                    "wv": self._stack(per["wv"]), "wv_b": self._stack(per["wv_b"]),
                    "wo": self._stack(per["wo"]), "wo_b": self._stack(per["wo_b"]),
                },
                "ffn_norm": self._stack(per["ffn_norm"]),
                "ffn": {
                    "w1": self._stack(per["w1"]),
                    "w2": self._stack(per["w2"]), "w2_b": self._stack(per["w2_b"]),
                    "w3": self._stack(per["w3"]),
                },
            },
            "norm": self._f32(N.ENCODER_FINAL_NORM),
        }

    def load_decoder(self) -> Params:
        cfg = self.cfg.language_model
        per: dict[str, list] = {k: [] for k in (
            "ada_w0", "ada_w2", "attention_norm", "ffn_norm",
            "wq", "wk", "wv", "wo", "w1", "w2", "w3",
        )}
        for i in range(cfg.n_layers):
            nm = N.decoder_layer_names(i)
            per["ada_w0"].append(self._weight(nm["ada_norm_down"]))
            per["ada_w2"].append(self._weight(nm["ada_norm_up"]))
            per["attention_norm"].append(self._f32(nm["attention_norm"]))
            per["wq"].append(self._weight(nm["wq_weight"]))
            per["wk"].append(self._weight(nm["wk_weight"]))
            per["wv"].append(self._weight(nm["wv_weight"]))
            per["wo"].append(self._weight(nm["wo_weight"]))
            per["ffn_norm"].append(self._f32(nm["ffn_norm"]))
            per["w1"].append(self._weight(nm["w1_weight"]))
            per["w2"].append(self._weight(nm["w2_weight"]))
            per["w3"].append(self._weight(nm["w3_weight"]))

        return {
            "tok_embeddings": self._weight(N.TOK_EMBEDDINGS, transpose=False),
            "layers": {
                "ada": {
                    "w0": self._stack(per["ada_w0"]),
                    "w2": self._stack(per["ada_w2"]),
                },
                "attention_norm": self._stack(per["attention_norm"]),
                "attention": {
                    "wq": self._stack(per["wq"]), "wk": self._stack(per["wk"]),
                    "wv": self._stack(per["wv"]), "wo": self._stack(per["wo"]),
                },
                "ffn_norm": self._stack(per["ffn_norm"]),
                "ffn": {
                    "w1": self._stack(per["w1"]), "w2": self._stack(per["w2"]),
                    "w3": self._stack(per["w3"]),
                },
            },
            "norm": self._f32(N.FINAL_NORM),
        }

    def load_adapter(self) -> Params:
        nm = N.adapter_names()
        return {
            "w1": self._weight(nm["linear1_weight"]),
            "w2": self._weight(nm["linear2_weight"]),
        }

    def load(self, to_device: bool = True) -> Params:
        params = {
            "encoder": self.load_encoder(),
            "decoder": self.load_decoder(),
            "adapter": self.load_adapter(),
        }
        if to_device:
            import jax
            import jax.numpy as jnp

            params = jax.tree_util.tree_map(jnp.asarray, params)
        return params


def load_q4_model(path: str | Path, cfg: Optional[VoxtralConfig] = None,
                  pack_nibbles: bool = True, weight_format: str = "q4",
                  mesh=None):
    """GGUF file -> VoxtralModel with Q4 (or load-time-W8) weights."""
    from voxtral_tpu.models.voxtral import VoxtralModel

    loader = Q4ModelLoader.from_file(
        path, cfg=cfg, pack_nibbles=pack_nibbles, weight_format=weight_format
    )
    params = loader.load()
    return VoxtralModel(params, loader.cfg, mesh=mesh)
