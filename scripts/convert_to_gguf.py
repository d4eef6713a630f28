#!/usr/bin/env python
"""Convert a Voxtral SafeTensors checkpoint to Q4_0 GGUF.

Replaces the llama.cpp-based conversion step the reference assumes.
Quantization choices match the reference's expectations
(``/root/reference/src/gguf/loader.rs``): all 2-D weight matrices
(attention/FFN/ADA/adapter linears and the token-embedding table) become
Q4_0 along the innermost (in-features) axis; norms, biases and the conv
downsampler stay F32.

Usage: python scripts/convert_to_gguf.py <model_dir> <out.gguf>
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from voxtral_tpu.config import VoxtralConfig
from voxtral_tpu.loaders import names as N
from voxtral_tpu.loaders.gguf import GGML_F32, GGML_Q4_0, write_gguf
from voxtral_tpu.loaders.safetensors_loader import SafeTensorsFile
from voxtral_tpu.ops.q4 import quantize_q4_0


def convert(model_dir: str | Path, out_path: str | Path) -> None:
    model_dir = Path(model_dir)
    cfg = VoxtralConfig.from_model_dir(model_dir)
    st = SafeTensorsFile(model_dir / "consolidated.safetensors")

    q4_names: set[str] = {N.TOK_EMBEDDINGS}
    f32_names: set[str] = {N.FINAL_NORM, N.ENCODER_FINAL_NORM}
    f32_names.update(N.conv_names().values())
    for i in range(cfg.audio_encoder.n_layers):
        nm = N.encoder_layer_names(i)
        q4_names.update(
            nm[k] for k in ("wq_weight", "wk_weight", "wv_weight", "wo_weight",
                            "w1_weight", "w2_weight", "w3_weight")
        )
        f32_names.update(
            nm[k] for k in ("attention_norm", "ffn_norm", "wq_bias", "wv_bias",
                            "wo_bias", "w2_bias")
        )
    for i in range(cfg.language_model.n_layers):
        nm = N.decoder_layer_names(i)
        q4_names.update(
            nm[k] for k in ("ada_norm_down", "ada_norm_up", "wq_weight",
                            "wk_weight", "wv_weight", "wo_weight",
                            "w1_weight", "w2_weight", "w3_weight")
        )
        f32_names.update(nm[k] for k in ("attention_norm", "ffn_norm"))
    q4_names.update(N.adapter_names().values())

    tensors: dict[str, tuple[tuple[int, ...], int, bytes]] = {}
    for name in sorted(q4_names | f32_names):
        if not st.has_tensor(name):
            if name.endswith(".bias"):
                continue  # optional biases
            raise KeyError(f"Missing tensor: {name}")
        arr = st.tensor(name, np.float32)
        # Tensors whose in-features axis is not a multiple of the Q4_0
        # block stay F32 (never happens at production dims).
        if name in q4_names and arr.shape[-1] % 32 == 0:
            tensors[name] = (arr.shape, GGML_Q4_0, quantize_q4_0(arr))
        else:
            tensors[name] = (arr.shape, GGML_F32, arr.tobytes())

    with open(out_path, "wb") as f:
        write_gguf(f, tensors)
    size_mb = Path(out_path).stat().st_size / 1e6
    print(f"wrote {out_path} ({size_mb:.0f} MB, {len(tensors)} tensors)")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    convert(sys.argv[1], sys.argv[2])
