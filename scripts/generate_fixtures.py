#!/usr/bin/env python
"""Generate golden .npy fixtures from REAL weights with torch.

The reference validates components against torch-computed fixtures
(``/root/reference/scripts/reference_forward.py`` -> ``test_data/*.npy``,
consumed by tests that skip when absent).  This is the equivalent for
voxtral_tpu: given a downloaded model dir, it computes per-component
reference outputs with an independent torch implementation (built from the
documented formulas, not from our JAX code) and writes them to
``test_data/``; ``tests/test_golden_fixtures.py`` then checks the JAX
layers against them and skips gracefully when the directory is missing.

Usage: python scripts/generate_fixtures.py <model_dir> [out_dir=test_data]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    model_dir = Path(sys.argv[1])
    out_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("test_data")
    out_dir.mkdir(parents=True, exist_ok=True)

    import torch

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.loaders import names as N
    from voxtral_tpu.loaders.safetensors_loader import SafeTensorsFile

    cfg = VoxtralConfig.from_model_dir(model_dir)
    st = SafeTensorsFile(model_dir / "consolidated.safetensors")
    t = lambda name: torch.from_numpy(np.array(st.tensor(name, np.float32)))

    rng = np.random.default_rng(0)
    d_enc = cfg.audio_encoder.dim
    d_dec = cfg.language_model.dim

    # Shared random inputs (saved so the consumer uses identical values).
    x_enc = rng.normal(size=(1, 8, d_enc)).astype(np.float32) * 0.5
    x_dec = rng.normal(size=(1, 8, d_dec)).astype(np.float32) * 0.5
    mel = rng.normal(size=(1, 128, 32)).astype(np.float32) * 0.5
    np.save(out_dir / "input_enc.npy", x_enc)
    np.save(out_dir / "input_dec.npy", x_dec)
    np.save(out_dir / "input_mel.npy", mel)

    def rms(x, w, eps=1e-5):
        return x * torch.rsqrt((x**2).mean(-1, keepdim=True) + eps) * w

    # rms_norm (encoder layer 0 attention_norm)
    nm = N.encoder_layer_names(0)
    out = rms(torch.from_numpy(x_enc), t(nm["attention_norm"]))
    np.save(out_dir / "rms_norm.npy", out.numpy())

    # swiglu (decoder layer 0 FFN)
    dm = N.decoder_layer_names(0)
    xt = torch.from_numpy(x_dec)
    gate = torch.nn.functional.silu(xt @ t(dm["w1_weight"]).T)
    up = xt @ t(dm["w3_weight"]).T
    np.save(out_dir / "swiglu.npy", ((gate * up) @ t(dm["w2_weight"]).T).numpy())

    # ada modulation (decoder layer 0)
    t_embed = rng.normal(size=(1, 1, d_dec)).astype(np.float32)
    np.save(out_dir / "input_t_embed.npy", t_embed)
    tt = torch.from_numpy(t_embed)
    scale = torch.nn.functional.gelu(tt @ t(dm["ada_norm_down"]).T) @ t(dm["ada_norm_up"]).T
    np.save(out_dir / "ada_rms_norm.npy", (xt * (1 + scale)).numpy())

    # conv downsampler
    cv = N.conv_names()
    m = torch.from_numpy(mel)
    c = torch.nn.functional.conv1d(m, t(cv["conv1_weight"]), t(cv["conv1_bias"]),
                                   stride=2, padding=1)
    c = torch.nn.functional.gelu(c)
    c = torch.nn.functional.conv1d(c, t(cv["conv2_weight"]), t(cv["conv2_bias"]),
                                   stride=2, padding=1)
    np.save(out_dir / "conv.npy", torch.nn.functional.gelu(c).numpy())

    print(f"wrote fixtures to {out_dir}/ "
          "(rms_norm, swiglu, ada_rms_norm, conv + inputs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
