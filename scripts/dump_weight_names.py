#!/usr/bin/env python
"""Dump a SafeTensors checkpoint's tensor inventory vs the expected names.

Day-one forensic tool (reference analogue: ``scripts/dump_weight_names.py``
and ``verify_weights.py`` in /root/reference): lists every tensor (name,
shape, dtype) and diffs it against the canonical name tables the loader
expects (``voxtral_tpu/loaders/names.py``, mirroring the reference's
``weights.rs:219-396``), so a naming/layout drift in a new checkpoint
localizes in one run instead of a loader stack trace.

Usage:
  python scripts/dump_weight_names.py <model_dir | file.safetensors>
      [--params params.json] [--quiet]

Exit code 0 = all expected names present; 1 = missing names.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def expected_names(cfg) -> dict[str, str]:
    """name -> component tag for every tensor the loader reads."""
    from voxtral_tpu.loaders import names as N

    out: dict[str, str] = {}
    cv = N.conv_names()
    for k, v in cv.items():
        out[v] = f"conv.{k}"
    out[N.ENCODER_FINAL_NORM] = "encoder.final_norm"
    for i in range(cfg.audio_encoder.n_layers):
        for k, v in N.encoder_layer_names(i).items():
            out[v] = f"encoder.layer{i}.{k}"
    out[N.TOK_EMBEDDINGS] = "decoder.tok_embeddings"
    out[N.FINAL_NORM] = "decoder.final_norm"
    for i in range(cfg.language_model.n_layers):
        for k, v in N.decoder_layer_names(i).items():
            out[v] = f"decoder.layer{i}.{k}"
    for k, v in N.adapter_names().items():
        out[v] = f"adapter.{k}"
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="model dir or .safetensors file")
    ap.add_argument("--params", help="params.json (default: from the dir)")
    ap.add_argument("--quiet", action="store_true",
                    help="only print the summary + diffs")
    args = ap.parse_args()

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.loaders.safetensors_loader import SafeTensorsFile

    path = Path(args.path)
    st_path = path / "consolidated.safetensors" if path.is_dir() else path
    if args.params:
        cfg = VoxtralConfig.from_file(args.params)
    elif path.is_dir() and (path / "params.json").exists():
        cfg = VoxtralConfig.from_model_dir(path)
    else:
        cfg = VoxtralConfig.voxtral()

    st = SafeTensorsFile(st_path)
    present = st.names()
    expect = expected_names(cfg)

    import numpy as np

    _BITS = {"F64": 8, "I64": 8, "F32": 4, "I32": 4, "F16": 2, "BF16": 2,
             "I16": 2, "I8": 1, "U8": 1, "BOOL": 1}
    total_bytes = 0
    for name in sorted(present):
        dtype, shape = st.tensor_meta(name)
        nbytes = int(np.prod(shape)) * _BITS.get(dtype, 4)
        total_bytes += nbytes
        if not args.quiet:
            tag = expect.get(name, "UNEXPECTED")
            print(f"{name:<80} {str(list(shape)):<20} {dtype:<10} {tag}")

    missing = sorted(set(expect) - set(present))
    unexpected = sorted(set(present) - set(expect))
    print(f"\n# tensors: {len(present)}  "
          f"({total_bytes / 2**30:.2f} GiB on disk)")
    print(f"# expected: {len(expect)}  missing: {len(missing)}  "
          f"unexpected: {len(unexpected)}")
    for n in missing:
        print(f"MISSING    {n}  ({expect[n]})")
    for n in unexpected:
        print(f"UNEXPECTED {n}")
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
