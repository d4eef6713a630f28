"""Weight loading: SafeTensors (f32/bf16 path) and GGUF (Q4_0 path)."""

from voxtral_tpu.loaders.safetensors_loader import (
    SafeTensorsFile,
    load_voxtral_params,
)

__all__ = ["SafeTensorsFile", "load_voxtral_params"]
