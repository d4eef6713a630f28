"""voxtral_tpu — TPU-native (JAX/XLA/Pallas) streaming ASR framework.

A from-scratch reimplementation of the capabilities of
``TrevorS/voxtral-mini-realtime-rs`` (reference at ``/root/reference``),
designed TPU-first:

* the full greedy decode loop runs on-device inside one compiled
  ``lax.scan`` (no per-token host sync),
* KV caches are preallocated HBM arrays updated with
  ``lax.dynamic_update_slice``,
* attention masks are banded iota comparisons computed on device,
* the Q4_0 GGUF path uses Pallas int4 kernels with in-register dequant,
* parallelism is expressed with ``jax.sharding.Mesh`` + ``NamedSharding``.

Layout:
    config        — params.json parsing (reference: src/models/config.rs)
    tokenizer     — Tekken decode-only tokenizer (src/tokenizer/mod.rs)
    audio/        — WAV io, resample, mel, pad, chunk (src/audio/*)
    models/       — layers, encoder, decoder, adapter, full model
    ops/          — Pallas kernels (int4 matmul, attention)
    loaders/      — SafeTensors and GGUF weight loading
    parallel/     — mesh + sharding seam (TP/DP)
    serving/      — streaming/serving surface
"""

__version__ = "0.1.0"

from voxtral_tpu.config import VoxtralConfig

__all__ = ["VoxtralConfig", "__version__"]
