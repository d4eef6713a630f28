"""Model components: layers, encoder, decoder, adapter, full Voxtral model."""

from voxtral_tpu.models.voxtral import VoxtralModel

__all__ = ["VoxtralModel"]
