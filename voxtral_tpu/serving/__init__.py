"""Serving surface: HTTP transcription server + browser demo client.

TPU-native replacement for the reference's browser/WASM deployment
(``/root/reference/web/``, ``serve.mjs``): TPUs are server-side, so the
"in-browser" capability becomes a served endpoint with the same worker
protocol shape (init/load/transcribe + streaming feed/finish) and a mic
demo page.
"""

from voxtral_tpu.serving.server import VoxtralHTTPServer, make_server

__all__ = ["VoxtralHTTPServer", "make_server"]
