"""Persistent XLA compilation cache setup.

First compilation of the full transcribe program costs minutes on TPU;
the persistent cache makes every later process start warm.  Called by the
CLI, benches and the server before the first jit.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

log = logging.getLogger("voxtral_tpu")

DEFAULT_DIR = os.environ.get(
    "VOXTRAL_COMPILE_CACHE", str(Path.home() / ".cache" / "voxtral_tpu" / "xla")
)


def enable(cache_dir: str | None = None) -> None:
    import jax

    path = Path(cache_dir or DEFAULT_DIR)
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        log.debug("compilation cache at %s", path)
    except Exception as e:  # never fatal
        log.warning("could not enable compilation cache: %s", e)
