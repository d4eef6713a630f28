"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding/collective code paths
are exercised without TPU hardware (the driver separately dry-run-compiles
the multi-chip path).  Environment must be set before JAX initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The env var alone is not reliable when a TPU plugin (axon) is installed —
# force the platform through the config API before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent compilation cache: the suite compiles hundreds of XLA
# programs (mesh/pool/checkpoint tests dominate wall time); a warm cache
# cuts re-runs substantially.  The dir is keyed by a hash of the host's
# CPU flags — XLA:CPU AOT results are machine-specific, and loading an
# entry compiled on a different host can SIGILL (the driver may move
# between machines across rounds).
import hashlib  # noqa: E402
from pathlib import Path  # noqa: E402

from voxtral_tpu.utils.compilation_cache import enable as _enable_cache  # noqa: E402

try:
    _flags_line = next(
        ln for ln in Path("/proc/cpuinfo").read_text().splitlines()
        if ln.startswith("flags")
    )
except (OSError, StopIteration):
    _flags_line = "unknown"
_cpu_key = hashlib.sha256(_flags_line.encode()).hexdigest()[:12]
_enable_cache(str(Path.home() / ".cache" / "voxtral_tpu"
                  / f"xla-cpu-{_cpu_key}"))
