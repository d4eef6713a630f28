"""Multi-host (multi-process) data parallelism over a DCN axis.

The single-process mesh seam (``parallel/mesh.py``) already expresses
DP/TP as sharding annotations; this module extends the same surface to
MULTIPLE JAX processes — e.g. several TPU hosts in a pod slice, or the
multi-process CPU harness the tests use — so batch rows shard across
hosts while each host feeds only its local rows.  The reference has no
distributed story at all (single wgpu queue); this is the TPU-native
scaling lever named in SURVEY.md §2.6.

Design (jax-native, no custom transport):

* :func:`init_multihost` brings the process into the JAX cluster
  (``jax.distributed.initialize``); collectives then ride the backend's
  fabric (ICI/DCN on TPU pods, Gloo on the CPU harness).
* :func:`make_multihost_mesh` builds a global (data, model) mesh whose
  DATA axis spans processes (DCN-friendly: weights are replicated, DP
  decode needs zero collectives — parallel/dp_decode.py) while MODEL
  groups stay intra-host (psums ride ICI, never DCN).
* :func:`global_batch` assembles the global batch from each host's
  local rows (``jax.make_array_from_process_local_data``); everything
  downstream — ``VoxtralModel(..., mesh=...)``,
  ``transcribe_streaming_batch_async`` — is unchanged: the fused DP
  decode shard_maps over the same named axes whether they span one
  process or many.
* :func:`local_rows` splits the result back out: each host fetches ONLY
  its addressable shards (a multi-host array cannot be np.asarray'd
  wholesale).

Driven end-to-end by ``scripts/multihost_dp.py`` and pinned
token-identical to single-process in ``tests/test_multihost.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voxtral_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int,
                   initialization_timeout: Optional[int] = None) -> None:
    """Join the JAX process cluster (call BEFORE any backend use).

    ``coordinator_address``: "host:port" of process 0.  After this,
    ``jax.devices()`` is the GLOBAL device list (all hosts) and
    ``jax.local_devices()`` this host's slice.

    ``initialization_timeout``: seconds to wait for EVERY process to
    join before failing with a clear error — a worker that never starts
    (crash, bad address, partial deployment) must fail THIS process
    fast and actionably, not hang the pod (failure-detection contract,
    tests/test_multihost.py).
    """
    kw = {}
    if initialization_timeout is not None:
        kw["initialization_timeout"] = int(initialization_timeout)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kw,
        )
    except Exception as e:
        raise RuntimeError(
            f"multihost init failed (process {process_id}/{num_processes}"
            f", coordinator {coordinator_address}): {e}.  Check that all "
            f"{num_processes} workers started and can reach the "
            "coordinator; a dead/missing worker stalls the whole cluster."
        ) from e


def make_multihost_mesh(n_model: int = 1,
                        devices: Optional[list] = None) -> Mesh:
    """Global (data, model) mesh with the data axis spanning hosts.

    ``jax.devices()`` orders devices process-major, so reshaping to
    [-1, n_model] keeps each model group within one host as long as
    ``n_model`` divides the per-host device count — TP psums then ride
    intra-host links (ICI), and only the collective-free DP axis
    crosses the DCN.  The returned mesh drops into ``VoxtralModel``
    / ``StreamPool`` / ``eval_wer`` exactly like a single-host mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    local = jax.local_device_count()
    if n_model > 1 and local % n_model:
        raise ValueError(
            f"n_model={n_model} must divide the per-host device count "
            f"{local} (model groups must not straddle hosts)")
    if len(devices) % n_model:
        raise ValueError(
            f"n_model={n_model} must divide the global device count "
            f"{len(devices)}")
    grid = np.asarray(devices).reshape(-1, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def global_batch(mesh: Mesh, local: np.ndarray) -> jax.Array:
    """Assemble a global batch from this host's rows (axis 0 shards over
    the data axis; every host must contribute the same local shape).
    """
    spec = P(DATA_AXIS, *([None] * (np.ndim(local) - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local))


def local_rows(global_array: jax.Array) -> dict[int, np.ndarray]:
    """This host's rows of a data-sharded result, keyed by GLOBAL row
    index (fetches only addressable shards — no cross-host transfer).
    Replicated arrays yield every row exactly once.
    """
    out: dict[int, np.ndarray] = {}
    for shard in global_array.addressable_shards:
        base = shard.index[0].start or 0
        data = np.asarray(shard.data)
        for j in range(data.shape[0]):
            out.setdefault(base + j, data[j])
    return out


def process_row_range(global_rows: int) -> tuple[int, int]:
    """[lo, hi) of the global batch rows this process should supply to
    :func:`global_batch` (equal contiguous slices by process index)."""
    n = jax.process_count()
    if global_rows % n:
        raise ValueError(
            f"global batch {global_rows} must divide across {n} processes")
    per = global_rows // n
    i = jax.process_index()
    return i * per, (i + 1) * per
