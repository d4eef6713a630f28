"""Device-HBM admission control.

The kernel-level VMEM gates (``stack_vmem_need`` / ``tp_vmem_need``)
keep a single pallas_call inside on-chip memory, but nothing used to
gate TOTAL device HBM: an operator could configure a ``StreamPool``
whose rings + weights exceed the chip (measured: 16 unbounded int8
rings ~= 7 GB + 4.6 GB w8 weights OOMs a 16 GB v5e — ROADMAP r3 #8)
and the server would die with an opaque XLA allocation error at
runtime.  This module estimates the footprint up front so pool/session
construction can refuse cleanly with the dp-sharding suggestion
(VERDICT r3 next #6).

The reference has no analogue (single stream, host RAM); the closest
behavior is its actionable-OOM hint (transcribe.rs:327-349), which the
CLI already mirrors.
"""

from __future__ import annotations

import os
from typing import Optional

# Fixed allowance for XLA workspace, logits blocks, rope tables,
# collectives scratch and fragmentation.  Deliberately coarse — the
# gate exists to catch multi-GB misconfigurations, not to pack the
# last 100 MB.
WORKSPACE_BYTES = 1 * 2**30


class HBMBudgetError(RuntimeError):
    """Requested geometry cannot fit the device's HBM."""


def device_hbm_budget() -> Optional[int]:
    """Usable HBM bytes on the attached accelerator, or None when no
    budget applies (CPU backend).  ``VOXTRAL_HBM_BYTES`` overrides
    (also the hook for tests)."""
    env = os.environ.get("VOXTRAL_HBM_BYTES")
    if env:
        return int(env)
    import jax

    if jax.default_backend() != "tpu":
        return None
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 * 2**30  # v5e


def tree_unique_bytes(*trees) -> int:
    """Total bytes of the array leaves across pytrees, counting each
    underlying array ONCE (the bf16 megakernel fuse shares buffers
    between the fused stacks and the ``{"nt": w}`` param leaves)."""
    import jax

    seen: set[int] = set()
    total = 0
    for tree in trees:
        if tree is None:
            continue
        for leaf in jax.tree_util.tree_leaves(tree):
            nbytes = getattr(leaf, "nbytes", None)
            if nbytes is None:
                continue
            if id(leaf) in seen:
                continue
            seen.add(id(leaf))
            total += int(nbytes)
    return total


def model_hbm_bytes(model) -> int:
    """Weights resident in HBM: params + fused decode stacks (deduped)."""
    return tree_unique_bytes(
        model.params,
        getattr(model, "fused_decode", None),
        getattr(model, "fused_tp", None),
    )


def check_hbm(model, cache_bytes: int, what: str,
              rows: int = 0, dp: int = 1) -> None:
    """Raise :class:`HBMBudgetError` when weights + ``cache_bytes`` +
    workspace exceed the device budget.  ``dp > 1`` divides the (row-
    proportional) cache bytes across the data-axis chips — weights are
    replicated per chip.  No-op when no budget applies (CPU)."""
    budget = device_hbm_budget()
    if budget is None:
        return
    weights = model_hbm_bytes(model)
    per_chip_cache = cache_bytes // max(dp, 1)
    need = weights + per_chip_cache + WORKSPACE_BYTES
    if need <= budget:
        return
    gib = 2.0**30
    hints = []
    if rows:
        fit_rows = int(
            (budget - weights - WORKSPACE_BYTES)
            / max(per_chip_cache / max(rows, 1), 1))
        if fit_rows > 0:
            hints.append(f"reduce to <= {fit_rows} streams")
    hints.append("use kv_dtype='int8' (halves the cache)")
    hints.append(
        "shard rows over a data-parallel mesh (--dp N serves the pool "
        "as one coalesced batch across N chips; see PARITY.md §2.6)")
    raise HBMBudgetError(
        f"{what} needs ~{need / gib:.1f} GiB HBM "
        f"(weights {weights / gib:.1f} + caches {per_chip_cache / gib:.1f} "
        f"+ workspace {WORKSPACE_BYTES / gib:.1f}) but the device budget "
        f"is {budget / gib:.1f} GiB.  Try: " + "; ".join(hints))
