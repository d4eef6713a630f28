"""Device mesh construction and parameter sharding rules.

Tensor-parallel layout (Megatron-style column/row pairs, chosen so each
attention/FFN block needs exactly one ``psum`` on its output, inserted
automatically by XLA from the shardings):

* ``wq/wk/wv``, ``w1/w3`` — column-parallel: output dim on the ``model``
  axis (heads shard across chips; 8 KV heads / tp ways).
* ``wo``, ``w2`` — row-parallel: input dim on the ``model`` axis.
* ``tok_embeddings [V, D]`` — vocab-sharded: the tied lm_head becomes a
  sharded matmul + all-gather of per-shard logits (argmax commutes).
* norms, ADA, conv, biases on unsharded dims — replicated.

Data parallelism: batch axis on ``data`` (used by the WER eval harness).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = dict[str, Any]

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class ParallelPlan:
    """User-surface description of a multi-chip run (CLI ``--dp/--tp``).

    Carried by :class:`~voxtral_tpu.models.voxtral.VoxtralModel` when a
    mesh is attached; the transcribe path routes its fused decode steps
    through the DP shard_map (``parallel/dp_decode.py``) or the TP
    half-kernels (``ops/decode_tp_pallas.py``) accordingly, and the XLA
    paths partition automatically from the parameter shardings.
    """

    mesh: Mesh
    dp: int = 1
    tp: int = 1

    @classmethod
    def from_mesh(cls, mesh: Mesh) -> "ParallelPlan":
        return cls(mesh, dp=mesh.shape[DATA_AXIS], tp=mesh.shape[MODEL_AXIS])


def make_mesh(
    n_data: int = 1,
    n_model: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Create a (data, model) mesh over the given devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(f"Mesh needs {n} devices, only {len(devices)} available")
    grid = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_path(path: tuple[str, ...], ndim: int) -> P:
    """Tensor-parallel PartitionSpec for one parameter leaf.

    ``path`` is the dict-key path; stacked layer leaves carry a leading
    layer axis (ndim includes it) which is never sharded.

    Quantized weights are dicts: the leaf path ends with
    (..., <weight-name>, "q4"|"w8", <field>).  Sharding rules key off the
    weight name; quantized layouts differ from dense ([out, in] for w8
    codes / [K/8, N] for q4 packed), handled below.
    """
    leaf = path[-1]
    parent = path[-2] if len(path) >= 2 else ""

    if parent in ("w8", "q4"):
        return _spec_for_quantized(path, ndim, fmt=parent)

    def with_layer(spec_tail: tuple) -> P:
        # Prepend Nones so the spec matches ndim (layer axis etc. unsharded).
        pad = ndim - len(spec_tail)
        return P(*((None,) * pad + spec_tail))

    if leaf == "tok_embeddings":
        return P(MODEL_AXIS, None)  # vocab-sharded
    if parent == "attention":
        if leaf in ("wq", "wk", "wv"):
            return with_layer((None, MODEL_AXIS))
        if leaf in ("wq_b", "wk_b", "wv_b"):
            return with_layer((MODEL_AXIS,))
        if leaf == "wo":
            return with_layer((MODEL_AXIS, None))
        if leaf == "wo_b":
            return with_layer((None,))
    if parent == "ffn":
        if leaf in ("w1", "w3"):
            return with_layer((None, MODEL_AXIS))
        if leaf in ("w1_b", "w3_b"):
            return with_layer((MODEL_AXIS,))
        if leaf == "w2":
            return with_layer((MODEL_AXIS, None))
        if leaf == "w2_b":
            return with_layer((None,))
    if parent == "adapter" or path[0] == "adapter":
        if leaf == "w1":
            return P(None, MODEL_AXIS)
        if leaf == "w2":
            return P(MODEL_AXIS, None)
    # norms, ada, conv, everything else: replicated.
    return P()


def _spec_for_quantized(path: tuple[str, ...], ndim: int, fmt: str) -> P:
    """Specs for q4/w8 leaves: path (..., <weight>, fmt, field).

    Column-parallel weights (wq/wk/wv/w1/w3, adapter w1, tok_embeddings)
    shard the OUT dim; row-parallel (wo/w2) shard the IN dim.
      w8: codes [.., out, in], scale [.., out]
      q4 packed: codes_packed [.., K/8, out], scales_t [.., K/32, out]
      q4 int8:   codes [.., out, in],  scales [.., out, in/32]
    Leading stacked-layer axes are never sharded (padded with None).
    """
    weight = path[-3] if len(path) >= 3 else ""
    grand = path[-4] if len(path) >= 4 else ""
    field = path[-1]

    col_weights = {"wq", "wk", "wv", "w1", "w3", "tok_embeddings"}
    row_weights = {"wo", "w2"}
    # ADA stays replicated (tiny); adapter w1 column / w2 row like dense.
    if grand == "ada":
        return P()
    if weight not in col_weights | row_weights:
        return P()
    col = weight in col_weights

    def pad(tail: tuple) -> P:
        return P(*((None,) * (ndim - len(tail)) + tail))

    if fmt == "w8":
        if field == "codes":
            return pad((MODEL_AXIS, None)) if col else pad((None, MODEL_AXIS))
        if field == "scale":
            return pad((MODEL_AXIS,)) if col else P()
    else:  # q4
        if field in ("codes_packed", "scales_t"):
            # Packed-int4 leaves feed a Pallas kernel, which XLA cannot
            # auto-partition — keep them replicated.  For TP over a
            # quantized model load with weight_format="w8" (sharded int8
            # runs on plain XLA dots).
            return P()
        if field == "codes":  # [.., out, in]
            return pad((MODEL_AXIS, None)) if col else pad((None, MODEL_AXIS))
        if field == "scales":  # [.., out, in/32]
            return pad((MODEL_AXIS, None)) if col else pad((None, MODEL_AXIS))
    return P()


def param_shardings(params: Params, mesh: Mesh) -> Params:
    """NamedSharding pytree matching ``params``."""

    def visit(path, leaf):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return NamedSharding(mesh, _spec_for_path(keys, np.ndim(leaf)))

    return jax.tree_util.tree_map_with_path(visit, params)


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Place a parameter pytree onto the mesh with TP shardings."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def kv_cache_sharding(mesh: Mesh) -> NamedSharding:
    """KV cache [L, B, S, Hkv, D]: batch on data, kv heads on model."""
    return NamedSharding(mesh, P(None, DATA_AXIS, None, MODEL_AXIS, None))
