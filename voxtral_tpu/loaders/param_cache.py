"""Save/load converted parameter pytrees (the checkpoint/resume aux).

Repacking a GGUF (or requantizing to W8) costs tens of seconds per load;
serving restarts shouldn't pay it twice.  ``save_params`` writes the
device-format pytree to one ``.npz`` (+ a JSON treedef), ``load_params``
memory-maps it back — the equivalent role of the reference's memory-staged
loading machinery (two-phase deferred GGUF load, per-layer decoder
serialization; SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np

Params = dict[str, Any]

_SEP = "."


def _flatten(node: Any, prefix: str, out: dict[str, np.ndarray]) -> Any:
    """Flatten to {path: array}; returns a structure skeleton."""
    if isinstance(node, dict):
        return {k: _flatten(v, f"{prefix}{_SEP}{k}" if prefix else k, out)
                for k, v in node.items()}
    key = prefix
    out[key] = np.asarray(node)
    return {"__leaf__": key, "dtype": str(out[key].dtype)}


def save_params(params: Params, path: str | Path) -> None:
    """Write the pytree to <path>.npz + <path>.json."""
    path = Path(path)
    arrays: dict[str, np.ndarray] = {}
    skeleton = _flatten(params, "", arrays)
    # bf16 isn't npz-native: store raw bits, restore via the recorded dtype.
    stored = {
        k: (v.view(np.uint16) if v.dtype.name == "bfloat16" else v)
        for k, v in arrays.items()
    }
    np.savez(str(path) + ".npz", **stored)
    Path(str(path) + ".json").write_text(json.dumps(skeleton))


def load_params(path: str | Path, to_device: bool = True) -> Params:
    path = Path(path)
    skeleton = json.loads(Path(str(path) + ".json").read_text())
    data = np.load(str(path) + ".npz")

    import ml_dtypes

    def rebuild(node):
        if isinstance(node, dict) and "__leaf__" in node:
            arr = data[node["__leaf__"]]
            if node["dtype"] == "bfloat16":
                arr = arr.view(ml_dtypes.bfloat16)
            return arr
        return {k: rebuild(v) for k, v in node.items()}

    params = rebuild(skeleton)
    if to_device:
        import jax
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(jnp.asarray, params)
    return params
