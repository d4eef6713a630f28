"""Save/load converted parameter pytrees (the checkpoint/resume aux).

Repacking a GGUF (or requantizing to W8) costs tens of seconds per load;
serving restarts shouldn't pay it twice.  ``save_params`` writes the
device-format pytree to one ``.npz`` (+ a JSON treedef), ``load_params``
memory-maps it back — the equivalent role of the reference's memory-staged
loading machinery (two-phase deferred GGUF load, per-layer decoder
serialization; SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import hashlib
import json
import logging
import time
from pathlib import Path
from typing import Any, Callable

import numpy as np

Params = dict[str, Any]

log = logging.getLogger("voxtral_tpu")

_SEP = "."

# Bump when the on-disk pytree layout of any weight format changes
# (e.g. q4 leaf schema) — stale entries must miss, not mis-load.
CACHE_FORMAT_VERSION = 1


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


def cache_entry(cache_dir: str | Path, source: str | Path, tag: str) -> Path:
    """Deterministic cache basename for a (weight source, format) pair.

    The key hashes the resolved source path + size + mtime_ns + ``tag``
    (weight format, e.g. "w8"/"q4g") + :data:`CACHE_FORMAT_VERSION`, so
    edits to the source or schema bumps miss cleanly.
    """
    src = Path(source).resolve()
    st = src.stat()
    key = f"{src}:{st.st_size}:{st.st_mtime_ns}:{tag}"
    return cache_entry_key(cache_dir, f"{src.stem}-{tag}", key)


def cache_entry_key(cache_dir: str | Path, name: str, key: str) -> Path:
    """Cache basename for an arbitrary string key (e.g. a config hash for
    generated weights).  :data:`CACHE_FORMAT_VERSION` folds in."""
    h = hashlib.sha1(
        f"{key}:v{CACHE_FORMAT_VERSION}".encode()).hexdigest()[:16]
    return Path(cache_dir) / f"{name}-{h}"


def load_or_build(
    cache_dir: str | Path,
    source: str | Path,
    tag: str,
    builder: Callable[[], Params],
    to_device: bool = True,
) -> Params:
    """Converted-pytree cache around an expensive ``builder()``.

    ``builder`` must return a HOST pytree (numpy leaves) — the converted/
    quantized device format (post GGUF repack / w8 requant), so a warm
    start skips the conversion entirely (the load-time engineering role
    of the reference's staged GGUF loader,
    /root/reference/src/gguf/loader.rs:130-188).  Corrupt/partial
    entries are treated as misses and rebuilt.
    """
    return load_or_build_at(
        cache_entry(cache_dir, source, tag), builder, to_device=to_device)


def load_or_build_at(
    base: Path,
    builder: Callable[[], Params],
    to_device: bool = True,
) -> Params:
    """:func:`load_or_build` on a precomputed cache basename."""
    npz, js = Path(str(base) + ".npz"), Path(str(base) + ".json")
    if npz.exists() and js.exists():
        t0 = time.time()
        try:
            params = load_params(base, to_device=to_device)
            log.info("params-cache hit %s (%.1fs)", base.name,
                     time.time() - t0)
            return params
        except Exception as e:  # partial write / schema drift -> rebuild
            log.warning("params-cache entry %s unreadable (%s); rebuilding",
                        base.name, e)
    t0 = time.time()
    params = builder()
    build_s = time.time() - t0
    base.parent.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    tmp = Path(str(base) + f".tmp{hash(str(base)) & 0xffff:x}")
    save_params(params, tmp)
    Path(str(tmp) + ".npz").rename(npz)
    Path(str(tmp) + ".json").rename(js)
    log.info("params-cache miss %s: built %.1fs, saved %.1fs",
             base.name, build_s, time.time() - t0)
    if to_device:
        import jax
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(jnp.asarray, params)
    return params
