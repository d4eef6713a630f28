"""Save/load converted parameter pytrees (the checkpoint/resume aux).

Repacking a GGUF (or requantizing to W8) costs minutes per load at
production scale; serving restarts shouldn't pay it twice.
``save_params`` writes the device-format pytree as a ``<path>.npd/``
directory of raw ``.npy`` leaves (+ a ``<path>.json`` treedef);
``load_params`` memory-maps them back, so a warm restore costs one mmap
per leaf and the actual bytes page in lazily during the device transfer
— the equivalent role of the reference's memory-staged loading machinery
(two-phase deferred GGUF load, per-layer decoder serialization;
SURVEY.md §5 checkpoint/resume).

Why not ``np.savez``: the zip container computes a CRC over every byte
(measured ~215 s to write the 4.4 GB production w8 tree on this disk vs
~30 s of raw writes) and ``np.load`` of an npz cannot mmap.
"""

from __future__ import annotations

import hashlib
import json
import logging
import shutil
import time
from pathlib import Path
from typing import Any, Callable

import numpy as np

Params = dict[str, Any]

log = logging.getLogger("voxtral_tpu")

_SEP = "."

# Bump when the on-disk layout changes (container format or any weight
# format's pytree schema) — stale entries must miss, not mis-load.
CACHE_FORMAT_VERSION = 2


def _flatten(node: Any, prefix: str, out: dict[str, np.ndarray]) -> Any:
    """Flatten to {path: array}; returns a structure skeleton."""
    if isinstance(node, dict):
        return {k: _flatten(v, f"{prefix}{_SEP}{k}" if prefix else k, out)
                for k, v in node.items()}
    key = prefix
    out[key] = np.asarray(node)
    return {"__leaf__": key, "dtype": str(out[key].dtype)}


def save_params(params: Params, path: str | Path) -> None:
    """Write the pytree to ``<path>.npd/`` (raw .npy per leaf, files
    named by index) + ``<path>.json`` (treedef + key->index map)."""
    path = Path(path)
    arrays: dict[str, np.ndarray] = {}
    skeleton = _flatten(params, "", arrays)
    d = Path(str(path) + ".npd")
    if d.exists():
        shutil.rmtree(d)
    d.mkdir(parents=True)
    index = {}
    for i, (key, v) in enumerate(arrays.items()):
        # bf16/f16 etc. aren't portable across npy readers: store raw
        # bits for bf16, restore via the dtype recorded in the skeleton.
        stored = v.view(np.uint16) if v.dtype.name == "bfloat16" else v
        np.save(d / f"{i}.npy", stored, allow_pickle=False)
        index[key] = i
    Path(str(path) + ".json").write_text(
        json.dumps({"skeleton": skeleton, "index": index}))


def load_params(path: str | Path, to_device: bool = True) -> Params:
    """Memory-map a saved pytree back (bytes page in lazily — the device
    transfer is the first full read)."""
    path = Path(path)
    meta = json.loads(Path(str(path) + ".json").read_text())
    skeleton, index = meta["skeleton"], meta["index"]
    d = Path(str(path) + ".npd")

    import ml_dtypes

    def rebuild(node):
        if isinstance(node, dict) and "__leaf__" in node:
            arr = np.load(d / f"{index[node['__leaf__']]}.npy",
                          mmap_mode="r", allow_pickle=False)
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
    npd, js = Path(str(base) + ".npd"), Path(str(base) + ".json")
    if npd.is_dir() and js.exists():
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
    # Atomic publish: write under a tmp basename, rename the dir last
    # (readers key on the .json, written after the renamed dir).
    tmp = Path(str(base) + f".tmp{hash(str(base)) & 0xffff:x}")
    save_params(params, tmp)
    if npd.exists():
        shutil.rmtree(npd)
    Path(str(tmp) + ".npd").rename(npd)
    Path(str(tmp) + ".json").rename(js)
    log.info("params-cache miss %s: built %.1fs, saved %.1fs",
             base.name, build_s, time.time() - t0)
    if to_device:
        import jax
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(jnp.asarray, params)
    return params
