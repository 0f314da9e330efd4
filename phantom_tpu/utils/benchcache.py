"""Disk cache for benchmark setup artifacts (keys + ciphertexts).

Key + ciphertext generation for the headline config runs through the
generic u64 evaluator and costs minutes per process on this VM (u64
graph compiles + first-touch paging — CLAUDE.md), which taxes every
bench/probe invocation and burned a quarter of the round-3 driver
budget (VERDICT Weak #6).  The artifacts are deterministic functions of
the parameter set and the PRNG seeds, so they are safe to memoize:
this module stores the raw arrays in one .npz per config under
PHANTOM_SETUP_CACHE (default /tmp/phantom_setup_cache).

Bump _VERSION whenever keygen/encrypt semantics change — the version
participates in the cache key, so stale blobs are never loaded.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

_VERSION = 1


def _cache_dir() -> str:
    return os.environ.get("PHANTOM_SETUP_CACHE", "/tmp/phantom_setup_cache")


def cache_path(**config) -> str:
    blob = json.dumps({"v": _VERSION, **config}, sort_keys=True)
    h = hashlib.sha256(blob.encode()).hexdigest()[:24]
    return os.path.join(_cache_dir(), f"setup_{h}.npz")


def load_setup(**config):
    """Returns (arrays, meta) — a dict of numpy arrays and a JSON-decoded
    metadata dict — or None on miss.  Disable with PHANTOM_SETUP_CACHE=0."""
    if _cache_dir() == "0":
        return None
    path = cache_path(**config)
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            arrays = {k: z[k] for k in z.files if k != "__meta__"}
            meta = (json.loads(str(z["__meta__"]))
                    if "__meta__" in z.files else {})
            return arrays, meta
    except Exception:
        return None


def save_setup(arrays: dict, meta: dict | None = None, **config) -> None:
    if _cache_dir() == "0":
        return
    os.makedirs(_cache_dir(), exist_ok=True)
    path = cache_path(**config)
    tmp = path + ".tmp"
    payload = {k: np.asarray(v) for k, v in arrays.items()}
    # unicode array keeps allow_pickle=False on the load side
    payload["__meta__"] = np.asarray(json.dumps(meta or {}))
    np.savez(tmp, **payload)
    # np.savez appends .npz to names without it
    os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)
