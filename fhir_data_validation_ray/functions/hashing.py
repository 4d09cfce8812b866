"""Vectorized string hashing shared by the shuffle stages (FNV-1a over the
UTF-32 code units of a numpy unicode array). Deterministic across processes —
safe for bucketing / salting / dedup keys (unlike Python's seeded hash())."""

from __future__ import annotations

import numpy as np

_FNV = np.uint64(0xCBF29CE484222325)
_PRIME = np.uint64(0x100000001B3)


def hash_str(arr: np.ndarray) -> np.ndarray:
    """uint64 FNV-1a per element. Accepts object or U dtype string arrays."""
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    u = arr if arr.dtype.kind == "U" else arr.astype("U")
    width = u.dtype.itemsize // 4
    if width == 0:
        return np.full(n, _FNV, dtype=np.uint64)
    b = u.view(np.uint32).reshape(n, width)
    out = np.full(n, _FNV, dtype=np.uint64)
    for j in range(width):
        out = (out ^ b[:, j].astype(np.uint64)) * _PRIME
    return out
