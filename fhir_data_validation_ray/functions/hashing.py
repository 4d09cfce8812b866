"""Vectorized string hashing shared by the shuffle stages (FNV-1a over the
UTF-32 code units of a numpy unicode array). Deterministic across processes —
safe for bucketing / salting / dedup keys (unlike Python's seeded hash())."""

from __future__ import annotations

import numpy as np

_FNV = np.uint64(0xCBF29CE484222325)
_PRIME = np.uint64(0x100000001B3)


def hash_str(arr: np.ndarray) -> np.ndarray:
    """uint64 FNV-1a per element. Accepts object or U dtype string arrays.

    The hash is a function of the STRING only, not the array's fixed U width:
    trailing NUL padding is excluded per element (real strings never contain
    NUL), so ``hash_str(a)[i] == hash_str(b)[j]`` whenever ``a[i] == b[j]``
    even if the two arrays have different max lengths. Cross-array equality is
    what the registry probe and the two-phase uniqueness check rely on."""
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
        col = b[:, j]
        live = col != 0  # padding-only zeros: update stops at end of string
        if live.all():
            out = (out ^ col.astype(np.uint64)) * _PRIME
        else:
            if not live.any():
                break
            out[live] = (out[live] ^ col[live].astype(np.uint64)) * _PRIME
    return out
