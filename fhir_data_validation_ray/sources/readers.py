"""Dataset readers. Lance is the target format at 100 TB scale
(``BASELINE.json`` input_hint); parquet is the sandbox stand-in. Both read
into the same Arrow schema, so every downstream stage is format-agnostic."""

from __future__ import annotations

import os


def read_documents(path: str, *, columns=None, override_num_blocks=None):
    """Read the interleaved-documents table (nested spans). ``path`` may be a
    Lance dataset dir, a parquet file, or a directory of parquet files."""
    import ray.data as rd

    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        try:
            return rd.read_lance(path, columns=columns, **kwargs)
        except (ImportError, AttributeError):
            pass  # lance not installed in this container -> parquet stand-in
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_registry(path: str):
    import ray.data as rd

    return rd.read_parquet(path)


def registry_keys_numpy(path: str):
    """Driver-side load of the registry key column for ``ray.put`` broadcast —
    the small-side lookup pattern (read once, shared per node)."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["media_ref"])
    return np.asarray(t.column("media_ref").combine_chunks(), dtype="U")
