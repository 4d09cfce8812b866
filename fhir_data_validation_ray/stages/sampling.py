"""Deterministic sampling operators for corpus curation.

Hash-threshold sampling is the scale-correct way to subsample a 10^12-doc
corpus: membership is a pure function of the row's key (FNV-1a, the shared
``functions/hashing.py`` fold), so the sample is reproducible across runs,
engines and partitionings, composable (a 10% sample of a 20% sample is the
2% sample), and needs no shuffle, no RNG state and no coordination — one
stateless ``map_batches`` filter. The DuckDB oracle reproduces the exact
same FNV fold (``pipelines/dataops.py:_fnv_sql``), so the sampled row SETS
compare bitwise.

No reference analogue (the reference validates one bundle per request);
required by the build brief's training-data-pipeline ladder.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash_str

SAMPLE_MOD = 1_000_000


def _key_strings(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col).astype("U")


def sample_by_hash(ds, rate: float, *, key: str = "doc_id"):
    """Keep rows where ``FNV(str(key)) % 1e6 < rate * 1e6`` — a deterministic
    ~``rate`` sample. Exact set semantics (not approximate): the same keys
    are kept on every run at every scale."""
    threshold = int(rate * SAMPLE_MOD)

    def keep(t: pa.Table) -> pa.Table:
        h = hash_str(_key_strings(t[key]))
        return t.filter(pa.array((h % np.uint64(SAMPLE_MOD)) < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample_by_hash(ds, rates: dict[str, float], *, group_col: str,
                              key: str = "doc_id", default_rate: float = 0.0):
    """Per-group hash-threshold sampling (e.g. downsample an over-represented
    source while keeping all of a rare one). ``rates`` maps group value ->
    rate; groups not listed use ``default_rate``. Same determinism and
    composability as ``sample_by_hash``; still one stateless map — the
    group thresholds ship in the task closure (tiny)."""
    thresholds = {g: int(r * SAMPLE_MOD) for g, r in rates.items()}
    default_t = int(default_rate * SAMPLE_MOD)

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        h = hash_str(_key_strings(t[key])) % np.uint64(SAMPLE_MOD)
        groups = t[group_col]
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        da = pc.dictionary_encode(groups)
        lut = np.array(
            [thresholds.get(g, default_t) for g in da.dictionary.to_pylist()],
            dtype=np.uint64,
        )
        return t.filter(pa.array(h < lut[np.asarray(da.indices)]))

    return ds.map_batches(keep, batch_format="pyarrow")


SPLIT_BANDS: tuple[tuple[str, float], ...] = (
    ("train", 0.90), ("val", 0.05), ("test", 0.05))


def split_assign(ds, *, bands: tuple[tuple[str, float], ...] = SPLIT_BANDS,
                 key: str = "doc_id"):
    """Deterministic multi-way train/val/test split: the same FNV fold as
    ``sample_by_hash`` buckets ``h = FNV(str(key)) % 1e6`` into cumulative
    ratio bands and labels each row. Membership is a pure function of the
    key — stable across runs, engines and partitionings, leak-free by
    construction (a key can never migrate between splits), and composable
    with ``sample_by_hash`` (the first band IS the rate-0.9 hash sample).

    Adds a ``split`` string column; one stateless ``map_batches``, no
    shuffle, no RNG state."""
    names = [n for n, _ in bands]
    rates = np.cumsum([r for _, r in bands])
    if not np.isclose(rates[-1], 1.0):
        raise ValueError(f"split bands must sum to 1.0, got {rates[-1]}")
    cuts = np.minimum((rates * SAMPLE_MOD).round().astype(np.int64),
                      SAMPLE_MOD)[:-1]

    def assign(t: pa.Table) -> pa.Table:
        h = (hash_str(_key_strings(t[key]))
             % np.uint64(SAMPLE_MOD)).astype(np.int64)
        idx = np.searchsorted(cuts, h, side="right")
        labels = pa.DictionaryArray.from_arrays(
            pa.array(idx.astype(np.int32)), pa.array(names)
        ).cast(pa.string())
        return t.append_column("split", labels)

    return ds.map_batches(assign, batch_format="pyarrow")
