"""Cross-document uniqueness check (north_star: doc_id uniqueness).

No reference analogue (the reference sees one bundle per request); required by
``BASELINE.json`` north_star. Exact two-phase strategy, designed so the
shuffle moves 8-byte integers instead of strings:

1. **Hash pass** — each batch maps doc_id -> uint64 FNV hash; a
   ``groupby(h).count`` shuffle (int sort, far cheaper than string sort)
   yields candidate hashes with count > 1. For a mostly-unique corpus the
   candidate set is tiny (true duplicates + rare 64-bit collisions).
2. **Verify pass** — a second streaming scan keeps only rows whose hash is in
   the candidate set (broadcast as a sorted numpy array) and the exact
   duplicate doc_ids are counted on the small survivor set.

At 10^12 docs the same plan holds: phase 1 shuffles one int per document
(pre-aggregated per batch), phase 2 is a filter scan with a broadcast probe
set. The approximate alternative (HLL distinct-count per partition) lives in
``state/hll.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import errors as E
from ..functions.hashing import hash_str


_NUM_BUCKETS = 256


def _to_hash_buckets(batch: pa.Table) -> pa.Table:
    """Pre-aggregate per batch: unique (hash, count) pairs + a LOW-cardinality
    bucket key. The groupby then shuffles at most n_unique rows per batch and
    produces ``_NUM_BUCKETS`` groups instead of one group per doc_id — a
    1M-group hash aggregation was the dominant cost of the naive plan."""
    ids = np.asarray(batch["doc_id"])
    h, counts = np.unique(hash_str(ids).astype(np.int64), return_counts=True)
    return pa.table(
        {
            "bucket": pa.array((h % _NUM_BUCKETS).astype(np.int32)),
            "h": pa.array(h),
            "c": pa.array(counts.astype(np.int64)),
        }
    )


def _bucket_duplicates(g: pa.Table) -> pa.Table:
    """Within one bucket: sum partial counts per hash, keep count > 1."""
    h = np.asarray(g["h"])
    c = np.asarray(g["c"])
    uh, inv = np.unique(h, return_inverse=True)
    totals = np.bincount(inv, weights=c).astype(np.int64)
    dup = totals > 1
    return pa.table({"h": pa.array(uh[dup]), "n": pa.array(totals[dup])})


def duplicate_doc_ids(docs, *, batch_size: int = 65536):
    """Dataset[doc_id, ...] -> Dataset[doc_id, n] of ids appearing more than
    once (exact). ``docs`` should be read with ``columns=["doc_id"]`` so the
    scan never decodes the spans column.

    The driver holds only the candidate HASH set (8 bytes per duplicated
    hash, broadcast via ``ray.put``); the survivor count is a second bucketed
    groupby — all rows of one doc_id share a bucket (keyed by the id hash),
    so exact string-level counting happens inside the group and the driver
    only ever sees the final duplicate rows. A dup-heavy corpus therefore
    costs one more small shuffle, never unbounded driver memory (the round-1
    ``.to_pandas()``/``value_counts`` fold was the scale flaw here)."""
    import ray
    import ray.data as rd

    from ..functions.collect import collect_table

    ids_ds = docs.select_columns(["doc_id"])
    suspects_tbl = collect_table(
        ids_ds.map_batches(_to_hash_buckets, batch_format="pyarrow", batch_size=batch_size)
        .groupby("bucket")
        .map_groups(_bucket_duplicates, batch_format="pyarrow"),
        empty_schema=pa.schema([("h", pa.int64()), ("n", pa.int64())]),
    )  # bounded: duplicated hashes only, 16 bytes each
    empty = pa.table(
        {"doc_id": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )
    if suspects_tbl.num_rows == 0:
        return rd.from_arrow(empty)
    suspect_ref = ray.put(np.sort(np.asarray(suspects_tbl["h"], dtype=np.int64)))

    def keep_suspects(batch: pa.Table) -> pa.Table:
        suspect_hashes = ray.get(suspect_ref)
        ids = np.asarray(batch["doc_id"])
        h = hash_str(ids).astype(np.int64)
        pos = np.clip(np.searchsorted(suspect_hashes, h), 0, suspect_hashes.size - 1)
        m = suspect_hashes[pos] == h
        keep = np.flatnonzero(m)
        return pa.table(
            {
                "sbucket": pa.array((h[keep] % _NUM_BUCKETS).astype(np.int32)),
                "doc_id": pa.array(ids[keep], pa.string()),
            }
        )

    def count_group(g: pa.Table) -> pa.Table:
        ids = g["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        da = pc.dictionary_encode(ids)
        counts = np.bincount(np.asarray(da.indices), minlength=len(da.dictionary))
        dup = np.flatnonzero(counts > 1)
        return pa.table(
            {
                "doc_id": pc.take(da.dictionary, pa.array(dup)),
                "n": pa.array(counts[dup].astype(np.int64)),
            }
        )

    return (
        ids_ds.map_batches(keep_suspects, batch_format="pyarrow", batch_size=batch_size)
        .groupby("sbucket")
        .map_groups(count_group, batch_format="pyarrow")
    )


def uniqueness_violations(docs, **kw):
    """Duplicate doc_ids as unified violation rows (one per duplicated id)."""
    dups = duplicate_doc_ids(docs, **kw)

    def to_violations(t: pa.Table) -> pa.Table:
        import json

        n = t.num_rows
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.string()),
                "span_index": pa.array([-1] * n, pa.int32()),
                "source": pa.array([E.SRC_STRUCTURE] * n, pa.string()),
                "severity": pa.array([E.SEV_ERROR] * n, pa.string()),
                "rule_id": pa.array([""] * n, pa.string()),
                "error_code": pa.array([E.DUPLICATE_DOC_ID] * n, pa.string()),
                "path": pa.array(["doc_id"] * n, pa.string()),
                "json_pointer": pa.array([""] * n, pa.string()),
                "details": pa.array(
                    [json.dumps({"count": int(v)}, separators=(",", ":")) for v in t["n"].to_pylist()],
                    pa.string(),
                ),
            },
            schema=E.VIOLATIONS_SCHEMA,
        )

    return dups.map_batches(to_violations, batch_format="pyarrow")
