"""Cross-document referential integrity of ``media_ref`` against a registry.

Reference semantics: ``RuleEngines/ReferenceResolver.cs`` missing-reference
errors (``REFERENCE_NOT_FOUND``), lifted from one bundle's lookup dict to a
corpus-wide registry Dataset (``BASELINE.json`` north_star: "groupby-aggregate
shuffle for referential-integrity checks of media_ref against a document
registry").

Two execution strategies:

1. **Broadcast (default, small registry)** — the registry key set is
   ``ray.put`` once and probed inside the validator actor (see
   ``stages/validator.py``); no shuffle at all.
2. **Partitioned hash anti-join (large registry)** — this module: both sides
   get ``bucket = hash(media_ref) % B``; a single ``groupby(bucket)`` co-
   locates probe rows with the registry shard and ``map_groups`` performs the
   anti-join per bucket. Hot probe keys (one media_ref referenced by millions
   of docs) are absorbed by ``salt`` sub-buckets: probe rows spread over
   ``salt`` buckets, registry rows replicated ``salt`` ways — replication is
   cheap because the registry side is the small one per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import errors as E
from ..functions.hashing import hash_str as _hash_str


def extract_external_refs(docs, *, batch_size: int = 4096):
    """Dataset[doc_id, spans] -> Dataset[doc_id, span_index, media_ref] of
    external (non-local-shaped, non-empty) refs — the ``flat_map`` step of
    SURVEY.md §2.5."""
    from ..functions.flatten import flatten_batch
    from ..functions.kernels import LOCAL_REF_RE

    local_re = LOCAL_REF_RE.pattern

    def extract(batch: pa.Table) -> pa.Table:
        fs = flatten_batch(batch)
        refs = fs.media_ref
        nonempty = pc.and_kleene(
            pc.is_valid(refs), pc.greater(pc.binary_length(refs), 0)
        )
        local = pc.match_substring_regex(refs, local_re)
        ext = pc.and_kleene(nonempty, pc.invert(local)).fill_null(False)
        m = ext.to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(m)
        return pa.table(
            {
                "doc_id": pa.array(fs.flat_doc_ids[idx], pa.string()),
                "span_index": pa.array(fs.span_index[idx].astype(np.int32), pa.int32()),
                "media_ref": pa.array(np.asarray(refs)[idx], pa.string()),
            }
        )

    return docs.map_batches(extract, batch_format="pyarrow", batch_size=batch_size)


def reference_integrity_join(
    docs,
    registry,
    *,
    num_buckets: int = 64,
    salt: int = 1,
    batch_size: int = 4096,
):
    """Anti-join probe refs against the registry via an explicit partitioned
    hash join. Returns violation rows (REFERENCE_NOT_FOUND, external policy).

    Partitioning assumption: a bucket's registry shard + probe rows fit in one
    worker's heap; size ``num_buckets`` ≈ total_refs / (target rows per
    group). ``salt > 1`` spreads hot probe keys."""
    probes = extract_external_refs(docs, batch_size=batch_size)

    def add_probe_bucket(t: pa.Table) -> pa.Table:
        refs = np.asarray(t["media_ref"]).astype("U")
        h = _hash_str(refs) % np.uint64(num_buckets)
        if salt > 1:
            ids = np.asarray(t["doc_id"]).astype("U")
            s = _hash_str(ids) % np.uint64(salt)
            h = h * np.uint64(salt) + s
        return t.append_column("bucket", pa.array(h.astype(np.int64))).append_column(
            "is_reg", pa.array(np.zeros(t.num_rows, dtype=bool))
        )

    def add_reg_bucket(t: pa.Table) -> pa.Table:
        refs = np.asarray(t["media_ref"]).astype("U")
        h = _hash_str(refs) % np.uint64(num_buckets)
        n = t.num_rows
        base = pa.table(
            {
                "doc_id": pa.array([""] * n, pa.string()),
                "span_index": pa.array([-1] * n, pa.int32()),
                "media_ref": t["media_ref"].cast(pa.string()),
            }
        )
        if salt <= 1:
            return base.append_column("bucket", pa.array(h.astype(np.int64))).append_column(
                "is_reg", pa.array(np.ones(n, dtype=bool))
            )
        parts = []  # replicate registry rows across salt sub-buckets
        for s in range(salt):
            parts.append(
                base.append_column(
                    "bucket", pa.array((h * np.uint64(salt) + np.uint64(s)).astype(np.int64))
                ).append_column("is_reg", pa.array(np.ones(n, dtype=bool)))
            )
        return pa.concat_tables(parts)

    probe_b = probes.map_batches(add_probe_bucket, batch_format="pyarrow")
    reg_b = registry.select_columns(["media_ref"]).map_batches(
        add_reg_bucket, batch_format="pyarrow"
    )

    both = probe_b.union(reg_b)

    def anti_join(g: pa.Table) -> pa.Table:
        import json

        is_reg = np.asarray(g["is_reg"])
        refs = np.asarray(g["media_ref"]).astype("U")
        reg_keys = np.unique(refs[is_reg])
        probe_idx = np.flatnonzero(~is_reg)
        miss_idx = probe_idx[~np.isin(refs[probe_idx], reg_keys)]
        span_idx = np.asarray(g["span_index"])[miss_idx].astype(np.int32)
        n = len(miss_idx)
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(g["doc_id"]).astype("U")[miss_idx], pa.string()),
                "span_index": pa.array(span_idx, pa.int32()),
                "source": pa.array([E.SRC_REFERENCE] * n, pa.string()),
                "severity": pa.array([E.SEV_ERROR] * n, pa.string()),
                "rule_id": pa.array([""] * n, pa.string()),
                "error_code": pa.array([E.REFERENCE_NOT_FOUND] * n, pa.string()),
                "path": pa.array(["media_ref"] * n, pa.string()),
                "json_pointer": pa.array(
                    ["/spans/%d/media_ref" % i for i in span_idx], pa.string()
                ),
                "details": pa.array(
                    [
                        json.dumps({"ref": r, "policy": "registry"}, separators=(",", ":"))
                        for r in refs[miss_idx]
                    ],
                    pa.string(),
                ),
            }
        )

    return both.groupby("bucket").map_groups(anti_join, batch_format="pyarrow")
