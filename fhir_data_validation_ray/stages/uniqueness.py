"""Cross-document uniqueness check (north_star: doc_id uniqueness).

No reference analogue (the reference sees one bundle per request); required
by ``BASELINE.json`` north_star. Exact variant: pre-aggregated counts per
batch (combiner) followed by a small ``groupby(doc_id).sum`` shuffle — the
shuffle moves one row per distinct doc_id per batch, not one row per
document. Approximate variant (for 10^12-doc scale estimates) lives in
``state/hll.py``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import errors as E


def _partial_counts(batch: pa.Table) -> pa.Table:
    agg = batch.group_by("doc_id").aggregate([("doc_id", "count")])
    return agg.rename_columns(["doc_id", "n"])


def duplicate_doc_ids(docs, *, batch_size: int = 65536):
    """Dataset[doc_id, ...] -> Dataset[doc_id, n] of ids appearing more than
    once. Column-pruned at the source; partial-aggregated before the shuffle."""
    from ray.data.aggregate import Sum

    partials = docs.select_columns(["doc_id"]).map_batches(
        _partial_counts, batch_format="pyarrow", batch_size=batch_size
    )
    totals = partials.groupby("doc_id").aggregate(Sum("n", alias_name="n"))
    return totals.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
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
