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


def _chunked(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _const_str(value: str, n: int) -> pa.Array:
    return pa.array([value], type=pa.string()).take(np.zeros(n, dtype=np.int32))


def _hash_col(col) -> np.ndarray:
    """uint64 hash per element of an Arrow string column, computed on the
    dictionary uniques only (ref columns repeat heavily — hot keys)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    da = pc.dictionary_encode(col)
    uh = _hash_str(da.dictionary.to_numpy(zero_copy_only=False))
    return uh[np.asarray(da.indices)]


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
        m = nonempty.fill_null(False).to_numpy(zero_copy_only=False)
        ne_idx = np.flatnonzero(m)
        if ne_idx.size:
            # regex only the nonempty minority (refs are sparse in the corpus)
            ne_refs = pc.take(refs, pa.array(ne_idx))
            local = pc.match_substring_regex(ne_refs, local_re).to_numpy(
                zero_copy_only=False
            )
            idx = ne_idx[~local]
        else:
            idx = ne_idx
        return pa.table(
            {
                "doc_id": pc.take(fs.doc_ids, pa.array(fs.parent[idx])).cast(pa.string()),
                "span_index": pa.array(fs.span_index[idx].astype(np.int32), pa.int32()),
                "media_ref": pc.take(refs, pa.array(idx)).cast(pa.string()),
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
    emit_details: bool = True,
):
    """Anti-join probe refs against the registry via an explicit partitioned
    hash join. Returns violation rows (REFERENCE_NOT_FOUND, external policy).

    Both sides pre-hash ``media_ref`` to uint64 BEFORE the shuffle, so the
    sort-based exchange moves 8-byte keys; with ``emit_details=False`` the
    probe side drops the ref string entirely (details carry only the hash).

    Partitioning assumption: a bucket's registry shard + probe rows fit in one
    worker's heap; size ``num_buckets`` ≈ total_refs / (target rows per
    group). ``salt > 1`` spreads hot probe keys."""
    probes = extract_external_refs(docs, batch_size=batch_size)

    def add_probe_bucket(t: pa.Table) -> pa.Table:
        h = _hash_col(t["media_ref"])
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        if salt > 1:
            s = _hash_col(t["doc_id"]) % np.uint64(salt)
            b = b * salt + s.astype(np.int64)
        cols = {
            "doc_id": t["doc_id"].cast(pa.string()),
            "span_index": t["span_index"].cast(pa.int32()),
            "h": pa.array(h.astype(np.int64)),
            "bucket": pa.array(b),
            "is_reg": pa.array(np.zeros(t.num_rows, dtype=bool)),
        }
        if emit_details:
            cols["media_ref"] = t["media_ref"].cast(pa.string())
        return pa.table(cols)

    def add_reg_bucket(t: pa.Table) -> pa.Table:
        h = _hash_col(t["media_ref"])
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        n = t.num_rows
        reps = salt if salt > 1 else 1
        cols = {
            "doc_id": _const_str("", n * reps),
            "span_index": pa.array(np.full(n * reps, -1, dtype=np.int32)),
            "h": pa.array(np.tile(h.astype(np.int64), reps)),
            # replicate registry rows across salt sub-buckets (registry is
            # the small side per bucket, so replication is cheap)
            "bucket": pa.array(
                np.concatenate([b * salt + s for s in range(reps)])
                if salt > 1 else b
            ),
            "is_reg": pa.array(np.ones(n * reps, dtype=bool)),
        }
        if emit_details:
            cols["media_ref"] = _const_str("", n * reps)
        return pa.table(cols)

    probe_b = probes.map_batches(add_probe_bucket, batch_format="pyarrow")
    reg_b = registry.select_columns(["media_ref"]).map_batches(
        add_reg_bucket, batch_format="pyarrow"
    )

    both = probe_b.union(reg_b)

    def anti_join(g: pa.Table) -> pa.Table:
        is_reg = np.asarray(g["is_reg"])
        h = np.asarray(g["h"])
        reg_keys = np.unique(h[is_reg])
        probe_idx = np.flatnonzero(~is_reg)
        miss_idx = probe_idx[~np.isin(h[probe_idx], reg_keys)]
        span_idx = np.asarray(g["span_index"])[miss_idx].astype(np.int32)
        n = len(miss_idx)
        if emit_details:
            refs_arr = pc.take(_chunked(g["media_ref"]), pa.array(miss_idx))
            # vectorized json.dumps({"ref": r, "policy": "registry"}): escape
            # backslash then quote; byte-identical to the stdlib for refs
            # without control chars (the rare exception falls back per row)
            esc = pc.replace_substring(refs_arr, "\\", "\\\\")
            esc = pc.replace_substring(esc, '"', '\\"')
            details = pc.binary_join_element_wise(
                '{"ref":"', esc, '","policy":"registry"}', "")
            ctrl = pc.match_substring_regex(
                refs_arr, r"[\x00-\x1f]").fill_null(False).to_numpy(
                zero_copy_only=False)
            if ctrl.any():
                import json

                py = refs_arr.to_pylist()
                fixed = pa.array(
                    [json.dumps({"ref": py[i], "policy": "registry"},
                                separators=(",", ":")) if c else None
                     for i, c in enumerate(ctrl)],
                    pa.string(),
                )
                details = pc.if_else(pa.array(ctrl), fixed, details)
        else:
            details = _const_str("", n)
        return pa.table(
            {
                "doc_id": pc.take(_chunked(g["doc_id"]), pa.array(miss_idx)).cast(pa.string()),
                "span_index": pa.array(span_idx, pa.int32()),
                "source": _const_str(E.SRC_REFERENCE, n),
                "severity": _const_str(E.SEV_ERROR, n),
                "rule_id": _const_str("", n),
                "error_code": _const_str(E.REFERENCE_NOT_FOUND, n),
                "path": _const_str("media_ref", n),
                "json_pointer": pc.binary_join_element_wise(
                    "/spans/", pc.cast(pa.array(span_idx), pa.string()), "/media_ref", ""
                ),
                "details": details,
            }
        )

    return both.groupby("bucket").map_groups(anti_join, batch_format="pyarrow")


def registry_orphans(docs, registry, *, num_buckets: int = 64,
                     batch_size: int = 4096):
    """REVERSE direction of the registry anti-join: registry entries that
    no document references — dead registry rows. The forward check
    (``reference_integrity_join``) finds dangling refs; this audit finds
    the unreachable inventory a registry cleanup would drop (the data-side
    analogue of the dead-rule detection in ``rule_coverage``).

    Returns Dataset[media_ref, kind] of unreferenced registry rows.

    Scale shape: the same bucketed exchange, but STRING-exact (no hashed
    membership): the probe side ships per-batch DISTINCT external refs
    only (bounded by ref cardinality, not span count), the registry side
    its rows; the group fold is one dictionary-encoded ``is_in`` on the
    actual strings, so hash collisions cannot hide an orphan."""

    def probe_rows(t: pa.Table) -> pa.Table:
        refs = t["media_ref"]
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        u = pc.unique(refs)
        h = _hash_str(u.to_numpy(zero_copy_only=False).astype("U"))
        return pa.table({
            "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
            "is_reg": pa.array(np.zeros(len(u), dtype=bool)),
            "media_ref": u.cast(pa.string()),
            "kind": _const_str("", len(u)),
        })

    def reg_rows(t: pa.Table) -> pa.Table:
        refs = t["media_ref"]
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        h = _hash_str(refs.to_numpy(zero_copy_only=False).astype("U"))
        return pa.table({
            "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
            "is_reg": pa.array(np.ones(t.num_rows, dtype=bool)),
            "media_ref": refs.cast(pa.string()),
            "kind": t["kind"].cast(pa.string()),
        })

    probes = extract_external_refs(docs, batch_size=batch_size) \
        .select_columns(["media_ref"]) \
        .map_batches(probe_rows, batch_format="pyarrow")
    regs = registry.select_columns(["media_ref", "kind"]).map_batches(
        reg_rows, batch_format="pyarrow")

    def orphan_fold(g: pa.Table) -> pa.Table:
        is_reg = np.asarray(g["is_reg"])
        refs = g["media_ref"]
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        seen = pc.unique(refs.filter(pa.array(~is_reg)))
        reg_idx = np.flatnonzero(is_reg)
        reg_refs = refs.take(pa.array(reg_idx))
        hit = pc.is_in(reg_refs, value_set=seen).to_numpy(
            zero_copy_only=False)
        keep = pa.array(reg_idx[~hit])
        return pa.table({
            "media_ref": refs.take(keep),
            "kind": _chunked(g["kind"]).take(keep),
        })

    return (probes.union(regs).groupby("bucket")
            .map_groups(orphan_fold, batch_format="pyarrow"))
