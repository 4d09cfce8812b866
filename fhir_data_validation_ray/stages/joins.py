"""Generic join operators over Ray Datasets — the two shapes a 100-TB
pipeline needs, demonstrated on the TPC-H-style side tables:

- **broadcast_join**: the small side ships ONCE via ``ray.put`` (sorted key
  array + value columns); every batch attaches columns with an integer
  searchsorted probe — no shuffle at all. The right pattern whenever one
  side fits in a worker's heap (dimension tables, registries).
- **partitioned_hash_join**: both sides bucket by key hash and meet in one
  ``groupby(bucket)``; the per-group join is a sorted searchsorted probe
  (range-expanded, so right-side key duplication is handled). The pattern
  for fact-to-fact joins where neither side broadcasts. ``salt`` spreads a
  hot probe key the same way ``stages/reference.py`` salts hot refs.

Both joins are INNER and attach selected right columns to left rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _int_keys(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col).astype(np.int64)


def broadcast_join(left, right_table: pa.Table, *, left_key: str, right_key: str,
                   right_columns: list[str]):
    """Attach ``right_columns`` of the (small) ``right_table`` to every left
    row whose ``left_key`` matches ``right_key``; unmatched left rows drop
    (inner). The broadcast is one ``ray.put`` of the sorted key array plus
    the taken value columns — read once per node, probed per batch."""
    import ray

    rk = _int_keys(right_table[right_key])
    order = np.argsort(rk)
    payload = {
        c: (right_table[c].combine_chunks()
            if isinstance(right_table[c], pa.ChunkedArray) else right_table[c]
            ).take(pa.array(order))
        for c in right_columns
    }
    ref = ray.put((rk[order], payload))

    def attach(t: pa.Table) -> pa.Table:
        keys_sorted, vals = ray.get(ref)
        lk = _int_keys(t[left_key])
        pos = np.clip(np.searchsorted(keys_sorted, lk), 0, max(len(keys_sorted) - 1, 0))
        hit = (keys_sorted[pos] == lk) if len(keys_sorted) else np.zeros(len(lk), bool)
        idx = np.flatnonzero(hit)
        out = t.filter(pa.array(hit))
        for c in right_columns:
            out = out.append_column(c, vals[c].take(pa.array(pos[idx])))
        return out

    return left.map_batches(attach, batch_format="pyarrow")


def partitioned_hash_join(left, right, *, left_key: str, right_key: str,
                          left_columns: list[str], right_columns: list[str],
                          right_types: dict[str, pa.DataType],
                          left_types: dict[str, pa.DataType],
                          num_buckets: int = 64, salt: int = 1):
    """Inner join of two Datasets on integer keys via one bucketed exchange.
    Left rows spread over ``salt`` sub-buckets (hot-key absorption); right
    rows replicate ``salt`` ways (the dimension-ish side per bucket).
    Duplicate RIGHT keys fan out each matching left row (true join
    semantics) via searchsorted range expansion. ``left_types``/
    ``right_types`` pin the null-placeholder types so the two tagged
    streams union under one schema."""
    from .dedup import _intmix

    def tag_left(t: pa.Table) -> pa.Table:
        k = _int_keys(t[left_key])
        b = _intmix(k, num_buckets) * salt
        if salt > 1:
            b = b + (np.arange(len(k)) % salt)
        cols = {"bucket": pa.array(b.astype(np.int32)), "k": pa.array(k),
                "is_right": pa.array(np.zeros(len(k), bool))}
        for c in left_columns:
            col = t[c]
            cols[f"l_{c}"] = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        for c in right_columns:
            cols[f"r_{c}"] = pa.nulls(len(k), right_types[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        k = _int_keys(t[right_key])
        reps = salt if salt > 1 else 1
        b0 = _intmix(k, num_buckets) * salt
        b = np.concatenate([b0 + s for s in range(reps)]) if salt > 1 else b0
        k_r = np.tile(k, reps)
        n = len(k_r)
        cols = {"bucket": pa.array(b.astype(np.int32)), "k": pa.array(k_r),
                "is_right": pa.array(np.ones(n, bool))}
        for c in left_columns:
            cols[f"l_{c}"] = pa.nulls(n, left_types[c])
        for c in right_columns:
            col = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
            if reps > 1:
                col = col.take(pa.array(np.tile(np.arange(len(k)), reps)))
            cols[f"r_{c}"] = col
        return pa.table(cols)

    def join_group(g: pa.Table) -> pa.Table:
        is_right = np.asarray(g["is_right"])
        k = np.asarray(g["k"]).astype(np.int64)
        r_idx = np.flatnonzero(is_right)
        l_idx = np.flatnonzero(~is_right)
        rk = k[r_idx]
        order = np.argsort(rk, kind="stable")
        rk_s = rk[order]
        lo = np.searchsorted(rk_s, k[l_idx], "left")
        hi = np.searchsorted(rk_s, k[l_idx], "right")
        cnt = hi - lo
        tot = int(cnt.sum())
        out = {}
        if tot == 0:
            for c in left_columns:
                out[c] = pa.nulls(0, g.schema.field(f"l_{c}").type)
            for c in right_columns:
                out[c] = pa.nulls(0, g.schema.field(f"r_{c}").type)
            return pa.table(out)
        starts = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=starts[1:])
        within = np.arange(tot, dtype=np.int64) - np.repeat(starts, cnt)
        r_take = r_idx[order[np.repeat(lo, cnt) + within]]
        l_take = np.repeat(l_idx, cnt)
        for c in left_columns:
            col = g[f"l_{c}"]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            out[c] = col.take(pa.array(l_take))
        for c in right_columns:
            col = g[f"r_{c}"]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            out[c] = col.take(pa.array(r_take))
        return pa.table(out)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    return both.groupby("bucket").map_groups(join_group, batch_format="pyarrow")


def lowcard_count(ds, col: str, extra_sums: dict[str, str] | None = None):
    """Per-value counts (+ optional integer column sums) for a LOW-cardinality
    column: per-batch dictionary bincount partials, one tiny groupby merge —
    the tumbling-window aggregation shape. ``extra_sums`` maps output name ->
    source column (cast to int64). Returns Dataset[col, n, *extra]."""
    extra_sums = extra_sums or {}

    def partial(t: pa.Table) -> pa.Table:
        col_a = t[col]
        if isinstance(col_a, pa.ChunkedArray):
            col_a = col_a.combine_chunks()
        da = pc.dictionary_encode(col_a)
        codes = np.asarray(da.indices).astype(np.int64)
        names = da.dictionary
        cols = {
            col: names.cast(pa.string()),
            "n": pa.array(np.bincount(codes, minlength=len(names)).astype(np.int64)),
        }
        for out_name, src in extra_sums.items():
            v = np.asarray(t[src]).astype(np.int64)
            cols[out_name] = pa.array(
                np.bincount(codes, weights=v, minlength=len(names)).astype(np.int64)
            )
        return pa.table(cols)

    def merge(g: pa.Table) -> pa.Table:
        name = g[col][0].as_py()
        cols = {col: pa.array([name], pa.string()),
                "n": pa.array([int(np.asarray(g["n"]).sum())], pa.int64())}
        for out_name in extra_sums:
            cols[out_name] = pa.array([int(np.asarray(g[out_name]).sum())], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(col)
        .map_groups(merge, batch_format="pyarrow")
    )


def corpus_diff(old_docs, new_docs, *, key: str = "doc_id",
                column: str = "text", num_buckets: int = 64,
                batch_size: int | None = None):
    """Snapshot diff between two corpus versions — the incremental-ingest
    primitive: which documents were ADDED, REMOVED, or CHANGED between the
    previous run's snapshot and the current one (so downstream stages can
    revalidate / re-embed only the churn, not 100 TB).

    Scale shape: a distributed FULL-OUTER compare. Each side maps to
    (bucket = hash(key) % B, key, h = FNV(text), role) — the exchange moves
    8-byte text hashes, never text — and one ``groupby(bucket)`` meets both
    roles per key. Output is bounded by the CHURN (added/removed/changed
    rows only; unchanged docs emit nothing), so a 0.1% daily delta on 1e9
    docs returns 1e6 rows.

    Change detection compares 64-bit FNV text hashes (an old-vs-new
    collision on the SAME key is ~2^-64 per doc); keys are assumed unique
    per side (the corpus contract). Returns Dataset[doc_id, status] with
    status in {'added', 'removed', 'changed'}."""
    from ..functions.hashing import hash_str

    def tag(role: int):
        def f(t: pa.Table) -> pa.Table:
            texts = t[column]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            ids = _int_keys(t[key])
            h = hash_str(
                texts.fill_null("").to_numpy(zero_copy_only=False).astype("U")
            ).astype(np.int64)
            return pa.table({
                "bucket": pa.array(
                    (ids.astype(np.uint64) % np.uint64(num_buckets))
                    .astype(np.int64)),
                "doc_id": pa.array(ids),
                "h": pa.array(h),
                "role": pa.array(np.full(len(ids), role, dtype=np.int8)),
            })

        return f

    both = (old_docs.map_batches(tag(0), batch_format="pyarrow",
                                 batch_size=batch_size)
            .union(new_docs.map_batches(tag(1), batch_format="pyarrow",
                                        batch_size=batch_size)))

    def diff_group(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"], dtype=np.int64)
        role = np.asarray(g["role"])
        h = np.asarray(g["h"], dtype=np.int64)
        uid, inv = np.unique(ids, return_inverse=True)
        m = len(uid)
        has = np.zeros((2, m), dtype=bool)
        hv = np.zeros((2, m), dtype=np.int64)
        for r in (0, 1):
            sel = role == r
            has[r, inv[sel]] = True
            hv[r, inv[sel]] = h[sel]
        added = has[1] & ~has[0]
        removed = has[0] & ~has[1]
        changed = has[0] & has[1] & (hv[0] != hv[1])
        out_ids = np.concatenate([uid[added], uid[removed], uid[changed]])
        status = np.concatenate([
            np.full(added.sum(), "added", dtype=object),
            np.full(removed.sum(), "removed", dtype=object),
            np.full(changed.sum(), "changed", dtype=object),
        ])
        return pa.table({"doc_id": pa.array(out_ids),
                         "status": pa.array(status, pa.string())})

    return both.groupby("bucket").map_groups(diff_group, batch_format="pyarrow")
