"""Deduplication operators over the ``documents`` table.

Training-data curation stages, Ray-Data-first:

- **exact_dedup**: hash-bucket shuffle + per-group first-occurrence — the
  classic exact dedup at corpus scale (shuffle key is the 64-bit text hash,
  verification against the actual text inside the group, so hash collisions
  cannot merge distinct documents).
- **ngram_jaccard_pairs**: EXACT all-pairs n-gram-shingle Jaccard via a
  shared-shingle inverted index (shingle -> docs) — one shuffle keyed by
  shingle hash, pair counting per group, Jaccard from broadcast shingle
  counts. Oracle-checkable 1:1 in SQL.
- **minhash_lsh_pairs**: MinHash (k permutations) + banded LSH candidate
  generation, exact-Jaccard verification of candidates. With 32 bands x 4
  rows the miss probability for a J>=0.8 pair is ~(1-0.8^4)^32 < 1e-7, so
  the verified output equals ngram_jaccard_pairs with overwhelming
  probability — it shares the same DuckDB oracle.
- **simhash_pairs**: 64-bit SimHash banding (4x16-bit bands: any pair within
  Hamming distance 3 shares at least one exact band by pigeonhole) + exact
  Hamming verification.

Partitioning assumptions are stated per function; hot-shingle explosion is
bounded by ``max_shingle_df`` at production scale (disabled for the oracle
corpus where exactness is checked).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.collect import collect_table
from ..functions.hashing import hash_str

_MERSENNE = np.uint64((1 << 61) - 1)

# doc-shard width for the no-broadcast join lanes (see the "join lane"
# section below); used as a signature default so it lives at module top
_JOIN_DOC_SHARD = 4096


# ------------------------------------------------------------- exact dedup
def exact_dedup(docs, *, key: str = "text", num_buckets: int = 256,
                batch_size: int | None = None):
    """Keep the first occurrence (lowest doc_id) of each distinct ``key``
    value. Returns Dataset[doc_id] of KEPT rows, suitable for a semi-join
    back against the corpus. One shuffle of (hash-bucket, hash, key, doc_id);
    per-group dedup verifies on the actual key value, not just the hash."""

    def bucketize(t: pa.Table) -> pa.Table:
        keys = t[key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        h = hash_str(keys.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                "h": pa.array(h.astype(np.int64)),
                "k": keys.cast(pa.string()),
                "doc_id": t["doc_id"],
            }
        )

    def first_per_key(g: pa.Table) -> pa.Table:
        doc = np.asarray(g["doc_id"])
        h = np.asarray(g["h"])
        # group by hash first (cheap int sort), verify by string inside
        order = np.lexsort((doc, h))
        h_s, doc_s = h[order], doc[order]
        first_of_run = np.ones(len(h_s), dtype=bool)
        first_of_run[1:] = h_s[1:] != h_s[:-1]
        if not first_of_run.all():
            # duplicate hashes present (the common case for a dedup input —
            # or a rare collision): verify on the actual strings, fully
            # vectorized — keep the FIRST occurrence of each distinct
            # (hash-run, string) pair; rows are (h, doc)-sorted, so "first"
            # = lowest doc_id, and np.unique(return_index) finds it without
            # a Python row loop
            ks = pc.take(
                g["k"].combine_chunks() if isinstance(g["k"], pa.ChunkedArray) else g["k"],
                pa.array(order),
            )
            da = pc.dictionary_encode(ks)
            code = np.asarray(da.indices).astype(np.int64)
            run_id = np.cumsum(first_of_run) - 1
            key = run_id * np.int64(len(da.dictionary) + 1) + code
            _, first_idx = np.unique(key, return_index=True)
            keep = np.zeros(len(code), dtype=bool)
            keep[first_idx] = True
        else:
            keep = first_of_run
        return pa.table({"doc_id": pa.array(doc_s[keep])})

    b = docs.map_batches(bucketize, batch_format="pyarrow", batch_size=batch_size)
    return b.groupby("bucket").map_groups(first_per_key, batch_format="pyarrow")


def _expand_run_pairs(run_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-run position pairs (i < j), fully vectorized — replaces a
    per-run ``triu_indices`` Python loop (a group at web scale holds ~10^6
    runs; per-run numpy-call overhead then dominates the group's wall time).
    ``run_id`` must be sorted non-decreasing. Returns global POSITION index
    arrays (pos_a, pos_b) with pos_a < pos_b inside the same run."""
    n = len(run_id)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    run_len = np.bincount(run_id)
    starts = np.zeros(len(run_len), dtype=np.int64)
    np.cumsum(run_len[:-1], out=starts[1:])
    offset = np.arange(n, dtype=np.int64) - starts[run_id]
    rep = run_len[run_id] - 1 - offset  # pairs anchored at each position
    tot = int(rep.sum())
    if tot == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pos_a = np.repeat(np.arange(n, dtype=np.int64), rep)
    rep_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(rep[:-1], out=rep_starts[1:])
    within = np.arange(tot, dtype=np.int64) - np.repeat(rep_starts, rep)
    return pos_a, pos_a + 1 + within


# ------------------------------------------------------- shingle utilities
def _shingle_table(t: pa.Table, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-batch: (doc_ids_per_shingle, shingle_hash, shingles_per_doc).
    Word n-gram shingles, DISTINCT per document."""
    texts = t["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parts = pc.split_pattern(texts, " ")
    lens = pc.list_value_length(parts).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    words = pc.list_flatten(parts).to_numpy(zero_copy_only=False)
    wh = hash_str(words)
    doc_ids = np.asarray(t["doc_id"]).astype(np.int64)

    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # rolling n-gram hash: combine n consecutive word hashes positionally
    n_sh = np.maximum(lens - (n - 1), 0)
    total = int(n_sh.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64), n_sh
    sh_parent = np.repeat(np.arange(len(lens)), n_sh)
    sh_starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(n_sh[:-1], out=sh_starts[1:])
    offset_in_doc = np.arange(total) - np.repeat(sh_starts, n_sh)
    base = starts[sh_parent] + offset_in_doc
    h = np.full(total, np.uint64(0xCBF29CE484222325))
    for j in range(n):
        h = (h ^ wh[base + j]) * np.uint64(0x100000001B3)
    # DISTINCT per doc: unique (parent, h)
    key = sh_parent.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + h
    _, first = np.unique(key, return_index=True)
    first.sort()
    sh_parent, h = sh_parent[first], h[first]
    counts = np.bincount(sh_parent, minlength=len(lens))
    return doc_ids[sh_parent], h, counts.astype(np.int64)


BROADCAST_COUNTS_MAX_DOCS = 2_000_000


def _pair_score(inter: np.ndarray, na: np.ndarray, nb: np.ndarray,
                predicate: str) -> np.ndarray:
    """Shared similarity score for exact pair verification: "jaccard" =
    inter/union; "containment" = inter/min(|A|,|B|) — the asymmetric
    measure that catches a short doc quoted/truncated inside a long one,
    where size disparity drives Jaccard to zero. Division form matches the
    DuckDB oracle's ``inter::DOUBLE / least(...)`` bit-for-bit."""
    if predicate == "containment":
        return inter / np.minimum(na, nb)
    return inter / (na + nb - inter)


def containment_pairs(docs, *, n: int = 2, threshold: float = 0.9, **kw):
    """Asymmetric near-dup pairs by shingle CONTAINMENT >= threshold
    (inter/min) — same exact inverted-index plan as
    ``ngram_jaccard_pairs``, different final predicate."""
    return ngram_jaccard_pairs(docs, n=n, threshold=threshold,
                               predicate="containment", **kw)


def ngram_jaccard_pairs(docs, *, n: int = 2, threshold: float = 0.8,
                        num_buckets: int = 128, max_shingle_df: int | None = None,
                        batch_size: int | None = None,
                        broadcast_counts: bool | None = None,
                        predicate: str = "jaccard"):
    """EXACT near-duplicate pairs (doc_a < doc_b) with n-gram-shingle Jaccard
    >= threshold. Plan: shingle inverted index sharded by shingle hash ->
    co-occurrence pair counts per shard -> second groupby on the pair ->
    Jaccard with per-doc shingle counts.

    ``broadcast_counts=True`` ships the per-doc shingle counts as one
    ``ray.put`` array (right up to ~10^8 docs). ``False`` switches to
    bucket-partitioned hash joins of the pair table against the counts
    dataset — the 10^12-doc path with no driver-side corpus-sized state.
    Both produce identical results (equivalence-tested). The default
    (``None``) picks automatically: broadcast below
    ``BROADCAST_COUNTS_MAX_DOCS`` rows, join lane above — a metadata-only
    ``docs.count()`` decides, so large corpora never default onto the
    O(n_docs)-driver-state lane.

    ``max_shingle_df`` caps hot-shingle fan-out (drop shingles appearing in
    more docs) — REQUIRED at web scale, left None for oracle-exact runs.
    Partitioning assumption: one shingle's posting list fits in a worker."""
    import ray

    if broadcast_counts is None:
        broadcast_counts = docs.count() <= BROADCAST_COUNTS_MAX_DOCS

    # pass 1 (streaming): per-doc shingle counts
    def sh_counts(t: pa.Table) -> pa.Table:
        _, _, counts = _shingle_table(t, n)
        return pa.table(
            {"doc_id": t["doc_id"], "n_sh": pa.array(counts)}
        )

    counts_ref = None
    if broadcast_counts:
        counts = collect_table(
            docs.map_batches(sh_counts, batch_format="pyarrow", batch_size=batch_size)
        )
        doc_order = np.asarray(counts["doc_id"]).astype(np.int64)
        n_sh_arr = np.asarray(counts["n_sh"]).astype(np.int64)
        sort_i = np.argsort(doc_order)
        counts_ref = ray.put((doc_order[sort_i], n_sh_arr[sort_i]))

    def postings(t: pa.Table) -> pa.Table:
        d, h, _ = _shingle_table(t, n)
        return pa.table(
            {
                "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                "h": pa.array(h.astype(np.int64)),
                "doc_id": pa.array(d),
            }
        )

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        h = np.asarray(g["h"])
        d = np.asarray(g["doc_id"])
        order = np.lexsort((d, h))
        h_s, d_s = h[order], d[order]
        run_id = np.zeros(len(h_s), dtype=np.int64)
        run_id[1:] = np.cumsum(h_s[1:] != h_s[:-1])
        run_len = np.bincount(run_id)
        if max_shingle_df is not None:
            keepm = run_len[run_id] <= max_shingle_df
            h_s, d_s, run_id = h_s[keepm], d_s[keepm], run_id[keepm]
            run_id = np.unique(run_id, return_inverse=True)[1]
            run_len = np.bincount(run_id)
        # vectorized within-run pair expansion (no per-run Python loop);
        # d_s is ascending within each run, so a < b by construction
        pos_a, pos_b = _expand_run_pairs(run_id)
        if len(pos_a) == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "inter": pa.array([], pa.int64())})
        a, b = d_s[pos_a], d_s[pos_b]
        key = a * np.int64(1 << 32) + b  # doc ids < 2^32 by assumption
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "doc_a": pa.array(uk >> 32),
                "doc_b": pa.array(uk & ((1 << 32) - 1)),
                "inter": pa.array(cnt.astype(np.int64)),
            }
        )

    def jaccard_filter(g: pa.Table) -> pa.Table:
        import ray as _ray

        dsorted, nsh = _ray.get(counts_ref) if isinstance(counts_ref, ray.ObjectRef) else counts_ref
        a = np.asarray(g["doc_a"]).astype(np.int64)
        b = np.asarray(g["doc_b"]).astype(np.int64)
        # partial inter counts from different buckets sum here
        key = a * np.int64(1 << 32) + b
        uk, inv = np.unique(key, return_inverse=True)
        inter = np.bincount(inv, weights=np.asarray(g["inter"])).astype(np.int64)
        ua, ub = (uk >> 32), uk & ((1 << 32) - 1)
        na = nsh[np.searchsorted(dsorted, ua)]
        nb = nsh[np.searchsorted(dsorted, ub)]
        keep = _pair_score(inter, na, nb, predicate) >= threshold
        return pa.table({"doc_a": pa.array(ua[keep]), "doc_b": pa.array(ub[keep])})

    posted = docs.map_batches(postings, batch_format="pyarrow", batch_size=batch_size)
    pair_counts = posted.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pyarrow")

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        return t.append_column(
            "pbucket", pa.array(((a * 31 + b) % 64).astype(np.int32))
        )

    if broadcast_counts:
        return (
            pair_counts.map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("pbucket")
            .map_groups(jaccard_filter, batch_format="pyarrow")
            .select_columns(["doc_a", "doc_b"])
        )

    # ---- join lane: no driver-side corpus-sized state ----
    def sum_pairs(g: pa.Table) -> pa.Table:
        a = np.asarray(g["doc_a"]).astype(np.int64)
        b = np.asarray(g["doc_b"]).astype(np.int64)
        key = a * np.int64(1 << 32) + b
        uk, inv = np.unique(key, return_inverse=True)
        inter = np.bincount(inv, weights=np.asarray(g["inter"])).astype(np.int64)
        return pa.table(
            {"doc_a": pa.array(uk >> 32), "doc_b": pa.array(uk & ((1 << 32) - 1)),
             "inter": pa.array(inter)}
        )

    summed = (
        pair_counts.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(sum_pairs, batch_format="pyarrow")
    )
    counts_ds = docs.map_batches(sh_counts, batch_format="pyarrow",
                                 batch_size=batch_size)
    with_na = _attach_count(summed, counts_ds, side="doc_a", out="n_a")
    with_nb = _attach_count(with_na, counts_ds, side="doc_b", out="n_b")

    def jfilter(t: pa.Table) -> pa.Table:
        inter = np.asarray(t["inter"]).astype(np.int64)
        na = np.asarray(t["n_a"]).astype(np.int64)
        nb = np.asarray(t["n_b"]).astype(np.int64)
        keep = _pair_score(inter, na, nb, predicate) >= threshold
        return pa.table(
            {
                "doc_a": pc.take(_col(t, "doc_a"), pa.array(np.flatnonzero(keep))),
                "doc_b": pc.take(_col(t, "doc_b"), pa.array(np.flatnonzero(keep))),
            }
        )

    return with_nb.map_batches(jfilter, batch_format="pyarrow")


def _col(t: pa.Table, name: str):
    c = t[name]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _intmix(v: np.ndarray, buckets: int) -> np.ndarray:
    x = v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((x >> np.uint64(33)) % np.uint64(buckets)).astype(np.int64)


def _attach_count(pairs_ds, counts_ds, *, side: str, out: str, buckets: int = 64):
    """Bucket-partitioned hash join: attach counts_ds.n_sh (keyed doc_id) to
    pairs_ds rows on ``side``. Both sides bucket by the mixed doc id; one
    groupby co-locates each bucket's pair rows with its count rows."""

    def tag_pairs(t: pa.Table) -> pa.Table:
        key = np.asarray(t[side]).astype(np.int64)
        cols = {c: t[c] for c in t.column_names}
        cols["jbucket"] = pa.array(_intmix(key, buckets).astype(np.int32))
        cols["jkey"] = pa.array(key)
        cols["cnt"] = pa.array(np.full(t.num_rows, -1, dtype=np.int64))
        cols["is_cnt"] = pa.array(np.zeros(t.num_rows, dtype=bool))
        return pa.table(cols)

    def tag_counts(t: pa.Table, schema_cols: list[str]) -> pa.Table:
        key = np.asarray(t["doc_id"]).astype(np.int64)
        nrows = t.num_rows
        cols: dict[str, Any] = {}
        for c in schema_cols:  # null-ish fillers so the union schemas match
            cols[c] = pa.array(np.full(nrows, -1, dtype=np.int64))
        cols["jbucket"] = pa.array(_intmix(key, buckets).astype(np.int32))
        cols["jkey"] = pa.array(key)
        cols["cnt"] = pa.array(np.asarray(t["n_sh"]).astype(np.int64))
        cols["is_cnt"] = pa.array(np.ones(nrows, dtype=bool))
        return pa.table(cols)

    base_cols = ["doc_a", "doc_b", "inter"] + (["n_a"] if side == "doc_b" else [])

    tagged_pairs = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow")
    tagged_counts = counts_ds.map_batches(
        lambda t: tag_counts(t, base_cols), batch_format="pyarrow"
    )
    both = tagged_pairs.union(tagged_counts)

    def join_group(g: pa.Table) -> pa.Table:
        is_cnt = np.asarray(g["is_cnt"])
        jkey = np.asarray(g["jkey"]).astype(np.int64)
        cnt = np.asarray(g["cnt"]).astype(np.int64)
        ckeys = jkey[is_cnt]
        cvals = cnt[is_cnt]
        order = np.argsort(ckeys)
        ckeys, cvals = ckeys[order], cvals[order]
        p_idx = np.flatnonzero(~is_cnt)
        pos = np.clip(np.searchsorted(ckeys, jkey[p_idx]), 0, max(len(ckeys) - 1, 0))
        # verify the probe actually hit its key (mirrors keep_suspects /
        # k_reference probes): a pair whose count row is missing must raise,
        # not silently attach a neighbor's count and emit a wrong Jaccard
        hit = (ckeys[pos] == jkey[p_idx]) if len(ckeys) else np.zeros(p_idx.size, bool)
        if not hit.all():
            raise ValueError(
                f"_attach_count: {int((~hit).sum())} pair rows have no count row "
                f"for {side} — counts dataset does not cover the pair table"
            )
        vals = cvals[pos] if len(ckeys) else np.zeros(p_idx.size, dtype=np.int64)
        cols = {
            c: pc.take(_col(g, c), pa.array(p_idx)) for c in base_cols
        }
        cols[out] = pa.array(vals)
        return pa.table(cols)

    return both.groupby("jbucket").map_groups(join_group, batch_format="pyarrow")


# ------------------------------------------------------------ MinHash + LSH
BROADCAST_FILTER_MAX_PAIRS = 2_000_000


def minhash_lsh_pairs(docs, *, n: int = 2, threshold: float = 0.8,
                      num_perm: int = 128, bands: int = 32,
                      batch_size: int | None = None,
                      verify_buckets: int = 64,
                      broadcast_doc_filter: bool | None = None):
    """MinHash signatures (k=num_perm universal-hash permutations over n-gram
    shingle hashes) -> banded LSH buckets -> candidate pairs -> EXACT Jaccard
    verification. The LSH shuffle moves only (band, bucket-hash, doc_id)
    triples — num_perm x 8 bytes per doc stays inside the map stage.

    Verification is fully DISTRIBUTED (no driver-held candidate pairs, no
    per-pair Python loop — the round-1 driver-side verify was the scale
    bottleneck):

    1. cross-band pair dedup by pair bucket (groupby, same as simhash)
    2. each pair emits two half-rows keyed by member doc; a bucketed
       groupby co-locates every half-row with its doc's shingle rows and
       routes the shingles to the PAIR's verify bucket
    3. one groupby(vbucket) computes, per pair, |A|, |B| and |A ∩ B| with
       sort + bincount (a shingle hash appearing under both roles of one
       pair is an intersection hit) and applies the Jaccard threshold

    ``broadcast_doc_filter=True`` ships the candidate DOC IDS (8 bytes/doc,
    sorted) via ``ray.put`` so the re-shingle pass touches only candidate
    docs — right up to ~10^9 candidate docs. ``False`` re-shingles the whole
    corpus into the routing shuffle: zero driver-side state, the 10^12-doc
    lane (cost equals one ngram-postings exchange). The default (``None``)
    picks automatically the way ``ngram_jaccard_pairs`` picks its counts
    lane: the candidate-pair table is materialized (distributed, in the
    object store) and its metadata COUNT decides — broadcast at or below
    ``BROADCAST_FILTER_MAX_PAIRS`` candidates, zero-driver-state lane above,
    so a collapsed (dup-heavy) corpus whose candidates are O(n²/buckets)
    never defaults onto a driver-sized collect."""
    import ray

    rows_per_band = num_perm // bands
    rng = np.random.RandomState(0xC0FFEE)  # fixed seed: deterministic perms
    A = (rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64) | np.uint64(1))
    B = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)

    def signatures(t: pa.Table) -> pa.Table:
        d, h, counts = _shingle_table(t, n)
        n_docs = t.num_rows
        doc_ids = np.asarray(t["doc_id"]).astype(np.int64)
        sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(h):
            starts = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            nonempty = np.flatnonzero(counts > 0)
            idx = starts[nonempty]
            for k in range(num_perm):
                hk = (A[k] * h + B[k]) % _MERSENNE
                sig[nonempty, k] = np.minimum.reduceat(hk, idx)
        # band bucket hashes: fold rows_per_band minhashes per band
        out_band = np.repeat(np.arange(bands, dtype=np.int32), n_docs)
        out_doc = np.tile(doc_ids, bands)
        bh = np.zeros((bands, n_docs), dtype=np.uint64)
        for b_i in range(bands):
            seg = sig[:, b_i * rows_per_band:(b_i + 1) * rows_per_band]
            acc = np.full(n_docs, np.uint64(0xCBF29CE484222325))
            for r in range(rows_per_band):
                acc = (acc ^ seg[:, r]) * np.uint64(0x100000001B3)
            bh[b_i] = acc
        bh_flat = bh.reshape(-1).astype(np.int64)
        # group key mixes (band, bh) so the exchange shards by full band-hash
        # value (one group per distinct band value, never a corpus-sized
        # band partition); the run split below re-checks BOTH columns, so a
        # 64-bit mix collision cannot merge unrelated runs
        gk = bh_flat * np.int64(-7046029254386353131) + out_band.astype(np.int64)
        return pa.table(
            {
                "gk": pa.array(gk),
                "band": pa.array(out_band),
                "bh": pa.array(bh_flat),
                "doc_id": pa.array(out_doc),
            }
        )

    def candidates(g: pa.Table) -> pa.Table:
        bh = np.asarray(g["bh"])
        band = np.asarray(g["band"])
        d = np.asarray(g["doc_id"]).astype(np.int64)
        order = np.lexsort((d, band, bh))
        bh_s, band_s, d_s = bh[order], band[order], d[order]
        n = len(bh_s)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (bh_s[1:] != bh_s[:-1]) | (band_s[1:] != band_s[:-1])
        # distinct (run, doc) — a doc appears once per band by construction,
        # but dedup vectorized anyway (mirrors the old per-run np.unique)
        dup = np.zeros(n, dtype=bool)
        dup[1:] = ~new_run[1:] & (d_s[1:] == d_s[:-1])
        keep = ~dup
        d_s = d_s[keep]
        run_id = np.cumsum(new_run[keep]) - 1
        # vectorized within-run pair expansion; d_s ascending per run -> a < b
        pos_a, pos_b = _expand_run_pairs(run_id)
        if len(pos_a) == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        key = np.unique(d_s[pos_a] * np.int64(1 << 32) + d_s[pos_b])
        return pa.table({"doc_a": pa.array(key >> 32),
                         "doc_b": pa.array(key & ((1 << 32) - 1))})

    sigs = docs.map_batches(signatures, batch_format="pyarrow", batch_size=batch_size)
    cand = (
        sigs.groupby("gk")
        .map_groups(candidates, batch_format="pyarrow")
    )

    # cross-band candidate dedup — distributed, by pair bucket
    def pair_bucket(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        return t.append_column(
            "pbucket", pa.array(_intmix(a * 31 + b, verify_buckets).astype(np.int32))
        )

    def dedup_pairs(g: pa.Table) -> pa.Table:
        a = np.asarray(g["doc_a"]).astype(np.int64)
        b = np.asarray(g["doc_b"]).astype(np.int64)
        key = np.unique(a * np.int64(1 << 32) + b)
        return pa.table({"doc_a": pa.array(key >> 32),
                         "doc_b": pa.array(key & ((1 << 32) - 1))})

    cand_unique = (
        cand.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )

    # auto lane pick: count candidates from Dataset METADATA (the pair table
    # is materialized either way — it feeds two downstream consumers), then
    # choose; the driver never holds the pair rows to make this decision
    if broadcast_doc_filter is None:
        cand_unique = cand_unique.materialize()
        broadcast_doc_filter = cand_unique.count() <= BROADCAST_FILTER_MAX_PAIRS

    # optional sparse-candidate fast path: ship candidate DOC IDS only (the
    # driver never sees pairs or shingle sets)
    filter_ref = None
    if broadcast_doc_filter:
        cand_docs = collect_table(
            cand_unique.select_columns(["doc_a", "doc_b"]),
            empty_schema=pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())]),
        )
        if cand_docs.num_rows == 0:
            import ray.data as rd

            return rd.from_arrow(
                pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
            )
        need = np.union1d(
            np.asarray(cand_docs["doc_a"]).astype(np.int64),
            np.asarray(cand_docs["doc_b"]).astype(np.int64),
        )
        filter_ref = ray.put(need)

    # verification stage 1: shingle rows keyed by member doc
    def shingle_rows(t: pa.Table) -> pa.Table:
        if filter_ref is not None:
            import ray as _ray

            need_ids = _ray.get(filter_ref) if not isinstance(filter_ref, np.ndarray) else filter_ref
            doc_ids = np.asarray(t["doc_id"]).astype(np.int64)
            pos = np.clip(np.searchsorted(need_ids, doc_ids), 0, need_ids.size - 1)
            m = need_ids[pos] == doc_ids
            if not m.any():
                return pa.table({"dbucket": pa.array([], pa.int32()),
                                 "doc_id": pa.array([], pa.int64()),
                                 "h": pa.array([], pa.int64()),
                                 "pkey": pa.array([], pa.int64()),
                                 "role": pa.array([], pa.int8())})
            t = t.filter(pa.array(m))
        d, h, _ = _shingle_table(t, n)
        return pa.table(
            {
                "dbucket": pa.array(_intmix(d, verify_buckets).astype(np.int32)),
                "doc_id": pa.array(d),
                "h": pa.array(h.astype(np.int64)),
                "pkey": pa.array(np.full(len(d), -1, dtype=np.int64)),
                "role": pa.array(np.full(len(d), -1, dtype=np.int8)),
            }
        )

    # verification stage 1b: each pair emits one half-row per member doc
    def pair_halves(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        pkey = a * np.int64(1 << 32) + b
        doc = np.concatenate([a, b])
        role = np.concatenate(
            [np.zeros(len(a), dtype=np.int8), np.ones(len(b), dtype=np.int8)]
        )
        return pa.table(
            {
                "dbucket": pa.array(_intmix(doc, verify_buckets).astype(np.int32)),
                "doc_id": pa.array(doc),
                "h": pa.array(np.full(len(doc), -1, dtype=np.int64)),
                "pkey": pa.array(np.tile(pkey, 2)),
                "role": pa.array(role),
            }
        )

    routed_in = docs.map_batches(
        shingle_rows, batch_format="pyarrow", batch_size=batch_size
    ).union(cand_unique.map_batches(pair_halves, batch_format="pyarrow"))

    # verification stage 2: co-locate half-rows with their doc's shingles and
    # route each doc's shingle set to the PAIR's verify bucket (vectorized
    # searchsorted range expansion — no per-pair loop)
    def route(g: pa.Table) -> pa.Table:
        role = np.asarray(g["role"])
        is_sh = role < 0
        doc = np.asarray(g["doc_id"]).astype(np.int64)
        sh_doc, sh_h = doc[is_sh], np.asarray(g["h"])[is_sh]
        order = np.argsort(sh_doc, kind="stable")
        sh_doc_s, sh_h_s = sh_doc[order], sh_h[order]
        hv = np.flatnonzero(~is_sh)
        hv_doc = doc[hv]
        hv_pkey = np.asarray(g["pkey"])[hv]
        hv_role = role[hv]
        lo = np.searchsorted(sh_doc_s, hv_doc, "left")
        cnt = np.searchsorted(sh_doc_s, hv_doc, "right") - lo
        tot = int(cnt.sum())
        if tot == 0:
            return pa.table({"vbucket": pa.array([], pa.int32()),
                             "pkey": pa.array([], pa.int64()),
                             "role": pa.array([], pa.int8()),
                             "h": pa.array([], pa.int64())})
        starts = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=starts[1:])
        within = np.arange(tot, dtype=np.int64) - np.repeat(starts, cnt)
        rep_h = sh_h_s[np.repeat(lo, cnt) + within]
        rep_pkey = np.repeat(hv_pkey, cnt)
        return pa.table(
            {
                "vbucket": pa.array(_intmix(rep_pkey, verify_buckets).astype(np.int32)),
                "pkey": pa.array(rep_pkey),
                "role": pa.array(np.repeat(hv_role, cnt)),
                "h": pa.array(rep_h),
            }
        )

    routed = routed_in.groupby("dbucket").map_groups(route, batch_format="pyarrow")

    # verification stage 3: per pair |A|, |B|, |A ∩ B| by sort + bincount
    def verify_group(g: pa.Table) -> pa.Table:
        pkey = np.asarray(g["pkey"]).astype(np.int64)
        role = np.asarray(g["role"])
        h = np.asarray(g["h"]).astype(np.int64)
        order = np.lexsort((h, pkey))
        pk_s, h_s, r_s = pkey[order], h[order], role[order]
        u_pk, inv = np.unique(pk_s, return_inverse=True)
        n0 = np.bincount(inv[r_s == 0], minlength=len(u_pk))
        n1 = np.bincount(inv[r_s == 1], minlength=len(u_pk))
        dup = np.zeros(len(pk_s), dtype=bool)  # shingles are distinct per
        dup[1:] = (pk_s[1:] == pk_s[:-1]) & (h_s[1:] == h_s[:-1])  # doc+role,
        inter = np.bincount(inv[dup], minlength=len(u_pk))  # so dup = in both
        union = n0 + n1 - inter
        # divide, don't multiply: inter/union reproduces the ngram lane's and
        # the SQL oracle's float EXACTLY at boundary Jaccards (4/5 == 0.8
        # bitwise, while 0.8 * 5 rounds up and would reject the pair)
        both_sides = (n0 > 0) & (n1 > 0)
        keep = both_sides.copy()
        keep[both_sides] = (
            inter[both_sides] / union[both_sides] >= threshold
        )
        return pa.table({"doc_a": pa.array(u_pk[keep] >> 32),
                         "doc_b": pa.array(u_pk[keep] & ((1 << 32) - 1))})

    return routed.groupby("vbucket").map_groups(verify_group, batch_format="pyarrow")


# ------------------------------------------------- near-dup cluster resolve
def dedup_clusters(pairs, *, num_buckets: int = 64, max_iters: int = 16):
    """Connected components over a near-dup pair graph -> Dataset[doc_id,
    cluster] where ``cluster`` is the MINIMUM doc id of the component — the
    keep/drop endgame of near-dup detection (keep ``doc_id == cluster``,
    drop the rest).

    Distributed hash-to-min label propagation: each iteration ships
    (edge-endpoint, candidate-label) rows into a doc-bucket groupby and
    takes the per-node minimum; labels converge in O(component diameter)
    iterations (near-dup clusters are dense — typically 2-4). Per-iteration
    state lives in the Dataset, not the driver; the driver sees only the
    per-iteration change COUNT. Assumption: the label table is bounded by
    nodes-that-appear-in-pairs (collapsed corpora are the pathological
    case — then labels ~ corpus and each iteration is one exchange).

    Raises ``RuntimeError`` if labels are still changing after ``max_iters``
    iterations (a component with diameter > max_iters, e.g. a chain of
    gradually drifting texts): truncated labels are WRONG cluster ids and
    returning them silently would corrupt every downstream keep/drop
    decision. Each extra iteration is one bounded exchange — raise the cap
    rather than accept stale labels."""
    import ray.data as rd

    def to_label_rows(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        node = np.concatenate([a, b])
        lab = np.concatenate([b, a])  # neighbor's id is a candidate label
        lab = np.minimum(lab, node)   # plus own id implicitly via min(node, lab)
        return pa.table(
            {
                "nbucket": pa.array(_intmix(node, num_buckets).astype(np.int32)),
                "node": pa.array(node),
                "label": pa.array(np.minimum(lab, node)),
            }
        )

    def min_label(g: pa.Table) -> pa.Table:
        node = np.asarray(g["node"]).astype(np.int64)
        lab = np.asarray(g["label"]).astype(np.int64)
        order = np.lexsort((lab, node))
        n_s, l_s = node[order], lab[order]
        first = np.ones(len(n_s), dtype=bool)
        first[1:] = n_s[1:] != n_s[:-1]
        n_f = n_s[first]
        return pa.table(
            {
                "nbucket": pa.array(_intmix(n_f, num_buckets).astype(np.int32)),
                "node": pa.array(n_f),
                "label": pa.array(l_s[first]),
            }
        )

    labels = (
        pairs.map_batches(to_label_rows, batch_format="pyarrow")
        .groupby("nbucket")
        .map_groups(min_label, batch_format="pyarrow")
    )

    # edge list reused every iteration: (endpoint, other-endpoint) both ways
    def edge_rows(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table(
            {
                "nbucket": pa.array(_intmix(src, num_buckets).astype(np.int32)),
                "node": pa.array(src),
                "other": pa.array(dst),
            }
        )

    edges = pairs.map_batches(edge_rows, batch_format="pyarrow").materialize()

    pending_changes = 0
    for _ in range(max_iters):
        # join current labels to edges on the SOURCE endpoint, propagate the
        # label to the other endpoint, re-minimize per node
        def tag_lab(t: pa.Table) -> pa.Table:
            node = np.asarray(t["node"]).astype(np.int64)
            return pa.table(
                {
                    "nbucket": pa.array(_intmix(node, num_buckets).astype(np.int32)),
                    "node": pa.array(node),
                    "other": pa.array(np.full(len(node), -1, dtype=np.int64)),
                    "label": pa.array(np.asarray(t["label"]).astype(np.int64)),
                }
            )

        def tag_edge(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "nbucket": t["nbucket"],
                    "node": t["node"],
                    "other": t["other"],
                    "label": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                }
            )

        both = labels.map_batches(tag_lab, batch_format="pyarrow").union(
            edges.map_batches(tag_edge, batch_format="pyarrow")
        )

        def propagate(g: pa.Table) -> pa.Table:
            node = np.asarray(g["node"]).astype(np.int64)
            other = np.asarray(g["other"]).astype(np.int64)
            lab = np.asarray(g["label"]).astype(np.int64)
            is_lab = other < 0
            ln, ll = node[is_lab], lab[is_lab]
            order = np.argsort(ln)
            ln_s, ll_s = ln[order], ll[order]
            e_idx = np.flatnonzero(~is_lab)
            pos = np.clip(np.searchsorted(ln_s, node[e_idx]), 0, max(len(ln_s) - 1, 0))
            # every edge endpoint has a label row in this bucket by
            # construction — verify the probe rather than trusting it
            if len(ln_s) and e_idx.size and not (ln_s[pos] == node[e_idx]).all():
                raise ValueError("dedup_clusters: edge endpoint missing its label row")
            out_node = np.concatenate([ln_s, other[e_idx]])
            out_lab = np.concatenate([ll_s, ll_s[pos] if len(ln_s) else np.empty(0, np.int64)])
            # role 0 marks the node's own current label row (exactly one per
            # node — labels are min-folded each round); candidates are role 1.
            # Carrying the role lets the NEXT groupby compute the per-node
            # change flag in the same exchange — no separate old-vs-new join.
            out_role = np.concatenate(
                [np.zeros(len(ln_s), dtype=np.int8), np.ones(e_idx.size, dtype=np.int8)]
            )
            return pa.table(
                {
                    "nbucket": pa.array(_intmix(out_node, num_buckets).astype(np.int32)),
                    "node": pa.array(out_node),
                    "label": pa.array(out_lab),
                    "role": pa.array(out_role),
                }
            )

        def min_label_changed(g: pa.Table) -> pa.Table:
            """Per-node minimum over candidate labels + a ``changed`` flag vs
            the node's role-0 (previous) label — the convergence check folded
            into the min-fold exchange instead of a third per-iteration
            old-vs-new shuffle."""
            node = np.asarray(g["node"]).astype(np.int64)
            lab = np.asarray(g["label"]).astype(np.int64)
            role = np.asarray(g["role"])
            order = np.lexsort((lab, node))
            n_s, l_s, r_s = node[order], lab[order], role[order]
            first = np.ones(len(n_s), dtype=bool)
            first[1:] = n_s[1:] != n_s[:-1]
            n_f, new_lab = n_s[first], l_s[first]
            old_idx = np.flatnonzero(r_s == 0)
            if len(old_idx) != len(n_f) or not np.array_equal(n_s[old_idx], n_f):
                raise ValueError(
                    "dedup_clusters: node missing its previous-label row"
                )
            changed = new_lab != l_s[old_idx]
            return pa.table(
                {
                    "nbucket": pa.array(_intmix(n_f, num_buckets).astype(np.int32)),
                    "node": pa.array(n_f),
                    "label": pa.array(new_lab),
                    "changed": pa.array(changed.astype(np.int64)),
                }
            )

        new_labels = (
            both.groupby("nbucket")
            .map_groups(propagate, batch_format="pyarrow")
            .groupby("nbucket")
            .map_groups(min_label_changed, batch_format="pyarrow")
        ).materialize()

        # convergence: one cheap scan over the materialized labels (no extra
        # exchange; the flag was computed inside the min-fold groupby)
        pending_changes = int(new_labels.sum("changed") or 0)
        labels = new_labels
        if pending_changes == 0:
            break

    if pending_changes:
        raise RuntimeError(
            f"dedup_clusters: labels still changing ({pending_changes} nodes) "
            f"after max_iters={max_iters} — a component's diameter exceeds the "
            "iteration cap; raise max_iters (each iteration is one bounded "
            "exchange) instead of using truncated cluster ids"
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"], "cluster": t["label"]})

    return labels.map_batches(finish, batch_format="pyarrow")


# ----------------------------------------------------------------- SimHash
def simhash_pairs(docs, *, max_hamming: int = 3, batch_size: int | None = None):
    """Near-dup pairs with SimHash Hamming distance <= max_hamming. 4x16-bit
    banding: any pair within distance 3 agrees on >= 1 full band (pigeonhole),
    so one groupby per PACKED (band << 16 | band_hash) key finds every
    candidate — up to 4*65536 groups, each bounded by the docs sharing one
    16-bit band value, never a corpus-sized band partition — and verification
    is exact Hamming on the 64-bit signatures."""
    from .textops import simhash_batch

    def sigs(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        sh = simhash_batch(texts)
        doc_ids = np.asarray(t["doc_id"]).astype(np.int64)
        bkey_out, doc_out, sig_out = [], [], []
        for b in range(4):
            bh = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            bkey_out.append(np.int64(b << 16) | bh)
            doc_out.append(doc_ids)
            sig_out.append(sh.astype(np.int64))
        return pa.table(
            {
                "bkey": pa.array(np.concatenate(bkey_out)),
                "doc_id": pa.array(np.concatenate(doc_out)),
                "sig": pa.array(np.concatenate(sig_out)),
            }
        )

    def pairs(g: pa.Table) -> pa.Table:
        # one groupby key may still cover several bkey values (map_groups can
        # coalesce small groups into one call) — keep the run split on bkey
        bkey = np.asarray(g["bkey"])
        d = np.asarray(g["doc_id"]).astype(np.int64)
        sig = np.asarray(g["sig"]).astype(np.uint64)
        order = np.lexsort((d, bkey))
        bk_s, d_s, sig_s = bkey[order], d[order], sig[order]
        run_id = np.zeros(len(bk_s), dtype=np.int64)
        run_id[1:] = np.cumsum(bk_s[1:] != bk_s[:-1])
        # vectorized within-run pair expansion (no per-run Python loop)
        pos_a, pos_b = _expand_run_pairs(run_id)
        if len(pos_a) == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        x = sig_s[pos_a] ^ sig_s[pos_b]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):  # vectorized popcount over ALL candidate pairs
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        # d_s ascending per run -> a < b; != guards same-doc repeat rows
        ok = (ham <= max_hamming) & (d_s[pos_a] != d_s[pos_b])
        key = np.unique(d_s[pos_a][ok] * np.int64(1 << 32) + d_s[pos_b][ok])
        return pa.table({"doc_a": pa.array(key >> 32),
                         "doc_b": pa.array(key & ((1 << 32) - 1))})

    ds = docs.map_batches(sigs, batch_format="pyarrow", batch_size=batch_size)
    per_band = ds.groupby("bkey").map_groups(pairs, batch_format="pyarrow")

    # cross-band pair dedup: tiny result set, one more small groupby
    def dedup_pairs(g: pa.Table) -> pa.Table:
        a = np.asarray(g["doc_a"]).astype(np.int64)
        b = np.asarray(g["doc_b"]).astype(np.int64)
        key = np.unique(a * np.int64(1 << 32) + b)
        return pa.table({"doc_a": pa.array(key >> 32),
                         "doc_b": pa.array(key & ((1 << 32) - 1))})

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        return t.append_column("pbucket", pa.array(((a ^ b) % 32).astype(np.int32)))

    return (
        per_band.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(dedup_pairs, batch_format="pyarrow")
        .select_columns(["doc_a", "doc_b"])
    )


# --------------------------------------------------------- decontamination
def decontaminate(train_docs, benchmark_docs, *, n: int = 2,
                  min_overlap: int = 2, structure: str = "exact",
                  bloom_bits: int = 1 << 27, bloom_k: int = 7,
                  batch_size: int | None = None):
    """Benchmark n-gram decontamination: flag training documents sharing at
    least ``min_overlap`` DISTINCT word n-gram shingles with the benchmark
    corpus — the test-set-overlap screen a training-data pipeline runs
    before export (cf. the n-gram-overlap decontamination protocol of GPT-3
    / "Deduplicating Training Data Makes Language Models Better", both
    public).

    Scale shape: the benchmark side is SMALL relative to the corpus (the
    real-world ratio — 1e4-1e6 benchmark docs screening 1e9+ training
    docs), so its distinct shingle-HASH set is folded from per-batch
    uniques (8 bytes/shingle) and broadcast once via ``ray.put``; the
    training pass is then a pure streaming ``map_batches`` membership probe
    — NO shuffle anywhere, cost = one read of each side.

    ``structure`` picks the broadcast membership structure:

    - ``"exact"`` (default): sorted unique uint64 hash array, 8 B/shingle —
      exact answers; right up to ~1e8 benchmark shingles (800 MB).
    - ``"bloom"``: a fixed-size ``BloomFilter`` (``bloom_bits`` total, 16 MB
      at the 1<<27 default) built from MERGEABLE per-span partials, so
      neither the driver nor any worker ever holds the exact set; probes
      can over-flag at the filter's false-positive rate (~1% at 1.2 bits/
      key times 8) but never miss. This is the lane for benchmark sets past
      broadcast scale; the shingle-bucket inverted index of
      ``ngram_jaccard_pairs`` remains the exact fallback.

    Returns Dataset[doc_id, n_overlap] for flagged docs (n_overlap =
    number of the doc's distinct shingles present anywhere in the
    benchmark; only rows with n_overlap >= min_overlap)."""
    import ray

    if structure not in ("exact", "bloom"):
        raise ValueError(f"unknown structure {structure!r}")

    def bench_uniques(t: pa.Table) -> pa.Table:
        _, h, _ = _shingle_table(t, n)
        return pa.table({"h": pa.array(np.unique(h))})  # uint64

    uniq = benchmark_docs.map_batches(bench_uniques, batch_format="pyarrow",
                                      batch_size=batch_size)

    if structure == "bloom":
        # mergeable fixed-size partials: each ~1M-hash span folds to ONE
        # bloom_bits-wide row; the driver ORs O(n_spans) constant-size
        # filters — nothing anywhere is proportional to the key count
        def combine_bloom(t: pa.Table) -> pa.Table:
            b = BloomFilter(bloom_bits, bloom_k)
            b.add(np.asarray(t["h"]).astype(np.uint64))
            return pa.table({"bits": pa.array([b.bits.tobytes()], pa.binary())})

        parts = collect_table(
            uniq.map_batches(combine_bloom, batch_format="pyarrow",
                             batch_size=1 << 20),
            empty_schema=pa.schema([("bits", pa.binary())]),
        )
        bf = BloomFilter(bloom_bits, bloom_k)
        for row in parts["bits"].to_pylist():
            bf.bits |= np.frombuffer(row, dtype=np.uint64)
        bench_ref = ray.put(bf)
        empty_bench = not parts.num_rows

        def member(bh, h):
            return bh.contains(h)
    else:
        def combine_uniques(t: pa.Table) -> pa.Table:
            return pa.table(
                {"h": pa.array(np.unique(np.asarray(t["h"]).astype(np.uint64)))}
            )

        # two-level fold (stats.py pattern): per-TASK combine merges ~1M-row
        # spans of per-batch uniques before the driver's final union, so the
        # driver folds O(n_batches / span) partially-deduped arrays
        parts = collect_table(
            uniq.map_batches(combine_uniques, batch_format="pyarrow",
                             batch_size=1 << 20),
            empty_schema=pa.schema([("h", pa.uint64())]),
        )
        bench_set = np.unique(np.asarray(parts["h"]).astype(np.uint64))
        bench_ref = ray.put(bench_set)
        empty_bench = not bench_set.size

        def member(bh, h):
            pos = np.clip(np.searchsorted(bh, h), 0, bh.size - 1)
            return bh[pos] == h

    def probe(t: pa.Table) -> pa.Table:
        bh = ray.get(bench_ref)
        d, h, _ = _shingle_table(t, n)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_overlap": pa.array([], pa.int64())})
        if len(h) == 0 or empty_bench:
            return empty
        hit = member(bh, h)
        ud, inv = np.unique(d, return_inverse=True)
        n_ov = np.bincount(inv[hit], minlength=len(ud))
        keep = n_ov >= min_overlap
        return pa.table({"doc_id": pa.array(ud[keep]),
                         "n_overlap": pa.array(n_ov[keep].astype(np.int64))})

    return train_docs.map_batches(probe, batch_format="pyarrow",
                                  batch_size=batch_size)


# -------------------------------------------------- segment (line) dedup
SEG_WORDS = 8


def _segments(t: pa.Table, seg_words: int, column: str = "text"):
    """Non-overlapping ``seg_words``-word segments per document — the
    "line" unit for boilerplate removal on a corpus without newlines.
    Contiguous tiling means the segment ListArray reuses the kept-word
    values array directly (offsets every ``seg_words`` words; no gather).
    Returns (doc_idx, seg_id, segs, n_docs): per-segment parent row index,
    in-doc segment ordinal, the ' '-joined segment strings, and the batch
    row count. Zero-word docs emit no segments."""
    from .textops import _word_lists

    texts = t[column]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words, counts, offs = _word_lists(texts)
    k = -(-counts // seg_words)  # ceil
    total = int(k.sum())
    if total == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                pa.array([], pa.string()), len(texts))
    doc_idx = np.repeat(np.arange(len(counts)), k)
    first = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(k[:-1], out=first[1:])
    seg_id = np.arange(total, dtype=np.int64) - np.repeat(first, k)
    start = seg_id * seg_words
    # contiguous tiling: segment c spans words[offs[doc]+start : +min(...)],
    # so global boundaries are just offs[doc_idx] + start plus the total
    bounds = np.empty(total + 1, dtype=np.int64)
    bounds[:-1] = offs[doc_idx] + start
    bounds[-1] = offs[-1]
    la = pa.ListArray.from_arrays(
        pa.array(bounds, pa.int32())
        if bounds[-1] <= np.iinfo(np.int32).max else pa.array(bounds, pa.int64()),
        words,
    )
    return doc_idx, seg_id, pc.binary_join(la, " "), len(texts)


def _segment_join_lane(docs, *, seg_words: int, min_docs: int, column: str,
                       num_buckets: int, doc_shard: int,
                       batch_size: int | None):
    """No-broadcast lane of ``segment_dedup`` — identical output. One fused
    segment-bucket exchange (frequency = rows per segment string, flagged
    rows carry in-doc segment ordinals) plus a doc-shard rendezvous that
    rebuilds each doc from its surviving segments."""

    def pair_partial(t: pa.Table) -> pa.Table:
        doc_idx, seg_id, segs, _ = _segments(t, seg_words, column)
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        return _join_pair_rows(doc_idx, seg_id, segs, ids,
                               num_buckets=num_buckets, doc_shard=doc_shard,
                               with_starts=True)

    def rebuild(g: pa.Table) -> pa.Table:
        role = np.asarray(g["role"]).astype(np.int8)
        base = g.filter(pa.array(role == 0))
        texts = base["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = np.asarray(base["doc_id"]).astype(np.int64)
        tmp = pa.table({"text": texts})
        doc_idx, _, segs, n = _segments(tmp, seg_words, "text")
        k = np.bincount(doc_idx, minlength=n).astype(np.int64)
        seg_first = np.zeros(n, dtype=np.int64)
        np.cumsum(k[:-1], out=seg_first[1:])
        member = np.zeros(len(segs), dtype=bool)
        flag = g.filter(pa.array(role == 1))
        if flag.num_rows:
            loc, ordinal = _flag_flat(flag, ids)
            member[seg_first[loc] + ordinal] = True
        n_dropped = (np.bincount(doc_idx[member], minlength=n)
                     if len(segs) else np.zeros(n, dtype=np.int64))
        kept = ~member
        kept_segs = segs.filter(pa.array(kept)) if len(segs) else segs
        kept_counts = (np.bincount(doc_idx[kept], minlength=n)
                       if len(segs) else np.zeros(n, dtype=np.int64))
        bounds = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=bounds[1:])
        la = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32())
            if bounds[-1] <= np.iinfo(np.int32).max
            else pa.array(bounds, pa.int64()),
            kept_segs)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_segs": pa.array(k),
            "n_dropped": pa.array(n_dropped.astype(np.int64)),
            "cleaned_text": pc.binary_join(la, " "),
        })

    flagged = (docs.map_batches(pair_partial, batch_format="pyarrow",
                                batch_size=batch_size)
               .groupby("bucket")
               .map_groups(lambda g: _bucket_flag_starts(g, min_docs),
                           batch_format="pyarrow"))
    payload = docs.map_batches(
        lambda t: _payload_rows(t, column, doc_shard),
        batch_format="pyarrow", batch_size=batch_size)
    return (payload.union(flagged)
            .groupby("dshard")
            .map_groups(rebuild, batch_format="pyarrow"))


def segment_dedup(docs, *, seg_words: int = SEG_WORDS, min_docs: int = 2,
                  column: str = "text", num_buckets: int = 64,
                  max_frequent: int = 2_000_000,
                  doc_shard: int = _JOIN_DOC_SHARD, lane: str = "auto",
                  batch_size: int | None = None):
    """Boilerplate-segment removal (CCNet-style line dedup, cf. the public
    CCNet / RefinedWeb corpus pipelines): a segment ("line") that appears in
    >= ``min_docs`` DISTINCT documents corpus-wide is boilerplate; every
    occurrence is removed and the document text is rebuilt from the
    surviving segments in order.

    Scale shape — two streaming passes over the corpus:

    1. **Frequency discovery.** Per batch: segments are per-doc deduplicated
       (dictionary-encode + unique of (doc, code) pairs), so the exchange
       moves (bucket, segment, partial_doc_count) pre-aggregated rows, never
       raw occurrences. One bucketed groupby sums exact distinct-doc counts
       per segment (a segment lives entirely in its hash bucket; grouping is
       by the actual STRING, so hash collisions cannot merge segments).
       Only segments with count >= ``min_docs`` leave the groupby — the
       frequent (boilerplate) set, which is small by construction (banners,
       headers, licence lines).
    2. **Scrub.** The frequent set is broadcast once via ``ray.put``; a pure
       ``map_batches`` membership probe (``pc.is_in``) drops member segments
       and ``binary_join``s the survivors back into ``cleaned_text``.

    Past ``max_frequent`` the broadcast would explode: ``lane="auto"``
    (default) falls back to the no-broadcast join lane
    (``_segment_join_lane`` — identical output, lane-equivalence tested),
    ``lane="broadcast"`` raises loudly, ``lane="join"`` always joins.

    Returns Dataset[doc_id, n_segs, n_dropped, cleaned_text] — one row per
    input document (zero-segment docs: 0/0/'')."""
    import ray

    if lane not in ("auto", "broadcast", "join"):
        raise ValueError(f"segment_dedup: unknown lane {lane!r}")
    if lane == "join":
        return _segment_join_lane(docs, seg_words=seg_words,
                                  min_docs=min_docs, column=column,
                                  num_buckets=num_buckets,
                                  doc_shard=doc_shard, batch_size=batch_size)

    def freq_partial(t: pa.Table) -> pa.Table:
        doc_idx, _, segs, _ = _segments(t, seg_words, column)
        if len(segs) == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "seg": pa.array([], pa.string()),
                             "nd": pa.array([], pa.int64())})
        da = pc.dictionary_encode(segs)
        code = np.asarray(da.indices, dtype=np.int64)
        ndict = len(da.dictionary)
        # per-doc distinct: unique (doc, code) pairs, then count docs per code
        pair = np.unique(doc_idx * ndict + code)
        nd = np.bincount((pair % ndict).astype(np.int64), minlength=ndict)
        seg_str = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        return pa.table({
            "bucket": pa.array(
                (hash_str(seg_str) % np.uint64(num_buckets)).astype(np.int32)),
            "seg": da.dictionary,
            "nd": pa.array(nd.astype(np.int64)),
        })

    def bucket_frequent(g: pa.Table) -> pa.Table:
        s = g["seg"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        da = pc.dictionary_encode(s)
        totals = np.bincount(np.asarray(da.indices),
                             weights=np.asarray(g["nd"]),
                             minlength=len(da.dictionary)).astype(np.int64)
        keep = totals >= min_docs
        return pa.table({"seg": da.dictionary.filter(pa.array(keep))})

    freq_tbl = collect_table(
        docs.map_batches(freq_partial, batch_format="pyarrow",
                         batch_size=batch_size)
        .groupby("bucket")
        .map_groups(bucket_frequent, batch_format="pyarrow"),
        empty_schema=pa.schema([("seg", pa.string())]),
    )
    if freq_tbl.num_rows > max_frequent:
        if lane == "auto":
            return _segment_join_lane(docs, seg_words=seg_words,
                                      min_docs=min_docs, column=column,
                                      num_buckets=num_buckets,
                                      doc_shard=doc_shard,
                                      batch_size=batch_size)
        raise RuntimeError(
            f"segment_dedup: {freq_tbl.num_rows} frequent segments exceed "
            f"max_frequent={max_frequent}; use lane='join'")
    seg_col = freq_tbl["seg"]
    if isinstance(seg_col, pa.ChunkedArray):
        seg_col = seg_col.combine_chunks()
    freq_ref = ray.put(seg_col)

    def scrub(t: pa.Table) -> pa.Table:
        fr = ray.get(freq_ref) if not isinstance(freq_ref, pa.Array) else freq_ref
        doc_idx, seg_id, segs, n = _segments(t, seg_words, column)
        doc_ids = np.asarray(t["doc_id"]).astype(np.int64)
        if len(segs):
            member = (pc.is_in(segs, value_set=fr)
                      .to_numpy(zero_copy_only=False))
        else:
            member = np.empty(0, dtype=bool)
        n_segs = np.bincount(doc_idx, minlength=n)
        n_dropped = np.bincount(doc_idx[member], minlength=n)
        kept = ~member
        kept_segs = segs.filter(pa.array(kept))
        kept_counts = np.bincount(doc_idx[kept], minlength=n)
        bounds = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=bounds[1:])
        la = pa.ListArray.from_arrays(pa.array(bounds, pa.int32())
                                      if bounds[-1] <= np.iinfo(np.int32).max
                                      else pa.array(bounds, pa.int64()),
                                      kept_segs)
        return pa.table({
            "doc_id": pa.array(doc_ids),
            "n_segs": pa.array(n_segs.astype(np.int64)),
            "n_dropped": pa.array(n_dropped.astype(np.int64)),
            "cleaned_text": pc.binary_join(la, " "),
        })

    return docs.map_batches(scrub, batch_format="pyarrow",
                            batch_size=batch_size)


# --------------------------------------------- prefix-containment dedup
PREFIX_WORDS = 8


def _range_min(vals: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Vectorized range-minimum queries: min(vals[lo[i]:hi[i]]) per i
    (hi > lo required). Standard sparse table, built with numpy mins —
    O(g log g) build, O(1) per query, no Python loop over queries."""
    g = len(vals)
    table = [vals]
    j = 0
    while (2 << j) <= g:
        prev = table[j]
        half = 1 << j
        table.append(np.minimum(prev[: g - 2 * half + 1], prev[half: g - half + 1]))
        j += 1
    span = hi - lo
    k = (np.floor(np.log2(span)).astype(np.int64)
         if span.size else np.empty(0, np.int64))
    out = np.empty(len(lo), dtype=vals.dtype)
    for level in np.unique(k):
        m = k == level
        t = table[int(level)]
        out[m] = np.minimum(t[lo[m]], t[hi[m] - (1 << int(level))])
    return out


def prefix_containment(docs, *, prefix_words: int = PREFIX_WORDS,
                       column: str = "text", num_buckets: int = 256,
                       batch_size: int | None = None):
    """Truncation-duplicate detection (cf. the public RefinedWeb / C4
    pipelines): find documents whose text is a strict word-level PREFIX of
    another document (the shorter doc is a truncated copy). A contained doc
    must have >= ``prefix_words`` words (its container then shares its
    first ``prefix_words`` words by construction, so bucketing by that key
    loses no pair).

    Scale shape: one ``groupby`` keyed by the hash of the first
    ``prefix_words`` words; within a group the texts are SORTED once and
    each doc's containers are exactly the sorted prefix range
    ``[text + ' ', text + '!')`` (code-point ordering; '!' is the successor
    of ' '), located by two binary searches — no pairwise comparison, so a
    group of g docs costs O(g log g) regardless of how many containment
    relations exist. Output is bounded at one row per contained doc:
    (doc_id, n_containers, container_doc_id = min container id, via
    vectorized sparse-table range-min). Hash collisions only co-locate
    extra docs; the prefix check is exact on the strings.

    Partitioning assumption: one first-k-words group fits in a worker
    (boilerplate-heavy corpora with millions of identical openings make a
    hot group; raise ``prefix_words`` to split such corpora)."""

    def keyed(t: pa.Table) -> pa.Table:
        from .textops import _word_lists

        texts = t[column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words, counts, offs = _word_lists(texts)
        elig = counts >= prefix_words
        idx = np.flatnonzero(elig)
        if idx.size == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64())})
        # first-k-words key: join words[off : off+k] per eligible doc
        bounds = np.empty(idx.size + 1, dtype=np.int64)
        gidx = (np.arange(idx.size * prefix_words, dtype=np.int64)
                % prefix_words) + np.repeat(offs[idx], prefix_words)
        bounds[:-1] = np.arange(idx.size, dtype=np.int64) * prefix_words
        bounds[-1] = idx.size * prefix_words
        la = pa.ListArray.from_arrays(pa.array(bounds, pa.int64()),
                                      words.take(pa.array(gidx)))
        key = pc.binary_join(la, " ")
        kh = hash_str(key.to_numpy(zero_copy_only=False).astype("U"))
        return pa.table({
            "doc_id": pa.array(np.asarray(t["doc_id"]).astype(np.int64)[idx]),
            "text": texts.take(pa.array(idx)),
            "bucket": pa.array((kh % np.uint64(num_buckets)).astype(np.int64)),
        })

    def contained(g: pa.Table) -> pa.Table:
        texts = g["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        s = texts.to_numpy(zero_copy_only=False).astype("U")
        ids = np.asarray(g["doc_id"], dtype=np.int64)
        order = np.argsort(s, kind="stable")
        ss, sids = s[order], ids[order]
        lo = np.searchsorted(ss, np.char.add(s, " "))
        hi = np.searchsorted(ss, np.char.add(s, "!"))
        has = hi > lo
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_containers": pa.array([], pa.int64()),
                          "container_doc_id": pa.array([], pa.int64())})
        if not has.any():
            return empty
        return pa.table({
            "doc_id": pa.array(ids[has]),
            "n_containers": pa.array((hi - lo)[has].astype(np.int64)),
            "container_doc_id": pa.array(
                _range_min(sids, lo[has], hi[has]).astype(np.int64)),
        })

    return (
        docs.map_batches(keyed, batch_format="pyarrow", batch_size=batch_size)
        .groupby("bucket")
        .map_groups(contained, batch_format="pyarrow")
    )


# --------------------------------------------- duplicate n-gram coverage
NGRAM_COVER_N = 5


def _gram_strings(t: pa.Table, n: int, column: str = "text"):
    """Per-batch OVERLAPPING word n-grams as strings. Returns
    ``(parent, grams, n_pos, n_docs)``: per-gram parent row index, the
    ' '-joined n-gram strings (one per sliding position, order preserved),
    per-doc position counts and the batch row count. Word split mirrors
    ``textops._word_lists`` ('' words dropped, null text = zero words), so
    the DuckDB ``list_filter(string_split(...))`` oracle agrees exactly."""
    from .textops import _word_lists

    texts = t[column]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words, counts, offs = _word_lists(texts)
    n_pos = np.maximum(counts - (n - 1), 0)
    total = int(n_pos.sum())
    if total == 0:
        return (np.empty(0, np.int64), pa.array([], pa.string()),
                n_pos, len(texts))
    parent = np.repeat(np.arange(len(counts), dtype=np.int64), n_pos)
    pos_starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(n_pos[:-1], out=pos_starts[1:])
    in_doc = np.arange(total, dtype=np.int64) - np.repeat(pos_starts, n_pos)
    start = offs[parent] + in_doc  # global index of each position's 1st word
    # overlapping windows need a real gather (n values per position) — one
    # vectorized take, then a fixed-stride ListArray rebuild + binary_join
    gidx = (start[:, None] + np.arange(n, dtype=np.int64)).ravel()
    bounds = np.arange(total + 1, dtype=np.int64) * n
    la = pa.ListArray.from_arrays(
        pa.array(bounds, pa.int32())
        if bounds[-1] <= np.iinfo(np.int32).max else pa.array(bounds, pa.int64()),
        words.take(pa.array(gidx)),
    )
    return parent, pc.binary_join(la, " "), n_pos, len(texts)


def _coverage_join_lane(docs, *, n: int, min_docs: int, column: str,
                        num_buckets: int, doc_shard: int,
                        batch_size: int | None):
    """No-broadcast lane of ``dup_ngram_coverage`` — identical output.
    One fused gram-bucket exchange computes each gram's exact distinct-doc
    count AND each doc's per-bucket duplicated-position partial (sum of tf
    over its frequent grams); a bounded doc-shard groupby sums the partials
    against per-doc base rows carrying n_grams."""
    from .textops import _word_lists

    def pair_partial(t: pa.Table) -> pa.Table:
        parent, grams, _, _ = _gram_strings(t, n, column)
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        return _join_pair_rows(parent, np.empty(0, np.int64), grams, ids,
                               num_buckets=num_buckets, doc_shard=doc_shard,
                               with_starts=False)

    def bucket_tf(g: pa.Table) -> pa.Table:
        u = g["unit"]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        da = pc.dictionary_encode(u)
        gi = np.asarray(da.indices, dtype=np.int64)
        nd = np.bincount(gi, minlength=len(da.dictionary))
        km = nd[gi] >= min_docs
        d = np.asarray(g["doc_id"]).astype(np.int64)[km]
        f = np.asarray(g["tf"]).astype(np.int64)[km]
        dd = pc.dictionary_encode(pa.array(d))
        di = np.asarray(dd.indices, dtype=np.int64)
        uids = np.asarray(dd.dictionary, dtype=np.int64)
        n_dup = np.bincount(di, weights=f, minlength=len(uids))
        return pa.table({
            "dshard": pa.array(uids // doc_shard),
            "doc_id": pa.array(uids),
            "n_grams": pa.array(np.zeros(len(uids), dtype=np.int64)),
            "n_dup": pa.array(n_dup.astype(np.int64)),
        })

    def base_rows(t: pa.Table) -> pa.Table:
        texts = t[column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        _, counts, _ = _word_lists(texts)
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        n_pos = np.maximum(counts - (n - 1), 0).astype(np.int64)
        return pa.table({
            "dshard": pa.array(ids // doc_shard),
            "doc_id": pa.array(ids),
            "n_grams": pa.array(n_pos),
            "n_dup": pa.array(np.zeros(len(ids), dtype=np.int64)),
        })

    def doc_fold(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        dd = pc.dictionary_encode(pa.array(ids))
        di = np.asarray(dd.indices, dtype=np.int64)
        uids = np.asarray(dd.dictionary, dtype=np.int64)
        cols = {}
        for c in ("n_grams", "n_dup"):
            cols[c] = pa.array(np.bincount(
                di, weights=np.asarray(g[c]).astype(np.int64),
                minlength=len(uids)).astype(np.int64))
        return pa.table({"doc_id": pa.array(uids), **cols})

    flagged = (docs.map_batches(pair_partial, batch_format="pyarrow",
                                batch_size=batch_size)
               .groupby("bucket")
               .map_groups(bucket_tf, batch_format="pyarrow"))
    base = docs.map_batches(base_rows, batch_format="pyarrow",
                            batch_size=batch_size)
    return (base.union(flagged)
            .groupby("dshard")
            .map_groups(doc_fold, batch_format="pyarrow"))


def dup_ngram_coverage(docs, *, n: int = NGRAM_COVER_N, min_docs: int = 2,
                       column: str = "text", num_buckets: int = 64,
                       max_frequent: int = 2_000_000,
                       doc_shard: int = _JOIN_DOC_SHARD, lane: str = "auto",
                       batch_size: int | None = None):
    """Exact duplicate-n-gram coverage — the per-document substring-dup
    signal of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"): for every document, how many of its sliding word
    n-gram positions carry an n-gram that also appears in >= ``min_docs``
    DISTINCT documents corpus-wide. High coverage = the document is largely
    stitched from text that exists elsewhere (template spam, mirrored
    articles) even when no WHOLE-document near-dup fires — the gap MinHash/
    SimHash (whole-doc sketches) and segment_dedup (non-overlapping lines)
    all leave open.

    Scale shape — two streaming passes, same skeleton as ``segment_dedup``:

    1. **Frequency discovery.** Per batch: per-doc-DISTINCT n-grams
       (dictionary-encode + unique (doc, code) pairs) leave as
       (bucket, gram, partial_distinct_doc_count) pre-aggregated rows; one
       bucketed groupby sums exact distinct-doc counts per gram STRING (no
       hash-collision merging by construction) and keeps only grams with
       count >= ``min_docs``.
    2. **Coverage probe.** The frequent set is broadcast once via
       ``ray.put``; a pure ``map_batches`` ``pc.is_in`` probe counts, per
       document, the positions (every occurrence, not distinct) whose gram
       is frequent.

    Past ``max_frequent`` the broadcast would explode: ``lane="auto"``
    (default) falls back to the no-broadcast join lane
    (``_coverage_join_lane`` — identical output, lane-equivalence tested),
    ``lane="broadcast"`` raises loudly, ``lane="join"`` skips discovery
    and always joins.

    Returns Dataset[doc_id, n_grams, n_dup] — one row per input document
    (docs with < n words: 0/0). ``dup_fraction = n_dup / n_grams`` is left
    to the caller so the outputs stay integer-exact for the SQL oracle."""
    import ray

    if lane not in ("auto", "broadcast", "join"):
        raise ValueError(f"dup_ngram_coverage: unknown lane {lane!r}")
    freq_ref = None if lane == "join" else _frequent_gram_set(
        docs, n=n, min_docs=min_docs, column=column,
        num_buckets=num_buckets, max_frequent=max_frequent,
        batch_size=batch_size, caller="dup_ngram_coverage",
        on_overflow="raise" if lane == "broadcast" else "fallback")
    if freq_ref is None:
        return _coverage_join_lane(docs, n=n, min_docs=min_docs,
                                   column=column, num_buckets=num_buckets,
                                   doc_shard=doc_shard,
                                   batch_size=batch_size)

    def cover(t: pa.Table) -> pa.Table:
        fr = ray.get(freq_ref)
        parent, grams, n_pos, n_docs = _gram_strings(t, n, column)
        doc_ids = np.asarray(t["doc_id"]).astype(np.int64)
        if len(grams):
            member = _member_mask(grams, fr)
            n_dup = np.bincount(parent[member], minlength=n_docs)
        else:
            n_dup = np.zeros(n_docs, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(doc_ids),
            "n_grams": pa.array(n_pos.astype(np.int64)),
            "n_dup": pa.array(n_dup.astype(np.int64)),
        })

    return docs.map_batches(cover, batch_format="pyarrow",
                            batch_size=batch_size)


def _member_mask(grams, value_set) -> np.ndarray:
    """Per-occurrence membership of gram strings in a broadcast set —
    dictionary-encode first and probe only the UNIQUE grams (the winnowing
    lesson: per-occurrence string work is the hidden hot cost), then gather
    the verdicts by code."""
    da = pc.dictionary_encode(grams)
    hit = pc.is_in(da.dictionary, value_set=value_set).to_numpy(
        zero_copy_only=False)
    return hit[np.asarray(da.indices, dtype=np.int64)]


def _frequent_gram_set(docs, *, n: int, min_docs: int, column: str,
                       num_buckets: int, max_frequent: int,
                       batch_size: int | None, caller: str,
                       on_overflow: str = "raise"):
    """Frequency-discovery pass shared by ``dup_ngram_coverage`` and
    ``strip_dup_spans``: exact distinct-doc counts per n-gram STRING via a
    bucketed groupby over per-batch per-doc-distinct partials, returning a
    ``ray.put`` handle on the >= ``min_docs`` gram set. Past
    ``max_frequent`` the broadcast would explode: ``on_overflow="raise"``
    fails loudly, ``"fallback"`` returns None so the caller can switch to
    the no-broadcast join lane."""
    import ray

    def freq_partial(t: pa.Table) -> pa.Table:
        parent, grams, _, _ = _gram_strings(t, n, column)
        if len(grams) == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "gram": pa.array([], pa.string()),
                             "nd": pa.array([], pa.int64())})
        da = pc.dictionary_encode(grams)
        code = np.asarray(da.indices, dtype=np.int64)
        ndict = len(da.dictionary)
        pair = np.unique(parent * ndict + code)
        nd = np.bincount((pair % ndict).astype(np.int64), minlength=ndict)
        gram_str = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        return pa.table({
            "bucket": pa.array(
                (hash_str(gram_str) % np.uint64(num_buckets)).astype(np.int32)),
            "gram": da.dictionary,
            "nd": pa.array(nd.astype(np.int64)),
        })

    def bucket_frequent(g: pa.Table) -> pa.Table:
        s = g["gram"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        da = pc.dictionary_encode(s)
        totals = np.bincount(np.asarray(da.indices),
                             weights=np.asarray(g["nd"]),
                             minlength=len(da.dictionary)).astype(np.int64)
        return pa.table({"gram": da.dictionary.filter(pa.array(totals >= min_docs))})

    freq_tbl = collect_table(
        docs.map_batches(freq_partial, batch_format="pyarrow",
                         batch_size=batch_size)
        .groupby("bucket")
        .map_groups(bucket_frequent, batch_format="pyarrow"),
        empty_schema=pa.schema([("gram", pa.string())]),
    )
    if freq_tbl.num_rows > max_frequent:
        if on_overflow == "fallback":
            return None
        raise RuntimeError(
            f"{caller}: {freq_tbl.num_rows} frequent n-grams "
            f"exceed max_frequent={max_frequent}; run whole-doc dedup first "
            f"or use lane='join'")
    gram_col = freq_tbl["gram"]
    if isinstance(gram_col, pa.ChunkedArray):
        gram_col = gram_col.combine_chunks()
    return ray.put(gram_col)


# ------------------------------------------ no-broadcast join lane (shared)
# When the corpus-duplicated gram/segment set overflows the ``ray.put``
# ceiling (boilerplate-heavy corpora at 100 TB), membership cannot be
# broadcast. The join lane FUSES frequency discovery and the probe into a
# single gram-bucket exchange: each batch emits one row per DISTINCT
# (doc, unit) pair (docs never split across batches, so these rows are
# globally unique); inside a unit's bucket group the distinct-doc count is
# simply its row count, and the rows of frequent units are re-keyed by
# doc shard to meet the document payload in a second groupby (the round-2
# distributed pair-verify pattern). Nothing corpus-sized is ever collected
# or broadcast; both exchanges stream pre-aggregated rows.
def _join_pair_rows(parent: np.ndarray, pos: np.ndarray, units,
                    doc_ids: np.ndarray, *, num_buckets: int, doc_shard: int,
                    with_starts: bool) -> pa.Table:
    """Per-batch per-(doc, unit)-DISTINCT rows for the join lane. ``units``
    are the occurrence strings (grams or segments), ``parent`` the local doc
    index per occurrence, ``pos`` the in-doc position per occurrence (word
    start for grams, segment ordinal for segments). Emits (bucket, unit,
    dshard, doc_id, starts|tf) with ``starts`` the in-doc position list
    (``with_starts``) or ``tf`` the occurrence count."""
    if len(units) == 0:
        cols = {"bucket": pa.array([], pa.int32()),
                "unit": pa.array([], pa.string()),
                "dshard": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64())}
        if with_starts:
            cols["starts"] = pa.array([], pa.list_(pa.int64()))
        else:
            cols["tf"] = pa.array([], pa.int64())
        return pa.table(cols)
    da = pc.dictionary_encode(units)
    code = np.asarray(da.indices, dtype=np.int64)
    ndict = len(da.dictionary)
    pairkey = parent * ndict + code
    order = np.argsort(pairkey, kind="stable")
    pk = pairkey[order]
    first = np.ones(len(pk), dtype=bool)
    first[1:] = pk[1:] != pk[:-1]
    run_starts = np.flatnonzero(first)
    run_code = (pk[run_starts] % ndict).astype(np.int64)
    run_parent = (pk[run_starts] // ndict).astype(np.int64)
    unit_str = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
    bucket = (hash_str(unit_str) % np.uint64(num_buckets)).astype(np.int32)
    ids = doc_ids[run_parent]
    cols = {
        "bucket": pa.array(bucket[run_code]),
        "unit": da.dictionary.take(pa.array(run_code)),
        "dshard": pa.array(ids // doc_shard),
        "doc_id": pa.array(ids),
    }
    bounds = np.append(run_starts, len(pk))
    if with_starts:
        cols["starts"] = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32()), pa.array(pos[order], pa.int64()))
    else:
        cols["tf"] = pa.array(np.diff(bounds).astype(np.int64))
    return pa.table(cols)


def _bucket_flag_starts(g: pa.Table, min_docs: int) -> pa.Table:
    """Unit-bucket fold: a unit is frequent iff its (globally unique)
    per-(doc, unit) rows number >= ``min_docs``; frequent rows pass through
    re-keyed for the doc-shard rendezvous (role 1, null text)."""
    u = g["unit"]
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    da = pc.dictionary_encode(u)
    gi = np.asarray(da.indices, dtype=np.int64)
    nd = np.bincount(gi, minlength=len(da.dictionary))
    kept = g.filter(pa.array(nd[gi] >= min_docs))
    n = kept.num_rows
    return pa.table({
        "role": pa.array(np.ones(n, dtype=np.int8)),
        "dshard": kept["dshard"],
        "doc_id": kept["doc_id"],
        "text": pa.nulls(n, pa.string()),
        "starts": kept["starts"],
    })


def _payload_rows(t: pa.Table, column: str, doc_shard: int) -> pa.Table:
    """Role-0 document payload rows for the doc-shard rendezvous."""
    ids = np.asarray(t["doc_id"]).astype(np.int64)
    texts = t[column]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(ids)
    return pa.table({
        "role": pa.array(np.zeros(n, dtype=np.int8)),
        "dshard": pa.array(ids // doc_shard),
        "doc_id": pa.array(ids),
        "text": texts.cast(pa.string()),
        "starts": pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int32), pa.int32()),
            pa.array([], pa.int64())),
    })


def _flag_flat(flag: pa.Table, ids: np.ndarray):
    """Flatten role-1 rows' position lists to (doc-local index, position)
    against the role-0 doc_id vector ``ids`` (each flagged doc_id is
    guaranteed present: both sides shard by doc_id // doc_shard)."""
    sl = flag["starts"]
    if isinstance(sl, pa.ChunkedArray):
        sl = sl.combine_chunks()
    flat = np.asarray(sl.flatten(), dtype=np.int64)
    lens = np.asarray(pc.list_value_length(sl), dtype=np.int64)
    fdoc = np.asarray(flag["doc_id"]).astype(np.int64)
    order = np.argsort(ids)
    loc = order[np.searchsorted(ids, fdoc, sorter=order)]
    return np.repeat(loc, lens), flat


def _strip_join_lane(docs, *, n: int, min_docs: int, column: str,
                     num_buckets: int, doc_shard: int,
                     batch_size: int | None):
    """No-broadcast lane of ``strip_dup_spans`` — identical output, two
    streaming exchanges (fused frequency+probe gram-bucket groupby, then a
    doc-shard rendezvous where flagged window starts meet the doc text)."""
    from .textops import _word_lists

    def pair_partial(t: pa.Table) -> pa.Table:
        parent, grams, n_pos, n_docs = _gram_strings(t, n, column)
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        pos_starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(n_pos[:-1], out=pos_starts[1:])
        in_doc = (np.arange(len(parent), dtype=np.int64)
                  - np.repeat(pos_starts, n_pos))
        return _join_pair_rows(parent, in_doc, grams, ids,
                               num_buckets=num_buckets, doc_shard=doc_shard,
                               with_starts=True)

    def rebuild(g: pa.Table) -> pa.Table:
        role = np.asarray(g["role"]).astype(np.int8)
        base = g.filter(pa.array(role == 0))
        texts = base["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = np.asarray(base["doc_id"]).astype(np.int64)
        words, counts, offs = _word_lists(texts)
        n_docs = len(ids)
        total_words = int(counts.sum())
        diff = np.zeros(total_words + n + 1, dtype=np.int64)
        flag = g.filter(pa.array(role == 1))
        if flag.num_rows:
            loc, in_doc = _flag_flat(flag, ids)
            gstarts = offs[loc] + in_doc
            np.add.at(diff, gstarts, 1)
            np.add.at(diff, gstarts + n, -1)
        covered = np.cumsum(diff[:total_words]) > 0
        keep = ~covered
        word_parent = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        kept_counts = (np.bincount(word_parent[keep], minlength=n_docs)
                       if total_words else np.zeros(n_docs, dtype=np.int64))
        bounds = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=bounds[1:])
        la = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32())
            if bounds[-1] <= np.iinfo(np.int32).max
            else pa.array(bounds, pa.int64()),
            words.filter(pa.array(keep)))
        return pa.table({
            "doc_id": pa.array(ids),
            "text": pc.binary_join(la, " "),
            "n_words": pa.array(counts.astype(np.int64)),
            "n_removed": pa.array((counts - kept_counts).astype(np.int64)),
        })

    flagged = (docs.map_batches(pair_partial, batch_format="pyarrow",
                                batch_size=batch_size)
               .groupby("bucket")
               .map_groups(lambda g: _bucket_flag_starts(g, min_docs),
                           batch_format="pyarrow"))
    payload = docs.map_batches(
        lambda t: _payload_rows(t, column, doc_shard),
        batch_format="pyarrow", batch_size=batch_size)
    return (payload.union(flagged)
            .groupby("dshard")
            .map_groups(rebuild, batch_format="pyarrow"))


def strip_dup_spans(docs, *, n: int = NGRAM_COVER_N, min_docs: int = 2,
                    column: str = "text", num_buckets: int = 64,
                    max_frequent: int = 2_000_000,
                    doc_shard: int = _JOIN_DOC_SHARD, lane: str = "auto",
                    batch_size: int | None = None):
    """Duplicated-substring REMOVAL — the transform half of the Lee et al.
    2022 ExactSubstr family that ``dup_ngram_coverage`` only measures:
    rebuild every document with each word position covered by a
    corpus-duplicated sliding ``n``-gram window (gram in >= ``min_docs``
    DISTINCT docs) deleted, so boilerplate passages vanish while the
    document's unique text survives. The fixed-window form trades the
    suffix-array generality of true ExactSubstr for a broadcastable
    frequent-gram set and a fully streaming rewrite.

    Scale shape, two lanes with IDENTICAL output (lane-equivalence tested):
    the default broadcast lane runs the same two passes as
    ``dup_ngram_coverage`` (shared ``_frequent_gram_set`` discovery, then
    one stateless probe); when the frequent set overflows ``max_frequent``
    (``lane="auto"``) or on request (``lane="join"``), the no-broadcast
    join lane (``_strip_join_lane``) fuses discovery+probe into one
    gram-bucket exchange and rendezvous the flagged window starts with the
    doc text in a doc-shard groupby — nothing corpus-sized is collected.
    ``lane="broadcast"`` keeps the loud overflow failure. Coverage resolves
    with a difference array over the flat word index — +1 at each flagged
    window start, -1 past its end, cumsum > 0 = covered (windows never
    cross a doc boundary, so the flat cumsum is safe); kept words rebuild
    via one filter + ListArray + binary_join.

    Returns Dataset[doc_id, text, n_words, n_removed] — one row per input
    doc (null/empty text -> '', 0, 0); integer counts keep the SQL oracle
    exact."""
    import ray

    from .textops import _word_lists

    if lane not in ("auto", "broadcast", "join"):
        raise ValueError(f"strip_dup_spans: unknown lane {lane!r}")
    freq_ref = None if lane == "join" else _frequent_gram_set(
        docs, n=n, min_docs=min_docs, column=column,
        num_buckets=num_buckets, max_frequent=max_frequent,
        batch_size=batch_size, caller="strip_dup_spans",
        on_overflow="raise" if lane == "broadcast" else "fallback")
    if freq_ref is None:
        return _strip_join_lane(docs, n=n, min_docs=min_docs, column=column,
                                num_buckets=num_buckets, doc_shard=doc_shard,
                                batch_size=batch_size)

    def strip(t: pa.Table) -> pa.Table:
        fr = ray.get(freq_ref)
        texts = t[column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words, counts, offs = _word_lists(texts)
        n_docs = len(counts)
        doc_ids = np.asarray(t["doc_id"]).astype(np.int64)
        total_words = int(counts.sum())
        parent, grams, n_pos, _ = _gram_strings(t, n, column)
        diff = np.zeros(total_words + n + 1, dtype=np.int64)
        if len(grams):
            member = _member_mask(grams, fr)
            # global word index of each position's first word (the same
            # arithmetic _gram_strings uses internally)
            pos_starts = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(n_pos[:-1], out=pos_starts[1:])
            in_doc = (np.arange(len(parent), dtype=np.int64)
                      - np.repeat(pos_starts, n_pos))
            starts = (offs[parent] + in_doc)[member]
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + n, -1)
        covered = np.cumsum(diff[:total_words]) > 0
        keep = ~covered
        word_parent = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        kept_counts = (np.bincount(word_parent[keep], minlength=n_docs)
                       if total_words else np.zeros(n_docs, dtype=np.int64))
        bounds = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=bounds[1:])
        la = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32())
            if bounds[-1] <= np.iinfo(np.int32).max
            else pa.array(bounds, pa.int64()),
            words.filter(pa.array(keep)))
        return pa.table({
            "doc_id": pa.array(doc_ids),
            "text": pc.binary_join(la, " "),
            "n_words": pa.array(counts.astype(np.int64)),
            "n_removed": pa.array((counts - kept_counts).astype(np.int64)),
        })

    return docs.map_batches(strip, batch_format="pyarrow",
                            batch_size=batch_size)


# ------------------------------------------------- bloom decontamination
class BloomFilter:
    """Vectorized Bloom filter over uint64 keys — the broadcast structure
    for membership screens whose exact key set is too large to ship (a
    64-bit exact set costs 8 B/key; the filter costs ~1.2 B/key at 1% FPR).
    k hash functions are derived from one FNV-style avalanche of the key
    (splitmix64 finalizer, public domain constants) — pure numpy, no loops
    over keys. False POSITIVES only: a probe can over-flag, never miss."""

    __slots__ = ("bits", "n_bits", "k")

    def __init__(self, n_bits: int, k: int):
        self.n_bits = int(n_bits)
        self.k = int(k)
        self.bits = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)

    @classmethod
    def sized_for(cls, n_keys: int, fpr: float = 0.01) -> "BloomFilter":
        n_keys = max(1, n_keys)
        n_bits = int(np.ceil(-n_keys * np.log(fpr) / (np.log(2) ** 2)))
        k = max(1, int(round(n_bits / n_keys * np.log(2))))
        return cls(n_bits, k)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(len(keys), k) bit positions via splitmix64 double hashing."""
        z = keys.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h1 = z ^ (z >> np.uint64(31))
        h2 = (z >> np.uint64(17)) | np.uint64(1)  # odd => full-period step
        i = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.n_bits)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        hit = (self.bits[pos >> np.uint64(6)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.n_bits, self.k) == (other.n_bits, other.k)
        self.bits |= other.bits
        return self


def dup_degree_histogram(docs, *, n: int = 2, threshold: float = 0.8,
                         num_buckets: int = 64):
    """Degree distribution of the near-dup pair graph — the corpus-health
    dial that separates isolated duplicate pairs (degree 1) from template
    explosions (hub docs with hundreds of neighbors) before cluster
    resolution is even attempted.

    Plan: ``ngram_jaccard_pairs`` edges -> per-batch pre-aggregated
    endpoint counts -> one doc-bucket groupby sums exact degrees and emits
    per-bucket DEGREE value counts (distinct degrees are few) -> per-task
    combine + driver fold; degree-0 docs are the corpus count minus the
    paired docs (one metadata count, no extra scan).

    Returns a pyarrow Table (degree, n_docs), degree 0 included."""
    from ..functions.collect import collect_table

    pairs = ngram_jaccard_pairs(docs, n=n, threshold=threshold)
    total_docs = docs.count()

    def ends(t: pa.Table) -> pa.Table:
        d = np.concatenate([
            np.asarray(t["doc_a"]).astype(np.int64),
            np.asarray(t["doc_b"]).astype(np.int64),
        ]) if t.num_rows else np.empty(0, np.int64)
        ud, cnt = np.unique(d, return_counts=True)
        return pa.table({
            "bucket": pa.array(_intmix(ud, num_buckets).astype(np.int32)),
            "doc_id": pa.array(ud),
            "k": pa.array(cnt.astype(np.int64)),
        })

    def bucket_degrees(g: pa.Table) -> pa.Table:
        d = np.asarray(g["doc_id"]).astype(np.int64)
        k = np.asarray(g["k"]).astype(np.int64)
        ud, inv = np.unique(d, return_inverse=True)
        deg = np.zeros(len(ud), np.int64)
        np.add.at(deg, inv, k)
        vd, cnt = np.unique(deg, return_counts=True)
        return pa.table({"degree": pa.array(vd),
                         "n_docs": pa.array(cnt.astype(np.int64))})

    def combine(t: pa.Table) -> pa.Table:
        dg = np.asarray(t["degree"]).astype(np.int64)
        nn = np.asarray(t["n_docs"]).astype(np.int64)
        ud, inv = np.unique(dg, return_inverse=True)
        tot = np.zeros(len(ud), np.int64)
        np.add.at(tot, inv, nn)
        return pa.table({"degree": pa.array(ud), "n_docs": pa.array(tot)})

    parts = collect_table(
        pairs.map_batches(ends, batch_format="pyarrow")
        .groupby("bucket").map_groups(bucket_degrees, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([("degree", pa.int64()),
                                ("n_docs", pa.int64())]),
    )
    hist = combine(parts) if parts.num_rows else parts
    paired = int(np.asarray(hist["n_docs"]).sum()) if hist.num_rows else 0
    n0 = total_docs - paired
    if n0 > 0:
        hist = pa.concat_tables([
            pa.table({"degree": pa.array([0], pa.int64()),
                      "n_docs": pa.array([n0], pa.int64())}), hist])
    return hist


PR_SCALE = 1_000_000
PR_BASE = 150_000  # floor(0.15 * PR_SCALE)


def pagerank_dup(docs, *, iters: int = 3, n: int = 2, threshold: float = 0.8,
                 num_buckets: int = 64):
    """Fixed-round integer PageRank over the near-dup pair graph — a
    centrality signal for canonical-document selection inside template
    clusters (the hub copy everyone near-duplicates outranks its
    satellites). Every step is integer-exact so a generated per-round SQL
    CTE chain mirrors the run bitwise: contribution = ``(85 * p) //
    (100 * deg)`` (= floor(0.85 p / deg), no floats), new score =
    ``PR_BASE + sum(contributions)``; isolated docs keep PR_BASE +
    nothing and are excluded (graph nodes only), matching the oracle.

    Plan: half-edges materialize ONCE (2 rows per pair); per round, one
    src-bucket groupby meets score rows with half-edges (role-tagged — the
    established membership-meets-payload pattern) and emits pre-aggregated
    (dst, contribution) rows; one dst-bucket groupby folds them with the
    static (node, degree) rows into the next score table. Driver holds
    nothing graph-sized.

    Returns Dataset[doc_id, rank] (scaled by PR_SCALE), graph nodes only."""
    import ray.data as rd

    edges = ngram_jaccard_pairs(docs, n=n, threshold=threshold)

    def halves(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "bucket": pa.array(_intmix(src, num_buckets).astype(np.int32)),
            "role": pa.array(np.zeros(len(src), np.int8)),
            "src": pa.array(src),
            "dst": pa.array(dst),
            "p": pa.array(np.zeros(len(src), np.int64)),
        })

    half = edges.map_batches(halves, batch_format="pyarrow").materialize()

    def degrees(g: pa.Table) -> pa.Table:
        s = np.asarray(g["src"]).astype(np.int64)
        us, cnt = np.unique(s, return_counts=True)
        return pa.table({"node": pa.array(us),
                         "deg": pa.array(cnt.astype(np.int64)),
                         "p": pa.array(np.full(len(us), PR_SCALE, np.int64))})

    # (node, deg, p0): degree fold groups by the same src bucket
    scores = (half.groupby("bucket")
              .map_groups(degrees, batch_format="pyarrow").materialize())

    def score_rows(t: pa.Table) -> pa.Table:
        node = np.asarray(t["node"]).astype(np.int64)
        return pa.table({
            "bucket": pa.array(_intmix(node, num_buckets).astype(np.int32)),
            "role": pa.array(np.ones(len(node), np.int8)),
            "src": pa.array(node),
            "dst": pa.array(np.asarray(t["deg"]).astype(np.int64)),  # deg
            "p": pa.array(np.asarray(t["p"]).astype(np.int64)),
        })

    def contribute(g: pa.Table) -> pa.Table:
        role = np.asarray(g["role"]).astype(np.int64)
        src = np.asarray(g["src"]).astype(np.int64)
        dst = np.asarray(g["dst"]).astype(np.int64)
        p = np.asarray(g["p"]).astype(np.int64)
        sn, sdeg, sp = src[role == 1], dst[role == 1], p[role == 1]
        order = np.argsort(sn)
        sn, sdeg, sp = sn[order], sdeg[order], sp[order]
        es, ed = src[role == 0], dst[role == 0]
        pos = np.searchsorted(sn, es)  # every edge src has a score row
        c = (85 * sp[pos]) // (100 * sdeg[pos])
        ud, inv = np.unique(ed, return_inverse=True)
        tot = np.zeros(len(ud), np.int64)
        np.add.at(tot, inv, c)
        return pa.table({
            "bucket": pa.array(_intmix(ud, num_buckets).astype(np.int32)),
            "role": pa.array(np.zeros(len(ud), np.int8)),
            "node": pa.array(ud),
            "v": pa.array(tot),
        })

    def node_rows(t: pa.Table) -> pa.Table:
        node = np.asarray(t["node"]).astype(np.int64)
        return pa.table({
            "bucket": pa.array(_intmix(node, num_buckets).astype(np.int32)),
            "role": pa.array(np.ones(len(node), np.int8)),
            "node": pa.array(node),
            "v": pa.array(np.asarray(t["deg"]).astype(np.int64)),
        })

    def fold_scores(g: pa.Table) -> pa.Table:
        role = np.asarray(g["role"]).astype(np.int64)
        node = np.asarray(g["node"]).astype(np.int64)
        v = np.asarray(g["v"]).astype(np.int64)
        nn, ndeg = node[role == 1], v[role == 1]
        order = np.argsort(nn)
        nn, ndeg = nn[order], ndeg[order]
        p = np.full(len(nn), PR_BASE, np.int64)
        cn, cv = node[role == 0], v[role == 0]
        pos = np.searchsorted(nn, cn)
        np.add.at(p, pos, cv)
        return pa.table({"node": pa.array(nn), "deg": pa.array(ndeg),
                         "p": pa.array(p)})

    for _ in range(iters):
        tagged = (half.union(
            scores.map_batches(score_rows, batch_format="pyarrow")))
        contribs = (tagged.groupby("bucket")
                    .map_groups(contribute, batch_format="pyarrow"))
        tagged2 = contribs.union(
            scores.map_batches(node_rows, batch_format="pyarrow"))
        scores = (tagged2.groupby("bucket")
                  .map_groups(fold_scores, batch_format="pyarrow")
                  ).materialize()

    def out(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"], "rank": t["p"]})

    return scores.map_batches(out, batch_format="pyarrow")


def kcore_dup(docs, *, iters: int = 3, n: int = 2, threshold: float = 0.8,
              num_buckets: int = 64):
    """Fixed-round h-index iteration (Lü et al. 2016 "H-index of a network
    node") toward k-core coreness over the near-dup pair graph — the
    template-cluster density dial: high-coreness docs sit inside tightly
    interlinked boilerplate cores that degree alone (``dup_degree_histogram``,
    hubs) and PageRank (popularity) both miss. Starting from c0 = degree,
    each round replaces a node's value with the h-index of its neighbors'
    values; the sequence is non-increasing and converges to coreness, and
    every round is integer-exact, so a generated per-round SQL CTE chain
    mirrors the run bitwise whether or not ``iters`` rounds reached the
    fixpoint.

    Plan (the ``pagerank_dup`` skeleton): half-edges materialize ONCE; per
    round, one src-bucket groupby meets score rows with half-edges
    (role-tagged membership-meets-payload) and emits PRE-AGGREGATED
    (dst, value, count) rows — the h-index needs only the neighbor-value
    multiset, and value counts compress it; one dst-bucket groupby folds the
    counts and computes h per node (descending value runs: h = max over runs
    of min(value, cumulative count) — equal to the expanded row_number
    formula). Every graph node is some edge's dst, so no pass-through rows
    are needed. Driver holds nothing graph-sized.

    Returns Dataset[doc_id, core], graph nodes only (isolated docs have
    coreness 0 and are excluded, matching ``pagerank_dup``)."""
    edges = ngram_jaccard_pairs(docs, n=n, threshold=threshold)
    return kcore_from_pairs(edges, iters=iters, num_buckets=num_buckets)


def kcore_from_pairs(edges, *, iters: int = 3, num_buckets: int = 64):
    """h-index-iteration core of ``kcore_dup`` over an explicit
    Dataset[doc_a, doc_b] edge list (each undirected edge once, no
    self-loops) — split out so property tests can drive arbitrary graphs."""

    def halves(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "bucket": pa.array(_intmix(src, num_buckets).astype(np.int32)),
            "role": pa.array(np.zeros(len(src), np.int8)),
            "src": pa.array(src),
            "dst": pa.array(dst),
        })

    half = edges.map_batches(halves, batch_format="pyarrow").materialize()

    def degrees(g: pa.Table) -> pa.Table:
        s = np.asarray(g["src"]).astype(np.int64)
        # precondition: DISTINCT undirected edges — a duplicate pair would
        # inflate degrees AND double-route neighbor values, silently
        # corrupting every h-index downstream; all copies of a half-edge
        # land in this src bucket, so the check is complete (the
        # triangle_counts_from_pairs guard, same failure class)
        d = np.asarray(g["dst"]).astype(np.int64)
        order = np.lexsort((d, s))
        if len(s) > 1 and bool(np.any((s[order][1:] == s[order][:-1])
                                      & (d[order][1:] == d[order][:-1]))):
            raise ValueError(
                "kcore_from_pairs expects distinct canonical pairs — "
                "found duplicate edges")
        us, cnt = np.unique(s, return_counts=True)
        return pa.table({"node": pa.array(us),
                         "c": pa.array(cnt.astype(np.int64))})

    scores = (half.groupby("bucket")
              .map_groups(degrees, batch_format="pyarrow").materialize())

    def score_rows(t: pa.Table) -> pa.Table:
        node = np.asarray(t["node"]).astype(np.int64)
        return pa.table({
            "bucket": pa.array(_intmix(node, num_buckets).astype(np.int32)),
            "role": pa.array(np.ones(len(node), np.int8)),
            "src": pa.array(node),
            "dst": pa.array(np.asarray(t["c"]).astype(np.int64)),  # value
        })

    def neighbor_values(g: pa.Table) -> pa.Table:
        """Per src-bucket: route each edge's src value to its dst,
        pre-aggregated to (dst, value, count)."""
        role = np.asarray(g["role"]).astype(np.int64)
        src = np.asarray(g["src"]).astype(np.int64)
        dst = np.asarray(g["dst"]).astype(np.int64)
        sn, sv = src[role == 1], dst[role == 1]
        order = np.argsort(sn)
        sn, sv = sn[order], sv[order]
        es, ed = src[role == 0], dst[role == 0]
        pos = np.searchsorted(sn, es)  # every edge src has a score row
        v = sv[pos]
        key = np.stack([ed, v])
        uk, cnt = np.unique(key, axis=1, return_counts=True)
        return pa.table({
            "bucket": pa.array(
                _intmix(uk[0], num_buckets).astype(np.int32)),
            "node": pa.array(uk[0]),
            "v": pa.array(uk[1]),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    def fold_h(g: pa.Table) -> pa.Table:
        """Per dst-bucket: merge (node, v, cnt) partials, h-index per node
        over descending value runs: h = max over runs of min(v, cum)."""
        node = np.asarray(g["node"]).astype(np.int64)
        v = np.asarray(g["v"]).astype(np.int64)
        cnt = np.asarray(g["cnt"]).astype(np.int64)
        order = np.lexsort((-v, node))
        node, v, cnt = node[order], v[order], cnt[order]
        # merge duplicate (node, v) rows from different partials
        first = np.ones(len(node), dtype=bool)
        first[1:] = (node[1:] != node[:-1]) | (v[1:] != v[:-1])
        runs = np.flatnonzero(first)
        rcnt = np.add.reduceat(cnt, runs)
        rnode, rv = node[runs], v[runs]
        seg = np.ones(len(runs), dtype=bool)
        seg[1:] = rnode[1:] != rnode[:-1]
        seg_starts = np.flatnonzero(seg)
        g_cum = np.cumsum(rcnt)
        base = np.zeros(len(runs), np.int64)
        base[seg_starts[1:]] = g_cum[seg_starts[1:] - 1]
        base = np.maximum.accumulate(base)
        cum = g_cum - base
        h = np.maximum.reduceat(np.minimum(rv, cum), seg_starts)
        return pa.table({"node": pa.array(rnode[seg_starts]),
                         "c": pa.array(h)})

    for _ in range(iters):
        tagged = half.union(
            scores.map_batches(score_rows, batch_format="pyarrow"))
        scores = (tagged.groupby("bucket")
                  .map_groups(neighbor_values, batch_format="pyarrow")
                  .groupby("bucket")
                  .map_groups(fold_h, batch_format="pyarrow")).materialize()

    def out(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"], "core": t["c"]})

    return scores.map_batches(out, batch_format="pyarrow")


# --------------------------------------------- cross-shard duplicate audit
def cross_shard_overlap(docs, *, n_shards: int = 64, key: str = "text",
                        num_buckets: int = 256,
                        batch_size: int | None = None):
    """Duplicate groups that LEAK ACROSS output shards — the shard-hygiene
    audit for exported training data: with the hash shard layout
    (shard = FNV(str(doc_id)) % n_shards, the ``pipelines/export.py``
    assignment), an exact-duplicate text group whose members land in >= 2
    DISTINCT shards defeats per-shard dedup downstream and double-counts
    the passage across data-parallel ranks.

    Returns Dataset[group_id, n_docs, n_shards] — one row per duplicate
    ``key`` group spanning >= 2 shards, group_id = min member doc_id.

    Scale shape: one exchange keyed by the text hash (the ``exact_dedup``
    skeleton — verification on the actual strings inside the group, so
    hash collisions cannot merge distinct texts); per-group distinct-shard
    counting is one unique over (text-code, shard) pairs. Output bounded
    by the number of offending groups."""
    from ..functions.hashing import hash_str

    def bucketize(t: pa.Table) -> pa.Table:
        texts = t[key]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        ok = pc.is_valid(texts).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(ok)
        texts = texts.take(pa.array(idx))
        ids = ids[idx]
        h = hash_str(texts.to_numpy(zero_copy_only=False))
        shard = (hash_str(ids.astype("U")) % np.uint64(n_shards)).astype(np.int64)
        return pa.table({
            "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
            "k": texts.cast(pa.string()),
            "doc_id": pa.array(ids),
            "shard": pa.array(shard),
        })

    def per_group(g: pa.Table) -> pa.Table:
        ks = g["k"]
        if isinstance(ks, pa.ChunkedArray):
            ks = ks.combine_chunks()
        da = pc.dictionary_encode(ks)
        code = np.asarray(da.indices, dtype=np.int64)
        nc = len(da.dictionary)
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        shard = np.asarray(g["shard"]).astype(np.int64)
        n_docs = np.bincount(code, minlength=nc).astype(np.int64)
        gid = np.full(nc, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(gid, code, ids)
        ns = np.bincount(
            (np.unique(code * n_shards + shard) // n_shards).astype(np.int64),
            minlength=nc).astype(np.int64)
        keep = (n_docs >= 2) & (ns >= 2)
        return pa.table({
            "group_id": pa.array(gid[keep]),
            "n_docs": pa.array(n_docs[keep]),
            "n_shards": pa.array(ns[keep]),
        })

    return (docs.map_batches(bucketize, batch_format="pyarrow",
                             batch_size=batch_size)
            .groupby("bucket")
            .map_groups(per_group, batch_format="pyarrow"))


def crosslang_dups(docs, *, key: str = "text", num_buckets: int = 256,
                   batch_size: int | None = None):
    """Exact-duplicate text groups declared under >= 2 DISTINCT languages —
    the label-quality audit a lang-stratified mixture needs before trusting
    its metadata (the metadata-side complement of ``lang_confusion``): the
    same passage tagged 'en' in one copy and 'de' in another means at least
    one label is wrong, and a per-lang quota double-charges the text.

    Returns Dataset[group_id, n_docs, n_langs] — one row per duplicate
    ``key`` group spanning >= 2 distinct non-null langs, group_id = min
    member doc_id. Rows with null text or null lang are excluded (mirrors
    SQL ``count(DISTINCT lang)`` null semantics).

    Scale shape: the ``cross_shard_overlap`` skeleton — one exchange keyed
    by the text hash, string-verified inside the bucket group (hash
    collisions cannot merge distinct texts), per-group distinct-lang
    counting via one unique over (text-code, lang-code) pairs. Output
    bounded by the offending groups."""
    from ..functions.hashing import hash_str

    def bucketize(t: pa.Table) -> pa.Table:
        texts = t[key]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        langs = t["lang"]
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        ok = pc.and_(pc.is_valid(texts), pc.is_valid(langs)).to_numpy(
            zero_copy_only=False)
        idx = np.flatnonzero(ok)
        texts, langs, ids = (texts.take(pa.array(idx)),
                             langs.take(pa.array(idx)), ids[idx])
        h = hash_str(texts.to_numpy(zero_copy_only=False))
        return pa.table({
            "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
            "k": texts.cast(pa.string()),
            "doc_id": pa.array(ids),
            "lang": langs.cast(pa.string()),
        })

    def per_group(g: pa.Table) -> pa.Table:
        ks = g["k"]
        if isinstance(ks, pa.ChunkedArray):
            ks = ks.combine_chunks()
        da = pc.dictionary_encode(ks)
        code = np.asarray(da.indices, dtype=np.int64)
        nc = len(da.dictionary)
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        ls = g["lang"]
        if isinstance(ls, pa.ChunkedArray):
            ls = ls.combine_chunks()
        ld = pc.dictionary_encode(ls)
        lcode = np.asarray(ld.indices, dtype=np.int64)
        nl = max(len(ld.dictionary), 1)
        n_docs = np.bincount(code, minlength=nc).astype(np.int64)
        gid = np.full(nc, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(gid, code, ids)
        n_langs = np.bincount(
            (np.unique(code * nl + lcode) // nl).astype(np.int64),
            minlength=nc).astype(np.int64)
        keep = (n_docs >= 2) & (n_langs >= 2)
        return pa.table({
            "group_id": pa.array(gid[keep]),
            "n_docs": pa.array(n_docs[keep]),
            "n_langs": pa.array(n_langs[keep]),
        })

    return (docs.map_batches(bucketize, batch_format="pyarrow",
                             batch_size=batch_size)
            .groupby("bucket")
            .map_groups(per_group, batch_format="pyarrow"))


def cluster_size_histogram(labels, *, num_buckets: int = 64,
                           batch_size: int | None = None):
    """Cluster-SIZE distribution over ``dedup_clusters`` labels — the
    corpus-health companion to ``dup_degree_histogram`` one resolution step
    later: a template-explosion corpus shows a fat tail of giant
    components (one survivor drops thousands), a healthy one mostly pairs.
    Singleton docs (never in the pair graph) are not labeled and so not
    counted — the histogram describes the DUP graph.

    Returns a driver-side table (size, n_clusters), O(max component size)
    rows.

    Scale shape (the ``gram_spectrum`` fold): per-batch pre-aggregated
    (cluster, n) partials -> one cluster-bucket groupby sums exact
    per-cluster sizes and emits its bucket-local size value counts ->
    tiny driver fold."""
    from ..functions.collect import collect_table

    def partial(t: pa.Table) -> pa.Table:
        c = np.asarray(t["cluster"]).astype(np.int64)
        u, n = np.unique(c, return_counts=True)
        return pa.table({
            "bucket": pa.array(_intmix(u.astype(np.uint64),
                                       num_buckets).astype(np.int32)),
            "cluster": pa.array(u),
            "n": pa.array(n.astype(np.int64)),
        })

    def bucket_fold(g: pa.Table) -> pa.Table:
        c = np.asarray(g["cluster"]).astype(np.int64)
        n = np.asarray(g["n"]).astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        tot = np.zeros(len(u), dtype=np.int64)
        np.add.at(tot, inv, n)
        size, cnt = np.unique(tot, return_counts=True)
        return pa.table({"size": pa.array(size),
                         "n_clusters": pa.array(cnt.astype(np.int64))})

    parts = collect_table(
        labels.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size)
        .groupby("bucket").map_groups(bucket_fold, batch_format="pyarrow"),
        empty_schema=pa.schema([("size", pa.int64()),
                                ("n_clusters", pa.int64())]),
    )
    if parts.num_rows == 0:
        return parts
    s = np.asarray(parts["size"]).astype(np.int64)
    n = np.asarray(parts["n_clusters"]).astype(np.int64)
    u, inv = np.unique(s, return_inverse=True)
    tot = np.zeros(len(u), dtype=np.int64)
    np.add.at(tot, inv, n)
    return pa.table({"size": pa.array(u), "n_clusters": pa.array(tot)})


def dup_rate_by_source(docs, *, num_buckets: int = 256,
                       batch_size: int | None = None):
    """Per-source duplication-rate audit: how many documents each source
    contributed vs how many DISTINCT texts (by the shared FNV-1a fold, the
    same hash the DuckDB oracle computes — counts compare bitwise; at the
    64-bit hash width a collision under-counts one distinct per ~1e19
    pairs, identically on both sides). The n_docs/n_distinct ratio is the
    first thing a mixture audit reads per source — a crawler stuck in a
    template farm shows up as a source whose dup rate explodes.

    Scale shape: per batch, texts hash once and collapse to batch-distinct
    (source, h) rows before the exchange; the exchange is keyed by
    (source, h % num_buckets) so no group exceeds ~source_distinct/buckets
    rows; per-source doc counts ride the SAME exchange as one tiny count
    row per (batch, source) keyed bucket=-1. A final per-source groupby
    sums ~num_buckets partial rows per source. NULL-source docs keep their
    own group (SQL GROUP BY); NULL texts count into n_docs but contribute
    no hash (SQL count(DISTINCT fnv(NULL)) skips NULLs).

    Returns Dataset[source, n_docs, n_distinct]."""

    def partial(t: pa.Table) -> pa.Table:
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        src_np = src.to_numpy(zero_copy_only=False)
        null_src = np.array([x is None for x in src_np], dtype=bool)
        gkey = np.where(null_src, "N", np.char.add("T", src_np.astype("U")))
        # count rows: one per (source) present in the batch
        uk, inv = np.unique(gkey, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uk))
        rep_src = pa.array(
            [None if u == "N" else u[1:] for u in uk], pa.string())
        counts_tbl = pa.table({
            "g": pa.array(uk, pa.string()),
            "bucket": pa.array(np.full(len(uk), -1, np.int64)),
            "source": rep_src,
            "h": pa.array(np.zeros(len(uk), np.int64)),
            "n": pa.array(cnt.astype(np.int64)),
        })
        # hash rows: batch-distinct (source, h) for non-null texts
        valid = pc.is_valid(texts).to_numpy(zero_copy_only=False)
        if valid.any():
            h = hash_str(texts.to_numpy(zero_copy_only=False)[valid])
            # distinct (source-code, h) rows via a two-column unique
            both = np.stack([inv[valid].astype(np.int64),
                             h.astype(np.int64)], axis=1)
            both = np.unique(both, axis=0)
            si, hv = both[:, 0], both[:, 1]
            hash_tbl = pa.table({
                "g": pa.array(uk[si], pa.string()),
                "bucket": pa.array(
                    (hv.astype(np.uint64) % np.uint64(num_buckets))
                    .astype(np.int64)),
                "source": pc.take(rep_src, pa.array(si)),
                "h": pa.array(hv),
                "n": pa.array(np.zeros(len(si), np.int64)),
            })
            return pa.concat_tables([counts_tbl, hash_tbl])
        return counts_tbl

    def fold(g: pa.Table) -> pa.Table:
        b = int(g["bucket"][0].as_py())
        src = g["source"][0]
        if b == -1:
            return pa.table({
                "g": pa.array([str(g["g"][0].as_py())]),
                "source": pa.array([src.as_py()], pa.string()),
                "n_docs": pa.array(
                    [int(np.asarray(g["n"]).sum())], pa.int64()),
                "n_distinct": pa.array([0], pa.int64()),
            })
        nd = len(np.unique(np.asarray(g["h"])))
        return pa.table({
            "g": pa.array([str(g["g"][0].as_py())]),
            "source": pa.array([src.as_py()], pa.string()),
            "n_docs": pa.array([0], pa.int64()),
            "n_distinct": pa.array([nd], pa.int64()),
        })

    def final(g: pa.Table) -> pa.Table:
        return pa.table({
            "source": pa.array([g["source"][0].as_py()], pa.string()),
            "n_docs": pa.array([int(np.asarray(g["n_docs"]).sum())],
                               pa.int64()),
            "n_distinct": pa.array(
                [int(np.asarray(g["n_distinct"]).sum())], pa.int64()),
        })

    return (
        docs.select_columns(["source", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby(["g", "bucket"])
        .map_groups(fold, batch_format="pyarrow")
        .groupby("g")
        .map_groups(final, batch_format="pyarrow")
    )


def _levenshtein(a: str, b: str) -> int:
    """Exact character-level Levenshtein, row-vectorized: the sequential
    insertion dependency resolves via the min-plus prefix trick
    cur[j] = j + min_{k<=j}(pre[k] - k) (np.minimum.accumulate), so each
    DP row is O(len) numpy ops, no inner Python loop."""
    if a == b:
        return 0
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    if len(ca) == 0:
        return len(cb)
    if len(cb) == 0:
        return len(ca)
    n = len(cb)
    idx = np.arange(n + 1, dtype=np.int64)
    prev = idx.copy()
    cur = np.empty(n + 1, dtype=np.int64)
    for i, ch in enumerate(ca, 1):
        cur[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (cb != ch), out=cur[1:])
        x = cur - idx
        np.minimum.accumulate(x, out=x)
        np.add(x, idx, out=cur)
        prev, cur = cur, prev
    return int(prev[-1])


def edit_distance_pairs(docs, pairs, *, verify_buckets: int = 256,
                        batch_size: int | None = None):
    """Exact edit-distance verification of candidate near-dup pairs — the
    final fuzzy-dedup gate (character-level Levenshtein, the metric SQL's
    ``levenshtein()`` computes): every candidate pair gets its two texts
    co-located and scored WITHOUT any driver state or text broadcast.

    The round-2 distributed pair-verify shape specialized to whole-text
    payloads: each pair emits two half-rows keyed by member doc; doc
    (id, text) rows meet the half-rows in one doc-bucket groupby, each
    half-row picks up its text by sorted-id searchsorted and routes to the
    PAIR's verify bucket; a second groupby scores each pair with the
    row-vectorized DP. Pairs referencing a missing or NULL-text doc drop
    (SQL inner-join + non-null semantics). DP cost is O(|a|·|b|) per pair
    in O(len) numpy row ops — pairs are candidate-bounded, never
    corpus-sized.

    Returns Dataset[doc_a, doc_b, edit_dist]."""

    def doc_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        return pa.table({
            "dbucket": pa.array(_intmix(ids, verify_buckets).astype(np.int32)),
            "doc_id": pa.array(ids),
            "text": t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"],
            "pkey": pa.array(np.full(len(ids), -1, np.int64)),
            "role": pa.array(np.full(len(ids), -1, np.int8)),
        })

    def pair_halves(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        pkey = a * np.int64(1 << 32) + b
        doc = np.concatenate([a, b])
        return pa.table({
            "dbucket": pa.array(_intmix(doc, verify_buckets).astype(np.int32)),
            "doc_id": pa.array(doc),
            "text": pa.nulls(len(doc), pa.string()),
            "pkey": pa.array(np.tile(pkey, 2)),
            "role": pa.array(np.concatenate(
                [np.zeros(len(a), np.int8), np.ones(len(b), np.int8)])),
        })

    def attach(g: pa.Table) -> pa.Table:
        role = np.asarray(g["role"])
        is_doc = role < 0
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        d_ids = ids[is_doc]
        order = np.argsort(d_ids)
        d_ids = d_ids[order]
        texts = g["text"].combine_chunks() if isinstance(
            g["text"], pa.ChunkedArray) else g["text"]
        d_texts = texts.filter(pa.array(is_doc)).take(pa.array(order))
        hv = ~is_doc
        want = ids[hv]
        if len(d_ids) == 0 or not hv.any():
            return pa.table({"vbucket": pa.array([], pa.int32()),
                             "pkey": pa.array([], pa.int64()),
                             "role": pa.array([], pa.int8()),
                             "text": pa.array([], pa.string())})
        pos = np.searchsorted(d_ids, want)
        pos_c = np.minimum(pos, len(d_ids) - 1)
        found = d_ids[pos_c] == want
        pk = np.asarray(g["pkey"]).astype(np.int64)[hv][found]
        return pa.table({
            "vbucket": pa.array(_intmix(pk, verify_buckets).astype(np.int32)),
            "pkey": pa.array(pk),
            "role": pa.array(role[hv][found]),
            "text": d_texts.take(pa.array(pos_c[found])),
        })

    def score(g: pa.Table) -> pa.Table:
        pk = np.asarray(g["pkey"]).astype(np.int64)
        role = np.asarray(g["role"])
        texts = g["text"].to_pylist()
        side = {}
        for p, r, tx in zip(pk, role, texts):
            side.setdefault(int(p), [None, None])[int(r)] = tx
        out_a, out_b, out_d = [], [], []
        for p in sorted(side):
            ta, tb = side[p]
            if ta is None or tb is None:
                continue  # half missing (doc absent/null text)
            out_a.append(p >> 32)
            out_b.append(p & ((1 << 32) - 1))
            out_d.append(_levenshtein(ta, tb))
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "edit_dist": pa.array(out_d, pa.int64())})

    routed_in = docs.select_columns(["doc_id", "text"]).map_batches(
        doc_rows, batch_format="pyarrow", batch_size=batch_size
    ).union(pairs.map_batches(pair_halves, batch_format="pyarrow"))
    return (
        routed_in.groupby("dbucket")
        .map_groups(attach, batch_format="pyarrow")
        .groupby("vbucket")
        .map_groups(score, batch_format="pyarrow")
    )


def delta_dedup(corpus, delta, *, num_buckets: int = 256,
                batch_size: int | None = None):
    """Incremental exact dedup — the operational shape at 100 TB: dedup a
    NEW ingest batch against the standing corpus without re-deduping the
    corpus itself. A delta doc is ADMITTED iff its text appears nowhere in
    the corpus and it is the first (lowest doc_id) among delta docs with
    that text.

    One exchange of (text-hash bucket, hash, text, doc_id, role): corpus
    rows pre-dedup per batch (distinct texts only — a boilerplate-heavy
    corpus batch compacts before the shuffle) and ride doc_id = -1; both
    roles meet in a hash-bucket groupby where membership + first-per-text
    resolve string-verified and fully vectorized. NULL texts drop on both
    sides (SQL non-null join semantics). Returns Dataset[doc_id] of
    admitted delta rows."""

    def side(role: int, pre_dedup: bool):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["text"]))
            keys = t["text"]
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            if pre_dedup:
                da = pc.dictionary_encode(keys)
                keys = da.dictionary
                doc = np.full(len(keys), -1, np.int64)
            else:
                doc = np.asarray(t["doc_id"]).astype(np.int64)
            h = hash_str(keys.to_numpy(zero_copy_only=False))
            return pa.table({
                "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                "k": keys.cast(pa.string()),
                "doc_id": pa.array(doc),
                "role": pa.array(np.full(len(keys), role, np.int8)),
            })

        return f

    def admit(g: pa.Table) -> pa.Table:
        ks = g["k"]
        if isinstance(ks, pa.ChunkedArray):
            ks = ks.combine_chunks()
        da = pc.dictionary_encode(ks)
        code = np.asarray(da.indices).astype(np.int64)
        role = np.asarray(g["role"])
        doc = np.asarray(g["doc_id"]).astype(np.int64)
        in_corpus = np.zeros(len(da.dictionary), dtype=bool)
        in_corpus[code[role == 0]] = True
        d_mask = role == 1
        d_code, d_doc = code[d_mask], doc[d_mask]
        fresh = ~in_corpus[d_code]
        d_code, d_doc = d_code[fresh], d_doc[fresh]
        order = np.lexsort((d_doc, d_code))
        c_s = d_code[order]
        first = np.ones(len(c_s), dtype=bool)
        first[1:] = c_s[1:] != c_s[:-1]
        return pa.table({"doc_id": pa.array(d_doc[order][first])})

    routed = corpus.map_batches(
        side(0, True), batch_format="pyarrow", batch_size=batch_size
    ).union(delta.map_batches(
        side(1, False), batch_format="pyarrow", batch_size=batch_size))
    return routed.groupby("bucket").map_groups(admit, batch_format="pyarrow")


def triangle_counts(docs, *, n: int = 2, threshold: float = 0.8,
                    deg_buckets: int = 64, pair_buckets: int = 256,
                    batch_size: int | None = None):
    """Per-node triangle counts over the near-dup pair graph — the cluster
    DENSITY dial the degree histogram can't see: a template farm whose
    members all pair with each other is a clique (many triangles per node),
    a star around one canonical doc has none, and that difference decides
    whether keep-best resolution collapses a cluster to one survivor or
    leaves chains behind.

    The classic distributed algorithm, degree-ordered wedge checking:
    every wedge is emitted ONLY from its lowest-(degree, id) corner, so a
    hub of degree d in the undirected graph has out-degree O(sqrt(m)) after
    orientation and the wedge volume is bounded by sum(out_deg^2) = O(m^1.5)
    instead of the hub-quadratic naive bound. Five bucketed exchanges, all
    candidate-bounded: half-edges -> per-node degrees ride back on the
    half rows; pair reassembly orients each edge; per-src groups expand
    out-neighbor runs with the vectorized `_expand_run_pairs`; wedges meet
    the edge set (role-tagged) in a pair-bucket verify; matched triangles
    route one row per corner to a final count groupby.

    Pair keys pack as a<<32|b (the repo-wide pair-exchange convention:
    doc ids < 2^32). Returns Dataset[doc_id, n_triangles], nodes with at
    least one triangle."""
    return triangle_counts_from_pairs(
        ngram_jaccard_pairs(docs, n=n, threshold=threshold),
        deg_buckets=deg_buckets, pair_buckets=pair_buckets,
        batch_size=batch_size)


def triangle_counts_from_pairs(pairs, *, deg_buckets: int = 64,
                               pair_buckets: int = 256,
                               batch_size: int | None = None):
    """Core of `triangle_counts` over an explicit canonical edge Dataset
    [doc_a < doc_b], deduplicated — see that docstring for the plan."""

    pairs = pairs.materialize()  # consumed twice: halves + edge-set rows

    def halves(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        pk = a * np.int64(1 << 32) + b
        node = np.concatenate([a, b])
        return pa.table({
            "nbucket": pa.array(_intmix(node, deg_buckets).astype(np.int32)),
            "node": pa.array(node),
            "pk": pa.array(np.tile(pk, 2)),
        })

    def attach_deg(g: pa.Table) -> pa.Table:
        node = np.asarray(g["node"]).astype(np.int64)
        pk = np.asarray(g["pk"]).astype(np.int64)
        ud, inv, cnt = np.unique(node, return_inverse=True,
                                 return_counts=True)
        return pa.table({
            "pbucket": pa.array(_intmix(pk, pair_buckets).astype(np.int32)),
            "pk": pa.array(pk),
            "node": pa.array(node),
            "deg": pa.array(cnt[inv].astype(np.int64)),
        })

    def orient(g: pa.Table) -> pa.Table:
        pk = np.asarray(g["pk"]).astype(np.int64)
        node = np.asarray(g["node"]).astype(np.int64)
        deg = np.asarray(g["deg"]).astype(np.int64)
        # precondition: DISTINCT canonical edges — duplicates would inflate
        # degrees and misalign the 2-rows-per-pair reassembly below, so a
        # duplicated input must fail loudly, not count wrong
        _, pk_counts = np.unique(pk, return_counts=True)
        if len(pk) and (pk_counts != 2).any():
            raise ValueError(
                "triangle_counts_from_pairs: input edges must be distinct "
                "canonical (doc_a < doc_b) pairs — found duplicate edges")
        is_a = node == (pk >> np.int64(32))
        order = np.lexsort((~is_a, pk))  # per pk: a-side row, then b-side
        pk_s, node_s, deg_s = pk[order], node[order], deg[order]
        a_n, b_n = node_s[0::2], node_s[1::2]
        a_d, b_d = deg_s[0::2], deg_s[1::2]
        src_is_a = (a_d < b_d) | ((a_d == b_d) & (a_n < b_n))
        src = np.where(src_is_a, a_n, b_n)
        dst = np.where(src_is_a, b_n, a_n)
        return pa.table({
            "sbucket": pa.array(_intmix(src, deg_buckets).astype(np.int32)),
            "src": pa.array(src),
            "dst": pa.array(dst),
        })

    def wedges(g: pa.Table) -> pa.Table:
        src = np.asarray(g["src"]).astype(np.int64)
        dst = np.asarray(g["dst"]).astype(np.int64)
        order = np.lexsort((dst, src))
        src_s, dst_s = src[order], dst[order]
        _, run_id = np.unique(src_s, return_inverse=True)
        pos_a, pos_b = _expand_run_pairs(run_id)
        v, w = dst_s[pos_a], dst_s[pos_b]
        lo, hi = np.minimum(v, w), np.maximum(v, w)
        wk = lo * np.int64(1 << 32) + hi
        return pa.table({
            "ebucket": pa.array(_intmix(wk, pair_buckets).astype(np.int32)),
            "wk": pa.array(wk),
            "center": pa.array(src_s[pos_a]),
            "role": pa.array(np.ones(len(wk), np.int8)),
        })

    def edge_rows(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        pk = a * np.int64(1 << 32) + b
        return pa.table({
            "ebucket": pa.array(_intmix(pk, pair_buckets).astype(np.int32)),
            "wk": pa.array(pk),
            "center": pa.array(np.full(len(pk), -1, np.int64)),
            "role": pa.array(np.zeros(len(pk), np.int8)),
        })

    def match(g: pa.Table) -> pa.Table:
        role = np.asarray(g["role"])
        wk = np.asarray(g["wk"]).astype(np.int64)
        is_w = role == 1
        hit = np.isin(wk[is_w], wk[~is_w])
        wk_t = wk[is_w][hit]
        corners = np.concatenate([
            np.asarray(g["center"]).astype(np.int64)[is_w][hit],
            wk_t >> np.int64(32),
            wk_t & np.int64((1 << 32) - 1),
        ])
        return pa.table({
            "cbucket": pa.array(
                _intmix(corners, deg_buckets).astype(np.int32)),
            "doc_id": pa.array(corners),
        })

    def count(g: pa.Table) -> pa.Table:
        d = np.asarray(g["doc_id"]).astype(np.int64)
        ud, cnt = np.unique(d, return_counts=True)
        return pa.table({"doc_id": pa.array(ud),
                         "n_triangles": pa.array(cnt.astype(np.int64))})

    oriented = (
        pairs.map_batches(halves, batch_format="pyarrow",
                          batch_size=batch_size)
        .groupby("nbucket").map_groups(attach_deg, batch_format="pyarrow")
        .groupby("pbucket").map_groups(orient, batch_format="pyarrow")
    )
    wedge_rows = (
        oriented.groupby("sbucket")
        .map_groups(wedges, batch_format="pyarrow")
    )
    verify_in = wedge_rows.union(
        pairs.map_batches(edge_rows, batch_format="pyarrow"))
    return (
        verify_in.groupby("ebucket").map_groups(match, batch_format="pyarrow")
        .groupby("cbucket").map_groups(count, batch_format="pyarrow")
        .select_columns(["doc_id", "n_triangles"])
    )


# rolling-hash weights for content-defined chunking: base 31, window 8 —
# max H = 0x10FFFF * sum(31^j) < 2^56, so the hash is EXACT in int64 on
# both the numpy and the DuckDB (HUGEINT-free) side, no modulus needed
CDC_WINDOW = 8
CDC_POW = np.array([31 ** j for j in range(CDC_WINDOW)], dtype=np.int64)
CDC_MASK = 64  # boundary when H % 64 == 0 -> ~64-char average chunks


def _cdc_chunks(t: pa.Table, column: str):
    """Per-batch content-defined chunking. Returns (doc_ids_per_chunk,
    chunk StringArray) — chunks tile each document exactly; cut after
    codepoint position i (0-based, full window inside the doc) iff the
    base-31 window-8 rolling hash of positions [i-7..i] is divisible by
    CDC_MASK. Docs with NULL or empty text yield no chunks.

    Pure-ASCII batches (the overwhelming hot case) run zero-copy on the
    Arrow string buffers — the rolling hash is 8 shifted multiply-adds on
    the flat byte array and the chunk StringArray is rebuilt from a new
    offsets vector over the SAME data buffer, no per-chunk copies. Batches
    with any non-ASCII doc fall back to a per-doc codepoint decode
    (identical semantics, utf-32 units)."""
    texts = t[column]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    keep = pc.and_(pc.is_valid(texts),
                   pc.greater(pc.utf8_length(texts), 0))
    sa = texts.filter(keep)
    doc_ids = np.asarray(t["doc_id"])[
        keep.to_numpy(zero_copy_only=False)].astype(np.int64)
    if len(sa) == 0:
        return np.empty(0, np.int64), pa.array([], pa.string())
    if pc.all(pc.equal(pc.utf8_length(sa), pc.binary_length(sa))).as_py():
        o = sa.offset
        offs = np.frombuffer(sa.buffers()[1], np.int32)[o:o + len(sa) + 1]
        data = np.frombuffer(sa.buffers()[2], np.uint8)
        base = int(offs[0])
        starts = (offs[:-1].astype(np.int64) - base)
        ends = (offs[1:].astype(np.int64) - base)
        flat = data[base:int(offs[-1])].astype(np.int64)
        total = len(flat)
        h = np.zeros(total, np.int64)
        for j in range(min(CDC_WINDOW, total)):
            h[j:] += flat[:total - j] * CDC_POW[j]
        pos_start = np.repeat(starts, ends - starts)
        pos_end = np.repeat(ends, ends - starts)
        p = np.arange(total, dtype=np.int64)
        cut = ((h % CDC_MASK == 0)
               & (p - pos_start >= CDC_WINDOW - 1)
               & (p < pos_end - 1))
        bounds = np.unique(np.concatenate(
            [starts, np.flatnonzero(cut) + 1, [total]]))
        off32 = (bounds + base).astype(np.int32)
        chunks = pa.StringArray.from_buffers(
            len(off32) - 1, pa.py_buffer(off32.tobytes()),
            sa.buffers()[2])
        chunk_doc = doc_ids[
            np.searchsorted(starts, bounds[:-1], side="right") - 1]
        return chunk_doc, chunks
    # non-ASCII fallback: per-doc codepoint decode (cold path)
    out_doc, out_chunk = [], []
    for did, s in zip(doc_ids, sa.to_pylist()):
        cp = np.frombuffer(s.encode("utf-32-le"), np.uint32).astype(np.int64)
        n = len(cp)
        h = np.zeros(n, np.int64)
        for j in range(min(CDC_WINDOW, n)):
            h[j:] += cp[:n - j] * CDC_POW[j]
        p = np.arange(n)
        cuts = np.flatnonzero((h % CDC_MASK == 0)
                              & (p >= CDC_WINDOW - 1) & (p < n - 1)) + 1
        b = [0, *cuts.tolist(), n]
        for lo, hi in zip(b[:-1], b[1:]):
            out_doc.append(did)
            out_chunk.append(s[lo:hi])
    return np.array(out_doc, np.int64), pa.array(out_chunk, pa.string())


def cdc_chunk_dedup(docs, *, min_docs: int = 2, column: str = "text",
                    num_buckets: int = 64, doc_buckets: int = 64,
                    batch_size: int | None = None):
    """Content-defined-chunking dedup audit (the LBFS/rsync-family chunking
    storage dedup runs, applied to corpus text): chunk boundaries come from
    a rolling hash of the CONTENT, so a shared passage still chunks
    identically after an insertion shifts its position — the duplication
    fixed-size chunking (`chunk_dedup`) structurally misses.

    One pre-aggregated exchange, no broadcast and no second corpus pass:
    per batch, chunks dictionary-encode and collapse to (doc, chunk,
    n_occ) rows keyed by chunk-hash bucket; each bucket group marks chunks
    seen in >= ``min_docs`` DISTINCT docs (grouped by the actual string —
    collisions cannot merge chunks) and emits per-doc partial sums; a final
    doc-bucket groupby adds the <= num_buckets partials per doc.

    Returns Dataset[doc_id, n_chunks, n_dup_chunks] — one row per doc with
    non-empty text."""
    from ..functions.hashing import hash_str

    def partial(t: pa.Table) -> pa.Table:
        chunk_doc, chunks = _cdc_chunks(t, column)
        if len(chunks) == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "chunk": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "n_occ": pa.array([], pa.int64())})
        da = pc.dictionary_encode(chunks)
        code = np.asarray(da.indices).astype(np.int64)
        ndict = len(da.dictionary)
        ud, inv = np.unique(chunk_doc, return_inverse=True)
        pair, n_occ = np.unique(inv * ndict + code, return_counts=True)
        d_str = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        cb = (hash_str(d_str) % np.uint64(num_buckets)).astype(np.int32)
        codes = (pair % ndict).astype(np.int64)
        return pa.table({
            "bucket": pa.array(cb[codes]),
            "chunk": da.dictionary.take(pa.array(codes)),
            "doc_id": pa.array(ud[pair // ndict]),
            "n_occ": pa.array(n_occ.astype(np.int64)),
        })

    def mark(g: pa.Table) -> pa.Table:
        ch = g["chunk"]
        if isinstance(ch, pa.ChunkedArray):
            ch = ch.combine_chunks()
        da = pc.dictionary_encode(ch)
        code = np.asarray(da.indices).astype(np.int64)
        doc = np.asarray(g["doc_id"]).astype(np.int64)
        n_occ = np.asarray(g["n_occ"]).astype(np.int64)
        # distinct docs per chunk: (code, doc) rows are already distinct
        nd = np.bincount(code, minlength=len(da.dictionary))
        dup = nd >= min_docs
        ud, inv = np.unique(doc, return_inverse=True)
        tot = np.zeros(len(ud), np.int64)
        dup_tot = np.zeros(len(ud), np.int64)
        np.add.at(tot, inv, n_occ)
        np.add.at(dup_tot, inv, np.where(dup[code], n_occ, 0))
        return pa.table({
            "dbucket": pa.array(_intmix(ud, doc_buckets).astype(np.int32)),
            "doc_id": pa.array(ud),
            "n_chunks": pa.array(tot),
            "n_dup_chunks": pa.array(dup_tot),
        })

    def final(g: pa.Table) -> pa.Table:
        doc = np.asarray(g["doc_id"]).astype(np.int64)
        ud, inv = np.unique(doc, return_inverse=True)
        a = np.zeros(len(ud), np.int64)
        b = np.zeros(len(ud), np.int64)
        np.add.at(a, inv, np.asarray(g["n_chunks"]).astype(np.int64))
        np.add.at(b, inv, np.asarray(g["n_dup_chunks"]).astype(np.int64))
        return pa.table({"doc_id": pa.array(ud),
                         "n_chunks": pa.array(a),
                         "n_dup_chunks": pa.array(b)})

    return (
        docs.select_columns(["doc_id", column])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("bucket").map_groups(mark, batch_format="pyarrow")
        .groupby("dbucket").map_groups(final, batch_format="pyarrow")
        .select_columns(["doc_id", "n_chunks", "n_dup_chunks"])
    )


def novel_gram_counts(docs, *, n: int = 2, column: str = "text",
                      num_buckets: int = 256,
                      batch_size: int | None = None):
    """Per-document n-gram novelty: how many of a doc's DISTINCT n-grams
    appear in NO lower-doc_id document (first-occurrence attribution) —
    the self-repetition / curriculum signal that separates template spam
    (novelty collapses to ~0) from genuinely new text, per doc rather than
    per source (``textops.distinct_ngrams`` is the per-source roll-up).

    Plan: per-batch per-(doc, gram)-distinct rows (``_join_pair_rows`` —
    the exchange carries distinct pairs, never occurrences); a gram lives
    wholly in its hash bucket, so one gram-bucket groupby resolves each
    gram's min doc_id and pre-aggregates per-doc (n_grams, n_novel)
    partials; a doc-bucket groupby sums them. Gram STRINGS ride the
    exchange (hash buckets only route), so hash collisions cannot merge
    distinct grams.

    Returns Dataset[doc_id, n_grams, n_novel]; docs with fewer than ``n``
    words have no grams and are absent, like the SQL join."""

    def partial(t: pa.Table) -> pa.Table:
        parent, grams, n_pos, n_docs = _gram_strings(t, n, column)
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        rows = _join_pair_rows(parent, np.zeros(len(parent), np.int64),
                               grams, ids, num_buckets=num_buckets,
                               doc_shard=_JOIN_DOC_SHARD, with_starts=False)
        return rows.drop_columns(["dshard", "tf"])

    def gram_fold(g: pa.Table) -> pa.Table:
        u = g["unit"]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        da = pc.dictionary_encode(u)
        gi = np.asarray(da.indices, dtype=np.int64)
        doc = np.asarray(g["doc_id"]).astype(np.int64)
        mind = np.full(len(da.dictionary), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mind, gi, doc)
        novel = doc == mind[gi]
        ud, inv = np.unique(doc, return_inverse=True)
        ng = np.bincount(inv, minlength=len(ud)).astype(np.int64)
        nn = np.zeros(len(ud), np.int64)
        np.add.at(nn, inv[novel], 1)
        return pa.table({
            "bucket": pa.array(_intmix(ud, num_buckets).astype(np.int32)),
            "doc_id": pa.array(ud),
            "n_grams": pa.array(ng),
            "n_novel": pa.array(nn),
        })

    def doc_fold(g: pa.Table) -> pa.Table:
        doc = np.asarray(g["doc_id"]).astype(np.int64)
        ud, inv = np.unique(doc, return_inverse=True)
        ng = np.zeros(len(ud), np.int64)
        nn = np.zeros(len(ud), np.int64)
        np.add.at(ng, inv, np.asarray(g["n_grams"]).astype(np.int64))
        np.add.at(nn, inv, np.asarray(g["n_novel"]).astype(np.int64))
        return pa.table({"doc_id": pa.array(ud), "n_grams": pa.array(ng),
                         "n_novel": pa.array(nn)})

    return (docs.map_batches(partial, batch_format="pyarrow",
                             batch_size=batch_size)
            .groupby("bucket").map_groups(gram_fold, batch_format="pyarrow")
            .groupby("bucket").map_groups(doc_fold, batch_format="pyarrow"))


# ------------------------------- longest repeated substring (suffix classes)
_LRS_POS_CAP = 1 << 20  # max words per doc in the packed global position



def _lrs_class_rows(docs, column: str, num_buckets: int,
                    batch_size: int | None):
    """Stage 0 of the prefix-doubling family: width-1 suffix-equality
    classes (class id = min global packed position per word) in one
    word-bucket exchange. Returns a materialized
    Dataset[doc, pos, cls, dlen] already SINGLETON-PRUNED: a position
    whose word occurs once in the corpus can never participate in a
    duplicated window of ANY length (the width-w window is a prefix of
    every longer one), so it is dropped here and every later round's
    exchange shrinks with it — an EXACT optimization (round-5; the
    hypothesis brute-force suites pin exactness). Partner lookups in
    later rounds treat pruned positions as unique-sentinel classes, which
    is precisely what their singleton classes would have produced.
    ``dlen`` (doc word count) rides along because pruning breaks the
    index-arithmetic the window-fit checks used to rely on."""
    from .textops import _word_lists

    def word_rows(t: pa.Table) -> pa.Table:
        texts = t[column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words, counts, _ = _word_lists(texts)
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        if len(counts) and int(counts.max()) >= _LRS_POS_CAP:
            raise ValueError("prefix doubling: doc exceeds "
                             f"{_LRS_POS_CAP} words")
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 42)):
            raise ValueError("prefix doubling: doc_id out of "
                             "packed-position range")
        parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        starts = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        widx = np.arange(len(parent), dtype=np.int64) - starts[parent]
        pos = ids[parent] * _LRS_POS_CAP + widx
        # hash the per-batch DICTIONARY, gather per occurrence (the winnow
        # lesson: never run string kernels on the occurrence stream)
        da = pc.dictionary_encode(words)
        du = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        db = (hash_str(du) % np.uint64(num_buckets)).astype(np.int32)
        gi = np.asarray(da.indices, dtype=np.int64)
        return pa.table({
            "bucket": pa.array(db[gi]),
            "word": words,
            "pos": pa.array(pos),
            "dlen": pa.array(counts[parent].astype(np.int32)),
        })

    def word_fold(g: pa.Table) -> pa.Table:
        w = g["word"]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        da = pc.dictionary_encode(w)
        gi = np.asarray(da.indices, dtype=np.int64)
        pos = np.asarray(g["pos"]).astype(np.int64)
        mn = np.full(len(da.dictionary), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, gi, pos)
        sizes = np.bincount(gi, minlength=len(da.dictionary))
        keep = sizes[gi] >= 2  # singleton prune (exact, see docstring)
        return pa.table({
            "doc": pa.array(pos[keep] // _LRS_POS_CAP),
            "pos": pa.array(pos[keep]),
            "cls": pa.array(mn[gi][keep]),
            "dlen": pa.array(np.asarray(g["dlen"]).astype(np.int32)[keep]),
        })

    return (docs.map_batches(word_rows, batch_format="pyarrow",
                             batch_size=batch_size)
            .groupby("bucket")
            .map_groups(word_fold, batch_format="pyarrow")).materialize()


def _lrs_doc_sorted(g: pa.Table):
    pos = np.asarray(g["pos"]).astype(np.int64)
    cls = np.asarray(g["cls"]).astype(np.int64)
    dlen = np.asarray(g["dlen"]).astype(np.int64)
    order = np.argsort(pos)
    return pos[order], cls[order], dlen[order]


def _lrs_partner(pos: np.ndarray, cls: np.ndarray, shift: int) -> np.ndarray:
    """Class of position ``pos + shift`` within one doc-sorted group, with
    the unique sentinel (-pos-1) where the partner is absent — absent
    means either window overrun OR a singleton-pruned position; both
    correctly yield a never-merging key component."""
    n = len(pos)
    tgt = pos + shift
    j = np.searchsorted(pos, tgt)
    jc = np.minimum(j, n - 1) if n else j
    hit = (j < n) & (pos[jc] == tgt) if n else np.zeros(0, bool)
    return np.where(hit, cls[jc] if n else 0, -pos - 1)


def _lrs_doubled(rows, w: int, num_buckets: int):
    """One prefix-doubling round: width-w classes -> width-2w classes.
    The (class(i), class(i+w)) pair is intra-doc, so the shift is a local
    gather in a per-doc group; class resolution (min position per key) and
    the one-row-per-class dup indicator ride one key-bucket groupby; the
    stop check is a cheap ``sum`` scan of the materialized round (the
    dedup_clusters convergence pattern). Returns (rows_2w, n_dup_classes).
    Overrun positions (2w-window past the doc end) get a unique sentinel
    key and are therefore PRUNED with every other singleton key-group —
    rows_2w holds only positions inside duplicated full-or-overrunless
    2w-windows (see ``_lrs_class_rows`` for the exactness argument)."""

    def pair_keys(g: pa.Table) -> pa.Table:
        pos, cls, dlen = _lrs_doc_sorted(g)
        k1 = cls
        k2 = _lrs_partner(pos, cls, w)
        full = (pos % _LRS_POS_CAP) + 2 * w <= dlen
        kb = _intmix(k1 * np.int64(0x9E3779B1) + k2, num_buckets)
        return pa.table({
            "kbucket": pa.array(kb.astype(np.int32)),
            "k1": pa.array(k1), "k2": pa.array(k2),
            "pos": pa.array(pos),
            "dlen": pa.array(dlen.astype(np.int32)),
            "full": pa.array(full.astype(np.int8)),
        })

    def cls_fold(g: pa.Table) -> pa.Table:
        k1 = np.asarray(g["k1"]).astype(np.int64)
        k2 = np.asarray(g["k2"]).astype(np.int64)
        pos = np.asarray(g["pos"]).astype(np.int64)
        dlen = np.asarray(g["dlen"]).astype(np.int32)
        full = np.asarray(g["full"]).astype(np.int64)
        order = np.lexsort((pos, k2, k1))
        k1, k2, pos, full = k1[order], k2[order], pos[order], full[order]
        dlen = dlen[order]
        first = np.ones(len(k1), dtype=bool)
        first[1:] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
        gid = np.cumsum(first) - 1
        ngroups = int(gid[-1]) + 1 if len(gid) else 0
        cls = pos[np.flatnonzero(first)]  # min pos per key (pos-sorted)
        nfull = np.zeros(ngroups, np.int64)
        np.add.at(nfull, gid, full)
        dup = np.zeros(len(k1), np.int8)
        dup[np.flatnonzero(first)] = (nfull >= 2).astype(np.int8)
        # singleton prune: a key-group of size 1 is a unique 2w-window —
        # its position can never join a longer duplicate (prefix argument,
        # _lrs_class_rows docstring). Dropping it here shrinks every later
        # round; the dup indicator rows (nfull>=2 => size>=2) all survive.
        sizes = np.bincount(gid, minlength=ngroups)
        keep = sizes[gid] >= 2
        return pa.table({
            "doc": pa.array(pos[keep] // _LRS_POS_CAP),
            "pos": pa.array(pos[keep]),
            "cls": pa.array(cls[gid][keep]),
            "dlen": pa.array(dlen[keep]),
            "dup": pa.array(dup[keep]),
        })

    out = (rows.groupby("doc")
           .map_groups(pair_keys, batch_format="pyarrow")
           .groupby("kbucket")
           .map_groups(cls_fold, batch_format="pyarrow")).materialize()
    ndup = out.sum("dup") or 0
    return out, int(ndup)


def _lrs_probe(rows, w0: int, k: int, num_buckets: int) -> tuple[int, int]:
    """Duplicate count at exact window length k over width-w0 class rows
    (w0 <= k < 2*w0, the sparse-table two-power trick): key(i) =
    (class(i), class(i + k - w0)) for every i with i + k <= doc length.
    Returns (n_dup_classes, n_dup_positions)."""
    from ..functions.collect import collect_table

    def probe_keys(g: pa.Table) -> pa.Table:
        pos, cls, dlen = _lrs_doc_sorted(g)
        fit = (pos % _LRS_POS_CAP) + k <= dlen  # k-window inside the doc
        k1 = cls[fit]
        k2 = _lrs_partner(pos, cls, k - w0)[fit]
        key = np.stack([k1, k2])
        uk, cnt = np.unique(key, axis=1, return_counts=True)
        kb = _intmix(uk[0] * np.int64(0x9E3779B1) + uk[1], num_buckets)
        return pa.table({
            "kbucket": pa.array(kb.astype(np.int32)),
            "k1": pa.array(uk[0]), "k2": pa.array(uk[1]),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    def probe_fold(g: pa.Table) -> pa.Table:
        k1 = np.asarray(g["k1"]).astype(np.int64)
        k2 = np.asarray(g["k2"]).astype(np.int64)
        cnt = np.asarray(g["cnt"]).astype(np.int64)
        order = np.lexsort((k2, k1))
        k1, k2, cnt = k1[order], k2[order], cnt[order]
        first = np.ones(len(k1), dtype=bool)
        first[1:] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
        gid = np.cumsum(first) - 1
        tot = np.zeros(int(gid[-1]) + 1 if len(gid) else 0, np.int64)
        np.add.at(tot, gid, cnt)
        dup = tot >= 2
        return pa.table({
            "n_classes": pa.array([int(dup.sum())], pa.int64()),
            "n_pos": pa.array([int(tot[dup].sum())], pa.int64()),
        })

    parts = collect_table(
        rows.groupby("doc")
        .map_groups(probe_keys, batch_format="pyarrow")
        .groupby("kbucket")
        .map_groups(probe_fold, batch_format="pyarrow"),
        empty_schema=pa.schema([("n_classes", pa.int64()),
                                ("n_pos", pa.int64())]),
    )
    if not parts.num_rows:
        return 0, 0
    return (int(np.asarray(parts["n_classes"]).sum()),
            int(np.asarray(parts["n_pos"]).sum()))


def _lrs_sampled_docs(docs, sample_docs: int):
    """Deterministic 1-in-``sample_docs`` document sample for the
    ExactSubstr-family operational lane (hash of doc_id, content-stable
    across runs and partitionings)."""

    def keep(t: pa.Table) -> pa.Table:
        h = hash_str(np.asarray(t["doc_id"]).astype("U"))
        return t.filter(pa.array(h % np.uint64(sample_docs) == 0))

    return docs.map_batches(keep, batch_format="pyarrow")


def longest_repeated_substring(docs, *, column: str = "text",
                               num_buckets: int = 256,
                               batch_size: int | None = None,
                               sample_docs: int | None = None):
    """Corpus-wide longest repeated WORD-substring via distributed
    prefix doubling — the core subroutine of suffix-array exact-substring
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): the length of the longest word sequence occurring at
    >= 2 positions anywhere in the corpus (across or within docs), plus
    how many positions carry a duplicated substring of that length.

    Plan (equality-class prefix doubling — classes, not lexicographic
    ranks, since only duplicate DETECTION is needed, never suffix order):
    ``_lrs_class_rows`` width-1 classes; ``_lrs_doubled`` rounds until the
    first width with no duplicate — O(log LRS) rounds — then a driver
    binary search pins the exact length, each probe one ``_lrs_probe``
    counting exchange over the last dup-bearing class table.

    Returns a one-row pyarrow Table (lrs_words, n_occurrences):
    n_occurrences = positions whose lrs-word window is shared with at
    least one other position; (0, 0) when no word repeats.

    **Sampled operational lane** (``sample_docs = s``, VERDICT r4 #6): the
    exact lane's per-round exchanges are corpus-position-sized — the
    algorithm's real cost, prohibitive as a routine 100 TB health check.
    With ``s`` set, the sweep runs over a deterministic 1-in-s document
    sample (hash of doc_id): every round shrinks ~s-fold. Semantics and
    error bound: within-doc repeats in sampled docs are found EXACTLY; a
    cross-doc substring occurring in m documents is detected iff >= 2 of
    them are sampled — probability >= 1 - (1 + m/s) * exp(-m/s), i.e.
    ~95% at m = 5s and ->1 exponentially in m/s — so the high-multiplicity
    template boilerplate this operational check exists to find is caught
    with near-certainty, while a one-pair duplicate can be missed (use the
    exact lane, or pair-level dedup operators, when that matters). The
    reported lrs is a LOWER bound on the corpus value and n_occurrences
    counts positions among sampled docs only (scale by ~s for a corpus
    estimate). Default (None) = exact lane, byte-identical results
    (``sample_docs=1`` is tested equivalent)."""
    if sample_docs is not None and sample_docs > 1:
        docs = _lrs_sampled_docs(docs, sample_docs)
    rows = _lrs_class_rows(docs, column, num_buckets, batch_size)

    def _out(lrs: int, nocc: int) -> pa.Table:
        return pa.table({"lrs_words": pa.array([lrs], pa.int64()),
                         "n_occurrences": pa.array([nocc], pa.int64())})

    ncls, _ = _lrs_probe(rows, 1, 1, num_buckets)
    if ncls == 0:
        return _out(0, 0)
    cur, w = rows, 1
    while True:
        nxt, ndup = _lrs_doubled(cur, w, num_buckets)
        if ndup == 0:
            break
        cur, w = nxt, 2 * w
    lo, hi = w, 2 * w  # duplicate exists at lo, none at hi
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        ncls, _ = _lrs_probe(cur, w, mid, num_buckets)
        if ncls > 0:
            lo = mid
        else:
            hi = mid
    _, nocc = _lrs_probe(cur, w, lo, num_buckets)
    return _out(lo, nocc)


def duplication_profile(docs, ks: tuple[int, ...] = (1, 2, 4, 8, 16, 32),
                        *, column: str = "text", num_buckets: int = 256,
                        batch_size: int | None = None,
                        sample_docs: int | None = None):
    """Duplication spectrum: for each window length k, how many positions
    sit inside a word k-window that occurs >= 2 times anywhere in the
    corpus, and how many distinct duplicated k-windows there are — the
    "how much boilerplate at which granularity" curve that sizes
    ExactSubstr-style dedup before running it (a corpus whose dup mass
    persists at k=32 has template spans worth stripping; one that decays
    by k=4 only shares vocabulary).

    Same machinery as ``longest_repeated_substring``: one stage-0 class
    exchange, doubling rounds up to the largest power of two needed (or
    the first duplicate-free width — every longer k is then exactly 0),
    one probe exchange per requested k via the two-power trick.

    Returns a pyarrow Table (k, n_dup_windows, n_dup_positions) sorted by
    k.

    ``sample_docs``: same deterministic 1-in-s document-sample lane (and
    the same detection bound) as ``longest_repeated_substring`` — the
    routine-health-check mode at 100 TB; counts are over the sampled
    sub-corpus (scale by ~s, or by ~s^2 for the pair-dominated low-m
    tail, for corpus estimates). Default None = exact."""
    ks = tuple(sorted(set(int(k) for k in ks)))
    if not ks or ks[0] < 1:
        raise ValueError("ks must be positive window lengths")
    if sample_docs is not None and sample_docs > 1:
        docs = _lrs_sampled_docs(docs, sample_docs)
    rows = _lrs_class_rows(docs, column, num_buckets, batch_size)
    tables = {1: rows}
    w = 1
    dup_floor = None  # first width with zero duplicates
    while 2 * w <= ks[-1]:
        nxt, ndup = _lrs_doubled(tables[w], w, num_buckets)
        w *= 2
        tables[w] = nxt
        if ndup == 0:
            dup_floor = w
            break
    out_k, out_c, out_p = [], [], []
    for k in ks:
        if dup_floor is not None and k >= dup_floor:
            ncls = npos = 0
        else:
            w0 = 1 << (k.bit_length() - 1)  # largest power of two <= k
            ncls, npos = _lrs_probe(tables[w0], w0, k, num_buckets)
        out_k.append(k)
        out_c.append(ncls)
        out_p.append(npos)
    return pa.table({"k": pa.array(out_k, pa.int64()),
                     "n_dup_windows": pa.array(out_c, pa.int64()),
                     "n_dup_positions": pa.array(out_p, pa.int64())})


LPA_ITERS = 4


def lpa_dup(docs, *, iters: int = LPA_ITERS, n: int = 2,
            threshold: float = 0.8, num_buckets: int = 64):
    """Majority-vote label-propagation communities over the near-dup pair
    graph (Raghavan et al. 2007, made DETERMINISTIC: synchronous rounds,
    fixed iteration count, ties broken toward the smallest label) — the
    community structure complement to ``dedup_clusters``: min-label CC
    merges everything reachable, LPA keeps weakly-bridged template
    families apart because a node adopts the label most COMMON among its
    neighbors, not the smallest one it can reach.

    Every step is integer/order-exact, so a generated per-round SQL CTE
    chain (count + row_number) mirrors the run bitwise whether or not the
    labeling has converged. Labels start as the node's own doc_id; graph
    nodes only (every node has >= 1 neighbor, so every round's majority is
    defined and the label table stays complete).

    Plan shape (the pagerank_dup skeleton): half-edges materialize ONCE;
    per round, a src-bucket groupby meets label rows with half-edges
    (role-tagged membership-meets-payload) and emits PRE-AGGREGATED
    (dst, label, cnt) partials; a dst-bucket groupby folds the counts and
    takes the per-node argmax (cnt DESC, label ASC). Driver holds nothing
    graph-sized.

    Returns Dataset[doc_id, label]."""
    edges = ngram_jaccard_pairs(docs, n=n, threshold=threshold)

    def halves(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "bucket": pa.array(_intmix(src, num_buckets).astype(np.int32)),
            "role": pa.array(np.zeros(len(src), np.int8)),
            "src": pa.array(src),
            "dst": pa.array(dst),
        })

    half = edges.map_batches(halves, batch_format="pyarrow").materialize()

    def init_labels(g: pa.Table) -> pa.Table:
        s = np.unique(np.asarray(g["src"]).astype(np.int64))
        return pa.table({"node": pa.array(s), "lbl": pa.array(s)})

    labels = (half.groupby("bucket")
              .map_groups(init_labels, batch_format="pyarrow").materialize())

    def label_rows(t: pa.Table) -> pa.Table:
        node = np.asarray(t["node"]).astype(np.int64)
        return pa.table({
            "bucket": pa.array(_intmix(node, num_buckets).astype(np.int32)),
            "role": pa.array(np.ones(len(node), np.int8)),
            "src": pa.array(node),
            "dst": pa.array(np.asarray(t["lbl"]).astype(np.int64)),
        })

    def meet(g: pa.Table) -> pa.Table:
        role = np.asarray(g["role"]).astype(np.int64)
        src = np.asarray(g["src"]).astype(np.int64)
        dst = np.asarray(g["dst"]).astype(np.int64)
        ln, lv = src[role == 1], dst[role == 1]
        order = np.argsort(ln)
        ln, lv = ln[order], lv[order]
        es, ed = src[role == 0], dst[role == 0]
        lbl = lv[np.searchsorted(ln, es)]  # every edge src has a label row
        # pre-aggregate (dst, lbl) counts before the exchange
        pair = np.stack([ed, lbl], axis=1)
        upair, cnt = np.unique(pair, axis=0, return_counts=True)
        return pa.table({
            "bucket": pa.array(
                _intmix(upair[:, 0], num_buckets).astype(np.int32)),
            "node": pa.array(upair[:, 0]),
            "lbl": pa.array(upair[:, 1]),
            "c": pa.array(cnt.astype(np.int64)),
        })

    def majority(g: pa.Table) -> pa.Table:
        node = np.asarray(g["node"]).astype(np.int64)
        lbl = np.asarray(g["lbl"]).astype(np.int64)
        c = np.asarray(g["c"]).astype(np.int64)
        pair = np.stack([node, lbl], axis=1)
        upair, inv = np.unique(pair, axis=0, return_inverse=True)
        tot = np.zeros(len(upair), np.int64)
        np.add.at(tot, inv, c)
        un, ul = upair[:, 0], upair[:, 1]
        order = np.lexsort((ul, -tot, un))
        first = np.ones(len(order), bool)
        sn = un[order]
        if len(sn) > 1:
            first[1:] = sn[1:] != sn[:-1]
        pick = order[first]
        return pa.table({"node": pa.array(un[pick]),
                         "lbl": pa.array(ul[pick])})

    for _ in range(iters):
        tagged = half.union(
            labels.map_batches(label_rows, batch_format="pyarrow"))
        counts = (tagged.groupby("bucket")
                  .map_groups(meet, batch_format="pyarrow"))
        labels = (counts.groupby("bucket")
                  .map_groups(majority, batch_format="pyarrow")
                  ).materialize()

    def out(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"], "label": t["lbl"]})

    return labels.map_batches(out, batch_format="pyarrow")
