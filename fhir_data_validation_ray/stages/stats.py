"""Per-column statistics: exact aggregates, t-digest quantiles, HLL
uniqueness (north_star §2.6 — not present in the reference, required here).

Pattern: one streaming pass; each batch emits a PARTIAL (exact sums as ints,
serialized sketch for the approximate parts); the driver folds the partials.
Nothing wide — no shuffle, no sort; partial size is O(delta + 2^p) per batch.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.collect import collect_table
from ..state.sketches import HyperLogLog, TDigest


def numeric_stats_exact(ds, col: str):
    """Exact count/min/max/sum for an integer column — Dataset-level
    aggregate, integer outputs so the DuckDB oracle compares bitwise.
    Returns Dataset[col(str), n, min, max, sum] (single row)."""
    import ray
    import ray.data as rd

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col]).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "min": pa.array([int(v.min()) if len(v) else 0], pa.int64()),
                "max": pa.array([int(v.max()) if len(v) else 0], pa.int64()),
                "sum": pa.array([int(v.sum()) if len(v) else 0], pa.int64()),
            }
        )

    parts = collect_table(ds.map_batches(partial, batch_format="pyarrow"))
    n = np.asarray(parts["n"]) if "n" in parts.column_names else np.zeros(0, np.int64)
    nz = n > 0
    if not nz.any():  # empty dataset: zero row, same schema (no empty-slice min)
        return rd.from_arrow(
            pa.table(
                {
                    "col": pa.array([col], pa.string()),
                    "n": pa.array([0], pa.int64()),
                    "min": pa.array([0], pa.int64()),
                    "max": pa.array([0], pa.int64()),
                    "sum": pa.array([0], pa.int64()),
                }
            )
        )
    return rd.from_arrow(
        pa.table(
            {
                "col": pa.array([col], pa.string()),
                "n": pa.array([int(n.sum())], pa.int64()),
                "min": pa.array([int(np.asarray(parts["min"])[nz].min())], pa.int64()),
                "max": pa.array([int(np.asarray(parts["max"])[nz].max())], pa.int64()),
                "sum": pa.array([int(np.asarray(parts["sum"]).sum())], pa.int64()),
            }
        )
    )


def distinct_count_exact(ds, col: str, *, num_buckets: int = 256):
    """Exact COUNT(DISTINCT col) — the exact companion to the HLL estimate.
    Per-batch local uniques -> bucketed groupby (each value's rows share a
    bucket) -> per-bucket unique count -> tiny sum. The shuffle moves only
    the per-batch DISTINCT values, pre-deduplicated, so a low-cardinality
    column costs almost nothing at any corpus size.
    Returns Dataset[col, n_distinct] (single row)."""
    import ray.data as rd

    from ..functions.hashing import hash_str

    def local_uniques(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col])
        u = np.unique(v)
        if u.dtype.kind in ("i", "u"):
            b = (u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 >> np.uint64(33)) % np.uint64(num_buckets)
        else:
            b = hash_str(u.astype("U")) % np.uint64(num_buckets)
        return pa.table(
            {"bucket": pa.array(b.astype(np.int32)),
             "v": pa.array(u.astype(np.int64) if u.dtype.kind in ("i", "u") else u.astype("U"))}
        )

    def count_bucket(g: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array([len(np.unique(np.asarray(g["v"])))], pa.int64())}
        )

    parts = collect_table(
        ds.map_batches(local_uniques, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pyarrow"),
        empty_schema=pa.schema([("n", pa.int64())]),
    )
    total = int(np.asarray(parts["n"]).sum()) if parts.num_rows else 0
    return rd.from_arrow(
        pa.table({"col": pa.array([col], pa.string()),
                  "n_distinct": pa.array([total], pa.int64())})
    )


def column_profile(ds, col: str, *, quantiles=(0.5, 0.9, 0.95, 0.99),
                   delta: int = 128, hll_p: int = 14) -> dict:
    """Approximate column profile: t-digest quantiles + HLL distinct count.
    Per-batch partial sketches, driver-side fold — the sketch path the exact
    aggregates can't cover at 10^12 rows. Returns a plain dict manifest."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col]).astype(np.float64)
        td = TDigest.from_values(v, delta=delta)
        hll = HyperLogLog.from_hashes(
            np.asarray(t[col]).astype(np.uint64), p=hll_p
        ) if _is_int(t[col]) else HyperLogLog.from_strings(
            t[col].to_numpy(zero_copy_only=False).astype("U"), p=hll_p
        )
        return pa.table(
            {
                "td": pa.array([json.dumps(td.to_rows())], pa.string()),
                "hll": pa.array([hll.registers.tobytes()], pa.binary()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    def _merge_rows(t: pa.Table) -> tuple[TDigest, HyperLogLog, int]:
        td = TDigest(np.empty(0), np.empty(0), delta)
        hll = HyperLogLog.empty(hll_p)
        for row in t.to_pylist():
            td = td.merge(TDigest.from_rows(json.loads(row["td"])))
            hll = hll.merge(HyperLogLog(np.frombuffer(row["hll"], np.uint8).copy(), hll_p))
        return td, hll, int(np.asarray(t["n"]).sum()) if t.num_rows else 0

    def combine(t: pa.Table) -> pa.Table:
        td, hll, n = _merge_rows(t)
        return pa.table(
            {
                "td": pa.array([json.dumps(td.to_rows())], pa.string()),
                "hll": pa.array([hll.registers.tobytes()], pa.binary()),
                "n": pa.array([n], pa.int64()),
            }
        )

    # two-level fold: per-batch partials -> per-TASK combine over many
    # partials (batch_size=64) -> driver merges the few survivors. At 10^12
    # rows the driver sees ~n_batches/64 sketches instead of n_batches.
    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64)
    )
    td, hll, n = _merge_rows(parts)
    return {
        "col": col,
        "n": n,
        "quantiles": {str(q): td.quantile(q) for q in quantiles},
        "distinct_hll": float(hll.estimate()),
        "tdigest": td.to_rows(),
    }


def _is_int(arr) -> bool:
    t = arr.type if not isinstance(arr, pa.ChunkedArray) else arr.type
    return pa.types.is_integer(t)


def histogram(ds, col: str, *, lo: int, hi: int, nbins: int):
    """Fixed-bin histogram (integer counts, deterministic edges) — the
    oracle-checkable building block for PSI drift. Bin i covers
    [lo + i*w, lo + (i+1)*w); values outside clamp to the edge bins.
    Returns Dataset[bin, count]."""
    import ray
    import ray.data as rd

    w = (hi - lo) / nbins

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col]).astype(np.float64)
        b = np.clip(np.floor((v - lo) / w).astype(np.int64), 0, nbins - 1)
        counts = np.bincount(b, minlength=nbins)
        return pa.table(
            {
                "bin": pa.array(np.arange(nbins, dtype=np.int64)),
                "count": pa.array(counts.astype(np.int64)),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        b = np.asarray(t["bin"])
        c = np.asarray(t["count"])
        total = np.bincount(b, weights=c, minlength=nbins).astype(np.int64)
        return pa.table(
            {
                "bin": pa.array(np.arange(nbins, dtype=np.int64)),
                "count": pa.array(total),
            }
        )

    # per-task combine before the driver fold: the driver sums a handful of
    # nbins-row tables regardless of batch count
    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64 * nbins)
    )
    return rd.from_arrow(combine(parts))


def histogram_by_group(ds, col: str, group_col: str, *, lo: int, hi: int,
                       nbins: int):
    """Per-group fixed-bin histogram — the oracle-checkable integer core of
    the per-partition PSI drift check. Per-batch (group, bin) partial
    bincounts, merged by one low-cardinality groupby on the group value.
    Returns Dataset[group, bin, count] (all nbins rows per group)."""
    import pyarrow.compute as pc

    w = (hi - lo) / nbins

    def partial(t: pa.Table) -> pa.Table:
        groups = t[group_col]
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        da = pc.dictionary_encode(groups)
        codes = np.asarray(da.indices).astype(np.int64)
        gnames = da.dictionary
        v = np.asarray(t[col]).astype(np.float64)
        b = np.clip(np.floor((v - lo) / w).astype(np.int64), 0, nbins - 1)
        counts = np.bincount(codes * nbins + b, minlength=len(gnames) * nbins)
        gi = np.repeat(np.arange(len(gnames)), nbins)
        return pa.table(
            {
                "group": pc.take(gnames, pa.array(gi)).cast(pa.string()),
                "bin": pa.array(np.tile(np.arange(nbins, dtype=np.int64), len(gnames))),
                "count": pa.array(counts.astype(np.int64)),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        b = np.asarray(g["bin"])
        c = np.asarray(g["count"])
        total = np.bincount(b, weights=c, minlength=nbins).astype(np.int64)
        grp = g["group"][0].as_py()
        return pa.table(
            {
                "group": pa.array([grp] * nbins, pa.string()),
                "bin": pa.array(np.arange(nbins, dtype=np.int64)),
                "count": pa.array(total),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("group")
        .map_groups(merge, batch_format="pyarrow")
    )


def group_topn(ds, *, key: str, value: str, id_col: str, n: int,
               num_buckets: int = 64, batch_size: int | None = None):
    """Per-group top-N — the partitioned rank/limit primitive (SQL
    ``row_number() OVER (PARTITION BY key ORDER BY value DESC, id)`` <= N):
    for every distinct ``key``, keep the N rows with the largest ``value``,
    ties broken by ascending ``id_col``. Complements the GLOBAL top-k of
    ``textops.top_words``; "newest N per domain" / "longest N per source"
    selections in a curation pipeline are this operator.

    Scale shape — classic combiner + one bounded exchange: each batch
    pre-trims to at most N rows per key it sees (vectorized lexsort +
    run-rank, no Python loops), so the key-bucket exchange moves at most
    N x (distinct keys per batch) rows regardless of group skew; the bucket
    fold repeats the same selection on complete per-key row sets (all of a
    key's survivors land in its bucket by construction). No global sort, no
    per-key group explosion — G groups land in ``num_buckets`` folds.

    Returns Dataset[key, id_col, value] (exact winners, unordered)."""
    from ..functions.hashing import hash_str

    def select(keys_codes, vals, ids, m):
        """Row indices of the per-key top-``m`` by (value desc, id asc)."""
        order = np.lexsort((ids, -vals, keys_codes))
        kc = keys_codes[order]
        starts = np.flatnonzero(np.r_[True, kc[1:] != kc[:-1]])
        run = np.cumsum(np.r_[False, kc[1:] != kc[:-1]])
        rank = np.arange(len(kc)) - starts[run]
        return order[rank < m]

    def trim(t: pa.Table) -> pa.Table:
        k = t[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        import pyarrow.compute as pc

        da = pc.dictionary_encode(k)
        codes = np.asarray(da.indices, dtype=np.int64)
        vals = np.asarray(t[value]).astype(np.int64)
        ids = np.asarray(t[id_col]).astype(np.int64)
        keep = select(codes, vals, ids, n)
        kept_k = k.take(pa.array(keep))
        kstr = np.asarray(kept_k).astype("U")
        return pa.table({
            "bucket": pa.array(
                (hash_str(kstr) % np.uint64(num_buckets)).astype(np.int32)),
            key: kept_k,
            id_col: pa.array(ids[keep]),
            value: pa.array(vals[keep]),
        })

    def fold(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = g[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        da = pc.dictionary_encode(k)
        codes = np.asarray(da.indices, dtype=np.int64)
        vals = np.asarray(g[value]).astype(np.int64)
        ids = np.asarray(g[id_col]).astype(np.int64)
        keep = select(codes, vals, ids, n)
        return pa.table({
            key: k.take(pa.array(keep)),
            id_col: pa.array(ids[keep]),
            value: pa.array(vals[keep]),
        })

    return (
        ds.map_batches(trim, batch_format="pyarrow", batch_size=batch_size)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def _value_count_fold(ds, col: str) -> tuple[np.ndarray, np.ndarray]:
    """Distributed exact value counts of an integer column: per-batch
    ``np.unique`` partials, a per-TASK combine level merging ~64 partials,
    then a driver fold of O(n_tasks) small count tables. State everywhere is
    bounded by the column's DISTINCT-value cardinality, never its row count.
    Returns (sorted unique values, counts)."""

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col]).astype(np.int64)
        uv, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uv), "cnt": pa.array(cnt.astype(np.int64))})

    def combine(t: pa.Table) -> pa.Table:
        v = np.asarray(t["v"]).astype(np.int64)
        c = np.asarray(t["cnt"]).astype(np.int64)
        uv, inv = np.unique(v, return_inverse=True)
        total = np.zeros(len(uv), dtype=np.int64)
        np.add.at(total, inv, c)
        return pa.table({"v": pa.array(uv), "cnt": pa.array(total)})

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([("v", pa.int64()), ("cnt", pa.int64())]),
    )
    v = np.asarray(parts["v"]).astype(np.int64) if parts.num_rows else np.zeros(0, np.int64)
    c = np.asarray(parts["cnt"]).astype(np.int64) if parts.num_rows else np.zeros(0, np.int64)
    uv, inv = np.unique(v, return_inverse=True)
    total = np.zeros(len(uv), dtype=np.int64)
    np.add.at(total, inv, c)
    return uv, total


def percentile_rank(ds, col: str, *, id_col: str = "doc_id"):
    """EXACT percentile rank of every row's ``col`` value across the corpus —
    the score-normalization step of a quality-filter pipeline (keep the top
    X% by score regardless of the score's absolute scale). Integer outputs:
    ``n_smaller`` = count of rows with a strictly smaller value (DuckDB
    ``rank() OVER (ORDER BY col) - 1``) and ``pct_ppm`` = parts-per-million
    percentile ``n_smaller * 1e6 // (n - 1)``.

    Scale shape: ONE distributed value-count fold (state bounded by the
    column's distinct-value cardinality — the same stated assumption as
    ``exact_int_quantiles``; use the TDigest lane for unbounded columns),
    the cumulative table broadcast once via ``ray.put``, then a stateless
    streaming probe (``np.searchsorted``) attaches ranks per batch — no
    global sort, no per-row exchange."""
    import ray

    uv, total = _value_count_fold(ds, col)
    cum_excl = np.concatenate([[np.int64(0)], np.cumsum(total)[:-1]]).astype(np.int64)
    n = int(total.sum())
    cdf_ref = ray.put((uv, cum_excl, n))

    def probe(t: pa.Table) -> pa.Table:
        vals, cexc, total_n = ray.get(cdf_ref)
        v = np.asarray(t[col]).astype(np.int64)
        idx = np.searchsorted(vals, v)
        smaller = cexc[idx] if len(vals) else np.zeros(len(v), np.int64)
        denom = max(total_n - 1, 1)
        return pa.table(
            {
                id_col: t[id_col],
                col: pa.array(v),
                "n_smaller": pa.array(smaller.astype(np.int64)),
                "pct_ppm": pa.array((smaller * 1_000_000 // denom).astype(np.int64)),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def mad_outliers(ds, col: str, *, id_col: str = "doc_id", k: int = 2):
    """Robust outlier detection on an integer column: flag rows where
    ``|x - median| > k * MAD`` (MAD = median absolute deviation, the
    standard robust alternative to z-scores for skewed corpus metrics —
    catches pathological documents a mean/stddev band misses when the
    length distribution is heavy-tailed). Median and MAD use the same
    smallest-v-with-cum>=ceil(0.5*n) rule as ``exact_int_quantiles``, so
    every output is integer-exact and SQL-oracle-comparable.

    Scale shape: ONE distributed value-count fold (state bounded by the
    column's distinct-value cardinality — the stated assumption of the
    exact stats lane); median AND MAD both derive from that one count
    table on the driver (deviation counts are a permutation of the value
    counts — no second corpus pass for the MAD), then a stateless
    streaming probe flags rows per batch. No sort, no per-row exchange."""
    uv, total = _value_count_fold(ds, col)
    n = int(total.sum())
    if n == 0:
        return pa.table({id_col: pa.array([], pa.string()),
                         col: pa.array([], pa.int64()),
                         "deviation": pa.array([], pa.int64())})

    def _median_of(vals: np.ndarray, counts: np.ndarray) -> int:
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(counts[order])
        rank = max(int(np.ceil(0.5 * n)), 1)
        return int(vals[order][np.searchsorted(cum, rank)])

    med = _median_of(uv.astype(np.int64), total)
    dev_vals = np.abs(uv.astype(np.int64) - med)
    # collapse deviations that coincide (v below and above the median)
    dv, inv = np.unique(dev_vals, return_inverse=True)
    dcnt = np.bincount(inv, weights=total).astype(np.int64)
    mad = _median_of(dv, dcnt)
    thresh = k * mad

    def probe(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col]).astype(np.int64)
        dev = np.abs(v - med)
        m = dev > thresh
        return pa.table({
            id_col: pc.filter(t[id_col], pa.array(m)),
            col: pa.array(v[m]),
            "deviation": pa.array(dev[m]),
        })

    return ds.map_batches(probe, batch_format="pyarrow")


def _group_cols(t: pa.Table, col: str, group_col: str):
    """(group U-strings, int64 values) of one batch — shared by the
    (group, value) fold and its broadcast probes."""
    gcol = t[group_col]
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    return (np.asarray(gcol).astype("U"),
            np.asarray(t[col]).astype(np.int64))


def group_value_counts(ds, col: str, group_col: str):
    """Distributed EXACT (group, value) counts of an integer column keyed by
    a string group — per-batch lexsort boundary-count partials, a per-task
    combine level, a driver fold bounded by the (group x distinct-value)
    cardinality. The shared fold under ``percentile_rank_by_group`` and the
    fixed-point drift scores. Returns (groups, values, counts) numpy arrays
    sorted by (group, value)."""

    def _pair_counts(g: np.ndarray, v: np.ndarray, c: np.ndarray):
        """Sum counts ``c`` over distinct (g, v) pairs (g string, v int)."""
        order = np.lexsort((v, g))
        gs, vs, cs = g[order], v[order], c[order]
        if len(gs) == 0:
            return gs, vs, cs
        new = np.concatenate(
            [[True], (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])])
        idx = np.nonzero(new)[0]
        sums = np.add.reduceat(cs, idx)
        return gs[idx], vs[idx], sums.astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        g, v = _group_cols(t, col, group_col)
        gs, vs, cs = _pair_counts(g, v, np.ones(len(v), np.int64))
        return pa.table({"g": pa.array(gs), "v": pa.array(vs),
                         "cnt": pa.array(cs)})

    def combine(t: pa.Table) -> pa.Table:
        gcol = t["g"]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        gs, vs, cs = _pair_counts(
            np.asarray(gcol).astype("U"),
            np.asarray(t["v"]).astype(np.int64),
            np.asarray(t["cnt"]).astype(np.int64))
        return pa.table({"g": pa.array(gs), "v": pa.array(vs),
                         "cnt": pa.array(cs)})

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema(
            [("g", pa.string()), ("v", pa.int64()), ("cnt", pa.int64())]),
    )
    if not parts.num_rows:
        z = np.zeros(0, np.int64)
        return np.zeros(0, dtype="U1"), z, z
    gcol = parts["g"]
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    return _pair_counts(
        np.asarray(gcol).astype("U"),
        np.asarray(parts["v"]).astype(np.int64),
        np.asarray(parts["cnt"]).astype(np.int64))


def percentile_rank_by_group(ds, col: str, group_col: str, *,
                             id_col: str = "doc_id"):
    """EXACT percentile rank of ``col`` WITHIN each ``group_col`` value —
    the per-domain score normalization of a keep-top-X%-per-source gate
    (a global threshold would empty rare domains whose score scale sits
    lower). Integer outputs mirror ``percentile_rank``: ``n_smaller`` =
    rows in the SAME group with a strictly smaller value, ``pct_ppm`` =
    ``n_smaller * 1e6 // (n_group - 1)``.

    Scale shape: the shared ``group_value_counts`` fold, per-group CDFs
    broadcast once via ``ray.put``, then a stateless searchsorted probe
    per batch."""
    import ray

    gs, vs, cs = group_value_counts(ds, col, group_col)
    cdfs: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    if len(gs):
        starts = np.concatenate([[0], np.nonzero(gs[1:] != gs[:-1])[0] + 1])
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < len(starts) else len(gs)
            cum_excl = np.concatenate(
                [[np.int64(0)], np.cumsum(cs[s:e])[:-1]]).astype(np.int64)
            cdfs[str(gs[s])] = (vs[s:e], cum_excl, int(cs[s:e].sum()))
    cdf_ref = ray.put(cdfs)

    def probe(t: pa.Table) -> pa.Table:
        lut = ray.get(cdf_ref)
        g, v = _group_cols(t, col, group_col)
        smaller = np.zeros(len(v), np.int64)
        ppm = np.zeros(len(v), np.int64)
        for grp in np.unique(g):
            vals, cexc, n_g = lut[str(grp)]
            m = g == grp
            sm = cexc[np.searchsorted(vals, v[m])]
            smaller[m] = sm
            ppm[m] = sm * 1_000_000 // max(n_g - 1, 1)
        return pa.table({
            id_col: t[id_col],
            group_col: t[group_col],
            col: pa.array(v),
            "n_smaller": pa.array(smaller),
            "pct_ppm": pa.array(ppm),
        })

    return ds.map_batches(probe, batch_format="pyarrow")


def exact_int_quantiles(ds, col: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)):
    """EXACT quantiles of an integer column — the precise lane next to the
    TDigest approximation: quantile q = the smallest value v with
    count(rows <= v) >= ceil(q * n). Returns a one-row Dataset-shaped
    pyarrow Table: ``col``, ``n``, and one ``p<q>`` column per requested
    quantile (integer outputs, bitwise oracle-comparable against a window
    cumulative in SQL).

    Scale shape: per-batch value-count partials (bounded by the column's
    DISTINCT-value cardinality, the operator's stated assumption — right for
    bounded metrics like lengths, counts, scores; use the TDigest lane for
    unbounded ones), a per-TASK combine level merging ~64 partials, then a
    driver fold of O(n_tasks) small count tables — same two-level shape as
    the sketch fold above."""
    uv, total = _value_count_fold(ds, col)
    cum = np.cumsum(total)
    n = int(cum[-1]) if len(cum) else 0
    out = {"col": pa.array([col], pa.string()), "n": pa.array([n], pa.int64())}
    for q in qs:
        name = "p" + str(q).replace("0.", "").ljust(2, "0")
        if n == 0:
            out[name] = pa.array([0], pa.int64())
        else:
            rank = int(np.ceil(q * n))
            out[name] = pa.array(
                [int(uv[np.searchsorted(cum, max(rank, 1))])], pa.int64())
    return pa.table(out)


def quantile_band_assign(ds, *, col: str,
                         qs: tuple[float, ...] = (0.25, 0.5, 0.75)):
    """Tag every row with its exact quantile BAND of ``col`` — the
    length/score banding step curriculum ordering and stratified mixing key
    on: band = number of quantile boundaries strictly below the value
    (0..len(qs)), boundaries from the same smallest-v-with-cum>=ceil(q*n)
    rule as ``exact_int_quantiles``.

    Scale shape: ONE two-level value-count fold over a single-column
    projection computes all boundaries (driver state bounded by distinct
    values), then one stateless vectorized map tags the corpus — the
    boundary list rides in the task closure (len(qs) integers). No shuffle,
    no sort.

    Dataset[..., col] -> Dataset[..., col, band]."""
    uv, total = _value_count_fold(ds.select_columns([col]), col)
    cum = np.cumsum(total)
    n = int(cum[-1]) if len(cum) else 0
    bounds = []
    for q in qs:
        if n == 0:
            bounds.append(0)
        else:
            rank = int(np.ceil(q * n))
            bounds.append(int(uv[np.searchsorted(cum, max(rank, 1))]))

    def band(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col]).astype(np.int64)
        b = np.zeros(len(v), np.int64)
        for x in bounds:
            b += v > x
        return t.append_column("band", pa.array(b))

    return ds.map_batches(band, batch_format="pyarrow")


def exact_moments(ds, xcol: str, ycol: str):
    """Exact joint second moments of two integer columns — the covariance /
    correlation / least-squares building block, kept in integer sums so the
    SQL oracle compares bitwise (derive cov = (n*sxy - sx*sy) / n^2 etc.
    downstream in whatever float precision the caller wants).

    Scale shape: one 6-integer partial row per batch, a per-task combine
    level (batch_size=64), then a driver fold of the few survivors — the
    same two-level shape as the sketch fold. Stated bound: |x| <= ~2e3-scale
    values keep sum(x^2) inside int64 to ~10^12 rows; larger magnitudes
    need the float TDigest lane instead.

    Returns a one-row pyarrow Table: n, sum_x, sum_y, sum_xx, sum_yy,
    sum_xy."""

    def partial(t: pa.Table) -> pa.Table:
        x = np.asarray(t[xcol]).astype(np.int64)
        y = np.asarray(t[ycol]).astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sum_x": pa.array([int(x.sum())], pa.int64()),
            "sum_y": pa.array([int(y.sum())], pa.int64()),
            "sum_xx": pa.array([int((x * x).sum())], pa.int64()),
            "sum_yy": pa.array([int((y * y).sum())], pa.int64()),
            "sum_xy": pa.array([int((x * y).sum())], pa.int64()),
        })

    def combine(t: pa.Table) -> pa.Table:
        return pa.table({c: pa.array([int(np.asarray(t[c]).sum())], pa.int64())
                         for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_yy",
                                   "sum_xy")})

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64))
    return combine(parts) if parts.num_rows else pa.table({
        c: pa.array([0], pa.int64())
        for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy")})


def exact_gini(ds, key: str = "user_id", *, num_buckets: int = 64):
    """Exact Gini concentration of row counts per ``key`` (how unevenly
    activity concentrates across users/domains — the skew dial that decides
    whether hot-key salting is needed downstream). Integer-exact: returns
    numerator and denominator separately (G = gini_num / gini_den) so the
    SQL oracle compares bitwise.

    With per-key counts c sorted ascending, G = (2*sum(i*c_i) -
    (n+1)*sum(c)) / (n*sum(c)); ties share a value so any order among
    equals gives the same sum, making the statistic well-defined from
    VALUE COUNTS alone. Plan: per-batch pre-aggregated (bucket, key, n)
    partials -> one key-bucket groupby sums exact per-key totals and emits
    per-bucket count-value counts (distinct totals are few) -> driver fold
    of value counts -> closed-form integer Gini terms.

    Returns a one-row pyarrow Table (n_keys, total, gini_num, gini_den)."""
    from ..functions.collect import collect_table
    from ..stages.dedup import _intmix

    def partial(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key]).astype(np.int64)
        uk, cnt = np.unique(k, return_counts=True)
        return pa.table({
            "bucket": pa.array(_intmix(uk, num_buckets).astype(np.int32)),
            "key": pa.array(uk),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def bucket_vcounts(g: pa.Table) -> pa.Table:
        k = np.asarray(g["key"]).astype(np.int64)
        n = np.asarray(g["n"]).astype(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        tot = np.zeros(len(uk), np.int64)
        np.add.at(tot, inv, n)
        v, m = np.unique(tot, return_counts=True)
        return pa.table({"v": pa.array(v),
                         "m": pa.array(m.astype(np.int64))})

    def combine(t: pa.Table) -> pa.Table:
        v = np.asarray(t["v"]).astype(np.int64)
        m = np.asarray(t["m"]).astype(np.int64)
        uv, inv = np.unique(v, return_inverse=True)
        tm = np.zeros(len(uv), np.int64)
        np.add.at(tm, inv, m)
        return pa.table({"v": pa.array(uv), "m": pa.array(tm)})

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket").map_groups(bucket_vcounts, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([("v", pa.int64()), ("m", pa.int64())]),
    )
    if parts.num_rows:
        parts = combine(parts)
        v = np.asarray(parts["v"]).astype(object)  # python ints: no overflow
        m = np.asarray(parts["m"]).astype(object)
    else:
        v = m = np.empty(0, object)
    n = int(sum(m)) if len(m) else 0
    total = int(sum(v[j] * m[j] for j in range(len(v)))) if len(v) else 0
    s = 0
    ic = 0
    for j in range(len(v)):  # v is sorted ascending (np.unique)
        ic += v[j] * (m[j] * s + m[j] * (m[j] + 1) // 2)
        s += m[j]
    gini_num = 2 * ic - (n + 1) * total
    gini_den = n * total
    return pa.table({
        "n_keys": pa.array([n], pa.int64()),
        "total": pa.array([total], pa.int64()),
        "gini_num": pa.array([int(gini_num)], pa.int64()),
        "gini_den": pa.array([int(gini_den)], pa.int64()),
    })


def table_audit(ds, columns: list[str], *, num_buckets: int = 64,
                batch_size: int | None = None):
    """Exact per-column data audit: (column, n_rows, n_nulls, n_distinct) —
    the data-quality profile a pipeline runs before training-data export
    (the exact-integer sibling of ``column_profile``'s sketches).

    Distinct counting is EXACT over the 64-bit FNV hash of the string-cast
    value — the identical fold the DuckDB oracle applies (``dataops.py
    _fnv_sql``), so any collision is shared bitwise by both sides. Scale
    shape: each batch emits its per-column DISTINCT hash set (pre-deduped)
    plus one counts row; a (column, hash-bucket) groupby counts distinct
    hashes per bucket; the driver folds columns x buckets tiny rows. The
    exchange is bounded by per-column distinct cardinality — one shuffle,
    same shape as ``exact_dedup``'s.

    Int64 columns cast via decimal string (numpy ``astype("U")`` ==
    DuckDB ``CAST(BIGINT AS VARCHAR)``); float columns are rejected (no
    cross-engine formatting contract)."""
    from ..functions.hashing import hash_str

    def partials(t: pa.Table) -> pa.Table:
        out_col: list[str] = []
        out_role: list[np.ndarray] = []
        out_bucket: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        cols = []
        for c in columns:
            arr = t[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pa.types.is_floating(arr.type):
                raise TypeError(f"table_audit: float column {c!r} has no "
                                "cross-engine string contract")
            n_rows = len(arr)
            n_nulls = arr.null_count
            valid = arr.drop_null()
            vs = valid.to_numpy(zero_copy_only=False).astype("U")
            h = np.unique(hash_str(vs)) if len(vs) else np.empty(0, np.uint64)
            k = len(h)
            cols.append((c, n_rows, n_nulls))
            out_col.append(np.full(k, c, dtype=object))
            out_role.append(np.ones(k, dtype=np.int8))
            out_bucket.append((h % np.uint64(num_buckets)).astype(np.int32))
            out_h.append(h.astype(np.int64))
            out_n.append(np.zeros(k, dtype=np.int64))
        # counts rows (role 0, bucket -1): one per column per batch
        for c, n_rows, n_nulls in cols:
            out_col.append(np.array([c, c], dtype=object))
            out_role.append(np.zeros(2, dtype=np.int8))
            out_bucket.append(np.array([-1, -2], dtype=np.int32))
            out_h.append(np.zeros(2, dtype=np.int64))
            out_n.append(np.array([n_rows, n_nulls], dtype=np.int64))
        return pa.table({
            "column": pa.array(np.concatenate(out_col).astype("U"), pa.string()),
            "role": pa.array(np.concatenate(out_role)),
            "bucket": pa.array(np.concatenate(out_bucket)),
            "h": pa.array(np.concatenate(out_h)),
            "n": pa.array(np.concatenate(out_n)),
        })

    def bucket_fold(g: pa.Table) -> pa.Table:
        col = str(g["column"][0].as_py())
        bucket = int(g["bucket"][0].as_py())
        if bucket == -1:   # n_rows partials
            return pa.table({"column": pa.array([col]),
                             "kind": pa.array(["rows"]),
                             "v": pa.array([int(np.asarray(g["n"]).sum())],
                                           pa.int64())})
        if bucket == -2:   # n_nulls partials
            return pa.table({"column": pa.array([col]),
                             "kind": pa.array(["nulls"]),
                             "v": pa.array([int(np.asarray(g["n"]).sum())],
                                           pa.int64())})
        nd = len(np.unique(np.asarray(g["h"])))
        return pa.table({"column": pa.array([col]),
                         "kind": pa.array(["distinct"]),
                         "v": pa.array([nd], pa.int64())})

    parts = collect_table(
        ds.map_batches(partials, batch_format="pyarrow",
                       batch_size=batch_size)
        .groupby(["column", "bucket"])
        .map_groups(bucket_fold, batch_format="pyarrow"),
        empty_schema=pa.schema([("column", pa.string()),
                                ("kind", pa.string()),
                                ("v", pa.int64())]),
    )
    agg: dict[str, dict[str, int]] = {
        c: {"rows": 0, "nulls": 0, "distinct": 0} for c in columns}
    for col, kind, v in zip(parts["column"].to_pylist(),
                            parts["kind"].to_pylist(),
                            parts["v"].to_pylist()):
        agg[col][kind] += int(v)
    return pa.table({
        "column": pa.array(list(columns), pa.string()),
        "n_rows": pa.array([agg[c]["rows"] for c in columns], pa.int64()),
        "n_nulls": pa.array([agg[c]["nulls"] for c in columns], pa.int64()),
        "n_distinct": pa.array([agg[c]["distinct"] for c in columns],
                               pa.int64()),
    })


def kll_column_quantiles(ds, col: str, *, quantiles=(0.5, 0.9, 0.95, 0.99),
                         k: int = 200) -> dict:
    """KLL-sketch column quantiles (``state/sketches.py:KLL``) — the
    bounded-space alternative lane to the t-digest profile for unbounded
    value domains, with the same two-level partial fold: per-batch KLL
    partials -> per-task combine (batch_size=64) -> driver merges the few
    survivors. Returns a plain dict manifest (rows-only by design: the
    sketch is approximate)."""
    from ..state.sketches import KLL

    def partial(t: pa.Table) -> pa.Table:
        s = KLL.from_values(np.asarray(t[col]).astype(np.float64), k=k)
        return pa.table({
            "kll": pa.array([json.dumps(s.to_rows())], pa.string()),
            "n": pa.array([t.num_rows], pa.int64()),
        })

    def _merge_rows(t: pa.Table):
        s = KLL.empty(k)
        for row in t.to_pylist():
            s = s.merge(KLL.from_rows(json.loads(row["kll"])))
        return s, int(np.asarray(t["n"]).sum()) if t.num_rows else 0

    def combine(t: pa.Table) -> pa.Table:
        s, n = _merge_rows(t)
        return pa.table({
            "kll": pa.array([json.dumps(s.to_rows())], pa.string()),
            "n": pa.array([n], pa.int64()),
        })

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64)
    )
    s, n = _merge_rows(parts)
    return {
        "col": col,
        "n": n,
        "sketch_n": s.n,
        "quantiles": {str(q): s.quantile(q) for q in quantiles},
    }


def fd_violations(ds, x: str, y: str, *, num_buckets: int = 64,
                  batch_size: int | None = None):
    """Functional-dependency violation discovery (data-profiling primitive:
    does X -> Y hold?): every X value carrying MORE than one distinct
    non-null Y, with its doc count — e.g. ``text -> lang`` violations flag
    language-ambiguous duplicates, ``source -> lang`` profiles multilingual
    feeds.

    Scale shape (the dup_rate_by_source exchange): batches collapse to
    batch-distinct (x, y) rows keyed by (x, hash(y) % B) — no group ever
    exceeds ~distinct_y(x)/B rows — while per-x doc counts ride the same
    exchange as one count row per (batch, x) at bucket -1; a final per-x
    groupby sums <= B+1 partial rows. NULL x keeps its own group (SQL
    GROUP BY); NULL y counts into n_docs but never into n_values (SQL
    count(DISTINCT)). Returns Dataset[x, n_docs, n_values] filtered to
    n_values > 1."""
    from ..functions.hashing import hash_str

    def partial(t: pa.Table) -> pa.Table:
        xa = t[x].combine_chunks() if isinstance(t[x], pa.ChunkedArray) else t[x]
        ya = t[y].combine_chunks() if isinstance(t[y], pa.ChunkedArray) else t[y]
        x_np = xa.to_numpy(zero_copy_only=False)
        null_x = np.array([v is None for v in x_np], dtype=bool)
        gkey = np.where(null_x, "N", np.char.add("T", x_np.astype("U")))
        uk, inv = np.unique(gkey, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uk))
        rep_x = pa.array([None if u == "N" else u[1:] for u in uk],
                         pa.string())
        counts_tbl = pa.table({
            "g": pa.array(uk, pa.string()),
            "bucket": pa.array(np.full(len(uk), -1, np.int64)),
            x: rep_x,
            "yv": pa.nulls(len(uk), pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })
        valid = pc.is_valid(ya).to_numpy(zero_copy_only=False)
        if not valid.any():
            return counts_tbl
        yd = pc.dictionary_encode(ya.filter(pa.array(valid)))
        codes = np.asarray(yd.indices).astype(np.int64)
        both = np.unique(np.stack(
            [inv[valid], codes], axis=1), axis=0)
        xi, yi = both[:, 0], both[:, 1]
        ystr = yd.dictionary.cast(pa.string())
        yh = hash_str(ystr.to_numpy(zero_copy_only=False))
        pair_tbl = pa.table({
            "g": pa.array(uk[xi], pa.string()),
            "bucket": pa.array(
                (yh[yi] % np.uint64(num_buckets)).astype(np.int64)),
            x: pc.take(rep_x, pa.array(xi)),
            "yv": ystr.take(pa.array(yi)),
            "n": pa.array(np.zeros(len(xi), np.int64)),
        })
        return pa.concat_tables([counts_tbl, pair_tbl])

    def fold(g: pa.Table) -> pa.Table:
        b = int(g["bucket"][0].as_py())
        if b == -1:
            nv, nd = 0, int(np.asarray(g["n"]).sum())
        else:
            nd = 0
            ys = g["yv"].combine_chunks() if isinstance(
                g["yv"], pa.ChunkedArray) else g["yv"]
            nv = len(pc.unique(ys))
        return pa.table({
            "g": pa.array([str(g["g"][0].as_py())]),
            x: pa.array([g[x][0].as_py()], pa.string()),
            "n_docs": pa.array([nd], pa.int64()),
            "n_values": pa.array([nv], pa.int64()),
        })

    def final(g: pa.Table) -> pa.Table:
        nv = int(np.asarray(g["n_values"]).sum())
        if nv <= 1:
            return pa.table({x: pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_values": pa.array([], pa.int64())})
        return pa.table({
            x: pa.array([g[x][0].as_py()], pa.string()),
            "n_docs": pa.array([int(np.asarray(g["n_docs"]).sum())],
                               pa.int64()),
            "n_values": pa.array([nv], pa.int64()),
        })

    return (
        ds.select_columns([x, y])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby(["g", "bucket"])
        .map_groups(fold, batch_format="pyarrow")
        .groupby("g")
        .map_groups(final, batch_format="pyarrow")
    )


def contingency(ds, x: str, y: str, *, batch_size: int | None = None):
    """Exact contingency table with marginals — the cross-field drift /
    independence audit (source x lang): observed cell counts plus row,
    column and grand totals as plain integers (the chi-square numerator
    (n*total - row*col)^2 can overflow int64 at corpus scale, so the
    statistic is left to the reader; every reported number is exact).

    Per-batch bincount partials over dictionary-coded (x, y) bound the
    exchange at cells-per-batch; cell totals resolve in a (x, y) groupby
    (S*L rows total), and marginals in ONE tiny constant-key fold over the
    finished cells — never over per-batch partials. NULL values group as
    SQL GROUP BY does. Returns Dataset[x, y, n, row_total, col_total,
    grand_total]."""

    def partial(t: pa.Table) -> pa.Table:
        xa = t[x].combine_chunks() if isinstance(t[x], pa.ChunkedArray) else t[x]
        ya = t[y].combine_chunks() if isinstance(t[y], pa.ChunkedArray) else t[y]
        xd, yd = pc.dictionary_encode(xa), pc.dictionary_encode(ya)
        xi = np.asarray(xd.indices).astype(np.int64)
        yi = np.asarray(yd.indices).astype(np.int64)
        # nulls get their own code (SQL GROUP BY groups NULLs together)
        nx, ny = len(xd.dictionary) + 1, len(yd.dictionary) + 1
        xi = np.where(xi < 0, nx - 1, xi) if xi.min(initial=0) < 0 else xi
        yi = np.where(yi < 0, ny - 1, yi) if yi.min(initial=0) < 0 else yi
        counts = np.bincount(xi * ny + yi, minlength=nx * ny)
        nz = np.flatnonzero(counts)
        xs = xd.dictionary.cast(pa.string()).to_pylist() + [None]
        ys = yd.dictionary.cast(pa.string()).to_pylist() + [None]
        return pa.table({
            x: pa.array([xs[i // ny] for i in nz], pa.string()),
            y: pa.array([ys[i % ny] for i in nz], pa.string()),
            "n": pa.array(counts[nz].astype(np.int64)),
        })

    def cell(g: pa.Table) -> pa.Table:
        return pa.table({
            x: pa.array([g[x][0].as_py()], pa.string()),
            y: pa.array([g[y][0].as_py()], pa.string()),
            "n": pa.array([int(np.asarray(g["n"]).sum())], pa.int64()),
            "k": pa.array([0], pa.int64()),
        })

    def marginals(g: pa.Table) -> pa.Table:
        xs = g[x].combine_chunks() if isinstance(g[x], pa.ChunkedArray) else g[x]
        ys = g[y].combine_chunks() if isinstance(g[y], pa.ChunkedArray) else g[y]
        n = np.asarray(g["n"]).astype(np.int64)
        xd, yd = pc.dictionary_encode(xs), pc.dictionary_encode(ys)
        xi = np.asarray(xd.indices).astype(np.int64)
        yi = np.asarray(yd.indices).astype(np.int64)
        xi = np.where(xi < 0, len(xd.dictionary), xi)
        yi = np.where(yi < 0, len(yd.dictionary), yi)
        row = np.zeros(len(xd.dictionary) + 1, np.int64)
        col = np.zeros(len(yd.dictionary) + 1, np.int64)
        np.add.at(row, xi, n)
        np.add.at(col, yi, n)
        return pa.table({
            x: xs, y: ys, "n": g["n"],
            "row_total": pa.array(row[xi]),
            "col_total": pa.array(col[yi]),
            "grand_total": pa.array(np.full(len(n), n.sum(), np.int64)),
        })

    # NULL-safe composite group keys for the cell exchange
    def keyed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        # type= is REQUIRED on the 0-row batch (null-type inference class)
        gx = _pc.coalesce(_pc.binary_join_element_wise(
            pa.array(["T"] * t.num_rows, type=pa.string()),
            t[x].cast(pa.string()), ""),
            pa.array(["N"] * t.num_rows, type=pa.string()))
        gy = _pc.coalesce(_pc.binary_join_element_wise(
            pa.array(["T"] * t.num_rows, type=pa.string()),
            t[y].cast(pa.string()), ""),
            pa.array(["N"] * t.num_rows, type=pa.string()))
        return t.append_column("gx", gx).append_column("gy", gy)

    cells = (
        ds.select_columns([x, y])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .map_batches(keyed, batch_format="pyarrow")
        .groupby(["gx", "gy"])
        .map_groups(cell, batch_format="pyarrow")
    )
    return (
        cells.groupby("k")
        .map_groups(marginals, batch_format="pyarrow")
        .select_columns([x, y, "n", "row_total", "col_total", "grand_total"])
    )


def benford_digits(ds, col: str, group_col: str):
    """Leading-significant-digit distribution per group (the Benford's-law
    data-quality audit): synthetic, templated or unit-mangled numeric
    columns show digit distributions far from both Benford and the
    organic baseline, so per-group digit histograms are a cheap forgery /
    pipeline-bug dial. Rows with ``col`` < 1 are excluded (no leading
    significant digit at integer precision); the digit is computed by
    integer division — never float log10 — so the result is exact and
    SQL-mirrorable via substr(cast(floor(x) as bigint), 1, 1).

    Per-batch bincount partials over (group-dict code, digit) bound every
    exchange row count at groups-per-batch x 9; a per-task combine level
    then one driver fold finish (the histogram pattern — bounded output,
    O(1) driver state per (group, digit)).

    Returns a pyarrow Table (group_col, digit, n)."""
    from ..functions.collect import collect_table

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col], dtype=np.float64)
        ga = t[group_col]
        if isinstance(ga, pa.ChunkedArray):
            ga = ga.combine_chunks()
        gd = pc.dictionary_encode(ga)
        # nulls get their own group code, as SQL GROUP BY keeps them
        # (the contingency() pattern); a null dictionary index would
        # otherwise wrap to INT64_MIN and corrupt the bincount
        gi = np.asarray(pc.fill_null(gd.indices, -1)).astype(np.int64)
        ng = len(gd.dictionary) + 1
        gi = np.where(gi < 0, ng - 1, gi)
        # digits exist only for finite values in [1, 2^63); anything else
        # (NaN, inf, negatives, overflow) is excluded like SQL's WHERE
        mask = (v >= 1.0) & (v < float(1 << 63)) & np.isfinite(v)
        iv = np.floor(v[mask]).astype(np.int64)
        while True:
            big = iv >= 10
            if not big.any():
                break
            iv[big] //= 10
        counts = np.bincount(gi[mask] * 9 + (iv - 1), minlength=ng * 9)
        nz = np.flatnonzero(counts)
        labels = gd.dictionary.cast(pa.string()).to_pylist() + [None]
        return pa.table({
            group_col: pa.array([labels[i] for i in nz // 9], pa.string()),
            "digit": pa.array((nz % 9 + 1).astype(np.int64)),
            "n": pa.array(counts[nz].astype(np.int64)),
        })

    def combine(t: pa.Table) -> pa.Table:
        ga = t[group_col]
        if isinstance(ga, pa.ChunkedArray):
            ga = ga.combine_chunks()
        gd = pc.dictionary_encode(ga)
        gi = np.asarray(pc.fill_null(gd.indices, -1)).astype(np.int64)
        ng = len(gd.dictionary) + 1
        gi = np.where(gi < 0, ng - 1, gi)
        d = np.asarray(t["digit"]).astype(np.int64)
        n = np.asarray(t["n"]).astype(np.int64)
        tot = np.zeros(ng * 9, np.int64)
        np.add.at(tot, gi * 9 + (d - 1), n)
        nz = np.flatnonzero(tot)
        labels = gd.dictionary.cast(pa.string()).to_pylist() + [None]
        return pa.table({
            group_col: pa.array([labels[i] for i in nz // 9], pa.string()),
            "digit": pa.array((nz % 9 + 1).astype(np.int64)),
            "n": pa.array(tot[nz]),
        })

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([(group_col, pa.string()),
                                ("digit", pa.int64()), ("n", pa.int64())]),
    )
    return combine(parts) if parts.num_rows else parts


def ind_discovery(columns, *, num_buckets: int = 64,
                  batch_size: int | None = None) -> pa.Table:
    """Inclusion-dependency discovery (the foreign-key-candidate profiling
    primitive, the cross-TABLE sibling of ``fd_violations``): for every
    directed pair of candidate integer columns from DIFFERENT tables,
    report |distinct(lhs)|, |distinct(lhs) ∩ distinct(rhs)| and whether
    lhs ⊆ rhs holds — lhs ⊆ rhs with high overlap is a FK candidate.

    ``columns``: list of (name, dataset, column) — each dataset already
    pruned to its one integer column.

    Scale shape: C candidate columns share ONE value-bucketed exchange —
    each column's batches emit batch-distinct values tagged with the
    column id (pre-deduped, so the exchange carries per-batch distinct
    values, never rows); each bucket group builds an (n_values, C) 0/1
    membership matrix and emits the CxC Gram matrix M.T @ M (diagonal =
    per-column distinct-in-bucket, off-diagonal = pairwise overlap); a
    pair-id groupby sums the per-bucket C^2 partials, and the driver
    assembles the <= C^2-row result. No broadcast, no per-pair passes:
    one read of each column regardless of pair count. C <= 63 enforced
    (bitmask-free here, but keeps the group fold's matmul bounded).

    Returns a pyarrow Table (lhs, rhs, n_lhs, n_overlap, included),
    cross-table directed pairs only, sorted by (lhs, rhs)."""
    import ray.data  # noqa: F401  (Dataset.union)

    C = len(columns)
    if C > 63:
        raise ValueError(f"ind_discovery: {C} candidate columns > 63")
    names = [n for n, _, _ in columns]
    tables = [n.split(".", 1)[0] for n in names]

    def make_partial(col_id: int, col: str):
        def partial(t: pa.Table) -> pa.Table:
            a = t[col]
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            v = np.unique(np.asarray(a.drop_null()).astype(np.int64))
            return pa.table({
                "bucket": pa.array(v % np.int64(num_buckets)),
                "value": pa.array(v),
                "col_id": pa.array(np.full(len(v), col_id, np.int64)),
            })
        return partial

    tagged = None
    for i, (_, ds, col) in enumerate(columns):
        part = ds.map_batches(make_partial(i, col), batch_format="pyarrow",
                              batch_size=batch_size)
        tagged = part if tagged is None else tagged.union(part)

    def gram(g: pa.Table) -> pa.Table:
        v = np.asarray(g["value"]).astype(np.int64)
        c = np.asarray(g["col_id"]).astype(np.int64)
        _, inv = np.unique(v, return_inverse=True)
        m = np.zeros((int(inv.max()) + 1, C), np.int64)
        m[inv, c] = 1
        gm = m.T @ m
        lhs, rhs = np.divmod(np.arange(C * C, dtype=np.int64), C)
        return pa.table({
            "pair_id": pa.array(lhs * C + rhs),
            "n": pa.array(gm.reshape(-1)),
        })

    folded = collect_table(
        tagged.groupby("bucket").map_groups(gram, batch_format="pyarrow")
        .groupby("pair_id").sum("n"),
        empty_schema=pa.schema([("pair_id", pa.int64()),
                                ("sum(n)", pa.int64())]))
    acc = np.zeros(C * C, np.int64)
    if folded.num_rows:
        acc[np.asarray(folded["pair_id"]).astype(np.int64)] = \
            np.asarray(folded["sum(n)"]).astype(np.int64)
    out = {"lhs": [], "rhs": [], "n_lhs": [], "n_overlap": [], "included": []}
    for i in range(C):
        for j in range(C):
            if i == j or tables[i] == tables[j]:
                continue
            n_lhs, n_ov = int(acc[i * C + i]), int(acc[i * C + j])
            out["lhs"].append(names[i])
            out["rhs"].append(names[j])
            out["n_lhs"].append(n_lhs)
            out["n_overlap"].append(n_ov)
            out["included"].append(1 if n_ov == n_lhs else 0)
    tbl = pa.table({k: pa.array(v, pa.string() if k in ("lhs", "rhs")
                                else pa.int64()) for k, v in out.items()})
    order = pc.sort_indices(tbl, sort_keys=[("lhs", "ascending"),
                                            ("rhs", "ascending")])
    return tbl.take(order)


def rollup_counts(ds, a: str, b: str, val: str, *,
                  cube: bool = False) -> pa.Table:
    """Two-level ROLLUP aggregate — (a, b), (a), and grand-total counts +
    measure sums from ONE finest-level fold (the OLAP cube primitive; at
    100 TB the coarser levels must derive from the finest partials, never
    from extra corpus passes). Null dimension values fold into '*' BEFORE
    grouping on both sides (the oracle coalesces pre-GROUP BY, so engine
    and SQL agree by construction); the ``lvl`` column (0 finest, 1 per-a,
    2 grand) disambiguates rollup rows from literal '*' values.

    ``cube=True`` adds the per-b grouping set from the SAME finest fold
    (full GROUP BY CUBE(a, b)); levels then follow the SQL GROUPING
    bit-pattern — 0 finest, 1 per-a (b grouped out), 2 per-b (a grouped
    out), 3 grand.

    Per-batch partials are bounded by distinct (a, b) pairs per batch, a
    per-task combine level keeps the driver fold O(cardinality), and the
    rollup derivation is a vectorized pass over the finest table.

    Returns a pyarrow Table (a, b, lvl, n, sum_val)."""
    from ..functions.collect import collect_table

    def partial(t: pa.Table) -> pa.Table:
        av = t[a].combine_chunks() if isinstance(t[a], pa.ChunkedArray) else t[a]
        bv = t[b].combine_chunks() if isinstance(t[b], pa.ChunkedArray) else t[b]
        av = pc.fill_null(av.cast(pa.string()), "*")
        bv = pc.fill_null(bv.cast(pa.string()), "*")
        v = np.asarray(pc.fill_null(t[val], 0)).astype(np.int64)
        ad, bd = pc.dictionary_encode(av), pc.dictionary_encode(bv)
        ai = np.asarray(ad.indices).astype(np.int64)
        bi = np.asarray(bd.indices).astype(np.int64)
        nb = len(bd.dictionary)
        code = ai * nb + bi
        n = np.bincount(code)
        s = np.zeros(len(n), np.int64)
        np.add.at(s, code, v)
        nz = np.flatnonzero(n)
        return pa.table({
            a: pc.take(ad.dictionary.cast(pa.string()), pa.array(nz // nb)),
            b: pc.take(bd.dictionary.cast(pa.string()), pa.array(nz % nb)),
            "n": pa.array(n[nz].astype(np.int64)),
            "sum_val": pa.array(s[nz]),
        })

    def combine(t: pa.Table) -> pa.Table:
        key = np.char.add(np.char.add(
            np.asarray(t[a]).astype("U"), "\x1f"),
            np.asarray(t[b]).astype("U"))
        uk, inv = np.unique(key, return_inverse=True)
        n = np.zeros(len(uk), np.int64)
        s = np.zeros(len(uk), np.int64)
        np.add.at(n, inv, np.asarray(t["n"]).astype(np.int64))
        np.add.at(s, inv, np.asarray(t["sum_val"]).astype(np.int64))
        # reshape(-1, 3): empty uk would otherwise be 1-D (r5 probe)
        parts = np.char.partition(uk, "\x1f").reshape(-1, 3)
        return pa.table({
            a: pa.array(parts[:, 0]), b: pa.array(parts[:, 2]),
            "n": pa.array(n), "sum_val": pa.array(s),
        })

    finest = collect_table(
        ds.select_columns([a, b, val])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([(a, pa.string()), (b, pa.string()),
                                ("n", pa.int64()), ("sum_val", pa.int64())]))
    if finest.num_rows:
        finest = combine(finest)
    # empty input still yields the grand-total row (n=0, sum_val=0),
    # matching GROUP BY ROLLUP's () grouping set with coalesce(sum, 0)
    av = np.asarray(finest[a]).astype("U")
    bv = np.asarray(finest[b]).astype("U")
    n = np.asarray(finest["n"]).astype(np.int64)
    s = np.asarray(finest["sum_val"]).astype(np.int64)
    ua, ainv = np.unique(av, return_inverse=True)
    n1 = np.zeros(len(ua), np.int64)
    s1 = np.zeros(len(ua), np.int64)
    np.add.at(n1, ainv, n)
    np.add.at(s1, ainv, s)
    if cube:
        ub, binv = np.unique(bv, return_inverse=True)
        n2 = np.zeros(len(ub), np.int64)
        s2 = np.zeros(len(ub), np.int64)
        np.add.at(n2, binv, n)
        np.add.at(s2, binv, s)
        out_a = np.concatenate([av, ua, np.full(len(ub), "*"), ["*"]])
        out_b = np.concatenate([bv, np.full(len(ua), "*"), ub, ["*"]])
        out_l = np.concatenate([np.zeros(len(av), np.int64),
                                np.ones(len(ua), np.int64),
                                np.full(len(ub), 2, np.int64), [3]])
        out_n = np.concatenate([n, n1, n2, [n.sum()]])
        out_s = np.concatenate([s, s1, s2, [s.sum()]])
    else:
        out_a = np.concatenate([av, ua, ["*"]])
        out_b = np.concatenate([bv, np.full(len(ua), "*"), ["*"]])
        out_l = np.concatenate([np.zeros(len(av), np.int64),
                                np.ones(len(ua), np.int64), [2]])
        out_n = np.concatenate([n, n1, [n.sum()]])
        out_s = np.concatenate([s, s1, [s.sum()]])
    tbl = pa.table({a: pa.array(out_a), b: pa.array(out_b),
                    "lvl": pa.array(out_l), "n": pa.array(out_n),
                    "sum_val": pa.array(out_s)})
    order = pc.sort_indices(tbl, sort_keys=[
        ("lvl", "ascending"), (a, "ascending"), (b, "ascending")])
    return tbl.take(order)
