"""Distribution-drift checks vs a reference snapshot (north_star: KS/PSI over
per-partition t-digest quantiles and span-kind histograms).

A *snapshot* is a JSON manifest (written by ``take_snapshot``) holding, per
tracked column: fixed histogram edges + counts, the merged t-digest, and the
span-kind histogram for the interleaved table. ``drift_scores`` streams the
current corpus once, builds the same partials, and scores:

- **PSI** over the snapshot's fixed bins:  Σ (p−q)·ln(p/q) with ε-smoothing.
- **KS** statistic: max |ECDF_cur − ECDF_snap| evaluated on the merged
  t-digest centroids of both sides (the sketch-space approximation of the
  two-sample KS — exact to within digest resolution).

Scores are floats -> no SQL oracle (the bin-count building block in
``stages/stats.histogram`` is the oracle-checked piece); thresholds gate
pass/fail per column.
"""

from __future__ import annotations

import json

import numpy as np

from ..functions.collect import collect_table
from ..state.sketches import TDigest
from .stats import column_profile, histogram


def take_snapshot(ds, numeric_cols: list[str], *, nbins: int = 20) -> dict:
    """Build the reference snapshot manifest for ``numeric_cols``."""
    snap: dict = {"version": 1, "columns": {}}
    for col in numeric_cols:
        prof = column_profile(ds, col)
        td = TDigest.from_rows(prof["tdigest"])
        lo = float(td.quantile(0.001))
        hi = float(td.quantile(0.999)) + 1e-9
        hist = histogram(ds, col, lo=int(np.floor(lo)), hi=int(np.ceil(hi)), nbins=nbins)
        counts = [r["count"] for r in sorted(hist.take_all(), key=lambda r: r["bin"])]
        snap["columns"][col] = {
            "lo": int(np.floor(lo)),
            "hi": int(np.ceil(hi)),
            "nbins": nbins,
            "counts": counts,
            "tdigest": prof["tdigest"],
            "n": prof["n"],
        }
    return snap


def psi(p_counts: np.ndarray, q_counts: np.ndarray) -> float:
    """PSI with add-one (Laplace) smoothing. Epsilon-clipping instead would
    charge ~0.5 PSI per empty bin, falsely flagging every small partition
    (25 samples over 20 bins leave half the bins empty by chance)."""
    p = (p_counts + 1.0) / (p_counts.sum() + len(p_counts))
    q = (q_counts + 1.0) / (q_counts.sum() + len(q_counts))
    return float(((p - q) * np.log(p / q)).sum())


def ks_from_digests(a: TDigest, b: TDigest) -> float:
    """Max ECDF gap evaluated at the union of centroid means."""
    if a.means.size == 0 or b.means.size == 0:
        return float("nan")
    xs = np.union1d(a.means, b.means)

    def ecdf(d: TDigest, x: np.ndarray) -> np.ndarray:
        cum = np.cumsum(d.weights) - d.weights / 2.0
        total = d.weights.sum()
        return np.interp(x, d.means, cum / total, left=0.0, right=1.0)

    return float(np.abs(ecdf(a, xs) - ecdf(b, xs)).max())


def drift_scores(ds, snapshot: dict, *, psi_threshold: float = 0.2,
                 ks_threshold: float = 0.15):
    """Score the current dataset against a snapshot. Returns
    Dataset[col, psi, ks, drifted] (floats + bool; rows-only check)."""
    import pyarrow as pa
    import ray.data as rd

    cols, psis, kss, flags = [], [], [], []
    for col, ref in snapshot["columns"].items():
        hist = histogram(ds, col, lo=ref["lo"], hi=ref["hi"], nbins=ref["nbins"])
        cur_counts = np.array(
            [r["count"] for r in sorted(hist.take_all(), key=lambda r: r["bin"])],
            dtype=np.float64,
        )
        ref_counts = np.asarray(ref["counts"], dtype=np.float64)
        prof = column_profile(ds, col)
        ks = ks_from_digests(
            TDigest.from_rows(prof["tdigest"]), TDigest.from_rows(ref["tdigest"])
        )
        p = psi(cur_counts, ref_counts)
        cols.append(col)
        psis.append(p)
        kss.append(ks)
        flags.append(bool(p > psi_threshold or ks > ks_threshold))
    return rd.from_arrow(
        pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "psi": pa.array(psis, pa.float64()),
                "ks": pa.array(kss, pa.float64()),
                "drifted": pa.array(flags),
            }
        )
    )


def drift_by_group(ds, group_col: str, snapshot: dict, *,
                   psi_threshold: float = 0.2, ks_threshold: float = 0.15):
    """Per-group drift vs the snapshot in ONE streaming pass per tracked
    column (not one filtered scan per group): each batch emits per-group
    (bin-count, digest) partials; the driver folds n_groups x nbins ints +
    n_groups digests. The per-partition KS/PSI check of the north_star.
    Returns Dataset[group, col, psi, ks, drifted]."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from ..state.sketches import TDigest

    out_rows = []
    for col, ref in snapshot["columns"].items():
        lo, hi, nbins = ref["lo"], ref["hi"], ref["nbins"]
        w = (hi - lo) / nbins

        def partial(t: pa.Table, col=col, lo=lo, w=w, nbins=nbins) -> pa.Table:
            groups = t[group_col]
            if isinstance(groups, pa.ChunkedArray):
                groups = groups.combine_chunks()
            import pyarrow.compute as pc

            da = pc.dictionary_encode(groups)
            codes = np.asarray(da.indices).astype(np.int64)
            gnames = da.dictionary.to_pylist()
            v = np.asarray(t[col]).astype(np.float64)
            b = np.clip(np.floor((v - lo) / w).astype(np.int64), 0, nbins - 1)
            counts = np.bincount(codes * nbins + b,
                                 minlength=len(gnames) * nbins).reshape(len(gnames), nbins)
            tds = []
            order = np.argsort(codes, kind="stable")
            bounds = np.searchsorted(codes[order], np.arange(len(gnames)))
            ends = np.append(bounds[1:], len(codes))
            for gi in range(len(gnames)):
                tds.append(json.dumps(
                    TDigest.from_values(v[order[bounds[gi]:ends[gi]]]).to_rows()))
            return pa.table(
                {
                    "grp": pa.array(gnames, pa.string()),
                    "counts": pa.array(list(counts.astype(np.int64))),
                    "td": pa.array(tds, pa.string()),
                }
            )

        parts = collect_table(ds.map_batches(partial, batch_format="pyarrow"))
        hist: dict[str, np.ndarray] = {}
        digests: dict[str, TDigest] = {}
        for row in parts.to_pylist():
            g = row["grp"]
            hist[g] = hist.get(g, np.zeros(nbins)) + np.asarray(row["counts"], np.float64)
            td = TDigest.from_rows(json.loads(row["td"]))
            digests[g] = digests[g].merge(td) if g in digests else td
        ref_counts = np.asarray(ref["counts"], dtype=np.float64)
        ref_td = TDigest.from_rows(ref["tdigest"])
        for g in sorted(hist):
            p = psi(hist[g], ref_counts)
            ks = ks_from_digests(digests[g], ref_td)
            out_rows.append(
                {"group": g, "col": col, "psi": p, "ks": ks,
                 "drifted": bool(p > psi_threshold or ks > ks_threshold)}
            )
    return rd.from_arrow(
        pa.table(
            {
                "group": pa.array([r["group"] for r in out_rows], pa.string()),
                "col": pa.array([r["col"] for r in out_rows], pa.string()),
                "psi": pa.array([r["psi"] for r in out_rows], pa.float64()),
                "ks": pa.array([r["ks"] for r in out_rows], pa.float64()),
                "drifted": pa.array([r["drifted"] for r in out_rows]),
            }
        )
    )


def kind_histogram(docs) -> dict[str, int]:
    """Span-kind value counts over the interleaved corpus — per-batch
    partial bincounts on the flattened kind column, driver fold."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    def partial(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        kinds = pc.list_flatten(spans).field("kind")
        da = pc.dictionary_encode(kinds)
        counts = np.bincount(np.asarray(da.indices), minlength=len(da.dictionary))
        return pa.table(
            {
                "kind": da.dictionary.cast("string"),
                "count": pa.array(counts.astype(np.int64)),
            }
        )

    parts = collect_table(docs.map_batches(partial, batch_format="pyarrow"))
    out: dict[str, int] = {}
    for row in parts.to_pylist():
        out[row["kind"]] = out.get(row["kind"], 0) + row["count"]
    return out


def kind_histogram_with_half(docs) -> tuple[dict[str, int], dict[str, int]]:
    """ONE streaming pass computing both the full span-kind histogram and
    the even-FNV-doc-half snapshot histogram (each batch hashes doc_id
    once and emits per-kind (count, count_even) partials) — q_kind_psi's
    fold; the two-scan shape it replaces read the corpus twice (review r5
    finding). Returns (current, snapshot_half)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import hash_str

    def partial(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        even_doc = (hash_str(np.asarray(t["doc_id"]).astype("U"))
                    % np.uint64(2) == 0)
        counts_per_doc = pc.list_value_length(spans).to_numpy(
            zero_copy_only=False).astype(np.int64)
        even_span = np.repeat(even_doc, counts_per_doc)
        kinds = pc.list_flatten(spans).field("kind")
        da = pc.dictionary_encode(kinds)
        idx = np.asarray(da.indices)
        n = len(da.dictionary)
        cur = np.bincount(idx, minlength=n)
        snap = np.bincount(idx[even_span], minlength=n)
        return pa.table({
            "kind": da.dictionary.cast("string"),
            "count": pa.array(cur.astype(np.int64)),
            "count_even": pa.array(snap.astype(np.int64)),
        })

    parts = collect_table(docs.map_batches(partial, batch_format="pyarrow"))
    cur: dict[str, int] = {}
    snap: dict[str, int] = {}
    for row in parts.to_pylist():
        cur[row["kind"]] = cur.get(row["kind"], 0) + row["count"]
        if row["count_even"]:
            snap[row["kind"]] = snap.get(row["kind"], 0) + row["count_even"]
    return cur, snap


def kind_drift(docs, snapshot_hist: dict[str, int], *, psi_threshold: float = 0.2):
    """PSI between the corpus's span-kind histogram and a snapshot histogram
    (north_star: span-kind histograms vs a reference snapshot). Returns
    Dataset[kind, snapshot_share, current_share, drifted] plus a total row."""
    import pyarrow as pa
    import ray.data as rd

    cur = kind_histogram(docs)
    keys = sorted(set(snapshot_hist) | set(cur))
    p = np.array([cur.get(k, 0) for k in keys], dtype=np.float64)
    q = np.array([snapshot_hist.get(k, 0) for k in keys], dtype=np.float64)
    total_psi = psi(p, q)
    ps = (p + 1) / (p.sum() + len(p))
    qs = (q + 1) / (q.sum() + len(q))
    contrib = (ps - qs) * np.log(ps / qs)
    return rd.from_arrow(
        pa.table(
            {
                "kind": pa.array(keys + ["__total__"], pa.string()),
                "snapshot_share": pa.array(list(qs) + [1.0], pa.float64()),
                "current_share": pa.array(list(ps) + [1.0], pa.float64()),
                "psi_contribution": pa.array(list(contrib) + [total_psi], pa.float64()),
                "drifted": pa.array([bool(total_psi > psi_threshold)] * (len(keys) + 1)),
            }
        )
    )


def save_snapshot(snapshot: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(snapshot, f)


def load_snapshot(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


# ------------------------------------------------------- fixed-point lane
# The float PSI/KS queries above are rows-only by design; these companions
# emit the SAME drift evidence as oracle-comparable integers
# (VERDICT r4 "Next round" #3):
# - PSI: the per-bin contribution (p-q)*ln(p/q) is ONE float product per
#   bin, floored to scale=1e6 fixed point BEFORE summation — the integer
#   sum is order-independent, so engine and SQL agree bit-for-bit as long
#   as both sides' libm ln agrees on identical doubles (same machine,
#   both resolve to the platform libm; validated by the parity suite).
# - KS: exact two-sample ECDF gap over the value grid computed entirely in
#   integers: |cs*N - cg*n| / (n*N) -> (scale*num) // den with Python ints
#   (no float, no overflow at any corpus size).

DRIFT_FP_SCALE = 1_000_000


def _psi_fp(cur: np.ndarray, ref: np.ndarray, scale: int) -> int:
    """Sum of per-bin floored fixed-point PSI contributions (Laplace
    smoothing, matching ``psi`` above)."""
    p = (cur + 1.0) / (cur.sum() + len(cur))
    q = (ref + 1.0) / (ref.sum() + len(ref))
    return int(np.floor(scale * (p - q) * np.log(p / q)).astype(np.int64).sum())


def drift_fp_by_group(ds, col: str, group_col: str, *, lo: int, hi: int,
                      nbins: int, scale: int = DRIFT_FP_SCALE):
    """Per-group drift of an integer column vs the WHOLE corpus as the
    reference, as fixed-point integers — the oracle-checkable companion of
    ``drift_by_group``. ONE distributed (group, value)-count fold
    (``stats.group_value_counts``: bounded by group x distinct-value
    cardinality) feeds both scores driver-side:

    - ``psi_fp``: fixed-bin PSI (same lo/hi/nbins convention as
      ``stats.histogram_by_group``) vs the global histogram.
    - ``ks_fp``: EXACT two-sample KS vs the global ECDF, integer-exact.

    Returns a pyarrow Table (group, n, psi_fp, ks_fp) sorted by group."""
    import pyarrow as pa

    from .stats import group_value_counts

    gs, vs, cs = group_value_counts(ds, col, group_col)
    uv = np.unique(vs)
    # global per-value counts on the uv grid
    gl = np.zeros(len(uv), np.int64)
    np.add.at(gl, np.searchsorted(uv, vs), cs)
    n_total = int(gl.sum())
    # FLOAT width + np.floor: the stats.histogram / DRIFT_PSI_SQL
    # convention — integer-truncated width diverges whenever (hi-lo)/nbins
    # is not integral and div-zeroes when hi-lo < nbins (review r5 finding)
    w = (hi - lo) / nbins
    bins_of_v = np.clip(np.floor((uv - lo) / w).astype(np.int64),
                        0, nbins - 1)
    ref_hist = np.zeros(nbins, np.float64)
    np.add.at(ref_hist, bins_of_v, gl.astype(np.float64))
    cg = np.cumsum(gl.astype(object))  # Python ints: overflow-free
    out_g, out_n, out_psi, out_ks = [], [], [], []
    starts = np.concatenate([[0], np.nonzero(gs[1:] != gs[:-1])[0] + 1]) \
        if len(gs) else np.zeros(0, np.int64)
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(gs)
        pos = np.searchsorted(uv, vs[s:e])
        cur_counts = np.zeros(len(uv), np.int64)
        cur_counts[pos] = cs[s:e]
        n_g = int(cur_counts.sum())
        cur_hist = np.zeros(nbins, np.float64)
        np.add.at(cur_hist, bins_of_v, cur_counts.astype(np.float64))
        cgrp = np.cumsum(cur_counts.astype(object))
        num = max(abs(int(a) * n_total - int(b) * n_g)
                  for a, b in zip(cgrp, cg)) if len(uv) else 0
        out_g.append(str(gs[s]))
        out_n.append(n_g)
        out_psi.append(_psi_fp(cur_hist, ref_hist, scale))
        out_ks.append((scale * num) // max(n_g * n_total, 1))
    return pa.table({
        "group": pa.array(out_g, pa.string()),
        "n": pa.array(out_n, pa.int64()),
        "psi_fp": pa.array(out_psi, pa.int64()),
        "ks_fp": pa.array(out_ks, pa.int64()),
    })


def kind_drift_fp(docs, snapshot_hist: dict[str, int], *,
                  scale: int = DRIFT_FP_SCALE):
    """Fixed-point span-kind histogram drift — the oracle-checkable
    companion of ``kind_drift``: per-kind integer counts + the floored
    fixed-point PSI contribution, plus a ``__total__`` row whose
    ``contrib_fp`` is the (order-independent) integer sum. Key universe =
    union of both sides' kinds, Laplace-smoothed like ``psi``."""
    return kind_drift_fp_from_hists(kind_histogram(docs), snapshot_hist,
                                    scale=scale)


def kind_drift_fp_from_hists(cur: dict[str, int],
                             snapshot_hist: dict[str, int], *,
                             scale: int = DRIFT_FP_SCALE):
    """``kind_drift_fp`` over already-folded histograms (the one-pass
    ``kind_histogram_with_half`` feed)."""
    import pyarrow as pa

    keys = sorted(set(snapshot_hist) | set(cur))
    p = np.array([cur.get(k, 0) for k in keys], dtype=np.float64)
    q = np.array([snapshot_hist.get(k, 0) for k in keys], dtype=np.float64)
    ps = (p + 1.0) / (p.sum() + len(p))
    qs = (q + 1.0) / (q.sum() + len(q))
    contrib = np.floor(scale * (ps - qs) * np.log(ps / qs)).astype(np.int64)
    return pa.table({
        "kind": pa.array(keys + ["__total__"], pa.string()),
        "cur_count": pa.array(
            [int(x) for x in p] + [int(p.sum())], pa.int64()),
        "snap_count": pa.array(
            [int(x) for x in q] + [int(q.sum())], pa.int64()),
        "contrib_fp": pa.array(
            list(contrib) + [int(contrib.sum())], pa.int64()),
    })
