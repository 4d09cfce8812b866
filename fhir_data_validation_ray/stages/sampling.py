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


def weighted_sample_by_hash(ds, weight_col: str, *, key: str = "doc_id"):
    """Per-row-probability deterministic sampling — the importance-resampling
    gate of quality-weighted data selection (DSIR-style, Xie et al. 2023):
    keep a row iff ``FNV(str(key)) % 1e6 < weight_col``, where ``weight_col``
    holds the row's keep probability in parts-per-million (computed upstream
    from quality / importance scores; values >= 1e6 always keep, <= 0 never).
    Same purity and composability as ``sample_by_hash`` — membership is a
    pure function of (key, weight), one stateless ``map_batches``, no RNG
    state, reproducible at any scale or partitioning."""

    def keep(t: pa.Table) -> pa.Table:
        h = (hash_str(_key_strings(t[key])) % np.uint64(SAMPLE_MOD)).astype(
            np.int64)
        w = t[weight_col]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        return t.filter(pa.array(h < np.asarray(w).astype(np.int64)))

    return ds.map_batches(keep, batch_format="pyarrow")


def _range_histogram(ds, key: str, lo: int, hi: int, num_buckets: int):
    """Distributed histogram of ``FNV(str(key))`` restricted to ``[lo, hi)``,
    split into ``num_buckets`` equal-width buckets. Per-batch bincount
    partials, a per-task combine level, then a driver fold of O(n_tasks)
    nonzero-bucket rows — driver state is one ``num_buckets`` array.
    Returns (counts ndarray, bucket width)."""
    from ..functions.collect import collect_table

    width = -(-(hi - lo) // num_buckets)  # ceil: buckets cover [lo, hi)
    full_hi = hi >= (1 << 64)

    def mask_range(h: np.ndarray) -> np.ndarray:
        m = h >= np.uint64(lo) if lo > 0 else np.ones(len(h), dtype=bool)
        if not full_hi:
            m &= h < np.uint64(hi)
        return m

    def partial(t: pa.Table) -> pa.Table:
        h = hash_str(_key_strings(t[key]))
        hm = h[mask_range(h)]
        b = ((hm - np.uint64(lo)) // np.uint64(width)).astype(np.int64)
        np.minimum(b, num_buckets - 1, out=b)
        cnt = np.bincount(b, minlength=num_buckets).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({"b": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(cnt[nz])})

    def combine(t: pa.Table) -> pa.Table:
        tot = np.zeros(num_buckets, dtype=np.int64)
        np.add.at(tot, np.asarray(t["b"]), np.asarray(t["cnt"]))
        nz = np.nonzero(tot)[0]
        return pa.table({"b": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(tot[nz])})

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([("b", pa.int64()), ("cnt", pa.int64())]),
    )
    counts = np.zeros(num_buckets, dtype=np.int64)
    if parts.num_rows:
        np.add.at(counts, np.asarray(parts["b"]), np.asarray(parts["cnt"]))
    return counts, width


def _resolve_rounds(num_buckets: int, max_rounds: int | None) -> int:
    """Rounds that GUARANTEE termination: the range width shrinks by
    ``num_buckets``× per round whatever the hash distribution (bucket
    COUNTS can shrink slowly on skewed-bit data — FNV of short numeric
    keys clusters at coarse granularity), so width reaches 1 (a forced
    break) within ceil(64 / log2(B)) rounds."""
    if max_rounds is not None:
        return max_rounds
    return int(np.ceil(64 / np.log2(num_buckets))) + 1


def sample_exact_n(ds, n: int, *, key: str = "doc_id", num_buckets: int = 4096,
                   max_boundary: int = 100_000,
                   max_rounds: int | None = None):
    """Deterministic EXACTLY-``n`` sample: the ``n`` rows with the smallest
    ``(FNV(str(key)), key)`` — the global ``ORDER BY hash LIMIT n`` of the
    hash-threshold family, without a global sort.

    Scale shape: iterative hash-range histogram refinement. Each round is one
    streaming bincount fold over the corpus (driver state = one
    ``num_buckets`` array); the bucket containing the n-th smallest hash
    narrows the range by ~``num_buckets``×, so a 10^12-row corpus reaches a
    ``max_boundary``-bounded boundary slice in 2-3 rounds. Only that slice —
    never the corpus — is collected and sorted to pick the last
    ``n - |below-threshold|`` keys; the final pass is a stateless filter
    (``hash < threshold`` OR key in the broadcast boundary set).

    Assumes near-unique keys (doc ids): duplicate key strings share a hash,
    and a duplicate-key row admitted at the boundary admits ALL rows with
    that key (set semantics), which can overshoot ``n`` — deterministic
    either way. ``n >= corpus`` returns the dataset unchanged; ``n == 0``
    returns an empty-filtered dataset with the input schema."""
    import ray

    from ..functions.collect import collect_table

    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    if n == 0:
        return ds.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")

    max_rounds = _resolve_rounds(num_buckets, max_rounds)
    lo, hi = 0, 1 << 64
    acc_below = 0  # rows with hash < lo, exact, from prior rounds
    in_bucket = 0
    for _ in range(max_rounds):
        counts, width = _range_histogram(ds, key, lo, hi, num_buckets)
        if lo == 0 and hi >= (1 << 64):
            total = int(counts.sum())
            if n >= total:
                return ds
        cum = np.cumsum(counts)
        bidx = int(np.searchsorted(cum, n - acc_below, side="left"))
        acc_below += int(cum[bidx - 1]) if bidx > 0 else 0
        lo = lo + bidx * width
        hi = min(lo + width, hi)
        in_bucket = int(counts[bidx])
        if n == acc_below or in_bucket <= max_boundary or hi - lo <= 1:
            break
    else:
        raise RuntimeError(
            f"sample_exact_n did not converge in {max_rounds} rounds "
            f"(boundary still {in_bucket} rows)")

    k = n - acc_below  # rows still needed from the boundary slice [lo, hi)
    keep_ref = None
    if k > 0:
        if in_bucket > max(8 * max_boundary, 1_000_000):
            raise RuntimeError(
                f"boundary slice holds {in_bucket} rows at width {hi - lo} — "
                "mass hash collision; raise max_boundary or change the key")

        def slice_rows(t: pa.Table) -> pa.Table:
            ksb = _key_strings(t[key])
            h = hash_str(ksb)
            m = h >= np.uint64(lo)
            if hi < (1 << 64):
                m &= h < np.uint64(hi)
            return pa.table({"k": pa.array(ksb[m]), "h": pa.array(h[m])})

        boundary = collect_table(
            ds.map_batches(slice_rows, batch_format="pyarrow"),
            empty_schema=pa.schema([("k", pa.string()), ("h", pa.uint64())]),
        )
        ks = _key_strings(boundary["k"])
        hcol = boundary["h"]
        if isinstance(hcol, pa.ChunkedArray):
            hcol = hcol.combine_chunks()
        hs = np.asarray(hcol).astype(np.uint64)
        order = np.lexsort((ks, hs))
        keep_ref = ray.put(ks[order[:k]])

    thr = lo

    def final_filter(t: pa.Table) -> pa.Table:
        ksb = _key_strings(t[key])
        h = hash_str(ksb)
        m = h < np.uint64(thr) if thr > 0 else np.zeros(len(h), dtype=bool)
        if keep_ref is not None:
            m |= np.isin(ksb, ray.get(keep_ref))
        return t.filter(pa.array(m))

    return ds.map_batches(final_filter, batch_format="pyarrow")


def sample_exact_n_by_group(ds, n: int, *, group_col: str,
                            key: str = "doc_id", num_buckets: int = 4096,
                            max_boundary: int = 100_000,
                            max_rounds: int | None = None):
    """Balanced EXACTLY-``n``-per-group sample: within every ``group_col``
    value, the ``n`` rows with the smallest ``(FNV(str(key)), key)`` —
    ``ORDER BY hash LIMIT n PARTITION BY group`` without a sort. Groups
    holding <= ``n`` rows keep every row (rare domains survive intact),
    which is the balanced-corpus construction a uniform global sample
    can't give.

    Scale shape: the ``sample_exact_n`` histogram refinement run for ALL
    groups in one shared pass per round — each round is one streaming fold
    emitting (group, bucket, count) rows against each unconverged group's
    CURRENT hash range (the range table ships in the task closure,
    O(#groups)); converged groups drop out. One boundary pass collects all
    groups' boundary slices together (bounded by #groups × ``max_boundary``)
    and the final pass filters with a broadcast per-group threshold + keep
    set. Stated assumption: bounded group cardinality (sources / domains /
    languages) — the same as ``histogram_by_group``."""
    import ray

    from ..functions.collect import collect_table

    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    if n == 0:
        return ds.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")

    FULL = 1 << 64

    def _gcols(t: pa.Table):
        gcol = t[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        return np.asarray(gcol).astype("U"), hash_str(_key_strings(t[key]))

    def _round_fold(ranges: dict | None) -> dict:
        """One streaming (group, bucket, count) fold. ``ranges`` maps group
        -> (lo, hi); None = first round, full range for every group."""
        snapshot = dict(ranges) if ranges is not None else None

        def bounds_of(grp: str):
            if snapshot is None:
                return 0, FULL
            return snapshot.get(grp, (None, None))

        def partial(t: pa.Table) -> pa.Table:
            g, h = _gcols(t)
            og, ob, oc = [], [], []
            for grp in np.unique(g):
                lo, hi = bounds_of(str(grp))
                if lo is None:
                    continue  # group already converged
                width = -(-(hi - lo) // num_buckets)
                m = g == grp
                hm = h[m]
                if lo > 0:
                    hm = hm[hm >= np.uint64(lo)]
                if hi < FULL:
                    hm = hm[hm < np.uint64(hi)]
                b = ((hm - np.uint64(lo)) // np.uint64(width)).astype(np.int64)
                np.minimum(b, num_buckets - 1, out=b)
                cnt = np.bincount(b, minlength=num_buckets)
                nz = np.nonzero(cnt)[0]
                og.extend([str(grp)] * len(nz))
                ob.append(nz.astype(np.int64))
                oc.append(cnt[nz].astype(np.int64))
            if not og:
                return pa.table({"g": pa.array([], pa.string()),
                                 "b": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table({"g": pa.array(og),
                             "b": pa.array(np.concatenate(ob)),
                             "cnt": pa.array(np.concatenate(oc))})

        def combine(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            gcol = t["g"]
            if isinstance(gcol, pa.ChunkedArray):
                gcol = gcol.combine_chunks()
            da = pc.dictionary_encode(gcol)
            code = np.asarray(da.indices, dtype=np.int64)
            packed = code * num_buckets + np.asarray(t["b"], dtype=np.int64)
            tot = np.bincount(
                packed, weights=np.asarray(t["cnt"], dtype=np.int64),
                minlength=len(da.dictionary) * num_buckets).astype(np.int64)
            nz = np.nonzero(tot)[0]
            return pa.table({
                "g": da.dictionary.take(pa.array(nz // num_buckets)),
                "b": pa.array((nz % num_buckets).astype(np.int64)),
                "cnt": pa.array(tot[nz]),
            })

        parts = collect_table(
            ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(combine, batch_format="pyarrow", batch_size=64),
            empty_schema=pa.schema([("g", pa.string()), ("b", pa.int64()),
                                    ("cnt", pa.int64())]),
        )
        counts: dict[str, np.ndarray] = {}
        if parts.num_rows:
            gcol = parts["g"]
            if isinstance(gcol, pa.ChunkedArray):
                gcol = gcol.combine_chunks()
            gs = np.asarray(gcol).astype("U")
            bs = np.asarray(parts["b"]).astype(np.int64)
            cs = np.asarray(parts["cnt"]).astype(np.int64)
            for grp in np.unique(gs):
                m = gs == grp
                arr = np.zeros(num_buckets, dtype=np.int64)
                np.add.at(arr, bs[m], cs[m])
                counts[str(grp)] = arr
        return counts

    max_rounds = _resolve_rounds(num_buckets, max_rounds)
    ranges: dict[str, tuple[int, int]] = {}
    acc: dict[str, int] = {}
    keep_all: set[str] = set()
    thr: dict[str, int] = {}          # converged: keep hash < thr
    boundary: dict[str, tuple[int, int, int]] = {}  # g -> (lo, hi, k)

    counts = _round_fold(None)
    for grp, c in counts.items():
        if int(c.sum()) <= n:
            keep_all.add(grp)
        else:
            ranges[grp] = (0, FULL)
            acc[grp] = 0

    for _ in range(max_rounds):
        if not ranges:
            break
        for grp in list(ranges):
            lo, hi = ranges[grp]
            c = counts[grp]
            width = -(-(hi - lo) // num_buckets)
            cum = np.cumsum(c)
            bidx = int(np.searchsorted(cum, n - acc[grp], side="left"))
            acc[grp] += int(cum[bidx - 1]) if bidx > 0 else 0
            lo2 = lo + bidx * width
            hi2 = min(lo2 + width, hi)
            in_bucket = int(c[bidx])
            k = n - acc[grp]
            if k == 0:
                thr[grp] = lo2
                del ranges[grp]
            elif in_bucket <= max_boundary or hi2 - lo2 <= 1:
                if in_bucket > max(8 * max_boundary, 1_000_000):
                    raise RuntimeError(
                        f"group {grp!r}: boundary slice holds {in_bucket} "
                        "rows — mass hash collision")
                boundary[grp] = (lo2, hi2, k)
                del ranges[grp]
            else:
                ranges[grp] = (lo2, hi2)
        if ranges:
            counts = _round_fold(ranges)
    if ranges:
        raise RuntimeError(
            f"sample_exact_n_by_group did not converge in {max_rounds} "
            f"rounds for groups {sorted(ranges)}")

    keep_sets: dict[str, np.ndarray] = {}
    if boundary:
        bsnap = dict(boundary)

        def slice_rows(t: pa.Table) -> pa.Table:
            g, h = _gcols(t)
            ksb = _key_strings(t[key])
            m = np.zeros(len(g), dtype=bool)
            for grp, (lo, hi, _) in bsnap.items():
                gm = g == grp
                gm &= h >= np.uint64(lo)
                if hi < FULL:
                    gm &= h < np.uint64(hi)
                m |= gm
            return pa.table({"g": pa.array(g[m]), "k": pa.array(ksb[m]),
                             "h": pa.array(h[m])})

        btab = collect_table(
            ds.map_batches(slice_rows, batch_format="pyarrow"),
            empty_schema=pa.schema([("g", pa.string()), ("k", pa.string()),
                                    ("h", pa.uint64())]),
        )
        gcol = btab["g"]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        gs = np.asarray(gcol).astype("U")
        ks = _key_strings(btab["k"])
        hcol = btab["h"]
        if isinstance(hcol, pa.ChunkedArray):
            hcol = hcol.combine_chunks()
        hs = np.asarray(hcol).astype(np.uint64)
        for grp, (lo, hi, k) in bsnap.items():
            m = gs == grp
            order = np.lexsort((ks[m], hs[m]))
            keep_sets[str(grp)] = ks[m][order[:k]]
            thr[str(grp)] = lo

    state_ref = ray.put((dict(thr), keep_sets, set(keep_all)))

    def final_filter(t: pa.Table) -> pa.Table:
        thr_d, keeps, all_d = ray.get(state_ref)
        g, h = _gcols(t)
        ksb = _key_strings(t[key])
        m = np.zeros(len(g), dtype=bool)
        for grp in np.unique(g):
            gm = g == grp
            gs_ = str(grp)
            if gs_ in all_d:
                m |= gm
                continue
            tg = thr_d.get(gs_, 0)
            sel = gm & (h < np.uint64(tg)) if tg > 0 else np.zeros(
                len(g), dtype=bool)
            if gs_ in keeps:
                sel |= gm & np.isin(ksb, keeps[gs_])
            m |= sel
        return t.filter(pa.array(m))

    return ds.map_batches(final_filter, batch_format="pyarrow")


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


NEG_BUCKETS = 256


def negative_samples(docs, *, n_total: int, k: int = 4,
                     batch_size: int | None = None):
    """Deterministic negative sampling for contrastive training pairs:
    for every document ``d`` and slot ``j < k`` the candidate negative is
    the document with id ``FNV("{d}:{j}") % n_total`` — a pure function of
    (doc_id, slot), so the pair set is reproducible across runs, engines
    and partitionings (the hash-threshold sampling argument, same FNV fold
    as the DuckDB oracle). Candidates pointing at the anchor itself or at
    a SAME-source document are dropped (a negative from the anchor's own
    source is likely a near-positive), so a slot can come back empty —
    exactly SQL inner-join + ``t.source <> c.source`` semantics, NULL
    sources dropped on both sides.

    Assumes doc ids are dense in ``[0, n_total)`` (the standard re-indexed
    training-corpus layout; ids outside simply never get picked and a
    candidate id with no document row is dropped by the join).

    Scale shape: candidate generation is a stateless k-row-per-doc
    ``map_batches`` expansion (k is small); resolving each candidate's
    source is ONE role-tagged bucket exchange — candidates route by
    ``neg_id % NEG_BUCKETS``, the (doc_id, source) directory routes by
    ``doc_id % NEG_BUCKETS``, and each group resolves vectorized via
    sorted-id searchsorted. Group size is ~(k+1)/NEG_BUCKETS of the
    corpus; nothing is broadcast or driver-collected.

    Returns Dataset[doc_id, slot, neg_id, neg_source]."""
    import pyarrow.compute as pc

    if n_total <= 0:
        raise ValueError("n_total must be positive")

    def _frame(bucket, role, neg_id, slot, doc_id, src_a, src_b):
        return pa.table({
            "bucket": pa.array(bucket, pa.int64()),
            "role": pa.array(role, pa.int64()),
            "neg_id": pa.array(neg_id, pa.int64()),
            "slot": pa.array(slot, pa.int64()),
            "doc_id": pa.array(doc_id, pa.int64()),
            "src_a": src_a if isinstance(src_a, pa.Array)
            else pa.array(src_a, pa.string()),
            "src_b": src_b if isinstance(src_b, pa.Array)
            else pa.array(src_b, pa.string()),
        })

    def gen(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["source"]))
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        n = len(ids)
        rep = np.repeat(ids, k)
        slots = np.tile(np.arange(k, dtype=np.int64), n)
        keys = np.char.add(np.char.add(rep.astype("U"), ":"),
                           slots.astype("U"))
        neg = (hash_str(keys) % np.uint64(n_total)).astype(np.int64)
        keep = neg != rep
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        src_rep = src.take(pa.array(np.repeat(np.arange(n), k)[keep]))
        return _frame(neg[keep] % NEG_BUCKETS, np.ones(keep.sum(), np.int64),
                      neg[keep], slots[keep], rep[keep], src_rep,
                      pa.nulls(int(keep.sum()), pa.string()))

    def directory(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["source"]))
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        n = len(ids)
        return _frame(ids % NEG_BUCKETS, np.zeros(n, np.int64), ids,
                      np.full(n, -1, np.int64), np.full(n, -1, np.int64),
                      pa.nulls(n, pa.string()), src)

    def resolve(g: pa.Table) -> pa.Table:
        role = np.asarray(g["role"]).astype(np.int64)
        nid = np.asarray(g["neg_id"]).astype(np.int64)
        m0, m1 = role == 0, role == 1
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "slot": pa.array([], pa.int64()),
                          "neg_id": pa.array([], pa.int64()),
                          "neg_source": pa.array([], pa.string())})
        if not m0.any() or not m1.any():
            return empty
        dir_ids = nid[m0]
        order = np.argsort(dir_ids)
        dir_ids = dir_ids[order]
        dir_src = np.asarray(g["src_b"].filter(pa.array(m0))).astype("U")[order]
        want = nid[m1]
        pos = np.searchsorted(dir_ids, want)
        pos_c = np.minimum(pos, len(dir_ids) - 1)
        found = dir_ids[pos_c] == want
        src_a = np.asarray(g["src_a"].filter(pa.array(m1))).astype("U")
        keep = found & (dir_src[pos_c] != src_a)
        if not keep.any():
            return empty
        return pa.table({
            "doc_id": pa.array(np.asarray(g["doc_id"]).astype(np.int64)[m1][keep]),
            "slot": pa.array(np.asarray(g["slot"]).astype(np.int64)[m1][keep]),
            "neg_id": pa.array(want[keep]),
            "neg_source": pa.array(dir_src[pos_c][keep]),
        })

    base = docs.select_columns(["doc_id", "source"])
    cand = base.map_batches(gen, batch_format="pyarrow",
                            batch_size=batch_size)
    direc = base.map_batches(directory, batch_format="pyarrow",
                             batch_size=batch_size)
    return (
        cand.union(direc)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )
