"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline stages: token counting, quality scoring,
language ID and document fingerprinting — each a vectorized Arrow/numpy
``map_batches`` kernel over ``(doc_id, text, ...)`` rows, with a DuckDB
oracle mirroring the exact same computation in SQL (integer / exact-division
outputs only, so value hashes compare bitwise).

No analogue in the reference repo (it validates hierarchical documents);
these extend the engine to corpus curation at the same Ray-Data-first shape:
stateless task stages, per-worker compiled state, no driver-side loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_str

# BPE-ish tokenization: alnum runs OR single non-space symbol. RE2 dialect —
# identical semantics in pyarrow (count_substring_regex) and DuckDB
# (regexp_extract_all), so oracle parity is exact.
BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
PUNCT_RE = r"[^A-Za-z0-9_\s]"

# per-language stopword marker sets for the n-gram/stopword-voting language
# ID heuristic (deterministic; ties resolve by list order)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "de", "que", "y", "los", "en"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "est"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"],
}
STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def _split_counts(texts: pa.Array, words: list[str]) -> np.ndarray:
    """Count whole-word occurrences of ``words`` per text (space-separated
    corpus): split -> flatten -> set membership -> per-doc bincount. RE2-free
    (no lookahead in RE2); SQL mirror is
    ``len(list_filter(string_split(text, ' '), w -> w IN (...)))``."""
    parts = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    hit = (
        pc.is_in(flat, value_set=pa.array(words, pa.string()))
        .to_numpy(zero_copy_only=False)
    )
    return np.bincount(parent[hit], minlength=len(texts)).astype(np.int64)


def text_features(docs, *, batch_size: int | None = None):
    """(doc_id, text) -> per-doc token counts + quality flags.

    Columns (all integers / exact divisions for oracle parity):
    ``n_ws_tokens`` whitespace tokens; ``n_bpe_tokens`` BPE-ish regex tokens;
    ``n_chars``; ``n_punct``; ``n_stop`` stopword hits; ``quality_ok``
    length/stopword/punctuation gate.
    """

    def feats(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_chars = pc.utf8_length(texts).fill_null(0)
        # whitespace tokens = split on single space (corpus is single-spaced)
        n_ws = pc.list_value_length(pc.split_pattern(texts, " ")).fill_null(0)
        n_bpe = pc.count_substring_regex(texts, BPE_TOKEN_RE).fill_null(0)
        n_punct = pc.count_substring_regex(texts, PUNCT_RE).fill_null(0)
        n_stop = _split_counts(texts, STOPWORDS)
        ws = n_ws.to_numpy(zero_copy_only=False).astype(np.int64)
        quality = (
            (ws >= 5)
            & (n_stop * 10 >= ws)  # stopword ratio >= 0.1, integer form
            & (n_punct.to_numpy(zero_copy_only=False).astype(np.int64) * 5 <= ws)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_ws_tokens": pc.cast(n_ws, pa.int64()),
                "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
                "n_chars": pc.cast(n_chars, pa.int64()),
                "n_punct": pc.cast(n_punct, pa.int64()),
                "n_stop": pa.array(n_stop.astype(np.int64)),
                "quality_ok": pa.array(quality),
            }
        )

    return docs.map_batches(feats, batch_format="pyarrow", batch_size=batch_size)


def badword_filter(docs, words, *, max_hits: int = 0,
                   batch_size: int | None = None):
    """C4-style blocklist gate (Raffel et al. 2020 §2.2 'bad words' filter):
    per-doc whole-word hit count over a small blocklist; ``keep`` = hits <=
    ``max_hits``. The blocklist ships in the task closure (tiny, fixed); one
    stateless vectorized map — no shuffle, no per-doc Python. Returns
    (doc_id, hits, keep); callers drop with ``keep == false``."""
    wl = sorted(set(words))

    def gate(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        hits = _split_counts(texts, wl)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "hits": pa.array(hits),
                "keep": pa.array(hits <= max_hits),
            }
        )

    return docs.map_batches(gate, batch_format="pyarrow", batch_size=batch_size)


def word_counts(docs, *, min_freq: int = 1, num_buckets: int = 64,
                batch_size: int | None = None):
    """EXACT corpus word counts: per-batch dictionary-encoded partials, one
    bucketed groupby for exact totals (a word's total lives entirely in its
    hash bucket), ``min_freq`` pruning applied INSIDE the bucket fold so
    only the surviving vocabulary leaves the exchange. Returns
    Dataset[word, n]. State bounded by vocabulary cardinality — the same
    stated assumption as the exact top-k lane; use ``top_words_sketch``
    past it."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat = pc.list_flatten(pc.split_pattern(texts, " "))
        da = pc.dictionary_encode(flat)
        counts = np.bincount(np.asarray(da.indices), minlength=len(da.dictionary))
        words = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        keep = words != ""
        words, counts = words[keep], counts[keep]
        return pa.table(
            {
                "bucket": pa.array((hash_str(words) % np.uint64(num_buckets)).astype(np.int32)),
                "word": pa.array(words, pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    def bucket_total(g: pa.Table) -> pa.Table:
        w = g["word"]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        da = pc.dictionary_encode(w)
        totals = np.bincount(np.asarray(da.indices), weights=np.asarray(g["n"]),
                             minlength=len(da.dictionary)).astype(np.int64)
        uw = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        keep = totals >= min_freq
        return pa.table({"word": pa.array(uw[keep], pa.string()),
                         "n": pa.array(totals[keep])})

    return (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("bucket")
        .map_groups(bucket_total, batch_format="pyarrow")
    )


BPE_EOW = "</w>"  # end-of-word marker, the classic Sennrich et al. 2016 setup


def bpe_merges(docs, n_merges: int = 32, *, min_freq: int = 2,
               num_buckets: int = 64, batch_size: int | None = None):
    """BPE vocabulary induction (Sennrich et al. 2016) — the tokenizer-
    training operator of an LLM data pipeline, in the standard two-part
    architecture (what HF tokenizers does): the CORPUS pass is the
    distributed exact word count above (the only part that touches 100 TB);
    the merge loop then runs over the BOUNDED (vocab-size) word/count
    table, never the corpus. Deterministic tie-break: highest pair count,
    then lexicographically smallest pair.

    Returns a pyarrow Table [rank, left, right, token] of merges in order.
    Rows-only correctness tier: property-tested against a hand-written
    per-word reference (no SQL analogue of an iterative argmax loop)."""
    from ..functions.collect import collect_table

    vocab_tbl = collect_table(
        word_counts(docs, min_freq=min_freq, num_buckets=num_buckets,
                    batch_size=batch_size),
        empty_schema=pa.schema([("word", pa.string()), ("n", pa.int64())]),
    )
    words = vocab_tbl["word"].to_numpy(zero_copy_only=False).astype("U") \
        if vocab_tbl.num_rows else np.empty(0, "U1")
    counts = np.asarray(vocab_tbl["n"]).astype(np.int64) \
        if vocab_tbl.num_rows else np.empty(0, np.int64)
    # deterministic processing order regardless of bucket arrival
    order = np.argsort(words)
    words, counts = words[order], counts[order]

    seqs = [tuple(w) + (BPE_EOW,) for w in words]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, c in zip(seqs, counts):
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + int(c)
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < max(min_freq, 2):
            break
        merges.append(best)
        a, b = best
        ab = a + b
        out = []
        for seq in seqs:
            if a not in seq:
                out.append(seq)
                continue
            ns, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    ns.append(ab)
                    i += 2
                else:
                    ns.append(seq[i])
                    i += 1
            out.append(tuple(ns))
        seqs = out
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(merges) + 1, dtype=np.int64)),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "token": pa.array([m[0] + m[1] for m in merges], pa.string()),
        }
    )


_BPE_WORD_CACHE: dict[int, dict[str, int]] = {}
_BPE_CACHE_MAX_WORDS = 4_000_000  # per-worker memo cap (~a few hundred MB)


def bpe_encode(docs, merges, *, batch_size: int | None = None):
    """Apply learned BPE merges — the tokenizer-INFERENCE half: per-doc
    token counts under the trained vocab (the real token-budget input for
    mixture quotas / packing, where the whitespace count is a proxy).

    ``merges`` is the Table returned by ``bpe_merges``. The rank dict ships
    once via ``ray.put``; each batch tokenizes only its UNIQUE words (a
    per-worker memo cache persists across batches, the module-level-cache
    pattern from stages/validator.py) and maps counts back to rows with a
    vectorized segment sum. Returns Dataset[doc_id, n_words, n_tokens]."""
    import ray

    ranks = {(l, r): i for i, (l, r) in
             enumerate(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))}
    ranks_ref = ray.put(ranks)
    # full-content key: two different merge tables in one worker process
    # must never share a memo (hash() is per-process stable, which is all
    # a per-worker cache needs)
    cache_key = hash(tuple(sorted(ranks.items())))

    def encode_word(w: str, rk: dict) -> int:
        seq = list(w) + [BPE_EOW]
        while len(seq) > 1:
            best, best_rank = -1, None
            for i in range(len(seq) - 1):
                r = rk.get((seq[i], seq[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best_rank is None:
                break
            seq[best:best + 2] = [seq[best] + seq[best + 1]]
        return len(seq)

    def enc(t: pa.Table) -> pa.Table:
        rk = ray.get(ranks_ref)
        memo = _BPE_WORD_CACHE.setdefault(cache_key, {})
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parts = pc.split_pattern(texts, " ")
        lens = pc.list_value_length(parts).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(parts)
        da = pc.dictionary_encode(flat)
        uniq = da.dictionary.to_pylist()
        per_word = np.empty(len(uniq), dtype=np.int64)
        for j, w in enumerate(uniq):
            if w == "":
                per_word[j] = 0
                continue
            n = memo.get(w)
            if n is None:
                n = encode_word(w, rk)
                if len(memo) < _BPE_CACHE_MAX_WORDS:  # bound worker memory
                    memo[w] = n
            per_word[j] = n
        tok = per_word[np.asarray(da.indices)] if len(uniq) else np.zeros(0, np.int64)
        cs = np.concatenate([[np.int64(0)], np.cumsum(tok)])
        ends = np.cumsum(lens)
        n_tokens = cs[ends] - cs[ends - lens]
        wcs = np.concatenate([[np.int64(0)], np.cumsum((tok > 0).astype(np.int64))])
        n_words = wcs[ends] - wcs[ends - lens]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words),
                "n_tokens": pa.array(n_tokens),
            }
        )

    return docs.map_batches(enc, batch_format="pyarrow", batch_size=batch_size)


def top_words_sketch(docs, k: int = 20, *, width: int = 1 << 16, depth: int = 4,
                     cand_per_batch: int = 256, batch_size: int | None = None):
    """Heavy hitters by Count-Min sketch — the UNBOUNDED-vocabulary lane
    next to the exact ``top_words`` (whose bucketed exchange assumes word
    totals fit a groupby; a 10^12-doc web corpus's tail vocabulary does
    not). Per-batch partial = one (CMS, local-candidates) row; partials
    merge associatively through the same two-level fold as the
    TDigest/HLL sketches — no shuffle of words anywhere, driver state is
    O(width x depth + candidates).

    One-sided guarantee inherited from CMS: estimates only overshoot, and a
    true heavy hitter is always in some batch's local top candidates, so
    top-k recall degrades gracefully (tested against the exact lane)."""
    import ray.data as rd

    from ..functions.collect import collect_table
    from ..state.sketches import CountMinSketch

    cand_cap = max(cand_per_batch * 4, k * 8)

    def _word_counts(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat = pc.list_flatten(pc.split_pattern(texts, " "))
        da = pc.dictionary_encode(flat)
        counts = np.bincount(np.asarray(da.indices), minlength=len(da.dictionary))
        words = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        keep = words != ""
        return words[keep], counts[keep].astype(np.int64)

    def _row(cms: CountMinSketch, cand: np.ndarray) -> pa.Table:
        return pa.table(
            {
                "cms": pa.array([cms.to_bytes()], pa.binary()),
                "cand": pa.array([list(cand)], pa.list_(pa.string())),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        words, counts = _word_counts(t)
        cms = CountMinSketch.empty(width, depth)
        cms.add_strings(words, counts)
        order = np.lexsort((words, -counts))[:cand_per_batch]
        return _row(cms, words[order])

    def _merge_rows(t: pa.Table) -> tuple[CountMinSketch, np.ndarray]:
        cms = CountMinSketch.empty(width, depth)
        cands: list[np.ndarray] = []
        for i in range(t.num_rows):
            cms = cms.merge(CountMinSketch.from_bytes(
                t["cms"][i].as_py(), width, depth))
            cands.append(np.asarray(t["cand"][i].as_py(), dtype="U"))
        cand = np.unique(np.concatenate(cands)) if cands else np.empty(0, "U1")
        return cms, cand

    def combine(t: pa.Table) -> pa.Table:
        cms, cand = _merge_rows(t)
        est = cms.estimate_strings(cand)
        order = np.lexsort((cand, -est))[:cand_cap]  # bounded combine output
        return _row(cms, cand[order])

    parts = collect_table(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([("cms", pa.binary()),
                                ("cand", pa.list_(pa.string()))]),
    )
    cms, cand = _merge_rows(parts)
    est = cms.estimate_strings(cand)
    order = np.lexsort((cand, -est))[:k]
    return rd.from_arrow(pa.table(
        {
            "word": pa.array(cand[order], pa.string()),
            "est_n": pa.array(est[order].astype(np.int64)),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        }
    ))


QS_DIM = 1 << 20          # hashed feature space (fasttext default 2M is close)
QS_MIX = 2654435761       # Knuth multiplicative mix for the arithmetic weights


def quality_score(docs, *, dim: int = QS_DIM, threshold: int = 0,
                  weights=None, batch_size: int | None = None):
    """Hashed-linear quality-classifier INFERENCE (the fasttext-style filter
    of CCNet/LLM curation pipelines): each word hashes into a ``dim``-bucket
    feature space, the bucket's weight is gathered, and the document score is
    the weight sum; ``keep = score >= threshold``.

    ``weights``: optional real trained weight vector (len ``dim``, int64) —
    broadcast ONCE via ``ray.put`` and gathered per batch. Default ``None``
    derives the weight arithmetically from the bucket index
    (``(bucket * QS_MIX) % 41 - 20``), which keeps the operator
    deterministic and lets the DuckDB oracle recompute scores bitwise from
    the same FNV fold — the probe is identical either way.

    Scale shape: stateless per-batch map — split, vectorized FNV, gather,
    segment-sum (cumsum-diff, safe on empty docs). No shuffle, no state."""
    import ray

    wref = None
    if weights is not None:
        w_arr = np.asarray(weights, dtype=np.int64)
        if len(w_arr) != dim:
            raise ValueError(f"weights must have len {dim}, got {len(w_arr)}")
        wref = ray.put(w_arr)

    def score(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parts = pc.split_pattern(texts, " ")
        lens = pc.list_value_length(parts).fill_null(0).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        flat = pc.list_flatten(parts)
        # hash only the batch's UNIQUE words (the U-string materialization
        # is the expensive step), then gather weights per occurrence
        da = pc.dictionary_encode(flat)
        uw = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        bucket = hash_str(uw) % np.uint64(dim)
        if wref is not None:
            wd = ray.get(wref)[bucket.astype(np.int64)]
        else:
            wd = ((bucket * np.uint64(QS_MIX)) % np.uint64(41)).astype(np.int64) - 20
        wd[uw == ""] = 0  # '' split artifacts carry no weight (SQL filters them)
        w = wd[np.asarray(da.indices, dtype=np.int64)]
        cs = np.concatenate([[np.int64(0)], np.cumsum(w)])
        ends = np.cumsum(lens)
        starts = ends - lens
        doc_score = cs[ends] - cs[starts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "q_score": pa.array(doc_score.astype(np.int64)),
                "keep": pa.array((doc_score >= threshold).astype(np.int64)),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", batch_size=batch_size)


def language_id(docs, *, batch_size: int | None = None):
    """Stopword-voting language ID: per-language marker hit counts, predict
    the argmax (ties -> first language in LANG_MARKERS order; zero hits ->
    'und'). Deterministic and expressible 1:1 in SQL."""
    langs = list(LANG_MARKERS)

    def lid(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        scores = np.stack([_split_counts(texts, LANG_MARKERS[l]) for l in langs])
        best = np.argmax(scores, axis=0)  # first max wins — matches SQL tie-break
        none = scores.max(axis=0) == 0
        pred = np.array(langs, dtype=object)[best]
        pred[none] = "und"
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pred_lang": pa.array(pred, pa.string()),
                "score": pa.array(scores.max(axis=0).astype(np.int64)),
            }
        )

    return docs.map_batches(lid, batch_format="pyarrow", batch_size=batch_size)


def fingerprints(docs, *, batch_size: int | None = None):
    """Order-sensitive 64-bit document fingerprint (FNV-1a over the full
    text) + order-insensitive SimHash over word features. Vectorized; EXACT
    SQL oracle — the FNV fold is reproduced bitwise in DuckDB via
    list_reduce + HUGEINT modmul (``pipelines/dataops.py:FINGERPRINTS_SQL``)."""

    def fp(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": pa.array(
                    hash_str(texts.to_numpy(zero_copy_only=False)).astype(np.int64)
                ),
                "simhash": pa.array(simhash_batch(texts).astype(np.int64)),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow", batch_size=batch_size)


WINNOW_K = 3  # words per k-gram
WINNOW_W = 4  # winnowing window, in k-gram positions


def winnow_fingerprints(docs, *, k: int = WINNOW_K, w: int = WINNOW_W,
                        column: str = "text",
                        batch_size: int | None = None):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    the MOSS local fingerprinting algorithm): hash every overlapping word
    k-gram, slide a ``w``-position window, keep each window's minimum hash
    (rightmost position on ties). Any shared run of ``w + k - 1`` words
    between two documents is guaranteed to share a selected fingerprint,
    while only ~2/(w+1) of positions are kept — the local, position-robust
    complement of the whole-document FNV/SimHash ``fingerprints``.

    One stateless vectorized map, no shuffle: the batch's k-gram hashes form
    one flat array; ``sliding_window_view`` + reversed ``argmin`` selects
    rightmost window minima, and window starts whose span crosses a document
    boundary are masked out. Documents with fewer than ``w`` k-gram
    positions emit no rows (whole-doc sketches cover them). Returns
    (doc_id, pos, fp) rows; fp is the gram FNV hash as signed int64."""

    def winnow(t: pa.Table) -> pa.Table:
        from .dedup import _gram_strings
        from ..functions.hashing import hash_str

        dcol = t["doc_id"]
        if isinstance(dcol, pa.ChunkedArray):
            dcol = dcol.combine_chunks()

        def empty() -> pa.Table:
            return pa.table({"doc_id": dcol.slice(0, 0),
                             "pos": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.int64())})

        parent, grams, n_pos, _ = _gram_strings(t, k, column)
        m = len(parent)
        if m < w:
            return empty()
        # hash the batch's UNIQUE grams only (the U-string materialization
        # is the expensive step), then gather per occurrence
        da = pc.dictionary_encode(grams)
        h_dict = hash_str(
            da.dictionary.to_numpy(zero_copy_only=False).astype("U"))
        h = h_dict[np.asarray(da.indices, dtype=np.int64)]
        sw = np.lib.stride_tricks.sliding_window_view(h, w)
        valid = parent[: m - w + 1] == parent[w - 1:]
        if not valid.any():
            return empty()
        a = np.argmin(sw[:, ::-1], axis=1)  # first-min reversed = rightmost
        sel = np.arange(m - w + 1, dtype=np.int64)[valid] + (
            w - 1 - a[valid])
        sel = np.unique(sel)
        pos_starts = np.zeros(len(n_pos), dtype=np.int64)
        np.cumsum(n_pos[:-1], out=pos_starts[1:])
        return pa.table({
            "doc_id": dcol.take(pa.array(parent[sel])),
            "pos": pa.array(sel - pos_starts[parent[sel]]),
            "fp": pa.array(h[sel].view(np.int64)),
        })

    return docs.map_batches(winnow, batch_format="pyarrow",
                            batch_size=batch_size)


def top_words(docs, k: int = 20, *, num_buckets: int = 64,
              batch_size: int | None = None):
    """EXACT global top-k words by occurrence count (vocabulary heavy
    hitters — the frequency profile a tokenizer/vocab build starts from).

    Plan: per-batch dictionary-encoded word counts (pre-aggregated, so the
    shuffle moves (bucket, word, count) partials, never tokens) -> one
    bucketed groupby (a word's total lives entirely in its hash bucket, so
    per-bucket totals are exact) -> per-bucket local top-k -> driver merge
    of num_buckets x k candidate rows. Deterministic tie-break: count DESC,
    word ASC. Returns Dataset[word, n, rank]."""
    import ray.data as rd

    from ..functions.collect import collect_table

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat = pc.list_flatten(pc.split_pattern(texts, " "))
        da = pc.dictionary_encode(flat)
        counts = np.bincount(np.asarray(da.indices), minlength=len(da.dictionary))
        words = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        keep = words != ""
        words, counts = words[keep], counts[keep]
        return pa.table(
            {
                "bucket": pa.array((hash_str(words) % np.uint64(num_buckets)).astype(np.int32)),
                "word": pa.array(words, pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    def bucket_topk(g: pa.Table) -> pa.Table:
        w = g["word"]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        da = pc.dictionary_encode(w)
        totals = np.bincount(np.asarray(da.indices), weights=np.asarray(g["n"]),
                             minlength=len(da.dictionary)).astype(np.int64)
        uw = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        order = np.lexsort((uw, -totals))[:k]
        return pa.table({"word": pa.array(uw[order], pa.string()),
                         "n": pa.array(totals[order])})

    cand = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pyarrow")
    )
    tbl = collect_table(
        cand, empty_schema=pa.schema([("word", pa.string()), ("n", pa.int64())])
    )
    w = tbl["word"].to_numpy(zero_copy_only=False).astype("U") if tbl.num_rows else np.empty(0, "U1")
    n = np.asarray(tbl["n"]).astype(np.int64) if tbl.num_rows else np.empty(0, np.int64)
    order = np.lexsort((w, -n))[:k]
    return rd.from_arrow(
        pa.table(
            {
                "word": pa.array(w[order], pa.string()),
                "n": pa.array(n[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )
    )


# PII patterns (RE2 dialect shared by pyarrow and DuckDB): applied in list
# order; counts are taken against the ORIGINAL text (the patterns target
# disjoint value shapes), redaction rewrites sequentially.
PII_PATTERNS: list[tuple[str, str]] = [
    ("nric", r"[STFG]\d{7}[A-Z]"),
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+\d{8,12}"),
]


def pii_redact(ds, *, column: str = "text",
               patterns: list[tuple[str, str]] = PII_PATTERNS,
               batch_size: int | None = None):
    """Detect-and-redact PII-shaped substrings (NRIC / email / phone) —
    the scrubbing pass a training-data pipeline runs before exporting text.
    Pure streaming map_batches of Arrow C++ regex kernels (count + replace);
    all non-``column`` columns pass through. Adds ``n_pii`` (total matches)
    and ``redacted`` (text with each match replaced by its [TYPE] token)."""

    def red(t: pa.Table) -> pa.Table:
        texts = t[column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        total = np.zeros(len(texts), dtype=np.int64)
        out = texts
        for name, pat in patterns:
            total += np.asarray(
                pc.count_substring_regex(texts, pat).fill_null(0)
            ).astype(np.int64)
            out = pc.replace_substring_regex(out, pat, f"[{name.upper()}]")
        keep = [c for c in t.column_names if c != column]
        cols = {c: t[c] for c in keep}
        cols["n_pii"] = pa.array(total)
        cols["redacted"] = out
        return pa.table(cols)

    return ds.map_batches(red, batch_format="pyarrow", batch_size=batch_size)


def repetition_stats(docs, *, batch_size: int | None = None):
    """Gopher-style per-document repetition signals — the "repeated content"
    quality gates a training-data pipeline applies before sampling (Rae et
    al. 2021 §A1.1: fraction of duplicate n-grams / most-common-word share).

    Columns (all exact integers, so the DuckDB oracle compares bitwise):
    ``n_words`` non-empty whitespace words; ``n_distinct_words``;
    ``top_word_n`` occurrences of the most frequent word; ``n_bigrams``;
    ``n_distinct_bigrams``; ``top_bigram_n``; and ``repetitive`` — True when
    the top word exceeds 20% of the doc (``top_word_n*5 > n_words``) OR
    fewer than 90% of bigrams are distinct (``n_distinct_bigrams*10 <
    n_bigrams*9``).

    Fully vectorized: dictionary-encode the flattened words (exact per-batch
    int ids — no hash-collision caveat), lexsort (doc, word_id) for per-doc
    distinct/top counts, adjacent-id pairs for bigrams. Stateless task stage;
    per-batch work only — embarrassingly parallel at any corpus size.
    """

    def _group_stats(parent: np.ndarray, keys: tuple[np.ndarray, ...], n: int):
        """Per-parent (distinct-group count, max group size) over rows keyed
        by ``keys`` — lexsort + boundary diffs, no Python loop."""
        if len(parent) == 0:
            z = np.zeros(n, dtype=np.int64)
            return z, z.copy()
        order = np.lexsort((*keys[::-1], parent))
        p = parent[order]
        new = np.ones(len(p), dtype=bool)
        np.not_equal(p[1:], p[:-1], out=new[1:])
        for k in keys:
            ks = k[order]
            new[1:] |= ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(p)))
        n_distinct = np.bincount(p[starts], minlength=n).astype(np.int64)
        top = np.zeros(n, dtype=np.int64)
        np.maximum.at(top, p[starts], lens)
        return n_distinct, top

    def stats(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        parts = pc.split_pattern(texts, " ")
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").fill_null(False).to_numpy(zero_copy_only=False)
        da = pc.dictionary_encode(flat)
        wid = np.asarray(da.indices, dtype=np.int64)[keep]
        parent = parent[keep]  # still non-decreasing: doc order is preserved
        n_words = np.bincount(parent, minlength=n).astype(np.int64)
        n_dw, top_w = _group_stats(parent, (wid,), n)
        adj = parent[:-1] == parent[1:] if len(parent) else np.empty(0, bool)
        bp, b1, b2 = parent[:-1][adj], wid[:-1][adj], wid[1:][adj]
        n_bigrams = np.bincount(bp, minlength=n).astype(np.int64)
        n_db, top_b = _group_stats(bp, (b1, b2), n)
        repetitive = (top_w * 5 > n_words) | (n_db * 10 < n_bigrams * 9)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words),
                "n_distinct_words": pa.array(n_dw),
                "top_word_n": pa.array(top_w),
                "n_bigrams": pa.array(n_bigrams),
                "n_distinct_bigrams": pa.array(n_db),
                "top_bigram_n": pa.array(top_b),
                "repetitive": pa.array(repetitive),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow", batch_size=batch_size)


def mixture_quota(docs, *, budget: int = 1_000_000,
                  batch_size: int | None = None):
    """Domain-mixture token budgeting: per ``(source, lang)`` group report
    ``n_docs``, ``n_tokens`` (non-empty whitespace words) and ``quota`` — a
    largest-remainder proportional allocation of ``budget`` tokens across
    groups (the static mixing-weight table a pretraining sampler consumes;
    cf. The Pile's per-source epochs). Exact integers throughout:
    ``floor(budget * n_i / N)`` plus +1 for the groups with the largest
    remainders (ties: source ASC, lang ASC) so quotas sum to ``budget``.

    Plan: per-batch pre-aggregated (source, lang, docs, tokens) partials —
    the shuffle moves one row per group per batch, never text — then one
    tiny low-cardinality groupby; the final allocation runs driver-side over
    the G group rows (G = |sources|x|langs|, bounded and small by
    construction — NOT corpus-sized). ``budget * n_tokens`` must fit int64:
    fine for budget ≤ 1e6 against ≤ 9e12 corpus tokens.
    """
    import ray.data as rd

    from ..functions.collect import collect_table

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parts = pc.split_pattern(texts, " ")
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").fill_null(False).to_numpy(zero_copy_only=False)
        ntok = np.bincount(parent[keep], minlength=len(texts)).astype(np.int64)
        key = pc.binary_join_element_wise(t["source"], t["lang"], "\x1f")
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        da = pc.dictionary_encode(key)
        idx = np.asarray(da.indices, dtype=np.int64)
        g = len(da.dictionary)
        # any representative row per group works (source/lang determine grp)
        first = np.zeros(g, dtype=np.int64)
        np.maximum.at(first, idx, np.arange(len(idx)))
        src = t["source"].combine_chunks() if isinstance(t["source"], pa.ChunkedArray) else t["source"]
        lng = t["lang"].combine_chunks() if isinstance(t["lang"], pa.ChunkedArray) else t["lang"]
        return pa.table(
            {
                "grp": da.dictionary.cast(pa.string()),
                "source": src.take(pa.array(first)),
                "lang": lng.take(pa.array(first)),
                "n_docs": pa.array(np.bincount(idx, minlength=g).astype(np.int64)),
                "n_tokens": pa.array(
                    np.bincount(idx, weights=ntok, minlength=g).astype(np.int64)
                ),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": g["source"].combine_chunks()[:1] if isinstance(g["source"], pa.ChunkedArray) else g["source"][:1],
                "lang": g["lang"].combine_chunks()[:1] if isinstance(g["lang"], pa.ChunkedArray) else g["lang"][:1],
                "n_docs": pa.array([int(pc.sum(g["n_docs"]).as_py())], pa.int64()),
                "n_tokens": pa.array([int(pc.sum(g["n_tokens"]).as_py())], pa.int64()),
            }
        )

    grouped = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("grp")
        .map_groups(fold, batch_format="pyarrow")
    )
    schema = pa.schema([("source", pa.string()), ("lang", pa.string()),
                        ("n_docs", pa.int64()), ("n_tokens", pa.int64())])
    tbl = collect_table(grouped, empty_schema=schema)
    src = tbl["source"].to_numpy(zero_copy_only=False).astype("U") if tbl.num_rows else np.empty(0, "U1")
    lng = tbl["lang"].to_numpy(zero_copy_only=False).astype("U") if tbl.num_rows else np.empty(0, "U1")
    nd = np.asarray(tbl["n_docs"]).astype(np.int64) if tbl.num_rows else np.empty(0, np.int64)
    nt = np.asarray(tbl["n_tokens"]).astype(np.int64) if tbl.num_rows else np.empty(0, np.int64)
    tot = int(nt.sum())
    if tot > 0:
        fl = budget * nt // tot
        rem = budget * nt % tot
        quota = fl.copy()
        short = int(budget - fl.sum())
        order = np.lexsort((lng, src, -rem))
        quota[order[:short]] += 1
    else:
        quota = np.zeros(len(nt), dtype=np.int64)
    order = np.lexsort((lng, src))
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array(src[order], pa.string()),
                "lang": pa.array(lng[order], pa.string()),
                "n_docs": pa.array(nd[order]),
                "n_tokens": pa.array(nt[order]),
                "quota": pa.array(quota[order]),
            }
        )
    )


TFIDF_SCALE = 1_000_000


def _doc_term_tf(t: pa.Table):
    """Per-batch exact per-(doc, term) counts — each doc lives whole in one
    row so the counts are final, not partial. Returns (doc_ids, terms as a
    sorted-per-doc U array, tf); '' split artifacts dropped."""
    texts = t["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    parts = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").fill_null(False).to_numpy(zero_copy_only=False)
    da = pc.dictionary_encode(flat)
    wid = np.asarray(da.indices, dtype=np.int64)[keep]
    parent = parent[keep]
    order = np.lexsort((wid, parent))
    p, w = parent[order], wid[order]
    new = np.ones(len(p), dtype=bool)
    if len(p):
        new[1:] = (p[1:] != p[:-1]) | (w[1:] != w[:-1])
    starts = np.flatnonzero(new)
    tf = np.diff(np.append(starts, len(p))).astype(np.int64)
    ids = np.asarray(t["doc_id"], dtype=np.int64)
    d = ids[p[starts]] if len(starts) else np.empty(0, np.int64)
    vocab = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
    terms = vocab[w[starts]] if len(starts) else np.empty(0, "U1")
    return d, terms, tf


def _term_tf_partial(num_buckets: int):
    """Per-batch (term-bucket, term, doc_id, tf) partial — the shared first
    stage of the inverted-index operators (``tfidf_top_terms``, ``oov_rate``).
    The shuffle moves one row per distinct (doc, term), never raw tokens.
    Terms travel as strings (bucket is routing only — matches inside a
    bucket compare the string itself, no hash-collision caveat)."""
    from ..functions.hashing import hash_str

    def tf_partial(t: pa.Table) -> pa.Table:
        d, terms, tf = _doc_term_tf(t)
        bucket = (hash_str(terms) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(d),
                "tf": pa.array(tf),
            }
        )

    return tf_partial


def _df_fold(docs, batch_size=None) -> tuple[np.ndarray, np.ndarray]:
    """Distributed exact document-frequency fold: per-batch per-term
    distinct-doc counts (final per batch — docs live whole in one row), a
    per-task combine, then a driver fold. State everywhere is bounded by
    the VOCABULARY size, never token or doc count. Returns (sorted unique
    terms, df)."""
    from ..functions.collect import collect_table

    def _sum_by_term(terms: np.ndarray, cnts: np.ndarray):
        order = np.argsort(terms, kind="stable")
        ts, cs = terms[order], cnts[order]
        if len(ts) == 0:
            return ts, cs
        new = np.concatenate([[True], ts[1:] != ts[:-1]])
        idx = np.flatnonzero(new)
        return ts[idx], np.add.reduceat(cs, idx).astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        _, terms, _ = _doc_term_tf(t)
        ut, dfp = np.unique(terms, return_counts=True)
        return pa.table({"term": pa.array(ut, pa.string()),
                         "df": pa.array(dfp.astype(np.int64))})

    def combine(t: pa.Table) -> pa.Table:
        term = t["term"]
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        ts, cs = _sum_by_term(term.to_numpy(zero_copy_only=False).astype("U"),
                              np.asarray(t["df"], dtype=np.int64))
        return pa.table({"term": pa.array(ts, pa.string()),
                         "df": pa.array(cs)})

    parts = collect_table(
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=batch_size)
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([("term", pa.string()), ("df", pa.int64())]),
    )
    if not parts.num_rows:
        return np.empty(0, "U1"), np.empty(0, np.int64)
    term = parts["term"]
    if isinstance(term, pa.ChunkedArray):
        term = term.combine_chunks()
    return _sum_by_term(term.to_numpy(zero_copy_only=False).astype("U"),
                        np.asarray(parts["df"], dtype=np.int64))


TFIDF_BROADCAST_MAX_DOCS = 5_000_000


def tfidf_top_terms(docs, *, num_buckets: int = 64, doc_shard: int = 4096,
                    lane: str = "auto",
                    broadcast_max_docs: int = TFIDF_BROADCAST_MAX_DOCS,
                    batch_size: int | None = None):
    """Per-document most-salient term by exact integer TF-IDF score
    ``tf * TFIDF_SCALE // df`` (ties: term ASC). Emits one row per doc that
    has ≥1 non-empty word: ``doc_id, term, tf, df, score``.

    Two lanes, identical outputs (lane-equivalence tested), auto-picked by
    corpus size like ``dedup.ngram_jaccard_pairs``:

    - ``broadcast`` (default under ``broadcast_max_docs``): ONE bounded
      document-frequency fold (state = vocabulary size) broadcast via
      ``ray.put``, then a single stateless pass computes scores and the
      per-doc argmax inside the batch — no (doc, term) exchange at all.
      Right whenever the vocabulary fits a worker (bounded/curated corpora).
    - ``index``: the exchange lane below, for corpora whose RAW vocabulary
      is unbounded (web-scale token soup) — nothing vocabulary-sized is
      ever held in one place.

    The index lane — two bounded exchanges, no broadcast vocabulary and no
    hash-collision caveat (terms travel as strings and match exactly):
    1. per-batch (term-bucket, term, doc_id, tf) partials — each doc lives
       whole in one row so per-doc tf is exact per batch; the shuffle moves
       one row per distinct (doc, term), never raw tokens;
    2. term-bucket groupby: every (doc, term) row for a term lands in its
       bucket, so ``df`` = the term's row count there (rows are distinct per
       doc by construction) — attach df + score, re-key by doc shard;
    3. doc-shard groupby (bounded ``doc_id // doc_shard`` groups — skew-free
       like ``packing.pack_sequences``): vectorized per-doc argmax via
       lexsort + first-per-run boundaries.
    """
    if lane == "auto":
        lane = "broadcast" if docs.count() <= broadcast_max_docs else "index"
    if lane == "broadcast":
        import ray

        terms_sorted, dfs = _df_fold(docs, batch_size=batch_size)
        df_ref = ray.put((terms_sorted, dfs))

        def probe(t: pa.Table) -> pa.Table:
            ts, dfv = ray.get(df_ref)
            d, terms, tf = _doc_term_tf(t)
            df = dfv[np.searchsorted(ts, terms)] if len(terms) else (
                np.empty(0, np.int64))
            score = tf * TFIDF_SCALE // df if len(terms) else (
                np.empty(0, np.int64))
            order = np.lexsort((terms, -score, d))
            p = d[order]
            new = np.ones(len(p), dtype=bool)
            if len(p):
                new[1:] = p[1:] != p[:-1]
            pick = order[np.flatnonzero(new)]
            return pa.table({
                "doc_id": pa.array(d[pick]),
                "term": pa.array(terms[pick], pa.string()),
                "tf": pa.array(tf[pick]),
                "df": pa.array(df[pick]),
                "score": pa.array(score[pick]),
            })

        return docs.map_batches(probe, batch_format="pyarrow",
                                batch_size=batch_size)
    if lane != "index":
        raise ValueError(f"unknown tfidf lane {lane!r}")
    tf_partial = _term_tf_partial(num_buckets)

    def df_attach(g: pa.Table) -> pa.Table:
        term = g["term"]
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        da = pc.dictionary_encode(term)
        idx = np.asarray(da.indices, dtype=np.int64)
        df = np.bincount(idx, minlength=len(da.dictionary)).astype(np.int64)[idx]
        tf = np.asarray(g["tf"]).astype(np.int64)
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        return pa.table(
            {
                "dshard": pa.array(ids // doc_shard),
                "doc_id": pa.array(ids),
                "term": term,
                "tf": pa.array(tf),
                "df": pa.array(df),
                "score": pa.array(tf * TFIDF_SCALE // df),
            }
        )

    def doc_argmax(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        score = np.asarray(g["score"]).astype(np.int64)
        term = g["term"]
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        terms = term.to_numpy(zero_copy_only=False).astype("U")
        order = np.lexsort((terms, -score, ids))
        p = ids[order]
        new = np.ones(len(p), dtype=bool)
        if len(p):
            new[1:] = p[1:] != p[:-1]
        firsts = np.flatnonzero(new)
        pick = pa.array(order[firsts])
        return pa.table(
            {
                "doc_id": pa.array(p[firsts]),
                "term": term.take(pick),
                "tf": g["tf"].combine_chunks().take(pick) if isinstance(g["tf"], pa.ChunkedArray) else g["tf"].take(pick),
                "df": g["df"].combine_chunks().take(pick) if isinstance(g["df"], pa.ChunkedArray) else g["df"].take(pick),
                "score": g["score"].combine_chunks().take(pick) if isinstance(g["score"], pa.ChunkedArray) else g["score"].take(pick),
            }
        )

    return (
        docs.map_batches(tf_partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("bucket")
        .map_groups(df_attach, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(doc_argmax, batch_format="pyarrow")
    )


def oov_rate(docs, *, min_df: int = 2, num_buckets: int = 64,
             doc_shard: int = 4096, batch_size: int | None = None):
    """Out-of-vocabulary quality gate: per document, the token mass carried
    by globally rare words (document frequency < ``min_df``). High OOV share
    marks gibberish / mangled encodings / boilerplate IDs — a standard
    corpus-quality filter next to the length/stopword gates.

    Emits one row per doc with ≥1 non-empty word: ``doc_id``, ``n_words``,
    ``n_oov`` (occurrences of sub-threshold words), and ``low_oov``
    (``n_oov * 5 <= n_words``, integer form of OOV share ≤ 20%).

    Same two bounded exchanges as ``tfidf_top_terms`` via the shared
    ``_term_tf_partial``: the term-bucket groupby knows each term's exact
    global df (all of a term's (doc, term) rows land in its bucket), folds
    the per-doc partial sums immediately — so the doc-shard exchange moves
    one row per (doc, bucket), not one per (doc, term) — and the bounded
    doc-shard groupby adds them up per doc."""
    tf_partial = _term_tf_partial(num_buckets)

    def bucket_fold(g: pa.Table) -> pa.Table:
        term = g["term"]
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        da = pc.dictionary_encode(term)
        idx = np.asarray(da.indices, dtype=np.int64)
        df = np.bincount(idx, minlength=len(da.dictionary)).astype(np.int64)
        rare = df[idx] < min_df
        tf = np.asarray(g["tf"]).astype(np.int64)
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        dd = pc.dictionary_encode(pa.array(ids))
        di = np.asarray(dd.indices, dtype=np.int64)
        uids = np.asarray(dd.dictionary, dtype=np.int64)
        n_words = np.bincount(di, weights=tf, minlength=len(uids)).astype(np.int64)
        n_oov = np.bincount(di[rare], weights=tf[rare],
                            minlength=len(uids)).astype(np.int64)
        return pa.table(
            {
                "dshard": pa.array(uids // doc_shard),
                "doc_id": pa.array(uids),
                "n_words": pa.array(n_words),
                "n_oov": pa.array(n_oov),
            }
        )

    def doc_fold(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        dd = pc.dictionary_encode(pa.array(ids))
        di = np.asarray(dd.indices, dtype=np.int64)
        uids = np.asarray(dd.dictionary, dtype=np.int64)
        n_words = np.bincount(di, weights=np.asarray(g["n_words"]),
                              minlength=len(uids)).astype(np.int64)
        n_oov = np.bincount(di, weights=np.asarray(g["n_oov"]),
                            minlength=len(uids)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(uids),
                "n_words": pa.array(n_words),
                "n_oov": pa.array(n_oov),
                "low_oov": pa.array(n_oov * 5 <= n_words),
            }
        )

    return (
        docs.map_batches(tf_partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(doc_fold, batch_format="pyarrow")
    )


LM_N = 2
LM_TRAIN_RATE = 0.1
LM_MIN_COUNT = 2


def lm_coverage(docs, *, n: int = LM_N, train_rate: float = LM_TRAIN_RATE,
                min_count: int = LM_MIN_COUNT, num_buckets: int = 64,
                doc_shard: int = 4096, batch_size: int | None = None):
    """N-gram LM coverage score — the integer-exact core of a CCNet-style
    perplexity quality filter (Wenzek et al. 2020, public): train a word
    n-gram count model on a deterministic hash split of the corpus, then
    score every HELD-OUT document by how well the model covers it. Low
    coverage marks out-of-distribution text (gibberish, wrong language,
    boilerplate markup) exactly where a real LM would score high perplexity;
    keeping the outputs as integer counts (not log-probs) makes the operator
    bitwise oracle-checkable.

    Train membership is ``sample_by_hash`` semantics (FNV(str(doc_id)) %
    1e6 < train_rate * 1e6) — a pure function of the row, reproducible at
    any scale and partitioning. The model is every train-split n-gram with
    total occurrence count >= ``min_count``.

    Emits one row per held-out doc with >= 1 gram position: ``doc_id``,
    ``n_grams`` (sliding positions), ``n_hit`` (positions whose gram is in
    the model), ``count_sum`` (sum of the model's occurrence count over hit
    positions — the unnormalized LM score mass).

    Scale shape — NO broadcast, NO driver state (the model is corpus-sized
    at 100 TB, past any ``ray.put`` ceiling): one streaming pass emits
    per-batch PRE-AGGREGATED role-tagged gram rows (train: (gram, cnt);
    held-out: (gram, doc_id, tf)); a gram-bucket groupby joins every gram's
    exact global model count against its doc rows in place (all of a gram's
    rows land in its bucket by construction — no hash-collision merging);
    a bounded doc-shard groupby sums the per-bucket partials per doc. Both
    exchanges move pre-aggregated integers + gram strings only."""
    from .dedup import _gram_strings
    from .sampling import SAMPLE_MOD

    threshold = np.uint64(int(train_rate * SAMPLE_MOD))
    empty = pa.table({
        "bucket": pa.array([], pa.int32()),
        "role": pa.array([], pa.int8()),
        "gram": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.int64()),
        "cnt": pa.array([], pa.int64()),
    })

    def gram_rows(t: pa.Table) -> pa.Table:
        ids_col = t["doc_id"]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        ids = np.asarray(ids_col).astype(np.int64)
        is_train = (hash_str(ids.astype("U"))
                    % np.uint64(SAMPLE_MOD)) < threshold
        parent, grams, _, _ = _gram_strings(t, n)
        if len(grams) == 0:
            return empty
        da = pc.dictionary_encode(grams)
        code = np.asarray(da.indices, dtype=np.int64)
        ndict = len(da.dictionary)
        gram_str = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        bucket = (hash_str(gram_str) % np.uint64(num_buckets)).astype(np.int32)
        tmask = is_train[parent]
        out = []
        # train side: per-gram occurrence counts across this batch's train docs
        cnt = np.bincount(code[tmask], minlength=ndict).astype(np.int64)
        nz = cnt > 0
        if nz.any():
            out.append(pa.table({
                "bucket": pa.array(bucket[nz]),
                "role": pa.array(np.zeros(int(nz.sum()), dtype=np.int8)),
                "gram": da.dictionary.filter(pa.array(nz)),
                "doc_id": pa.array(np.zeros(int(nz.sum()), dtype=np.int64)),
                "cnt": pa.array(cnt[nz]),
            }))
        # held-out side: per-(doc, gram) occurrence counts
        hp, hc = parent[~tmask], code[~tmask]
        if len(hp):
            pair, tf = np.unique(hp * ndict + hc, return_counts=True)
            pd_, pg = pair // ndict, (pair % ndict).astype(np.int64)
            out.append(pa.table({
                "bucket": pa.array(bucket[pg]),
                "role": pa.array(np.ones(len(pair), dtype=np.int8)),
                "gram": da.dictionary.take(pa.array(pg)),
                "doc_id": pa.array(ids[pd_]),
                "cnt": pa.array(tf.astype(np.int64)),
            }))
        if not out:
            return empty
        return pa.concat_tables(out)

    def bucket_fold(g: pa.Table) -> pa.Table:
        s = g["gram"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        da = pc.dictionary_encode(s)
        gi = np.asarray(da.indices, dtype=np.int64)
        role = np.asarray(g["role"]).astype(np.int64)
        cnt = np.asarray(g["cnt"]).astype(np.int64)
        model = np.zeros(len(da.dictionary), dtype=np.int64)
        tr = role == 0
        np.add.at(model, gi[tr], cnt[tr])
        model[model < min_count] = 0  # below-threshold grams score nothing
        held = ~tr
        ids = np.asarray(g["doc_id"]).astype(np.int64)[held]
        tf = cnt[held]
        mc = model[gi[held]]
        dd = pc.dictionary_encode(pa.array(ids))
        di = np.asarray(dd.indices, dtype=np.int64)
        uids = np.asarray(dd.dictionary, dtype=np.int64)
        hit = mc > 0
        n_grams = np.bincount(di, weights=tf, minlength=len(uids))
        n_hit = np.bincount(di[hit], weights=tf[hit], minlength=len(uids))
        csum = np.bincount(di[hit], weights=tf[hit] * mc[hit],
                           minlength=len(uids))
        return pa.table({
            "dshard": pa.array(uids // doc_shard),
            "doc_id": pa.array(uids),
            "n_grams": pa.array(n_grams.astype(np.int64)),
            "n_hit": pa.array(n_hit.astype(np.int64)),
            "count_sum": pa.array(csum.astype(np.int64)),
        })

    def doc_fold(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        dd = pc.dictionary_encode(pa.array(ids))
        di = np.asarray(dd.indices, dtype=np.int64)
        uids = np.asarray(dd.dictionary, dtype=np.int64)
        cols = {}
        for c in ("n_grams", "n_hit", "count_sum"):
            cols[c] = pa.array(np.bincount(
                di, weights=np.asarray(g[c]), minlength=len(uids)
            ).astype(np.int64))
        return pa.table({"doc_id": pa.array(uids), **cols})

    return (
        docs.map_batches(gram_rows, batch_format="pyarrow",
                         batch_size=batch_size)
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(doc_fold, batch_format="pyarrow")
    )


def _word_lists(texts: pa.Array):
    """Split ``texts`` on single spaces, drop '' words (mirrors DuckDB
    ``list_filter(string_split(text,' '), x -> x <> '')``), keep per-doc
    order. Returns ``(words, counts, offsets)``: the flat kept-word Arrow
    array, per-doc kept-word counts (int64) and per-doc start offsets
    (len(texts)+1). Null texts contribute zero words."""
    parts = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    keep = (
        pc.not_equal(flat, "").fill_null(False).to_numpy(zero_copy_only=False)
    )
    words = flat.filter(pa.array(keep))
    counts = np.bincount(parent[keep], minlength=len(texts)).astype(np.int64)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return words, counts, offsets


CHUNK_SIZE = 32
CHUNK_STRIDE = 24


def chunk_documents(docs, *, size: int = CHUNK_SIZE,
                    stride: int = CHUNK_STRIDE,
                    batch_size: int | None = None):
    """Overlapping word-window chunk expansion — the RAG / training-sequence
    chunking pass: each document becomes ceil(n_words / stride) chunks of up
    to ``size`` words starting every ``stride`` words (overlap = size -
    stride). Pure per-batch row expansion (no shuffle): the word gather, the
    chunk ListArray and the ``binary_join`` text rebuild are all vectorized;
    zero-word docs emit no rows (matching the SQL oracle's unnest).

    Returns Dataset[doc_id, chunk_id, n_words, chunk_text].
    """
    if stride <= 0 or size < stride:
        raise ValueError("need 0 < stride <= size")

    def chunk(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words, counts, offs = _word_lists(texts)
        doc_ids = np.asarray(t["doc_id"]).astype(np.int64)
        k = -(-counts // stride)  # ceil; 0 chunks for empty docs
        total_chunks = int(k.sum())
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "chunk_id": pa.array([], pa.int64()),
            "n_words": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        })
        if total_chunks == 0:
            return empty
        doc_idx = np.repeat(np.arange(len(counts)), k)
        first = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(k[:-1], out=first[1:])
        chunk_id = np.arange(total_chunks, dtype=np.int64) - np.repeat(first, k)
        start = chunk_id * stride
        length = np.minimum(size, counts[doc_idx] - start)
        # flat gather indices: chunk c covers words[gstart_c : gstart_c+len_c]
        gstart = offs[doc_idx] + start
        cho = np.zeros(total_chunks + 1, dtype=np.int64)
        np.cumsum(length, out=cho[1:])
        gidx = (np.arange(int(cho[-1]), dtype=np.int64)
                - np.repeat(cho[:-1], length) + np.repeat(gstart, length))
        gathered = words.take(pa.array(gidx))
        la = pa.ListArray.from_arrays(pa.array(cho, pa.int32())
                                      if cho[-1] <= np.iinfo(np.int32).max
                                      else pa.array(cho, pa.int64()),
                                      gathered)
        return pa.table({
            "doc_id": pa.array(doc_ids[doc_idx]),
            "chunk_id": pa.array(chunk_id),
            "n_words": pa.array(length.astype(np.int64)),
            "chunk_text": pc.binary_join(la, " "),
        })

    return docs.map_batches(chunk, batch_format="pyarrow", batch_size=batch_size)


# control chars + DEL; RE2 dialect shared by pyarrow and DuckDB
_CTRL_RE = r"[\x00-\x1f\x7f]"


HASH_EMBED_DIM = 8


def hash_embed(docs, *, dim: int = HASH_EMBED_DIM, column: str = "text",
               batch_size: int | None = None):
    """Deterministic hashed document embeddings — the fasttext-shaped
    producer edge (text -> vector) for the similarity/embed-dedup operators
    when no trained encoder is available: component ``j`` of a word's
    vector is ``FNV(word + '#' + j) % 15 - 7`` (a signed bucket of the
    shared fold), and a document embeds as the integer SUM of its word
    vectors. Integer outputs make the oracle exact — no float drift.

    Stateless vectorized map: words dictionary-encode per batch, each
    dimension hashes only the dictionary (the winnowing lesson), per-doc
    sums via bincount. Returns (doc_id, e0..e{dim-1}); normalize / cast
    downstream if cosine geometry is wanted."""

    def embed(t: pa.Table) -> pa.Table:
        texts = t[column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parts = pc.split_pattern(texts, " ")
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").fill_null(False).to_numpy(
            zero_copy_only=False)
        da = pc.dictionary_encode(flat)
        uw = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        codes = np.asarray(da.indices, dtype=np.int64)
        n_docs = len(texts)
        out: dict = {"doc_id": t["doc_id"]}
        pk, ck = parent[keep], codes[keep]
        for j in range(dim):
            vals = (hash_str(np.char.add(uw, f"#{j}"))
                    % np.uint64(15)).astype(np.int64) - 7
            comp = np.zeros(n_docs, dtype=np.int64)
            np.add.at(comp, pk, vals[ck])
            out[f"e{j}"] = pa.array(comp)
        return pa.table(out)

    return docs.map_batches(embed, batch_format="pyarrow",
                            batch_size=batch_size)


TRUNCATE_TOKENS = 40


def truncate_docs(docs, *, max_tokens: int = TRUNCATE_TOKENS,
                  column: str = "text", batch_size: int | None = None):
    """Token-budget truncation — trim every document to its first
    ``max_tokens`` whitespace tokens instead of dropping long docs (the
    standard context-window preprocessing step). Streaming Arrow kernels
    only: split -> list_slice -> binary_join rebuild; adds integer
    ``n_tokens`` (original count) and a ``truncated`` flag. '' split
    artifacts count as tokens here (the doc is rebuilt verbatim either
    way); run ``normalize_text`` first for canonical spacing.

    Returns Dataset[doc_id, text, n_tokens, truncated]."""

    def trunc(t: pa.Table) -> pa.Table:
        texts = t[column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parts = pc.split_pattern(texts, " ")
        n_tok = pc.list_value_length(parts).fill_null(0)
        out = pc.binary_join(
            pc.list_slice(parts, 0, max_tokens, return_fixed_size_list=False),
            " ")
        truncated = pc.greater(n_tok, max_tokens).fill_null(False)
        return pa.table({
            "doc_id": t["doc_id"],
            "text": out,
            "n_tokens": pc.cast(n_tok, pa.int64()),
            "truncated": truncated,
        })

    return docs.map_batches(trunc, batch_format="pyarrow",
                            batch_size=batch_size)


def normalize_text(docs, *, column: str = "text",
                   batch_size: int | None = None):
    """Deterministic text normalization (the cleanup pass before dedup /
    tokenization): lowercase -> strip control characters -> collapse space
    runs -> trim. Streaming Arrow C++ kernels only; adds ``norm_text`` and a
    ``changed`` flag (two-valued: null text -> changed = False, mirrored by
    ``coalesce(..., FALSE)`` on the SQL side).

    Returns Dataset[doc_id, norm_text, changed].
    """

    def norm(t: pa.Table) -> pa.Table:
        texts = t[column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        out = pc.utf8_lower(texts)
        out = pc.replace_substring_regex(out, _CTRL_RE, "")
        out = pc.replace_substring_regex(out, " +", " ")
        out = pc.utf8_trim(out, " ")
        changed = pc.not_equal(out, texts).fill_null(False)
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_text": out,
            "changed": changed,
        })

    return docs.map_batches(norm, batch_format="pyarrow", batch_size=batch_size)


def simhash_batch(texts: pa.Array) -> np.ndarray:
    """64-bit SimHash per text from word-unigram features (Arrow split +
    flatten, per-bit +/-1 votes via reduceat over the flat word-hash array)."""
    parts = pc.split_pattern(texts, " ")
    lens = pc.list_value_length(parts).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(parts)
    n = len(texts)
    if len(flat) == 0:
        return np.zeros(n, dtype=np.uint64)
    h = hash_str(flat.to_numpy(zero_copy_only=False))
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    nonempty = np.flatnonzero(lens > 0)  # reduceat over nonempty docs only:
    idx = starts[nonempty]               # strictly increasing, ends at len(h)
    out = np.zeros(n, dtype=np.uint64)
    for b in range(64):
        votes = (((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * 2 - 1)
        sums = np.add.reduceat(votes, idx)
        out[nonempty] |= (sums > 0).astype(np.uint64) << np.uint64(b)
    return out


def mixture_apply(docs, *, budget: int = 1_000_000, block_bits: int = 12,
                  batch_size: int | None = None):
    """Domain-mixture APPLICATION — turns ``mixture_quota``'s per-group
    token quotas into an actual keep-list: within each ``(source, lang)``
    group, keep documents in deterministic FNV-hash order (h asc, doc_id
    asc) while the group's cumulative token count stays <= its quota. The
    end-to-end "budget -> training subset" step a pretraining sampler runs.

    Per-group ordered prefix selection is a SORT at heart; doing it
    scale-correctly without ever sorting the corpus is the point:

    1. **Block histogram.** One streaming pass pre-aggregates token sums
       per (group, hash-block) where block = top ``block_bits`` bits of
       FNV(str(doc_id)) — one bounded exchange of G x <=2^block_bits
       integer rows (corpus-size-independent), folded per group.
    2. **Driver allocation.** Largest-remainder quotas (identical math to
       ``mixture_quota``) + per-group boundary: blocks strictly below
       ``bstar`` are wholly kept, above wholly dropped, and the residual
       quota inside ``bstar`` is carried forward. Driver state = G rows.
    3. **Classify + boundary resolve.** A stateless pass emits interior
       keeps directly (no shuffle); only the ~corpus/2^block_bits boundary
       docs are exchanged, sorted per group (they fit: one block), and
       prefix-scanned against the residual.

    Returns Dataset[doc_id] of kept docs."""
    from ..functions.collect import collect_table

    shift = np.uint64(64 - block_bits)

    def _rows(t: pa.Table):
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        _, ntok, _ = _word_lists(texts)
        key = pc.binary_join_element_wise(t["source"], t["lang"], "\x1f")
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        h = hash_str(ids.astype("U"))
        return key, ids, h, (h >> shift).astype(np.int64), ntok

    def block_partial(t: pa.Table) -> pa.Table:
        key, _, _, block, ntok = _rows(t)
        da = pc.dictionary_encode(key)
        idx = np.asarray(da.indices, dtype=np.int64)
        pair = idx * (1 << block_bits) + block
        up, inv = np.unique(pair, return_inverse=True)
        tok = np.zeros(len(up), dtype=np.int64)
        np.add.at(tok, inv, ntok)
        return pa.table({
            "grp": da.dictionary.take(pa.array(up >> block_bits)).cast(pa.string()),
            "block": pa.array(up & ((1 << block_bits) - 1)),
            "tok": pa.array(tok),
        })

    def block_fold(g: pa.Table) -> pa.Table:
        b = np.asarray(g["block"]).astype(np.int64)
        tk = np.asarray(g["tok"]).astype(np.int64)
        ub, inv = np.unique(b, return_inverse=True)
        tot = np.zeros(len(ub), dtype=np.int64)
        np.add.at(tot, inv, tk)
        grp = g["grp"][0].as_py()
        return pa.table({
            "grp": pa.array([grp] * len(ub), pa.string()),
            "block": pa.array(ub),
            "tok": pa.array(tot),
        })

    blocks = collect_table(
        docs.map_batches(block_partial, batch_format="pyarrow",
                         batch_size=batch_size)
        .groupby("grp").map_groups(block_fold, batch_format="pyarrow"),
        empty_schema=pa.schema([("grp", pa.string()), ("block", pa.int64()),
                                ("tok", pa.int64())]),
    )

    # driver: largest-remainder allocation over G groups (mixture_quota math)
    grps = blocks["grp"].to_numpy(zero_copy_only=False).astype("U") \
        if blocks.num_rows else np.empty(0, "U1")
    blk = np.asarray(blocks["block"]).astype(np.int64) \
        if blocks.num_rows else np.empty(0, np.int64)
    tok = np.asarray(blocks["tok"]).astype(np.int64) \
        if blocks.num_rows else np.empty(0, np.int64)
    ug, ginv = np.unique(grps, return_inverse=True)
    nt = np.zeros(len(ug), dtype=np.int64)
    np.add.at(nt, ginv, tok)
    tot = int(nt.sum())
    if tot > 0:
        src_lang = np.array([g.split("\x1f") for g in ug], dtype="U64") \
            if len(ug) else np.empty((0, 2), "U1")
        fl = budget * nt // tot
        rem = budget * nt % tot
        quota = fl.copy()
        short = int(budget - fl.sum())
        order = np.lexsort((src_lang[:, 1], src_lang[:, 0], -rem))
        quota[order[:short]] += 1
    else:
        quota = np.zeros(len(ug), dtype=np.int64)

    # per-group boundary: (bstar, resid); bstar = -1 means keep everything
    bounds: dict[str, tuple[int, int]] = {}
    for gi, gname in enumerate(ug):
        m = ginv == gi
        bo = np.argsort(blk[m])
        bs, ts = blk[m][bo], tok[m][bo]
        cum = np.cumsum(ts)
        over = np.flatnonzero(cum > quota[gi])
        if len(over) == 0:
            bounds[str(gname)] = (-1, 0)
        else:
            i = int(over[0])
            base = int(cum[i - 1]) if i else 0
            bounds[str(gname)] = (int(bs[i]), int(quota[gi]) - base)

    def interior_keeps(t: pa.Table) -> pa.Table:
        key, ids, _, block, _ = _rows(t)
        ks = np.asarray(key).astype("U")
        uk, kinv = np.unique(ks, return_inverse=True)
        bstar = np.array([bounds.get(k, (-1, 0))[0] for k in uk],
                         dtype=np.int64)
        bk = bstar[kinv]
        keep = (bk == -1) | (block < bk)
        return pa.table({"doc_id": pa.array(ids[keep])})

    def boundary_rows(t: pa.Table) -> pa.Table:
        key, ids, h, block, ntok = _rows(t)
        ks = np.asarray(key).astype("U")
        uk, kinv = np.unique(ks, return_inverse=True)
        bstar = np.array([bounds.get(k, (-1, 0))[0] for k in uk],
                         dtype=np.int64)
        m = block == bstar[kinv]
        return pa.table({
            "grp": pa.array(ks[m]),
            "doc_id": pa.array(ids[m]),
            "h": pa.array(h[m]),
            "ntok": pa.array(ntok[m].astype(np.int64)),
        })

    def resolve(g: pa.Table) -> pa.Table:
        grp = g["grp"][0].as_py()
        resid = bounds.get(grp, (-1, 0))[1]
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        h = np.asarray(g["h"]).astype(np.uint64)
        ntok = np.asarray(g["ntok"]).astype(np.int64)
        order = np.lexsort((ids, h))
        cum = np.cumsum(ntok[order])
        return pa.table({"doc_id": pa.array(ids[order][cum <= resid])})

    keeps = docs.map_batches(interior_keeps, batch_format="pyarrow",
                             batch_size=batch_size)
    resolved = (
        docs.map_batches(boundary_rows, batch_format="pyarrow",
                         batch_size=batch_size)
        .groupby("grp").map_groups(resolve, batch_format="pyarrow")
    )
    return keeps.union(resolved)


def vocab_growth(docs, cuts: tuple[int, ...], *, column: str = "text",
                 num_buckets: int = 64, batch_size: int | None = None):
    """Vocabulary growth curve (Heaps' law probe): for each doc-id prefix
    cut ``c``, the number of DISTINCT words whose first appearance (minimum
    doc_id) falls below ``c`` — how fast the vocabulary grows as the corpus
    is consumed in id order, the curve tokenizer-vocab sizing and
    open-vocabulary risk estimates read off.

    Plan: per-batch dictionary-encoded per-word MIN doc_id (pre-aggregated
    — the exchange moves (bucket, word, min_doc) partials, never
    occurrences) -> one bucketed groupby takes the global min per word
    STRING and emits len(cuts) count rows per bucket (searchsorted over the
    sorted mins) -> driver sums num_buckets x len(cuts) tiny rows. Returns
    a pyarrow Table (n_docs, vocab_size), one row per cut."""
    from ..functions.collect import collect_table

    cuts_arr = np.asarray(sorted(cuts), dtype=np.int64)
    if len(cuts_arr) == 0:
        raise ValueError("cuts must be non-empty")

    def partial(t: pa.Table) -> pa.Table:
        texts = t[column]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words, counts, _ = _word_lists(texts)
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        if len(words) == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "word": pa.array([], pa.string()),
                             "md": pa.array([], pa.int64())})
        parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        da = pc.dictionary_encode(words)
        code = np.asarray(da.indices, dtype=np.int64)
        md = np.full(len(da.dictionary), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(md, code, ids[parent])
        uw = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        return pa.table({
            "bucket": pa.array(
                (hash_str(uw) % np.uint64(num_buckets)).astype(np.int32)),
            "word": da.dictionary,
            "md": pa.array(md),
        })

    def bucket_counts(g: pa.Table) -> pa.Table:
        s = g["word"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        da = pc.dictionary_encode(s)
        md = np.full(len(da.dictionary), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(md, np.asarray(da.indices, dtype=np.int64),
                      np.asarray(g["md"]).astype(np.int64))
        md.sort()
        n_below = np.searchsorted(md, cuts_arr, side="left")
        return pa.table({"n_docs": pa.array(cuts_arr),
                         "vocab_size": pa.array(n_below.astype(np.int64))})

    parts = collect_table(
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=batch_size)
        .groupby("bucket")
        .map_groups(bucket_counts, batch_format="pyarrow"),
        empty_schema=pa.schema([("n_docs", pa.int64()),
                                ("vocab_size", pa.int64())]),
    )
    total = np.zeros(len(cuts_arr), np.int64)
    if parts.num_rows:
        nd = np.asarray(parts["n_docs"]).astype(np.int64)
        vs = np.asarray(parts["vocab_size"]).astype(np.int64)
        idx = np.searchsorted(cuts_arr, nd)
        np.add.at(total, idx, vs)
    return pa.table({"n_docs": pa.array(cuts_arr),
                     "vocab_size": pa.array(total)})


def distinct_ngrams(docs, ns: tuple[int, ...] = (1, 2, 3), *,
                    num_buckets: int = 64, batch_size: int | None = None):
    """Per-source n-gram diversity: for each (source, n) the TOTAL n-gram
    occurrence count and the DISTINCT n-gram count — the distinct-n /
    self-repetition dial a corpus mix is tuned by (a source whose
    distinct/total ratio collapses is template spam, not diverse text).

    Plan: per-batch the kept-word stream is sliced into n-gram windows
    (adjacency = same parent doc, fully vectorized), then pre-aggregated to
    per-batch (source, n, gram, cnt) rows via a single composite
    gram-code x source-code bincount — the exchange carries per-batch
    DISTINCT grams with counts, never occurrences. A gram's global total
    lives entirely in its hash bucket, so one bucketed groupby counts exact
    per-bucket (source, n) distincts + totals, and the driver sums
    num_buckets x |sources| x |ns| tiny partial rows. Returns a pyarrow
    Table (source, n, distinct_grams, total_grams)."""
    import ray.data as rd

    from ..functions.collect import collect_table

    ns = tuple(sorted(set(int(n) for n in ns)))
    if not ns or ns[0] < 1:
        raise ValueError("ns must be positive n-gram orders")

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        srcs = t["source"]
        if isinstance(srcs, pa.ChunkedArray):
            srcs = srcs.combine_chunks()
        words, counts, _ = _word_lists(texts)
        parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        sd = pc.dictionary_encode(srcs)
        src_code_per_doc = np.asarray(sd.indices, dtype=np.int64)
        n_src = max(len(sd.dictionary), 1)
        # dictionary-encode the WORD stream once; per-occurrence work below
        # is pure integer code arithmetic — gram STRINGS are built only for
        # the per-batch-UNIQUE (gram, source) survivors (the winnow/member
        # lesson: never run string kernels per occurrence)
        wd = pc.dictionary_encode(words)
        wcode = np.asarray(wd.indices, dtype=np.int64)
        wdict = wd.dictionary
        V = max(len(wdict), 1)
        out_b, out_s, out_n, out_g, out_c = [], [], [], [], []
        for n in ns:
            L = len(words) - (n - 1)
            if L <= 0:
                continue
            if n == 1:
                code = wcode
                gpar = parent
            else:
                if V ** n * n_src >= (1 << 62):
                    raise ValueError(
                        f"distinct_ngrams: composite code overflow "
                        f"(batch vocab {V}, n={n}); lower batch_size")
                valid = parent[:L] == parent[n - 1:]
                code = wcode[:L][valid]
                for j in range(1, n):
                    code = code * V + wcode[j:j + L][valid]
                gpar = parent[:L][valid]
            if len(code) == 0:
                continue
            scode = src_code_per_doc[gpar]
            uc, cnt = np.unique(code * n_src + scode, return_counts=True)
            gsel, ssel = uc // n_src, uc % n_src
            # decode unique gram codes -> word indices -> join ONCE
            if n == 1:
                ugrams = wdict.take(pa.array(gsel))
            else:
                parts_idx = []
                rem = gsel
                for _ in range(n):
                    parts_idx.append(rem % V)
                    rem = rem // V
                cols = [wdict.take(pa.array(ix))
                        for ix in reversed(parts_idx)]
                ugrams = pc.binary_join_element_wise(*cols, " ")
            uw = ugrams.to_numpy(zero_copy_only=False).astype("U")
            out_b.append((hash_str(uw) % np.uint64(num_buckets)).astype(np.int32))
            out_s.append(sd.dictionary.take(pa.array(ssel)))
            out_n.append(np.full(len(uc), n, np.int64))
            out_g.append(ugrams)
            out_c.append(cnt.astype(np.int64))
        if not out_b:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "source": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({
            "bucket": pa.array(np.concatenate(out_b)),
            "source": pa.concat_arrays([a.cast(pa.string()) for a in out_s]),
            "n": pa.array(np.concatenate(out_n)),
            "gram": pa.concat_arrays([g.cast(pa.string()) for g in out_g]),
            "cnt": pa.array(np.concatenate(out_c)),
        })

    def bucket_fold(g: pa.Table) -> pa.Table:
        # exact per-bucket distincts: unique (source, n, gram) triples, then
        # (source, n) row-counts + cnt-sums — two vectorized hash-aggregates
        per_gram = pa.TableGroupBy(
            g.select(["source", "n", "gram", "cnt"]), ["source", "n", "gram"]
        ).aggregate([("cnt", "sum")])
        per_sn = pa.TableGroupBy(
            per_gram.select(["source", "n", "cnt_sum"]), ["source", "n"]
        ).aggregate([("cnt_sum", "sum"), ("cnt_sum", "count")])
        return pa.table({
            "source": per_sn["source"],
            "n": per_sn["n"],
            "distinct_grams": per_sn["cnt_sum_count"].cast(pa.int64()),
            "total_grams": per_sn["cnt_sum_sum"].cast(pa.int64()),
        })

    parts = collect_table(
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=batch_size)
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pyarrow"),
        empty_schema=pa.schema([
            ("source", pa.string()), ("n", pa.int64()),
            ("distinct_grams", pa.int64()), ("total_grams", pa.int64())]),
    )
    if parts.num_rows == 0:
        return rd.from_arrow(parts)
    final = pa.TableGroupBy(parts, ["source", "n"]).aggregate(
        [("distinct_grams", "sum"), ("total_grams", "sum")])
    return rd.from_arrow(pa.table({
        "source": final["source"],
        "n": final["n"],
        "distinct_grams": final["distinct_grams_sum"].cast(pa.int64()),
        "total_grams": final["total_grams_sum"].cast(pa.int64()),
    }))


def lang_confusion(docs, *, batch_size: int | None = None):
    """Declared-vs-detected language confusion counts — the metadata-quality
    audit that catches mislabeled subcorpora before a lang-stratified
    mixture trusts the labels. Same stopword-voting detector as
    ``language_id``; the exchange moves pre-aggregated (lang, pred_lang, n)
    rows (bounded by #langs^2 per batch), folded by one tiny driver pass
    with a per-task combine level.

    Returns a pyarrow Table (lang, pred_lang, n)."""
    from ..functions.collect import collect_table

    langs = list(LANG_MARKERS)

    def _fold_rows(decl: np.ndarray, pred: np.ndarray,
                   n: np.ndarray) -> pa.Table:
        keys = np.char.add(np.char.add(decl, "|"), pred)
        order = np.argsort(keys, kind="stable")
        keys, n = keys[order], n[order]
        uk, start = np.unique(keys, return_index=True)
        totals = np.add.reduceat(n, start) if len(n) else np.empty(0, np.int64)
        # reshape: np.char.partition on an EMPTY array returns shape
        # (0,), not (0, 3) — 0-row batches would IndexError (r5 probe)
        parts = np.char.partition(uk, "|").reshape(-1, 3)
        return pa.table({
            "lang": pa.array(parts[:, 0].tolist(), pa.string()),
            "pred_lang": pa.array(parts[:, 2].tolist(), pa.string()),
            "n": pa.array(totals.astype(np.int64)),
        })

    def part(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        decl = np.asarray(t["lang"]).astype("U")
        scores = np.stack([_split_counts(texts, LANG_MARKERS[l]) for l in langs])
        best = np.argmax(scores, axis=0)
        pred = np.array(langs, dtype=object)[best]
        pred[scores.max(axis=0) == 0] = "und"
        return _fold_rows(decl, pred.astype("U"),
                          np.ones(len(decl), dtype=np.int64))

    def combine(t: pa.Table) -> pa.Table:
        return _fold_rows(np.asarray(t["lang"]).astype("U"),
                          np.asarray(t["pred_lang"]).astype("U"),
                          np.asarray(t["n"]).astype(np.int64))

    parts = collect_table(
        docs.map_batches(part, batch_format="pyarrow", batch_size=batch_size)
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([("lang", pa.string()),
                                ("pred_lang", pa.string()),
                                ("n", pa.int64())]),
    )
    return combine(parts) if parts.num_rows else parts


def cooccurrence(docs, *, k: int = 20, window: int = 2,
                 num_buckets: int = 64, batch_size: int | None = None):
    """Context co-occurrence counts against the exact global top-``k``
    words — the PMI / word-vector building block, bounded so it scales:
    unrestricted (w1, w2) pair counting is vocabulary² and cannot shuffle,
    but anchoring the CONTEXT side to the top-k set caps the output at
    k × vocabulary rows.

    Plan: pass 1 = exact ``top_words`` (its own bucketed exchange), the k
    context words broadcast via ``ray.put``. Pass 2 = per batch, symmetric
    ±``window`` pairs with the context side in the top set, pre-aggregated
    to UNIQUE (context, word, n) rows by integer pair codes (bincount over
    top_idx * batch_vocab + word_code); one word-bucket groupby sums
    exactly per (context, word) STRING pair — a word's rows all land in its
    own bucket.

    Returns Dataset[context, word, n]."""
    import ray

    from ..functions.collect import collect_table
    from ..functions.hashing import hash_str

    top_tbl = collect_table(
        top_words(docs, k=k),
        empty_schema=pa.schema([("word", pa.string()), ("n", pa.int64()),
                                ("rank", pa.int64())]))
    top_col = top_tbl["word"]
    if isinstance(top_col, pa.ChunkedArray):
        top_col = top_col.combine_chunks()
    top_ref = ray.put(top_col)

    def part(t: pa.Table) -> pa.Table:
        top = ray.get(top_ref)
        texts = t[
            "text"] if not isinstance(t["text"], pa.ChunkedArray) else t["text"].combine_chunks()
        words, counts, offs = _word_lists(texts)
        empty = pa.table({"bucket": pa.array([], pa.int32()),
                          "context": pa.array([], pa.string()),
                          "word": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if len(words) == 0:
            return empty
        da = pc.dictionary_encode(words)
        code = np.asarray(da.indices, dtype=np.int64)
        ndict = len(da.dictionary)
        # map each dictionary word to its top-set index (or -1)
        top_idx_of = np.full(ndict, -1, np.int64)
        pos = pc.index_in(da.dictionary, value_set=top)
        valid = np.asarray(pos.is_valid())
        pos_np = np.asarray(pos.fill_null(0)).astype(np.int64)
        top_idx_of[valid] = pos_np[valid]
        # same-doc index pairs at distances 1..window
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        keys = []
        for d in range(1, window + 1):
            i = np.arange(len(code) - d, dtype=np.int64)
            same = doc_of[i] == doc_of[i + d]
            a, b = code[i][same], code[i + d][same]
            for ctx, w in ((a, b), (b, a)):   # symmetric context
                ti = top_idx_of[ctx]
                m = ti >= 0
                keys.append(ti[m] * ndict + w[m])
        if not keys:
            return empty
        key = np.concatenate(keys)
        if len(key) == 0:
            return empty
        # dense O(n) bincount beats sort-based unique: the code space is
        # k x batch_vocab (a few MB), the key stream is ~2*window*positions
        counts = np.bincount(key, minlength=len(top) * ndict)
        uk = np.flatnonzero(counts)
        cnt = counts[uk]
        ctx_words = top.take(pa.array(uk // ndict))
        pair_words = da.dictionary.take(pa.array(uk % ndict))
        wu = pair_words.to_numpy(zero_copy_only=False).astype("U")
        return pa.table({
            "bucket": pa.array(
                (hash_str(wu) % np.uint64(num_buckets)).astype(np.int32)),
            "context": ctx_words,
            "word": pair_words,
            "n": pa.array(cnt.astype(np.int64)),
        })

    def bucket_sum(g: pa.Table) -> pa.Table:
        ctx = g["context"]
        w = g["word"]
        if isinstance(ctx, pa.ChunkedArray):
            ctx = ctx.combine_chunks()
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        pair = pc.binary_join_element_wise(ctx, w, "\x1f")
        da = pc.dictionary_encode(pair)
        totals = np.bincount(np.asarray(da.indices),
                             weights=np.asarray(g["n"]),
                             minlength=len(da.dictionary)).astype(np.int64)
        split = pc.split_pattern(da.dictionary, "\x1f")
        return pa.table({
            "context": pc.list_element(split, 0),
            "word": pc.list_element(split, 1),
            "n": pa.array(totals),
        })

    return (docs.map_batches(part, batch_format="pyarrow",
                             batch_size=batch_size)
            .groupby("bucket")
            .map_groups(bucket_sum, batch_format="pyarrow")
            .select_columns(["context", "word", "n"]))


def mixture_upsample(docs, *, budget: int = 1_000_000,
                     batch_size: int | None = None):
    """Domain-mixture UPSAMPLING — the replication complement of
    ``mixture_apply``'s keep-list: when a group's quota EXCEEDS its token
    mass, emit each doc ``quota // n_tokens`` times plus one extra copy for
    a deterministic hash-gated subset (``FNV(str(doc_id)) % n_tokens <
    quota % n_tokens``, which lands the remainder exactly in expectation) —
    The-Pile-style per-source epochs as an explicit copy table.

    Plan: quotas from ``mixture_quota`` (G bounded group rows collected
    once, broadcast in the task closure), then ONE stateless vectorized
    pass emitting (doc_id, copy_id) rows by np.repeat — no shuffle, no
    driver state beyond the G-row table. Groups with zero tokens emit
    nothing.

    Returns Dataset[doc_id, copy_id]."""
    from ..functions.collect import collect_table
    from ..functions.hashing import hash_str

    q = collect_table(mixture_quota(docs, budget=budget,
                                    batch_size=batch_size))
    if q.num_rows:
        gsrc = q["source"].to_numpy(zero_copy_only=False).astype("U")
        glng = q["lang"].to_numpy(zero_copy_only=False).astype("U")
        gkey = np.char.add(np.char.add(gsrc, "\x1f"), glng)
        # \x1f survives numpy U (only NUL is the terminator trap)
        gtok = np.asarray(q["n_tokens"]).astype(np.int64)
        gquota = np.asarray(q["quota"]).astype(np.int64)
    else:
        gkey = np.empty(0, "U1")
        gtok = gquota = np.empty(0, np.int64)
    order = np.argsort(gkey)
    gkey, gtok, gquota = gkey[order], gtok[order], gquota[order]

    def rep(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["source"], t["lang"], "\x1f")
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        k = key.to_numpy(zero_copy_only=False).astype("U")
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        gi = np.searchsorted(gkey, k)
        ok = (gi < len(gkey))
        gi = np.minimum(gi, max(len(gkey) - 1, 0))
        ok &= (gkey[gi] == k) if len(gkey) else False
        tokc = np.where(ok, gtok[gi], 0)
        quo = np.where(ok, gquota[gi], 0)
        m = tokc > 0
        ids, tokc, quo = ids[m], tokc[m], quo[m]
        h = hash_str(ids.astype("U"))
        base = quo // tokc
        extra = (h % tokc.astype(np.uint64)
                 < (quo % tokc).astype(np.uint64)).astype(np.int64)
        reps = base + extra
        out_ids = np.repeat(ids, reps)
        starts = np.zeros(len(reps), np.int64)
        np.cumsum(reps[:-1], out=starts[1:])
        copy_id = (np.arange(int(reps.sum()), dtype=np.int64)
                   - np.repeat(starts, reps))
        return pa.table({"doc_id": pa.array(out_ids),
                         "copy_id": pa.array(copy_id)})

    return docs.map_batches(rep, batch_format="pyarrow",
                            batch_size=batch_size)


# ------------------------------------------- gram frequency spectrum
def gram_spectrum(docs, *, n: int = 2, k_cap: int = 10,
                  column: str = "text", num_buckets: int = 64,
                  batch_size: int | None = None):
    """N-gram frequency-of-frequencies (the Good-Turing / unseen-species
    input curve): for each occurrence count k, how many DISTINCT word
    n-grams occur exactly k times corpus-wide. The spectrum's low-k mass is
    the classic corpus-diversity dial (a template-heavy corpus has a thin
    k=1 head; a diverse one is Zipf-shaped) and the k=1 row is the
    Good-Turing unseen-mass numerator.

    Counts are per OCCURRENCE (not distinct-doc). ``k_cap`` bounds the
    output: rows k = 1..k_cap are exact, and one row k = k_cap + 1
    aggregates every gram with count > k_cap (the capped tail keeps the
    result set O(k_cap) at any corpus size). Also emits k = 0 carrying the
    TOTAL distinct gram count, so the spectrum is self-normalizing.

    Scale shape: per-batch pre-aggregated (bucket, gram, partial-count)
    rows -> one gram-bucket groupby sums exact totals per gram STRING (no
    hash-collision merging) and emits its bucket-local capped spectrum ->
    the driver folds buckets x (k_cap + 2) tiny rows. The exchange is
    vocabulary-bounded — the same stated assumption as ``word_counts``."""
    from ..functions.collect import collect_table
    from .dedup import _gram_strings

    def partial(t: pa.Table) -> pa.Table:
        _, grams, _, _ = _gram_strings(t, n, column)
        if len(grams) == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "gram": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        da = pc.dictionary_encode(grams)
        counts = np.bincount(np.asarray(da.indices),
                             minlength=len(da.dictionary)).astype(np.int64)
        gram_str = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        return pa.table({
            "bucket": pa.array(
                (hash_str(gram_str) % np.uint64(num_buckets)).astype(np.int32)),
            "gram": da.dictionary,
            "c": pa.array(counts),
        })

    def bucket_spectrum(g: pa.Table) -> pa.Table:
        s = g["gram"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        da = pc.dictionary_encode(s)
        totals = np.bincount(np.asarray(da.indices),
                             weights=np.asarray(g["c"]),
                             minlength=len(da.dictionary)).astype(np.int64)
        capped = np.minimum(totals, k_cap + 1)
        spec = np.bincount(capped, minlength=k_cap + 2).astype(np.int64)
        spec[0] = len(totals)  # total distinct grams in this bucket
        return pa.table({
            "k": pa.array(np.arange(k_cap + 2, dtype=np.int64)),
            "n_grams": pa.array(spec),
        })

    parts = collect_table(
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=batch_size)
        .groupby("bucket")
        .map_groups(bucket_spectrum, batch_format="pyarrow"),
        empty_schema=pa.schema([("k", pa.int64()), ("n_grams", pa.int64())]),
    )
    spec = np.zeros(k_cap + 2, dtype=np.int64)
    if parts.num_rows:
        np.add.at(spec, np.asarray(parts["k"]).astype(np.int64),
                  np.asarray(parts["n_grams"]).astype(np.int64))
    return pa.table({
        "k": pa.array(np.arange(k_cap + 2, dtype=np.int64)),
        "n_grams": pa.array(spec),
    })


# ------------------------------------------- Naive-Bayes classifier training
NB_TRAIN_RATE = 0.5
NB_SCALE = 1000


def nb_classifier(docs, *, pos_lang: str = "en",
                  train_rate: float = NB_TRAIN_RATE, scale: int = NB_SCALE,
                  num_buckets: int = 64, doc_shard: int = 4096,
                  batch_size: int | None = None):
    """Distributed count-based classifier TRAINING + held-out scoring — the
    data-native analogue of the fasttext quality classifiers LLM pipelines
    train on trusted-vs-crawl text (GPT-3 / DCLM recipe, public): the
    labeled train split is a deterministic hash band of the corpus, the
    model is one multinomial count table, and every held-out document gets
    two-sided likelihood-ratio evidence scores. ``quality_score`` is the
    INFERENCE half of this pair (fixed/learned weights in); this operator
    is the TRAINING half (weights out of the corpus itself).

    Integer-exact Naive-Bayes surrogate so the oracle is bitwise: ratios
    replace logs. Per word ``w`` the model holds occurrence counts ``c1``
    (positive train docs: ``lang == pos_lang``; null lang negative) and
    ``c0``, with Laplace rate normalizers ``K1 = N1 + V``, ``K0 = N0 + V``
    (class occurrence totals + train vocab size) folded to two global ints
    ``r_pos = K0*scale // K1``, ``r_neg = K1*scale // K0``. A position's
    positive evidence is ``(c1+1)*r_pos // (c0+1)`` and its negative
    evidence ``(c0+1)*r_neg // (c1+1)`` — both sides unbounded above (the
    reason naive one-sided ratio sums degenerate under a class prior:
    negatives compress into [0, scale] while positives stretch), neutral
    ``~scale`` for words unseen in train. ``pred = score_pos >
    score_neg`` (strict); both sums are emitted so callers can threshold
    with their own prior.

    Train membership is ``sample_by_hash`` semantics (FNV(str(doc_id)) %
    1e6 < train_rate * 1e6) — a pure row function, reproducible at any
    scale/partitioning. Docs with zero words emit nothing.

    Scale shape — the ``lm_coverage`` skeleton split in two (the
    ``tfidf_top_terms`` two-pass precedent; NO broadcast, NO driver state
    beyond four ints — the vocabulary-sized model never exists in one
    place): pass A streams pre-aggregated train (bucket, word, c1, c0)
    partials through a word-bucket groupby into an exact model Dataset
    (materialized once) whose totals fold to (N1, N0, V) driver ints;
    pass B unions the model rows (doc_id = -1) with pre-aggregated
    held-out (word, doc_id, tf) rows, scores each word's held rows inside
    its bucket group, and a bounded doc-shard groupby sums per-doc
    partials and applies the decision rule."""
    from ..functions.collect import collect_table
    from .sampling import SAMPLE_MOD

    threshold = np.uint64(int(train_rate * SAMPLE_MOD))
    empty = pa.table({
        "bucket": pa.array([], pa.int32()),
        "word": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.int64()),
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
    })

    def _ids_mask(t: pa.Table):
        ids_col = t["doc_id"]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        ids = np.asarray(ids_col).astype(np.int64)
        is_train = (hash_str(ids.astype("U"))
                    % np.uint64(SAMPLE_MOD)) < threshold
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words, counts, _ = _word_lists(texts)
        parent = np.repeat(np.arange(len(counts)), counts)
        return ids, is_train, words, parent

    def train_rows(t: pa.Table) -> pa.Table:
        ids, is_train, words, parent = _ids_mask(t)
        if len(words) == 0:
            return empty
        pos = (
            pc.equal(t["lang"], pos_lang).fill_null(False)
            .to_numpy(zero_copy_only=False)
        )
        tmask = is_train[parent]
        if not tmask.any():
            return empty
        da = pc.dictionary_encode(words.filter(pa.array(tmask)))
        code = np.asarray(da.indices, dtype=np.int64)
        ndict = len(da.dictionary)
        ppos = pos[parent[tmask]]
        c1 = np.bincount(code[ppos], minlength=ndict).astype(np.int64)
        c0 = np.bincount(code[~ppos], minlength=ndict).astype(np.int64)
        wstr = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        return pa.table({
            "bucket": pa.array(
                (hash_str(wstr) % np.uint64(num_buckets)).astype(np.int32)),
            "word": da.dictionary,
            "doc_id": pa.array(np.full(ndict, -1, dtype=np.int64)),
            "a": pa.array(c1),
            "b": pa.array(c0),
        })

    def model_fold(g: pa.Table) -> pa.Table:
        s = g["word"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        da = pc.dictionary_encode(s)
        gi = np.asarray(da.indices, dtype=np.int64)
        c1 = np.zeros(len(da.dictionary), dtype=np.int64)
        c0 = np.zeros(len(da.dictionary), dtype=np.int64)
        np.add.at(c1, gi, np.asarray(g["a"]).astype(np.int64))
        np.add.at(c0, gi, np.asarray(g["b"]).astype(np.int64))
        first_bucket = np.asarray(g["bucket"]).astype(np.int32)[0]
        return pa.table({
            "bucket": pa.array(np.full(len(c1), first_bucket,
                                       dtype=np.int32)),
            "word": da.dictionary,
            "doc_id": pa.array(np.full(len(c1), -1, dtype=np.int64)),
            "a": pa.array(c1),
            "b": pa.array(c0),
        })

    model = (
        docs.map_batches(train_rows, batch_format="pyarrow",
                         batch_size=batch_size)
        .groupby("bucket")
        .map_groups(model_fold, batch_format="pyarrow")
        .materialize()
    )

    def totals(t: pa.Table) -> pa.Table:
        return pa.table({
            "n1": pa.array([int(pc.sum(t["a"]).as_py() or 0)]),
            "n0": pa.array([int(pc.sum(t["b"]).as_py() or 0)]),
            "v": pa.array([t.num_rows]),
        })

    tot = collect_table(
        model.map_batches(totals, batch_format="pyarrow"),
        empty_schema=pa.schema([("n1", pa.int64()), ("n0", pa.int64()),
                                ("v", pa.int64())]),
    )
    n1 = int(pc.sum(tot["n1"]).as_py() or 0)
    n0 = int(pc.sum(tot["n0"]).as_py() or 0)
    v = int(pc.sum(tot["v"]).as_py() or 0)
    k1, k0 = max(n1 + v, 1), max(n0 + v, 1)
    r_pos, r_neg = (k0 * scale) // k1, (k1 * scale) // k0

    def held_rows(t: pa.Table) -> pa.Table:
        ids, is_train, words, parent = _ids_mask(t)
        if len(words) == 0:
            return empty
        hmask = ~is_train[parent]
        if not hmask.any():
            return empty
        da = pc.dictionary_encode(words.filter(pa.array(hmask)))
        code = np.asarray(da.indices, dtype=np.int64)
        ndict = len(da.dictionary)
        hp = parent[hmask]
        pair, tf = np.unique(hp * ndict + code, return_counts=True)
        pd_, pg = pair // ndict, (pair % ndict).astype(np.int64)
        wstr = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        bucket = (hash_str(wstr) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            "bucket": pa.array(bucket[pg]),
            "word": da.dictionary.take(pa.array(pg)),
            "doc_id": pa.array(ids[pd_]),
            "a": pa.array(tf.astype(np.int64)),
            "b": pa.array(np.zeros(len(pair), dtype=np.int64)),
        })

    def score_fold(g: pa.Table) -> pa.Table:
        s = g["word"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        da = pc.dictionary_encode(s)
        gi = np.asarray(da.indices, dtype=np.int64)
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        a = np.asarray(g["a"]).astype(np.int64)
        b = np.asarray(g["b"]).astype(np.int64)
        is_model = ids < 0
        c1 = np.zeros(len(da.dictionary), dtype=np.int64)
        c0 = np.zeros(len(da.dictionary), dtype=np.int64)
        c1[gi[is_model]] = a[is_model]
        c0[gi[is_model]] = b[is_model]
        w_pos = ((c1 + 1) * r_pos) // (c0 + 1)
        w_neg = ((c0 + 1) * r_neg) // (c1 + 1)
        held = ~is_model
        hids, tf, hg = ids[held], a[held], gi[held]
        dd = pc.dictionary_encode(pa.array(hids))
        di = np.asarray(dd.indices, dtype=np.int64)
        uids = np.asarray(dd.dictionary, dtype=np.int64)
        # int64 add.at folds (bincount weights accumulate in float64 —
        # exact only below 2**53; scores can pass that at corpus scale)
        n_words = np.zeros(len(uids), dtype=np.int64)
        s_pos = np.zeros(len(uids), dtype=np.int64)
        s_neg = np.zeros(len(uids), dtype=np.int64)
        np.add.at(n_words, di, tf)
        np.add.at(s_pos, di, tf * w_pos[hg])
        np.add.at(s_neg, di, tf * w_neg[hg])
        return pa.table({
            "dshard": pa.array(uids // doc_shard),
            "doc_id": pa.array(uids),
            "n_words": pa.array(n_words),
            "score_pos": pa.array(s_pos),
            "score_neg": pa.array(s_neg),
        })

    def doc_fold(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        dd = pc.dictionary_encode(pa.array(ids))
        di = np.asarray(dd.indices, dtype=np.int64)
        uids = np.asarray(dd.dictionary, dtype=np.int64)
        sums = {}
        for c in ("n_words", "score_pos", "score_neg"):
            acc = np.zeros(len(uids), dtype=np.int64)
            np.add.at(acc, di, np.asarray(g[c]).astype(np.int64))
            sums[c] = acc
        return pa.table({
            "doc_id": pa.array(uids),
            "n_words": pa.array(sums["n_words"]),
            "score_pos": pa.array(sums["score_pos"]),
            "score_neg": pa.array(sums["score_neg"]),
            "pred": pa.array(
                (sums["score_pos"] > sums["score_neg"]).astype(np.int64)),
        })

    return (
        docs.map_batches(held_rows, batch_format="pyarrow",
                         batch_size=batch_size)
        .union(model)
        .groupby("bucket")
        .map_groups(score_fold, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(doc_fold, batch_format="pyarrow")
    )


def source_vocab_overlap(docs, *, n_buckets: int = 256,
                         batch_size: int | None = None):
    """Pairwise source vocabulary overlap: for every source pair
    ``(source_a < source_b, byte order)`` the number of DISTINCT words the
    two corpora share — the lexical-contamination / domain-similarity
    matrix a mixture corpus is audited with (pair Jaccard follows by
    dividing with the per-source distinct counts ``distinct_ngrams`` n=1
    already reports).

    Scale shape: per batch only DISTINCT (source, word) pairs leave (a
    word's repetitions inside a batch collapse before the exchange, the
    ``distinct_ngrams`` pre-dedup); the exchange is keyed by
    ``hash(word) % n_buckets`` so no group holds more than ~vocab/n_buckets
    words regardless of corpus size; inside a bucket the per-word source
    runs expand to pairs via the shared vectorized ``_expand_run_pairs``
    and collapse into dense S x S partial counts (sources are
    low-cardinality); a final tiny (source_a, source_b) groupby sums
    ~n_buckets partial rows per pair. Nothing corpus-sized is broadcast or
    driver-collected. NULL sources are skipped on both sides (the oracle's
    ``a.source < b.source`` join drops NULL anyway).

    Returns Dataset[source_a, source_b, n_common]."""
    from ..stages.dedup import _expand_run_pairs

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words, counts, _ = _word_lists(texts)
        parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        src_np = t["source"].to_numpy(zero_copy_only=False)
        doc_ok = np.array([x is not None for x in src_np], dtype=bool)
        keep = doc_ok[parent]
        if not keep.any():
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "word": pa.array([], pa.string()),
                             "source": pa.array([], pa.string())})
        us, si = np.unique(src_np[doc_ok].astype("U"), return_inverse=True)
        si_full = np.zeros(len(src_np), dtype=np.int64)
        si_full[doc_ok] = si
        # batch-distinct (source, word) via composite integer codes; the
        # word dictionary is hashed ONCE and gathered (never hash
        # per-occurrence strings)
        wd = pc.dictionary_encode(words.filter(pa.array(keep)))
        wcode = np.asarray(wd.indices, dtype=np.int64)
        nd = max(len(wd.dictionary), 1)
        pair = np.unique(si_full[parent[keep]] * nd + wcode)
        s_idx, w_idx = pair // nd, pair % nd
        dwords = wd.dictionary.to_numpy(zero_copy_only=False).astype("U")
        bh = (hash_str(dwords) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "bucket": pa.array(bh[w_idx]),
            "word": pa.array(dwords[w_idx]),
            "source": pa.array(us[s_idx]),
        })

    def bucket_fold(g: pa.Table) -> pa.Table:
        # np.unique on BYTE-ordered codes: code order == byte order, so
        # pos_a < pos_b inside a word run implies source_a < source_b
        snames, sc = np.unique(np.asarray(g["source"]).astype("U"),
                               return_inverse=True)
        _, wc = np.unique(np.asarray(g["word"]).astype("U"),
                          return_inverse=True)
        rows = np.unique(np.column_stack([wc, sc]), axis=0)
        pos_a, pos_b = _expand_run_pairs(rows[:, 0])
        if len(pos_a) == 0:
            return pa.table({"source_a": pa.array([], pa.string()),
                             "source_b": pa.array([], pa.string()),
                             "n_common": pa.array([], pa.int64())})
        S = len(snames)
        cnt = np.bincount(rows[pos_a, 1] * S + rows[pos_b, 1],
                          minlength=S * S)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "source_a": pa.array(snames[nz // S]),
            "source_b": pa.array(snames[nz % S]),
            "n_common": pa.array(cnt[nz].astype(np.int64)),
        })

    def pair_fold(g: pa.Table) -> pa.Table:
        return pa.table({
            "source_a": pa.array([str(g["source_a"][0].as_py())]),
            "source_b": pa.array([str(g["source_b"][0].as_py())]),
            "n_common": pa.array(
                [int(np.asarray(g["n_common"]).sum())], pa.int64()),
        })

    return (
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=batch_size)
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby(["source_a", "source_b"])
        .map_groups(pair_fold, batch_format="pyarrow")
    )


def kn_continuation_counts(docs, k: int = 30, *, num_buckets: int = 64,
                           batch_size: int | None = None):
    """Kneser-Ney continuation counts for the top-k words — the modified
    KN smoothing statistics an n-gram LM build needs (Kneser & Ney 1995;
    Chen & Goodman 1999): per word, total occurrences ``n``, distinct
    LEFT neighbors ``n_left`` (how many contexts the word continues —
    the KN numerator N1+(·w)) and distinct RIGHT neighbors ``n_right``
    (the context-fertility normalizer N1+(w·)). Bigrams are adjacent
    non-empty whitespace tokens within a document.

    Scale shape — ONE exchange for all three statistics: per-batch
    partials emit pre-aggregated unigram counts (key "word\\x1fc") and
    batch-distinct bigram pairs keyed BOTH directions ("w\\x1fl<j>" with
    j = hash(prev) % B, and "prev\\x1fr<j>" with j = hash(next) % B) —
    the fd_violations sharding, so no neighbor group exceeds ~vocab/B
    rows however hot the word, and cross-batch duplicate pairs collapse
    exactly in the group's np.unique. A per-word groupby sums the
    disjoint per-bucket distinct counts (exact: hash partitions
    neighbors), and the top-k finish is the ``top_words`` two-level
    candidate fold. Tokens never ship — only per-batch-distinct pairs.

    Returns Dataset[word, n, n_left, n_right, rank] (n DESC, word ASC)."""
    import ray.data as rd

    from ..functions.collect import collect_table

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parts = pc.split_pattern(texts.fill_null(""), " ")
        flat = pc.list_flatten(parts)
        nword = pc.list_value_length(parts).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), nword)
        da = pc.dictionary_encode(flat)
        code = np.asarray(da.indices).astype(np.int64)
        words = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        keep = np.asarray(pc.not_equal(flat, "")).astype(bool)
        doc_idx, code = doc_idx[keep], code[keep]
        cnt = np.bincount(code, minlength=len(words))
        present = np.flatnonzero(cnt)
        keys = [np.char.add(words[present], "\x1fc")]
        others = [np.full(len(present), "", "U1")]
        ns = [cnt[present].astype(np.int64)]
        adj = doc_idx[1:] == doc_idx[:-1] if len(code) > 1 else (
            np.zeros(0, bool))
        if adj.any():
            prev_c, next_c = code[:-1][adj], code[1:][adj]
            pair = np.unique(prev_c * np.int64(len(words)) + next_c)
            pc_, nc_ = pair // np.int64(len(words)), pair % np.int64(len(words))
            h = hash_str(words) % np.uint64(num_buckets)
            lj = h[pc_].astype(np.int64)  # bucket by prev for the left key
            rj = h[nc_].astype(np.int64)  # bucket by next for the right key
            keys.append(np.char.add(np.char.add(
                words[nc_], "\x1fl"), lj.astype("U")))
            others.append(words[pc_])
            ns.append(np.zeros(len(pair), np.int64))
            keys.append(np.char.add(np.char.add(
                words[pc_], "\x1fr"), rj.astype("U")))
            others.append(words[nc_])
            ns.append(np.zeros(len(pair), np.int64))
        return pa.table({
            "key": pa.array(np.concatenate(keys), pa.string()),
            "other": pa.array(np.concatenate(others), pa.string()),
            "n": pa.array(np.concatenate(ns)),
        })

    def fold(g: pa.Table) -> pa.Table:
        key = g["key"][0].as_py()
        word, _, tag = key.rpartition("\x1f")
        n = n_left = n_right = 0
        if tag == "c":
            n = int(np.asarray(g["n"]).astype(np.int64).sum())
        else:
            others = g["other"]
            if isinstance(others, pa.ChunkedArray):
                others = others.combine_chunks()
            d = len(np.unique(np.asarray(others).astype("U")))
            if tag.startswith("l"):
                n_left = d
            else:
                n_right = d
        return pa.table({
            "word": pa.array([word], pa.string()),
            "n": pa.array([n], pa.int64()),
            "n_left": pa.array([n_left], pa.int64()),
            "n_right": pa.array([n_right], pa.int64()),
        })

    def local_topk(t: pa.Table) -> pa.Table:
        w = np.asarray(t["word"]).astype("U")
        n = np.asarray(t["sum(n)"]).astype(np.int64)
        order = np.lexsort((w, -n))[:k]
        return pa.table({
            "word": pa.array(w[order], pa.string()),
            "n": pa.array(n[order]),
            "n_left": pa.array(
                np.asarray(t["sum(n_left)"]).astype(np.int64)[order]),
            "n_right": pa.array(
                np.asarray(t["sum(n_right)"]).astype(np.int64)[order]),
        })

    cand = collect_table(
        docs.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("key").map_groups(fold, batch_format="pyarrow")
        .groupby("word").sum(["n", "n_left", "n_right"])
        .map_batches(local_topk, batch_format="pyarrow"),
        empty_schema=pa.schema([
            ("word", pa.string()), ("n", pa.int64()),
            ("n_left", pa.int64()), ("n_right", pa.int64())]))
    w = (cand["word"].to_numpy(zero_copy_only=False).astype("U")
         if cand.num_rows else np.empty(0, "U1"))
    n = np.asarray(cand["n"]).astype(np.int64) if cand.num_rows else (
        np.empty(0, np.int64))
    order = np.lexsort((w, -n))[:k]
    return rd.from_arrow(pa.table({
        "word": pa.array(w[order], pa.string()),
        "n": pa.array(n[order]),
        "n_left": pa.array(
            np.asarray(cand["n_left"]).astype(np.int64)[order]
            if cand.num_rows else np.empty(0, np.int64)),
        "n_right": pa.array(
            np.asarray(cand["n_right"]).astype(np.int64)[order]
            if cand.num_rows else np.empty(0, np.int64)),
        "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
    }))


def _make_source_word_partial(num_buckets: int):
    """Shared per-batch partial for the (source, word)-count exchange
    (simpson_diversity and keyness_terms): pre-aggregated batch-distinct
    (source, word, n) rows keyed by hash(word) % B. Null sources coalesce
    to '*' BEFORE grouping — the rollup_counts convention, mirrored by
    coalesce(source, '*') in both oracles — because a null-bearing
    dictionary's indices materialize as NaN and corrupt the int64 key
    arithmetic."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        parts = pc.split_pattern(texts.fill_null(""), " ")
        flat = pc.list_flatten(parts)
        nword = pc.list_value_length(parts).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), nword)
        da = pc.dictionary_encode(flat)
        code = np.asarray(da.indices).astype(np.int64)
        words = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
        sd = pc.dictionary_encode(pc.fill_null(src.cast(pa.string()), "*"))
        si = np.asarray(sd.indices).astype(np.int64)[doc_idx]
        keep = np.asarray(pc.not_equal(flat, "")).astype(bool)
        si, code = si[keep], code[keep]
        key = si * np.int64(len(words)) + code
        uk, cnt = np.unique(key, return_counts=True)
        wc = (uk % np.int64(len(words))).astype(np.int64)
        sc = (uk // np.int64(len(words))).astype(np.int64)
        snames = sd.dictionary.cast(pa.string())
        h = hash_str(words) % np.uint64(num_buckets)
        return pa.table({
            "bucket": pa.array(h[wc].astype(np.int64)),
            "source": pc.take(snames, pa.array(sc)),
            "word": pa.array(words[wc], pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    return partial


def simpson_diversity(docs, *, num_buckets: int = 64,
                      batch_size: int | None = None):
    """Per-source lexical-concentration profile — the integer core of the
    Simpson / Herfindahl diversity index (the corpus-mix dial next to the
    entropy curves a curation report wants, kept log-free so the oracle is
    bitwise): per source, total word occurrences ``n_words``, vocabulary
    size ``distinct_words``, and ``simpson_num`` = Σ_w n_w·(n_w−1) — the
    numerator of the repeat-probability n_w(n_w−1)/N(N−1); higher means
    occurrences concentrate in fewer words. int64-exact while every
    per-(source, word) count stays below ~3e9 (beyond that the square
    overflows — shard sources before this audit at that scale).

    Scale shape: per-batch pre-aggregated (source, word) counts travel
    keyed by hash(word) % B, so each bucket group holds EVERY count of its
    words (per-(source, word) totals are exact in-group) at ≤ vocab/B ×
    sources rows; groups emit per-source partial (N, D, Σn(n−1)) triples
    and a final low-cardinality source groupby sums them. Tokens never
    ship; the exchange is batch-distinct (source, word) rows.

    Returns Dataset[source, n_words, distinct_words, simpson_num]."""
    partial = _make_source_word_partial(num_buckets)

    def bucket_fold(g: pa.Table) -> pa.Table:
        src = g["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        w = np.asarray(g["word"]).astype("U")
        n = np.asarray(g["n"]).astype(np.int64)
        sd = pc.dictionary_encode(src)
        si = np.asarray(sd.indices).astype(np.int64)
        uw, winv = np.unique(w, return_inverse=True)
        uk, inv = np.unique(si * np.int64(len(uw)) + winv,
                            return_inverse=True)
        tot = np.zeros(len(uk), np.int64)
        np.add.at(tot, inv, n)
        usrc = (uk // np.int64(len(uw))).astype(np.int64)
        ns = len(sd.dictionary)
        N = np.zeros(ns, np.int64)
        D = np.zeros(ns, np.int64)
        S = np.zeros(ns, np.int64)
        np.add.at(N, usrc, tot)
        np.add.at(D, usrc, 1)
        np.add.at(S, usrc, tot * (tot - 1))
        return pa.table({
            "source": sd.dictionary.cast(pa.string()),
            "n_words": pa.array(N),
            "distinct_words": pa.array(D),
            "simpson_num": pa.array(S),
        })

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t["source"],
            "n_words": t["sum(n_words)"],
            "distinct_words": t["sum(distinct_words)"],
            "simpson_num": t["sum(simpson_num)"],
        })

    return (docs.select_columns(["source", "text"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=batch_size)
            .groupby("bucket").map_groups(bucket_fold,
                                          batch_format="pyarrow")
            .groupby("source").sum(["n_words", "distinct_words",
                                    "simpson_num"])
            .map_batches(rename, batch_format="pyarrow"))


def keyness_terms(docs, k: int = 10, *, num_buckets: int = 64,
                  batch_size: int | None = None):
    """Distinctive-vocabulary ranking between the two lexicographically
    smallest sources — the log-free core of a keyness / G-test keyword
    contrast (which words characterize feed A vs feed B): per word,
    ``score`` = n_a·N_b − n_b·N_a (the cross-scaled rate difference —
    positive means the word is relatively A-leaning), with the top-k
    A-leaning (score DESC) and top-k B-leaning (score ASC) words reported
    per side. int64-exact while n·N stays below 2^63 (shard sources
    first past ~1e9×1e9 occurrence products).

    Scale shape: ONE tokenize pass materialized as pre-aggregated
    (bucket, source, word, n) partials; a low-cardinality source fold
    gives the two totals N_a/N_b (picking the pair deterministically);
    the word-hash-bucketed groupby then owns every count of its words, so
    per-word (n_a, n_b) and scores are exact in-group and each bucket
    emits only its local top-k per side — the driver merges B×2k
    candidate rows. Tokens never ship.

    Returns Dataset[side, word, n_a, n_b, score, rank] ('a' rows rank by
    score DESC, 'b' rows by score ASC; ties word ASC)."""
    import ray
    import ray.data as rd

    from ..functions.collect import collect_table

    partial = _make_source_word_partial(num_buckets)
    partials = (docs.select_columns(["source", "text"])
                .map_batches(partial, batch_format="pyarrow",
                             batch_size=batch_size).materialize())

    totals_tbl = collect_table(
        partials.groupby("source").sum("n"),
        empty_schema=pa.schema([("source", pa.string()),
                                ("sum(n)", pa.int64())]))
    srcs = sorted(totals_tbl["source"].to_pylist())[:2]
    if len(srcs) < 2:
        return rd.from_arrow(pa.table({
            "side": pa.array([], pa.string()),
            "word": pa.array([], pa.string()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())}))
    a_name, b_name = srcs[0], srcs[1]
    tot = dict(zip(totals_tbl["source"].to_pylist(),
                   (int(v) for v in totals_tbl["sum(n)"].to_pylist())))
    pair_ref = ray.put((a_name, b_name, tot[a_name], tot[b_name]))

    def bucket_topk(g: pa.Table) -> pa.Table:
        an, bn, n_a_tot, n_b_tot = ray.get(pair_ref)
        src = np.asarray(g["source"]).astype("U")
        w = np.asarray(g["word"]).astype("U")
        n = np.asarray(g["n"]).astype(np.int64)
        in_pair = (src == an) | (src == bn)
        src, w, n = src[in_pair], w[in_pair], n[in_pair]
        uw, winv = np.unique(w, return_inverse=True)
        n_a = np.zeros(len(uw), np.int64)
        n_b = np.zeros(len(uw), np.int64)
        is_a = src == an
        np.add.at(n_a, winv[is_a], n[is_a])
        np.add.at(n_b, winv[~is_a], n[~is_a])
        score = n_a * np.int64(n_b_tot) - n_b * np.int64(n_a_tot)
        out = []
        for side, order in (("a", np.lexsort((uw, -score))[:k]),
                            ("b", np.lexsort((uw, score))[:k])):
            out.append(pa.table({
                "side": pa.array([side] * len(order), pa.string()),
                "word": pa.array(uw[order], pa.string()),
                "n_a": pa.array(n_a[order]),
                "n_b": pa.array(n_b[order]),
                "score": pa.array(score[order]),
            }))
        return pa.concat_tables(out)

    cand = collect_table(
        partials.groupby("bucket").map_groups(bucket_topk,
                                              batch_format="pyarrow"),
        empty_schema=pa.schema([
            ("side", pa.string()), ("word", pa.string()),
            ("n_a", pa.int64()), ("n_b", pa.int64()),
            ("score", pa.int64())]))
    side = (np.asarray(cand["side"]).astype("U")
            if cand.num_rows else np.empty(0, "U1"))
    w = (np.asarray(cand["word"]).astype("U")
         if cand.num_rows else np.empty(0, "U1"))
    n_a = (np.asarray(cand["n_a"]).astype(np.int64)
           if cand.num_rows else np.empty(0, np.int64))
    n_b = (np.asarray(cand["n_b"]).astype(np.int64)
           if cand.num_rows else np.empty(0, np.int64))
    sc = (np.asarray(cand["score"]).astype(np.int64)
          if cand.num_rows else np.empty(0, np.int64))
    out = []
    for s, sgn in (("a", -1), ("b", 1)):
        m = side == s
        order = np.flatnonzero(m)[np.lexsort((w[m], sgn * sc[m]))][:k]
        out.append(pa.table({
            "side": pa.array([s] * len(order), pa.string()),
            "word": pa.array(w[order], pa.string()),
            "n_a": pa.array(n_a[order]),
            "n_b": pa.array(n_b[order]),
            "score": pa.array(sc[order]),
            "rank": pa.array(np.arange(1, len(order) + 1,
                                       dtype=np.int64)),
        }))
    return rd.from_arrow(pa.concat_tables(out))


def temperature_mix(docs, *, budget: int = 1_000_000,
                    batch_size: int | None = None):
    """Temperature-scaled domain-mixture quotas (the multilingual /
    multi-domain rebalancing sampler: α = 0.5, so a group's sampling
    weight is √n_tokens — big sources are damped, small ones boosted;
    cf. the temperature-based mixing of multilingual pretraining) —
    exact integers throughout: weight = isqrt(n_tokens) (integer square
    root, no float sqrt drift), quota = largest-remainder allocation of
    ``budget`` ∝ weight (ties: remainder DESC, source ASC, lang ASC),
    so quotas sum to ``budget`` whenever any weight is positive.

    Reuses the ``mixture_quota`` exchange wholesale (per-batch
    pre-aggregated group partials, one low-cardinality groupby); only
    the G-row driver-side allocation differs. Returns
    Dataset[source, lang, n_docs, n_tokens, weight, quota]."""
    import math

    import ray.data as rd

    base = mixture_quota(docs, budget=budget, batch_size=batch_size)
    rows = base.take_all()
    src = np.array([r["source"] for r in rows], dtype="U") if rows else (
        np.empty(0, "U1"))
    lng = np.array([r["lang"] for r in rows], dtype="U") if rows else (
        np.empty(0, "U1"))
    nd = np.array([r["n_docs"] for r in rows], np.int64)
    nt = np.array([r["n_tokens"] for r in rows], np.int64)
    w = np.array([math.isqrt(int(x)) for x in nt], np.int64)
    tot = int(w.sum())
    if tot > 0:
        fl = budget * w // tot
        rem = budget * w % tot
        quota = fl.copy()
        short = int(budget - fl.sum())
        order = np.lexsort((lng, src, -rem))
        quota[order[:short]] += 1
    else:
        quota = np.zeros(len(w), np.int64)
    order = np.lexsort((lng, src))
    return rd.from_arrow(pa.table({
        "source": pa.array(src[order], pa.string()),
        "lang": pa.array(lng[order], pa.string()),
        "n_docs": pa.array(nd[order]),
        "n_tokens": pa.array(nt[order]),
        "weight": pa.array(w[order]),
        "quota": pa.array(quota[order]),
    }))


CHAR_ENTROPY_SCALE = 1_000_000  # shared with the SQL oracle (dataops)


def char_entropy(docs, *, scale: int = CHAR_ENTROPY_SCALE,
                 batch_size: int | None = None):
    """Per-document order-0 character (codepoint) entropy in FIXED POINT —
    the classic gibberish/boilerplate quality signal (low entropy =
    repetitive template text, high = random noise; a standard pre-filter
    next to the Gopher ratio rules).

    ``entropy_fp`` = Σ_symbols floor(-scale · p · log2 p) with
    p = count/len — per-symbol contributions floored BEFORE the integer
    sum (the a_drift_psi convention), so the result is order-independent
    and bitwise oracle-comparable while log2 stays the only float.

    Plan shape: a stateless per-batch map, no shuffle. Per batch the text
    column converts once to a numpy U array and views as UCS-4 codepoints
    ((n, W) uint32 — the same per-batch conversion cost as the other
    textops kernels; NUL-bearing corpora are out of contract, the
    documented printable-corpus assumption), per-(doc, codepoint) counts
    come from one np.unique over packed keys. Docs with no characters are
    skipped (the SQL mirror's WHERE length(text) > 0).

    Returns Dataset[doc_id, n_chars_counted, entropy_fp]."""

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        u = texts.to_numpy(zero_copy_only=False)
        valid = np.array([x is not None for x in u], dtype=bool)
        su = u[valid].astype("U")
        n = len(su)
        if n == 0 or su.dtype.itemsize == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_chars_counted": pa.array([], pa.int64()),
                "entropy_fp": pa.array([], pa.int64())})
        W = su.dtype.itemsize // 4
        cp = su.view(np.uint32).reshape(n, W)
        docx, colx = np.nonzero(cp)  # 0 = padding (printable contract)
        key = docx.astype(np.int64) * np.int64(0x110000) + cp[docx, colx]
        uk, cnt = np.unique(key, return_counts=True)
        d = (uk // np.int64(0x110000)).astype(np.int64)
        lens = np.zeros(n, np.int64)
        np.add.at(lens, d, cnt)
        p = cnt / lens[d]
        contrib = np.floor(-float(scale) * p * np.log2(p)).astype(np.int64)
        ent = np.zeros(n, np.int64)
        np.add.at(ent, d, contrib)
        nz = np.flatnonzero(lens > 0)
        return pa.table({
            "doc_id": pa.array(ids[valid][nz]),
            "n_chars_counted": pa.array(lens[nz]),
            "entropy_fp": pa.array(ent[nz]),
        })

    return docs.map_batches(partial, batch_format="pyarrow",
                            batch_size=batch_size)
