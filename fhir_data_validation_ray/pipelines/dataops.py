"""Training-data-pipeline operator queries + DuckDB oracles.

One ``queries()`` entry per operator over the driver's ``documents`` /
``embeddings`` tables (pre-registered as DuckDB views by the driver, so the
oracle SQL references them by name). Column names and integer/exact-division
output types match the Ray side bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from ..stages.textops import BPE_TOKEN_RE, LANG_MARKERS, PUNCT_RE, STOPWORDS

ANN_QUERY_IDS = [0, 7, 42, 123, 321]
ANN_K = 5
COSINE_PAIR_THRESHOLD = 0.45
EMBED_DECON_THRESHOLD = 0.35  # decon casts a wider net than near-dup pairing
JACCARD_N = 2
JACCARD_THRESHOLD = 0.8


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def q_text_features(sf_dir: str):
    from ..stages.textops import text_features

    return text_features(_docs(sf_dir))


def q_language_id(sf_dir: str):
    from ..stages.textops import language_id

    return language_id(_docs(sf_dir))


def q_fingerprints(sf_dir: str):
    from ..stages.textops import fingerprints

    return fingerprints(_docs(sf_dir))


def q_exact_dedup(sf_dir: str):
    from ..stages.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


CHUNK_ID_MULT = 1 << 20  # packed (doc_id, chunk_id) survivor key


def q_chunk_dedup(sf_dir: str):
    """CHUNK-level exact dedup — RAG-index / training-window hygiene the
    doc-level pass cannot see (overlapping windows of near-identical docs
    collide only at chunk granularity): chunk_documents -> exact_dedup on
    chunk_text keyed by the packed (doc_id, chunk_id) id; survivors =
    lowest packed id per distinct chunk text."""
    import pyarrow as pa

    from ..stages.dedup import exact_dedup
    from ..stages.textops import chunk_documents

    def pack(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"]).astype(np.int64)
        c = np.asarray(t["chunk_id"]).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(d * CHUNK_ID_MULT + c),
            "text": t["chunk_text"],
        })

    chunks = chunk_documents(_docs(sf_dir)).map_batches(
        pack, batch_format="pyarrow")
    return exact_dedup(chunks).map_batches(
        lambda t: pa.table({"cid": t["doc_id"]}), batch_format="pyarrow")


def _chunk_dedup_sql() -> str:
    from ..stages.textops import CHUNK_SIZE, CHUNK_STRIDE

    return f"""
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
                  AS ws FROM documents),
c AS (SELECT doc_id, ws, unnest(range(0, len(ws), {CHUNK_STRIDE})) AS st
      FROM w),
ch AS (SELECT doc_id * {CHUNK_ID_MULT} + (st // {CHUNK_STRIDE}) AS cid,
              array_to_string(ws[st + 1 : st + {CHUNK_SIZE}], ' ') AS t
       FROM c)
SELECT min(cid)::BIGINT AS cid FROM ch GROUP BY t
"""


def q_ngram_jaccard(sf_dir: str):
    from ..stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir), n=JACCARD_N, threshold=JACCARD_THRESHOLD)


def q_minhash_lsh(sf_dir: str):
    from ..stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir), n=JACCARD_N, threshold=JACCARD_THRESHOLD)


def q_dedup_clusters(sf_dir: str):
    """Near-dup pair graph -> connected components (cluster = min doc id of
    the component) — the keep/drop resolution step after pair detection."""
    from ..stages.dedup import dedup_clusters, ngram_jaccard_pairs

    return dedup_clusters(
        ngram_jaccard_pairs(_docs(sf_dir), n=JACCARD_N, threshold=JACCARD_THRESHOLD)
    )


def q_cluster_sizes(sf_dir: str):
    """Cluster-size histogram over the near-dup components (template-
    explosion health dial one step past dedup_clusters)."""
    from ..stages.dedup import (cluster_size_histogram, dedup_clusters,
                                ngram_jaccard_pairs)

    return cluster_size_histogram(dedup_clusters(ngram_jaccard_pairs(
        _docs(sf_dir), n=JACCARD_N, threshold=JACCARD_THRESHOLD)))


SAMPLE_RATE = 0.1
STRATIFIED_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
STRATIFIED_DEFAULT = 0.2


def q_sample(sf_dir: str):
    from ..stages.sampling import sample_by_hash

    return sample_by_hash(_docs(sf_dir), SAMPLE_RATE).select_columns(["doc_id"])


def q_sample_stratified(sf_dir: str):
    import ray.data as rd

    from ..stages.sampling import stratified_sample_by_hash

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return stratified_sample_by_hash(
        ds, STRATIFIED_RATES, group_col="source", default_rate=STRATIFIED_DEFAULT
    ).select_columns(["doc_id"])


BADWORDS = ("dup", "spark")
BADWORD_MAX_HITS = 2


def q_badwords(sf_dir: str):
    """C4-style blocklist gate: whole-word blocklist hit counts + keep flag
    (``textops.badword_filter``); stateless vectorized map."""
    from ..stages.textops import badword_filter

    return badword_filter(_docs(sf_dir), BADWORDS, max_hits=BADWORD_MAX_HITS)


def q_winnow(sf_dir: str):
    """Winnowing (MOSS) local fingerprints: per-window minimum k-gram hash,
    rightmost on ties (``textops.winnow_fingerprints``); stateless map."""
    from ..stages.textops import winnow_fingerprints

    return winnow_fingerprints(_docs(sf_dir))


WEIGHT_PPM_PER_CHAR = 1500  # keep probability grows with doc length


def q_weighted_sample(sf_dir: str):
    """Quality-weighted deterministic sampling: per-doc keep probability
    (ppm) derived from n_chars, gated by the shared FNV fold
    (``sampling.weighted_sample_by_hash``)."""
    import ray.data as rd

    from ..stages.sampling import weighted_sample_by_hash

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def add_weight(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        w = pc.min_element_wise(
            pc.multiply(pc.cast(t["n_chars"], pa.int64()),
                        WEIGHT_PPM_PER_CHAR),
            1_000_000,
        )
        return t.append_column("w_ppm", w)

    return weighted_sample_by_hash(
        ds.map_batches(add_weight, batch_format="pyarrow"), "w_ppm"
    ).select_columns(["doc_id"])


def q_split_leakage(sf_dir: str):
    """Train/val/test near-dup LEAKAGE AUDIT — the check that hash-band
    splitting alone can't give: counts near-dup pairs (exact n-gram Jaccard,
    the ``d_ngram_jaccard`` edges) by the unordered split-band pair of their
    endpoints. Off-diagonal rows (train|test etc.) are evaluation
    contamination the splitter can't see because near-dups have DIFFERENT
    doc_ids; a curation pipeline drops one side of each such pair first
    (``c_keep_best``) and this audit verifies the outcome. Bands are the
    same pure hash function as ``split_assign`` (no join — labels computed
    endpoint-wise in a stateless map), then a tiny low-cardinality count."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import hash_str
    from ..stages.dedup import ngram_jaccard_pairs
    from ..stages.joins import lowcard_count
    from ..stages.sampling import SAMPLE_MOD, SPLIT_BANDS

    names = np.array([n for n, _ in SPLIT_BANDS])
    rates = np.cumsum([r for _, r in SPLIT_BANDS])
    cuts = np.minimum((rates * SAMPLE_MOD).round().astype(np.int64),
                      SAMPLE_MOD)[:-1]

    def band(col) -> np.ndarray:
        h = (hash_str(np.asarray(col).astype("U"))
             % np.uint64(SAMPLE_MOD)).astype(np.int64)
        return names[np.searchsorted(cuts, h, side="right")]

    def label(t: pa.Table) -> pa.Table:
        a, b = band(t["doc_a"]), band(t["doc_b"])
        swap = a <= b  # np.minimum has no ufunc loop for unicode dtypes
        lo, hi = np.where(swap, a, b), np.where(swap, b, a)
        return pa.table(
            {"splits": pa.array(np.char.add(np.char.add(lo, "|"), hi))})

    pairs = ngram_jaccard_pairs(
        _docs(sf_dir), n=JACCARD_N, threshold=JACCARD_THRESHOLD)
    counted = lowcard_count(
        pairs.map_batches(label, batch_format="pyarrow"), "splits")

    def unpack(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = pc.split_pattern(t["splits"], "|")
        return pa.table({
            "split_a": pc.list_element(parts, 0),
            "split_b": pc.list_element(parts, 1),
            "n_pairs": t["n"],
        })

    return counted.map_batches(unpack, batch_format="pyarrow")


def q_hash_embed(sf_dir: str):
    """Deterministic hashed doc embeddings (integer fasttext-shaped
    producer; ``textops.hash_embed``); stateless vectorized map."""
    from ..stages.textops import hash_embed

    return hash_embed(_docs(sf_dir))


CLUSTER_CAP_K = 8
CLUSTER_CAP_N = 40


def q_cluster_cap(sf_dir: str):
    """Diversity-capped curation (SemDeDup-shaped): nearest-centroid
    assignment over the integer hashed embeddings, then at most
    CLUSTER_CAP_N survivors per cluster via the exactly-N-per-group
    histogram refinement (``curation.cluster_cap_keep``). Centroids derive
    from the CLUSTER_CAP_K lowest doc_ids through a pushdown-filtered read
    — the corpus is never scanned to seed them."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from .curation import cluster_cap_keep, hash_centroids

    seed = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=pads.field("doc_id") < CLUSTER_CAP_K)
    cents = hash_centroids(seed, CLUSTER_CAP_K)
    return cluster_cap_keep(_docs(sf_dir), cents, cap=CLUSTER_CAP_N)


CLUSTER_SHARD_BLOCKS = 4


def q_cluster_shards(sf_dir: str):
    """Semantic shard layout (``curation.cluster_shards``): shard =
    cluster * B + hash-block, pos = rank within shard — cluster-contiguous
    training shards with bounded rank groups."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from .curation import cluster_shards, hash_centroids

    seed = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=pads.field("doc_id") < CLUSTER_CAP_K)
    cents = hash_centroids(seed, CLUSTER_CAP_K)
    return cluster_shards(_docs(sf_dir), cents,
                          blocks_per_cluster=CLUSTER_SHARD_BLOCKS)


def _cluster_shards_sql() -> str:
    """cluster_shards mirror: the cluster-cap assignment chain (no cap),
    shard = cluster * B + FNV(doc_id) % B, pos = rank by (h, doc_id)."""
    from ..stages.textops import HASH_EMBED_DIM as D

    B = CLUSTER_SHARD_BLOCKS
    dot = " + ".join(f"d.e{j} * c.e{j}" for j in range(D))
    cols = ", ".join(f"e{j}" for j in range(D))
    fnv = _fnv_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH {_hash_embed_ctes()},
cent AS (SELECT doc_id AS k, {cols} FROM emb WHERE doc_id < {CLUSTER_CAP_K}),
dots AS (SELECT d.doc_id, c.k, ({dot})::BIGINT AS dot
         FROM emb d CROSS JOIN cent c),
best AS (SELECT doc_id, k AS cluster,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY dot DESC, k ASC) AS rn
         FROM dots),
a AS (SELECT doc_id, cluster::BIGINT AS cluster, {fnv} AS h
      FROM best WHERE rn = 1),
s AS (SELECT doc_id, cluster,
             (cluster * {B} + CAST(h % {B} AS BIGINT))::BIGINT AS shard, h
      FROM a)
SELECT doc_id, cluster, shard,
  (row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1)::BIGINT
  AS pos
FROM s
"""


KMEANS_ITERS = 3


def q_kmeans(sf_dir: str):
    """Distributed integer Lloyd k-means (``curation.kmeans_train``):
    3 fixed rounds from the hash_centroids seed, each one streaming
    bincount fold; returns the K centroid rows + final member counts."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data as rd

    from .curation import hash_centroids, kmeans_train

    seed = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=pads.field("doc_id") < CLUSTER_CAP_K)
    init = hash_centroids(seed, CLUSTER_CAP_K)
    C, counts = kmeans_train(_docs(sf_dir), init, iters=KMEANS_ITERS)
    return pa.table({
        "cluster": pa.array(np.arange(len(C), dtype=np.int64)),
        "n_members": pa.array(counts),
        **{f"c{j}": pa.array(C[:, j]) for j in range(C.shape[1])},
    })


def q_cluster_cap_trained(sf_dir: str):
    """The full SemDeDup composition end-to-end: hash_centroids seed ->
    3 Lloyd rounds (``kmeans_train``) -> L2 nearest-centroid assignment ->
    per-cluster cap. One oracle covers training AND application."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from .curation import cluster_cap_keep, hash_centroids, kmeans_train

    seed = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=pads.field("doc_id") < CLUSTER_CAP_K)
    init = hash_centroids(seed, CLUSTER_CAP_K)
    C, _ = kmeans_train(_docs(sf_dir), init, iters=KMEANS_ITERS)
    return cluster_cap_keep(_docs(sf_dir), C, cap=CLUSTER_CAP_N, metric="l2")


def q_truncate(sf_dir: str):
    """Token-budget truncation to the first 40 whitespace tokens
    (``textops.truncate_docs``); streaming Arrow split/slice/rejoin."""
    from ..stages.textops import truncate_docs

    return truncate_docs(_docs(sf_dir))


SAMPLE_EXACT_N = 97


def q_sample_n(sf_dir: str):
    """Deterministic exactly-N sample: the N smallest (FNV(doc_id), doc_id)
    keys — global ORDER BY hash LIMIT N via iterative histogram refinement,
    no global sort (``stages/sampling.py:sample_exact_n``)."""
    from ..stages.sampling import sample_exact_n

    # num_buckets=16 forces multi-round refinement even at fixture scale so
    # the oracle exercises the same path a 10^12-row corpus takes.
    return sample_exact_n(
        _docs(sf_dir), SAMPLE_EXACT_N, num_buckets=16, max_boundary=8
    ).select_columns(["doc_id"])


SAMPLE_N_PER_GROUP = 10


def q_sample_n_by_source(sf_dir: str):
    """Balanced exactly-N-per-source sample (ORDER BY hash LIMIT N
    PARTITION BY source, no sort — ``sampling.sample_exact_n_by_group``).
    Tiny num_buckets/max_boundary force the multi-round refinement path."""
    import ray.data as rd

    from ..stages.sampling import sample_exact_n_by_group

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return sample_exact_n_by_group(
        ds, SAMPLE_N_PER_GROUP, group_col="source", num_buckets=16,
        max_boundary=2,
    ).select_columns(["doc_id", "source"])


CURATION_SAMPLE_RATE = 0.9


def q_curation(sf_dir: str):
    """Flagship curation keep-list: exact dedup ∧ quality ∧ sample ∧ NOT
    near-dup-cluster-dropped — every step oracle-checked individually AND
    composed (the SQL oracle chains the same four membership rules)."""
    from .curation import curate_keep_list

    return curate_keep_list(_docs(sf_dir), sample_rate=CURATION_SAMPLE_RATE)


def q_curation_clf(sf_dir: str):
    """The flagship keep-list with the model-based gate added: the hashed
    linear classifier (score >= 0) joins the four heuristic membership
    streams in the same single bucketed fold."""
    from .curation import curate_keep_list

    return curate_keep_list(_docs(sf_dir), sample_rate=CURATION_SAMPLE_RATE,
                            classifier_threshold=0)


def q_keep_best(sf_dir: str):
    """Quality-aware near-dup resolution: each jaccard component keeps its
    longest member (ties -> lowest doc_id); unclustered docs all survive."""
    from .curation import curate_keep_best

    return curate_keep_best(_docs(sf_dir))


def q_embed_dedup(sf_dir: str):
    """Embedding-cosine near-dup keep-list: exact-verified cosine pairs ->
    connected components -> keep component min + every unpaired vector.
    The semantic complement of c_curation's lexical dedup."""
    from .curation import embed_dedup_keep_list

    return embed_dedup_keep_list(_emb(sf_dir), threshold=COSINE_PAIR_THRESHOLD)


TOP_WORDS_K = 20
DECON_MIN_OVERLAP = 2


def q_top_words(sf_dir: str):
    from ..stages.textops import top_words

    return top_words(_docs(sf_dir), k=TOP_WORDS_K)


def q_bpe_merges(sf_dir: str):
    """BPE vocabulary induction over the corpus (rows-only: iterative
    argmax merges have no SQL analogue; the merge loop is pinned against
    the Sennrich running example in the suite)."""
    from ..stages.textops import bpe_merges

    return bpe_merges(_docs(sf_dir), n_merges=24)


def q_bpe_tokens(sf_dir: str):
    """Tokenizer inference: per-doc token counts under the corpus-trained
    BPE vocab (rows-only, like the training half)."""
    from ..stages.textops import bpe_encode, bpe_merges

    merges = bpe_merges(_docs(sf_dir), n_merges=24)
    return bpe_encode(_docs(sf_dir), merges)


def q_top_words_sketch(sf_dir: str):
    """Count-Min heavy hitters (rows-only: approximate by design; the exact
    lane t_top_words carries the SQL oracle, and the sketch's one-sided
    bound is property-tested against it)."""
    from ..stages.textops import top_words_sketch

    return top_words_sketch(_docs(sf_dir), k=TOP_WORDS_K)


def q_pii_redact(sf_dir: str):
    """PII scrub over the NRIC-bearing Patient spans of the interleaved
    fixture (count + redact, streaming Arrow regex kernels)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.textops import pii_redact
    from .validate import fixture_paths

    flat = fixture_paths(sf_dir)["flat"]
    ds = rd.read_parquet(flat, columns=["doc_id", "span_index", "kind", "text"])

    def pick(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["kind"], "Patient"), pc.is_valid(t["text"]))
        return t.filter(m.fill_null(False)).select(["doc_id", "span_index", "text"])

    return pii_redact(ds.map_batches(pick, batch_format="pyarrow"))


def q_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (duplicate-word / duplicate-
    bigram fractions, most-common-word share) per document."""
    from ..stages.textops import repetition_stats

    return repetition_stats(_docs(sf_dir))


def q_pack_sequences(sf_dir: str):
    """Concat-and-chunk sequence packing: per-shard deterministic token
    offsets + training-sequence assignment (window-cumsum oracle)."""
    from ..stages.packing import pack_sequences

    return pack_sequences(_docs(sf_dir))


def q_mixture(sf_dir: str):
    """Domain-mixture token budgeting: per-(source, lang) doc/token counts +
    largest-remainder proportional quota (window-SQL oracle)."""
    import ray.data as rd

    from ..stages.textops import mixture_quota

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source", "lang"])
    return mixture_quota(docs)


def q_tfidf(sf_dir: str):
    """Per-document most-salient term by exact integer TF-IDF score
    (tf * SCALE // df; ties term-ASC)."""
    from ..stages.textops import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir))


def q_shuffle(sf_dir: str):
    """Deterministic global-shuffle layout: (shard, in-shard position) per
    doc from the FNV hash — reproducible pseudorandom order, no all-to-all
    random_shuffle."""
    import ray.data as rd

    from ..stages.packing import shuffle_assign

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return shuffle_assign(docs)


def q_oov(sf_dir: str):
    """Per-doc out-of-vocabulary token mass (global df < min_df) + quality
    gate (OOV share <= 20%, integer form)."""
    from ..stages.textops import oov_rate

    return oov_rate(_docs(sf_dir))


def q_outliers_mad(sf_dir: str):
    """Robust MAD-band outliers on n_chars: |x - median| > 2 * MAD — the
    heavy-tail-safe pathological-document gate (one value-count fold
    derives BOTH median and MAD; stateless streaming probe)."""
    import ray.data as rd

    from ..stages.stats import mad_outliers

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    return mad_outliers(docs, "n_chars")


def q_quantiles_nchars(sf_dir: str):
    """Exact p25/p50/p75/p95 of n_chars (value-count exchange bounded by
    distinct-value cardinality) — the precise lane next to the TDigest."""
    import ray.data as rd

    from ..stages.stats import exact_int_quantiles

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return exact_int_quantiles(docs, "n_chars")


def q_quantile_bands(sf_dir: str):
    """Exact quantile-band tag per doc (curriculum / stratified-mix key):
    band = #{p25,p50,p75 boundaries} strictly below n_chars. One value-count
    fold for the boundaries, one stateless tagging map."""
    import ray.data as rd

    from ..stages.stats import quantile_band_assign

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    return quantile_band_assign(docs, col="n_chars")


def q_user_gini(sf_dir: str):
    """Exact Gini concentration of events per user
    (``stats.exact_gini``) — the activity-skew dial."""
    import ray.data as rd

    from ..stages.stats import exact_gini

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id"])
    return exact_gini(events, key="user_id")


USER_GINI_SQL = """
WITH c AS (SELECT user_id, count(*)::BIGINT AS c FROM events GROUP BY 1),
r AS (SELECT c, row_number() OVER (ORDER BY c) AS i FROM c)
SELECT count(*)::BIGINT AS n_keys, sum(c)::BIGINT AS total,
  (2 * sum(i * c) - (count(*) + 1) * sum(c))::BIGINT AS gini_num,
  (count(*) * sum(c))::BIGINT AS gini_den
FROM r
"""


def q_transitions(sf_dir: str):
    """Per-user event-type transition matrix (Markov counts; order ties
    broken by (ts, event_id) — ``windows.transition_counts``)."""
    import ray.data as rd

    from ..stages.windows import transition_counts

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"])
    return transition_counts(events)


TRANSITIONS_SQL = """
WITH o AS (SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts), event_id)
                  AS prev_type
           FROM events)
SELECT prev_type AS type_from, event_type AS type_to, count(*)::BIGINT AS n
FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2
"""


IA_BUCKET_US, IA_MAX_BUCKET = 60_000_000, 128


def q_interarrival(sf_dir: str):
    """Per-user inter-arrival-time histogram (1-minute buckets, capped) —
    the distribution the sessionize gap is read off
    (``windows.interarrival_histogram``)."""
    import ray.data as rd

    from ..stages.windows import interarrival_histogram

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts"])
    return interarrival_histogram(events, bucket_us=IA_BUCKET_US,
                                  max_bucket=IA_MAX_BUCKET)


INTERARRIVAL_SQL = f"""
WITH o AS (SELECT user_id, epoch_us(ts) AS t,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY epoch_us(ts), event_id)
                  AS pt
           FROM events),
d AS (SELECT least((t - pt) // {IA_BUCKET_US}, {IA_MAX_BUCKET})::BIGINT
             AS bucket FROM o WHERE pt IS NOT NULL)
SELECT bucket, count(*)::BIGINT AS n FROM d GROUP BY 1
"""


COOC_K, COOC_WINDOW = 10, 2


def q_cooccurrence(sf_dir: str):
    """Top-k-anchored co-occurrence counts (PMI building block,
    ``textops.cooccurrence``): symmetric ±2-window pairs whose context side
    is one of the exact global top-10 words."""
    from ..stages.textops import cooccurrence

    return cooccurrence(_docs(sf_dir), k=COOC_K, window=COOC_WINDOW)


COOCCURRENCE_SQL = f"""
WITH ww AS (SELECT doc_id, ws[i] AS word, i
            FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i
                  FROM (SELECT doc_id,
                               list_filter(string_split(text, ' '),
                                           x -> x <> '') AS ws
                        FROM documents))),
top AS (SELECT word FROM (SELECT word, count(*) AS n FROM ww GROUP BY 1
                          ORDER BY n DESC, word LIMIT {COOC_K}))
SELECT a.word AS context, b.word AS word, count(*)::BIGINT AS n
FROM ww a
JOIN ww b ON a.doc_id = b.doc_id AND a.i <> b.i
         AND abs(a.i - b.i) <= {COOC_WINDOW}
JOIN top ON a.word = top.word
GROUP BY 1, 2
"""


VOCAB_CUTS = (100, 200, 300, 400, 500)


# Quality-filter cascade spec shared by the Ray funnel and its SQL oracle:
# integer-exact conditions only (the word-shape band cross-multiplies the
# mean-word-length bounds 4.3..4.7 as 43*w <= 10*l <= 47*w).
FUNNEL_MIN_CHARS = 100
FUNNEL_MAX_CHARS = 500
FUNNEL_LANGS = ("en", "fr", "es", "de")
FUNNEL_MIN_WORDS = 25
FUNNEL_WLEN_LO = 43
FUNNEL_WLEN_HI = 47


def _funnel_stages():
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.textops import _word_lists

    def _col(t, name):
        c = t[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    # one-slot per-batch memo: min_words and word_shape both need (w, l),
    # and the cascade evaluates every stage on the SAME batch object —
    # without it the split/flatten tokenization (the funnel's dominant
    # cost) runs twice per batch
    _wl_cache: dict = {}

    def _wl(t):
        """(kept-word count, char count sans spaces) per doc — the two
        integers the min_words and word_shape stages compare."""
        if _wl_cache.get("key") is t:
            return _wl_cache["val"]
        texts = _col(t, "text")
        _, w, _ = _word_lists(texts)
        l = pc.utf8_length(pc.replace_substring(texts, " ", ""))
        val = (w, np.asarray(l, dtype=np.int64))
        _wl_cache["key"], _wl_cache["val"] = t, val
        return val

    return [
        ("min_chars", lambda t: np.asarray(
            pc.greater_equal(_col(t, "n_chars"), FUNNEL_MIN_CHARS))),
        ("max_chars", lambda t: np.asarray(
            pc.less_equal(_col(t, "n_chars"), FUNNEL_MAX_CHARS))),
        ("lang_allowed", lambda t: np.asarray(
            pc.is_in(_col(t, "lang"), value_set=pa.array(FUNNEL_LANGS)))),
        ("min_words", lambda t: _wl(t)[0] >= FUNNEL_MIN_WORDS),
        ("word_shape", lambda t: (lambda w, l:
            (FUNNEL_WLEN_LO * w <= 10 * l) & (10 * l <= FUNNEL_WLEN_HI * w)
         )(*_wl(t))),
    ]


def q_filter_funnel(sf_dir: str):
    """Per-stage attrition of the default 5-filter quality cascade
    (``pipelines/curation.py:filter_funnel``)."""
    import ray.data as rd

    from .curation import filter_funnel

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["n_chars", "lang", "text"])
    return filter_funnel(docs, _funnel_stages())


FILTER_FUNNEL_SQL = f"""
WITH d AS (SELECT n_chars, lang,
    len(list_filter(string_split(text,' '), x -> x <> '')) AS w,
    length(replace(text, ' ', '')) AS l
  FROM documents),
f AS (SELECT CASE
    WHEN NOT (n_chars >= {FUNNEL_MIN_CHARS}) THEN 0
    WHEN NOT (n_chars <= {FUNNEL_MAX_CHARS}) THEN 1
    WHEN coalesce(lang NOT IN {FUNNEL_LANGS!r}, TRUE) THEN 2
    WHEN NOT (w >= {FUNNEL_MIN_WORDS}) THEN 3
    WHEN NOT ({FUNNEL_WLEN_LO}*w <= 10*l AND 10*l <= {FUNNEL_WLEN_HI}*w) THEN 4
    ELSE 5 END AS ff FROM d),
s(stage_idx, stage) AS (VALUES (0,'min_chars'),(1,'max_chars'),
  (2,'lang_allowed'),(3,'min_words'),(4,'word_shape'))
SELECT s.stage_idx::BIGINT AS stage_idx, s.stage,
  (SELECT count(*) FROM f WHERE ff >= s.stage_idx)::BIGINT AS n_in,
  (SELECT count(*) FROM f WHERE ff = s.stage_idx)::BIGINT AS n_removed,
  (SELECT count(*) FROM f WHERE ff > s.stage_idx)::BIGINT AS n_out
FROM s
"""

# Gopher quality-rule bundle (Rae et al. 2021 §A1.1, public) scaled to the
# fixture corpus: word-count bounds, mean-word-length band, symbol-to-word
# ratio (# + '...'), alphabetic-word fraction, >= 2 distinct required
# stopwords. Integer-exact via cross-multiplication throughout.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 90
GOPHER_MWL_LO = 30     # 10x mean word length lower bound (3.0)
GOPHER_MWL_HI = 80     # 10x upper bound (8.0)
GOPHER_SYM_DEN = 10    # symbols/words <= 1/10
GOPHER_ALPHA_NUM = 8   # alpha words / words >= 8/10
GOPHER_STOPWORDS = ["the", "a", "of", "to", "and", "is", "in"]
GOPHER_MIN_STOPWORDS = 2  # distinct


def _gopher_stages():
    """(name, mask_fn) list for the Gopher bundle over ``documents`` rows.
    All word-derived quantities come from ONE tokenization per batch (the
    ``_funnel_stages`` memo pattern — the split dominates funnel cost)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.textops import _word_lists

    def _col(t, name):
        c = t[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    _cache: dict = {}

    def _feats(t):
        if _cache.get("key") is t:
            return _cache["val"]
        texts = _col(t, "text")
        words, w, _ = _word_lists(texts)
        parent = np.repeat(np.arange(len(w)), w)
        l = np.asarray(pc.utf8_length(
            pc.replace_substring(texts, " ", "")), dtype=np.int64)
        # symbols: '#' chars + '...' occurrences
        n_sym = (np.asarray(pc.count_substring(texts, "#"),
                            dtype=np.int64)
                 + np.asarray(pc.count_substring(texts, "..."),
                              dtype=np.int64))
        alpha = pc.match_substring_regex(words, "[A-Za-z]").to_numpy(
            zero_copy_only=False)
        n_alpha = np.bincount(parent[alpha],
                              minlength=len(w)).astype(np.int64)
        codes = pc.index_in(words, value_set=pa.array(
            GOPHER_STOPWORDS, pa.string()))
        cnp = codes.to_numpy(zero_copy_only=False)
        hit = cnp == cnp  # non-null mask (NaN != NaN)
        k = len(GOPHER_STOPWORDS)
        pair = np.unique(parent[hit] * k + cnp[hit].astype(np.int64))
        n_stop = np.bincount((pair // k).astype(np.int64),
                             minlength=len(w)).astype(np.int64)
        val = (w, l, n_sym, n_alpha, n_stop)
        _cache["key"], _cache["val"] = t, val
        return val

    return [
        ("word_count_min", lambda t: _feats(t)[0] >= GOPHER_MIN_WORDS),
        ("word_count_max", lambda t: _feats(t)[0] <= GOPHER_MAX_WORDS),
        ("mean_word_len", lambda t: (lambda w, l:
            (GOPHER_MWL_LO * w <= 10 * l) & (10 * l <= GOPHER_MWL_HI * w)
         )(_feats(t)[0], _feats(t)[1])),
        ("symbol_ratio", lambda t: (lambda w, s:
            GOPHER_SYM_DEN * s <= w)(_feats(t)[0], _feats(t)[2])),
        ("alpha_words", lambda t: (lambda w, a:
            10 * a >= GOPHER_ALPHA_NUM * w)(_feats(t)[0], _feats(t)[3])),
        ("stopwords", lambda t: _feats(t)[4] >= GOPHER_MIN_STOPWORDS),
    ]


def q_gopher_funnel(sf_dir: str):
    """Per-stage attrition of the Gopher quality-rule bundle."""
    import ray.data as rd

    from .curation import filter_funnel

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    return filter_funnel(docs, _gopher_stages())


_GOPHER_STOP_SQL = "(" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + ")"

GOPHER_FUNNEL_SQL = f"""
WITH d AS (SELECT
    len(list_filter(string_split(text,' '), x -> x <> '')) AS w,
    length(replace(text, ' ', '')) AS l,
    len(regexp_extract_all(text, '#'))
      + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym,
    len(list_filter(string_split(text,' '),
                    x -> x <> '' AND regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
    len(list_distinct(list_filter(string_split(text,' '),
                                  x -> x IN {_GOPHER_STOP_SQL}))) AS n_stop
  FROM documents),
f AS (SELECT CASE
    WHEN NOT (w >= {GOPHER_MIN_WORDS}) THEN 0
    WHEN NOT (w <= {GOPHER_MAX_WORDS}) THEN 1
    WHEN NOT ({GOPHER_MWL_LO}*w <= 10*l AND 10*l <= {GOPHER_MWL_HI}*w) THEN 2
    WHEN NOT ({GOPHER_SYM_DEN}*n_sym <= w) THEN 3
    WHEN NOT (10*n_alpha >= {GOPHER_ALPHA_NUM}*w) THEN 4
    WHEN NOT (n_stop >= {GOPHER_MIN_STOPWORDS}) THEN 5
    ELSE 6 END AS ff FROM d),
s(stage_idx, stage) AS (VALUES (0,'word_count_min'),(1,'word_count_max'),
  (2,'mean_word_len'),(3,'symbol_ratio'),(4,'alpha_words'),(5,'stopwords'))
SELECT s.stage_idx::BIGINT AS stage_idx, s.stage,
  (SELECT count(*) FROM f WHERE ff >= s.stage_idx)::BIGINT AS n_in,
  (SELECT count(*) FROM f WHERE ff = s.stage_idx)::BIGINT AS n_removed,
  (SELECT count(*) FROM f WHERE ff > s.stage_idx)::BIGINT AS n_out
FROM s
"""


DISTINCT_NGRAM_NS = (1, 2, 3)


def q_distinct_ngrams(sf_dir: str):
    """Per-source n-gram diversity (distinct vs total n-grams, n=1..3 —
    ``stages/textops.py:distinct_ngrams``)."""
    import ray.data as rd

    from ..stages.textops import distinct_ngrams

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
    return distinct_ngrams(docs, DISTINCT_NGRAM_NS)


DISTINCT_NGRAMS_SQL = """
WITH w AS (SELECT source,
    list_filter(string_split(text,' '), x -> x <> '') AS ws FROM documents),
g AS (
  SELECT source, 1 AS n, unnest(ws) AS gram FROM w
  UNION ALL
  SELECT source, 2 AS n,
    unnest(list_transform(range(1, len(ws)),
                          i -> ws[i] || ' ' || ws[i+1])) AS gram FROM w
  UNION ALL
  SELECT source, 3 AS n,
    unnest(list_transform(range(1, len(ws)-1),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram FROM w
)
SELECT source, n::BIGINT AS n, count(DISTINCT gram)::BIGINT AS distinct_grams,
       count(*)::BIGINT AS total_grams
FROM g GROUP BY source, n
"""


NEG_K = 4

PQ_DIM = 64
PQ_M = 4
PQ_K = 8
PQ_ITERS = 2


def q_pq_codes(sf_dir: str):
    """Product-quantization codebook training (per-subspace integer Lloyd
    over the power-of-two-scaled grid) + full-corpus encoding
    (``similarity.pq_train_encode``)."""
    codes, _ = _pq(sf_dir)
    return codes


def _pq(sf_dir: str):
    from ..stages.similarity import pq_train_encode

    return pq_train_encode(_emb(sf_dir), dim=PQ_DIM, m=PQ_M, k=PQ_K,
                           iters=PQ_ITERS)


def _pq_chain() -> tuple[list, list, list]:
    """pq_train_encode mirror: the _kmeans_chain Lloyd CTE pattern run
    independently per subspace over the floor(x * 2^16) integer grid
    (power-of-two scale => the float64 product is exact on both sides).
    Returns (ctes, per-subspace final-codebook CTE names, per-subspace
    assignment CTE names fa{s}(vec_id, code{s}))."""
    from ..stages.similarity import PQ_SCALE

    D, M, K, iters = PQ_DIM, PQ_M, PQ_K, PQ_ITERS
    ds = D // M
    qcols = ", ".join(
        f"CAST(floor(CAST(embedding[{j + 1}] AS DOUBLE) * {PQ_SCALE}) "
        f"AS BIGINT) AS q{j}" for j in range(D))
    ctes = [f"v AS (SELECT vec_id, {qcols} FROM embeddings)"]
    finals = []
    for s in range(M):
        qs = [f"q{s * ds + d}" for d in range(ds)]
        init = ", ".join(f"{q} AS c{d}" for d, q in enumerate(qs))
        ctes.append(f"cs{s}_0 AS (SELECT vec_id AS kk, {init} "
                    f"FROM v WHERE vec_id < {K})")
        for i in range(1, iters + 1):
            prev = f"cs{s}_{i - 1}"
            cn = " + ".join(f"c.c{d} * c.c{d}" for d in range(ds))
            dot = " + ".join(f"e.{q} * c.c{d}" for d, q in enumerate(qs))
            ecols = ", ".join(f"e.{q}" for q in qs)
            ctes.append(
                f"sc{s}_{i} AS (SELECT e.vec_id, c.kk, "
                f"({cn}) - 2 * ({dot}) AS dist, {ecols} "
                f"FROM v e CROSS JOIN {prev} c)")
            ctes.append(
                f"a{s}_{i} AS (SELECT * FROM (SELECT sc{s}_{i}.*, "
                f"row_number() OVER (PARTITION BY vec_id "
                f"ORDER BY dist ASC, kk ASC) AS rn FROM sc{s}_{i}) "
                f"WHERE rn = 1)")
            upd = ", ".join(
                f"CAST(floor(sum({q})::DOUBLE / count(*)) AS BIGINT) AS f{d}"
                for d, q in enumerate(qs))
            ctes.append(f"u{s}_{i} AS (SELECT kk, {upd} "
                        f"FROM a{s}_{i} GROUP BY kk)")
            newc = ", ".join(f"coalesce(u.f{d}, p.c{d}) AS c{d}"
                             for d in range(ds))
            ctes.append(f"cs{s}_{i} AS (SELECT p.kk, {newc} "
                        f"FROM {prev} p LEFT JOIN u{s}_{i} u USING (kk))")
        cn = " + ".join(f"c.c{d} * c.c{d}" for d in range(ds))
        dot = " + ".join(f"e.{q} * c.c{d}" for d, q in enumerate(qs))
        ctes.append(
            f"fa{s} AS (SELECT vec_id, kk::BIGINT AS code{s} FROM ("
            f"SELECT e.vec_id, c.kk, ({cn}) - 2 * ({dot}) AS dist, "
            f"row_number() OVER (PARTITION BY e.vec_id "
            f"ORDER BY ({cn}) - 2 * ({dot}) ASC, c.kk ASC) AS rn "
            f"FROM v e CROSS JOIN cs{s}_{iters} c) WHERE rn = 1)")
        finals.append(f"fa{s}")
    cents = [f"cs{s}_{iters}" for s in range(M)]
    return ctes, cents, finals


def _pq_sql() -> str:
    ctes, _, finals = _pq_chain()
    joins = finals[0] + "".join(f" JOIN {f} USING (vec_id)"
                                for f in finals[1:])
    codes = ", ".join(f"code{s}" for s in range(PQ_M))
    return "WITH " + ",\n".join(ctes) + f"\nSELECT vec_id, {codes} FROM {joins}"


def _pq_topk_sql() -> str:
    """pq_adc_topk mirror: asymmetric PQ distance = per-subspace
    ||q_sub - centroid(code)||^2 summed — integer-exact, so the
    approximate-NN RANKING itself is oracle-checked (rank ties dist ASC
    then vec_id ASC, exactly the engine's -dist sim fold)."""
    ctes, cents, finals = _pq_chain()
    M, ds = PQ_M, PQ_DIM // PQ_M
    qv = ", ".join(f"q{j}" for j in range(PQ_DIM))
    ctes.append(
        f"qv AS (SELECT vec_id AS qid, {qv} FROM v "
        f"WHERE vec_id IN ({', '.join(map(str, ANN_QUERY_IDS))}))")
    joins = finals[0] + "".join(f" JOIN {f} USING (vec_id)"
                                for f in finals[1:])
    codes = ", ".join(f"code{s}" for s in range(M))
    ctes.append(f"cx AS (SELECT vec_id, {codes} FROM {joins})")
    bjoin = "".join(f" JOIN {cents[s]} b{s} ON b{s}.kk = x.code{s}"
                    for s in range(M))
    terms = " + ".join(
        f"(q.q{s * ds + d} - b{s}.c{d}) * (q.q{s * ds + d} - b{s}.c{d})"
        for s in range(M) for d in range(ds))
    ctes.append(
        f"adc AS (SELECT q.qid, x.vec_id, ({terms}) AS dist "
        f"FROM cx x{bjoin} CROSS JOIN qv q)")
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT qid, vec_id, row_number() OVER (PARTITION BY qid "
        "ORDER BY dist ASC, vec_id ASC)::BIGINT AS rank FROM adc "
        f"QUALIFY rank <= {ANN_K}"
    )


def q_pq_topk(sf_dir: str):
    """Asymmetric-distance top-k over the trained PQ codes — integer-exact
    ADC ranking, oracle-checked bit-for-bit
    (``similarity.pq_adc_topk``)."""
    from ..stages.similarity import load_quantized_queries, pq_adc_topk

    codes, books = _pq(sf_dir)
    qq = load_quantized_queries(f"{sf_dir}/embeddings.parquet",
                                ANN_QUERY_IDS)
    import numpy as np

    return pq_adc_topk(codes, books,
                       np.asarray(ANN_QUERY_IDS, dtype=np.int64),
                       qq, k=ANN_K)


def q_neg_samples(sf_dir: str):
    """Deterministic contrastive negative sampling: FNV("{doc}:{slot}") %
    n_total candidates, resolved against the corpus directory in one
    bucketed exchange, same-source / self candidates dropped
    (``sampling.negative_samples``)."""
    import ray.data as rd

    from ..stages.sampling import negative_samples

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    return negative_samples(docs, n_total=docs.count(), k=NEG_K)


def _neg_samples_sql() -> str:
    h = _fnv_sql("CAST(d.doc_id AS VARCHAR) || ':' || CAST(s.slot AS VARCHAR)")
    return f"""
WITH n AS (SELECT count(*)::BIGINT AS nn FROM documents),
s AS (SELECT unnest(generate_series(0, {NEG_K - 1})) AS slot),
cand AS (
  SELECT d.doc_id, d.source, s.slot,
         CAST({h} % (SELECT nn FROM n) AS BIGINT) AS neg_id
  FROM documents d, s WHERE d.source IS NOT NULL)
SELECT c.doc_id, c.slot, c.neg_id, t.source AS neg_source
FROM cand c JOIN documents t ON t.doc_id = c.neg_id
WHERE c.neg_id <> c.doc_id AND t.source <> c.source
"""


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining: per query vector, exact cosine top-k among
    vectors with a DIFFERENT class label
    (``similarity.hard_negative_topk``)."""
    from ..stages.similarity import hard_negative_topk, load_queries_with_labels

    qids, qm, ql = load_queries_with_labels(
        f"{sf_dir}/embeddings.parquet", ANN_QUERY_IDS)
    return hard_negative_topk(_emb(sf_dir), qids, qm, ql, k=ANN_K)


HARD_NEGATIVES_SQL = f"""
WITH q AS (
  SELECT vec_id qid, label qlabel,
         list_transform(embedding, x -> x::DOUBLE) qe FROM embeddings
  WHERE vec_id IN ({", ".join(map(str, ANN_QUERY_IDS))})),
v AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) e
      FROM embeddings),
s AS (SELECT qid, vec_id,
        list_dot_product(qe, e)
        / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))) sim
      FROM q, v WHERE v.label <> q.qlabel)
SELECT qid, vec_id,
       ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)::BIGINT
         AS rank
FROM s QUALIFY rank <= {ANN_K}
"""


def q_dup_rate(sf_dir: str):
    """Per-source duplication-rate audit: doc count vs FNV-distinct text
    count per source (``dedup.dup_rate_by_source``)."""
    import ray.data as rd

    from ..stages.dedup import dup_rate_by_source

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
    return dup_rate_by_source(docs)


def _dup_rate_sql() -> str:
    return f"""
SELECT source, count(*)::BIGINT AS n_docs,
       count(DISTINCT {_fnv_sql('text')})::BIGINT AS n_distinct
FROM documents GROUP BY source
"""


def q_source_overlap(sf_dir: str):
    """Pairwise source vocabulary overlap — the lexical-contamination /
    domain-similarity matrix (``textops.source_vocab_overlap``)."""
    import ray.data as rd

    from ..stages.textops import source_vocab_overlap

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
    return source_vocab_overlap(docs)


SOURCE_OVERLAP_SQL = """
WITH sw AS (SELECT DISTINCT source, word FROM (
  SELECT source, unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS word
  FROM documents WHERE source IS NOT NULL))
SELECT a.source AS source_a, b.source AS source_b,
       count(*)::BIGINT AS n_common
FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
GROUP BY 1, 2
"""


PROPS_KEY = "k"


def q_props_rollup(sf_dir: str):
    """Typed JSON property extraction over the events property bag +
    per-event-type rollup (``windows.props_rollup``)."""
    import ray.data as rd

    from ..stages.windows import props_rollup

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "props"])
    return props_rollup(events, key=PROPS_KEY)


PROPS_ROLLUP_SQL = f"""
WITH x AS (SELECT event_type,
    CAST(json_extract(props, '$.{PROPS_KEY}') AS BIGINT) AS v FROM events)
SELECT event_type, count(*)::BIGINT AS n_events,
       count(v)::BIGINT AS n_with_key,
       coalesce(sum(v), 0)::BIGINT AS sum_v,
       min(v)::BIGINT AS min_v, max(v)::BIGINT AS max_v
FROM x GROUP BY event_type
"""


def q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth: distinct words first appearing below
    each doc-id prefix cut (``textops.vocab_growth``)."""
    from ..stages.textops import vocab_growth

    return vocab_growth(_docs(sf_dir), VOCAB_CUTS)


VOCAB_GROWTH_SQL = f"""
WITH w AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                             x -> x <> '')) AS word
           FROM documents),
m AS (SELECT word, min(doc_id) AS md FROM w GROUP BY word),
cuts AS (SELECT unnest({list(VOCAB_CUTS)}) AS cut)
SELECT cut::BIGINT AS n_docs,
  (SELECT count(*) FROM m WHERE md < cut)::BIGINT AS vocab_size
FROM cuts
"""


def q_moments(sf_dir: str):
    """Exact joint second moments of (n_chars, n_words) — the integer
    covariance/correlation fold (``stats.exact_moments``); word count
    mirrors the standard ''-dropping split."""
    import pyarrow as pa
    import ray.data as rd

    from ..stages.stats import exact_moments
    from ..stages.textops import _word_lists

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text", "n_chars"])

    def add_words(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        _, counts, _ = _word_lists(texts)
        return pa.table({"n_chars": t["n_chars"],
                         "n_words": pa.array(counts.astype(np.int64))})

    return exact_moments(docs.map_batches(add_words, batch_format="pyarrow"),
                         "n_chars", "n_words")


MOMENTS_SQL = """
WITH v AS (SELECT n_chars::BIGINT AS x,
  coalesce(len(list_filter(string_split(text, ' '), w -> w <> '')), 0)::BIGINT
  AS y FROM documents)
SELECT count(*)::BIGINT AS n,
  coalesce(sum(x), 0)::BIGINT AS sum_x,
  coalesce(sum(y), 0)::BIGINT AS sum_y,
  coalesce(sum(x * x), 0)::BIGINT AS sum_xx,
  coalesce(sum(y * y), 0)::BIGINT AS sum_yy,
  coalesce(sum(x * y), 0)::BIGINT AS sum_xy
FROM v
"""


def q_rank_nchars(sf_dir: str):
    """Exact corpus-wide percentile rank of n_chars per document (the
    score-normalization step of a keep-top-X% quality gate)."""
    import ray.data as rd

    from ..stages.stats import percentile_rank

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    return percentile_rank(docs, "n_chars")


def q_quality_score(sf_dir: str):
    """Hashed-linear quality-classifier inference (fasttext-style filter)
    with the deterministic arithmetic weight table — oracle recomputes the
    scores from the same FNV fold."""
    from ..stages.textops import quality_score

    return quality_score(_docs(sf_dir))


def q_split(sf_dir: str):
    """Deterministic 90/5/5 train/val/test split labels (leak-free FNV hash
    bands over str(doc_id))."""
    import ray.data as rd

    from ..stages.sampling import split_assign

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return split_assign(docs)


def q_norm_dedup(sf_dir: str):
    """Exact dedup on NORMALIZED text (case/control/whitespace-invariant):
    collapses the casing-variant twin rows (doc_id % 10 == 0 re-emitted
    uppercased at doc_id + 1e9) that verbatim exact_dedup keeps apart."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.dedup import exact_dedup
    from ..stages.textops import normalize_text

    def add_twins(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"]).astype(np.int64)
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        m = d % 10 == 0
        twins = pa.table({
            "doc_id": pa.array(d[m] + 1_000_000_000),
            "text": pc.utf8_upper(texts.filter(pa.array(m))),
        })
        return pa.concat_tables([t.select(["doc_id", "text"]), twins])

    dirty = _docs(sf_dir).map_batches(add_twins, batch_format="pyarrow")
    return exact_dedup(normalize_text(dirty), key="norm_text")


MIXTURE_APPLY_BUDGET = 10_000


def q_mixture_apply(sf_dir: str):
    """Domain-mixture application: per-(source,lang) largest-remainder
    token quotas turned into an actual keep-list (deterministic hash-order
    prefix per group, two-phase block refinement — no corpus sort)."""
    import ray.data as rd

    from ..stages.textops import mixture_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source", "lang"])
    return mixture_apply(docs, budget=MIXTURE_APPLY_BUDGET)


TOPN_PER_SOURCE = 3


def q_top_per_source(sf_dir: str):
    """Per-group top-N (partitioned rank/limit): the 3 longest docs per
    source, ties broken by ascending doc_id."""
    import ray.data as rd

    from ..stages.stats import group_topn

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])
    return group_topn(docs, key="source", value="n_chars", id_col="doc_id",
                      n=TOPN_PER_SOURCE)


def q_lm_coverage(sf_dir: str):
    """CCNet-style n-gram LM coverage: bigram count model from the
    deterministic 10% hash split, held-out docs scored by model coverage
    (integer-exact perplexity proxy)."""
    from ..stages.textops import lm_coverage

    return lm_coverage(_docs(sf_dir))


def q_nb_classifier(sf_dir: str):
    """Count-based classifier TRAINING (fasttext-quality-gate analogue):
    multinomial counts from the 50% hash-split train band labeled
    lang=='en', held-out docs scored by integer Laplace likelihood
    ratios."""
    import ray.data as rd

    from ..stages.textops import nb_classifier

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    return nb_classifier(docs)


# 8 words == SEG_WORDS, so the injected banner occupies exactly segment 0
SEG_BANNER = "subscribe to our newsletter terms of service apply"


def q_chunks(sf_dir: str):
    """Overlapping word-window chunk expansion (RAG / training-sequence
    chunking): 32-word chunks every 24 words, per-batch row expansion."""
    from ..stages.textops import chunk_documents

    return chunk_documents(_docs(sf_dir))


def q_normalize(sf_dir: str):
    """Text normalization over a deterministically-dirtied corpus: even
    doc_ids get a control char + uppercase + padding injected (mirrored in
    SQL), then lower/strip-ctrl/collapse/trim restores the original."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.textops import normalize_text

    def dirty(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        mod = pc.binary_join_element_wise(
            pa.scalar("\x01"), pc.utf8_upper(texts), pa.scalar(""), " ")
        m = pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)
        return pa.table({"doc_id": t["doc_id"],
                         "text": pc.if_else(m, mod, texts)})

    return normalize_text(_docs(sf_dir).map_batches(dirty, batch_format="pyarrow"))


def q_seg_dedup(sf_dir: str):
    """Boilerplate-segment removal (CCNet-style line dedup): a banner
    segment is injected into every doc_id % 3 == 0 document (mirrored in
    SQL); segments appearing in >= 2 distinct docs are scrubbed."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.dedup import segment_dedup

    def add_banner(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        m = pc.equal(pc.subtract(t["doc_id"],
                                 pc.multiply(pc.divide(t["doc_id"], 3), 3)), 0)
        mod = pc.binary_join_element_wise(pa.scalar(SEG_BANNER), texts, " ")
        return pa.table({"doc_id": t["doc_id"],
                         "text": pc.if_else(m, mod, texts)})

    return segment_dedup(_docs(sf_dir).map_batches(add_banner,
                                                   batch_format="pyarrow"),
                         seg_words=8, min_docs=2)


# dup-n-gram injection: a 9-word passage appended to every doc_id % 4 == 0
# document — its 5 interior 5-grams become corpus-frequent, the passage/text
# boundary grams stay unique per doc
NGRAM_SNIPPET = "copied boilerplate passage repeated across many crawled pages verbatim"


def q_dup_ngrams(sf_dir: str):
    """Duplicate-n-gram coverage (Lee et al. 2022 substring-dup signal): a
    fixed 9-word passage is appended to every doc_id % 4 == 0 document
    (mirrored in SQL); per document, count sliding 5-gram positions whose
    5-gram appears in >= 2 distinct documents corpus-wide."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.dedup import dup_ngram_coverage

    def add_passage(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        mod = pc.binary_join_element_wise(texts, pa.scalar(NGRAM_SNIPPET), " ")
        return pa.table({"doc_id": t["doc_id"],
                         "text": pc.if_else(pa.array(ids % 4 == 0), mod, texts)})

    return dup_ngram_coverage(
        _docs(sf_dir).map_batches(add_passage, batch_format="pyarrow"),
        n=5, min_docs=2)


def q_strip_dup_spans(sf_dir: str):
    """Duplicated-substring removal (ExactSubstr-lite transform): same
    passage-augmented corpus as q_dup_ngrams, but every word position
    covered by a corpus-duplicated 5-gram window is DELETED and the doc
    rebuilt (``dedup.strip_dup_spans``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.dedup import strip_dup_spans

    def add_passage(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        mod = pc.binary_join_element_wise(texts, pa.scalar(NGRAM_SNIPPET), " ")
        return pa.table({"doc_id": t["doc_id"],
                         "text": pc.if_else(pa.array(ids % 4 == 0), mod, texts)})

    return strip_dup_spans(
        _docs(sf_dir).map_batches(add_passage, batch_format="pyarrow"),
        n=5, min_docs=2)


# corpus_diff mutation recipe: drop %11, mutate %13, add %17 under +20M ids
DIFF_ADD_OFFSET = 20_000_000


def q_corpus_diff(sf_dir: str):
    """Snapshot diff old-vs-new: new = old minus doc_id % 11 == 0, with
    ' mutated' appended for doc_id % 13 == 0 survivors, plus copies of
    doc_id % 17 == 0 under +20M ids (all mirrored in SQL). Output = churn
    rows only (added / removed / changed)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.joins import corpus_diff

    def mutate(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        mut = pc.binary_join_element_wise(texts, "mutated", " ")
        newtext = pc.if_else(pa.array(ids % 13 == 0), mut, texts)
        keep = pa.array(ids % 11 != 0)
        base = pa.table({"doc_id": t["doc_id"], "text": newtext}).filter(keep)
        addm = ids % 17 == 0
        extra = pa.table({
            "doc_id": pa.array(ids[addm] + DIFF_ADD_OFFSET),
            "text": texts.filter(pa.array(addm)),
        })
        return pa.concat_tables([base, extra])

    new = _docs(sf_dir).map_batches(mutate, batch_format="pyarrow")
    return corpus_diff(_docs(sf_dir), new)


# truncated-copy injection for d_prefix_dups: doc_id offset + prefix length
PREFIX_TRUNC_OFFSET = 10_000_000
PREFIX_TRUNC_WORDS = 12


def q_prefix_dups(sf_dir: str):
    """Truncation-duplicate detection: every doc_id % 7 == 0 document (with
    > 12 words) gets a truncated copy injected (first 12 words, id +
    10_000_000, mirrored in SQL); prefix_containment then reports each doc
    that is a strict word-prefix of another."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.dedup import prefix_containment
    from ..stages.textops import _word_lists

    k = PREFIX_TRUNC_WORDS

    def augment(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words, counts, offs = _word_lists(texts)
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        idx = np.flatnonzero((ids % 7 == 0) & (counts > k))
        base = pa.table({"doc_id": t["doc_id"], "text": texts})
        if idx.size == 0:
            return base
        gidx = (np.arange(idx.size * k, dtype=np.int64) % k
                + np.repeat(offs[idx], k))
        bounds = np.arange(idx.size + 1, dtype=np.int64) * k
        la = pa.ListArray.from_arrays(pa.array(bounds, pa.int64()),
                                      words.take(pa.array(gidx)))
        extra = pa.table({
            "doc_id": pa.array(ids[idx] + PREFIX_TRUNC_OFFSET),
            "text": pc.binary_join(la, " "),
        })
        return pa.concat_tables([base, extra])

    return prefix_containment(_docs(sf_dir).map_batches(
        augment, batch_format="pyarrow"), prefix_words=8)


def q_decontaminate(sf_dir: str):
    """Benchmark n-gram decontamination: a deterministic quarter of the
    corpus (FNV(doc_id) % 4 == 0) plays the benchmark; training docs
    sharing >= DECON_MIN_OVERLAP distinct bigram shingles with it are
    flagged. Benchmark shingle set broadcast; training pass shuffle-free."""
    import pyarrow as pa

    from ..functions.hashing import hash_str
    from ..stages.dedup import decontaminate

    def half(is_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"]).astype(np.int64)
            m = hash_str(ids.astype("U")) % np.uint64(4) == 0
            return t.filter(pa.array(m if is_bench else ~m))

        return f

    bench = _docs(sf_dir).map_batches(half(True), batch_format="pyarrow")
    train = _docs(sf_dir).map_batches(half(False), batch_format="pyarrow")
    return decontaminate(train, bench, n=2, min_overlap=DECON_MIN_OVERLAP)


def q_simhash_pairs(sf_dir: str):
    from ..stages.dedup import simhash_pairs

    return simhash_pairs(_docs(sf_dir))


def q_edit_distance(sf_dir: str):
    """Exact fuzzy-dedup gate: simhash candidates (hamming <= 3) verified
    with character-level Levenshtein — the composition a production fuzzy
    dedup runs (cheap banded recall, exact edit-distance precision)."""
    from ..stages.dedup import edit_distance_pairs, simhash_pairs

    docs = _docs(sf_dir)
    return edit_distance_pairs(docs, simhash_pairs(docs))


def q_delta_dedup(sf_dir: str):
    """Incremental exact dedup: the even-FNV-quarter of documents plays the
    new ingest batch, the rest the standing corpus — admitted = corpus-fresh
    AND first-in-delta."""
    import pyarrow as pa

    from ..functions.hashing import hash_str
    from ..stages.dedup import delta_dedup

    def half(is_delta: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"]).astype(np.int64)
            m = hash_str(ids.astype("U")) % np.uint64(4) == 0
            return t.filter(pa.array(m if is_delta else ~m))

        return f

    corpus = _docs(sf_dir).map_batches(half(False), batch_format="pyarrow")
    delta = _docs(sf_dir).map_batches(half(True), batch_format="pyarrow")
    return delta_dedup(corpus, delta)


def q_upsert_latest(sf_dir: str):
    from ..stages.windows import upsert_latest

    return upsert_latest(_events(sf_dir))


def q_rank_fusion(sf_dir: str):
    """Borda fusion of three integer quality signals into one sort-free
    global ranking (competition-rank semantics, smaller fused = better)."""
    from .curation import rank_fusion

    return rank_fusion(_docs(sf_dir))


def q_pareto(sf_dir: str):
    """Distributed skyline over (word count, vocabulary diversity): every
    point not dominated on both axes, with multiplicity — threshold-free
    curation frontier (associative local-prune merge, no sort)."""
    from .curation import pareto_frontier

    return pareto_frontier(_docs(sf_dir))


PARETO_SQL = """
WITH f AS (SELECT len(list_filter(string_split(text, ' '),
                                  w -> w <> ''))::BIGINT AS nw,
                  len(list_distinct(list_filter(string_split(text, ' '),
                                                w -> w <> '')))::BIGINT AS nd
           FROM documents),
p AS (SELECT nw AS n_words, (1000 * nd) // nw AS diversity
      FROM f WHERE nw > 0),
d AS (SELECT n_words, diversity, count(*)::BIGINT AS n_docs
      FROM p GROUP BY 1, 2)
SELECT n_words, diversity, n_docs FROM d a
WHERE NOT EXISTS (
  SELECT 1 FROM d b
  WHERE b.n_words >= a.n_words AND b.diversity >= a.diversity
    AND (b.n_words > a.n_words OR b.diversity > a.diversity))
"""


# inclusion-dependency candidate columns: every integer key column of the
# TPC-H-ish star schema. The ORACLE is generated from this same list, so
# engine and SQL can never disagree on the candidate set.
IND_CANDIDATES = [
    ("region", "r_regionkey"), ("nation", "n_nationkey"),
    ("nation", "n_regionkey"), ("customer", "c_custkey"),
    ("customer", "c_nationkey"), ("supplier", "s_suppkey"),
    ("supplier", "s_nationkey"), ("part", "p_partkey"),
    ("orders", "o_orderkey"), ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
]


def q_ind_discovery(sf_dir: str):
    """Inclusion-dependency (FK-candidate) discovery across every integer
    key column of the star schema — one shared value-bucketed exchange,
    per-bucket Gram matrix, no per-pair passes."""
    import ray.data as rd

    from ..stages.stats import ind_discovery

    # size the 13 single-column reads explicitly: the default ~64 blocks
    # per table x 13 tables = 800+ tiny blocks whose scheduling overhead
    # dominates the whole plan (measured 64s -> 5.2s at sf0.1 with 4).
    # At real scale each table is many files and reads self-size.
    cols = [(f"{t}.{c}",
             rd.read_parquet(f"{sf_dir}/{t}.parquet", columns=[c],
                             override_num_blocks=4), c)
            for t, c in IND_CANDIDATES]
    return ind_discovery(cols)


def _ind_discovery_sql() -> str:
    ctes = ",\n".join(
        f"c{i} AS (SELECT DISTINCT {c}::BIGINT AS v FROM {t} "
        f"WHERE {c} IS NOT NULL)"
        for i, (t, c) in enumerate(IND_CANDIDATES))
    pairs = []
    for i, (ti, ci) in enumerate(IND_CANDIDATES):
        for j, (tj, cj) in enumerate(IND_CANDIDATES):
            if i == j or ti == tj:
                continue
            pairs.append(
                f"SELECT '{ti}.{ci}' AS lhs, '{tj}.{cj}' AS rhs,\n"
                f"  (SELECT count(*) FROM c{i})::BIGINT AS n_lhs,\n"
                f"  (SELECT count(*) FROM c{i} WHERE v IN "
                f"(SELECT v FROM c{j}))::BIGINT AS n_overlap")
    body = "\nUNION ALL\n".join(pairs)
    return (f"WITH {ctes},\np AS (\n{body}\n)\n"
            "SELECT lhs, rhs, n_lhs, n_overlap,\n"
            "  (CASE WHEN n_overlap = n_lhs THEN 1 ELSE 0 END)::BIGINT"
            " AS included\nFROM p")


def q_rollup(sf_dir: str):
    """Two-level ROLLUP over (source, lang): doc counts + char sums at the
    finest, per-source and grand levels from one finest-level fold."""
    import ray.data as rd

    from ..stages.stats import rollup_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang", "n_chars"])
    return rollup_counts(ds, "source", "lang", "n_chars")


ROLLUP_SQL = """
WITH d AS (SELECT coalesce(source, '*') AS s, coalesce(lang, '*') AS l,
                  coalesce(n_chars, 0) AS v FROM documents)
SELECT coalesce(s, '*') AS source, coalesce(l, '*') AS lang,
       (GROUPING(s) + GROUPING(l))::BIGINT AS lvl,
       count(*)::BIGINT AS n, coalesce(sum(v), 0)::BIGINT AS sum_val
FROM d GROUP BY ROLLUP(s, l)
"""


def q_k_anonymity(sf_dir: str):
    """k-anonymity audit over (event_type, hour-window) quasi-identifier
    combos: per threshold k, combos and rows below k occurrences."""
    from ..stages.windows import k_anonymity_audit

    return k_anonymity_audit(_events(sf_dir))


K_ANONYMITY_SQL = """
WITH g AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1, 2),
k AS (SELECT unnest([2, 5, 10])::BIGINT AS k)
SELECT k.k,
       coalesce(count(*) FILTER (WHERE g.n < k.k), 0)::BIGINT
         AS groups_below,
       coalesce(sum(g.n) FILTER (WHERE g.n < k.k), 0)::BIGINT
         AS rows_below
FROM k CROSS JOIN g GROUP BY k.k
"""


def q_kn_counts(sf_dir: str):
    """Kneser-Ney continuation counts for the top-30 words: total count +
    distinct left/right neighbors from one dual-keyed bigram exchange."""
    from ..stages.textops import kn_continuation_counts

    return kn_continuation_counts(_docs(sf_dir))


KN_COUNTS_SQL = """
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '),
                                      x -> x <> '') AS ws FROM documents),
u AS (SELECT unnest(ws) AS word FROM w),
cnt AS (SELECT word, count(*)::BIGINT AS n FROM u GROUP BY word),
b AS (SELECT ws[i] AS prev, ws[i + 1] AS word
      FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM w)),
lft AS (SELECT word, count(DISTINCT prev)::BIGINT AS n_left
        FROM b GROUP BY word),
rgt AS (SELECT prev AS word, count(DISTINCT word)::BIGINT AS n_right
        FROM b GROUP BY prev),
j AS (SELECT cnt.word, cnt.n,
             coalesce(lft.n_left, 0)::BIGINT AS n_left,
             coalesce(rgt.n_right, 0)::BIGINT AS n_right
      FROM cnt LEFT JOIN lft USING (word) LEFT JOIN rgt USING (word)),
r AS (SELECT *, row_number() OVER (ORDER BY n DESC, word ASC) AS rn FROM j)
SELECT word, n, n_left, n_right, rn::BIGINT AS rank FROM r WHERE rn <= 30
"""


def q_simpson(sf_dir: str):
    """Per-source Simpson lexical-concentration profile: total words,
    vocab size and the integer repeat-probability numerator Σ n(n−1)."""
    import ray.data as rd

    from ..stages.textops import simpson_diversity

    return simpson_diversity(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]))


SIMPSON_SQL = """
WITH u AS (SELECT coalesce(source, '*') AS source,
                  unnest(list_filter(string_split(text, ' '),
                                     x -> x <> '')) AS word
           FROM documents),
c AS (SELECT source, word, count(*)::BIGINT AS n FROM u GROUP BY 1, 2)
SELECT source, sum(n)::BIGINT AS n_words,
       count(*)::BIGINT AS distinct_words,
       sum(n * (n - 1))::BIGINT AS simpson_num
FROM c GROUP BY source
"""


def q_keyness(sf_dir: str):
    """Distinctive-vocabulary contrast between the two lexicographically
    smallest sources: cross-scaled rate-difference scores, top-10/side."""
    import ray.data as rd

    from ..stages.textops import keyness_terms

    return keyness_terms(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]))


KEYNESS_SQL = """
WITH u0 AS (SELECT coalesce(source, '*') AS source,
                   unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS word
            FROM documents),
-- the pair = two smallest sources WITH at least one word (u0 drops
-- wordless sources), matching the engine's totals-fold selection
s AS (SELECT DISTINCT source FROM u0 ORDER BY source LIMIT 2),
ab AS (SELECT min(source) AS a, max(source) AS b FROM s),
u AS (SELECT source, word FROM u0
      WHERE source IN (SELECT source FROM s)),
c AS (SELECT word,
             sum(CASE WHEN source = (SELECT a FROM ab)
                 THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN source = (SELECT b FROM ab)
                 THEN 1 ELSE 0 END)::BIGINT AS n_b
      FROM u GROUP BY word),
t AS (SELECT (SELECT sum(n_a) FROM c) AS na_tot,
             (SELECT sum(n_b) FROM c) AS nb_tot),
sc AS (SELECT word, n_a, n_b,
              (n_a * (SELECT nb_tot FROM t)
               - n_b * (SELECT na_tot FROM t))::BIGINT AS score FROM c),
ra AS (SELECT 'a' AS side, word, n_a, n_b, score,
              row_number() OVER (ORDER BY score DESC, word ASC) AS rn
       FROM sc),
rb AS (SELECT 'b' AS side, word, n_a, n_b, score,
              row_number() OVER (ORDER BY score ASC, word ASC) AS rn
       FROM sc)
SELECT side, word, n_a, n_b, score, rn::BIGINT AS rank
FROM ra WHERE rn <= 10 AND (SELECT count(*) FROM s) = 2
UNION ALL
SELECT side, word, n_a, n_b, score, rn::BIGINT AS rank
FROM rb WHERE rn <= 10 AND (SELECT count(*) FROM s) = 2
"""


def q_autocorr(sf_dir: str):
    """Integer lag-k autocovariance numerators of per-type hourly window
    counts (periodicity dial; division-free so the oracle is bitwise)."""
    from ..stages.windows import autocorr_windows

    return autocorr_windows(_events(sf_dir))


AUTOCORR_SQL = """
WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS w,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1, 2),
l AS (SELECT unnest([1, 2, 24])::BIGINT AS lag),
p AS (SELECT x.event_type, l.lag, x.n AS nx, y.n AS ny
      FROM l CROSS JOIN c x
      JOIN c y ON y.event_type = x.event_type AND y.w = x.w + l.lag),
t AS (SELECT DISTINCT event_type FROM c),
base AS (SELECT event_type, lag FROM t CROSS JOIN l),
agg AS (SELECT event_type, lag, count(*)::BIGINT AS n_pairs,
               (count(*) * sum(nx * ny)
                - sum(nx) * sum(ny))::BIGINT AS num
        FROM p GROUP BY 1, 2)
SELECT base.event_type, base.lag,
       coalesce(agg.n_pairs, 0)::BIGINT AS n_pairs,
       coalesce(agg.num, 0)::BIGINT AS num
FROM base LEFT JOIN agg USING (event_type, lag)
"""


def q_cube(sf_dir: str):
    """Full GROUP BY CUBE over (source, lang): all four grouping sets
    from the same finest-level fold as a_rollup."""
    import ray.data as rd

    from ..stages.stats import rollup_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang", "n_chars"])
    return rollup_counts(ds, "source", "lang", "n_chars", cube=True)


CUBE_SQL = """
WITH d AS (SELECT coalesce(source, '*') AS s, coalesce(lang, '*') AS l,
                  coalesce(n_chars, 0) AS v FROM documents)
SELECT coalesce(s, '*') AS source, coalesce(l, '*') AS lang,
       (GROUPING(s) * 2 + GROUPING(l))::BIGINT AS lvl,
       count(*)::BIGINT AS n, coalesce(sum(v), 0)::BIGINT AS sum_val
FROM d GROUP BY CUBE(s, l)
"""


def q_l_diversity(sf_dir: str):
    """l-diversity audit over (event_type, hour-window) combos: per
    threshold l, combos with fewer than l distinct users."""
    from ..stages.windows import l_diversity_audit

    return l_diversity_audit(_events(sf_dir))


L_DIVERSITY_SQL = """
WITH g AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                  count(DISTINCT user_id)::BIGINT AS n
           FROM events GROUP BY 1, 2),
l AS (SELECT unnest([2, 5, 10])::BIGINT AS l)
SELECT l.l,
       coalesce(count(*) FILTER (WHERE g.n < l.l), 0)::BIGINT
         AS combos_below
FROM l CROSS JOIN g GROUP BY l.l
"""


def q_cdc_chunks(sf_dir: str):
    """Content-defined chunking dedup audit: rolling-hash cut points make
    shared passages chunk identically after positional shifts."""
    from ..stages.dedup import cdc_chunk_dedup

    return cdc_chunk_dedup(_docs(sf_dir))


def q_triangles(sf_dir: str):
    """Per-node triangle counts over the near-dup pair graph (degree-ordered
    wedge checking — clique-vs-star cluster density)."""
    from ..stages.dedup import triangle_counts

    return triangle_counts(_docs(sf_dir), n=JACCARD_N,
                           threshold=JACCARD_THRESHOLD)


def q_fd_violations(sf_dir: str):
    """Does source -> lang hold? Every multilingual source is a violation
    row with its doc count and distinct-language count."""
    import ray.data as rd

    from ..stages.stats import fd_violations

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang"])
    return fd_violations(ds, "source", "lang")


def q_contingency(sf_dir: str):
    import ray.data as rd

    from ..stages.stats import contingency

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang"])
    return contingency(ds, "source", "lang")


def q_cosine_topk(sf_dir: str):
    from ..stages.similarity import cosine_topk, load_queries

    qids, qm = load_queries(f"{sf_dir}/embeddings.parquet", ANN_QUERY_IDS)
    return cosine_topk(_emb(sf_dir), qids, qm, k=ANN_K)


def q_cosine_pairs(sf_dir: str):
    """Scale lane: LSH-bucketed candidates + distributed exact-cosine verify
    (per-pair miss probability <= 1e-6 — checked against the brute-force
    DuckDB oracle). The broadcast lane stays available for small corpora."""
    from ..stages.similarity import cosine_pairs_lsh

    return cosine_pairs_lsh(_emb(sf_dir), threshold=COSINE_PAIR_THRESHOLD)


def q_embed_decon(sf_dir: str):
    """Semantic benchmark decontamination: the even-FNV-sixteenth of the
    embedding table plays the benchmark set; corpus vectors within cosine
    threshold of ANY benchmark vector are flagged with their match count."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import hash_str
    from ..stages.similarity import embed_decontaminate

    def _tagged(keep_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["vec_id"]).astype(np.int64)
            is_b = (hash_str(ids.astype("U")) % np.uint64(16)) == 0
            return t.filter(pa.array(is_b if keep_bench else ~is_b))

        return f

    bench = _emb(sf_dir).map_batches(_tagged(True), batch_format="pyarrow")
    corpus = _emb(sf_dir).map_batches(_tagged(False), batch_format="pyarrow")
    return embed_decontaminate(corpus, bench, threshold=EMBED_DECON_THRESHOLD)


def q_lsh_topk(sf_dir: str):
    from ..stages.similarity import load_queries, lsh_topk

    qids, qm = load_queries(f"{sf_dir}/embeddings.parquet", ANN_QUERY_IDS)
    return lsh_topk(_emb(sf_dir), qids, qm, k=ANN_K, num_planes=5)


def q_ivf_topk(sf_dir: str):
    from ..stages.similarity import ivf_topk, load_queries

    qids, qm = load_queries(f"{sf_dir}/embeddings.parquet", ANN_QUERY_IDS)
    return ivf_topk(_emb(sf_dir), qids, qm, k=ANN_K, n_clusters=16, nprobe=4)


HIST_LO, HIST_HI, HIST_BINS = 0, 600, 20


def q_stats_nchars(sf_dir: str):
    import ray.data as rd

    from ..stages.stats import numeric_stats_exact

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return numeric_stats_exact(ds, "n_chars")


def q_histogram_nchars(sf_dir: str):
    import ray.data as rd

    from ..stages.stats import histogram

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return histogram(ds, "n_chars", lo=HIST_LO, hi=HIST_HI, nbins=HIST_BINS)


def q_distinct_nchars(sf_dir: str):
    """Exact distinct count — the oracle-checked companion to the HLL
    estimate in a_column_profile."""
    import ray.data as rd

    from ..stages.stats import distinct_count_exact

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return distinct_count_exact(ds, "n_chars")


DISTINCT_NCHARS_SQL = """
SELECT 'n_chars' AS col, count(DISTINCT n_chars)::BIGINT AS n_distinct
FROM documents
"""


def q_column_profile(sf_dir: str):
    """t-digest quantiles + HLL distinct of n_chars — approximate sketches,
    rows-only check (floats)."""
    import pandas as pd
    import ray.data as rd

    from ..stages.stats import column_profile

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    prof = column_profile(ds, "n_chars")
    return pd.DataFrame(
        [
            {
                "col": prof["col"],
                "n": prof["n"],
                "p50": prof["quantiles"]["0.5"],
                "p95": prof["quantiles"]["0.95"],
                "p99": prof["quantiles"]["0.99"],
                "distinct_hll": prof["distinct_hll"],
            }
        ]
    )


def q_kll_quantiles(sf_dir: str):
    """KLL-sketch quantiles of n_chars — the bounded-space quantile lane
    next to the t-digest profile (rows-only check: approximate sketch)."""
    import pandas as pd
    import ray.data as rd

    from ..stages.stats import kll_column_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    prof = kll_column_quantiles(ds, "n_chars")
    return pd.DataFrame(
        [
            {
                "col": prof["col"],
                "n": prof["n"],
                "p50": prof["quantiles"]["0.5"],
                "p95": prof["quantiles"]["0.95"],
                "p99": prof["quantiles"]["0.99"],
            }
        ]
    )


def q_drift_by_source(sf_dir: str):
    """Per-source drift of n_chars vs the whole-corpus snapshot — the
    per-partition KS/PSI check of the north_star (rows-only: float scores).
    One streaming pass over the corpus per column, grouped partials."""
    import ray.data as rd

    from ..stages.drift import drift_by_group, take_snapshot

    full = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    # coarse bins + KS threshold sized for small per-source samples (the KS
    # critical value at n=25, alpha=0.05 is ~0.27)
    snap = take_snapshot(full, ["n_chars"], nbins=8)
    return drift_by_group(full, "source", snap, psi_threshold=0.25, ks_threshold=0.27)


def q_drift_psi(sf_dir: str):
    """Per-source n_chars drift vs the whole corpus as FIXED-POINT integers
    (psi_fp = sum of floored x1e6 per-bin contributions; ks_fp = exact
    integer ECDF gap) — the oracle-checkable companion to the float
    a_drift_by_source (VERDICT r4 #3)."""
    import ray.data as rd

    from ..stages.drift import drift_fp_by_group

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    return drift_fp_by_group(ds, "n_chars", "source",
                             lo=HIST_LO, hi=HIST_HI, nbins=HIST_BINS)


DRIFT_PSI_SQL = f"""
WITH vc AS (SELECT source, n_chars AS v, count(*)::BIGINT AS c
            FROM documents GROUP BY 1, 2),
ns AS (SELECT source, sum(c)::BIGINT AS n FROM vc GROUP BY 1),
ntot AS (SELECT sum(c)::BIGINT AS n FROM vc),
hb AS (SELECT source,
         least(greatest(floor((v - {HIST_LO}) / {(HIST_HI - HIST_LO) / HIST_BINS})::BIGINT, 0),
               {HIST_BINS - 1}) AS bin,
         sum(c)::BIGINT AS c
       FROM vc GROUP BY 1, 2),
gb AS (SELECT bin, sum(c)::BIGINT AS c FROM hb GROUP BY 1),
bins AS (SELECT unnest(range(0, {HIST_BINS})) AS bin),
pq AS (SELECT ns.source,
         (coalesce(hb.c, 0) + 1.0) / (ns.n + {HIST_BINS}.0) AS p,
         (coalesce(gb.c, 0) + 1.0) / ((SELECT n FROM ntot) + {HIST_BINS}.0) AS q
       FROM ns CROSS JOIN bins
       LEFT JOIN hb ON hb.source = ns.source AND hb.bin = bins.bin
       LEFT JOIN gb ON gb.bin = bins.bin),
psi AS (SELECT source,
          sum(floor(1000000 * (p - q) * ln(p / q)))::BIGINT AS psi_fp
        FROM pq GROUP BY 1),
gcum AS (SELECT v, sum(sum(c)) OVER (ORDER BY v) AS cg FROM vc GROUP BY v),
grid AS (SELECT s.source, u.v
         FROM (SELECT DISTINCT source FROM vc) s
         CROSS JOIN (SELECT DISTINCT v FROM vc) u),
cum AS (SELECT grid.source, grid.v,
          sum(coalesce(vc.c, 0))
            OVER (PARTITION BY grid.source ORDER BY grid.v) AS cs
        FROM grid LEFT JOIN vc ON vc.source = grid.source AND vc.v = grid.v),
ks AS (SELECT cum.source,
         max(abs(cum.cs::HUGEINT * (SELECT n FROM ntot)
                 - gcum.cg::HUGEINT * ns.n)) AS num
       FROM cum JOIN gcum ON gcum.v = cum.v
       JOIN ns ON ns.source = cum.source
       GROUP BY cum.source)
SELECT ns.source AS "group", ns.n AS n, psi.psi_fp,
       ((1000000::HUGEINT * ks.num)
        // (ns.n::HUGEINT * (SELECT n FROM ntot)))::BIGINT AS ks_fp
FROM ns JOIN psi USING (source) JOIN ks ON ks.source = ns.source
"""


def q_kind_psi(sf_dir: str):
    """Span-kind histogram drift vs the even-FNV-half snapshot as
    FIXED-POINT integers (per-kind counts + floored x1e6 contribution,
    '__total__' = integer sum) — the oracle-checkable companion to the
    float a_kind_drift. ONE corpus pass computes both histograms."""
    from ..sources.readers import read_documents
    from ..stages.drift import kind_drift_fp_from_hists, kind_histogram_with_half
    from .validate import fixture_paths

    paths = fixture_paths(sf_dir)
    cur, snap = kind_histogram_with_half(read_documents(paths["docs"]))
    return kind_drift_fp_from_hists(cur, snap)


def kind_psi_sql(paths: dict) -> str:
    fnv = _fnv_sql("doc_id")
    return f"""
WITH cur AS (SELECT kind, count(*)::BIGINT AS c
             FROM read_parquet('{paths["flat"]}') GROUP BY 1),
snap AS (SELECT kind, count(*)::BIGINT AS c
         FROM read_parquet('{paths["flat"]}')
         WHERE {fnv} % 2 = 0 GROUP BY 1),
keys AS (SELECT kind FROM cur UNION SELECT kind FROM snap),
tot AS (SELECT (SELECT sum(c) FROM cur) AS pn,
               (SELECT sum(c) FROM snap) AS qn,
               (SELECT count(*) FROM keys) AS nk),
rows_ AS (
  SELECT keys.kind,
         coalesce(cur.c, 0)::BIGINT AS cur_count,
         coalesce(snap.c, 0)::BIGINT AS snap_count,
         floor(1000000
               * ((coalesce(cur.c, 0) + 1.0) / (tot.pn + tot.nk)
                  - (coalesce(snap.c, 0) + 1.0) / (tot.qn + tot.nk))
               * ln(((coalesce(cur.c, 0) + 1.0) / (tot.pn + tot.nk))
                    / ((coalesce(snap.c, 0) + 1.0) / (tot.qn + tot.nk)))
               )::BIGINT AS contrib_fp
  FROM keys LEFT JOIN cur USING (kind) LEFT JOIN snap USING (kind)
  CROSS JOIN tot)
SELECT kind, cur_count, snap_count, contrib_fp FROM rows_
UNION ALL
SELECT '__total__', (SELECT sum(cur_count) FROM rows_)::BIGINT,
       (SELECT sum(snap_count) FROM rows_)::BIGINT,
       (SELECT sum(contrib_fp) FROM rows_)::BIGINT
"""


def q_char_entropy(sf_dir: str):
    """Per-doc fixed-point order-0 character entropy (the gibberish /
    boilerplate quality pre-filter) — floored per-symbol contributions,
    integer sum, bitwise oracle."""
    import ray.data as rd

    from ..stages.textops import char_entropy

    return char_entropy(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                        columns=["doc_id", "text"]))


def _char_entropy_sql() -> str:
    # scale constant generated from the SAME engine constant (the explain
    # template-interpolation convention) so a scale change cannot silently
    # desynchronize the oracle
    from ..stages.textops import CHAR_ENTROPY_SCALE

    return f"""
WITH ch AS (SELECT doc_id, unicode(substr(text, i, 1)) AS cp
            FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
            WHERE text IS NOT NULL AND length(text) > 0),
cc AS (SELECT doc_id, cp, count(*)::BIGINT AS c FROM ch GROUP BY 1, 2),
n AS (SELECT doc_id, sum(c)::BIGINT AS n FROM cc GROUP BY 1)
SELECT cc.doc_id, n.n AS n_chars_counted,
       sum(floor(-{CHAR_ENTROPY_SCALE} * (cc.c / n.n)
                 * log2(cc.c / n.n)))::BIGINT AS entropy_fp
FROM cc JOIN n USING (doc_id) GROUP BY cc.doc_id, n.n
"""


def q_profile_quantiles(sf_dir: str):
    """EXACT p50/p95/p99 of n_chars (value-count fold) — the integer
    companion to the t-digest a_column_profile."""
    import ray.data as rd

    from ..stages.stats import exact_int_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return exact_int_quantiles(ds, "n_chars", qs=(0.5, 0.95, 0.99))


PROFILE_QUANTILES_SQL = """
WITH vc AS (SELECT n_chars AS v, count(*)::BIGINT AS c
            FROM documents GROUP BY 1),
cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cs FROM vc),
n AS (SELECT sum(c)::BIGINT AS n FROM vc)
SELECT 'n_chars' AS col, n.n AS n,
  (SELECT min(v) FROM cum WHERE cs >= ceil(0.5 * n.n))::BIGINT AS p50,
  (SELECT min(v) FROM cum WHERE cs >= ceil(0.95 * n.n))::BIGINT AS p95,
  (SELECT min(v) FROM cum WHERE cs >= ceil(0.99 * n.n))::BIGINT AS p99
FROM n
"""


def q_image_meta(sf_dir: str):
    from ..stages.multimodal import ImageMetaStage, media_pipeline
    from .validate import fixture_paths

    return media_pipeline(
        fixture_paths(sf_dir)["registry"], kind="image", stage=(ImageMetaStage, {})
    )


def q_audio_meta(sf_dir: str):
    from ..stages.multimodal import AudioMetaStage, media_pipeline
    from .validate import fixture_paths

    return media_pipeline(
        fixture_paths(sf_dir)["registry"], kind="audio", stage=(AudioMetaStage, {})
    )


def q_frame_sample(sf_dir: str):
    from ..stages.multimodal import FrameSampleStage, media_pipeline
    from .validate import fixture_paths

    return media_pipeline(
        fixture_paths(sf_dir)["registry"], kind="video",
        stage=(FrameSampleStage, {"every_k": 4}),
    ).select_columns(["media_ref", "frame_index"])


def q_scene_cuts(sf_dir: str):
    """Video scene-boundary counts (per-frame signature deltas over the
    codec stub; the segmentation step between frame sampling and
    per-scene features)."""
    from ..stages.multimodal import SceneCutStage, media_pipeline
    from .validate import fixture_paths

    return media_pipeline(
        fixture_paths(sf_dir)["registry"], kind="video",
        stage=(SceneCutStage, {}),
    )


def q_crossmodal_topk(sf_dir: str):
    """Text-to-image retrieval through the shared caption-bridge embedding
    space (decode -> caption tokens -> FNV hash-embed -> broadcast query
    matmul -> two-level top-k fold). Integer scores, deterministic ties."""
    from ..stages.multimodal import crossmodal_topk
    from .validate import fixture_paths

    return crossmodal_topk(fixture_paths(sf_dir)["registry"])


def _crossmodal_sql(sf_dir: str) -> str:
    """Oracle: meta recomputed from FNV(media_ref) (the m_image_meta
    derivation), caption-token component vectors precomputed in Python with
    the SAME embed_text fold and emitted as CASE lookups over the closed
    bucket vocabulary, integer dot against the literal query vectors,
    row_number top-k."""
    from ..stages.multimodal import CM_DIM, CM_QUERIES, embed_text
    from .validate import fixture_paths

    reg = fixture_paths(sf_dir)["registry"]
    h = _fnv_sql("media_ref")
    img = embed_text("image", CM_DIM)
    wv = {b: embed_text(f"w{b}", CM_DIM) for b in range(5)}
    hv = {b: embed_text(f"h{b}", CM_DIM) for b in range(5)}
    cv = {b: embed_text(f"c{b}", CM_DIM) for b in range(1, 5)}
    e_cols = []
    for j in range(CM_DIM):
        wcase = " ".join(f"WHEN {b} THEN {int(v[j])}" for b, v in wv.items())
        hcase = " ".join(f"WHEN {b} THEN {int(v[j])}" for b, v in hv.items())
        ccase = " ".join(f"WHEN {b} THEN {int(v[j])}" for b, v in cv.items())
        e_cols.append(
            f"({int(img[j])} + (CASE wb {wcase} END) + (CASE hb {hcase} END)"
            f" + (CASE cb {ccase} END)) AS e{j}")
    q_parts = []
    for qi, q in enumerate(CM_QUERIES):
        qv = embed_text(q, CM_DIM)
        dot = " + ".join(f"({int(qv[j])}) * e{j}" for j in range(CM_DIM))
        q_parts.append(f"SELECT CAST({qi} AS BIGINT) AS query_id, media_ref, "
                       f"CAST({dot} AS BIGINT) AS score FROM e")
    return f"""
WITH r AS (SELECT media_ref, {h} AS h FROM read_parquet('{reg}')
           WHERE kind = 'image'),
m AS (SELECT media_ref,
        CAST((16 + h % 1024) // 256 AS BIGINT) AS wb,
        CAST((16 + (h >> 10) % 1024) // 256 AS BIGINT) AS hb,
        CAST(1 + h % 4 AS BIGINT) AS cb FROM r),
e AS (SELECT media_ref, {", ".join(e_cols)} FROM m),
s AS ({" UNION ALL ".join(q_parts)})
SELECT query_id, media_ref, score,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, media_ref) AS BIGINT) AS rank
FROM s
QUALIFY rank <= 5
"""


def q_phash_dups(sf_dir: str):
    """Image near-dup pairs by perceptual hash (aHash over decoded 8x8
    thumbnails, banded Hamming search) over the image-variants media table
    (base images + deterministic 2-pixel-perturbed twins)."""
    from ..stages.multimodal import phash_dups, synth_image_variants_parquet
    from .validate import fixture_paths

    media = synth_image_variants_parquet(fixture_paths(sf_dir)["registry"])
    return phash_dups(media)


def q_audio_dups(sf_dir: str):
    """Audio near-dup pairs by waveform fingerprint over the variants media
    table — the audio sibling of m_phash_dups on the shared banded Hamming
    exchange."""
    from ..stages.multimodal import audio_fingerprint_dups, synth_media_variants_parquet
    from .validate import fixture_paths

    media = synth_media_variants_parquet(fixture_paths(sf_dir)["registry"])
    return audio_fingerprint_dups(media)


def q_kind_drift(sf_dir: str):
    """Span-kind histogram drift of the interleaved corpus vs a deterministic
    SUBSET snapshot (docs with even FNV(doc_id), vectorized) — rows-only.
    The snapshot deliberately differs from the scored corpus so PSI is
    nonzero and the drift path is exercised against a real distribution gap
    (a full-corpus snapshot scores identically-zero forever)."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import hash_str
    from ..sources.readers import read_documents
    from ..stages.drift import kind_drift, kind_histogram
    from .validate import fixture_paths

    paths = fixture_paths(sf_dir)

    def even_half(t: pa.Table) -> pa.Table:
        h = hash_str(np.asarray(t["doc_id"]).astype("U"))
        return t.filter(pa.array((h % np.uint64(2)) == 0))

    snap_docs = read_documents(paths["docs"]).map_batches(
        even_half, batch_format="pyarrow"
    )
    snap = kind_histogram(snap_docs)
    return kind_drift(read_documents(paths["docs"]), snap)


def q_kind_hist(sf_dir: str):
    """Span-kind histogram over the interleaved corpus — the integer core of
    the kind-drift check, oracle-checked (the PSI float on top is not)."""
    import pandas as pd

    from ..sources.readers import read_documents
    from ..stages.drift import kind_histogram
    from .validate import fixture_paths

    hist = kind_histogram(read_documents(fixture_paths(sf_dir)["docs"]))
    df = pd.DataFrame(sorted(hist.items()), columns=["kind", "count"])
    df["count"] = df["count"].astype("int64")
    return df


def q_drift_bins(sf_dir: str):
    """Per-source fixed-bin n_chars histogram — the integer PSI input of
    a_drift_by_source, oracle-checked bin by bin."""
    import ray.data as rd

    from ..stages.stats import histogram_by_group

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    return histogram_by_group(ds, "n_chars", "source",
                              lo=HIST_LO, hi=HIST_HI, nbins=HIST_BINS)


KIND_HIST_SQL = """
SELECT kind, count(*)::BIGINT AS count
FROM read_parquet('{flat}') GROUP BY kind
"""

DRIFT_BINS_SQL = f"""
WITH bins AS (SELECT unnest(range(0, {HIST_BINS})) AS bin),
srcs AS (SELECT DISTINCT source FROM documents),
h AS (
  SELECT source,
         least(greatest(floor((n_chars - {HIST_LO}) / {(HIST_HI - HIST_LO) / HIST_BINS})::BIGINT, 0),
               {HIST_BINS - 1}) AS bin, count(*)::BIGINT AS c
  FROM documents GROUP BY 1, 2)
SELECT srcs.source AS "group", bins.bin::BIGINT AS bin, coalesce(h.c, 0)::BIGINT AS count
FROM srcs CROSS JOIN bins
LEFT JOIN h ON h.source = srcs.source AND h.bin = bins.bin
"""


# --------------------------------------------------------- join pipelines
def q_orders_by_segment(sf_dir: str):
    """Broadcast dimension join: orders x customer (small side via ray.put),
    counted by market segment."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.joins import broadcast_join, lowcard_count

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    customer = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, customer, left_key="o_custkey",
                            right_key="c_custkey", right_columns=["c_mktsegment"])
    return lowcard_count(joined, "c_mktsegment")


def q_lineitem_priority(sf_dir: str):
    """Partitioned hash join: lineitem x orders (fact-to-fact, salted
    buckets), item counts + quantity sums by order priority."""
    import pyarrow as pa
    import ray.data as rd

    from ..stages.joins import lowcard_count, partitioned_hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    joined = partitioned_hash_join(
        li, orders, left_key="l_orderkey", right_key="o_orderkey",
        left_columns=["l_quantity"], right_columns=["o_orderpriority"],
        left_types={"l_quantity": pa.float64()},
        right_types={"o_orderpriority": pa.string()},
        num_buckets=32, salt=2,
    )
    return lowcard_count(joined, "o_orderpriority",
                         extra_sums={"sum_qty": "l_quantity"})


def q_customer_region(sf_dir: str):
    """Chained broadcast joins: customer -> nation -> region, counted by
    region name (the snowflake-dimension walk)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.joins import broadcast_join, lowcard_count

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    j1 = broadcast_join(cust, nation, left_key="c_nationkey",
                        right_key="n_nationkey", right_columns=["n_regionkey"])
    j2 = broadcast_join(j1, region, left_key="n_regionkey",
                        right_key="r_regionkey", right_columns=["r_name"])
    return lowcard_count(j2, "r_name")


ORDERS_BY_SEGMENT_SQL = """
SELECT c_mktsegment, count(*)::BIGINT AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""

LINEITEM_PRIORITY_SQL = """
SELECT o_orderpriority, count(*)::BIGINT AS n,
       sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""

CUSTOMER_REGION_SQL = """
SELECT r_name, count(*)::BIGINT AS n
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""


def _events(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet")


def q_segment_returnflag(sf_dir: str):
    """Three-table star rollup (TPC-H Q3/Q5 shape): lineitem joins orders
    on the fact-fact partitioned hash join, customer segment attaches by
    broadcast, then an exact (segment, returnflag) count + quantity-sum
    rollup — the deep-composition check that the join operators chain."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.joins import broadcast_join, lowcard_count, partitioned_hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity", "l_returnflag"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    j1 = partitioned_hash_join(
        li, orders, left_key="l_orderkey", right_key="o_orderkey",
        left_columns=["l_quantity", "l_returnflag"],
        right_columns=["o_custkey"],
        left_types={"l_quantity": pa.float64(), "l_returnflag": pa.string()},
        right_types={"o_custkey": pa.int64()},
    )
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    j2 = broadcast_join(j1, cust, left_key="o_custkey",
                        right_key="c_custkey", right_columns=["c_mktsegment"])

    def comb(t: pa.Table) -> pa.Table:
        seg = t["c_mktsegment"]
        if isinstance(seg, pa.ChunkedArray):
            seg = seg.combine_chunks()
        fl = t["l_returnflag"]
        if isinstance(fl, pa.ChunkedArray):
            fl = fl.combine_chunks()
        return pa.table({
            "k": pc.binary_join_element_wise(seg, fl, "\x1f"),
            "q": pc.cast(t["l_quantity"], pa.int64()),
        })

    rolled = lowcard_count(j2.map_batches(comb, batch_format="pyarrow"),
                           "k", extra_sums={"sum_qty": "q"})

    def split(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["k"], "\x1f")
        return pa.table({
            "c_mktsegment": pc.list_element(parts, 0),
            "l_returnflag": pc.list_element(parts, 1),
            "n": t["n"],
            "sum_qty": t["sum_qty"],
        })

    return rolled.map_batches(split, batch_format="pyarrow")


def q_funnel(sf_dir: str):
    """First-touch view -> click -> purchase funnel: users by deepest level
    reached (strictly-increasing timestamps across steps)."""
    from ..stages.windows import funnel_levels

    return funnel_levels(_events(sf_dir))


def q_retention(sf_dir: str):
    """Cohort retention: users active in window w also active in w+k for
    horizons 0-3 (0 = cohort base)."""
    from ..stages.windows import retention_cohorts

    return retention_cohorts(_events(sf_dir))


def q_tumbling(sf_dir: str):
    from ..stages.windows import tumbling_window_counts

    return tumbling_window_counts(_events(sf_dir))


def q_window_distinct(sf_dir: str):
    from ..stages.windows import tumbling_window_distinct

    return tumbling_window_distinct(_events(sf_dir))


WINDOW_DISTINCT_SQL = """
SELECT epoch_us(ts) // 3600000000 AS window_id,
       count(DISTINCT user_id)::BIGINT AS n_distinct
FROM events GROUP BY 1
"""


DISTINCT_BY_TYPE_SQL = """
SELECT epoch_us(ts) // 3600000000 AS window_id, event_type,
       count(DISTINCT user_id)::BIGINT AS n_distinct
FROM events GROUP BY 1, 2
"""


def q_distinct_by_type(sf_dir: str):
    """Per-(window, event_type) exact distinct users (feature-level DAU)."""
    from ..stages.windows import tumbling_distinct_by_type

    return tumbling_distinct_by_type(_events(sf_dir))


def q_hopping(sf_dir: str):
    from ..stages.windows import hopping_window_counts

    return hopping_window_counts(_events(sf_dir))


def q_sessionize(sf_dir: str):
    from ..stages.windows import sessionize

    return sessionize(_events(sf_dir))


def q_lrs(sf_dir: str):
    """Corpus-wide longest repeated word-substring via distributed prefix
    doubling (``dedup.longest_repeated_substring``) — the suffix-array
    ExactSubstr core, here as duplicate-equality classes."""
    from ..stages.dedup import longest_repeated_substring

    return longest_repeated_substring(_docs(sf_dir))


def _lcp_sql(a: str, b: str) -> str:
    """Word-level LCP of two word-list columns (NULL-guarded): index of
    the first mismatch minus one, whole shorter list when no mismatch."""
    # nullif: DuckDB list_position returns 0 (not NULL) when no element
    # matches — all-equal prefixes must fall through to the shorter length
    return (f"CASE WHEN {b} IS NULL THEN 0 ELSE coalesce("
            f"nullif(list_position(list_transform("
            f"range(1, least(len({a}), len({b})) + 1), "
            f"j -> {a}[j] <> {b}[j]), true), 0) - 1, "
            f"least(len({a}), len({b}))) END")


# Sorted-suffix adjacency oracle: the max pairwise common prefix is
# attained by an adjacent pair in lexicographic order, and with words
# containing no chars < ' ' the space-joined char order respects word
# boundaries, so word-level LCP of adjacent suffixes is exact. A position
# belongs to a duplicated lrs-window iff its LCP with SOME neighbor
# equals the max.
LRS_SQL = f"""
WITH wl AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
            FROM documents),
s0 AS (SELECT w, unnest(range(1, len(w) + 1)) AS i FROM wl),
s AS (SELECT w[i:] AS tail, array_to_string(w[i:], ' ') AS suf FROM s0),
o AS (SELECT tail,
             lag(tail)  OVER (ORDER BY suf) AS pt,
             lead(tail) OVER (ORDER BY suf) AS nt
      FROM s),
l AS (SELECT {_lcp_sql('tail', 'pt')} AS lp,
             {_lcp_sql('tail', 'nt')} AS ln
      FROM o),
m AS (SELECT coalesce(max(greatest(lp, ln)), 0) AS lrs FROM l)
SELECT m.lrs::BIGINT AS lrs_words,
       (CASE WHEN m.lrs = 0 THEN 0 ELSE
         (SELECT count(*) FROM l WHERE lp = m.lrs OR ln = m.lrs)
        END)::BIGINT AS n_occurrences
FROM m
"""


def q_cusum(sf_dir: str):
    """Integer CUSUM rate-shift alarms per event type over tumbling
    windows (``windows.cusum_alarms``) — closed-form prefix-min CUSUM,
    no recursion on either side."""
    from ..stages.windows import cusum_alarms

    return cusum_alarms(_events(sf_dir))


CUSUM_SQL = """
WITH c AS (SELECT epoch_us(ts) // 3600000000 AS window_id, event_type,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1, 2),
m AS (SELECT event_type,
             ((sum(n) + count(*) - 1) // count(*))::BIGINT AS k
      FROM c GROUP BY 1),
p AS (SELECT c.event_type, window_id, n, m.k,
             sum(n - m.k) OVER (PARTITION BY c.event_type
                                ORDER BY window_id) AS p
      FROM c JOIN m USING (event_type)),
q AS (SELECT event_type, window_id, n, k, p,
             min(p) OVER (PARTITION BY event_type ORDER BY window_id) AS rm
      FROM p)
SELECT event_type, window_id, n, (p - least(rm, 0))::BIGINT AS s,
       (CASE WHEN p - least(rm, 0) >= 3 * k THEN 1 ELSE 0 END)::BIGINT
         AS alarm
FROM q
"""


DUP_PROFILE_KS = (1, 2, 3, 4, 8, 16, 32)


def q_dup_profile(sf_dir: str):
    """Duplication spectrum over window lengths
    (``dedup.duplication_profile``) — the boilerplate-granularity curve
    that sizes ExactSubstr-style dedup; k=3 exercises the non-power
    two-power probe."""
    from ..stages.dedup import duplication_profile

    return duplication_profile(_docs(sf_dir), DUP_PROFILE_KS)


def _dup_profile_sql() -> str:
    parts = []
    for k in DUP_PROFILE_KS:
        parts.append(f"""
SELECT {k}::BIGINT AS k,
       count(*) FILTER (c >= 2)::BIGINT AS n_dup_windows,
       coalesce(sum(c) FILTER (c >= 2), 0)::BIGINT AS n_dup_positions
FROM (SELECT count(*) AS c
      FROM (SELECT array_to_string(w[i:i+{k - 1}], ' ') AS gr
            FROM (SELECT w, unnest(range(1, len(w) - {k} + 2)) AS i
                  FROM (SELECT list_filter(string_split(text, ' '),
                                           x -> x <> '') AS w
                        FROM documents)))
      GROUP BY gr)""")
    return "\nUNION ALL\n".join(parts)


def q_conversion_lag(sf_dir: str):
    """Exact quantiles of first-view -> first-purchase lag in seconds
    (``windows.conversion_lag_quantiles``) — funnel latency, not just
    funnel depth."""
    from ..stages.windows import conversion_lag_quantiles

    return conversion_lag_quantiles(_events(sf_dir))


CONVERSION_LAG_SQL = """
WITH f AS (SELECT user_id,
             min(epoch_us(ts)) FILTER (event_type = 'view') AS fv,
             min(epoch_us(ts)) FILTER (event_type = 'purchase') AS fp
           FROM events GROUP BY 1),
l AS (SELECT (fp - fv) // 1000000 AS v FROM f
      WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv),
c AS (SELECT v, count(*)::BIGINT AS cnt FROM l GROUP BY 1),
s AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM c),
t AS (SELECT count(*)::BIGINT AS n FROM l)
SELECT 'lag' AS col, t.n AS n,
  coalesce((SELECT min(v) FROM s
            WHERE cum >= greatest(ceil(0.25 * t.n), 1)), 0)::BIGINT AS p25,
  coalesce((SELECT min(v) FROM s
            WHERE cum >= greatest(ceil(0.50 * t.n), 1)), 0)::BIGINT AS p50,
  coalesce((SELECT min(v) FROM s
            WHERE cum >= greatest(ceil(0.75 * t.n), 1)), 0)::BIGINT AS p75,
  coalesce((SELECT min(v) FROM s
            WHERE cum >= greatest(ceil(0.95 * t.n), 1)), 0)::BIGINT AS p95
FROM t
"""


NOVEL_N = 2


def q_novel_grams(sf_dir: str):
    """Per-doc n-gram novelty vs all lower-doc_id docs
    (``dedup.novel_gram_counts``) — the first-occurrence curriculum /
    template-spam dial."""
    from ..stages.dedup import novel_gram_counts

    return novel_gram_counts(_docs(sf_dir), n=NOVEL_N)


NOVEL_GRAMS_SQL = """
WITH w AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS w
           FROM documents),
g AS (SELECT doc_id,
             unnest(list_distinct(list_transform(
                 range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS gram
      FROM w),
m AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY 1)
SELECT g.doc_id, count(*)::BIGINT AS n_grams,
       count(*) FILTER (m.fd = g.doc_id)::BIGINT AS n_novel
FROM g JOIN m USING (gram) GROUP BY 1
"""


def q_benford(sf_dir: str):
    """Leading-digit (Benford) audit of the event value column per event
    type (``stats.benford_digits``) — the numeric-forgery / unit-bug dial
    in the table-audit family."""
    import ray.data as rd

    from ..stages.stats import benford_digits

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "value"])
    return benford_digits(events, "value", "event_type")


BENFORD_SQL = """
SELECT event_type,
       substr(cast(cast(floor(value) AS BIGINT) AS VARCHAR), 1, 1)::BIGINT
         AS digit,
       count(*)::BIGINT AS n
FROM events
WHERE value >= 1 AND value < 9223372036854775808 AND isfinite(value)
GROUP BY 1, 2
"""


SESSION_PATH_K = 3


def q_session_paths(sf_dir: str):
    """Session-prefix path frequencies (first-K event types per gap-based
    session, ``windows.session_paths``) — the top-user-journeys rollup."""
    from ..stages.windows import session_paths

    return session_paths(_events(sf_dir), k=SESSION_PATH_K)


SESSION_PATHS_SQL = f"""
WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY epoch_us(ts), event_id)
                  AS prev
           FROM events),
m AS (SELECT user_id, event_type, t, event_id,
             CASE WHEN prev IS NULL OR t - prev > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM o),
s AS (SELECT user_id, event_type, t, event_id,
             sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM m),
r AS (SELECT user_id, sid, event_type, t, event_id,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY t, event_id) AS rn
      FROM s),
p AS (SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY t, event_id) AS path
      FROM r WHERE rn <= {SESSION_PATH_K} GROUP BY 1, 2)
SELECT path, count(*)::BIGINT AS n_sessions FROM p GROUP BY 1
"""


def q_asof_prev_purchase(sf_dir: str):
    from ..stages.windows import asof_join_prev_event

    return asof_join_prev_event(_events(sf_dir), right_type="purchase")


def q_range_join(sf_dir: str):
    from ..stages.windows import range_join_counts

    return range_join_counts(_events(sf_dir))


SEGMENT_RETURNFLAG_SQL = """
SELECT c_mktsegment, l_returnflag, count(*)::BIGINT AS n,
       sum(l_quantity)::BIGINT AS sum_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
"""

FUNNEL_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
a AS (SELECT user_id, min(ts) AS ta FROM events
      WHERE event_type = 'view' GROUP BY 1),
b AS (SELECT e.user_id, min(e.ts) AS tb FROM events e JOIN a USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > a.ta GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e JOIN b USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > b.tb GROUP BY 1)
SELECT CASE WHEN c.user_id IS NOT NULL THEN 3
            WHEN b.user_id IS NOT NULL THEN 2
            WHEN a.user_id IS NOT NULL THEN 1 ELSE 0 END AS level,
       count(*)::BIGINT AS n_users
FROM u LEFT JOIN a USING (user_id) LEFT JOIN b USING (user_id)
       LEFT JOIN c USING (user_id)
GROUP BY 1
"""

RETENTION_SQL = """
WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS win
           FROM events),
h AS (SELECT unnest([0, 1, 2, 3]) AS horizon)
SELECT a.win AS window_id, h.horizon, count(*)::BIGINT AS n_users
FROM a JOIN h ON TRUE
JOIN a b ON b.user_id = a.user_id AND b.win = a.win + h.horizon
GROUP BY 1, 2
"""

TUMBLING_SQL = """
SELECT epoch_us(ts) // 3600000000 AS window_id, event_type,
       count(*)::BIGINT AS n
FROM events GROUP BY 1, 2
"""

# hopping: window 1h, hop 15m -> each event in 4 windows (w*hop <= ts < w*hop+window)
HOPPING_SQL = """
SELECT w AS window_id, event_type, count(*)::BIGINT AS n
FROM (SELECT unnest(range(epoch_us(ts) // 900000000 - 3,
                          epoch_us(ts) // 900000000 + 1)) AS w, event_type
      FROM events)
WHERE w >= 0
GROUP BY 1, 2
"""

SESSIONIZE_SQL = """
WITH o AS (SELECT user_id, ts,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
           FROM events),
m AS (SELECT user_id, ts,
             CASE WHEN prev IS NULL
                    OR epoch_us(ts) - epoch_us(prev) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM o),
ses AS (SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM m),
sz AS (SELECT user_id, sid, count(*) AS c FROM ses GROUP BY 1, 2)
SELECT user_id, count(*)::BIGINT AS n_sessions, sum(c)::BIGINT AS n_events,
       max(c)::BIGINT AS max_session_events
FROM sz GROUP BY 1
"""

RANGE_JOIN_SQL = """
SELECT a.event_id, count(b.event_id)::BIGINT AS n_nearby
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
LEFT JOIN events b
  ON a.user_id = b.user_id AND a.event_id <> b.event_id
 AND b.ts BETWEEN a.ts - INTERVAL 5 MINUTE AND a.ts + INTERVAL 5 MINUTE
GROUP BY a.event_id
"""

# right side deduped to max(event_id) per (user_id, ts) BEFORE the ASOF join
# so the tie-break is pinned to the engine's semantics (equal timestamps
# resolve to the highest event_id) — a bare ASOF JOIN leaves equal-ts
# matches unspecified.
ASOF_SQL = """
WITH p AS (
  SELECT user_id, ts, max(event_id) AS pid
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT l.event_id, p.pid AS matched_id
FROM events l
ASOF JOIN p ON l.user_id = p.user_id AND l.ts > p.ts
"""


def q_table_audit(sf_dir: str):
    """Exact per-column audit of the documents table (nulls + FNV-exact
    distinct counts; float columns excluded by contract)."""
    import ray.data as rd

    from ..stages.stats import table_audit

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang", "source",
                                    "n_chars"])
    return table_audit(docs, ["doc_id", "text", "lang", "source", "n_chars"])


# cross-shard clone recipe: the base corpus has no exact-duplicate texts,
# so clone every doc_id % 7 == 0 document under +30M ids (mirrored in SQL);
# the clone's shard differs from the original's with prob 63/64, making
# real cross-shard leak groups (the 1/64 same-shard pairs are filtered by
# n_shards >= 2 identically on both sides)
SHARD_CLONE_OFFSET = 30_000_000


def q_cross_shard_overlap(sf_dir: str):
    """Duplicate text groups leaking across hash shards (shard =
    FNV(str(doc_id)) % 64) over the clone-augmented corpus."""
    import pyarrow as pa
    import ray.data as rd

    from ..stages.dedup import cross_shard_overlap

    def add_clones(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        m = ids % 7 == 0
        clones = pa.table({
            "doc_id": pa.array(ids[m] + SHARD_CLONE_OFFSET),
            "text": t["text"].combine_chunks().filter(pa.array(m))
            if isinstance(t["text"], pa.ChunkedArray)
            else t["text"].filter(pa.array(m)),
        })
        return pa.concat_tables(
            [pa.table({"doc_id": t["doc_id"], "text": t["text"]}), clones])

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return cross_shard_overlap(
        docs.map_batches(add_clones, batch_format="pyarrow"), n_shards=64)


def q_gram_spectrum(sf_dir: str):
    """Bigram frequency-of-frequencies, k capped at 10 (+ tail row, + k=0
    total-distinct row)."""
    import ray.data as rd

    from ..stages.textops import gram_spectrum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return gram_spectrum(docs, n=2, k_cap=10)


BURST_WINDOW_US = 10 * 60 * 1_000_000


def q_burst_windows(sf_dir: str):
    """Per-user sliding-window burst maxima (10-minute window)."""
    import ray.data as rd

    from ..stages.windows import burst_windows

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return burst_windows(ev, window_us=BURST_WINDOW_US)


def _table_audit_sql() -> str:
    cols = ("doc_id", "text", "lang", "source", "n_chars")
    parts = []
    for c in cols:
        expr = c if c in ("text", "lang", "source") else f"CAST({c} AS VARCHAR)"
        parts.append(
            f"""SELECT '{c}' AS "column", count(*)::BIGINT AS n_rows,
       (count(*) - count({c}))::BIGINT AS n_nulls,
       count(DISTINCT {_fnv_sql(expr)})::BIGINT AS n_distinct
FROM documents""")
    return "\nUNION ALL\n".join(parts)

CROSS_SHARD_SQL = f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {SHARD_CLONE_OFFSET}, text FROM documents
  WHERE doc_id % 7 = 0),
g AS (
  SELECT text, count(*)::BIGINT AS n_docs, min(doc_id)::BIGINT AS group_id,
         count(DISTINCT __FNV_DOC__ % 64)::BIGINT AS n_shards
  FROM aug WHERE text IS NOT NULL GROUP BY text)
SELECT group_id, n_docs, n_shards FROM g
WHERE n_docs >= 2 AND n_shards >= 2
"""

# cross-lang clone recipe (base corpus has no exact-duplicate texts):
# doc_id % 5 == 0 clones under +40M with a WRONG lang ('xx') except every
# third (doc_id % 15 == 0) which keeps its lang — a dup group that is NOT
# cross-lang, exercising the HAVING; doc_id % 10 == 0 adds a second clone
# under +50M with a third lang ('yy')
CROSSLANG_CLONE_A = 40_000_000
CROSSLANG_CLONE_B = 50_000_000

CROSSLANG_SQL = f"""
WITH aug AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + {CROSSLANG_CLONE_A}, text,
         CASE WHEN doc_id % 3 = 0 THEN lang ELSE 'xx' END
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + {CROSSLANG_CLONE_B}, text, 'yy'
  FROM documents WHERE doc_id % 10 = 0)
SELECT min(doc_id)::BIGINT AS group_id, count(*)::BIGINT AS n_docs,
       count(DISTINCT lang)::BIGINT AS n_langs
FROM aug WHERE text IS NOT NULL AND lang IS NOT NULL
GROUP BY text HAVING count(*) >= 2 AND count(DISTINCT lang) >= 2
"""


def crosslang_add_clones(t):
    """Per-batch clone augmentation for q_crosslang_dups (module-level so
    the 0-row-batch regression test can drive it directly — the r04 driver
    red was an empty-selection null-type crash in here)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ids = np.asarray(t["doc_id"]).astype(np.int64)
    texts = t["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    langs = t["lang"]
    if isinstance(langs, pa.ChunkedArray):
        langs = langs.combine_chunks()
    base = pa.table({"doc_id": pa.array(ids), "text": texts,
                     "lang": langs})
    m5 = ids % 5 == 0
    keep_lang = pa.array((ids % 3 == 0)[m5])
    sel5 = pa.array(m5)
    a = pa.table({
        "doc_id": pa.array(ids[m5] + CROSSLANG_CLONE_A),
        "text": texts.filter(sel5),
        "lang": pc.if_else(keep_lang, langs.filter(sel5),
                           pa.scalar("xx")),
    })
    m10 = pa.array(ids % 10 == 0)
    b = pa.table({
        "doc_id": pa.array(ids[ids % 10 == 0] + CROSSLANG_CLONE_B),
        "text": texts.filter(m10),
        # type= is REQUIRED: on a batch with no doc_id%10==0 rows the
        # list is empty and pyarrow would infer null, breaking the
        # concat_tables below (r04 driver red d_crosslang_dups).
        "lang": pa.array(["yy"] * int(np.count_nonzero(ids % 10 == 0)),
                         type=pa.string()),
    })
    return pa.concat_tables([base, a, b])


def q_crosslang_dups(sf_dir: str):
    """Exact-dup text groups declared under >= 2 langs (label-quality
    audit) over the cross-lang clone-augmented corpus."""
    import ray.data as rd

    from ..stages.dedup import crosslang_dups

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    return crosslang_dups(
        docs.map_batches(crosslang_add_clones, batch_format="pyarrow"))


# late-arrival recipe: the fixture stream is perfectly ts-ordered by
# event_id, so the query backdates every 17th event by 10 minutes — a
# deterministic "late-arriving event" perturbation mirrored in SQL
OOO_BACKDATE_US = 600_000_000

OUT_OF_ORDER_SQL = f"""
WITH p AS (SELECT event_id, user_id,
                  epoch_us(ts) - CASE WHEN event_id % 17 = 0
                                      THEN {OOO_BACKDATE_US} ELSE 0 END AS t
           FROM events),
x AS (SELECT user_id, t,
             max(t) OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS mp
      FROM p)
SELECT user_id, count(*)::BIGINT AS n_events,
       coalesce(sum(CASE WHEN t < mp THEN 1 ELSE 0 END), 0)::BIGINT AS n_late
FROM x GROUP BY user_id
"""


def q_out_of_order(sf_dir: str):
    """Per-user out-of-order arrival counts over the backdated stream
    (every 17th event arrives 10 minutes late)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.windows import out_of_order_counts

    def perturb(t: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(t["ts"], pa.int64()))
        e = np.asarray(t["event_id"]).astype(np.int64)
        adj = np.where(e % 17 == 0, OOO_BACKDATE_US, 0)
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "ts": pa.array(ts - adj)})

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts"])
    return out_of_order_counts(
        events.map_batches(perturb, batch_format="pyarrow"))


GRAM_SPECTRUM_SQL = """
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
                  AS ws FROM documents),
g AS (SELECT array_to_string(ws[i : i + 1], ' ') AS gram
      FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM w)),
c AS (SELECT gram, count(*)::BIGINT AS c FROM g GROUP BY gram),
spec AS (SELECT CASE WHEN c > 10 THEN 11 ELSE c END AS k,
                count(*)::BIGINT AS n_grams FROM c GROUP BY 1),
base AS (SELECT unnest(range(0, 12))::BIGINT AS k)
SELECT base.k,
       CASE WHEN base.k = 0 THEN (SELECT count(*)::BIGINT FROM c)
            ELSE coalesce(spec.n_grams, 0) END AS n_grams
FROM base LEFT JOIN spec USING (k)
"""

BURST_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS tu FROM events),
c AS (SELECT user_id, count(*) OVER (PARTITION BY user_id ORDER BY tu
        RANGE BETWEEN CURRENT ROW AND {BURST_WINDOW_US} FOLLOWING) AS cnt
      FROM e)
SELECT user_id, max(cnt)::BIGINT AS burst FROM c GROUP BY user_id
"""


def dataops_queries() -> dict[str, Callable[[str], Any]]:
    return {
        "w_retention": q_retention,
        "w_funnel": q_funnel,
        "j_segment_returnflag": q_segment_returnflag,
        "w_tumbling": q_tumbling,
        "w_hopping": q_hopping,
        "w_distinct_users": q_window_distinct,
        "w_distinct_by_type": q_distinct_by_type,
        "w_sessionize": q_sessionize,
        "w_session_paths": q_session_paths,
        "a_benford": q_benford,
        "d_novel_grams": q_novel_grams,
        "w_conversion_lag": q_conversion_lag,
        "d_lrs": q_lrs,
        "d_dup_profile": q_dup_profile,
        "w_cusum": q_cusum,
        "w_asof_prev_purchase": q_asof_prev_purchase,
        "w_range_join": q_range_join,
        "a_kind_drift": q_kind_drift,
        "a_kind_hist": q_kind_hist,
        "a_drift_bins": q_drift_bins,
        "a_drift_psi": q_drift_psi,
        "a_kind_psi": q_kind_psi,
        "a_profile_quantiles": q_profile_quantiles,
        "t_char_entropy": q_char_entropy,
        "m_image_meta": q_image_meta,
        "m_audio_meta": q_audio_meta,
        "m_frame_sample": q_frame_sample,
        "m_scene_cuts": q_scene_cuts,
        "m_phash_dups": q_phash_dups,
        "m_audio_dups": q_audio_dups,
        "m_crossmodal_topk": q_crossmodal_topk,
        "a_stats_nchars": q_stats_nchars,
        "a_histogram_nchars": q_histogram_nchars,
        "a_column_profile": q_column_profile,
        "a_kll_quantiles": q_kll_quantiles,
        "a_distinct_nchars": q_distinct_nchars,
        "a_drift_by_source": q_drift_by_source,
        "t_text_features": q_text_features,
        "t_language_id": q_language_id,
        "t_fingerprints": q_fingerprints,
        "d_exact_dedup": q_exact_dedup,
        "d_chunk_dedup": q_chunk_dedup,
        "d_ngram_jaccard": q_ngram_jaccard,
        "d_minhash_lsh": q_minhash_lsh,
        "d_simhash_pairs": q_simhash_pairs,
        "d_edit_distance": q_edit_distance,
        "d_delta_dedup": q_delta_dedup,
        "w_upsert_latest": q_upsert_latest,
        "a_fd_violations": q_fd_violations,
        "a_contingency": q_contingency,
        "d_triangles": q_triangles,
        "d_cdc_chunks": q_cdc_chunks,
        "c_rank_fusion": q_rank_fusion,
        "c_pareto": q_pareto,
        "d_ind_discovery": q_ind_discovery,
        "a_rollup": q_rollup,
        "a_cube": q_cube,
        "a_k_anonymity": q_k_anonymity,
        "a_l_diversity": q_l_diversity,
        "t_kn_counts": q_kn_counts,
        "t_simpson": q_simpson,
        "t_keyness": q_keyness,
        "w_autocorr": q_autocorr,
        "d_lpa": q_lpa,
        "c_temperature_mix": q_temperature_mix,
        "d_dedup_clusters": q_dedup_clusters,
        "d_cluster_sizes": q_cluster_sizes,
        "d_decontaminate": q_decontaminate,
        "t_repetition": q_repetition,
        "t_pack": q_pack_sequences,
        "t_mixture": q_mixture,
        "t_tfidf": q_tfidf,
        "t_oov": q_oov,
        "t_shuffle": q_shuffle,
        "t_top_words": q_top_words,
        "a_top_words_sketch": q_top_words_sketch,
        "t_bpe_merges": q_bpe_merges,
        "t_bpe_tokens": q_bpe_tokens,
        "t_chunks": q_chunks,
        "t_normalize": q_normalize,
        "d_seg_dedup": q_seg_dedup,
        "d_prefix_dups": q_prefix_dups,
        "d_corpus_diff": q_corpus_diff,
        "d_dup_ngrams": q_dup_ngrams,
        "d_strip_dup_spans": q_strip_dup_spans,
        "t_lm_coverage": q_lm_coverage,
        "c_nb_classifier": q_nb_classifier,
        "d_crosslang_dups": q_crosslang_dups,
        "w_out_of_order": q_out_of_order,
        "c_gopher_funnel": q_gopher_funnel,
        "c_coverage_bands": q_coverage_bands,
        "t_top_per_source": q_top_per_source,
        "t_split": q_split,
        "a_quantiles_nchars": q_quantiles_nchars,
        "a_quantile_bands": q_quantile_bands,
        "a_moments": q_moments,
        "a_vocab_growth": q_vocab_growth,
        "a_distinct_ngrams": q_distinct_ngrams,
        "a_source_overlap": q_source_overlap,
        "w_props_rollup": q_props_rollup,
        "t_neg_samples": q_neg_samples,
        "s_hard_negatives": q_hard_negatives,
        "d_dup_rate": q_dup_rate,
        "s_pq_codes": q_pq_codes,
        "s_pq_topk": q_pq_topk,
        "c_filter_funnel": q_filter_funnel,
        "t_lang_confusion": q_lang_confusion,
        "t_cooccurrence": q_cooccurrence,
        "w_interarrival": q_interarrival,
        "w_transitions": q_transitions,
        "d_dup_degree": q_dup_degree,
        "a_user_gini": q_user_gini,
        "c_mixture_upsample": q_mixture_upsample,
        "a_corpus_card": q_corpus_card,
        "a_source_card": q_source_card,
        "c_curriculum_shards": q_curriculum_shards,
        "d_pagerank": q_pagerank,
        "d_kcore": q_kcore,
        "c_cluster_shards": q_cluster_shards,
        "d_containment": q_containment,
        "a_rank_nchars": q_rank_nchars,
        "a_outliers_mad": q_outliers_mad,
        "a_rank_by_source": q_rank_by_source,
        "t_quality_score": q_quality_score,
        "c_mixture_apply": q_mixture_apply,
        "d_norm_dedup": q_norm_dedup,
        "t_pii_redact": q_pii_redact,
        "c_curation": q_curation,
        "c_curation_clf": q_curation_clf,
        "c_cluster_cap": q_cluster_cap,
        "c_kmeans": q_kmeans,
        "c_cluster_cap_trained": q_cluster_cap_trained,
        "c_embed_dedup": q_embed_dedup,
        "c_keep_best": q_keep_best,
        "j_orders_by_segment": q_orders_by_segment,
        "j_lineitem_priority": q_lineitem_priority,
        "j_customer_region": q_customer_region,
        "t_sample": q_sample,
        "t_badwords": q_badwords,
        "t_winnow": q_winnow,
        "t_truncate": q_truncate,
        "t_hash_embed": q_hash_embed,
        "c_split_leakage": q_split_leakage,
        "t_sample_n_by_source": q_sample_n_by_source,
        "t_sample_weighted": q_weighted_sample,
        "t_sample_n": q_sample_n,
        "t_sample_stratified": q_sample_stratified,
        "s_cosine_topk": q_cosine_topk,
        "s_cosine_pairs": q_cosine_pairs,
        "s_embed_decon": q_embed_decon,
        "s_lsh_topk": q_lsh_topk,
        "s_ivf_topk": q_ivf_topk,
        "a_table_audit": q_table_audit,
        "d_cross_shard_overlap": q_cross_shard_overlap,
        "a_gram_spectrum": q_gram_spectrum,
        "w_burst_windows": q_burst_windows,
    }


# ------------------------------------------------------------------ oracles
# FNV-1a / SimHash expressed in SQL — the SAME fold as functions/hashing.py
# (FNV-1a over UTF-32 code units), so fingerprint / simhash / synth-media
# oracles compare bitwise. 64-bit wraparound multiply via HUGEINT modmul.
def _fnv_sql(expr: str) -> str:
    return (
        "CAST(list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT), "
        f"list_transform(range(1, length({expr})+1), "
        f"i -> CAST(unicode(substr({expr}, i, 1)) AS UBIGINT))), "
        "(acc, c) -> CAST((CAST(xor(acc, c) AS HUGEINT) * 1099511628211) "
        "% 18446744073709551616 AS UBIGINT)) AS UBIGINT)"
    )


def _s64(expr: str) -> str:
    """UBIGINT column -> two's-complement BIGINT (numpy .astype(int64))."""
    return (
        f"CAST(CASE WHEN {expr} >= 9223372036854775808 "
        f"THEN CAST({expr} AS HUGEINT) - 18446744073709551616 "
        f"ELSE CAST({expr} AS HUGEINT) END AS BIGINT)"
    )


def _simhash_ctes() -> str:
    """CTEs computing each document's 64-bit SimHash (``textops.simhash_batch``
    mirror: word-unigram FNV hashes, per-bit +/-1 votes, sign -> bit)."""
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0 AS b{b}"
        for b in range(64)
    )
    bit_add = " + ".join(
        f"CASE WHEN b{b} THEN CAST({1 << b} AS UBIGINT) ELSE CAST(0 AS UBIGINT) END"
        for b in range(64)
    )
    return f"""
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
wh AS (SELECT doc_id, {_fnv_sql('word')} AS h FROM w),
bits AS (SELECT doc_id, {bit_sums} FROM wh GROUP BY doc_id),
sh AS (SELECT doc_id, {bit_add} AS sig FROM bits)
"""


FINGERPRINTS_SQL = f"""
WITH {_simhash_ctes()},
f AS (SELECT doc_id, {_fnv_sql('text')} AS fp FROM documents)
SELECT f.doc_id, {_s64('f.fp')} AS fingerprint, {_s64('sh.sig')} AS simhash
FROM f JOIN sh USING (doc_id)
"""

SIMHASH_PAIRS_SQL = f"""
WITH {_simhash_ctes()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""

# DuckDB's levenshtein() is the exact character-level metric the DP in
# stages/dedup.py:_levenshtein computes — integer-exact oracle.
EDIT_DISTANCE_SQL = f"""
WITH cand AS ({SIMHASH_PAIRS_SQL})
SELECT c.doc_a, c.doc_b, levenshtein(a.text, b.text) AS edit_dist
FROM cand c
JOIN documents a ON a.doc_id = c.doc_a AND a.text IS NOT NULL
JOIN documents b ON b.doc_id = c.doc_b AND b.text IS NOT NULL
"""

# same FNV quarter-split as decontaminate; admitted = corpus-fresh AND
# first (min doc_id) within the delta
DELTA_DEDUP_SQL_TEMPLATE = """
WITH h AS (SELECT doc_id, text, (__FNV__ % 4 = 0) AS is_delta FROM documents
           WHERE text IS NOT NULL)
SELECT doc_id FROM (
  SELECT doc_id, text,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM h WHERE is_delta) d
WHERE rn = 1
  AND NOT EXISTS (SELECT 1 FROM h c WHERE NOT c.is_delta AND c.text = d.text)
"""

UPSERT_LATEST_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""

RANK_FUSION_SQL = """
WITH wl AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS l
            FROM documents),
wp AS (SELECT doc_id, unnest(l) AS w FROM wl),
wc AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM wp WHERE w <> ''
       GROUP BY 1, 2),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_distinct,
               max(c)::BIGINT AS top_n FROM wc GROUP BY 1),
sig AS (SELECT d.doc_id,
               coalesce(length(d.text), 0)::BIGINT AS s_len,
               coalesce(a.n_distinct, 0) AS s_distinct,
               coalesce(a.top_n, 0) AS s_rep
        FROM documents d LEFT JOIN agg a USING (doc_id)),
r AS (SELECT doc_id,
             rank() OVER (ORDER BY s_len DESC) AS r_len,
             rank() OVER (ORDER BY s_distinct DESC) AS r_distinct,
             rank() OVER (ORDER BY s_rep ASC) AS r_rep
      FROM sig)
SELECT doc_id, r_len, r_distinct, r_rep,
       (r_len + r_distinct + r_rep)::BIGINT AS fused
FROM r
"""

# content-defined chunking: base-31 window-8 rolling hash over CODEPOINTS
# (ord == the utf-32 units the kernel hashes); max H < 2^56 so plain BIGINT
# arithmetic is exact — no modulus, no HUGEINT
CDC_CHUNK_SQL = """
WITH d AS (SELECT doc_id, text FROM documents
           WHERE text IS NOT NULL AND length(text) > 0),
pos AS (SELECT doc_id, text, unnest(range(8, length(text))) AS i FROM d),
hv AS (SELECT doc_id, i FROM pos
       WHERE (ord(substr(text, i, 1))::BIGINT
            + ord(substr(text, i-1, 1))::BIGINT * 31
            + ord(substr(text, i-2, 1))::BIGINT * 961
            + ord(substr(text, i-3, 1))::BIGINT * 29791
            + ord(substr(text, i-4, 1))::BIGINT * 923521
            + ord(substr(text, i-5, 1))::BIGINT * 28629151
            + ord(substr(text, i-6, 1))::BIGINT * 887503681
            + ord(substr(text, i-7, 1))::BIGINT * 27512614111) % 64 = 0),
cl AS (SELECT d.doc_id, d.text,
              coalesce(list_sort(list(h.i) FILTER (WHERE h.i IS NOT NULL)),
                       []) AS cuts
       FROM d LEFT JOIN hv h ON h.doc_id = d.doc_id
       GROUP BY d.doc_id, d.text),
ks AS (SELECT doc_id, text, cuts,
              unnest(range(1, len(cuts) + 2)) AS k FROM cl),
chunks AS (SELECT doc_id,
                  substr(text,
                         CASE WHEN k = 1 THEN 1 ELSE cuts[k-1] + 1 END,
                         (CASE WHEN k = len(cuts) + 1 THEN length(text)
                               ELSE cuts[k] END)
                         - (CASE WHEN k = 1 THEN 0 ELSE cuts[k-1] END))
                  AS chunk
           FROM ks),
occ AS (SELECT doc_id, chunk, count(*)::BIGINT AS n_occ
        FROM chunks GROUP BY doc_id, chunk),
freq AS (SELECT chunk FROM occ GROUP BY chunk
         HAVING count(DISTINCT doc_id) >= 2)
SELECT o.doc_id, CAST(sum(o.n_occ) AS BIGINT) AS n_chunks,
       CAST(coalesce(sum(CASE WHEN f.chunk IS NOT NULL
                               THEN o.n_occ END), 0) AS BIGINT)
       AS n_dup_chunks
FROM occ o LEFT JOIN freq f ON f.chunk = o.chunk
GROUP BY o.doc_id
"""

TRIANGLES_SQL = """
WITH {ngram_ctes},
tri AS (SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
        FROM edges e1
        JOIN edges e2 ON e2.doc_a = e1.doc_b
        JOIN edges e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
corners AS (SELECT x AS doc_id FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
SELECT doc_id, count(*)::BIGINT AS n_triangles
FROM corners GROUP BY doc_id
"""

FD_VIOLATIONS_SQL = """
SELECT source, count(*)::BIGINT AS n_docs,
       count(DISTINCT lang)::BIGINT AS n_values
FROM documents GROUP BY source
HAVING count(DISTINCT lang) > 1
"""

CONTINGENCY_SQL = """
WITH c AS (SELECT source, lang, count(*)::BIGINT AS n
           FROM documents GROUP BY source, lang)
SELECT source, lang, n,
       CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS row_total,
       CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS col_total,
       CAST(sum(n) OVER () AS BIGINT) AS grand_total
FROM c
"""


def _media_oracles(sf_dir: str) -> dict[str, str]:
    """SQL recomputation of the FakeCodec metadata straight from the fixture
    registry: ``synth_media`` derives every header field from
    hash_str(media_ref), which the FNV fold reproduces in SQL — so the
    actor-pool decode stages get exact oracles despite the codec stub."""
    from .validate import fixture_paths

    reg = fixture_paths(sf_dir)["registry"]
    h = _fnv_sql("media_ref")
    img = f"""
WITH r AS (SELECT media_ref, {h} AS h FROM read_parquet('{reg}') WHERE kind = 'image')
SELECT media_ref,
  CAST(16 + h % 1024 AS BIGINT) AS width,
  CAST(16 + (h >> 10) % 1024 AS BIGINT) AS height,
  CAST(1 + h % 4 AS BIGINT) AS channels,
  CAST(9 + least(64 + h % 4096, 4104) AS BIGINT) AS payload_bytes
FROM r
"""
    aud = f"""
WITH r AS (SELECT media_ref, {h} AS h FROM read_parquet('{reg}') WHERE kind = 'audio')
SELECT media_ref,
  CAST(100 + h % 600000 AS BIGINT) AS duration_ms,
  CAST(8000 + (h % 5) * 8000 AS BIGINT) AS sample_rate,
  CAST(((100 + h % 600000) * (8000 + (h % 5) * 8000)) // 1000 AS BIGINT) AS n_samples
FROM r
"""
    vid = f"""
WITH r AS (SELECT media_ref, CAST(1 + {h} % 64 AS BIGINT) AS nf
           FROM read_parquet('{reg}') WHERE kind NOT IN ('image', 'audio'))
SELECT media_ref, CAST(unnest(range(0, nf, 4)) AS BIGINT) AS frame_index FROM r
"""
    # perceptual-hash near-dup: pixels, the 2-pixel twin perturbation, the
    # aHash fold and the Hamming join all recomputed from hash_str(media_ref)
    def _px(i: int) -> str:
        base = f"CAST((h >> {8 * (i % 8)}) & 255 AS BIGINT)"
        return (
            f"CASE WHEN twin AND ({i} = CAST(h % 64 AS BIGINT) "
            f"OR {i} = CAST((h >> 6) % 64 AS BIGINT)) "
            f"THEN 255 - {base} ELSE {base} END AS p{i}"
        )

    px_cols = ",\n    ".join(_px(i) for i in range(64))
    px_sum = " + ".join(f"p{i}" for i in range(64))
    sig_fold = " + ".join(
        f"CASE WHEN 64 * p{i} >= s THEN CAST({1 << i} AS UBIGINT) "
        "ELSE CAST(0 AS UBIGINT) END"
        for i in range(64)
    )
    def hamming_sql(kind: str) -> str:
        return f"""
WITH r AS (SELECT media_ref, {h} AS h FROM read_parquet('{reg}') WHERE kind = '{kind}'),
v AS (
  SELECT media_ref, h, FALSE AS twin FROM r
  UNION ALL
  SELECT media_ref || '~d', h, TRUE FROM r WHERE h % 2 = 0
),
px AS (SELECT media_ref,
    {px_cols}
  FROM v),
ps AS (SELECT *, ({px_sum}) AS s FROM px),
sg AS (SELECT media_ref, ({sig_fold}) AS sig FROM ps)
SELECT a.media_ref AS ref_a, b.media_ref AS ref_b
FROM sg a JOIN sg b ON a.media_ref < b.media_ref
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""

    # scene cuts: frame byte stream = (8 hash bytes tiled to body length
    # L) tiled to nf*fb — byte at stream pos p is hash byte ((p % L) % 8);
    # per-frame signature sums the first 16 bytes, a cut is |delta| > T
    from ..stages.multimodal import SCENE_CUT_THRESHOLD, SCENE_SIG_BYTES

    scene = f"""
WITH r AS (SELECT media_ref, {h} AS h FROM read_parquet('{reg}')
           WHERE kind NOT IN ('image', 'audio')),
p AS (SELECT media_ref, h,
        CAST(1 + h % 64 AS BIGINT) AS nf,
        CAST(16 + (h >> 6) % 240 AS BIGINT) AS fb,
        CAST(64 + h % 4096 AS BIGINT) AS L
      FROM r),
fi AS (SELECT media_ref, h, fb, L, nf, unnest(range(0, nf)) AS i FROM p),
fj AS (SELECT media_ref, h, fb, L, nf, i,
              unnest(range(0, {SCENE_SIG_BYTES})) AS j FROM fi),
sig AS (SELECT media_ref, nf, i,
          sum(CAST((h >> CAST(8 * (((i * fb + j) % L) % 8) AS BIGINT))
                   & 255 AS BIGINT)) AS s
        FROM fj GROUP BY media_ref, nf, i),
d AS (SELECT media_ref, nf, s,
        lag(s) OVER (PARTITION BY media_ref ORDER BY i) AS prev
      FROM sig)
SELECT media_ref, max(nf)::BIGINT AS n_frames,
  coalesce(sum(CASE WHEN abs(s - prev) > {SCENE_CUT_THRESHOLD}
               THEN 1 ELSE 0 END), 0)::BIGINT AS n_cuts
FROM d GROUP BY media_ref
"""
    return {"m_image_meta": img, "m_audio_meta": aud, "m_frame_sample": vid,
            "m_scene_cuts": scene,
            "m_phash_dups": hamming_sql("image"),
            "m_audio_dups": hamming_sql("audio")}


def _inlist(ws) -> str:
    return ", ".join(f"'{w}'" for w in ws)


def _stop_cnt() -> str:
    return (
        "len(list_filter(string_split(text, ' '), "
        f"w -> w IN ({_inlist(STOPWORDS)})))"
    )


TEXT_FEATURES_SQL = f"""
SELECT doc_id,
  len(string_split(text, ' '))::BIGINT AS n_ws_tokens,
  len(regexp_extract_all(text, '{BPE_TOKEN_RE}'))::BIGINT AS n_bpe_tokens,
  length(text)::BIGINT AS n_chars,
  len(regexp_extract_all(text, '{PUNCT_RE}'))::BIGINT AS n_punct,
  {_stop_cnt()}::BIGINT AS n_stop,
  (len(string_split(text,' ')) >= 5
   AND {_stop_cnt()}*10 >= len(string_split(text,' '))
   AND len(regexp_extract_all(text, '{PUNCT_RE}'))*5 <= len(string_split(text,' '))) AS quality_ok
FROM documents
"""

_LANGS = list(LANG_MARKERS)
LANGUAGE_ID_SQL = (
    "WITH s AS (SELECT doc_id, "
    + ", ".join(
        f"len(list_filter(string_split(text, ' '), w -> w IN ({_inlist(LANG_MARKERS[l])}))) AS s_{l}"
        for l in _LANGS
    )
    + " FROM documents),\n"
    + "m AS (SELECT *, greatest("
    + ", ".join("s_" + l for l in _LANGS)
    + ") AS m FROM s)\n"
    + "SELECT doc_id, CASE WHEN m = 0 THEN 'und' "
    + " ".join(f"WHEN s_{l} = m THEN '{l}'" for l in _LANGS)
    + " END AS pred_lang, m::BIGINT AS score FROM m"
)

LANG_CONFUSION_SQL = (
    "WITH s AS (SELECT lang, "
    + ", ".join(
        f"len(list_filter(string_split(text, ' '), w -> w IN ({_inlist(LANG_MARKERS[l])}))) AS s_{l}"
        for l in _LANGS
    )
    + " FROM documents),\n"
    + "m AS (SELECT *, greatest("
    + ", ".join("s_" + l for l in _LANGS)
    + ") AS m FROM s)\n"
    + "SELECT lang, CASE WHEN m = 0 THEN 'und' "
    + " ".join(f"WHEN s_{l} = m THEN '{l}'" for l in _LANGS)
    + " END AS pred_lang, count(*)::BIGINT AS n FROM m GROUP BY 1, 2"
)


def q_lang_confusion(sf_dir: str):
    """Declared-vs-detected language confusion counts
    (``textops.lang_confusion``) — the label-quality audit."""
    import ray.data as rd

    from ..stages.textops import lang_confusion

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])
    return lang_confusion(docs)


EXACT_DEDUP_SQL = """
SELECT doc_id FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""

_NGRAM_CTES = f"""s AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) sh
  FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)
),
e AS (SELECT doc_id, unnest(sh) shingle FROM s),
p AS (SELECT a.doc_id da, b.doc_id db, count(*) inter
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1,2),
z AS (SELECT doc_id, len(sh) ns FROM s),
edges AS (SELECT da AS doc_a, db AS doc_b FROM p
JOIN z za ON za.doc_id = da JOIN z zb ON zb.doc_id = db
WHERE inter::DOUBLE / (za.ns + zb.ns - inter) >= {JACCARD_THRESHOLD})"""

NGRAM_JACCARD_SQL = f"WITH {_NGRAM_CTES}\nSELECT doc_a, doc_b FROM edges"


def q_pagerank(sf_dir: str):
    """Fixed-round integer PageRank over the near-dup pair graph
    (``dedup.pagerank_dup``) — centrality for canonical selection."""
    from ..stages.dedup import pagerank_dup

    return pagerank_dup(_docs(sf_dir), iters=3, n=JACCARD_N,
                        threshold=JACCARD_THRESHOLD)


def _pagerank_sql() -> str:
    """pagerank_dup mirror: same half-edge table, degree fold and
    integer-exact rounds — contribution (85*p)//(100*deg), new score
    PR_BASE + sum; graph nodes only."""
    from ..stages.dedup import PR_BASE, PR_SCALE

    iters = 3
    ctes = [_NGRAM_CTES]
    ctes.append("he AS (SELECT doc_a AS src, doc_b AS dst FROM edges "
                "UNION ALL SELECT doc_b, doc_a FROM edges)")
    ctes.append("nd AS (SELECT src AS node, count(*)::BIGINT AS deg "
                "FROM he GROUP BY 1)")
    ctes.append(f"pr0 AS (SELECT node, deg, {PR_SCALE}::BIGINT AS p FROM nd)")
    for t in range(1, iters + 1):
        ctes.append(
            f"c{t} AS (SELECT he.dst AS node, "
            f"sum((85 * p.p) // (100 * p.deg))::BIGINT AS c "
            f"FROM he JOIN pr{t - 1} p ON p.node = he.src GROUP BY 1)")
        ctes.append(
            f"pr{t} AS (SELECT n.node, n.deg, "
            f"({PR_BASE} + coalesce(c.c, 0))::BIGINT AS p "
            f"FROM nd n LEFT JOIN c{t} c USING (node))")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS doc_id, p AS rank FROM pr{iters}")


KCORE_ITERS = 3


def q_kcore(sf_dir: str):
    """Fixed-round h-index iteration toward k-core coreness over the
    near-dup pair graph (``dedup.kcore_dup``) — the template-cluster
    density audit (dense boilerplate cores vs isolated pairs/hubs)."""
    from ..stages.dedup import kcore_dup

    return kcore_dup(_docs(sf_dir), iters=KCORE_ITERS, n=JACCARD_N,
                     threshold=JACCARD_THRESHOLD)


def _kcore_sql() -> str:
    """kcore_dup mirror: same half-edge table; k0 = degree; per round the
    h-index over neighbor values via the expanded row_number formula
    h = max(least(v, rn)) with v descending — bitwise-equal to the engine's
    value-count run fold whether or not the fixpoint is reached."""
    ctes = [_NGRAM_CTES]
    ctes.append("he AS (SELECT doc_a AS src, doc_b AS dst FROM edges "
                "UNION ALL SELECT doc_b, doc_a FROM edges)")
    ctes.append("k0 AS (SELECT src AS node, count(*)::BIGINT AS c "
                "FROM he GROUP BY 1)")
    for t in range(1, KCORE_ITERS + 1):
        ctes.append(
            f"nb{t} AS (SELECT he.dst AS node, k.c AS v, "
            f"row_number() OVER (PARTITION BY he.dst ORDER BY k.c DESC) "
            f"AS rn FROM he JOIN k{t - 1} k ON k.node = he.src)")
        ctes.append(
            f"k{t} AS (SELECT node, max(least(v, rn))::BIGINT AS c "
            f"FROM nb{t} GROUP BY 1)")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS doc_id, c AS core FROM k{KCORE_ITERS}")


def q_lpa(sf_dir: str):
    """Deterministic majority-vote label-propagation communities over the
    near-dup pair graph (``dedup.lpa_dup``) — keeps weakly-bridged
    template families apart where min-label CC merges them."""
    from ..stages.dedup import lpa_dup

    return lpa_dup(_docs(sf_dir), n=JACCARD_N,
                   threshold=JACCARD_THRESHOLD)


def _lpa_sql() -> str:
    """lpa_dup mirror: same half-edge table; l0 = own id; per round,
    neighbor-label counts then argmax via row_number (c DESC, lbl ASC) —
    bitwise-equal to the engine's synchronous majority rounds."""
    from ..stages.dedup import LPA_ITERS

    ctes = [_NGRAM_CTES]
    ctes.append("he AS (SELECT doc_a AS src, doc_b AS dst FROM edges "
                "UNION ALL SELECT doc_b, doc_a FROM edges)")
    ctes.append("l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM he)")
    for t in range(1, LPA_ITERS + 1):
        ctes.append(
            f"c{t} AS (SELECT he.dst AS node, l.lbl AS lbl, "
            f"count(*)::BIGINT AS c "
            f"FROM he JOIN l{t - 1} l ON l.node = he.src GROUP BY 1, 2)")
        ctes.append(
            f"r{t} AS (SELECT node, lbl, row_number() OVER "
            f"(PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn "
            f"FROM c{t})")
        ctes.append(f"l{t} AS (SELECT node, lbl FROM r{t} WHERE rn = 1)")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node AS doc_id, lbl AS label FROM l{LPA_ITERS}")


CONTAINMENT_THRESHOLD = 0.9


def q_containment(sf_dir: str):
    """Asymmetric containment pairs (inter/min >= 0.9): catches a short doc
    quoted/truncated inside a long one where size disparity drives Jaccard
    to zero (``dedup.containment_pairs``)."""
    from ..stages.dedup import containment_pairs

    return containment_pairs(_docs(sf_dir), n=JACCARD_N,
                             threshold=CONTAINMENT_THRESHOLD)


CONTAINMENT_SQL = f"""
WITH s AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) sh
  FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)
),
e AS (SELECT doc_id, unnest(sh) shingle FROM s),
p AS (SELECT a.doc_id da, b.doc_id db, count(*) inter
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1,2),
z AS (SELECT doc_id, len(sh) ns FROM s)
SELECT da AS doc_a, db AS doc_b FROM p
JOIN z za ON za.doc_id = da JOIN z zb ON zb.doc_id = db
WHERE inter::DOUBLE / least(za.ns, zb.ns) >= {CONTAINMENT_THRESHOLD}
"""


def q_dup_degree(sf_dir: str):
    """Degree distribution of the near-dup pair graph
    (``dedup.dup_degree_histogram``), degree-0 docs included."""
    from ..stages.dedup import dup_degree_histogram

    return dup_degree_histogram(_docs(sf_dir), n=JACCARD_N,
                                threshold=JACCARD_THRESHOLD)


DUP_DEGREE_SQL = f"""
WITH {_NGRAM_CTES},
deg AS (SELECT node, count(*)::BIGINT AS d
        FROM (SELECT doc_a AS node FROM edges
              UNION ALL SELECT doc_b FROM edges) GROUP BY node),
alld AS (SELECT d.doc_id, coalesce(g.d, 0)::BIGINT AS d
         FROM documents d LEFT JOIN deg g ON d.doc_id = g.node)
SELECT d AS degree, count(*)::BIGINT AS n_docs FROM alld GROUP BY 1
"""


def _split_leakage_sql() -> str:
    """q_split_leakage mirror: the jaccard edges joined to the split-band
    CASE on both endpoints, counted by the unordered (least, greatest)
    split pair."""
    from ..stages.sampling import SAMPLE_MOD, SPLIT_BANDS

    cuts = np.cumsum([r for _, r in SPLIT_BANDS])
    c0 = int(round(cuts[0] * SAMPLE_MOD))
    c1 = int(round(cuts[1] * SAMPLE_MOD))
    h = ("CAST(" + _fnv_sql("CAST(doc_id AS VARCHAR)")
         + f" % {SAMPLE_MOD} AS BIGINT)")
    return f"""
WITH {_NGRAM_CTES},
bands AS (SELECT doc_id, CASE WHEN {h} < {c0} THEN 'train'
                              WHEN {h} < {c1} THEN 'val' ELSE 'test' END
                 AS split FROM documents)
SELECT least(ba.split, bb.split) AS split_a,
       greatest(ba.split, bb.split) AS split_b,
       count(*)::BIGINT AS n_pairs
FROM edges JOIN bands ba ON edges.doc_a = ba.doc_id
           JOIN bands bb ON edges.doc_b = bb.doc_id
GROUP BY 1, 2
"""

# connected components over the near-dup pair graph: recursive min-label walk
# (each node reaches every root of its component; min(root) = cluster id)
DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_NGRAM_CTES},
nodes AS (SELECT doc_a AS node FROM edges UNION SELECT doc_b FROM edges),
walk(node, root) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT CASE WHEN w.node = edges.doc_a THEN edges.doc_b ELSE edges.doc_a END,
         w.root
  FROM walk w, edges WHERE w.node = edges.doc_a OR w.node = edges.doc_b
)
SELECT node AS doc_id, min(root) AS cluster FROM walk GROUP BY node
"""

CLUSTER_SIZES_SQL = f"""
WITH RECURSIVE {_NGRAM_CTES},
nodes AS (SELECT doc_a AS node FROM edges UNION SELECT doc_b FROM edges),
walk(node, root) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT CASE WHEN w.node = edges.doc_a THEN edges.doc_b ELSE edges.doc_a END,
         w.root
  FROM walk w, edges WHERE w.node = edges.doc_a OR w.node = edges.doc_b
),
comp AS (SELECT node, min(root) AS cluster FROM walk GROUP BY node),
sz AS (SELECT cluster, count(*)::BIGINT AS size FROM comp GROUP BY cluster)
SELECT size, count(*)::BIGINT AS n_clusters FROM sz GROUP BY size
"""

EMBED_DEDUP_SQL = f"""
WITH RECURSIVE
v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) e FROM embeddings),
edges AS (
  SELECT a.vec_id doc_a, b.vec_id doc_b FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.e, b.e)
        / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
        >= {COSINE_PAIR_THRESHOLD}),
nodes AS (SELECT doc_a AS node FROM edges UNION SELECT doc_b FROM edges),
walk(node, root) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT CASE WHEN w.node = edges.doc_a THEN edges.doc_b ELSE edges.doc_a END,
         w.root
  FROM walk w, edges WHERE w.node = edges.doc_a OR w.node = edges.doc_b
),
comp AS (SELECT node, min(root) AS cluster FROM walk GROUP BY node)
SELECT e.vec_id FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.node
WHERE c.node IS NULL OR c.cluster = e.vec_id
"""


COSINE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id qid, list_transform(embedding, x -> x::DOUBLE) qe FROM embeddings
  WHERE vec_id IN ({", ".join(map(str, ANN_QUERY_IDS))})),
v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) e FROM embeddings),
s AS (SELECT qid, vec_id,
        list_dot_product(qe, e) / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))) sim
      FROM q, v)
SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)::BIGINT AS rank
FROM s QUALIFY rank <= {ANN_K}
"""

EMBED_DECON_SQL = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) e,
  CAST({_fnv_sql("CAST(vec_id AS VARCHAR)")} % 16 AS BIGINT) = 0 AS is_bench
  FROM embeddings),
c AS (SELECT vec_id, e FROM v WHERE NOT is_bench),
b AS (SELECT vec_id, e FROM v WHERE is_bench)
SELECT c.vec_id, count(*)::BIGINT AS n_matches
FROM c JOIN b ON list_dot_product(c.e, b.e)
  / (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(b.e, b.e)))
  >= {EMBED_DECON_THRESHOLD}
GROUP BY c.vec_id
"""

COSINE_PAIRS_SQL = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) e FROM embeddings)
SELECT a.vec_id doc_a, b.vec_id doc_b FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
      >= {COSINE_PAIR_THRESHOLD}
"""


# flagship curation keep-list: the same four membership rules as
# pipelines/curation.py, chained with set operators
def _curation_sql() -> str:
    ws = "len(string_split(text, ' '))"
    quality = (
        f"({ws} >= 5 AND {_stop_cnt()}*10 >= {ws} "
        f"AND len(regexp_extract_all(text, '{PUNCT_RE}'))*5 <= {ws})"
    )
    return f"""
WITH RECURSIVE {_NGRAM_CTES},
nodes AS (SELECT doc_a AS node FROM edges UNION SELECT doc_b FROM edges),
walk(node, root) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT CASE WHEN w.node = edges.doc_a THEN edges.doc_b ELSE edges.doc_a END,
         w.root
  FROM walk w, edges WHERE w.node = edges.doc_a OR w.node = edges.doc_b
),
cc AS (SELECT node AS doc_id, min(root) AS cluster FROM walk GROUP BY node),
drops AS (SELECT doc_id FROM cc WHERE doc_id <> cluster),
kept_exact AS (SELECT doc_id FROM documents
               QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1),
quality AS (SELECT doc_id FROM documents WHERE {quality}),
sampled AS (SELECT doc_id FROM documents
            WHERE {_SAMPLE_H} < {int(CURATION_SAMPLE_RATE * 1_000_000)})
(SELECT doc_id FROM kept_exact
 INTERSECT SELECT doc_id FROM quality
 INTERSECT SELECT doc_id FROM sampled)
EXCEPT SELECT doc_id FROM drops
"""


def _curation_clf_sql() -> str:
    """q_curation_clf mirror: the composed keep-list (as a derived table
    with its own recursive CTEs) intersected with the classifier gate."""
    from ..stages.textops import QS_DIM, QS_MIX

    return f"""
WITH qsw AS (SELECT doc_id,
    CAST((({_fnv_sql('word')} % {QS_DIM}) * {QS_MIX}) % 41 AS BIGINT) - 20 AS wt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''),
qss AS (SELECT doc_id, sum(wt)::BIGINT AS q FROM qsw GROUP BY doc_id),
clf AS (SELECT d.doc_id FROM documents d LEFT JOIN qss USING (doc_id)
        WHERE coalesce(qss.q, 0) >= 0)
SELECT doc_id FROM ({_curation_sql()})
INTERSECT SELECT doc_id FROM clf
"""


# repetition_stats mirror: zipped unnest keeps word order (pos), rpos is the
# post-''-filter position so bigram adjacency matches the kernel's filtered
# sequence; LEFT JOINs restore all-zero rows for wordless docs.
REPETITION_SQL = """
WITH wl AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
wp AS (SELECT doc_id, unnest(l) AS w, unnest(range(1, len(l) + 1)) AS pos FROM wl),
words AS (SELECT doc_id, w,
                 row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rpos
          FROM wp WHERE w <> ''),
wc AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM words GROUP BY 1, 2),
ws AS (SELECT doc_id, sum(c)::BIGINT AS n_words,
              count(*)::BIGINT AS n_distinct_words,
              max(c)::BIGINT AS top_word_n FROM wc GROUP BY 1),
bc AS (SELECT a.doc_id, a.w AS w1, b.w AS w2, count(*)::BIGINT AS c
       FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.rpos = a.rpos + 1
       GROUP BY 1, 2, 3),
bs AS (SELECT doc_id, sum(c)::BIGINT AS n_bigrams,
              count(*)::BIGINT AS n_distinct_bigrams,
              max(c)::BIGINT AS top_bigram_n FROM bc GROUP BY 1)
SELECT d.doc_id,
  coalesce(ws.n_words, 0) AS n_words,
  coalesce(ws.n_distinct_words, 0) AS n_distinct_words,
  coalesce(ws.top_word_n, 0) AS top_word_n,
  coalesce(bs.n_bigrams, 0) AS n_bigrams,
  coalesce(bs.n_distinct_bigrams, 0) AS n_distinct_bigrams,
  coalesce(bs.top_bigram_n, 0) AS top_bigram_n,
  (coalesce(ws.top_word_n, 0) * 5 > coalesce(ws.n_words, 0)
   OR coalesce(bs.n_distinct_bigrams, 0) * 10 < coalesce(bs.n_bigrams, 0) * 9)
  AS repetitive
FROM documents d
LEFT JOIN ws ON d.doc_id = ws.doc_id
LEFT JOIN bs ON d.doc_id = bs.doc_id
"""


# mixture_quota mirror: same token count, floor allocation via integer //,
# largest-remainder bonus ranked (rem DESC, source, lang). CASE guards the
# all-empty-corpus tot=0 division (kernel emits quota 0 there too).
def _mixture_sql() -> str:
    from ..stages.textops import mixture_quota  # noqa: F401  (budget default)

    b = 1_000_000
    return f"""
WITH g AS (
  SELECT source, lang, count(*)::BIGINT AS n_docs,
         -- coalesce: all-NULL-text groups count 0 tokens (ADVICE r4)
         coalesce(sum(len(list_filter(string_split(text, ' '),
                                      w -> w <> ''))), 0)::BIGINT
         AS n_tokens
  FROM documents GROUP BY 1, 2),
t AS (SELECT *, sum(n_tokens) OVER () AS tot FROM g),
f AS (SELECT *, ({b} * n_tokens) // nullif(tot, 0) AS fl,
             ({b} * n_tokens) % nullif(tot, 0) AS rem
      FROM t),
a AS (SELECT *, sum(fl) OVER () AS fl_sum,
             row_number() OVER (ORDER BY rem DESC, source, lang) AS rr
      FROM f)
SELECT source, lang, n_docs, n_tokens,
  CASE WHEN tot = 0 THEN 0
       ELSE fl + CASE WHEN rr <= {b} - fl_sum THEN 1 ELSE 0 END
  END::BIGINT AS quota
FROM a
"""


def q_temperature_mix(sf_dir: str):
    """Temperature-scaled (α = 0.5) mixture quotas: weight = isqrt of
    group tokens, largest-remainder allocation — the rebalancing sampler
    table (``textops.temperature_mix``)."""
    import ray.data as rd

    from ..stages.textops import temperature_mix

    return temperature_mix(rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source", "lang"]))


def _temperature_mix_sql() -> str:
    b = 1_000_000
    return f"""
WITH g AS (
  SELECT source, lang, count(*)::BIGINT AS n_docs,
         -- coalesce: an all-NULL-text group must count 0 tokens like the
         -- engine's partial fold, not NULL (ADVICE r4)
         coalesce(sum(len(list_filter(string_split(text, ' '),
                                      w -> w <> ''))), 0)::BIGINT
         AS n_tokens
  FROM documents GROUP BY 1, 2),
w0 AS (SELECT *, CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT) AS s0 FROM g),
w AS (SELECT source, lang, n_docs, n_tokens,
             (s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= n_tokens
                    THEN 1 ELSE 0 END)
                 - (CASE WHEN s0 * s0 > n_tokens THEN 1 ELSE 0 END))::BIGINT
             AS weight
      FROM w0),
t AS (SELECT *, sum(weight) OVER () AS tot FROM w),
f AS (SELECT *, ({b} * weight) // nullif(tot, 0) AS fl,
             ({b} * weight) % nullif(tot, 0) AS rem
      FROM t),
a AS (SELECT *, sum(fl) OVER () AS fl_sum,
             row_number() OVER (ORDER BY rem DESC, source, lang) AS rr
      FROM f)
SELECT source, lang, n_docs, n_tokens, weight,
  CASE WHEN tot = 0 THEN 0
       ELSE fl + CASE WHEN rr <= {b} - fl_sum THEN 1 ELSE 0 END
  END::BIGINT AS quota
FROM a
"""


def q_source_card(sf_dir: str):
    """Per-SOURCE corpus profile — the mixture-overview table next to the
    one-row corpus card: docs, whitespace tokens, chars, distinct langs
    per source. One streaming pass of per-batch pre-aggregated (source,
    …) partials — rows per batch bounded by sources×langs — folded in a
    tiny source groupby."""
    import pyarrow as pa
    import ray.data as rd

    from ..stages.textops import _word_lists

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text", "lang", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        _, wcounts, _ = _word_lists(texts)
        src = np.asarray(t["source"]).astype("U")
        lv = t["lang"]
        if isinstance(lv, pa.ChunkedArray):
            lv = lv.combine_chunks()
        nch = np.asarray(t["n_chars"]).astype(np.int64)
        us, si = np.unique(src, return_inverse=True)
        n_docs = np.bincount(si, minlength=len(us)).astype(np.int64)
        n_tok = np.zeros(len(us), dtype=np.int64)
        np.add.at(n_tok, si, wcounts)
        n_chars = np.zeros(len(us), dtype=np.int64)
        np.add.at(n_chars, si, nch)
        # per-(source, lang) presence rows so the fold can count distinct
        # NON-NULL langs (SQL count(DISTINCT lang) skips NULLs but keeps
        # ''); integer pair encoding — no separator-collision surface
        lnp = lv.to_numpy(zero_copy_only=False)
        valid = np.array([x is not None for x in lnp], dtype=bool)
        if valid.any():
            ul, li = np.unique(lnp[valid].astype("U"), return_inverse=True)
            pair = np.unique(si[valid].astype(np.int64) * len(ul) + li)
            p_src = us[(pair // len(ul))]
            p_lang = ul[(pair % len(ul))]
        else:
            p_src = np.empty(0, dtype=src.dtype)
            p_lang = np.empty(0, dtype="U1")
        nz = np.zeros(len(p_src), dtype=np.int64)
        return pa.concat_tables([
            pa.table({
                "source": pa.array(us),
                "lang": pa.array([""] * len(us), type=pa.string()),
                "role": pa.array(np.zeros(len(us), dtype=np.int64)),
                "n_docs": pa.array(n_docs), "n_tokens": pa.array(n_tok),
                "n_chars": pa.array(n_chars),
            }),
            pa.table({
                "source": pa.array(p_src),
                "lang": pa.array(p_lang),
                "role": pa.array(np.ones(len(p_src), dtype=np.int64)),
                "n_docs": pa.array(nz), "n_tokens": pa.array(nz),
                "n_chars": pa.array(nz),
            }),
        ])

    def fold(g: pa.Table) -> pa.Table:
        src = str(g["source"][0].as_py())
        role = np.asarray(g["role"], dtype=np.int64)
        lang = np.asarray(g["lang"]).astype("U")
        langs = np.unique(lang[role == 1])
        return pa.table({
            "source": pa.array([src]),
            "n_docs": pa.array([int(np.asarray(g["n_docs"]).sum())],
                               pa.int64()),
            "n_tokens": pa.array([int(np.asarray(g["n_tokens"]).sum())],
                                 pa.int64()),
            "n_chars": pa.array([int(np.asarray(g["n_chars"]).sum())],
                                pa.int64()),
            "n_langs": pa.array([len(langs)], pa.int64()),
        })

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("source").map_groups(fold, batch_format="pyarrow"))


SOURCE_CARD_SQL = """
SELECT source, count(*)::BIGINT AS n_docs,
       sum(len(list_filter(string_split(text, ' '),
                           x -> x <> '')))::BIGINT AS n_tokens,
       sum(n_chars)::BIGINT AS n_chars,
       count(DISTINCT lang)::BIGINT AS n_langs
FROM documents GROUP BY source
"""


def q_corpus_card(sf_dir: str):
    """One-row corpus card — the at-a-glance report a dataset release
    ships: doc/token totals, distinct languages/sources (low-cardinality
    exact sets folded from per-batch uniques), and the exact distinct-text
    count (the string-verified ``exact_dedup`` survivor count, no hash
    collisions). Two streaming passes, driver state O(langs + sources)."""
    import pyarrow as pa
    import ray.data as rd

    from ..functions.collect import collect_table
    from ..stages.dedup import exact_dedup
    from ..stages.textops import _word_lists

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        _, counts, _ = _word_lists(texts)
        # list columns, not '|'-joined strings: NULLs are skipped (as SQL
        # count(DISTINCT ...) does), '' stays a countable value, and no
        # separator can collide with data
        langs = sorted({x for x in t["lang"].to_pylist() if x is not None})
        srcs = sorted({x for x in t["source"].to_pylist() if x is not None})
        return pa.table({
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "n_tokens": pa.array([int(counts.sum())], pa.int64()),
            "langs": pa.array([langs], pa.list_(pa.string())),
            "sources": pa.array([srcs], pa.list_(pa.string())),
        })

    def fold(t: pa.Table):
        ls = set()
        ss = set()
        for v in t["langs"].to_pylist():
            ls.update(v)
        for v in t["sources"].to_pylist():
            ss.update(v)
        return (int(np.asarray(t["n_docs"]).sum()),
                int(np.asarray(t["n_tokens"]).sum()), ls, ss)

    def combine(t: pa.Table) -> pa.Table:
        nd, nt, ls, ss = fold(t)
        return pa.table({
            "n_docs": pa.array([nd], pa.int64()),
            "n_tokens": pa.array([nt], pa.int64()),
            "langs": pa.array([sorted(ls)], pa.list_(pa.string())),
            "sources": pa.array([sorted(ss)], pa.list_(pa.string())),
        })

    parts = collect_table(
        docs.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64))
    nd, nt, ls, ss = fold(parts)
    uniq = exact_dedup(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])).count()
    return pa.table({
        "n_docs": pa.array([nd], pa.int64()),
        "n_tokens": pa.array([nt], pa.int64()),
        "n_langs": pa.array([len(ls)], pa.int64()),
        "n_sources": pa.array([len(ss)], pa.int64()),
        "n_unique_texts": pa.array([uniq], pa.int64()),
    })


CORPUS_CARD_SQL = """
SELECT count(*)::BIGINT AS n_docs,
  coalesce(sum(len(list_filter(string_split(text, ' '), w -> w <> ''))),
           0)::BIGINT AS n_tokens,
  count(DISTINCT lang)::BIGINT AS n_langs,
  count(DISTINCT source)::BIGINT AS n_sources,
  count(DISTINCT text)::BIGINT AS n_unique_texts
FROM documents
"""


def q_mixture_upsample(sf_dir: str):
    """Domain-mixture upsampling: explicit (doc_id, copy_id) replication
    table from the largest-remainder quotas
    (``textops.mixture_upsample``)."""
    import ray.data as rd

    from ..stages.textops import mixture_upsample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source", "lang"])
    return mixture_upsample(docs)


def _mixture_upsample_sql() -> str:
    """mixture_upsample mirror: the _mixture_sql quota chain joined back to
    docs; per doc k = quota // n_tokens + (FNV(doc_id) % n_tokens <
    quota % n_tokens), rows unnested 0..k-1."""
    fnv = _fnv_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH q AS ({_mixture_sql()}),
j AS (SELECT d.doc_id,
             q.quota // q.n_tokens AS r,
             CASE WHEN {fnv} % CAST(q.n_tokens AS UBIGINT)
                       < CAST(q.quota % q.n_tokens AS UBIGINT)
                  THEN 1 ELSE 0 END AS extra
      FROM documents d JOIN q USING (source, lang)
      WHERE q.n_tokens > 0),
reps AS (SELECT doc_id, (r + extra)::BIGINT AS k FROM j WHERE r + extra > 0)
SELECT doc_id, unnest(range(k))::BIGINT AS copy_id FROM reps
"""


def _tfidf_sql() -> str:
    from ..stages.textops import TFIDF_SCALE

    return f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
words AS (SELECT doc_id, term FROM w WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM words GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM words GROUP BY 1),
s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
             (tf.tf * {TFIDF_SCALE}) // df.df AS score,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY (tf.tf * {TFIDF_SCALE}) // df.df DESC,
                                         tf.term) AS rk
      FROM tf JOIN df USING (term))
SELECT doc_id, term, tf, df, score FROM s WHERE rk = 1
"""


def _shuffle_sql() -> str:
    """shuffle_assign mirror: same FNV over str(doc_id), shard = h % n,
    pos = rank within shard by (h, doc_id)."""
    from ..stages.packing import SHUFFLE_SHARDS

    fnv = _fnv_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH h AS (SELECT doc_id, {fnv} AS h FROM documents)
SELECT doc_id, (h % {SHUFFLE_SHARDS})::BIGINT AS shard,
  (row_number() OVER (PARTITION BY h % {SHUFFLE_SHARDS}
                      ORDER BY h, doc_id) - 1)::BIGINT AS pos
FROM h
"""


def _oov_sql() -> str:
    """oov_rate mirror: same tokenization, df over distinct docs, rare-mass
    sums per doc (docs with >=1 word only, matching the kernel)."""
    min_df = 2
    return f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
words AS (SELECT doc_id, term FROM w WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM words GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM words GROUP BY 1)
SELECT tf.doc_id,
  sum(tf.tf)::BIGINT AS n_words,
  sum(CASE WHEN df.df < {min_df} THEN tf.tf ELSE 0 END)::BIGINT AS n_oov,
  (sum(CASE WHEN df.df < {min_df} THEN tf.tf ELSE 0 END) * 5 <= sum(tf.tf))
  AS low_oov
FROM tf JOIN df USING (term) GROUP BY 1
"""


def _pack_sql() -> str:
    """pack_sequences mirror: same non-empty-word token count, same
    doc_id//shard_docs sharding, window cumsum = the shard-local prefix sum
    the pack_shard group kernel computes."""
    from ..stages.packing import PACK_BUDGET, PACK_SHARD_DOCS

    off = ("coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)")
    return f"""
WITH tok AS (
  SELECT doc_id, doc_id // {PACK_SHARD_DOCS} AS shard,
         len(list_filter(string_split(text, ' '), w -> w <> ''))::BIGINT
         AS n_tokens
  FROM documents)
SELECT doc_id, shard::BIGINT AS shard, n_tokens,
  {off}::BIGINT AS tok_offset,
  ({off} // {PACK_BUDGET})::BIGINT AS seq_in_shard
FROM tok
"""


TOP_WORDS_SQL = f"""
SELECT word, n, rank FROM (
  SELECT word, count(*)::BIGINT AS n,
         ROW_NUMBER() OVER (ORDER BY count(*) DESC, word)::BIGINT AS rank
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word)
WHERE rank <= {TOP_WORDS_K}
"""


# badword_filter mirror: same whole-word split, list_filter membership count
_BADWORD_SET = ", ".join(f"'{w}'" for w in BADWORDS)
BADWORDS_SQL = f"""
SELECT doc_id,
       len(list_filter(string_split(text, ' '),
                       w -> w IN ({_BADWORD_SET})))::BIGINT AS hits,
       len(list_filter(string_split(text, ' '),
                       w -> w IN ({_BADWORD_SET}))) <= {BADWORD_MAX_HITS} AS keep
FROM documents
"""


def _chunks_sql() -> str:
    """chunk_documents mirror: same kept-word split, chunk starts every
    STRIDE words (DuckDB range is stop-exclusive, like numpy), 1-based
    end-inclusive list slice = words[start : start+SIZE]."""
    from ..stages.textops import CHUNK_SIZE, CHUNK_STRIDE

    return f"""
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
                  AS ws FROM documents),
c AS (SELECT doc_id, ws, unnest(range(0, len(ws), {CHUNK_STRIDE})) AS st FROM w)
SELECT doc_id, (st // {CHUNK_STRIDE})::BIGINT AS chunk_id,
       least({CHUNK_SIZE}, len(ws) - st)::BIGINT AS n_words,
       array_to_string(ws[st + 1 : st + {CHUNK_SIZE}], ' ') AS chunk_text
FROM c
"""


def _normalize_sql() -> str:
    """normalize_text mirror over the same deterministically-dirtied input
    (even doc_ids: chr(1) + ' ' + upper(text) + ' '); two-valued changed
    flag via coalesce(..., FALSE)."""
    return """
WITH d2 AS (SELECT doc_id,
  CASE WHEN doc_id % 2 = 0 THEN chr(1) || ' ' || upper(text) || ' '
       ELSE text END AS text FROM documents),
n AS (SELECT doc_id, text,
  trim(regexp_replace(
    regexp_replace(lower(text), '[\\x00-\\x1f\\x7f]', '', 'g'),
    ' +', ' ', 'g'), ' ') AS norm_text FROM d2)
SELECT doc_id, norm_text, coalesce(norm_text <> text, FALSE) AS changed
FROM n
"""


def _seg_dedup_sql() -> str:
    """segment_dedup mirror: banner injected for doc_id % 3 == 0, 8-word
    non-overlapping segments, frequent = appearing in >= 2 distinct docs,
    cleaned text = ordered string_agg of surviving segments."""
    from ..stages.dedup import SEG_WORDS

    sw = SEG_WORDS
    return f"""
WITH d2 AS (SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN '{SEG_BANNER}' || ' ' || text
       ELSE text END AS text FROM documents),
w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
             AS ws FROM d2),
s AS (SELECT doc_id, st // {sw} AS seg_id,
             array_to_string(ws[st + 1 : st + {sw}], ' ') AS seg
      FROM (SELECT doc_id, ws, unnest(range(0, len(ws), {sw})) AS st FROM w)),
freq AS (SELECT seg FROM (SELECT seg, count(DISTINCT doc_id) AS nd
                          FROM s GROUP BY seg) WHERE nd >= 2),
s2 AS (SELECT s.doc_id, s.seg_id, s.seg, (f.seg IS NOT NULL) AS dropped
       FROM s LEFT JOIN freq f ON s.seg = f.seg),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_segs,
               coalesce(sum(CASE WHEN dropped THEN 1 ELSE 0 END), 0)::BIGINT
                 AS n_dropped,
               coalesce(string_agg(seg, ' ' ORDER BY seg_id)
                          FILTER (WHERE NOT dropped), '') AS cleaned_text
        FROM s2 GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n_segs, 0)::BIGINT AS n_segs,
       coalesce(a.n_dropped, 0)::BIGINT AS n_dropped,
       coalesce(a.cleaned_text, '') AS cleaned_text
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def _corpus_diff_sql() -> str:
    """corpus_diff mirror over the same mutation recipe; change detection
    is exact text comparison here vs 64-bit FNV in the kernel — identical
    verdicts short of a 2^-64 same-key collision."""
    return f"""
WITH neww AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN text || ' mutated' ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + {DIFF_ADD_OFFSET}, text FROM documents WHERE doc_id % 17 = 0),
j AS (SELECT o.doc_id AS oid, n.doc_id AS nid, o.text AS ot, n.text AS nt
      FROM documents o FULL OUTER JOIN neww n ON o.doc_id = n.doc_id)
SELECT coalesce(oid, nid) AS doc_id,
       CASE WHEN oid IS NULL THEN 'added'
            WHEN nid IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM j
WHERE oid IS NULL OR nid IS NULL OR ot IS DISTINCT FROM nt
"""


def _prefix_dups_sql() -> str:
    """prefix_containment mirror over the same truncation-augmented corpus:
    contained side needs >= PREFIX_WORDS kept words; containment is the
    char-level starts_with(container, contained || ' ') word-boundary
    check; witness = min container doc_id."""
    from ..stages.dedup import PREFIX_WORDS

    return f"""
WITH w0 AS (SELECT doc_id, text,
                   list_filter(string_split(text, ' '), x -> x <> '') AS ws
            FROM documents),
aug AS (SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {PREFIX_TRUNC_OFFSET},
               array_to_string(ws[1 : {PREFIX_TRUNC_WORDS}], ' ')
        FROM w0 WHERE doc_id % 7 = 0 AND len(ws) > {PREFIX_TRUNC_WORDS}),
e AS (SELECT doc_id, text FROM
        (SELECT doc_id, text,
                list_filter(string_split(text, ' '), x -> x <> '') AS ws
         FROM aug)
      WHERE len(ws) >= {PREFIX_WORDS})
SELECT a.doc_id, count(*)::BIGINT AS n_containers,
       min(b.doc_id)::BIGINT AS container_doc_id
FROM e a JOIN aug b ON starts_with(b.text, a.text || ' ')
GROUP BY a.doc_id
"""


def _dup_ngrams_sql() -> str:
    """dup_ngram_coverage mirror over the same passage-augmented corpus:
    overlapping 5-gram positions per doc ('' words filtered exactly like
    ``textops._word_lists``), frequent = gram in >= 2 distinct docs,
    n_dup counts every frequent POSITION (occurrences, not distinct)."""
    from ..stages.dedup import NGRAM_COVER_N as _  # noqa: F401 (query pins n=5)

    n = 5
    return f"""
WITH d2 AS (SELECT doc_id,
  CASE WHEN doc_id % 4 = 0 THEN text || ' ' || '{NGRAM_SNIPPET}'
       ELSE text END AS text FROM documents),
w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
             AS ws FROM d2),
g AS (SELECT doc_id, array_to_string(ws[i : i + {n - 1}], ' ') AS gram
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - {n} + 2)) AS i
            FROM w)),
freq AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS nd
                           FROM g GROUP BY gram) WHERE nd >= 2),
agg AS (SELECT g.doc_id, count(*)::BIGINT AS n_grams,
               coalesce(sum(CASE WHEN f.gram IS NOT NULL THEN 1 ELSE 0 END),
                        0)::BIGINT AS n_dup
        FROM g LEFT JOIN freq f USING (gram) GROUP BY g.doc_id)
SELECT d.doc_id, coalesce(a.n_grams, 0)::BIGINT AS n_grams,
       coalesce(a.n_dup, 0)::BIGINT AS n_dup
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def _strip_dup_spans_sql() -> str:
    """strip_dup_spans mirror over the passage-augmented corpus: covered
    word index = any frequent gram start i reaches it (wi in [i, i+n-1]),
    rebuild = string_agg of uncovered words in order; null/wordless docs
    -> '' with zero counts (matching the kernel's empty rebuild)."""
    n = 5
    return f"""
WITH d2 AS (SELECT doc_id,
  CASE WHEN doc_id % 4 = 0 THEN text || ' ' || '{NGRAM_SNIPPET}'
       ELSE text END AS text FROM documents),
w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
             AS ws FROM d2),
g AS (SELECT doc_id, i, array_to_string(ws[i : i + {n - 1}], ' ') AS gram
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - {n} + 2)) AS i
            FROM w)),
freq AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS nd
                           FROM g GROUP BY gram) WHERE nd >= 2),
cov AS (SELECT DISTINCT g.doc_id, g.i + o.off AS wi
        FROM g JOIN freq USING (gram)
        CROSS JOIN (SELECT unnest(range({n})) AS off) o),
ww AS (SELECT doc_id, ws[wi] AS word, wi
       FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS wi FROM w)),
kept AS (SELECT ww.doc_id, ww.word, ww.wi FROM ww
         LEFT JOIN cov ON ww.doc_id = cov.doc_id AND ww.wi = cov.wi
         WHERE cov.wi IS NULL),
agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY wi) AS text,
               count(*)::BIGINT AS n_kept FROM kept GROUP BY doc_id),
wc AS (SELECT doc_id, coalesce(len(ws), 0)::BIGINT AS n_words FROM w)
SELECT wc.doc_id, coalesce(a.text, '') AS text, wc.n_words,
       (wc.n_words - coalesce(a.n_kept, 0))::BIGINT AS n_removed
FROM wc LEFT JOIN agg a USING (doc_id)
"""


def _winnow_sql() -> str:
    """winnow_fingerprints mirror: same kept-word split and gram join, FNV
    gram hashes (UBIGINT, so ORDER BY h matches numpy uint64 order), each
    w-window's rightmost minimum via row_number over (h ASC, pos DESC),
    window starts restricted to spans fully inside the document."""
    from ..stages.textops import WINNOW_K, WINNOW_W

    k, w = WINNOW_K, WINNOW_W
    return f"""
WITH w0 AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
                   AS ws FROM documents),
g0 AS (SELECT doc_id, i - 1 AS pos, array_to_string(ws[i : i + {k - 1}], ' ')
              AS gram
       FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - {k} + 2)) AS i
             FROM w0)),
g AS (SELECT doc_id, pos, {_fnv_sql("gram")} AS h FROM g0),
np AS (SELECT doc_id, count(*) AS npos FROM g GROUP BY doc_id),
exp AS (SELECT g.doc_id, g.pos, g.h, g.pos - o.off AS ws_start
        FROM g CROSS JOIN (SELECT unnest(range({w})) AS off) o
        JOIN np USING (doc_id)
        WHERE g.pos - o.off >= 0 AND g.pos - o.off <= np.npos - {w}),
sel AS (SELECT doc_id, pos, h,
               row_number() OVER (PARTITION BY doc_id, ws_start
                                  ORDER BY h ASC, pos DESC) AS rn
        FROM exp)
SELECT DISTINCT doc_id, pos::BIGINT AS pos, {_s64("h")} AS fp
FROM sel WHERE rn = 1
"""


def _mixture_apply_sql() -> str:
    """mixture_apply mirror: identical largest-remainder quota math
    (``textops.mixture_quota``) + per-group hash-ordered cumulative token
    prefix (window cumsum over (hv asc, doc_id asc))."""
    B = MIXTURE_APPLY_BUDGET
    hv = _fnv_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH w AS (SELECT doc_id, source, lang,
                  len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS ntok
           FROM documents),
g AS (SELECT source, lang, sum(ntok)::BIGINT AS nt FROM w GROUP BY 1, 2),
tot AS (SELECT sum(nt)::BIGINT AS t FROM g),
q AS (SELECT source, lang, nt, ({B} * nt) // t AS fl, ({B} * nt) % t AS rem
      FROM g, tot),
qq AS (SELECT source, lang,
       fl + CASE WHEN row_number() OVER (ORDER BY rem DESC, source, lang)
                      <= {B} - (SELECT sum(fl) FROM q)
            THEN 1 ELSE 0 END AS quota FROM q),
c AS (SELECT doc_id, source, lang,
             sum(ntok) OVER (PARTITION BY source, lang
                             ORDER BY {hv}, doc_id) AS cum
      FROM w)
SELECT c.doc_id FROM c JOIN qq USING (source, lang) WHERE cum <= quota
"""


QUANTILES_NCHARS_SQL = """
WITH c AS (SELECT n_chars AS v, count(*)::BIGINT AS cnt FROM documents GROUP BY 1),
s AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM c),
t AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT 'n_chars' AS col, t.n AS n,
  (SELECT min(v) FROM s WHERE cum >= ceil(0.25 * t.n))::BIGINT AS p25,
  (SELECT min(v) FROM s WHERE cum >= ceil(0.50 * t.n))::BIGINT AS p50,
  (SELECT min(v) FROM s WHERE cum >= ceil(0.75 * t.n))::BIGINT AS p75,
  (SELECT min(v) FROM s WHERE cum >= ceil(0.95 * t.n))::BIGINT AS p95
FROM t
"""


# quantile_band_assign mirror: identical boundary rule, band = count of
# boundaries strictly below the value
QUANTILE_BANDS_SQL = """
WITH c AS (SELECT n_chars AS v, count(*)::BIGINT AS cnt FROM documents GROUP BY 1),
s AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM c),
t AS (SELECT count(*)::BIGINT AS n FROM documents),
b AS (SELECT
  (SELECT min(v) FROM s, t WHERE cum >= greatest(ceil(0.25 * t.n), 1)) AS b0,
  (SELECT min(v) FROM s, t WHERE cum >= greatest(ceil(0.5 * t.n), 1)) AS b1,
  (SELECT min(v) FROM s, t WHERE cum >= greatest(ceil(0.75 * t.n), 1)) AS b2)
SELECT d.doc_id, d.n_chars,
  ((d.n_chars > b.b0)::INT + (d.n_chars > b.b1)::INT
   + (d.n_chars > b.b2)::INT)::BIGINT AS band
FROM documents d, b
"""


def q_coverage_bands(sf_dir: str):
    """Curriculum banding by LM-coverage score — the composition a
    coverage-stratified mixture orders by: the CCNet perplexity-proxy
    (score = n_hit*1000 // n_grams, integer ppt) quantile-banded over the
    held-out docs. The lm_coverage result materializes ONCE (doc-bounded)
    before the band fold + tagging map consume it (the lazy-plan
    double-execution gotcha)."""
    import pyarrow as pa

    from ..stages.stats import quantile_band_assign
    from ..stages.textops import lm_coverage

    def add_score(t: pa.Table) -> pa.Table:
        g = np.asarray(t["n_grams"]).astype(np.int64)
        h = np.asarray(t["n_hit"]).astype(np.int64)
        return t.append_column(
            "score", pa.array((h * 1000) // g))

    cov = (lm_coverage(_docs(sf_dir))
           .map_batches(add_score, batch_format="pyarrow")
           .materialize())
    return quantile_band_assign(cov, col="score")


def _coverage_bands_sql() -> str:
    """The lm_coverage oracle wrapped as a CTE, scored, then banded with
    the same cumulative-boundary arithmetic as QUANTILE_BANDS_SQL."""
    lm = _lm_coverage_sql()
    band = ("((sc.score > b.b0)::INT + (sc.score > b.b1)::INT"
            " + (sc.score > b.b2)::INT)::BIGINT")
    return f"""
WITH lmc AS (
{lm}
),
sc AS (SELECT doc_id, n_grams, n_hit, count_sum,
              (n_hit * 1000) // n_grams AS score FROM lmc),
c AS (SELECT score AS v, count(*)::BIGINT AS cnt FROM sc GROUP BY 1),
s AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM c),
t AS (SELECT count(*)::BIGINT AS n FROM sc),
b AS (SELECT
  (SELECT min(v) FROM s, t WHERE cum >= greatest(ceil(0.25 * t.n), 1)) AS b0,
  (SELECT min(v) FROM s, t WHERE cum >= greatest(ceil(0.5 * t.n), 1)) AS b1,
  (SELECT min(v) FROM s, t WHERE cum >= greatest(ceil(0.75 * t.n), 1)) AS b2)
SELECT sc.doc_id, sc.n_grams, sc.n_hit, sc.count_sum, sc.score,
       {band} AS band
FROM sc, b
"""


def q_curriculum_shards(sf_dir: str):
    """Curriculum shard layout: quantile-band(n_chars)-contiguous training
    shards, hash sub-blocked so every rank group stays bounded."""
    import ray.data as rd

    from .curation import curriculum_shards

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    return curriculum_shards(docs)


def _curriculum_shards_sql() -> str:
    from .curation import curriculum_shards  # noqa: F401 (doc link)

    B = 4
    fnv = _fnv_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH c AS (SELECT n_chars AS v, count(*)::BIGINT AS cnt FROM documents
           GROUP BY 1),
s AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM c),
t AS (SELECT count(*)::BIGINT AS n FROM documents),
b AS (SELECT
  (SELECT min(v) FROM s, t WHERE cum >= greatest(ceil(0.25 * t.n), 1)) AS b0,
  (SELECT min(v) FROM s, t WHERE cum >= greatest(ceil(0.5 * t.n), 1)) AS b1,
  (SELECT min(v) FROM s, t WHERE cum >= greatest(ceil(0.75 * t.n), 1)) AS b2),
d AS (SELECT doc_id,
        ((n_chars > b.b0)::INT + (n_chars > b.b1)::INT
         + (n_chars > b.b2)::INT)::BIGINT AS band,
        {fnv} AS h
      FROM documents, b)
SELECT doc_id, band, (band * {B} + h % {B})::BIGINT AS shard,
  (row_number() OVER (PARTITION BY band * {B} + h % {B}
                      ORDER BY h, doc_id) - 1)::BIGINT AS pos
FROM d
"""


def q_rank_by_source(sf_dir: str):
    """Exact WITHIN-SOURCE percentile rank of n_chars (per-domain
    keep-top-X% normalization; ``stats.percentile_rank_by_group``)."""
    import ray.data as rd

    from ..stages.stats import percentile_rank_by_group

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])
    return percentile_rank_by_group(docs, "n_chars", "source")


RANK_BY_SOURCE_SQL = """
WITH n AS (SELECT source, count(*)::BIGINT AS total FROM documents GROUP BY source)
SELECT doc_id, d.source, n_chars::BIGINT AS n_chars,
  (rank() OVER (PARTITION BY d.source ORDER BY n_chars) - 1)::BIGINT AS n_smaller,
  ((rank() OVER (PARTITION BY d.source ORDER BY n_chars) - 1) * 1000000
     // greatest(n.total - 1, 1))::BIGINT AS pct_ppm
FROM documents d JOIN n USING (source)
"""

# mad_outliers mirror: identical smallest-v-with-cum>=ceil(0.5*n) median
# rule applied twice (values, then absolute deviations), strict > on the
# 2*MAD band
OUTLIERS_MAD_SQL = """
WITH c AS (SELECT n_chars AS v, count(*)::BIGINT AS cnt FROM documents GROUP BY 1),
s AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM c),
t AS (SELECT count(*)::BIGINT AS n FROM documents),
med AS (SELECT min(v)::BIGINT AS m FROM s, t WHERE cum >= greatest(ceil(0.5 * t.n), 1)),
dc AS (SELECT abs(c.v - med.m) AS dv, sum(c.cnt) AS cnt FROM c, med GROUP BY 1),
ds2 AS (SELECT dv, sum(cnt) OVER (ORDER BY dv) AS cum FROM dc),
mad AS (SELECT min(dv)::BIGINT AS mad FROM ds2, t WHERE cum >= greatest(ceil(0.5 * t.n), 1))
SELECT d.doc_id, d.n_chars::BIGINT AS n_chars,
       abs(d.n_chars - med.m)::BIGINT AS deviation
FROM documents d, med, mad
WHERE abs(d.n_chars - med.m) > 2 * mad.mad
"""


RANK_NCHARS_SQL = """
WITH n AS (SELECT count(*)::BIGINT AS total FROM documents)
SELECT doc_id, n_chars::BIGINT AS n_chars,
  (rank() OVER (ORDER BY n_chars) - 1)::BIGINT AS n_smaller,
  ((rank() OVER (ORDER BY n_chars) - 1) * 1000000
     // greatest(n.total - 1, 1))::BIGINT AS pct_ppm
FROM documents, n
"""


def _quality_score_sql() -> str:
    """quality_score mirror: same FNV fold, bucket = h % QS_DIM, weight =
    (bucket * QS_MIX) % 41 - 20, per-doc sum (LEFT JOIN keeps zero-word
    docs at score 0; bucket*QS_MIX < 2^52 so UBIGINT arithmetic is exact)."""
    from ..stages.textops import QS_DIM, QS_MIX

    return f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
ws AS (SELECT doc_id,
         CAST((({_fnv_sql('word')} % {QS_DIM}) * {QS_MIX}) % 41 AS BIGINT) - 20 AS wt
       FROM w WHERE word <> ''),
s AS (SELECT doc_id, sum(wt)::BIGINT AS q_score FROM ws GROUP BY doc_id)
SELECT d.doc_id, coalesce(s.q_score, 0)::BIGINT AS q_score,
  CASE WHEN coalesce(s.q_score, 0) >= 0 THEN 1 ELSE 0 END::BIGINT AS keep
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
"""


def _split_sql() -> str:
    """split_assign mirror: identical FNV fold and cumulative band cuts."""
    from ..stages.sampling import SAMPLE_MOD, SPLIT_BANDS

    cuts = np.cumsum([r for _, r in SPLIT_BANDS])
    c0 = int(round(cuts[0] * SAMPLE_MOD))
    c1 = int(round(cuts[1] * SAMPLE_MOD))
    h = "CAST(" + _fnv_sql("CAST(doc_id AS VARCHAR)") + f" % {SAMPLE_MOD} AS BIGINT)"
    return f"""
SELECT doc_id, CASE WHEN {h} < {c0} THEN 'train'
                    WHEN {h} < {c1} THEN 'val' ELSE 'test' END AS split
FROM documents
"""


NORM_DEDUP_SQL = r"""
WITH d2 AS (SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000000, upper(text) FROM documents
            WHERE doc_id % 10 = 0),
n AS (SELECT doc_id,
  trim(regexp_replace(
    regexp_replace(lower(text), '[\x00-\x1f\x7f]', '', 'g'),
    ' +', ' ', 'g'), ' ') AS k FROM d2)
SELECT doc_id FROM n
QUALIFY row_number() OVER (PARTITION BY k ORDER BY doc_id) = 1
"""


KEEP_BEST_SQL = f"""
WITH RECURSIVE {_NGRAM_CTES},
nodes AS (SELECT doc_a AS node FROM edges UNION SELECT doc_b FROM edges),
walk(node, root) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT CASE WHEN w.node = edges.doc_a THEN edges.doc_b ELSE edges.doc_a END,
         w.root
  FROM walk w, edges WHERE w.node = edges.doc_a OR w.node = edges.doc_b
),
cc AS (SELECT node AS doc_id, min(root) AS cluster FROM walk GROUP BY node),
winners AS (SELECT cc.doc_id FROM cc JOIN documents d USING (doc_id)
            QUALIFY row_number() OVER (PARTITION BY cluster
                ORDER BY length(d.text) DESC, cc.doc_id) = 1),
drops AS (SELECT doc_id FROM cc
          WHERE doc_id NOT IN (SELECT doc_id FROM winners))
SELECT doc_id FROM documents EXCEPT SELECT doc_id FROM drops
"""

TOP_PER_SOURCE_SQL = """
SELECT source, doc_id, n_chars FROM documents
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY n_chars DESC, doc_id) <= 3
"""


def _lm_coverage_sql() -> str:
    """lm_coverage mirror: same FNV hash-split train membership
    (``sample_by_hash`` fold over str(doc_id)), same bigram positions
    ('' words filtered like ``textops._word_lists``), model = train grams
    with total count >= LM_MIN_COUNT, held-out docs scored by position."""
    from ..stages.textops import LM_MIN_COUNT, LM_N, LM_TRAIN_RATE
    from ..stages.sampling import SAMPLE_MOD

    n = LM_N
    thr = int(LM_TRAIN_RATE * SAMPLE_MOD)
    h = "CAST(" + _fnv_sql("CAST(doc_id AS VARCHAR)") + f" % {SAMPLE_MOD} AS BIGINT)"
    return f"""
WITH w AS (SELECT doc_id, {h} < {thr} AS is_train,
                  list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
g AS (SELECT doc_id, is_train, array_to_string(ws[i : i + {n - 1}], ' ') AS gram
      FROM (SELECT doc_id, is_train, ws,
                   unnest(range(1, len(ws) - {n} + 2)) AS i FROM w)),
model AS (SELECT gram, count(*)::BIGINT AS cnt FROM g WHERE is_train
          GROUP BY gram HAVING count(*) >= {LM_MIN_COUNT}),
held AS (SELECT doc_id, gram FROM g WHERE NOT is_train)
SELECT h.doc_id, count(*)::BIGINT AS n_grams,
       coalesce(sum(CASE WHEN m.gram IS NOT NULL THEN 1 ELSE 0 END),
                0)::BIGINT AS n_hit,
       coalesce(sum(m.cnt), 0)::BIGINT AS count_sum
FROM held h LEFT JOIN model m USING (gram) GROUP BY h.doc_id
"""


def _nb_classifier_sql() -> str:
    """nb_classifier mirror: same FNV hash-split train membership, label
    coalesce(lang = pos, FALSE) (null lang counts NEGATIVE, matching the
    kernel's fill_null(False) — two-valued, the round-3 null gotcha), ''
    words filtered like ``textops._word_lists``, Laplace rate normalizers
    K1/K0 folded to the same two global ints r_pos/r_neg (greatest(...,1)
    empty-train guard), two-sided per-position evidence with unseen words
    neutral via the LEFT JOIN coalesce, pred = strict two-sided compare."""
    from ..stages.sampling import SAMPLE_MOD
    from ..stages.textops import NB_SCALE, NB_TRAIN_RATE

    thr = int(NB_TRAIN_RATE * SAMPLE_MOD)
    h = ("CAST(" + _fnv_sql("CAST(doc_id AS VARCHAR)")
         + f" % {SAMPLE_MOD} AS BIGINT)")
    w_pos = "(coalesce(m.c1, 0) + 1) * r.r_pos // (coalesce(m.c0, 0) + 1)"
    w_neg = "(coalesce(m.c0, 0) + 1) * r.r_neg // (coalesce(m.c1, 0) + 1)"
    return f"""
WITH d AS (SELECT doc_id, {h} < {thr} AS is_train,
                  coalesce(lang = 'en', FALSE) AS pos,
                  list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
t AS (SELECT doc_id, is_train, pos, unnest(ws) AS word FROM d),
model AS (SELECT word,
                 sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS c1,
                 sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)::BIGINT AS c0
          FROM t WHERE is_train GROUP BY word),
tot AS (SELECT greatest(coalesce(sum(c1), 0) + count(*), 1)::BIGINT AS k1,
               greatest(coalesce(sum(c0), 0) + count(*), 1)::BIGINT AS k0
        FROM model),
ratios AS (SELECT k0 * {NB_SCALE} // k1 AS r_pos,
                  k1 * {NB_SCALE} // k0 AS r_neg FROM tot),
held AS (SELECT doc_id, word FROM t WHERE NOT is_train)
SELECT h.doc_id, count(*)::BIGINT AS n_words,
       sum({w_pos})::BIGINT AS score_pos,
       sum({w_neg})::BIGINT AS score_neg,
       (CASE WHEN sum({w_pos}) > sum({w_neg})
             THEN 1 ELSE 0 END)::BIGINT AS pred
FROM held h LEFT JOIN model m USING (word) CROSS JOIN ratios r
GROUP BY h.doc_id
"""


def _pii_sql(flat_path: str) -> str:
    """PII oracle built from the SAME pattern table as the kernel
    (``textops.PII_PATTERNS``) — counts against the original text, redaction
    applied in list order, exactly mirroring ``pii_redact``."""
    from ..stages.textops import PII_PATTERNS

    counts = " + ".join(
        f"len(regexp_extract_all(text, '{p}'))" for _, p in PII_PATTERNS
    )
    red = "text"
    for name, p in PII_PATTERNS:
        red = f"regexp_replace({red}, '{p}', '[{name.upper()}]', 'g')"
    return f"""
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       ({counts})::BIGINT AS n_pii, {red} AS redacted
FROM read_parquet('{flat_path}')
WHERE kind = 'Patient' AND text IS NOT NULL
"""


DECONTAMINATE_SQL_TEMPLATE = """
WITH d2 AS (SELECT doc_id, text, (__FNV__ % 4 = 0) AS is_bench FROM documents),
sh AS (SELECT doc_id, is_bench,
              unnest(list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS shingle
       FROM (SELECT doc_id, is_bench, string_split(text, ' ') AS w FROM d2)),
bsh AS (SELECT DISTINCT shingle FROM sh WHERE is_bench)
SELECT doc_id, count(*)::BIGINT AS n_overlap
FROM sh
WHERE NOT is_bench AND shingle IN (SELECT shingle FROM bsh)
GROUP BY doc_id
HAVING count(*) >= __K__
"""


# hash-threshold sampling: same FNV fold over str(doc_id), same threshold
_SAMPLE_H = "CAST(" + _fnv_sql("CAST(doc_id AS VARCHAR)") + " % 1000000 AS BIGINT)"
SAMPLE_SQL = f"""
SELECT doc_id FROM documents WHERE {_SAMPLE_H} < {int(0.1 * 1_000_000)}
"""

# truncation mirror: 1-based end-inclusive list slice = first 40 tokens;
# '' split artifacts count (doc rebuilt verbatim), null text -> 0 tokens
def _hash_embed_ctes() -> str:
    """CTE chain ending in ``emb(doc_id, e0..e{D-1})`` — the hash_embed
    mirror: per-(word, j) signed bucket from the same FNV fold over
    word || '#' || j, per-doc integer sums; wordless docs -> 0s. Shared by
    the t_hash_embed oracle and the cluster-cap oracle."""
    from ..stages.textops import HASH_EMBED_DIM as D

    comps = ",\n  ".join(
        f"coalesce(sum(CASE WHEN j = {j} THEN v END), 0)::BIGINT AS e{j}"
        for j in range(D))
    fnv = _fnv_sql("word || '#' || CAST(j AS VARCHAR)")
    sel = ", ".join(f"coalesce(a.e{j}, 0)::BIGINT AS e{j}" for j in range(D))
    return f"""he_w AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                             x -> x <> '')) AS word
           FROM documents),
he_c AS (SELECT doc_id, j, CAST({fnv} % 15 AS BIGINT) - 7 AS v
      FROM he_w CROSS JOIN (SELECT unnest(range({D})) AS j)),
he_agg AS (SELECT doc_id, {comps} FROM he_c GROUP BY doc_id),
emb AS (SELECT d.doc_id, {sel}
        FROM documents d LEFT JOIN he_agg a USING (doc_id))"""


def _hash_embed_sql() -> str:
    return f"WITH {_hash_embed_ctes()} SELECT * FROM emb"


def _cluster_cap_sql() -> str:
    """cluster_cap_keep mirror: integer inner-product argmax against the
    doc_id < K centroid rows (ties -> lowest k, = np.argmax first hit),
    then the cap's ORDER BY (FNV(str(doc_id)), doc_id) LIMIT N per cluster
    — the same key ``sampling.sample_exact_n_by_group`` ranks by."""
    from ..stages.textops import HASH_EMBED_DIM as D

    dot = " + ".join(f"d.e{j} * c.e{j}" for j in range(D))
    cols = ", ".join(f"e{j}" for j in range(D))
    fnv = _fnv_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH {_hash_embed_ctes()},
cent AS (SELECT doc_id AS k, {cols} FROM emb WHERE doc_id < {CLUSTER_CAP_K}),
dots AS (SELECT d.doc_id, c.k, ({dot})::BIGINT AS dot
         FROM emb d CROSS JOIN cent c),
best AS (SELECT doc_id, k AS cluster, dot AS score,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY dot DESC, k ASC) AS rn
         FROM dots),
a AS (SELECT doc_id, cluster::BIGINT AS cluster, score, {fnv} AS h
      FROM best WHERE rn = 1)
SELECT doc_id, cluster, score FROM a
QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY h, doc_id)
        <= {CLUSTER_CAP_N}
"""


def _kmeans_chain() -> tuple[list, str, str]:
    """kmeans_train mirror as a reusable CTE chain: the same fixed Lloyd
    rounds — argmin(|c|^2 - 2 e.c) assignment (ties -> lowest k), update
    floor(sum/count) via double division (coordinate sums are far below
    2^53, so the float round-trip is exact, matching the bincount path);
    empty clusters coalesce to the previous centroid. Returns (ctes,
    final-centroid CTE name, final-update CTE name)."""
    from ..stages.textops import HASH_EMBED_DIM as D

    K, iters = CLUSTER_CAP_K, KMEANS_ITERS
    ctes = [_hash_embed_ctes()]
    ctes.append(
        f"cent0 AS (SELECT doc_id AS k, "
        + ", ".join(f"e{j} AS c{j}" for j in range(D))
        + f" FROM emb WHERE doc_id < {K})")
    for i in range(1, iters + 1):
        prev = f"cent{i - 1}"
        cn = " + ".join(f"c.c{j} * c.c{j}" for j in range(D))
        dot = " + ".join(f"e.e{j} * c.c{j}" for j in range(D))
        ecols = ", ".join(f"e.e{j}" for j in range(D))
        ctes.append(
            f"sc{i} AS (SELECT e.doc_id, c.k, ({cn}) - 2 * ({dot}) AS dist, "
            f"{ecols} FROM emb e CROSS JOIN {prev} c)")
        ctes.append(
            f"a{i} AS (SELECT * FROM (SELECT sc{i}.*, row_number() OVER "
            f"(PARTITION BY doc_id ORDER BY dist ASC, k ASC) AS rn "
            f"FROM sc{i}) WHERE rn = 1)")
        upd = ", ".join(
            f"CAST(floor(sum(e{j})::DOUBLE / count(*)) AS BIGINT) AS f{j}"
            for j in range(D))
        ctes.append(
            f"u{i} AS (SELECT k, count(*)::BIGINT AS n, {upd} "
            f"FROM a{i} GROUP BY k)")
        newc = ", ".join(f"coalesce(u.f{j}, p.c{j}) AS c{j}"
                         for j in range(D))
        ctes.append(
            f"cent{i} AS (SELECT p.k, {newc} "
            f"FROM {prev} p LEFT JOIN u{i} u USING (k))")
    return ctes, f"cent{iters}", f"u{iters}"


def _kmeans_sql() -> str:
    from ..stages.textops import HASH_EMBED_DIM as D

    ctes, cent, u = _kmeans_chain()
    final_cols = ", ".join(f"c.c{j}" for j in range(D))
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT c.k AS cluster, coalesce(u.n, 0)::BIGINT AS n_members, "
        f"{final_cols}\nFROM {cent} c LEFT JOIN {u} u USING (k)"
    )


def _cluster_cap_trained_sql() -> str:
    """cluster_cap_keep(metric="l2", centroids=kmeans_train(...)) mirror:
    the Lloyd chain's final centroids, L2 assignment with the full
    ``|e|^2 + |c|^2 - 2 e.c`` score (ties -> lowest k), then the same
    FNV-keyed per-cluster cap as _cluster_cap_sql."""
    from ..stages.textops import HASH_EMBED_DIM as D

    ctes, cent, _ = _kmeans_chain()
    en = " + ".join(f"e.e{j} * e.e{j}" for j in range(D))
    cn = " + ".join(f"c.c{j} * c.c{j}" for j in range(D))
    dot = " + ".join(f"e.e{j} * c.c{j}" for j in range(D))
    fnv = _fnv_sql("CAST(doc_id AS VARCHAR)")
    ctes.append(
        f"fsc AS (SELECT e.doc_id, c.k, (({en}) + ({cn}) - 2 * ({dot}))"
        f"::BIGINT AS dist FROM emb e CROSS JOIN {cent} c)")
    ctes.append(
        "fa AS (SELECT * FROM (SELECT fsc.*, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY dist ASC, k ASC) AS rn FROM fsc) "
        "WHERE rn = 1)")
    ctes.append(
        f"fh AS (SELECT doc_id, k::BIGINT AS cluster, dist AS score, "
        f"{fnv} AS h FROM fa)")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT doc_id, cluster, score FROM fh"
        f"\nQUALIFY row_number() OVER (PARTITION BY cluster ORDER BY h, doc_id)"
        f" <= {CLUSTER_CAP_N}"
    )


def _truncate_sql() -> str:
    from ..stages.textops import TRUNCATE_TOKENS as T

    return f"""
SELECT doc_id,
       array_to_string(string_split(text, ' ')[1 : {T}], ' ') AS text,
       coalesce(len(string_split(text, ' ')), 0)::BIGINT AS n_tokens,
       coalesce(len(string_split(text, ' ')) > {T}, FALSE) AS truncated
FROM documents
"""

# weighted sampling: keep iff FNV % 1e6 < per-doc ppm weight (from n_chars)
WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id FROM documents
WHERE {_SAMPLE_H} < least(n_chars * {WEIGHT_PPM_PER_CHAR}, 1000000)
"""

# exactly-N sample: the N smallest (FNV(doc_id), doc_id) — the kernel's
# iterative histogram refinement converges to the same set as a global sort
SAMPLE_N_SQL = f"""
SELECT doc_id FROM (
  SELECT doc_id FROM documents
  ORDER BY {_fnv_sql("CAST(doc_id AS VARCHAR)")}, doc_id
  LIMIT {SAMPLE_EXACT_N})
"""

# balanced per-group exactly-N: partitioned window rank over the same fold
SAMPLE_N_GROUP_SQL = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source, row_number() OVER (
      PARTITION BY source
      ORDER BY {_fnv_sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
  FROM documents) WHERE rn <= {SAMPLE_N_PER_GROUP}
"""

SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id FROM documents
WHERE {_SAMPLE_H} < CASE source
  WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 500000 WHEN 'src2' THEN 0
  ELSE 200000 END
"""

STATS_NCHARS_SQL = """
SELECT 'n_chars' AS col, count(*)::BIGINT AS n, min(n_chars)::BIGINT AS min,
       max(n_chars)::BIGINT AS max, sum(n_chars)::BIGINT AS sum
FROM documents
"""

HISTOGRAM_NCHARS_SQL = f"""
WITH bins AS (SELECT unnest(range(0, {HIST_BINS})) AS bin),
h AS (
  SELECT least(greatest(floor((n_chars - {HIST_LO}) / {(HIST_HI - HIST_LO) / HIST_BINS})::BIGINT, 0),
               {HIST_BINS - 1}) AS bin, count(*)::BIGINT AS c
  FROM documents GROUP BY 1)
SELECT bins.bin::BIGINT AS bin, coalesce(h.c, 0)::BIGINT AS count
FROM bins LEFT JOIN h ON bins.bin = h.bin
"""


def dataops_oracles(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """SQL oracles (``sf_dir`` resolves the fixture registry / flat-span
    paths the m_* and kind-hist oracles read — it must match the sf the
    driver compares at). Remaining rows-only operators: a_kind_drift /
    a_drift_by_source (float PSI/KS scores — now fully mirrored by the
    FIXED-POINT oracle-checked a_kind_psi / a_drift_psi, plus the integer
    bin inputs a_kind_hist / a_drift_bins), a_column_profile (sketches —
    exact integer companion a_profile_quantiles), s_lsh_topk / s_ivf_topk
    (approximate by design, recall-tested); minhash_lsh shares the exact
    Jaccard oracle (miss probability < 1e-7 per pair at 32x4 bands, then
    verified exactly)."""
    from . import oracle
    from .validate import fixture_paths

    paths = fixture_paths(sf_dir)
    return {
        "w_retention": RETENTION_SQL,
        "w_funnel": FUNNEL_SQL,
        "j_segment_returnflag": SEGMENT_RETURNFLAG_SQL,
        "w_tumbling": TUMBLING_SQL,
        "w_hopping": HOPPING_SQL,
        "w_distinct_users": WINDOW_DISTINCT_SQL,
        "w_distinct_by_type": DISTINCT_BY_TYPE_SQL,
        "w_sessionize": SESSIONIZE_SQL,
        "w_session_paths": SESSION_PATHS_SQL,
        "a_benford": BENFORD_SQL,
        "d_novel_grams": NOVEL_GRAMS_SQL,
        "w_conversion_lag": CONVERSION_LAG_SQL,
        "d_lrs": LRS_SQL,
        "d_dup_profile": _dup_profile_sql(),
        "w_cusum": CUSUM_SQL,
        "w_asof_prev_purchase": ASOF_SQL,
        "w_range_join": RANGE_JOIN_SQL,
        "a_stats_nchars": STATS_NCHARS_SQL,
        "a_histogram_nchars": HISTOGRAM_NCHARS_SQL,
        "a_kind_hist": oracle.fill(KIND_HIST_SQL, paths),
        "a_drift_bins": DRIFT_BINS_SQL,
        "a_drift_psi": DRIFT_PSI_SQL,
        "a_kind_psi": kind_psi_sql(paths),
        "a_profile_quantiles": PROFILE_QUANTILES_SQL,
        "t_char_entropy": _char_entropy_sql(),
        "a_distinct_nchars": DISTINCT_NCHARS_SQL,
        "t_text_features": TEXT_FEATURES_SQL,
        "t_language_id": LANGUAGE_ID_SQL,
        "t_fingerprints": FINGERPRINTS_SQL,
        "d_exact_dedup": EXACT_DEDUP_SQL,
        "d_chunk_dedup": _chunk_dedup_sql(),
        "d_ngram_jaccard": NGRAM_JACCARD_SQL,
        "d_minhash_lsh": NGRAM_JACCARD_SQL,
        "d_simhash_pairs": SIMHASH_PAIRS_SQL,
        "d_edit_distance": EDIT_DISTANCE_SQL,
        "d_delta_dedup": DELTA_DEDUP_SQL_TEMPLATE
        .replace("__FNV__", _fnv_sql("CAST(doc_id AS VARCHAR)")),
        "w_upsert_latest": UPSERT_LATEST_SQL,
        "a_fd_violations": FD_VIOLATIONS_SQL,
        "a_contingency": CONTINGENCY_SQL,
        "d_triangles": TRIANGLES_SQL.format(ngram_ctes=_NGRAM_CTES),
        "d_cdc_chunks": CDC_CHUNK_SQL,
        "c_rank_fusion": RANK_FUSION_SQL,
        "c_pareto": PARETO_SQL,
        "d_ind_discovery": _ind_discovery_sql(),
        "a_rollup": ROLLUP_SQL,
        "a_cube": CUBE_SQL,
        "a_k_anonymity": K_ANONYMITY_SQL,
        "a_l_diversity": L_DIVERSITY_SQL,
        "t_kn_counts": KN_COUNTS_SQL,
        "t_simpson": SIMPSON_SQL,
        "t_keyness": KEYNESS_SQL,
        "w_autocorr": AUTOCORR_SQL,
        "d_lpa": _lpa_sql(),
        "c_temperature_mix": _temperature_mix_sql(),
        "d_dedup_clusters": DEDUP_CLUSTERS_SQL,
        "d_cluster_sizes": CLUSTER_SIZES_SQL,
        "d_decontaminate": DECONTAMINATE_SQL_TEMPLATE
        .replace("__FNV__", _fnv_sql("CAST(doc_id AS VARCHAR)"))
        .replace("__K__", str(DECON_MIN_OVERLAP)),
        "t_repetition": REPETITION_SQL,
        "t_pack": _pack_sql(),
        "t_mixture": _mixture_sql(),
        "t_tfidf": _tfidf_sql(),
        "t_oov": _oov_sql(),
        "t_shuffle": _shuffle_sql(),
        "t_top_words": TOP_WORDS_SQL,
        "t_chunks": _chunks_sql(),
        "t_normalize": _normalize_sql(),
        "d_seg_dedup": _seg_dedup_sql(),
        "d_prefix_dups": _prefix_dups_sql(),
        "d_corpus_diff": _corpus_diff_sql(),
        "d_dup_ngrams": _dup_ngrams_sql(),
        "d_strip_dup_spans": _strip_dup_spans_sql(),
        "t_lm_coverage": _lm_coverage_sql(),
        "c_nb_classifier": _nb_classifier_sql(),
        "d_crosslang_dups": CROSSLANG_SQL,
        "w_out_of_order": OUT_OF_ORDER_SQL,
        "c_gopher_funnel": GOPHER_FUNNEL_SQL,
        "c_coverage_bands": _coverage_bands_sql(),
        "t_top_per_source": TOP_PER_SOURCE_SQL,
        "t_split": _split_sql(),
        "a_quantiles_nchars": QUANTILES_NCHARS_SQL,
        "a_quantile_bands": QUANTILE_BANDS_SQL,
        "a_moments": MOMENTS_SQL,
        "a_vocab_growth": VOCAB_GROWTH_SQL,
        "a_distinct_ngrams": DISTINCT_NGRAMS_SQL,
        "a_source_overlap": SOURCE_OVERLAP_SQL,
        "w_props_rollup": PROPS_ROLLUP_SQL,
        "t_neg_samples": _neg_samples_sql(),
        "s_hard_negatives": HARD_NEGATIVES_SQL,
        "d_dup_rate": _dup_rate_sql(),
        "s_pq_codes": _pq_sql(),
        "s_pq_topk": _pq_topk_sql(),
        "c_filter_funnel": FILTER_FUNNEL_SQL,
        "t_lang_confusion": LANG_CONFUSION_SQL,
        "t_cooccurrence": COOCCURRENCE_SQL,
        "w_interarrival": INTERARRIVAL_SQL,
        "w_transitions": TRANSITIONS_SQL,
        "d_dup_degree": DUP_DEGREE_SQL,
        "a_user_gini": USER_GINI_SQL,
        "c_mixture_upsample": _mixture_upsample_sql(),
        "a_corpus_card": CORPUS_CARD_SQL,
        "a_source_card": SOURCE_CARD_SQL,
        "c_curriculum_shards": _curriculum_shards_sql(),
        "d_pagerank": _pagerank_sql(),
        "d_kcore": _kcore_sql(),
        "c_cluster_shards": _cluster_shards_sql(),
        "d_containment": CONTAINMENT_SQL,
        "a_rank_nchars": RANK_NCHARS_SQL,
        "a_outliers_mad": OUTLIERS_MAD_SQL,
        "a_rank_by_source": RANK_BY_SOURCE_SQL,
        "t_quality_score": _quality_score_sql(),
        "c_mixture_apply": _mixture_apply_sql(),
        "d_norm_dedup": NORM_DEDUP_SQL,
        "t_pii_redact": _pii_sql(paths["flat"]),
        "c_curation": _curation_sql(),
        "c_curation_clf": _curation_clf_sql(),
        "c_cluster_cap": _cluster_cap_sql(),
        "c_kmeans": _kmeans_sql(),
        "c_cluster_cap_trained": _cluster_cap_trained_sql(),
        "c_embed_dedup": EMBED_DEDUP_SQL,
        "c_keep_best": KEEP_BEST_SQL,
        "j_orders_by_segment": ORDERS_BY_SEGMENT_SQL,
        "j_lineitem_priority": LINEITEM_PRIORITY_SQL,
        "j_customer_region": CUSTOMER_REGION_SQL,
        "t_sample": SAMPLE_SQL,
        "t_badwords": BADWORDS_SQL,
        "t_winnow": _winnow_sql(),
        "t_truncate": _truncate_sql(),
        "t_hash_embed": _hash_embed_sql(),
        "c_split_leakage": _split_leakage_sql(),
        "t_sample_n_by_source": SAMPLE_N_GROUP_SQL,
        "t_sample_weighted": WEIGHTED_SAMPLE_SQL,
        "t_sample_n": SAMPLE_N_SQL,
        "t_sample_stratified": SAMPLE_STRATIFIED_SQL,
        "s_cosine_topk": COSINE_TOPK_SQL,
        "s_cosine_pairs": COSINE_PAIRS_SQL,
        "s_embed_decon": EMBED_DECON_SQL,
        "a_table_audit": _table_audit_sql(),
        "d_cross_shard_overlap": CROSS_SHARD_SQL.replace(
            "__FNV_DOC__", _fnv_sql("CAST(doc_id AS VARCHAR)")),
        "a_gram_spectrum": GRAM_SPECTRUM_SQL,
        "w_burst_windows": BURST_SQL,
        **_media_oracles(sf_dir),
        "m_crossmodal_topk": _crossmodal_sql(sf_dir),
    }
