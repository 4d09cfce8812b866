"""The flagship corpus-curation pipeline: exact dedup -> near-dup cluster
drop -> quality gate -> deterministic sample, composed into one KEEP-LIST.

This is the "switch your training-data pipeline to this repo" surface: every
step is an already-oracle-checked operator, and the composition itself has an
exact DuckDB oracle (``pipelines/dataops.py:CURATION_SQL``) because each
step's membership rule is a pure function of the corpus.

Plan shape (all distributed, driver holds nothing corpus-sized):

1. ``exact_dedup``      keep lowest doc_id per verbatim text group
2. ``dedup_clusters``   over ``ngram_jaccard_pairs``: drop non-canonical
                        members (doc != component min). The component min is
                        always the min of its own text group, so step 2's
                        canonical always survives step 1 — ordering the
                        passes this way never orphans a cluster.
3. ``text_features``    quality gate (length / stopword / punctuation)
4. ``sample_by_hash``   deterministic rate-based keep

The four keep/drop id streams fold in ONE bucketed groupby: each stream tags
its rows, each bucket group checks per doc_id "kept by 1, not dropped by 2,
kept by 3, kept by 4". No semi-join materialization, no broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def curate_keep_list(docs, *, jaccard_n: int = 2, jaccard_threshold: float = 0.8,
                     sample_rate: float = 1.0, num_buckets: int = 64,
                     classifier_threshold: int | None = None,
                     classifier_weights=None):
    """Dataset[doc_id:int64, text] -> Dataset[doc_id] of curated survivors.

    ``classifier_threshold`` (optional) adds a FIFTH membership stream: the
    hashed-linear quality classifier (``textops.quality_score``) must score
    the doc at or above it — the model-based gate real curation pipelines
    run next to the heuristic one. ``classifier_weights`` passes a trained
    weight vector through; the default arithmetic table keeps the composed
    oracle exact."""
    from ..stages.dedup import _intmix, dedup_clusters, exact_dedup, ngram_jaccard_pairs
    from ..stages.sampling import sample_by_hash
    from ..stages.textops import quality_score, text_features

    # stream 0: exact-dedup survivors
    kept_exact = exact_dedup(docs)

    # stream 1: near-dup cluster DROPS (non-canonical members)
    clusters = dedup_clusters(
        ngram_jaccard_pairs(docs, n=jaccard_n, threshold=jaccard_threshold)
    )

    def cluster_drops(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"]).astype(np.int64)
        c = np.asarray(t["cluster"]).astype(np.int64)
        return pa.table({"doc_id": pa.array(d[d != c])})

    drops = clusters.map_batches(cluster_drops, batch_format="pyarrow")

    # stream 2: quality-gate survivors
    quality = text_features(docs).filter(expr="quality_ok == True").select_columns(["doc_id"])

    # stream 3: sample survivors
    sampled = sample_by_hash(docs.select_columns(["doc_id"]), sample_rate)

    def tag(ds, stream: int):
        def f(t: pa.Table) -> pa.Table:
            d = np.asarray(t["doc_id"]).astype(np.int64)
            return pa.table(
                {
                    "bucket": pa.array(_intmix(d, num_buckets).astype(np.int32)),
                    "doc_id": pa.array(d),
                    "stream": pa.array(np.full(len(d), stream, dtype=np.int8)),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow")

    merged = (
        tag(kept_exact, 0)
        .union(tag(drops, 1))
        .union(tag(quality, 2))
        .union(tag(sampled, 3))
    )
    required = 0b1101  # in streams 0,2,3; stream 1 is the drop stream
    if classifier_threshold is not None:
        thr = classifier_threshold

        def clf_keep(t: pa.Table) -> pa.Table:
            keep = np.asarray(t["q_score"]).astype(np.int64) >= thr
            return pa.table({"doc_id": t["doc_id"].filter(pa.array(keep))
                             if isinstance(t["doc_id"], pa.Array)
                             else t["doc_id"].combine_chunks().filter(pa.array(keep))})

        scored = quality_score(docs, weights=classifier_weights).map_batches(
            clf_keep, batch_format="pyarrow"
        )
        merged = merged.union(tag(scored, 4))
        required |= 0b10000

    def fold(g: pa.Table) -> pa.Table:
        d = np.asarray(g["doc_id"]).astype(np.int64)
        s = np.asarray(g["stream"]).astype(np.int64)
        ud, inv = np.unique(d, return_inverse=True)
        # bitmask of streams present per doc (each stream emits a doc once)
        mask = np.zeros(len(ud), dtype=np.int64)
        np.bitwise_or.at(mask, inv, np.int64(1) << s)
        keep = (mask & required) == required  # in every keep stream ...
        keep &= (mask & 0b0010) == 0          # ... and NOT in drop stream 1
        return pa.table({"doc_id": pa.array(ud[keep])})

    return merged.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def embed_dedup_keep_list(embeddings, *, threshold: float = 0.92,
                          num_buckets: int = 64):
    """Embedding-cosine near-dup KEEP-LIST: LSH-candidate exact-verified
    cosine pairs (``similarity.cosine_pairs_lsh``) -> connected components
    (``dedup_clusters``) -> keep each component's min vec_id plus every
    unpaired vector. The semantic-dedup complement of the lexical
    ``curate_keep_list``: two near-identical embeddings collapse to one
    training example even when their surface text shares no n-grams.

    Dataset[vec_id:int64, embedding] -> Dataset[vec_id] of survivors.
    Same zero-driver-state shape as ``curate_keep_list``: the drop stream
    (non-canonical members, bounded by the PAIRED vectors only) meets the
    full id stream in one bucketed groupby — no broadcast, no semi-join
    materialization."""
    from ..stages.dedup import _intmix, dedup_clusters
    from ..stages.similarity import cosine_pairs_lsh

    clusters = dedup_clusters(cosine_pairs_lsh(embeddings, threshold=threshold))

    def non_canonical(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"]).astype(np.int64)
        c = np.asarray(t["cluster"]).astype(np.int64)
        return pa.table({"vec_id": pa.array(d[d != c])})

    drops = clusters.map_batches(non_canonical, batch_format="pyarrow")

    def tag(ds, stream: int):
        def f(t: pa.Table) -> pa.Table:
            v = np.asarray(t["vec_id"]).astype(np.int64)
            return pa.table({
                "bucket": pa.array(_intmix(v, num_buckets).astype(np.int32)),
                "vec_id": pa.array(v),
                "stream": pa.array(np.full(len(v), stream, dtype=np.int8)),
            })

        return ds.map_batches(f, batch_format="pyarrow")

    merged = tag(embeddings.select_columns(["vec_id"]), 0).union(tag(drops, 1))

    def fold(g: pa.Table) -> pa.Table:
        v = np.asarray(g["vec_id"]).astype(np.int64)
        s = np.asarray(g["stream"]).astype(np.int64)
        uv, inv = np.unique(v, return_inverse=True)
        mask = np.zeros(len(uv), dtype=np.int64)
        np.bitwise_or.at(mask, inv, np.int64(1) << s)
        keep = (mask & 0b01) == 0b01   # present in the corpus ...
        keep &= (mask & 0b10) == 0     # ... and not a non-canonical member
        return pa.table({"vec_id": pa.array(uv[keep])})

    return merged.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def hash_centroids(seed_docs, k: int, *, dim: int | None = None) -> np.ndarray:
    """K x dim integer centroid matrix: the hashed embeddings
    (``textops.hash_embed``) of the ``k`` lowest doc_ids in ``seed_docs``.

    Pass a PRE-FILTERED tiny dataset (e.g. a pushdown-filtered
    ``read_parquet(..., filter=doc_id < k)``), never the corpus — the
    collect here is O(k). Production pipelines substitute trained k-means
    centroids; this derivation exists so the cluster-cap oracle is an exact
    pure function of the corpus."""
    from ..functions.collect import collect_table
    from ..stages.textops import HASH_EMBED_DIM, hash_embed

    dim = HASH_EMBED_DIM if dim is None else dim
    tbl = collect_table(hash_embed(seed_docs, dim=dim))
    d = np.asarray(tbl["doc_id"]).astype(np.int64)
    order = np.argsort(d)[:k]
    if len(order) < k:
        raise ValueError(f"seed_docs holds {len(order)} rows < k={k}")
    return np.stack(
        [np.asarray(tbl[f"e{j}"]).astype(np.int64)[order] for j in range(dim)],
        axis=1)


def cluster_assign(docs, centroids, *, dim: int | None = None,
                   metric: str = "ip"):
    """Nearest-centroid assignment over the deterministic hashed embeddings
    — the SemDeDup-shaped partition of a corpus into K semantic buckets.

    ``metric="ip"``: max INNER PRODUCT, score = the dot product (the MIPS
    bucketing for seed/externally-normalized centroids). ``metric="l2"``:
    min squared Euclidean distance, score = ``|e|^2 + |c|^2 - 2 e.c`` —
    the assignment Lloyd optimizes, so use this with ``kmeans_train``
    output. Both break ties toward the lowest cluster id (np.argmax /
    argmin first-hit) and both are integer-exact, so the DuckDB oracles
    reproduce them bit-for-bit — no float cosine drift. Centroids are a
    tiny K x dim matrix captured in the task closure (ships once per
    worker); one stateless vectorized matmul per batch, nothing
    corpus-sized anywhere.

    Dataset[doc_id, text] -> Dataset[doc_id, cluster, score]."""
    from ..stages.textops import HASH_EMBED_DIM, hash_embed

    dim = HASH_EMBED_DIM if dim is None else dim
    C = np.ascontiguousarray(np.asarray(centroids, dtype=np.int64))
    if C.ndim != 2 or C.shape[1] != dim:
        raise ValueError(f"centroids must be K x {dim}, got {C.shape}")
    if metric not in ("ip", "l2"):
        raise ValueError(f"metric must be 'ip' or 'l2', got {metric!r}")
    c_norm = (C * C).sum(axis=1)

    def assign(t: pa.Table) -> pa.Table:
        X = np.stack(
            [np.asarray(t[f"e{j}"]).astype(np.int64) for j in range(dim)],
            axis=1)
        dots = X @ C.T
        if metric == "ip":
            cl = dots.argmax(axis=1).astype(np.int64)
            score = dots[np.arange(len(cl)), cl]
        else:
            d2 = (X * X).sum(axis=1)[:, None] + c_norm[None, :] - 2 * dots
            cl = d2.argmin(axis=1).astype(np.int64)
            score = d2[np.arange(len(cl)), cl]
        return pa.table({
            "doc_id": t["doc_id"],
            "cluster": pa.array(cl),
            "score": pa.array(score.astype(np.int64)),
        })

    return hash_embed(docs, dim=dim).map_batches(assign, batch_format="pyarrow")


def kmeans_train(docs, init_centroids, *, iters: int = 3,
                 dim: int | None = None):
    """Distributed integer Lloyd k-means over the hashed embeddings — the
    scale path for training the centroids ``cluster_cap_keep`` consumes
    (``hash_centroids`` is only the deterministic seed).

    Every step is integer-exact so the DuckDB oracle reproduces the run
    bit-for-bit: assignment is ``argmin ||e - c||^2 = argmin(|c|^2 -
    2 e.c)`` (ties -> lowest k, = np.argmin's first hit); the update is
    elementwise ``floor(sum / count)`` (floor toward -inf on both sides);
    an empty cluster keeps its previous centroid. Fixed ``iters`` rounds —
    no data-dependent convergence test — keeps the SQL mirror a finite CTE
    chain.

    Plan shape: the (doc_id, e0..e{D-1}) projection materializes ONCE
    (~(1+D)*8 bytes/row — the iteration working set; the corpus text is
    read and embedded a single time), then each round is one streaming
    map_batches emitting <= K partial rows per batch (per-cluster count +
    coordinate sums via bincount), a per-task combine level (batch_size=64,
    the stats.py two-level fold), and a driver fold over the few survivors.
    Driver state is O(K * D) integers.

    Returns ``(centroids, counts)``: the K x dim int64 matrix after
    ``iters`` updates and the member counts of the assignment that produced
    the final update."""
    from ..functions.collect import collect_table
    from ..stages.textops import HASH_EMBED_DIM, hash_embed

    dim = HASH_EMBED_DIM if dim is None else dim
    C = np.ascontiguousarray(np.asarray(init_centroids, dtype=np.int64))
    if C.ndim != 2 or C.shape[1] != dim:
        raise ValueError(f"init_centroids must be K x {dim}, got {C.shape}")
    K = C.shape[0]

    emb = hash_embed(docs, dim=dim).materialize()

    def to_rows(cnt: np.ndarray, sums: np.ndarray) -> pa.Table:
        return pa.table({
            "cluster": pa.array(np.arange(K, dtype=np.int64)),
            "n": pa.array(cnt),
            **{f"s{j}": pa.array(sums[:, j]) for j in range(dim)},
        })

    def fold_rows(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        cnt = np.zeros(K, np.int64)
        sums = np.zeros((K, dim), np.int64)
        if t.num_rows:
            cl = np.asarray(t["cluster"]).astype(np.int64)
            np.add.at(cnt, cl, np.asarray(t["n"]).astype(np.int64))
            for j in range(dim):
                np.add.at(sums[:, j], cl,
                          np.asarray(t[f"s{j}"]).astype(np.int64))
        return cnt, sums

    def combine(t: pa.Table) -> pa.Table:
        return to_rows(*fold_rows(t))

    counts = np.zeros(K, np.int64)
    for _ in range(iters):
        snap = C
        c_norm = (snap * snap).sum(axis=1)

        def partial(t: pa.Table, _C=snap, _cn=c_norm) -> pa.Table:
            X = np.stack(
                [np.asarray(t[f"e{j}"]).astype(np.int64)
                 for j in range(dim)], axis=1)
            score = _cn[None, :] - 2 * (X @ _C.T)
            cl = score.argmin(axis=1)
            cnt = np.bincount(cl, minlength=K).astype(np.int64)
            # bincount weights are float64; coordinate sums stay < 2^53 so
            # the round-trip through float is exact
            sums = np.stack(
                [np.bincount(cl, weights=X[:, j], minlength=K)
                 for j in range(dim)], axis=1).astype(np.int64)
            return to_rows(cnt, sums)

        parts = collect_table(
            emb.map_batches(partial, batch_format="pyarrow")
               .map_batches(combine, batch_format="pyarrow", batch_size=64))
        cnt, sums = fold_rows(parts)
        upd = np.floor_divide(sums, np.maximum(cnt, 1)[:, None])
        C = np.where((cnt > 0)[:, None], upd, snap).astype(np.int64)
        counts = cnt
    return C, counts


def cluster_cap_keep(docs, centroids, *, cap: int, dim: int | None = None,
                     metric: str = "ip"):
    """Diversity-capped curation: assign every doc to its nearest centroid,
    then keep AT MOST ``cap`` docs per cluster — the per-cluster balanced
    selection (SemDeDup / DCLM-style) that stops one dominant semantic
    bucket from flooding a training mix. Within a cluster the survivors are
    the ``cap`` lowest ``(FNV(str(doc_id)), doc_id)`` keys — an unbiased
    deterministic draw via ``sampling.sample_exact_n_by_group`` (iterative
    histogram refinement; no sort, no corpus-sized group: cluster count K
    is bounded, and the per-group machinery folds (group, bucket, count)
    partials only). Pass ``metric="l2"`` with ``kmeans_train`` centroids.

    Dataset[doc_id, text] -> Dataset[doc_id, cluster, score] survivors."""
    from ..stages.sampling import sample_exact_n_by_group

    return sample_exact_n_by_group(
        cluster_assign(docs, centroids, dim=dim, metric=metric),
        cap, group_col="cluster")


def curate_keep_best(docs, *, jaccard_n: int = 2, jaccard_threshold: float = 0.8,
                     num_buckets: int = 64):
    """Quality-aware near-dup resolution: like ``curate_keep_list``'s
    cluster drop, but each near-dup component keeps its HIGHEST-QUALITY
    member (longest text, ties -> lowest doc_id) instead of the lowest
    doc_id — the policy a real curation pipeline wants, since duplicates
    often differ by truncation and the min-id member may be the clipped one.

    Dataset[doc_id:int64, text] -> Dataset[doc_id] survivors (every
    unclustered doc + one winner per component).

    Plan shape, all distributed: component labels from ``dedup_clusters``;
    quality attaches to membership rows in a doc-bucket groupby (quality is
    recomputed per batch from text — a pure function, no join against a
    materialized side); winners resolve per component in a cluster-bucket
    groupby (argmax by (quality desc, doc_id asc), vectorized lexsort);
    the drop stream (clustered non-winners) meets the full id stream in the
    same bitmask fold as ``curate_keep_list``."""
    import pyarrow.compute as pc

    from ..stages.dedup import _intmix, dedup_clusters, ngram_jaccard_pairs

    clusters = dedup_clusters(
        ngram_jaccard_pairs(docs, n=jaccard_n, threshold=jaccard_threshold)
    )

    def qual_rows(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"]).astype(np.int64)
        q = np.asarray(pc.utf8_length(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
            else t["text"])).astype(np.int64)
        return pa.table({
            "bucket": pa.array(_intmix(d, num_buckets).astype(np.int32)),
            "role": pa.array(np.zeros(len(d), dtype=np.int8)),
            "doc_id": pa.array(d),
            "cluster": pa.array(np.zeros(len(d), dtype=np.int64)),
            "q": pa.array(q),
        })

    def member_rows(t: pa.Table) -> pa.Table:
        d = np.asarray(t["doc_id"]).astype(np.int64)
        c = np.asarray(t["cluster"]).astype(np.int64)
        return pa.table({
            "bucket": pa.array(_intmix(d, num_buckets).astype(np.int32)),
            "role": pa.array(np.ones(len(d), dtype=np.int8)),
            "doc_id": pa.array(d),
            "cluster": pa.array(c),
            "q": pa.array(np.zeros(len(d), dtype=np.int64)),
        })

    tagged = (docs.map_batches(qual_rows, batch_format="pyarrow")
              .union(clusters.map_batches(member_rows, batch_format="pyarrow")))

    def attach_quality(g: pa.Table) -> pa.Table:
        d = np.asarray(g["doc_id"]).astype(np.int64)
        role = np.asarray(g["role"]).astype(np.int64)
        c = np.asarray(g["cluster"]).astype(np.int64)
        q = np.asarray(g["q"]).astype(np.int64)
        qd, qq = d[role == 0], q[role == 0]
        order = np.argsort(qd)
        qd, qq = qd[order], qq[order]
        md, mc = d[role == 1], c[role == 1]
        pos = np.searchsorted(qd, md)  # every member doc has a quality row
        return pa.table({
            "cbucket": pa.array(_intmix(mc, num_buckets).astype(np.int32)),
            "cluster": pa.array(mc),
            "doc_id": pa.array(md),
            "q": pa.array(qq[pos]),
        })

    members = tagged.groupby("bucket").map_groups(
        attach_quality, batch_format="pyarrow")

    def drop_losers(g: pa.Table) -> pa.Table:
        c = np.asarray(g["cluster"]).astype(np.int64)
        d = np.asarray(g["doc_id"]).astype(np.int64)
        q = np.asarray(g["q"]).astype(np.int64)
        order = np.lexsort((d, -q, c))
        cs = c[order]
        winner = np.r_[True, cs[1:] != cs[:-1]]
        return pa.table({"doc_id": pa.array(d[order[~winner]])})

    drops = members.groupby("cbucket").map_groups(
        drop_losers, batch_format="pyarrow")

    def tag(ds, stream: int):
        def f(t: pa.Table) -> pa.Table:
            d = np.asarray(t["doc_id"]).astype(np.int64)
            return pa.table({
                "bucket": pa.array(_intmix(d, num_buckets).astype(np.int32)),
                "doc_id": pa.array(d),
                "stream": pa.array(np.full(len(d), stream, dtype=np.int8)),
            })

        return ds.map_batches(f, batch_format="pyarrow")

    merged = tag(docs.select_columns(["doc_id"]), 0).union(tag(drops, 1))

    def fold(g: pa.Table) -> pa.Table:
        d = np.asarray(g["doc_id"]).astype(np.int64)
        s = np.asarray(g["stream"]).astype(np.int64)
        ud, inv = np.unique(d, return_inverse=True)
        mask = np.zeros(len(ud), dtype=np.int64)
        np.bitwise_or.at(mask, inv, np.int64(1) << s)
        keep = (mask & 0b01) == 0b01
        keep &= (mask & 0b10) == 0
        return pa.table({"doc_id": pa.array(ud[keep])})

    return merged.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def cluster_shards(docs, centroids, *, blocks_per_cluster: int = 4,
                   dim: int | None = None, metric: str = "ip"):
    """Semantic shard layout: every doc gets ``(shard, pos)`` where shard =
    cluster * blocks_per_cluster + FNV(doc_id) % blocks_per_cluster and pos
    = the doc's rank within its shard by (hash, doc_id) — a reader
    streaming shards in order sees the corpus CLUSTER-CONTIGUOUS (the
    curriculum / locality layout), while the hash sub-blocking keeps every
    rank group bounded at ~corpus/(K*B) rows even though K itself is tiny
    (never rank inside a bare O(1)-cardinality cluster group).

    Same exchange shape as ``packing.shuffle_assign``: one bounded shard
    groupby, each group sorts only its own (hash, id) tags.

    Dataset[doc_id, text] -> Dataset[doc_id, cluster, shard, pos]."""
    from ..functions.hashing import hash_str

    B = int(blocks_per_cluster)

    def tag(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        cl = np.asarray(t["cluster"]).astype(np.int64)
        h = hash_str(ids.astype("U"))
        shard = cl * B + (h % np.uint64(B)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "cluster": pa.array(cl),
            "shard": pa.array(shard),
            "h": pa.array(h.astype(np.int64)),  # two's-complement carry
        })

    def rank(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        h = np.asarray(g["h"]).astype(np.int64).astype(np.uint64)
        order = np.lexsort((ids, h))
        pos = np.empty(len(order), np.int64)
        pos[order] = np.arange(len(order), dtype=np.int64)
        return pa.table({
            "doc_id": g["doc_id"],
            "cluster": g["cluster"],
            "shard": g["shard"],
            "pos": pa.array(pos),
        })

    assigned = cluster_assign(docs, centroids, dim=dim, metric=metric)
    return (assigned.map_batches(tag, batch_format="pyarrow")
            .groupby("shard").map_groups(rank, batch_format="pyarrow"))


def curriculum_shards(docs, *, col: str = "n_chars",
                      qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                      blocks_per_band: int = 4):
    """Curriculum shard layout — the difficulty-ordered sibling of
    ``cluster_shards``: every doc gets ``(shard, pos)`` where shard =
    quantile-band(col) * B + FNV(doc_id) % B and pos = the doc's rank
    within its shard by (hash, doc_id). A reader streaming shards in
    order sees the corpus easy->hard (band-contiguous, the curriculum
    training order), while hash sub-blocking keeps every rank group
    bounded at ~corpus/(bands*B) rows (never rank inside a bare
    O(1)-cardinality band group).

    Dataset[doc_id, col] -> Dataset[doc_id, band, shard, pos]."""
    from ..functions.hashing import hash_str
    from ..stages.stats import quantile_band_assign

    B = int(blocks_per_band)
    banded = quantile_band_assign(docs.select_columns(["doc_id", col]),
                                  col=col)

    def tag(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        band = np.asarray(t["band"]).astype(np.int64)
        h = hash_str(ids.astype("U"))
        return pa.table({
            "doc_id": pa.array(ids),
            "band": pa.array(band),
            "shard": pa.array(band * B + (h % np.uint64(B)).astype(np.int64)),
            "h": pa.array(h.astype(np.int64)),  # two's-complement carry
        })

    def rank(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        h = np.asarray(g["h"]).astype(np.int64).astype(np.uint64)
        order = np.lexsort((ids, h))
        pos = np.empty(len(order), np.int64)
        pos[order] = np.arange(len(order), dtype=np.int64)
        return pa.table({
            "doc_id": g["doc_id"],
            "band": g["band"],
            "shard": g["shard"],
            "pos": pa.array(pos),
        })

    return (banded.map_batches(tag, batch_format="pyarrow")
            .groupby("shard").map_groups(rank, batch_format="pyarrow"))


def filter_funnel(docs, stages):
    """Per-stage attrition report for a quality-filter CASCADE — the
    first table a curation run is judged by ("which filter ate my data?").

    ``stages`` is an ordered list of ``(name, mask_fn)`` where ``mask_fn``
    maps a pyarrow batch of ``documents`` rows to a numpy bool keep-mask.
    Cascade semantics: a document is charged to the FIRST stage that
    rejects it (later masks are not consulted for it), exactly the order
    the filters would run in production.

    Plan: ONE streaming pass — each batch evaluates all masks vectorized,
    folds them into per-stage (n_in, n_removed) partial counts (k rows per
    batch, never per-doc rows), and a k-group groupby sums the partials.
    Returns Dataset[stage_idx, stage, n_in, n_removed, n_out]; driver holds
    k rows total.
    """
    names = [n for n, _ in stages]
    fns = [f for _, f in stages]
    k = len(stages)
    if k == 0:
        raise ValueError("stages must be non-empty")

    def partial(t: pa.Table) -> pa.Table:
        alive = np.ones(t.num_rows, dtype=bool)
        n_in = np.zeros(k, np.int64)
        n_removed = np.zeros(k, np.int64)
        for i, fn in enumerate(fns):
            keep = np.asarray(fn(t), dtype=bool)
            n_in[i] = int(alive.sum())
            rm = alive & ~keep
            n_removed[i] = int(rm.sum())
            alive &= keep
        return pa.table({
            "stage_idx": pa.array(np.arange(k, dtype=np.int64)),
            "n_in": pa.array(n_in),
            "n_removed": pa.array(n_removed),
        })

    def fold(g: pa.Table) -> pa.Table:
        idx = int(g["stage_idx"][0].as_py())
        n_in = int(np.asarray(g["n_in"]).sum())
        n_removed = int(np.asarray(g["n_removed"]).sum())
        return pa.table({
            "stage_idx": pa.array([idx], pa.int64()),
            "stage": pa.array([names[idx]], pa.string()),
            "n_in": pa.array([n_in], pa.int64()),
            "n_removed": pa.array([n_removed], pa.int64()),
            "n_out": pa.array([n_in - n_removed], pa.int64()),
        })

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("stage_idx").map_groups(fold, batch_format="pyarrow"))


def rank_fusion(docs, *, batch_size: int | None = None):
    """Multi-signal Borda-fusion ranking — the robust way to combine
    incommensurable quality signals (a length score, a vocabulary-richness
    score, a repetition penalty) into one ordering WITHOUT score
    normalization: each signal contributes its competition rank (1 + number
    of strictly-better docs), fused = sum of ranks, smaller is better.

    Three integer signals from ONE tokenize pass (same whitespace/''-filter
    vocabulary as the repetition oracle): ``s_len`` chars (more better),
    ``s_distinct`` distinct non-empty words (more better), ``s_rep`` top
    word occurrences (fewer better).

    Scale shape: a global SORT is never needed — each signal's rank table
    comes from the cardinality-bounded `_value_count_fold` (per-batch
    unique partials, per-task combine, O(distinct) driver state), ranks
    broadcast once via ray.put as three sorted (value, rank) arrays, and a
    second stateless pass searchsorteds every doc into its ranks. Returns
    Dataset[doc_id, r_len, r_distinct, r_rep, fused]."""
    import ray

    from ..stages.stats import _value_count_fold

    def signals(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        s_len = pc.utf8_length(texts).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        parts = pc.split_pattern(texts.fill_null(""), " ")
        flat = pc.list_flatten(parts)
        nword = pc.list_value_length(parts).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), nword)
        da = pc.dictionary_encode(flat)
        code = np.asarray(da.indices).astype(np.int64)
        nonempty = np.asarray(
            pc.not_equal(flat, "")).astype(bool)
        doc_idx, code = doc_idx[nonempty], code[nonempty]
        n_distinct = np.zeros(len(t), np.int64)
        top_n = np.zeros(len(t), np.int64)
        if len(doc_idx):
            pair, occ = np.unique(
                doc_idx * np.int64(len(da.dictionary) + 1) + code,
                return_counts=True)
            pdoc = pair // np.int64(len(da.dictionary) + 1)
            np.add.at(n_distinct, pdoc, 1)
            np.maximum.at(top_n, pdoc, occ)
        return pa.table({
            "doc_id": t["doc_id"],
            "s_len": pa.array(s_len),
            "s_distinct": pa.array(n_distinct),
            "s_rep": pa.array(top_n),
        })

    sig = docs.select_columns(["doc_id", "text"]).map_batches(
        signals, batch_format="pyarrow", batch_size=batch_size).materialize()

    def rank_table(col: str, better: str) -> tuple[np.ndarray, np.ndarray]:
        v, c = _value_count_fold(sig, col)
        if better == "desc":  # rank = 1 + count of strictly greater
            r = 1 + np.concatenate([np.cumsum(c[::-1])[::-1][1:], [0]])
        else:  # asc: rank = 1 + count of strictly smaller
            r = 1 + np.concatenate([[0], np.cumsum(c)[:-1]])
        return v, r

    tables = ray.put({
        "s_len": rank_table("s_len", "desc"),
        "s_distinct": rank_table("s_distinct", "desc"),
        "s_rep": rank_table("s_rep", "asc"),
    })

    def fuse(t: pa.Table) -> pa.Table:
        tab = ray.get(tables)
        out = {"doc_id": t["doc_id"]}
        fused = np.zeros(len(t), np.int64)
        for col, name in (("s_len", "r_len"), ("s_distinct", "r_distinct"),
                          ("s_rep", "r_rep")):
            v, r = tab[col]
            x = np.asarray(t[col]).astype(np.int64)
            rk = r[np.searchsorted(v, x)]
            out[name] = pa.array(rk)
            fused += rk
        out["fused"] = pa.array(fused)
        return pa.table(out)

    return sig.map_batches(fuse, batch_format="pyarrow")


def pareto_frontier(docs, *, batch_size: int | None = None) -> pa.Table:
    """Distributed skyline (Pareto frontier) over two integer quality
    objectives — the "no-threshold" curation view: instead of picking
    cutoffs for length vs. vocabulary diversity, report every POINT not
    dominated on both axes at once (Börzsönyi et al., "The Skyline
    Operator", ICDE 2001). x = non-empty whitespace word count, y =
    diversity = (1000 * distinct words) // words; zero-word docs are
    excluded (no diversity is defined for them).

    Dominance is maximizing on both axes: point a is dominated iff some
    point b has b.x >= a.x and b.y >= a.y and b != a. Output is the set
    of frontier POINTS with multiplicity (n_docs), not doc ids — with a
    replicated corpus every copy of a frontier doc lands on the same
    point, so the result stays bounded by distinct-point cardinality.

    Scale shape — the skyline merge is ASSOCIATIVE (the frontier of a
    union is the frontier of the locally-dominated-pruned union), so:
    per-batch map computes distinct points + counts and prunes everything
    locally dominated (any point dominated in one batch is dominated
    globally, and a globally-frontier point survives every local prune,
    so summed surviving counts are exact); a groupby on x combines the
    per-x column (only max-y per x can survive, counts summed where y
    equals the per-x max); the final prefix-max sweep runs on the
    O(distinct x) driver-side table — the same cardinality bound as
    ``stats._value_count_fold``. No sort, no corpus-sized exchange.

    Returns a pyarrow Table (n_words, diversity, n_docs), x-ascending."""
    from ..functions.collect import collect_table

    def _local_frontier(x: np.ndarray, y: np.ndarray,
                        c: np.ndarray) -> tuple[np.ndarray, ...]:
        # per-x max y (lower y at equal x is dominated); then keep points
        # whose y strictly exceeds every y at strictly larger x
        order = np.lexsort((-y, -x))
        x, y, c = x[order], y[order], c[order]
        first = np.ones(len(x), bool)
        first[1:] = x[1:] != x[:-1]
        x, y, c = x[first], y[first], c[first]
        keep = np.ones(len(x), bool)
        if len(x) > 1:
            keep[1:] = y[1:] > np.maximum.accumulate(y)[:-1]
        return x[keep], y[keep], c[keep]

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parts = pc.split_pattern(texts.fill_null(""), " ")
        flat = pc.list_flatten(parts)
        nword_all = pc.list_value_length(parts).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), nword_all)
        da = pc.dictionary_encode(flat)
        code = np.asarray(da.indices).astype(np.int64)
        nonempty = np.asarray(pc.not_equal(flat, "")).astype(bool)
        doc_idx, code = doc_idx[nonempty], code[nonempty]
        nw = np.zeros(len(t), np.int64)
        nd = np.zeros(len(t), np.int64)
        if len(doc_idx):
            np.add.at(nw, doc_idx, 1)
            pair = np.unique(doc_idx * np.int64(len(da.dictionary) + 1) + code)
            np.add.at(nd, pair // np.int64(len(da.dictionary) + 1), 1)
        pos = nw > 0
        nw, nd = nw[pos], nd[pos]
        div = (1000 * nd) // np.maximum(nw, 1)
        pts, cnt = np.unique(nw * np.int64(1 << 32) + div, return_counts=True)
        x, y, c = _local_frontier(
            pts >> np.int64(32), pts & np.int64((1 << 32) - 1),
            cnt.astype(np.int64))
        return pa.table({"n_words": pa.array(x), "diversity": pa.array(y),
                         "n_docs": pa.array(c)})

    def per_x(g: pa.Table) -> pa.Table:
        y = np.asarray(g["diversity"]).astype(np.int64)
        c = np.asarray(g["n_docs"]).astype(np.int64)
        ymax = int(y.max())
        return pa.table({
            "n_words": g["n_words"][:1],
            "diversity": pa.array([ymax], pa.int64()),
            "n_docs": pa.array([int(c[y == ymax].sum())], pa.int64()),
        })

    folded = collect_table(
        docs.select_columns(["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("n_words").map_groups(per_x, batch_format="pyarrow"),
        empty_schema=pa.schema([("n_words", pa.int64()),
                                ("diversity", pa.int64()),
                                ("n_docs", pa.int64())]))
    x = np.asarray(folded["n_words"]).astype(np.int64)
    y = np.asarray(folded["diversity"]).astype(np.int64)
    c = np.asarray(folded["n_docs"]).astype(np.int64)
    x, y, c = _local_frontier(x, y, c)
    order = np.argsort(x)
    return pa.table({"n_words": pa.array(x[order]),
                     "diversity": pa.array(y[order]),
                     "n_docs": pa.array(c[order])})
