"""Training-data operators vs DuckDB oracles at sf0.001 (+ behavior checks
for the approximate operators that have no SQL equivalent)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _con():
    import os

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _oracle_names():
    from fhir_data_validation_ray.pipelines.dataops import dataops_oracles

    return sorted(dataops_oracles(SF_DIR).keys())


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = pd.to_numeric(df[c]).astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", _oracle_names())
def test_dataop_matches_oracle(ray_session, name):
    from fhir_data_validation_ray.pipelines.dataops import (
        dataops_oracles,
        dataops_queries,
    )

    result = dataops_queries()[name](SF_DIR)
    got = result.to_pandas() if hasattr(result, "to_pandas") else pd.DataFrame(result)
    want = _con().execute(dataops_oracles(SF_DIR)[name]).df()

    g, w = _normalize(got), _normalize(want)
    assert list(g.columns) == list(w.columns), f"{name}: {g.columns} vs {w.columns}"
    assert len(g) == len(w), f"{name}: rows {len(g)} vs {len(w)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_fingerprints_deterministic(ray_session):
    from fhir_data_validation_ray.pipelines.dataops import q_fingerprints

    a = q_fingerprints(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = q_fingerprints(SF_DIR).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # order-sensitive: full-text FNV separates all distinct docs
    assert a.fingerprint.nunique() == len(a)


def test_simhash_pairs_are_near_duplicates(ray_session):
    """Every emitted pair must actually be within the Hamming bound, and the
    planted bigram near-dups should be heavily represented."""
    import numpy as np
    import pyarrow.parquet as pq

    from fhir_data_validation_ray.pipelines.dataops import q_simhash_pairs
    from fhir_data_validation_ray.stages.textops import simhash_batch

    pairs = q_simhash_pairs(SF_DIR).to_pandas()
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    sh = simhash_batch(t["text"].combine_chunks())
    by_id = dict(zip(t["doc_id"].to_pylist(), sh))
    for a, b in pairs[["doc_a", "doc_b"]].itertuples(index=False):
        x = int(by_id[a]) ^ int(by_id[b])
        assert bin(x).count("1") <= 3


def test_lsh_topk_recall(ray_session):
    """LSH is approximate: assert structural validity + minimum recall vs the
    exact top-k (recall target is loose — random 64-d vectors are a hard case
    for hyperplane LSH; the knob is num_planes)."""
    from fhir_data_validation_ray.pipelines.dataops import (
        ANN_K,
        q_cosine_topk,
        q_lsh_topk,
    )

    exact = q_cosine_topk(SF_DIR).to_pandas()
    approx = q_lsh_topk(SF_DIR).to_pandas()
    assert set(approx.columns) == {"qid", "vec_id", "rank"}
    assert approx.groupby("qid")["rank"].max().max() <= ANN_K
    e = set(map(tuple, exact[["qid", "vec_id"]].values))
    a = set(map(tuple, approx[["qid", "vec_id"]].values))
    assert len(e & a) / len(e) >= 0.2


def test_exact_dedup_at_scale_with_duplicates(ray_session, tmp_path):
    """100k-doc corpus = 200 verbatim replicas of the base 500 docs: exact
    dedup must keep exactly one (lowest doc_id) per text group, with no
    pair explosion (first-per-key, not pairwise)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import exact_dedup

    src = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    reps = []
    for r in range(200):
        t = src.set_column(
            0, "doc_id", pa.compute.add(src["doc_id"], r * 1000)
        )
        reps.append(t)
    big = pa.concat_tables(reps)
    p = str(tmp_path / "docs100k.parquet")
    pq.write_table(big, p)

    kept = exact_dedup(rd.read_parquet(p)).to_pandas()
    assert len(kept) == 500                      # one survivor per distinct text
    assert sorted(kept.doc_id) == sorted(range(500))  # lowest id wins


def test_ngram_jaccard_join_lane_matches_broadcast(ray_session):
    """The 10^12-doc join lane (no driver-side corpus-sized state) must
    produce the same pairs as the broadcast lane."""
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import ngram_jaccard_pairs

    docs = lambda: rd.read_parquet(f"{SF_DIR}/documents.parquet",
                                   columns=["doc_id", "text"])
    a = ngram_jaccard_pairs(docs(), broadcast_counts=True).to_pandas()
    b = ngram_jaccard_pairs(docs(), broadcast_counts=False).to_pandas()
    key = lambda d: sorted(map(tuple, d[["doc_a", "doc_b"]].values))
    assert key(a) == key(b)
    assert len(a) > 0


def test_uniqueness_duplicate_heavy(ray_session):
    """~33% duplicate corpus: 30k rows over 20k distinct ids (10k ids appear
    twice, plus one hot id x100). The survivor fold is a bucketed groupby —
    the driver must see only the final duplicate rows, and exact counts must
    come out right even with every duplicate id surviving phase 1."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.uniqueness import duplicate_doc_ids

    ids = [f"id{i}" for i in range(20_000)] + [f"id{i}" for i in range(10_000)]
    ids += ["hot"] * 100
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.string())}))
    dups = duplicate_doc_ids(docs).to_pandas().set_index("doc_id")["n"]
    assert len(dups) == 10_001
    assert dups["hot"] == 100
    assert (dups.drop("hot") == 2).all()


def test_minhash_verify_lanes_match(ray_session):
    """The zero-driver-state verify lane (broadcast_doc_filter=False) must
    produce the same verified pairs as the candidate-doc-filter lane."""
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import minhash_lsh_pairs

    docs = lambda: rd.read_parquet(f"{SF_DIR}/documents.parquet",
                                   columns=["doc_id", "text"])
    a = minhash_lsh_pairs(docs(), broadcast_doc_filter=True).to_pandas()
    b = minhash_lsh_pairs(docs(), broadcast_doc_filter=False).to_pandas()
    key = lambda d: sorted(map(tuple, d[["doc_a", "doc_b"]].values))
    assert key(a) == key(b)
    assert len(a) > 0


def _dup_heavy_docs():
    import pyarrow as pa
    import ray.data as rd

    n_groups, reps = 100, 20
    words = ["w%d" % i for i in range(8)]
    ids, texts = [], []
    for g in range(n_groups):
        text = " ".join(f"{w}g{g}" for w in words)
        for r in range(reps):
            ids.append(g * reps + r)
            texts.append(text)
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ), n_groups, reps


@pytest.mark.parametrize("lane", [True, False])
def test_minhash_duplicate_heavy_distributed_verify(ray_session, lane):
    """Dup-heavy corpus: 100 groups x 20 identical docs -> 19,000 candidate
    pairs, all Jaccard 1.0. Exercises the distributed bucketed verify at a
    candidate volume where the round-1 driver-side per-pair loop was the
    scale bottleneck; every candidate must survive exact verification — on
    BOTH the candidate-doc-filter lane and the zero-driver-state lane."""
    from fhir_data_validation_ray.stages.dedup import minhash_lsh_pairs

    docs, n_groups, reps = _dup_heavy_docs()
    pairs = minhash_lsh_pairs(docs, threshold=0.8,
                              broadcast_doc_filter=lane).to_pandas()
    assert len(pairs) == n_groups * reps * (reps - 1) // 2  # 19,000
    # pairs never cross groups (distinct texts share no shingles)
    assert (pairs.doc_a // reps == pairs.doc_b // reps).all()


def test_minhash_auto_picks_zero_driver_lane_above_threshold(ray_session, monkeypatch):
    """Default lane (None) is picked by candidate COUNT: with the broadcast
    ceiling forced below the dup-heavy corpus's 19,000 candidates the
    zero-driver-state lane runs — and produces identical pairs."""
    from fhir_data_validation_ray.stages import dedup

    docs, n_groups, reps = _dup_heavy_docs()
    monkeypatch.setattr(dedup, "BROADCAST_FILTER_MAX_PAIRS", 1000)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.8).to_pandas()
    assert len(pairs) == n_groups * reps * (reps - 1) // 2


def test_cosine_pairs_lsh_matches_broadcast(ray_session):
    """The LSH-bucketed pair lane (no corpus-sized broadcast) must produce
    the same pairs as the exact broadcast lane at its 1e-6 miss budget."""
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.dataops import COSINE_PAIR_THRESHOLD
    from fhir_data_validation_ray.stages.similarity import cosine_pairs, cosine_pairs_lsh

    emb = lambda: rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    a = cosine_pairs(emb(), threshold=COSINE_PAIR_THRESHOLD).to_pandas()
    b = cosine_pairs_lsh(emb(), threshold=COSINE_PAIR_THRESHOLD).to_pandas()
    key = lambda d: sorted(map(tuple, d[["doc_a", "doc_b"]].values))
    assert key(a) == key(b)
    assert len(a) > 0


def test_cosine_pairs_lsh_code_width_equivalence(ray_session):
    """The wide-code lane (planes_per_rep=8, the >2M-vector auto-pick that
    shrinks the largest exchange group 16x) must produce the same verified
    pairs as the narrow default — exactness survives the bucket reshaping."""
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.dataops import COSINE_PAIR_THRESHOLD
    from fhir_data_validation_ray.stages.similarity import cosine_pairs_lsh

    emb = lambda: rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    a = cosine_pairs_lsh(emb(), threshold=COSINE_PAIR_THRESHOLD,
                         planes_per_rep=4).to_pandas()
    b = cosine_pairs_lsh(emb(), threshold=COSINE_PAIR_THRESHOLD,
                         planes_per_rep=8).to_pandas()
    key = lambda d: sorted(map(tuple, d[["doc_a", "doc_b"]].values))
    assert key(a) == key(b)
    assert len(a) > 0


def test_ivf_topk_recall_beats_probe_budget(ray_session):
    """IVF with nprobe=4 of 16 clusters scans ~25% of the corpus per query;
    recall vs the exact top-k should be well above that fraction."""
    from fhir_data_validation_ray.pipelines.dataops import (
        ANN_K,
        q_cosine_topk,
        q_ivf_topk,
    )

    exact = q_cosine_topk(SF_DIR).to_pandas()
    approx = q_ivf_topk(SF_DIR).to_pandas()
    assert set(approx.columns) == {"qid", "vec_id", "rank"}
    assert approx.groupby("qid")["rank"].max().max() <= ANN_K
    e = set(map(tuple, exact[["qid", "vec_id"]].values))
    a = set(map(tuple, approx[["qid", "vec_id"]].values))
    assert len(e & a) / len(e) >= 0.4


def test_window_operators_under_90pct_hot_user(ray_session):
    """90% of events belong to ONE user. The sharded (user, time-block) plans
    must produce exactly the plain groupby(user_id) results — sessions
    stitched across block boundaries, as-of matches resolved through block
    summaries, range counts across block edges."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import (
        US_PER_HOUR,
        asof_join_prev_event,
        range_join_counts,
        sessionize,
    )

    rng = np.random.RandomState(0xBEEF)
    n = 20_000
    base = 1_700_000_000_000_000  # epoch_us
    user = np.where(rng.rand(n) < 0.9, 7, rng.randint(0, 100, n)).astype(np.int64)
    ts = base + rng.randint(0, 3 * 24 * US_PER_HOUR, n).astype(np.int64)
    etype = np.where(rng.rand(n) < 0.1, "purchase", "view")
    events = lambda: rd.from_arrow(
        pa.table({"event_id": pa.array(np.arange(n)), "user_id": pa.array(user),
                  "ts": pa.array(ts), "event_type": pa.array(etype, pa.string())})
    )

    def key(df, cols):
        return sorted(map(tuple, df[cols].values))

    for op, cols in (
        (sessionize, ["user_id", "n_sessions", "n_events", "max_session_events"]),
        (asof_join_prev_event, ["event_id", "matched_id"]),
        (range_join_counts, ["event_id", "n_nearby"]),
    ):
        sharded = op(events()).to_pandas()
        plain = op(events(), block_us=None).to_pandas()
        assert key(sharded, cols) == key(plain, cols), op.__name__
        assert len(sharded) > 0, op.__name__


def test_dedup_clusters_chain_and_components(ray_session):
    """Label propagation must converge past one hop: a 6-node chain (diameter
    5) plus a separate triangle and an isolated pair — every node must land
    on its component's minimum id."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import dedup_clusters

    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15),   # chain
             (20, 21), (21, 22), (20, 22),                       # triangle
             (30, 31)]                                           # pair
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in edges], pa.int64()),
        "doc_b": pa.array([b for _, b in edges], pa.int64()),
    }))
    got = dedup_clusters(pairs).to_pandas().set_index("doc_id")["cluster"]
    assert all(got[n] == 10 for n in range(10, 16))
    assert all(got[n] == 20 for n in range(20, 23))
    assert all(got[n] == 30 for n in (30, 31))
    # keep/drop resolution: keep doc == cluster -> one survivor per component
    assert sorted(got[got.index == got].index) == [10, 20, 30]


def test_dedup_clusters_raises_on_nonconvergence(ray_session):
    """A component whose diameter exceeds max_iters must RAISE, not silently
    return truncated (wrong) cluster labels — the chain above needs 5
    propagation rounds, so max_iters=3 cannot converge."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import dedup_clusters

    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15)]
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in edges], pa.int64()),
        "doc_b": pa.array([b for _, b in edges], pa.int64()),
    }))
    with pytest.raises(RuntimeError, match="still changing"):
        dedup_clusters(pairs, max_iters=3).to_pandas()


def test_window_distinct_rejects_out_of_range_ids(ray_session):
    """The packed (window, value) dedup key reserves 26 bits for the value;
    an id >= 2^26 (or negative) must raise instead of silently bleeding into
    the window id and corrupting distinct counts."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import tumbling_window_distinct

    events = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1 << 26], pa.int64()),
        "ts": pa.array([10, 20], pa.int64()),
    }))
    with pytest.raises(Exception, match="must be in"):
        tumbling_window_distinct(events).to_pandas()


def test_minhash_boundary_jaccard_pair_kept(ray_session):
    """A pair at Jaccard EXACTLY the threshold (4 shared of 5 shingles each,
    J = 4/5 = 0.8) must be kept — the float comparison must divide like the
    ngram lane and oracle, not multiply (0.8 * 5 rounds above 4)."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    # 6 words -> 5 bigram shingles; the two texts share 4 of 6 (=J 4/6)...
    # construct precisely: shared prefix of 5 words (4 shared shingles),
    # distinct last word (1 distinct shingle each) -> inter=4, union=6, J=2/3.
    # For J = 0.8 exactly: 9 shared shingles, 1 distinct each -> 9/11? No:
    # inter=4, n_a=n_b=5 -> union 6. Need inter=4, union=5: n_a=5, n_b=4,
    # all of b's shingles shared: b = prefix of a with 5 words (4 shingles),
    # a = 6 words (5 shingles). J = 4 / (5 + 4 - 4) = 0.8 exactly.
    a_text = "w0 w1 w2 w3 w4 w5"
    b_text = "w0 w1 w2 w3 w4"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([a_text, b_text], pa.string()),
    }))
    mh = minhash_lsh_pairs(docs, threshold=0.8).to_pandas()
    ng = ngram_jaccard_pairs(docs, threshold=0.8).to_pandas()
    assert len(ng) == 1, "sanity: ngram lane keeps the boundary pair"
    assert len(mh) == 1, "minhash verify must keep the exact-threshold pair"


def test_partitioned_join_under_hot_key_skew(ray_session):
    """90% of left rows share ONE key; salt spreads them while right-side
    replication keeps the join exact (duplicate right keys fan out too)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.joins import partitioned_hash_join

    rng = np.random.RandomState(7)
    lk = np.where(rng.rand(5000) < 0.9, 42, rng.randint(0, 50, 5000)).astype(np.int64)
    lv = np.arange(5000, dtype=np.int64)
    left = rd.from_arrow(pa.table({"k": pa.array(lk), "v": pa.array(lv)}))
    # right: every key once, key 42 TWICE (duplicate-right fan-out)
    rk = np.concatenate([np.arange(0, 50), [42]]).astype(np.int64)
    rv = np.concatenate([np.arange(0, 50) * 10, [421]]).astype(np.int64)
    right = rd.from_arrow(pa.table({"k": pa.array(rk), "w": pa.array(rv)}))

    out = partitioned_hash_join(
        left, right, left_key="k", right_key="k",
        left_columns=["v"], right_columns=["w"],
        left_types={"v": pa.int64()}, right_types={"w": pa.int64()},
        num_buckets=8, salt=4,
    ).to_pandas()
    n_hot = int((lk == 42).sum())
    # every non-hot left row matches once; hot rows match the two right rows
    assert len(out) == (5000 - n_hot) + 2 * n_hot
    assert sorted(out[out.w == 421].v) == sorted(lv[lk == 42])


def test_new_ops_tolerate_empty_blocks(ray_session):
    """Zero-row blocks are a reality of streaming execution — every new
    operator's per-batch kernel must pass them through cleanly."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import decontaminate
    from fhir_data_validation_ray.stages.textops import pii_redact, top_words

    empty_docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    some_docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b c", "a b d"], pa.string())}))

    # (Ray's to_pandas drops the schema of an all-empty Dataset — assert on
    # row counts; the non-empty path pins column names via the oracles)
    assert len(top_words(empty_docs, k=5).to_pandas()) == 0
    assert len(pii_redact(empty_docs).to_pandas()) == 0

    # empty benchmark: nothing can overlap -> no flags
    d1 = decontaminate(some_docs, empty_docs, min_overlap=1).to_pandas()
    assert len(d1) == 0
    # empty training side
    d2 = decontaminate(empty_docs, some_docs, min_overlap=1).to_pandas()
    assert len(d2) == 0
    # overlap present: docs 1 and 2 share the bigram "a b"
    d3 = decontaminate(
        some_docs.filter(expr="doc_id == 2"),
        some_docs.filter(expr="doc_id == 1"),
        min_overlap=1,
    ).to_pandas()
    assert d3.doc_id.tolist() == [2] and d3.n_overlap.tolist() == [1]


def test_late_ops_tolerate_empty_blocks(ray_session):
    """Same zero-row-block guarantee for the final-session operators."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.similarity import embed_decontaminate
    from fhir_data_validation_ray.stages.stats import percentile_rank
    from fhir_data_validation_ray.stages.textops import quality_score

    empty_docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    assert len(quality_score(empty_docs).to_pandas()) == 0

    empty_scores = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "x": pa.array([], pa.int64())}))
    assert len(percentile_rank(empty_scores, "x").to_pandas()) == 0

    def emb(ids, vecs):
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }))

    empty_emb = emb([], [])
    some_emb = emb([1, 2], [[1.0, 0.0], [0.0, 1.0]])
    # empty benchmark: no vector can match
    assert len(embed_decontaminate(some_emb, empty_emb).to_pandas()) == 0
    # empty corpus
    assert len(embed_decontaminate(empty_emb, some_emb).to_pandas()) == 0
    # exact-match corpus vector flags with count 1
    got = embed_decontaminate(some_emb, emb([9], [[2.0, 0.0]]),
                              threshold=0.99).to_pandas()
    assert got.vec_id.tolist() == [1] and got.n_matches.tolist() == [1]


def test_curation_identical_across_read_parallelism(ray_session):
    """The curated keep-list must not depend on block boundaries — every
    membership rule is a pure function of the corpus, so 2-block and
    8-block reads must agree exactly (the determinism that makes resumable
    re-runs safe)."""
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.curation import curate_keep_list

    def run(nblocks):
        docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=nblocks)
        return sorted(curate_keep_list(docs, sample_rate=0.9).to_pandas()["doc_id"])

    a, b = run(2), run(8)
    assert a == b and len(a) > 0


def test_repetition_stats_semantics(ray_session):
    """Hand-computed Gopher-style repetition signals on adversarial docs:
    top-word share trigger, duplicate-bigram trigger, clean doc, empty doc,
    and multi-space runs (empty words must not count or form bigrams)."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import repetition_stats

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "spam spam spam spam eggs",      # top word 4/5 > 20%
            "a b a b a b a b a c",           # bigrams heavily duplicated
            "one two three four five six",   # clean
            "",                              # empty -> all zeros
            "x  y   x",                      # runs of spaces -> 3 words, 2 bigrams
        ], pa.string()),
    }))
    df = (repetition_stats(docs).to_pandas()
          .set_index("doc_id").sort_index())

    assert df.loc[1].tolist() == [5, 2, 4, 4, 2, 3, True]
    # doc 2: 10 words (a x5, b x4, c x1), 9 bigrams, distinct {ab,ba,ac}=3
    assert df.loc[2, ["n_words", "top_word_n", "n_bigrams",
                      "n_distinct_bigrams"]].tolist() == [10, 5, 9, 3]
    assert bool(df.loc[2, "repetitive"])
    assert df.loc[3].tolist() == [6, 6, 1, 5, 5, 1, False]
    assert df.loc[4].tolist() == [0, 0, 0, 0, 0, 0, False]
    # doc 5: words [x,y,x] after filtering '' -> bigrams (x,y),(y,x);
    # top word x is 2/3 of the doc -> repetitive by the 20% gate
    assert df.loc[5].tolist() == [3, 2, 2, 2, 2, 1, True]


def test_pack_sequences_layout(ray_session):
    """Offsets are the shard-local prefix sum in doc_id order, sequences
    chunk every `budget` tokens, and the layout is identical whether the
    shard's docs arrive in one batch or split across many."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.packing import pack_sequences

    ids = np.arange(20, dtype=np.int64)
    texts = [" ".join(["w"] * (3 + int(i) % 5)) for i in ids]  # 3..7 tokens
    tbl = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())})

    def run(nblocks):
        return (pack_sequences(rd.from_arrow(tbl).repartition(nblocks),
                               budget=10, shard_docs=8)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    df = run(1)
    assert df.shard.tolist() == (ids // 8).tolist()
    ntok = 3 + ids % 5
    assert df.n_tokens.tolist() == ntok.tolist()
    for s, g in df.groupby("shard"):
        offs = np.concatenate([[0], np.cumsum(g.n_tokens.to_numpy())[:-1]])
        assert g.tok_offset.tolist() == offs.tolist()
        assert g.seq_in_shard.tolist() == (offs // 10).tolist()
    # shard 0 by hand: tokens 3,4,5,6,7,3,4,5 -> offsets 0,3,7,12,18,25,28,32
    g0 = df[df.shard == 0]
    assert g0.tok_offset.tolist() == [0, 3, 7, 12, 18, 25, 28, 32]
    assert g0.seq_in_shard.tolist() == [0, 0, 0, 1, 1, 2, 2, 3]

    import pandas as pd
    pd.testing.assert_frame_equal(df, run(7))


def test_packing_and_repetition_tolerate_empty_blocks(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.packing import pack_sequences
    from fhir_data_validation_ray.stages.textops import repetition_stats

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    assert len(repetition_stats(empty).to_pandas()) == 0
    assert len(pack_sequences(empty).to_pandas()) == 0


def test_mixture_quota_semantics(ray_session):
    """Quotas are the largest-remainder proportional allocation: they sum to
    the budget exactly, floors are respected, and the remainder bonus goes to
    the largest-remainder groups (ties by source, lang)."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import mixture_quota

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(["a b c", "d e", "f", "g h i j", "k", "l m"], pa.string()),
        "source": pa.array(["web", "web", "book", "book", "code", "code"]),
        "lang": pa.array(["en", "de", "en", "en", "en", "en"]),
    }))
    # groups: (web,en)=3 tok, (web,de)=2, (book,en)=1+4=5, (code,en)=1+2=3; tot=13
    df = (mixture_quota(docs, budget=100).to_pandas()
          .set_index(["source", "lang"]).sort_index())
    assert df.quota.sum() == 100
    assert df.loc[("book", "en")].tolist() == [2, 5, 39]   # floor 38 + bonus
    assert df.loc[("web", "de")].tolist() == [1, 2, 15]    # floor 15 rem 5/13
    assert df.loc[("web", "en")].quota == 23               # floor 23 rem 1/13
    assert df.loc[("code", "en")].quota == 23              # ties: code < web

    # all-empty corpus: groups exist, zero tokens -> zero quotas (no div0)
    empty_texts = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["", ""], pa.string()),
        "source": pa.array(["web", "book"]),
        "lang": pa.array(["en", "en"]),
    }))
    z = mixture_quota(empty_texts, budget=10).to_pandas()
    assert len(z) == 2 and z.quota.tolist() == [0, 0]


def test_tfidf_top_terms_semantics(ray_session):
    """The salient term maximizes tf*SCALE//df; rarer terms beat commoner
    ones at equal tf, and exact ties resolve to the lexicographically
    smallest term. Result is invariant to read parallelism."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import tfidf_top_terms

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "apple apple banana",   # tf(apple)=2 beats rare banana (2M vs 1M/2)
            "banana cherry",        # both df=2, tf=1 -> tie -> 'banana'
            "cherry date",          # date df=1 unique -> 'date'
            "",                     # wordless doc -> no row
        ], pa.string()),
    })

    def run(nblocks):
        return (tfidf_top_terms(rd.from_arrow(tbl).repartition(nblocks),
                                doc_shard=2)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    df = run(1)
    assert df.doc_id.tolist() == [1, 2, 3]
    assert df.term.tolist() == ["apple", "banana", "date"]
    assert df.tf.tolist() == [2, 1, 1]
    assert df.df.tolist() == [1, 2, 1]
    assert df.score.tolist() == [2_000_000, 500_000, 1_000_000]
    pd.testing.assert_frame_equal(df, run(3))


def test_mixture_and_tfidf_tolerate_empty_blocks(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import (
        mixture_quota,
        tfidf_top_terms,
    )

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string()),
        "source": pa.array([], pa.string()), "lang": pa.array([], pa.string())}))
    assert len(mixture_quota(empty).to_pandas()) == 0
    assert len(tfidf_top_terms(empty).to_pandas()) == 0


def test_oov_rate_semantics(ray_session):
    """Rare-word mass is counted against the GLOBAL df (terms seen in >= 2
    docs are in-vocab), the gate is the integer 20% form, and the result is
    invariant to read parallelism."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import oov_rate

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a a b",      # df(a)=2, df(b)=2 -> no OOV
            "a c",        # c df=1 -> 1 of 2 words OOV
            "b z z z",    # z df=1 -> 3 of 4 OOV
            "",           # wordless -> no row
        ], pa.string()),
    })

    def run(nblocks):
        return (oov_rate(rd.from_arrow(tbl).repartition(nblocks), doc_shard=2)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    df = run(1)
    assert df.doc_id.tolist() == [1, 2, 3]
    assert df.n_words.tolist() == [3, 2, 4]
    assert df.n_oov.tolist() == [0, 1, 3]
    assert df.low_oov.tolist() == [True, False, False]
    pd.testing.assert_frame_equal(df, run(3))

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    assert len(oov_rate(empty).to_pandas()) == 0


def test_shuffle_assign_layout(ray_session):
    """The layout is a permutation (every doc appears once; positions within
    a shard are 0..len-1), is decorrelated from doc_id order, and is
    identical across read parallelism."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.packing import shuffle_assign

    ids = np.arange(500, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids)})

    def run(nblocks):
        return (shuffle_assign(rd.from_arrow(tbl).repartition(nblocks),
                               n_shards=8)
                .to_pandas().sort_values(["shard", "pos"]).reset_index(drop=True))

    df = run(1)
    assert sorted(df.doc_id) == list(ids)
    for _, g in df.groupby("shard"):
        assert g.pos.tolist() == list(range(len(g)))
    # hash order decorrelates from ingest order: within the biggest shard,
    # doc_ids must not come out sorted
    big = df[df.shard == df.shard.value_counts().idxmax()]
    assert not big.doc_id.is_monotonic_increasing
    pd.testing.assert_frame_equal(df, run(7))

    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    assert len(shuffle_assign(empty).to_pandas()) == 0


def test_export_training_shards_end_to_end(ray_session, tmp_path):
    """The export sink writes hive-partitioned shard dirs whose union is
    exactly the curated keep-list, each shard internally in (pos) reading
    order matching the shuffle layout — and a re-run into a fresh dir is
    byte-identical (determinism = per-shard resumability)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.curation import curate_keep_list
    from fhir_data_validation_ray.pipelines.export import export_training_shards

    src = f"{SF_DIR}/documents.parquet"

    def docs():
        return rd.read_parquet(src, columns=["doc_id", "text"])

    out1 = str(tmp_path / "shards1")
    m = export_training_shards(docs(), out1, n_shards=8, sample_rate=0.9)
    assert m["n_shards"] == 8 and m["n_docs"] > 0

    keep = sorted(curate_keep_list(docs(), sample_rate=0.9).to_pandas()["doc_id"])
    tbl = (pads.dataset(out1, partitioning="hive").to_table()
           .to_pandas().astype({"shard": "int64"}))
    assert sorted(tbl.doc_id) == keep
    assert m["n_docs"] == len(keep)
    for _, g in tbl.groupby("shard"):
        assert sorted(g.pos) == list(range(len(g)))

    out2 = str(tmp_path / "shards2")
    export_training_shards(docs(), out2, n_shards=8, sample_rate=0.9)
    tbl2 = (pads.dataset(out2, partitioning="hive").to_table()
            .to_pandas().astype({"shard": "int64"}))
    key = ["shard", "pos", "doc_id", "text"]
    assert tbl.sort_values(key).reset_index(drop=True).equals(
        tbl2.sort_values(key).reset_index(drop=True))


def test_export_jsonl_lane_matches_parquet(ray_session, tmp_path):
    """The JSONL sink holds the same contract as the parquet lane: the
    file union is exactly the curated keep-list in the same shuffle layout,
    files are pos-sorted, chunked under rows_per_file, and a re-run is
    byte-identical file by file."""
    import glob
    import json as _json

    import pyarrow.dataset as pads
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.export import export_training_shards

    src = f"{SF_DIR}/documents.parquet"

    def docs():
        return rd.read_parquet(src, columns=["doc_id", "text"])

    outp = str(tmp_path / "pq")
    outj = str(tmp_path / "jl")
    mp = export_training_shards(docs(), outp, n_shards=8, sample_rate=0.9)
    mj = export_training_shards(docs(), outj, n_shards=8, sample_rate=0.9,
                                fmt="jsonl")
    assert mj["n_docs"] == mp["n_docs"] and mj["fmt"] == "jsonl"

    want = (pads.dataset(outp, partitioning="hive").to_table()
            .to_pandas().astype({"shard": "int64"}))
    rows = []
    for path in glob.glob(f"{outj}/shard=*/part-*.jsonl"):
        shard = int(path.split("shard=")[1].split("/")[0])
        chunk = [_json.loads(line) for line in open(path)]
        poss = [r["pos"] for r in chunk]
        assert poss == sorted(poss)  # pos-sorted within each file
        rows += [dict(r, shard=shard) for r in chunk]
    assert len(rows) == mp["n_docs"]
    got = {(r["shard"], r["pos"], r["doc_id"], r["text"]) for r in rows}
    assert got == set(map(tuple, want[["shard", "pos", "doc_id", "text"]]
                          .itertuples(index=False)))

    outj2 = str(tmp_path / "jl2")
    export_training_shards(docs(), outj2, n_shards=8, sample_rate=0.9,
                           fmt="jsonl")
    f1 = sorted(glob.glob(f"{outj}/shard=*/part-*.jsonl"))
    f2 = sorted(glob.glob(f"{outj2}/shard=*/part-*.jsonl"))
    assert [p.replace(outj, "") for p in f1] == [
        p.replace(outj2, "") for p in f2]
    for a, b in zip(f1, f2):
        assert open(a).read() == open(b).read()  # byte-identical re-run


def test_chunk_documents_semantics(ray_session):
    """Overlap layout, short-tail chunks, empty/null docs, empty blocks."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import chunk_documents

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(
            ["a b c d e f g h i j",  # 10 words: chunks at 0,4,8
             "x y",                  # shorter than one chunk
             "",                     # zero words -> no rows
             None],
            pa.string()),
    }))
    df = (chunk_documents(docs, size=6, stride=4).to_pandas()
          .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    d1 = df[df.doc_id == 1]
    assert d1.chunk_text.tolist() == ["a b c d e f", "e f g h i j", "i j"]
    assert d1.n_words.tolist() == [6, 6, 2]
    assert df[df.doc_id == 2].chunk_text.tolist() == ["x y"]
    assert set(df.doc_id) == {1, 2}
    # consecutive chunks of one doc overlap by size - stride words
    first, second = d1.chunk_text.iloc[0].split(), d1.chunk_text.iloc[1].split()
    assert first[-2:] == second[:2]

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    assert len(chunk_documents(empty).to_pandas()) == 0


def test_normalize_text_semantics(ray_session):
    """Each normalization step, null handling, two-valued changed flag."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import normalize_text

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(
            ["  MiXeD   Case\x01\x1f text \x7f ", "already clean", "", None],
            pa.string()),
    }))
    df = normalize_text(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df.norm_text.tolist()[:3] == ["mixed case text", "already clean", ""]
    assert df.norm_text.isna().tolist() == [False, False, False, True]
    assert df.changed.tolist() == [True, False, False, False]


def test_segment_dedup_semantics(ray_session):
    """Banner removal across docs, within-doc repeats don't count as
    frequent, zero-word docs survive, max_frequent raises."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import segment_dedup

    b = "b1 b2 b3 b4"  # 4 words == seg_words below
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(
            [f"{b} u1 u2 u3 u4 tail",    # banner + unique + short tail
             f"{b} v1 v2 v3 v4",
             "r1 r2 r3 r4 r1 r2 r3 r4",  # same seg TWICE in ONE doc: not frequent
             "",
             None],
            pa.string()),
    }))
    df = (segment_dedup(docs, seg_words=4, min_docs=2).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert df.doc_id.tolist() == [1, 2, 3, 4, 5]  # one row per input doc
    assert df.n_segs.tolist() == [3, 2, 2, 0, 0]
    assert df.n_dropped.tolist() == [1, 1, 0, 0, 0]
    assert df.cleaned_text.tolist() == [
        "u1 u2 u3 u4 tail", "v1 v2 v3 v4",
        "r1 r2 r3 r4 r1 r2 r3 r4", "", ""]

    # pinned broadcast lane still fails loudly on overflow; auto falls back
    # to the join lane with identical output (equivalence tested at corpus
    # scale in test_frequent_set_lane_equivalence)
    with pytest.raises(RuntimeError, match="max_frequent"):
        (segment_dedup(docs, seg_words=4, min_docs=2, max_frequent=0,
                       lane="broadcast").to_pandas())
    fb = (segment_dedup(docs, seg_words=4, min_docs=2, max_frequent=0)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert fb.n_dropped.tolist() == [1, 1, 0, 0, 0]


def test_prefix_containment_semantics(ray_session):
    """Chain containment, multi-container counts, min-id witness via the
    sparse-table range-min, and no self/equal-text matches."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import prefix_containment

    base = "w1 w2 w3 w4"  # 4 words == prefix_words below
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "text": pa.array(
            [base,                      # contained by 2, 3, 4
             base + " a",               # contained by 3
             base + " a b",
             base + " z",
             base,                      # equal text to doc 1: NOT a container
             "short one",               # < prefix_words: ineligible
             None],
            pa.string()),
    }))
    df = (prefix_containment(docs, prefix_words=4).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    got = {r.doc_id: (r.n_containers, r.container_doc_id)
           for r in df.itertuples()}
    # docs 1 and 5 (equal texts) are each contained by 2, 3, 4 — min id 2
    assert got[1] == (3, 2) and got[5] == (3, 2)
    assert got[2] == (1, 3)
    assert set(got) == {1, 2, 5}


def test_range_min_matches_numpy(ray_session):
    """Sparse-table RMQ equals per-query numpy min over random ranges."""
    import numpy as np

    from fhir_data_validation_ray.stages.dedup import _range_min

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1000, size=257).astype(np.int64)
    lo = rng.integers(0, 256, size=500).astype(np.int64)
    span = rng.integers(1, 257 - lo, size=500).astype(np.int64)
    hi = lo + span
    got = _range_min(vals, lo, hi)
    want = np.array([vals[a:b].min() for a, b in zip(lo, hi)])
    assert (got == want).all()


def test_decontaminate_bloom_lane_matches_exact(ray_session):
    """The bloom membership structure (over-flag-only, fixed 2MB broadcast
    here) must reproduce the exact lane on the fixture corpus — inputs are
    fixed and the filter is RNG-free, so this is deterministic — and a
    deliberately tiny filter must over-flag, never under-flag."""
    import numpy as np
    import pandas as pd

    from fhir_data_validation_ray.pipelines.dataops import (
        DECON_MIN_OVERLAP,
        q_decontaminate,
    )
    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.dedup import decontaminate

    exact = (q_decontaminate(SF_DIR).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))

    import pyarrow as pa
    import ray.data as rd

    def half(is_bench):
        def f(t):
            ids = np.asarray(t["doc_id"]).astype(np.int64)
            m = hash_str(ids.astype("U")) % np.uint64(4) == 0
            return t.filter(pa.array(m if is_bench else ~m))
        return f

    def docs():
        return rd.read_parquet(f"{SF_DIR}/documents.parquet",
                               columns=["doc_id", "text"])

    bloom = (decontaminate(docs().map_batches(half(False), batch_format="pyarrow"),
                           docs().map_batches(half(True), batch_format="pyarrow"),
                           n=2, min_overlap=DECON_MIN_OVERLAP,
                           structure="bloom", bloom_bits=1 << 24)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(exact, bloom)

    # 256-bit filter: saturates -> everything with >= min_overlap shingles
    # of ANY kind gets flagged; must be a SUPERSET of the exact flags
    tiny = (decontaminate(docs().map_batches(half(False), batch_format="pyarrow"),
                          docs().map_batches(half(True), batch_format="pyarrow"),
                          n=2, min_overlap=DECON_MIN_OVERLAP,
                          structure="bloom", bloom_bits=256, bloom_k=2)
            .to_pandas())
    assert set(exact.doc_id).issubset(set(tiny.doc_id))


def test_new_dedup_ops_identical_across_read_parallelism(ray_session):
    """segment_dedup and prefix_containment are pure functions of the
    corpus — 2-block and 8-block reads must agree exactly (per-batch
    partials + global exchanges may NOT depend on block boundaries)."""
    import pandas as pd
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import (
        prefix_containment,
        segment_dedup,
    )

    def docs(nblocks):
        return rd.read_parquet(f"{SF_DIR}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=nblocks)

    for op, sort_cols in ((lambda d: segment_dedup(d, min_docs=2),
                           ["doc_id"]),
                          (prefix_containment, ["doc_id"])):
        a = op(docs(2)).to_pandas().sort_values(sort_cols).reset_index(drop=True)
        b = op(docs(8)).to_pandas().sort_values(sort_cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_corpus_diff_semantics(ray_session):
    """Status categories, churn-only output (unchanged docs emit nothing),
    and null-text handling."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.joins import corpus_diff

    old = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["same", "will change", "will vanish", None, "x"],
                         pa.string()),
    }))
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 4, 5, 6], pa.int64()),
        "text": pa.array(["same", "changed!", None, "x", "brand new"],
                         pa.string()),
    }))
    df = corpus_diff(old, new).to_pandas().sort_values("doc_id")
    got = dict(zip(df.doc_id, df.status))
    # doc 1 unchanged -> absent; doc 4 null -> null on both sides -> absent
    assert got == {2: "changed", 3: "removed", 6: "added"}


def test_dup_ngram_coverage_semantics(ray_session):
    """Position-level coverage accounting: shared passage positions count
    per OCCURRENCE, within-doc repeats alone aren't frequent (distinct-doc
    counting), short/empty/null docs emit 0/0, max_frequent raises."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import dup_ngram_coverage

    p = "p1 p2 p3"  # shared 3-word passage == one 3-gram
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(
            [f"a1 a2 {p} a3",          # grams: a1-a2-p1, a2-p1-p2, p1-p2-p3, p2-p3-a3
             f"b1 {p} b2 {p}",         # passage twice -> 2 frequent positions ...
             "c1 c2 c3 c1 c2 c3 c1 c2 c3",  # own repeats only: never frequent
             "w1 w2",                  # < n words -> 0 positions
             "",
             None],
            pa.string()),
    }))
    df = (dup_ngram_coverage(docs, n=3, min_docs=2).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert df.doc_id.tolist() == [1, 2, 3, 4, 5, 6]
    assert df.n_grams.tolist() == [4, 6, 7, 0, 0, 0]
    # doc 1: p1-p2-p3 at one position; doc 2: at two positions (occurrence
    # counting); doc 3's self-repeated grams appear in ONE distinct doc only
    assert df.n_dup.tolist() == [1, 2, 0, 0, 0, 0]

    with pytest.raises(RuntimeError, match="max_frequent"):
        (dup_ngram_coverage(docs, n=3, min_docs=2, max_frequent=0,
                            lane="broadcast").to_pandas())
    fb = (dup_ngram_coverage(docs, n=3, min_docs=2, max_frequent=0)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert fb.n_dup.tolist() == [1, 2, 0, 0, 0, 0]


def test_dup_ngram_coverage_identical_across_read_parallelism(ray_session):
    """Coverage is a pure function of the corpus — block boundaries must
    not affect the frequency exchange or the probe."""
    import pandas as pd
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import dup_ngram_coverage

    def docs(nblocks):
        return rd.read_parquet(f"{SF_DIR}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=nblocks)

    a = (dup_ngram_coverage(docs(2), n=3).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dup_ngram_coverage(docs(8), n=3).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a.n_dup.sum() >= 0 and (a.n_grams >= a.n_dup).all()


def test_embed_dedup_keep_list_semantics(ray_session):
    """Component canonicals survive, non-canonical members drop, unpaired
    vectors always survive (orthogonal / below-threshold)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.curation import embed_dedup_keep_list

    def unit(v):
        a = np.asarray(v, dtype=np.float64)
        return (a / np.linalg.norm(a)).tolist()

    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "embedding": pa.array([
            unit([1.0, 0.0, 0.0]),          # cluster A canonical
            unit([0.999, 0.01, 0.0]),       # near-dup of 1 -> drops
            unit([0.998, -0.02, 0.0]),      # near-dup of 1 -> drops
            unit([0.0, 1.0, 0.0]),          # cluster B canonical
            unit([0.0, 0.999, 0.01]),       # near-dup of 4 -> drops
            unit([0.0, 0.0, 1.0]),          # unpaired -> survives
        ], pa.list_(pa.float32())),
    }))
    kept = sorted(embed_dedup_keep_list(emb, threshold=0.95)
                  .to_pandas().vec_id.tolist())
    assert kept == [1, 4, 6]


def test_lm_coverage_semantics(ray_session):
    """Model = train-split grams with count >= min_count; held-out docs
    score n_hit positions and count_sum model mass; <n-word docs emit
    nothing."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.sampling import SAMPLE_MOD
    from fhir_data_validation_ray.stages.textops import lm_coverage

    ids = np.arange(1, 2000, dtype=np.int64)
    h = hash_str(ids.astype("U")) % np.uint64(SAMPLE_MOD)
    train = ids[h < 100_000]
    held = ids[h >= 100_000]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([train[0], train[1], held[0], held[1], held[2]],
                           pa.int64()),
        "text": pa.array([
            "a b a b",   # train: "a b" x2 (-> model, cnt=2), "b a" x1 (out)
            "x y",       # train: "x y" x1 -> below min_count, out
            "a b c",     # held: hits "a b" -> 2/1/2
            "q r",       # held: no hits -> 1/0/0
            "solo",      # held, <2 words -> no row
        ]),
    }))
    got = (lm_coverage(docs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = sorted([(int(held[0]), 2, 1, 2), (int(held[1]), 1, 0, 0)])
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_keep_best_prefers_longest_member(ray_session):
    """The near-dup component keeps its LONGEST member even when it has the
    highest doc_id — the policy difference vs curate_keep_list's min-id."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.curation import curate_keep_best

    base = " ".join(f"w{i}" for i in range(12))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([base, base + " extra tail", "totally different words"]),
    }))
    kept = sorted(curate_keep_best(docs).to_pandas().doc_id.tolist())
    assert kept == [2, 3]  # 2 is longer than its near-dup 1; 3 unclustered


def test_group_topn_ties_and_small_groups(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.stats import group_topn

    t = pa.table({
        "k": pa.array(["a", "a", "a", "a", "b"]),
        "v": pa.array([5, 9, 9, 1, 7], pa.int64()),
        "i": pa.array([10, 12, 11, 13, 20], pa.int64()),
    })
    got = (group_topn(rd.from_arrow(t), key="k", value="v", id_col="i", n=2)
           .to_pandas().sort_values(["k", "i"]).reset_index(drop=True))
    # a: both v=9 rows win, tie order irrelevant to membership; b: lone row
    assert [tuple(r) for r in got.itertuples(index=False)] == [
        ("a", 11, 9), ("a", 12, 9), ("b", 20, 7)]


def test_split_assign_bands_and_composability(ray_session):
    """Band labels match the manual hash-band computation, every row gets a
    label, and the train band IS the rate-0.9 hash sample (composability)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.sampling import (
        SAMPLE_MOD,
        sample_by_hash,
        split_assign,
    )

    ids = np.arange(1, 3000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    got = split_assign(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    h = (hash_str(ids.astype("U")) % np.uint64(SAMPLE_MOD)).astype(np.int64)
    want = np.where(h < 900_000, "train", np.where(h < 950_000, "val", "test"))
    assert got.split.tolist() == want.tolist()
    assert len(set(got.split)) == 3  # all three bands hit at this n
    train = set(got[got.split == "train"].doc_id)
    sampled = set(sample_by_hash(ds, 0.9).to_pandas().doc_id)
    assert train == sampled

    import pytest

    with pytest.raises(ValueError):
        split_assign(ds, bands=(("a", 0.5), ("b", 0.3))).count()


def test_sample_exact_n_matches_global_sort(ray_session):
    """The exactly-N sample equals the N smallest (hash, key) rows of a
    reference global sort, is independent of partitioning and refinement
    parameters (multi-round path forced via tiny num_buckets/max_boundary),
    and handles the n=0 / n>=corpus edges."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.sampling import sample_exact_n

    ids = np.arange(1, 2001).astype("U")
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)})).repartition(7)

    got = sample_exact_n(ds, 137, num_buckets=8, max_boundary=4)
    got_ids = sorted(got.to_pandas().doc_id)
    assert len(got_ids) == 137

    h = hash_str(ids)
    order = np.lexsort((ids, h))
    assert got_ids == sorted(ids[order[:137]])

    # same set on a different partitioning with wide single-round parameters
    alt = sample_exact_n(ds.repartition(3), 137, num_buckets=4096,
                         max_boundary=100_000)
    assert sorted(alt.to_pandas().doc_id) == got_ids

    assert sample_exact_n(ds, 5000).count() == 2000  # n >= corpus: unchanged
    assert sample_exact_n(ds, 0).count() == 0
    with pytest.raises(ValueError):
        sample_exact_n(ds, -1)


def test_sample_exact_n_by_group_balanced(ray_session):
    """Each group keeps exactly n rows (its n smallest (hash, key)); groups
    with <= n rows keep everything; result is partitioning-independent."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.sampling import sample_exact_n_by_group

    ids = np.arange(1, 831)
    grp = np.where(ids <= 400, "big_a", np.where(ids <= 800, "big_b", "tiny"))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids.astype("U")),
        "src": pa.array(grp.astype("U")),
    })).repartition(6)

    got = sample_exact_n_by_group(
        ds, 37, group_col="src", num_buckets=4, max_boundary=3
    ).to_pandas()
    sizes = got.groupby("src").size().to_dict()
    assert sizes == {"big_a": 37, "big_b": 37, "tiny": 30}  # tiny kept whole

    sids = ids.astype("U")
    h = hash_str(sids)
    for g in ("big_a", "big_b"):
        m = grp == g
        order = np.lexsort((sids[m], h[m]))
        want = set(sids[m][order[:37]])
        assert set(got[got.src == g].doc_id) == want

    alt = sample_exact_n_by_group(
        ds.repartition(2), 37, group_col="src", num_buckets=4096,
        max_boundary=100_000).to_pandas()
    assert sorted(alt.doc_id) == sorted(got.doc_id)


def test_tfidf_lanes_equivalent(ray_session):
    """The broadcast-df lane and the inverted-index exchange lane produce
    identical rows; auto picks broadcast under the doc threshold and index
    above it."""
    import pandas as pd
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import tfidf_top_terms

    def docs():
        return rd.read_parquet(f"{SF_DIR}/documents.parquet",
                               columns=["doc_id", "text"])

    key = ["doc_id", "term", "tf", "df", "score"]
    a = (tfidf_top_terms(docs(), lane="broadcast").to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (tfidf_top_terms(docs(), lane="index").to_pandas()
         .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a[key], b[key], check_dtype=False)

    c = (tfidf_top_terms(docs(), lane="auto", broadcast_max_docs=1)
         .to_pandas().sort_values(key).reset_index(drop=True))  # -> index
    pd.testing.assert_frame_equal(c[key], b[key], check_dtype=False)


def test_winnow_shared_run_guarantee(ray_session):
    """Winnowing's core guarantee: two documents sharing a run of w+k-1
    words share at least one selected fingerprint; short docs (< w k-gram
    positions) emit no rows; selection density is well under 1."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    shared = " ".join(f"run{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha beta gamma " + shared + " delta epsilon zeta eta",
            "one two three four five " + shared + " six seven",
            "too short",  # fewer than w k-gram positions
        ]),
    })
    rows = winnow_fingerprints(rd.from_arrow(docs)).take_all()
    by_doc: dict[int, set[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared run must share a fingerprint"
    assert 3 not in by_doc
    n_pos_1 = len(docs["text"][0].as_py().split()) - WINNOW_K + 1
    assert len([r for r in rows if r["doc_id"] == 1]) < n_pos_1


def test_norm_dedup_collapses_case_twins(ray_session):
    """The uppercased twin rows (doc_id + 1e9) always drop; survivors are a
    subset of real doc_ids."""
    from fhir_data_validation_ray.pipelines.dataops import q_norm_dedup

    kept = q_norm_dedup(SF_DIR).to_pandas().doc_id
    assert (kept < 1_000_000_000).all()


def test_exact_int_quantiles_ranks(ray_session):
    """Quantile q = smallest v with count(<=v) >= ceil(q*n), pinned on a
    tiny known distribution."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.stats import exact_int_quantiles

    # ten values 1..10: p25 -> ceil(2.5)=3rd smallest = 3; p50 -> 5; p95 -> 10
    ds = rd.from_arrow(pa.table({"x": pa.array(list(range(10, 0, -1)), pa.int64())}))
    t = exact_int_quantiles(ds, "x").to_pandas()
    assert t.iloc[0][["n", "p25", "p50", "p75", "p95"]].tolist() == [10, 3, 5, 8, 10]


def test_percentile_rank_ties(ray_session):
    """n_smaller counts STRICTLY smaller values (ties share a rank, like
    SQL rank()-1); pct_ppm is the integer ppm against n-1."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.stats import percentile_rank

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b", "c", "d", "e"]),
        "x": pa.array([5, 1, 5, 2, 9], pa.int64()),
    }))
    t = percentile_rank(ds, "x").to_pandas().set_index("doc_id")
    assert t.loc["b", "n_smaller"] == 0
    assert t.loc["d", "n_smaller"] == 1
    assert t.loc["a", "n_smaller"] == 2 and t.loc["c", "n_smaller"] == 2
    assert t.loc["e", "n_smaller"] == 4
    assert t.loc["e", "pct_ppm"] == 1_000_000
    assert t.loc["a", "pct_ppm"] == 2 * 1_000_000 // 4


def test_quality_score_weights_lane(ray_session):
    """The trained-weights lane gathers from the broadcast table; empty and
    zero-word docs score 0 and pass a >= 0 gate."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.textops import QS_DIM, quality_score

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b", "c"]),
        "text": pa.array(["good good bad", "", "bad"]),
    }))
    w = np.zeros(QS_DIM, dtype=np.int64)
    w[int(hash_str(np.array(["good"])) % np.uint64(QS_DIM))] = 3
    w[int(hash_str(np.array(["bad"])) % np.uint64(QS_DIM))] = -2
    t = quality_score(ds, weights=w).to_pandas().set_index("doc_id")
    assert t.loc["a", "q_score"] == 4 and t.loc["a", "keep"] == 1
    assert t.loc["b", "q_score"] == 0 and t.loc["b", "keep"] == 1
    assert t.loc["c", "q_score"] == -2 and t.loc["c", "keep"] == 0


def test_mixture_apply_prefix_semantics(ray_session):
    """Kept docs per group = the hash-ordered prefix whose cumulative token
    count fits the group quota; verified against a brute-force reference."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.textops import mixture_apply

    rng_ids = np.arange(1, 61, dtype=np.int64)
    src = np.where(rng_ids % 2 == 0, "sA", "sB")
    texts = ["tok " * (3 + int(i % 5)) for i in rng_ids]  # 3..7 words + ''
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(rng_ids),
        "text": pa.array([t.strip() for t in texts]),
        "source": pa.array(src.astype(object), pa.string()),
        "lang": pa.array(["en"] * len(rng_ids)),
    }))
    budget = 60
    got = sorted(mixture_apply(docs, budget=budget, block_bits=4)
                 .to_pandas().doc_id.tolist())

    # brute-force reference
    ntok = np.array([len(t.strip().split()) for t in texts], dtype=np.int64)
    nt = {g: int(ntok[src == g].sum()) for g in ("sA", "sB")}
    tot = sum(nt.values())
    fl = {g: budget * v // tot for g, v in nt.items()}
    rem = {g: budget * v % tot for g, v in nt.items()}
    short = budget - sum(fl.values())
    for g in sorted(rem, key=lambda g: (-rem[g], g))[:short]:
        fl[g] += 1
    h = hash_str(rng_ids.astype("U"))
    want = []
    for g in ("sA", "sB"):
        m = np.flatnonzero(src == g)
        order = m[np.lexsort((rng_ids[m], h[m]))]
        cum = np.cumsum(ntok[order])
        want += rng_ids[order[cum <= fl[g]]].tolist()
    assert got == sorted(want)
    assert 0 < len(got) < len(rng_ids)  # budget binds: true selection


def test_retention_cohorts_hot_user_and_guard(ray_session):
    """A 90%-hot-user stream retains correctly; out-of-range windows raise."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import (
        US_PER_HOUR,
        retention_cohorts,
    )

    # hot user 1 active in windows 0..9; user 2 only in window 0 and 2
    ts, uid = [], []
    for w in range(10):
        for _ in range(90):
            ts.append(w * US_PER_HOUR + 5)
            uid.append(1)
    ts += [5, 2 * US_PER_HOUR + 5]
    uid += [2, 2]
    ev = rd.from_arrow(pa.table({
        "ts": pa.array(np.array(ts, dtype="int64"), pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
    }))
    got = {(r.window_id, r.horizon): r.n_users
           for r in retention_cohorts(ev).to_pandas().itertuples()}
    assert got[(0, 0)] == 2          # both users active in w0
    assert got[(0, 1)] == 1          # only the hot user returns in w1
    assert got[(0, 2)] == 2          # user 2 skips w1 but returns in w2
    assert got[(9, 0)] == 1 and (9, 1) not in got  # open end emits no zeros

    bad = rd.from_arrow(pa.table({
        "ts": pa.array(np.array([(1 << 20) * US_PER_HOUR], "int64"),
                       pa.timestamp("us")),
        "user_id": pa.array([1], pa.int64()),
    }))
    with pytest.raises(Exception, match="window ids must fit"):
        retention_cohorts(bad).count()


def test_funnel_levels_cross_block_and_strict_ts(ray_session):
    """Funnel completes across time-block boundaries; a same-timestamp next
    step does NOT count (strict >); never-stepping users land at level 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import US_PER_HOUR, funnel_levels

    B = 6 * US_PER_HOUR
    rows = [
        # user 1: view in block 0, click in block 2, purchase in block 5 -> 3
        (1, 5, "view"), (1, 2 * B + 1, "click"), (1, 5 * B + 1, "purchase"),
        # user 2: click/purchase at the SAME ts as view -> only level 1
        (2, 100, "view"), (2, 100, "click"), (2, 100, "purchase"),
        # user 3: purchase BEFORE view, then view -> level 1 (order matters)
        (3, 50, "purchase"), (3, 60, "view"),
        # user 4: only error/signup events -> level 0
        (4, 10, "error"), (4, 20, "signup"),
        # user 5: view then click, same block -> level 2
        (5, 10, "view"), (5, 11, "click"),
    ]
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], "int64"),
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    }))
    got = {r.level: r.n_users
           for r in funnel_levels(ev).to_pandas().itertuples()}
    assert got == {0: 1, 1: 2, 2: 1, 3: 1}


def test_export_with_split_partitions(ray_session, tmp_path):
    """split_bands partitions the export split=NAME/shard=N; band membership
    matches split_assign exactly and survivors are unchanged."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.export import export_training_shards
    from fhir_data_validation_ray.stages.sampling import SPLIT_BANDS, split_assign

    docs = lambda: rd.read_parquet(f"{SF_DIR}/documents.parquet",
                                   columns=["doc_id", "text"])
    out = str(tmp_path / "shards_split")
    m = export_training_shards(docs(), out, n_shards=4, sample_rate=0.9,
                               split_bands=SPLIT_BANDS)
    assert m["split"] is True
    got = (pads.dataset(out, partitioning="hive")
           .to_table(columns=["doc_id", "split"]).to_pandas())
    want = split_assign(
        rd.from_pandas(got[["doc_id"]]), bands=SPLIT_BANDS
    ).to_pandas()
    merged = got.merge(want, on="doc_id", suffixes=("_got", "_want"))
    assert (merged.split_got.astype(str) == merged.split_want).all()
    assert set(got.split.astype(str)) <= {"train", "val", "test"}
    # same survivors as the unsplit export
    out2 = str(tmp_path / "shards_plain")
    export_training_shards(docs(), out2, n_shards=4, sample_rate=0.9)
    plain = (pads.dataset(out2, partitioning="hive")
             .to_table(columns=["doc_id"]).to_pandas())
    assert sorted(got.doc_id) == sorted(plain.doc_id)


def test_incremental_revalidate_matches_full(ray_session):
    """Incremental revalidation over a mutated snapshot equals the full
    validation of the new snapshot restricted to added+changed docs;
    removed and unchanged docs emit nothing."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.pipelines.validate import (
        fixture_paths,
        incremental_revalidate,
    )
    from fhir_data_validation_ray.sources.readers import read_documents
    from fhir_data_validation_ray.stages.validator import validate_dataset
    from fhir_data_validation_ray.pipelines.profiles import default_profile

    paths = fixture_paths("/root/testdata/sf0.001")
    old = lambda: read_documents(paths["docs"])

    def mutate(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks() if isinstance(
            t["doc_id"], pa.ChunkedArray) else t["doc_id"]
        h = hash_str(ids.to_numpy(zero_copy_only=False).astype("U"))
        lens = pc.list_value_length(t["spans"]).fill_null(0).to_numpy(
            zero_copy_only=False)
        removed = (h % np.uint64(11)) == 0
        changed = ((h % np.uint64(13)) == 0) & ~removed & (lens >= 2)
        spans = pc.if_else(pa.array(changed),
                           pc.list_slice(t["spans"], 0, 1), t["spans"])
        base = pa.table({"doc_id": ids, "spans": spans}).filter(
            pa.array(~removed))
        addm = ((h % np.uint64(17)) == 0) & ~removed
        extra = pa.table({
            "doc_id": pa.array([s + "-new" for s in
                                np.asarray(ids)[addm].tolist()], pa.string()),
            "spans": t["spans"].filter(pa.array(addm)),
        })
        return pa.concat_tables([base, extra])

    new = lambda: old().map_batches(mutate, batch_format="pyarrow")

    inc = (incremental_revalidate(old(), new(), default_profile())
           .to_pandas())

    # expected churn set, computed independently from the parquet source
    import pyarrow.parquet as pq
    src = pq.read_table(paths["docs"])
    ids = src["doc_id"].combine_chunks().to_numpy(zero_copy_only=False).astype("U")
    h = hash_str(ids)
    lens = pc.list_value_length(src["spans"]).fill_null(0).to_numpy(
        zero_copy_only=False)
    removed = (h % np.uint64(11)) == 0
    changed = ((h % np.uint64(13)) == 0) & ~removed & (lens >= 2)
    added = ((h % np.uint64(17)) == 0) & ~removed
    churn = set(ids[changed].tolist()) | {s + "-new" for s in ids[added]}
    assert churn, "fixture must produce a non-empty churn"

    full = validate_dataset(new(), default_profile()).to_pandas()
    want = full[full.doc_id.isin(churn)]

    cols = sorted(set(inc.columns) & set(want.columns))
    a = inc[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)
    assert set(inc.doc_id) <= churn


def test_curation_classifier_stream(ray_session):
    """classifier_threshold adds a pure-subset gate: the gated keep-list is
    contained in the ungated one, and an impossible threshold empties it."""
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.curation import curate_keep_list

    docs = lambda: rd.read_parquet(f"{SF_DIR}/documents.parquet",
                                   columns=["doc_id", "text"])
    base = set(curate_keep_list(docs()).to_pandas()["doc_id"])
    gated = set(curate_keep_list(docs(), classifier_threshold=0)
                .to_pandas()["doc_id"])
    assert gated <= base
    assert 0 < len(gated)
    none = curate_keep_list(docs(), classifier_threshold=10**9).to_pandas()
    assert len(none) == 0


def test_bpe_merges_classic_example(ray_session):
    """The Sennrich et al. running example: low/lower/newest/widest counts
    produce the canonical first merges (highest pair count, lexicographic
    tie-break)."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import bpe_merges

    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                   "text": pa.array([corpus], pa.string())}))
    t = bpe_merges(docs, n_merges=5, min_freq=1).to_pydict()
    got = list(zip(t["left"], t["right"]))
    assert got == [("e", "s"), ("es", "t"), ("est", "</w>"),
                   ("l", "o"), ("lo", "w")]
    assert t["token"][:3] == ["es", "est", "est</w>"]


def test_word_counts_min_freq_prunes_in_bucket(ray_session):
    """min_freq filtering happens inside the bucket fold — the returned
    vocabulary only holds survivors (and totals are exact across batches)."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import word_counts

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a a a b", "b c"], pa.string()),
    })).repartition(2)
    t = word_counts(docs, min_freq=2).to_pandas().set_index("word")["n"]
    assert dict(t) == {"a": 3, "b": 2}


def test_bpe_encode_applies_merges(ray_session):
    """Tokenizer inference: with the classic example's merges, 'lowest'
    tokenizes as lo|w|est</w> (3 tokens) and unseen chars stay atomic."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import bpe_encode, bpe_merges

    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    train = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                    "text": pa.array([corpus], pa.string())}))
    merges = bpe_merges(train, n_merges=5, min_freq=1)

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["lowest", "low low", "xyz"], pa.string()),
    }))
    t = bpe_encode(docs, merges).to_pandas().set_index("doc_id")
    # lowest: es -> est -> est</w> -> lo -> low  =>  low | est</w>
    assert t.loc[1, "n_tokens"] == 2 and t.loc[1, "n_words"] == 1
    # low: lo -> low  =>  low | </w>, twice
    assert t.loc[2, "n_tokens"] == 4 and t.loc[2, "n_words"] == 2
    # xyz: no merges apply -> x y z </w> stay atomic
    assert t.loc[3, "n_tokens"] == 4 and t.loc[3, "n_words"] == 1


def test_cluster_cap_binds_and_respects_assignment(ray_session):
    """Survivors are a subset of the full assignment, every cluster holds
    at most the cap, and any cluster that exceeded the cap is cut to it."""
    import numpy as np
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.curation import (
        cluster_assign,
        cluster_cap_keep,
        hash_centroids,
    )

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    seed = docs.map_batches(
        lambda t: t.filter(np.asarray(t["doc_id"]).astype("int64") < 8),
        batch_format="pyarrow")
    cents = hash_centroids(seed, 8)
    assert cents.shape == (8, 8)

    full = cluster_assign(docs, cents).to_pandas()
    cap = 5
    kept = cluster_cap_keep(docs, cents, cap=cap).to_pandas()

    merged = kept.merge(full, on="doc_id", suffixes=("", "_full"))
    assert len(merged) == len(kept)
    assert (merged.cluster == merged.cluster_full).all()
    assert (merged.score == merged.score_full).all()

    kept_sizes = kept.groupby("cluster").size()
    full_sizes = full.groupby("cluster").size()
    assert (kept_sizes <= cap).all()
    for cl, n in full_sizes.items():
        assert kept_sizes.get(cl, 0) == min(n, cap)


def test_hash_centroids_rejects_short_seed(ray_session):
    import numpy as np
    import pytest as _pytest
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.curation import hash_centroids

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    seed = docs.map_batches(
        lambda t: t.filter(np.asarray(t["doc_id"]).astype("int64") < 3),
        batch_format="pyarrow")
    with _pytest.raises(ValueError, match="3 rows < k=8"):
        hash_centroids(seed, 8)


def test_kmeans_recovers_planted_blobs(ray_session):
    """Two blobs of identical texts seeded with one centroid each: Lloyd
    must land each centroid exactly on its blob's embedding point with
    exact member counts (integer arithmetic -> bitwise deterministic)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.curation import (
        hash_centroids,
        kmeans_train,
    )
    from fhir_data_validation_ray.stages.textops import hash_embed

    texts = ["alpha beta gamma"] * 30 + ["delta epsilon zeta qq"] * 20
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(50), pa.int64()),
        "text": pa.array(texts),
    }))
    seed = docs.map_batches(
        lambda t: t.filter(pc.is_in(t["doc_id"],
                                    value_set=pa.array([0, 30], pa.int64()))),
        batch_format="pyarrow")
    init = hash_centroids(seed, 2)

    C, counts = kmeans_train(docs, init, iters=2)
    pts = hash_embed(docs, dim=8).to_pandas().set_index("doc_id")
    blob_a = pts.loc[0].to_numpy()
    blob_b = pts.loc[30].to_numpy()
    np.testing.assert_array_equal(C[0], blob_a)
    np.testing.assert_array_equal(C[1], blob_b)
    np.testing.assert_array_equal(counts, [30, 20])


def test_cluster_assign_l2_metric(ray_session):
    """With l2 the blob's own centroid wins at distance 0; a bad metric
    name raises."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.curation import (
        cluster_assign,
        hash_centroids,
    )

    texts = ["alpha beta gamma"] * 5 + ["delta epsilon zeta qq"] * 5
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9], pa.int64()),
        "text": pa.array(texts),
    }))
    seed = docs.map_batches(
        lambda t: t.filter(np.isin(np.asarray(t["doc_id"]), [0, 5])),
        batch_format="pyarrow")
    cents = hash_centroids(seed, 2)

    out = cluster_assign(docs, cents, metric="l2").to_pandas()
    assert (out.score == 0).all()  # every doc sits ON its blob centroid
    assert set(out[out.doc_id < 5].cluster) == {0}
    assert set(out[out.doc_id >= 5].cluster) == {1}

    with _pytest.raises(ValueError, match="metric"):
        cluster_assign(docs, cents, metric="cosine")


def test_cluster_ops_tolerate_empty_corpus(ray_session):
    """Zero-row corpora: kmeans keeps its init centroids with zero counts,
    assignment and band tagging pass empty blocks through cleanly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.curation import (
        cluster_assign,
        cluster_cap_keep,
        kmeans_train,
    )
    from fhir_data_validation_ray.stages.stats import quantile_band_assign

    empty_docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    init = np.arange(16, dtype=np.int64).reshape(2, 8)

    C, counts = kmeans_train(empty_docs, init, iters=2)
    np.testing.assert_array_equal(C, init)
    np.testing.assert_array_equal(counts, [0, 0])

    assert len(cluster_assign(empty_docs, init).take_all()) == 0
    assert len(cluster_cap_keep(empty_docs, init, cap=3).take_all()) == 0

    empty_vals = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_chars": pa.array([], pa.int64())}))
    assert len(quantile_band_assign(empty_vals, col="n_chars").take_all()) == 0


def test_strip_dup_spans_removes_only_shared_windows(ray_session):
    """The duplicated passage vanishes from every doc carrying it; text
    unique to a doc survives verbatim; singleton docs pass untouched."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import strip_dup_spans

    shared = "one two three four five"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            f"alpha beta {shared} gamma",
            f"{shared} delta epsilon",
            "lonely unique words only here",
        ]),
    }))
    out = (strip_dup_spans(docs, n=5, min_docs=2).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[0, "text"] == "alpha beta gamma"
    assert out.loc[0, "n_removed"] == 5
    assert out.loc[1, "text"] == "delta epsilon"
    assert out.loc[1, "n_removed"] == 5
    assert out.loc[2, "text"] == "lonely unique words only here"
    assert out.loc[2, "n_removed"] == 0


def test_frequent_set_lane_equivalence(ray_session):
    """The no-broadcast join lane is bit-identical to the broadcast lane on
    a real multi-block corpus — the 100-TB fallback for boilerplate-heavy
    inputs whose frequent set overflows the ray.put ceiling (VERDICT r3
    finding #1). Multi-block reads exercise the cross-batch distinct-doc
    counting (one row per (doc, unit) only holds because docs never split
    across batches; blocks shuffle unit rows across buckets)."""
    import pandas as pd
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import (
        dup_ngram_coverage,
        segment_dedup,
        strip_dup_spans,
    )

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"],
                           override_num_blocks=8)
    # tiny doc_shard so the rendezvous groupby has many multi-doc groups
    for op, sort_col in (
        (lambda lane: segment_dedup(docs, seg_words=4, min_docs=2,
                                    lane=lane, doc_shard=16), "doc_id"),
        (lambda lane: dup_ngram_coverage(docs, n=3, min_docs=2,
                                         lane=lane, doc_shard=16), "doc_id"),
        (lambda lane: strip_dup_spans(docs, n=3, min_docs=2,
                                      lane=lane, doc_shard=16), "doc_id"),
    ):
        a = (op("broadcast").to_pandas()
             .sort_values(sort_col).reset_index(drop=True))
        b = (op("join").to_pandas()
             .sort_values(sort_col).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        assert len(a) == docs.count()


def test_cooccurrence_and_confusion_tolerate_empty_corpus(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import (
        cooccurrence,
        lang_confusion,
        vocab_growth,
    )

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
    }))
    assert len(cooccurrence(empty, k=5).take_all()) == 0
    assert lang_confusion(empty).num_rows == 0
    vg = vocab_growth(empty, (10, 20))
    assert vg.to_pydict() == {"n_docs": [10, 20], "vocab_size": [0, 0]}


def test_interarrival_and_transitions_cross_block_boundaries(ray_session):
    """A user whose events sit in distant time blocks: the cross-block
    consecutive pair must be counted exactly once, with the (ts, event_id)
    order deciding transitions on ts ties."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import (
        US_PER_HOUR,
        interarrival_histogram,
        transition_counts,
    )

    h = US_PER_HOUR
    ts = pa.array([0, 60_000_000, 3 * h, 3 * h], pa.int64()).cast(
        pa.timestamp("us"))
    events = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "ts": ts,
        "event_type": pa.array(["a", "b", "c", "d"]),
    }))

    # deltas: 60s (bucket 1), 3h-60s (capped at 128), 0 (bucket 0)
    ia = interarrival_histogram(events).to_pydict()
    assert dict(zip(ia["bucket"], ia["n"])) == {0: 1, 1: 1, 128: 1}

    # transitions: a->b in block 0; b->c across blocks; c->d on the ts tie
    # (event_id order)
    tr = transition_counts(events).to_pydict()
    got = {(f, t): n for f, t, n in zip(tr["type_from"], tr["type_to"],
                                       tr["n"])}
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1}


def test_pagerank_hub_outranks_satellites(ray_session):
    """A hub duplicated by several satellites must get the highest rank;
    satellites of the same hub tie exactly (integer determinism)."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import PR_BASE, pagerank_dup

    hub = "the quick brown fox jumps over the lazy dog again and again"
    sat = hub + " tail"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([hub, sat, sat + " x", sat + " y",
                          "completely unrelated words elsewhere entirely"]),
    }))
    out = (pagerank_dup(docs, iters=3, n=2, threshold=0.5).to_pandas()
           .set_index("doc_id").sort_index())
    assert 4 not in out.index            # isolated doc is not a graph node
    assert out.loc[0, "rank"] == out["rank"].max()
    assert out.loc[0, "rank"] > PR_BASE


def test_mixture_upsample_epoch_semantics(ray_session):
    """With a budget of exactly 2x the corpus tokens and one group, every
    doc appears exactly twice (remainder 0 -> no hash-gated extras)."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import mixture_upsample

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b", "c d", "e f"]),
        "source": pa.array(["web"] * 3),
        "lang": pa.array(["en"] * 3),
    }))
    out = mixture_upsample(docs, budget=12).to_pandas()  # 6 tokens * 2
    counts = out.groupby("doc_id").size()
    assert (counts == 2).all() and len(counts) == 3
    assert set(out.copy_id) == {0, 1}


def test_burst_windows_boundary_equals_bruteforce(ray_session):
    """Forcing block_us == window_us (the minimum, maximum boundary
    crossings) must reproduce the plain per-user sliding-window maxima for
    a random event multiset — exercises the lookback-duplication stitch."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import burst_windows

    rng = np.random.default_rng(0)
    n, w = 600, 1_000
    users = rng.integers(0, 5, n).astype(np.int64)
    ts = rng.integers(0, 20 * w, n).astype(np.int64)  # ~20 blocks per user

    want = {}
    for u in np.unique(users):
        uts = np.sort(ts[users == u])
        counts = (np.searchsorted(uts, uts + w, side="right")
                  - np.searchsorted(uts, uts, side="left"))
        want[int(u)] = int(counts.max())

    ev = rd.from_arrow(pa.table({
        "user_id": pa.array(users),
        "ts": pa.array(ts.astype("datetime64[us]")),
    }))
    got = {int(r["user_id"]): int(r["burst"])
           for r in burst_windows(ev, window_us=w, block_us=w).take_all()}
    assert got == want


def test_burst_windows_rejects_small_block(ray_session):
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import burst_windows

    with pytest.raises(ValueError, match="block_us"):
        burst_windows(rd.range(1), window_us=100, block_us=50)


def test_table_audit_rejects_float_column(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.stats import table_audit

    ds = rd.from_arrow(pa.table({"x": pa.array([1.5, 2.5])}))
    with pytest.raises(Exception, match="float"):
        table_audit(ds, ["x"])


def test_gram_spectrum_tail_cap_and_total(ray_session):
    """A gram occurring > k_cap times lands in the k_cap+1 tail row; the
    k=0 row carries total distinct grams; sum of k>=1 rows == distinct."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import gram_spectrum

    # "a b" occurs 5x (tail, cap=3); "b a" 4x (tail); "c d" once; "b c" 1x... build explicitly
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(["a b a b a b", "a b a b a b", "c d", "x y", "x y"]),
    }))
    # bigram occurrence counts: "a b": 3+3=6, "b a": 2+2=4, "c d": 1, "x y": 2
    spec = gram_spectrum(docs, n=2, k_cap=3)
    out = dict(zip(spec["k"].to_pylist(), spec["n_grams"].to_pylist()))
    assert out[0] == 4            # distinct bigrams
    assert out[1] == 1            # "c d"
    assert out[2] == 1            # "x y"
    assert out[3] == 0
    assert out[4] == 2            # tail: "a b"(6), "b a"(4)
    assert sum(v for k, v in out.items() if k >= 1) == out[0]


def test_cross_shard_overlap_counts_distinct_shards(ray_session):
    """Duplicate group spanning 2 shards is reported once with exact
    member/shard counts; unique texts and single-shard groups are not."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.dedup import cross_shard_overlap

    # find two ids in different shards and two in the same shard (n=4)
    ids = np.arange(0, 64, dtype=np.int64)
    sh = (hash_str(ids.astype("U")) % np.uint64(4)).astype(int)
    a, b = ids[sh == sh[0]][:2]            # same shard pair
    c = ids[sh != sh[0]][0]                # different shard vs a
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([int(a), int(b), int(c), 999], pa.int64()),
        "text": pa.array(["same shard", "same shard", "cross", "cross"]),
    }))
    out = cross_shard_overlap(docs, n_shards=4).take_all()
    got = {int(r["group_id"]): (int(r["n_docs"]), int(r["n_shards"]))
           for r in out}
    # "same shard" group: 2 docs, 1 shard -> excluded unless 999 collides
    sh999 = int(hash_str(np.array(["999"], dtype="U"))[0] % np.uint64(4))
    shc = int(hash_str(np.array([str(c)], dtype="U"))[0] % np.uint64(4))
    if sh999 != shc:
        assert got == {min(int(c), 999): (2, 2)}
    else:
        assert min(int(c), 999) not in got and int(a) not in got


def test_edit_distance_drops_missing_and_null(ray_session):
    """Pairs referencing an absent doc or a NULL text drop (SQL inner-join +
    non-null semantics); surviving pairs score the exact Levenshtein."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import edit_distance_pairs

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["kitten", "sitting", None, ""], pa.string()),
    })).repartition(2)
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([1, 1, 2, 1, 3], pa.int64()),
        "doc_b": pa.array([2, 3, 4, 99, 4], pa.int64()),
    }))
    got = {(r["doc_a"], r["doc_b"]): r["edit_dist"]
           for r in edit_distance_pairs(docs, pairs,
                                        verify_buckets=4).take_all()}
    # (1,3)/(3,4): null text drops; (1,99): missing doc drops
    assert got == {(1, 2): 3, (2, 4): 7}


def test_delta_dedup_edge_cases(ray_session):
    """Corpus membership is string-verified, within-delta dups keep the
    lowest doc_id, and NULL texts drop on both sides."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import delta_dedup

    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array(["aaa", "bbb", None], pa.string()),
    })).repartition(2)
    delta = rd.from_arrow(pa.table({
        "doc_id": pa.array([5, 3, 4, 6, 7], pa.int64()),
        "text": pa.array(["ccc", "ccc", "aaa", None, "ddd"], pa.string()),
    })).repartition(2)
    got = sorted(r["doc_id"] for r in
                 delta_dedup(corpus, delta, num_buckets=4).take_all())
    # 3 wins the within-delta "ccc" tie; 4 collides with corpus "aaa";
    # 6 is NULL; 7 is fresh
    assert got == [3, 7]


def test_rank_fusion_competition_semantics(ray_session):
    """Ties share a rank and the next rank skips (competition/rank()
    semantics); fused is the exact sum of the three signal ranks."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.curation import rank_fusion

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        # doc1/doc2 same length (tie on s_len); doc4 null text
        "text": pa.array(["aa bb aa", "cc dd cc", "ee", None], pa.string()),
    })).repartition(2)
    got = {r["doc_id"]: r for r in rank_fusion(docs).take_all()}
    assert got[1]["r_len"] == 1 and got[2]["r_len"] == 1
    assert got[3]["r_len"] == 3 and got[4]["r_len"] == 4
    # s_distinct: doc1=2, doc2=2, doc3=1, doc4=0 -> ranks 1,1,3,4
    assert [got[i]["r_distinct"] for i in (1, 2, 3, 4)] == [1, 1, 3, 4]
    # s_rep asc: doc4=0 best, doc3=1, doc1=doc2=2 -> ranks 3,3,2,1
    assert [got[i]["r_rep"] for i in (1, 2, 3, 4)] == [3, 3, 2, 1]
    for i in (1, 2, 3, 4):
        assert got[i]["fused"] == (got[i]["r_len"] + got[i]["r_distinct"]
                                   + got[i]["r_rep"])
