"""Unit tests for filter_funnel (cascade attribution) and distinct_ngrams
(cross-batch distinct/total folding) — the oracle-parity suite covers the
default specs end-to-end; these pin the semantics on handcrafted corpora."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _from_table(tbl, blocks=1):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(blocks)


def test_funnel_charges_first_failing_stage(ray_session):
    """A doc failing several stages is counted ONLY at the first; later
    stages never see it (their n_in shrinks)."""
    from fhir_data_validation_ray.pipelines.curation import filter_funnel

    docs = pa.table({
        "a": pa.array([1, 0, 0, 1, 1, 0], pa.int64()),   # stage0 keep-mask
        "b": pa.array([1, 0, 1, 0, 1, 0], pa.int64()),   # stage1 keep-mask
        "c": pa.array([1, 0, 0, 0, 1, 1], pa.int64()),   # stage2 keep-mask
    })
    stages = [
        ("s0", lambda t: np.asarray(t["a"]).astype(bool)),
        ("s1", lambda t: np.asarray(t["b"]).astype(bool)),
        ("s2", lambda t: np.asarray(t["c"]).astype(bool)),
    ]
    got = {r["stage"]: r for r in
           filter_funnel(_from_table(docs, blocks=3), stages).take_all()}
    # rows: doc1/doc2/doc5 fail s0; doc3 passes s0, fails s1; doc0/doc4 pass all
    assert got["s0"]["n_in"] == 6 and got["s0"]["n_removed"] == 3
    assert got["s1"]["n_in"] == 3 and got["s1"]["n_removed"] == 1
    assert got["s2"]["n_in"] == 2 and got["s2"]["n_removed"] == 0
    assert got["s2"]["n_out"] == 2
    for r in got.values():
        assert r["n_out"] == r["n_in"] - r["n_removed"]


def test_funnel_empty_corpus(ray_session):
    from fhir_data_validation_ray.pipelines.curation import filter_funnel

    docs = pa.table({"a": pa.array([], pa.int64())})
    stages = [("s0", lambda t: np.asarray(t["a"]).astype(bool))]
    rows = filter_funnel(_from_table(docs), stages).take_all()
    assert rows == [] or all(r["n_in"] == 0 for r in rows)


def _ref_distinct_ngrams(rows, ns):
    """Per-(source, n) distinct/total via plain Python dicts."""
    from collections import defaultdict

    tot = defaultdict(int)
    seen = defaultdict(set)
    for src, text in rows:
        ws = [w for w in text.split(" ") if w != ""]
        for n in ns:
            for i in range(len(ws) - n + 1):
                g = " ".join(ws[i:i + n])
                tot[(src, n)] += 1
                seen[(src, n)].add(g)
    return {k: (len(seen[k]), tot[k]) for k in tot}


def test_distinct_ngrams_cross_batch_fold(ray_session):
    """Grams repeated across batches and shared across sources fold to the
    exact global distinct/total counts (per-batch pre-dedup is lossless)."""
    from fhir_data_validation_ray.stages.textops import distinct_ngrams

    rows = [
        ("s1", "a b a b a"),
        ("s1", "a b  c"),          # double space: empty word dropped
        ("s2", "a b a b a"),       # same text, other source
        ("s2", "x"),               # too short for bigrams/trigrams
        ("s1", ""),                # empty doc
    ]
    tbl = pa.table({"source": pa.array([r[0] for r in rows]),
                    "text": pa.array([r[1] for r in rows])})
    got = distinct_ngrams(_from_table(tbl, blocks=5), (1, 2, 3))
    got = {(r["source"], r["n"]): (r["distinct_grams"], r["total_grams"])
           for r in got.take_all()}
    assert got == _ref_distinct_ngrams(rows, (1, 2, 3))


def test_distinct_ngrams_no_cross_doc_adjacency(ray_session):
    """Bigrams never span a document boundary even when docs share a batch."""
    from fhir_data_validation_ray.stages.textops import distinct_ngrams

    tbl = pa.table({"source": pa.array(["s", "s"]),
                    "text": pa.array(["a b", "c d"])})
    got = distinct_ngrams(_from_table(tbl, blocks=1), (2,))
    rows = got.take_all()
    assert len(rows) == 1
    # "b c" must NOT exist: 2 bigrams total ("a b", "c d"), both distinct
    assert rows[0]["distinct_grams"] == 2 and rows[0]["total_grams"] == 2


def test_char_entropy_semantics(ray_session):
    """Repeated-single-char doc = exactly 0; uniform distinct chars =
    floor-sum of -p log2 p; ordering low(repetitive) < high(diverse);
    empty/null text skipped."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import char_entropy

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["aaaaaaaa", "abcdefgh", "aabb", "", None],
                         pa.string()),
    }))
    got = {r["doc_id"]: r for r in char_entropy(docs).take_all()}
    assert set(got) == {1, 2, 3}  # empty + null skipped
    assert got[1]["entropy_fp"] == 0 and got[1]["n_chars_counted"] == 8
    # 8 uniform symbols: entropy = 3 bits -> 8 contributions of
    # floor(-1e6 * (1/8) * -3) = 375000 each
    assert got[2]["entropy_fp"] == 3_000_000
    # 2 symbols at p=0.5: 2 * floor(1e6 * 0.5) = 1_000_000
    assert got[3]["entropy_fp"] == 1_000_000
    assert got[1]["entropy_fp"] < got[3]["entropy_fp"] < got[2]["entropy_fp"]
