"""Edge-case tests for source_vocab_overlap and props_rollup: NULL
sources/event_types/props, missing property keys, negative values, and
cross-batch distinctness — each checked against the same DuckDB oracle the
driver runs."""

import duckdb
import numpy as np
import pyarrow as pa


def _from_table(tbl, blocks=2):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(blocks)


# ------------------------------------------------------ source vocab overlap
def test_source_overlap_null_sources_and_repeats(ray_session):
    """NULL-source docs are dropped on both sides; repeated words across
    docs (and across batches) of a source collapse to DISTINCT before
    counting; only byte-ordered a<b pairs are emitted."""
    from fhir_data_validation_ray.pipelines.dataops import SOURCE_OVERLAP_SQL
    from fhir_data_validation_ray.stages.textops import source_vocab_overlap

    tbl = pa.table({
        "source": pa.array(["web", "web", "books", None, "code", "books"],
                           pa.string()),
        "text": pa.array([
            "the cat sat",          # web
            "the the dog",          # web (dup 'the' collapses)
            "the dog ran",          # books
            "the cat dog ran",      # NULL source — ignored entirely
            "def cat pass",         # code
            "",                     # books, empty text
        ], pa.string()),
    })
    got = {(r["source_a"], r["source_b"]): r["n_common"]
           for r in source_vocab_overlap(
               _from_table(tbl, blocks=3)).take_all()}
    con = duckdb.connect()
    con.register("documents", tbl)
    want = {(a, b): n
            for a, b, n in con.execute(SOURCE_OVERLAP_SQL).fetchall()}
    con.close()
    assert got == want
    # hand check: web∩books = {the, dog}; web∩code = {cat}; books∩code = {}
    assert got == {("books", "web"): 2, ("code", "web"): 1}


def test_source_overlap_all_null_sources(ray_session):
    from fhir_data_validation_ray.stages.textops import source_vocab_overlap

    tbl = pa.table({
        "source": pa.array([None, None], pa.string()),
        "text": pa.array(["a b", "b c"], pa.string()),
    })
    assert source_vocab_overlap(_from_table(tbl)).take_all() == []


# ------------------------------------------------------------- props rollup
def test_props_rollup_missing_key_null_type_negative(ray_session):
    """Rows whose props lack the key (or are NULL) count into n_events but
    not the value aggregates; a NULL event_type keeps its own group;
    negative values survive the regex extraction."""
    from fhir_data_validation_ray.pipelines.dataops import PROPS_ROLLUP_SQL
    from fhir_data_validation_ray.stages.windows import props_rollup

    tbl = pa.table({
        "event_type": pa.array(
            ["click", "click", "buy", None, "buy", "idle"], pa.string()),
        "props": pa.array([
            '{"k": -5}', '{"other": 1}', '{"k": 40}',
            '{"k": 7}', None, '{}',
        ], pa.string()),
    })
    rows = props_rollup(_from_table(tbl, blocks=3), key="k").take_all()
    got = {r["event_type"]: (r["n_events"], r["n_with_key"], r["sum_v"],
                             r["min_v"], r["max_v"]) for r in rows}
    con = duckdb.connect()
    con.register("events", tbl)
    want = {r[0]: tuple(r[1:])
            for r in con.execute(PROPS_ROLLUP_SQL).fetchall()}
    con.close()
    assert got == want
    assert got["click"] == (2, 1, -5, -5, -5)
    assert got["idle"] == (1, 0, 0, None, None)
    assert got[None] == (1, 1, 7, 7, 7)


def test_props_rollup_all_keyless_group(ray_session):
    """An event type whose every row lacks the key gets NULL min/max and
    zero sums — never a crash from an empty masked fold."""
    from fhir_data_validation_ray.stages.windows import props_rollup

    tbl = pa.table({
        "event_type": pa.array(["x"] * 4, pa.string()),
        "props": pa.array(['{}', '{"j": 3}', None, '{"k": "str"}'],
                          pa.string()),
    })
    (row,) = props_rollup(_from_table(tbl), key="k").take_all()
    assert row == {"event_type": "x", "n_events": 4, "n_with_key": 0,
                   "sum_v": 0, "min_v": None, "max_v": None}


# -------------------------------------------------------- negative sampling
def test_negative_samples_drops_self_same_source_and_missing(ray_session):
    """Self-candidates, same-source candidates, NULL-source anchors AND
    candidates pointing at a non-existent doc id are all dropped — inner
    join + <> semantics, cross-checked against the generated FNV SQL."""
    import duckdb

    from fhir_data_validation_ray.pipelines.dataops import _neg_samples_sql
    from fhir_data_validation_ray.stages.sampling import negative_samples

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 5], pa.int64()),  # id 4 missing
        "source": pa.array(["a", "a", "b", None, "b"], pa.string()),
    })
    got = {(r["doc_id"], r["slot"]): (r["neg_id"], r["neg_source"])
           for r in negative_samples(_from_table(tbl, blocks=2),
                                     n_total=6, k=4).take_all()}
    con = duckdb.connect()
    con.register("documents", tbl)
    sql = _neg_samples_sql().replace(
        "(SELECT count(*)::BIGINT AS nn FROM documents)",
        "(SELECT 6::BIGINT AS nn)")
    want = {(r[0], r[1]): (r[2], r[3]) for r in con.execute(sql).fetchall()}
    con.close()
    assert got == want
    for (d, _), (nid, nsrc) in got.items():
        assert nid != d and nid != 4 and nid != 3  # missing + null-source
        anchor_src = {0: "a", 1: "a", 2: "b", 5: "b"}[d]
        assert nsrc != anchor_src


def test_negative_samples_reproducible_across_partitionings(ray_session):
    from fhir_data_validation_ray.stages.sampling import negative_samples

    tbl = pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(20)], pa.string()),
    })
    a = sorted(map(tuple, (r.values() for r in negative_samples(
        _from_table(tbl, blocks=1), n_total=20, k=3).take_all())))
    b = sorted(map(tuple, (r.values() for r in negative_samples(
        _from_table(tbl, blocks=5), n_total=20, k=3).take_all())))
    assert a == b and len(a) > 0


# ------------------------------------------------------------ hard negatives
def test_hard_negatives_excludes_query_label(ray_session):
    """Every mined negative has a label different from its query's; the
    query vector itself (same label) can never appear."""
    from fhir_data_validation_ray.stages.similarity import hard_negative_topk

    rng = np.random.default_rng(7)
    n, d = 40, 8
    m = rng.normal(size=(n, d)).astype(np.float32)
    labels = np.arange(n) % 4
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, row)) for row in m],
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32)),
    })
    qids = np.array([0, 1], dtype=np.int64)
    qm = m[qids].astype(np.float64)
    qm = qm / np.sqrt((qm * qm).sum(axis=1, keepdims=True))
    rows = hard_negative_topk(_from_table(tbl, blocks=3), qids, qm,
                              labels[qids], k=5).take_all()
    assert len(rows) == 10
    lab = {i: int(l) for i, l in enumerate(labels)}
    for r in rows:
        assert lab[r["vec_id"]] != lab[r["qid"]]
        assert r["vec_id"] != r["qid"]


# ----------------------------------------------------------------- dup rate
def test_dup_rate_null_source_and_null_text(ray_session):
    """NULL source keeps its own group; NULL text counts into n_docs but
    never into n_distinct; exact duplicates collapse."""
    from fhir_data_validation_ray.stages.dedup import dup_rate_by_source

    tbl = pa.table({
        "source": pa.array(["a", "a", "a", None, None, "b"], pa.string()),
        "text": pa.array(["x", "x", "y", "z", None, None], pa.string()),
    })
    got = {r["source"]: (r["n_docs"], r["n_distinct"])
           for r in dup_rate_by_source(_from_table(tbl, blocks=3)).take_all()}
    assert got == {"a": (3, 2), None: (2, 1), "b": (1, 0)}


# ------------------------------------------------------ product quantization
def _ref_pq(mat, m, k, iters, scale):
    """Plain-numpy PQ reference (shares no code with the distributed op)."""
    q = np.floor(mat.astype(np.float64) * scale).astype(np.int64)
    dsub = q.shape[1] // m
    codes = np.zeros((len(q), m), np.int64)
    books = []
    for s in range(m):
        X = q[:, s * dsub:(s + 1) * dsub]
        C = X[:k].copy()
        for _ in range(iters):
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            cl = d.argmin(axis=1)
            newC = C.copy()
            for j in range(k):
                mbr = X[cl == j]
                if len(mbr):
                    newC[j] = np.floor_divide(mbr.sum(axis=0), len(mbr))
            C = newC
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d.argmin(axis=1)
        books.append(C)
    return codes, books


def test_pq_matches_plain_reference(ray_session):
    from fhir_data_validation_ray.stages.similarity import pq_train_encode

    rng = np.random.default_rng(11)
    n, dim, m, k, iters = 60, 16, 4, 5, 2
    mat = rng.normal(scale=0.3, size=(n, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })
    codes_ds, books = pq_train_encode(
        _from_table(tbl, blocks=3), dim=dim, m=m, k=k, iters=iters,
        scale=1 << 10)
    ref_codes, ref_books = _ref_pq(mat, m, k, iters, 1 << 10)
    got = sorted((r["vec_id"], r["code0"], r["code1"], r["code2"], r["code3"])
                 for r in codes_ds.take_all())
    want = sorted((i, *ref_codes[i]) for i in range(n))
    assert got == want
    for s in range(m):
        assert np.array_equal(books[s], ref_books[s])


def test_pq_rejects_bad_dim(ray_session):
    import pytest

    from fhir_data_validation_ray.stages.similarity import pq_train_encode

    tbl = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.1] * 6, [0.2] * 6], pa.list_(pa.float32())),
    })
    with pytest.raises(ValueError, match="not divisible"):
        pq_train_encode(_from_table(tbl), dim=6, m=4)


def test_pq_adc_topk_matches_plain_reference(ray_session):
    """ADC ranking == plain-numpy table-lookup reference on the same
    codes/codebooks (exact integer distances, ties dist ASC, vec_id ASC)."""
    import ray.data as rd

    from fhir_data_validation_ray.stages.similarity import (
        pq_adc_topk, pq_train_encode)

    rng = np.random.default_rng(23)
    n, dim, m, k, iters, scale = 50, 8, 2, 4, 2, 1 << 10
    mat = rng.normal(scale=0.3, size=(n, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })
    codes_ds, books = pq_train_encode(
        _from_table(tbl, blocks=3), dim=dim, m=m, k=k, iters=iters,
        scale=scale)
    qids = np.array([3, 17], dtype=np.int64)
    q = np.floor(mat[qids].astype(np.float64) * scale).astype(np.int64)
    got = sorted((r["qid"], r["rank"], r["vec_id"]) for r in pq_adc_topk(
        codes_ds, books, qids, q, k=5).take_all())

    # reference: full integer grid, per-vector code lookup, lexsort ranks
    ref_codes, ref_books = _ref_pq(mat, m, k, iters, scale)
    dsub = dim // m
    want = []
    for qi, qrow in zip(qids, q):
        dist = np.zeros(n, np.int64)
        for s in range(m):
            diff = qrow[s * dsub:(s + 1) * dsub] - ref_books[s][ref_codes[:, s]]
            dist += (diff * diff).sum(axis=1)
        order = np.lexsort((np.arange(n), dist))[:5]
        want += [(int(qi), r + 1, int(v)) for r, v in enumerate(order)]
    assert got == sorted(want)
