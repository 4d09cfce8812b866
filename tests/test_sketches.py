"""Sketches (t-digest, HLL), drift scoring and checkpoint/resume."""

import json
import os

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_tdigest_quantile_accuracy():
    from fhir_data_validation_ray.state.sketches import TDigest

    rng = np.random.RandomState(7)
    v = rng.lognormal(3, 1, size=100_000)
    td = TDigest.from_values(v)
    for q in (0.5, 0.9, 0.99):
        exact = np.quantile(v, q)
        est = td.quantile(q)
        assert abs(est - exact) / exact < 0.05, (q, est, exact)


def test_tdigest_merge_matches_whole():
    from fhir_data_validation_ray.state.sketches import TDigest

    rng = np.random.RandomState(11)
    v = rng.standard_normal(60_000) * 10 + 50
    parts = np.array_split(v, 7)
    merged = TDigest.from_values(parts[0])
    for p in parts[1:]:
        merged = merged.merge(TDigest.from_values(p))
    whole = TDigest.from_values(v)
    for q in (0.1, 0.5, 0.9):
        assert abs(merged.quantile(q) - whole.quantile(q)) < 1.0


def test_hll_estimate_and_merge():
    from fhir_data_validation_ray.state.sketches import HyperLogLog

    a = np.array([f"k{i}" for i in range(30_000)])
    b = np.array([f"k{i}" for i in range(20_000, 50_000)])  # 20k overlap
    ha = HyperLogLog.from_strings(a)
    hb = HyperLogLog.from_strings(b)
    assert abs(ha.estimate() - 30_000) / 30_000 < 0.03
    union = ha.merge(hb)
    assert abs(union.estimate() - 50_000) / 50_000 < 0.03


def test_drift_same_corpus_is_clean_and_shift_detected(ray_session):
    import ray.data as rd

    from fhir_data_validation_ray.stages.drift import drift_scores, take_snapshot

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["n_chars"])
    snap = take_snapshot(ds, ["n_chars"])
    clean = drift_scores(ds, snap).to_pandas()
    assert not clean["drifted"].any()
    assert (clean["psi"] < 0.01).all()

    # shifted population: only the long documents -> must flag
    shifted = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["n_chars"]).filter(
        expr="n_chars > 300"
    )
    hot = drift_scores(shifted, snap).to_pandas()
    assert hot["drifted"].all()


def test_checkpoint_run_and_resume(ray_session, tmp_path):
    from fhir_data_validation_ray.pipelines.checkpointed import run_checkpointed

    out = str(tmp_path / "run1")
    # replicas=20 -> a DIRECTORY of parquet parts = many partitions, so the
    # resume path is exercised across real partition boundaries
    run1 = run_checkpointed(SF_DIR, out, replicas=20, emit_details=False)
    assert run1["n_processed_this_run"] == run1["n_partitions"] > 1
    assert run1["n_docs"] == 10_000

    # full resume: nothing recomputed
    run2 = run_checkpointed(SF_DIR, out, replicas=20, emit_details=False)
    assert run2["n_processed_this_run"] == 0
    assert run2["n_resumed_skips"] == run1["n_partitions"]
    assert run2["n_violations"] == run1["n_violations"]

    # simulate a crashed partition: drop one manifest -> only it recomputes
    manifests = sorted(os.listdir(os.path.join(out, "_manifests")))
    victim = os.path.join(out, "_manifests", manifests[0])
    before = json.load(open(victim))
    os.remove(victim)
    run3 = run_checkpointed(SF_DIR, out, replicas=20, emit_details=False)
    assert run3["n_processed_this_run"] == 1
    assert run3["n_violations"] == run1["n_violations"]
    after = json.load(open(victim))
    assert after["n_violations"] == before["n_violations"]
    assert after["pass"] == before["pass"]

    # per-partition verdicts + lineage present
    assert {"input_file", "row_group", "counts_by_severity", "pass",
            "profile_hash", "duration_s"} <= set(after)


def test_kind_histogram_drift(ray_session):
    from fhir_data_validation_ray.pipelines.validate import fixture_paths
    from fhir_data_validation_ray.sources.readers import read_documents
    from fhir_data_validation_ray.stages.drift import kind_drift, kind_histogram

    paths = fixture_paths(SF_DIR)
    docs = read_documents(paths["docs"])
    snap = kind_histogram(docs)
    assert snap and "Patient" in snap

    # same corpus vs itself: not drifted, zero total PSI
    clean = kind_drift(read_documents(paths["docs"]), snap).to_pandas()
    assert not clean["drifted"].any()
    total = clean[clean["kind"] == "__total__"]["psi_contribution"].iloc[0]
    assert abs(total) < 1e-9

    # skewed snapshot (drop all Patient spans) -> drift flagged
    skew = {k: v for k, v in snap.items() if k != "Patient"}
    hot = kind_drift(read_documents(paths["docs"]), skew).to_pandas()
    assert hot["drifted"].all()


def test_cms_one_sided_and_merge():
    """CMS estimates never undercount; split+merge equals whole; overshoot
    stays within the eps*N bound for a comfortably wide sketch."""
    import numpy as np

    from fhir_data_validation_ray.state.sketches import CountMinSketch

    rng = np.random.RandomState(7)
    words = np.array([f"w{i}" for i in rng.zipf(1.5, 20000) if i < 5000], dtype="U")
    uniq, true = np.unique(words, return_counts=True)

    whole = CountMinSketch.empty(width=4096, depth=4)
    whole.add_strings(words)
    est = whole.estimate_strings(uniq)
    assert (est >= true).all()
    assert (est - true).max() <= 2 * len(words) / 4096 + 1

    half = len(words) // 2
    a = CountMinSketch.empty(width=4096, depth=4)
    b = CountMinSketch.empty(width=4096, depth=4)
    a.add_strings(words[:half])
    b.add_strings(words[half:])
    assert (a.merge(b).counts == whole.counts).all()


def test_top_words_sketch_tracks_exact_lane(ray_session):
    """Sketch-lane heavy hitters: every exact top-k word appears in the
    sketch top-2k, and its estimate is >= its true count (one-sided)."""
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import top_words, top_words_sketch

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    exact = top_words(docs, k=10).to_pandas().set_index("word")
    sk = top_words_sketch(docs, k=20).to_pandas().set_index("word")
    assert set(exact.index) <= set(sk.index)
    for w in exact.index:
        assert sk.loc[w, "est_n"] >= exact.loc[w, "n"]


def test_kll_rank_error_and_merge():
    """KLL rank error stays well under the k=200 budget on a skewed
    distribution, arbitrary split-merge equals the semantics of the whole
    (same n, comparable quantiles), and rows round-trip."""
    import numpy as np

    from fhir_data_validation_ray.state.sketches import KLL

    rng = np.random.default_rng(7)
    v = np.concatenate([rng.normal(0, 1, 30000),
                        rng.exponential(5, 20000)])
    ex = np.sort(v)
    whole = KLL.from_values(v)
    assert whole.n == len(v)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = whole.quantile(q)
        rank_err = abs(np.searchsorted(ex, est) - q * len(v)) / len(v)
        assert rank_err < 0.02, (q, rank_err)

    # merge of uneven splits preserves n and quantile accuracy
    parts = np.array_split(v, [1000, 1500, 40000])
    m = KLL.empty()
    for p in parts:
        m = m.merge(KLL.from_values(p))
    assert m.n == len(v)
    for q in (0.1, 0.5, 0.9):
        rank_err = abs(np.searchsorted(ex, m.quantile(q)) - q * len(v)) / len(v)
        assert rank_err < 0.03, (q, rank_err)

    # serialization round-trip is exact
    rt = KLL.from_rows(m.to_rows())
    assert rt.n == m.n and rt.quantile(0.5) == m.quantile(0.5)

    # rank() is monotone and bounded
    assert m.rank(ex[0] - 1) == 0 and m.rank(ex[-1] + 1) == m.n


def test_kll_column_quantiles_matches_exact(ray_session):
    """The distributed two-level KLL fold lands within sketch tolerance of
    the exact integer quantiles on n_chars."""
    import duckdb
    import ray.data as rd

    from fhir_data_validation_ray.stages.stats import kll_column_quantiles

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["n_chars"])
    prof = kll_column_quantiles(ds, "n_chars")
    exact = duckdb.connect().execute(
        f"SELECT quantile_disc(n_chars, 0.5), quantile_disc(n_chars, 0.95) "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')").fetchone()
    assert prof["n"] == prof["sketch_n"] > 0
    # 500 docs, k=200 -> the sketch is near-exact at this scale
    assert abs(prof["quantiles"]["0.5"] - exact[0]) <= max(10, 0.05 * exact[0])
    assert abs(prof["quantiles"]["0.95"] - exact[1]) <= max(10, 0.05 * exact[1])


def test_drift_fp_non_integral_bin_width(ray_session):
    """Review r5: binning must use the FLOAT width (np.floor((v-lo)/w)),
    matching stats.histogram and the SQL oracle — integer-truncated width
    diverges for non-integral (hi-lo)/nbins and div-zeroes for
    hi-lo < nbins."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.drift import drift_fp_by_group

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 100, size=400)
    srcs = np.where(np.arange(400) % 2 == 0, "a", "b")
    ds = rd.from_arrow(pa.table({
        "source": pa.array(srcs.astype("U").tolist(), pa.string()),
        "n_chars": pa.array(vals, pa.int64())}))
    # lo=0, hi=100, nbins=3 -> w = 33.33...: the truncated-width bug puts
    # v=66 in bin 2 while floor(66/33.33)=1
    got = drift_fp_by_group(ds, "n_chars", "source", lo=0, hi=100, nbins=3)
    con = duckdb.connect()
    con.register("t", pa.table({
        "source": pa.array(srcs.astype("U").tolist(), pa.string()),
        "v": pa.array(vals, pa.int64())}))
    want = con.execute(f"""
WITH vc AS (SELECT source, v, count(*)::BIGINT AS c FROM t GROUP BY 1,2),
ns AS (SELECT source, sum(c)::BIGINT AS n FROM vc GROUP BY 1),
ntot AS (SELECT sum(c)::BIGINT AS n FROM vc),
hb AS (SELECT source,
         least(greatest(floor((v - 0) / {100 / 3})::BIGINT, 0), 2) AS bin,
         sum(c)::BIGINT AS c FROM vc GROUP BY 1, 2),
gb AS (SELECT bin, sum(c)::BIGINT AS c FROM hb GROUP BY 1),
bins AS (SELECT unnest(range(0, 3)) AS bin),
pq AS (SELECT ns.source,
         (coalesce(hb.c, 0) + 1.0) / (ns.n + 3.0) AS p,
         (coalesce(gb.c, 0) + 1.0) / ((SELECT n FROM ntot) + 3.0) AS q
       FROM ns CROSS JOIN bins
       LEFT JOIN hb ON hb.source = ns.source AND hb.bin = bins.bin
       LEFT JOIN gb ON gb.bin = bins.bin)
SELECT source, sum(floor(1000000 * (p - q) * ln(p / q)))::BIGINT AS psi_fp
FROM pq GROUP BY 1 ORDER BY 1""").df()
    by = {g: p for g, p in zip(got["group"].to_pylist(),
                               got["psi_fp"].to_pylist())}
    for _, row in want.iterrows():
        assert by[row["source"]] == int(row["psi_fp"])
