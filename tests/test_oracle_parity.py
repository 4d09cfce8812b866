"""Ray-pipeline vs DuckDB-oracle parity at sf0.001 — the local twin of the
driver's CORRECTNESS gate (same comparison: row count + columns + order-
insensitive values)."""

import duckdb
import pandas as pd
import pytest

QUERY_NAMES = None


def _query_names():
    from fhir_data_validation_ray.pipelines.queries import validation_queries

    return sorted(validation_queries().keys())


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = pd.to_numeric(df[c]).astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(ray_session, name):
    from fhir_data_validation_ray.pipelines.queries import (
        validation_oracles,
        validation_queries,
    )
    from fhir_data_validation_ray.pipelines.validate import fixture_paths

    sf_dir = "/root/testdata/sf0.001"
    paths = fixture_paths(sf_dir)
    q = validation_queries()[name]
    result = q(sf_dir)
    got = result.to_pandas() if hasattr(result, "to_pandas") else pd.DataFrame(result)

    sql = validation_oracles(paths)[name]
    want = duckdb.sql(sql).df()

    g, w = _normalize(got), _normalize(want)
    assert list(g.columns) == list(w.columns), f"{name}: columns {g.columns} vs {w.columns}"
    assert len(g) == len(w), f"{name}: rows {len(g)} vs {len(w)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_rule_coverage_zero_fire_rule(ray_session):
    """A rule that never fires must still appear with n = 0 (dead-rule
    detection — the whole point of the coverage report vs the summary)."""
    from fhir_data_validation_ray.pipelines.profiles import default_profile
    from fhir_data_validation_ray.pipelines.queries import rule_coverage

    p = default_profile()
    p["rules"].append({"id": "RX", "type": "Required", "kind": "NoSuchKind",
                       "fieldPath": "text", "severity": "error"})
    t = rule_coverage("/root/testdata/sf0.001", p).to_pandas()
    by_id = t.set_index("rule_id")["n"]
    assert by_id["RX"] == 0
    assert by_id["R1"] > 0
    assert set(t["rule_id"]) == {f"R{i}" for i in range(1, 14)} | {"RX"}


def test_validation_response_shape(ray_session):
    from fhir_data_validation_ray.pipelines.validate import validation_response

    resp = validation_response("/root/testdata/sf0.001", max_errors=10)
    assert set(resp) == {"isValid", "errors", "suggestions", "summary", "metadata"}
    assert resp["isValid"] is False  # fixture corpus has injected defects
    assert len(resp["errors"]) == 10
    assert {"doc_id", "span_index", "error_code", "severity"} <= set(resp["errors"][0])
    assert resp["summary"]["totalErrors"] > 0
    assert resp["metadata"]["processingTimeMs"] > 0
    # every sampled error carries the navigation block the playground UI
    # derives client-side (smartPathFormatting.ts)
    from fhir_data_validation_ray.explain import (
        format_breadcrumb,
        pointer_jsonpath,
    )

    for e in resp["errors"]:
        nav = e["navigation"]
        assert set(nav) == {"breadcrumb", "scopedPath", "fullJsonPath",
                            "jsonPath"}
        assert nav["breadcrumb"] == format_breadcrumb(e["path"] or "")
        assert nav["jsonPath"] == pointer_jsonpath(e["json_pointer"] or "")
        assert nav["jsonPath"].startswith("$")
    # suggestions are debug-mode-only (ValidationPipeline.cs:432-456)
    assert resp["suggestions"] is None
    dbg = validation_response("/root/testdata/sf0.001", max_errors=1,
                              validation_mode="debug")
    assert dbg["suggestions"], "debug mode returns system rule suggestions"
    assert {"kind", "rule_type", "param", "n_samples", "n_match",
            "confidence"} <= set(dbg["suggestions"][0])


def test_stage_rank_deterministic_order(ray_session):
    from fhir_data_validation_ray.pipelines.validate import run_validation, with_stage_rank

    v = with_stage_rank(run_validation("/root/testdata/sf0.001"))
    df = (
        v.sort(["doc_id", "stage_rank", "span_index", "rule_id"])
        .to_pandas()
    )
    # identical rerun reproduces the exact row order (determinism guarantee,
    # docs/05_validation_pipeline.md:156-162)
    df2 = (
        with_stage_rank(run_validation("/root/testdata/sf0.001"))
        .sort(["doc_id", "stage_rank", "span_index", "rule_id"])
        .to_pandas()
    )
    import pandas as pd

    pd.testing.assert_frame_equal(df, df2)
    # STRUCTURE rows rank before Business before Reference within a doc
    assert set(df.stage_rank.unique()) >= {df.stage_rank.min()}


def test_actor_pool_lane_matches_task_lane(ray_session):
    """mode='actors' (explicit actor pool, compile in __init__) must produce
    exactly the task-lane violations; concurrency=1 in the 4-CPU session."""
    import pandas as pd

    from fhir_data_validation_ray.pipelines.profiles import default_profile
    from fhir_data_validation_ray.pipelines.validate import fixture_paths
    from fhir_data_validation_ray.sources.readers import read_documents, registry_keys_numpy
    from fhir_data_validation_ray.stages.validator import validate_dataset

    paths = fixture_paths("/root/testdata/sf0.001")
    docs = lambda: read_documents(paths["docs"])
    reg = registry_keys_numpy(paths["registry"])
    cols = ["doc_id", "span_index", "rule_id", "error_code", "severity"]
    norm = lambda df: df[cols].sort_values(cols).reset_index(drop=True)
    tasks = norm(validate_dataset(docs(), default_profile(), registry_keys=reg,
                                  emit_details=False).to_pandas())
    actors = norm(validate_dataset(docs(), default_profile(), registry_keys=reg,
                                   emit_details=False, mode="actors",
                                   concurrency=1).to_pandas())
    pd.testing.assert_frame_equal(tasks, actors)
    assert len(tasks) > 0


def test_violations_identical_across_parallelism(ray_session):
    """The violation SET must be byte-identical whatever the read split —
    the per-row span-sequence invariant and batch-local kernels make output
    a pure function of the corpus, not of partitioning."""
    import pandas as pd

    from fhir_data_validation_ray.pipelines.profiles import default_profile
    from fhir_data_validation_ray.pipelines.validate import fixture_paths
    from fhir_data_validation_ray.sources.readers import read_documents, registry_keys_numpy
    from fhir_data_validation_ray.stages.validator import validate_dataset

    paths = fixture_paths("/root/testdata/sf0.001")
    reg = registry_keys_numpy(paths["registry"])
    frames = []
    for blocks in (2, 16):
        v = validate_dataset(
            read_documents(paths["docs"], override_num_blocks=blocks),
            default_profile(), registry_keys=reg,
        ).to_pandas()
        frames.append(v.sort_values(list(v.columns)).reset_index(drop=True))
    pd.testing.assert_frame_equal(frames[0], frames[1])
    assert len(frames[0]) > 0


def test_reference_join_details_match_json_dumps(ray_session):
    """The vectorized details construction must be byte-identical to
    stdlib json.dumps — including refs carrying quotes, backslashes and
    control characters (the per-row fallback path)."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.reference import (
        reference_integrity_join,
    )

    # all non-local-shaped (LOCAL_REF_RE-excluded refs never reach the join)
    refs = ['urn:media:1', 'has"quote', 'back\\slash', 'ctrl\x01char',
            'mix"\\\x02end']
    spans = pa.array(
        [[{"kind": "Media", "text": None, "media_ref": r, "offset": 0}]
         for r in refs],
        pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string()),
                            ("media_ref", pa.string()), ("offset", pa.int32())])),
    )
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(refs))], pa.string()),
        "spans": spans,
    }))
    registry = rd.from_arrow(pa.table({"media_ref": pa.array([], pa.string())}))

    out = (reference_integrity_join(docs, registry, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == len(refs)
    want = [json.dumps({"ref": r, "policy": "registry"}, separators=(",", ":"))
            for r in refs]
    assert out.details.tolist() == want


def test_jsonl_lane_validates_identically(ray_session):
    """INGEST composition: JSONL -> quarantine filter -> validate must emit
    exactly the parquet lane's violations for the surviving docs (the
    span-sequence invariant survives serialization + the vectorized JSON
    parse round-trip)."""
    import numpy as np

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.pipelines.profiles import default_profile
    from fhir_data_validation_ray.pipelines.queries import RESULT_COLS
    from fhir_data_validation_ray.pipelines.validate import fixture_paths
    from fhir_data_validation_ray.sources.json_ingest import (
        CORRUPT_MOD,
        jsonl_fixture,
        read_documents_jsonl,
    )
    from fhir_data_validation_ray.sources.readers import (
        read_documents,
        registry_keys_numpy,
    )
    from fhir_data_validation_ray.stages.validator import validate_dataset

    sf_dir = "/root/testdata/sf0.001"
    paths = fixture_paths(sf_dir)
    reg = registry_keys_numpy(paths["registry"])
    p = default_profile()

    import pyarrow.compute as pc

    def parsed_only(t):
        return t.filter(pc.is_null(t["error"])).select(["doc_id", "spans"])

    jl = read_documents_jsonl(jsonl_fixture(sf_dir)).map_batches(
        parsed_only, batch_format="pyarrow"
    )
    got = validate_dataset(jl, p, registry_keys=reg, emit_details=False)
    got_rows = sorted(map(tuple, got.select_columns(RESULT_COLS).to_pandas().values))

    import pyarrow as pa

    def drop_corrupted(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("U")
        keep = (hash_str(ids) % np.uint64(CORRUPT_MOD)) != 0
        return t.filter(pa.array(keep))

    pq_docs = read_documents(paths["docs"]).map_batches(
        drop_corrupted, batch_format="pyarrow"
    )
    want = validate_dataset(pq_docs, p, registry_keys=reg, emit_details=False)
    want_rows = sorted(map(tuple, want.select_columns(RESULT_COLS).to_pandas().values))
    assert got_rows == want_rows and len(got_rows) > 0
