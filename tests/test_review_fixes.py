"""Regression tests for the round-4 diff review findings: null/collision
edge cases in funnel SQL, burst-window key bounds, NULL event_type groups,
governance robustness, source/corpus-card lang counting, NULL-kind packing,
and the lint duplicate-entry key."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from helpers import make_docs, profile_of, rows


def _from_table(tbl, blocks=1):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(blocks)


# ------------------------------------------------------- filter funnel nulls
def test_funnel_null_lang_matches_oracle(ray_session):
    """A NULL lang is removed at the lang_allowed stage on BOTH sides:
    pc.is_in(null) is False in the engine, and the oracle spells the
    two-valued semantics out with coalesce(lang NOT IN ..., TRUE)."""
    from fhir_data_validation_ray.pipelines.curation import filter_funnel
    from fhir_data_validation_ray.pipelines.dataops import (
        FILTER_FUNNEL_SQL, _funnel_stages)

    text_ok = " ".join(["word"] * 30)
    tbl = pa.table({
        "n_chars": pa.array([150, 150, 150, 50], pa.int64()),
        "lang": pa.array([None, "en", "xx", "en"], pa.string()),
        "text": pa.array([text_ok, text_ok, text_ok, text_ok]),
    })
    got = {r["stage"]: (r["n_in"], r["n_removed"], r["n_out"])
           for r in filter_funnel(_from_table(tbl, blocks=2),
                                  _funnel_stages()).take_all()}
    con = duckdb.connect()
    con.register("documents", tbl)
    want = {r[1]: (r[2], r[3], r[4])
            for r in con.execute(FILTER_FUNNEL_SQL).fetchall()}
    con.close()
    assert got == want
    # the NULL-lang doc and the 'xx' doc are both removed at stage 2
    assert got["lang_allowed"] == (3, 2, 1)


# ------------------------------------------------------ burst window bounds
def test_burst_windows_rejects_out_of_range_user(ray_session):
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import burst_windows

    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([2 ** 26], pa.int64()),
        "ts": pa.array(np.array([0], dtype="datetime64[us]")),
    }))
    with pytest.raises(Exception, match="must be in"):
        burst_windows(ev, window_us=100, block_us=100).take_all()


# ------------------------------------------------- NULL event_type grouping
def test_distinct_by_type_keeps_null_type_group(ray_session):
    """SQL GROUP BY keeps a NULL event_type group; the engine must emit it
    too instead of silently dropping null-typed events."""
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import (
        US_PER_HOUR, tumbling_distinct_by_type)

    ts = np.zeros(4, dtype="datetime64[us]")
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 2, 3, 2], pa.int64()),
        "ts": pa.array(ts),
        "event_type": pa.array(["click", None, None, None], pa.string()),
    }))
    got = {(r["window_id"], r["event_type"]): r["n_distinct"]
           for r in tumbling_distinct_by_type(
               ev, window_us=US_PER_HOUR).take_all()}
    assert got == {(0, "click"): 1, (0, None): 2}


# ------------------------------------------------------ governance hardening
def test_review_flags_non_numeric_min_max():
    """Malformed min/max is exactly what the review exists to report — it
    must BLOCK, not crash with ValueError."""
    from fhir_data_validation_ray.governance import BLOCKED, review_rule

    r = review_rule({"id": "R", "type": "RequiredSpans", "params": {
        "requirements": [{"kind": "Patient", "min": "two"}]}})
    assert r.status == BLOCKED
    assert any(i.code == "REQUIRED_RESOURCES_INVALID_CONFIG"
               for i in r.issues)

    r2 = review_rule({"id": "R", "type": "RequiredSpans", "params": {
        "requirements": [{"kind": "Patient", "min": 1, "max": "many"}]}})
    assert r2.status == BLOCKED

    # numeric strings are tolerated authoring input
    ok = review_rule({"id": "R", "type": "RequiredSpans", "params": {
        "requirements": [{"kind": "Patient", "min": "2", "max": "2"}]}})
    assert ok.status == "OK"


def test_review_set_issues_attach_per_position_on_duplicate_ids():
    """Two rules sharing an id must EACH carry their set-level issues (an
    id-keyed dict would drop all but the last)."""
    from fhir_data_validation_ray.governance import BLOCKED, review_rule_set

    reqs = {"requirements": [{"kind": "Patient", "min": 1}]}
    rules = [
        {"id": "R1", "type": "RequiredSpans", "params": reqs},
        {"id": "R1", "type": "RequiredSpans", "params": reqs},
    ]
    results = review_rule_set(rules)
    assert len(results) == 2
    for res in results:
        assert res.status == BLOCKED
        assert any(i.code == "DUPLICATE_BUNDLE_RESOURCE_RULE"
                   for i in res.issues)


# ---------------------------------------------------- source/corpus card lang
def test_source_card_null_and_empty_lang(ray_session, tmp_path):
    """n_langs must match SQL count(DISTINCT lang): NULL skipped, ''
    counted (it previously collided with the fold's row-type sentinel)."""
    import pyarrow.parquet as pq

    from fhir_data_validation_ray.pipelines.dataops import (
        SOURCE_CARD_SQL, q_source_card)

    tbl = pa.table({
        "doc_id": pa.array(["a", "b", "c", "d"]),
        "text": pa.array(["x y", "x", "", "z z z"]),
        "lang": pa.array([None, "", "en", "en"], pa.string()),
        "source": pa.array(["s1", "s1", "s1", "s2"]),
        "n_chars": pa.array([3, 1, 0, 5], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = sorted(q_source_card(str(tmp_path)).take_all(),
                 key=lambda r: r["source"])
    con = duckdb.connect()
    con.register("documents", tbl)
    want = sorted(({"source": r[0], "n_docs": r[1], "n_tokens": r[2],
                    "n_chars": r[3], "n_langs": r[4]}
                   for r in con.execute(SOURCE_CARD_SQL).fetchall()),
                  key=lambda r: r["source"])
    con.close()
    assert got == want
    assert got[0]["n_langs"] == 2  # '' and 'en'; NULL not counted


def test_corpus_card_null_and_empty_lang(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from fhir_data_validation_ray.pipelines.dataops import (
        CORPUS_CARD_SQL, q_corpus_card)

    tbl = pa.table({
        "doc_id": pa.array(["a", "b", "c"]),
        "text": pa.array(["x y", "x", "x"]),
        "lang": pa.array([None, "", "en"], pa.string()),
        "source": pa.array(["s1", "s1", "s2"]),
        "n_chars": pa.array([3, 1, 1], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = q_corpus_card(str(tmp_path)).to_pylist()[0]
    con = duckdb.connect()
    con.register("documents", tbl)
    row = con.execute(CORPUS_CARD_SQL).fetchone()
    con.close()
    assert got == {"n_docs": row[0], "n_tokens": row[1], "n_langs": row[2],
                   "n_sources": row[3], "n_unique_texts": row[4]}
    assert got["n_langs"] == 2


# ----------------------------------------------------- NULL-kind span packing
def test_pack_interleaved_null_kind_uses_text_cost(ray_session):
    """A NULL span kind routes to the word-count lane (the oracle's CASE
    ... ELSE), not an int64-min fancy-index crash."""
    from fhir_data_validation_ray.stages.packing import pack_interleaved

    docs = make_docs([
        ("d1", [(None, "a b c", "", 0), ("image", "", "m1", 1)]),
    ])
    got = pack_interleaved(_from_table(docs), n_shards=1).take_all()
    assert len(got) == 1
    assert got[0]["n_tokens"] == 3 + 64  # 3 words + image cost


# ------------------------------------------------ lint duplicate-entry keying
def test_lint_duplicate_entry_no_separator_collision():
    """Field values containing the old \\x1f separator (or any byte) can no
    longer shift tuple boundaries: distinct (kind, text, media_ref) tuples
    whose concatenations collide are NOT duplicates, while true duplicates
    with \\x1f inside values still are."""
    from fhir_data_validation_ray.functions.kernels import CompiledProfile
    from fhir_data_validation_ray.profile import parse_profile

    p = profile_of()
    p["settings"]["lint"] = True
    full = CompiledProfile(parse_profile(p), validation_mode="full")

    # 'k' + 'a\x1fb' vs 'k\x1fa' + 'b' concatenate identically
    docs = make_docs([("d1", [("k", "a\x1fb", "m", 0),
                              ("k\x1fa", "b", "m", 1)])])
    got = rows(full.validate_batch(docs))
    assert not any(r[2] == "LINT_DUPLICATE_ENTRY" for r in got)

    dup = make_docs([("d2", [("k", "a\x1fb", "m", 0),
                             ("k", "a\x1fb", "m", 1)])])
    got2 = rows(full.validate_batch(dup))
    assert ("d2", 1, "LINT_DUPLICATE_ENTRY", "warning") in got2
    assert ("d2", 0, "LINT_DUPLICATE_ENTRY", "warning") not in got2
