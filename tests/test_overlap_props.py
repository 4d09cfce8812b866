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
