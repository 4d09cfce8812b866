"""Behavioral tests for out_of_order_counts (cross-block prefix-max path)
and crosslang_dups (same-lang dup groups excluded) on handcrafted inputs —
the oracle-parity suite covers the fixture queries end-to-end."""

import numpy as np
import pyarrow as pa


def _events(rows, blocks=3):
    import ray.data as rd

    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()),
    })
    return rd.from_arrow(tbl).repartition(blocks)


def test_ooo_cross_block_lateness(ray_session):
    """An event late ONLY against an earlier BLOCK's max (locally it is its
    block's first/rising row) must be counted via the prefix-max exchange."""
    from fhir_data_validation_ray.stages.windows import out_of_order_counts

    rows = [
        # user 1, block 0 (event_id 0..3): ordered, max ts 100
        (0, 1, 10), (1, 1, 50), (2, 1, 100),
        # user 1, block 1 (event_id 4..7): ts 60 < 100 but locally first ->
        # late only via prefix; ts 70 rises locally -> also late via prefix;
        # ts 120 is fine
        (4, 1, 60), (5, 1, 70), (6, 1, 120),
        # user 1, block 2: 110 < 120 locally-visible? 110 < block-2 local
        # prefix (nothing before it in-block) -> late via prefix (max 120)
        (8, 1, 110),
        # user 2: perfectly ordered across blocks -> zero late
        (3, 2, 10), (7, 2, 20), (9, 2, 30),
    ]
    got = {r["user_id"]: r for r in
           out_of_order_counts(_events(rows), block_events=4).take_all()}
    assert got[1]["n_events"] == 7 and got[1]["n_late"] == 3
    assert got[2]["n_events"] == 3 and got[2]["n_late"] == 0


def test_ooo_local_and_prefix_combined(ray_session):
    """Locally-late rows resolve in-block; the same block's candidates
    still check the incoming prefix — both kinds sum per user."""
    from fhir_data_validation_ray.stages.windows import out_of_order_counts

    rows = [
        (0, 5, 100),           # block 0
        (4, 5, 90),            # block 1: candidate (first in block), late
                               # via prefix (90 < 100)
        (5, 5, 40),            # block 1: locally late (40 < 90)
        (6, 5, 95),            # block 1: candidate (95 > local run max 90
                               # is False -> 95 >= 90 candidate), late via
                               # prefix (95 < 100)
        (7, 5, 200),           # block 1: candidate, fine
    ]
    got = out_of_order_counts(_events(rows, blocks=2),
                              block_events=4).take_all()
    assert len(got) == 1
    r = got[0]
    assert r["n_events"] == 5 and r["n_late"] == 3


def test_crosslang_same_lang_groups_excluded(ray_session):
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import crosslang_dups

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(["aa", "aa", "bb", "bb", "cc", "cc", "cc"]),
        "lang": pa.array(["en", "en", "en", "de", "en", "de", None]),
    })
    got = sorted(crosslang_dups(rd.from_arrow(tbl).repartition(2))
                 .take_all(), key=lambda r: r["group_id"])
    # "aa": 2 docs 1 lang -> excluded; "bb": cross-lang pair; "cc": null
    # lang row excluded from BOTH counts -> 2 docs 2 langs
    assert [(r["group_id"], r["n_docs"], r["n_langs"]) for r in got] == [
        (2, 2, 2), (4, 2, 2)]


def test_crosslang_add_clones_empty_and_tiny_batches():
    """r04 driver red: a batch with no doc_id%10==0 rows made pa.array
    infer the null type and concat_tables raised ArrowInvalid. Drive the
    (now module-level) UDF directly on 0-row / 1-row / no-selection
    batches — schemas must be identical across all of them."""
    from fhir_data_validation_ray.pipelines.dataops import crosslang_add_clones

    def docs(ids, texts, langs):
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        })

    full = crosslang_add_clones(docs([10, 3], ["t a", "t b"], ["en", "fr"]))
    empty = crosslang_add_clones(docs([], [], []))
    # doc_id 3: no %5, no %10 selection -> both clone sub-tables empty
    nosel = crosslang_add_clones(docs([3], ["t c"], ["de"]))
    one = crosslang_add_clones(docs([10], ["t d"], ["zh"]))
    assert empty.schema == full.schema == nosel.schema == one.schema
    assert empty.num_rows == 0 and nosel.num_rows == 1
    assert one.num_rows == 3  # base + %5 clone + %10 clone
    assert one["lang"].to_pylist() == ["zh", "xx", "yy"]


def test_contingency_keyed_zero_row_batch(ray_session):
    """stats.contingency's NULL-safe key UDF inferred null-typed 'T'/'N'
    arrays on a 0-row batch (same class as the crosslang red)."""
    import ray.data as rd

    from fhir_data_validation_ray.stages.stats import contingency

    empty = rd.from_arrow(pa.table({
        "a": pa.array([], pa.string()), "b": pa.array([], pa.string())}))
    assert len(contingency(empty, "a", "b").to_pandas()) == 0
    # and a null-bearing tiny input still routes nulls to their own group
    tiny = rd.from_arrow(pa.table({
        "a": pa.array(["x", None], pa.string()),
        "b": pa.array([None, "y"], pa.string())}))
    got = contingency(tiny, "a", "b").to_pandas()
    assert len(got) == 2 and int(got["grand_total"].iloc[0]) == 2


def test_window_counts_route_null_event_type(ray_session):
    """NULL event_type must form its own group in all three tumbling/
    hopping count folds (SQL GROUP BY semantics), not NaN-corrupt the
    dictionary codes (ADVICE r4)."""
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import (
        US_PER_HOUR,
        hopping_window_counts,
        tumbling_window_counts,
    )

    h = US_PER_HOUR
    tbl = pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([h, h + 1, h + 2, 2 * h], pa.int64()),
        "event_type": pa.array(["click", None, None, "view"], pa.string()),
    })
    ev = rd.from_arrow(tbl).repartition(2)

    got = tumbling_window_counts(ev).take_all()
    by = {(r["window_id"], r["event_type"]): r["n"] for r in got}
    assert by[(1, "click")] == 1 and by[(1, None)] == 2
    assert by[(2, "view")] == 1 and len(by) == 3

    hop = hopping_window_counts(ev, window_us=h, hop_us=h // 2).take_all()
    null_total = sum(r["n"] for r in hop if r["event_type"] is None)
    assert null_total == 4  # each of the 2 null events lands in 2 windows
