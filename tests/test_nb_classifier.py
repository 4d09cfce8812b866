"""Behavioral tests for nb_classifier (count-based classifier training) on
handcrafted corpora where the label IS learnable — the oracle-parity suite
covers the sf-fixture query (where lang is near-independent of the text, so
accuracy is uninformative; parity is the gate there)."""

import numpy as np
import pyarrow as pa


def _from_table(tbl, blocks=1):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(blocks)


def _train_mask(ids):
    from fhir_data_validation_ray.stages.sampling import SAMPLE_MOD
    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.textops import NB_TRAIN_RATE

    thr = np.uint64(int(NB_TRAIN_RATE * SAMPLE_MOD))
    return (hash_str(np.asarray(ids, dtype=np.int64).astype("U"))
            % np.uint64(SAMPLE_MOD)) < thr


def test_nb_learns_separable_markers(ray_session):
    """Marker words perfectly separating the classes in the train band ->
    every held-out doc is classified by its markers, despite shared filler
    words in every doc."""
    from fhir_data_validation_ray.stages.textops import nb_classifier

    n = 120
    ids = np.arange(n, dtype=np.int64)
    langs = ["en" if i % 2 == 0 else "de" for i in range(n)]
    texts = [
        ("aaa aaa shared filler words here"
         if l == "en" else "bbb bbb shared filler words here")
        for l in langs
    ]
    docs = _from_table(pa.table({
        "doc_id": pa.array(ids), "text": pa.array(texts),
        "lang": pa.array(langs),
    }), blocks=4)
    out = {r["doc_id"]: r for r in nb_classifier(docs).take_all()}
    tr = _train_mask(ids)
    held = [i for i in range(n) if not tr[i]]
    assert sorted(out) == held  # train docs never scored
    assert any(tr), "fixture should have train docs"
    for i in held:
        r = out[i]
        assert r["n_words"] == 6
        assert r["pred"] == (1 if langs[i] == "en" else 0), (i, r)
        # markers dominate: the winning side's evidence is strictly larger
        if langs[i] == "en":
            assert r["score_pos"] > r["score_neg"]
        else:
            assert r["score_neg"] > r["score_pos"]


def test_nb_unseen_words_near_neutral(ray_session):
    """A held-out doc made ONLY of words absent from the train band gets
    near-neutral two-sided evidence (within the Laplace/prior ratio), and
    zero-word docs emit nothing."""
    from fhir_data_validation_ray.stages.textops import nb_classifier, NB_SCALE

    ids = np.arange(60, dtype=np.int64)
    tr = _train_mask(ids)
    held_ids = [int(i) for i in ids if not tr[i]]
    assert held_ids
    texts, langs = [], []
    for i in ids:
        if tr[i]:
            texts.append("common words both classes")
            langs.append("en" if i % 2 == 0 else "de")
        elif int(i) == held_ids[0]:
            texts.append("zzz yyy xxx")  # never in train
            langs.append("en")
        else:
            texts.append("")  # zero words -> absent from output
            langs.append("de")
    docs = _from_table(pa.table({
        "doc_id": pa.array(ids), "text": pa.array(texts),
        "lang": pa.array(langs),
    }), blocks=3)
    out = {r["doc_id"]: r for r in nb_classifier(docs).take_all()}
    assert list(out) == [held_ids[0]]
    r = out[held_ids[0]]
    # unseen word weight is exactly r_pos / r_neg per position: both within
    # a factor (K_max/K_min) of scale, and equal across the 3 positions
    assert r["n_words"] == 3
    assert r["score_pos"] % 3 == 0 and r["score_neg"] % 3 == 0
    assert 0 < r["score_pos"] <= 3 * 2 * NB_SCALE
    assert 0 < r["score_neg"] <= 3 * 2 * NB_SCALE


def test_nb_empty_train_band_is_neutral(ray_session):
    """With every doc held out (no train rows at all), the guard keeps the
    fold defined: all evidence is the neutral scale on both sides."""
    from fhir_data_validation_ray.stages.textops import nb_classifier, NB_SCALE

    ids = np.arange(40, dtype=np.int64)
    tr = _train_mask(ids)
    held_ids = [int(i) for i in ids if not tr[i]]
    tbl = pa.table({
        "doc_id": pa.array(np.asarray(held_ids, dtype=np.int64)),
        "text": pa.array(["some words here"] * len(held_ids)),
        "lang": pa.array(["en"] * len(held_ids)),
    })
    out = nb_classifier(_from_table(tbl, blocks=2)).take_all()
    assert len(out) == len(held_ids)
    for r in out:
        assert r["score_pos"] == r["score_neg"] == 3 * NB_SCALE
        assert r["pred"] == 0  # strict compare: ties are negative
