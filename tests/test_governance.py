"""ValidationMode gating, duplicate-rule detection, RFC-6901 pointers, and
the published-profile snapshot store — the governance/config surfaces of the
reference (``Models/ValidationRequest.cs:76-97``, ``Models/InstanceScope.cs:
22-25``, ``Navigation/JsonPointerResolver.cs``, rule-set publishing)."""

import pytest

from helpers import make_docs, profile_of, rows, validate

from fhir_data_validation_ray.profile import ProfileError, parse_profile


def s(kind, text=None, ref="", off=None):
    return (kind, text, ref, off)


# ------------------------------------------------------------ ValidationMode
def _mode_profile():
    return profile_of(
        {"id": "BLOCK", "type": "Required", "kind": "Patient", "fieldPath": "text"},
        {"id": "HINT", "type": "Regex", "kind": "Patient", "fieldPath": "text",
         "severity": "error", "validationClass": "Advisory", "isSpecHint": True,
         "params": {"pattern": "^[STFG]"}},
    )


def test_validation_mode_standard_skips_advisory_layer():
    from fhir_data_validation_ray.functions.kernels import CompiledProfile

    docs = make_docs([("d1", [s("Patient", None, off=0)]),
                      ("d2", [s("Patient", "x123", off=0)])])
    std = CompiledProfile(parse_profile(_mode_profile()), validation_mode="standard")
    full = CompiledProfile(parse_profile(_mode_profile()), validation_mode="full")
    got_std = rows(std.validate_batch(docs))
    got_full = rows(full.validate_batch(docs))
    # standard: blocking rule only
    assert got_std == [("d1", 0, "REQUIRED_FIELD_MISSING", "error")]
    # full: adds the spec-hint row, DOWNGRADED to warning (non-blocking)
    assert got_full == [
        ("d1", 0, "REQUIRED_FIELD_MISSING", "error"),
        ("d2", 0, "PATTERN_MISMATCH", "warning"),
    ]
    # identical blocking decisions in both modes (the reference's contract)
    blocking = lambda g: [r for r in g if r[3] == "error"]
    assert blocking(got_std) == blocking(got_full)


def test_validation_mode_debug_alias():
    from fhir_data_validation_ray.functions.kernels import CompiledProfile

    docs = make_docs([("d2", [s("Patient", "x123", off=0)])])
    dbg = CompiledProfile(parse_profile(_mode_profile()), validation_mode="debug")
    assert ("d2", 0, "PATTERN_MISMATCH", "warning") in rows(dbg.validate_batch(docs))


def test_contract_spec_hint_rule_runs_in_standard_mode():
    """A (mis)configured Contract-class rule flagged isSpecHint does NOT
    downgrade (SeverityResolver only downgrades Advisory), so it is a
    BLOCKING error — gating it by mode would let standard and full modes
    disagree on blocking decisions. It must run in standard mode."""
    from fhir_data_validation_ray.functions.kernels import CompiledProfile

    prof = profile_of(
        {"id": "MISCONF", "type": "Regex", "kind": "Patient", "fieldPath": "text",
         "severity": "error", "validationClass": "Contract", "isSpecHint": True,
         "params": {"pattern": "^[STFG]"}},
    )
    docs = make_docs([("d2", [s("Patient", "x123", off=0)])])
    std = CompiledProfile(parse_profile(prof), validation_mode="standard")
    full = CompiledProfile(parse_profile(prof), validation_mode="full")
    want = [("d2", 0, "PATTERN_MISMATCH", "error")]  # error: no downgrade
    assert rows(std.validate_batch(docs)) == want
    assert rows(full.validate_batch(docs)) == want


# ------------------------------------------------------------------ LINT layer
def _lint_profile(**settings):
    p = profile_of()
    p["settings"]["lint"] = True
    p["settings"].update(settings)
    return p


def test_lint_layer_gated_to_full_mode():
    """The lint catalog auto-injects in full/debug mode only
    (``Authoring/LintValidationService.cs`` is a playground-side layer) and
    every emission is a downgraded warning — blocking decisions identical."""
    from fhir_data_validation_ray.functions.kernels import CompiledProfile

    docs = make_docs([("d1", [s("text", "  padded  ", off=0),
                              s("text", "", off=1)])])
    prof = parse_profile(_lint_profile())
    std = CompiledProfile(prof, validation_mode="standard")
    full = CompiledProfile(prof, validation_mode="full")
    assert rows(std.validate_batch(docs)) == []
    got = rows(full.validate_batch(docs))
    assert ("d1", 0, "LINT_UNTRIMMED_VALUE", "warning") in got
    assert ("d1", 1, "LINT_EMPTY_VALUE", "warning") in got
    # nothing lint emits can block
    assert all(r[3] == "warning" for r in got)
    # source column is the reference's LINT source (ValidationPipeline.cs:765)
    src = set(full.validate_batch(docs)["source"].to_pylist())
    assert src == {"LINT"}


def test_lint_rules_fire_per_catalog():
    """One fixture per catalog rule that the sf fixture corpus cannot
    exercise: untrimmed, missing kind, boolean case, duplicate entry —
    plus suspicious-date window overrides."""
    from fhir_data_validation_ray.functions.kernels import CompiledProfile

    docs = make_docs([
        ("d1", [s(None, "x", off=0),                 # missing kind
                s("boolean", "TRUE", off=1),         # wrong case
                s("boolean", "true", off=2),         # exact: ok
                s("date", "1899-12-31", off=3),      # below default window
                s("date", "2101-01-01", off=4),      # above default window
                s("date", "2020-01-01", off=5)]),    # inside: ok
        ("d2", [s("Patient", "S1234567A", off=0),
                s("Patient", "S1234567A", off=1),    # duplicate entry
                s("Patient", "S7654321B", off=2)]),
    ])
    full = CompiledProfile(parse_profile(_lint_profile()),
                           validation_mode="full")
    got = rows(full.validate_batch(docs))
    assert ("d1", 0, "LINT_MISSING_KIND", "warning") in got
    assert ("d1", 1, "LINT_BOOLEAN_CASE", "warning") in got
    assert ("d1", 2, "LINT_BOOLEAN_CASE", "warning") not in got
    assert ("d1", 3, "LINT_SUSPICIOUS_DATE", "warning") in got
    assert ("d1", 4, "LINT_SUSPICIOUS_DATE", "warning") in got
    assert ("d1", 5, "LINT_SUSPICIOUS_DATE", "warning") not in got
    assert ("d2", 1, "LINT_DUPLICATE_ENTRY", "warning") in got
    assert ("d2", 0, "LINT_DUPLICATE_ENTRY", "warning") not in got
    assert ("d2", 2, "LINT_DUPLICATE_ENTRY", "warning") not in got

    # year window override narrows the plausible range
    tight = CompiledProfile(
        parse_profile(_lint_profile(lintYearMin=2021, lintYearMax=2021)),
        validation_mode="full")
    got2 = rows(tight.validate_batch(docs))
    assert ("d1", 5, "LINT_SUSPICIOUS_DATE", "warning") in got2


def test_lint_opt_out_and_control_chars():
    from fhir_data_validation_ray.functions.kernels import CompiledProfile

    docs = make_docs([("d1", [s("text", "bad\x01ref", off=0),
                              s("text", "tab\tok", off=1)])])
    off = CompiledProfile(parse_profile(profile_of()),  # lint: False default
                          validation_mode="full")
    assert rows(off.validate_batch(docs)) == []
    on = CompiledProfile(parse_profile(_lint_profile()),
                         validation_mode="full")
    got = rows(on.validate_batch(docs))
    assert ("d1", 0, "LINT_CONTROL_CHARS", "warning") in got
    assert ("d1", 1, "LINT_CONTROL_CHARS", "warning") not in got


def test_lint_catalog_metadata_complete():
    """Catalog mirrors the reference's metadata-only design
    (``Catalogs/LintRuleCatalog.cs:17-357``): every entry has the stable-id
    fields and a resolvable severity."""
    from fhir_data_validation_ray.catalogs import LINT_CATALOG
    from fhir_data_validation_ray.errors import (
        CLASS_ADVISORY,
        SEV_WARNING,
        resolve_severity,
    )

    assert len(LINT_CATALOG) >= 8
    for code, entry in LINT_CATALOG.items():
        assert code.startswith("LINT_")
        for field in ("category", "title", "description", "severity",
                      "confidence"):
            assert entry[field]
        assert resolve_severity(entry["severity"], CLASS_ADVISORY,
                                is_heuristic=True) == SEV_WARNING


# ----------------------------------------------------------- rule suggestions
def test_suggest_rules_detectors(ray_session):
    """Each detector fires on its designed distribution and respects the
    reference thresholds (SystemRuleSuggestionService.cs:33-38): FixedValue
    needs 30 samples / 1 distinct, AllowedValues 10 samples / 2-10 distinct,
    Required 5 all-present, Regex 80% case-insensitive coverage. Blocklisted
    kinds never suggest."""
    import ray.data as rd

    from fhir_data_validation_ray.stages.suggest import suggest_rules

    rows_in = []
    # FixedValue: 60 spans, all "final" -> high confidence
    rows_in += [(f"f{i}", [("Status", "final", "", 0)]) for i in range(60)]
    # AllowedValues: 12 spans over 3 codes (also Required: all present)
    rows_in += [(f"a{i}", [("Code", ["EN", "MS", "TA"][i % 3], "", 0)])
                for i in range(12)]
    # Regex: 10 NRICs, 9 matching (one lowercase still matches: IgnoreCase),
    # 1 garbage -> 90% coverage, medium confidence
    rows_in += [(f"r{i}", [("Nric", "s1234567A" if i == 0 else
                            ("garbage!" if i == 1 else "S1234567A"), "", 0)])
                for i in range(10)]
    # blocklisted kind with a constant value: never suggested
    rows_in += [(f"t{i}", [("text", "same", "", 0)]) for i in range(40)]
    docs = rd.from_arrow(make_docs(rows_in))
    got = {(r["kind"], r["rule_type"], r["param"]):
           (r["n_samples"], r["n_match"], r["confidence"])
           for r in suggest_rules(docs).take_all()}
    assert got[("Status", "FixedValue", "final")] == (60, 60, "high")
    assert got[("Status", "Required", "")] == (60, 60, "high")
    assert got[("Code", "AllowedValues", "EN,MS,TA")] == (12, 12, "medium")
    assert got[("Code", "Required", "")] == (12, 12, "medium")
    assert got[("Nric", "Regex", "nric")] == (10, 9, "medium")
    assert not any(k[0] == "text" for k in got)


def test_suggested_rule_roundtrip(ray_session):
    """A suggestion materializes into a rule that compiles and validates —
    the apply surface of the suggestion service."""
    import ray.data as rd

    from fhir_data_validation_ray.functions.kernels import CompiledProfile
    from fhir_data_validation_ray.stages.suggest import (
        suggest_rules,
        suggestion_to_rule,
    )

    docs_tbl = make_docs(
        [(f"f{i}", [("Status", "final", "", 0)]) for i in range(30)])
    sugg = [r for r in suggest_rules(rd.from_arrow(docs_tbl)).take_all()
            if r["rule_type"] == "FixedValue"]
    assert sugg
    rule = suggestion_to_rule(sugg[0], "SUGG1")
    prof = parse_profile(profile_of(rule))
    cp = CompiledProfile(prof)
    # conforming corpus: zero violations
    assert cp.validate_batch(docs_tbl).num_rows == 0
    # a deviating doc now fails the suggested rule
    bad = make_docs([("x", [("Status", "amended", "", 0)])])
    got = rows(cp.validate_batch(bad))
    assert got == [("x", 0, "FIXED_VALUE_MISMATCH", "error")]


# ------------------------------------------------------ duplicate definitions
def test_duplicate_rule_definition_rejected():
    p = profile_of(
        {"id": "A", "type": "Required", "kind": "Patient", "fieldPath": "text"},
        {"id": "B", "type": "Required", "kind": "Patient", "fieldPath": "text"},
    )
    with pytest.raises(ProfileError, match="duplicate definition"):
        parse_profile(p)


def test_same_type_different_scope_is_not_duplicate():
    p = profile_of(
        {"id": "A", "type": "Required", "kind": "Patient", "fieldPath": "text"},
        {"id": "B", "type": "Required", "kind": "Patient", "fieldPath": "text",
         "instanceScope": {"kind": "first"}},
        {"id": "C", "type": "Required", "kind": "Observation", "fieldPath": "text"},
    )
    assert len(parse_profile(p).rules) == 3


# ------------------------------------------------------------- JSON pointers
def test_pointer_parse_resolve_normalize():
    from fhir_data_validation_ray.functions.pointers import (
        normalize_pointer,
        parse_pointer,
        resolve_pointer,
    )

    doc = {"doc_id": "d1", "spans": [
        {"kind": "Patient", "text": "S1234567A", "media_ref": "", "offset": 0},
        {"kind": "image", "text": "", "media_ref": "urn:uuid:x", "offset": 3},
    ]}
    assert parse_pointer("") == []
    assert parse_pointer("/spans/1/media_ref") == ["spans", "1", "media_ref"]
    assert parse_pointer("/a~1b/c~0d") == ["a/b", "c~d"]  # RFC 6901 escapes
    assert resolve_pointer(doc, "") == doc
    assert resolve_pointer(doc, "/spans/1/media_ref") == "urn:uuid:x"
    assert resolve_pointer(doc, "/spans/9/text") is None       # out of range
    assert resolve_pointer(doc, "/spans/x/text") is None       # non-index
    assert resolve_pointer(doc, "/nope", default="-") == "-"
    assert normalize_pointer("/a~1b/c~0d") == "/a~1b/c~0d"
    with pytest.raises(ValueError):
        parse_pointer("spans/0")  # missing leading /


def test_fieldpath_navigation_with_predicates():
    """FHIRPath-style paths -> concrete pointers (SmartPathNavigationService
    + PredicateParser analogue): where() filters, [index] steps, collection
    mapping — and every returned pointer resolves back to the value the
    path selected (the round-trip contract)."""
    from fhir_data_validation_ray.functions.pointers import (
        normalize_fieldpath,
        resolve_fieldpath,
        resolve_pointer,
    )

    doc = {"doc_id": "d1", "spans": [
        {"kind": "Patient", "text": "S1234567A", "media_ref": "", "offset": 0},
        {"kind": "image", "text": "", "media_ref": "urn:uuid:x", "offset": 3},
        {"kind": "Patient", "text": "T7654321B", "media_ref": "", "offset": 5},
    ]}
    assert resolve_fieldpath(doc, "doc_id") == ["/doc_id"]
    # collection mapping: every span's field (the rule fieldPath vocabulary)
    for fld in ("kind", "text", "media_ref", "offset"):
        ptrs = resolve_fieldpath(doc, f"spans.{fld}")
        assert ptrs == [f"/spans/{i}/{fld}" for i in range(3)]
        for i, p in enumerate(ptrs):  # round-trip: pointer -> value
            assert resolve_pointer(doc, p) == doc["spans"][i][fld]
    # index step
    assert resolve_fieldpath(doc, "spans[1].media_ref") == ["/spans/1/media_ref"]
    assert resolve_fieldpath(doc, "spans[9].text") == []        # out of range
    # predicates: quoted, bare-int, and-chained, first-match index
    assert resolve_fieldpath(doc, "spans.where(kind='Patient').text") == [
        "/spans/0/text", "/spans/2/text"]
    assert resolve_fieldpath(doc, "spans.where(offset=3).kind") == ["/spans/1/kind"]
    assert resolve_fieldpath(
        doc, "spans.where(kind='Patient' and text='T7654321B').offset"
    ) == ["/spans/2/offset"]
    assert resolve_fieldpath(doc, "spans.where(kind='Patient')[1].text") == [
        "/spans/2/text"]
    assert resolve_fieldpath(doc, "spans.where(kind='Wizard').text") == []
    assert normalize_fieldpath(doc, "spans.where(kind='image').media_ref") == \
        "/spans/1/media_ref"
    assert normalize_fieldpath(doc, "spans.where(kind='Wizard').text") is None
    # dotted value inside a predicate survives the path split
    doc2 = {"doc_id": "d", "spans": [
        {"kind": "text", "text": "a.b", "media_ref": "", "offset": 0}]}
    assert resolve_fieldpath(doc2, "spans.where(text='a.b').offset") == [
        "/spans/0/offset"]
    with pytest.raises(ValueError):
        resolve_fieldpath(doc, "spans.where(kind='Patient'")  # unbalanced
    with pytest.raises(ValueError):
        resolve_fieldpath(doc, "spans.where(!!).text")


def test_span_pointer_vectorized_roundtrip(ray_session):
    """Engine-emitted pointers parse back to (span_index, field) in one
    vectorized pass — the violations -> spans join lane."""
    import numpy as np

    from fhir_data_validation_ray.functions.pointers import parse_span_pointers

    docs = make_docs([("d1", [s("Patient", None, off=0), s("Patient", "  ", off=1)])])
    p = profile_of({"id": "R", "type": "Required", "kind": "Patient", "fieldPath": "text"})
    v = validate(docs, p)
    idx, field, valid = parse_span_pointers(v["json_pointer"])
    assert valid.all()
    assert sorted(idx.tolist()) == [0, 1]
    assert set(field.to_pylist()) == {"text"}
    assert np.array_equal(np.sort(idx), np.sort(np.asarray(v["span_index"]).astype("int64")))


# ------------------------------------------------------------- profile store
def test_profile_store_publish_load_immutability(tmp_path):
    from fhir_data_validation_ray.pipelines.profiles import ProfileStore, default_profile

    store = ProfileStore(str(tmp_path / "profiles"))
    p1 = default_profile()
    e1 = store.publish(p1)
    assert store.versions() == ["1.0"]
    assert store.load() == p1
    assert store.load("1.0") == p1
    # identical re-publish: no-op, same entry
    assert store.publish(default_profile()) == e1
    # same version, different content: refused
    p_bad = default_profile()
    p_bad["rules"] = p_bad["rules"][:3]
    with pytest.raises(ValueError, match="already published"):
        store.publish(p_bad)
    # bumped version: accepted, latest wins for load(None)
    p2 = default_profile()
    p2["version"] = "1.1"
    p2["rules"] = p2["rules"][:3]
    store.publish(p2)
    assert store.versions() == ["1.0", "1.1"]
    assert store.load()["version"] == "1.1"
    # a broken profile never publishes
    with pytest.raises(ProfileError):
        store.publish({"version": "2.0", "rules": [{"id": "X", "type": "Nope"}]})


# --------------------------------------------- extension-grammar composition
def test_extension_analogue_url_plus_exclusivity():
    """The reference's Extension grammar (url + exactly-one value[x],
    ``JsonNodeStructuralValidator.cs:1087-1185``) has no dedicated span
    field; its two constraints map onto existing kernels — url primitive on
    the extension's reference field + value[x] Exclusivity (SURVEY §8.4
    documents this mapping)."""
    docs = make_docs(
        [
            ("d1", [s("Extension", "v", "https://example.org/ext/a", off=0)]),  # ok
            ("d2", [s("Extension", "v", "not a url", off=0)]),   # bad url grammar
            ("d3", [s("Extension", None, "https://example.org/ext/a", off=0)]),  # ok
        ]
    )
    p = profile_of(
        {"id": "XU", "type": "Primitive", "kind": "Extension",
         "fieldPath": "media_ref", "params": {"primitive": "url"}},
    )
    assert rows(validate(docs, p)) == [("d2", 0, "FHIR_INVALID_PRIMITIVE", "error")]


# ------------------------------------------------------- question import
CSV_SAMPLE = """system,conceptCode,questionText,allowedValues,allowMultiple,separator
https://example.org/terms,blood-type,What is your blood type?,A+|A-|O+|O-,false,|
https://example.org/terms,marital,What is your marital status?,Single,Married,Widowed,false,,
https://example.org/terms,employ,Employment?,Employed;Retired;Student,true,;
"""

JSON_SAMPLE = """[
  {"system": "https://example.org/terms", "conceptCode": "blood-type",
   "questionText": "q", "allowedValues": ["A+", "A-", "O+", "O-"],
   "allowMultiple": false, "separator": ","},
  {"system": "https://example.org/terms", "conceptCode": "employ",
   "questionText": "q", "allowedValues": ["Employed", "Retired", "Student"],
   "allowMultiple": true, "separator": ";"}
]"""


def test_question_import_csv_including_unquoted_comma_quirk():
    from fhir_data_validation_ray.sources.question_import import questions_from_csv

    out = questions_from_csv(CSV_SAMPLE)
    by_code = {q["code"]: q for q in out["questions"]}
    assert by_code["blood-type"]["allowed"] == ["A+", "A-", "O+", "O-"]
    # unquoted comma-separated values re-joined, then split on ',' (the
    # reference sample's quirk: empty separator field means ',')
    assert by_code["marital"]["allowed"] == ["Single", "Married", "Widowed"]
    assert by_code["employ"]["allowed"] == ["Employed", "Retired", "Student"]
    assert by_code["employ"]["multiValue"] is True
    assert out["codeSystems"][0]["url"] == "https://example.org/terms"
    assert len(out["codeSystems"][0]["concept"]) == 3


def test_question_export_roundtrips_both_formats():
    """Export is the inverse of import: import(export(import(x))) ==
    import(x) for CSV (including the unquoted-comma quirk: a comma-separated
    value set writes an empty separator field) and JSON."""
    from fhir_data_validation_ray.sources.question_import import (
        questions_from_csv,
        questions_from_json,
        questions_to_csv,
        questions_to_json,
    )

    frag = questions_from_csv(CSV_SAMPLE)
    csv_text = questions_to_csv(frag)
    assert questions_from_csv(csv_text) == frag
    # comma-safe value sets export with an EMPTY separator field (the quirk)
    marital_row = next(ln for ln in csv_text.splitlines() if ",marital," in ln)
    assert marital_row.endswith("false,")
    assert "Single,Married,Widowed" in marital_row
    assert questions_from_json(questions_to_json(frag)) == frag
    # a value set using every supported separator cannot be exported unquoted
    import pytest as _pytest

    from fhir_data_validation_ray.profile import ProfileError

    bad = {"questions": [{"code": "q", "type": "code",
                          "allowed": ["a,b", "c|d", "e;f", "g:h"]}],
           "codeSystems": []}
    with _pytest.raises(ProfileError, match="separator"):
        questions_to_csv(bad)


def test_question_import_json_and_engine_roundtrip():
    """Imported questions drive the QuestionAnswer kernel end-to-end."""
    from fhir_data_validation_ray.sources.question_import import questions_from_json

    out = questions_from_json(JSON_SAMPLE)
    docs = make_docs(
        [
            ("d1", [s("Question", "blood-type=A+", off=0)]),          # ok
            ("d2", [s("Question", "blood-type=Z-", off=0)]),          # bad value
            ("d3", [s("Question", "employ=Employed,Student", off=0)]),  # multi ok
            ("d4", [s("Question", "unknown-q=x", off=0)]),            # unknown
        ]
    )
    p = profile_of(
        {"id": "QA", "type": "QuestionAnswer", "kind": "Question",
         "fieldPath": "text", "params": {"questions": out["questions"]}},
    )
    assert rows(validate(docs, p)) == [
        ("d2", 0, "ANSWER_NOT_IN_VALUESET", "error"),
        ("d4", 0, "UNKNOWN_QUESTION", "error"),
    ]


def test_question_import_rejects_duplicates_and_empty():
    from fhir_data_validation_ray.sources.question_import import questions_from_json

    with pytest.raises(ProfileError, match="duplicate"):
        questions_from_json(
            '[{"system":"s","conceptCode":"a","allowedValues":["x"]},'
            ' {"system":"s","conceptCode":"a","allowedValues":["y"]}]'
        )
    with pytest.raises(ProfileError, match="empty allowedValues"):
        questions_from_json('[{"system":"s","conceptCode":"a","allowedValues":[""]}]')


def test_cli_validate_and_resume(ray_session, tmp_path):
    """`python -m fhir_data_validation_ray validate` — the ray-job-submit
    surface: first run processes, second resumes with zero partition work."""
    import json

    from fhir_data_validation_ray.__main__ import main

    out = str(tmp_path / "run")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["validate", "--sf-dir", "/root/testdata/sf0.001",
                     "--out", out]) == 0
        assert main(["validate", "--sf-dir", "/root/testdata/sf0.001",
                     "--out", out]) == 0
    first, second = (json.loads(l) for l in buf.getvalue().strip().splitlines())
    assert first["n_processed_this_run"] == first["n_partitions"]
    assert second["n_processed_this_run"] == 0
    assert second["n_resumed_skips"] == second["n_partitions"]
    assert first["n_violations"] == second["n_violations"] > 0


def test_cli_curate_writes_keep_list(ray_session, tmp_path):
    """`python -m fhir_data_validation_ray curate` writes the curated
    keep-list as partitioned parquet and matches the library result."""
    import contextlib
    import io
    import json

    import pyarrow.parquet as pq
    import ray.data as rd

    from fhir_data_validation_ray.__main__ import main
    from fhir_data_validation_ray.pipelines.curation import curate_keep_list

    out = str(tmp_path / "keep")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["curate", "--docs", "/root/testdata/sf0.001/documents.parquet",
                     "--out", out, "--sample-rate", "0.9"]) == 0
    rec = json.loads(buf.getvalue().strip().splitlines()[-1])
    got = sorted(pq.ParquetDataset(out).read(columns=["doc_id"])["doc_id"].to_pylist())
    want = sorted(
        curate_keep_list(
            rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                            columns=["doc_id", "text"]),
            sample_rate=0.9,
        ).to_pandas()["doc_id"]
    )
    assert rec["kept"] == len(want) > 0
    assert got == want


def test_checkpointed_mode_does_not_reuse_other_modes_manifests(ray_session, tmp_path):
    """A full-mode run after a standard-mode run must re-process every
    partition (advisory rows differ), while a same-mode re-run resumes."""
    from fhir_data_validation_ray.pipelines.checkpointed import run_checkpointed
    from fhir_data_validation_ray.pipelines.profiles import default_profile

    p = default_profile()
    p["rules"].append(
        {"id": "HINT", "type": "Regex", "kind": "Patient", "fieldPath": "text",
         "severity": "error", "validationClass": "Advisory", "isSpecHint": True,
         "params": {"pattern": "^[S]"}})
    out = str(tmp_path / "run")
    std = run_checkpointed("/root/testdata/sf0.001", out, p)
    full = run_checkpointed("/root/testdata/sf0.001", out, p,
                            validation_mode="full")
    full2 = run_checkpointed("/root/testdata/sf0.001", out, p,
                             validation_mode="full")
    assert std["n_processed_this_run"] == std["n_partitions"]
    assert full["n_processed_this_run"] == full["n_partitions"]  # no reuse
    assert full2["n_processed_this_run"] == 0                    # same mode resumes
    assert full["n_violations"] > std["n_violations"]            # advisory rows added


def test_jsonl_ingest_quarantine(ray_session, tmp_path):
    """Clean blocks take the vectorized parse; corrupted lines fall to the
    per-line quarantine with INVALID_JSON and the raw line preserved;
    parsed spans round-trip exactly (order, nulls, offsets)."""
    from fhir_data_validation_ray.sources.json_ingest import (
        INVALID_JSON,
        read_documents_jsonl,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id":"a","spans":[{"kind":"Patient","text":"t1","media_ref":null,"offset":0}]}\n'
        '{"doc_id":"b","spans":[]}\n'
        'not json at all\n'
        '{"doc_id":"c","spans":[{"kind":"Observation","text":null,"media_ref":"m://1","offset":1}]}\n'
        '{"truncated": \n',
        encoding="utf-8",
    )
    rows_out = read_documents_jsonl(str(p)).take_all()
    by_id = {r["doc_id"]: r for r in rows_out if r["doc_id"] is not None}
    assert by_id["a"]["error"] is None
    assert len(by_id["a"]["spans"]) == 1
    assert by_id["a"]["spans"][0]["kind"] == "Patient"
    assert len(by_id["b"]["spans"]) == 0
    assert by_id["c"]["spans"][0]["media_ref"] == "m://1"
    bad = [r for r in rows_out if r["error"] == INVALID_JSON]
    assert len(bad) == 2
    assert {r["raw"] for r in bad} == {"not json at all", '{"truncated": '}


# ------------------------------------------------- terminology advisories
def _adv_rows(profile):
    from fhir_data_validation_ray.terminology import terminology_advisories

    return terminology_advisories(profile).to_pylist()


def test_terminology_clean_profile_no_advisories():
    p = {
        "codeSystems": [{"url": "u1", "concept": [
            {"code": "a", "display": "A"}, {"code": "b", "display": "B"}]}],
        "rules": [{"id": "R", "type": "CodeSystem", "fieldPath": "text",
                   "params": {"system": "u1", "codes": ["a", "b"]}}],
    }
    assert _adv_rows(p) == []


def test_terminology_code_not_found_all_rule_shapes():
    p = {
        "codeSystems": [{"url": "u1", "concept": [
            {"code": "a", "display": "A"}]}],
        "rules": [
            {"id": "R1", "type": "CodeSystem", "fieldPath": "text",
             "params": {"system": "u1", "codes": ["a", "zz"]}},
            {"id": "R2", "type": "AllowedValues", "fieldPath": "text",
             "params": {"system": "u1", "values": ["a", "yy"]}},
            {"id": "R3", "type": "FixedValue", "fieldPath": "text",
             "params": {"system": "u1", "value": "xx"}},
            # no system declared -> never checked (plain value-set rule)
            {"id": "R4", "type": "AllowedValues", "fieldPath": "text",
             "params": {"values": ["unrelated"]}},
        ],
    }
    nf = [(r["rule_id"], r["code"]) for r in _adv_rows(p)
          if r["advisory_code"] == "CODE_NOT_FOUND"]
    assert nf == [("R1", "zz"), ("R2", "yy"), ("R3", "xx")]


def test_terminology_display_mismatch_and_first_declaration_wins():
    p = {
        "codeSystems": [{"url": "u1", "concept": [
            {"code": "a", "display": "First"},
            {"code": "a", "display": "Second"}]}],
        "rules": [
            # matches the FIRST declaration -> no mismatch
            {"id": "R1", "type": "FixedValue", "fieldPath": "text",
             "params": {"system": "u1",
                        "value": {"code": "a", "display": "First"}}},
            # differs from the first declaration -> mismatch
            {"id": "R2", "type": "FixedValue", "fieldPath": "text",
             "params": {"system": "u1",
                        "value": {"code": "a", "display": "Second"}}},
        ],
    }
    rows = _adv_rows(p)
    mm = [r["rule_id"] for r in rows
          if r["advisory_code"] == "DISPLAY_MISMATCH"]
    assert mm == ["R2"]
    # the duplicate declaration itself is flagged once
    assert [r["code"] for r in rows
            if r["advisory_code"] == "DUPLICATE_CODE"] == ["a"]


def test_terminology_codesystem_not_found_once_per_rule():
    p = {
        "codeSystems": [],
        "rules": [{"id": "R1", "type": "CodeSystem", "fieldPath": "text",
                   "params": {"system": "nowhere", "codes": ["a", "b"]}}],
    }
    rows = _adv_rows(p)
    assert [r["advisory_code"] for r in rows] == ["CODESYSTEM_NOT_FOUND"]
    assert rows[0]["severity"] == "error" and rows[0]["rule_id"] == "R1"


def test_terminology_missing_display_blank_counts():
    p = {
        "codeSystems": [{"url": "u1", "concept": [
            "bare",                       # bare-string spelling: no display
            {"code": "w", "display": "  "},   # whitespace-only
            {"code": "ok", "display": "OK"}]}],
        "rules": [],
    }
    md = sorted(r["code"] for r in _adv_rows(p)
                if r["advisory_code"] == "MISSING_DISPLAY")
    assert md == ["bare", "w"]


def test_terminology_fixture_sql_matches_engine(tmp_path):
    """The materialized-relation oracle replays the engine sweep exactly
    (the v_terminology driver pair, checked here end-to-end)."""
    import duckdb

    from fhir_data_validation_ray.pipelines.profiles import (
        terminology_review_profile,
    )
    from fhir_data_validation_ray.terminology import (
        terminology_advisories,
        terminology_fixture_paths,
        terminology_sql,
    )

    p = terminology_review_profile()
    mine = terminology_advisories(p).to_pandas()
    want = duckdb.connect().execute(
        terminology_sql(terminology_fixture_paths(p, root=str(tmp_path)))
    ).df()

    def norm(df):
        df = df[sorted(df.columns)].fillna("")
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    assert norm(mine).equals(norm(want))
    # the review profile exercises every advisory code
    assert set(mine["advisory_code"]) == {
        "CODE_NOT_FOUND", "CODESYSTEM_NOT_FOUND", "DISPLAY_MISMATCH",
        "DUPLICATE_CODE", "MISSING_DISPLAY"}


# ------------------------------------------- question-catalog validator
def test_question_catalog_default_profile_is_clean():
    from fhir_data_validation_ray.governance import validate_question_catalog
    from fhir_data_validation_ray.pipelines.profiles import QA_QUESTIONS

    assert validate_question_catalog(QA_QUESTIONS) == {}


@pytest.mark.parametrize("q,frag", [
    ({"code": "", "type": "boolean"}, "Code is required"),
    ({"code": "Q", "type": "mystery"}, "Unknown answer type"),
    ({"code": "Q", "type": "code"}, "must have a value set"),
    ({"code": "Q", "type": "code", "allowed": ["a"], "unit": "mg"},
     "cannot have Unit"),
    ({"code": "Q", "type": "code", "allowed": ["a"], "min": 1},
     "numeric constraints"),
    ({"code": "Q", "type": "quantity"}, "must have Unit"),
    ({"code": "Q", "type": "quantity", "unit": "mg", "allowed": ["a"]},
     "cannot have a value set"),
    ({"code": "Q", "type": "quantity", "unit": "mg", "pattern": "x"},
     "string constraints"),
    ({"code": "Q", "type": "quantity", "unit": "mg", "min": 5, "max": 1},
     "Min cannot be greater than Max"),
    ({"code": "Q", "type": "integer", "min": 1.5}, "whole number min"),
    ({"code": "Q", "type": "integer", "unit": "kg"}, "cannot have Unit"),
    ({"code": "Q", "type": "decimal", "maxLength": 4},
     "string constraints"),
    ({"code": "Q", "type": "string", "min": 0}, "numeric constraints"),
    ({"code": "Q", "type": "string", "pattern": "("}, "Regex pattern"),
    ({"code": "Q", "type": "string", "maxLength": 0},
     "MaxLength must be positive"),
    ({"code": "Q", "type": "boolean", "allowed": ["true"]},
     "cannot have a value set"),
])
def test_question_validator_per_type_contract(q, frag):
    from fhir_data_validation_ray.governance import validate_question

    errs = validate_question(q)
    assert any(frag in e for e in errs), (q, errs)


def test_question_catalog_duplicates_flagged():
    from fhir_data_validation_ray.governance import validate_question_catalog

    got = validate_question_catalog([
        {"code": "Q1", "type": "boolean"},
        {"code": "Q1", "type": "boolean"},
    ])
    assert "Duplicate question code 'Q1'" in got["Q1"]


def test_review_blocks_invalid_inline_catalog():
    from fhir_data_validation_ray.governance import BLOCKED, review_rule

    res = review_rule({
        "id": "RQ", "type": "QuestionAnswer", "kind": "Question",
        "fieldPath": "text",
        "params": {"questions": [
            {"code": "Q1", "type": "boolean"},              # fine
            {"code": "Q2", "type": "code"},                  # missing set
        ]},
    })
    assert res.status == BLOCKED
    bad = [i for i in res.issues if i.code == "QUESTION_CATALOG_INVALID"]
    assert len(bad) == 1 and bad[0].facts["questionCode"] == "Q2"


def test_question_validator_flags_non_numeric_bounds_without_crashing():
    """Review r5: malformed numeric authoring input must produce errors,
    not ValueError (the report-don't-throw contract)."""
    from fhir_data_validation_ray.governance import (
        BLOCKED,
        review_rule,
        validate_question,
    )

    errs = validate_question({"code": "Q", "type": "integer", "min": "abc"})
    assert any("numeric" in e for e in errs)
    errs = validate_question({"code": "Q", "type": "quantity",
                              "unit": "mg", "min": "x", "max": 3})
    assert any("min must be numeric" in e for e in errs)
    errs = validate_question({"code": "Q", "type": "string",
                              "maxLength": "big"})
    assert "MaxLength must be positive" in errs
    # and the review gate reviews instead of crashing
    res = review_rule({"id": "R", "type": "QuestionAnswer",
                       "fieldPath": "text",
                       "params": {"questions": [
                           {"code": "Q", "type": "integer",
                            "min": "abc"}]}})
    assert res.status == BLOCKED


def test_question_catalog_duplicate_keeps_first_entrys_errors():
    """Review r5: a later duplicate must MERGE, not overwrite, the
    earlier occurrence's error list."""
    from fhir_data_validation_ray.governance import validate_question_catalog

    got = validate_question_catalog([
        {"code": "Q", "type": "nope"},      # invalid type
        {"code": "Q", "type": "boolean"},   # clean duplicate
    ])
    assert any("Unknown answer type" in e for e in got["Q"])
    assert any("Duplicate question code" in e for e in got["Q"])
