"""Per-kernel unit tests — the fixture style of the reference's engine tests
(``FhirPathRuleEngineTests.cs``, grammar suites, ``ReferenceResolverTests.cs``):
tiny documents built in code, assertions on (doc_id, span_index, error_code,
severity) rows."""

import pyarrow as pa

from helpers import make_docs, profile_of, rows, validate

from fhir_data_validation_ray import errors as E


def s(kind, text=None, ref="", off=None):
    return (kind, text, ref, off)


def test_required_missing_and_whitespace():
    docs = make_docs(
        [
            ("d1", [s("Patient", "S1234567A", off=0)]),
            ("d2", [s("Patient", None, off=0)]),
            ("d3", [s("Patient", "   ", off=0)]),
            ("d4", [s("Observation", None, off=0)]),  # other kind: not selected
        ]
    )
    p = profile_of({"id": "R", "type": "Required", "kind": "Patient", "fieldPath": "text"})
    v = validate(docs, p)
    assert rows(v) == [
        ("d2", 0, "REQUIRED_FIELD_MISSING", "error"),
        ("d3", 0, "REQUIRED_FIELD_MISSING", "error"),
    ]


def test_fixed_value_first_scope():
    docs = make_docs(
        [
            ("d1", [s("Encounter", "inpatient", off=0), s("Encounter", "ambulatory", off=1)]),
            ("d2", [s("Encounter", "ambulatory", off=0), s("Encounter", "inpatient", off=1)]),
            ("d3", [s("Encounter", None, off=0)]),  # empty passes
        ]
    )
    p = profile_of(
        {"id": "R", "type": "FixedValue", "kind": "Encounter", "fieldPath": "text",
         "instanceScope": {"kind": "first"}, "params": {"value": "ambulatory"}}
    )
    assert rows(validate(docs, p)) == [("d1", 0, "FIXED_VALUE_MISMATCH", "error")]


def test_allowed_values_empty_passes():
    docs = make_docs(
        [
            ("d1", [s("Observation", "final", off=0), s("Observation", "bogus", off=1)]),
            ("d2", [s("Observation", "", off=0)]),
        ]
    )
    p = profile_of(
        {"id": "R", "type": "AllowedValues", "kind": "Observation", "fieldPath": "text",
         "params": {"values": ["final", "amended"]}}
    )
    assert rows(validate(docs, p)) == [("d1", 1, "VALUE_NOT_ALLOWED", "error")]


def test_regex_search_semantics():
    docs = make_docs(
        [
            ("d1", [s("Patient", "S1234567A", off=0)]),
            ("d2", [s("Patient", "x1234567A", off=0)]),
        ]
    )
    p = profile_of(
        {"id": "R", "type": "Regex", "kind": "Patient", "fieldPath": "text",
         "params": {"pattern": "^[STFG]\\d{7}[A-Z]$"}}
    )
    assert rows(validate(docs, p)) == [("d2", 0, "PATTERN_MISMATCH", "error")]


def test_regex_python_fallback_lane():
    # lookbehind is not RE2-supported -> Python re lane (RuleEvaluationPlanner
    # dual-lane analogue)
    docs = make_docs(
        [("d1", [s("text", "abcX", off=0)]), ("d2", [s("text", "zzzY", off=0)])]
    )
    p = profile_of(
        {"id": "R", "type": "Regex", "kind": "text", "fieldPath": "text",
         "params": {"pattern": "(?<=abc)X"}}
    )
    assert rows(validate(docs, p)) == [("d2", 0, "PATTERN_MISMATCH", "error")]


def test_array_length_bounds_and_kind_restriction():
    docs = make_docs(
        [
            ("d1", []),
            ("d2", [s("text", "a", off=i) for i in range(3)]),
            ("d3", [s("text", "a", off=0)]),
        ]
    )
    p = profile_of(
        {"id": "R", "type": "ArrayLength", "kind": "*", "fieldPath": "spans",
         "params": {"min": 1, "max": 2}}
    )
    assert rows(validate(docs, p)) == [
        ("d1", -1, "ARRAY_LENGTH_OUT_OF_RANGE", "error"),
        ("d2", -1, "ARRAY_LENGTH_OUT_OF_RANGE", "error"),
    ]


def test_code_system_mismatch_and_unknown_code():
    docs = make_docs(
        [
            ("d1", [s("Coding", "EN", off=0)]),
            ("d2", [s("Coding", "XX", off=0)]),
            ("d3", [s("Coding", "https://cs/lang|EN", off=0)]),
            ("d4", [s("Coding", "wrong|EN", off=0)]),
        ]
    )
    p = profile_of(
        {"id": "R", "type": "CodeSystem", "kind": "Coding", "fieldPath": "text",
         "params": {"system": "https://cs/lang"}},
        codeSystems=[{"url": "https://cs/lang", "concept": [{"code": "EN"}, {"code": "MS"}]}],
    )
    assert rows(validate(docs, p)) == [
        ("d2", 0, "CODE_NOT_IN_VALUESET", "error"),
        ("d4", 0, "CODESYSTEM_MISMATCH", "error"),
    ]


def test_required_spans_counts_and_reject_undeclared():
    docs = make_docs(
        [
            ("d1", [s("Patient", "a", off=0)]),
            ("d2", [s("Observation", "x", off=0)]),
            ("d3", [s("Patient", "a", off=0), s("Patient", "b", off=1), s("Patient", "c", off=2)]),
        ]
    )
    p = profile_of(
        {"id": "R", "type": "RequiredSpans", "kind": "*",
         "params": {"requirements": [{"kind": "Patient", "min": 1, "max": 2}],
                    "rejectUndeclared": True}}
    )
    got = rows(validate(docs, p))
    assert ("d2", -1, "RESOURCE_REQUIREMENT_VIOLATION", "error") in got  # min
    assert ("d3", -1, "RESOURCE_REQUIREMENT_VIOLATION", "error") in got  # max
    # d2's Observation is undeclared
    assert got.count(("d2", -1, "RESOURCE_REQUIREMENT_VIOLATION", "error")) == 2


def test_required_spans_where_filter():
    docs = make_docs(
        [
            ("d1", [s("Observation", "final", off=0)]),
            ("d2", [s("Observation", "draft", off=0)]),
        ]
    )
    p = profile_of(
        {"id": "R", "type": "RequiredSpans", "kind": "*",
         "params": {"requirements": [
             {"kind": "Observation", "min": 1, "where": ["text == 'final'"]}]}}
    )
    assert rows(validate(docs, p)) == [("d2", -1, "RESOURCE_REQUIREMENT_VIOLATION", "error")]


def test_reference_local_resolution_and_type_mismatch():
    docs = make_docs(
        [
            ("d1", [s("Patient", "a", off=0), s("Observation", "x", "Patient/d1.0", off=1)]),
            ("d2", [s("Patient", "a", off=0), s("Observation", "x", "Encounter/d2.0", off=1)]),
            ("d3", [s("Observation", "x", "Patient/d3.9", off=0)]),
        ]
    )
    p = profile_of(
        {"id": "R", "type": "Reference", "kind": "*",
         "params": {"policy": "InBundleOnly"}}
    )
    assert rows(validate(docs, p)) == [
        ("d2", 1, "REFERENCE_TYPE_MISMATCH", "error"),
        ("d3", 0, "REFERENCE_NOT_FOUND", "error"),
    ]


def test_reference_policies_registry_and_severity():
    docs = make_docs([("d1", [s("image", "", "urn:uuid:beef", off=0),
                              s("image", "", "urn:uuid:dead", off=1)])])
    rule = {"id": "R", "type": "Reference", "kind": "*", "params": {"policy": "AllowExternal"}}
    v = validate(docs, profile_of(dict(rule)), registry=["urn:uuid:beef"])
    assert rows(v) == [("d1", 1, "REFERENCE_NOT_FOUND", "warning")]

    rule["params"]["policy"] = "RequireResolution"
    v = validate(docs, profile_of(dict(rule)), registry=["urn:uuid:beef"])
    assert rows(v) == [("d1", 1, "REFERENCE_NOT_FOUND", "error")]

    rule["params"]["policy"] = "InBundleOnly"
    v = validate(docs, profile_of(dict(rule)), registry=["urn:uuid:beef"])
    assert len(rows(v)) == 2  # external refs are never in-bundle


def test_reference_cross_span_repeats_error_independently():
    # the reference dedups repeated refs WITHIN one resource
    # (ReferenceResolver.cs:89-103); a span holds one ref, so cross-span
    # repeats of the same ref each get their own error (cross-entry repeats
    # are NOT deduped in the reference either)
    docs = make_docs(
        [("d1", [s("image", "", "urn:uuid:x", off=0), s("image", "", "urn:uuid:x", off=1)])]
    )
    p = profile_of({"id": "R", "type": "Reference", "kind": "*",
                    "params": {"policy": "RequireResolution"}})
    got = rows(validate(docs, p, registry=["urn:uuid:other"]))
    assert got == [("d1", 0, "REFERENCE_NOT_FOUND", "error"),
                   ("d1", 1, "REFERENCE_NOT_FOUND", "error")]


def test_empty_document_emits_empty_bundle():
    """Stage-0 sanity: a zero-span document gets one EMPTY_BUNDLE STRUCTURE
    row (``Core/ValidationPipeline.cs:610-656``); non-empty docs don't."""
    docs = make_docs([("d1", []), ("d2", [s("Patient", "S1234567A", off=0)])])
    p = profile_of()
    p["settings"]["checkEmptyDoc"] = True
    assert rows(validate(docs, p)) == [("d1", -1, "EMPTY_BUNDLE", "error")]
    # the default profile enables the check; profiles may opt out
    p["settings"]["checkEmptyDoc"] = False
    assert rows(validate(docs, p)) == []


def test_custom_predicate_expr():
    docs = make_docs(
        [("d1", [s("Observation", "final", off=0)]),
         ("d2", [s("Observation", "cancelled", off=0)]),
         ("d3", [s("Observation", None, off=0)])]
    )
    p = profile_of(
        {"id": "R", "type": "CustomPredicate", "kind": "Observation", "fieldPath": "text",
         "params": {"expr": "text != 'cancelled'"}}
    )
    assert rows(validate(docs, p)) == [
        ("d2", 0, "CUSTOMFHIRPATH_CONDITION_FAILED", "error"),
        ("d3", 0, "CUSTOMFHIRPATH_CONDITION_FAILED", "error"),
    ]


def test_custom_predicate_boolean_expr():
    """Full boolean sub-language: or / not / exists / parentheses. Expr
    passes iff (Observation is not cancelled) OR it carries a media_ref.
    Null text is non-matching, so not(text == 'cancelled') PASSES d3."""
    docs = make_docs(
        [("d1", [s("Observation", "final", off=0)]),
         ("d2", [s("Observation", "cancelled", off=0)]),        # fails both arms
         ("d3", [s("Observation", None, off=0)]),               # null: not() passes
         ("d4", [s("Observation", "cancelled", "urn:uuid:x", off=0)]),  # exists arm
         ("d5", [s("Observation", "cancelled", "   ", off=0)])]  # ws ref = absent
    )
    p = profile_of(
        {"id": "R", "type": "CustomPredicate", "kind": "Observation", "fieldPath": "text",
         "params": {"expr": "not (text == 'cancelled') or exists(media_ref)"}}
    )
    assert rows(validate(docs, p)) == [
        ("d2", 0, "CUSTOMFHIRPATH_CONDITION_FAILED", "error"),
        ("d5", 0, "CUSTOMFHIRPATH_CONDITION_FAILED", "error"),
    ]


def test_expr_parser_precedence_and_errors():
    """and binds tighter than or; not is unary; parentheses regroup; quoted
    keywords never split; syntax errors raise at profile-compile time."""
    import pytest

    from fhir_data_validation_ray.profile import (
        ExprAnd, ExprExists, ExprLeaf, ExprNot, ExprOr, ProfileError, parse_expr,
    )

    e = parse_expr("text == 'a' or text == 'b' and kind == 'X'")
    assert isinstance(e, ExprOr) and isinstance(e.children[1], ExprAnd)
    e = parse_expr("(text == 'a' or text == 'b') and kind == 'X'")
    assert isinstance(e, ExprAnd) and isinstance(e.children[0], ExprOr)
    e = parse_expr("not exists(text)")
    assert isinstance(e, ExprNot) and isinstance(e.child, ExprExists)
    # quoted values containing keywords stay inside the condition
    e = parse_expr("text == 'war and peace'")
    assert isinstance(e, ExprLeaf) and e.cond.value == "war and peace"
    # 'in' lists with spaces survive tokenization
    e = parse_expr("text in ['a', 'b'] or kind == 'X'")
    assert isinstance(e, ExprOr)
    for bad in ("text == 'a' or", "(text == 'a'", "text == 'a') ", "or",
                "exists(offset)", "exists(nope)", ""):
        with pytest.raises(ProfileError):
            parse_expr(bad)
    # compile-time rejection through parse_profile (driver-side fail-fast)
    with pytest.raises(ProfileError, match="C9"):
        from fhir_data_validation_ray.profile import parse_profile
        parse_profile({"rules": [
            {"id": "C9", "type": "CustomPredicate", "kind": "*",
             "fieldPath": "text", "params": {"expr": "text == 'a' and ("}}
        ]})


def test_custom_predicate_python_lane():
    from fhir_data_validation_ray.functions.kernels import register_predicate
    import numpy as np

    register_predicate("text_is_short", lambda fs, idx: np.array(
        [t is not None and len(t) < 6 for t in np.asarray(fs.text)[idx]], dtype=bool))
    docs = make_docs([("d1", [s("text", "short", off=0)]),
                      ("d2", [s("text", "waaaay too long", off=0)])])
    p = profile_of(
        {"id": "R", "type": "CustomPredicate", "kind": "text", "fieldPath": "text",
         "params": {"predicate": "text_is_short"}}
    )
    assert rows(validate(docs, p)) == [("d2", 0, "CUSTOMFHIRPATH_CONDITION_FAILED", "error")]


def test_structural_checks():
    docs = make_docs(
        [
            ("bad id!", [s("Patient", "a", off=0)]),
            ("ok1", [s("Wizard", "a", off=0)]),
            ("ok2", [s("Patient", "a", off=5), s("Patient", "b", off=3)]),
        ]
    )
    p = profile_of(allowedKinds=["Patient"])
    p["settings"] = {"checkDocId": True, "checkSpanOrder": True}
    got = rows(validate(docs, p))
    assert ("bad id!", -1, "FHIR_INVALID_PRIMITIVE", "error") in got
    assert ("ok1", 0, "INVALID_ENUM_VALUE", "error") in got
    assert ("ok2", 1, "SPAN_SEQUENCE_INVALID", "error") in got


def test_severity_resolution_advisory_downgrade():
    """Advisory downgrades error->warning ONLY for heuristic/spec-hint rules
    (``SeverityResolver.cs:35-76``); a plain Advisory error stays an error."""
    docs = make_docs([("d1", [s("Patient", None, off=0)])])
    for flag, want in (
        ({"isHeuristic": True}, "warning"),
        ({"isSpecHint": True}, "warning"),
        ({}, "error"),  # unflagged Advisory: NOT downgraded
    ):
        p = profile_of(
            {"id": "R", "type": "Required", "kind": "Patient", "fieldPath": "text",
             "severity": "error", "validationClass": "Advisory", **flag}
        )
        # full mode: flagged advisory rules are mode-gated (standard skips them)
        assert rows(validate(docs, p, validation_mode="full")) == [
            ("d1", 0, "REQUIRED_FIELD_MISSING", want)
        ], flag
    # Contract/Structural never downgrade regardless of flags
    p = profile_of(
        {"id": "R", "type": "Required", "kind": "Patient", "fieldPath": "text",
         "severity": "error", "validationClass": "Contract", "isHeuristic": True}
    )
    assert rows(validate(docs, p)) == [("d1", 0, "REQUIRED_FIELD_MISSING", "error")]


def test_fail_open_filter_condition():
    # an unevaluable filter validates anyway (FhirPathRuleEngine.cs:2409-2415)
    from fhir_data_validation_ray.profile import Condition, InstanceScope, RuleDef
    from fhir_data_validation_ray.functions.kernels import selection_mask
    from fhir_data_validation_ray.functions.flatten import flatten_batch

    docs = make_docs([("d1", [s("Patient", None, off=0)])])
    fs = flatten_batch(docs)
    rule = RuleDef(id="R", type="Required", kind="Patient",
                   scope=InstanceScope("filter", (Condition("offset", "contains", "x"),)))
    assert selection_mask(rule, fs).tolist() == [True]


def test_rule_execution_error_isolation():
    # a kernel that raises produces RULE_EXECUTION_ERROR, not a crash
    from fhir_data_validation_ray.functions.kernels import register_predicate

    def boom(fs, idx):
        raise RuntimeError("kaboom")

    register_predicate("boom", boom)
    docs = make_docs([("d1", [s("text", "a", off=0)])])
    p = profile_of(
        {"id": "RB", "type": "CustomPredicate", "kind": "text", "fieldPath": "text",
         "params": {"predicate": "boom"}}
    )
    v = validate(docs, p)
    assert v["error_code"].to_pylist() == ["RULE_EXECUTION_ERROR"]


def test_dedup_structure_priority():
    # a Business rule emitting the same (error_code, json_pointer) as a
    # STRUCTURE row is suppressed (Core/ValidationPipeline.cs:783-827)
    docs = make_docs([("d1", [s("Wizard", "a", off=0)])])
    p = profile_of(
        {"id": "R", "type": "AllowedValues", "kind": "*", "fieldPath": "kind",
         "errorCode": "INVALID_ENUM_VALUE", "params": {"values": ["Patient"]}},
        allowedKinds=["Patient"],
    )
    p["settings"]["dedupStructure"] = True
    v = validate(docs, p)
    got = rows(v, "error_code", "source")
    assert got == [("INVALID_ENUM_VALUE", "STRUCTURE")]


def test_input_not_mutated():
    # zero-mutation guarantee (docs/01_architecture_spec.md:29): validation
    # leaves the input batch byte-identical (span-sequence invariant)
    docs = make_docs([("d1", [s("Patient", "x", "u", 0), s("text", "y", "", 1)])])
    clone = pa.Table.from_batches(docs.to_batches())
    p = profile_of({"id": "R", "type": "Required", "kind": "Patient", "fieldPath": "text"})
    validate(docs, p)
    assert docs.equals(clone)


def test_hash_str_width_independent():
    # regression: FNV must hash the string, not the U-array's padded width —
    # the registry probe and two-phase uniqueness compare hashes ACROSS
    # arrays whose max string length differs
    import numpy as np

    from fhir_data_validation_ray.functions.hashing import hash_str

    short = hash_str(np.array(["urn:uuid:abc", "x"]))
    wide = hash_str(np.array(["urn:uuid:abc", "a-much-longer-string-widening-the-dtype"]))
    assert short[0] == wide[0]
    obj = hash_str(np.array(["urn:uuid:abc"], dtype=object))
    assert obj[0] == short[0]
    # distinct strings still hash apart
    assert len({int(h) for h in wide}) == 2


def test_registry_probe_with_wide_local_refs():
    # regression for the width bug at replica scale: a registry hit must be
    # recognized even when the batch also contains local refs LONGER than any
    # registry key (which widens the probe array's U dtype)
    docs = make_docs(
        [
            ("d1", [s("image", "", "urn:uuid:feedfacecafebeef", 0)]),
            ("d2", [s("Patient", "x", "Patient/a-very-long-doc-id-string-here.9999", 0)]),
        ]
    )
    p = profile_of(
        {"id": "R", "type": "Reference", "kind": "*", "fieldPath": "media_ref",
         "params": {"policy": "RequireResolution"}}
    )
    import numpy as np

    v = validate(docs, p, registry=np.array(["urn:uuid:feedfacecafebeef"]))
    # d1's registry ref resolves; only d2's dangling local ref is flagged
    assert rows(v, "doc_id", "error_code") == [("d2", "REFERENCE_NOT_FOUND")]


def test_question_answer_typed_dispatch():
    # per-type Q/A checks (QuestionAnswerValidator.cs:54-1250 analogue)
    docs = make_docs([
        ("d1", [s("Question", "Q1=true", "", 0),      # ok
                s("Question", "Q1=maybe", "", 1),     # INVALID_ANSWER_VALUE
                s("Question", "Q2=150", "", 2),       # ANSWER_OUT_OF_RANGE
                s("Question", "Q2=abc", "", 3),       # INVALID_ANSWER_VALUE
                s("Question", "Q3=mild,severe", "", 4),  # multi on single -> INVALID
                s("Question", "Q3=unknownx", "", 5),  # ANSWER_NOT_IN_VALUESET
                s("Question", "Q5=a,z", "", 6),       # multi NOT_IN_VALUESET
                s("Question", "Q7=zz", "", 7),        # extensible -> WARNING
                s("Question", "Q9=x", "", 8),         # UNKNOWN_QUESTION
                s("Question", "noequals", "", 9)]),   # malformed -> INVALID
    ])
    p = profile_of(
        {"id": "QA", "type": "QuestionAnswer", "kind": "Question", "fieldPath": "text",
         "params": {"questions": [
             {"code": "Q1", "type": "boolean"},
             {"code": "Q2", "type": "integer", "min": 0, "max": 120},
             {"code": "Q3", "type": "code", "allowed": ["mild", "moderate", "severe"]},
             {"code": "Q5", "type": "code", "allowed": ["a", "b", "c"], "multiValue": True},
             {"code": "Q7", "type": "code", "allowed": ["x", "y"], "binding": "extensible"},
         ]}}
    )
    v = validate(docs, p)
    got = rows(v, "span_index", "error_code", "severity")
    assert got == [
        (1, "INVALID_ANSWER_VALUE", "error"),
        (2, "ANSWER_OUT_OF_RANGE", "error"),
        (3, "INVALID_ANSWER_VALUE", "error"),
        (4, "INVALID_ANSWER_VALUE", "error"),
        (5, "ANSWER_NOT_IN_VALUESET", "error"),
        (6, "ANSWER_NOT_IN_VALUESET", "error"),
        (7, "ANSWER_NOT_IN_VALUESET", "warning"),
        (8, "UNKNOWN_QUESTION", "error"),
        (9, "INVALID_ANSWER_VALUE", "error"),
    ]


def test_question_answer_decimal_and_pattern():
    docs = make_docs([
        ("d1", [s("Question", "Q6=40.5", "", 0),   # boundary ok
                s("Question", "Q6=99.9", "", 1),   # out of range
                s("Question", "Q6=4x", "", 2),     # lexical
                s("Question", "Q4=AB1234", "", 3),  # ok
                s("Question", "Q4=A1", "", 4)]),   # pattern miss
    ])
    p = profile_of(
        {"id": "QA", "type": "QuestionAnswer", "kind": "Question", "fieldPath": "text",
         "params": {"questions": [
             {"code": "Q6", "type": "decimal", "min": 0, "max": 40.5},
             {"code": "Q4", "type": "string", "pattern": "^[A-Z]{2}[0-9]{4}$"},
         ]}}
    )
    v = validate(docs, p)
    assert rows(v, "span_index", "error_code") == [
        (1, "ANSWER_OUT_OF_RANGE"), (2, "INVALID_ANSWER_VALUE"),
        (4, "INVALID_ANSWER_VALUE"),
    ]


def test_full_url_id_match():
    # local-shaped ref naming another document -> ENTRY_REFERENCE_MISMATCH
    # (spec docs/03_rule_dsl_spec.md:54-56)
    docs = make_docs([
        ("d1", [s("Patient", "a", off=0),
                s("Observation", "x", "Patient/d1.0", off=1),   # own doc: ok
                s("Observation", "x", "Patient/d2.0", off=2),   # other doc: flag
                s("image", "", "urn:uuid:beef", off=3)]),       # external: ok
    ])
    p = profile_of({"id": "U", "type": "FullUrlIdMatch", "kind": "*",
                    "fieldPath": "media_ref"})
    assert rows(validate(docs, p)) == [("d1", 2, "ENTRY_REFERENCE_MISMATCH", "error")]


def test_edge_cases_null_spans_unicode_huge_offsets():
    """Robustness: null spans list, empty doc_id, null struct fields, unicode
    text, near-int32-max offsets — no crashes, no numeric-cast warnings, and
    the defects that ARE present get flagged."""
    import warnings

    import numpy as np

    from fhir_data_validation_ray.functions.kernels import CompiledProfile
    from fhir_data_validation_ray.pipelines.profiles import default_profile
    from fhir_data_validation_ray.profile import parse_profile
    from fhir_data_validation_ray.sources.generator import DOCS_SCHEMA, SPAN_TYPE

    t = pa.table(
        {
            "doc_id": pa.array(["d1", "", "d3", "d4"], pa.string()),
            "spans": pa.array(
                [
                    None,
                    [{"kind": "Patient", "text": "héllo 👋 世界", "media_ref": "", "offset": 0}],
                    [{"kind": None, "text": None, "media_ref": None, "offset": None}],
                    [{"kind": "Patient", "text": "S1234567A",
                      "media_ref": "Patient/d4.2147483646", "offset": 2147483646}],
                ],
                pa.list_(SPAN_TYPE),
            ),
        },
        schema=DOCS_SCHEMA,
    )
    cp = CompiledProfile(
        profile=parse_profile(default_profile()),
        registry_keys=np.array(["urn:uuid:x"]), emit_details=True,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = cp.validate_batch(t)
    codes = set(zip(out["doc_id"].to_pylist(), out["error_code"].to_pylist()))
    assert ("", "FHIR_INVALID_PRIMITIVE") in codes      # empty doc_id grammar
    assert ("d3", "INVALID_ENUM_VALUE") in codes        # null kind
    assert ("", "PATTERN_MISMATCH") in codes            # unicode non-NRIC
    assert ("d1", "ARRAY_LENGTH_OUT_OF_RANGE") in codes  # null spans -> 0
    # d4's near-max-offset local self-ref resolves cleanly
    assert not any(c == "REFERENCE_NOT_FOUND" and d == "d4" for d, c in codes)


def test_code_master_screening_lookup():
    # CodeMasterEngine analogue: screening -> question -> allowedAnswers
    docs = make_docs([
        ("d1", [s("Screening", "SCR1|Q1=yes", "", 0),     # ok
                s("Screening", "SCR9|Q1=yes", "", 1),     # unknown screening
                s("Screening", "SCR1|Q8=yes", "", 2),     # unknown question
                s("Screening", "SCR1|Q1=maybe", "", 3),   # bad answer
                s("Screening", "SCR1|Q1=yes,no", "", 4),  # multi on single
                s("Screening", "SCR1|Q2=a,z", "", 5),     # bad multi element
                s("Screening", "SCR1|Q2=a,b", "", 6),     # ok multi
                s("Screening", "noseparator", "", 7)]),   # not screening-shaped: skip
    ])
    p = profile_of(
        {"id": "CM", "type": "CodeMaster", "kind": "Screening", "fieldPath": "text",
         "params": {"screenings": [
             {"code": "SCR1", "questions": [
                 {"code": "Q1", "allowedAnswers": ["yes", "no"]},
                 {"code": "Q2", "allowedAnswers": ["a", "b", "c"], "multiValue": True}]},
         ]}}
    )
    v = validate(docs, p)
    got = rows(v, "span_index", "error_code", "source")
    assert got == [
        (1, "CODEMASTER_SCREENING_UNKNOWN", "CodeMaster"),
        (2, "CODEMASTER_QUESTION_UNKNOWN", "CodeMaster"),
        (3, "ANSWER_NOT_IN_VALUESET", "CodeMaster"),
        (4, "INVALID_ANSWER_VALUE", "CodeMaster"),
        (5, "ANSWER_NOT_IN_VALUESET", "CodeMaster"),
    ]


def test_exclusivity_and_ref_grammar():
    docs = make_docs([
        ("d1", [s("Patient", "S1234567A", "Patient/d1.1", off=0),  # both set
                s("Patient", "x", "", off=1),                       # text only
                s("image", "", "urn:uuid:ok", off=2),
                s("image", "", "not a valid ref 7!", off=3)]),      # bad grammar
    ])
    p = profile_of(
        {"id": "X", "type": "Exclusivity", "kind": "Patient", "fieldPath": "text",
         "params": {"fields": ["text", "media_ref"]}}
    )
    p["settings"]["checkRefGrammar"] = True
    v = validate(docs, p)
    got = rows(v, "span_index", "error_code")
    assert (0, "FHIR_MULTIPLE_VALUE_X") in got
    assert (3, "FHIR_INVALID_REFERENCE_FORMAT") in got
    assert (1, "FHIR_MULTIPLE_VALUE_X") not in got
    assert (2, "FHIR_INVALID_REFERENCE_FORMAT") not in got


def test_reference_join_under_heavy_skew(ray_session):
    """Partitioned registry anti-join stays correct when 90% of probe refs
    hit ONE hot key (salting spreads the hot probe rows; replicated registry
    rows answer every sub-bucket)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.sources.generator import DOCS_SCHEMA, SPAN_TYPE
    from fhir_data_validation_ray.stages.reference import reference_integrity_join

    hot, cold, dangling = "urn:uuid:hot", "urn:uuid:cold", "urn:uuid:nope"
    rows_in = []
    for i in range(2000):
        ref = hot if i % 10 else (cold if i % 20 else dangling)
        rows_in.append(
            (f"doc{i}", [{"kind": "image", "text": "", "media_ref": ref, "offset": 0}])
        )
    docs = pa.table(
        {"doc_id": pa.array([r[0] for r in rows_in], pa.string()),
         "spans": pa.array([r[1] for r in rows_in], pa.list_(SPAN_TYPE))},
        schema=DOCS_SCHEMA,
    )
    registry = rd.from_arrow(
        pa.table({"media_ref": pa.array([hot, cold], pa.string())})
    )
    out = reference_integrity_join(
        rd.from_arrow(docs), registry, num_buckets=8, salt=4
    ).to_pandas()
    # dangling iff i % 20 == 0 (i % 10 == 0 picks the else arm, i % 20 == 0
    # picks dangling within it): {0, 20, 40, ...} = 100 docs
    assert len(out) == 100
    assert set(out.doc_id) == {f"doc{i}" for i in range(0, 2000, 20)}


def test_unknown_code_system_degrades_to_config_error():
    """A profile referencing an unloaded code system must still RUN: the bad
    rule emits one RULE_CONFIGURATION_ERROR per selected span and every other
    rule executes normally (``FhirPathRuleEngine.cs:1515-1583`` runtime
    degradation — NOT a compile failure)."""
    docs = make_docs(
        [
            ("d1", [s("Coding", "EN", off=0), s("Patient", None, off=1)]),
            ("d2", [s("Coding", None, off=0)]),  # empty passes -> no config row
        ]
    )
    p = profile_of(
        {"id": "CS", "type": "CodeSystem", "kind": "Coding", "fieldPath": "text",
         "params": {"system": "https://example.org/cs/NOT-LOADED"}},
        {"id": "RQ", "type": "Required", "kind": "Patient", "fieldPath": "text"},
    )
    v = validate(docs, p)
    assert rows(v) == [
        ("d1", 0, "RULE_CONFIGURATION_ERROR", "error"),
        ("d1", 1, "REQUIRED_FIELD_MISSING", "error"),
    ]


def test_extension_grammar_kernel():
    """Dedicated extension kernel (url<->media_ref, value<->text;
    ``JsonNodeStructuralValidator.cs:1087-1185``): missing url and empty
    shape fire independently and can stack on one span; whitespace-only
    counts as missing (urlValid uses IsNullOrWhiteSpace)."""
    docs = make_docs([
        ("d1", [s("Extension", "v", "urn:uuid:00ff", off=0),   # ok
                s("Extension", "v", "", off=1),                # url missing
                s("Extension", "", "urn:uuid:00ff", off=2),    # shape empty
                s("Extension", None, "   ", off=3),            # both
                s("Other", None, "", off=4)]),                 # not selected
    ])
    p = profile_of(
        {"id": "E1", "type": "Extension", "kind": "Extension",
         "fieldPath": "media_ref"})
    assert rows(validate(docs, p)) == [
        ("d1", 1, "FHIR_EXTENSION_MISSING_URL", "error"),
        ("d1", 2, "FHIR_EXTENSION_INVALID_SHAPE", "error"),
        ("d1", 3, "FHIR_EXTENSION_INVALID_SHAPE", "error"),
        ("d1", 3, "FHIR_EXTENSION_MISSING_URL", "error"),
    ]


def test_extension_both_shape_unreachable():
    """The reference's shapeReason='both' (value[x] AND nested extension[])
    cannot exist in the flat span model — one value slot, no nested list.
    Pin the divergence: a span with BOTH payload fields populated is the
    VALID single-value shape here, never an error."""
    docs = make_docs([
        ("d1", [s("Extension", "value", "urn:uuid:00ff", off=0)]),
    ])
    p = profile_of(
        {"id": "E1", "type": "Extension", "kind": "Extension",
         "fieldPath": "media_ref"})
    assert rows(validate(docs, p)) == []


def _fake_terminology(url):
    """Top-level fake resolver (must be picklable for the Ray lanes)."""
    if url == "https://example.org/cs/REMOTE":
        return ["EN", "MS"]
    if url == "https://example.org/cs/BROKEN":
        raise RuntimeError("terminology service down")
    return None


def test_terminology_resolver_fallback():
    """The authoring-mode terminology fallback
    (``FhirPathRuleEngine.cs:1527-1561``): an unknown params.system is
    resolved through the pluggable callable at compile time; resolver
    errors/misses degrade to RULE_CONFIGURATION_ERROR (the stateless-DLL
    behavior); pre-loaded systems always win over the resolver."""
    import numpy as np

    from fhir_data_validation_ray.functions.kernels import CompiledProfile
    from fhir_data_validation_ray.profile import parse_profile

    docs = make_docs([
        ("d1", [s("Coding", "EN", off=0)]),
        ("d2", [s("Coding", "XX", off=0)]),
    ])

    def prof(system):
        return parse_profile(profile_of(
            {"id": "CS", "type": "CodeSystem", "kind": "Coding",
             "fieldPath": "text", "params": {"system": system}}))

    # resolved: codes validate against the fetched concept set
    cp = CompiledProfile(prof("https://example.org/cs/REMOTE"),
                         terminology_resolver=_fake_terminology)
    assert rows(cp.validate_batch(docs)) == [
        ("d2", 0, "CODE_NOT_IN_VALUESET", "error")]

    # resolver miss and resolver crash both degrade, never raise
    for system in ("https://example.org/cs/UNKNOWN",
                   "https://example.org/cs/BROKEN"):
        cp = CompiledProfile(prof(system),
                             terminology_resolver=_fake_terminology)
        assert {r[2] for r in rows(cp.validate_batch(docs))} == {
            "RULE_CONFIGURATION_ERROR"}

    # pre-loaded systems take precedence: resolver must not be consulted
    calls = []

    def tracking(url):
        calls.append(url)
        return ["ZZ"]

    loaded = parse_profile(profile_of(
        {"id": "CS", "type": "CodeSystem", "kind": "Coding",
         "fieldPath": "text", "params": {"system": "https://cs/lang"}},
        codeSystems=[{"url": "https://cs/lang",
                      "concept": [{"code": "EN"}, {"code": "XX"}]}]))
    cp = CompiledProfile(loaded, terminology_resolver=tracking)
    assert calls == []
    assert rows(cp.validate_batch(docs)) == []
    assert np.array_equal(np.sort(cp.concept_sets["https://cs/lang"]),
                          np.array(["EN", "XX"]))


def test_terminology_resolver_through_dataset_lanes(ray_session):
    """The resolver threads through validate_dataset in BOTH execution
    lanes (stateless tasks + actor pool) — compile-once per worker."""
    import ray.data as rd

    from fhir_data_validation_ray.stages.validator import validate_dataset

    docs = rd.from_arrow(make_docs([
        ("d1", [s("Coding", "EN", off=0)]),
        ("d2", [s("Coding", "XX", off=0)]),
    ]))
    p = profile_of(
        {"id": "CS", "type": "CodeSystem", "kind": "Coding",
         "fieldPath": "text",
         "params": {"system": "https://example.org/cs/REMOTE"}})
    import pyarrow as pa

    from fhir_data_validation_ray.stages.validator import (
        StaticTerminologyResolver,
    )

    # a test-module function can't unpickle on Ray workers; the library's
    # static resolver ships by value
    resolver = StaticTerminologyResolver(
        {"https://example.org/cs/REMOTE": ["EN", "MS"]})
    for mode, kw in (("tasks", {}), ("actors", {"concurrency": 1})):
        out = validate_dataset(
            docs, p, mode=mode,
            terminology_resolver=resolver, **kw).take_all()
        got = rows(pa.Table.from_pylist(out))
        assert got == [("d2", 0, "CODE_NOT_IN_VALUESET", "error")], mode


def test_required_spans_consolidated_shape():
    """params.consolidate=True reproduces the reference's consolidated error
    (``FhirPathRuleEngine.cs:1994-2096``): ONE row per violating document,
    details = expected / actual (with <=3 example pointers) / diff."""
    import json

    docs = make_docs(
        [
            # 4 Patients (max 2 exceeded -> examples capped at 3), 1 undeclared
            ("d1", [s("Patient", "a", off=0), s("Patient", "b", off=1),
                    s("Patient", "c", off=2), s("Patient", "d", off=3),
                    s("Unknown", "x", off=4)]),
            ("d2", [s("Patient", "a", off=0)]),            # compliant
            ("d3", [s("Observation", "final", off=0)]),    # missing Patient
        ]
    )
    p = profile_of(
        {"id": "RS", "type": "RequiredSpans", "kind": "*",
         "params": {"requirements": [{"kind": "Patient", "min": 1, "max": 2}],
                    "rejectUndeclared": True, "consolidate": True}}
    )
    v = validate(docs, p)
    assert rows(v) == [
        ("d1", -1, "RESOURCE_REQUIREMENT_VIOLATION", "error"),
        ("d3", -1, "RESOURCE_REQUIREMENT_VIOLATION", "error"),
    ]
    by_doc = dict(zip(v["doc_id"].to_pylist(), v["details"].to_pylist()))
    d1 = json.loads(by_doc["d1"])
    assert d1["expected"] == [{"kind": "Patient", "max": 2, "min": 1}]
    assert d1["actual"][0]["count"] == 4
    assert d1["actual"][0]["examples"] == ["/spans/0", "/spans/1", "/spans/2"]  # Take(3)
    assert d1["diff"]["missing"][0]["actualCount"] == 4
    assert d1["diff"]["unexpected"] == [{"count": 1}]
    d3 = json.loads(by_doc["d3"])
    assert d3["actual"][0] == {"count": 0, "examples": [], "kind": "Patient"}
    assert d3["diff"]["missing"] == [
        {"actualCount": 0, "expectedMax": 2, "expectedMin": 1, "kind": "Patient"}
    ]


def test_rule_evaluation_planner_lanes():
    """Compile-time dual-lane planning (``RuleEvaluationPlanner.cs:19-146``
    analogue): RE2-compatible regexes and expr predicates take the vector
    lane; lookbehinds and registered Python predicates fall back, with
    reasons recorded."""
    from fhir_data_validation_ray.functions.kernels import build_plan, register_predicate
    from fhir_data_validation_ray.profile import parse_profile

    register_predicate("always_true", lambda fs, idx: [True] * len(idx))
    p = parse_profile(profile_of(
        {"id": "RV", "type": "Regex", "kind": "text", "fieldPath": "text",
         "params": {"pattern": "^[a-z]+$"}},
        {"id": "RP", "type": "Regex", "kind": "text", "fieldPath": "text",
         "params": {"pattern": "(?<=abc)X"}},  # lookbehind: not RE2
        {"id": "CE", "type": "CustomPredicate", "kind": "text", "fieldPath": "text",
         "params": {"expr": "text != 'x'"}},
        {"id": "CP", "type": "CustomPredicate", "kind": "text", "fieldPath": "text",
         "params": {"predicate": "always_true"}},
    ))
    plans = build_plan(p)
    assert plans["RV"].vector_lane and not plans["RV"].fallback_reasons
    assert not plans["RP"].vector_lane and "RE2" in plans["RP"].fallback_reasons[0]
    assert plans["CE"].vector_lane
    assert not plans["CP"].vector_lane and "predicate" in plans["CP"].fallback_reasons[0]


def test_question_answer_quantity():
    """Quantity dispatch (QuestionAnswerValidator.cs:585-736): value+unit
    shape, unit equality (missing unit displays as 'none'), and range —
    unit and range checks BOTH fire on a lexically valid answer."""
    docs = make_docs([
        ("d1", [s("Question", "Q8=5.5 mg", off=0)]),    # ok
        ("d2", [s("Question", "Q8=5 kg", off=0)]),      # unit mismatch
        ("d3", [s("Question", "Q8=15 mg", off=0)]),     # out of range
        ("d4", [s("Question", "Q8=abc mg", off=0)]),    # not a number
        ("d5", [s("Question", "Q8=5", off=0)]),         # missing unit -> 'none'
        ("d6", [s("Question", "Q8=15 kg", off=0)]),     # unit AND range
        ("d7", [s("Question", "Q8=1 2 3", off=0)]),     # too many parts
    ])
    p = profile_of(
        {"id": "QA", "type": "QuestionAnswer", "kind": "Question",
         "fieldPath": "text",
         "params": {"questions": [
             {"code": "Q8", "type": "quantity", "unit": "mg",
              "min": 0, "max": 10}]}},
    )
    assert rows(validate(docs, p)) == [
        ("d2", 0, "INVALID_ANSWER_VALUE", "error"),
        ("d3", 0, "ANSWER_OUT_OF_RANGE", "error"),
        ("d4", 0, "INVALID_ANSWER_VALUE", "error"),
        ("d5", 0, "INVALID_ANSWER_VALUE", "error"),
        ("d6", 0, "ANSWER_OUT_OF_RANGE", "error"),
        ("d6", 0, "INVALID_ANSWER_VALUE", "error"),
        ("d7", 0, "INVALID_ANSWER_VALUE", "error"),
    ]
