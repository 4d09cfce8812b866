"""Schema-driven SPEC_HINT generation, classification, conditional
RequiredSpans semantics, and explanation templates — the authoring-layer
surfaces (``Authoring/Hl7SpecHintGenerator.cs``, ``BaseRuleClassifier.cs``,
``SpecHintService.cs``, ``ValidationExplanationService.cs``)."""

from __future__ import annotations

from helpers import make_docs, profile_of, rows, validate

from fhir_data_validation_ray.explain import (
    ADVISORY_WHAT,
    STRUCTURAL_WHAT,
    rule_template,
)
from fhir_data_validation_ray.spechint import (
    DEFAULT_SPAN_SCHEMA,
    SpecHint,
    classify_hint,
    generate_spec_hints,
    parse_exists_condition,
    spec_hint_rules,
)


def s(kind, text=None, ref="", off=0):
    return (kind, text, ref, off)


# ------------------------------------------------------------- generator
def test_generator_extraction_lanes():
    hints = generate_spec_hints(DEFAULT_SPAN_SCHEMA)
    # non-resource and infrastructural definitions are skipped
    assert set(hints) == {"Document"}
    by_path = {h.path: h for h in hints["Document"]}
    # .id / .extension / root / optional elements produce no hints
    assert set(by_path) == {"Patient", "text", "Observation.Coding",
                            "Encounter.date", "dateTime"}
    # simple required
    assert not by_path["Patient"].is_conditional
    assert "min cardinality = 1" in by_path["Patient"].reason
    # implicit conditional under an unbounded parent -> appliesToEach
    coding = by_path["Observation.Coding"]
    assert coding.is_conditional and coding.applies_to_each
    assert coding.condition == "Observation.exists()"
    # implicit conditional under a scalar optional parent
    date = by_path["Encounter.date"]
    assert date.is_conditional and not date.applies_to_each
    assert date.condition == "Encounter.exists()"
    # explicit constraint-keyed conditional
    dt = by_path["dateTime"]
    assert dt.is_conditional and dt.condition == "Screening.exists()"
    assert not dt.applies_to_each


def test_generator_graceful_failure_and_skips():
    # malformed definition (elements not iterable) is skipped, rest kept
    schema = {
        "fhirVersion": "R4",
        "definitions": [
            {"name": "Bad", "kind": "resource", "type": "Bad", "elements": 17},
            {"name": "Ok", "kind": "resource", "type": "Ok",
             "elements": [{"path": "Ok.text", "min": 1}]},
            {"name": "NoType", "kind": "resource", "type": "  "},
            {"name": "Bundle", "kind": "resource", "type": "Bundle",
             "elements": [{"path": "Bundle.type", "min": 1}]},
        ],
    }
    hints = generate_spec_hints(schema)
    assert set(hints) == {"Ok"}
    # a pathless required element can't anchor a hint
    schema_nopath = {
        "definitions": [{
            "name": "Y", "kind": "resource", "type": "Y",
            "elements": [{"min": 1}, {"path": "", "min": 1},
                         {"path": "Y.ok", "min": 1}],
        }],
    }
    assert [h.path for h in generate_spec_hints(schema_nopath)["Y"]] == ["ok"]
    # constraint key without an expression is skipped conservatively
    schema2 = {
        "definitions": [{
            "name": "X", "kind": "resource", "type": "X",
            "elements": [{"path": "X.a", "min": 1, "condition": ["x-1"]}],
            "constraints": {"x-1": {"human": "no expression"}},
        }],
    }
    assert generate_spec_hints(schema2) == {}


def test_classifier_decision_tree():
    cond = SpecHint(path="a.b", reason="r", is_conditional=True,
                    condition="a.exists()")
    root = SpecHint(path="status", reason="r")
    nested = SpecHint(path="a.b", reason="r")
    assert classify_hint(cond).category == "Conditional"
    assert classify_hint(cond).source == "SPEC_HINT"
    assert classify_hint(root).source == "STRUCTURE"
    assert classify_hint(root).category == "UnconditionalRequired"
    assert classify_hint(nested).source == "SPEC_HINT"
    assert classify_hint(nested).category == "NestedOptional"


def test_parse_exists_condition_both_spellings():
    assert parse_exists_condition("Observation.exists()") == "Observation"
    assert parse_exists_condition("exists(Screening)") == "Screening"
    assert parse_exists_condition("a = 'b'") is None
    assert parse_exists_condition(None) is None


# --------------------------------------------- conditional RequiredSpans
def _hint_profile():
    return profile_of(*spec_hint_rules(generate_spec_hints(DEFAULT_SPAN_SCHEMA)))


def test_spec_hint_rules_full_mode_semantics():
    docs = make_docs([
        # d1: has Patient+text, one Observation WITHOUT a Coding
        ("d1", [s("Patient", "p", off=0), s("text", "t", off=1),
                s("Observation", "o", off=2)]),
        # d2: two Observations, one Coding -> perParent violation; no Patient
        ("d2", [s("text", "t", off=0), s("Observation", "o1", off=1),
                s("Observation", "o2", off=2), s("Coding", "c", off=3)]),
        # d3: Encounter without date; Screening without dateTime
        ("d3", [s("Patient", "p", off=0), s("text", "t", off=1),
                s("Encounter", "e", off=2), s("Screening", "s", off=3)]),
        # d4: fully conformant (Encounter with date, Screening with dateTime)
        ("d4", [s("Patient", "p", off=0), s("text", "t", off=1),
                s("Encounter", "e", off=2), s("date", "2021-01-01", off=3),
                s("Screening", "s", off=4), s("dateTime", "x", off=5)]),
    ])
    got = validate(docs, _hint_profile(), validation_mode="full")
    assert rows(got) == sorted([
        ("d1", -1, "SPEC_REQUIRED_CONDITIONAL", "warning"),   # Coding < Obs
        ("d2", -1, "MISSING_REQUIRED_FIELD", "warning"),      # no Patient
        ("d2", -1, "SPEC_REQUIRED_CONDITIONAL", "warning"),   # 1 Coding < 2 Obs
        ("d3", -1, "SPEC_REQUIRED_CONDITIONAL", "warning"),   # Encounter w/o date
        ("d3", -1, "SPEC_REQUIRED_CONDITIONAL", "warning"),   # Screening w/o dateTime
    ])
    # source column is SPEC_HINT for every emission
    assert set(got["source"].to_pylist()) == {"SPEC_HINT"}
    # standard mode: the whole layer is gated off (blocking unchanged)
    assert rows(validate(docs, _hint_profile())) == []


def test_per_parent_satisfied_when_counts_match():
    docs = make_docs([
        ("d1", [s("Patient", "p", off=0), s("text", "t", off=1),
                s("Observation", "o1", off=2), s("Coding", "c1", off=3),
                s("Observation", "o2", off=4), s("Coding", "c2", off=5)]),
    ])
    assert rows(validate(docs, _hint_profile(), validation_mode="full")) == []


# ------------------------------------------------------------ explanations
def test_rule_templates_match_reference_wording():
    t = rule_template({"id": "X", "type": "Required"})
    assert t.what("Patient.text") == ("This rule requires the field "
                                      "`Patient.text` to be present.")
    assert "is missing or empty in this resource" in t.how("Patient.text")
    assert t.confidence == "high"
    t = rule_template({"id": "X", "type": "Regex",
                       "params": {"pattern": "^a$"}})
    assert t.how("p").endswith("Expected pattern: ^a$")
    assert t.confidence == "medium"
    t = rule_template({"id": "X", "type": "AllowedValues",
                       "params": {"values": ["a", "b"]}})
    assert t.how("p") == ("Choose one of the permitted values:\n"
                          "  - a\n  - b")
    t = rule_template({"id": "X", "type": "ArrayLength",
                       "params": {"min": 1, "max": 3}})
    assert t.how("p").startswith("Allowed range: 1 to 3")
    t = rule_template({"id": "X", "type": "CustomPredicate", "params": {}})
    assert t.confidence == "low"
    # unknown type -> fallback, no How (medium confidence)
    t = rule_template({"id": "X", "type": "QuestionAnswer"})
    assert t.how("p") is None and t.confidence == "medium"
    # authored explanation override wins, high confidence
    t = rule_template({"id": "X", "type": "Regex",
                       "explanation": {"what": "W", "how": "H"}})
    assert t.what("ignored") == "W" and t.how("p") == "H"
    assert t.confidence == "high"
    # rule-type normalization accepts UI spellings
    assert rule_template({"id": "X", "type": "ARRAY_LENGTH"}).confidence == "high"


def test_explain_violations_source_lanes(ray_session):
    import ray.data

    from fhir_data_validation_ray.explain import explain_violations

    hint_rules = spec_hint_rules(generate_spec_hints({"definitions": [
        {"name": "D", "kind": "resource", "type": "D",
         "elements": [{"path": "D.Coding", "min": 1}]}]}))
    p = profile_of(
        {"id": "R1", "type": "Required", "kind": "Patient", "fieldPath": "text"},
        *hint_rules,
    )
    p["settings"]["checkEmptyDoc"] = True
    docs = make_docs([
        ("d1", [s("Patient", None, off=0), s("text", "abc", off=1)]),
        ("d2", []),  # EMPTY_BUNDLE -> STRUCTURE lane
    ])
    t = validate(docs, p, validation_mode="full")
    out = explain_violations(ray.data.from_arrow(t), p).take_all()
    by_code = {r["error_code"]: r for r in out}
    assert by_code["REQUIRED_FIELD_MISSING"]["explain_what"] == (
        "This rule requires the field `Patient.text` to be present.")
    assert by_code["REQUIRED_FIELD_MISSING"]["explain_confidence"] == "high"
    assert by_code["EMPTY_BUNDLE"]["explain_what"] == STRUCTURAL_WHAT
    assert by_code["EMPTY_BUNDLE"]["explain_confidence"] == "high"
    # advisory spec-hint lane -> advisory template, low confidence
    assert by_code["MISSING_REQUIRED_FIELD"]["explain_what"] == ADVISORY_WHAT
    assert by_code["MISSING_REQUIRED_FIELD"]["explain_confidence"] == "low"


# --------------------------------------------------- message token resolver
def test_resolve_message_tokens_reference_semantics():
    from fhir_data_validation_ray.explain import resolve_message_tokens

    rule = {"id": "X", "type": "Regex", "kind": "Patient",
            "fieldPath": "text", "severity": "error",
            "params": {"pattern": "^a$", "values": ["x", "y"],
                       "system": "https://example.org/cs/language",
                       "min": 1, "max": 3}}
    out = resolve_message_tokens(
        "{resource}/{path} [{fullPath}] {ruleType}/{severity}: "
        "pattern {pattern}, allowed {allowed} (n={count}), "
        "range {min}-{max}, system {system}", rule)
    assert out == ("Patient/text [Patient.text] Regex/error: "
                   "pattern ^a$, allowed \"x\", \"y\" (n=2), "
                   "range 1-3, system language")
    # unresolved tokens are stripped (MessageTokenResolver.cs:138-139)
    assert resolve_message_tokens("a {nope} b", rule) == "a  b"
    # double-braced tokens degrade to {value} and the cleanup strips them —
    # the reference's exact ReplaceToken ordering quirk, pinned here
    assert resolve_message_tokens("{{path}} kept-tail", rule) == " kept-tail"
    # runtime context
    assert resolve_message_tokens("got {actual}", rule,
                                  {"actual": "zz"}) == "got zz"
    # empty/None templates pass through
    assert resolve_message_tokens(None, rule) is None
    assert resolve_message_tokens("", rule) == ""
    # empty fieldPath -> fullPath is just the kind
    r2 = {"id": "Y", "type": "RequiredSpans", "kind": "*", "params": {}}
    assert resolve_message_tokens("{fullPath}", r2) == "*"


def test_response_renders_authored_messages(ray_session):
    from fhir_data_validation_ray.pipelines.profiles import single_rule_profile
    from fhir_data_validation_ray.pipelines.validate import validation_response

    p = single_rule_profile("R1")
    p["rules"][0]["message"] = "Field {fullPath} is required ({ruleType})"
    resp = validation_response("/root/testdata/sf0.001", p, max_errors=5)
    msgs = [e.get("message") for e in resp["errors"]
            if e["rule_id"] == "R1"]
    assert msgs and all(
        m == "Field Patient.text is required (Required)" for m in msgs)


def test_conditional_required_spans_details_carry_per_parent_need():
    import json

    import numpy as np

    from fhir_data_validation_ray.functions.kernels import CompiledProfile
    from fhir_data_validation_ray.profile import parse_profile

    p = profile_of({
        "id": "SH1", "type": "RequiredSpans", "kind": "*",
        "severity": "warning", "validationClass": "Advisory",
        "isSpecHint": True, "errorCode": "SPEC_REQUIRED_CONDITIONAL",
        "params": {"requirements": [
            {"kind": "Coding", "min": 1, "whenKind": "Observation",
             "perParent": True}]},
    })
    docs = make_docs([
        ("d1", [s("Observation", "o1", off=0), s("Observation", "o2", off=1),
                s("Observation", "o3", off=2), s("Coding", "c", off=3)]),
    ])
    cp = CompiledProfile(parse_profile(p), validation_mode="full",
                         emit_details=True)
    out = cp.validate_batch(docs)
    assert out.num_rows == 1
    d = json.loads(out["details"][0].as_py())
    # per-parent need: 3 Observations -> expected_min 3, actual 1
    assert d["expected_min"] == 3 and d["actual"] == 1


# --------------------------------------------------- smart-path navigation
def test_navigation_scalar_semantics():
    """Pinned ``smartPathFormatting.ts`` behaviors: where() clauses are
    filters (stripped), [n] indices stay on their segment, [*] wildcards
    render as the bare name, duplicated resource prefixes collapse,
    empty/Unknown paths short-circuit."""
    from fhir_data_validation_ray.explain import (
        format_breadcrumb,
        pointer_fhirpath_style,
        pointer_full_path,
        pointer_jsonpath,
        scoped_path,
    )

    assert format_breadcrumb(
        "Observation.where(code.coding.code='HS').performer.display"
    ) == "Observation ▸ performer ▸ display"
    # multiple where() at any position; [*] dropped, [n] kept
    assert format_breadcrumb(
        "Observation.where(code='HS').component.where(system='loinc').valueString"
    ) == "Observation ▸ component ▸ valueString"
    assert format_breadcrumb("Patient.address[0].line[*]") == \
        "Patient ▸ address[0] ▸ line"
    # duplicated resource-type prefix collapses ("backend constructs paths
    # incorrectly" guard)
    assert format_breadcrumb("Patient.Patient.gender") == "Patient ▸ gender"
    assert format_breadcrumb("Patient.Patient[0].gender") == \
        "Patient[0] ▸ gender"
    assert format_breadcrumb("") == "Unknown"
    assert format_breadcrumb("Unknown") == "Unknown"
    assert scoped_path("Patient.name.given") == "name.given"
    assert scoped_path("Patient") == "Patient"  # no dot -> unchanged
    assert scoped_path("Patient.where(active=true).name") == "name"
    assert scoped_path("") == "Unknown"
    assert pointer_full_path(
        "/entry/0/resource/extension/2/valueCodeableConcept"
    ) == "entry[0].resource.extension[2].valueCodeableConcept"
    assert pointer_full_path("/spans/3") == "spans[3]"
    assert pointer_full_path("") == ""
    assert pointer_jsonpath("/spans/3/text") == "$.spans[3].text"
    assert pointer_jsonpath("") == "$"
    assert pointer_fhirpath_style("/entry/0/resource/gender") == \
        "entry.resource.gender"
    assert pointer_fhirpath_style("/") == ""
    assert pointer_fhirpath_style("") == ""


def test_navigate_violations_vectorized_matches_scalar(ray_session):
    import pyarrow as pa
    import ray.data

    from fhir_data_validation_ray.explain import (
        format_breadcrumb,
        navigate_violations,
        pointer_fhirpath_style,
        pointer_full_path,
        pointer_jsonpath,
        scoped_path,
    )

    paths = ["Patient.text", "Coding.text", "spans", "",
             "Patient.Patient.gender", "Observation.where(x='1').a[0].b[*]",
             "Unknown", "image.media_ref"]
    ptrs = ["/spans/0/text", "/spans/12/text", "", "",
            "/spans/3/media_ref", "/doc_id", "/spans/7/text", ""]
    t = pa.table({
        "doc_id": [f"d{i}" for i in range(len(paths))],
        "span_index": pa.array([0, 12, -1, -1, 3, -1, 7, -1], pa.int32()),
        "error_code": ["E"] * len(paths),
        "severity": ["error"] * len(paths),
        "path": paths,
        "json_pointer": ptrs,
    })
    out = navigate_violations(ray.data.from_arrow(t)).take_all()
    out = {r["doc_id"]: r for r in out}
    for i, (p, q) in enumerate(zip(paths, ptrs)):
        r = out[f"d{i}"]
        assert r["nav_breadcrumb"] == format_breadcrumb(p), (p, r)
        assert r["nav_scoped_path"] == scoped_path(p), (p, r)
        assert r["nav_full_json_path"] == pointer_full_path(q), (q, r)
        assert r["nav_json_path"] == pointer_jsonpath(q), (q, r)
        assert r["nav_pointer_path"] == pointer_fhirpath_style(q), (q, r)
