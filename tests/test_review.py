"""Governance rule-review engine — metadata-only authoring quality gate
(``Governance/RuleReviewEngine.cs:35-960``)."""

from __future__ import annotations

import pytest

from fhir_data_validation_ray.governance import (
    BLOCKED,
    OK,
    WARNING,
    review_rule,
    review_rule_set,
    review_summary,
)


def _codes(result):
    return sorted(i.code for i in result.issues)


def test_empty_field_path_blocked_with_bundle_level_exemptions():
    r = review_rule({"id": "A", "type": "Required", "fieldPath": ""})
    assert r.status == BLOCKED and _codes(r) == ["EMPTY_FIELD_PATH"]
    # bundle/resource-level types are exempt (RuleReviewEngine.cs:166-175)
    ok = review_rule({"id": "B", "type": "CustomPredicate",
                      "params": {"expr": "exists(text)"}})
    assert ok.status == OK
    assert review_rule({"id": "C", "type": "RequiredSpans",
                        "params": {"requirements": [{"kind": "Patient",
                                                     "min": 1}]}}).status == OK


def test_question_answer_checks():
    r = review_rule({"id": "Q", "type": "QuestionAnswer",
                     "fieldPath": "text", "params": {}})
    assert r.status == BLOCKED
    assert "QUESTION_ANSWER_WITHOUT_QUESTION_SET_ID" in _codes(r)
    # provided errorCode is a WARNING on an otherwise-valid rule (:221-245)
    r = review_rule({"id": "Q", "type": "QuestionAnswer", "fieldPath": "text",
                     "errorCode": "X",
                     "params": {"questions": [{"code": "Q1",
                                               "type": "boolean"}]}})
    assert r.status == WARNING
    assert _codes(r) == ["QUESTIONANSWER_ERROR_CODE_IGNORED"]


def test_code_system_checks():
    assert _codes(review_rule({"id": "C", "type": "CodeSystem",
                               "fieldPath": "text"})) == [
        "CODESYSTEM_MISSING_PARAMS"]
    assert _codes(review_rule({"id": "C", "type": "CodeSystem",
                               "fieldPath": "text",
                               "params": {"system": " "}})) == [
        "CODESYSTEM_MISSING_SYSTEM"]
    r = review_rule({"id": "C", "type": "CodeSystem", "fieldPath": "text",
                     "params": {"system": "https://x", "codes": ["a"]}})
    assert r.status == WARNING
    assert _codes(r) == ["CODESYSTEM_MANUAL_CODES_PROVIDED"]


def test_required_spans_configuration_contract():
    def rs(reqs):
        return review_rule({"id": "R", "type": "RequiredSpans",
                            "params": {"requirements": reqs}})

    assert rs([]).status == BLOCKED
    assert rs([{"min": 1}]).status == BLOCKED              # missing kind
    assert rs([{"kind": "P"}]).status == BLOCKED           # missing min
    assert rs([{"kind": "P", "min": 0}]).status == BLOCKED  # min < 1
    assert rs([{"kind": "P", "min": 2, "max": 1}]).status == BLOCKED
    assert rs([{"kind": "P", "min": 1}, {"kind": "P", "min": 2}]
              ).status == BLOCKED                          # duplicate kind
    # range mode: WARNING divergence (engine supports ranges; the reference
    # authoring contract is min-only / exact)
    r = rs([{"kind": "P", "min": 1, "max": 20}])
    assert r.status == WARNING
    # min-only and exact are OK
    assert rs([{"kind": "P", "min": 1}]).status == OK
    assert rs([{"kind": "P", "min": 2, "max": 2}]).status == OK


def test_system_level_rule_types_flagged_not_blocked():
    r = review_rule({"id": "R8", "type": "Reference",
                     "fieldPath": "media_ref", "params": {"policy": "x"}})
    assert r.status == WARNING
    assert _codes(r) == ["REFERENCE_RULE_NOT_SUPPORTED"]
    r = review_rule({"id": "U", "type": "FullUrlIdMatch",
                     "fieldPath": "media_ref"})
    assert r.status == WARNING
    assert _codes(r) == ["FULLURLIDMATCH_RULE_NOT_SUPPORTED"]


def test_rule_set_duplicates_and_conflicts():
    rules = [
        {"id": "A", "type": "Required", "kind": "Patient", "fieldPath": "text"},
        {"id": "B", "type": "Required", "kind": "Patient", "fieldPath": "text"},
        {"id": "C", "type": "Regex", "kind": "Patient", "fieldPath": "text",
         "errorCode": "X", "params": {"pattern": "a"}},
        {"id": "D", "type": "FixedValue", "kind": "Patient",
         "fieldPath": "text", "errorCode": "Y", "params": {"value": "v"}},
    ]
    results = {r.rule_id: r for r in review_rule_set(rules)}
    assert "DUPLICATE_RULE" in _codes(results["B"])
    assert results["B"].issues[-1].facts["duplicateOf"] == "A"
    assert "DUPLICATE_RULE" not in _codes(results["A"])
    # same field target, different explicit errorCodes -> both flagged
    assert "FIELD_ERROR_CODE_CONFLICT" in _codes(results["C"])
    assert "FIELD_ERROR_CODE_CONFLICT" in _codes(results["D"])


def test_single_composition_rule_enforced():
    rules = [
        {"id": "R7", "type": "RequiredSpans",
         "params": {"requirements": [{"kind": "P", "min": 1}]}},
        {"id": "R7b", "type": "RequiredSpans",
         "params": {"requirements": [{"kind": "Q", "min": 1}]}},
    ]
    results = review_rule_set(rules)
    assert all(r.status == BLOCKED for r in results)
    assert all("DUPLICATE_BUNDLE_RESOURCE_RULE" in _codes(r)
               for r in results)
    s = review_summary(results)
    assert s["status"] == BLOCKED and not s["exportable"]
    assert s["blocked"] == ["R7", "R7b"]


def test_default_profile_review_and_publish_gate(tmp_path):
    from fhir_data_validation_ray.pipelines.profiles import (
        ProfileStore,
        default_profile,
    )

    p = default_profile()
    results = review_rule_set(p["rules"])
    s = review_summary(results)
    # default profile has no BLOCKED rules (R7's 1..20 range and R8's
    # Reference rule are WARNING-level divergences), so a reviewed publish
    # succeeds
    assert s["exportable"], s
    store = ProfileStore(str(tmp_path))
    entry = store.publish(p, review=True)
    assert entry["version"] == p["version"]
    # a BLOCKED profile is refused under review=True but publishable
    # without review (the gate is opt-in)
    bad = default_profile()
    bad["version"] = "9.9"
    bad["rules"] = [{"id": "Z", "type": "RequiredSpans",
                     "params": {"requirements": [{"kind": "P", "min": 0}]}}]
    with pytest.raises(ValueError, match="BLOCKED"):
        store.publish(bad, review=True)
    assert store.publish(bad)["version"] == "9.9"