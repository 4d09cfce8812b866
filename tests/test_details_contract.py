"""Canonical-Details contract sweep (VERDICT r4 "Next round" #5) — the
``ValidationErrorDetailsValidator.cs`` analogue: every details payload any
profile can emit must match the frozen per-code schema in
``details_contract.CANONICAL_DETAILS``."""

import json

import pytest

SF = "/root/testdata/sf0.001"


def _streams():
    """(name, dataset-producer) pairs covering the full emission surface:
    the default profile in full mode (rules + structural + reference +
    lint layers), plus the single-rule profiles for kernels the default
    corpus/profile doesn't trip."""
    from fhir_data_validation_ray.pipelines.profiles import (
        default_profile,
        single_rule_profile,
    )
    from fhir_data_validation_ray.pipelines.validate import run_validation

    def full_default(sf):
        return run_validation(sf, validation_mode="full")

    def single(rule_id, **tweaks):
        def run(sf):
            p = single_rule_profile(rule_id)
            for k, v in tweaks.items():
                p["rules"][0]["params"][k] = v
            return run_validation(sf, p, with_uniqueness=False)

        return run

    def custom_predicate(sf):
        p = single_rule_profile("R1")
        p["rules"] = [{"id": "CP", "type": "CustomPredicate", "kind": "*",
                       "fieldPath": "text",
                       "params": {"expr": "exists(text) and text != ''"}}]
        return run_validation(sf, p, with_uniqueness=False)

    def config_error(sf):
        p = single_rule_profile("R6")
        p["rules"][0]["params"]["system"] = "https://example.org/cs/absent"
        return run_validation(sf, p, with_uniqueness=False)

    return [
        ("full_default", full_default),
        ("reference_require", single("R8", policy="RequireResolution")),
        ("custom_predicate", custom_predicate),
        ("codesystem_config_error", config_error),
    ]


@pytest.mark.parametrize("name,producer", _streams(),
                         ids=[n for n, _ in _streams()])
def test_details_schema_compliance(ray_session, name, producer):
    from fhir_data_validation_ray.details_contract import validate_details

    df = producer(SF).to_pandas()
    assert len(df) > 0, f"stream {name} produced no violations to check"
    bad = []
    for code, det in zip(df["error_code"], df["details"]):
        problems = validate_details(code, det)
        if problems:
            bad.append((code, det, problems))
    assert not bad, f"{len(bad)} non-canonical payloads, first: {bad[0]}"


def test_full_default_stream_covers_most_contract_codes(ray_session):
    """The contract table must not drift into dead entries: the default
    full-mode stream alone exercises the bulk of the frozen codes."""
    from fhir_data_validation_ray.details_contract import CANONICAL_DETAILS
    from fhir_data_validation_ray.pipelines.validate import run_validation

    df = run_validation(SF, validation_mode="full").to_pandas()
    seen = set(df["error_code"])
    frozen = set(CANONICAL_DETAILS)
    assert len(seen & frozen) >= 20, sorted(seen & frozen)


def test_validator_rejects_wrong_and_malformed_payloads():
    from fhir_data_validation_ray.details_contract import validate_details

    # canonical
    ok = json.dumps({"actual": "x", "pattern": "^a$"})
    assert validate_details("PATTERN_MISMATCH", ok) == []
    # optional details always pass
    assert validate_details("PATTERN_MISMATCH", None) == []
    assert validate_details("PATTERN_MISMATCH", "") == []
    # wrong keys for a frozen code
    assert validate_details("PATTERN_MISMATCH",
                            json.dumps({"actual": "x"}))
    # extra key is just as non-canonical as a missing one
    assert validate_details(
        "PATTERN_MISMATCH",
        json.dumps({"actual": "x", "pattern": "p", "hint": "no"}))
    # malformed JSON / non-object
    assert validate_details("PATTERN_MISMATCH", "{not json")
    assert validate_details("PATTERN_MISMATCH", json.dumps([1, 2]))
    # family prefix: every LINT_* code shares {confidence}
    assert validate_details("LINT_EMPTY_VALUE",
                            json.dumps({"confidence": "High"})) == []
    assert validate_details("LINT_SOMETHING_NEW",
                            json.dumps({"confidence": "Low"})) == []
    assert validate_details("LINT_EMPTY_VALUE", json.dumps({"c": 1}))
    # unknown codes validate trivially (reference logs-and-skips parity)
    assert validate_details("TOTALLY_NEW_CODE",
                            json.dumps({"whatever": 1})) == []


def test_multi_variant_codes_accept_each_variant():
    from fhir_data_validation_ray.details_contract import validate_details

    for keys in ({"pattern", "question"}, {"question", "reason"},
                 {"question", "type"}, {"question", "unit"},
                 {"question", "reason", "screening"}):
        payload = json.dumps({k: "v" for k in keys})
        assert validate_details("INVALID_ANSWER_VALUE", payload) == []
    assert validate_details("INVALID_ANSWER_VALUE",
                            json.dumps({"question": "q"}))


def test_debug_mode_enforces_contract_in_pipeline(ray_session):
    """run_validation(validation_mode='debug') threads the violations
    stream through enforce_details_contract — a clean profile passes,
    and a poisoned payload raises from inside the pipeline."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.details_contract import (
        enforce_details_contract,
    )
    from fhir_data_validation_ray.pipelines.validate import run_validation

    out = run_validation(SF, validation_mode="debug")
    assert out.count() > 0  # clean contract: the debug gate passes

    poisoned = rd.from_arrow(pa.table({
        "error_code": pa.array(["PATTERN_MISMATCH"], pa.string()),
        "details": pa.array(['{"wrong": 1}'], pa.string()),
    }))
    with pytest.raises(Exception, match="details contract violation"):
        enforce_details_contract(poisoned).count()
