"""The default validation profile — the ``rules.json`` analogue used by the
flagship pipeline, tests and bench. Vocabulary per FIXTURES.md §3 /
``Models/RuleSet.cs:51-129``; values aligned with the deterministic fixture
generator (``sources/generator.py``)."""

from __future__ import annotations

import copy

from ..sources.generator import ALLOWED_KINDS

# NRIC pattern from the reference fixture ``Fixtures/sample-rules.json:35``.
NRIC_PATTERN = "^[STFG]\\d{7}[A-Z]$"

DEFAULT_PROFILE: dict = {
    "version": "1.0",
    "allowedKinds": list(ALLOWED_KINDS),
    "settings": {"checkDocId": True, "checkSpanOrder": True, "dedupStructure": True},
    "codeSystems": [
        {
            "url": "https://example.org/cs/language",
            "concept": [{"code": "EN"}, {"code": "MS"}, {"code": "TA"}],
        }
    ],
    "rules": [
        {"id": "R1", "type": "Required", "kind": "Patient",
         "instanceScope": {"kind": "all"}, "fieldPath": "text", "severity": "error"},
        {"id": "R2", "type": "FixedValue", "kind": "Encounter",
         "instanceScope": {"kind": "first"}, "fieldPath": "text",
         "params": {"value": "ambulatory"}},
        {"id": "R3", "type": "AllowedValues", "kind": "Observation",
         "instanceScope": {"kind": "all"}, "fieldPath": "text",
         "params": {"values": ["final", "amended"]}},
        {"id": "R4", "type": "Regex", "kind": "Patient",
         "instanceScope": {"kind": "all"}, "fieldPath": "text",
         "params": {"pattern": NRIC_PATTERN}},
        {"id": "R5", "type": "ArrayLength", "kind": "*", "fieldPath": "spans",
         "params": {"min": 1, "max": 100}},
        {"id": "R6", "type": "CodeSystem", "kind": "Coding", "fieldPath": "text",
         "params": {"system": "https://example.org/cs/language"}},
        {"id": "R7", "type": "RequiredSpans", "kind": "*",
         "params": {"requirements": [{"kind": "Patient", "min": 1, "max": 20}],
                    "rejectUndeclared": False}},
        {"id": "R8", "type": "Reference", "kind": "*", "fieldPath": "media_ref",
         "params": {"policy": "RequireResolution"}},
    ],
}


def default_profile() -> dict:
    return copy.deepcopy(DEFAULT_PROFILE)


def single_rule_profile(rule_id: str, *, with_structure: bool = False) -> dict:
    """Profile containing exactly one of the default rules — used by the
    per-operator oracle queries so each kernel is checked in isolation."""
    p = default_profile()
    p["rules"] = [r for r in p["rules"] if r["id"] == rule_id]
    if not with_structure:
        p["settings"]["checkDocId"] = False
        p["settings"]["checkSpanOrder"] = False
        p["allowedKinds"] = []
    return p
