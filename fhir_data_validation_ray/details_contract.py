"""Canonical ``details`` schema per error code — the analogue of the
reference's frozen contract (``Models/ValidationErrorDetailsValidator.cs``
enforcing ``/docs/validation-error-details-schema.md``): every emitted
``details`` payload either is absent (optional, ``:47-49``) or carries
EXACTLY one of the canonical key sets for its error code.

The reference validates shape at emission (throw in dev, warn in prod);
this engine's kernels build details through ``kernels._canon_details``
with literal dicts, so the shape is fixed at the call site — the contract
here is the frozen registry of those shapes, and
``tests/test_details_contract.py`` sweeps every violation stream the
default + single-rule profiles can produce through ``validate_details``.

Where a code exists in both engines the key sets are mapped from the
reference schema (e.g. ``PATTERN_MISMATCH`` {actual, pattern} ``:174-180``,
``FIXED_VALUE_MISMATCH`` {actual, expected} ``:182-186``,
``REFERENCE_TYPE_MISMATCH`` {ref → reference, expected → expectedTypes,
actual → actualType} ``:240-252``); engine-only codes freeze the shapes
their kernels already emit.
"""

from __future__ import annotations

import json

# code -> tuple of allowed key sets (a code may emit several canonical
# variants, e.g. QuestionAnswer's per-answer-type sub-cases)
CANONICAL_DETAILS: dict[str, tuple[frozenset[str], ...]] = {
    # rule kernels (kernels.py:326-560)
    "REQUIRED_FIELD_MISSING": (frozenset({"field"}),),
    "FIXED_VALUE_MISMATCH": (frozenset({"actual", "expected"}),),
    "VALUE_NOT_ALLOWED": (frozenset({"actual", "allowed"}),),
    "PATTERN_MISMATCH": (frozenset({"actual", "pattern"}),),
    "ARRAY_LENGTH_OUT_OF_RANGE": (frozenset({"actual", "bound", "limit"}),),
    "CODESYSTEM_MISMATCH": (frozenset({"actual", "expected"}),),
    "CODE_NOT_IN_VALUESET": (frozenset({"code", "system"}),),
    "RULE_CONFIGURATION_ERROR": (
        frozenset({"ruleType", "system", "explanation"}),),
    "RULE_EXECUTION_ERROR": (frozenset({"error", "msg"}),),
    "CUSTOMFHIRPATH_CONDITION_FAILED": (frozenset({"expr"}),),
    # RequiredSpans (kernels.py:565-692): per-requirement, undeclared, and
    # consolidated (<=3-example) shapes
    "RESOURCE_REQUIREMENT_VIOLATION": (
        frozenset({"actual", "expected_max", "expected_min", "kind"}),
        frozenset({"undeclared_count"}),
        frozenset({"expected", "actual", "diff"}),
    ),
    # QuestionAnswer typed dispatch (kernels.py:886-1040)
    "UNKNOWN_QUESTION": (frozenset({"reason"}),),
    "INVALID_ANSWER_VALUE": (
        frozenset({"pattern", "question"}),
        frozenset({"question", "reason"}),
        frozenset({"question", "reason", "screening"}),
        frozenset({"question", "type"}),
        frozenset({"question", "unit"}),
    ),
    "ANSWER_NOT_IN_VALUESET": (
        frozenset({"allowed", "question"}),
        frozenset({"allowed", "question", "screening"}),
    ),
    "ANSWER_OUT_OF_RANGE": (frozenset({"max", "min", "question"}),),
    # CodeMaster screening (kernels.py:1099-1230)
    "CODEMASTER_SCREENING_UNKNOWN": (frozenset({"reason"}),),
    "CODEMASTER_QUESTION_UNKNOWN": (frozenset({"reason", "screening"}),),
    # reference resolution + grammar (kernels.py:693-880, 1440-1470;
    # stages/reference.py:155-207 join lane)
    "REFERENCE_NOT_FOUND": (frozenset({"policy", "ref"}),),
    "REFERENCE_TYPE_MISMATCH": (frozenset({"actual", "expected", "ref"}),),
    # fullurl-id match shares ENTRY_REFERENCE_MISMATCH (kernels.py:832-870)
    "ENTRY_REFERENCE_MISMATCH": (frozenset({"ref"}),),
    "FHIR_INVALID_REFERENCE_FORMAT": (frozenset({"ref"}),),
    # structural layer (kernels.py:1236-1490)
    "EMPTY_BUNDLE": (frozenset({"reason"}),),
    "FHIR_INVALID_PRIMITIVE": (frozenset({"actual", "primitive"}),
                               frozenset({"actual", "field"})),
    "FHIR_MULTIPLE_VALUE_X": (frozenset({"fields"}),),
    "FHIR_EXTENSION_MISSING_URL": (frozenset({"hasUrl"}),),
    "FHIR_EXTENSION_INVALID_SHAPE": (frozenset({"shapeReason"}),),
    "INVALID_ENUM_VALUE": (frozenset({"actual", "allowed"}),),
    "SPAN_SEQUENCE_INVALID": (frozenset({"offset", "prev"}),),
    # cross-document uniqueness (stages/uniqueness.py:144)
    "DUPLICATE_DOC_ID": (frozenset({"count"}),),
}

# code families with one shared shape: every LINT_* catalog entry emits a
# single {confidence} payload (catalogs.py + kernels.py:1341)
_FAMILY_PREFIXES: tuple[tuple[str, tuple[frozenset[str], ...]], ...] = (
    ("LINT_", (frozenset({"confidence"}),)),
)


def canonical_keysets(error_code: str) -> tuple[frozenset[str], ...] | None:
    """Allowed key sets for a code, or None if the code has no frozen
    schema (unknown codes validate trivially — the reference logs and
    skips, ``:104-107``)."""
    hit = CANONICAL_DETAILS.get(error_code)
    if hit is not None:
        return hit
    for prefix, shapes in _FAMILY_PREFIXES:
        if error_code.startswith(prefix):
            return shapes
    return None


def validate_details(error_code: str, details: str | None) -> list[str]:
    """Problems with one violation row's details payload (empty list =
    compliant). ``details`` is the engine's canonical-JSON string column;
    None/'' is always compliant (details is optional)."""
    if details is None or details == "":
        return []
    try:
        obj = json.loads(details)
    except (ValueError, TypeError) as exc:
        return [f"details is not valid JSON: {exc}"]
    if not isinstance(obj, dict):
        return ["details must be a JSON object"]
    shapes = canonical_keysets(error_code)
    if shapes is None:
        return []  # unknown code: nothing to enforce (reference parity)
    keys = frozenset(obj.keys())
    if keys not in shapes:
        want = " | ".join("{" + ", ".join(sorted(s)) + "}" for s in shapes)
        return [f"keys {{{', '.join(sorted(keys))}}} not canonical for "
                f"{error_code}; expected one of: {want}"]
    return []


def enforce_details_contract(violations):
    """Debug-lane passthrough stage: every batch of the violations stream
    is checked against the canonical schema and the FIRST offending row
    raises (the reference's throw-in-Development behavior,
    ``ValidationErrorDetailsValidator.cs:108-118``). Diagnostic lane only
    — standard/full runs skip it (the kernels' literal-dict call sites
    are already shape-frozen; this catches drift the moment a dev run
    sees it). Per-row JSON parsing is the cost, which is why it is gated
    to debug mode."""
    import pyarrow as pa

    def check(t: pa.Table) -> pa.Table:
        codes = t["error_code"].to_pylist()
        dets = t["details"].to_pylist() if "details" in t.column_names \
            else [None] * t.num_rows
        for code, det in zip(codes, dets):
            problems = validate_details(code, det)
            if problems:
                raise RuntimeError(
                    f"details contract violation for {code!r}: "
                    f"{problems[0]} (payload: {det!r})")
        return t

    return violations.map_batches(check, batch_format="pyarrow")
