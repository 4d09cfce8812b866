"""Unified error model: codes, severities, sources, and the violations schema.

Mirrors the reference's unified error model
(``Models/ValidationError.cs:9-100``, ``docs/08_unified_error_model.md:16-31``)
and the fixed error-code-per-rule-type contract
(``RuleEngines/FhirPathRuleEngine.cs:1036-1051``, ``Validation/ErrorCodes.cs``).

The engine emits *codes + structured details*, never prose (reference
guardrail test ``Validation/NoProseEnforcementTests.cs``).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- severities
SEV_ERROR = "error"
SEV_WARNING = "warning"
SEV_INFO = "info"
SEVERITIES = (SEV_ERROR, SEV_WARNING, SEV_INFO)

# ------------------------------------------------------------------- sources
# Reference sources: LINT / FHIR / Business / CodeMaster / Reference
# (``Core/ValidationPipeline.cs:755-770``). STRUCTURE is the primary
# structural authority (``Core/ValidationPipeline.cs:131-141``).
SRC_STRUCTURE = "STRUCTURE"
SRC_BUSINESS = "Business"
SRC_REFERENCE = "Reference"
SRC_CODEMASTER = "CodeMaster"
SRC_PIPELINE = "Pipeline"
SRC_LINT = "LINT"
# Advisory HL7 spec-hint layer (``Authoring/SpecHintService.cs``; classified
# source ``UnifiedErrorModelBuilder.cs:473-505``).
SRC_SPEC_HINT = "SPEC_HINT"

# Stage rank reproduces the reference's pipeline-stage ordering of errors
# (``docs/05_validation_pipeline.md:20-31``): STRUCTURE first, then business
# rules, then CodeMaster, then Reference. The LINT layer is the reference's
# pre-parse best-effort pass (``Authoring/LintValidationService.cs``; its
# rows lead the unified list and are counted separately,
# ``Core/ValidationPipeline.cs:765``), so it ranks before STRUCTURE.
SOURCE_STAGE_RANK = {
    SRC_LINT: -1,
    # spec hints are generated alongside structural validation but are
    # advisory-only; they rank between LINT and STRUCTURE so the unified
    # ordering stays deterministic (UnifiedErrorModelBuilder groups them
    # with the advisory layers).
    SRC_SPEC_HINT: -1,
    SRC_STRUCTURE: 0,
    SRC_BUSINESS: 1,
    SRC_CODEMASTER: 2,
    SRC_REFERENCE: 3,
    SRC_PIPELINE: 9,
}

# ----------------------------------------------------------------- validation classes
# ``Models/ValidationClass.cs:14-44`` + ``Validation/SeverityResolver.cs:36-78``:
# Contract/Structural severities are never downgraded; Advisory downgrades
# error -> warning.
CLASS_STRUCTURAL = "Structural"
CLASS_CONTRACT = "Contract"
CLASS_ADVISORY = "Advisory"


def resolve_severity(configured: str, validation_class: str,
                     is_heuristic: bool = False, is_spec_hint: bool = False) -> str:
    """Pure severity-resolution function (``SeverityResolver.cs:35-76``):
    Contract/Structural never downgrade; Advisory downgrades error->warning
    ONLY when the rule is marked heuristic or spec-hint — an unflagged
    Advisory error stays an error, exactly as in the reference."""
    if (
        validation_class == CLASS_ADVISORY
        and configured == SEV_ERROR
        and (is_heuristic or is_spec_hint)
    ):
        return SEV_WARNING
    return configured


# --------------------------------------------------------------- error codes
# Rule-engine codes (fixed per rule type, ``FhirPathRuleEngine.cs:1036-1051``)
REQUIRED_FIELD_MISSING = "REQUIRED_FIELD_MISSING"
FIXED_VALUE_MISMATCH = "FIXED_VALUE_MISMATCH"
VALUE_NOT_ALLOWED = "VALUE_NOT_ALLOWED"
PATTERN_MISMATCH = "PATTERN_MISMATCH"
ARRAY_LENGTH_OUT_OF_RANGE = "ARRAY_LENGTH_OUT_OF_RANGE"
CODESYSTEM_MISMATCH = "CODESYSTEM_MISMATCH"
CODE_NOT_IN_VALUESET = "CODE_NOT_IN_VALUESET"
CUSTOM_PREDICATE_FAILED = "CUSTOMFHIRPATH_CONDITION_FAILED"
RESOURCE_REQUIREMENT_VIOLATION = "RESOURCE_REQUIREMENT_VIOLATION"
RULE_CONFIGURATION_ERROR = "RULE_CONFIGURATION_ERROR"
RULE_EXECUTION_ERROR = "RULE_EXECUTION_ERROR"

# Reference resolution (``RuleEngines/ReferenceResolver.cs``)
# CodeMaster codes (``RuleEngines/CodeMasterEngine.cs``)
CODEMASTER_SCREENING_UNKNOWN = "CODEMASTER_SCREENING_UNKNOWN"
CODEMASTER_QUESTION_UNKNOWN = "CODEMASTER_QUESTION_UNKNOWN"

# QuestionAnswer codes (``Validation/ErrorCodes.cs:198-218``)
INVALID_ANSWER_VALUE = "INVALID_ANSWER_VALUE"
ANSWER_NOT_IN_VALUESET = "ANSWER_NOT_IN_VALUESET"
ANSWER_OUT_OF_RANGE = "ANSWER_OUT_OF_RANGE"
UNKNOWN_QUESTION = "UNKNOWN_QUESTION"

REFERENCE_NOT_FOUND = "REFERENCE_NOT_FOUND"
REFERENCE_TYPE_MISMATCH = "REFERENCE_TYPE_MISMATCH"
ENTRY_REFERENCE_MISMATCH = "ENTRY_REFERENCE_MISMATCH"

# Structural / grammar codes (``Validation/JsonNodeStructuralValidator.cs``)
# EMPTY_BUNDLE is the stage-0 document-sanity code
# (``Core/ValidationPipeline.cs:610-656``); INVALID_JSON has no analogue —
# malformed JSON is structurally impossible in an Arrow spans column.
EMPTY_BUNDLE = "EMPTY_BUNDLE"
FHIR_INVALID_PRIMITIVE = "FHIR_INVALID_PRIMITIVE"
FHIR_INVALID_REFERENCE_FORMAT = "FHIR_INVALID_REFERENCE_FORMAT"
FHIR_MULTIPLE_VALUE_X = "FHIR_MULTIPLE_VALUE_X"
# Extension grammar (``JsonNodeStructuralValidator.cs:1087-1185``): url
# required + single-payload shape; the span model's flat struct cannot hold
# a nested extension[] list, so only shapeReason "empty" is reachable
# (documented divergence, SURVEY §2.3)
FHIR_EXTENSION_MISSING_URL = "FHIR_EXTENSION_MISSING_URL"
FHIR_EXTENSION_INVALID_SHAPE = "FHIR_EXTENSION_INVALID_SHAPE"
INVALID_ENUM_VALUE = "INVALID_ENUM_VALUE"
SPAN_SEQUENCE_INVALID = "SPAN_SEQUENCE_INVALID"  # offset monotonicity per row

# Cross-document checks (north_star additions; no reference analogue)
DUPLICATE_DOC_ID = "DUPLICATE_DOC_ID"
DISTRIBUTION_DRIFT = "DISTRIBUTION_DRIFT"

PIPELINE_ERROR = "PIPELINE_ERROR"

# ------------------------------------------------------------ violations schema
# One row per violation (FIXTURES.md §4). ``span_index`` is -1 for
# document-level errors; ``json_pointer`` follows the reference pointer shape
# ``/entry/{i}/resource/...`` (``FhirPathRuleEngine.cs:359``) adapted to
# ``/spans/{i}/<field>``.
VIOLATIONS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_index", pa.int32()),
        ("source", pa.string()),
        ("severity", pa.string()),
        ("rule_id", pa.string()),
        ("error_code", pa.string()),
        ("path", pa.string()),
        ("json_pointer", pa.string()),
        ("details", pa.string()),
    ]
)


def empty_violations() -> pa.Table:
    return VIOLATIONS_SCHEMA.empty_table()
