"""Lint rule catalog — metadata ONLY, no validation logic.

The span-model analogue of the reference's lint catalog
(``Catalogs/LintRuleCatalog.cs:17-357``): stable rule ids, severity and
confidence levels, and centralized disclaimer text. The checks themselves
live in ``functions/kernels.py:k_lint`` (the analogue of
``Authoring/LintValidationService.cs``), gated to full/debug validation mode
exactly like the other advisory-layer rules — lint emissions are
Advisory-class heuristics, so ``resolve_severity`` downgrades every
configured ``error`` to ``warning`` and skipping the layer can never change
a blocking decision.

The reference's JSON-shape rules (LINT_INVALID_JSON, LINT_ROOT_NOT_OBJECT,
LINT_ENTRY_NOT_ARRAY, ...) cannot fire on an Arrow spans column — malformed
JSON is quarantined at the JSONL ingest lane instead
(``sources/json_ingest.py``, error INVALID_JSON). The catalog below carries
the rules expressible over ``(kind, text, media_ref, offset)`` spans:
value-quality, plausibility and duplicate-entry heuristics.
"""

from __future__ import annotations

DEFAULT_DISCLAIMER = (
    "Best-effort lint check. Final validation is performed by the rule "
    "engine."  # mirrors LintRuleCatalog.cs:19
)

# Plausible-year window for LINT_SUSPICIOUS_DATE, overridable per profile
# via settings lintYearMin / lintYearMax.
LINT_YEAR_MIN = 1900
LINT_YEAR_MAX = 2100

# id -> metadata; severity is the CONFIGURED severity (pre-resolution — the
# Advisory downgrade turns error into warning at emission).
LINT_CATALOG: dict[str, dict[str, str]] = {
    "LINT_EMPTY_VALUE": {
        "category": "Value",
        "title": "Empty Value",
        "description": "Span text is present but empty "
                       "(LintRuleCatalog.cs:25 EmptyInput analogue).",
        "severity": "warning",
        "confidence": "High",
    },
    "LINT_WHITESPACE_ONLY": {
        "category": "Value",
        "title": "Whitespace-Only Value",
        "description": "Span text contains only whitespace "
                       "(LintRuleCatalog.cs:25-33: 'empty, null, or "
                       "contains only whitespace').",
        "severity": "warning",
        "confidence": "High",
    },
    "LINT_UNTRIMMED_VALUE": {
        "category": "Value",
        "title": "Untrimmed Value",
        "description": "Span text has leading or trailing whitespace.",
        "severity": "warning",
        "confidence": "Medium",
    },
    "LINT_MISSING_KIND": {
        "category": "Structure",
        "title": "Missing kind",
        "description": "Span has a null or empty kind "
                       "(LintRuleCatalog.cs:65 MissingResourceType "
                       "analogue).",
        "severity": "error",
        "confidence": "High",
    },
    "LINT_SUSPICIOUS_DATE": {
        "category": "Primitive",
        "title": "Suspicious Date",
        "description": "date/dateTime span with a leading year outside the "
                       "plausible window (companion heuristic to the strict "
                       "grammar check; LintRuleCatalog.cs:217 InvalidDate "
                       "is the format side).",
        "severity": "warning",
        "confidence": "Medium",
    },
    "LINT_BOOLEAN_CASE": {
        "category": "Primitive",
        "title": "Boolean Wrong Case",
        "description": "boolean span whose text is 'true'/'false' in the "
                       "wrong case (LintRuleCatalog.cs:241 BooleanAsString "
                       "analogue).",
        "severity": "error",
        "confidence": "High",
    },
    "LINT_DUPLICATE_ENTRY": {
        "category": "Structure",
        "title": "Duplicate Entry",
        "description": "Non-first span in a document with identical "
                       "(kind, text, media_ref).",
        "severity": "warning",
        "confidence": "Medium",
    },
    "LINT_CONTROL_CHARS": {
        "category": "Value",
        "title": "Control Characters",
        "description": "Span text contains C0 control characters other "
                       "than tab/newline/carriage-return.",
        "severity": "error",
        "confidence": "High",
    },
}
