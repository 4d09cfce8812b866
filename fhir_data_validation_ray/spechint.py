"""Schema-driven SPEC_HINT generation — the span-model analogue of the
reference's HL7 StructureDefinition hint generator
(``Authoring/Hl7SpecHintGenerator.cs:24-514``) plus the hint classifier
(``Authoring/BaseRuleClassifier.cs:28-177``).

A *span schema* is the engine's StructureDefinition stand-in: one JSON
document per root type declaring element paths (``<Root>.<kind>`` /
``<Root>.<parentKind>.<childKind>``) with min/max cardinality, optional
explicit condition keys, and a constraint table mapping keys to
``exists(<kind>)`` expressions. ``generate_spec_hints`` applies the
reference's extraction rules verbatim:

1. required fields: ``min > 0`` AND not root AND not ``.id``/``.extension``
   (``Hl7SpecHintGenerator.cs:180-193``);
2. implicit conditional: required child of an optional (min=0) non-root
   parent -> ``"<parent>.exists()"`` condition, ``appliesToEach`` when the
   parent is an unbounded array (``max="*"``, ``:229-307``);
3. explicit conditional: ``element.condition`` keys resolved through the
   constraint lookup (``:309-317, 354-398``);
4. graceful failure: malformed definitions are skipped, never raised
   (``:78-91``).

Generated hints compile to ``RequiredSpans`` rules with
``is_spec_hint=True`` (Advisory class), so the whole layer:

- only runs in full/debug validation mode (the same gate as the LINT
  layer, ``kernels.py`` planner) — standard-mode blocking decisions are
  identical with or without it;
- emits ``warning``-severity rows with source ``SPEC_HINT`` and the
  reference's error codes ``MISSING_REQUIRED_FIELD`` /
  ``SPEC_REQUIRED_CONDITIONAL`` (``UnifiedErrorModelBuilder.cs:497``).

The classifier (``classify_hint``) reproduces BaseRuleClassifier's
decision tree for reporting: conditional hints always stay SPEC_HINT,
root-level unconditional required fields classify as STRUCTURE (Category
A — they duplicate what the structural validator already blocks on, which
is why the emitted rule stays advisory), nested requirements stay
SPEC_HINT. The classification is carried in the generated rule's params
for drill-down, not used to upgrade severity.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

# Resource types the generator skips — meta/infrastructure definitions
# (``Hl7SpecHintGenerator.cs:475-498``).
INFRASTRUCTURAL_TYPES = frozenset({
    "Resource", "DomainResource", "Bundle", "Parameters", "OperationOutcome",
    "CapabilityStatement", "StructureDefinition", "ValueSet", "CodeSystem",
    "SearchParameter", "ImplementationGuide", "TerminologyCapabilities",
    "MessageDefinition", "CompartmentDefinition", "OperationDefinition",
    "Conformance",
})

# Constraint expressions the span model can compile: presence of a span
# kind. Both the FHIRPath spelling ("<kind>.exists()") and the engine's
# expression-language spelling ("exists(<kind>)") are accepted; anything
# else is skipped conservatively (the reference skips hints whose
# constraint has no expression, ``Hl7SpecHintGenerator.cs:373-388``).
_EXISTS_RE = re.compile(
    r"^\s*(?:([A-Za-z][\w]*)\.exists\(\)|exists\(([A-Za-z][\w]*)\))\s*$"
)


@dataclass(frozen=True)
class SpecHint:
    """One advisory hint (``Authoring/SpecHint.cs:8-55``)."""

    path: str                      # relative to the root type ("kind" or "parent.kind")
    reason: str
    severity: str = "warning"
    source: str = "HL7"
    is_conditional: bool = False
    condition: str | None = None   # "<parent>.exists()" form
    applies_to_each: bool = False


@dataclass(frozen=True)
class HintClassification:
    """``Authoring/BaseRuleClassifier.cs:179-214`` analogue."""

    source: str      # "STRUCTURE" | "SPEC_HINT"
    severity: str    # "error" | "warning"
    category: str    # Conditional | UnconditionalRequired | NestedOptional | Advisory


def _parent_path(path: str) -> str | None:
    """``Hl7SpecHintGenerator.cs:505-513`` GetParentPath."""
    i = path.rfind(".")
    return path[:i] if i > 0 else None


def generate_spec_hints(schema: dict[str, Any]) -> dict[str, list[SpecHint]]:
    """Extract hints per root type from a span schema.

    Schema shape::

        {"fhirVersion": "R4",
         "definitions": [
            {"name": "Document", "kind": "resource", "type": "Document",
             "elements": [{"path": "Document.Patient", "min": 1, "max": "1"},
                          ...],
             "constraints": {"doc-1": {"expression": "Screening.exists()"}}},
            ...]}

    Returns ``{root_type: [SpecHint, ...]}``; definitions that fail to
    parse are skipped (graceful failure, ``Hl7SpecHintGenerator.cs:78-91``).
    """
    out: dict[str, list[SpecHint]] = {}
    version = str(schema.get("fhirVersion", "R4"))
    for sd in schema.get("definitions", ()) or ():
        try:
            hints = _process_definition(sd, version)
        except Exception:
            continue  # graceful: skip the definition, keep the rest
        if hints is not None and hints[1]:
            out[hints[0]] = hints[1]
    return out


def _process_definition(
    sd: dict[str, Any], version: str
) -> tuple[str, list[SpecHint]] | None:
    """``Hl7SpecHintGenerator.cs:100-163`` ProcessStructureDefinition."""
    if sd.get("kind") != "resource":
        return None
    rtype = sd.get("type") or ""
    if not rtype.strip():
        return None
    if rtype in INFRASTRUCTURAL_TYPES:
        return None
    elements: list[dict[str, Any]] = list(sd.get("elements", ()) or ())
    by_path = {e.get("path"): e for e in elements}
    constraints: dict[str, Any] = dict(sd.get("constraints", {}) or {})
    hints: list[SpecHint] = []
    for el in elements:
        hints.extend(
            _hints_from_element(el, rtype, version, constraints, by_path)
        )
    return rtype, hints


def _hints_from_element(
    el: dict[str, Any],
    rtype: str,
    version: str,
    constraints: dict[str, Any],
    by_path: dict[str, dict[str, Any]],
) -> list[SpecHint]:
    """``Hl7SpecHintGenerator.cs:169-348`` ExtractHintsFromElement."""
    path = el.get("path") or ""
    # skip root element, .id and .extension meta fields (:181-190);
    # a pathless element can't anchor a hint (defensive — the reference
    # catches and skips, :340-345)
    if (not path.strip() or path == rtype
            or path.endswith(".id") or path.endswith(".extension")):
        return []
    if int(el.get("min", 0) or 0) <= 0:
        return []
    prefix = rtype + "."
    rel = path[len(prefix):] if path.startswith(prefix) else path
    parent = _parent_path(path)
    parent_el = by_path.get(parent) if parent else None
    # root-level required fields are never implicit-conditional (:248-256)
    is_root_level = parent == rtype
    implicit = (
        parent_el is not None
        and int(parent_el.get("min", 0) or 0) == 0
        and not is_root_level
    )
    cond_keys = list(el.get("condition", ()) or ())
    if implicit:
        parent_rel = (
            "" if parent == rtype else parent[len(prefix):]  # type: ignore[index]
        )
        return [SpecHint(
            path=rel,
            reason=(f"According to HL7 FHIR {version}, '{path}' is required "
                    f"when {parent} is present."),
            is_conditional=True,
            condition=f"{parent_rel}.exists()",
            applies_to_each=parent_el.get("max") == "*",
        )]
    if cond_keys:
        hints = []
        for key in cond_keys:
            c = constraints.get(key) or {}
            expr = (c.get("expression") or "").strip()
            if not expr:
                continue  # :373 — constraint without expression is skipped
            hints.append(SpecHint(
                path=rel,
                reason=(f"According to HL7 FHIR {version}, '{path}' is "
                        f"required when condition '{expr}' is true."),
                is_conditional=True,
                condition=expr,
                applies_to_each=_applies_to_each(rel, rtype, by_path),
            ))
        return hints
    return [SpecHint(
        path=rel,
        reason=(f"According to HL7 FHIR {version}, '{path}' is required "
                f"(min cardinality = {int(el['min'])})."),
    )]


def _applies_to_each(
    rel: str, rtype: str, by_path: dict[str, dict[str, Any]]
) -> bool:
    """``Hl7SpecHintGenerator.cs:404-434`` DetermineAppliesToEach."""
    parts = rel.split(".")
    if len(parts) < 2:
        return False
    parent_el = by_path.get(f"{rtype}.{'.'.join(parts[:-1])}")
    return bool(parent_el) and parent_el.get("max") == "*"


def classify_hint(hint: SpecHint) -> HintClassification:
    """``Authoring/BaseRuleClassifier.cs:65-134`` Classify."""
    if hint.is_conditional:
        return HintClassification("SPEC_HINT", "warning", "Conditional")
    if "." not in hint.path:
        # Category A: root-level unconditional required -> blocking in the
        # reference's unified model (already enforced by STRUCTURE checks)
        return HintClassification("STRUCTURE", "error", "UnconditionalRequired")
    return HintClassification("SPEC_HINT", "warning", "NestedOptional")


def parse_exists_condition(condition: str | None) -> str | None:
    """Span kind gated on by an ``exists`` condition, or None if the
    expression is outside the compilable subset."""
    if not condition:
        return None
    m = _EXISTS_RE.match(condition)
    if not m:
        return None
    return m.group(1) or m.group(2)


def spec_hint_rules(catalog: dict[str, list[SpecHint]]) -> list[dict[str, Any]]:
    """Compile a hint catalog to engine rule dicts (``RequiredSpans`` with
    ``isSpecHint`` -> Advisory class, full-mode-only, warnings only).

    - simple hint ``"<kind>"``: the document needs >=1 span of that kind
      (error code ``MISSING_REQUIRED_FIELD``);
    - conditional hint ``"<parent>.<kind>"``: gated on ``whenKind`` from
      the parsed ``exists`` condition; ``appliesToEach`` maps to
      ``perParent`` (>=1 child span per parent span; error code
      ``SPEC_REQUIRED_CONDITIONAL``).

    Hints whose condition is outside the compilable ``exists(<kind>)``
    subset are skipped (conservative, ``SpecHintService.cs:250-258``).
    """
    rules: list[dict[str, Any]] = []
    i = 0
    for rtype, hints in sorted(catalog.items()):
        for h in hints:
            kind = h.path.split(".")[-1]
            req: dict[str, Any] = {"kind": kind, "min": 1}
            if h.is_conditional:
                when = parse_exists_condition(h.condition)
                if when is None:
                    continue
                req["whenKind"] = when
                req["perParent"] = h.applies_to_each
                code = "SPEC_REQUIRED_CONDITIONAL"
            else:
                code = "MISSING_REQUIRED_FIELD"
            cls = classify_hint(h)
            i += 1
            rules.append({
                "id": f"SH{i}",
                "type": "RequiredSpans",
                "kind": "*",
                "severity": "warning",
                "validationClass": "Advisory",
                "isSpecHint": True,
                "errorCode": code,
                "params": {
                    "requirements": [req],
                    # reporting metadata (not used by the kernel): the
                    # BaseRuleClassifier verdict + provenance
                    "specHint": {
                        "rootType": rtype, "path": h.path, "reason": h.reason,
                        "source": h.source, "condition": h.condition,
                        "appliesToEach": h.applies_to_each,
                        "classification": cls.category,
                        "classifiedSource": cls.source,
                    },
                },
            })
    return rules


# ---------------------------------------------------------------------------
# Default span schema over the deterministic fixture vocabulary
# (``sources/generator.py`` KINDS) — the engine's stand-in for the curated
# HL7 StructureDefinition subset the reference ships. Exercises every
# extraction lane: simple required (root-level and nested), implicit
# conditional with and without appliesToEach, explicit constraint-keyed
# conditional, and all the skip rules.
DEFAULT_SPAN_SCHEMA: dict[str, Any] = {
    "fhirVersion": "R4",
    "definitions": [
        {
            "name": "Document", "kind": "resource", "type": "Document",
            "elements": [
                {"path": "Document", "min": 0, "max": "*"},
                {"path": "Document.id", "min": 1, "max": "1"},         # skipped (.id)
                {"path": "Document.extension", "min": 1, "max": "*"},  # skipped (.extension)
                # simple required, root level (classifies STRUCTURE)
                {"path": "Document.Patient", "min": 1, "max": "1"},
                {"path": "Document.text", "min": 1, "max": "*"},
                # optional unbounded parent with a required child
                # -> implicit conditional, appliesToEach
                {"path": "Document.Observation", "min": 0, "max": "*"},
                {"path": "Document.Observation.Coding", "min": 1, "max": "1"},
                # optional scalar parent with a required child
                # -> implicit conditional, once per document
                {"path": "Document.Encounter", "min": 0, "max": "1"},
                {"path": "Document.Encounter.date", "min": 1, "max": "1"},
                # explicit constraint-keyed conditional
                {"path": "Document.dateTime", "min": 1, "max": "1",
                 "condition": ["doc-1"]},
                # not required -> no hint
                {"path": "Document.uri", "min": 0, "max": "*"},
            ],
            "constraints": {
                "doc-1": {"expression": "Screening.exists()",
                          "human": "A screening document must be dated."},
            },
        },
        # skipped: non-resource kind
        {"name": "Span", "kind": "complex-type", "type": "Span",
         "elements": [{"path": "Span.kind", "min": 1}]},
        # skipped: infrastructural type
        {"name": "Bundle", "kind": "resource", "type": "Bundle",
         "elements": [{"path": "Bundle.type", "min": 1}]},
    ],
}
