"""Deterministic validation-issue explanations — the span-model analogue of
the reference's template registry (``Authoring/ValidationExplanationService
.cs:24-361``): rule-based, no guessing, confidence-scoped, templates
immutable.

Every explanation is a pure function of (source, error_code, per-row path)
plus the rule's static params, so the layer is exactly SQL-checkable: the
same template functions that drive the vectorized Arrow enrichment also
emit the oracle's string literals/expressions.

The instance-metadata branches of the reference templates (``Actual
value: {actual}`` / ``Current item count: {n}``) key off the error's
details payload; this engine's query lane runs ``emit_details=False``, so
templates deterministically take their no-metadata branch — the rule-param
halves (expected value, allowed values, pattern, min/max, code system) are
static per rule and ARE interpolated.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

CONF_HIGH = "high"
CONF_MEDIUM = "medium"
CONF_LOW = "low"

# ------------------------------------------------------- source-level templates
# ``ValidationExplanationService.cs:27-67`` — static per source.
STRUCTURAL_WHAT = "This issue was detected during FHIR structural validation."
STRUCTURAL_HOW = ("The resource does not conform to the FHIR specification "
                  "at this location. Correct the data type or structure "
                  "indicated by the error.")
ADVISORY_WHAT = ("This is a best-effort quality check to improve "
                 "portability and correctness.")
ADVISORY_HOW = ("This issue may still be accepted by permissive FHIR "
                "engines. Review and correct it if interoperability is "
                "required.")

# ``:70-105`` reference-integrity templates, keyed by error code.
REF_NOT_FOUND_WHAT = ("The reference at '", "' points to a resource that "
                                            "does not exist in the bundle.")
REF_NOT_FOUND_HOW = ("Ensure the referenced resource is included in the "
                     "bundle, or use an external reference if appropriate.")
REF_TYPE_WHAT = ("The referenced resource type does not match the expected "
                 "type for this field.")
REF_TYPE_HOW = ("Change the reference to point to the correct resource "
                "type, or verify the resource type is allowed.")
REF_FALLBACK_WHAT = ("This reference validation issue was detected during "
                     "bundle integrity checks.")
REF_FALLBACK_HOW = ("Verify that all references point to valid resources "
                    "of the correct type.")


def normalize_rule_type(rule_type: str) -> str:
    """``ValidationExplanationService.cs:135-144`` NormalizeRuleType."""
    return (rule_type or "").replace("_", "").replace("-", "").replace(" ", "").upper()


@dataclass(frozen=True)
class RuleTemplate:
    """One project rule's explanation template: ``what`` always
    interpolates the per-row path between its two halves; ``how`` does
    only when ``how_uses_path`` (the Required template, ``:190-201``)."""

    what_pre: str
    what_suf: str
    how_pre: str | None
    how_uses_path: bool = False
    how_suf: str = ""
    confidence: str = CONF_MEDIUM
    # authored explanation overrides are verbatim (no interpolation)
    what_uses_path: bool = True

    def what(self, path: str) -> str:
        return (f"{self.what_pre}{path}{self.what_suf}"
                if self.what_uses_path else self.what_pre)

    def how(self, path: str) -> str | None:
        if self.how_pre is None:
            return None
        return (f"{self.how_pre}{path}{self.how_suf}"
                if self.how_uses_path else self.how_pre)


def rule_template(rule: dict[str, Any]) -> RuleTemplate:
    """Template for one rule dict (profile JSON shape) —
    ``ValidationExplanationService.cs:150-187`` GenerateFromTemplate with
    the metadata branches resolved from the rule's static params."""
    expl = rule.get("explanation")
    if expl:  # custom authored explanation wins (:117-124), high confidence
        return RuleTemplate(str(expl.get("what", "")), "",
                            expl.get("how"), confidence=CONF_HIGH,
                            what_uses_path=False)
    params = rule.get("params", {}) or {}
    t = normalize_rule_type(rule.get("type", ""))
    if t == "REQUIRED":
        return RuleTemplate(
            "This rule requires the field `", "` to be present.",
            "The field `", True,
            "` is missing or empty in this resource. Add a value to "
            "satisfy the requirement.", CONF_HIGH)
    if t == "FIXEDVALUE":
        expected = params.get("value")
        how = "Update the field to match the expected value."
        if expected is not None:
            how = f"Expected value: {expected}\n{how}"
        return RuleTemplate(
            "This rule enforces a fixed value for `",
            "` to ensure consistent data.", how, confidence=CONF_HIGH)
    if t == "ALLOWEDVALUES":
        values = params.get("values") or ()
        if values:
            how = ("Choose one of the permitted values:\n"
                   + "\n".join(f"  - {v}" for v in values))
        else:
            how = "Choose one of the permitted values defined in the rule."
        return RuleTemplate(
            "This rule restricts `",
            "` to a predefined set of allowed values.", how,
            confidence=CONF_HIGH)
    if t in ("REGEX", "PATTERN"):
        pattern = params.get("pattern")
        how = "The value does not match the required format."
        if pattern is not None:
            how = f"{how}\nExpected pattern: {pattern}"
        return RuleTemplate("This rule validates the format of `", "`.",
                            how, confidence=CONF_MEDIUM)
    if t in ("ARRAYLENGTH", "CARDINALITY", "ARRAYSIZE"):
        lo, hi = params.get("min"), params.get("max")
        if lo is not None and hi is not None:
            bound = f"Allowed range: {lo} to {hi}\n"
        elif lo is not None:
            bound = f"Minimum required: {lo}\n"
        elif hi is not None:
            bound = f"Maximum allowed: {hi}\n"
        else:
            bound = ""
        return RuleTemplate(
            "This rule enforces how many items `", "` may contain.",
            f"{bound}Adjust the number of items to meet this requirement.",
            confidence=CONF_HIGH)
    if t in ("CODESYSTEM", "VALUESET"):
        system = params.get("system")
        how = "Verify that `coding.system` and `coding.code` are valid."
        if system is not None:
            how = f"Expected code system: {system}\n{how}"
        return RuleTemplate(
            "This rule ensures `", "` uses codes from the correct code "
            "system.", how, confidence=CONF_MEDIUM)
    if t in ("CUSTOMFHIRPATH", "FHIRPATH", "CUSTOMPREDICATE"):
        return RuleTemplate(
            "This rule validates a project-specific condition involving `",
            "`.",
            "The condition defined for this rule is not satisfied. Review "
            "the related data and ensure the condition is met.",
            confidence=CONF_LOW)
    # fallback (:180-186): unknown rule type, no How
    return RuleTemplate("This rule validates '",
                        "' according to project-specific requirements.",
                        None, confidence=CONF_MEDIUM)


_FALLBACK = RuleTemplate("This rule validates '",
                         "' according to project-specific requirements.",
                         None, confidence=CONF_MEDIUM)


def _template_arrays(profile_obj: dict[str, Any]):
    """Per-rule template columns + a trailing fallback slot for unknown
    rule ids."""
    rules = list(profile_obj.get("rules", ()) or ())
    temps = [rule_template(r) for r in rules] + [_FALLBACK]
    ids = [r["id"] for r in rules]
    return (
        pa.array(ids, pa.string()),
        pa.array([t.what_pre for t in temps], pa.string()),
        pa.array([t.what_suf for t in temps], pa.string()),
        pa.array([bool(t.what_uses_path) for t in temps], pa.bool_()),
        pa.array([t.how_pre for t in temps], pa.string()),
        pa.array([bool(t.how_uses_path) for t in temps], pa.bool_()),
        pa.array([t.how_suf for t in temps], pa.string()),
        pa.array([t.confidence for t in temps], pa.string()),
    )


def explain_violations(violations, profile_obj: dict[str, Any]):
    """Enrich a violations Dataset with ``explain_what`` / ``explain_how``
    / ``explain_confidence`` columns (``UnifiedErrorModelBuilder`` attaches
    the same triple as ``Explanation``).

    Stateless Arrow map: project-rule rows join the per-rule template table
    through their ``rule_id`` (dictionary-sized ``index_in`` probe, unknown
    ids take the fallback slot); STRUCTURE / LINT / SPEC_HINT / Reference
    rows take their source-level templates, with the per-row ``path``
    interpolated where the reference template does."""
    ids, wpre, wsuf, wup, hpre, hup, hsuf, conf = _template_arrays(profile_obj)
    fallback_idx = len(ids)

    def enrich(t: pa.Table) -> pa.Table:
        n = t.num_rows
        path = pc.coalesce(t["path"], pa.scalar("this location"))
        idx = pc.index_in(t["rule_id"], value_set=ids)
        idx = pc.fill_null(idx, fallback_idx)
        r_wpre, r_wsuf = pc.take(wpre, idx), pc.take(wsuf, idx)
        r_hpre, r_hsuf = pc.take(hpre, idx), pc.take(hsuf, idx)
        r_hup, r_wup = pc.take(hup, idx), pc.take(wup, idx)
        what = pc.binary_join_element_wise(
            r_wpre, pc.if_else(r_wup, path, pa.scalar("")), r_wsuf, "")
        how = pc.binary_join_element_wise(
            r_hpre, pc.if_else(r_hup, path, pa.scalar("")), r_hsuf, "")
        confidence = pc.take(conf, idx)

        src = t["source"]
        code = t["error_code"]
        # reference-integrity templates by error code (:70-105)
        m_ref = pc.equal(src, "Reference")
        m_nf = pc.and_(m_ref, pc.equal(code, "REFERENCE_NOT_FOUND"))
        m_tm = pc.and_(m_ref, pc.equal(code, "REFERENCE_TYPE_MISMATCH"))
        m_rf = pc.and_(m_ref, pc.invert(pc.or_(
            pc.equal(code, "REFERENCE_NOT_FOUND"),
            pc.equal(code, "REFERENCE_TYPE_MISMATCH"))))
        nf_what = pc.binary_join_element_wise(
            pa.array([REF_NOT_FOUND_WHAT[0]] * n, type=pa.string()), path,
            pa.array([REF_NOT_FOUND_WHAT[1]] * n, type=pa.string()), "")
        what = pc.if_else(m_nf, nf_what, what)
        how = pc.if_else(m_nf, pa.scalar(REF_NOT_FOUND_HOW), how)
        what = pc.if_else(m_tm, pa.scalar(REF_TYPE_WHAT), what)
        how = pc.if_else(m_tm, pa.scalar(REF_TYPE_HOW), how)
        what = pc.if_else(m_rf, pa.scalar(REF_FALLBACK_WHAT), what)
        how = pc.if_else(m_rf, pa.scalar(REF_FALLBACK_HOW), how)
        confidence = pc.if_else(m_ref, pa.scalar(CONF_HIGH), confidence)
        # structural + advisory layers (static, :27-67)
        m_st = pc.equal(src, "STRUCTURE")
        what = pc.if_else(m_st, pa.scalar(STRUCTURAL_WHAT), what)
        how = pc.if_else(m_st, pa.scalar(STRUCTURAL_HOW), how)
        confidence = pc.if_else(m_st, pa.scalar(CONF_HIGH), confidence)
        m_adv = pc.or_(pc.equal(src, "LINT"), pc.equal(src, "SPEC_HINT"))
        what = pc.if_else(m_adv, pa.scalar(ADVISORY_WHAT), what)
        how = pc.if_else(m_adv, pa.scalar(ADVISORY_HOW), how)
        confidence = pc.if_else(m_adv, pa.scalar(CONF_LOW), confidence)
        return t.append_column("explain_what", what) \
                .append_column("explain_how", how) \
                .append_column("explain_confidence", confidence)

    return violations.map_batches(enrich, batch_format="pyarrow")


# --------------------------------------------------- smart-path navigation
# The reference DEPRECATED backend breadcrumbs (``Models/NavigationInfo.cs``:
# "Frontend derives breadcrumbs from ValidationError.Path ... no longer
# populated. Removal target: Q1 2026"), so the LIVE breadcrumb surface is
# the frontend formatter (``frontend/src/utils/smartPathFormatting.ts``).
# This is its data-native port: scalar helpers (used by the oracle-SQL
# generator and unit tests) plus a vectorized Arrow enrichment over the
# violations stream, string-identical by construction.
#
# Path-vocabulary contracts shared with the oracle (both sides are RE2
# GlobalReplace, pinned by tests):
#  - json_pointer segments are never CONSECUTIVE numerics and never empty
#    (the sink emits "/spans/<n>/<field>" or "" — ``kernels.py:109``);
#  - the resourceType used for scoping is the FIRST '.'-segment of the
#    path (the sink always emits "kind.field"; the frontend receives the
#    same value via ``error.resourceType``);
#  - path segments are non-empty (no "a..b").

import re as _re

BREADCRUMB_SEP = " ▸ "  # renderBreadcrumb's default "▸" separator

_WHERE_RE = _re.compile(r"\.where\([^)]+\)")
_STAR_IDX_RE = _re.compile(r"\[\*\]")
_PTR_IDX_RE = _re.compile(r"/([0-9]+)/")
_PTR_NUM_SEG_RE = _re.compile(r"/[0-9]+/")


def _structural_path(path: str) -> str:
    """Strip ALL where() clauses, then fix a duplicated resource-type
    prefix ("Patient.Patient.gender" -> "Patient.gender") —
    ``formatSmartPath`` phase-6 semantics."""
    sp = _WHERE_RE.sub("", path or "")
    k = sp.split(".", 1)[0]
    dup = f"{k}.{k}"
    if k and (sp == dup or sp.startswith(dup + ".") or sp.startswith(dup + "[")):
        sp = sp[len(k) + 1:]
    return sp


def format_breadcrumb(path: str) -> str:
    """Structural breadcrumb string: where() clauses and "[*]" wildcards
    stripped, segments joined by " ▸ " (``formatSmartPath`` +
    ``renderBreadcrumb``; a "[n]" index stays on its segment)."""
    if not path or path == "Unknown":
        return "Unknown"
    return _STAR_IDX_RE.sub("", _structural_path(path)).replace(".", BREADCRUMB_SEP)


def scoped_path(path: str) -> str:
    """Structural path with the resource-type prefix removed
    (``FormattedPath.scopedPath``)."""
    if not path or path == "Unknown":
        return "Unknown"
    sp = _structural_path(path)
    k = sp.split(".", 1)[0]
    return sp[len(k) + 1:] if k and sp.startswith(k + ".") else sp


def pointer_full_path(ptr: str) -> str:
    """JSON pointer -> dot notation with array indices
    ("/spans/3/text" -> "spans[3].text") — ``extractFullJsonPath``."""
    t = _PTR_IDX_RE.sub(r"[\1]/", (ptr or "") + "/")
    return t.strip("/").replace("/", ".")


def pointer_jsonpath(ptr: str) -> str:
    """JSON pointer -> JSONPath ("$" rooted) — ``convertToJsonPath``."""
    full = pointer_full_path(ptr)
    return "$" if not full else "$." + full


def pointer_fhirpath_style(ptr: str) -> str:
    """JSON pointer -> FHIRPath-style display (numeric segments dropped:
    "/spans/3/text" -> "spans.text") — ``jsonPointerToFhirPathStyle``."""
    t = _PTR_NUM_SEG_RE.sub("/", (ptr or "") + "/")
    return t.strip("/").replace("/", ".")


def navigate_violations(violations):
    """Enrich a violations Dataset with the five navigation columns the
    playground UI derives per error: ``nav_breadcrumb``,
    ``nav_scoped_path``, ``nav_full_json_path``, ``nav_json_path``,
    ``nav_pointer_path``.

    Stateless Arrow map — every transform is a shared-dialect RE2 regex or
    a string kernel; the duplicate-prefix fix and resource scoping loop
    over the batch's DISTINCT first segments (span kinds — low
    cardinality), one vectorized pass each. Property-tested equal to the
    scalar ports above."""

    def enrich(t: pa.Table) -> pa.Table:
        path = pc.fill_null(t["path"], "")
        ptr = pc.fill_null(t["json_pointer"], "")
        sp0 = pc.replace_substring_regex(
            path, pattern=r"\.where\([^)]+\)", replacement="")
        first0 = pc.list_element(pc.split_pattern(sp0, "."), 0)
        sp = sp0
        for k in pc.unique(first0).to_pylist():
            if not k:
                continue
            dup = f"{k}.{k}"
            m = pc.or_(pc.or_(pc.starts_with(sp0, pattern=dup + "."),
                              pc.starts_with(sp0, pattern=dup + "[")),
                       pc.equal(sp0, dup))
            sp = pc.if_else(m, pc.utf8_slice_codeunits(sp0, start=len(k) + 1), sp)
        m_unk = pc.or_(pc.equal(path, ""), pc.equal(path, "Unknown"))
        crumb = pc.replace_substring(
            pc.replace_substring_regex(sp, pattern=r"\[\*\]", replacement=""),
            pattern=".", replacement=BREADCRUMB_SEP)
        crumb = pc.if_else(m_unk, pa.scalar("Unknown"), crumb)
        first1 = pc.list_element(pc.split_pattern(sp, "."), 0)
        scoped = sp
        for k in pc.unique(first1).to_pylist():
            if not k:
                continue
            m = pc.starts_with(sp, pattern=k + ".")
            scoped = pc.if_else(m, pc.utf8_slice_codeunits(sp, start=len(k) + 1), scoped)
        scoped = pc.if_else(m_unk, pa.scalar("Unknown"), scoped)
        t1 = pc.binary_join_element_wise(ptr, "/", "")
        full = pc.replace_substring(
            pc.utf8_trim(pc.replace_substring_regex(
                t1, pattern=r"/([0-9]+)/", replacement=r"[\1]/"),
                characters="/"),
            pattern="/", replacement=".")
        jsonpath = pc.if_else(
            pc.equal(full, ""), pa.scalar("$"),
            pc.binary_join_element_wise("$.", full, ""))
        pstyle = pc.replace_substring(
            pc.utf8_trim(pc.replace_substring_regex(
                t1, pattern=r"/[0-9]+/", replacement="/"),
                characters="/"),
            pattern="/", replacement=".")
        return (t.append_column("nav_breadcrumb", crumb)
                 .append_column("nav_scoped_path", scoped)
                 .append_column("nav_full_json_path", full)
                 .append_column("nav_json_path", jsonpath)
                 .append_column("nav_pointer_path", pstyle))

    return violations.map_batches(enrich, batch_format="pyarrow")


# ----------------------------------------------------- message token resolver
# ``Services/MessageTokenResolver.cs:16-141`` — custom rule-message templates
# rendered from rule metadata (+ optional runtime context). Ported exactly,
# including two behavioral quirks the reference ships: (1) ReplaceToken
# substitutes the single-brace form FIRST, so a double-braced "{{token}}"
# degrades to "{value}"; (2) the final cleanup regex strips EVERY remaining
# "{...}" — together a double-braced token renders as empty unless its value
# contains no braces-free remainder. Tests pin both.
import re as _re

_UNRESOLVED_RE = _re.compile(r"\{\{?[^}]+\}\}?")


def _replace_token(template: str, name: str, value: str) -> str:
    template = template.replace("{%s}" % name, value)
    return template.replace("{{%s}}" % name, value)


def resolve_message_tokens(template: str | None, rule: dict,
                           runtime_context: dict | None = None) -> str | None:
    """Resolve all tokens in a rule's custom message template."""
    if not template:
        return template
    resolved = template
    field_path = str(rule.get("fieldPath", "") or "")
    kind = str(rule.get("kind", rule.get("resourceType", "")) or "")
    full_path = f"{kind}.{field_path}" if field_path else kind
    resolved = _replace_token(resolved, "resource", kind)
    resolved = _replace_token(resolved, "path", field_path)
    resolved = _replace_token(resolved, "fieldPath", field_path)
    resolved = _replace_token(resolved, "fullPath", full_path)
    resolved = _replace_token(resolved, "ruleType", str(rule.get("type", "") or ""))
    resolved = _replace_token(resolved, "severity", str(rule.get("severity", "") or ""))
    params = rule.get("params") or {}
    if "value" in params:
        resolved = _replace_token(resolved, "expected", str(params["value"] or ""))
    for key in ("values", "codes"):
        vals = params.get(key)
        if vals:
            allowed = ", ".join(f'"{v}"' for v in vals)
            resolved = _replace_token(resolved, "allowed", allowed)
            resolved = _replace_token(resolved, "count", str(len(vals)))
    if "pattern" in params:
        resolved = _replace_token(resolved, "pattern", str(params["pattern"] or ""))
    if "min" in params:
        resolved = _replace_token(resolved, "min", str(params["min"] or ""))
    if "max" in params:
        resolved = _replace_token(resolved, "max", str(params["max"] or ""))
    if "system" in params:
        system = str(params["system"] or "")
        resolved = _replace_token(resolved, "system",
                                  system.split("/")[-1] or system)
    if "code" in params:
        resolved = _replace_token(resolved, "code", str(params["code"] or ""))
    if "display" in params:
        resolved = _replace_token(resolved, "display", str(params["display"] or ""))
    for key in ("expression", "expr"):
        if key in params:
            resolved = _replace_token(resolved, "expression",
                                      str(params[key] or ""))
    if runtime_context:
        for tok in ("actual", "result"):
            if tok in runtime_context:
                resolved = _replace_token(resolved, tok,
                                          str(runtime_context[tok] or ""))
    return _UNRESOLVED_RE.sub("", resolved)


# ----------------------------------------------------- value excerpts
EXCERPT_LEN = 40
EXCERPT_ELLIPSIS = "…"


def excerpt_violations(violations, docs, *, num_buckets: int = 64,
                       batch_size: int | None = None):
    """Attach a bounded preview of the offending span's text to every
    violation row — the "show the actual value" surface the reference
    carries per error (``RuleEngines/FhirPathRuleEngine.cs:450-516`` puts
    ``node.Text`` in ``Constraints["actual"]``;
    ``Validation/JsonNodeStructuralValidator.cs:525`` bounds displayed
    value lists the same way). Excerpt = the span text verbatim when <=
    ``EXCERPT_LEN`` chars, else its first ``EXCERPT_LEN`` chars +
    ``EXCERPT_ELLIPSIS``; null for doc-level rows (null span_index) and
    null-text spans.

    Returns Dataset[doc_id, span_index, error_code, severity, excerpt].

    Scale shape: one role-tagged bucketed exchange keyed by the exact
    composite string ``doc_id || '#' || span_index`` (bucket routing by
    FNV, equality on the STRINGS inside the group fold — collisions cannot
    cross-attach); the span side is pre-trimmed to the excerpt length in
    the producing map, so full text never ships; doc-level violation rows
    pass through the exchange already resolved."""
    import numpy as np

    from .functions.flatten import flatten_batch
    from .functions.hashing import hash_str

    R_SPAN, R_NEED, R_DONE = 0, 1, 2
    empty = pa.table({
        "bucket": pa.array([], pa.int32()),
        "role": pa.array([], pa.int8()),
        "key": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.string()),
        "span_index": pa.array([], pa.int64()),
        "error_code": pa.array([], pa.string()),
        "severity": pa.array([], pa.string()),
        "excerpt": pa.array([], pa.string()),
    })

    def _buckets(keys: pa.Array) -> pa.Array:
        ks = keys.to_numpy(zero_copy_only=False).astype("U")
        return pa.array((hash_str(ks) % np.uint64(num_buckets))
                        .astype(np.int32))

    def span_rows(t: pa.Table) -> pa.Table:
        fs = flatten_batch(t)
        ok = pc.is_valid(fs.text).to_numpy(zero_copy_only=False)
        if not ok.any():
            return empty
        idx = np.flatnonzero(ok)
        sel = pa.array(idx)
        text = fs.text.take(sel)
        short = pc.less_equal(pc.utf8_length(text), EXCERPT_LEN)
        trimmed = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(text, 0, EXCERPT_LEN),
            EXCERPT_ELLIPSIS, "")
        excerpt = pc.if_else(short, text, trimmed)
        ids = pa.array(fs.doc_id_at(fs.parent[idx]))
        sidx = fs.span_index[idx].astype(np.int64)
        key = pc.binary_join_element_wise(
            ids, pa.array(sidx.astype("U")), "#")
        n = len(idx)
        return pa.table({
            "bucket": _buckets(key),
            "role": pa.array(np.zeros(n, dtype=np.int8)),
            "key": key,
            "doc_id": pa.array([None] * n, pa.string()),
            "span_index": pa.array(sidx),
            "error_code": pa.array([None] * n, pa.string()),
            "severity": pa.array([None] * n, pa.string()),
            "excerpt": excerpt.cast(pa.string()),
        })

    def violation_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        si = t["span_index"]
        if isinstance(si, pa.ChunkedArray):
            si = si.combine_chunks()
        si64 = si.cast(pa.int64())
        has_span = pc.is_valid(si64).to_numpy(zero_copy_only=False)
        sidx = np.asarray(pc.fill_null(si64, -1))
        key = pc.binary_join_element_wise(
            ids.cast(pa.string()), pa.array(sidx.astype("U")), "#")
        role = np.where(has_span, R_NEED, R_DONE).astype(np.int8)
        return pa.table({
            "bucket": _buckets(key),
            "role": pa.array(role),
            "key": key,
            "doc_id": ids.cast(pa.string()),
            "span_index": si64,
            "error_code": t["error_code"],
            "severity": t["severity"],
            "excerpt": pa.array([None] * t.num_rows, pa.string()),
        })

    def attach(g: pa.Table) -> pa.Table:
        role = np.asarray(g["role"])
        out_cols = ["doc_id", "span_index", "error_code", "severity",
                    "excerpt"]
        done = g.filter(pa.array(role == R_DONE)).select(out_cols)
        need = g.filter(pa.array(role == R_NEED))
        if need.num_rows == 0:
            return done
        spans = g.filter(pa.array(role == R_SPAN))
        sk = spans["key"]
        if isinstance(sk, pa.ChunkedArray):
            sk = sk.combine_chunks()
        nk = need["key"]
        if isinstance(nk, pa.ChunkedArray):
            nk = nk.combine_chunks()
        pos = pc.index_in(nk, value_set=sk)
        ex = spans["excerpt"]
        if isinstance(ex, pa.ChunkedArray):
            ex = ex.combine_chunks()
        # null pos (no span row: null-text span) -> null excerpt
        got = ex.take(pos) if spans.num_rows else pa.array(
            [None] * need.num_rows, pa.string())
        resolved = pa.table({
            "doc_id": need["doc_id"],
            "span_index": need["span_index"],
            "error_code": need["error_code"],
            "severity": need["severity"],
            "excerpt": got,
        })
        return pa.concat_tables([done, resolved])

    tagged = (
        violations.map_batches(violation_rows, batch_format="pyarrow",
                               batch_size=batch_size)
        .union(docs.map_batches(span_rows, batch_format="pyarrow",
                                batch_size=batch_size))
    )
    return (tagged.groupby("bucket")
            .map_groups(attach, batch_format="pyarrow"))
