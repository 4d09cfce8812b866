"""Vectorized rule kernels — one pass over a flattened Arrow batch.

Each reference rule engine becomes a pure function ``(CompiledRule, FlatSpans,
ViolationSink) -> None`` evaluating a numpy/Arrow boolean mask over the flat
span arrays. Reference semantics per kernel are cited inline
(``RuleEngines/FhirPathRuleEngine.cs`` unless noted).

Error-isolation contract: a kernel that raises is caught by the caller and
converted to a single RULE_EXECUTION_ERROR row per batch — the pipeline never
crashes on one bad rule (reference ``Core/ValidationPipeline.cs:290-294``,
``FhirPathRuleEngine.cs:941-966``).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import errors as E
from ..profile import Condition, Profile, RuleDef, SpanRequirement
from .flatten import FlatSpans, first_per_doc_mask

# FHIR id grammar (``JsonNodeStructuralValidator.cs:100-101``)
ID_GRAMMAR = r"^[A-Za-z0-9.\-]{1,64}$"
_ID_RE = re.compile(ID_GRAMMAR)

# reference grammar (``JsonNodeStructuralValidator.cs:943-1015``): a nonempty
# media_ref must be an urn (no whitespace) or a local "<Kind>/<doc>.<offset>"
REF_GRAMMAR = r"^(urn:[^ ]+|[A-Za-z]+/.+\.[0-9]+)$"

# media_ref shapes (``ReferenceResolver.cs:48-76``): local = "<Kind>/<doc_id>.<offset>",
# external = anything else (canonically "urn:uuid:<id>").
LOCAL_REF_RE = re.compile(r"^([A-Za-z]+)/(.+)\.([0-9]+)$")

# Registered Python-lane predicates (the CustomFHIRPath escape hatch,
# ``RuleEngines/FhirPathRuleEngine.cs:1714-1768``): name -> fn(FlatSpans,
# idx ndarray) -> bool ndarray (True = passes).
PREDICATE_REGISTRY: dict[str, Callable[[FlatSpans, np.ndarray], np.ndarray]] = {}


def register_predicate(name: str, fn: Callable[[FlatSpans, np.ndarray], np.ndarray]) -> None:
    PREDICATE_REGISTRY[name] = fn


def _canon_details(d: dict[str, Any]) -> str:
    """Canonical JSON details (``Models/RuleValidationError.cs:36-52``
    canonical-schema contract)."""
    return json.dumps(d, sort_keys=True, separators=(",", ":"), default=str)


def _canon_per_value(vals, make) -> list[str]:
    """``_canon_details`` once per DISTINCT varying value, gathered per row.
    The per-row dict build + json.dumps was 33% of measured validate_batch
    time, and real corpora repeat offending values heavily (status codes,
    cycling bad ids); byte-identical output to the per-row dumps."""
    memo: dict[Any, str] = {}
    out = []
    for v in vals:
        s = memo.get(v)
        if s is None:
            s = memo[v] = _canon_details(make(v))
        out.append(s)
    return out


# --------------------------------------------------------------------- sink
def _const_str_array(value: str, n: int) -> pa.Array:
    """Length-n constant string array built in C++ (one take over a 1-element
    dictionary) — avoids allocating n Python strings."""
    return pa.array([value], type=pa.string()).take(np.zeros(n, dtype=np.int32))


class ViolationSink:
    """Accumulates violation rows; ``finalize`` emits one Arrow table in
    pipeline-stage order (``docs/05_validation_pipeline.md:20-31``).

    Everything stays in Arrow buffers: doc_id/path/json_pointer columns are
    built with ``pc.take`` / ``pc.binary_join_element_wise`` (vectorized C++),
    never per-row Python formatting — at ~1 violation/document the sink is a
    hot path and Python-object churn here was the dominant multi-core
    contention source."""

    def __init__(self, emit_details: bool = True):
        self.emit_details = emit_details
        self._parts: list[dict[str, Any]] = []

    def add_spans(
        self,
        fs: FlatSpans,
        flat_idx: np.ndarray,
        *,
        source: str,
        severity: str,
        rule_id: str,
        error_code: str,
        pointer_field: str,
        details: list[str] | None = None,
    ) -> None:
        if flat_idx.size == 0:
            return
        si = fs.span_index[flat_idx].astype(np.int32)
        si_str = pc.cast(pa.array(si), pa.string())
        json_pointer = pc.binary_join_element_wise(
            "/spans/", si_str, "/" + pointer_field, ""
        )
        path = pc.binary_join_element_wise(
            pc.take(fs.kind, pa.array(flat_idx)), pointer_field, "."
        )
        self._parts.append(
            {
                "doc_id": pc.take(fs.doc_ids, pa.array(fs.parent[flat_idx])),
                "span_index": si,
                "source": source,
                "severity": severity,
                "rule_id": rule_id,
                "error_code": error_code,
                "path": path,
                "json_pointer": json_pointer,
                "details": details if (details and self.emit_details) else None,
            }
        )

    def add_docs(
        self,
        fs: FlatSpans,
        doc_idx: np.ndarray,
        *,
        source: str,
        severity: str,
        rule_id: str,
        error_code: str,
        path: str,
        details: list[str] | None = None,
    ) -> None:
        if doc_idx.size == 0:
            return
        n = doc_idx.size
        self._parts.append(
            {
                "doc_id": pc.take(fs.doc_ids, pa.array(doc_idx)),
                "span_index": np.full(n, -1, dtype=np.int32),
                "source": source,
                "severity": severity,
                "rule_id": rule_id,
                "error_code": error_code,
                "path": path,
                "json_pointer": "",
                "details": details if (details and self.emit_details) else None,
            }
        )

    def finalize(self, dedup_structure: bool = True) -> pa.Table:
        if not self._parts:
            return E.empty_violations()
        cols: dict[str, list[pa.Array]] = {name: [] for name in E.VIOLATIONS_SCHEMA.names}
        for p in self._parts:
            n = len(p["doc_id"])
            cols["doc_id"].append(p["doc_id"])
            cols["span_index"].append(pa.array(p["span_index"]))
            for k in ("source", "severity", "rule_id", "error_code"):
                cols[k].append(_const_str_array(p[k], n))
            for k in ("path", "json_pointer"):
                v = p[k]
                cols[k].append(v if isinstance(v, pa.Array) else _const_str_array(v, n))
            d = p["details"]
            cols["details"].append(
                pa.array(d, type=pa.string()) if d is not None else _const_str_array("", n)
            )
        t = pa.table(
            {
                "doc_id": pa.concat_arrays([a.cast(pa.string()) for a in cols["doc_id"]]),
                "span_index": pa.concat_arrays(cols["span_index"]).cast(pa.int32()),
                "source": pa.concat_arrays(cols["source"]),
                "severity": pa.concat_arrays(cols["severity"]),
                "rule_id": pa.concat_arrays(cols["rule_id"]),
                "error_code": pa.concat_arrays(cols["error_code"]),
                "path": pa.concat_arrays(cols["path"]),
                "json_pointer": pa.concat_arrays(cols["json_pointer"]),
                "details": pa.concat_arrays(cols["details"]),
            },
            schema=E.VIOLATIONS_SCHEMA,
        )

        if dedup_structure:
            # parts are homogeneous in (source, error_code); collision is only
            # possible when a STRUCTURE part and a non-STRUCTURE part share an
            # error code — in the common case the code sets are disjoint and
            # the quadratic-ish key build is skipped entirely.
            struct_codes = {p["error_code"] for p in self._parts if p["source"] == E.SRC_STRUCTURE}
            other_codes = {p["error_code"] for p in self._parts if p["source"] != E.SRC_STRUCTURE}
            if struct_codes & other_codes:
                t = _dedup_structure_priority(t)
        return t


def _dedup_structure_priority(t: pa.Table) -> pa.Table:
    """Suppress non-STRUCTURE rows whose ``(doc_id, error_code, json_pointer)``
    key is already claimed by a STRUCTURE row — STRUCTURE wins
    (``Core/ValidationPipeline.cs:783-827``). Rows with an empty pointer are
    kept (reference keeps errors missing either key)."""
    src = t["source"]
    is_struct = pc.equal(src, E.SRC_STRUCTURE).to_numpy(zero_copy_only=False)
    if not is_struct.any() or is_struct.all():
        return t
    ptr = t["json_pointer"]
    has_ptr = pc.not_equal(ptr, "").fill_null(False).to_numpy(zero_copy_only=False)
    keys = pc.binary_join_element_wise(
        t["doc_id"].combine_chunks(), t["error_code"].combine_chunks(),
        ptr.combine_chunks(), "\x00"
    ).to_numpy(zero_copy_only=False)
    struct_keys = keys[is_struct & has_ptr]
    drop = (~is_struct) & has_ptr & np.isin(keys, struct_keys)
    if not drop.any():
        return t
    return t.filter(pa.array(~drop))


# ---------------------------------------------------------------- conditions
def eval_condition(cond: Condition, fs: FlatSpans,
                   idx: np.ndarray | None = None) -> np.ndarray:
    """Boolean mask; nulls compare as non-matching. With ``idx`` the kernel
    evaluates ONLY those candidate positions (returns a mask aligned to
    ``idx``) — candidate-first evaluation for sparse selections."""
    if cond.fld == "offset":
        arr = fs.offset if idx is None else pc.take(fs.offset, pa.array(idx))
        if cond.op == "==":
            m = pc.equal(arr, cond.value)
        elif cond.op == "!=":
            m = pc.not_equal(arr, cond.value)
        else:
            raise ValueError(f"offset supports ==/!= only, got {cond.op}")
        return m.fill_null(False).to_numpy(zero_copy_only=False)

    arr = {"kind": fs.kind, "text": fs.text, "media_ref": fs.media_ref}[cond.fld]
    if idx is not None:
        arr = pc.take(arr, pa.array(idx))
    if cond.op == "==":
        m = pc.equal(arr, cond.value)
    elif cond.op == "!=":
        m = pc.not_equal(arr, cond.value)
    elif cond.op == "contains":
        m = pc.match_substring(arr, cond.value)
    elif cond.op == "startswith":
        m = pc.starts_with(arr, cond.value)
    elif cond.op == "matches":
        m = pc.match_substring_regex(arr, cond.value)
    elif cond.op == "in":
        m = pc.is_in(arr, value_set=pa.array(cond.value, type=pa.string()))
    else:
        raise ValueError(f"unknown op {cond.op}")
    return m.fill_null(False).to_numpy(zero_copy_only=False)


def eval_expr(node: Any, fs: FlatSpans, idx: np.ndarray | None = None) -> np.ndarray:
    """Vectorized evaluation of a CustomPredicate expression AST
    (``profile.parse_expr``) over the flat span arrays — the fast lane for
    the reference's common boolean FHIRPath sub-language
    (``FhirPathRuleEngine.cs:1714-1768``). Two-valued null semantics: a
    comparison on a null value is False, ``not`` inverts that, and
    ``exists(f)`` is the Required-rule notion of presence (non-null,
    non-whitespace). With ``idx`` the mask aligns to those candidate
    positions only (candidate-first evaluation)."""
    from ..profile import ExprAnd, ExprExists, ExprLeaf, ExprNot, ExprOr

    if isinstance(node, ExprAnd):
        out = eval_expr(node.children[0], fs, idx)
        for child in node.children[1:]:
            if not out.any():
                break
            out &= eval_expr(child, fs, idx)
        return out
    if isinstance(node, ExprOr):
        out = eval_expr(node.children[0], fs, idx)
        for child in node.children[1:]:
            if out.all():
                break
            out |= eval_expr(child, fs, idx)
        return out
    if isinstance(node, ExprNot):
        return ~eval_expr(node.child, fs, idx)
    if isinstance(node, ExprExists):
        present = ~fs.empty_mask(node.fld)
        return present[idx] if idx is not None else present
    if isinstance(node, ExprLeaf):
        return eval_condition(node.cond, fs, idx)
    raise TypeError(f"not an expression node: {type(node).__name__}")


def selection_mask(rule: RuleDef, fs: FlatSpans) -> np.ndarray:
    """Instance selection (``Services/ResourceSelector.cs:36-64``): kind match,
    then scope. Filter-evaluation failures FAIL OPEN — the span is validated
    anyway (``FhirPathRuleEngine.cs:2409-2415``). Filter conditions evaluate
    candidate-first over the surviving index set, narrowing as they go."""
    if rule.kind == "*":
        mask = np.ones(fs.n_spans, dtype=bool)
    else:
        mask = fs.kind_mask(rule.kind).copy()
    sc = rule.scope
    if sc.kind == "first":
        mask = first_per_doc_mask(mask, fs.parent)
    elif sc.kind == "filter":
        idx = np.flatnonzero(mask)
        for cond in sc.conditions:
            if idx.size == 0:
                break
            try:
                idx = idx[eval_condition(cond, fs, idx)]
            except Exception:
                pass  # fail-open: validate anyway
        mask = np.zeros(fs.n_spans, dtype=bool)
        mask[idx] = True
    return mask


def _field_array(fs: FlatSpans, fp: str) -> pa.Array:
    return {"kind": fs.kind, "text": fs.text, "media_ref": fs.media_ref, "offset": fs.offset}[fp]


# ------------------------------------------------------------- rule kernels
def k_required(rule: RuleDef, fs: FlatSpans, sel: np.ndarray, sink: ViolationSink) -> None:
    """Required: value must be present and non-whitespace
    (``FhirPathRuleEngine.cs:971-1033``)."""
    arr = _field_array(fs, rule.field_path)
    bad = sel & fs.empty_mask(rule.field_path)
    idx = np.flatnonzero(bad)
    sink.add_spans(
        fs, idx,
        source=E.SRC_BUSINESS,
        severity=E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint),
        rule_id=rule.id, error_code=rule.error_code or E.REQUIRED_FIELD_MISSING,
        pointer_field=rule.field_path,
        details=([_canon_details({"field": rule.field_path})] * idx.size) if sink.emit_details else None,
    )


def k_fixed_value(rule: RuleDef, fs: FlatSpans, sel: np.ndarray, sink: ViolationSink) -> None:
    """FixedValue: every present value must equal params.value
    (``FhirPathRuleEngine.cs:1053-1127``); empty values pass."""
    arr = _field_array(fs, rule.field_path)
    expected = str(rule.params["value"])
    cand = np.flatnonzero(sel & ~fs.empty_mask(rule.field_path))
    if cand.size == 0:
        return
    if cand.size * 2 < fs.n_spans:  # candidate-first on sparse selections
        ne = pc.not_equal(pc.take(arr, pa.array(cand)), expected)
        idx = cand[ne.fill_null(False).to_numpy(zero_copy_only=False)]
    else:
        ne = pc.not_equal(arr, expected).fill_null(False).to_numpy(zero_copy_only=False)
        bad = np.zeros(fs.n_spans, dtype=bool)
        bad[cand] = True
        bad &= ne
        idx = np.flatnonzero(bad)
    vals = pc.take(arr, pa.array(idx)).to_pylist() if idx.size and sink.emit_details else []
    sink.add_spans(
        fs, idx,
        source=E.SRC_BUSINESS,
        severity=E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint),
        rule_id=rule.id, error_code=rule.error_code or E.FIXED_VALUE_MISMATCH,
        pointer_field=rule.field_path,
        details=_canon_per_value(vals, lambda v: {"actual": v, "expected": expected}) if sink.emit_details else None,
    )


def k_allowed_values(rule: RuleDef, fs: FlatSpans, sel: np.ndarray, sink: ViolationSink) -> None:
    """AllowedValues: set membership; empty values pass
    (``FhirPathRuleEngine.cs:1144-1220``)."""
    arr = _field_array(fs, rule.field_path)
    allowed = [str(v) for v in rule.params["values"]]
    allowed_pa = pa.array(allowed, type=pa.string())
    cand = np.flatnonzero(sel & ~fs.empty_mask(rule.field_path))
    if cand.size == 0:
        return
    if cand.size * 2 < fs.n_spans:  # candidate-first on sparse selections
        out = pc.invert(pc.is_in(pc.take(arr, pa.array(cand)), value_set=allowed_pa))
        idx = cand[out.fill_null(False).to_numpy(zero_copy_only=False)]
    else:
        out = pc.invert(pc.is_in(arr, value_set=allowed_pa))
        bad = np.zeros(fs.n_spans, dtype=bool)
        bad[cand] = True
        bad &= out.fill_null(False).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(bad)
    vals = pc.take(arr, pa.array(idx)).to_pylist() if idx.size and sink.emit_details else []
    sink.add_spans(
        fs, idx,
        source=E.SRC_BUSINESS,
        severity=E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint),
        rule_id=rule.id, error_code=rule.error_code or E.VALUE_NOT_ALLOWED,
        pointer_field=rule.field_path,
        details=_canon_per_value(vals, lambda v: {"actual": v, "allowed": allowed}) if sink.emit_details else None,
    )


def k_regex(rule: RuleDef, fs: FlatSpans, sel: np.ndarray, sink: ViolationSink,
            vector_lane: bool = True) -> None:
    """Regex: search semantics (.NET ``IsMatch`` ≈ RE2 ``match_substring_regex``,
    ``FhirPathRuleEngine.cs:1222-1291``); empty values pass. ``vector_lane``
    comes from the compile-time evaluation plan (``build_plan``): patterns
    outside the RE2 subset run the Python ``re`` lane on the selected values
    only — the lane is decided ONCE per profile, not per batch.

    Candidate-first: when the kind selection is sparse (the common case —
    one kind of many), the RE2 pass runs over the TAKEN candidate values
    instead of the whole flat column; rule-rich profiles spend most of their
    kernel time here, so this is the difference between O(rules x spans) and
    O(rules x selected)."""
    arr = _field_array(fs, rule.field_path)
    pattern = rule.params["pattern"]
    nonempty = ~fs.empty_mask(rule.field_path)
    cand = np.flatnonzero(sel & nonempty)
    if cand.size == 0:
        return
    sparse = cand.size * 2 < fs.n_spans
    if vector_lane:
        if sparse:
            miss = pc.invert(
                pc.match_substring_regex(pc.take(arr, pa.array(cand)), pattern)
            ).fill_null(False).to_numpy(zero_copy_only=False)
            idx = cand[miss]
        else:
            miss = pc.invert(pc.match_substring_regex(arr, pattern))
            bad = sel & miss.fill_null(False).to_numpy(zero_copy_only=False) & nonempty
            idx = np.flatnonzero(bad)
    else:  # non-RE2 construct -> Python lane (planner decision)
        rx = re.compile(pattern)
        vals = pc.take(arr, pa.array(cand)).to_pylist() if cand.size else []
        idx = cand[np.array([rx.search(v) is None for v in vals], dtype=bool)] if cand.size else cand
    vals = pc.take(arr, pa.array(idx)).to_pylist() if idx.size and sink.emit_details else []
    sink.add_spans(
        fs, idx,
        source=E.SRC_BUSINESS,
        severity=E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint),
        rule_id=rule.id, error_code=rule.error_code or E.PATTERN_MISMATCH,
        pointer_field=rule.field_path,
        details=_canon_per_value(vals, lambda v: {"actual": v, "pattern": pattern}) if sink.emit_details else None,
    )


def k_array_length(rule: RuleDef, fs: FlatSpans, sel_unused: np.ndarray, sink: ViolationSink) -> None:
    """ArrayLength on ``spans``: per-document span count vs min/max, one error
    per violated bound (``FhirPathRuleEngine.cs:1322-1447``). ``kind`` other
    than "*" restricts the count to spans of that kind."""
    if rule.kind == "*":
        counts = fs.lengths
    else:
        kmask = pc.equal(fs.kind, rule.kind).fill_null(False).to_numpy(zero_copy_only=False)
        counts = np.bincount(fs.parent[kmask], minlength=fs.n_docs)
    lo = rule.params.get("min")
    hi = rule.params.get("max")
    code = rule.error_code or E.ARRAY_LENGTH_OUT_OF_RANGE
    sev = E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint)
    for bound, bad in (
        ("min", np.flatnonzero(counts < lo) if lo is not None else np.empty(0, np.int64)),
        ("max", np.flatnonzero(counts > hi) if hi is not None else np.empty(0, np.int64)),
    ):
        sink.add_docs(
            fs, bad,
            source=E.SRC_BUSINESS, severity=sev, rule_id=rule.id, error_code=code,
            path="spans",
            details=[
                _canon_details({"actual": int(counts[d]), "bound": bound,
                                "limit": lo if bound == "min" else hi})
                for d in bad
            ] if sink.emit_details else None,
        )


def k_code_system(rule: RuleDef, fs: FlatSpans, sel: np.ndarray, sink: ViolationSink,
                  concepts: np.ndarray | None) -> None:
    """CodeSystem: value is ``code`` or ``system|code``. A present system must
    equal params.system (else CODESYSTEM_MISMATCH); the code must be in the
    concept set (else CODE_NOT_IN_VALUESET). Empty values pass.
    (``FhirPathRuleEngine.cs:1467-1698``.)

    ``concepts=None`` means the profile references a code system that is not
    loaded and no terminology fallback resolved it: every selected span gets
    one RULE_CONFIGURATION_ERROR row and the rule otherwise no-ops — the
    runtime degradation of ``FhirPathRuleEngine.cs:1564-1583`` (the profile
    still runs; only this rule is inert)."""
    arr = _field_array(fs, rule.field_path)
    expected_sys = str(rule.params["system"])
    cand = np.flatnonzero(sel & ~fs.empty_mask(rule.field_path))
    if cand.size == 0:
        return
    if concepts is None:
        sink.add_spans(
            fs, cand,
            source=E.SRC_BUSINESS,
            severity=E.SEV_ERROR,
            rule_id=rule.id, error_code=E.RULE_CONFIGURATION_ERROR,
            pointer_field=rule.field_path,
            details=[_canon_details(
                {"ruleType": "CodeSystem", "system": expected_sys,
                 "explanation": "code system not found"}
            )] * cand.size if sink.emit_details else None,
        )
        return
    # parse "system|code" on the dictionary UNIQUES only; the candidate-level
    # verdicts are integer-code lookups into the tiny unique-level arrays
    da = pc.dictionary_encode(pc.take(arr, pa.array(cand)))
    code_of = np.asarray(da.indices).astype(np.int64)
    uvals = da.dictionary.to_numpy(zero_copy_only=False).astype("U")
    # reshape(-1, 3): empty uvals would otherwise be 1-D (r5 probe)
    parts = np.char.partition(uvals, "|").reshape(-1, 3)
    has_sys = parts[:, 1] == "|"
    u_sys_bad = has_sys & (parts[:, 0] != expected_sys)
    ucodes = np.where(has_sys, parts[:, 2], parts[:, 0])
    u_code_bad = ~np.isin(ucodes, concepts) & ~u_sys_bad
    sys_bad = u_sys_bad[code_of]
    code_bad = u_code_bad[code_of]
    sev = E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint)
    idx = cand[sys_bad]
    sink.add_spans(
        fs, idx,
        source=E.SRC_BUSINESS, severity=sev, rule_id=rule.id,
        error_code=E.CODESYSTEM_MISMATCH, pointer_field=rule.field_path,
        details=_canon_per_value(parts[code_of[sys_bad], 0], lambda s: {"actual": s, "expected": expected_sys}) if sink.emit_details else None,
    )
    idx = cand[code_bad]
    sink.add_spans(
        fs, idx,
        source=E.SRC_BUSINESS, severity=sev, rule_id=rule.id,
        error_code=E.CODE_NOT_IN_VALUESET, pointer_field=rule.field_path,
        details=_canon_per_value(ucodes[code_of[code_bad]], lambda c: {"code": c, "system": expected_sys}) if sink.emit_details else None,
    )


def k_custom_predicate(rule: RuleDef, fs: FlatSpans, sel: np.ndarray, sink: ViolationSink) -> None:
    """CustomPredicate: passes iff the expression holds for the span — the
    CustomFHIRPath analogue (``FhirPathRuleEngine.cs:1714-1768``). ``expr``
    (the common boolean sub-language: and / or / not / parentheses /
    exists(field)) runs on the vectorized lane against the AST compiled at
    profile-parse time; ``predicate`` names a registered Python function
    (the dual-lane split of ``RuleEvaluationPlanner.cs:19-146``)."""
    idx_sel = np.flatnonzero(sel)
    if idx_sel.size == 0:
        return
    if rule.params.get("expr"):
        ast = rule.params.get("expr_ast")
        if ast is None:  # direct RuleDef construction (tests) — compile here
            from ..profile import parse_expr

            ast = parse_expr(str(rule.params["expr"]))
        # candidate-first: the AST evaluates only the selected spans
        ok = eval_expr(ast, fs, idx_sel)
        bad_idx = idx_sel[~ok]
    else:
        fn = PREDICATE_REGISTRY[rule.params["predicate"]]
        passes = np.asarray(fn(fs, idx_sel), dtype=bool)
        bad_idx = idx_sel[~passes]
    sink.add_spans(
        fs, bad_idx,
        source=E.SRC_BUSINESS,
        severity=E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint),
        rule_id=rule.id, error_code=rule.error_code or E.CUSTOM_PREDICATE_FAILED,
        pointer_field=rule.field_path,
        details=[_canon_details({"expr": rule.params.get("expr", rule.params.get("predicate"))})] * bad_idx.size,
    )


def k_required_spans(rule: RuleDef, fs: FlatSpans, sink: ViolationSink,
                     kind_codes: np.ndarray, kind_dict: list[str]) -> None:
    """RequiredSpans: per-document composition check
    (``FhirPathRuleEngine.cs:1794-2152``).

    Default (columnar) shape: one violation row per violated requirement per
    document — same information as the reference, flat for SQL oracles.

    ``params.consolidate=True`` reproduces the reference's CONSOLIDATED error
    instead (``FhirPathRuleEngine.cs:1994-2096``): ONE row per violating
    document whose details carry ``expected`` (the declared requirements),
    ``actual`` (per-kind counts with up to 3 example span pointers — the
    reference's ``Take(3)`` example cap) and ``diff`` (``missing`` /
    ``unexpected``). ``rejectUndeclared`` flags span kinds not declared in
    any requirement in both shapes."""
    reqs: list[SpanRequirement] = rule.params["requirements"]
    consolidate = bool(rule.params.get("consolidate"))
    sev = E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint)
    code = rule.error_code or E.RESOURCE_REQUIREMENT_VIOLATION
    declared = set()
    per_req: list[tuple[SpanRequirement, np.ndarray, np.ndarray, np.ndarray]] = []
    src = E.SRC_SPEC_HINT if rule.is_spec_hint else E.SRC_BUSINESS
    for req in reqs:
        declared.add(req.kind)
        mask = kind_codes == (kind_dict.index(req.kind) if req.kind in kind_dict else -1)
        for cond in req.where:
            mask &= eval_condition(cond, fs)
        counts = np.bincount(fs.parent[mask], minlength=fs.n_docs)
        # conditional requirement: gate on >=1 ``when_kind`` span in the doc;
        # ``per_parent`` requires one match per gating span
        # (``SpecHintService.cs:230-300`` EvaluateConditionalHint analogue)
        need: Any = req.min
        if req.when_kind is not None:
            wmask = kind_codes == (
                kind_dict.index(req.when_kind) if req.when_kind in kind_dict else -1
            )
            parent_counts = np.bincount(fs.parent[wmask], minlength=fs.n_docs)
            if req.per_parent:
                need = parent_counts
            bad = counts < need
            if req.max is not None:
                bad |= counts > req.max
            bad &= parent_counts > 0
        else:
            bad = counts < need
            if req.max is not None:
                bad |= counts > req.max
        if consolidate:
            per_req.append((req, mask, counts, bad))
            continue
        doc_idx = np.flatnonzero(bad)
        sink.add_docs(
            fs, doc_idx,
            source=src, severity=sev, rule_id=rule.id, error_code=code,
            path=req.kind,
            details=[
                _canon_details({"kind": req.kind,
                                "expected_min": int(need if np.isscalar(need)
                                                    else need[d]),
                                "expected_max": req.max, "actual": int(counts[d])})
                for d in doc_idx
            ] if sink.emit_details else None,
        )
    undecl_counts = None
    if rule.params.get("rejectUndeclared"):
        undecl = ~np.isin(np.array(kind_dict, dtype=object), list(declared))
        bad_span = undecl[kind_codes]
        undecl_counts = np.bincount(fs.parent[bad_span], minlength=fs.n_docs)
        if not consolidate:
            doc_idx = np.flatnonzero(undecl_counts > 0)
            sink.add_docs(
                fs, doc_idx,
                source=src, severity=sev, rule_id=rule.id, error_code=code,
                path="*",
                details=[_canon_details({"undeclared_count": int(undecl_counts[d])})
                         for d in doc_idx] if sink.emit_details else None,
            )
    if not consolidate:
        return

    # ---- consolidated shape: one row per violating document ----
    viol = np.zeros(fs.n_docs, dtype=bool)
    for _, _, _, bad in per_req:
        viol |= bad
    if undecl_counts is not None:
        viol |= undecl_counts > 0
    doc_idx = np.flatnonzero(viol)
    if doc_idx.size == 0:
        return
    expected = [
        {"kind": r.kind, "min": r.min, "max": r.max} for r, _, _, _ in per_req
    ]
    # per-req flat span positions, doc-ordered (flat arrays are doc-ordered),
    # so a searchsorted range per violating doc yields its first-3 examples
    req_hits = [
        (np.flatnonzero(mask), fs.parent[mask]) for _, mask, _, _ in per_req
    ]
    details = None
    if sink.emit_details:
        details = []
        for d in doc_idx:
            actual, missing = [], []
            for (req, _, counts, bad), (hit_idx, hit_parent) in zip(per_req, req_hits):
                lo = np.searchsorted(hit_parent, d, "left")
                hi = np.searchsorted(hit_parent, d, "right")
                examples = [
                    f"/spans/{int(fs.span_index[i])}"
                    for i in hit_idx[lo:min(hi, lo + 3)]  # reference Take(3)
                ]
                actual.append({"kind": req.kind, "count": int(counts[d]),
                               "examples": examples})
                if bad[d]:
                    missing.append({"kind": req.kind, "expectedMin": req.min,
                                    "expectedMax": req.max,
                                    "actualCount": int(counts[d])})
            diff: dict[str, Any] = {"missing": missing, "unexpected": []}
            if undecl_counts is not None and undecl_counts[d] > 0:
                diff["unexpected"].append({"count": int(undecl_counts[d])})
            details.append(_canon_details(
                {"expected": expected, "actual": actual, "diff": diff}
            ))
    sink.add_docs(
        fs, doc_idx,
        source=src, severity=sev, rule_id=rule.id, error_code=code,
        path="spans", details=details,
    )


def k_reference(rule: RuleDef, fs: FlatSpans, sel: np.ndarray, sink: ViolationSink,
                registry_keys: np.ndarray | None) -> None:
    """Reference resolution (``RuleEngines/ReferenceResolver.cs:22-364``).

    A local ref ``<Kind>/<doc_id>.<offset>`` resolves against the document's
    own span identities (the per-row analogue of BuildResourceLookup,
    ``:48-76``); any other non-empty ref is external and resolves against the
    broadcast registry key set. Policies (``Models/ValidationSettings.cs:10-19``):

    - InBundleOnly      : unresolved local ref OR any external ref -> error
    - AllowExternal     : unresolved (local+registry) -> WARNING (``:111-141``)
    - RequireResolution : unresolved (local+registry) -> error

    A local ref that resolves but whose claimed Kind differs from the target
    span's kind -> REFERENCE_TYPE_MISMATCH (``:313-343``). The reference
    dedups repeated identical refs WITHIN one resource (``:89-103``); a span
    carries exactly one media_ref in this model, so the faithful mapping is
    NO cross-span dedup — each span's ref errors independently (cross-entry
    repeats each get their own error, as in the reference).
    """
    policy = rule.params.get("policy", "InBundleOnly")
    nonempty = ~fs.empty_mask('media_ref')
    cand = np.flatnonzero(sel & nonempty)
    if cand.size == 0:
        return

    # dictionary-encode candidate refs: all string parsing happens ONCE per
    # unique ref (Arrow C++); per-candidate work is integer-code indexing.
    cand_pa = pa.array(cand)
    da = pc.dictionary_encode(pc.take(fs.media_ref, cand_pa))
    ref_code = np.asarray(da.indices).astype(np.int64)
    uref_pa = da.dictionary

    # parse local shape "<Kind>/<rest>.<offset>" on uniques via one RE2 pass:
    # extract_regex yields a struct (kind, rest, off), null where no match
    ext_groups = pc.extract_regex(
        uref_pa, r"^(?P<kind>[A-Za-z]+)/(?P<rest>.+)\.(?P<off>[0-9]+)$"
    )
    u_match = pc.is_valid(ext_groups).to_numpy(zero_copy_only=False)
    u_urn = pc.starts_with(uref_pa, "urn:").to_numpy(zero_copy_only=False)
    u_local = u_match & ~u_urn
    claimed_kind_u = pc.struct_field(ext_groups, "kind")
    rest_u = pc.struct_field(ext_groups, "rest")
    off_u = np.asarray(
        pc.cast(pc.struct_field(ext_groups, "off"), pa.int64()).fill_null(-1)
    ).astype(np.int64)
    local_shape = u_local[ref_code]

    # same-document check on the candidate level: dictionary-take the parsed
    # doc part and compare to the owning doc_id — one Arrow equality kernel
    parent_cand = fs.parent[cand]
    own_doc_pa = pc.take(fs.doc_ids, pa.array(parent_cand))
    rest_cand = pc.take(rest_u, pa.array(ref_code))
    same_doc = (
        pc.equal(rest_cand, own_doc_pa).fill_null(False).to_numpy(zero_copy_only=False)
    )

    # per-batch identity index: key = parent * 2^32 + offset -> span position
    offs = fs.offset_np
    identity = fs.parent.astype(np.int64) * (1 << 32) + offs
    order = np.argsort(identity, kind="stable")
    sorted_ids = identity[order]

    target_key = np.full(cand.size, -1, dtype=np.int64)
    is_local_same = local_shape & same_doc
    target_key[is_local_same] = (
        parent_cand[is_local_same].astype(np.int64) * (1 << 32)
        + off_u[ref_code[is_local_same]]
    )

    pos = np.searchsorted(sorted_ids, target_key)
    pos_ok = (pos < len(sorted_ids)) & (target_key >= 0)
    resolved_local = np.zeros(cand.size, dtype=bool)
    target_flat = np.zeros(cand.size, dtype=np.int64)
    safe_pos = np.clip(pos, 0, max(len(sorted_ids) - 1, 0))
    if len(sorted_ids):
        hit = pos_ok & (sorted_ids[safe_pos] == target_key)
        resolved_local = hit
        target_flat = order[safe_pos]

    type_mismatch = np.zeros(cand.size, dtype=bool)
    res_idx = np.flatnonzero(resolved_local)
    if res_idx.size:
        tk = pc.take(fs.kind, pa.array(target_flat[res_idx]))
        cm = pc.take(claimed_kind_u, pa.array(ref_code[res_idx]))
        type_mismatch[res_idx] = (
            pc.not_equal(tk, cm).fill_null(True).to_numpy(zero_copy_only=False)
        )

    in_registry = np.zeros(cand.size, dtype=bool)
    if registry_keys is not None and registry_keys.size:
        # registry_keys are PRE-HASHED sorted uint64 (CompiledProfile); probe
        # only the UNIQUE ref strings, broadcast via ref_code. Integer
        # searchsorted beats string comparison ~10x; a 64-bit FNV collision
        # against a 10^7-key registry is ~1e-13 per probe — negligible.
        from .hashing import hash_str

        uh = hash_str(uref_pa.to_numpy(zero_copy_only=False))
        pos_r = np.clip(np.searchsorted(registry_keys, uh), 0, registry_keys.size - 1)
        in_registry = (registry_keys[pos_r] == uh)[ref_code]

    ext = ~local_shape
    if policy == "InBundleOnly":
        not_found = (local_shape & ~resolved_local) | ext
        nf_sev = E.SEV_ERROR
    elif policy == "AllowExternal":
        not_found = (local_shape & ~resolved_local & ~in_registry) | (ext & ~in_registry)
        nf_sev = E.SEV_WARNING
    else:  # RequireResolution
        not_found = (local_shape & ~resolved_local & ~in_registry) | (ext & ~in_registry)
        nf_sev = E.SEV_ERROR

    def _refs_at(mask: np.ndarray) -> list[str]:
        return pc.take(uref_pa, pa.array(ref_code[mask])).to_pylist()

    idx = cand[not_found]
    sink.add_spans(
        fs, idx,
        source=E.SRC_REFERENCE, severity=nf_sev, rule_id=rule.id,
        error_code=E.REFERENCE_NOT_FOUND, pointer_field="media_ref",
        details=_canon_per_value(_refs_at(not_found), lambda r: {"ref": r, "policy": policy}) if sink.emit_details else None,
    )
    idx = cand[type_mismatch]
    sink.add_spans(
        fs, idx,
        source=E.SRC_REFERENCE,
        severity=E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint),
        rule_id=rule.id, error_code=E.REFERENCE_TYPE_MISMATCH, pointer_field="media_ref",
        details=[
            _canon_details({"ref": r, "expected": str(c), "actual": str(a)})
            for r, c, a in zip(
                _refs_at(type_mismatch),
                pc.take(claimed_kind_u, pa.array(ref_code[type_mismatch])).to_pylist(),
                pc.take(fs.kind, pa.array(target_flat[type_mismatch])).to_pylist(),
            )
        ] if sink.emit_details else None,
    )


def k_full_url_id_match(rule: RuleDef, fs: FlatSpans, sel: np.ndarray,
                        sink: ViolationSink) -> None:
    """FullUrlIdMatch: a local-shaped ref ("<Kind>/<doc>.<offset>") must name
    its OWN document — the ``resource.id == fullUrl`` id-consistency check
    (spec ``docs/03_rule_dsl_spec.md:54-56``; the reference declares the rule
    type but no-ops its dispatch at ``FhirPathRuleEngine.cs:931-933`` — we
    implement the documented semantic). Cross-document local refs emit
    ENTRY_REFERENCE_MISMATCH."""
    nonempty = ~fs.empty_mask("media_ref")
    cand = np.flatnonzero(sel & nonempty)
    if cand.size == 0:
        return
    cand_pa = pa.array(cand)
    refs = pc.take(fs.media_ref, cand_pa)
    ext = pc.extract_regex(refs, r"^(?P<kind>[A-Za-z]+)/(?P<rest>.+)\.(?P<off>[0-9]+)$")
    is_local = (
        pc.and_kleene(pc.is_valid(ext), pc.invert(pc.starts_with(refs, "urn:")))
        .fill_null(False)
        .to_numpy(zero_copy_only=False)
    )
    own = pc.take(fs.doc_ids, pa.array(fs.parent[cand]))
    same = pc.equal(pc.struct_field(ext, "rest"), own).fill_null(True).to_numpy(
        zero_copy_only=False
    )
    bad = is_local & ~same
    idx = cand[bad]
    sink.add_spans(
        fs, idx,
        source=E.SRC_REFERENCE,
        severity=E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint),
        rule_id=rule.id, error_code=rule.error_code or E.ENTRY_REFERENCE_MISMATCH,
        pointer_field="media_ref",
        details=[
            _canon_details({"ref": r})
            for r in pc.take(refs, pa.array(np.flatnonzero(bad))).to_pylist()
        ] if sink.emit_details else None,
    )


_INT_RE = r"^-?[0-9]+$"
_DEC_RE = r"^-?[0-9]+(\.[0-9]+)?$"


def _qa_answers(parts: pa.Array, wellformed: np.ndarray) -> pa.Array:
    """Second element of each split pair as a flat Arrow string array ("" for
    malformed rows) — one take over the flattened values, no Python objects."""
    flat = pc.list_flatten(parts)
    lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    idx = np.where(wellformed, starts + 1, 0)
    return pc.if_else(pa.array(wellformed), pc.take(flat, pa.array(idx)), "")


def k_question_answer(rule: RuleDef, fs: FlatSpans, sel: np.ndarray,
                      sink: ViolationSink) -> None:
    """QuestionAnswer: per-span Q/A contract — span text is
    ``<question-code>=<answer>``; each configured question dispatches a typed
    check (``Validation/QuestionAnswer/QuestionAnswerValidator.cs:54-1250``,
    per-type dispatch at ``:498 :585 :736 :833 :930 :1041``):

    - boolean: answer ∈ {true, false}                 -> INVALID_ANSWER_VALUE
    - integer/decimal: lexical parse + min/max range  -> INVALID / OUT_OF_RANGE
    - code: single unless multiValue; set membership  -> ANSWER_NOT_IN_VALUESET
      with binding strength -> severity (required=error, extensible=warning)
    - string: regex pattern                            -> INVALID_ANSWER_VALUE
    - quantity: "<value> <unit>" shape + unit + range  -> INVALID / OUT_OF_RANGE
    - unknown question code                            -> UNKNOWN_QUESTION
    - malformed (no '=')                               -> INVALID_ANSWER_VALUE
    """
    questions = {q.code: q for q in rule.params["questions"]}
    cand = np.flatnonzero(sel & ~fs.empty_mask(rule.field_path))
    if cand.size == 0:
        return
    texts = pc.take(_field_array(fs, rule.field_path), pa.array(cand))
    parts = pc.split_pattern(texts, "=", max_splits=1)
    n_parts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    qcode_arr = pc.list_element(parts, 0)
    malformed = n_parts < 2
    wellformed = ~malformed
    # answer column aligned to cand: second split element where present,
    # "" where malformed (never matched against a question anyway)
    a = _qa_answers(parts, wellformed)
    sev = E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint)

    def emit(mask: np.ndarray, code: str, severity: str, detail: dict) -> None:
        idx = cand[np.flatnonzero(mask)]
        sink.add_spans(
            fs, idx,
            source=E.SRC_BUSINESS, severity=severity, rule_id=rule.id,
            error_code=code, pointer_field=rule.field_path,
            details=[_canon_details(detail)] * idx.size if sink.emit_details else None,
        )

    emit(malformed, rule.error_code or E.INVALID_ANSWER_VALUE, sev,
         {"reason": "malformed"})

    known = (
        pc.is_in(qcode_arr, value_set=pa.array(list(questions), pa.string()))
        .fill_null(False)
        .to_numpy(zero_copy_only=False)
    )
    emit(wellformed & ~known, E.UNKNOWN_QUESTION, sev, {"reason": "unknown question"})

    for q in questions.values():
        qm = wellformed & (
            pc.equal(qcode_arr, q.code).fill_null(False).to_numpy(zero_copy_only=False)
        )
        if not qm.any():
            continue
        if q.type == "boolean":
            ok = pc.is_in(a, value_set=pa.array(["true", "false"], pa.string()))
            bad = qm & ~ok.fill_null(False).to_numpy(zero_copy_only=False)
            emit(bad, E.INVALID_ANSWER_VALUE, sev, {"question": q.code, "type": "boolean"})
        elif q.type in ("integer", "decimal"):
            pat = _INT_RE if q.type == "integer" else _DEC_RE
            ok_lex = pc.match_substring_regex(a, pat).fill_null(False).to_numpy(
                zero_copy_only=False
            )
            emit(qm & ~ok_lex, E.INVALID_ANSWER_VALUE, sev,
                 {"question": q.code, "type": q.type})
            num_idx = np.flatnonzero(qm & ok_lex)
            if num_idx.size:
                vals = np.asarray(
                    pc.cast(pc.take(a, pa.array(num_idx)), pa.float64())
                )
                bad_range = np.zeros(num_idx.size, dtype=bool)
                if q.min is not None:
                    bad_range |= vals < q.min
                if q.max is not None:
                    bad_range |= vals > q.max
                out = np.zeros(cand.size, dtype=bool)
                out[num_idx[bad_range]] = True
                emit(out, E.ANSWER_OUT_OF_RANGE, sev,
                     {"question": q.code, "min": q.min, "max": q.max})
        elif q.type == "code":
            vs_sev = E.SEV_WARNING if q.binding == "extensible" else sev
            allowed_pa = pa.array(list(q.allowed), pa.string())
            if q.multi_value:
                # split multi answers; per-candidate "any element outside the
                # set" via parent-index bincount — no Python per-row loop
                multi = pc.split_pattern(a, ",")
                flat_vals = pc.list_flatten(multi)
                parent = pc.list_parent_indices(multi).to_numpy(zero_copy_only=False)
                miss = (
                    pc.invert(pc.is_in(flat_vals, value_set=allowed_pa))
                    .fill_null(True)
                    .to_numpy(zero_copy_only=False)
                )
                bad_counts = np.bincount(parent[miss], minlength=cand.size)
                emit(qm & (bad_counts > 0), E.ANSWER_NOT_IN_VALUESET, vs_sev,
                     {"question": q.code, "allowed": list(q.allowed)})
            else:
                has_comma = pc.match_substring(a, ",").fill_null(False).to_numpy(
                    zero_copy_only=False
                )
                emit(qm & has_comma, E.INVALID_ANSWER_VALUE, sev,
                     {"question": q.code, "reason": "multiple answers"})
                ok = pc.is_in(a, value_set=allowed_pa).fill_null(False).to_numpy(
                    zero_copy_only=False
                )
                emit(qm & ~has_comma & ~ok, E.ANSWER_NOT_IN_VALUESET, vs_sev,
                     {"question": q.code, "allowed": list(q.allowed)})
        elif q.type == "string":
            if q.pattern:
                ok = pc.match_substring_regex(a, q.pattern).fill_null(False).to_numpy(
                    zero_copy_only=False
                )
                emit(qm & ~ok, E.INVALID_ANSWER_VALUE, sev,
                     {"question": q.code, "pattern": q.pattern})
        elif q.type == "quantity":
            # quantity answer "<decimal value>[ <unit>]" — the reference's
            # quantity dispatch (``QuestionAnswerValidator.cs:585-736``):
            # non-quantity shape -> INVALID; unit mismatch (missing unit
            # displays as "none") -> INVALID; value range -> OUT_OF_RANGE.
            # Unit and range checks BOTH run for a lexically valid answer.
            qparts = pc.split_pattern(a, " ")
            qn = pc.list_value_length(qparts).to_numpy(zero_copy_only=False)
            qval = pc.list_element(qparts, 0)
            lex_ok = (qn <= 2) & (
                pc.match_substring_regex(qval, _DEC_RE)
                .fill_null(False)
                .to_numpy(zero_copy_only=False)
            )
            emit(qm & ~lex_ok, E.INVALID_ANSWER_VALUE, sev,
                 {"question": q.code, "type": "quantity"})
            if q.unit is not None:
                unit = _qa_answers(qparts, qn == 2)  # "" where unit absent
                unit_bad = (
                    pc.not_equal(pc.if_else(pc.equal(unit, ""), "none", unit), q.unit)
                    .fill_null(True)
                    .to_numpy(zero_copy_only=False)
                )
                emit(qm & lex_ok & unit_bad, E.INVALID_ANSWER_VALUE, sev,
                     {"question": q.code, "unit": q.unit})
            num_idx = np.flatnonzero(qm & lex_ok)
            if num_idx.size:
                vals = np.asarray(
                    pc.cast(pc.take(qval, pa.array(num_idx)), pa.float64())
                )
                bad_range = np.zeros(num_idx.size, dtype=bool)
                if q.min is not None:
                    bad_range |= vals < q.min
                if q.max is not None:
                    bad_range |= vals > q.max
                out = np.zeros(cand.size, dtype=bool)
                out[num_idx[bad_range]] = True
                emit(out, E.ANSWER_OUT_OF_RANGE, sev,
                     {"question": q.code, "min": q.min, "max": q.max})


def k_exclusivity(rule: RuleDef, fs: FlatSpans, sel: np.ndarray,
                  sink: ViolationSink) -> None:
    """Exclusivity: at most ONE of ``params.fields`` may be non-empty per
    selected span — the ``value[x]`` choice-type exclusivity check
    (``JsonNodeStructuralValidator.cs:858-942``) mapped to flat span fields."""
    fields = [str(f) for f in rule.params["fields"]]
    filled = np.zeros(fs.n_spans, dtype=np.int64)
    for f in fields:
        filled += (~fs.empty_mask(f)).astype(np.int64)
    idx = np.flatnonzero(sel & (filled > 1))
    sink.add_spans(
        fs, idx,
        source=E.SRC_STRUCTURE,
        severity=E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint),
        rule_id=rule.id, error_code=rule.error_code or E.FHIR_MULTIPLE_VALUE_X,
        pointer_field=fields[0],
        details=[_canon_details({"fields": fields})] * idx.size if sink.emit_details else None,
    )


def k_extension(rule: RuleDef, fs: FlatSpans, sel: np.ndarray,
                sink: ViolationSink) -> None:
    """Extension grammar (``JsonNodeStructuralValidator.cs:1087-1185``) as a
    dedicated kernel over the span mapping url<->media_ref, value[x]<->text:

    - ``FHIR_EXTENSION_MISSING_URL`` (``:1095-1122``): media_ref null or
      whitespace-only (the reference's hasUrl/urlValid check). The shape
      check still runs on such spans (":1123 Continue validation").
    - ``FHIR_EXTENSION_INVALID_SHAPE`` (``:1126-1185``): no payload — text
      null/whitespace-only (shapeReason "empty"). The reference's second
      invalid shape, value[x] AND nested extension[] together ("both"), is
      unreachable here: the flat span struct has exactly one value slot and
      no nested list, so a span cannot carry both payloads. Recorded as the
      model's stated divergence (SURVEY §2.3) and pinned by
      ``test_extension_both_shape_unreachable``.
    """
    sev = E.resolve_severity(rule.severity, rule.validation_class,
                             rule.is_heuristic, rule.is_spec_hint)
    url_missing = np.flatnonzero(sel & fs.empty_mask("media_ref"))
    sink.add_spans(
        fs, url_missing,
        source=E.SRC_STRUCTURE, severity=sev, rule_id=rule.id,
        error_code=E.FHIR_EXTENSION_MISSING_URL, pointer_field="media_ref",
        details=[_canon_details({"hasUrl": False})] * url_missing.size
        if sink.emit_details else None,
    )
    no_value = np.flatnonzero(sel & fs.empty_mask("text"))
    sink.add_spans(
        fs, no_value,
        source=E.SRC_STRUCTURE, severity=sev, rule_id=rule.id,
        error_code=E.FHIR_EXTENSION_INVALID_SHAPE, pointer_field="text",
        details=[_canon_details({"shapeReason": "empty"})] * no_value.size
        if sink.emit_details else None,
    )


def k_code_master(rule: RuleDef, fs: FlatSpans, sel: np.ndarray,
                  sink: ViolationSink) -> None:
    """CodeMaster screening lookup (``RuleEngines/CodeMasterEngine.cs:12-235``):
    span text is ``<screening>|<question>=<answer>``; the screening resolves a
    question set, the question resolves an allowed-answer list, membership +
    multiValue are checked. Spans without a '|' are not screening-shaped and
    are skipped (the reference skips Observations without a screening-type
    coding). Source = CodeMaster (stage rank 2)."""
    screenings = rule.params["screenings"]
    cand = np.flatnonzero(sel & ~fs.empty_mask(rule.field_path))
    if cand.size == 0:
        return
    texts = pc.take(_field_array(fs, rule.field_path), pa.array(cand))
    top = pc.split_pattern(texts, "|", max_splits=1)
    shaped = pc.list_value_length(top).to_numpy(zero_copy_only=False) >= 2
    if not shaped.any():
        return
    scr_arr = pc.list_element(top, 0)
    rest = _qa_answers(top, shaped)  # second element ("" where unshaped)
    qa = pc.split_pattern(rest, "=", max_splits=1)
    has_answer = shaped & (pc.list_value_length(qa).to_numpy(zero_copy_only=False) >= 2)
    qcode_arr = pc.list_element(qa, 0)
    answer = _qa_answers(qa, has_answer)
    sev = E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint)

    def emit(mask: np.ndarray, code: str, detail: dict) -> None:
        idx = cand[np.flatnonzero(mask)]
        sink.add_spans(
            fs, idx,
            source=E.SRC_CODEMASTER, severity=sev, rule_id=rule.id,
            error_code=code, pointer_field=rule.field_path,
            details=[_canon_details(detail)] * idx.size if sink.emit_details else None,
        )

    known_scr = (
        pc.is_in(scr_arr, value_set=pa.array(list(screenings), pa.string()))
        .fill_null(False)
        .to_numpy(zero_copy_only=False)
    )
    emit(shaped & ~known_scr, E.CODEMASTER_SCREENING_UNKNOWN,
         {"reason": "unknown screening"})
    emit(shaped & known_scr & ~has_answer, E.INVALID_ANSWER_VALUE,
         {"reason": "malformed"})

    for scr in screenings.values():
        sm = has_answer & known_scr & (
            pc.equal(scr_arr, scr.code).fill_null(False).to_numpy(zero_copy_only=False)
        )
        if not sm.any():
            continue
        known_q = (
            pc.is_in(qcode_arr, value_set=pa.array(list(scr.questions), pa.string()))
            .fill_null(False)
            .to_numpy(zero_copy_only=False)
        )
        emit(sm & ~known_q, E.CODEMASTER_QUESTION_UNKNOWN,
             {"screening": scr.code, "reason": "unknown question"})
        for q in scr.questions.values():
            qm = sm & known_q & (
                pc.equal(qcode_arr, q.code).fill_null(False).to_numpy(zero_copy_only=False)
            )
            if not qm.any():
                continue
            allowed_pa = pa.array(list(q.allowed_answers), pa.string())
            if q.multi_value:
                multi = pc.split_pattern(answer, ",")
                flat_vals = pc.list_flatten(multi)
                parent = pc.list_parent_indices(multi).to_numpy(zero_copy_only=False)
                miss = (
                    pc.invert(pc.is_in(flat_vals, value_set=allowed_pa))
                    .fill_null(True)
                    .to_numpy(zero_copy_only=False)
                )
                bad_counts = np.bincount(parent[miss], minlength=cand.size)
                emit(qm & (bad_counts > 0), E.ANSWER_NOT_IN_VALUESET,
                     {"screening": scr.code, "question": q.code,
                      "allowed": list(q.allowed_answers)})
            else:
                has_comma = pc.match_substring(answer, ",").fill_null(False).to_numpy(
                    zero_copy_only=False
                )
                emit(qm & has_comma, E.INVALID_ANSWER_VALUE,
                     {"screening": scr.code, "question": q.code,
                      "reason": "multiple answers"})
                ok = pc.is_in(answer, value_set=allowed_pa).fill_null(False).to_numpy(
                    zero_copy_only=False
                )
                emit(qm & ~has_comma & ~ok, E.ANSWER_NOT_IN_VALUESET,
                     {"screening": scr.code, "question": q.code,
                      "allowed": list(q.allowed_answers)})


# ----------------------------------------------------- primitive grammars
# Lexical grammars for the 11 FHIR primitive types, mirroring the reference's
# per-type validators (``Validation/JsonNodeStructuralValidator.cs:84-97``
# dispatch table; grammar impls ``:738-829`` for boolean/integer/decimal/date/
# dateTime/id/string/code, ``:1209-1290`` for uri/url/canonical). Single
# source of truth: the DuckDB oracle SQL is built from these SAME patterns
# (``pipelines/oracle.py:primitive_valid_expr``), so kernel and oracle cannot
# drift. Patterns stay inside the RE2 dialect shared by pyarrow and DuckDB.
#
# Stated divergences from the .NET implementations (documented, deliberate):
# - whitespace/control classes are ASCII (RE2 ``\s`` + ``\x00-\x1f\x7f``),
#   not ``char.IsWhiteSpace``'s Unicode set;
# - integer/decimal are lexical only (no int32/decimal range check);
# - dateTime is the FHIR R4 grammar (timezone REQUIRED when a time is
#   present, hour <= 23) rather than .NET ``DateTimeOffset.TryParse``'s
#   locale-lenient parse (``:760-765``);
# - date keeps the reference's exact quirk: partial dates (YYYY / YYYY-MM)
#   are regex-checked only — "2021-13" passes, as in ``ValidateDate``
#   (``:738-754``) which calendar-checks ONLY length-10 values.
PRIM_RE: dict[str, str] = {
    "boolean": r"^(true|false)$",
    "integer": r"^[+-]?[0-9]+$",
    "decimal": r"^[+-]?([0-9]+(\.[0-9]+)?|\.[0-9]+)$",
    "date": r"^\d{4}(-\d{2}(-\d{2})?)?$",
    "dateTime": (
        r"^\d{4}(-\d{2}(-\d{2}(T([01]\d|2[0-3]):[0-5]\d:[0-5]\d(\.\d+)?"
        r"(Z|[+-]((0\d|1[0-3]):[0-5]\d|14:00)))?)?)?$"
    ),
    "id": ID_GRAMMAR,
    "code": r"^[^\s\x00-\x1f\x7f]+$",
    "uri": r"^[^\s\x00-\x1f\x7f]+$",  # relative-or-absolute: Uri.TryCreate is
    # near-vacuous for relative URIs, so no-ws/ctrl + nonempty is the grammar
    "url": r"^[A-Za-z][A-Za-z0-9+.\-]*:[^\s\x00-\x1f\x7f]+$",
    "canonical": r"^[A-Za-z][A-Za-z0-9+.\-]*:[^\s|\x00-\x1f\x7f]+(\|[^\s|\x00-\x1f\x7f]+)?$",
}
# string is special-cased: valid unless it contains \r or \n (empty string is
# VALID — ``ValidateFhirString``, ``:779-790``)
PRIM_STRING_BAD_RE = r"[\r\n]"

# types whose full YYYY-MM-DD prefix must be a real calendar date
_CALENDAR_TYPES = ("date", "dateTime")
_FULL_DATE_PREFIX_RE = r"^(?P<y>\d{4})-(?P<m>\d{2})-(?P<d>\d{2})"
_DAYS_IN_MONTH = np.array([0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])


def calendar_ok(arr: pa.Array) -> np.ndarray:
    """True where the leading ``YYYY-MM-DD`` prefix (if any) is a real
    proleptic-Gregorian date. Rows without a full-date prefix return True.
    Vectorized: one RE2 extract + numpy days-in-month / leap-year arithmetic
    (pc.strptime can't be used — Arrow's parser accepts 2021-02-30)."""
    g = pc.extract_regex(arr, _FULL_DATE_PREFIX_RE)
    has = pc.is_valid(g).to_numpy(zero_copy_only=False)
    if not has.any():
        return np.ones(len(arr), dtype=bool)
    y = np.asarray(pc.cast(pc.struct_field(g, "y"), pa.int64()).fill_null(0))
    m = np.asarray(pc.cast(pc.struct_field(g, "m"), pa.int64()).fill_null(1))
    d = np.asarray(pc.cast(pc.struct_field(g, "d"), pa.int64()).fill_null(1))
    ok = (m >= 1) & (m <= 12)
    dim = _DAYS_IN_MONTH[np.clip(m, 0, 12)]
    leap = (m == 2) & (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))
    ok &= (d >= 1) & (d <= dim + leap)
    return np.where(has, ok, True)


def primitive_invalid_mask(primitive: str, arr: pa.Array) -> np.ndarray:
    """True where a PRESENT value violates the primitive's lexical grammar.
    Null entries are never flagged (absence is the Required rule's concern,
    matching the reference where grammar validators see present JSON values
    only)."""
    if primitive == "string":
        return (
            pc.match_substring_regex(arr, PRIM_STRING_BAD_RE)
            .fill_null(False)
            .to_numpy(zero_copy_only=False)
        )
    bad = (
        pc.invert(pc.match_substring_regex(arr, PRIM_RE[primitive]))
        .fill_null(False)
        .to_numpy(zero_copy_only=False)
    )
    if primitive in _CALENDAR_TYPES:
        present = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        bad |= present & ~calendar_ok(arr)
    return bad


def k_primitive(rule: RuleDef, fs: FlatSpans, sel: np.ndarray, sink: ViolationSink) -> None:
    """Primitive: the selected spans' field must satisfy the lexical grammar
    of ``params.primitive`` (one of the 11 FHIR primitive types). Emits
    FHIR_INVALID_PRIMITIVE with source STRUCTURE — the reference raises these
    from the structural validator (``JsonNodeStructuralValidator.cs:84-97``),
    so they participate in STRUCTURE-priority dedup. Candidate-first: the
    grammar regex runs over the taken candidate values only."""
    prim = str(rule.params["primitive"])
    arr = _field_array(fs, rule.field_path)
    present = pc.is_valid(arr).to_numpy(zero_copy_only=False)
    cand = np.flatnonzero(sel & present)
    if cand.size == 0:
        return
    taken = pc.take(arr, pa.array(cand))
    bad = primitive_invalid_mask(prim, taken)
    idx = cand[bad]
    vals = pc.take(arr, pa.array(idx)).to_pylist() if idx.size and sink.emit_details else []
    sink.add_spans(
        fs, idx,
        source=E.SRC_STRUCTURE,
        severity=E.resolve_severity(rule.severity, rule.validation_class, rule.is_heuristic, rule.is_spec_hint),
        rule_id=rule.id, error_code=rule.error_code or E.FHIR_INVALID_PRIMITIVE,
        pointer_field=rule.field_path,
        details=_canon_per_value(vals, lambda v: {"actual": v, "primitive": prim}) if sink.emit_details else None,
    )


# -------------------------------------------------------- structural kernels
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


def k_lint(profile: Profile, fs: FlatSpans, sink: ViolationSink) -> None:
    """Best-effort LINT layer (``Authoring/LintValidationService.cs``,
    catalog ``Catalogs/LintRuleCatalog.cs:17-357`` -> ``catalogs.py``):
    value-quality / plausibility / duplicate-entry heuristics over the span
    model, auto-injected in full/debug validation mode only. All emissions
    are Advisory-class heuristics — ``resolve_severity`` downgrades every
    configured error to a warning, so the layer can never change a blocking
    decision (the identical-blocking-decisions contract the mode gating
    preserves, ``kernels.py`` validate_batch).

    Vectorized throughout: one regex/compare kernel per rule; the
    duplicate-entry check dictionary-encodes each span field separately and
    marks non-first per-doc (kind, text, media_ref) code rows with one
    ``np.unique(axis=0)`` — no Python row loop, no composite-string key
    (so no separator or null-sentinel byte can collide with field values;
    the oracle partitions by the three raw columns)."""
    from ..catalogs import LINT_CATALOG, LINT_YEAR_MAX, LINT_YEAR_MIN

    if fs.n_spans == 0:
        return

    def emit(mask: np.ndarray, code: str, pointer_field: str) -> None:
        idx = np.flatnonzero(mask)
        if idx.size == 0:
            return
        entry = LINT_CATALOG[code]
        sink.add_spans(
            fs, idx,
            source=E.SRC_LINT,
            severity=E.resolve_severity(entry["severity"], E.CLASS_ADVISORY,
                                        is_heuristic=True),
            rule_id=code, error_code=code, pointer_field=pointer_field,
            details=[_canon_details({"confidence": entry["confidence"]})]
            * idx.size if sink.emit_details else None,
        )

    text = fs.text
    empty = pc.equal(text, "").fill_null(False).to_numpy(zero_copy_only=False)
    ws_only = (pc.match_substring_regex(text, r"^\s+$").fill_null(False)
               .to_numpy(zero_copy_only=False))
    edge_ws = (pc.match_substring_regex(text, r"(^\s)|(\s$)").fill_null(False)
               .to_numpy(zero_copy_only=False))
    emit(empty, "LINT_EMPTY_VALUE", "text")
    emit(ws_only, "LINT_WHITESPACE_ONLY", "text")
    emit(edge_ws & ~ws_only, "LINT_UNTRIMMED_VALUE", "text")

    kind_missing = pc.or_kleene(
        pc.is_null(fs.kind), pc.equal(fs.kind, "")
    ).fill_null(True).to_numpy(zero_copy_only=False)
    emit(kind_missing, "LINT_MISSING_KIND", "kind")

    y_min = int(profile.settings.get("lintYearMin", LINT_YEAR_MIN))
    y_max = int(profile.settings.get("lintYearMax", LINT_YEAR_MAX))
    datekind = (pc.is_in(fs.kind, value_set=pa.array(["date", "dateTime"]))
                .fill_null(False).to_numpy(zero_copy_only=False))
    has4 = pc.match_substring_regex(text, r"^\d{4}").fill_null(False)
    year = pc.cast(
        pc.if_else(has4, pc.utf8_slice_codeunits(text, 0, 4), "0"),
        pa.int64())
    year_bad = pc.or_(pc.less(year, y_min), pc.greater(year, y_max))
    susp = (datekind & has4.to_numpy(zero_copy_only=False)
            & year_bad.fill_null(False).to_numpy(zero_copy_only=False))
    emit(susp, "LINT_SUSPICIOUS_DATE", "text")

    boolkind = (pc.equal(fs.kind, "boolean").fill_null(False)
                .to_numpy(zero_copy_only=False))
    if boolkind.any():
        tf = pa.array(["true", "false"])
        low_ok = (pc.is_in(pc.utf8_lower(text), value_set=tf)
                  .fill_null(False).to_numpy(zero_copy_only=False))
        exact = (pc.is_in(text, value_set=tf).fill_null(False)
                 .to_numpy(zero_copy_only=False))
        emit(boolkind & low_ok & ~exact, "LINT_BOOLEAN_CASE", "text")

    # duplicate (kind, text, media_ref) tuples per doc: dictionary-encode
    # each field SEPARATELY and unique the integer row (parent, k, t, m) —
    # no composite-string key, so no separator/sentinel byte in a field
    # value can shift tuple boundaries (the oracle partitions by the three
    # columns directly); null -> -1 matches SQL's nulls-equal partitioning
    def _dup_codes(arr) -> np.ndarray:
        idx = pc.dictionary_encode(arr).indices.to_numpy(
            zero_copy_only=False)
        if idx.dtype.kind == "f":  # any null -> float indices with NaN
            idx = np.where(idx != idx, -1.0, idx)
        return idx.astype(np.int64)

    rows = np.column_stack([fs.parent, _dup_codes(fs.kind),
                            _dup_codes(text), _dup_codes(fs.media_ref)])
    _, first_idx = np.unique(rows, axis=0, return_index=True)
    dup = np.ones(fs.n_spans, dtype=bool)
    dup[first_idx] = False
    emit(dup, "LINT_DUPLICATE_ENTRY", "text")

    ctrl = (pc.match_substring_regex(text, _CTRL_RE).fill_null(False)
            .to_numpy(zero_copy_only=False))
    emit(ctrl, "LINT_CONTROL_CHARS", "text")


def k_structural(profile: Profile, fs: FlatSpans, sink: ViolationSink) -> None:
    """STRUCTURE stage — the primary structural authority
    (``Core/ValidationPipeline.cs:131-141``; kernels from
    ``Validation/JsonNodeStructuralValidator.cs``):

    - zero-span documents emit EMPTY_BUNDLE — the stage-0 document-sanity
      check (``Core/ValidationPipeline.cs:610-656``; INVALID_JSON is N/A:
      malformed JSON cannot exist in an Arrow spans column)
    - doc_id must match the FHIR id grammar (``:100-101``, ``:829-857``)
    - spans.kind must be in the profile's allowed-kind enum binding
      (``:500-548``; required binding -> error)
    - span offsets strictly increasing within a row (the span-sequence
      invariant ``(kind, text, media_ref, order)``)
    """
    settings = profile.settings
    if settings.get("checkEmptyDoc", True):
        bad = np.flatnonzero(fs.lengths == 0)
        sink.add_docs(
            fs, bad,
            source=E.SRC_STRUCTURE, severity=E.SEV_ERROR, rule_id="",
            error_code=E.EMPTY_BUNDLE, path="spans",
            details=[_canon_details({"reason": "document has no spans"})] * bad.size
            if sink.emit_details else None,
        )
    if settings.get("checkDocId", True):
        ids = fs.doc_ids
        ok = pc.match_substring_regex(ids, ID_GRAMMAR).fill_null(False)
        bad = np.flatnonzero(pc.invert(ok).to_numpy(zero_copy_only=False))
        sink.add_docs(
            fs, bad,
            source=E.SRC_STRUCTURE, severity=E.SEV_ERROR, rule_id="",
            error_code=E.FHIR_INVALID_PRIMITIVE, path="doc_id",
            details=_canon_per_value(fs.doc_ids_np[bad], lambda v: {"field": "doc_id", "actual": str(v)}) if sink.emit_details else None,
        )
    if profile.allowed_kinds:
        m = pc.is_in(fs.kind, value_set=pa.array(profile.allowed_kinds, type=pa.string()))
        bad = np.flatnonzero(pc.invert(m).fill_null(True).to_numpy(zero_copy_only=False))
        sink.add_spans(
            fs, bad,
            source=E.SRC_STRUCTURE, severity=E.SEV_ERROR, rule_id="",
            error_code=E.INVALID_ENUM_VALUE, pointer_field="kind",
            details=_canon_per_value(fs.kind_np[bad], lambda v: {"actual": str(v), "allowed": list(profile.allowed_kinds)}) if sink.emit_details else None,
        )
    if settings.get("checkRefGrammar", False) and fs.n_spans:
        nonempty = ~fs.empty_mask("media_ref")
        ok = (
            pc.match_substring_regex(fs.media_ref, REF_GRAMMAR)
            .fill_null(False)
            .to_numpy(zero_copy_only=False)
        )
        bad = np.flatnonzero(nonempty & ~ok)
        sink.add_spans(
            fs, bad,
            source=E.SRC_STRUCTURE, severity=E.SEV_ERROR, rule_id="",
            error_code=E.FHIR_INVALID_REFERENCE_FORMAT, pointer_field="media_ref",
            details=[
                _canon_details({"ref": r})
                for r in pc.take(fs.media_ref, pa.array(bad)).to_pylist()
            ] if sink.emit_details else None,
        )
    if settings.get("checkSpanOrder", True) and fs.n_spans:
        offs = fs.offset_np
        same_doc = np.zeros(fs.n_spans, dtype=bool)
        same_doc[1:] = fs.parent[1:] == fs.parent[:-1]
        nonincreasing = np.zeros(fs.n_spans, dtype=bool)
        nonincreasing[1:] = offs[1:] <= offs[:-1]
        bad = np.flatnonzero(same_doc & nonincreasing)
        sink.add_spans(
            fs, bad,
            source=E.SRC_STRUCTURE, severity=E.SEV_ERROR, rule_id="",
            error_code=E.SPAN_SEQUENCE_INVALID, pointer_field="offset",
            details=[_canon_details({"offset": int(o), "prev": int(p)})
                     for o, p in zip(offs[bad], offs[bad - 1])] if sink.emit_details else None,
        )


# -------------------------------------------------------- evaluation planner
@dataclass(frozen=True)
class RulePlan:
    """Per-rule evaluation plan, built BEFORE execution — the analogue of the
    reference's dual-lane planner (``RuleEngines/RuleEvaluationPlanner.cs:
    19-146``: prefer the fast lane only when every safety condition holds,
    else record the fallback reasons). Here the fast lane is the vectorized
    Arrow kernel; the fallback is the per-value Python lane."""

    rule_id: str
    vector_lane: bool
    fallback_reasons: tuple[str, ...] = ()


def build_plan(profile: Profile) -> dict[str, RulePlan]:
    """Compile-time lane decision per rule. Conditions mirror the planner's
    shape: a registered Python predicate is explicitly best-effort
    (CONDITION 3 analogue — CustomFHIRPath never takes the fast lane); a
    regex outside the RE2 subset cannot run on the Arrow kernel (probed once
    here with a 1-element array, not per batch)."""
    plans: dict[str, RulePlan] = {}
    for rule in profile.rules:
        reasons: list[str] = []
        if rule.type == "CustomPredicate" and not rule.params.get("expr"):
            reasons.append("registered Python predicate — best-effort lane")
        if rule.type == "Regex":
            try:
                pc.match_substring_regex(
                    pa.array([""], pa.string()), rule.params["pattern"]
                )
            except pa.ArrowInvalid:
                reasons.append("pattern outside the RE2 subset — Python re lane")
        plans[rule.id] = RulePlan(
            rule_id=rule.id, vector_lane=not reasons,
            fallback_reasons=tuple(reasons),
        )
    return plans


# ------------------------------------------------------------ compiled profile
@dataclass
class CompiledProfile:
    """Profile compiled to kernel-ready state. Built ONCE per validator actor
    (vs per-evaluation compilation in the reference,
    ``FhirPathRuleEngine.cs:2163``)."""

    profile: Profile
    concept_sets: dict[str, np.ndarray] = field(default_factory=dict)
    registry_keys: np.ndarray | None = None
    emit_details: bool = True
    # ValidationMode (``Models/ValidationRequest.cs:76-97``): "standard" runs
    # blocking checks only; "full"/"debug" additionally run the advisory
    # layer — ADVISORY-class rules marked isSpecHint or isHeuristic (the
    # SpecHint / Lint analogues, ``Core/ValidationPipeline.cs:106-175``).
    # Gated rules are non-blocking by construction (Advisory errors downgrade
    # to warnings via SeverityResolver), so both modes produce identical
    # blocking decisions — the reference's contract. Contract/Structural
    # rules run in every mode regardless of flags.
    validation_mode: str = "standard"
    # Terminology-service fallback (``FhirPathRuleEngine.cs:1527-1561``):
    # when a CodeSystem rule's params.system URL is not among the pre-loaded
    # codeSystems, the resolver callable (url -> iterable of concept codes,
    # or None) is consulted ONCE at compile time; an exception or None leaves
    # the system unresolved and the rule degrades to RULE_CONFIGURATION_ERROR
    # at runtime — the stateless-DLL-mode behavior (resolver errors are
    # swallowed exactly like the reference's catch-and-log at ``:1556-1559``).
    # Must be a plain top-level callable so Ray can ship it to workers.
    terminology_resolver: Any = None

    def __post_init__(self):
        from .hashing import hash_str

        self.plans = build_plan(self.profile)
        for url, cs in self.profile.code_systems.items():
            self.concept_sets[url] = np.array(cs.concepts, dtype="U")
        if self.terminology_resolver is not None:
            needed = {str(r.params.get("system", ""))
                      for r in self.profile.rules if r.type == "CodeSystem"}
            for url in needed:
                if not url or url in self.concept_sets:
                    continue  # pre-loaded systems win (":1531-1543")
                try:
                    concepts = self.terminology_resolver(url)
                except Exception:
                    concepts = None
                if concepts is not None:
                    self.concept_sets[url] = np.array(list(concepts),
                                                      dtype="U")
        if self.registry_keys is not None:
            # store as sorted uint64 FNV hashes: 8 bytes/key regardless of
            # string length, integer searchsorted probes. A uint64 input is
            # already-hashed (broadcast-side pre-hash in validate_dataset).
            keys = np.asarray(self.registry_keys)
            if keys.dtype != np.uint64:
                keys = np.sort(hash_str(keys))
            self.registry_keys = keys

    def validate_batch(self, batch: pa.Table) -> pa.Table:
        from .flatten import flatten_batch

        fs = flatten_batch(batch)
        sink = ViolationSink(emit_details=self.emit_details)

        full = self.validation_mode.lower() in ("full", "debug")

        # stage 0: LINT — the reference's pre-parse best-effort layer
        # (``Authoring/LintValidationService.cs``), auto-injected in
        # full/debug mode; every emission is a downgraded Advisory warning,
        # so blocking decisions are identical with or without it.
        if full and self.profile.settings.get("lint", True):
            k_lint(self.profile, fs, sink)

        # stage 1: STRUCTURE (primary authority — runs before business rules)
        k_structural(self.profile, fs, sink)

        # kind dictionary shared by RequiredSpans kernels
        kind_codes = kind_dict = None

        # stages 4-6: business rules / CodeMaster analogues / references —
        # strict pipeline order by source rank, then profile order. Advisory
        # layer (spec-hint / heuristic-advisory rules) runs in full/debug
        # mode only (``ValidationPipeline.cs:106-175``).
        # Only ADVISORY-class flagged rules are gated: they downgrade to
        # warnings (SeverityResolver), so skipping them cannot change a
        # blocking decision. A Contract/Structural rule mis-flagged
        # isSpecHint/isHeuristic still blocks and therefore ALWAYS runs —
        # gating it would violate the identical-blocking-decisions contract.
        active = [
            r for r in self.profile.rules
            if full or not (
                r.validation_class == E.CLASS_ADVISORY
                and (r.is_spec_hint or r.is_heuristic)
            )
        ]
        ordered = sorted(
            active,
            key=lambda r: {"CodeMaster": 2, "Reference": 3}.get(r.type, 1),
        )
        for rule in ordered:
            try:
                if rule.type == "RequiredSpans":
                    if kind_codes is None:
                        dict_arr = pc.dictionary_encode(fs.kind)
                        kind_codes = np.asarray(dict_arr.indices)
                        kind_dict = [str(v) for v in dict_arr.dictionary.to_pylist()]
                    k_required_spans(rule, fs, sink, kind_codes, kind_dict)
                    continue
                if rule.type == "ArrayLength":
                    k_array_length(rule, fs, np.empty(0, bool), sink)
                    continue
                sel = selection_mask(rule, fs)
                if rule.type == "Required":
                    k_required(rule, fs, sel, sink)
                elif rule.type == "FixedValue":
                    k_fixed_value(rule, fs, sel, sink)
                elif rule.type == "AllowedValues":
                    k_allowed_values(rule, fs, sel, sink)
                elif rule.type == "Regex":
                    k_regex(rule, fs, sel, sink,
                            vector_lane=self.plans[rule.id].vector_lane)
                elif rule.type == "CodeSystem":
                    k_code_system(rule, fs, sel, sink,
                                  self.concept_sets.get(str(rule.params["system"])))
                elif rule.type == "CustomPredicate":
                    k_custom_predicate(rule, fs, sel, sink)
                elif rule.type == "QuestionAnswer":
                    k_question_answer(rule, fs, sel, sink)
                elif rule.type == "FullUrlIdMatch":
                    k_full_url_id_match(rule, fs, sel, sink)
                elif rule.type == "CodeMaster":
                    k_code_master(rule, fs, sel, sink)
                elif rule.type == "Exclusivity":
                    k_exclusivity(rule, fs, sel, sink)
                elif rule.type == "Primitive":
                    k_primitive(rule, fs, sel, sink)
                elif rule.type == "Extension":
                    k_extension(rule, fs, sel, sink)
                elif rule.type == "Reference":
                    k_reference(rule, fs, sel, sink, self.registry_keys)
            except Exception as exc:  # error isolation per rule
                sink.add_docs(
                    fs, np.arange(0, 1) if fs.n_docs else np.empty(0, np.int64),
                    source=E.SRC_PIPELINE, severity=E.SEV_ERROR, rule_id=rule.id,
                    error_code=E.RULE_EXECUTION_ERROR, path="",
                    details=[_canon_details({"error": type(exc).__name__, "msg": str(exc)[:200]})],
                )

        return sink.finalize(
            dedup_structure=self.profile.settings.get("dedupStructure", True)
        )
