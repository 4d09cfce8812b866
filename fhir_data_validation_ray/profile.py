"""Validation-profile model (the ``rules.json`` analogue).

Shape and vocabulary mirror the reference rule DSL:
- ``Models/RuleSet.cs:10-129`` (RuleSet / RuleDefinition),
- ``Models/InstanceScope.cs:9-89`` (all | first | filter),
- ``docs/03_rule_dsl_spec.md:12-59`` (rule-type vocabulary),
- ``docs/04_data_inputs_spec.md:26-45`` (codeSystems shape).

A profile is compiled ONCE per validator actor (``__init__``) — an explicit
improvement over the reference, which recompiles FHIRPath per evaluation
(``RuleEngines/FhirPathRuleEngine.cs:2163``).

Compile-time validation mirrors ``Services/FieldPathValidator.cs`` and the
governance contract of fixed error codes per rule type
(``RuleEngines/FhirPathRuleEngine.cs:1036-1051``): a malformed rule fails at
profile-compile time on the driver, never inside a worker.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any

from . import errors as E

RULE_TYPES = (
    "Required",
    "FixedValue",
    "AllowedValues",
    "Regex",
    "ArrayLength",
    "CodeSystem",
    "CustomPredicate",
    "RequiredSpans",
    "Reference",
    "QuestionAnswer",
    "FullUrlIdMatch",
    "CodeMaster",
    "Exclusivity",
    "Primitive",
    "Extension",
)

# Primitive lexical types validated by the Primitive rule — the reference's
# per-type grammar validators (``Validation/JsonNodeStructuralValidator.cs:
# 84-97`` dispatch table; impls ``:738-829``, ``:1209-1262``).
PRIMITIVE_TYPES = (
    "boolean",
    "integer",
    "decimal",
    "date",
    "dateTime",
    "id",
    "string",
    "code",
    "uri",
    "url",
    "canonical",
)

QA_TYPES = ("boolean", "integer", "decimal", "code", "string", "quantity")
QA_BINDINGS = ("required", "extensible")

# Span fields addressable by fieldPath / filter conditions. ``spans`` is the
# document-level array (ArrayLength target).
SPAN_FIELDS = ("kind", "text", "media_ref", "offset")
DOC_FIELDS = ("doc_id", "spans")

SCOPE_KINDS = ("all", "first", "filter")

REFERENCE_POLICIES = ("InBundleOnly", "AllowExternal", "RequireResolution")

# Default validation class per rule type (``Models/ValidationClass.cs:14-44``).
DEFAULT_CLASS = {t: E.CLASS_CONTRACT for t in RULE_TYPES}

_COND_RE = re.compile(
    r"""^\s*(kind|text|media_ref|offset)\s*"""
    r"""(==|!=|=|\bcontains\b|\bstartswith\b|\bmatches\b|\bin\b)\s*(.+?)\s*$""",
    re.VERBOSE,
)


class ProfileError(ValueError):
    """Raised at profile-compile time (driver side) for malformed rules."""


@dataclass(frozen=True)
class Condition:
    """One comparison of the mini filter language: ``field op value``.

    The analogue of the reference's FilteredInstances FHIRPath condition
    (``Models/InstanceScope.cs:59-89``) and the RequiredResources ``where``
    operators ``=``, ``!=``, ``contains``, ``in``
    (``RuleEngines/FhirPathRuleEngine.cs:1888-1923``).
    """

    fld: str
    op: str
    value: Any  # str | int | list[str]


# --------------------------------------------------------- boolean expressions
# CustomPredicate expression AST — the common boolean FHIRPath sub-language
# the reference's planner accepts (``RuleEngines/FhirPathRuleEngine.cs:
# 1714-1768``, ``RuleEngines/RuleEvaluationPlanner.cs:19-146``): comparisons
# combined with ``and`` / ``or`` / ``not``, parentheses, and ``exists(field)``
# (the FHIRPath ``field.exists()`` analogue: present and non-whitespace).
# Null semantics are two-valued: a comparison on a null value is
# NON-MATCHING (False), and ``not`` inverts that — so ``not (text == 'x')``
# PASSES a null text. The oracle SQL for expression rules must spell this
# out with ``coalesce(..., FALSE)`` (SQL NULL logic is three-valued).
@dataclass(frozen=True)
class ExprLeaf:
    cond: "Condition"


@dataclass(frozen=True)
class ExprExists:
    fld: str


@dataclass(frozen=True)
class ExprNot:
    child: Any


@dataclass(frozen=True)
class ExprAnd:
    children: tuple


@dataclass(frozen=True)
class ExprOr:
    children: tuple


_EXISTS_RE = re.compile(r"^exists\(\s*(kind|text|media_ref)\s*\)$")
_KW_RE = re.compile(r"(and|or|not)(?=[\s(]|$)")


def _tokenize_expr(s: str) -> list[tuple[str, str]]:
    """Split an expression into ``lp`` / ``rp`` / ``and`` / ``or`` / ``not`` /
    ``cond`` tokens. Quoted values, ``[list]`` literals and ``exists(...)``
    calls are consumed atomically so keywords inside them never split."""
    toks: list[tuple[str, str]] = []
    buf = ""
    i, n = 0, len(s)

    def flush() -> None:
        nonlocal buf
        if buf.strip():
            toks.append(("cond", buf.strip()))
        buf = ""

    while i < n:
        c = s[i]
        if c in ("'", '"'):
            j = s.find(c, i + 1)
            if j < 0:
                raise ProfileError(f"unterminated quote in expr: {s!r}")
            buf += s[i:j + 1]
            i = j + 1
            continue
        if c == "[":
            j = s.find("]", i)
            if j < 0:
                raise ProfileError(f"unterminated [list] in expr: {s!r}")
            buf += s[i:j + 1]
            i = j + 1
            continue
        if c == "(":
            if buf.rstrip().endswith("exists"):
                j = s.find(")", i)
                if j < 0:
                    raise ProfileError(f"unterminated exists() in expr: {s!r}")
                buf += s[i:j + 1]
                i = j + 1
                continue
            flush()
            toks.append(("lp", "("))
            i += 1
            continue
        if c == ")":
            flush()
            toks.append(("rp", ")"))
            i += 1
            continue
        m = _KW_RE.match(s, i)
        at_boundary = i == 0 or s[i - 1] in " \t()"
        if m and at_boundary and (m.group(1) != "not" or not buf.strip()):
            flush()
            toks.append((m.group(1), m.group(1)))
            i = m.end()
            continue
        buf += c
        i += 1
    flush()
    return toks


def _parse_expr_or(toks: list, pos: int):
    node, pos = _parse_expr_and(toks, pos)
    children = [node]
    while pos < len(toks) and toks[pos][0] == "or":
        nxt, pos = _parse_expr_and(toks, pos + 1)
        children.append(nxt)
    return (ExprOr(tuple(children)) if len(children) > 1 else children[0]), pos


def _parse_expr_and(toks: list, pos: int):
    node, pos = _parse_expr_unary(toks, pos)
    children = [node]
    while pos < len(toks) and toks[pos][0] == "and":
        nxt, pos = _parse_expr_unary(toks, pos + 1)
        children.append(nxt)
    return (ExprAnd(tuple(children)) if len(children) > 1 else children[0]), pos


def _parse_expr_unary(toks: list, pos: int):
    if pos >= len(toks):
        raise ProfileError("expression ended unexpectedly")
    kind, val = toks[pos]
    if kind == "not":
        child, pos = _parse_expr_unary(toks, pos + 1)
        return ExprNot(child), pos
    if kind == "lp":
        node, pos = _parse_expr_or(toks, pos + 1)
        if pos >= len(toks) or toks[pos][0] != "rp":
            raise ProfileError("missing ')' in expression")
        return node, pos + 1
    if kind == "cond":
        m = _EXISTS_RE.match(val)
        if m:
            return ExprExists(m.group(1)), pos + 1
        if val.startswith("exists"):
            raise ProfileError(
                f"exists() takes one of (kind, text, media_ref): {val!r}"
            )
        return ExprLeaf(parse_condition(val)), pos + 1
    raise ProfileError(f"unexpected {val!r} in expression")


def parse_expr(s: str):
    """Parse a boolean predicate expression into its AST. Precedence:
    ``not`` > ``and`` > ``or``; parentheses group. Raises ProfileError at
    profile-compile time (driver side) on any syntax error — a malformed
    expression never reaches a worker."""
    toks = _tokenize_expr(str(s))
    if not toks:
        raise ProfileError("empty expression")
    node, pos = _parse_expr_or(toks, 0)
    if pos != len(toks):
        raise ProfileError(f"trailing tokens in expression {s!r}")
    return node


@dataclass(frozen=True)
class InstanceScope:
    kind: str = "all"  # all | first | filter
    conditions: tuple[Condition, ...] = ()

    def stable_key(self) -> str:
        # ``Models/InstanceScope.cs:22-25`` ToStableKey analogue (dup detection)
        parts = [self.kind] + [f"{c.fld}{c.op}{c.value!r}" for c in self.conditions]
        return "|".join(parts)


@dataclass(frozen=True)
class Question:
    """One question contract of the QuestionAnswer engine — the analogue of
    the reference's per-question typed answer checks
    (``Validation/QuestionAnswer/QuestionAnswerValidator.cs:54-1250``):
    type-dispatched validation (boolean / integer / decimal / code / string)
    with ranges, patterns, value sets, multiValue and ValueSet binding
    strength (required -> error, extensible -> warning,
    ``JsonNodeStructuralValidator.cs:500-548``)."""

    code: str
    type: str  # boolean | integer | decimal | code | string | quantity
    allowed: tuple[str, ...] = ()
    min: float | None = None
    max: float | None = None
    pattern: str | None = None
    multi_value: bool = False
    binding: str = "required"  # required | extensible
    # quantity answers ("<value> <unit>"): expected unit code; the unit AND
    # range checks both run, like the reference's quantity dispatch
    # (``QuestionAnswerValidator.cs:585-736``)
    unit: str | None = None


@dataclass(frozen=True)
class CodeMasterQuestion:
    """One question of a CodeMaster screening: allowed-answer membership +
    multiValue contract (``RuleEngines/CodeMasterEngine.cs:12-235``)."""

    code: str
    allowed_answers: tuple[str, ...]
    multi_value: bool = False


@dataclass(frozen=True)
class Screening:
    code: str
    questions: dict[str, CodeMasterQuestion]


@dataclass(frozen=True)
class SpanRequirement:
    kind: str
    min: int = 0
    max: int | None = None
    where: tuple[Condition, ...] = ()
    # Document-level gate: the requirement applies only to documents that
    # contain >=1 span of ``when_kind`` (the span-model analogue of a
    # conditional spec hint's "<parent>.exists()" condition,
    # ``Authoring/SpecHintService.cs:230-300``). ``per_parent`` scales the
    # minimum to the per-document count of ``when_kind`` (AppliesToEach:
    # each parent instance needs its own child, ``SpecHint.cs:46-54``).
    when_kind: str | None = None
    per_parent: bool = False


@dataclass(frozen=True)
class RuleDef:
    id: str
    type: str
    kind: str = "*"  # target span kind; "*" = any (≈ resourceType)
    field_path: str = "text"
    scope: InstanceScope = field(default_factory=InstanceScope)
    severity: str = E.SEV_ERROR
    validation_class: str = E.CLASS_CONTRACT
    error_code: str | None = None  # overridable (ArrayLength only, per reference)
    # Advisory downgrade gates (``SeverityResolver.cs:35-76``): error->warning
    # only when the Advisory rule is heuristic or spec-hint
    is_heuristic: bool = False
    is_spec_hint: bool = False
    params: dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class CodeSystem:
    url: str
    concepts: tuple[str, ...]


@dataclass
class Profile:
    version: str
    rules: list[RuleDef]
    code_systems: dict[str, CodeSystem]
    allowed_kinds: tuple[str, ...] = ()  # enum binding for spans.kind ("" = open)
    settings: dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def from_json(text: str) -> "Profile":
        return parse_profile(json.loads(text))

    @staticmethod
    def from_file(path: str) -> "Profile":
        with open(path) as f:
            return parse_profile(json.load(f))


def parse_condition(expr: str) -> Condition:
    m = _COND_RE.match(expr)
    if not m:
        raise ProfileError(f"unparseable condition: {expr!r}")
    fld, op, raw = m.group(1), m.group(2), m.group(3)
    if op == "=":
        op = "=="
    value: Any
    if op == "in":
        if not (raw.startswith("[") and raw.endswith("]")):
            raise ProfileError(f"'in' expects a [list]: {expr!r}")
        value = [_unquote(v.strip()) for v in raw[1:-1].split(",") if v.strip()]
    elif fld == "offset":
        try:
            value = int(raw)
        except ValueError as e:
            raise ProfileError(f"offset comparison needs an int: {expr!r}") from e
    else:
        value = _unquote(raw)
    if op == "matches":
        try:
            re.compile(str(value))
        except re.error as e:
            raise ProfileError(f"bad regex in condition {expr!r}: {e}") from e
    return Condition(fld, op, value)


def _unquote(s: str) -> str:
    if len(s) >= 2 and s[0] == s[-1] and s[0] in ("'", '"'):
        return s[1:-1]
    return s


def _parse_scope(obj: Any) -> InstanceScope:
    if obj is None:
        return InstanceScope()
    kind = obj.get("kind", "all")
    if kind not in SCOPE_KINDS:
        raise ProfileError(f"unknown instanceScope kind: {kind!r}")
    conds: tuple[Condition, ...] = ()
    if kind == "filter":
        raw = obj.get("condition")
        if not raw:
            raise ProfileError("filter scope requires a condition")
        conds = tuple(parse_condition(p) for p in str(raw).split(" and "))
    return InstanceScope(kind, conds)


def _parse_where(items: Any) -> tuple[Condition, ...]:
    if not items:
        return ()
    out = []
    for it in items:
        if isinstance(it, str):
            out.append(parse_condition(it))
        else:  # {"field":..,"op":..,"value":..} object form
            out.append(
                parse_condition(f"{it['field']} {it.get('op', '==')} {json.dumps(it['value'])}")
            )
    return tuple(out)


def parse_profile(obj: dict[str, Any]) -> Profile:
    """Parse + validate a profile dict. Fails fast (ProfileError) on any
    malformed rule — the compile-time analogue of FieldPathValidator +
    RULE_CONFIGURATION_ERROR paths."""
    rules: list[RuleDef] = []
    seen_ids: set[str] = set()
    seen_defs: dict[str, str] = {}  # stable definition key -> first rule id
    code_systems: dict[str, CodeSystem] = {}

    for cs in obj.get("codeSystems", []) or []:
        url = cs.get("url") or cs.get("system")
        if not url:
            raise ProfileError("codeSystem without url")
        concepts = tuple(
            c["code"] if isinstance(c, dict) else str(c) for c in cs.get("concept", cs.get("concepts", []))
        )
        code_systems[url] = CodeSystem(url=url, concepts=concepts)

    for r in obj.get("rules", []) or []:
        rid = r.get("id")
        rtype = r.get("type")
        if not rid:
            raise ProfileError(f"rule without id: {r}")
        if rid in seen_ids:
            raise ProfileError(f"duplicate rule id: {rid}")
        seen_ids.add(rid)
        if rtype not in RULE_TYPES:
            raise ProfileError(f"rule {rid}: unknown type {rtype!r}")
        # scope-level duplicate detection (``Models/InstanceScope.cs:22-25``
        # ToStableKey): two rules with the same type/kind/fieldPath/scope/
        # params are the same rule under different ids — a governance error.
        def_key = json.dumps(
            {
                "type": rtype,
                "kind": r.get("kind", r.get("resourceType", "*")),
                "fieldPath": r.get("fieldPath", "text"),
                "scope": r.get("instanceScope"),
                "params": r.get("params"),
            },
            sort_keys=True, default=str,
        )
        if def_key in seen_defs:
            raise ProfileError(
                f"rule {rid}: duplicate definition of rule {seen_defs[def_key]!r} "
                "(same type/kind/fieldPath/scope/params)"
            )
        seen_defs[def_key] = rid
        fp = r.get("fieldPath", "text")
        params = dict(r.get("params", {}) or {})
        scope = _parse_scope(r.get("instanceScope"))
        _validate_rule(rid, rtype, fp, params, code_systems)
        if rtype == "CustomPredicate" and params.get("expr"):
            # compile the boolean expression ONCE at profile-parse time (the
            # FieldPathValidator analogue): workers evaluate the AST, never
            # re-parse, and syntax errors surface on the driver
            try:
                params["expr_ast"] = parse_expr(str(params["expr"]))
            except ProfileError as e:
                raise ProfileError(f"rule {rid}: {e}") from e
        if rtype == "RequiredSpans":
            reqs = []
            for q in params.get("requirements", []):
                reqs.append(
                    SpanRequirement(
                        kind=q["kind"],
                        min=int(q.get("min", 0)),
                        max=(int(q["max"]) if q.get("max") is not None else None),
                        where=_parse_where(q.get("where")),
                        when_kind=q.get("whenKind"),
                        per_parent=bool(q.get("perParent", False)),
                    )
                )
            params["requirements"] = reqs
        if rtype == "CodeMaster":
            scr = {}
            for sdef in params.get("screenings", []):
                qmap = {
                    str(q["code"]): CodeMasterQuestion(
                        code=str(q["code"]),
                        allowed_answers=tuple(str(v) for v in q.get("allowedAnswers", [])),
                        multi_value=bool(q.get("multiValue", False)),
                    )
                    for q in sdef.get("questions", [])
                }
                scr[str(sdef["code"])] = Screening(code=str(sdef["code"]), questions=qmap)
            params["screenings"] = scr
        if rtype == "QuestionAnswer":
            qs = []
            for q in params.get("questions", []):
                qs.append(
                    Question(
                        code=str(q["code"]),
                        type=q["type"],
                        allowed=tuple(str(v) for v in q.get("allowed", []) or []),
                        min=(float(q["min"]) if q.get("min") is not None else None),
                        max=(float(q["max"]) if q.get("max") is not None else None),
                        pattern=q.get("pattern"),
                        multi_value=bool(q.get("multiValue", False)),
                        binding=q.get("binding", "required"),
                        unit=q.get("unit"),
                    )
                )
            params["questions"] = qs
        rules.append(
            RuleDef(
                id=rid,
                type=rtype,
                kind=r.get("kind", r.get("resourceType", "*")),
                field_path=fp,
                scope=scope,
                severity=r.get("severity", E.SEV_ERROR),
                validation_class=r.get("validationClass", DEFAULT_CLASS[rtype]),
                error_code=r.get("errorCode"),
                is_heuristic=bool(r.get("isHeuristic", False)),
                is_spec_hint=bool(r.get("isSpecHint", False)),
                params=params,
            )
        )

    return Profile(
        version=str(obj.get("version", "1.0")),
        rules=rules,
        code_systems=code_systems,
        allowed_kinds=tuple(obj.get("allowedKinds", []) or []),
        settings=dict(obj.get("settings", {}) or {}),
    )


def _validate_rule(
    rid: str, rtype: str, fp: str, params: dict[str, Any], code_systems: dict[str, CodeSystem]
) -> None:
    if rtype == "ArrayLength":
        if fp not in ("spans",) and fp not in SPAN_FIELDS:
            raise ProfileError(f"rule {rid}: ArrayLength fieldPath must be 'spans'")
        if params.get("min") is None and params.get("max") is None:
            raise ProfileError(f"rule {rid}: ArrayLength needs min and/or max")
    elif rtype in ("RequiredSpans", "Reference", "FullUrlIdMatch", "Exclusivity"):
        if rtype == "Exclusivity":
            flds = params.get("fields") or []
            if len(flds) < 2 or any(f not in ("kind", "text", "media_ref") for f in flds):
                raise ProfileError(
                    f"rule {rid}: Exclusivity needs >=2 string span fields, got {flds!r}"
                )
    elif fp not in SPAN_FIELDS:
        raise ProfileError(f"rule {rid}: fieldPath must be one of {SPAN_FIELDS}, got {fp!r}")

    if rtype == "FixedValue" and "value" not in params:
        raise ProfileError(f"rule {rid}: FixedValue needs params.value")
    if rtype == "AllowedValues" and not params.get("values"):
        raise ProfileError(f"rule {rid}: AllowedValues needs params.values")
    if rtype == "Regex":
        pat = params.get("pattern")
        if not pat:
            raise ProfileError(f"rule {rid}: Regex needs params.pattern")
        try:
            re.compile(pat)
        except re.error as e:
            raise ProfileError(f"rule {rid}: bad pattern: {e}") from e
    if rtype == "CodeSystem":
        sys_url = params.get("system")
        if not sys_url:
            # empty system is a compile-time error; an UNKNOWN system is NOT —
            # it degrades to per-span RULE_CONFIGURATION_ERROR rows at runtime
            # while every other rule keeps running, mirroring the reference's
            # terminology-fallback-miss path (``FhirPathRuleEngine.cs:1515-1583``)
            raise ProfileError(f"rule {rid}: CodeSystem needs params.system")
    if rtype == "Primitive":
        prim = params.get("primitive")
        if prim not in PRIMITIVE_TYPES:
            raise ProfileError(
                f"rule {rid}: Primitive needs params.primitive in {PRIMITIVE_TYPES}, got {prim!r}"
            )
    if rtype == "CustomPredicate" and not params.get("expr") and not params.get("predicate"):
        raise ProfileError(f"rule {rid}: CustomPredicate needs params.expr or params.predicate")
    if rtype == "RequiredSpans" and not params.get("requirements"):
        raise ProfileError(f"rule {rid}: RequiredSpans needs params.requirements")
    if rtype == "Reference":
        pol = params.get("policy", "InBundleOnly")
        if pol not in REFERENCE_POLICIES:
            raise ProfileError(f"rule {rid}: unknown reference policy {pol!r}")
    if rtype == "CodeMaster":
        if not params.get("screenings"):
            raise ProfileError(f"rule {rid}: CodeMaster needs params.screenings")
        for sdef in params["screenings"]:
            if not sdef.get("code"):
                raise ProfileError(f"rule {rid}: screening without code")
            for q in sdef.get("questions", []):
                if not q.get("allowedAnswers"):
                    raise ProfileError(
                        f"rule {rid}: screening question {q.get('code')!r} needs allowedAnswers"
                    )
    if rtype == "QuestionAnswer":
        qs = params.get("questions")
        if not qs:
            raise ProfileError(f"rule {rid}: QuestionAnswer needs params.questions")
        for q in qs:
            if q.get("type") not in QA_TYPES:
                raise ProfileError(
                    f"rule {rid}: question {q.get('code')!r} has unknown type {q.get('type')!r}"
                )
            if q.get("binding", "required") not in QA_BINDINGS:
                raise ProfileError(
                    f"rule {rid}: question {q.get('code')!r} has unknown binding"
                )
            if q["type"] == "code" and not q.get("allowed"):
                raise ProfileError(
                    f"rule {rid}: code question {q.get('code')!r} needs allowed[]"
                )
            if q["type"] == "string" and q.get("pattern"):
                try:
                    re.compile(q["pattern"])
                except re.error as e:
                    raise ProfileError(
                        f"rule {rid}: question {q.get('code')!r} bad pattern: {e}"
                    ) from e
