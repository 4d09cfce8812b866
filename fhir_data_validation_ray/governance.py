"""Rule-set governance review — the analogue of the reference's
metadata-only authoring quality gate (``Governance/RuleReviewEngine.cs:
35-960``, ``Governance/RuleReviewResult.cs``).

Deterministic linting over RAW rule dicts (the pre-``parse_profile``
authoring shape): no data access, no validation run, only rule metadata —
exactly the reference's contract (``RuleReviewEngine.cs:12-16``). Statuses:
``OK`` (exportable), ``WARNING`` (allowed but flagged), ``BLOCKED`` (must
be fixed before save/export; ``ProfileStore.publish(review=True)``
enforces this).

Documented divergences from the reference's checks (both flagged at
WARNING here instead of BLOCKED, with the reason in the issue facts):

- ``REFERENCE_RULE_NOT_SUPPORTED`` / ``FULLURLIDMATCH_RULE_NOT_SUPPORTED``
  (``:635-686``): the reference blocks these because ITS runtime silently
  skips them; this engine implements both rule types
  (``kernels.py:k_reference``, ``:k_full_url_id_match``), so authoring
  them is legitimate — the review still surfaces the portability concern.
- ``REQUIRED_RESOURCES_INVALID_CONFIG`` range mode (``min < max``,
  ``:409-520``): the reference's authoring contract allows only "at
  least" (max absent) or "exactly" (max == min); this engine's
  RequiredSpans kernel supports true ranges, so a range demotes to
  WARNING rather than BLOCKED.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

OK = "OK"
WARNING = "WARNING"
BLOCKED = "BLOCKED"
_RANK = {OK: 0, WARNING: 1, BLOCKED: 2}

# rule types allowed to omit fieldPath (bundle/resource-level validation,
# ``RuleReviewEngine.cs:166-175``) — RequiredSpans is the engine's
# RequiredResources/Resource analogue
_NO_FIELDPATH_OK = ("RequiredSpans", "Resource", "CustomFHIRPath",
                    "CustomPredicate")


@dataclass(frozen=True)
class ReviewIssue:
    """``RuleReviewResult.cs:29-50`` RuleReviewIssue: structured facts,
    no prose generation."""

    code: str
    severity: str
    rule_id: str
    facts: dict[str, Any] = field(default_factory=dict)


@dataclass
class ReviewResult:
    rule_id: str
    status: str = OK
    issues: list[ReviewIssue] = field(default_factory=list)

    def add(self, issue: ReviewIssue) -> None:
        self.issues.append(issue)
        if _RANK[issue.severity] > _RANK[self.status]:
            self.status = issue.severity


def _as_int(v: Any) -> int | None:
    """int(v) or None — review code must flag malformed min/max, not
    crash on it."""
    try:
        return int(v)
    except (TypeError, ValueError):
        return None


def _identity_key(rule: dict[str, Any]) -> str:
    """Duplicate identity: type + kind + fieldPath + InstanceScope stable
    key (``RuleIdentity.GetIdentityKey`` / ``InstanceScope.ToStableKey``)."""
    scope = rule.get("instanceScope") or {}
    conds = scope.get("where") or scope.get("conditions") or []
    cond_key = "|".join(str(c) for c in conds)
    return "|".join([
        str(rule.get("type", "")), str(rule.get("kind", "*")),
        str(rule.get("fieldPath", "")), str(scope.get("kind", "all")),
        cond_key,
    ])


def review_rule(rule: dict[str, Any]) -> ReviewResult:
    """Single-rule review (``RuleReviewEngine.cs:53-81`` Review)."""
    r = ReviewResult(str(rule.get("id", "")))
    rtype = str(rule.get("type", ""))
    params = rule.get("params") or {}

    # BLOCKED: empty fieldPath (:166-190); bundle-level types exempt
    if rtype not in _NO_FIELDPATH_OK and not str(
            rule.get("fieldPath", "") or "").strip():
        r.add(ReviewIssue("EMPTY_FIELD_PATH", BLOCKED, r.rule_id, {
            "ruleType": rtype,
            "reason": "FieldPath is required for all rules"}))

    # BLOCKED: QuestionAnswer without a question catalog (:195-216;
    # this engine inlines the set as params.questions)
    if rtype == "QuestionAnswer":
        if not params.get("questions") and not str(
                params.get("questionSetId", "") or "").strip():
            r.add(ReviewIssue("QUESTION_ANSWER_WITHOUT_QUESTION_SET_ID",
                              BLOCKED, r.rule_id, {
                                  "ruleType": rtype,
                                  "fieldPath": rule.get("fieldPath",
                                                        "(not set)")}))
        # BLOCKED: inline catalog entries must satisfy the per-answer-type
        # contract (QuestionValidator.cs:14-260; validator below)
        if isinstance(params.get("questions"), list):
            for code, errs in validate_question_catalog(
                    params["questions"]).items():
                r.add(ReviewIssue("QUESTION_CATALOG_INVALID", BLOCKED,
                                  r.rule_id, {
                                      "questionCode": code,
                                      "errors": errs}))
        # WARNING: provided errorCode is ignored at runtime (:221-245)
        if str(rule.get("errorCode", "") or "").strip():
            r.add(ReviewIssue("QUESTIONANSWER_ERROR_CODE_IGNORED", WARNING,
                              r.rule_id, {
                                  "ruleType": rtype,
                                  "providedErrorCode": rule["errorCode"],
                                  "reason": "QuestionAnswer is constraint-"
                                            "driven; runtime emits the "
                                            "outcome-specific errorCode"}))

    # BLOCKED: CodeSystem parameter contract (:294-373); this engine binds
    # concepts by canonical URL, so only `system` is required (codeSetId
    # has no analogue — the profile's codeSystems table IS the CodeSet)
    if rtype == "CodeSystem":
        if not params:
            r.add(ReviewIssue("CODESYSTEM_MISSING_PARAMS", BLOCKED,
                              r.rule_id, {
                                  "ruleType": rtype,
                                  "requiredParams": ["system"],
                                  "reason": "CodeSystem rules require the "
                                            "canonical system URL"}))
        elif not str(params.get("system", "") or "").strip():
            r.add(ReviewIssue("CODESYSTEM_MISSING_SYSTEM", BLOCKED,
                              r.rule_id, {
                                  "ruleType": rtype,
                                  "missingParam": "system"}))
        if params and "codes" in params:
            r.add(ReviewIssue("CODESYSTEM_MANUAL_CODES_PROVIDED", WARNING,
                              r.rule_id, {
                                  "ruleType": rtype,
                                  "providedParam": "codes",
                                  "reason": "manual codes[] is an advanced "
                                            "restriction mode"}))

    # RequiredSpans configuration contract (:409-630)
    if rtype in ("RequiredSpans", "RequiredResources", "Resource"):
        reqs = params.get("requirements")
        if not isinstance(reqs, list) or not reqs:
            r.add(ReviewIssue("REQUIRED_RESOURCES_INVALID_CONFIG", BLOCKED,
                              r.rule_id, {
                                  "ruleType": rtype,
                                  "reason": "Missing or empty "
                                            "'requirements' array"}))
        else:
            seen: set[str] = set()
            for i, req in enumerate(reqs):
                if not isinstance(req, dict):
                    r.add(ReviewIssue("REQUIRED_RESOURCES_INVALID_CONFIG",
                                      BLOCKED, r.rule_id, {
                                          "requirementIndex": i,
                                          "reason": "requirement is not an "
                                                    "object"}))
                    continue
                kind = str(req.get("kind", req.get("resourceType", ""))
                           or "").strip()
                if not kind:
                    r.add(ReviewIssue("REQUIRED_RESOURCES_INVALID_CONFIG",
                                      BLOCKED, r.rule_id, {
                                          "requirementIndex": i,
                                          "reason": "Missing or empty "
                                                    "'kind' in requirement"}))
                    continue
                if kind in seen:
                    r.add(ReviewIssue("REQUIRED_RESOURCES_INVALID_CONFIG",
                                      BLOCKED, r.rule_id, {
                                          "kind": kind,
                                          "reason": "Duplicate kind in "
                                                    "requirements"}))
                seen.add(kind)
                mn, mx = req.get("min"), req.get("max")
                mn_i = _as_int(mn)
                mx_i = _as_int(mx)
                if mn is None or mn_i is None or mn_i < 1:
                    # non-numeric min ("two") lands here too — the review
                    # must FLAG malformed authoring input, never crash on it
                    r.add(ReviewIssue("REQUIRED_RESOURCES_INVALID_CONFIG",
                                      BLOCKED, r.rule_id, {
                                          "kind": kind, "min": mn,
                                          "reason": "min must be a present "
                                                    "integer >= 1"}))
                elif mx is not None and mx_i is None:
                    r.add(ReviewIssue("REQUIRED_RESOURCES_INVALID_CONFIG",
                                      BLOCKED, r.rule_id, {
                                          "kind": kind, "min": mn, "max": mx,
                                          "reason": "max must be an "
                                                    "integer"}))
                elif mx_i is not None and mx_i < mn_i:
                    r.add(ReviewIssue("REQUIRED_RESOURCES_INVALID_CONFIG",
                                      BLOCKED, r.rule_id, {
                                          "kind": kind, "min": mn, "max": mx,
                                          "reason": "max < min is an "
                                                    "invalid range"}))
                elif mx_i is not None and mx_i != mn_i:
                    # reference contract: min-only or exact — this engine
                    # supports ranges, so demote to WARNING (divergence
                    # documented in the module docstring)
                    r.add(ReviewIssue("REQUIRED_RESOURCES_INVALID_CONFIG",
                                      WARNING, r.rule_id, {
                                          "kind": kind, "min": mn, "max": mx,
                                          "reason": "range mode is outside "
                                                    "the reference authoring "
                                                    "contract (min-only or "
                                                    "exact)"}))

    # authoring-portability flags for system-level rule types (:635-686;
    # WARNING here — this engine implements both, divergence documented)
    if rtype == "Reference":
        r.add(ReviewIssue("REFERENCE_RULE_NOT_SUPPORTED", WARNING,
                          r.rule_id, {
                              "ruleType": rtype,
                              "reason": "the reference engine handles "
                                        "references system-level only; "
                                        "this engine implements the rule "
                                        "type (divergence documented)"}))
    if rtype.lower() == "fullurlidmatch":
        r.add(ReviewIssue("FULLURLIDMATCH_RULE_NOT_SUPPORTED", WARNING,
                          r.rule_id, {
                              "ruleType": rtype,
                              "reason": "documented-but-unimplemented in "
                                        "the reference engine; implemented "
                                        "here (divergence documented)"}))
    return r


def review_rule_set(rules: list[dict[str, Any]]) -> list[ReviewResult]:
    """Rule-set review (``RuleReviewEngine.cs:83-108`` ReviewRuleSet):
    per-rule checks + duplicate / field-error-code-conflict / single-
    composition-rule set-level checks."""
    results = [review_rule(r) for r in rules]
    # set-level issues attach by POSITION, never by id: two rules sharing
    # an id must each carry their own issues (an id-keyed dict silently
    # drops all but the last — the exact authoring mistake this layer
    # exists to catch)

    # WARNING: duplicate rules by identity key (:760-808)
    seen: dict[str, str] = {}
    for i, rule in enumerate(rules):
        rid = str(rule.get("id", ""))
        if not str(rule.get("fieldPath", "") or "").strip() and \
                str(rule.get("type", "")) not in _NO_FIELDPATH_OK:
            continue  # caught by EMPTY_FIELD_PATH
        key = _identity_key(rule)
        if key in seen:
            results[i].add(ReviewIssue("DUPLICATE_RULE", WARNING, rid, {
                "duplicateOf": seen[key], "identityKey": key}))
        else:
            seen[key] = rid

    # WARNING: same field target, different explicit errorCodes (:868-950)
    field_codes: dict[str, dict[str, list[int]]] = {}
    for i, rule in enumerate(rules):
        code = str(rule.get("errorCode", "") or "").strip()
        if not code:
            continue
        fkey = _identity_key({**rule, "type": ""})  # field+scope only
        field_codes.setdefault(fkey, {}).setdefault(code, []).append(i)
    for fkey, codes in field_codes.items():
        if len(codes) > 1:
            idxs = sorted(i for ids in codes.values() for i in ids)
            involved = [str(rules[i].get("id", "")) for i in idxs]
            for i in idxs:
                results[i].add(ReviewIssue(
                    "FIELD_ERROR_CODE_CONFLICT", WARNING, results[i].rule_id,
                    {"fieldKey": fkey,
                     "errorCodes": sorted(codes),
                     "ruleIds": involved}))

    # BLOCKED: multiple composition (RequiredSpans) rules (:820-860) —
    # the bundle contract needs a single source of truth
    comp = [i for i, r in enumerate(rules)
            if str(r.get("type", "")) in ("RequiredSpans",
                                          "RequiredResources", "Resource")]
    if len(comp) > 1:
        comp_ids = [str(rules[i].get("id", "")) for i in comp]
        for i in comp:
            results[i].add(ReviewIssue(
                "DUPLICATE_BUNDLE_RESOURCE_RULE", BLOCKED,
                results[i].rule_id, {
                    "ruleIds": comp_ids,
                    "reason": "only one bundle-composition rule is "
                              "permitted per profile"}))
    return results


def review_summary(results: list[ReviewResult]) -> dict[str, Any]:
    """One-line exportability verdict over a rule-set review."""
    worst = OK
    for res in results:
        if _RANK[res.status] > _RANK[worst]:
            worst = res.status
    return {
        "status": worst,
        "exportable": worst != BLOCKED,
        "blocked": [r.rule_id for r in results if r.status == BLOCKED],
        "warnings": [r.rule_id for r in results if r.status == WARNING],
        "issues": sum(len(r.issues) for r in results),
    }


# ---------------------------------------------- question-catalog validator
_QUESTION_TYPES = ("boolean", "integer", "decimal", "code", "string",
                   "quantity")


def _has_num(q: dict[str, Any]) -> bool:
    return q.get("min") is not None or q.get("max") is not None


def _as_float(v: Any) -> float | None:
    """float(v) or None — the validator must FLAG malformed numeric
    authoring input (min: "abc"), never crash on it (the _as_int
    convention above)."""
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def validate_question(q: dict[str, Any]) -> list[str]:
    """Per-answer-type question-catalog lint — the analogue of the
    reference's ``Validation/Questions/QuestionValidator.cs:14-260``
    (each answer type's required/forbidden constraint fields), mapped onto
    this engine's inline question shape (``profiles.QA_QUESTIONS``:
    code/type/min/max/allowed/pattern/unit/maxLength/multiValue/binding).
    Returns error strings (empty = valid)."""
    errors: list[str] = []
    if not str(q.get("code", "") or "").strip():
        errors.append("Code is required")
    qtype = str(q.get("type", "") or "")
    if qtype not in _QUESTION_TYPES:
        errors.append(f"Unknown answer type '{qtype}'")
        return errors
    has_allowed = q.get("allowed") is not None
    has_unit = q.get("unit") is not None
    has_pattern = str(q.get("pattern", "") or "") != ""
    if qtype == "code":
        if not q.get("allowed"):
            errors.append("Code questions must have a value set ('allowed')")
        if has_unit:
            errors.append("Code questions cannot have Unit")
        if _has_num(q):
            errors.append("Code questions cannot have numeric constraints "
                          "(min/max)")
    elif qtype == "quantity":
        if not str(q.get("unit", "") or "").strip():
            errors.append("Quantity questions must have Unit")
        if has_allowed:
            errors.append("Quantity questions cannot have a value set")
        if has_pattern or q.get("maxLength") is not None:
            errors.append("Quantity questions cannot have string "
                          "constraints (maxLength/pattern)")
    elif qtype in ("integer", "decimal"):
        if has_unit:
            errors.append(f"{qtype.capitalize()} questions cannot have Unit")
        if has_allowed:
            errors.append(f"{qtype.capitalize()} questions cannot have a "
                          f"value set")
        if has_pattern or q.get("maxLength") is not None:
            errors.append(f"{qtype.capitalize()} questions cannot have "
                          f"string constraints (maxLength/pattern)")
        if qtype == "integer":
            for bound in ("min", "max"):
                v = q.get(bound)
                if v is None:
                    continue
                fv = _as_float(v)
                if fv is None:
                    errors.append(f"Integer questions must have numeric "
                                  f"{bound} value")
                elif fv != int(fv):
                    errors.append(f"Integer questions must have whole "
                                  f"number {bound} value")
    elif qtype == "string":
        if has_unit:
            errors.append("String questions cannot have Unit")
        if has_allowed:
            errors.append("String questions cannot have a value set")
        if _has_num(q):
            errors.append("String questions cannot have numeric "
                          "constraints (min/max)")
        if has_pattern:
            import re

            try:
                re.compile(q["pattern"])
            except re.error:
                errors.append("Regex pattern is invalid")
        ml = q.get("maxLength")
        if ml is not None:
            mlf = _as_float(ml)
            if mlf is None or mlf <= 0:
                errors.append("MaxLength must be positive")
    elif qtype == "boolean":
        if has_unit:
            errors.append("Boolean questions cannot have Unit")
        if has_allowed:
            errors.append("Boolean questions cannot have a value set")
        if _has_num(q):
            errors.append("Boolean questions cannot have numeric "
                          "constraints (min/max)")
    # min > max applies to every numeric-capable type; non-numeric bounds
    # are flagged, not crashed on
    mn, mx = q.get("min"), q.get("max")
    for bound, v in (("min", mn), ("max", mx)):
        if v is not None and _as_float(v) is None:
            errors.append(f"{bound} must be numeric")
    mnf, mxf = _as_float(mn), _as_float(mx)
    if mnf is not None and mxf is not None and mnf > mxf:
        errors.append("Min cannot be greater than Max")
    return errors


def validate_question_catalog(questions: list[dict[str, Any]]
                              ) -> dict[str, list[str]]:
    """Catalog sweep: question code -> error list (only invalid entries);
    duplicate codes are themselves an error on every duplicate."""
    out: dict[str, list[str]] = {}
    seen: dict[str, int] = {}
    for i, q in enumerate(questions):
        code = str(q.get("code", "") or f"#{i}")
        errs = validate_question(q)
        if code in seen:
            errs = errs + [f"Duplicate question code '{code}'"]
        seen[code] = i
        if errs:
            # MERGE with any earlier occurrence's errors — reassignment
            # would silently drop the first entry's problems when a later
            # duplicate is cleaner (review r5 finding)
            out[code] = out.get(code, []) + errs
    return out
