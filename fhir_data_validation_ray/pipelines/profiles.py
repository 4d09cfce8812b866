"""The default validation profile — the ``rules.json`` analogue used by the
flagship pipeline, tests and bench. Vocabulary per FIXTURES.md §3 /
``Models/RuleSet.cs:51-129``; values aligned with the deterministic fixture
generator (``sources/generator.py``)."""

from __future__ import annotations

import copy

from ..sources.generator import ALLOWED_KINDS

# NRIC pattern from the reference fixture ``Fixtures/sample-rules.json:35``.
NRIC_PATTERN = "^[STFG]\\d{7}[A-Z]$"

# Question catalog for the QuestionAnswer engine — mirrors the deterministic
# fixture generator's QA payloads (``sources/generator.py:_gen_qa_text``).
# Screening catalog for the CodeMaster engine — mirrors the fixture
# generator's screening payloads (``sources/generator.py:_gen_cm_text``).
CM_SCREENINGS = [
    {"code": "SCR1", "questions": [
        {"code": "Q1", "allowedAnswers": ["yes", "no"]},
        {"code": "Q2", "allowedAnswers": ["a", "b", "c"], "multiValue": True},
    ]},
    {"code": "SCR2", "questions": [
        {"code": "Q3", "allowedAnswers": ["low", "high"]},
    ]},
]

QA_QUESTIONS = [
    {"code": "Q1", "type": "boolean"},
    {"code": "Q2", "type": "integer", "min": 0, "max": 120},
    {"code": "Q3", "type": "code", "allowed": ["mild", "moderate", "severe"]},
    {"code": "Q4", "type": "string", "pattern": "^[A-Z]{2}[0-9]{4}$"},
    {"code": "Q5", "type": "code", "allowed": ["a", "b", "c"], "multiValue": True},
    {"code": "Q6", "type": "decimal", "min": 0, "max": 40.5},
    {"code": "Q7", "type": "code", "allowed": ["x", "y"], "binding": "extensible"},
    {"code": "Q8", "type": "quantity", "unit": "mg", "min": 0, "max": 10},
]

DEFAULT_PROFILE: dict = {
    "version": "1.0",
    "allowedKinds": list(ALLOWED_KINDS),
    "settings": {"checkDocId": True, "checkSpanOrder": True,
                 "checkRefGrammar": True, "checkEmptyDoc": True,
                 "dedupStructure": True},
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
        {"id": "R9", "type": "QuestionAnswer", "kind": "Question",
         "fieldPath": "text", "params": {"questions": QA_QUESTIONS}},
        {"id": "R10", "type": "CodeMaster", "kind": "Screening",
         "fieldPath": "text", "params": {"screenings": CM_SCREENINGS}},
        {"id": "R11", "type": "Primitive", "kind": "date", "fieldPath": "text",
         "params": {"primitive": "date"}},
        {"id": "R12", "type": "Primitive", "kind": "dateTime", "fieldPath": "text",
         "params": {"primitive": "dateTime"}},
        {"id": "R13", "type": "Primitive", "kind": "uri", "fieldPath": "text",
         "params": {"primitive": "uri"}},
    ],
}


def default_profile() -> dict:
    return copy.deepcopy(DEFAULT_PROFILE)


def heavy_profile(n_regex: int = 12) -> dict:
    """Rule-rich profile for scaling measurements — representative of a real
    deployment (the reference's project rule sets run dozens of rules per
    bundle, ``docs/03_rule_dsl_spec.md``). Adds regex batteries across kinds,
    filter-scoped variants, extra value-set and fixed-value rules on top of
    the default profile, raising compute-per-byte so that throughput is
    CPU-bound (the regime a 100 TB cluster run is provisioned for) rather
    than parquet-decode-bandwidth-bound."""
    p = default_profile()
    # include the primitive-grammar kinds: a rule-rich profile validates
    # EVERY span it decodes, keeping compute-per-byte high (the g13 corpus
    # is 45% primitive spans; leaving them rule-free makes the pipeline
    # decode-bandwidth-bound at high parallelism on this single box)
    kinds = ["Patient", "Observation", "Coding", "Encounter", "text",
             "date", "dateTime", "uri"]
    # permissive patterns: full regex evaluation cost over every selected
    # span, near-zero violations (a production profile mostly passes)
    patterns = [
        "^[\\s\\S]{0,500}$",
        "^(?:[A-Za-z0-9 .|/:_-]|[\\s\\S])*$",
        "^(?:final|amended|preliminary|cancelled|[\\s\\S]*)$",
        "^.?",
        "(?:alpha|beta|gamma|delta|theta|)",
        "^(?:[STFG]\\d{7}[A-Z]|[\\s\\S]*)$",
    ]
    for i in range(n_regex):
        p["rules"].append(
            {"id": f"HR{i}", "type": "Regex", "kind": kinds[i % len(kinds)],
             "severity": "warning", "fieldPath": "text",
             "params": {"pattern": patterns[i % len(patterns)]}}
        )
    for i, k in enumerate(kinds):
        p["rules"].append(
            {"id": f"HA{i}", "type": "AllowedValues", "kind": k, "fieldPath": "kind",
             "severity": "warning",
             "instanceScope": {"kind": "filter", "condition": "text != ''"},
             "params": {"values": list(ALLOWED_KINDS)}}
        )
        p["rules"].append(
            {"id": f"HF{i}", "type": "FixedValue", "kind": k, "fieldPath": "kind",
             "severity": "warning", "params": {"value": k}}
        )
    p["rules"].append(
        {"id": "HQ", "type": "RequiredSpans", "kind": "*",
         "params": {"requirements": [
             {"kind": "Patient", "min": 0, "max": 500},
             {"kind": "Observation", "min": 0, "max": 500},
             {"kind": "image", "min": 0, "max": 500,
              "where": [{"field": "media_ref", "op": "!=", "value": ""}]},
         ], "rejectUndeclared": False}}
    )
    # second grammar pass over the primitive kinds (canonical is a superset
    # check on uri spans; date/dateTime get their full calendar arithmetic
    # again under different rule ids — pure extra vectorized compute)
    for i, (k, prim) in enumerate(
        [("date", "dateTime"), ("dateTime", "string"), ("uri", "canonical"),
         ("uri", "url"), ("date", "string"), ("dateTime", "code")]
    ):
        p["rules"].append(
            {"id": f"HP{i}", "type": "Primitive", "kind": k, "fieldPath": "text",
             "severity": "warning", "params": {"primitive": prim}}
        )
    return p


class ProfileStore:
    """Published / versioned profile snapshots — the reference's rule-set
    publishing surface (``Models/RuleSet.cs:10-46`` carries ``version``; the
    governance docs require published rule sets to be immutable). Each
    ``publish`` validates the profile (compile check), writes an immutable
    content-addressed snapshot ``<version>-<hash12>.json`` plus a manifest
    entry; re-publishing the same version with DIFFERENT content is an
    error, re-publishing identical content is a no-op. Safe for concurrent
    publishers: the manifest read-append-rename runs under an exclusive
    ``flock`` (rename alone only prevents torn files, not lost updates)."""

    def __init__(self, root: str):
        import os

        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest = os.path.join(root, "manifest.json")

    def _read_manifest(self) -> list[dict]:
        import json
        import os

        if not os.path.exists(self._manifest):
            return []
        with open(self._manifest) as f:
            return json.load(f)

    @staticmethod
    def _hash(profile_obj: dict) -> str:
        import hashlib
        import json

        canon = json.dumps(profile_obj, sort_keys=True, separators=(",", ":"))
        return hashlib.sha256(canon.encode()).hexdigest()[:12]

    def publish(self, profile_obj: dict, *, review: bool = False) -> dict:
        import fcntl
        import json
        import os

        from ..profile import parse_profile

        parse_profile(profile_obj)  # compile check: never publish a broken profile
        if review:
            # governance gate (``RuleReviewResult.cs:20-22``: BLOCKED =
            # cannot be saved or exported). Opt-in: the review contract
            # deliberately flags rule shapes this engine supports but the
            # reference's authoring UI blocks (see governance.py docstring).
            from ..governance import review_rule_set, review_summary

            summary = review_summary(review_rule_set(
                profile_obj.get("rules", []) or []))
            if not summary["exportable"]:
                raise ValueError(
                    f"governance review BLOCKED publish: {summary['blocked']}")
        version = str(profile_obj.get("version", "1.0"))
        h = self._hash(profile_obj)
        # exclusive lock serializes the manifest read-modify-write: without
        # it two concurrent publishers each append to THEIR read of the
        # manifest and the loser's entry is silently dropped
        lock_path = os.path.join(self.root, ".manifest.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                entries = self._read_manifest()
                for e in entries:
                    if e["version"] == version:
                        if e["hash"] == h:
                            return e  # identical re-publish: no-op
                        raise ValueError(
                            f"version {version!r} already published with different "
                            f"content (hash {e['hash']} != {h}); bump the version"
                        )
                name = f"{version}-{h}.json"
                tmp = os.path.join(self.root, f".{name}.tmp.{os.getpid()}")
                with open(tmp, "w") as f:
                    json.dump(profile_obj, f, sort_keys=True)
                os.rename(tmp, os.path.join(self.root, name))
                entry = {"version": version, "hash": h, "file": name}
                entries.append(entry)
                tmp_m = self._manifest + f".tmp.{os.getpid()}"
                with open(tmp_m, "w") as f:
                    json.dump(entries, f, indent=1)
                os.rename(tmp_m, self._manifest)
                return entry
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)

    def versions(self) -> list[str]:
        return [e["version"] for e in self._read_manifest()]

    def load(self, version: str | None = None) -> dict:
        """Load a published snapshot (``None`` = latest published)."""
        import json
        import os

        entries = self._read_manifest()
        if not entries:
            raise FileNotFoundError(f"no published profiles under {self.root}")
        if version is None:
            e = entries[-1]
        else:
            matches = [x for x in entries if x["version"] == str(version)]
            if not matches:
                raise KeyError(f"version {version!r} not published")
            e = matches[0]
        with open(os.path.join(self.root, e["file"])) as f:
            obj = json.load(f)
        if self._hash(obj) != e["hash"]:
            raise ValueError(f"snapshot {e['file']} corrupted (hash mismatch)")
        return obj


def single_rule_profile(rule_id: str, *, with_structure: bool = False) -> dict:
    """Profile containing exactly one of the default rules — used by the
    per-operator oracle queries so each kernel is checked in isolation."""
    p = default_profile()
    p["rules"] = [r for r in p["rules"] if r["id"] == rule_id]
    if not with_structure:
        p["settings"]["checkDocId"] = False
        p["settings"]["checkSpanOrder"] = False
        p["settings"]["checkRefGrammar"] = False
        p["settings"]["checkEmptyDoc"] = False
        p["allowedKinds"] = []
    return p


def _concepts_by_url(obj: dict) -> dict[str, tuple[str, ...]]:
    out: dict[str, tuple[str, ...]] = {}
    for cs in obj.get("codeSystems", []) or []:
        url = cs.get("url") or cs.get("system")
        if not url:
            continue
        concepts = tuple(sorted(
            c["code"] if isinstance(c, dict) else str(c)
            for c in cs.get("concept", cs.get("concepts", [])) or []))
        out[url] = concepts
    return out


def profile_diff(old_obj: dict, new_obj: dict) -> dict:
    """Rule-level diff between two profile versions — the authoring question
    "what changed between published rule sets?" (the reference's immutable
    versioned rule sets make this the natural review surface;
    ``Models/RuleSet.cs:10-46``).

    Returns a dict with:
      ``added`` / ``removed``      rule ids present on one side only
      ``changed``                  [{id, fields}] same id, different definition
      ``code_systems_changed``     urls whose concept sets differ (incl.
                                   systems added/removed outright)
      ``settings_changed``         top-level structural keys that differ
                                   (settings / allowedKinds) — these alter the
                                   built-in STRUCTURE checks, not rule lanes
      ``impacted_old`` / ``impacted_new``  the rule ids whose emissions can
                                   differ on each side: removed/changed (old),
                                   added/changed (new), plus CodeSystem rules
                                   referencing a changed system on BOTH sides.
    """
    import json

    def canon(v) -> str:
        return json.dumps(v, sort_keys=True, default=str)

    ro = {r["id"]: r for r in old_obj.get("rules", []) or []}
    rn = {r["id"]: r for r in new_obj.get("rules", []) or []}
    added = sorted(set(rn) - set(ro))
    removed = sorted(set(ro) - set(rn))
    changed: list[dict] = []
    for rid in sorted(set(ro) & set(rn)):
        a, b = ro[rid], rn[rid]
        fields = sorted(
            k for k in (set(a) | set(b)) - {"id"}
            if canon(a.get(k)) != canon(b.get(k)))
        if fields:
            changed.append({"id": rid, "fields": fields})
    changed_ids = {c["id"] for c in changed}

    cs_old, cs_new = _concepts_by_url(old_obj), _concepts_by_url(new_obj)
    cs_changed = sorted(
        url for url in set(cs_old) | set(cs_new)
        if cs_old.get(url) != cs_new.get(url))

    def cs_impacted(rules: dict[str, dict]) -> list[str]:
        return [rid for rid, r in rules.items()
                if r.get("type") == "CodeSystem"
                and (r.get("params") or {}).get("system") in cs_changed
                and rid not in changed_ids]

    settings_changed = sorted(
        k for k in ("settings", "allowedKinds")
        if canon(old_obj.get(k)) != canon(new_obj.get(k)))

    impacted_old = sorted(set(removed) | changed_ids | set(cs_impacted(ro)))
    impacted_new = sorted(set(added) | changed_ids | set(cs_impacted(rn)))
    return {
        "added": added,
        "removed": removed,
        "changed": changed,
        "code_systems_changed": cs_changed,
        "settings_changed": settings_changed,
        "impacted_old": impacted_old,
        "impacted_new": impacted_new,
    }


def restrict_profile(obj: dict, rule_ids) -> dict:
    """Copy of ``obj`` keeping only ``rule_ids`` rules (codeSystems,
    settings and allowedKinds are preserved — restriction changes WHICH
    rules run, never how they run)."""
    out = copy.deepcopy(obj)
    keep = set(rule_ids)
    out["rules"] = [r for r in out.get("rules", []) or [] if r["id"] in keep]
    return out


def terminology_review_profile() -> dict:
    """Authoring profile for the concept-level terminology advisory sweep
    (``RuleAdvisoryService.cs:27-240`` analogue) — exercises all five
    advisory codes: CODE_NOT_FOUND (T1's 'XX', T3's 'draft'),
    CODESYSTEM_NOT_FOUND (T2), DISPLAY_MISMATCH (T4), DUPLICATE_CODE
    (language 'EN' declared twice), MISSING_DISPLAY (language 'TA')."""
    return {
        "version": "1.0",
        "codeSystems": [
            {"url": "https://example.org/cs/language",
             "concept": [{"code": "EN", "display": "English"},
                         {"code": "MS", "display": "Malay"},
                         {"code": "TA"},
                         {"code": "EN", "display": "English (duplicate)"}]},
            {"url": "https://example.org/cs/status",
             "concept": [{"code": "final", "display": "Final"},
                         {"code": "amended", "display": "Amended"}]},
        ],
        "rules": [
            {"id": "T1", "type": "CodeSystem", "kind": "Coding",
             "fieldPath": "text",
             "params": {"system": "https://example.org/cs/language",
                        "codes": ["EN", "XX"]}},
            {"id": "T2", "type": "CodeSystem", "kind": "Coding",
             "fieldPath": "text",
             "params": {"system": "https://example.org/cs/missing"}},
            {"id": "T3", "type": "AllowedValues", "kind": "Observation",
             "fieldPath": "text",
             "params": {"system": "https://example.org/cs/status",
                        "values": ["final", "draft"]}},
            {"id": "T4", "type": "FixedValue", "kind": "Observation",
             "fieldPath": "text",
             "params": {"system": "https://example.org/cs/status",
                        "value": {"code": "amended",
                                  "display": "Amended!"}}},
        ],
    }
