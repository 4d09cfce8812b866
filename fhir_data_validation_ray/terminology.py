"""Concept-level terminology advisories — the analogue of the reference's
``Services/Terminology/RuleAdvisoryService.cs:27-280``: lint authored
constraints against the loaded terminology (broken code references), and
the code systems themselves against their own hygiene contract.

Advisory codes (severity), mirrored 1:1 from the reference:

- ``CODE_NOT_FOUND`` (error, ``:77-113``): a rule references a
  ``(system, code)`` pair whose code is not a member of that CodeSystem's
  concepts. Sources of referenced codes in this engine's DSL: ``CodeSystem``
  rules' manual ``params.codes`` restriction list, plus ``AllowedValues`` /
  ``FixedValue`` rules that declare ``params.system``.
- ``DISPLAY_MISMATCH`` (warning, ``:115-148``): the rule supplies a display
  for a code that differs from the CodeSystem concept's display.
- ``CODESYSTEM_NOT_FOUND`` (error, ``:152-182``): the referenced system URL
  resolves to no CodeSystem in the profile.
- ``DUPLICATE_CODE`` (error, ``:195-216``): the same code appears more than
  once inside one CodeSystem's concept list.
- ``MISSING_DISPLAY`` (warning, ``:218-240``): a concept without display
  text.

Inputs are the RAW profile dict (pre-``parse_profile`` authoring shape,
the same contract as ``governance.review_rule_set``) — metadata only, no
corpus access, driver-side, bounded by profile size (authoring rule sets
are KBs; nothing here scales with the corpus). The advisory table is also
materialized as two parquet relations (``constraints``, ``concepts``) so
the DuckDB oracle replays the SAME checks as genuine relational logic
(anti-joins + group-by), not a constant.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

import pyarrow as pa

SEV_ERROR = "error"
SEV_WARNING = "warning"

_ADVISORY_SCHEMA = pa.schema([
    ("advisory_code", pa.string()),
    ("severity", pa.string()),
    ("rule_id", pa.string()),
    ("system", pa.string()),
    ("code", pa.string()),
])


def _norm_entries(entries: Any) -> list[tuple[str, str | None]]:
    """Concept/code list entries -> [(code, display-or-None)]; accepts the
    profile's two authoring spellings (bare string or {code, display})."""
    out: list[tuple[str, str | None]] = []
    for c in entries or []:
        if isinstance(c, dict):
            out.append((str(c.get("code", "")), c.get("display")))
        else:
            out.append((str(c), None))
    return out


def referenced_codes(rules: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Every (rule_id, system, code, display) reference an authored rule
    makes into the terminology — the engine's ``constraint.AllowedAnswers``
    analogue (``RuleAdvisoryService.cs:77-86``)."""
    rows: list[dict[str, Any]] = []
    for rule in rules:
        rid = str(rule.get("id", ""))
        params = rule.get("params") or {}
        system = str(params.get("system", "") or "").strip()
        if not system:
            continue
        rtype = str(rule.get("type", ""))
        entries: list[tuple[str, str | None]] = []
        if rtype == "CodeSystem":
            entries = _norm_entries(params.get("codes"))
        elif rtype == "AllowedValues":
            entries = _norm_entries(params.get("values"))
        elif rtype == "FixedValue" and params.get("value") is not None:
            entries = _norm_entries([params["value"]])
        rows.append({"rule_id": rid, "system": system,
                     "code": None, "display": None})  # system-level ref
        for code, display in entries:
            rows.append({"rule_id": rid, "system": system,
                         "code": code, "display": display})
    return rows


def profile_concepts(profile: dict[str, Any]) -> list[dict[str, Any]]:
    """Flattened (system, code, display) concept rows of the profile's
    codeSystems (duplicates preserved — DUPLICATE_CODE needs them)."""
    rows: list[dict[str, Any]] = []
    for cs in profile.get("codeSystems", []) or []:
        url = str(cs.get("url", "") or "").strip()
        if not url:
            continue
        for code, display in _norm_entries(
                cs.get("concept", cs.get("concepts", []))):
            rows.append({"system": url, "code": code, "display": display})
    return rows


def terminology_advisories(profile: dict[str, Any]) -> pa.Table:
    """Full advisory sweep over one profile. Returns a pyarrow Table
    (advisory_code, severity, rule_id, system, code); system-level rows
    (DUPLICATE_CODE / MISSING_DISPLAY) carry rule_id = ''."""
    refs = referenced_codes(profile.get("rules", []) or [])
    concepts = profile_concepts(profile)
    by_system: dict[str, dict[str, str | None]] = {}
    dup_seen: dict[str, set[str]] = {}
    dups: list[tuple[str, str]] = []
    for c in concepts:
        sys_map = by_system.setdefault(c["system"], {})
        if c["code"] in dup_seen.setdefault(c["system"], set()):
            if (c["system"], c["code"]) not in dups:
                dups.append((c["system"], c["code"]))
        dup_seen[c["system"]].add(c["code"])
        # first declaration wins for display lookup (reference resolves by
        # FindConceptAsync, which returns the first match)
        if c["code"] not in sys_map:
            sys_map[c["code"]] = c["display"]

    rows: list[dict[str, str]] = []
    for r in refs:
        if r["system"] not in by_system:
            if r["code"] is None:  # one advisory per rule-system reference
                rows.append({"advisory_code": "CODESYSTEM_NOT_FOUND",
                             "severity": SEV_ERROR, "rule_id": r["rule_id"],
                             "system": r["system"], "code": ""})
            continue
        if r["code"] is None:
            continue
        sys_map = by_system[r["system"]]
        if r["code"] not in sys_map:
            rows.append({"advisory_code": "CODE_NOT_FOUND",
                         "severity": SEV_ERROR, "rule_id": r["rule_id"],
                         "system": r["system"], "code": r["code"]})
        elif (r["display"] is not None and sys_map[r["code"]] is not None
              and r["display"] != sys_map[r["code"]]):
            rows.append({"advisory_code": "DISPLAY_MISMATCH",
                         "severity": SEV_WARNING, "rule_id": r["rule_id"],
                         "system": r["system"], "code": r["code"]})
    for system, code in dups:
        rows.append({"advisory_code": "DUPLICATE_CODE",
                     "severity": SEV_ERROR, "rule_id": "",
                     "system": system, "code": code})
    for c in concepts:
        if c["display"] is None or not str(c["display"]).strip():
            rows.append({"advisory_code": "MISSING_DISPLAY",
                         "severity": SEV_WARNING, "rule_id": "",
                         "system": c["system"], "code": c["code"]})
    if not rows:
        return _ADVISORY_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=_ADVISORY_SCHEMA)


# ------------------------------------------------------- oracle fixture
# bump whenever referenced_codes / profile_concepts / the parquet layout
# changes — the cache key must reflect CODE as well as profile content
# (the GENERATOR_VERSION convention; review r5 finding)
TERMINOLOGY_FIXTURE_VERSION = 2


def terminology_fixture_paths(profile: dict[str, Any],
                              root: str = "/tmp/graft_fixtures") -> dict:
    """Materialize the advisory inputs as parquet (``constraints`` =
    referenced codes incl. system-level rows, ``concepts`` = flattened
    concept rows, each with an explicit declaration-ordinal ``rn`` so SQL
    ordering is deterministic) so the DuckDB oracle replays the same
    anti-joins. Content-addressed by (version, profile) hash;
    idempotent."""
    import pyarrow.parquet as pq

    key = hashlib.sha256(
        f"v{TERMINOLOGY_FIXTURE_VERSION}\x1f".encode()
        + json.dumps(profile, sort_keys=True).encode()).hexdigest()[:12]
    d = os.path.join(root, f"terminology-{key}")
    cpath = os.path.join(d, "constraints.parquet")
    kpath = os.path.join(d, "concepts.parquet")
    if not (os.path.exists(cpath) and os.path.exists(kpath)):
        os.makedirs(d, exist_ok=True)
        refs = referenced_codes(profile.get("rules", []) or [])
        for i, r in enumerate(refs):
            r["rn"] = i
        pq.write_table(pa.Table.from_pylist(refs, schema=pa.schema([
            ("rule_id", pa.string()), ("system", pa.string()),
            ("code", pa.string()), ("display", pa.string()),
            ("rn", pa.int64())])),
            cpath + ".tmp")
        os.replace(cpath + ".tmp", cpath)
        cons = profile_concepts(profile)
        for i, c in enumerate(cons):
            c["rn"] = i
        pq.write_table(pa.Table.from_pylist(cons, schema=pa.schema([
            ("system", pa.string()), ("code", pa.string()),
            ("display", pa.string()), ("rn", pa.int64())])),
            kpath + ".tmp")
        os.replace(kpath + ".tmp", kpath)
    return {"constraints": cpath, "concepts": kpath}


def terminology_sql(paths: dict) -> str:
    """DuckDB mirror of ``terminology_advisories`` over the materialized
    relations — genuine relational logic (anti-joins, first-declaration
    display resolution, duplicate grouping), not a constant."""
    return f"""
WITH con AS (SELECT * FROM read_parquet('{paths["constraints"]}')),
k AS (SELECT system, code, display,
             -- rn is the EXPLICIT declaration ordinal written into the
             -- fixture (row_number() OVER () on a parallel parquet scan
             -- is ordering-unspecified; review r5 finding)
             row_number() OVER (PARTITION BY system, code
                                ORDER BY rn) AS dup_rank
      FROM read_parquet('{paths["concepts"]}')),
k1 AS (SELECT system, code, display FROM k WHERE dup_rank = 1),
systems AS (SELECT DISTINCT system FROM k)
SELECT 'CODESYSTEM_NOT_FOUND' AS advisory_code, 'error' AS severity,
       rule_id, con.system, '' AS code
FROM con LEFT JOIN systems USING (system)
WHERE con.code IS NULL AND systems.system IS NULL
UNION ALL
SELECT 'CODE_NOT_FOUND', 'error', rule_id, con.system, con.code
FROM con JOIN systems ON systems.system = con.system
LEFT JOIN k1 ON k1.system = con.system AND k1.code = con.code
WHERE con.code IS NOT NULL AND k1.code IS NULL
UNION ALL
SELECT 'DISPLAY_MISMATCH', 'warning', rule_id, con.system, con.code
FROM con JOIN k1 ON k1.system = con.system AND k1.code = con.code
WHERE con.display IS NOT NULL AND k1.display IS NOT NULL
  AND con.display <> k1.display
UNION ALL
SELECT 'DUPLICATE_CODE', 'error', '', system, code
FROM k WHERE dup_rank > 1 GROUP BY system, code
UNION ALL
SELECT 'MISSING_DISPLAY', 'warning', '', system, code
FROM read_parquet('{paths["concepts"]}')
WHERE display IS NULL OR trim(display) = ''
"""
