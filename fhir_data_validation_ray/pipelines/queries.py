"""Per-operator query callables + their DuckDB oracle SQL.

Each entry runs ONE operator of the engine over the deterministic fixture
tables for a scale-factor dir and returns a result the driver can compare
against the matching oracle SQL (same column names, same dtypes).
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa

from ..sources.readers import read_documents, read_registry, registry_keys_numpy
from ..stages.reference import reference_integrity_join
from ..stages.uniqueness import duplicate_doc_ids
from ..stages.validator import validate_dataset
from . import oracle
from .profiles import default_profile, single_rule_profile
from .validate import fixture_paths

RESULT_COLS = ["doc_id", "span_index", "error_code", "severity"]


def _violations_for(sf_dir: str, profile_obj: dict[str, Any],
                    validation_mode: str = "standard"):
    paths = fixture_paths(sf_dir)
    docs = read_documents(paths["docs"])
    reg = registry_keys_numpy(paths["registry"])
    v = validate_dataset(docs, profile_obj, registry_keys=reg,
                         emit_details=False, validation_mode=validation_mode)
    return v.select_columns(RESULT_COLS)


def _rule_query(rule_id: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        return _violations_for(sf_dir, single_rule_profile(rule_id))

    return run


def _reference_query(policy: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        p = single_rule_profile("R8")
        p["rules"][0]["params"]["policy"] = policy
        return _violations_for(sf_dir, p)

    return run


def _exclusivity_query(sf_dir: str):
    """value[x]-style exclusivity: Patient spans must not carry BOTH a text
    payload and a media_ref (``JsonNodeStructuralValidator.cs:858-942``)."""
    p = single_rule_profile("R1")
    p["rules"] = [
        {"id": "X1", "type": "Exclusivity", "kind": "Patient", "fieldPath": "text",
         "params": {"fields": ["text", "media_ref"]}}
    ]
    return _violations_for(sf_dir, p)


V_EXCLUSIVITY_SQL = (
    """
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'FHIR_MULTIPLE_VALUE_X' AS error_code, 'error' AS severity
FROM read_parquet('{flat}')
WHERE kind = 'Patient'
  AND NOT """
    + oracle.EMPTY
    + """
  AND media_ref IS NOT NULL AND trim(media_ref) <> ''
"""
)


def _fullurl_query(sf_dir: str):
    p = single_rule_profile("R1")
    p["rules"] = [
        {"id": "U1", "type": "FullUrlIdMatch", "kind": "*", "fieldPath": "media_ref"}
    ]
    return _violations_for(sf_dir, p)


def _structure_query(sf_dir: str):
    p = default_profile()
    p["rules"] = []
    return _violations_for(sf_dir, p)


def _empty_doc_query(sf_dir: str):
    """Stage-0 document sanity in isolation: zero-span docs -> EMPTY_BUNDLE
    (``Core/ValidationPipeline.cs:610-656``)."""
    p = single_rule_profile("R1")
    p["rules"] = []
    p["settings"]["checkEmptyDoc"] = True
    return _violations_for(sf_dir, p)


def _custom_predicate_query(sf_dir: str):
    p = single_rule_profile("R1")
    p["rules"] = [
        {"id": "C1", "type": "CustomPredicate", "kind": "Observation",
         "fieldPath": "text", "params": {"expr": "text != 'cancelled'"}}
    ]
    return _violations_for(sf_dir, p)


def _custom_predicate_or_query(sf_dir: str):
    """CustomPredicate over the full boolean sub-language — or / not /
    exists() / precedence (and binds tighter than or), mirroring the
    reference's accepted FHIRPath shapes (``FhirPathRuleEngine.cs:
    1714-1768``). Null semantics are two-valued (null comparisons are
    False; not inverts), which the oracle spells out with coalesce."""
    p = single_rule_profile("R1")
    p["rules"] = [
        {"id": "C2", "type": "CustomPredicate", "kind": "Observation",
         "fieldPath": "text",
         "params": {"expr": "not (text == 'cancelled') "
                            "or exists(media_ref) and offset != 1"}}
    ]
    return _violations_for(sf_dir, p)


V_CUSTOM_PREDICATE_OR_SQL = """
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'CUSTOMFHIRPATH_CONDITION_FAILED' AS error_code, 'error' AS severity
FROM read_parquet('{flat}')
WHERE kind = 'Observation'
  AND NOT (
    NOT coalesce(text = 'cancelled', FALSE)
    OR (NOT (media_ref IS NULL OR trim(media_ref) = '') AND "offset" <> 1)
  )
"""


def _filter_scope_query(sf_dir: str):
    """Regex rule gated by a filter InstanceScope — exercises the condition
    mini-language (``Models/InstanceScope.cs:59-89``)."""
    p = single_rule_profile("R1")
    p["rules"] = [
        {"id": "F1", "type": "Regex", "kind": "Patient", "fieldPath": "text",
         "instanceScope": {"kind": "filter", "condition": "media_ref != ''"},
         "params": {"pattern": "^[STFG]\\d{7}[A-Z]$"}}
    ]
    return _violations_for(sf_dir, p)


V_FILTER_SCOPE_SQL = (
    """
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'PATTERN_MISMATCH' AS error_code, 'error' AS severity
FROM read_parquet('{flat}')
WHERE kind = 'Patient' AND media_ref IS NOT NULL AND media_ref <> ''
  AND NOT """
    + oracle.EMPTY
    + """
  AND NOT regexp_matches(text, '^[STFG]\\d{7}[A-Z]$')
"""
)


def _primitive_query(kind: str, primitive: str) -> Callable[[str], Any]:
    """Primitive lexical grammar on one span kind — the per-type grammar
    validators (``JsonNodeStructuralValidator.cs:84-97``)."""

    def run(sf_dir: str):
        p = single_rule_profile("R1")
        p["rules"] = [
            {"id": "P1", "type": "Primitive", "kind": kind, "fieldPath": "text",
             "params": {"primitive": primitive}}
        ]
        return _violations_for(sf_dir, p)

    return run


def _json_ingest_query(sf_dir: str):
    """JSONL ingest with stage-0 INVALID_JSON quarantine: parsed docs emit
    (doc_id, n_spans, text_chars); quarantined lines emit sentinel rows.
    The oracle recomputes both sides from the PARQUET fixture + the
    deterministic corruption rule, so a parse/reconstruction divergence
    anywhere in the lane breaks the hash."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sources.json_ingest import jsonl_fixture, read_documents_jsonl

    ds = read_documents_jsonl(jsonl_fixture(sf_dir))

    def summarize(t: pa.Table) -> pa.Table:
        import numpy as np

        err = t["error"]
        if isinstance(err, pa.ChunkedArray):
            err = err.combine_chunks()
        ok = pc.is_null(err).to_numpy(zero_copy_only=False)
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lens = pc.list_value_length(spans).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        texts = pc.struct_field(pc.list_flatten(spans), "text")
        tc = pc.utf8_length(texts).fill_null(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cs = np.concatenate([[np.int64(0)], np.cumsum(tc)])
        ends = np.cumsum(lens)
        text_chars = cs[ends] - cs[ends - lens]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ids = np.where(ok, ids, "__INVALID_JSON__")
        return pa.table(
            {
                "doc_id": pa.array(ids.astype("U"), pa.string()),
                "n_spans": pa.array(np.where(ok, lens, 0)),
                "text_chars": pa.array(np.where(ok, text_chars, 0)),
            }
        )

    return ds.map_batches(summarize, batch_format="pyarrow")


def _json_ingest_sql() -> str:
    from ..pipelines.dataops import _fnv_sql
    from ..sources.json_ingest import CORRUPT_MOD

    return f"""
WITH d AS (SELECT doc_id, {_fnv_sql('doc_id')} % {CORRUPT_MOD} = 0 AS bad
           FROM read_parquet('{{docs}}')),
g AS (SELECT d.doc_id, count(f.doc_id)::BIGINT AS n_spans,
        coalesce(sum(length(f.text)), 0)::BIGINT AS text_chars
      FROM d LEFT JOIN read_parquet('{{flat}}') f USING (doc_id)
      WHERE NOT d.bad GROUP BY d.doc_id)
SELECT doc_id, n_spans, text_chars FROM g
UNION ALL
SELECT '__INVALID_JSON__' AS doc_id, 0::BIGINT AS n_spans,
       0::BIGINT AS text_chars
FROM d WHERE bad
"""


LINT_YEAR_WINDOW = (2000, 2030)  # tightened so the fixture corpus fires


def _lint_query(sf_dir: str):
    """The LINT layer in isolation: rules/structural checks off, full mode,
    every emission a downgraded Advisory warning (catalog ``catalogs.py``,
    reference ``Catalogs/LintRuleCatalog.cs:17-357``)."""
    p = single_rule_profile("R1")
    p["rules"] = []
    p["settings"].update({"lint": True,
                          "lintYearMin": LINT_YEAR_WINDOW[0],
                          "lintYearMax": LINT_YEAR_WINDOW[1]})
    return _violations_for(sf_dir, p, validation_mode="full")


def _lint_sql() -> str:
    y0, y1 = LINT_YEAR_WINDOW
    base = ("SELECT doc_id, CAST(span_index AS INTEGER) AS span_index, "
            "'{code}' AS error_code, 'warning' AS severity "
            "FROM read_parquet('{{flat}}') WHERE ")
    parts = [
        base.format(code="LINT_EMPTY_VALUE") + "text = ''",
        base.format(code="LINT_WHITESPACE_ONLY")
        + r"regexp_matches(text, '^\s+$')",
        base.format(code="LINT_UNTRIMMED_VALUE")
        + r"regexp_matches(text, '(^\s)|(\s$)') "
          r"AND NOT regexp_matches(text, '^\s+$')",
        base.format(code="LINT_MISSING_KIND") + "kind IS NULL OR kind = ''",
        base.format(code="LINT_SUSPICIOUS_DATE")
        + rf"kind IN ('date', 'dateTime') AND regexp_matches(text, '^\d{{4}}') "
          rf"AND (CAST(substr(text, 1, 4) AS INTEGER) < {y0} "
          rf"OR CAST(substr(text, 1, 4) AS INTEGER) > {y1})",
        base.format(code="LINT_BOOLEAN_CASE")
        + "kind = 'boolean' AND lower(text) IN ('true', 'false') "
          "AND text NOT IN ('true', 'false')",
        # PARTITION BY the raw columns: SQL treats NULLs as equal here,
        # matching the kernel's per-field dictionary codes (null -> -1) —
        # no sentinel, so no field value can collide with one
        base.format(code="LINT_DUPLICATE_ENTRY") + "TRUE "
        + "QUALIFY row_number() OVER ("
          "PARTITION BY doc_id, kind, text, media_ref "
          "ORDER BY span_index) > 1",
        base.format(code="LINT_CONTROL_CHARS")
        + r"regexp_matches(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]')",
    ]
    return "\nUNION ALL\n".join(parts)


def _extension_query(sf_dir: str):
    """Extension grammar kernel (url<->media_ref, value<->text) applied to
    the media spans — the kind whose payload layout matches the extension
    shape (url required, single value). ``JsonNodeStructuralValidator.cs:
    1087-1185``."""
    p = single_rule_profile("R1")
    p["rules"] = [
        {"id": "E1", "type": "Extension", "kind": "image",
         "fieldPath": "media_ref"}
    ]
    return _violations_for(sf_dir, p)


V_EXTENSION_SQL = """
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'FHIR_EXTENSION_MISSING_URL' AS error_code, 'error' AS severity
FROM read_parquet('{flat}')
WHERE kind = 'image' AND (media_ref IS NULL OR trim(media_ref) = '')
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'FHIR_EXTENSION_INVALID_SHAPE' AS error_code, 'error' AS severity
FROM read_parquet('{flat}')
WHERE kind = 'image' AND (text IS NULL OR trim(text) = '')
"""


def _spec_hints_query(sf_dir: str):
    """Generated SPEC_HINT layer in isolation: hints extracted from the
    default span schema (``spechint.py`` — the HL7 StructureDefinition
    generator analogue, ``Authoring/Hl7SpecHintGenerator.cs``), compiled to
    Advisory ``RequiredSpans`` rules and run in full mode. All emissions are
    source=SPEC_HINT warnings (``UnifiedErrorModelBuilder.cs:497`` codes)."""
    from ..spechint import DEFAULT_SPAN_SCHEMA, generate_spec_hints, spec_hint_rules

    p = single_rule_profile("R1")
    p["rules"] = spec_hint_rules(generate_spec_hints(DEFAULT_SPAN_SCHEMA))
    p["settings"]["lint"] = False  # isolate the SPEC_HINT layer
    paths = fixture_paths(sf_dir)
    docs = read_documents(paths["docs"])
    v = validate_dataset(docs, p, emit_details=False, validation_mode="full")
    return v.select_columns(["doc_id", "span_index", "error_code",
                             "severity", "path"])


def _spec_hints_sql() -> str:
    """Oracle generated from the SAME hint catalog as the Ray query: per-doc
    span-kind counts joined against the document universe (the nested table
    — empty documents have no flat rows but must still violate simple
    required hints)."""
    from ..spechint import DEFAULT_SPAN_SCHEMA, generate_spec_hints, spec_hint_rules

    parts = []
    for rule in spec_hint_rules(generate_spec_hints(DEFAULT_SPAN_SCHEMA)):
        req = rule["params"]["requirements"][0]
        kind, code = req["kind"], rule["errorCode"]
        child = (f"(SELECT doc_id, count(*) AS n FROM read_parquet('{{flat}}') "
                 f"WHERE kind = '{kind}' GROUP BY doc_id)")
        when = req.get("whenKind")
        if when is None:
            parts.append(f"""
SELECT u.doc_id, CAST(-1 AS INTEGER) AS span_index,
       '{code}' AS error_code, 'warning' AS severity, '{kind}' AS path
FROM (SELECT doc_id FROM read_parquet('{{docs}}')) u
LEFT JOIN {child} ck USING (doc_id)
WHERE coalesce(ck.n, 0) < 1""")
        else:
            parent = (f"(SELECT doc_id, count(*) AS n FROM read_parquet('{{flat}}') "
                      f"WHERE kind = '{when}' GROUP BY doc_id)")
            need = "cp.n" if req.get("perParent") else "1"
            parts.append(f"""
SELECT u.doc_id, CAST(-1 AS INTEGER) AS span_index,
       '{code}' AS error_code, 'warning' AS severity, '{kind}' AS path
FROM (SELECT doc_id FROM read_parquet('{{docs}}')) u
LEFT JOIN {child} ck USING (doc_id)
LEFT JOIN {parent} cp USING (doc_id)
WHERE coalesce(cp.n, 0) > 0 AND coalesce(ck.n, 0) < {need}""")
    return "\nUNION ALL\n".join(parts)


_EXPLAIN_RESULT_COLS = ["doc_id", "span_index", "error_code", "severity",
                        "explain_what", "explain_how", "explain_confidence"]

# CustomPredicate lane for the explanations query (low-confidence template)
_C1_RULE = {"id": "C1", "type": "CustomPredicate", "kind": "Observation",
            "fieldPath": "text", "params": {"expr": "text != 'cancelled'"}}


def _explanations_query(sf_dir: str):
    """Validation-issue explanations (``Authoring/ValidationExplanation
    Service.cs``): a mixed-lane profile (Required / Regex / CodeSystem /
    CustomPredicate / Reference) whose violations are enriched with the
    deterministic what/how/confidence templates — every lane's confidence
    tier (high / medium / low) and both interpolation shapes (constant
    per-rule path, per-row reference path) are exercised."""
    from ..explain import explain_violations

    base = default_profile()
    p = single_rule_profile("R1")
    p["rules"] = [r for r in base["rules"]
                  if r["id"] in ("R1", "R4", "R6", "R8")] + [dict(_C1_RULE)]
    paths = fixture_paths(sf_dir)
    docs = read_documents(paths["docs"])
    reg = registry_keys_numpy(paths["registry"])
    v = validate_dataset(docs, p, registry_keys=reg, emit_details=False)
    return explain_violations(v, p).select_columns(_EXPLAIN_RESULT_COLS)


def _explanations_sql() -> str:
    """Oracle assembled from the SAME template functions as the engine's
    enrichment (``explain.rule_template``) applied to each lane's constant
    rule path, plus the per-row reference-path interpolation as SQL
    concatenation — string equality is by construction."""
    from .. import explain as X

    def esc(s: str) -> str:
        return s.replace("'", "''")

    base = {r["id"]: r for r in default_profile()["rules"]}

    def wrap(part: str, rule: dict, path: str) -> str:
        t = X.rule_template(rule)
        return (f"SELECT doc_id, span_index, error_code, severity,\n"
                f"       '{esc(t.what(path))}' AS explain_what,\n"
                f"       '{esc(t.how(path))}' AS explain_how,\n"
                f"       '{t.confidence}' AS explain_confidence\n"
                f"FROM ({part})")

    ref_part = oracle._REFS_CTE + """
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'REFERENCE_NOT_FOUND' AS error_code, 'error' AS severity, kind
FROM resolved
WHERE NOT ok_local
  AND media_ref NOT IN (SELECT media_ref FROM read_parquet('{registry}'))
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'REFERENCE_TYPE_MISMATCH' AS error_code, 'error' AS severity, kind
FROM resolved WHERE ok_local AND target_kind <> claimed
"""
    ref_sql = (
        "SELECT doc_id, span_index, error_code, severity,\n"
        "       CASE WHEN error_code = 'REFERENCE_NOT_FOUND'\n"
        f"            THEN '{esc(X.REF_NOT_FOUND_WHAT[0])}' || kind || "
        f"'.media_ref' || '{esc(X.REF_NOT_FOUND_WHAT[1])}'\n"
        f"            ELSE '{esc(X.REF_TYPE_WHAT)}' END AS explain_what,\n"
        "       CASE WHEN error_code = 'REFERENCE_NOT_FOUND'\n"
        f"            THEN '{esc(X.REF_NOT_FOUND_HOW)}'\n"
        f"            ELSE '{esc(X.REF_TYPE_HOW)}' END AS explain_how,\n"
        "       'high' AS explain_confidence\n"
        f"FROM ({ref_part})"
    )
    parts = [
        wrap(oracle.V_REQUIRED, base["R1"], "Patient.text"),
        wrap(oracle.V_REGEX, base["R4"], "Patient.text"),
        wrap(oracle.V_CODE_SYSTEM, base["R6"], "Coding.text"),
        wrap(oracle.V_CUSTOM_PREDICATE, _C1_RULE, "Observation.text"),
        ref_sql,
    ]
    return "\nUNION ALL\n".join(parts)


_NAV_RESULT_COLS = ["doc_id", "span_index", "error_code", "severity",
                    "nav_breadcrumb", "nav_scoped_path",
                    "nav_full_json_path", "nav_json_path", "nav_pointer_path"]


def _breadcrumbs_query(sf_dir: str):
    """Smart-path navigation columns over a mixed-lane violations stream
    (``frontend/src/utils/smartPathFormatting.ts`` — the live breadcrumb
    surface; the backend ``Models/NavigationInfo.cs`` is deprecated in the
    reference itself): per-span constant paths (R1 Required, R6
    CodeSystem), a doc-level empty-pointer lane (R5 ArrayLength), and
    per-row kind paths (R8 Reference)."""
    from ..explain import navigate_violations

    base = default_profile()
    p = single_rule_profile("R1")
    p["rules"] = [r for r in base["rules"]
                  if r["id"] in ("R1", "R5", "R6", "R8")]
    paths = fixture_paths(sf_dir)
    docs = read_documents(paths["docs"])
    reg = registry_keys_numpy(paths["registry"])
    v = validate_dataset(docs, p, registry_keys=reg, emit_details=False)
    return navigate_violations(v).select_columns(_NAV_RESULT_COLS)


def _breadcrumbs_sql() -> str:
    """Oracle assembled from the SAME scalar navigation helpers as the
    engine's vectorized lane (``explain.format_breadcrumb`` & co.):
    constant paths resolve to string literals at SQL-generation time; the
    per-row pieces (span_index inside the pointer, the reference lane's
    kind) concatenate exactly the way the sink constructs them
    (``kernels.py:109``)."""
    from .. import explain as X

    def esc(s: str) -> str:
        return s.replace("'", "''")

    SENT = "987654321"  # span_index sentinel; never appears in field names

    def span_lane(part: str, kind: str, field: str) -> str:
        path = f"{kind}.{field}"
        pre, suf = X.pointer_full_path(f"/spans/{SENT}/{field}").split(SENT, 1)
        return (
            f"SELECT doc_id, span_index, error_code, severity,\n"
            f"       '{esc(X.format_breadcrumb(path))}' AS nav_breadcrumb,\n"
            f"       '{esc(X.scoped_path(path))}' AS nav_scoped_path,\n"
            f"       '{esc(pre)}' || span_index || '{esc(suf)}' AS nav_full_json_path,\n"
            f"       '$.{esc(pre)}' || span_index || '{esc(suf)}' AS nav_json_path,\n"
            f"       '{esc(X.pointer_fhirpath_style(f'/spans/0/{field}'))}' AS nav_pointer_path\n"
            f"FROM ({part})")

    def doc_lane(part: str, path: str) -> str:
        return (
            f"SELECT doc_id, span_index, error_code, severity,\n"
            f"       '{esc(X.format_breadcrumb(path))}' AS nav_breadcrumb,\n"
            f"       '{esc(X.scoped_path(path))}' AS nav_scoped_path,\n"
            f"       '{esc(X.pointer_full_path(''))}' AS nav_full_json_path,\n"
            f"       '{esc(X.pointer_jsonpath(''))}' AS nav_json_path,\n"
            f"       '{esc(X.pointer_fhirpath_style(''))}' AS nav_pointer_path\n"
            f"FROM ({part})")

    # per-row kind lane (R8 Reference): breadcrumb = kind ▸ media_ref
    ref_part = oracle._REFS_CTE + """
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'REFERENCE_NOT_FOUND' AS error_code, 'error' AS severity, kind
FROM resolved
WHERE NOT ok_local
  AND media_ref NOT IN (SELECT media_ref FROM read_parquet('{registry}'))
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'REFERENCE_TYPE_MISMATCH' AS error_code, 'error' AS severity, kind
FROM resolved WHERE ok_local AND target_kind <> claimed
"""
    crumb_suf = X.format_breadcrumb("K.media_ref").split("K", 1)[1]
    pre, suf = X.pointer_full_path(f"/spans/{SENT}/media_ref").split(SENT, 1)
    ref_sql = (
        f"SELECT doc_id, span_index, error_code, severity,\n"
        f"       kind || '{esc(crumb_suf)}' AS nav_breadcrumb,\n"
        f"       '{esc(X.scoped_path('K.media_ref'))}' AS nav_scoped_path,\n"
        f"       '{esc(pre)}' || span_index || '{esc(suf)}' AS nav_full_json_path,\n"
        f"       '$.{esc(pre)}' || span_index || '{esc(suf)}' AS nav_json_path,\n"
        f"       '{esc(X.pointer_fhirpath_style('/spans/0/media_ref'))}' AS nav_pointer_path\n"
        f"FROM ({ref_part})")

    parts = [
        span_lane(oracle.V_REQUIRED, "Patient", "text"),
        doc_lane(oracle.V_ARRAY_LENGTH, "spans"),
        span_lane(oracle.V_CODE_SYSTEM, "Coding", "text"),
        ref_sql,
    ]
    return "\nUNION ALL\n".join(parts)


def _suggest_rules_query(sf_dir: str):
    """Debug-mode rule suggestions over the corpus (detector thresholds
    from ``Authoring/SystemRuleSuggestionService.cs:33-38``)."""
    from ..stages.suggest import suggest_rules

    paths = fixture_paths(sf_dir)
    return suggest_rules(read_documents(paths["docs"]))


def _suggest_rules_sql() -> str:
    from ..stages.suggest import (
        HIGH_CONF,
        MAX_ALLOWED_VALUES,
        MAX_CODE_LEN,
        MIN_REQUIRED,
        MIN_SAMPLE_ALLOWED,
        MIN_SAMPLE_FIXED,
        MIN_SAMPLE_REGEX,
        PATTERN_REGISTRY,
        SUGGEST_BLOCKLIST,
    )

    blocklist = ", ".join(f"'{k}'" for k in SUGGEST_BLOCKLIST)
    regex_parts = []
    for name, pat in PATTERN_REGISTRY:
        m = f"sum(CASE WHEN regexp_matches(text, '{pat}', 'i') THEN 1 ELSE 0 END)"
        regex_parts.append(f"""
SELECT kind, 'Regex' AS rule_type, '{name}' AS param,
       count(*)::BIGINT AS n_samples, {m}::BIGINT AS n_match,
       CASE WHEN {m} = count(*) THEN 'high' ELSE 'medium' END AS confidence
FROM vals GROUP BY kind
HAVING count(*) >= {MIN_SAMPLE_REGEX} AND 5 * {m} >= 4 * count(*)""")
    return f"""
WITH f AS (
  SELECT kind, text,
         (text IS NULL OR regexp_matches(text, '^\\s*$')) AS absent
  FROM read_parquet('{{flat}}')
  WHERE kind IS NOT NULL AND kind NOT IN ({blocklist})
),
k AS (
  SELECT kind, count(*)::BIGINT AS n_spans,
         sum(CASE WHEN absent THEN 1 ELSE 0 END)::BIGINT AS n_absent
  FROM f GROUP BY kind
),
vals AS (SELECT kind, text FROM f WHERE NOT absent),
dv AS (SELECT kind, count(*)::BIGINT AS n_values FROM vals GROUP BY kind),
dl AS (
  SELECT kind, count(*)::BIGINT AS n_distinct,
         sum(length(text))::BIGINT AS lensum,
         array_to_string(list_sort(list(text)), ',') AS vlist,
         min(text) AS one_val
  FROM (SELECT DISTINCT kind, text FROM vals) GROUP BY kind
)
SELECT dv.kind, 'FixedValue' AS rule_type, dl.one_val AS param,
       dv.n_values AS n_samples, dv.n_values AS n_match,
       CASE WHEN dv.n_values >= {HIGH_CONF} THEN 'high' ELSE 'medium' END
         AS confidence
FROM dv JOIN dl USING (kind)
WHERE dv.n_values >= {MIN_SAMPLE_FIXED} AND dl.n_distinct = 1
UNION ALL
SELECT dv.kind, 'AllowedValues' AS rule_type, dl.vlist AS param,
       dv.n_values AS n_samples, dv.n_values AS n_match,
       'medium' AS confidence
FROM dv JOIN dl USING (kind)
WHERE dv.n_values >= {MIN_SAMPLE_ALLOWED}
  AND dl.n_distinct BETWEEN 2 AND {MAX_ALLOWED_VALUES}
  AND dl.lensum <= {MAX_CODE_LEN} * dl.n_distinct
UNION ALL
SELECT k.kind, 'Required' AS rule_type, '' AS param,
       k.n_spans AS n_samples, k.n_spans AS n_match,
       CASE WHEN k.n_spans >= {HIGH_CONF} THEN 'high' ELSE 'medium' END
         AS confidence
FROM k WHERE k.n_spans >= {MIN_REQUIRED} AND k.n_absent = 0
UNION ALL{"UNION ALL".join(regex_parts)}
"""


def _reference_join_query(sf_dir: str):
    paths = fixture_paths(sf_dir)
    docs = read_documents(paths["docs"])
    registry = read_registry(paths["registry"])
    out = reference_integrity_join(docs, registry, num_buckets=16, salt=2)
    return out.select_columns(RESULT_COLS)


def _uniqueness_query(sf_dir: str):
    import os

    paths = fixture_paths(sf_dir)
    dup = read_documents(
        os.path.join(os.path.dirname(paths["docs"]), "docs_dup.parquet"),
        columns=["doc_id"],
    )
    return duplicate_doc_ids(dup)


def _summary_query(sf_dir: str):
    from ray.data.aggregate import Count

    v = _violations_for(sf_dir, default_profile())
    return v.groupby(["error_code", "severity"]).aggregate(Count(alias_name="n"))


def _summary_full_query(sf_dir: str):
    """Full-analysis-mode summary: the default profile PLUS every advisory
    layer (auto-injected LINT catalog + generated SPEC_HINT rules) counted
    by (error_code, severity) — the end-to-end composition check that the
    mode gating, Advisory downgrades and layer ordering all hold at once
    (``Core/ValidationPipeline.cs:106-175`` layering)."""
    from ray.data.aggregate import Count

    from ..spechint import DEFAULT_SPAN_SCHEMA, generate_spec_hints, spec_hint_rules

    p = default_profile()
    p["rules"] = list(p["rules"]) + spec_hint_rules(
        generate_spec_hints(DEFAULT_SPAN_SCHEMA))
    p["settings"].update({"lintYearMin": LINT_YEAR_WINDOW[0],
                          "lintYearMax": LINT_YEAR_WINDOW[1]})
    v = _violations_for(sf_dir, p, validation_mode="full")
    return v.groupby(["error_code", "severity"]).aggregate(Count(alias_name="n"))


def _summary_full_sql() -> str:
    base_body = (oracle.summary_sql()
                 .split("FROM (\n", 1)[1].rsplit("\n) GROUP BY", 1)[0])
    spec = ("SELECT doc_id, span_index, error_code, severity FROM ("
            + _spec_hints_sql() + ")")
    body = (base_body
            + "\nUNION ALL\nSELECT * FROM (" + _lint_sql() + ")"
            + "\nUNION ALL\n" + spec)
    return ("SELECT error_code, severity, CAST(count(*) AS BIGINT) AS n "
            "FROM (\n" + body + "\n) GROUP BY error_code, severity")


# 3-tier fix-expectation hierarchy of the validation results surface
# (``docs/VALIDATION_HIERARCHICAL_GROUPING.md``): project rules (must fix),
# FHIR correctness (must fix), governance review (recommended/advisory).
SOURCE_TIER = {
    "Business": "project_rules",
    "STRUCTURE": "fhir_correctness",
    "CodeMaster": "fhir_correctness",
    "Reference": "fhir_correctness",
    "LINT": "governance_review",
    "SPEC_HINT": "governance_review",
}


def _tiered_summary_query(sf_dir: str):
    """Counts by (tier, source) over the full-analysis-mode run — the
    hierarchical grouping a user reads to answer "what must I fix"."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ..spechint import DEFAULT_SPAN_SCHEMA, generate_spec_hints, spec_hint_rules

    p = default_profile()
    p["rules"] = list(p["rules"]) + spec_hint_rules(
        generate_spec_hints(DEFAULT_SPAN_SCHEMA))
    p["settings"].update({"lintYearMin": LINT_YEAR_WINDOW[0],
                          "lintYearMax": LINT_YEAR_WINDOW[1]})
    paths = fixture_paths(sf_dir)
    docs = read_documents(paths["docs"])
    reg = registry_keys_numpy(paths["registry"])
    v = validate_dataset(docs, p, registry_keys=reg, emit_details=False,
                         validation_mode="full")
    sources = pa.array(list(SOURCE_TIER), pa.string())
    tiers = pa.array(list(SOURCE_TIER.values()), pa.string())

    def tag(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["source"], value_set=sources)
        return t.append_column("tier", pc.take(tiers, idx))

    return (v.map_batches(tag, batch_format="pyarrow")
             .groupby(["tier", "source"]).aggregate(Count(alias_name="n")))


def _tiered_summary_sql() -> str:
    """Each full-mode oracle part is tagged with its (tier, source) BY
    CONSTRUCTION (the part IS the source's check), so the mapping cannot
    drift from a hand-kept code table."""
    part_sources = [
        (oracle.V_REQUIRED, "Business"),
        (oracle.V_FIXED_VALUE, "Business"),
        (oracle.V_ALLOWED_VALUES, "Business"),
        (oracle.V_REGEX, "Business"),
        (oracle.V_ARRAY_LENGTH, "Business"),
        (oracle.V_CODE_SYSTEM, "Business"),
        (oracle.V_REQUIRED_SPANS, "Business"),
        (oracle.V_QUESTION_ANSWER, "Business"),
        (oracle.V_CODE_MASTER, "CodeMaster"),
        (oracle.V_STRUCTURE, "STRUCTURE"),
        (oracle.V_REFERENCE_REQUIRE, "Reference"),
        (oracle.primitive_sql("date", "date"), "STRUCTURE"),
        (oracle.primitive_sql("dateTime", "dateTime"), "STRUCTURE"),
        (oracle.primitive_sql("uri", "uri"), "STRUCTURE"),
        (_lint_sql(), "LINT"),
        ("SELECT doc_id, span_index, error_code, severity FROM ("
         + _spec_hints_sql() + ")", "SPEC_HINT"),
    ]
    parts = [
        f"SELECT '{SOURCE_TIER[src]}' AS tier, '{src}' AS source "
        f"FROM ({sql})"
        for sql, src in part_sources
    ]
    return ("SELECT tier, source, CAST(count(*) AS BIGINT) AS n FROM (\n"
            + "\nUNION ALL\n".join(parts)
            + "\n) GROUP BY tier, source")


EXAMPLES_PER_CODE = 3


def _examples_query(sf_dir: str):
    """Per-error-code debugging examples: the 3 smallest (doc_id,
    span_index) rows of each code across the full default profile — the
    drill-down next to v_summary. Per-batch vectorized trim to 3 per code
    BEFORE the low-cardinality code groupby, so the exchange carries
    <= 3 x codes rows per batch, never the violation stream."""
    import numpy as np
    import pyarrow as pa

    n = EXAMPLES_PER_CODE
    v = _violations_for(sf_dir, default_profile())

    def trim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"error_code": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.string()),
                             "span_index": pa.array([], pa.int32())})
        code = np.asarray(t["error_code"]).astype("U")
        doc = np.asarray(t["doc_id"]).astype("U")
        span = np.asarray(t["span_index"]).astype(np.int64)
        order = np.lexsort((span, doc, code))
        cs = code[order]
        starts = np.r_[0, np.flatnonzero(cs[1:] != cs[:-1]) + 1]
        runs = np.diff(np.r_[starts, len(cs)])
        rank = np.arange(len(cs)) - np.repeat(starts, runs)
        keep = order[rank < n]
        f = t.take(pa.array(keep))
        return pa.table({"error_code": f["error_code"],
                         "doc_id": f["doc_id"],
                         "span_index": f["span_index"]})

    return (v.map_batches(trim, batch_format="pyarrow")
            .groupby("error_code")
            .map_groups(trim, batch_format="pyarrow"))


def _impact_new_profile() -> dict[str, Any]:
    """The fixed profile-change scenario the ``v_profile_impact`` oracle
    mirrors: widen R3's allowed set (resolves 'preliminary' rows), drop R4
    (resolves every PATTERN_MISMATCH), add R14 Required on Observation
    (introduces rows for empty Observation spans)."""
    p = default_profile()
    for r in p["rules"]:
        if r["id"] == "R3":
            r["params"]["values"] = ["final", "amended", "preliminary"]
    p["rules"] = [r for r in p["rules"] if r["id"] != "R4"]
    p["rules"].append({
        "id": "R14", "type": "Required", "kind": "Observation",
        "instanceScope": {"kind": "all"}, "fieldPath": "text",
        "severity": "error"})
    return p


def _profile_impact_query(sf_dir: str):
    """Violations multiset diff between two profile versions
    (``pipelines/validate.py:profile_impact``) over the fixed
    ``_impact_new_profile`` scenario."""
    from .validate import profile_impact

    return profile_impact(sf_dir, default_profile(), _impact_new_profile())


V_PROFILE_IMPACT_SQL = f"""
WITH f AS (SELECT doc_id, CAST(span_index AS INTEGER) AS span_index, kind, text
           FROM read_parquet('{{flat}}')),
before_v AS (
  SELECT doc_id, span_index, 'R3' AS rule_id,
         'VALUE_NOT_ALLOWED' AS error_code, 'error' AS severity
  FROM f WHERE kind = 'Observation' AND NOT {oracle.EMPTY}
    AND text NOT IN ('final','amended')
  UNION ALL
  SELECT doc_id, span_index, 'R4', 'PATTERN_MISMATCH', 'error'
  FROM f WHERE kind = 'Patient' AND NOT {oracle.EMPTY}
    AND NOT regexp_matches(text, '^[STFG]\\d{{7}}[A-Z]$')
),
after_v AS (
  SELECT doc_id, span_index, 'R3' AS rule_id,
         'VALUE_NOT_ALLOWED' AS error_code, 'error' AS severity
  FROM f WHERE kind = 'Observation' AND NOT {oracle.EMPTY}
    AND text NOT IN ('final','amended','preliminary')
  UNION ALL
  SELECT doc_id, span_index, 'R14', 'REQUIRED_FIELD_MISSING', 'error'
  FROM f WHERE kind = 'Observation' AND {oracle.EMPTY}
),
b AS (SELECT doc_id, span_index, rule_id, error_code, severity,
             count(*) AS n_before FROM before_v GROUP BY ALL),
a AS (SELECT doc_id, span_index, rule_id, error_code, severity,
             count(*) AS n_after FROM after_v GROUP BY ALL)
SELECT CASE WHEN coalesce(n_after, 0) > coalesce(n_before, 0)
            THEN 'introduced' ELSE 'resolved' END AS change,
       doc_id, span_index, rule_id, error_code, severity,
       coalesce(n_before, 0)::BIGINT AS n_before,
       coalesce(n_after, 0)::BIGINT AS n_after
FROM b FULL OUTER JOIN a
  USING (doc_id, span_index, rule_id, error_code, severity)
WHERE coalesce(n_before, 0) <> coalesce(n_after, 0)
"""


def _pack_interleaved_query(sf_dir: str):
    """Multimodal sequence packing over the interleaved (doc_id, spans)
    table (``stages/packing.py:pack_interleaved``)."""
    from ..stages.packing import PACK_INTERLEAVED_SHARDS, pack_interleaved

    return pack_interleaved(read_documents(fixture_paths(sf_dir)["docs"]),
                            n_shards=PACK_INTERLEAVED_SHARDS)


def _pack_interleaved_sql() -> str:
    from ..stages.packing import (
        MEDIA_TOKEN_COSTS,
        PACK_BUDGET,
        PACK_INTERLEAVED_SHARDS,
    )
    from .dataops import _fnv_sql

    cases = " ".join(f"WHEN kind = '{k}' THEN {c}"
                     for k, c in sorted(MEDIA_TOKEN_COSTS.items()))
    off = ("coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)")
    return f"""
WITH cost AS (
  SELECT doc_id,
         sum(CASE {cases} ELSE
             len(list_filter(string_split(coalesce(text, ''), ' '),
                             w -> w <> '')) END)::BIGINT AS n_tokens
  FROM read_parquet('{{flat}}') GROUP BY doc_id),
sh AS (SELECT doc_id, n_tokens,
       ({_fnv_sql('doc_id')} % {PACK_INTERLEAVED_SHARDS})::BIGINT AS shard
       FROM cost)
SELECT doc_id, shard, n_tokens, {off}::BIGINT AS tok_offset,
       ({off} // {PACK_BUDGET})::BIGINT AS seq_in_shard
FROM sh
"""


def _quarantine_query(sf_dir: str):
    """Doc-level pass/fail verdict stream: documents with >=1
    error-severity violation under the full default profile
    (``pipelines/validate.py:blocking_doc_ids`` — the id stream
    ``quarantine_split`` diverts)."""
    from .validate import blocking_doc_ids

    return blocking_doc_ids(_violations_for(sf_dir, default_profile()))


def rule_coverage(sf_dir: str, profile_obj: dict[str, Any]):
    """Per-rule fire counts incl. zero-fire rules (dead-rule detection) —
    the per-rule produced-count the reference traces on every evaluation
    (``RuleEngines/FhirPathRuleEngine.cs:308``), promoted to a result
    table. Distributed count by rule_id (bounded by the profile's rule
    count, i.e. O(rules) driver state at any corpus size), then a
    driver-side left-join against the compiled inventory so never-firing
    rules appear with n = 0."""
    import pyarrow as pa
    from ray.data.aggregate import Count

    rule_types = {r["id"]: r["type"] for r in profile_obj["rules"]}
    paths = fixture_paths(sf_dir)
    v = validate_dataset(read_documents(paths["docs"]), profile_obj,
                         registry_keys=registry_keys_numpy(paths["registry"]),
                         emit_details=False)
    counts = (v.select_columns(["rule_id"])
              .groupby("rule_id").aggregate(Count(alias_name="n")))
    fired = {r["rule_id"]: int(r["n"]) for r in counts.take_all()
             if r["rule_id"] in rule_types}
    rids = list(rule_types)
    return pa.table({
        "rule_id": pa.array(rids, pa.string()),
        "rule_type": pa.array([rule_types[r] for r in rids], pa.string()),
        "n": pa.array([fired.get(r, 0) for r in rids], pa.int64()),
    })


def _rule_coverage_query(sf_dir: str):
    return rule_coverage(sf_dir, default_profile())


def _terminology_query(sf_dir: str):
    """Concept-level terminology advisories (``RuleAdvisoryService.cs:
    27-240`` analogue) over the terminology-review authoring profile —
    metadata-only and corpus-independent (``sf_dir`` is the driver
    contract; authoring rule sets are KBs, driver-side by design)."""
    from ..terminology import terminology_advisories
    from .profiles import terminology_review_profile

    del sf_dir
    return terminology_advisories(terminology_review_profile())


def _registry_orphans_query(sf_dir: str):
    """Registry rows no document references (reverse anti-join audit)."""
    from ..stages.reference import registry_orphans

    paths = fixture_paths(sf_dir)
    docs = read_documents(paths["docs"])
    reg = read_registry(paths["registry"])
    return registry_orphans(docs, reg)


def _excerpts_query(sf_dir: str):
    """Full-default-profile violations enriched with a bounded preview of
    the offending span's text (``excerpt_violations``) — the playground's
    "show the actual value" surface as a first-class distributed join."""
    from ..explain import excerpt_violations

    paths = fixture_paths(sf_dir)
    docs = read_documents(paths["docs"])
    v = _violations_for(sf_dir, default_profile())
    return excerpt_violations(v, docs)


def _excerpts_sql() -> str:
    """The summary union body LEFT JOINed to the flat spans, with the same
    trim arithmetic as the kernel (chars; fixture text is ASCII so DuckDB
    substr == pyarrow utf8_slice_codeunits)."""
    from ..explain import EXCERPT_ELLIPSIS, EXCERPT_LEN

    body = (oracle.summary_sql().split("FROM (\n", 1)[1]
            .rsplit("\n) GROUP BY", 1)[0])
    return f"""
WITH v AS (
{body}
),
s AS (SELECT doc_id, span_index, text FROM read_parquet('{{flat}}'))
SELECT v.doc_id, CAST(v.span_index AS BIGINT) AS span_index,
       v.error_code, v.severity,
       CASE WHEN s.text IS NULL THEN NULL
            WHEN length(s.text) <= {EXCERPT_LEN} THEN s.text
            ELSE substr(s.text, 1, {EXCERPT_LEN}) || '{EXCERPT_ELLIPSIS}'
       END AS excerpt
FROM v LEFT JOIN s
  ON v.doc_id = s.doc_id AND v.span_index = s.span_index
"""


def validation_queries() -> dict[str, Callable[[str], Any]]:
    return {
        "v_required": _rule_query("R1"),
        "v_fixed_value": _rule_query("R2"),
        "v_allowed_values": _rule_query("R3"),
        "v_regex": _rule_query("R4"),
        "v_array_length": _rule_query("R5"),
        "v_code_system": _rule_query("R6"),
        "v_required_spans": _rule_query("R7"),
        "v_question_answer": _rule_query("R9"),
        "v_code_master": _rule_query("R10"),
        "v_fullurl_id": _fullurl_query,
        "v_exclusivity": _exclusivity_query,
        "v_custom_predicate": _custom_predicate_query,
        "v_custom_predicate_or": _custom_predicate_or_query,
        "v_filter_scope": _filter_scope_query,
        "v_structure": _structure_query,
        "v_empty_doc": _empty_doc_query,
        "v_lint": _lint_query,
        "c_suggest_rules": _suggest_rules_query,
        "v_extension": _extension_query,
        "v_spec_hints": _spec_hints_query,
        "v_explanations": _explanations_query,
        "v_breadcrumbs": _breadcrumbs_query,
        "v_json_ingest": _json_ingest_query,
        "v_primitive_date": _primitive_query("date", "date"),
        "v_primitive_datetime": _primitive_query("dateTime", "dateTime"),
        "v_primitive_uri": _primitive_query("uri", "uri"),
        "v_primitive_url": _primitive_query("uri", "url"),
        "v_primitive_canonical": _primitive_query("uri", "canonical"),
        "v_reference_inbundle": _reference_query("InBundleOnly"),
        "v_reference_require": _reference_query("RequireResolution"),
        "v_reference_allow_external": _reference_query("AllowExternal"),
        "v_reference_join": _reference_join_query,
        "v_uniqueness": _uniqueness_query,
        "v_summary": _summary_query,
        "v_summary_full": _summary_full_query,
        "v_tiered_summary": _tiered_summary_query,
        "v_examples": _examples_query,
        "v_profile_impact": _profile_impact_query,
        "v_quarantine": _quarantine_query,
        "v_rule_coverage": _rule_coverage_query,
        "m_pack_interleaved": _pack_interleaved_query,
        "v_excerpts": _excerpts_query,
        "v_registry_orphans": _registry_orphans_query,
        "v_terminology": _terminology_query,
    }


def validation_oracles(paths: dict[str, str]) -> dict[str, str]:
    o = {
        "v_required": oracle.V_REQUIRED,
        "v_fixed_value": oracle.V_FIXED_VALUE,
        "v_allowed_values": oracle.V_ALLOWED_VALUES,
        "v_regex": oracle.V_REGEX,
        "v_array_length": oracle.V_ARRAY_LENGTH,
        "v_code_system": oracle.V_CODE_SYSTEM,
        "v_required_spans": oracle.V_REQUIRED_SPANS,
        "v_question_answer": oracle.V_QUESTION_ANSWER,
        "v_code_master": oracle.V_CODE_MASTER,
        "v_fullurl_id": oracle.V_FULLURL_ID,
        "v_exclusivity": V_EXCLUSIVITY_SQL,
        "v_custom_predicate": oracle.V_CUSTOM_PREDICATE,
        "v_custom_predicate_or": V_CUSTOM_PREDICATE_OR_SQL,
        "v_filter_scope": V_FILTER_SCOPE_SQL,
        "v_structure": oracle.V_STRUCTURE,
        "v_empty_doc": oracle.V_EMPTY_DOC,
        "v_lint": _lint_sql(),
        "c_suggest_rules": _suggest_rules_sql(),
        "v_extension": V_EXTENSION_SQL,
        "v_spec_hints": _spec_hints_sql(),
        "v_explanations": _explanations_sql(),
        "v_breadcrumbs": _breadcrumbs_sql(),
        "v_excerpts": _excerpts_sql(),
        "v_registry_orphans": oracle.V_REGISTRY_ORPHANS,
        "v_json_ingest": _json_ingest_sql(),
        "v_primitive_date": oracle.primitive_sql("date", "date"),
        "v_primitive_datetime": oracle.primitive_sql("dateTime", "dateTime"),
        "v_primitive_uri": oracle.primitive_sql("uri", "uri"),
        "v_primitive_url": oracle.primitive_sql("uri", "url"),
        "v_primitive_canonical": oracle.primitive_sql("uri", "canonical"),
        "v_reference_inbundle": oracle.V_REFERENCE_INBUNDLE,
        "v_reference_require": oracle.V_REFERENCE_REQUIRE,
        "v_reference_allow_external": oracle.V_REFERENCE_ALLOW_EXTERNAL,
        "v_reference_join": oracle.V_REFERENCE_JOIN,
        "v_uniqueness": oracle.V_UNIQUENESS,
        "v_summary": oracle.summary_sql(),
        "v_summary_full": _summary_full_sql(),
        "v_tiered_summary": _tiered_summary_sql(),
        "v_examples": oracle.examples_sql(EXAMPLES_PER_CODE),
        "v_profile_impact": V_PROFILE_IMPACT_SQL,
        "v_quarantine": oracle.quarantine_sql(),
        "v_rule_coverage": oracle.rule_coverage_sql(
            {r["id"]: r["type"] for r in default_profile()["rules"]}),
        "m_pack_interleaved": _pack_interleaved_sql(),
    }
    from ..terminology import terminology_fixture_paths, terminology_sql
    from .profiles import terminology_review_profile

    o["v_terminology"] = terminology_sql(
        terminology_fixture_paths(terminology_review_profile()))
    full = dict(paths)
    full.setdefault("dup", paths["docs"].replace("docs_spans.parquet", "docs_dup.parquet"))
    return {k: oracle.fill(sql, full) for k, sql in o.items()}
