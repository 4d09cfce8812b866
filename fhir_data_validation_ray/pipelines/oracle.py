"""DuckDB oracle SQL for every validation operator.

Each engine kernel has an equivalent ANSI-SQL formulation over the FLATTENED
fixture parquet (``spans_flat.parquet``) — the driver runs both sides and
compares row count + schema + order-insensitive value hash. Column names and
dtypes match the Ray side exactly: ``span_index`` is INTEGER (int32),
everything else VARCHAR except counts (BIGINT).

SQL templates use placeholders {flat} {docs} {dup} {registry} filled with the
fixture paths for the scale factor under test.
"""

from __future__ import annotations

EMPTY = "(text IS NULL OR trim(text) = '')"

ALLOWED_KINDS_SQL = (
    "('Patient','Observation','Coding','Encounter','text','image','audio',"
    "'Question','Screening','date','dateTime','uri')"
)

V_REQUIRED = f"""
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'REQUIRED_FIELD_MISSING' AS error_code, 'error' AS severity
FROM read_parquet('{{flat}}')
WHERE kind = 'Patient' AND {EMPTY}
"""

V_FIXED_VALUE = f"""
WITH e AS (
  SELECT doc_id, span_index, text,
         row_number() OVER (PARTITION BY doc_id ORDER BY span_index) AS rn
  FROM read_parquet('{{flat}}') WHERE kind = 'Encounter')
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'FIXED_VALUE_MISMATCH' AS error_code, 'error' AS severity
FROM e WHERE rn = 1 AND NOT {EMPTY} AND text <> 'ambulatory'
"""

V_ALLOWED_VALUES = f"""
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'VALUE_NOT_ALLOWED' AS error_code, 'error' AS severity
FROM read_parquet('{{flat}}')
WHERE kind = 'Observation' AND NOT {EMPTY} AND text NOT IN ('final','amended')
"""

V_REGEX = f"""
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'PATTERN_MISMATCH' AS error_code, 'error' AS severity
FROM read_parquet('{{flat}}')
WHERE kind = 'Patient' AND NOT {EMPTY}
  AND NOT regexp_matches(text, '^[STFG]\\d{{7}}[A-Z]$')
"""

V_ARRAY_LENGTH = """
SELECT doc_id, CAST(-1 AS INTEGER) AS span_index,
       'ARRAY_LENGTH_OUT_OF_RANGE' AS error_code, 'error' AS severity
FROM read_parquet('{docs}')
WHERE len(spans) < 1 OR len(spans) > 100
"""

V_CODE_SYSTEM = f"""
WITH c AS (
  SELECT doc_id, span_index,
         CASE WHEN strpos(text,'|') > 0 THEN split_part(text,'|',1) END AS sys,
         CASE WHEN strpos(text,'|') > 0 THEN split_part(text,'|',2) ELSE text END AS code
  FROM read_parquet('{{flat}}')
  WHERE kind = 'Coding' AND NOT {EMPTY})
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'CODESYSTEM_MISMATCH' AS error_code, 'error' AS severity
FROM c WHERE sys IS NOT NULL AND sys <> 'https://example.org/cs/language'
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'CODE_NOT_IN_VALUESET' AS error_code, 'error' AS severity
FROM c WHERE (sys IS NULL OR sys = 'https://example.org/cs/language')
  AND code NOT IN ('EN','MS','TA')
"""

V_REQUIRED_SPANS = """
WITH counts AS (
  SELECT d.doc_id,
         (SELECT count(*) FROM read_parquet('{flat}') f
          WHERE f.doc_id = d.doc_id AND f.kind = 'Patient') AS c
  FROM read_parquet('{docs}') d)
SELECT doc_id, CAST(-1 AS INTEGER) AS span_index,
       'RESOURCE_REQUIREMENT_VIOLATION' AS error_code, 'error' AS severity
FROM counts WHERE c < 1 OR c > 20
"""

V_CUSTOM_PREDICATE = f"""
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'CUSTOMFHIRPATH_CONDITION_FAILED' AS error_code, 'error' AS severity
FROM read_parquet('{{flat}}')
WHERE kind = 'Observation' AND NOT (text IS NOT NULL AND text <> 'cancelled')
"""

V_STRUCTURE = """
SELECT doc_id, CAST(-1 AS INTEGER) AS span_index,
       'EMPTY_BUNDLE' AS error_code, 'error' AS severity
FROM read_parquet('{docs}')
WHERE spans IS NULL OR len(spans) = 0
UNION ALL
SELECT doc_id, CAST(-1 AS INTEGER) AS span_index,
       'FHIR_INVALID_PRIMITIVE' AS error_code, 'error' AS severity
FROM read_parquet('{docs}')
WHERE NOT regexp_matches(doc_id, '^[A-Za-z0-9.\\-]{1,64}$')
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'INVALID_ENUM_VALUE', 'error'
FROM read_parquet('{flat}') WHERE kind NOT IN __ALLOWED__
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'FHIR_INVALID_REFERENCE_FORMAT', 'error'
FROM read_parquet('{flat}')
WHERE media_ref IS NOT NULL AND trim(media_ref) <> ''
  AND NOT regexp_matches(media_ref, '^(urn:[^ ]+|[A-Za-z]+/.+\\.[0-9]+)$')
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'SPAN_SEQUENCE_INVALID', 'error'
FROM (SELECT doc_id, span_index, "offset",
             lag("offset") OVER (PARTITION BY doc_id ORDER BY span_index) AS prev
      FROM read_parquet('{flat}'))
WHERE prev IS NOT NULL AND "offset" <= prev
""".replace("__ALLOWED__", ALLOWED_KINDS_SQL)

# Shared parse of reference strings: ONE ROW PER SPAN (each span carries one
# ref, so there is no within-resource repetition to dedup — matching
# ``ReferenceResolver.cs:89-103`` faithfully); local shape
# "<Kind>/<doc>.<offset>" vs external; resolution = join back on the target
# offset within the SAME document.
_REFS_CTE = """
WITH refs AS (
  SELECT doc_id, span_index, kind, media_ref
  FROM read_parquet('{flat}')
  WHERE media_ref IS NOT NULL AND trim(media_ref) <> ''),
parsed AS (
  SELECT r.*,
    CASE WHEN media_ref LIKE 'urn:%' THEN ''
         ELSE regexp_extract(media_ref, '^([A-Za-z]+)/(.+)\\.([0-9]+)$', 1) END AS claimed,
    CASE WHEN media_ref LIKE 'urn:%' THEN ''
         ELSE regexp_extract(media_ref, '^([A-Za-z]+)/(.+)\\.([0-9]+)$', 2) END AS tdoc,
    CASE WHEN media_ref LIKE 'urn:%' THEN NULL
         ELSE try_cast(nullif(regexp_extract(media_ref, '^([A-Za-z]+)/(.+)\\.([0-9]+)$', 3), '') AS INTEGER) END AS toff
  FROM refs r),
resolved AS (
  SELECT p.*, t.kind AS target_kind,
         (p.claimed <> '') AS is_local,
         (t.doc_id IS NOT NULL) AS ok_local
  FROM parsed p
  LEFT JOIN read_parquet('{flat}') t
    ON p.claimed <> '' AND p.tdoc = p.doc_id
   AND t.doc_id = p.doc_id AND t."offset" = p.toff)
"""

V_REFERENCE_INBUNDLE = (
    _REFS_CTE
    + """
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'REFERENCE_NOT_FOUND' AS error_code, 'error' AS severity
FROM resolved WHERE (is_local AND NOT ok_local) OR NOT is_local
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'REFERENCE_TYPE_MISMATCH' AS error_code, 'error' AS severity
FROM resolved WHERE ok_local AND target_kind <> claimed
"""
)

V_REFERENCE_REQUIRE = (
    _REFS_CTE
    + """
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'REFERENCE_NOT_FOUND' AS error_code, 'error' AS severity
FROM resolved
WHERE NOT ok_local
  AND media_ref NOT IN (SELECT media_ref FROM read_parquet('{registry}'))
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'REFERENCE_TYPE_MISMATCH' AS error_code, 'error' AS severity
FROM resolved WHERE ok_local AND target_kind <> claimed
"""
)

V_REFERENCE_ALLOW_EXTERNAL = (
    _REFS_CTE
    + """
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'REFERENCE_NOT_FOUND' AS error_code, 'warning' AS severity
FROM resolved
WHERE NOT ok_local
  AND media_ref NOT IN (SELECT media_ref FROM read_parquet('{registry}'))
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'REFERENCE_TYPE_MISMATCH' AS error_code, 'error' AS severity
FROM resolved WHERE ok_local AND target_kind <> claimed
"""
)

# External refs (non-local-shaped) anti-joined against the registry — the
# partitioned-hash-join stage. No per-document dedup on this path.
V_REFERENCE_JOIN = """
SELECT f.doc_id, CAST(f.span_index AS INTEGER) AS span_index,
       'REFERENCE_NOT_FOUND' AS error_code, 'error' AS severity
FROM read_parquet('{flat}') f
WHERE f.media_ref IS NOT NULL AND trim(f.media_ref) <> ''
  AND regexp_extract(f.media_ref, '^([A-Za-z]+)/(.+)\\.([0-9]+)$', 1) = ''
  AND f.media_ref NOT IN (SELECT media_ref FROM read_parquet('{registry}'))
"""

V_REGISTRY_ORPHANS = """
SELECT r.media_ref, r.kind FROM read_parquet('{registry}') r
WHERE r.media_ref NOT IN (
  SELECT media_ref FROM read_parquet('{flat}')
  WHERE media_ref IS NOT NULL AND trim(media_ref) <> ''
    AND regexp_extract(media_ref, '^([A-Za-z]+)/(.+)\\.([0-9]+)$', 1) = '')
"""

# QuestionAnswer (R9): text = "<qcode>=<answer>"; typed per-question checks.
# Mirrors k_question_answer's dispatch order and exclusivity exactly.
V_QUESTION_ANSWER = f"""
WITH qa AS (
  SELECT doc_id, span_index,
         CASE WHEN strpos(text, '=') > 0 THEN split_part(text, '=', 1) END AS q,
         CASE WHEN strpos(text, '=') > 0 THEN substr(text, strpos(text, '=') + 1) END AS a
  FROM read_parquet('{{flat}}')
  WHERE kind = 'Question' AND NOT {EMPTY})
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'INVALID_ANSWER_VALUE' AS error_code, 'error' AS severity
FROM qa WHERE q IS NULL
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'UNKNOWN_QUESTION', 'error'
FROM qa WHERE q IS NOT NULL AND q NOT IN ('Q1','Q2','Q3','Q4','Q5','Q6','Q7','Q8')
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'INVALID_ANSWER_VALUE', 'error'
FROM qa WHERE q = 'Q1' AND a NOT IN ('true','false')
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'INVALID_ANSWER_VALUE', 'error'
FROM qa WHERE q = 'Q2' AND NOT regexp_matches(a, '^-?[0-9]+$')
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'ANSWER_OUT_OF_RANGE', 'error'
FROM qa WHERE q = 'Q2' AND regexp_matches(a, '^-?[0-9]+$')
  AND (CAST(a AS DOUBLE) < 0 OR CAST(a AS DOUBLE) > 120)
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'INVALID_ANSWER_VALUE', 'error'
FROM qa WHERE q = 'Q3' AND strpos(a, ',') > 0
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'ANSWER_NOT_IN_VALUESET', 'error'
FROM qa WHERE q = 'Q3' AND strpos(a, ',') = 0 AND a NOT IN ('mild','moderate','severe')
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'INVALID_ANSWER_VALUE', 'error'
FROM qa WHERE q = 'Q4' AND NOT regexp_matches(a, '^[A-Z]{{2}}[0-9]{{4}}$')
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'ANSWER_NOT_IN_VALUESET', 'error'
FROM qa WHERE q = 'Q5'
  AND len(list_filter(string_split(a, ','), x -> x NOT IN ('a','b','c'))) > 0
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'INVALID_ANSWER_VALUE', 'error'
FROM qa WHERE q = 'Q6' AND NOT regexp_matches(a, '^-?[0-9]+(\\.[0-9]+)?$')
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'ANSWER_OUT_OF_RANGE', 'error'
FROM qa WHERE q = 'Q6' AND regexp_matches(a, '^-?[0-9]+(\\.[0-9]+)?$')
  AND (CAST(a AS DOUBLE) < 0 OR CAST(a AS DOUBLE) > 40.5)
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'INVALID_ANSWER_VALUE', 'error'
FROM qa WHERE q = 'Q7' AND strpos(a, ',') > 0
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'ANSWER_NOT_IN_VALUESET', 'warning'
FROM qa WHERE q = 'Q7' AND strpos(a, ',') = 0 AND a NOT IN ('x','y')
UNION ALL
-- Q8 quantity "<value> <unit>": shape, unit (missing displays as 'none'),
-- and range checks — unit and range BOTH fire on a lexically valid answer
SELECT doc_id, CAST(span_index AS INTEGER), 'INVALID_ANSWER_VALUE', 'error'
FROM qa WHERE q = 'Q8' AND NOT (len(string_split(a, ' ')) <= 2
  AND regexp_matches(split_part(a, ' ', 1), '^-?[0-9]+(\\.[0-9]+)?$'))
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'INVALID_ANSWER_VALUE', 'error'
FROM qa WHERE q = 'Q8' AND len(string_split(a, ' ')) <= 2
  AND regexp_matches(split_part(a, ' ', 1), '^-?[0-9]+(\\.[0-9]+)?$')
  AND (CASE WHEN len(string_split(a, ' ')) = 2 THEN split_part(a, ' ', 2)
       ELSE 'none' END) <> 'mg'
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'ANSWER_OUT_OF_RANGE', 'error'
FROM qa WHERE q = 'Q8' AND len(string_split(a, ' ')) <= 2
  AND regexp_matches(split_part(a, ' ', 1), '^-?[0-9]+(\\.[0-9]+)?$')
  AND (CAST(split_part(a, ' ', 1) AS DOUBLE) < 0
       OR CAST(split_part(a, ' ', 1) AS DOUBLE) > 10)
"""

# FullUrlIdMatch: local-shaped refs must name their own document.
V_FULLURL_ID = """
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'ENTRY_REFERENCE_MISMATCH' AS error_code, 'error' AS severity
FROM read_parquet('{flat}')
WHERE media_ref IS NOT NULL AND trim(media_ref) <> ''
  AND media_ref NOT LIKE 'urn:%'
  AND regexp_extract(media_ref, '^([A-Za-z]+)/(.+)\\.([0-9]+)$', 1) <> ''
  AND regexp_extract(media_ref, '^([A-Za-z]+)/(.+)\\.([0-9]+)$', 2) <> doc_id
"""

# CodeMaster (R10): text = "<screening>|<question>=<answer>".
V_CODE_MASTER = f"""
WITH cm AS (
  SELECT doc_id, span_index,
         split_part(text, '|', 1) AS scr,
         substr(text, strpos(text, '|') + 1) AS rest
  FROM read_parquet('{{flat}}')
  WHERE kind = 'Screening' AND NOT {EMPTY} AND strpos(text, '|') > 0),
qa AS (
  SELECT doc_id, span_index, scr,
         CASE WHEN strpos(rest, '=') > 0 THEN split_part(rest, '=', 1) END AS q,
         CASE WHEN strpos(rest, '=') > 0 THEN substr(rest, strpos(rest, '=') + 1) END AS a
  FROM cm)
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'CODEMASTER_SCREENING_UNKNOWN' AS error_code, 'error' AS severity
FROM qa WHERE scr NOT IN ('SCR1','SCR2')
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'INVALID_ANSWER_VALUE', 'error'
FROM qa WHERE scr IN ('SCR1','SCR2') AND q IS NULL
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'CODEMASTER_QUESTION_UNKNOWN', 'error'
FROM qa WHERE (scr = 'SCR1' AND q IS NOT NULL AND q NOT IN ('Q1','Q2'))
   OR (scr = 'SCR2' AND q IS NOT NULL AND q NOT IN ('Q3'))
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'INVALID_ANSWER_VALUE', 'error'
FROM qa WHERE scr = 'SCR1' AND q = 'Q1' AND strpos(a, ',') > 0
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'ANSWER_NOT_IN_VALUESET', 'error'
FROM qa WHERE scr = 'SCR1' AND q = 'Q1' AND strpos(a, ',') = 0 AND a NOT IN ('yes','no')
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'ANSWER_NOT_IN_VALUESET', 'error'
FROM qa WHERE scr = 'SCR1' AND q = 'Q2'
  AND len(list_filter(string_split(a, ','), x -> x NOT IN ('a','b','c'))) > 0
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'INVALID_ANSWER_VALUE', 'error'
FROM qa WHERE scr = 'SCR2' AND q = 'Q3' AND strpos(a, ',') > 0
UNION ALL
SELECT doc_id, CAST(span_index AS INTEGER), 'ANSWER_NOT_IN_VALUESET', 'error'
FROM qa WHERE scr = 'SCR2' AND q = 'Q3' AND strpos(a, ',') = 0 AND a NOT IN ('low','high')
"""

# Primitive lexical grammars: the SQL validity expression is built from the
# SAME RE2 patterns the kernel compiles (``functions/kernels.py:PRIM_RE``), so
# kernel and oracle cannot drift. The calendar check on full YYYY-MM-DD
# prefixes uses try_strptime (DuckDB rejects 2021-02-30, matching the
# kernel's numpy days-in-month arithmetic).
def primitive_valid_expr(primitive: str) -> str:
    from ..functions.kernels import PRIM_RE, PRIM_STRING_BAD_RE, _CALENDAR_TYPES

    if primitive == "string":
        return f"NOT regexp_matches(text, '{PRIM_STRING_BAD_RE}')"
    expr = f"regexp_matches(text, '{PRIM_RE[primitive]}')"
    if primitive in _CALENDAR_TYPES:
        expr += (
            " AND (length(text) < 10"
            " OR try_strptime(substr(text, 1, 10), '%Y-%m-%d') IS NOT NULL)"
        )
    return expr


def primitive_sql(kind: str, primitive: str) -> str:
    return f"""
SELECT doc_id, CAST(span_index AS INTEGER) AS span_index,
       'FHIR_INVALID_PRIMITIVE' AS error_code, 'error' AS severity
FROM read_parquet('{{flat}}')
WHERE kind = '{kind}' AND text IS NOT NULL
  AND NOT ({primitive_valid_expr(primitive)})
"""


# Stage-0 document sanity: zero-span documents (the EMPTY_BUNDLE analogue,
# ``Core/ValidationPipeline.cs:610-656``) — read from the NESTED table (the
# flat view has no rows for an empty document).
V_EMPTY_DOC = """
SELECT doc_id, CAST(-1 AS INTEGER) AS span_index,
       'EMPTY_BUNDLE' AS error_code, 'error' AS severity
FROM read_parquet('{docs}')
WHERE spans IS NULL OR len(spans) = 0
"""

V_UNIQUENESS = """
SELECT doc_id, CAST(count(*) AS BIGINT) AS n
FROM read_parquet('{dup}')
GROUP BY doc_id HAVING count(*) > 1
"""

def fill(sql: str, paths: dict[str, str]) -> str:
    """Substitute {flat}/{docs}/{dup}/{registry} placeholders by literal
    replacement (NOT str.format — the SQL contains regex quantifier braces)."""
    for k, v in paths.items():
        sql = sql.replace("{%s}" % k, v)
    return sql


def default_rule_parts() -> list[tuple[str, str]]:
    """(rule_id, per-rule oracle SQL) for every rule of the default profile
    (``pipelines/profiles.py:DEFAULT_PROFILE``) — the single source of truth
    behind the summary/examples/quarantine/coverage oracles. R8 uses
    RequireResolution (the default profile's policy)."""
    return [
        ("R1", V_REQUIRED),
        ("R2", V_FIXED_VALUE),
        ("R3", V_ALLOWED_VALUES),
        ("R4", V_REGEX),
        ("R5", V_ARRAY_LENGTH),
        ("R6", V_CODE_SYSTEM),
        ("R7", V_REQUIRED_SPANS),
        ("R8", V_REFERENCE_REQUIRE),
        ("R9", V_QUESTION_ANSWER),
        ("R10", V_CODE_MASTER),
        ("R11", primitive_sql("date", "date")),
        ("R12", primitive_sql("dateTime", "dateTime")),
        ("R13", primitive_sql("uri", "uri")),
    ]


def summary_sql() -> str:
    """Summary of the full default profile = union of all per-rule result
    sets plus the structural stage, counted by (error_code, severity)."""
    parts = [p for _, p in default_rule_parts()] + [V_STRUCTURE]
    body = "\nUNION ALL\n".join(f"SELECT * FROM ({p})" for p in parts)
    return (
        "SELECT error_code, severity, CAST(count(*) AS BIGINT) AS n FROM (\n"
        + body
        + "\n) GROUP BY error_code, severity"
    )


def rule_coverage_sql(rule_types: dict[str, str]) -> str:
    """Per-rule fire counts over the full default profile, INCLUDING
    zero-fire rules (dead-rule detection). The reference traces exactly this
    per rule evaluation (``RuleEngines/FhirPathRuleEngine.cs:308`` — "Rule
    {RuleId} ({RuleType}) produced {ErrorCount} errors"; lint's analogue
    ``Authoring/LintValidationService.cs:147-152``); here it is a
    first-class result table. ``rule_types`` comes from the SAME profile
    object the engine compiles, so the inventory matches by construction."""
    fired = "\nUNION ALL\n".join(
        f"SELECT '{rid}' AS rule_id, count(*) AS c FROM ({sql})"
        for rid, sql in default_rule_parts()
    )
    inv = ", ".join(
        f"('{rid}', '{rule_types[rid]}')" for rid, _ in default_rule_parts()
    )
    return (
        "WITH fired AS (\n" + fired + "\n)\n"
        "SELECT r.rule_id, r.rule_type, CAST(coalesce(f.c, 0) AS BIGINT) AS n\n"
        f"FROM (VALUES {inv}) r(rule_id, rule_type)\n"
        "LEFT JOIN fired f ON f.rule_id = r.rule_id"
    )


def examples_sql(n: int = 3) -> str:
    """Per-error-code example rows: the ``n`` smallest (doc_id, span_index)
    of each code over the same full-profile union ``summary_sql`` counts —
    the debugging drill-down next to the summary."""
    body = summary_sql().split("FROM (\n", 1)[1].rsplit("\n) GROUP BY", 1)[0]
    return (
        f"SELECT doc_id, span_index, error_code FROM (\n{body}\n) "
        f"QUALIFY row_number() OVER (PARTITION BY error_code "
        f"ORDER BY doc_id, span_index) <= {n}"
    )


def quarantine_sql() -> str:
    """Doc-level pass/fail verdicts: documents with >=1 error-severity row
    across the same full-profile union ``summary_sql`` counts — the ids the
    quarantine split diverts (``pipelines/validate.py:blocking_doc_ids``)."""
    body = summary_sql().split("FROM (\n", 1)[1].rsplit("\n) GROUP BY", 1)[0]
    return (
        f"SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocking FROM (\n{body}\n) "
        "WHERE severity = 'error' GROUP BY doc_id"
    )
