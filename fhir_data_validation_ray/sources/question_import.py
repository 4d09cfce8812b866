"""Bulk question-catalog import AND export (CSV / JSON) <-> QuestionAnswer
profile fragments.

Mirrors the reference's terminology bulk-import surface
(``docs/TERMINOLOGY_BULK_IMPORT.md``, ``examples/import-questions-sample.csv``
/ ``.json``): records of ``(system, conceptCode, questionText,
allowedValues, allowMultiple, separator)`` become the ``questions`` list the
QuestionAnswer engine consumes plus one ``codeSystems`` entry per system.

CSV quirk handled faithfully: the sample CSV leaves ``allowedValues``
UNQUOTED even when its separator is a comma, so a naive csv reader splits it
across fields — rows are therefore parsed positionally from both ends
(3 fields from the left, 2 from the right, everything between re-joined as
the allowed-values payload, then split on the row's own ``separator``).

Import validation (fail fast, like profile compile): duplicate conceptCode
within a system and empty allowed-value lists are errors.

Export (``questions_to_csv`` / ``questions_to_json``) is the inverse: a
profile fragment back to the bulk formats, choosing a separator per row that
cannot collide with the row's values (the sample CSV's comma-separator rows
write an EMPTY separator field — reproduced on write so import(export(x))
round-trips through the quirk).
"""

from __future__ import annotations

import json
from typing import Any

from ..profile import ProfileError

CSV_HEADER = ["system", "conceptCode", "questionText", "allowedValues",
              "allowMultiple", "separator"]


def _record_to_question(rec: dict[str, Any]) -> dict[str, Any]:
    allowed = [str(v) for v in rec["allowedValues"] if str(v).strip()]
    if not allowed:
        raise ProfileError(
            f"question {rec.get('conceptCode')!r}: empty allowedValues"
        )
    return {
        "code": str(rec["conceptCode"]),
        "type": "code",
        "allowed": allowed,
        "multiValue": bool(rec.get("allowMultiple", False)),
    }


def _assemble(records: list[dict[str, Any]]) -> dict[str, Any]:
    questions: list[dict[str, Any]] = []
    by_system: dict[str, list[str]] = {}
    seen: set[tuple[str, str]] = set()
    for rec in records:
        system = str(rec.get("system", ""))
        code = str(rec.get("conceptCode", ""))
        if not code:
            raise ProfileError("import record without conceptCode")
        key = (system, code)
        if key in seen:
            raise ProfileError(f"duplicate question {code!r} in system {system!r}")
        seen.add(key)
        questions.append(_record_to_question(rec))
        by_system.setdefault(system, []).append(code)
    return {
        "questions": questions,
        "codeSystems": [
            {"url": sys_url, "concept": [{"code": c} for c in codes]}
            for sys_url, codes in by_system.items()
        ],
    }


def questions_from_json(text: str) -> dict[str, Any]:
    """JSON import (the canonical format): a list of records with
    ``allowedValues`` already as a list."""
    try:
        records = json.loads(text)
    except json.JSONDecodeError as e:
        raise ProfileError(f"invalid question-import JSON: {e}") from e
    if not isinstance(records, list):
        raise ProfileError("question-import JSON must be a list of records")
    return _assemble(records)


def _fragment_records(fragment: dict[str, Any]) -> list[dict[str, Any]]:
    """Profile fragment -> flat import-style records; the question's owning
    system is recovered from the codeSystems entry containing its code."""
    sys_of: dict[str, str] = {}
    for cs in fragment.get("codeSystems", []) or []:
        url = cs.get("url") or cs.get("system") or ""
        for c in cs.get("concept", cs.get("concepts", [])) or []:
            sys_of[c["code"] if isinstance(c, dict) else str(c)] = url
    records = []
    for q in fragment.get("questions", []) or []:
        code = str(q["code"])
        records.append(
            {
                "system": sys_of.get(code, ""),
                "conceptCode": code,
                "questionText": str(q.get("text", "")),
                "allowedValues": [str(v) for v in q.get("allowed", [])],
                "allowMultiple": bool(q.get("multiValue", False)),
            }
        )
    return records


def questions_to_json(fragment: dict[str, Any]) -> str:
    """Profile fragment -> canonical JSON import format (a list of records);
    ``questions_from_json(questions_to_json(x))`` round-trips."""
    return json.dumps(
        [dict(rec, separator=",") for rec in _fragment_records(fragment)],
        indent=1,
    )


def questions_to_csv(fragment: dict[str, Any]) -> str:
    """Profile fragment -> the reference's CSV bulk format, reproducing the
    sample's quirks: allowedValues written UNQUOTED joined by the row's
    separator; comma-separator rows leave the separator field empty. A
    separator is chosen per row so it never appears inside a value (',' when
    safe, else '|' / ';' / ':'); a value set exhausting all four is an
    export error — quote-free parseability is the format's contract."""
    lines = [",".join(CSV_HEADER)]
    for rec in _fragment_records(fragment):
        vals = rec["allowedValues"]
        for sep in (",", "|", ";", ":"):
            if not any(sep in v for v in vals):
                break
        else:
            raise ProfileError(
                f"question {rec['conceptCode']!r}: allowedValues use every "
                "supported separator; cannot export unquoted CSV"
            )
        for fld in ("system", "conceptCode", "questionText"):
            if "," in rec[fld]:
                raise ProfileError(
                    f"question {rec['conceptCode']!r}: comma in {fld} cannot "
                    "be exported to the unquoted CSV format"
                )
        lines.append(",".join([
            rec["system"], rec["conceptCode"], rec["questionText"],
            sep.join(vals), "true" if rec["allowMultiple"] else "false",
            "" if sep == "," else sep,
        ]))
    return "\n".join(lines) + "\n"


def questions_from_csv(text: str) -> dict[str, Any]:
    """CSV import with the reference sample's unquoted-separator quirk."""
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if not lines:
        return _assemble([])
    header = [h.strip() for h in lines[0].split(",")]
    if header != CSV_HEADER:
        raise ProfileError(
            f"question-import CSV header must be {','.join(CSV_HEADER)}"
        )
    records = []
    for ln in lines[1:]:
        parts = ln.split(",")
        # comma-separated value rows write the separator field as EMPTY
        # (a literal ',' would add another field) leaving trailing empties
        while parts and parts[-1] == "":
            parts.pop()
        if len(parts) < 5:
            raise ProfileError(f"malformed import row: {ln!r}")
        system, concept_code, question_text = parts[0], parts[1], parts[2]
        if parts[-1].strip().lower() in ("true", "false"):
            allow_multiple, sep = parts[-1], ","
            raw_values = ",".join(parts[3:-1])  # re-join the unquoted middle
        else:
            allow_multiple, sep = parts[-2], parts[-1]
            raw_values = ",".join(parts[3:-2])
        records.append(
            {
                "system": system.strip(),
                "conceptCode": concept_code.strip(),
                "questionText": question_text.strip(),
                "allowedValues": [v for v in raw_values.split(sep)],
                "allowMultiple": allow_multiple.strip().lower() == "true",
                "separator": sep,
            }
        )
    return _assemble(records)
