"""Test helpers: tiny in-memory document tables (the reference fixture style —
build bundle + rules in code, assert error rows; cf.
``FhirPathRuleEngineTests.cs:23-70``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fhir_data_validation_ray.functions.kernels import CompiledProfile
from fhir_data_validation_ray.profile import parse_profile
from fhir_data_validation_ray.sources.generator import DOCS_SCHEMA, SPAN_TYPE


def make_docs(rows: list[tuple[str, list[tuple]]]) -> pa.Table:
    """rows: [(doc_id, [(kind, text, media_ref, offset), ...]), ...]"""
    ids = [r[0] for r in rows]
    spans = [
        [{"kind": k, "text": t, "media_ref": m, "offset": o} for k, t, m, o in r[1]]
        for r in rows
    ]
    return pa.table(
        {"doc_id": pa.array(ids, pa.string()), "spans": pa.array(spans, pa.list_(SPAN_TYPE))},
        schema=DOCS_SCHEMA,
    )


def validate(docs: pa.Table, profile_dict: dict, registry=None,
             validation_mode: str = "standard") -> pa.Table:
    cp = CompiledProfile(
        parse_profile(profile_dict),
        registry_keys=np.asarray(registry, dtype="U") if registry is not None else None,
        validation_mode=validation_mode,
    )
    return cp.validate_batch(docs)


def rows(violations: pa.Table, *cols: str) -> list[tuple]:
    cols = cols or ("doc_id", "span_index", "error_code", "severity")
    return sorted(zip(*[violations[c].to_pylist() for c in cols]))


def profile_of(*rules: dict, **kw) -> dict:
    p = {
        "version": "1.0",
        "rules": list(rules),
        "settings": {"checkDocId": False, "checkSpanOrder": False,
                     "checkEmptyDoc": False, "dedupStructure": True,
                     # lint auto-injects in full mode; tests opt in
                     # explicitly so rule-kernel assertions stay focused
                     "lint": False},
        "allowedKinds": [],
    }
    p.update(kw)
    return p
