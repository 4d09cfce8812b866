"""Flagship validation pipeline: read -> fused validator -> cross-doc stages
-> violations + summary. All stages stream; nothing materializes the corpus.

Stage map (SURVEY.md §7.1):
    Stage A  map_batches(ValidatorActor)        intra-document (no shuffle)
    Stage B  uniqueness groupby + registry join  cross-document (shuffles)
    Stage D  summary aggregate                   small result
"""

from __future__ import annotations

import os
from typing import Any

from ..sources.generator import ensure_fixtures, ensure_fixtures_scaled
from ..sources.readers import read_documents, registry_keys_numpy
from ..stages.uniqueness import uniqueness_violations
from ..stages.validator import validate_dataset
from .profiles import default_profile


def fixture_paths(sf_dir: str, replicas: int = 1) -> dict[str, str]:
    if replicas > 1:
        fx = ensure_fixtures_scaled(sf_dir, replicas)
        return {
            "docs": os.path.join(fx, "docs_spans"),
            "flat": "",
            "registry": os.path.join(fx, "registry.parquet"),
        }
    fx = ensure_fixtures(sf_dir, replicas)
    return {
        "docs": os.path.join(fx, "docs_spans.parquet"),
        "flat": os.path.join(fx, "spans_flat.parquet"),
        "registry": os.path.join(fx, "registry.parquet"),
    }


def run_validation(
    sf_dir: str,
    profile_obj: dict[str, Any] | None = None,
    *,
    replicas: int = 1,
    with_uniqueness: bool = True,
    batch_size: int = 4096,
    concurrency=None,
    emit_details: bool = True,
    validation_mode: str = "standard",
):
    """Returns the violations Dataset for one scale-factor directory.
    ``validation_mode``: "standard" (blocking checks only, default) or
    "full"/"debug" (adds the advisory spec-hint/heuristic rule layer —
    identical blocking decisions, ``Models/ValidationRequest.cs:76-97``)."""
    paths = fixture_paths(sf_dir, replicas)
    docs = read_documents(paths["docs"])
    profile_obj = profile_obj or default_profile()
    reg = registry_keys_numpy(paths["registry"])
    violations = validate_dataset(
        docs,
        profile_obj,
        registry_keys=reg,
        batch_size=batch_size,
        concurrency=concurrency,
        emit_details=emit_details,
        validation_mode=validation_mode,
    )
    if with_uniqueness:
        # separate column-pruned scan: the uniqueness pass never decodes spans
        ids_only = read_documents(paths["docs"], columns=["doc_id"])
        violations = violations.union(uniqueness_violations(ids_only))
    return violations


def with_stage_rank(violations):
    """Add the pipeline-stage rank column so any consumer can reproduce the
    reference's deterministic error order (``docs/05_validation_pipeline.md:
    20-31``) with ``ds.sort(["doc_id", "stage_rank", "span_index", "rule_id"])``
    — no global sort is needed for correctness (SURVEY.md §2.7)."""
    import numpy as np
    import pyarrow as pa

    from .. import errors as E

    ranks = E.SOURCE_STAGE_RANK

    def add_rank(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        da = pc.dictionary_encode(src)
        lut = np.array(
            [ranks.get(s, 99) for s in da.dictionary.to_pylist()], dtype=np.int32
        )
        return t.append_column(
            "stage_rank", pa.array(lut[np.asarray(da.indices)], pa.int32())
        )

    return violations.map_batches(add_rank, batch_format="pyarrow")


def validation_response(
    sf_dir: str,
    profile_obj: dict[str, Any] | None = None,
    *,
    replicas: int = 1,
    max_errors: int = 100,
    validation_mode: str = "standard",
) -> dict[str, Any]:
    """The ``ValidationResponse`` analogue (``Models/ValidationResponse.cs:
    9-85``): errors sample + summary counts + metadata + the IsValid verdict
    (``Playground.Api/Controllers/ValidateController.cs:69``: no error-severity
    rows). Corpus-level: the summary aggregates stream, only ``max_errors``
    violation rows materialize."""
    import time

    t0 = time.perf_counter()
    profile_obj = profile_obj or default_profile()
    violations = run_validation(sf_dir, profile_obj, replicas=replicas,
                                validation_mode=validation_mode)
    summary = summarize(violations)
    errors = violations.limit(max_errors).to_pandas().to_dict("records")
    n_error = int(summary.loc[summary["severity"] == "error", "n"].sum())
    n_warning = int(summary.loc[summary["severity"] == "warning", "n"].sum())
    return {
        "isValid": n_error == 0,
        "errors": errors,
        "summary": {
            "totalErrors": n_error,
            "totalWarnings": n_warning,
            "bySeveritySource": summary.to_dict("records"),
        },
        "metadata": {
            "rulesVersion": str(profile_obj.get("version", "1.0")),
            "validationMode": validation_mode,
            "engine": "fhir_data_validation_ray",
            "processingTimeMs": round((time.perf_counter() - t0) * 1000, 1),
        },
    }


def summarize(violations):
    """Summary counts by (severity, source) — the ValidationSummary analogue
    (``Core/ValidationPipeline.cs:755-770``). Small result; safe to collect."""
    from ray.data.aggregate import Count

    return (
        violations.groupby(["severity", "source"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["severity", "source"])
        .reset_index(drop=True)
    )
