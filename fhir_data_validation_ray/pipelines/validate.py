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
):
    """Returns the violations Dataset for one scale-factor directory."""
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
    )
    if with_uniqueness:
        # separate column-pruned scan: the uniqueness pass never decodes spans
        ids_only = read_documents(paths["docs"], columns=["doc_id"])
        violations = violations.union(uniqueness_violations(ids_only))
    return violations


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
