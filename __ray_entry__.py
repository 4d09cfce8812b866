"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship validation pipeline at sf0.001; ``queries()``
exposes one callable per implemented operator (SURVEY.md §2) and
``oracle_sql()`` the matching DuckDB SQL over the same deterministic fixture
parquet. The driver initialises Ray itself — nothing here calls
``ray.init``/``ray.shutdown``.

The engine input is the ``BASELINE.json`` input_hint table shape
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)``,
synthesized deterministically from each sf dir's ``documents.parquet``
doc_ids (see ``fhir_data_validation_ray/sources/generator.py``); both the
nested table (Ray input) and its exploded view + registry (oracle input) are
cached under /tmp, so Ray pipeline and SQL read the same bytes.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship pipeline: read -> fused validator actor pool -> violations
    (unioned with the cross-document uniqueness check)."""
    from fhir_data_validation_ray.pipelines.validate import run_validation

    return run_validation(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from fhir_data_validation_ray.pipelines.dataops import dataops_queries
    from fhir_data_validation_ray.pipelines.queries import validation_queries

    return {**validation_queries(), **dataops_queries()}


def oracle_sql() -> dict[str, str]:
    from fhir_data_validation_ray.pipelines.dataops import dataops_oracles
    from fhir_data_validation_ray.pipelines.queries import validation_oracles
    from fhir_data_validation_ray.pipelines.validate import fixture_paths

    return {**validation_oracles(fixture_paths(SF_ORACLE)), **dataops_oracles(SF_ORACLE)}
