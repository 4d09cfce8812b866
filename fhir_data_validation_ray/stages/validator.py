"""The fused validator stage — one actor-pool ``map_batches`` over Arrow.

The reference's 9-stage per-document pipeline (``Core/ValidationPipeline.cs:
80-480``) fuses into ONE zero-copy Arrow stage for everything intra-document:
STRUCTURE grammar kernels, all business rules, CodeSystem, intra-document
reference resolution, STRUCTURE-priority dedup and severity resolution. Only
cross-document work (uniqueness, registry anti-join, global stats) leaves
this stage (SURVEY.md §3.3).

The actor pool is the stateful-stage pattern: the profile compiles once per
actor in ``__init__`` (the reference recompiled FHIRPath per evaluation,
``RuleEngines/FhirPathRuleEngine.cs:2163``); the broadcast registry key set is
fetched once per actor via ``ray.get`` of a driver-side ``ray.put`` ref.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from ..functions.kernels import CompiledProfile
from ..profile import Profile, parse_profile


class ValidatorActor:
    """Callable class for ``ds.map_batches(ValidatorActor, ...)``.

    Parameters are plain serializable values so the actor can be constructed
    on any node: the profile as a dict, the registry either inline (tiny) or
    as a ``ray.ObjectRef`` to a numpy array of keys (broadcast once with
    ``ray.put``, shared zero-copy by every actor on a node).
    """

    def __init__(
        self,
        profile_obj: dict[str, Any],
        registry_ref: Any = None,
        emit_details: bool = True,
    ):
        profile = parse_profile(profile_obj)
        registry_keys = None
        if registry_ref is not None:
            import ray

            keys = ray.get(registry_ref) if isinstance(registry_ref, ray.ObjectRef) else registry_ref
            registry_keys = np.asarray(keys, dtype="U")
        self.compiled = CompiledProfile(
            profile=profile, registry_keys=registry_keys, emit_details=emit_details
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.compiled.validate_batch(batch)


def validate_dataset(
    docs,
    profile_obj: dict[str, Any],
    registry_keys=None,
    *,
    batch_size: int = 4096,
    concurrency: int | tuple[int, int] | None = None,
    emit_details: bool = True,
):
    """docs Dataset -> violations Dataset (streaming, no materialization).

    ``registry_keys``: numpy array / list of external media_ref keys, or an
    existing ObjectRef. Broadcast via ``ray.put`` so each actor reads it once
    from the local object store instead of re-shipping per task.
    """
    import ray

    reg_ref = None
    if registry_keys is not None:
        reg_ref = (
            registry_keys
            if isinstance(registry_keys, ray.ObjectRef)
            else ray.put(np.asarray(registry_keys, dtype="U"))
        )
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    return docs.map_batches(
        ValidatorActor,
        fn_constructor_args=(profile_obj, reg_ref, emit_details),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
