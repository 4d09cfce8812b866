"""0-/1-row batch probe for map_batches UDFs.

Streaming execution legitimately hands batch UDFs zero-row blocks (block
splits, selective filters) and single-row runts.  The r04 driver red
(`d_crosslang_dups`) was exactly this class: an empty selection made
``pa.array([...])`` infer the **null** type and a downstream
``concat_tables`` raised ``ArrowInvalid`` — but only when Ray's block split
happened to produce a batch with no matching rows, so it flaked.

``install()`` monkeypatches ``ray.data.Dataset.map_batches`` so every
*function* UDF defined in this package is wrapped in :class:`EmptyBatchProbe`:
on the first real Arrow batch a task sees, the UDF is ALSO invoked on
``batch.slice(0, 0)`` and ``batch.slice(0, 1)`` (outputs discarded).  Any
UDF that cannot survive a 0-/1-row batch then fails loudly and
deterministically instead of flaking once per thousand drives.

The test suite installs this for its whole session (tests/conftest.py), so
every query driven by the parity suites is automatically property-checked.
Internal Ray wrappers (e.g. the one ``map_groups`` passes to
``map_batches``) are filtered out by module name — ``map_groups`` UDFs are
guaranteed non-empty groups by Ray, so probing them would inject a
constraint the engine does not rely on.
"""

from __future__ import annotations

import pyarrow as pa

_PROBED_MODULE_PREFIXES = ("fhir_data_validation_ray", "__ray_entry__")


class EmptyBatchProbe:
    """Wrap a map_batches UDF; probe it once per task on 0- and 1-row slices.

    The wrapper is pickled per task, so ``_probed`` resets per task — each
    task probes once on its first non-trivial batch (cost: one empty + one
    single-row kernel invocation per task, negligible).
    """

    def __init__(self, fn):
        self._fn = fn
        self._probed = False

    @property
    def __name__(self):  # keeps Ray's operator display names readable
        return getattr(self._fn, "__name__", "probed_udf")

    def __call__(self, batch, *args, **kwargs):
        if (not self._probed and isinstance(batch, pa.Table)
                and batch.num_rows > 1):
            self._probed = True
            for probe in (batch.slice(0, 0), batch.slice(0, 1)):
                try:
                    out = self._fn(probe, *args, **kwargs)
                    if hasattr(out, "__next__"):  # generator UDF: drain
                        list(out)
                except Exception as exc:  # re-raise with attribution
                    raise RuntimeError(
                        f"EmptyBatchProbe: UDF {self.__name__!r} "
                        f"({getattr(self._fn, '__module__', '?')}) failed on "
                        f"a {probe.num_rows}-row batch: {exc!r}"
                    ) from exc
        return self._fn(batch, *args, **kwargs)


def _should_wrap(fn) -> bool:
    if not callable(fn) or isinstance(fn, type):
        return False  # actor classes manage their own state; skip
    if isinstance(fn, EmptyBatchProbe):
        return False
    mod = getattr(fn, "__module__", "") or ""
    return any(mod == p or mod.startswith(p + ".")
               for p in _PROBED_MODULE_PREFIXES)


def install():
    """Patch Dataset.map_batches to probe package UDFs. Returns an undo fn."""
    import ray.data

    orig = ray.data.Dataset.map_batches

    def map_batches(self, fn, *args, **kwargs):
        if _should_wrap(fn):
            fn = EmptyBatchProbe(fn)
        return orig(self, fn, *args, **kwargs)

    ray.data.Dataset.map_batches = map_batches

    def undo():
        ray.data.Dataset.map_batches = orig

    return undo
