"""Flattened span view over a documents batch.

The per-batch analogue of the reference's bundle-entry walk
(``Core/ValidationPipeline.cs:201-238``): instead of visiting one JSON entry
at a time, we flatten the ``spans`` list column of the whole Arrow batch once
and evaluate every rule as a vectorized mask over the flat child arrays.

All positional bookkeeping (parent row index, within-document span index) is
computed once per batch and shared by every kernel.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class FlatSpans:
    """Zero-copy-ish flat view of ``batch[doc_id, spans]``."""

    doc_ids: pa.Array          # per-document (len = n_docs)
    lengths: np.ndarray        # spans per document (len = n_docs, int64)
    parent: np.ndarray         # flat -> document row index (len = n_spans)
    span_index: np.ndarray     # position within the document (len = n_spans)
    kind: pa.Array             # flat child arrays (len = n_spans)
    text: pa.Array
    media_ref: pa.Array
    offset: pa.Array

    @property
    def n_docs(self) -> int:
        return len(self.doc_ids)

    @property
    def n_spans(self) -> int:
        return len(self.kind)

    @cached_property
    def kind_np(self) -> np.ndarray:
        return np.asarray(self.kind)

    @cached_property
    def offset_np(self) -> np.ndarray:
        """Offsets as int64 with nulls -> -1 (a null offset can never equal a
        parsed local-ref target, and sorts before all real offsets)."""
        import pyarrow.compute as pc

        return np.asarray(
            pc.fill_null(self.offset, -1), dtype=np.int64
        )

    @cached_property
    def doc_ids_np(self) -> np.ndarray:
        return np.asarray(self.doc_ids)

    @cached_property
    def flat_doc_ids(self) -> np.ndarray:
        """doc_id repeated per span."""
        return self.doc_ids_np[self.parent]

    def doc_id_at(self, doc_idx: np.ndarray) -> np.ndarray:
        return self.doc_ids_np[doc_idx]

    # -- memoized per-batch masks shared across rules ----------------------
    def kind_mask(self, kind: str) -> np.ndarray:
        cache = self.__dict__.setdefault("_kind_masks", {})
        m = cache.get(kind)
        if m is None:
            m = pc.equal(self.kind, kind).fill_null(False).to_numpy(zero_copy_only=False)
            cache[kind] = m
        return m

    def empty_mask(self, fld: str) -> np.ndarray:
        """True where the field is null or all-whitespace — the reference's
        'missing or whitespace' emptiness (``FhirPathRuleEngine.cs:995-999``).
        Computed once per batch per field, shared by every rule."""
        cache = self.__dict__.setdefault("_empty_masks", {})
        m = cache.get(fld)
        if m is None:
            arr = {"kind": self.kind, "text": self.text, "media_ref": self.media_ref}[fld]
            trimmed = pc.utf8_trim_whitespace(arr.cast(pa.string()))
            m = (
                pc.or_kleene(pc.is_null(arr), pc.equal(pc.binary_length(trimmed), 0))
                .fill_null(True)
                .to_numpy(zero_copy_only=False)
            )
            cache[fld] = m
        return m


def flatten_batch(batch: pa.Table) -> FlatSpans:
    batch = batch.combine_chunks()
    doc_ids = batch.column("doc_id")
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()

    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(spans)  # StructArray honoring offsets/slices

    starts = np.zeros(len(lengths), dtype=np.int64)
    if len(lengths) > 1:
        np.cumsum(lengths[:-1], out=starts[1:])
    n_spans = int(lengths.sum())
    span_index = np.arange(n_spans, dtype=np.int64) - np.repeat(starts, lengths)

    return FlatSpans(
        doc_ids=doc_ids,
        lengths=lengths,
        parent=parent,
        span_index=span_index,
        kind=flat.field("kind"),
        text=flat.field("text"),
        media_ref=flat.field("media_ref"),
        offset=flat.field("offset"),
    )


def first_per_doc_mask(mask: np.ndarray, parent: np.ndarray) -> np.ndarray:
    """Restrict a flat boolean mask to the FIRST matching span per document —
    the ``FirstInstance`` scope (``Models/InstanceScope.cs:41``;
    ``Services/ResourceSelector.cs:36-64``). Spans are in document order, so
    "first" = lowest flat index per parent."""
    out = np.zeros_like(mask)
    idx = np.flatnonzero(mask)
    if idx.size:
        _, first_pos = np.unique(parent[idx], return_index=True)
        out[idx[first_pos]] = True
    return out
