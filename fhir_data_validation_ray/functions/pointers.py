"""RFC-6901 JSON-pointer resolution for the span document model.

The reference resolves and normalizes error pointers against the bundle JSON
(``Navigation/JsonPointerResolver.cs:1-521``,
``Navigation/SmartPathNavigationService.cs:52-120``); this module is the
span-model analogue so a consumer can round-trip the engine's violation
pointers (``/spans/{i}/{field}``) back to values:

- ``parse_pointer``: RFC-6901 tokenization with ``~0``/``~1`` unescaping.
- ``resolve_pointer``: resolve any pointer against one document row (a dict
  with ``doc_id`` + ``spans`` list) — general RFC-6901, not span-specific.
- ``normalize_pointer``: canonical re-encoding (escapes re-applied).
- ``parse_span_pointers``: VECTORIZED split of a violation table's pointer
  column into (span_index, field) via one RE2 extract — the hot-path lane
  for joining violations back to flattened spans.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SPAN_PTR_RE = r"^/spans/(?P<idx>[0-9]+)/(?P<field>[A-Za-z_]+)$"


def parse_pointer(pointer: str) -> list[str]:
    """RFC-6901 tokens. '' -> []; leading '/' required otherwise."""
    if pointer == "":
        return []
    if not pointer.startswith("/"):
        raise ValueError(f"not a JSON pointer: {pointer!r}")
    # unescape order matters: ~1 -> / first, then ~0 -> ~ (RFC 6901 §4)
    return [t.replace("~1", "/").replace("~0", "~") for t in pointer[1:].split("/")]


def escape_token(token: str) -> str:
    return token.replace("~", "~0").replace("/", "~1")


def normalize_pointer(pointer: str) -> str:
    """Canonical re-encoding (resolves double-escapes a producer may emit)."""
    return "".join("/" + escape_token(t) for t in parse_pointer(pointer))


def resolve_pointer(doc: Any, pointer: str, default: Any = None) -> Any:
    """Resolve ``pointer`` against a nested dict/list document. Returns
    ``default`` when any token fails to resolve (the reference returns a
    null navigation result rather than raising)."""
    node = doc
    for tok in parse_pointer(pointer):
        if isinstance(node, dict):
            if tok not in node:
                return default
            node = node[tok]
        elif isinstance(node, (list, tuple)):
            if not tok.isdigit() or int(tok) >= len(node):
                return default
            node = node[int(tok)]
        else:
            return default
    return node


def parse_span_pointers(pointers: pa.Array | pa.ChunkedArray):
    """Vectorized ``/spans/{i}/{field}`` split: returns
    ``(span_index int64 ndarray, field pa.Array, valid bool ndarray)`` —
    span_index is -1 where the pointer is not span-shaped (document-level
    rows carry an empty pointer)."""
    if isinstance(pointers, pa.ChunkedArray):
        pointers = pointers.combine_chunks()
    g = pc.extract_regex(pointers, _SPAN_PTR_RE)
    valid = pc.is_valid(g).to_numpy(zero_copy_only=False)
    idx = np.asarray(
        pc.cast(pc.struct_field(g, "idx"), pa.int64()).fill_null(-1)
    ).astype(np.int64)
    field = pc.struct_field(g, "field")
    return idx, field, valid
