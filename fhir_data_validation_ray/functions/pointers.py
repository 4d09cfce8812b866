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
- ``resolve_fieldpath`` / ``normalize_fieldpath``: FHIRPath-style path ->
  concrete RFC-6901 pointers against one document, including ``where(...)``
  predicates and ``[index]`` steps — the span-model analogue of
  ``Navigation/SmartPathNavigationService.cs:52-120`` +
  ``Navigation/Predicates/PredicateParser.cs``. Driver-side round-trip
  utility (rule fieldPaths <-> span pointers), NOT a hot path.
"""

from __future__ import annotations

import re
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


# ------------------------------------------------- FHIRPath-style navigation
_SEG_RE = re.compile(r"^(?P<name>[A-Za-z_][A-Za-z0-9_]*)(\[(?P<idx>\d+)\])?$")
_WHERE_RE = re.compile(r"^where\((?P<body>.*)\)(\[(?P<idx>\d+)\])?$", re.DOTALL)
_COND_RE = re.compile(r"^\s*(?P<fld>[A-Za-z_][A-Za-z0-9_]*)\s*=\s*(?P<val>.+?)\s*$")


def _split_fieldpath(path: str) -> list[str]:
    """Split on '.' outside quotes and parentheses, so
    ``spans.where(text='a.b').text`` yields 3 segments."""
    parts: list[str] = []
    buf = ""
    depth = 0
    quote: str | None = None
    for c in path:
        if quote:
            buf += c
            if c == quote:
                quote = None
        elif c in ("'", '"'):
            quote = c
            buf += c
        elif c == "(":
            depth += 1
            buf += c
        elif c == ")":
            depth -= 1
            buf += c
        elif c == "." and depth == 0:
            parts.append(buf)
            buf = ""
        else:
            buf += c
    parts.append(buf)
    if quote or depth != 0:
        raise ValueError(f"unbalanced quotes/parens in path: {path!r}")
    return [p for p in parts if p]


def _parse_where(body: str) -> list[tuple[str, Any]]:
    """'kind='Patient' and offset=3' -> [(fld, typed value), ...]. Values:
    quoted -> string, bare digits -> int (the offset field), bare -> string
    (the reference's predicate parser accepts both quoting styles)."""
    conds = []
    for part in re.split(r"\s+and\s+|,", body):
        if not part.strip():
            continue
        m = _COND_RE.match(part)
        if not m:
            raise ValueError(f"unparseable where() condition: {part!r}")
        raw = m.group("val")
        if len(raw) >= 2 and raw[0] == raw[-1] and raw[0] in ("'", '"'):
            val: Any = raw[1:-1]
        elif re.fullmatch(r"-?\d+", raw):
            val = int(raw)
        else:
            val = raw
        conds.append((m.group("fld"), val))
    return conds


def _matches(el: Any, conds: list[tuple[str, Any]]) -> bool:
    if not isinstance(el, dict):
        return False
    for fld, val in conds:
        got = el.get(fld)
        if got is None or got != val and str(got) != str(val):
            return False
    return True


def resolve_fieldpath(doc: Any, path: str) -> list[str]:
    """Normalize a FHIRPath-style span path into the concrete RFC-6901
    pointers it selects in ``doc`` (a dict row: ``{"doc_id":..., "spans":
    [...]}``). Supported grammar — the span-model subset of the reference's
    SmartPathNavigationService + PredicateParser:

    - ``doc_id``                                    -> ``/doc_id``
    - ``spans.text``                                -> every span's text
    - ``spans[3].text``                             -> index step
    - ``spans.where(kind='Patient').text``          -> predicate filter
      (``field=value`` conditions, ``and``/comma-chained; quoted or bare)
    - ``spans.where(kind='Patient')[0].text``       -> first match

    FHIRPath collection semantics: a name step over a list maps over its
    elements; predicates filter; out-of-range indices select nothing.
    Returns normalized pointers ([] when nothing matches); raises
    ValueError on a syntactically invalid path."""
    state: list[tuple[str, Any]] = [("", doc)]
    for seg in _split_fieldpath(path):
        w = _WHERE_RE.match(seg)
        if w:
            conds = _parse_where(w.group("body"))
            new: list[tuple[str, Any]] = []
            for ptr, node in state:
                if isinstance(node, (list, tuple)):
                    hits = [
                        (f"{ptr}/{i}", el) for i, el in enumerate(node)
                        if _matches(el, conds)
                    ]
                    if w.group("idx") is not None:
                        k = int(w.group("idx"))
                        hits = hits[k:k + 1]
                    new.extend(hits)
            state = new
            continue
        m = _SEG_RE.match(seg)
        if not m:
            raise ValueError(f"unparseable path segment: {seg!r}")
        name = m.group("name")
        new = []
        for ptr, node in state:
            if isinstance(node, dict):
                if name in node:
                    new.append((f"{ptr}/{escape_token(name)}", node[name]))
            elif isinstance(node, (list, tuple)):
                for i, el in enumerate(node):
                    if isinstance(el, dict) and name in el:
                        new.append((f"{ptr}/{i}/{escape_token(name)}", el[name]))
        if m.group("idx") is not None:
            k = int(m.group("idx"))
            new = [
                (f"{ptr}/{k}", node[k])
                for ptr, node in new
                if isinstance(node, (list, tuple)) and k < len(node)
            ]
        state = new
        if not state:
            return []
    return [ptr for ptr, _ in state]


def normalize_fieldpath(doc: Any, path: str) -> str | None:
    """First pointer ``path`` selects in ``doc`` (the reference returns the
    primary navigation result), or None when nothing matches."""
    ptrs = resolve_fieldpath(doc, path)
    return ptrs[0] if ptrs else None


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
