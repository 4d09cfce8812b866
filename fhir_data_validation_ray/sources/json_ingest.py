"""JSONL ingest lane with stage-0 INVALID_JSON quarantine.

The reference ingests JSON bundles and fails fast on unparseable payloads
(``Core/ValidationPipeline.cs:610-656`` — INVALID_JSON before any rule
runs). The Arrow-native corpus can't hold malformed JSON, so round 2
declared the check N/A — this lane closes the gap where it actually
bites: at INGEST, where raw JSONL enters the engine.

Parse strategy per text block:

- FAST path: ``pyarrow.json.read_json`` over the whole block with the
  explicit documents schema — one vectorized C++ parse, no Python loop.
- QUARANTINE path: only when the block-level parse fails does the block
  fall back to per-line ``json.loads`` to isolate the bad lines (a
  Python loop over ONE corrupted block, not the corpus — the documented
  ingest-boundary exception to the no-row-loop rule).

Output schema: ``doc_id, spans`` (the corpus schema) plus an ``error``
column — NULL for parsed rows, ``INVALID_JSON`` for quarantined lines.
Callers filter/route; the bad rows carry the raw line for forensics.
"""

from __future__ import annotations

import io
import json
import os

import numpy as np
import pyarrow as pa

INVALID_JSON = "INVALID_JSON"


def _docs_schema():
    from .generator import SPAN_TYPE

    return pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])


def _parse_lines_slow(lines: list[str]) -> pa.Table:
    """Per-line quarantine parse of one corrupted block."""
    from .generator import SPAN_TYPE

    ids: list[str | None] = []
    spans: list[list | None] = []
    errs: list[str | None] = []
    raws: list[str | None] = []
    for line in lines:
        try:
            obj = json.loads(line)
            if not isinstance(obj, dict) or not isinstance(
                obj.get("doc_id"), (str, int)
            ):
                raise ValueError("not a document object")
            # build BOTH values before appending either, so a mid-parse
            # failure can't leave the column lists misaligned
            doc_id = str(obj["doc_id"])
            doc_spans = [
                {"kind": s.get("kind"), "text": s.get("text"),
                 "media_ref": s.get("media_ref"),
                 "offset": s.get("offset")}
                for s in (obj.get("spans") or [])
            ]
            ids.append(doc_id)
            spans.append(doc_spans)
            errs.append(None)
            raws.append(None)
        except (ValueError, TypeError, AttributeError):
            # AttributeError: a spans entry that isn't an object — same
            # quarantine as unparseable JSON (the line, not the task, dies)
            ids.append(None)
            spans.append(None)
            errs.append(INVALID_JSON)
            raws.append(line)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN_TYPE)),
            "error": pa.array(errs, pa.string()),
            "raw": pa.array(raws, pa.string()),
        }
    )


def read_documents_jsonl(path: str, *, override_num_blocks=None):
    """JSONL -> Dataset[doc_id, spans, error, raw]: the corpus schema with a
    stage-0 quarantine column (NULL = parsed; ``INVALID_JSON`` = the line
    failed to parse, ``raw`` holds it). Blocks that parse clean never touch
    Python objects."""
    import pyarrow.json as pj
    import ray.data as rd

    schema = _docs_schema()

    def parse(t: pa.Table) -> pa.Table:
        lines_arr = t["text"]
        if isinstance(lines_arr, pa.ChunkedArray):
            lines_arr = lines_arr.combine_chunks()
        payload = "\n".join(lines_arr.to_pylist())
        try:
            parsed = pj.read_json(
                io.BytesIO(payload.encode("utf-8")),
                parse_options=pj.ParseOptions(explicit_schema=schema),
            )
            if parsed["doc_id"].null_count == 0:
                n = parsed.num_rows
                return parsed.append_column(
                    "error", pa.nulls(n, pa.string())
                ).append_column("raw", pa.nulls(n, pa.string()))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass
        return _parse_lines_slow(lines_arr.to_pylist())

    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    return rd.read_text(path, **kwargs).map_batches(parse, batch_format="pyarrow")


CORRUPT_MOD = 13  # fixture: every doc with FNV(doc_id) % 13 == 0 is truncated


def jsonl_fixture(sf_dir: str) -> str:
    """Write (once, cached, atomic) a JSONL twin of the docs fixture with a
    deterministic subset of lines truncated into invalid JSON — the ingest
    lane's test input. The corruption rule (FNV(doc_id) % CORRUPT_MOD == 0)
    is reproducible in SQL, so the oracle knows exactly which lines die."""
    import pyarrow.parquet as pq

    from ..functions.hashing import hash_str
    from ..pipelines.validate import fixture_paths

    paths = fixture_paths(sf_dir)
    out = os.path.join(os.path.dirname(paths["docs"]), "docs.jsonl")
    if os.path.exists(out):
        return out
    docs = pq.read_table(paths["docs"])
    ids = docs["doc_id"].to_numpy(zero_copy_only=False).astype("U")
    bad = (hash_str(ids) % np.uint64(CORRUPT_MOD)) == 0
    spans = docs["spans"].to_pylist()
    tmp = out + f".tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        for i, doc_id in enumerate(ids):
            line = json.dumps({"doc_id": str(doc_id), "spans": spans[i]},
                              separators=(",", ":"))
            f.write((line[:-5] if bad[i] else line) + "\n")
    try:
        os.rename(tmp, out)
    except OSError:
        os.unlink(tmp)
    return out
