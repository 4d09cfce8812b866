"""End-to-end training-shard export: curate -> shuffle layout -> partitioned
parquet shards.

The "last mile" of the corpus pipeline: take raw documents, apply the
flagship curation keep-list (exact dedup + near-dup cluster drop + quality
gate + deterministic sample — every step oracle-checked, see
``pipelines/curation.py``), lay the survivors out in the deterministic
global-shuffle order (``stages/packing.py:shuffle_assign``), and write one
parquet directory per shard (``shard=N/``) so a failed export can re-run
individual shards and a trainer can stream shards independently.

Everything is distributed and deterministic:
- the keep-list never materializes on the driver — it meets the text in a
  salted partitioned hash join (``stages/joins.py``);
- the shuffle layout is a pure function of doc_id (FNV hash), so re-runs
  and different read parallelisms produce byte-identical shard contents;
- ``write_parquet(partition_cols=["shard"])`` streams each shard group out
  through Ray's sink — nothing corpus-sized in any single place.
"""

from __future__ import annotations

import pyarrow as pa


def export_training_shards(docs, out_dir: str, *, n_shards: int = 64,
                           sample_rate: float = 1.0,
                           jaccard_threshold: float = 0.8,
                           split_bands=None, fmt: str = "parquet") -> dict:
    """Dataset[doc_id:int64, text] -> curated, shuffled, sharded parquet under
    ``out_dir`` (one ``shard=N`` directory per shard; rows carry
    ``doc_id, pos, text`` with ``pos`` the in-shard reading order).
    Returns a small manifest dict (counts only — nothing corpus-sized).

    ``split_bands`` (e.g. ``sampling.SPLIT_BANDS``) additionally labels every
    surviving doc with its leak-free train/val/test hash band and partitions
    the output ``split=NAME/shard=N`` — the trainer streams
    ``split=train/*`` while eval readers take the held-out dirs, and a doc
    can never migrate between splits across re-runs or corpus growth."""
    from ..stages.joins import partitioned_hash_join
    from ..stages.packing import shuffle_assign
    from .curation import curate_keep_list

    keep = curate_keep_list(docs, sample_rate=sample_rate,
                            jaccard_threshold=jaccard_threshold)
    kept_docs = partitioned_hash_join(
        docs, keep, left_key="doc_id", right_key="doc_id",
        left_columns=["doc_id", "text"], right_columns=[],
        left_types={"doc_id": pa.int64(), "text": pa.string()},
        right_types={},
    )
    layout = shuffle_assign(kept_docs, n_shards=n_shards, carry=("text",))
    partition_cols = ["shard"]
    if split_bands is not None:
        from ..stages.sampling import split_assign

        layout = split_assign(layout, bands=split_bands)
        partition_cols = ["split", "shard"]
    if fmt == "jsonl":
        res = write_jsonl_shards(layout, out_dir, n_shards=n_shards,
                                 has_split=split_bands is not None)
        return {"out": out_dir, "n_docs": res["rows"], "n_shards": n_shards,
                "n_files": res["files"], "fmt": "jsonl",
                "split": bool(split_bands)}
    if fmt != "parquet":
        raise ValueError(f"unknown export fmt {fmt!r}")
    layout.write_parquet(out_dir, partition_cols=partition_cols)

    import pyarrow.dataset as pads

    n = pads.dataset(out_dir, partitioning="hive").count_rows()
    return {"out": out_dir, "n_docs": int(n), "n_shards": n_shards,
            "split": bool(split_bands)}


JSONL_ROWS_PER_FILE = 100_000


def write_jsonl_shards(layout, out_dir: str, *, n_shards: int,
                       rows_per_file: int = JSONL_ROWS_PER_FILE,
                       has_split: bool | None = None) -> dict:
    """Deterministic distributed JSONL sink — the trainer-facing lingua
    franca next to the parquet lane (Ray's ``write_json`` has no
    ``partition_cols``). ``layout`` rows carry (doc_id, shard, pos, text
    [, split]); each (split, shard, pos // rows_per_file) chunk becomes ONE
    group in a bucketed groupby whose task writes a single pos-sorted file
    ``[split=S/]shard=N/part-<chunk>.jsonl`` — file names AND contents are
    pure functions of the row set, so re-runs are byte-identical at any
    read parallelism, every group is bounded by ``rows_per_file``, and a
    failed export re-runs per chunk. Returns the number of files written."""
    import json
    import os

    import numpy as np
    import pyarrow as pa

    if has_split is None:
        # .schema() on a LAZY sort-bearing pipeline runs the whole plan
        # once just to learn the columns (limit-1 still needs the sort) —
        # callers that know the layout shape pass has_split explicitly
        has_split = "split" in layout.schema().names
    CHUNK_UB = 1 << 32

    def add_key(t: pa.Table) -> pa.Table:
        shard = np.asarray(t["shard"]).astype(np.int64)
        pos = np.asarray(t["pos"]).astype(np.int64)
        if has_split:
            scol = t["split"]
            if isinstance(scol, pa.ChunkedArray):
                scol = scol.combine_chunks()
            sidx = np.array(
                [0 if s == "train" else (1 if s == "val" else 2)
                 for s in scol.to_pylist()], dtype=np.int64)
        else:
            sidx = np.zeros(len(shard), dtype=np.int64)
        key = (sidx * n_shards + shard) * CHUNK_UB + pos // rows_per_file
        return t.append_column("file_key", pa.array(key))

    def write_group(g: pa.Table) -> pa.Table:
        pos = np.asarray(g["pos"]).astype(np.int64)
        order = np.argsort(pos, kind="stable")  # pos unique within a shard
        texts = g["text"].to_pylist()
        shard = int(g["shard"][0].as_py())
        chunk = int(g["file_key"][0].as_py()) % CHUNK_UB
        sub = f"split={g['split'][0].as_py()}/" if has_split else ""
        d = os.path.join(out_dir, f"{sub}shard={shard}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part-{chunk:06d}.jsonl")
        tmp = path + ".tmp"
        all_ids = np.asarray(g["doc_id"]).astype(np.int64)
        with open(tmp, "w") as f:
            for i in order:
                f.write(json.dumps({"doc_id": int(all_ids[i]),
                                    "pos": int(pos[i]),
                                    "text": texts[i]},
                                   ensure_ascii=False) + "\n")
        os.replace(tmp, path)  # atomic per chunk: resumable re-runs
        return pa.table({"file": pa.array([path]),
                         "rows": pa.array([g.num_rows], pa.int64())})

    manifest = (layout.map_batches(add_key, batch_format="pyarrow")
                .groupby("file_key")
                .map_groups(write_group, batch_format="pyarrow")
                .materialize())
    n_files = int(manifest.count())
    return {"files": n_files,
            "rows": int(manifest.sum("rows")) if n_files else 0}
