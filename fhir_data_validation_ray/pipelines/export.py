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
                           split_bands=None) -> dict:
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
    layout.write_parquet(out_dir, partition_cols=partition_cols)

    import pyarrow.dataset as pads

    n = pads.dataset(out_dir, partitioning="hive").count_rows()
    return {"out": out_dir, "n_docs": int(n), "n_shards": n_shards,
            "split": bool(split_bands)}
