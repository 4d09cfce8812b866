"""Deterministic sequence packing — concat-and-chunk documents into
fixed-token-budget training sequences.

The standard GPT-style pretraining layout: documents are concatenated in a
deterministic order and the token stream is chunked every ``budget`` tokens;
each document is assigned the sequence its first token lands in. Packing
needs a total order, which at corpus scale must NOT be a global sort: we
shard by ``doc_id // shard_docs`` (bounded, skew-free key ranges) and pack
each shard independently — embarrassingly parallel, resumable per shard,
and exactly reproducible (the oracle is a SQL window cumsum per shard).

Output columns (all exact integers):
``doc_id``, ``shard``, ``n_tokens`` (non-empty whitespace words),
``tok_offset`` (tokens preceding this doc within its shard),
``seq_in_shard`` (= tok_offset // budget — the training sequence the doc
starts in).

No analogue in the reference repo (corpus-curation extension, SURVEY §8.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PACK_BUDGET = 512
PACK_SHARD_DOCS = 100


def pack_sequences(docs, *, budget: int = PACK_BUDGET,
                   shard_docs: int = PACK_SHARD_DOCS,
                   batch_size: int | None = None):
    """(doc_id:int, text) -> packed layout. One bucketed exchange: the
    token-count partial is computed streaming per batch (text never
    shuffles — only (doc_id, shard, n_tokens) rows move), then each shard
    group sorts its ≤``shard_docs`` rows and takes a cumulative sum."""

    def counts(t: pa.Table) -> pa.Table:
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parts = pc.split_pattern(texts, " ")
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").fill_null(False).to_numpy(zero_copy_only=False)
        n_tokens = np.bincount(parent[keep], minlength=len(texts)).astype(np.int64)
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "shard": pa.array(ids // shard_docs),
                "n_tokens": pa.array(n_tokens),
            }
        )

    def pack_shard(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"], dtype=np.int64)
        ntok = np.asarray(g["n_tokens"], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids, ntok = ids[order], ntok[order]
        offset = np.zeros(len(ids), dtype=np.int64)
        np.cumsum(ntok[:-1], out=offset[1:])
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "shard": pa.array(np.asarray(g["shard"], dtype=np.int64)[order]),
                "n_tokens": pa.array(ntok),
                "tok_offset": pa.array(offset),
                "seq_in_shard": pa.array(offset // budget),
            }
        )

    return (
        docs.map_batches(counts, batch_format="pyarrow", batch_size=batch_size)
        .groupby("shard")
        .map_groups(pack_shard, batch_format="pyarrow")
    )
