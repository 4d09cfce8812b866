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


SHUFFLE_SHARDS = 64


def shuffle_assign(docs, *, n_shards: int = SHUFFLE_SHARDS,
                   carry: tuple[str, ...] = (),
                   batch_size: int | None = None):
    """Deterministic global-shuffle layout for training-shard writes: every
    doc gets ``(shard, pos)`` — shard = FNV(str(doc_id)) % n_shards, pos =
    the doc's rank within its shard ordered by (hash, doc_id). Together they
    define a reproducible pseudorandom total order WITHOUT a random_shuffle
    all-to-all: a sink can write each shard independently (resumable, one
    file per shard) and a reader streaming shards 0..n-1 in pos order sees
    the corpus in hash order — uncorrelated with ingest order.

    One bounded exchange: the hash tags stream per batch (text never needs
    to move — join the layout back by doc_id, or pass payload columns
    through ``docs``); each shard group sorts its own rows only. Size
    ``n_shards`` so a shard's (doc_id, hash) pairs fit one task's heap —
    ~corpus_docs/1e6 at trillion-doc scale.

    ``carry`` names payload columns (e.g. ``("text",)``) to ship through the
    exchange and emit alongside the layout — the export sink uses this so
    each shard file is written in final reading order in one pass.
    """
    from ..functions.hashing import hash_str

    def tag(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        h = hash_str(ids.astype("U"))
        cols = {
            "doc_id": pa.array(ids),
            "shard": pa.array((h % np.uint64(n_shards)).astype(np.int64)),
            "h": pa.array(h),
        }
        for c in carry:
            col = t[c]
            cols[c] = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return pa.table(cols)

    def rank(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        h = np.asarray(g["h"]).astype(np.uint64)
        order = np.lexsort((ids, h))
        cols = {
            "doc_id": pa.array(ids[order]),
            "shard": pa.array(np.asarray(g["shard"]).astype(np.int64)[order]),
            "pos": pa.array(np.arange(len(ids), dtype=np.int64)),
        }
        take = pa.array(order)
        for c in carry:
            col = g[c]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            cols[c] = col.take(take)
        return pa.table(cols)

    return (
        docs.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
        .groupby("shard")
        .map_groups(rank, batch_format="pyarrow")
    )
