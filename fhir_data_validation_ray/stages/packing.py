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


# Interleaved-payload packing: media spans cost a FIXED token budget (the
# patch/codec token count a multimodal model consumes), text spans cost
# their whitespace word count.
MEDIA_TOKEN_COSTS = {"image": 64, "audio": 128}
PACK_INTERLEAVED_SHARDS = 64


def pack_interleaved(docs, *, budget: int = PACK_BUDGET,
                     n_shards: int | None = None,
                     media_costs: dict[str, int] | None = None,
                     batch_size: int | None = None):
    """Multimodal sequence packing over the interleaved ``(doc_id, spans)``
    table: each document's token cost is the sum over its spans — word
    count for text-bearing kinds, a fixed per-kind budget for media kinds
    (image/audio) — and documents pack into ``budget``-token training
    sequences per shard. The interleaved analogue of ``pack_sequences``.

    Sharding is by FNV(doc_id) % n_shards (doc ids are strings here;
    DuckDB mirrors the hash exactly), order within a shard is doc_id byte
    order, and duplicate doc_ids (the dup fixture) aggregate into one
    packed row, keeping the layout deterministic. Text never shuffles —
    only (doc_id, shard, n_tokens) rows move; docs with zero spans are
    not packed. Returns Dataset[doc_id, shard, n_tokens, tok_offset,
    seq_in_shard], all exact integers.

    ``n_shards`` bounds the per-group row count at corpus/n_shards — a
    FIXED shard count is a corpus-sized group at 10^12 docs, so the
    default (None) auto-sizes it from ``docs.count()`` to
    ~``PACK_SHARD_DOCS``-doc groups. The count is metadata-cheap ONLY
    for an untransformed read; if ``docs`` has upstream transforms the
    count executes that plan once before the packing pass re-runs it —
    pass n_shards explicitly (e.g. from a known corpus size) in that
    case, and whenever the layout must be reproducible across corpus
    sizes (the oracle query pins {PACK_INTERLEAVED_SHARDS})."""
    from ..functions.hashing import hash_str

    mc = MEDIA_TOKEN_COSTS if media_costs is None else media_costs
    if n_shards is None:
        n_shards = max(1, docs.count() // PACK_SHARD_DOCS)

    def counts(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        n_spans = pc.list_value_length(spans).fill_null(0).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        kind = flat.field("kind")
        text = pc.fill_null(flat.field("text"), "")
        parts = pc.split_pattern(text, " ")
        wflat = pc.list_flatten(parts)
        wparent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        wkeep = pc.not_equal(wflat, "").to_numpy(zero_copy_only=False)
        words_per_span = np.bincount(
            wparent[wkeep], minlength=len(flat)).astype(np.int64)
        kd = pc.dictionary_encode(kind)
        dv = kd.dictionary.to_numpy(zero_copy_only=False).astype("U")
        dict_cost = np.array([mc.get(v, -1) for v in dv], dtype=np.int64)
        if len(flat):
            idx = kd.indices.to_numpy(zero_copy_only=False)
            if idx.dtype.kind == "f":
                # NULL kind -> null index (NaN here); -1 routes it to the
                # word-count lane, matching the oracle's CASE ... ELSE
                idx = np.where(idx != idx, -1.0, idx)
            ii = idx.astype(np.int64)
            mcost = np.where(ii >= 0, dict_cost[np.maximum(ii, 0)], -1)
        else:
            mcost = np.empty(0, np.int64)
        span_cost = np.where(mcost >= 0, mcost, words_per_span)
        per_doc = np.bincount(parent, weights=span_cost,
                              minlength=t.num_rows).astype(np.int64)
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keep_doc = n_spans > 0
        u = ids.to_numpy(zero_copy_only=False).astype("U")[keep_doc]
        return pa.table({
            "doc_id": pa.array(u, pa.string()),
            "shard": pa.array(
                (hash_str(u) % np.uint64(n_shards)).astype(np.int64)),
            "n_tokens": pa.array(per_doc[keep_doc]),
        })

    def pack_shard(g: pa.Table) -> pa.Table:
        ids = g["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        u = ids.to_numpy(zero_copy_only=False).astype("U")
        ntok = np.asarray(g["n_tokens"]).astype(np.int64)
        uids, inv = np.unique(u, return_inverse=True)  # sorted = byte order
        tot = np.bincount(inv, weights=ntok,
                          minlength=len(uids)).astype(np.int64)
        offset = np.zeros(len(uids), dtype=np.int64)
        np.cumsum(tot[:-1], out=offset[1:])
        shard = int(np.asarray(g["shard"])[0])
        return pa.table({
            "doc_id": pa.array(uids, pa.string()),
            "shard": pa.array(np.full(len(uids), shard, np.int64)),
            "n_tokens": pa.array(tot),
            "tok_offset": pa.array(offset),
            "seq_in_shard": pa.array(offset // budget),
        })

    return (
        docs.map_batches(counts, batch_format="pyarrow",
                         batch_size=batch_size)
        .groupby("shard")
        .map_groups(pack_shard, batch_format="pyarrow")
    )
