"""Similarity search over the ``embeddings`` table (``vec_id, embedding:
list<float>, label``).

- **cosine_topk**: exact brute-force top-k — the broadcast pattern: the query
  matrix is ``ray.put`` once, every batch does one float64 matmul against it
  and emits its local top-k per query; the candidate sets then fold through
  a per-task combine level (``_fold_topk``) before a tiny driver-side final
  merge, so the driver never holds O(n_batches) candidate rows. SQL oracle
  via ``list_dot_product`` on double-cast lists.
- **cosine_pairs**: exact near-duplicate pairs with cosine >= threshold —
  small-corpus lane (streamed batch x broadcast corpus matrix, ~10^6-vector
  ceiling).
- **cosine_pairs_lsh**: the scale lane for the same check — repeated
  hyperplane-LSH candidate buckets (repetition count computed from the
  threshold for a <=1e-6 per-pair miss bound) + a routed-shuffle exact
  float64 verify; nothing corpus-sized is ever broadcast or collected.
- **lsh_topk**: random-hyperplane LSH variant — the scale path: vectors
  bucket by sign-bit signature (one groupby), queries probe their bucket plus
  Hamming-1 neighbors; recall<1.0 by construction (rows-only check, recall
  reported against cosine_topk in tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.collect import collect_table


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64, copy=False)
    n = np.sqrt((m * m).sum(axis=1, keepdims=True))
    n[n == 0] = 1.0
    return m / n


def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t["vec_id"]).astype(np.int64)
    emb = t["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(len(ids), 1)
    return ids, flat.reshape(len(ids), dim)


def load_queries(path: str, query_ids: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side load of the query vectors (small side). The read is
    PREDICATE-PUSHED (``vec_id IN (...)``) so only row groups containing the
    query ids decode — the query side never scans the corpus table."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", [int(q) for q in query_ids])])
    ids, m = _batch_matrix(t)
    pos = {int(v): i for i, v in enumerate(ids)}
    sel = [pos[q] for q in query_ids]
    return np.asarray(query_ids, dtype=np.int64), _normalize(m[sel])


def _merge_topk_table(t: pa.Table, k: int) -> pa.Table:
    """(qid, vec_id, sim) candidate rows -> <= k rows per qid, (qid, vec_id)
    deduped, deterministic tie-break (sim DESC, vec_id ASC). Pure table->table
    so it serves BOTH as the per-task combine level of the two-level fold and
    as the driver's final merge."""
    q = np.asarray(t["qid"]).astype(np.int64)
    v = np.asarray(t["vec_id"]).astype(np.int64)
    s = np.asarray(t["sim"])
    key = q * np.int64(1 << 32) + v
    _, first = np.unique(key, return_index=True)  # dup (qid,vec) have equal sim
    q, v, s = q[first], v[first], s[first]
    order = np.lexsort((v, -s, q))
    q, v, s = q[order], v[order], s[order]
    new_q = np.ones(len(q), dtype=bool)
    new_q[1:] = q[1:] != q[:-1]
    starts = np.flatnonzero(new_q)
    rank = np.arange(len(q)) - np.repeat(starts, np.diff(np.append(starts, len(q)))) + 1
    keep = rank <= k
    return pa.table({"qid": pa.array(q[keep]), "vec_id": pa.array(v[keep]),
                     "sim": pa.array(s[keep])})


_CAND_SCHEMA = pa.schema(
    [("qid", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
)


def _fold_topk(cand, k: int, nq: int):
    """Two-level fold of a (qid, vec_id, sim) candidate Dataset into the
    global top-k (the ``stats.py:149-155`` pattern): a per-TASK combine over
    ~64 per-batch candidate sets runs distributed, so the driver's final
    merge sees O(n_batches / 64 * nq * k) rows instead of O(n_batches *
    nq * k) — at 10^7 blocks the difference between a ~10^8-row driver fold
    and a distributed one. Returns Dataset[qid, vec_id, rank]."""
    import ray.data as rd

    combined = cand.map_batches(
        lambda t: _merge_topk_table(t, k),
        batch_format="pyarrow",
        batch_size=max(4096, 64 * max(nq, 1) * k),
    )
    tbl = collect_table(combined, empty_schema=_CAND_SCHEMA)
    if tbl.num_rows == 0 or tbl.num_columns == 0:
        return rd.from_arrow(pa.table({"qid": pa.array([], pa.int64()),
                                       "vec_id": pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.int64())}))
    return _rank_topk(tbl, k)


def cosine_topk(embeddings, query_ids: np.ndarray, query_matrix: np.ndarray,
                k: int = 5, *, batch_size: int | None = None):
    """Exact top-k by cosine per query. Returns Dataset[qid, vec_id, rank]
    (rank 1-based by sim DESC then vec_id ASC — deterministic ties)."""
    import ray

    q_ref = ray.put((query_ids, query_matrix))

    def local_topk(t: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        ids, m = _batch_matrix(t)
        if len(ids) == 0:  # empty block: dim unknowable, matmul would fail
            return _CAND_SCHEMA.empty_table()
        sims = _normalize(m) @ qm.T  # (n, nq) float64
        kk = min(k, len(ids))
        out_q, out_v, out_s = [], [], []
        for j in range(len(qids)):
            col = sims[:, j]
            idx = np.argpartition(-col, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
            out_q.append(np.full(len(idx), qids[j], dtype=np.int64))
            out_v.append(ids[idx])
            out_s.append(col[idx])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    cand = embeddings.map_batches(local_topk, batch_format="pyarrow",
                                  batch_size=batch_size)
    # two-level fold: per-task combine, then a tiny driver-side final merge
    return _fold_topk(cand, k, len(query_ids))


def embed_decontaminate(embeddings, benchmark, *, threshold: float = 0.9,
                        batch_size: int | None = None):
    """Semantic benchmark decontamination: flag every corpus vector whose
    cosine against ANY benchmark vector is >= ``threshold`` — the
    embedding-space complement of ``dedup.decontaminate``'s n-gram screen
    (paraphrased benchmark leakage that shares no shingles).

    ``benchmark`` (a Dataset of vec_id + embedding) is the SMALL side —
    the same stated assumption as decontaminate's exact lane: its unit
    matrix is broadcast ONCE via ``ray.put`` and the corpus STREAMS through
    a stateless per-batch matmul probe (no shuffle, no driver state in the
    corpus dimension). For benchmark sets past broadcast scale, run
    ``cosine_pairs_lsh`` over the role-tagged union instead.

    Returns Dataset[vec_id, n_matches] — only flagged vectors, with the
    exact count of benchmark vectors above threshold (integer output, so
    the DuckDB oracle compares bitwise)."""
    import ray

    bench_tbl = collect_table(
        benchmark.select_columns(["vec_id", "embedding"]),
        empty_schema=pa.schema(
            [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float64()))]
        ),
    )
    b_ids, b_m = _batch_matrix(bench_tbl)
    b_ref = ray.put(_normalize(b_m))

    def probe(t: pa.Table) -> pa.Table:
        bm = ray.get(b_ref) if isinstance(b_ref, ray.ObjectRef) else b_ref
        ids, m = _batch_matrix(t)
        if len(ids) == 0 or len(bm) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "n_matches": pa.array([], pa.int64())})
        sims = _normalize(m) @ bm.T
        n = (sims >= threshold).sum(axis=1).astype(np.int64)
        hit = n > 0
        return pa.table({"vec_id": pa.array(ids[hit]),
                         "n_matches": pa.array(n[hit])})

    return embeddings.map_batches(probe, batch_format="pyarrow",
                                  batch_size=batch_size)


def cosine_pairs(embeddings, threshold: float = 0.9, *,
                 batch_size: int | None = None):
    """Exact pairs (a < b) with cosine similarity >= threshold — the
    embedding-cosine near-duplicate check. Batch x broadcast-matrix matmul;
    the broadcast side is the full normalized corpus (fine to ~10^6 vectors;
    beyond that use lsh_topk buckets as the pre-filter)."""
    import ray
    import ray.data as rd

    # driver-side one-pass load of the (small) corpus matrix for broadcast
    full = collect_table(embeddings.select_columns(["vec_id", "embedding"]))
    all_ids, all_m = _batch_matrix(full)
    order = np.argsort(all_ids)
    all_ids, all_m = all_ids[order], _normalize(all_m[order])
    m_ref = ray.put((all_ids, all_m))

    def pairs(t: pa.Table) -> pa.Table:
        ids_all, m_all = ray.get(m_ref) if isinstance(m_ref, ray.ObjectRef) else m_ref
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        sims = _normalize(m) @ m_all.T
        ii, jj = np.nonzero(sims >= threshold)
        a, b = ids[ii], ids_all[jj]
        keep = a < b  # each unordered pair emitted once (by its lower id's batch)
        return pa.table(
            {"doc_a": pa.array(a[keep]), "doc_b": pa.array(b[keep])}
        )

    return embeddings.map_batches(pairs, batch_format="pyarrow",
                                  batch_size=batch_size)


def _emb_list(m: np.ndarray) -> pa.Array:
    """(n, d) float64 matrix -> Arrow list<float64> column."""
    d = m.shape[1] if m.ndim == 2 else 0
    offsets = np.arange(0, (len(m) + 1) * d, max(d, 1), dtype=np.int32)
    if d == 0:
        offsets = np.zeros(len(m) + 1, dtype=np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(m.reshape(-1), pa.float64()))


def _empty_lists(n: int) -> pa.Array:
    return pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, dtype=np.int32)), pa.array([], pa.float64())
    )


def _list_matrix(col: pa.Array) -> np.ndarray:
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, len(flat) // max(n, 1))


WIDE_CODE_MIN_VECTORS = 2_000_000  # auto planes_per_rep 4 -> 8 above this


def cosine_pairs_lsh(embeddings, threshold: float = 0.9, *,
                     planes_per_rep: int | None = None, target_miss: float = 1e-6,
                     max_reps: int = 128, verify_buckets: int = 64,
                     max_bucket_size: int | None = None,
                     batch_size: int | None = None, seed: int = 0xA11CE):
    """Near-exact cosine pairs via repeated random-hyperplane LSH candidate
    generation + DISTRIBUTED exact-cosine verification — the 10^9+-vector
    lane (the broadcast lane ships the whole corpus matrix; this one never
    materializes anything corpus-sized anywhere).

    Exactness argument (the MinHash-style bound): a pair at cosine exactly
    ``threshold`` agrees on one random hyperplane with probability
    p = 1 - acos(threshold)/pi, so it shares one repetition's full
    ``planes_per_rep``-bit code with probability p_rep = p^planes_per_rep.
    ``num_reps`` is chosen so the miss probability (1 - p_rep)^num_reps is
    <= ``target_miss``; pairs above threshold miss even less. Candidates are
    then verified with an exact float64 dot product, so false positives are
    impossible — the output equals the brute-force pair set with probability
    >= 1 - target_miss per pair.

    ``max_bucket_size`` caps quadratic pair generation in hot buckets (a
    cluster of near-identical vectors) — set it at web scale, leave None for
    oracle-exact runs. Verification is the same routed shuffle as
    ``dedup.minhash_lsh_pairs``: pair half-rows meet their vector in a
    vec-bucket groupby, both unit vectors meet in a pair-bucket groupby.

    ``planes_per_rep`` sizes the candidate groups: one bucket holds ~n/2^g
    vectors, so g=4 keeps recall-per-rep high for small corpora while g=8
    shrinks the largest exchange group 16x (at ~2.3x more repetitions for
    the same miss bound — still exact after verification). The default
    (``None``) auto-picks by corpus size the way the other lanes do,
    at ``WIDE_CODE_MIN_VECTORS``; lane equivalence is tested."""
    from .dedup import _intmix

    if planes_per_rep is None:
        planes_per_rep = 4 if embeddings.count() <= WIDE_CODE_MIN_VECTORS else 8

    theta = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    p_plane = 1.0 - theta / np.pi
    p_rep = max(p_plane ** planes_per_rep, 1e-12)
    num_reps = int(min(max_reps, max(8, np.ceil(
        np.log(target_miss) / np.log(max(1.0 - p_rep, 1e-12))
    ))))
    code_width = 1 << planes_per_rep

    def sig_rows(t: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table({"gkey": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64())})
        mn = _normalize(m)
        rng = np.random.RandomState(seed)  # same planes in every batch
        planes = rng.standard_normal((num_reps * planes_per_rep, mn.shape[1]))
        bits = (mn @ planes.T > 0).astype(np.int64)  # (n, R*g)
        bits = bits.reshape(len(ids), num_reps, planes_per_rep)
        codes = (bits << np.arange(planes_per_rep, dtype=np.int64)).sum(axis=2)
        gkey = (np.arange(num_reps, dtype=np.int64) * code_width + codes).reshape(-1)
        return pa.table(
            {
                "gkey": pa.array(gkey),
                "vec_id": pa.array(np.repeat(ids, num_reps)),
            }
        )

    def candidates(g: pa.Table) -> pa.Table:
        d = np.unique(np.asarray(g["vec_id"]).astype(np.int64))
        if len(d) < 2 or (max_bucket_size is not None and len(d) > max_bucket_size):
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(len(d), k=1)
        return pa.table({"doc_a": pa.array(d[ii]), "doc_b": pa.array(d[jj])})

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        return t.append_column(
            "pbucket", pa.array(_intmix(a * 31 + b, verify_buckets).astype(np.int32))
        )

    def dedup_pairs(g: pa.Table) -> pa.Table:
        a = np.asarray(g["doc_a"]).astype(np.int64)
        b = np.asarray(g["doc_b"]).astype(np.int64)
        key = np.unique(a * np.int64(1 << 32) + b)
        return pa.table({"doc_a": pa.array(key >> 32),
                         "doc_b": pa.array(key & ((1 << 32) - 1))})

    cand_unique = (
        embeddings.map_batches(sig_rows, batch_format="pyarrow", batch_size=batch_size)
        .groupby("gkey")
        .map_groups(candidates, batch_format="pyarrow")
        .map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )

    def vec_rows(t: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(t)
        return pa.table(
            {
                "dbucket": pa.array(_intmix(ids, verify_buckets).astype(np.int32)),
                "vec_id": pa.array(ids),
                "emb": _emb_list(_normalize(m)),
                "pkey": pa.array(np.full(len(ids), -1, dtype=np.int64)),
                "role": pa.array(np.full(len(ids), -1, dtype=np.int8)),
            }
        )

    def pair_halves(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"]).astype(np.int64)
        b = np.asarray(t["doc_b"]).astype(np.int64)
        pkey = a * np.int64(1 << 32) + b
        doc = np.concatenate([a, b])
        role = np.concatenate(
            [np.zeros(len(a), dtype=np.int8), np.ones(len(b), dtype=np.int8)]
        )
        return pa.table(
            {
                "dbucket": pa.array(_intmix(doc, verify_buckets).astype(np.int32)),
                "vec_id": pa.array(doc),
                "emb": _empty_lists(len(doc)),
                "pkey": pa.array(np.tile(pkey, 2)),
                "role": pa.array(role),
            }
        )

    routed_in = embeddings.map_batches(
        vec_rows, batch_format="pyarrow", batch_size=batch_size
    ).union(cand_unique.map_batches(pair_halves, batch_format="pyarrow"))

    def route(g: pa.Table) -> pa.Table:
        role = np.asarray(g["role"])
        is_vec = role < 0
        vid = np.asarray(g["vec_id"]).astype(np.int64)
        emb_col = g["emb"]
        if isinstance(emb_col, pa.ChunkedArray):
            emb_col = emb_col.combine_chunks()
        vids = vid[is_vec]
        empty = pa.table(
            {"vbucket": pa.array([], pa.int32()), "pkey": pa.array([], pa.int64()),
             "role": pa.array([], pa.int8()), "emb": _empty_lists(0)}
        )
        if len(vids) == 0:
            return empty
        order = np.argsort(vids)
        vec_m = _list_matrix(emb_col.take(pa.array(np.flatnonzero(is_vec)[order])))
        vids_s = vids[order]
        hv = np.flatnonzero(~is_vec)
        hv_vid = vid[hv]
        pos = np.clip(np.searchsorted(vids_s, hv_vid), 0, len(vids_s) - 1)
        hit = vids_s[pos] == hv_vid
        pos, hv = pos[hit], hv[hit]
        if len(hv) == 0:
            return empty
        pk = np.asarray(g["pkey"])[hv]
        return pa.table(
            {
                "vbucket": pa.array(_intmix(pk, verify_buckets).astype(np.int32)),
                "pkey": pa.array(pk),
                "role": pa.array(role[hv]),
                "emb": _emb_list(vec_m[pos]) if len(pos) else _empty_lists(0),
            }
        )

    def verify_group(g: pa.Table) -> pa.Table:
        pkey = np.asarray(g["pkey"]).astype(np.int64)
        role = np.asarray(g["role"])
        emb_col = g["emb"]
        if isinstance(emb_col, pa.ChunkedArray):
            emb_col = emb_col.combine_chunks()
        order = np.lexsort((role, pkey))
        pk_s = pkey[order]
        m = _list_matrix(emb_col.take(pa.array(order)))
        # both halves present -> adjacent rows with equal pkey (roles 0 then 1)
        both = np.zeros(len(pk_s), dtype=bool)
        both[:-1] = pk_s[:-1] == pk_s[1:]
        i0 = np.flatnonzero(both)
        sim = (m[i0] * m[i0 + 1]).sum(axis=1)
        keep = i0[sim >= threshold]
        return pa.table({"doc_a": pa.array(pk_s[keep] >> 32),
                         "doc_b": pa.array(pk_s[keep] & ((1 << 32) - 1))})

    return (
        routed_in.groupby("dbucket")
        .map_groups(route, batch_format="pyarrow")
        .groupby("vbucket")
        .map_groups(verify_group, batch_format="pyarrow")
    )


def ivf_topk(embeddings, query_ids: np.ndarray, query_matrix: np.ndarray,
             k: int = 5, *, n_clusters: int = 16, nprobe: int = 4,
             sample_size: int = 4096, kmeans_iters: int = 8,
             batch_size: int | None = None):
    """IVF (inverted-file) approximate top-k: deterministic k-means centroids
    trained on a driver-side sample, vectors assigned to their nearest
    centroid (one groupby co-locates each cluster), queries brute-force only
    their ``nprobe`` nearest clusters. The standard scale path for ANN —
    recall depends on nprobe/n_clusters, typically far above hyperplane LSH
    at equal probe cost."""
    import ray

    # train centroids on a deterministic sample (first sample_size rows)
    sample = collect_table(embeddings.select_columns(["vec_id", "embedding"]).limit(sample_size))
    _, sm = _batch_matrix(sample)
    sm = _normalize(sm)
    rng = np.random.RandomState(0xFACADE)
    cent = sm[rng.choice(len(sm), size=min(n_clusters, len(sm)), replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(sm @ cent.T, axis=1)  # cosine on normalized = dot
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sm[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    cent_ref = ray.put(cent)

    # query probe set: nprobe nearest centroids per query
    q_assign = np.argsort(-(query_matrix @ cent.T), axis=1)[:, :nprobe]
    probe: dict[int, list[int]] = {}
    for qi in range(len(query_ids)):
        for c in q_assign[qi]:
            probe.setdefault(int(c), []).append(qi)
    probe_ref = ray.put((probe, query_ids, query_matrix))

    def bucketize(t: pa.Table) -> pa.Table:
        cm = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "embedding": t["embedding"]})
        assign = np.argmax(_normalize(m) @ cm.T, axis=1)
        return pa.table(
            {
                "cluster": pa.array(assign.astype(np.int64)),
                "vec_id": pa.array(ids),
                "embedding": t["embedding"],
            }
        )

    def probe_cluster(g: pa.Table) -> pa.Table:
        pr, qids, qm = ray.get(probe_ref) if isinstance(probe_ref, ray.ObjectRef) else probe_ref
        cluster = int(g["cluster"][0].as_py())
        qlist = pr.get(cluster)
        if not qlist:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ids, m = _batch_matrix(g)
        sims = _normalize(m) @ qm[qlist].T
        kk = min(k, len(ids))
        out_q, out_v, out_s = [], [], []
        for col_j, qi in enumerate(qlist):
            col = sims[:, col_j]
            idx = np.argpartition(-col, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
            out_q.append(np.full(len(idx), qids[qi], dtype=np.int64))
            out_v.append(ids[idx])
            out_s.append(col[idx])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    cand = (
        embeddings.map_batches(bucketize, batch_format="pyarrow", batch_size=batch_size)
        .groupby("cluster")
        .map_groups(probe_cluster, batch_format="pyarrow")
    )
    return _fold_topk(cand, k, len(query_ids))


def _rank_topk(tbl: pa.Table, k: int):
    """(qid, vec_id, sim) candidates -> Dataset[qid, vec_id, rank<=k] with
    deterministic tie-break (sim DESC, vec_id ASC) and (qid, vec_id) dedup."""
    import ray.data as rd

    q = np.asarray(tbl["qid"]).astype(np.int64)
    v = np.asarray(tbl["vec_id"]).astype(np.int64)
    s = np.asarray(tbl["sim"])
    key = q * np.int64(1 << 32) + v
    _, first = np.unique(key, return_index=True)
    q, v, s = q[first], v[first], s[first]
    order = np.lexsort((v, -s, q))
    q, v, s = q[order], v[order], s[order]
    new_q = np.ones(len(q), dtype=bool)
    new_q[1:] = q[1:] != q[:-1]
    starts = np.flatnonzero(new_q)
    rank = np.arange(len(q)) - np.repeat(starts, np.diff(np.append(starts, len(q)))) + 1
    keep = rank <= k
    return rd.from_arrow(
        pa.table({"qid": pa.array(q[keep]), "vec_id": pa.array(v[keep]),
                  "rank": pa.array(rank[keep].astype(np.int64))})
    )


def lsh_topk(embeddings, query_ids: np.ndarray, query_matrix: np.ndarray,
             k: int = 5, *, num_planes: int = 12, batch_size: int | None = None):
    """Approximate top-k via random-hyperplane LSH: vectors keyed by sign-bit
    signature, queries probe their own bucket + all Hamming-1 neighbors.
    The scale path: one groupby co-locates each bucket; only probed buckets
    are brute-forced. Recall < 1.0 by design."""
    import ray

    rng = np.random.RandomState(0x5EED)
    dim = query_matrix.shape[1]
    planes = rng.standard_normal((num_planes, dim))
    # query probe set: own bucket + Hamming-1
    q_sig = (query_matrix @ planes.T > 0).astype(np.uint32)
    q_codes = (q_sig << np.arange(num_planes, dtype=np.uint32)).sum(axis=1)
    probe: dict[int, list[int]] = {}
    for qi, c in enumerate(q_codes):
        for cc in [int(c)] + [int(c) ^ (1 << b) for b in range(num_planes)]:
            probe.setdefault(cc, []).append(qi)
    probe_ref = ray.put((probe, query_ids, query_matrix))
    planes_ref = ray.put(planes)

    def bucketize(t: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref) if isinstance(planes_ref, ray.ObjectRef) else planes_ref
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table({"code": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "embedding": t["embedding"]})
        sig = (_normalize(m) @ pl.T > 0).astype(np.uint32)
        codes = (sig << np.arange(pl.shape[0], dtype=np.uint32)).sum(axis=1)
        return pa.table(
            {
                "code": pa.array(codes.astype(np.int64)),
                "vec_id": pa.array(ids),
                "embedding": t["embedding"],
            }
        )

    def probe_bucket(g: pa.Table) -> pa.Table:
        pr, qids, qm = ray.get(probe_ref) if isinstance(probe_ref, ray.ObjectRef) else probe_ref
        code = int(g["code"][0].as_py())
        qlist = pr.get(code)
        if not qlist:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ids, m = _batch_matrix(g)
        sims = _normalize(m) @ qm[qlist].T
        kk = min(k, len(ids))
        out_q, out_v, out_s = [], [], []
        for col_j, qi in enumerate(qlist):
            col = sims[:, col_j]
            idx = np.argpartition(-col, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
            out_q.append(np.full(len(idx), qids[qi], dtype=np.int64))
            out_v.append(ids[idx])
            out_s.append(col[idx])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    cand = (
        embeddings.map_batches(bucketize, batch_format="pyarrow", batch_size=batch_size)
        .groupby("code")
        .map_groups(probe_bucket, batch_format="pyarrow")
    )
    return _fold_topk(cand, k, len(query_ids))


def load_queries_with_labels(
        path: str, query_ids: list[int]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``load_queries`` plus each query vector's class label (predicate-
    pushed read, small side only)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding", "label"],
                      filters=[("vec_id", "in", [int(q) for q in query_ids])])
    ids, m = _batch_matrix(t)
    labels = np.asarray(t["label"]).astype(np.int64)
    pos = {int(v): i for i, v in enumerate(ids)}
    sel = [pos[q] for q in query_ids]
    return (np.asarray(query_ids, dtype=np.int64), _normalize(m[sel]),
            labels[sel])


def hard_negative_topk(embeddings, query_ids: np.ndarray,
                       query_matrix: np.ndarray, query_labels: np.ndarray,
                       k: int = 5, *, batch_size: int | None = None):
    """Hard-negative mining for contrastive/metric training: per query, the
    exact top-k most-similar vectors whose class ``label`` DIFFERS from the
    query's — the highest-loss negatives a triplet/InfoNCE sampler wants.
    Same brute-force-cosine scale shape as ``cosine_topk`` (stateless
    batch x broadcast-queries matmul, per-batch label mask, two-level
    top-k fold); the query side (ids + normalized matrix + labels) is
    ``ray.put`` ONCE.

    Returns Dataset[qid, vec_id, rank] (rank 1-based, sim DESC then
    vec_id ASC)."""
    import ray

    q_ref = ray.put((query_ids, query_matrix,
                     np.asarray(query_labels, dtype=np.int64)))

    def local_topk(t: pa.Table) -> pa.Table:
        qids, qm, ql = (ray.get(q_ref)
                        if isinstance(q_ref, ray.ObjectRef) else q_ref)
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return _CAND_SCHEMA.empty_table()
        labels = np.asarray(t["label"]).astype(np.int64)
        sims = _normalize(m) @ qm.T  # (n, nq) float64
        out_q, out_v, out_s = [], [], []
        for j in range(len(qids)):
            mask = labels != ql[j]
            cids = ids[mask]
            if len(cids) == 0:
                continue
            col = sims[mask, j]
            kk = min(k, len(cids))
            idx = (np.argpartition(-col, kk - 1)[:kk]
                   if kk < len(cids) else np.arange(len(cids)))
            out_q.append(np.full(len(idx), qids[j], dtype=np.int64))
            out_v.append(cids[idx])
            out_s.append(col[idx])
        if not out_q:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({
            "qid": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim": pa.array(np.concatenate(out_s)),
        })

    cand = embeddings.map_batches(local_topk, batch_format="pyarrow",
                                  batch_size=batch_size)
    return _fold_topk(cand, k, len(query_ids))


PQ_SCALE = 1 << 16  # power of two: float64 * PQ_SCALE is EXACT (exponent
# shift, no mantissa rounding), so engine and SQL quantize bitwise-equal


def pq_train_encode(embeddings, *, dim: int, m: int = 4, k: int = 8,
                    iters: int = 2, scale: int = PQ_SCALE,
                    batch_size: int | None = None):
    """Product-quantization codebook training + corpus encoding — the
    memory-scale path for ANN over 10^11 vectors (a D-dim float vector
    compresses to ``m`` uint8-sized codes; IVF-PQ search scans codes, not
    floats). Vectors quantize to an integer grid (``floor(x * scale)``
    with a power-of-two scale — exact in float64 on BOTH the numpy and
    DuckDB sides), the D dims split into ``m`` contiguous subspaces, and
    each subspace trains an independent K-centroid integer Lloyd codebook
    (``curation.kmeans_train`` semantics: argmin(|c|^2 - 2 q.c) with
    ties -> lowest k, floor(sum/count) updates, empty clusters keep the
    previous centroid, fixed ``iters`` rounds) seeded by the subvectors of
    ``vec_id < k`` (the deterministic seed the SQL mirror reproduces).

    Plan shape: the (vec_id, q0..q{D-1}) integer projection materializes
    ONCE; each Lloyd round is one streaming pass emitting <= m*k partial
    rows per batch (ALL subspaces fold in the same pass — counts +
    coordinate sums via bincount), a per-task combine level, and an
    O(m*k*D/m) driver fold. Encoding is a final stateless map. Driver
    state is the m codebooks (m*k*(D/m) ints).

    Returns ``(codes, codebooks)``: Dataset[vec_id, code0..code{m-1}] and
    the list of m (k x D/m) int64 codebook matrices."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m

    def quantize(t: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(t)
        if len(ids) == 0:  # dim unknowable from an empty variable-list block
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             **{f"q{j}": pa.array([], pa.int64())
                                for j in range(dim)}})
        if mat.shape[1] != dim:
            raise ValueError(f"expected dim {dim}, got {mat.shape[1]}")
        q = np.floor(mat * scale).astype(np.int64)
        return pa.table({"vec_id": pa.array(ids),
                         **{f"q{j}": pa.array(q[:, j]) for j in range(dim)}})

    proj = embeddings.map_batches(quantize, batch_format="pyarrow",
                                  batch_size=batch_size).materialize()

    # deterministic seed: the quantized subvectors of vec_id < k
    def seed_rows(t: pa.Table) -> pa.Table:
        keep = np.asarray(t["vec_id"]).astype(np.int64) < k
        return t.filter(pa.array(keep))

    seed = collect_table(proj.map_batches(seed_rows, batch_format="pyarrow"))
    if seed.num_rows < k:
        raise ValueError(f"need vec_id 0..{k - 1} present to seed, "
                         f"got {seed.num_rows} rows")
    order = np.argsort(np.asarray(seed["vec_id"]).astype(np.int64))
    seed_q = np.stack([np.asarray(seed[f"q{j}"]).astype(np.int64)[order]
                       for j in range(dim)], axis=1)
    books = [np.ascontiguousarray(seed_q[:k, s * dsub:(s + 1) * dsub])
             for s in range(m)]

    def to_rows(cnt: np.ndarray, sums: np.ndarray) -> pa.Table:
        # cnt: (m, k); sums: (m, k, dsub) — one row per (sub, cluster)
        sub = np.repeat(np.arange(m, dtype=np.int64), k)
        return pa.table({
            "sub": pa.array(sub),
            "cluster": pa.array(np.tile(np.arange(k, dtype=np.int64), m)),
            "n": pa.array(cnt.reshape(-1)),
            **{f"s{d}": pa.array(sums[:, :, d].reshape(-1))
               for d in range(dsub)},
        })

    def fold_rows(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        cnt = np.zeros((m, k), np.int64)
        sums = np.zeros((m, k, dsub), np.int64)
        if t.num_rows:
            idx = (np.asarray(t["sub"]).astype(np.int64) * k
                   + np.asarray(t["cluster"]).astype(np.int64))
            np.add.at(cnt.reshape(-1), idx,
                      np.asarray(t["n"]).astype(np.int64))
            for d in range(dsub):
                np.add.at(sums.reshape(-1, dsub)[:, d], idx,
                          np.asarray(t[f"s{d}"]).astype(np.int64))
        return cnt, sums

    def combine(t: pa.Table) -> pa.Table:
        return to_rows(*fold_rows(t))

    def assign_sub(X: np.ndarray, C: np.ndarray) -> np.ndarray:
        score = (C * C).sum(axis=1)[None, :] - 2 * (X @ C.T)
        return score.argmin(axis=1)

    for _ in range(iters):
        snap = [b.copy() for b in books]

        def partial(t: pa.Table, _B=snap) -> pa.Table:
            cnt = np.zeros((m, k), np.int64)
            sums = np.zeros((m, k, dsub), np.int64)
            for s in range(m):
                X = np.stack(
                    [np.asarray(t[f"q{s * dsub + d}"]).astype(np.int64)
                     for d in range(dsub)], axis=1)
                cl = assign_sub(X, _B[s])
                cnt[s] = np.bincount(cl, minlength=k)
                for d in range(dsub):
                    # float64 bincount round-trip exact below 2^53
                    sums[s, :, d] = np.bincount(
                        cl, weights=X[:, d], minlength=k).astype(np.int64)
            return to_rows(cnt, sums)

        parts = collect_table(
            proj.map_batches(partial, batch_format="pyarrow")
                .map_batches(combine, batch_format="pyarrow", batch_size=64))
        cnt, sums = fold_rows(parts)
        for s in range(m):
            upd = np.floor_divide(sums[s], np.maximum(cnt[s], 1)[:, None])
            books[s] = np.where((cnt[s] > 0)[:, None], upd,
                                snap[s]).astype(np.int64)

    final = [b.copy() for b in books]

    def encode(t: pa.Table) -> pa.Table:
        out = {"vec_id": t["vec_id"]}
        for s in range(m):
            X = np.stack([np.asarray(t[f"q{s * dsub + d}"]).astype(np.int64)
                          for d in range(dsub)], axis=1)
            out[f"code{s}"] = pa.array(assign_sub(X, final[s]))
        return pa.table(out)

    codes = proj.map_batches(encode, batch_format="pyarrow")
    return codes, final


def pq_adc_topk(codes, codebooks, query_ids: np.ndarray,
                query_q: np.ndarray, k: int = 5, *,
                batch_size: int | None = None):
    """Asymmetric-distance (ADC) top-k over PQ codes — the search half of
    IVF-PQ: each query precomputes one (k_centroids,) integer distance
    table per subspace (``||q_sub - c||^2``), and every database vector's
    approximate distance is m table lookups + adds, never touching the
    original floats. Because ``pq_train_encode`` works on an integer grid
    the ADC distances are integer-EXACT, so (uniquely for an ANN op) the
    ranking is oracle-checkable bit-for-bit, not recall-graded.

    ``codes`` is the Dataset[vec_id, code0..code{m-1}] from
    ``pq_train_encode``; ``query_q`` the queries' already-quantized int64
    grid vectors (same floor(x*scale) grid). The distance tables
    (nq x m x k_centroids ints) broadcast ONCE via ``ray.put``; scoring is
    a stateless per-batch gather (``T[s][codes_s]`` fancy-indexing — no
    matmul, no floats), folded by the shared two-level top-k
    (``_fold_topk``; sim = -dist stays exact in float64 far below 2^53).

    Returns Dataset[qid, vec_id, rank] (rank 1-based, dist ASC then
    vec_id ASC)."""
    import ray

    m = len(codebooks)
    dsub = codebooks[0].shape[1]
    nq = len(query_ids)
    kc = codebooks[0].shape[0]
    tables = np.zeros((m, kc, nq), dtype=np.int64)
    for s in range(m):
        qs = query_q[:, s * dsub:(s + 1) * dsub]  # (nq, dsub)
        diff = qs[None, :, :] - codebooks[s][:, None, :]  # (kc, nq, dsub)
        tables[s] = (diff * diff).sum(axis=2)
    t_ref = ray.put((np.asarray(query_ids, dtype=np.int64), tables))

    def score(t: pa.Table) -> pa.Table:
        qids, T = (ray.get(t_ref)
                   if isinstance(t_ref, ray.ObjectRef) else t_ref)
        ids = np.asarray(t["vec_id"]).astype(np.int64)
        n = len(ids)
        dist = np.zeros((n, nq), dtype=np.int64)
        for s in range(m):
            cs = np.asarray(t[f"code{s}"]).astype(np.int64)
            dist += T[s][cs]  # (n, nq) gather
        out_q, out_v, out_s = [], [], []
        kk = min(k, n)
        if kk == 0:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        for j in range(nq):
            col = dist[:, j]
            idx = (np.argpartition(col, kk - 1)[:kk]
                   if kk < n else np.arange(n))
            out_q.append(np.full(len(idx), qids[j], dtype=np.int64))
            out_v.append(ids[idx])
            out_s.append(-col[idx].astype(np.float64))  # exact below 2^53
        return pa.table({
            "qid": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim": pa.array(np.concatenate(out_s)),
        })

    cand = codes.map_batches(score, batch_format="pyarrow",
                             batch_size=batch_size)
    return _fold_topk(cand, k, nq)


def load_quantized_queries(path: str, query_ids: list[int],
                           scale: int = PQ_SCALE) -> np.ndarray:
    """Predicate-pushed load of query vectors onto the PQ integer grid
    (the exact floor(x*scale) quantization ``pq_train_encode`` applies)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", [int(q) for q in query_ids])])
    ids, mat = _batch_matrix(t)
    pos = {int(v): i for i, v in enumerate(ids)}
    sel = [pos[q] for q in query_ids]
    return np.floor(mat[sel] * scale).astype(np.int64)
