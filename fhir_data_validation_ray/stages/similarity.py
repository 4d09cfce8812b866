"""Similarity search over the ``embeddings`` table (``vec_id, embedding:
list<float>, label``).

- **cosine_topk**: exact brute-force top-k — the broadcast pattern: the query
  matrix is ``ray.put`` once, every batch does one float64 matmul against it
  and emits its local top-k per query; the driver merges the (tiny)
  per-batch candidate sets into the global top-k. SQL oracle via
  ``list_dot_product`` on double-cast lists.
- **cosine_pairs**: exact near-duplicate pairs with cosine >= threshold —
  embedding-cosine near-dup detection. Same broadcast shape (the corpus is
  its own query set, streamed batch x broadcast-matrix); at 10^9+ vectors
  swap the broadcast for the LSH bucketing below.
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
    """Driver-side load of the query vectors (small side)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids, m = _batch_matrix(t)
    pos = {int(v): i for i, v in enumerate(ids)}
    sel = [pos[q] for q in query_ids]
    return np.asarray(query_ids, dtype=np.int64), _normalize(m[sel])


def cosine_topk(embeddings, query_ids: np.ndarray, query_matrix: np.ndarray,
                k: int = 5, *, batch_size: int | None = None):
    """Exact top-k by cosine per query. Returns Dataset[qid, vec_id, rank]
    (rank 1-based by sim DESC then vec_id ASC — deterministic ties)."""
    import ray
    import ray.data as rd

    q_ref = ray.put((query_ids, query_matrix))

    def local_topk(t: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        ids, m = _batch_matrix(t)
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
    # global merge: k rows per query per batch — tiny; driver-side exact top-k
    tbl = collect_table(cand)
    q = np.asarray(tbl["qid"]).astype(np.int64)
    v = np.asarray(tbl["vec_id"]).astype(np.int64)
    s = np.asarray(tbl["sim"])
    order = np.lexsort((v, -s, q))  # by qid, sim desc, vec_id asc
    q, v, s = q[order], v[order], s[order]
    new_q = np.ones(len(q), dtype=bool)
    new_q[1:] = q[1:] != q[:-1]
    rank = np.arange(len(q)) - np.repeat(np.flatnonzero(new_q), np.diff(np.append(np.flatnonzero(new_q), len(q)))) + 1
    keep = rank <= k
    return rd.from_arrow(
        pa.table(
            {
                "qid": pa.array(q[keep]),
                "vec_id": pa.array(v[keep]),
                "rank": pa.array(rank[keep].astype(np.int64)),
            }
        )
    )


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
        sims = _normalize(m) @ m_all.T
        ii, jj = np.nonzero(sims >= threshold)
        a, b = ids[ii], ids_all[jj]
        keep = a < b  # each unordered pair emitted once (by its lower id's batch)
        return pa.table(
            {"doc_a": pa.array(a[keep]), "doc_b": pa.array(b[keep])}
        )

    return embeddings.map_batches(pairs, batch_format="pyarrow",
                                  batch_size=batch_size)


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
    import ray.data as rd

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
    tbl = collect_table(cand)
    if tbl.num_rows == 0 or tbl.num_columns == 0:
        return rd.from_arrow(pa.table({"qid": pa.array([], pa.int64()),
                                       "vec_id": pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.int64())}))
    return _rank_topk(tbl, k)


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
    import ray.data as rd

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
    tbl = collect_table(cand)
    if tbl.num_rows == 0 or tbl.num_columns == 0:
        return rd.from_arrow(pa.table({"qid": pa.array([], pa.int64()),
                                       "vec_id": pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.int64())}))
    return _rank_topk(tbl, k)
