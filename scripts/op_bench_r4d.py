"""Throughput spot checks for the round-4 second-continuation operators at
1M docs / 2M events / 1M edges. One JSON line per op; annotate with the
in-run grant before trusting (CLAUDE.md: the host throttles the VM's
aggregate grant).

Replica expansion remaps doc ids (doc_id*REPS + j) so keyed exchanges see
distinct keys; 1 variant in 4 keeps its text verbatim (exact-dup mixture),
the rest get a variant-suffix (near-dup mixture) — raw file replication
would make every text a 200-clique and blow up pair-bounded ops.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("GRAFT_REPLICAS", "200"))


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from bench import host_spin_ms

    def docs_1m(cols=("doc_id", "text")):
        def expand(t: pa.Table) -> pa.Table:
            n = t.num_rows
            d = np.asarray(t["doc_id"]).astype(np.int64)
            j = np.tile(np.arange(REPS, dtype=np.int64), n)
            ids = np.repeat(d, REPS) * REPS + j
            out = {"doc_id": pa.array(ids)}
            if "text" in t.column_names:
                texts = t["text"].combine_chunks() if isinstance(
                    t["text"], pa.ChunkedArray) else t["text"]
                rep = texts.take(pa.array(np.repeat(
                    np.arange(n, dtype=np.int64), REPS)))
                suf = pa.array(np.where(j % 4 == 0, "",
                                        np.char.add(" v", j.astype("U"))))
                out["text"] = pc.binary_join_element_wise(rep, suf, "")
            for c in t.column_names:
                if c not in ("doc_id", "text"):
                    out[c] = (t[c].combine_chunks() if isinstance(
                        t[c], pa.ChunkedArray) else t[c]).take(
                        pa.array(np.repeat(
                            np.arange(n, dtype=np.int64), REPS)))
            return pa.table(out)

        return rd.read_parquet(f"{SF}/documents.parquet",
                               columns=list(cols),
                               override_num_blocks=64).map_batches(
            expand, batch_format="pyarrow")

    def events_2m():
        return rd.read_parquet([f"{SF}/events.parquet"] * max(REPS // 10, 1))

    results = {}

    def run(name, fn):
        t0 = time.perf_counter()
        out = fn()
        n = out.count() if hasattr(out, "count") else len(out)
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": dt, "rows": int(n)}
        print(json.dumps({name: results[name]}), flush=True)

    from fhir_data_validation_ray.pipelines.curation import rank_fusion
    from fhir_data_validation_ray.stages.dedup import (
        cdc_chunk_dedup,
        delta_dedup,
        edit_distance_pairs,
        triangle_counts_from_pairs,
    )
    from fhir_data_validation_ray.stages.stats import (
        contingency,
        fd_violations,
    )
    from fhir_data_validation_ray.stages.windows import upsert_latest

    run("cdc_chunk_dedup_1m", lambda: cdc_chunk_dedup(
        docs_1m()).materialize())

    def delta():
        def half(is_delta: bool):
            def f(t: pa.Table) -> pa.Table:
                m = np.asarray(t["doc_id"]).astype(np.int64) % 4 == 0
                return t.filter(pa.array(m if is_delta else ~m))
            return f
        return delta_dedup(
            docs_1m().map_batches(half(False), batch_format="pyarrow"),
            docs_1m().map_batches(half(True), batch_format="pyarrow"),
        ).materialize()

    run("delta_dedup_1m", delta)
    run("upsert_latest_2m", lambda: upsert_latest(events_2m()).materialize())
    run("rank_fusion_1m", lambda: rank_fusion(docs_1m()).materialize())
    run("fd_violations_1m", lambda: fd_violations(
        docs_1m(("doc_id", "source", "lang")), "source", "lang"
    ).materialize())
    run("contingency_1m", lambda: contingency(
        docs_1m(("doc_id", "source", "lang")), "source", "lang"
    ).materialize())

    # pair-bounded ops: the honest unit is the candidate-pair set
    def edit_pairs():
        base = rd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
        nd = base.count()

        def mk_pairs(t: pa.Table) -> pa.Table:
            d = np.asarray(t["doc_id"]).astype(np.int64)
            rng = (d * np.int64(2654435761)) % np.int64(max(nd, 1))
            a = np.minimum(d, rng)
            b = np.maximum(d, rng)
            keep = a != b
            out = pa.table({"doc_a": pa.array(np.repeat(a[keep], 4)),
                            "doc_b": pa.array(np.repeat(b[keep], 4))})
            return out

        pairs = base.map_batches(mk_pairs, batch_format="pyarrow")
        return edit_distance_pairs(base, pairs).materialize()

    run("edit_distance_20kpairs", edit_pairs)

    def triangles_1m_edges():
        # xorshift-mixed endpoints: an affine map here is periodic mod
        # n_nodes and triangle-free — measured exactly 0 triangles
        n_nodes, n_edges = 100_000, 1_000_000
        ids = np.arange(n_edges, dtype=np.uint64)

        def mix(x, salt):
            y = (x + np.uint64(salt)) * np.uint64(0x9E3779B97F4A7C15)
            y ^= y >> np.uint64(31)
            return (y % np.uint64(n_nodes)).astype(np.int64)

        u, v = mix(ids, 1), mix(ids, 2)
        a, b = np.minimum(u, v), np.maximum(u, v)
        keep = a != b
        # the operator REQUIRES distinct canonical edges (raises otherwise)
        pk = np.unique(a[keep] * np.int64(1 << 32) + b[keep])
        t = pa.table({"doc_a": pa.array(pk >> np.int64(32)),
                      "doc_b": pa.array(pk & np.int64((1 << 32) - 1))})
        edges = rd.from_arrow(t).repartition(64)
        return triangle_counts_from_pairs(edges).materialize()

    run("triangles_1m_edges", triangles_1m_edges)

    results["host_spin_ms"] = host_spin_ms()
    print(json.dumps({"all": results, "sf": SF, "replicas": REPS}),
          flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
