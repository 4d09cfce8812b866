"""Throughput spot checks for the round-4e operators (k-core, session
paths, Benford, novel grams, conversion lag, LRS) at 1M docs / 2M events /
1M edges (LRS also at 100k docs — its honest unit is positions x rounds).
One JSON line per op; annotate with the in-run grant before trusting
(CLAUDE.md: the host throttles the VM's aggregate grant).

Same replica expansion as op_bench_r4d: doc ids remap (doc_id*REPS + j),
1 variant in 4 keeps its text verbatim, the rest get a variant suffix.
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

    def docs_n(reps, cols=("doc_id", "text")):
        def expand(t: pa.Table) -> pa.Table:
            n = t.num_rows
            d = np.asarray(t["doc_id"]).astype(np.int64)
            j = np.tile(np.arange(reps, dtype=np.int64), n)
            ids = np.repeat(d, reps) * reps + j
            out = {"doc_id": pa.array(ids)}
            if "text" in t.column_names:
                texts = t["text"].combine_chunks() if isinstance(
                    t["text"], pa.ChunkedArray) else t["text"]
                rep = texts.take(pa.array(np.repeat(
                    np.arange(n, dtype=np.int64), reps)))
                suf = pa.array(np.where(j % 4 == 0, "",
                                        np.char.add(" v", j.astype("U"))))
                out["text"] = pc.binary_join_element_wise(rep, suf, "")
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

    from fhir_data_validation_ray.stages.dedup import (
        kcore_from_pairs,
        longest_repeated_substring,
        novel_gram_counts,
    )
    from fhir_data_validation_ray.stages.stats import benford_digits
    from fhir_data_validation_ray.stages.windows import (
        conversion_lag_quantiles,
        session_paths,
    )

    # synthetic graph over the GLOBAL id space (ring + chords, canonical,
    # deduplicated — kcore_from_pairs raises on duplicate edges)
    def edges_ring(n_nodes: int):
        d = np.arange(n_nodes, dtype=np.int64)
        a = np.concatenate([d, d])
        b = np.concatenate([(d + 1) % n_nodes, (d * 7 + 3) % n_nodes])
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        key = np.unique(lo[keep] * n_nodes + hi[keep])
        return rd.from_arrow(pa.table({
            "doc_a": pa.array(key // n_nodes),
            "doc_b": pa.array(key % n_nodes),
        })).repartition(64)

    run("kcore_pairs_2m_edges", lambda: kcore_from_pairs(
        edges_ring(1_000_000), iters=3).materialize())
    run("session_paths_2m", lambda: session_paths(events_2m()))
    run("benford_2m", lambda: benford_digits(
        rd.read_parquet([f"{SF}/events.parquet"] * max(REPS // 10, 1),
                        columns=["event_type", "value"]),
        "value", "event_type"))
    run("conversion_lag_2m", lambda: conversion_lag_quantiles(events_2m()))
    run("novel_grams_1m", lambda: novel_gram_counts(
        docs_n(REPS)).materialize())
    run("lrs_100k", lambda: longest_repeated_substring(
        docs_n(max(REPS // 10, 1))))

    print(json.dumps({"summary": results, "sf": SF, "replicas": REPS,
                      "host_spin_ms": host_spin_ms()}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
