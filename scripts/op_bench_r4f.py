"""Throughput spot checks for the round-4f operators (skyline, IND
discovery, rollup, k-anonymity, KN continuation counts, Simpson,
keyness, autocorrelation) at 1M docs / 2M events / the sf0.1 star
schema. Inputs are PRE-MATERIALIZED so each line times the op alone
(CLAUDE.md round-4 gotcha); one JSON line per op; annotate with the
in-run grant before trusting.

Same replica expansion as op_bench_r4d/e: doc ids remap
(doc_id*REPS + j), 1 variant in 4 keeps its text verbatim, the rest
get a variant suffix; source and n_chars replicate unchanged.
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

    def docs_1m():
        def expand(t: pa.Table) -> pa.Table:
            n = t.num_rows
            d = np.asarray(t["doc_id"]).astype(np.int64)
            j = np.tile(np.arange(REPS, dtype=np.int64), n)
            rep_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64),
                                         REPS))
            texts = t["text"].combine_chunks() if isinstance(
                t["text"], pa.ChunkedArray) else t["text"]
            suf = pa.array(np.where(j % 4 == 0, "",
                                    np.char.add(" v", j.astype("U"))))
            return pa.table({
                "doc_id": pa.array(np.repeat(d, REPS) * REPS + j),
                "text": pc.binary_join_element_wise(
                    texts.take(rep_idx), suf, ""),
                "source": t["source"].take(rep_idx),
                "lang": t["lang"].take(rep_idx),
                "n_chars": t["n_chars"].take(rep_idx),
            })

        return rd.read_parquet(
            f"{SF}/documents.parquet",
            columns=["doc_id", "text", "source", "lang", "n_chars"],
            override_num_blocks=64).map_batches(
            expand, batch_format="pyarrow")

    results = {}

    def run(name, fn):
        t0 = time.perf_counter()
        out = fn()
        n = out.count() if hasattr(out, "count") else len(out)
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": dt, "rows": int(n)}
        print(json.dumps({name: results[name]}), flush=True)

    from fhir_data_validation_ray.pipelines.curation import pareto_frontier
    from fhir_data_validation_ray.pipelines.dataops import IND_CANDIDATES
    from fhir_data_validation_ray.stages.stats import (
        ind_discovery,
        rollup_counts,
    )
    from fhir_data_validation_ray.stages.textops import (
        keyness_terms,
        kn_continuation_counts,
        simpson_diversity,
    )
    from fhir_data_validation_ray.stages.windows import (
        autocorr_windows,
        k_anonymity_audit,
    )

    docs = docs_1m().materialize()
    ev = rd.read_parquet(
        [f"{SF}/events.parquet"] * max(REPS // 10, 1)).materialize()

    run("pareto_1m", lambda: pareto_frontier(docs))
    run("rollup_1m", lambda: rollup_counts(
        docs, "source", "lang", "n_chars"))
    run("kn_counts_1m", lambda: kn_continuation_counts(
        docs).materialize())
    run("simpson_1m", lambda: simpson_diversity(docs).materialize())
    run("keyness_1m", lambda: keyness_terms(docs))
    run("k_anonymity_2m", lambda: k_anonymity_audit(ev).materialize())
    run("autocorr_2m", lambda: autocorr_windows(ev).materialize())
    run("ind_13cols_sf01", lambda: ind_discovery(
        [(f"{t}.{c}",
          rd.read_parquet(f"{SF}/{t}.parquet", columns=[c],
                          override_num_blocks=4), c)
         for t, c in IND_CANDIDATES]))

    print(json.dumps({"summary": results, "sf": SF, "replicas": REPS,
                      "host_spin_ms": host_spin_ms()}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
