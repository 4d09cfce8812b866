"""Round-5b spot bench: the new fixed-point drift / quantile / entropy
operators at 1M docs (sf0.01 x200 replica expansion, doc ids remapped,
source/lang/n_chars replicated, 1-in-4 texts verbatim). Input
pre-materialized; one JSON line per op; annotate with the printed spin
before trusting absolutes."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
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

    from fhir_data_validation_ray.stages.drift import drift_fp_by_group
    from fhir_data_validation_ray.stages.stats import exact_int_quantiles
    from fhir_data_validation_ray.stages.textops import char_entropy

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        d = np.asarray(t["doc_id"]).astype(np.int64)
        j = np.tile(np.arange(REPS, dtype=np.int64), n)
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), REPS))
        texts = t["text"].combine_chunks() if isinstance(
            t["text"], pa.ChunkedArray) else t["text"]
        suf = pa.array(np.where(j % 4 == 0, "",
                                np.char.add(" v", j.astype("U"))))
        return pa.table({
            "doc_id": pa.array(np.repeat(d, REPS) * REPS + j),
            "text": pc.binary_join_element_wise(texts.take(rep), suf, ""),
            "source": pc.take(t["source"], rep),
            "n_chars": pc.take(t["n_chars"], rep),
        })

    docs = (rd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "text", "source", "n_chars"],
                            override_num_blocks=64)
            .map_batches(expand, batch_format="pyarrow")
            .materialize())
    print(json.dumps({"n_docs": docs.count(), "spin": host_spin_ms()}))

    t0 = time.time()
    out = drift_fp_by_group(docs, "n_chars", "source", lo=0, hi=600,
                            nbins=20)
    print(json.dumps({"op": "a_drift_psi (psi_fp+exact ks_fp, 13 groups)",
                      "sec": round(time.time() - t0, 2),
                      "rows": out.num_rows}))

    t0 = time.time()
    q = exact_int_quantiles(docs, "n_chars", qs=(0.5, 0.95, 0.99))
    print(json.dumps({"op": "a_profile_quantiles (exact p50/p95/p99)",
                      "sec": round(time.time() - t0, 2),
                      "p50": q["p50"][0].as_py()}))

    t0 = time.time()
    n = char_entropy(docs).count()
    print(json.dumps({"op": "t_char_entropy (per-doc fixed-point)",
                      "sec": round(time.time() - t0, 2), "rows": n,
                      "spin_end": host_spin_ms()}))
    ray.shutdown()


if __name__ == "__main__":
    main()
