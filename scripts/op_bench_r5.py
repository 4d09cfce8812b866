"""Round-5 spot bench: the ExactSubstr-family sampled lane (VERDICT r4 #6)
— exact vs sample_docs=4 vs sample_docs=16 longest_repeated_substring and
duplication_profile over the sf0.01 documents table (100k docs).

Input is PRE-MATERIALIZED so each line times the op alone (CLAUDE.md
round-4 gotcha); one JSON line per configuration; annotate with the
in-run grant (host_spin_ms / effective cores are printed) before trusting
absolute numbers — the exact-vs-sampled RATIO is the claim under test.
"""
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

    from fhir_data_validation_ray.stages.dedup import (
        duplication_profile,
        longest_repeated_substring,
    )

    # op_bench_r4d/e replica expansion: 1 variant in 4 keeps its text
    # verbatim (real cross-doc duplicate mass), the rest get a variant
    # suffix; ids remap doc_id*REPS + j
    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        d = np.asarray(t["doc_id"]).astype(np.int64)
        j = np.tile(np.arange(REPS, dtype=np.int64), n)
        rep_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), REPS))
        texts = t["text"].combine_chunks() if isinstance(
            t["text"], pa.ChunkedArray) else t["text"]
        suf = pa.array(np.where(j % 4 == 0, "",
                                np.char.add(" v", j.astype("U"))))
        return pa.table({
            "doc_id": pa.array(np.repeat(d, REPS) * REPS + j),
            "text": pc.binary_join_element_wise(
                texts.take(rep_idx), suf, ""),
        })

    docs = (rd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "text"],
                            override_num_blocks=64)
            .map_batches(expand, batch_format="pyarrow")
            .materialize())
    n = docs.count()
    print(json.dumps({"input_docs": n, "sf_dir": SF,
                      "host_spin_ms": host_spin_ms()}))

    for s in (None, 4, 16):
        t0 = time.time()
        out = longest_repeated_substring(docs, sample_docs=s).to_pydict()
        dt = round(time.time() - t0, 2)
        print(json.dumps({"op": "d_lrs", "sample_docs": s, "sec": dt,
                          "lrs_words": out["lrs_words"][0],
                          "n_occurrences": out["n_occurrences"][0]}))
    for s in (None, 4, 16):
        t0 = time.time()
        out = duplication_profile(docs, (1, 2, 4, 8, 16, 32),
                                  sample_docs=s).to_pydict()
        dt = round(time.time() - t0, 2)
        print(json.dumps({"op": "d_dup_profile", "sample_docs": s,
                          "sec": dt,
                          "n_dup_positions": out["n_dup_positions"]}))
    print(json.dumps({"host_spin_ms_end": host_spin_ms()}))
    ray.shutdown()


if __name__ == "__main__":
    main()
