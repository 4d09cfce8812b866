"""Throughput spot checks for the round-4 continuation-session operators at
1M docs (5k sf0.1 docs x200 read replicas). One JSON line per op; annotate
with the in-run grant before trusting (CLAUDE.md: host throttles the VM's
aggregate grant)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("GRAFT_REPLICAS", "200"))


def main() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from bench import host_spin_ms

    def docs_1m(cols=("doc_id", "text")):
        return rd.read_parquet([f"{SF}/documents.parquet"] * REPS,
                               columns=list(cols))

    def events_2m():
        # 100k events x20 = 2M (events are 20x denser per sf than docs)
        return rd.read_parquet([f"{SF}/events.parquet"] * max(REPS // 10, 1),
                               columns=["event_id", "user_id", "ts"])

    results = {}

    def run(name, fn):
        t0 = time.perf_counter()
        out = fn()
        n = out.count() if hasattr(out, "take_all") else len(out)
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": dt, "rows": int(n)}
        print(json.dumps({name: results[name]}), flush=True)

    from fhir_data_validation_ray.explain import excerpt_violations
    from fhir_data_validation_ray.pipelines.dataops import (_gopher_stages,
                                                            CHUNK_ID_MULT)
    from fhir_data_validation_ray.pipelines.curation import filter_funnel
    from fhir_data_validation_ray.pipelines.profiles import default_profile
    from fhir_data_validation_ray.pipelines.validate import (fixture_paths,
                                                             run_validation)
    from fhir_data_validation_ray.sources.readers import read_documents
    from fhir_data_validation_ray.stages.dedup import (crosslang_dups,
                                                       exact_dedup)
    from fhir_data_validation_ray.stages.textops import (chunk_documents,
                                                         nb_classifier)
    from fhir_data_validation_ray.stages.windows import out_of_order_counts

    run("nb_classifier_1m", lambda: nb_classifier(
        docs_1m(("doc_id", "text", "lang"))).materialize())
    run("crosslang_dups_1m", lambda: crosslang_dups(
        docs_1m(("doc_id", "text", "lang"))).materialize())
    run("out_of_order_2m", lambda: out_of_order_counts(
        events_2m()).materialize())

    def chunk_dedup():
        def pack(t: pa.Table) -> pa.Table:
            import numpy as np

            d = np.asarray(t["doc_id"]).astype("int64")
            c = np.asarray(t["chunk_id"]).astype("int64")
            return pa.table({"doc_id": pa.array(d * CHUNK_ID_MULT + c),
                             "text": t["chunk_text"]})

        return exact_dedup(chunk_documents(docs_1m()).map_batches(
            pack, batch_format="pyarrow")).materialize()

    run("chunk_dedup_1m", chunk_dedup)
    run("gopher_funnel_1m", lambda: filter_funnel(
        docs_1m(("text",)), _gopher_stages()).materialize())

    paths = fixture_paths(SF, REPS)
    run("excerpt_violations_1m", lambda: excerpt_violations(
        run_validation(SF, replicas=REPS, with_uniqueness=False),
        read_documents(paths["docs"])).materialize())

    results["host_spin_ms"] = host_spin_ms()
    print(json.dumps({"all": results, "sf": SF, "replicas": REPS}),
          flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
