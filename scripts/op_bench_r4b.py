"""Throughput spot checks for the round-4 continuation operators at 1M docs
(5k sf0.1 docs x200 read replicas for the documents-table ops; x200 fixture
replicas for the spans-table ops). One JSON line per op; annotate with the
in-run grant before trusting (CLAUDE.md: host throttles the VM's aggregate
grant)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("GRAFT_REPLICAS", "200"))


def main() -> None:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from bench import host_spin_ms

    def docs_1m():
        return rd.read_parquet([f"{SF}/documents.parquet"] * REPS)

    results = {}

    def run(name, fn):
        t0 = time.perf_counter()
        out = fn()
        n = out.count() if hasattr(out, "take_all") else len(out)
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": dt, "rows": int(n)}
        print(json.dumps({name: results[name]}), flush=True)

    from fhir_data_validation_ray.pipelines.dataops import _funnel_stages
    from fhir_data_validation_ray.pipelines.curation import filter_funnel
    from fhir_data_validation_ray.stages.textops import distinct_ngrams
    from fhir_data_validation_ray.stages.stats import kll_column_quantiles
    from fhir_data_validation_ray.stages.packing import pack_interleaved
    from fhir_data_validation_ray.pipelines.validate import (
        blocking_doc_ids, fixture_paths, run_validation)
    from fhir_data_validation_ray.sources.readers import read_documents

    run("filter_funnel", lambda: filter_funnel(
        docs_1m(), _funnel_stages()).materialize())
    run("distinct_ngrams", lambda: distinct_ngrams(
        docs_1m(), (1, 2, 3)).materialize())
    run("kll_quantiles", lambda: [kll_column_quantiles(
        docs_1m(), "n_chars")])
    paths = fixture_paths(SF, REPS)
    run("pack_interleaved_1m", lambda: pack_interleaved(
        read_documents(paths["docs"])).materialize())
    run("blocking_doc_ids_1m", lambda: blocking_doc_ids(run_validation(
        SF, replicas=REPS, with_uniqueness=False)).materialize())

    print(json.dumps({"spin_ms": host_spin_ms(), "sf": SF, "replicas": REPS,
                      "all": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
