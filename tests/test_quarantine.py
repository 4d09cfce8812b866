"""quarantine_split — doc-level pass/fail gate. The load-bearing check:
documents the gate passes as CLEAN revalidate with ZERO error-severity
rows, and the quarantined id set equals the blocking-id stream."""

import pyarrow as pa

from fhir_data_validation_ray.pipelines.profiles import default_profile

SF = "/root/testdata/sf0.001"


def test_quarantine_split_identity(ray_session, tmp_path):
    import pyarrow.compute as pc
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.validate import (
        blocking_doc_ids,
        quarantine_split,
        run_validation,
    )
    from fhir_data_validation_ray.stages.validator import validate_dataset
    from fhir_data_validation_ray.sources.readers import registry_keys_numpy
    from fhir_data_validation_ray.pipelines.validate import fixture_paths

    out = quarantine_split(SF, str(tmp_path / "gate")).materialize()
    rows = out.select_columns(["doc_id", "quarantined", "n_blocking"]).take_all()
    got_bad = {r["doc_id"]: r["n_blocking"] for r in rows if r["quarantined"]}

    v = run_validation(SF, default_profile(), with_uniqueness=False)
    want_bad = {r["doc_id"]: r["n_blocking"]
                for r in blocking_doc_ids(v).take_all()}
    assert got_bad == want_bad
    assert all(r["n_blocking"] == 0 for r in rows if not r["quarantined"])
    # every input doc comes out exactly once
    n_in = rd.read_parquet(fixture_paths(SF)["docs"]).count()
    assert len(rows) == n_in

    # CLEAN docs revalidate clean: zero error-severity rows
    clean = out.filter(lambda r: not r["quarantined"]) \
        .select_columns(["doc_id", "spans"])
    reg = registry_keys_numpy(fixture_paths(SF)["registry"])
    reval = validate_dataset(clean, default_profile(), registry_keys=reg,
                             emit_details=False)
    sev = reval.select_columns(["severity"]).take_all()
    assert sum(1 for r in sev if r["severity"] == "error") == 0

    # partitioned sink exists on both sides of the split
    assert (tmp_path / "gate" / "quarantine=true").exists()
    assert (tmp_path / "gate" / "quarantine=false").exists()
