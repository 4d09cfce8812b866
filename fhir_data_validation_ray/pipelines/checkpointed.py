"""Checkpointed, resumable validation runs (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Layout under ``out_dir``::

    violations/part-<partition_id>.parquet   one file per input partition
    _manifests/<partition_id>.json           atomic per-partition manifest
    _run.json                                run-level summary (written last)

A *partition* is one input parquet file's row group — the same granularity a
multi-node run would shard by. Each partition is processed by ONE task that
reads its row group, validates, writes its violations file, then writes its
manifest via tmp+rename (atomic on POSIX). A crashed/killed run leaves no
manifest for unfinished partitions, so ``run_checkpointed`` with
``resume=True`` skips exactly the completed ones and recomputes the rest —
outputs are deterministic, so a resumed run is byte-identical to an
uninterrupted one.

The manifest carries the north_rule's lineage + metrics: input fragment,
row range, violation counts by severity, per-partition pass/fail verdict,
wall time, profile hash and engine version.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ENGINE_VERSION = "r2"


def _list_partitions(docs_path: str) -> list[dict]:
    """Deterministic partition descriptors: one per (file, row_group)."""
    files = (
        sorted(
            os.path.join(docs_path, f)
            for f in os.listdir(docs_path)
            if f.endswith(".parquet")
        )
        if os.path.isdir(docs_path)
        else [docs_path]
    )
    parts = []
    for f in files:
        meta = pq.read_metadata(f)
        stem = os.path.splitext(os.path.basename(f))[0]
        for rg in range(meta.num_row_groups):
            parts.append(
                {
                    "partition_id": f"{stem}-rg{rg:04d}",
                    "file": f,
                    "row_group": rg,
                    "n_rows": meta.row_group(rg).num_rows,
                }
            )
    return parts


def _profile_hash(profile_obj: dict[str, Any]) -> str:
    return hashlib.sha256(
        json.dumps(profile_obj, sort_keys=True).encode()
    ).hexdigest()[:16]


def run_checkpointed(
    sf_dir: str,
    out_dir: str,
    profile_obj: dict[str, Any] | None = None,
    *,
    replicas: int = 1,
    resume: bool = True,
    emit_details: bool = False,
    validation_mode: str = "standard",
) -> dict:
    """Run (or resume) a checkpointed validation over one corpus. Returns the
    run manifest. Idempotent: a second call with ``resume=True`` and all
    manifests present does no partition work. ``validation_mode``
    participates in the resume hash — a standard-mode manifest is never
    reused by a full/debug-mode run (their advisory rows differ)."""
    import ray
    import ray.data as rd

    from ..sources.readers import registry_keys_numpy
    from ..stages.validator import _validate_stateless
    from .profiles import default_profile
    from .validate import fixture_paths

    paths = fixture_paths(sf_dir, replicas)
    profile_obj = profile_obj or default_profile()
    pj = json.dumps(profile_obj, sort_keys=True)
    phash = _profile_hash(profile_obj)
    if validation_mode.lower() != "standard":
        phash = f"{phash}:{validation_mode.lower()}"

    from ..functions.hashing import hash_str

    reg_ref = ray.put(np.sort(hash_str(registry_keys_numpy(paths["registry"]))))

    os.makedirs(os.path.join(out_dir, "violations"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)

    parts = _list_partitions(paths["docs"])
    done: set[str] = set()
    if resume:
        for f in os.listdir(os.path.join(out_dir, "_manifests")):
            if f.endswith(".json"):
                m = json.load(open(os.path.join(out_dir, "_manifests", f)))
                # a manifest from a different profile/engine is not reusable
                if m.get("status") == "complete" and m.get("profile_hash") == phash:
                    done.add(m["partition_id"])
    pending = [p for p in parts if p["partition_id"] not in done]

    def process(batch: pa.Table) -> pa.Table:
        out_rows = []
        for row in batch.to_pylist():
            t0 = time.perf_counter()
            pf = pq.ParquetFile(row["file"])
            docs = pf.read_row_group(row["row_group"])
            violations = _validate_stateless(pj, reg_ref, emit_details,
                                             validation_mode, None, docs)
            vio_path = os.path.join(
                out_dir, "violations", f"part-{row['partition_id']}.parquet"
            )
            tmp = vio_path + f".tmp.{os.getpid()}"
            pq.write_table(violations, tmp)
            os.replace(tmp, vio_path)
            sev = violations["severity"].to_pylist()
            counts = {s: sev.count(s) for s in set(sev)}
            manifest = {
                "partition_id": row["partition_id"],
                "status": "complete",
                "input_file": row["file"],
                "row_group": row["row_group"],
                "n_docs": docs.num_rows,
                "n_violations": violations.num_rows,
                "counts_by_severity": counts,
                "pass": counts.get("error", 0) == 0,
                "duration_s": round(time.perf_counter() - t0, 4),
                "profile_hash": phash,
                "engine_version": ENGINE_VERSION,
                "output": vio_path,
            }
            mpath = os.path.join(out_dir, "_manifests", f"{row['partition_id']}.json")
            tmp = mpath + f".tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, mpath)
            out_rows.append(
                {
                    "partition_id": row["partition_id"],
                    "n_docs": docs.num_rows,
                    "n_violations": violations.num_rows,
                    "pass": manifest["pass"],
                }
            )
        if not out_rows:
            return pa.table(
                {"partition_id": pa.array([], pa.string()),
                 "n_docs": pa.array([], pa.int64()),
                 "n_violations": pa.array([], pa.int64()),
                 "pass": pa.array([], pa.bool_())}
            )
        return pa.table(
            {
                "partition_id": pa.array([r["partition_id"] for r in out_rows], pa.string()),
                "n_docs": pa.array([r["n_docs"] for r in out_rows], pa.int64()),
                "n_violations": pa.array([r["n_violations"] for r in out_rows], pa.int64()),
                "pass": pa.array([r["pass"] for r in out_rows], pa.bool_()),
            }
        )

    # Run summary as a Dataset fold: fresh partitions stream their summary
    # rows straight out of `process`; resumed partitions re-read their
    # manifests in DISTRIBUTED tasks. A per-batch combine then one
    # Dataset.sum leaves O(1) driver state — at 10^6 partitions (100 TB)
    # the old driver loop was a million JSON reads + a million-row
    # take_all.
    def read_manifests(batch: pa.Table) -> pa.Table:
        rows = []
        for pid in batch["partition_id"].to_pylist():
            m = json.load(open(os.path.join(out_dir, "_manifests",
                                            f"{pid}.json")))
            rows.append((m["partition_id"], m["n_docs"], m["n_violations"],
                         m["pass"]))
        return pa.table({
            "partition_id": pa.array([r[0] for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "n_violations": pa.array([r[2] for r in rows], pa.int64()),
            "pass": pa.array([r[3] for r in rows], pa.bool_()),
        })

    def fold(t: pa.Table) -> pa.Table:
        passes = int(np.asarray(t["pass"]).sum()) if t.num_rows else 0
        return pa.table({
            "n_parts": pa.array([t.num_rows], pa.int64()),
            "n_docs": pa.array([int(np.asarray(t["n_docs"]).sum())
                                if t.num_rows else 0], pa.int64()),
            "n_violations": pa.array([int(np.asarray(t["n_violations"]).sum())
                                      if t.num_rows else 0], pa.int64()),
            "n_passed": pa.array([passes], pa.int64()),
        })

    summary_ds = None
    if pending:
        summary_ds = rd.from_items(
            pending, override_num_blocks=len(pending)
        ).map_batches(process, batch_format="pyarrow", batch_size=1)
    if done:
        skipped = rd.from_items(
            [{"partition_id": pid} for pid in sorted(done)]
        ).map_batches(read_manifests, batch_format="pyarrow", batch_size=256)
        summary_ds = skipped if summary_ds is None else summary_ds.union(skipped)

    if summary_ds is not None:
        totals = summary_ds.map_batches(fold, batch_format="pyarrow").sum(
            ["n_parts", "n_docs", "n_violations", "n_passed"])
        n_parts = int(totals["sum(n_parts)"])
        n_docs = int(totals["sum(n_docs)"])
        n_violations = int(totals["sum(n_violations)"])
        n_passed = int(totals["sum(n_passed)"])
    else:
        n_parts = n_docs = n_violations = n_passed = 0
    run = {
        "engine_version": ENGINE_VERSION,
        "profile_hash": phash,
        "n_partitions": len(parts),
        "n_processed_this_run": len(pending),
        "n_resumed_skips": len(done),
        "n_docs": n_docs,
        "n_violations": n_violations,
        "partitions_passed": n_passed,
        "partitions_failed": n_parts - n_passed,
    }
    tmp = os.path.join(out_dir, "_run.json.tmp")
    with open(tmp, "w") as f:
        json.dump(run, f)
    os.replace(tmp, os.path.join(out_dir, "_run.json"))
    return run
