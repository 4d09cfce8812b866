"""CLI entry point — the ``ray job submit`` deployment surface of the
north_rule ("runs ... submitted via ray job submit to fixed-size clusters"):

    ray job submit -- python -m fhir_data_validation_ray validate \\
        --sf-dir /root/testdata/sf0.01 --out /tmp/run1 [--profile rules.json] \\
        [--mode standard|full] [--replicas 1] [--no-resume]

    python -m fhir_data_validation_ray response --sf-dir ... [--max-errors 100]

``validate`` executes the checkpointed, resumable pipeline (per-partition
violation parquet + lineage/metrics manifests) and prints the run manifest
as one JSON line; ``response`` prints the ValidationResponse analogue.
The CLI owns the Ray session (guarded init — works standalone AND under a
driver/job submitter that already initialised Ray); library code never
calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _load_profile(path: str | None):
    if path is None:
        from .pipelines.profiles import default_profile

        return default_profile()
    with open(path) as f:
        return json.load(f)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fhir_data_validation_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="checkpointed, resumable validation run")
    v.add_argument("--sf-dir", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--profile", default=None, help="rules.json path (default: built-in)")
    v.add_argument("--replicas", type=int, default=1)
    v.add_argument("--no-resume", action="store_true")
    v.add_argument("--emit-details", action="store_true")
    v.add_argument("--mode", default="standard", choices=["standard", "full", "debug"])

    r = sub.add_parser("response", help="print the ValidationResponse analogue")
    r.add_argument("--sf-dir", required=True)
    r.add_argument("--profile", default=None)
    r.add_argument("--mode", default="standard", choices=["standard", "full", "debug"])
    r.add_argument("--max-errors", type=int, default=100)

    c = sub.add_parser(
        "curate",
        help="curation keep-list over a documents parquet (exact dedup + "
             "near-dup cluster drop + quality gate + hash sample) written "
             "as partitioned parquet",
    )
    c.add_argument("--docs", required=True,
                   help="documents parquet (doc_id:int64, text) file or dir")
    c.add_argument("--out", required=True, help="output dir for the keep-list")
    c.add_argument("--sample-rate", type=float, default=1.0)
    c.add_argument("--jaccard-threshold", type=float, default=0.8)

    rv = sub.add_parser(
        "review",
        help="governance rule-set review (metadata-only, no data access): "
             "per-rule issues as JSON lines + one summary line; exits "
             "nonzero when BLOCKED",
    )
    rv.add_argument("--profile", default=None,
                    help="rules.json path (default: built-in)")

    sg = sub.add_parser(
        "suggest",
        help="debug-mode system rule suggestions mined from the corpus "
             "(FixedValue/AllowedValues/Required/Regex detectors with "
             "confidence tiers), printed as JSON lines",
    )
    sg.add_argument("--sf-dir", required=True)
    sg.add_argument("--replicas", type=int, default=1)

    qa = sub.add_parser(
        "quarantine",
        help="doc-level pass/fail gate: validate, then write "
             "quarantine=true|false partitioned parquet (clean docs "
             "revalidate clean)",
    )
    qa.add_argument("--sf-dir", required=True)
    qa.add_argument("--out", required=True)
    qa.add_argument("--profile", default=None)
    qa.add_argument("--replicas", type=int, default=1)
    qa.add_argument("--mode", default="standard",
                    choices=["standard", "full", "debug"])

    im = sub.add_parser(
        "impact",
        help="profile-change corpus impact: the rule-level diff plus the "
             "resolved/introduced violation rows the change causes "
             "(restricted per-side runs; full-run fallback on structural "
             "settings changes)",
    )
    im.add_argument("--sf-dir", required=True)
    im.add_argument("--old-profile", default=None,
                    help="rules.json path (default: built-in)")
    im.add_argument("--new-profile", required=True)
    im.add_argument("--replicas", type=int, default=1)
    im.add_argument("--limit", type=int, default=100,
                    help="max impact rows printed (summary counts stay exact)")

    e = sub.add_parser(
        "export",
        help="curate + deterministic shuffle + write one parquet dir per "
             "shard (shard=N/) — the end-to-end training-shard export",
    )
    e.add_argument("--docs", required=True,
                   help="documents parquet (doc_id:int64, text) file or dir")
    e.add_argument("--out", required=True, help="output dir for the shards")
    e.add_argument("--n-shards", type=int, default=64)
    e.add_argument("--sample-rate", type=float, default=1.0)
    e.add_argument("--jaccard-threshold", type=float, default=0.8)
    e.add_argument("--split", action="store_true",
                   help="partition output split=train|val|test/shard=N "
                        "(leak-free 90/5/5 doc_id hash bands)")
    e.add_argument("--format", choices=("parquet", "jsonl"),
                   default="parquet", dest="fmt",
                   help="shard file format (jsonl writes deterministic "
                        "pos-sorted part files per shard chunk)")

    args = ap.parse_args(argv)

    if args.cmd == "review":  # driver-side only: no Ray session needed
        from dataclasses import asdict

        from .governance import review_rule_set, review_summary

        results = review_rule_set(_load_profile(args.profile).get("rules", []))
        for res in results:
            print(json.dumps({"ruleId": res.rule_id, "status": res.status,
                              "issues": [asdict(i) for i in res.issues]}))
        summary = review_summary(results)
        print(json.dumps(summary))
        return 0 if summary["exportable"] else 2

    _ensure_ray()

    if args.cmd == "validate":
        from .pipelines.checkpointed import run_checkpointed

        run = run_checkpointed(
            args.sf_dir, args.out, _load_profile(args.profile),
            replicas=args.replicas, resume=not args.no_resume,
            emit_details=args.emit_details, validation_mode=args.mode,
        )
        print(json.dumps(run))
    elif args.cmd == "suggest":
        from .pipelines.validate import fixture_paths
        from .sources.readers import read_documents
        from .stages.suggest import suggest_rules

        paths = fixture_paths(args.sf_dir, args.replicas)
        rows = (suggest_rules(read_documents(paths["docs"]))
                .to_pandas().sort_values(["kind", "rule_type", "param"])
                .to_dict("records"))
        for row in rows:
            print(json.dumps(row))
    elif args.cmd == "curate":
        import ray.data as rd

        from .pipelines.curation import curate_keep_list

        docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
        keep = curate_keep_list(
            docs, sample_rate=args.sample_rate,
            jaccard_threshold=args.jaccard_threshold,
        )
        keep.write_parquet(args.out)  # streaming sink, one file per block
        import pyarrow.parquet as pq

        n = pq.ParquetDataset(args.out).read(columns=["doc_id"]).num_rows
        print(json.dumps({"out": args.out, "kept": int(n)}))
    elif args.cmd == "quarantine":
        from .pipelines.validate import quarantine_split

        out = quarantine_split(
            args.sf_dir, args.out, _load_profile(args.profile),
            replicas=args.replicas, validation_mode=args.mode)
        counts = {("quarantined" if r["quarantined"] else "clean"):
                  r["count()"] for r in
                  out.groupby("quarantined").count().take_all()}
        print(json.dumps({"out": args.out,
                          "clean": int(counts.get("clean", 0)),
                          "quarantined": int(counts.get("quarantined", 0))}))
    elif args.cmd == "impact":
        from .pipelines.profiles import profile_diff
        from .pipelines.validate import profile_impact

        old = _load_profile(args.old_profile)
        new = _load_profile(args.new_profile)
        print(json.dumps({"diff": profile_diff(old, new)}))
        # the impact stream is bounded by the CHANGED rules' violations, so
        # materializing it for the count summary + row sample is safe
        m = profile_impact(args.sf_dir, old, new,
                           replicas=args.replicas).materialize()
        summary = {r["change"]: r["count()"] for r in
                   m.groupby("change").count().take_all()}
        print(json.dumps({"introduced": int(summary.get("introduced", 0)),
                          "resolved": int(summary.get("resolved", 0))}))
        for row in m.limit(args.limit).take_all():
            print(json.dumps(row, default=str))
    elif args.cmd == "export":
        import ray.data as rd

        from .pipelines.export import export_training_shards
        from .stages.sampling import SPLIT_BANDS

        docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
        manifest = export_training_shards(
            docs, args.out, n_shards=args.n_shards,
            sample_rate=args.sample_rate,
            jaccard_threshold=args.jaccard_threshold,
            split_bands=SPLIT_BANDS if args.split else None,
            fmt=args.fmt,
        )
        print(json.dumps(manifest))
    else:
        from .pipelines.validate import validation_response

        resp = validation_response(
            args.sf_dir, _load_profile(args.profile),
            max_errors=args.max_errors, validation_mode=args.mode,
        )
        print(json.dumps(resp, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
