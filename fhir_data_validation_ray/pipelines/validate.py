"""Flagship validation pipeline: read -> fused validator -> cross-doc stages
-> violations + summary. All stages stream; nothing materializes the corpus.

Stage map (SURVEY.md §7.1):
    Stage A  map_batches(ValidatorActor)        intra-document (no shuffle)
    Stage B  uniqueness groupby + registry join  cross-document (shuffles)
    Stage D  summary aggregate                   small result
"""

from __future__ import annotations

import os
from typing import Any

from ..sources.generator import ensure_fixtures, ensure_fixtures_scaled
from ..sources.readers import read_documents, registry_keys_numpy
from ..stages.uniqueness import uniqueness_violations
from ..stages.validator import validate_dataset
from .profiles import default_profile


def fixture_paths(sf_dir: str, replicas: int = 1) -> dict[str, str]:
    if replicas > 1:
        fx = ensure_fixtures_scaled(sf_dir, replicas)
        return {
            "docs": os.path.join(fx, "docs_spans"),
            "flat": "",
            "registry": os.path.join(fx, "registry.parquet"),
        }
    fx = ensure_fixtures(sf_dir, replicas)
    return {
        "docs": os.path.join(fx, "docs_spans.parquet"),
        "flat": os.path.join(fx, "spans_flat.parquet"),
        "registry": os.path.join(fx, "registry.parquet"),
    }


def run_validation(
    sf_dir: str,
    profile_obj: dict[str, Any] | None = None,
    *,
    replicas: int = 1,
    with_uniqueness: bool = True,
    batch_size: int = 4096,
    concurrency=None,
    emit_details: bool = True,
    validation_mode: str = "standard",
):
    """Returns the violations Dataset for one scale-factor directory.
    ``validation_mode``: "standard" (blocking checks only, default) or
    "full"/"debug" (adds the advisory spec-hint/heuristic rule layer —
    identical blocking decisions, ``Models/ValidationRequest.cs:76-97``)."""
    paths = fixture_paths(sf_dir, replicas)
    docs = read_documents(paths["docs"])
    profile_obj = profile_obj or default_profile()
    reg = registry_keys_numpy(paths["registry"])
    violations = validate_dataset(
        docs,
        profile_obj,
        registry_keys=reg,
        batch_size=batch_size,
        concurrency=concurrency,
        emit_details=emit_details,
        validation_mode=validation_mode,
    )
    if with_uniqueness:
        # separate column-pruned scan: the uniqueness pass never decodes spans
        ids_only = read_documents(paths["docs"], columns=["doc_id"])
        violations = violations.union(uniqueness_violations(ids_only))
    if validation_mode == "debug" and emit_details:
        # reference dev behavior: details payloads are schema-checked at
        # emission and violations throw (details_contract.py)
        from ..details_contract import enforce_details_contract

        violations = enforce_details_contract(violations)
    return violations


def with_stage_rank(violations):
    """Add the pipeline-stage rank column so any consumer can reproduce the
    reference's deterministic error order (``docs/05_validation_pipeline.md:
    20-31``) with ``ds.sort(["doc_id", "stage_rank", "span_index", "rule_id"])``
    — no global sort is needed for correctness (SURVEY.md §2.7)."""
    import numpy as np
    import pyarrow as pa

    from .. import errors as E

    ranks = E.SOURCE_STAGE_RANK

    def add_rank(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        da = pc.dictionary_encode(src)
        lut = np.array(
            [ranks.get(s, 99) for s in da.dictionary.to_pylist()], dtype=np.int32
        )
        return t.append_column(
            "stage_rank", pa.array(lut[np.asarray(da.indices)], pa.int32())
        )

    return violations.map_batches(add_rank, batch_format="pyarrow")


def validation_response(
    sf_dir: str,
    profile_obj: dict[str, Any] | None = None,
    *,
    replicas: int = 1,
    max_errors: int = 100,
    validation_mode: str = "standard",
) -> dict[str, Any]:
    """The ``ValidationResponse`` analogue (``Models/ValidationResponse.cs:
    9-85``): errors sample + summary counts + metadata + the IsValid verdict
    (``Playground.Api/Controllers/ValidateController.cs:69``: no error-severity
    rows). Corpus-level: the summary aggregates stream, only ``max_errors``
    violation rows materialize."""
    import time

    t0 = time.perf_counter()
    profile_obj = profile_obj or default_profile()
    # materialize: the summary aggregate AND the bounded error sample both
    # consume the stream — on a lazy Dataset the second consumption would
    # re-run the whole validation (the collect_table double-execution
    # lesson applied at the consumer level). The violations stream is the
    # result set; the object store spills it if large.
    violations = run_validation(sf_dir, profile_obj, replicas=replicas,
                                validation_mode=validation_mode).materialize()
    summary = summarize(violations)
    errors = violations.limit(max_errors).to_pandas().to_dict("records")
    # render authored message templates into the bounded error sample
    # (``Services/MessageTokenResolver.cs:16-141``; tokens resolve from
    # rule metadata, so rendering happens once per sampled row, never in
    # the streaming hot path)
    templates = {r["id"]: r for r in profile_obj.get("rules", [])
                 if r.get("message")}
    if templates:
        from ..explain import resolve_message_tokens

        for e in errors:
            rule = templates.get(e.get("rule_id"))
            if rule is not None:
                e["message"] = resolve_message_tokens(rule["message"], rule)
    # navigation breadcrumbs for the bounded sample (the playground UI
    # derives these client-side from path/jsonPointer —
    # ``frontend/src/utils/smartPathFormatting.ts``; a data-native response
    # has no client, so it carries them; once per sampled row, never in
    # the streaming hot path)
    from ..explain import (
        format_breadcrumb,
        pointer_full_path,
        pointer_jsonpath,
        scoped_path,
    )

    for e in errors:
        e["navigation"] = {
            "breadcrumb": format_breadcrumb(e.get("path") or ""),
            "scopedPath": scoped_path(e.get("path") or ""),
            "fullJsonPath": pointer_full_path(e.get("json_pointer") or ""),
            "jsonPath": pointer_jsonpath(e.get("json_pointer") or ""),
        }
    n_error = int(summary.loc[summary["severity"] == "error", "n"].sum())
    n_warning = int(summary.loc[summary["severity"] == "warning", "n"].sum())
    suggestions = None
    if validation_mode == "debug":
        # Step-8 analogue: system rule suggestions, debug mode only
        # (``Core/ValidationPipeline.cs:432-456``,
        # ``Models/ValidationResponse.cs:29-33``). Result is bounded by
        # (kinds x detectors); safe to collect.
        from ..stages.suggest import suggest_rules

        paths = fixture_paths(sf_dir, replicas)
        suggestions = (suggest_rules(read_documents(paths["docs"]))
                       .to_pandas().sort_values(["kind", "rule_type", "param"])
                       .to_dict("records"))
    return {
        "isValid": n_error == 0,
        "errors": errors,
        "suggestions": suggestions,
        "summary": {
            "totalErrors": n_error,
            "totalWarnings": n_warning,
            "bySeveritySource": summary.to_dict("records"),
        },
        "metadata": {
            "rulesVersion": str(profile_obj.get("version", "1.0")),
            "validationMode": validation_mode,
            "engine": "fhir_data_validation_ray",
            "processingTimeMs": round((time.perf_counter() - t0) * 1000, 1),
        },
    }


def summarize(violations):
    """Summary counts by (severity, source) — the ValidationSummary analogue
    (``Core/ValidationPipeline.cs:755-770``). Small result; safe to collect."""
    from ray.data.aggregate import Count

    return (
        violations.groupby(["severity", "source"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["severity", "source"])
        .reset_index(drop=True)
    )


def _doc_content_hashes(t):
    """Order-sensitive 64-bit content hash per document over its spans:
    each span hashes its (kind, text, media_ref, offset, in-doc position)
    fields FNV-joined, and the doc hash is the XOR of its position-salted
    span hashes (position salting makes plain XOR order-sensitive). Zero-
    span docs hash to 0. Vectorized — no Python loop over docs or spans."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import hash_str

    spans = t["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    n = len(spans)
    lens = pc.list_value_length(spans).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    out = np.zeros(n, dtype=np.uint64)
    flat = pc.list_flatten(spans)
    if len(flat) == 0:
        return out
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = np.arange(len(flat), dtype=np.int64) - starts[parent]
    joined = pc.binary_join_element_wise(
        pc.cast(pc.struct_field(flat, "kind"), pa.string()).fill_null(""),
        pc.cast(pc.struct_field(flat, "text"), pa.string()).fill_null(""),
        pc.cast(pc.struct_field(flat, "media_ref"), pa.string()).fill_null(""),
        pc.cast(pc.struct_field(flat, "offset"), pa.string()).fill_null(""),
        pa.array(pos.astype("U"), pa.string()),
        "\x1f",
    )
    h = hash_str(joined.to_numpy(zero_copy_only=False))
    np.bitwise_xor.at(out, parent, h)
    return out


def incremental_revalidate(old_docs, new_docs, profile_obj=None, *,
                           registry_keys=None, num_buckets: int = 64,
                           max_churn_broadcast: int = 5_000_000,
                           validation_mode: str = "standard"):
    """Incremental ingest revalidation: diff two spans-corpus snapshots by
    per-doc content hash, then validate ONLY the churn (added + changed
    docs of the new snapshot) — the composition that makes a daily 0.1%
    delta on a 100 TB corpus cost 0.1%, not a full revalidation. Removed
    docs emit nothing (drop their old violations by doc_id downstream).

    Scale shape: the diff is one role-tagged (bucket, doc_id, hash)
    exchange — 8-byte hashes, never spans. The churn ID SET (bounded by the
    delta, not the corpus) broadcasts once via ``ray.put`` for an exact
    string ``is_in`` filter; a delta past ``max_churn_broadcast`` raises —
    at that churn a full revalidation is the honest plan.

    Returns the violations Dataset over the churn docs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..functions.collect import collect_table
    from ..functions.hashing import hash_str

    def tag(role: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            istr = ids.to_numpy(zero_copy_only=False).astype("U")
            return pa.table({
                "bucket": pa.array(
                    (hash_str(istr) % np.uint64(num_buckets)).astype(np.int32)),
                "doc_id": ids,
                "h": pa.array(_doc_content_hashes(t).astype(np.int64)),
                "role": pa.array(np.full(len(ids), role, dtype=np.int8)),
            })

        return f

    def churn(g: pa.Table) -> pa.Table:
        ids = g["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        da = pc.dictionary_encode(ids)
        code = np.asarray(da.indices, dtype=np.int64)
        role = np.asarray(g["role"]).astype(np.int64)
        h = np.asarray(g["h"]).astype(np.int64)
        k = len(da.dictionary)
        has = np.zeros((2, k), dtype=bool)
        hv = np.zeros((2, k), dtype=np.int64)
        has[role, code] = True
        hv[role, code] = h
        keep = has[1] & (~has[0] | (hv[0] != hv[1]))
        return pa.table({"doc_id": da.dictionary.filter(pa.array(keep))})

    diff = (old_docs.map_batches(tag(0), batch_format="pyarrow")
            .union(new_docs.map_batches(tag(1), batch_format="pyarrow"))
            .groupby("bucket").map_groups(churn, batch_format="pyarrow"))
    churn_tbl = collect_table(
        diff, empty_schema=pa.schema([("doc_id", pa.string())]))
    if churn_tbl.num_rows > max_churn_broadcast:
        raise RuntimeError(
            f"incremental_revalidate: churn {churn_tbl.num_rows} exceeds "
            f"max_churn_broadcast={max_churn_broadcast}; run a full "
            "revalidation instead")
    ids_col = churn_tbl["doc_id"]
    if isinstance(ids_col, pa.ChunkedArray):
        ids_col = ids_col.combine_chunks()
    churn_ref = ray.put(ids_col)

    def keep_churn(t: pa.Table) -> pa.Table:
        vs = ray.get(churn_ref)
        if len(vs) == 0:
            return t.slice(0, 0)
        return t.filter(pc.is_in(t["doc_id"], value_set=vs))

    delta = new_docs.map_batches(keep_churn, batch_format="pyarrow")
    return validate_dataset(
        delta, profile_obj or default_profile(), registry_keys=registry_keys,
        validation_mode=validation_mode)


IMPACT_SCHEMA_COLS = ("change", "doc_id", "span_index", "rule_id",
                      "error_code", "severity", "n_before", "n_after")


def profile_impact(sf_dir: str, old_obj: dict, new_obj: dict, *,
                   replicas: int = 1, validation_mode: str = "standard",
                   num_buckets: int = 64):
    """What a profile change DOES to the corpus: the multiset diff of
    violations between two profile versions — ``resolved`` rows the old
    profile emitted that the new one doesn't, ``introduced`` rows the new
    one adds. The question every rule author asks before publishing
    ("what does this change break?"), answered at corpus scale.

    Plan: ``profiles.profile_diff`` names the rule ids whose emissions can
    differ; each side validates ONLY those rules (rule lanes are
    per-rule independent, pinned by the restricted-equals-full identity
    test) and filters its stream to them, so the diff exchange is bounded
    by the CHANGED rules' violations, not the corpus. If structural
    settings changed (settings / allowedKinds), both sides fall back to
    full runs and diff everything — still bounded by total violations.
    Both streams are pre-aggregated per batch to (key, count) rows, hashed
    into buckets, and compared per bucket; nothing corpus-sized touches
    the driver. Returns Dataset[change, doc_id, span_index, rule_id,
    error_code, severity, n_before, n_after] with n_before != n_after.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    import numpy as np

    from ..functions.hashing import hash_str
    from .profiles import profile_diff, restrict_profile

    d = profile_diff(old_obj, new_obj)
    structural = bool(d["settings_changed"])
    old_ids, new_ids = set(d["impacted_old"]), set(d["impacted_new"])

    empty = pa.table({
        "change": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.string()),
        "span_index": pa.array([], pa.int32()),
        "rule_id": pa.array([], pa.string()),
        "error_code": pa.array([], pa.string()),
        "severity": pa.array([], pa.string()),
        "n_before": pa.array([], pa.int64()),
        "n_after": pa.array([], pa.int64()),
    })
    if not structural and not old_ids and not new_ids:
        return rd.from_arrow(empty)

    def side(profile: dict, ids: set[str] | None, role: int):
        # details are dropped by prep's column selection — never render them
        v = run_validation(sf_dir, profile, replicas=replicas,
                           with_uniqueness=False, emit_details=False,
                           validation_mode=validation_mode)

        def prep(t: pa.Table) -> pa.Table:
            if ids is not None and t.num_rows:
                rid = t["rule_id"]
                if isinstance(rid, pa.ChunkedArray):
                    rid = rid.combine_chunks()
                # explicit string type: an EMPTY id set otherwise builds a
                # null-typed value_set and pc.is_in raises ArrowTypeError
                # (purely-additive or purely-subtractive profile changes)
                t = t.filter(pc.is_in(
                    rid, value_set=pa.array(sorted(ids), pa.string())))
            key = t.select(["doc_id", "span_index", "rule_id",
                            "error_code", "severity"])
            agg = pa.TableGroupBy(key, key.column_names).aggregate(
                [([], "count_all")])
            comp = pc.binary_join_element_wise(
                agg["doc_id"].cast(pa.string()),
                agg["span_index"].cast(pa.string()),
                agg["rule_id"].cast(pa.string()),
                agg["error_code"].cast(pa.string()),
                agg["severity"].cast(pa.string()), "\x1f")
            cu = comp.combine_chunks() if isinstance(comp, pa.ChunkedArray) else comp
            ks = cu.to_numpy(zero_copy_only=False).astype("U")
            return pa.table({
                "bucket": pa.array(
                    (hash_str(ks) % np.uint64(num_buckets)).astype(np.int32)),
                "doc_id": agg["doc_id"],
                "span_index": agg["span_index"].cast(pa.int32()),
                "rule_id": agg["rule_id"],
                "error_code": agg["error_code"],
                "severity": agg["severity"],
                "cnt": agg["count_all"].cast(pa.int64()),
                "role": pa.array(np.full(agg.num_rows, role, np.int8)),
            })

        return v.map_batches(prep, batch_format="pyarrow")

    if structural:
        before, after = side(old_obj, None, 0), side(new_obj, None, 1)
    else:
        before = side(restrict_profile(old_obj, old_ids), old_ids, 0)
        after = side(restrict_profile(new_obj, new_ids), new_ids, 1)

    def diff_group(g: pa.Table) -> pa.Table:
        comp = pc.binary_join_element_wise(
            g["doc_id"].combine_chunks() if isinstance(g["doc_id"], pa.ChunkedArray) else g["doc_id"],
            g["span_index"].cast(pa.string()),
            g["rule_id"].cast(pa.string()),
            g["error_code"].cast(pa.string()),
            g["severity"].cast(pa.string()), "\x1f")
        if isinstance(comp, pa.ChunkedArray):
            comp = comp.combine_chunks()
        da = comp.dictionary_encode()
        code = np.asarray(da.indices, dtype=np.int64)
        k = len(da.dictionary)
        role = np.asarray(g["role"]).astype(np.int64)
        cnt = np.asarray(g["cnt"]).astype(np.int64)
        n = np.zeros((2, k), np.int64)
        np.add.at(n, (role, code), cnt)
        keep = n[0] != n[1]
        if not keep.any():
            return empty
        # first occurrence row per key: min row position (init +inf, min-fold)
        first = np.full(k, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(first, code, np.arange(len(code), dtype=np.int64))
        sel = first[keep]
        take = pa.array(sel)
        nb, na = n[0][keep], n[1][keep]
        return pa.table({
            "change": pa.array(np.where(na > nb, "introduced", "resolved")),
            "doc_id": g["doc_id"].take(take),
            "span_index": g["span_index"].take(take).cast(pa.int32()),
            "rule_id": g["rule_id"].take(take),
            "error_code": g["error_code"].take(take),
            "severity": g["severity"].take(take),
            "n_before": pa.array(nb),
            "n_after": pa.array(na),
        })

    return (before.union(after)
            .groupby("bucket")
            .map_groups(diff_group, batch_format="pyarrow"))


def blocking_doc_ids(violations, *, num_buckets: int = 64):
    """Dataset[doc_id, n_blocking]: documents with >=1 ERROR-severity
    violation — the doc-level pass/fail verdict stream. Per-batch
    pre-aggregated (doc_id, count) partials, one bucketed groupby; the
    exchange carries per-batch-distinct failing doc ids, never the
    violation stream."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import numpy as np

    from ..functions.hashing import hash_str

    def partial(t: pa.Table) -> pa.Table:
        sev = t["severity"]
        if isinstance(sev, pa.ChunkedArray):
            sev = sev.combine_chunks()
        t = t.filter(pc.equal(sev, "error"))
        agg = pa.TableGroupBy(t.select(["doc_id"]), "doc_id").aggregate(
            [([], "count_all")])
        ids = agg["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        u = ids.to_numpy(zero_copy_only=False).astype("U")
        return pa.table({
            "bucket": pa.array(
                (hash_str(u) % np.uint64(num_buckets)).astype(np.int32)),
            "doc_id": agg["doc_id"],
            "n": agg["count_all"].cast(pa.int64()),
        })

    def fold(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g.select(["doc_id", "n"]), "doc_id").aggregate(
            [("n", "sum")])
        return pa.table({"doc_id": agg["doc_id"],
                         "n_blocking": agg["n_sum"].cast(pa.int64())})

    return (violations.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").map_groups(fold, batch_format="pyarrow"))


def quarantine_split(sf_dir: str, out_dir: str | None = None,
                     profile_obj: dict | None = None, *, replicas: int = 1,
                     validation_mode: str = "standard",
                     num_buckets: int = 64):
    """Doc-level quarantine: validate, then split the corpus into CLEAN
    documents (no error-severity violation) and QUARANTINED ones — the
    ingest gate a production pipeline runs before letting a batch reach
    training or storage. Uniqueness is a corpus-level check, not a per-doc
    verdict, and is excluded (same scope as the summary/oracle union).

    The failing-id stream meets the documents in ONE bucketed exchange
    keyed by FNV(doc_id) with STRING verification inside the group (no
    hash-collision quarantining); document payloads shuffle once — the
    unavoidable cost of materializing the split. Returns a Dataset of the
    input schema plus ``quarantined`` (bool) and ``n_blocking`` (int64);
    with ``out_dir`` it also writes ``quarantine=true|false`` partitioned
    parquet and returns the same Dataset."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import numpy as np

    from ..functions.hashing import hash_str
    from ..sources.generator import SPAN_TYPE

    paths = fixture_paths(sf_dir, replicas)
    docs = read_documents(paths["docs"])
    # the verdict fold reads only (doc_id, severity) — never render details
    v = run_validation(sf_dir, profile_obj, replicas=replicas,
                       with_uniqueness=False, emit_details=False,
                       validation_mode=validation_mode)
    bad = blocking_doc_ids(v, num_buckets=num_buckets)

    spans_t = pa.list_(SPAN_TYPE)

    def tag_docs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        u = ids.to_numpy(zero_copy_only=False).astype("U")
        return pa.table({
            "bucket": pa.array(
                (hash_str(u) % np.uint64(num_buckets)).astype(np.int32)),
            "doc_id": ids,
            "spans": spans,
            "n": pa.array(np.full(len(u), -1, np.int64)),  # -1 = doc row
        })

    def tag_bad(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        u = ids.to_numpy(zero_copy_only=False).astype("U")
        return pa.table({
            "bucket": pa.array(
                (hash_str(u) % np.uint64(num_buckets)).astype(np.int32)),
            "doc_id": ids,
            "spans": pa.nulls(len(u), spans_t),
            "n": np.asarray(t["n_blocking"]).astype(np.int64),
        })

    def gate(g: pa.Table) -> pa.Table:
        n = np.asarray(g["n"]).astype(np.int64)
        ids = g["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        u = ids.to_numpy(zero_copy_only=False).astype("U")
        doc_rows = n < 0
        bad_ids, bad_n = u[~doc_rows], n[~doc_rows]
        order = np.argsort(bad_ids, kind="stable")
        bad_ids, bad_n = bad_ids[order], bad_n[order]
        du = u[doc_rows]
        if len(bad_ids):
            pos = np.clip(np.searchsorted(bad_ids, du), 0, len(bad_ids) - 1)
            hit = bad_ids[pos] == du            # string-verified, not hash
            nb = np.where(hit, bad_n[pos], 0)
        else:
            hit = np.zeros(len(du), bool)
            nb = np.zeros(len(du), np.int64)
        take = pa.array(np.flatnonzero(doc_rows))
        spans = g["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        return pa.table({
            "doc_id": ids.take(take),
            "spans": spans.take(take),
            "quarantined": pa.array(hit),
            "n_blocking": pa.array(nb.astype(np.int64)),
        })

    out = (docs.map_batches(tag_docs, batch_format="pyarrow")
           .union(bad.map_batches(tag_bad, batch_format="pyarrow"))
           .groupby("bucket").map_groups(gate, batch_format="pyarrow"))
    if out_dir is not None:
        def add_part(t: pa.Table) -> pa.Table:
            q = t["quarantined"]
            if isinstance(q, pa.ChunkedArray):
                q = q.combine_chunks()
            part = pc.if_else(q, "true", "false")
            return t.append_column("quarantine", part)

        # materialize before the sink so a consumer reusing the returned
        # Dataset (counts, filters) never re-runs the validation
        out = out.map_batches(add_part, batch_format="pyarrow").materialize()
        out.write_parquet(out_dir, partition_cols=["quarantine"])
    return out
