"""Deterministic interleaved-document fixture generator.

Synthesizes the ``input_hint`` table shape — ``(doc_id: string, spans:
list<struct<kind,text,media_ref,offset>>)`` — from the driver-provided
``documents.parquet`` doc_ids of a scale-factor directory. Fully
deterministic: every span attribute derives from splitmix64 mixes of
``crc32(doc_id)``, so generation is order-independent, replica-stable and
reproducible across processes (FIXTURES.md generation rules, seed-free by
construction).

Three parquet outputs per (sf_dir, replicas) cache key under /tmp:

- ``docs_spans.parquet``   nested table (the engine input)
- ``spans_flat.parquet``   exploded view (doc_id, span_index, kind, text,
                           media_ref, offset) — the DuckDB oracle input
- ``registry.parquet``     media registry (media_ref, kind) — referential-
                           integrity small side (FIXTURES.md §2)

Injected defect rates (all hash-gated, hence deterministic) exercise every
rule kernel: missing/whitespace Patient text, bad NRIC patterns, status
values outside the allowed set, unknown codes / wrong code systems, dangling
local and registry refs, claimed-kind mismatches, out-of-range span counts,
bad doc_id grammar, duplicate doc_ids, non-monotonic offsets, one hot
registry key (skew), and undeclared span kinds.
"""

from __future__ import annotations

import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

GENERATOR_VERSION = "g14"
FIXTURE_ROOT = "/tmp/graft_fixtures"

KINDS = ("Patient", "Observation", "Coding", "Encounter", "text", "image", "audio",
         "Question", "Screening", "date", "dateTime", "uri")
ALLOWED_KINDS = KINDS  # profile enum binding; "Unknown" is injected as a violation

_MASK = (1 << 64) - 1


def _mix(*vals: int) -> int:
    """splitmix64 over a combined seed — the only randomness source."""
    x = 0
    for v in vals:
        x = (x * 0x9E3779B97F4A7C15 + v + 1) & _MASK
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & _MASK
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & _MASK
    return (x ^ (x >> 31)) & _MASK


SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])
FLAT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_index", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
REGISTRY_SCHEMA = pa.schema([("media_ref", pa.string()), ("kind", pa.string())])

_NRIC_VALID = ["S1234567A", "T7654321B", "F2468013C", "G1357924D", "S9876543E"]
_NRIC_BAD = ["s1234567A", "S123456A", "X1234567A", "S12345678", "1234567AS"]
_STATUSES = ["final"] * 60 + ["amended"] * 25 + ["preliminary"] * 9 + ["cancelled"] * 6
_CODES = (
    ["EN"] * 45 + ["MS"] * 25 + ["TA"] * 15
    + ["XX"] * 5
    + ["https://example.org/cs/language|EN"] * 5
    + ["wrong-sys|MS"] * 3
    + ["https://example.org/cs/language|ZZ"] * 2
)
_WORDS = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")

# Primitive-grammar span payloads (kinds date / dateTime / uri). "Valid"
# means valid for the kind's namesake primitive; the uri pool mixes values
# whose url/canonical validity differs so the three grammars are separable.
# "2021-13" is deliberately in the VALID date pool — the reference's
# ValidateDate calendar-checks only length-10 values
# (``JsonNodeStructuralValidator.cs:738-754``).
_DATE_VALID = ["2021-03-14", "1999-12-31", "2020-02-29", "2024", "2024-06", "2021-13"]
_DATE_BAD = ["2021-02-30", "2021-13-05", "21-01-01", "2021/01/01", "2021-04-31",
             "not-a-date"]
_DT_VALID = ["2021-03-14T08:30:00Z", "2019-07-01T23:59:59.123+08:00", "2021-03-14",
             "2024-06", "2038-01-19T03:14:07-05:00"]
_DT_BAD = ["2021-03-14T24:00:00Z", "2021-03-14T08:30:00", "2021-02-30T08:30:00Z",
           "14-03-2021T08:30:00Z", "2021-03-14 08:30:00Z"]
_URI_VALID = ["https://example.org/fhir/Patient", "urn:oid:1.2.3.4", "Patient/123",
              "https://example.org/ValueSet/vs1|2.0.0", "ftp://files.example.org/x.bin",
              "https://example.org/vs|1|2", "https://example.org/vs|"]
_URI_BAD = ["http://example.org/a b", "", "bad\x01ref", "   "]


def registry_size(n_docs: int) -> int:
    return max(100, n_docs // 5)


def build_registry(n_docs: int) -> pa.Table:
    n = registry_size(n_docs)
    reg_kinds = ("image", "audio", "Document")
    refs = [f"urn:uuid:{_mix(9000, i):016x}" for i in range(n)]
    kinds = [reg_kinds[i % 3] for i in range(n)]
    return pa.table({"media_ref": refs, "kind": kinds}, schema=REGISTRY_SCHEMA)


def hot_registry_key() -> str:
    return f"urn:uuid:{_mix(9000, 0):016x}"


def gen_doc(base_id: str, replica: int, n_reg: int):
    """Generate one document's (doc_id, spans[]) deterministically."""
    did = base_id if replica == 0 else f"{base_id}.r{replica}"
    h = zlib.crc32(did.encode())

    # grammar-violating doc_id mutation (doc ids stay UNIQUE in the main
    # fixture — duplicates live in docs_dup.parquet so per-document SQL
    # oracles can group by doc_id)
    doc_id = did + "!" if h % 97 == 0 else did

    if h % 199 == 3:
        return doc_id, []  # ArrayLength min violation
    n = 110 if h % 211 == 7 else 1 + _mix(h, 1) % 12  # 110 > max=100

    spans = []
    offset = 0
    kinds = []
    for i in range(n):
        s = _mix(h, 17, i)
        if i == 0 and s % 100 < 85:
            kind = "Patient"
        elif s % 997 == 0:
            kind = "Unknown"  # enum violation
        else:
            r = _mix(s, 2) % 100
            kind = (
                "Patient" if r < 18 else "Observation" if r < 40 else "Coding" if r < 55
                else "Encounter" if r < 70 else "text" if r < 85 else "image" if r < 95
                else "audio"
            )
        kinds.append(kind)
        offset += 1 + _mix(s, 3) % 3
        spans.append([kind, None, "", offset])

    # texts
    for i, sp in enumerate(spans):
        s = _mix(h, 29, i)
        kind = sp[0]
        r = _mix(s, 5) % 100
        if kind == "Patient":
            if r < 90:
                sp[1] = _NRIC_VALID[s % len(_NRIC_VALID)]
            elif r < 95:
                sp[1] = _NRIC_BAD[s % len(_NRIC_BAD)]
            elif r < 98:
                sp[1] = None
            else:
                sp[1] = "   "
        elif kind == "Observation":
            sp[1] = None if r >= 95 else _STATUSES[s % len(_STATUSES)]
        elif kind == "Coding":
            sp[1] = None if r >= 98 else _CODES[s % len(_CODES)]
        elif kind == "Encounter":
            sp[1] = ("ambulatory" if r < 90 else "inpatient") if i == _first(kinds, "Encounter") else _WORDS[s % len(_WORDS)]
        elif kind == "text":
            sp[1] = "" if r < 8 else " ".join(
                _WORDS[_mix(s, 11, j) % len(_WORDS)] for j in range(1 + s % 6)
            )
        else:  # image / audio
            sp[1] = ""

    # media refs
    for i, sp in enumerate(spans):
        s = _mix(h, 41, i)
        kind = sp[0]
        r = _mix(s, 7) % 100
        if kind in ("image", "audio"):
            if r < 78:
                sp[2] = f"urn:uuid:{_mix(9000, s % n_reg):016x}"
            elif r < 86:
                sp[2] = hot_registry_key()  # skew: one hot key
            elif r < 92:
                sp[2] = f"urn:uuid:{_mix(4242, s):016x}"  # dangling external
            elif r < 94:
                sp[2] = f"not a valid ref {s % 100}!"  # grammar violation
            else:
                sp[2] = ""
        elif kind in ("Patient", "Observation", "Encounter") and n > 1 and r < 25:
            t = _mix(s, 13) % n  # target span position
            rr = _mix(s, 19) % 100
            if rr < 80:
                sp[2] = f"{spans[t][0]}/{doc_id}.{spans[t][3]}"  # resolves
            elif rr < 90:
                tkind = spans[t][0]
                ki = KINDS.index(tkind) if tkind in KINDS else 0
                wrong = KINDS[(ki + 1) % len(KINDS)]  # always != tkind
                sp[2] = f"{wrong}/{doc_id}.{spans[t][3]}"  # type mismatch
            elif rr < 96:
                sp[2] = f"{spans[t][0]}/{doc_id}.9999"  # dangling local
            else:
                sp[2] = f"Patient/doc.extern.{s % 7}.3"  # other-document ref
        else:
            sp[2] = ""

    # question/answer spans (text = "<qcode>=<answer>"), appended after the
    # base spans so base-span indices/targets are untouched; ~10% defect rate
    # exercising every QuestionAnswer error path
    nq = _mix(h, 61) % 4
    for i in range(nq):
        s = _mix(h, 67, i)
        offset += 1 + _mix(s, 3) % 3
        spans.append(["Question", _gen_qa_text(s), "", offset])

    # CodeMaster screening spans (text = "<screening>|<question>=<answer>")
    ns = _mix(h, 71) % 3
    for i in range(ns):
        s = _mix(h, 73, i)
        offset += 1 + _mix(s, 3) % 3
        spans.append(["Screening", _gen_cm_text(s), "", offset])

    # primitive-grammar spans (kinds date / dateTime / uri), ~12% defect rate
    for kname, tag, good, bad in (
        ("date", 83, _DATE_VALID, _DATE_BAD),
        ("dateTime", 87, _DT_VALID, _DT_BAD),
        ("uri", 89, _URI_VALID, _URI_BAD),
    ):
        for i in range(_mix(h, tag) % 3):
            s = _mix(h, tag, i)
            pool = bad if _mix(s, 5) % 100 < 12 else good
            offset += 1 + _mix(s, 3) % 3
            spans.append([kname, pool[_mix(s, 7) % len(pool)], "", offset])

    # offset-order violation: swap first two offsets
    if h % 157 == 11 and len(spans) >= 2:
        spans[0][3], spans[1][3] = spans[1][3], spans[0][3]

    return doc_id, [tuple(sp) for sp in spans]


_QA_SEVERITY_CODES = ("mild", "moderate", "severe")
_QA_MULTI = ("a", "b", "c")


def _gen_qa_text(s: int) -> str:
    """One deterministic 'code=answer' QA payload; s selects question + defect."""
    q = _mix(s, 5) % 9
    bad = _mix(s, 7) % 100 < 10
    if q == 0:  # boolean
        return "Q1=" + (("yes" if _mix(s, 9) % 2 else "maybe") if bad
                        else ("true" if _mix(s, 9) % 2 else "false"))
    if q == 1:  # integer range [0,120]
        return "Q2=" + (("150" if _mix(s, 9) % 2 else "abc") if bad
                        else str(_mix(s, 9) % 121))
    if q == 2:  # code, required binding
        if bad:
            return "Q3=" + ("unknownx" if _mix(s, 9) % 2 else "mild,severe")
        return "Q3=" + _QA_SEVERITY_CODES[_mix(s, 9) % 3]
    if q == 3:  # string pattern ^[A-Z]{2}[0-9]{4}$
        if bad:
            return "Q4=A1"
        a = chr(65 + _mix(s, 9) % 26) + chr(65 + _mix(s, 11) % 26)
        return f"Q4={a}{1000 + _mix(s, 13) % 9000}"
    if q == 4:  # multi-valued code
        if bad:
            return "Q5=a,z"
        k = 1 + _mix(s, 9) % 2
        return "Q5=" + ",".join(_QA_MULTI[(_mix(s, 11) + j) % 3] for j in range(k))
    if q == 5:  # decimal range [0,40.5]
        return "Q6=" + ("99.9" if bad else f"{_mix(s, 9) % 40}.{_mix(s, 11) % 10}")
    if q == 6:  # code, EXTENSIBLE binding -> warning on miss
        return "Q7=" + ("zz" if bad else ("x" if _mix(s, 9) % 2 else "y"))
    if q == 7:  # quantity "<value> <unit>", unit mg, range [0, 10]
        if bad:  # wrong unit / out of range / non-numeric / missing unit
            return "Q8=" + ("5 kg", "15 mg", "abc mg", "5")[_mix(s, 9) % 4]
        return f"Q8={_mix(s, 9) % 10}.{_mix(s, 11) % 10} mg"
    # unknown question code
    return "Q9=whatever"


def _gen_cm_text(s: int) -> str:
    """One deterministic CodeMaster screening payload; ~10% defect rate
    across unknown-screening / unknown-question / bad-answer /
    multi-on-single / bad-multi-element paths."""
    r = _mix(s, 5) % 100
    if r < 2:
        return "SCR9|Q1=yes"                  # unknown screening
    if r < 4:
        return "SCR1|Q8=yes"                  # unknown question in screening
    if r < 6:
        return "SCR1|Q1=maybe"                # answer not allowed
    if r < 8:
        return "SCR1|Q1=yes,no"               # multiple answers, single-valued
    if r < 10:
        return "SCR1|Q2=a,z"                  # bad element in multi answer
    pick = _mix(s, 9) % 4
    if pick == 0:
        return "SCR1|Q1=" + ("yes" if _mix(s, 11) % 2 else "no")
    if pick == 1:
        k = 1 + _mix(s, 11) % 2
        return "SCR1|Q2=" + ",".join(("a", "b", "c")[(_mix(s, 13) + j) % 3] for j in range(k))
    if pick == 2:
        return "SCR2|Q3=" + ("low" if _mix(s, 11) % 2 else "high")
    return "SCR2|Q3=high"


def _first(kinds: list[str], k: str) -> int:
    try:
        return kinds.index(k)
    except ValueError:
        return -1


def _write_chunk(base_ids, replicas, n_reg):
    docs_ids, docs_spans = [], []
    flat = {k: [] for k in FLAT_SCHEMA.names}
    for bid in base_ids:
        for rep in range(replicas):
            doc_id, spans = gen_doc(bid, rep, n_reg)
            docs_ids.append(doc_id)
            docs_spans.append(
                [{"kind": k, "text": t, "media_ref": m, "offset": o} for k, t, m, o in spans]
            )
            for si, (k, t, m, o) in enumerate(spans):
                flat["doc_id"].append(doc_id)
                flat["span_index"].append(si)
                flat["kind"].append(k)
                flat["text"].append(t)
                flat["media_ref"].append(m)
                flat["offset"].append(o)
    nested = pa.table(
        {"doc_id": pa.array(docs_ids, pa.string()),
         "spans": pa.array(docs_spans, pa.list_(SPAN_TYPE))},
        schema=DOCS_SCHEMA,
    )
    flat_t = pa.table(
        {
            "doc_id": pa.array(flat["doc_id"], pa.string()),
            "span_index": pa.array(flat["span_index"], pa.int32()),
            "kind": pa.array(flat["kind"], pa.string()),
            "text": pa.array(flat["text"], pa.string()),
            "media_ref": pa.array(flat["media_ref"], pa.string()),
            "offset": pa.array(flat["offset"], pa.int32()),
        },
        schema=FLAT_SCHEMA,
    )
    return nested, flat_t


def _gen_part(args) -> str:
    """Worker for parallel generation: one replica range -> one parquet part."""
    sf_dir, out_part, rep_lo, rep_hi, n_reg = args
    base_ids = [
        f"doc.{v}"
        for v in pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    ]
    writer = pq.ParquetWriter(out_part, DOCS_SCHEMA)
    for rep in range(rep_lo, rep_hi):
        docs_ids, docs_spans = [], []
        for bid in base_ids:
            doc_id, spans = gen_doc(bid, rep, n_reg)
            docs_ids.append(doc_id)
            docs_spans.append(
                [{"kind": k, "text": t, "media_ref": m, "offset": o} for k, t, m, o in spans]
            )
        writer.write_table(
            pa.table(
                {"doc_id": pa.array(docs_ids, pa.string()),
                 "spans": pa.array(docs_spans, pa.list_(SPAN_TYPE))},
                schema=DOCS_SCHEMA,
            )
        )
    writer.close()
    return out_part


def ensure_fixtures_scaled(sf_dir: str, replicas: int, workers: int = 16) -> str:
    """Parallel variant for bench-scale fixtures (replicas > 1): writes a
    DIRECTORY of parquet parts (one per replica range) — the partitioned,
    resumable output layout — plus the registry. No flattened oracle view
    (bench doesn't need one)."""
    out = fixture_dir(sf_dir, replicas)
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out

    import concurrent.futures as cf
    import multiprocessing as mp

    n_base = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    n_docs = n_base * replicas
    n_reg = registry_size(n_docs)

    tmp = out + f".tmp.{os.getpid()}"
    parts_dir = os.path.join(tmp, "docs_spans")
    os.makedirs(parts_dir, exist_ok=True)

    step = max(1, replicas // workers)
    jobs = [
        (sf_dir, os.path.join(parts_dir, f"part-{lo:05d}.parquet"), lo, min(lo + step, replicas), n_reg)
        for lo in range(0, replicas, step)
    ]
    # spawn, not fork: forking a process that holds a live Ray session (e.g.
    # a pytest worker) deadlocks in Ray's internal threads
    with cf.ProcessPoolExecutor(
        max_workers=workers, mp_context=mp.get_context("spawn")
    ) as ex:
        list(ex.map(_gen_part, jobs))

    pq.write_table(build_registry(n_docs), os.path.join(tmp, "registry.parquet"))
    with open(os.path.join(tmp, ".complete"), "w") as f:
        f.write(GENERATOR_VERSION)
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


def fixture_dir(sf_dir: str, replicas: int = 1) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(FIXTURE_ROOT, f"{name}-x{replicas}-{GENERATOR_VERSION}")


def ensure_fixtures(sf_dir: str, replicas: int = 1, chunk_docs: int = 20_000) -> str:
    """Generate (or reuse cached) fixture parquet for one sf dir. Writes are
    atomic (temp dir + rename) so concurrent callers and interrupted runs are
    safe — the resumability contract in miniature."""
    out = fixture_dir(sf_dir, replicas)
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out

    base_ids = [
        f"doc.{v}"
        for v in pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    ]
    n_docs = len(base_ids) * replicas
    n_reg = registry_size(n_docs)

    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)

    nested_writer = pq.ParquetWriter(os.path.join(tmp, "docs_spans.parquet"), DOCS_SCHEMA)
    flat_writer = pq.ParquetWriter(os.path.join(tmp, "spans_flat.parquet"), FLAT_SCHEMA)
    dup_writer = pq.ParquetWriter(os.path.join(tmp, "docs_dup.parquet"), DOCS_SCHEMA)
    step = max(1, chunk_docs // max(replicas, 1))
    for lo in range(0, len(base_ids), step):
        nested, flat_t = _write_chunk(base_ids[lo : lo + step], replicas, n_reg)
        nested_writer.write_table(nested)
        flat_writer.write_table(flat_t)
        # docs_dup = main docs + a deterministic ~2% re-appended verbatim
        # (duplicate doc_ids) — input for the uniqueness groupby check
        dup_writer.write_table(nested)
        ids = nested.column("doc_id").to_pylist()
        sel = [i for i, d in enumerate(ids) if zlib.crc32(d.encode()) % 53 == 0]
        if sel:
            dup_writer.write_table(nested.take(sel))
    nested_writer.close()
    flat_writer.close()
    dup_writer.close()
    pq.write_table(build_registry(n_docs), os.path.join(tmp, "registry.parquet"))

    with open(os.path.join(tmp, ".complete"), "w") as f:
        f.write(GENERATOR_VERSION)
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # another process won the race
    return out
