"""System rule suggestions — stats-driven rule mining over the span corpus.

The data-native analogue of the reference's debug-mode suggestion layer
(``Authoring/SystemRuleSuggestionService.cs``, detectors
``RuleSuggestion/Detectors/RuleDetectors.cs``): observe per-kind value
distributions across the corpus and propose FixedValue / AllowedValues /
Required / Regex rules with confidence levels and support counts. The
reference analyses one uploaded bundle at a time; this version is the
corpus-scale generalization — the same detectors and thresholds, evaluated
over every document in one streaming pass.

Detectors and guards (thresholds mirror ``SystemRuleSuggestionService.cs:
33-38``):

- **FixedValue** (``:539-590``): >= 30 observed values, exactly 1 distinct
  -> FixedValue(value); confidence high past 50 samples, else medium.
- **AllowedValues** (``:599-660``): >= 10 observed values, 2..10 distinct,
  mean distinct-value length <= 100 (the "codes, not free text" guard)
  -> AllowedValues(sorted values); confidence medium.
- **Required** (``:731-770``): >= 5 spans of the kind, value present
  (non-null, non-whitespace) in EVERY one -> Required; high past 50.
- **Regex** (``Detectors/RuleDetectors.cs:13-80`` + the pattern registry
  analogue below): >= 3 observed values and case-insensitive coverage
  >= 80% (integer form ``5*n_match >= 4*n_values``) -> Regex(pattern name);
  high when coverage is total.

The instance-only blocklist (``:41-54``) maps to the free-text/media span
kinds — never suggest rules for them.

Scale shape: one streaming pass emits ONE pre-aggregated row per (batch,
kind): counts, per-pattern match counts, and the distinct-value set CAPPED
at MAX_ALLOWED_VALUES+1 with an overflow flag (union-then-cap keeps the
"<= 10 distinct" decision exact while bounding every partial). A single
``groupby("kind")`` merge emits the suggestion rows — the exchange is
O(kinds x batches) tiny rows; nothing corpus-sized moves. All outputs are
integers/strings so the DuckDB oracle (`c_suggest_rules`) matches bitwise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# thresholds: SystemRuleSuggestionService.cs:33-38
MIN_SAMPLE_FIXED = 30
HIGH_CONF = 50
MIN_SAMPLE_ALLOWED = 10
MAX_ALLOWED_VALUES = 10
MIN_REQUIRED = 5
MIN_SAMPLE_REGEX = 3
MAX_CODE_LEN = 100  # mean distinct length guard (":631-636")

# instance-only blocklist analogue (":41-54"): free-text / media kinds
SUGGEST_BLOCKLIST = ("text", "image", "audio")

# RegexPatternRegistry analogue — named, case-insensitively applied
# (RegexOptions.IgnoreCase at Detectors/RuleDetectors.cs:39)
PATTERN_REGISTRY: tuple[tuple[str, str], ...] = (
    ("nric", r"^[STFG]\d{7}[A-Z]$"),
    ("iso-date", r"^\d{4}-\d{2}-\d{2}$"),
    ("uuid-urn", r"^urn:uuid:[0-9a-f]{8,32}$"),
    ("http-url", r"^https?://\S+$"),
)

_ABSENT_RE = r"^\s*$"


def _span_kind_text(t: pa.Table) -> tuple[pa.Array, pa.Array]:
    spans = t["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    return pc.struct_field(flat, "kind"), pc.struct_field(flat, "text")


def _partials(t: pa.Table) -> pa.Table:
    kind, text = _span_kind_text(t)
    keep = pc.and_(
        pc.is_valid(kind),
        pc.invert(pc.is_in(kind, value_set=pa.array(SUGGEST_BLOCKLIST))),
    ).to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(keep)
    npat = len(PATTERN_REGISTRY)
    empty = pa.table({
        "kind": pa.array([], pa.string()),
        "n_spans": pa.array([], pa.int64()),
        "n_absent": pa.array([], pa.int64()),
        "vals": pa.array([], pa.list_(pa.string())),
        "overflow": pa.array([], pa.bool_()),
        **{f"m{i}": pa.array([], pa.int64()) for i in range(npat)},
    })
    if idx.size == 0:
        return empty
    kind = kind.take(pa.array(idx))
    text = text.take(pa.array(idx))
    dk = pc.dictionary_encode(kind)
    kc = np.asarray(dk.indices, dtype=np.int64)
    nk = len(dk.dictionary)
    absent = pc.or_kleene(
        pc.is_null(text), pc.match_substring_regex(text, _ABSENT_RE)
    ).fill_null(True).to_numpy(zero_copy_only=False)
    n_spans = np.bincount(kc, minlength=nk).astype(np.int64)
    n_absent = np.bincount(kc[absent], minlength=nk).astype(np.int64)

    # observed values: per-pattern occurrence match counts via the text
    # DICTIONARY (probe unique strings once, gather verdicts by code)
    obs = ~absent
    tv = text.filter(pa.array(obs))
    kv = kc[obs]
    dt = pc.dictionary_encode(tv)
    tc = np.asarray(dt.indices, dtype=np.int64)
    mcols = {}
    for i, (_, pat) in enumerate(PATTERN_REGISTRY):
        hit = pc.match_substring_regex(
            dt.dictionary, pat, ignore_case=True
        ).fill_null(False).to_numpy(zero_copy_only=False)
        mcols[f"m{i}"] = np.bincount(kv[hit[tc]], minlength=nk).astype(np.int64)

    # capped distinct-value set per kind: unique (kind, text-code) pairs,
    # keep the first MAX+1 per kind (cap detection only needs "more than
    # MAX"), overflow flag when a kind exceeds the cap
    ndict = len(dt.dictionary)
    pair = np.unique(kv * ndict + tc) if len(kv) else np.empty(0, np.int64)
    pk = pair // ndict
    runs = np.bincount(pk, minlength=nk)
    starts = np.zeros(nk, dtype=np.int64)
    np.cumsum(runs[:-1], out=starts[1:])
    rank = np.arange(len(pair), dtype=np.int64) - np.repeat(starts, runs)
    cap = MAX_ALLOWED_VALUES + 1
    kept = rank < cap
    kept_counts = np.minimum(runs, cap)
    bounds = np.zeros(nk + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=bounds[1:])
    vals = pa.ListArray.from_arrays(
        pa.array(bounds, pa.int32()),
        dt.dictionary.take(pa.array((pair % ndict)[kept])))
    return pa.table({
        "kind": dk.dictionary,
        "n_spans": pa.array(n_spans),
        "n_absent": pa.array(n_absent),
        "vals": vals,
        "overflow": pa.array(runs > MAX_ALLOWED_VALUES),
        **{k: pa.array(v) for k, v in mcols.items()},
    })


def _merge_kind(g: pa.Table) -> pa.Table:
    kind = str(g["kind"][0].as_py())
    n_spans = int(np.asarray(g["n_spans"]).sum())
    n_absent = int(np.asarray(g["n_absent"]).sum())
    n_values = n_spans - n_absent
    vl = g["vals"]
    if isinstance(vl, pa.ChunkedArray):
        vl = vl.combine_chunks()
    uniq = pc.unique(vl.flatten())
    overflow = (bool(np.asarray(g["overflow"]).any())
                or len(uniq) > MAX_ALLOWED_VALUES)
    npat = len(PATTERN_REGISTRY)
    m = [int(np.asarray(g[f"m{i}"]).sum()) for i in range(npat)]

    out: list[tuple[str, str, int, int, str]] = []
    if not overflow and n_values:
        vals = np.sort(np.asarray(uniq).astype("U"))
        if n_values >= MIN_SAMPLE_FIXED and len(vals) == 1:
            conf = "high" if n_values >= HIGH_CONF else "medium"
            out.append(("FixedValue", str(vals[0]), n_values, n_values, conf))
        elif (n_values >= MIN_SAMPLE_ALLOWED
              and 2 <= len(vals) <= MAX_ALLOWED_VALUES
              and sum(len(v) for v in vals) <= MAX_CODE_LEN * len(vals)):
            out.append(("AllowedValues", ",".join(vals),
                        n_values, n_values, "medium"))
    if n_spans >= MIN_REQUIRED and n_absent == 0:
        conf = "high" if n_spans >= HIGH_CONF else "medium"
        out.append(("Required", "", n_spans, n_spans, conf))
    if n_values >= MIN_SAMPLE_REGEX:
        for i, (name, _) in enumerate(PATTERN_REGISTRY):
            if 5 * m[i] >= 4 * n_values:
                conf = "high" if m[i] == n_values else "medium"
                out.append(("Regex", name, n_values, m[i], conf))
    return pa.table({
        "kind": pa.array([kind] * len(out), pa.string()),
        "rule_type": pa.array([o[0] for o in out], pa.string()),
        "param": pa.array([o[1] for o in out], pa.string()),
        "n_samples": pa.array([o[2] for o in out], pa.int64()),
        "n_match": pa.array([o[3] for o in out], pa.int64()),
        "confidence": pa.array([o[4] for o in out], pa.string()),
    })


def suggest_rules(docs, *, batch_size: int | None = None):
    """docs Dataset[(doc_id, spans)] -> suggestions Dataset[kind, rule_type,
    param, n_samples, n_match, confidence] (see module docstring)."""
    return (docs.map_batches(_partials, batch_format="pyarrow",
                             batch_size=batch_size)
            .groupby("kind")
            .map_groups(_merge_kind, batch_format="pyarrow"))


def suggestion_to_rule(row: dict, rule_id: str) -> dict:
    """Materialize one suggestion row as a profile rule dict — the
    round-trip surface (a suggested rule must compile and validate,
    ``SystemRuleSuggestionService.cs`` emits the same ready-to-apply
    shapes)."""
    kind, rt, param = row["kind"], row["rule_type"], row["param"]
    if rt == "FixedValue":
        return {"id": rule_id, "type": "FixedValue", "kind": kind,
                "fieldPath": "text", "params": {"value": param}}
    if rt == "AllowedValues":
        return {"id": rule_id, "type": "AllowedValues", "kind": kind,
                "fieldPath": "text", "params": {"values": param.split(",")}}
    if rt == "Required":
        return {"id": rule_id, "type": "Required", "kind": kind,
                "fieldPath": "text"}
    if rt == "Regex":
        pattern = dict(PATTERN_REGISTRY)[param]
        return {"id": rule_id, "type": "Regex", "kind": kind,
                "fieldPath": "text", "params": {"pattern": pattern}}
    raise ValueError(f"unknown suggestion rule_type {rt!r}")
