"""Property-based tests (hypothesis) — invariants that hold for ARBITRARY
inputs, complementing the example-based suites:

- date/dateTime grammar agrees with Python's datetime on every structurally
  well-formed candidate (the calendar arithmetic is hand-rolled numpy);
- RFC-6901 pointer escape/parse round-trips for any token content;
- hash sampling is subset-monotone (rate r1 <= r2 => sample(r1) ⊆ sample(r2))
  and exactly composable;
- sessionize block-merge equals the single-group result for arbitrary
  event-time multisets (the boundary-stitch algebra is the risky part).
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from fhir_data_validation_ray.functions.kernels import primitive_invalid_mask


# ------------------------------------------------- independent reference BPE
# A second, hand-written implementation of Sennrich et al. 2016 straight
# from the paper's pseudo-code (word-frequency dict -> pair counts -> merge
# loop; encode = SEQUENTIAL application of merges in rank order) — sharing
# NO code with stages/textops.py, whose distributed bpe_merges counts words
# via a bucketed exchange and whose bpe_encode uses the rank-GREEDY
# inference. Agreement checks both the exchange and the classic
# greedy-equals-sequential BPE equivalence.
def _ref_bpe_train(texts, n_merges, min_freq):
    from collections import Counter

    eow = "</w>"
    wc = Counter(w for t in texts if t is not None
                 for w in t.split(" ") if w != "")
    vocab = {tuple(w) + (eow,): c for w, c in sorted(wc.items())
             if c >= min_freq}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for seq, c in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < max(min_freq, 2):
            break
        merges.append(best)
        a, b = best
        nv = {}
        for seq, c in vocab.items():
            ns, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(seq[i])
                    i += 1
            nv[tuple(ns)] = nv.get(tuple(ns), 0) + c
        vocab = nv
    return merges


def _ref_bpe_encode_word(w, merges):
    seq = list(w) + ["</w>"]
    for a, b in merges:  # sequential rank-order application
        ns, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                ns.append(a + b)
                i += 2
            else:
                ns.append(seq[i])
                i += 1
        seq = ns
    return len(seq)


_bpe_corpus = st.lists(
    st.lists(st.text(alphabet="abc", min_size=1, max_size=5),
             min_size=0, max_size=6).map(" ".join),
    min_size=1, max_size=10)


@settings(max_examples=12, deadline=None)
@given(_bpe_corpus, st.integers(1, 8), st.sampled_from([1, 2, 3]))
def test_bpe_matches_independent_reference(ray_session, corpus, n_merges,
                                           min_freq):
    """Distributed bpe_merges (bucketed word-count exchange + merge loop)
    and bpe_encode (rank-greedy with per-worker memo) agree with the
    from-the-paper reference on arbitrary corpora — VERDICT r3 item 10
    (the pinned-example tests alone can't rule out systematic agreement
    bugs between the two lanes)."""
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import bpe_encode, bpe_merges

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(corpus)), pa.int64()),
        "text": pa.array(corpus, pa.string()),
    }), override_num_blocks=min(3, len(corpus)))
    merges_tbl = bpe_merges(docs, n_merges=n_merges, min_freq=min_freq)
    got = list(zip(merges_tbl["left"].to_pylist(),
                   merges_tbl["right"].to_pylist()))
    want = _ref_bpe_train(corpus, n_merges, min_freq)
    assert got == want

    enc = {r["doc_id"]: (r["n_words"], r["n_tokens"])
           for r in bpe_encode(docs, merges_tbl).take_all()}
    for i, t in enumerate(corpus):
        words = [w for w in t.split(" ") if w != ""]
        want_tokens = sum(_ref_bpe_encode_word(w, want) for w in words)
        assert enc[i] == (len(words), want_tokens), (t, want)


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 9999), st.integers(0, 99), st.integers(0, 99))
def test_date_grammar_agrees_with_datetime(y, m, d):
    """For every zero-padded YYYY-MM-DD with year >= 1, validity must equal
    Python datetime.date's verdict. Year 0000 is excluded: the grammar
    follows the ORACLE authority (DuckDB try_strptime accepts the proleptic
    year 0) while Python's datetime.MINYEAR is 1 — the one divergence, by
    construction on the DuckDB side."""
    import datetime

    s = f"{y:04d}-{m:02d}-{d:02d}"
    try:
        datetime.date(y, m, d)
        want_valid = True
    except ValueError:
        want_valid = False
    got_invalid = primitive_invalid_mask("date", pa.array([s]))[0]
    assert got_invalid == (not want_valid), s


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 9999), st.integers(1, 12), st.integers(1, 31),
       st.integers(0, 23), st.integers(0, 59), st.integers(0, 59),
       st.sampled_from(["Z", "+08:00", "-05:30", "+00:00"]))
def test_datetime_grammar_agrees_with_datetime(y, m, d, hh, mm, ss, tz):
    import datetime

    s = f"{y:04d}-{m:02d}-{d:02d}T{hh:02d}:{mm:02d}:{ss:02d}{tz}"
    try:
        datetime.date(y, m, d)
        want_valid = True
    except ValueError:
        want_valid = False
    got_invalid = primitive_invalid_mask("dateTime", pa.array([s]))[0]
    assert got_invalid == (not want_valid), s


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=8), min_size=0, max_size=5))
def test_pointer_escape_parse_roundtrip(tokens):
    from fhir_data_validation_ray.functions.pointers import escape_token, parse_pointer

    ptr = "".join("/" + escape_token(t) for t in tokens)
    assert parse_pointer(ptr) == tokens


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="abcdef0123456789", min_size=1, max_size=12),
                min_size=1, max_size=200),
       st.floats(0.0, 1.0), st.floats(0.0, 1.0))
def test_hash_sampling_monotone_and_deterministic(keys, r1, r2):
    """Smaller rate always yields a subset; equal rates yield equal sets."""
    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.sampling import SAMPLE_MOD

    h = hash_str(np.array(keys, dtype=object)) % np.uint64(SAMPLE_MOD)
    lo, hi = sorted([r1, r2])
    in_lo = set(np.asarray(keys, dtype=object)[h < int(lo * SAMPLE_MOD)])
    in_hi = set(np.asarray(keys, dtype=object)[h < int(hi * SAMPLE_MOD)])
    assert in_lo <= in_hi


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=1, max_size=120),
       st.integers(2, 9), st.integers(3, 20))
def test_sessionize_block_merge_equals_single_group(offsets, gap, block):
    """The (user, time-block) partial-session merge must reproduce the plain
    per-user sessionization for ANY event-time multiset and any block size
    (scaled to small integers so hypothesis explores dense boundary cases)."""
    scale = 1_000_000
    ts = np.array(sorted(offsets), dtype=np.int64) * scale + 10 * block * scale
    gap_us = gap * scale
    block_us = block * scale

    # ground truth: plain gap sessionization
    new = np.ones(len(ts), dtype=np.int64)
    if len(ts) > 1:
        new[1:] = (np.diff(ts) > gap_us).astype(np.int64)
    sizes = np.bincount(np.cumsum(new) - 1)

    # block summaries exactly as the per-(user, block) shard computes them,
    # stitched by the REAL library function
    from fhir_data_validation_ray.stages.windows import stitch_block_summaries

    blocks: dict[int, list[int]] = {}
    for t in ts:
        blocks.setdefault(int(t) // block_us, []).append(int(t))
    cols: dict[str, list[int]] = {
        k: [] for k in ("first_ts", "last_ts", "n_events", "n_sessions",
                        "first_count", "last_count", "interior_max")
    }
    for _, bts in sorted(blocks.items()):
        b = np.array(bts, dtype=np.int64)
        bnew = np.ones(len(b), dtype=np.int64)
        if len(b) > 1:
            bnew[1:] = (np.diff(b) > gap_us).astype(np.int64)
        bs = np.bincount(np.cumsum(bnew) - 1)
        cols["first_ts"].append(int(b[0]))
        cols["last_ts"].append(int(b[-1]))
        cols["n_events"].append(len(b))
        cols["n_sessions"].append(int(bs.size))
        cols["first_count"].append(int(bs[0]))
        cols["last_count"].append(int(bs[-1]))
        cols["interior_max"].append(int(bs[1:-1].max()) if bs.size > 2 else 0)

    n_sessions, n_events, max_size = stitch_block_summaries(cols, gap_us)
    assert n_sessions == sizes.size
    assert n_events == len(ts)
    assert max_size == int(sizes.max())


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 10_000_000), st.sampled_from([4, 8, 16, 32]))
def test_read_blocks_formula_bounds(n_docs, ncpus):
    """The adaptive read-split always lands between 2 and 16 tasks per CPU
    and tracks ~16k docs/block in between."""
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).parent.parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    b = bench.read_blocks_for(n_docs, ncpus)
    assert 1 <= b <= 16 * ncpus
    if n_docs >= 2 * ncpus * 16_000:
        assert b == min(16 * ncpus, n_docs // 16_000)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(0, 6), min_size=0, max_size=40))
def test_expand_run_pairs_matches_triu_reference(run_lens):
    """The vectorized within-run pair expansion must produce exactly the
    pairs a per-run triu_indices loop produces, in any run-length mix."""
    import numpy as np

    from fhir_data_validation_ray.stages.dedup import _expand_run_pairs

    run_id = np.repeat(np.arange(len(run_lens)), run_lens).astype(np.int64)
    pos_a, pos_b = _expand_run_pairs(run_id)
    got = set(zip(pos_a.tolist(), pos_b.tolist()))
    want = set()
    start = 0
    for ln in run_lens:
        ii, jj = np.triu_indices(ln, k=1)
        want |= {(start + i, start + j) for i, j in zip(ii.tolist(), jj.tolist())}
        start += ln
    assert got == want
    assert (pos_a < pos_b).all()
    if len(pos_a):
        assert (run_id[pos_a] == run_id[pos_b]).all()


def _eval_expr_python(node, span):
    """Reference evaluator over ONE span dict — mirrors the documented
    two-valued null semantics independently of the numpy implementation."""
    from fhir_data_validation_ray.profile import (
        ExprAnd, ExprExists, ExprLeaf, ExprNot, ExprOr,
    )

    if isinstance(node, ExprAnd):
        return all(_eval_expr_python(c, span) for c in node.children)
    if isinstance(node, ExprOr):
        return any(_eval_expr_python(c, span) for c in node.children)
    if isinstance(node, ExprNot):
        return not _eval_expr_python(node.child, span)
    if isinstance(node, ExprExists):
        v = span.get(node.fld)
        return v is not None and str(v).strip() != ""
    v = span.get(node.cond.fld)
    if v is None:
        return False
    if node.cond.op == "==":
        return v == node.cond.value
    if node.cond.op == "!=":
        return v != node.cond.value
    raise NotImplementedError(node.cond.op)


_EXPR_ATOMS = st.sampled_from([
    "text == 'a'", "text != 'a'", "kind == 'K'", "exists(text)",
    "exists(media_ref)", "offset == 1", "offset != 2",
])


def _expr_strings(depth):
    if depth == 0:
        return _EXPR_ATOMS
    sub = _expr_strings(depth - 1)
    return st.one_of(
        _EXPR_ATOMS,
        st.tuples(sub, sub).map(lambda t: f"{t[0]} and {t[1]}"),
        st.tuples(sub, sub).map(lambda t: f"{t[0]} or {t[1]}"),
        sub.map(lambda s: f"not ({s})"),
        st.tuples(sub, sub).map(lambda t: f"({t[0]}) and ({t[1]})"),
    )


@settings(max_examples=200, deadline=None)
@given(
    _expr_strings(3),
    st.lists(
        st.tuples(st.sampled_from(["K", "L"]),
                  st.sampled_from([None, "", "  ", "a", "b"]),
                  st.sampled_from(["", "x"]),
                  st.integers(0, 3)),
        min_size=1, max_size=8,
    ),
)
def test_expr_evaluator_matches_python_reference(expr_s, spans):
    """The vectorized AST evaluator agrees with an independent per-span
    Python evaluator for arbitrary expressions over arbitrary span rows
    (including null/whitespace values — the two-valued-null contract)."""
    from fhir_data_validation_ray.functions.flatten import flatten_batch
    from fhir_data_validation_ray.functions.kernels import eval_expr
    from fhir_data_validation_ray.profile import parse_expr
    from fhir_data_validation_ray.sources.generator import DOCS_SCHEMA, SPAN_TYPE

    ast = parse_expr(expr_s)
    spans_dicts = [
        {"kind": k, "text": t, "media_ref": m, "offset": o}
        for k, t, m, o in spans
    ]
    docs = pa.table(
        {"doc_id": pa.array(["d"], pa.string()),
         "spans": pa.array([spans_dicts], pa.list_(SPAN_TYPE))},
        schema=DOCS_SCHEMA,
    )
    fs = flatten_batch(docs)
    got = eval_expr(ast, fs).tolist()
    want = [_eval_expr_python(ast, sp) for sp in spans_dicts]
    assert got == want, expr_s


word_lists_strategy = st.lists(
    st.lists(st.sampled_from(["a", "bb", "ccc", ""]), max_size=12)
    | st.none(),
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(word_lists_strategy)
def test_word_lists_matches_python_reference(doc_words):
    """_word_lists (split + empty-word drop + offsets) equals the per-doc
    Python reference for arbitrary word sequences incl. null docs and
    consecutive-space runs."""
    from fhir_data_validation_ray.stages.textops import _word_lists

    texts = pa.array(
        [" ".join(ws) if ws is not None else None for ws in doc_words],
        pa.string(),
    )
    words, counts, offsets = _word_lists(texts)
    want = [[w for w in ws if w != ""] if ws is not None else []
            for ws in doc_words]
    assert counts.tolist() == [len(ws) for ws in want]
    assert offsets.tolist() == np.concatenate(
        [[0], np.cumsum([len(ws) for ws in want])]).tolist()
    assert words.to_pylist() == [w for ws in want for w in ws]


@settings(max_examples=200, deadline=None)
@given(word_lists_strategy, st.integers(1, 5))
def test_segments_tile_documents_exactly(doc_words, seg_words):
    """_segments is a partition of each doc's kept words: joining all of a
    doc's segments with ' ' reconstructs the kept-word text, seg_ids are
    0..ceil(n/w)-1 in order, and every segment except the last has exactly
    seg_words words."""
    import pyarrow.compute as pc

    from fhir_data_validation_ray.stages.dedup import _segments

    texts = pa.array(
        [" ".join(ws) if ws is not None else None for ws in doc_words],
        pa.string(),
    )
    t = pa.table({"doc_id": pa.array(range(len(doc_words)), pa.int64()),
                  "text": texts})
    doc_idx, seg_id, segs, n = _segments(t, seg_words)
    assert n == len(doc_words)
    segs_py = segs.to_pylist()
    for d, ws in enumerate(doc_words):
        kept = [w for w in (ws or []) if w != ""]
        mine = [segs_py[i] for i in np.flatnonzero(doc_idx == d)]
        assert " ".join(mine) == " ".join(kept)
        assert seg_id[doc_idx == d].tolist() == list(range(len(mine)))
        for s in mine[:-1]:
            assert len(s.split(" ")) == seg_words


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**63 - 1), st.integers(1, 2000))
def test_bloom_filter_no_false_negatives(seed, n_keys):
    """Every added key must probe positive (false positives allowed, false
    negatives never), and the merge of two filters contains both key sets."""
    from fhir_data_validation_ray.stages.dedup import BloomFilter

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 2**63, size=n_keys, dtype=np.uint64)
    b = rng.integers(0, 2**63, size=n_keys, dtype=np.uint64)
    fa = BloomFilter.sized_for(n_keys, fpr=0.01)
    fb = BloomFilter(fa.n_bits, fa.k)
    fa.add(a)
    fb.add(b)
    assert fa.contains(a).all() and fb.contains(b).all()
    fa.merge(fb)
    assert fa.contains(a).all() and fa.contains(b).all()


@given(st.lists(st.text(alphabet="ab c", min_size=0, max_size=24),
                min_size=0, max_size=20))
@settings(max_examples=60, deadline=None)
def test_quality_score_matches_python_reference(texts):
    """The vectorized segment-sum scorer equals a per-doc Python fold over
    the same FNV-hash arithmetic weights, for arbitrary texts (including
    empty docs and '' split artifacts)."""
    import numpy as np
    import pyarrow as pa

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.textops import QS_DIM, QS_MIX

    # per-batch kernel applied directly (no Ray session needed)
    from fhir_data_validation_ray.stages import textops

    t = pa.table({"doc_id": pa.array([str(i) for i in range(len(texts))]),
                  "text": pa.array(texts, pa.string())})

    def ref_score(text: str) -> int:
        total = 0
        for w in text.split(" "):
            if w == "":
                continue
            # NB: uint64 % python-int promotes to float64 and silently loses
            # precision — the explicit np.uint64 modulus is load-bearing
            b = int(hash_str(np.array([w], dtype="U"))[0] % np.uint64(QS_DIM))
            total += (b * QS_MIX) % 41 - 20
        return total

    class _Fake:
        def map_batches(self, fn, **kw):
            self.out = fn(t)
            return self

    got = textops.quality_score(_Fake())
    scores = dict(zip(got.out["doc_id"].to_pylist(),
                      got.out["q_score"].to_pylist()))
    for i, text in enumerate(texts):
        assert scores[str(i)] == ref_score(text)


@given(st.lists(st.integers(0, 255), min_size=64, max_size=64),
       st.integers(0, 63))
@settings(max_examples=60, deadline=None)
def test_ahash_bits_matches_scalar_reference(px, flip):
    """Vectorized aHash equals the scalar definition bit by bit, and a
    single-pixel complement changes a bounded number of bits."""
    import numpy as np

    from fhir_data_validation_ray.stages.multimodal import ahash_bits

    a = np.asarray(px, dtype=np.uint8).reshape(1, 64)
    s = int(a.sum())
    want = sum((1 << i) for i in range(64) if 64 * int(a[0, i]) >= s)
    assert int(ahash_bits(a)[0]) == want

    b = a.copy()
    b[0, flip] = 255 - b[0, flip]
    d = int(ahash_bits(a)[0]) ^ int(ahash_bits(b)[0])
    assert bin(d).count("1") <= 64  # sanity: both sides agree on definition


@given(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0,
                max_size=40),
       st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=3,
                unique=True))
@settings(max_examples=60, deadline=None)
def test_member_mask_matches_direct_is_in(grams, value_set):
    """Dictionary-encoded membership must equal the per-occurrence probe."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from fhir_data_validation_ray.stages.dedup import _member_mask

    ga = pa.array(grams, pa.string())
    vs = pa.array(value_set, pa.string())
    if len(ga) == 0:
        return
    got = _member_mask(ga, vs)
    want = pc.is_in(ga, value_set=vs).to_numpy(zero_copy_only=False)
    np.testing.assert_array_equal(got, want)


@given(st.lists(st.integers(min_value=0, max_value=5), min_size=0,
                max_size=30))
@settings(max_examples=60, deadline=None)
def test_repeat_copy_id_arithmetic(reps_list):
    """The np.repeat + arange copy-id construction used by
    mixture_upsample must enumerate 0..k-1 per row."""
    import numpy as np

    reps = np.asarray(reps_list, dtype=np.int64)
    ids = np.arange(len(reps), dtype=np.int64) * 10
    out_ids = np.repeat(ids, reps)
    starts = np.zeros(len(reps), np.int64)
    np.cumsum(reps[:-1], out=starts[1:])
    copy_id = (np.arange(int(reps.sum()), dtype=np.int64)
               - np.repeat(starts, reps))
    # reference: python loop
    ref = [(i * 10, c) for i, k in enumerate(reps_list) for c in range(k)]
    assert list(zip(out_ids.tolist(), copy_id.tolist())) == ref


@given(st.lists(st.integers(min_value=1, max_value=50), min_size=0,
                max_size=25))
@settings(max_examples=60, deadline=None)
def test_gini_closed_form_matches_bruteforce(counts):
    """The value-count closed form in exact_gini must equal the sorted
    rank-sum definition."""
    import numpy as np

    c = np.sort(np.asarray(counts, dtype=np.int64))
    n, total = len(c), int(c.sum())
    brute_num = 2 * int(np.sum((np.arange(n) + 1) * c)) - (n + 1) * total
    brute_den = n * total
    v, m = np.unique(c, return_counts=True)
    s = 0
    ic = 0
    for j in range(len(v)):
        ic += int(v[j]) * (int(m[j]) * s + int(m[j]) * (int(m[j]) + 1) // 2)
        s += int(m[j])
    assert 2 * ic - (n + 1) * total == brute_num
    assert n * total == brute_den


# ------------------------------------------------ spec-hint generator (r4)
_kind_name = st.sampled_from(
    ["Patient", "Observation", "Coding", "Encounter", "text", "date"])


@st.composite
def _span_schema(draw):
    """Random span schema: a root definition plus optional nested children,
    skip-rule paths and constraint keys — shaped like DEFAULT_SPAN_SCHEMA
    but adversarial (missing keys, zero mins, dangling conditions)."""
    root = "Doc"
    elements = [{"path": root, "min": 0, "max": "*"}]
    kinds = draw(st.lists(_kind_name, min_size=0, max_size=5, unique=True))
    constraints = {}
    for i, k in enumerate(kinds):
        el = {"path": f"{root}.{k}"}
        if draw(st.booleans()):
            el["min"] = draw(st.integers(0, 2))
        if draw(st.booleans()):
            el["max"] = draw(st.sampled_from(["1", "*"]))
        if draw(st.booleans()):
            key = f"c-{i}"
            el["condition"] = [key]
            if draw(st.booleans()):
                constraints[key] = {
                    "expression": draw(st.sampled_from(
                        ["Screening.exists()", "exists(Question)",
                         "kind = 'x'", ""]))}
        elements.append(el)
        if draw(st.booleans()):
            elements.append({"path": f"{root}.{k}.text",
                             "min": draw(st.integers(0, 1)),
                             "max": "1"})
    elements.append({"path": f"{root}.id", "min": 1})
    return {"fhirVersion": "R4",
            "definitions": [{"name": root, "kind": "resource", "type": root,
                             "elements": elements,
                             "constraints": constraints}]}


@settings(max_examples=40, deadline=None)
@given(_span_schema())
def test_spec_hint_pipeline_total_and_compilable(schema):
    """generate_spec_hints never raises on adversarial schemas; every
    generated rule compiles through parse_profile; hints for min=0 or
    skip-rule paths never appear; conditional rules always carry a
    compilable whenKind."""
    from fhir_data_validation_ray.profile import parse_profile
    from fhir_data_validation_ray.spechint import (
        generate_spec_hints,
        parse_exists_condition,
        spec_hint_rules,
    )

    catalog = generate_spec_hints(schema)
    by_path = {e["path"]: e for e in schema["definitions"][0]["elements"]}
    for hints in catalog.values():
        for h in hints:
            el = by_path["Doc." + h.path]
            assert int(el.get("min", 0) or 0) > 0
            assert not h.path.endswith(".id")
            if h.is_conditional:
                assert h.condition
    rules = spec_hint_rules(catalog)
    for r in rules:
        req = r["params"]["requirements"][0]
        if "whenKind" in req:
            assert req["whenKind"]  # parsed from an exists() condition
        assert r["errorCode"] in ("MISSING_REQUIRED_FIELD",
                                  "SPEC_REQUIRED_CONDITIONAL")
    if rules:
        p = {"version": "1.0", "rules": rules, "settings": {},
             "allowedKinds": []}
        parse_profile(p)  # must compile
    # non-exists conditions are dropped, never mis-compiled
    for hints in catalog.values():
        for h in hints:
            if h.is_conditional and parse_exists_condition(h.condition) is None:
                assert all(
                    rr["params"]["specHint"]["path"] != h.path or
                    "whenKind" in rr["params"]["requirements"][0]
                    for rr in rules
                    if rr["errorCode"] == "SPEC_REQUIRED_CONDITIONAL")


_rule_dict = st.fixed_dictionaries(
    {"id": st.text(min_size=1, max_size=4),
     "type": st.sampled_from(
         ["Required", "Regex", "CodeSystem", "QuestionAnswer",
          "RequiredSpans", "Reference", "FullUrlIdMatch", "Nonsense"])},
    optional={
        "fieldPath": st.sampled_from(["", "text", "media_ref"]),
        "errorCode": st.sampled_from(["", "X", "Y"]),
        "params": st.fixed_dictionaries({}, optional={
            "system": st.sampled_from(["", "https://x"]),
            "codes": st.just(["a"]),
            "questions": st.just([{"code": "Q1", "type": "boolean"}]),
            "requirements": st.lists(st.fixed_dictionaries(
                {}, optional={"kind": st.sampled_from(["", "P", "Q"]),
                              "min": st.integers(-1, 3),
                              "max": st.integers(-1, 3)}), max_size=3),
        }),
    })


@settings(max_examples=60, deadline=None)
@given(st.lists(_rule_dict, max_size=6))
def test_governance_review_total_and_monotone(rules):
    """review_rule_set never raises on arbitrary rule dicts; each result
    status equals the max severity of its issues; the summary's blocked
    list matches the per-rule statuses."""
    from fhir_data_validation_ray.governance import (
        _RANK,
        review_rule_set,
        review_summary,
    )

    results = review_rule_set(rules)
    assert len(results) == len(rules)
    for res in results:
        want = max((_RANK[i.severity] for i in res.issues), default=0)
        assert _RANK[res.status] == want
    s = review_summary(results)
    assert s["exportable"] == (s["status"] != "BLOCKED")
    assert set(s["blocked"]) == {r.rule_id for r in results
                                 if r.status == "BLOCKED"}


_ngram_corpus = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2", "s3"]),
        st.lists(st.text(alphabet="ab ", min_size=0, max_size=4),
                 min_size=0, max_size=8).map(" ".join),
    ),
    min_size=1, max_size=12)


@settings(max_examples=12, deadline=None)
@given(_ngram_corpus, st.integers(1, 4))
def test_distinct_ngrams_matches_python_reference(ray_session, rows, blocks):
    """distinct_ngrams (per-batch composite-code pre-dedup + gram-bucket
    fold) equals the plain-Python per-(source, n) distinct/total counts for
    arbitrary corpora — including texts that are ALL spaces, empty docs and
    sources split across blocks."""
    from collections import defaultdict

    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import distinct_ngrams

    tot: dict = defaultdict(int)
    seen: dict = defaultdict(set)
    for src, text in rows:
        ws = [w for w in text.split(" ") if w != ""]
        for n in (1, 2, 3):
            for i in range(len(ws) - n + 1):
                tot[(src, n)] += 1
                seen[(src, n)].add(" ".join(ws[i:i + n]))
    want = {k: (len(seen[k]), tot[k]) for k in tot}

    ds = rd.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows]),
        "text": pa.array([r[1] for r in rows]),
    })).repartition(blocks)
    got = {(r["source"], r["n"]): (r["distinct_grams"], r["total_grams"])
           for r in distinct_ngrams(ds, (1, 2, 3)).take_all()}
    assert got == want


_interleaved_docs = st.lists(
    st.tuples(
        st.sampled_from(["doc.1", "doc.2", "doc.10", "d", ""]),
        st.lists(st.tuples(st.sampled_from(["text", "image", "audio", "Patient"]),
                           st.one_of(st.none(),
                                     st.text(alphabet="ab ", max_size=8))),
                 min_size=0, max_size=4),
    ),
    min_size=1, max_size=8)


@settings(max_examples=12, deadline=None)
@given(_interleaved_docs, st.integers(1, 3), st.integers(1, 4))
def test_pack_interleaved_matches_python_reference(ray_session, rows,
                                                   n_shards, blocks):
    """pack_interleaved equals the plain-Python packing (per-kind costs,
    FNV shard, byte-order cumsum, dup-id aggregation, zero-span drop) for
    arbitrary interleaved corpora."""
    from collections import defaultdict

    import ray.data as rd

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.packing import (
        MEDIA_TOKEN_COSTS,
        PACK_BUDGET,
        pack_interleaved,
    )

    totals: dict = defaultdict(int)
    has_spans: set = set()
    for doc_id, spans in rows:
        if spans:
            has_spans.add(doc_id)
        for kind, text in spans:
            if kind in MEDIA_TOKEN_COSTS:
                totals[doc_id] += MEDIA_TOKEN_COSTS[kind]
            else:
                totals[doc_id] += len([w for w in (text or "").split(" ")
                                       if w != ""])
    per_shard: dict = defaultdict(list)
    for doc_id in sorted(has_spans):
        sh = int(hash_str(np.array([doc_id], "U")) % np.uint64(n_shards))
        per_shard[sh].append(doc_id)
    want = {}
    for sh, ids in per_shard.items():
        off = 0
        for doc_id in ids:  # sorted byte order
            want[doc_id] = (sh, totals[doc_id], off, off // PACK_BUDGET)
            off += totals[doc_id]

    span_t = pa.list_(pa.struct([("kind", pa.string()),
                                 ("text", pa.string()),
                                 ("media_ref", pa.string()),
                                 ("offset", pa.int32())]))
    tbl = pa.Table.from_pylist([
        {"doc_id": doc_id,
         "spans": [{"kind": k, "text": t, "media_ref": "", "offset": i}
                   for i, (k, t) in enumerate(spans)]}
        for doc_id, spans in rows],
        schema=pa.schema([("doc_id", pa.string()), ("spans", span_t)]))
    ds = rd.from_arrow(tbl).repartition(blocks)
    got = {r["doc_id"]: (r["shard"], r["n_tokens"], r["tok_offset"],
                         r["seq_in_shard"])
           for r in pack_interleaved(ds, n_shards=n_shards).take_all()}
    assert got == want


# --------------------------------------------------- smart-path navigation
_nav_seg = st.sampled_from(["Patient", "Observation", "a", "b2", "text",
                            "media_ref", "value"])
_nav_piece = st.one_of(
    _nav_seg,
    st.builds(lambda s, i: f"{s}[{i}]", _nav_seg, st.integers(0, 12)),
    st.builds(lambda s: f"{s}[*]", _nav_seg),
    st.builds(lambda s, c: f"{s}.where({c}='x')", _nav_seg, _nav_seg),
)
_nav_path = st.one_of(
    st.just(""), st.just("Unknown"),
    st.lists(_nav_piece, min_size=1, max_size=5).map(".".join),
    # duplicated resource-type prefix variants
    st.builds(lambda s, rest: f"{s}.{s}.{rest}", _nav_seg, _nav_seg),
)
# pointer contract: segments non-empty, numerics never consecutive
_nav_ptr = st.one_of(
    st.just(""),
    st.lists(
        st.one_of(_nav_seg,
                  st.builds(lambda s, i: f"{s}/{i}", _nav_seg,
                            st.integers(0, 999))),
        min_size=1, max_size=4,
    ).map(lambda parts: "/" + "/".join(parts)),
)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(_nav_path, _nav_ptr), min_size=1, max_size=24))
def test_navigation_vectorized_equals_scalar(ray_session, rows):
    """The Arrow-vectorized navigation lane and the scalar ports
    (oracle-literal generators) agree on every column over the path and
    pointer vocabulary, including duplicate prefixes, where() filters,
    [*] wildcards and doc-level empty pointers."""
    import pyarrow as pa
    import ray.data

    import fhir_data_validation_ray.explain as X

    t = pa.table({
        "doc_id": [f"d{i}" for i in range(len(rows))],
        "span_index": pa.array([0] * len(rows), pa.int32()),
        "error_code": ["E"] * len(rows),
        "severity": ["error"] * len(rows),
        "path": [p for p, _ in rows],
        "json_pointer": [q for _, q in rows],
    })
    navigate_sorted = sorted(
        X.navigate_violations(ray.data.from_arrow(t)).take_all(),
        key=lambda r: int(r["doc_id"][1:]))
    for r, (p, q) in zip(navigate_sorted, rows):
        assert r["nav_breadcrumb"] == X.format_breadcrumb(p)
        assert r["nav_scoped_path"] == X.scoped_path(p)
        assert r["nav_full_json_path"] == X.pointer_full_path(q)
        assert r["nav_json_path"] == X.pointer_jsonpath(q)
        assert r["nav_pointer_path"] == X.pointer_fhirpath_style(q)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                         min_size=0, max_size=6),
                min_size=1, max_size=30),
       st.lists(st.sampled_from(["en", "de"]), min_size=30, max_size=30),
       st.integers(1, 3))
def test_nb_classifier_matches_reference(ray_session, word_lists, langs,
                                         blocks):
    """Distributed nb_classifier (two-pass word-bucket model + score folds)
    agrees with a plain single-process reference on random corpora:
    same hash split, same Laplace normalizers, same two-sided sums."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.sampling import SAMPLE_MOD
    from fhir_data_validation_ray.stages.textops import (NB_SCALE,
                                                         NB_TRAIN_RATE,
                                                         nb_classifier)

    n = len(word_lists)
    ids = np.arange(n, dtype=np.int64)
    texts = [" ".join(ws) for ws in word_lists]
    langs = langs[:n]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids), "text": pa.array(texts),
        "lang": pa.array(langs),
    })).repartition(blocks)
    got = {r["doc_id"]: (r["n_words"], r["score_pos"], r["score_neg"],
                         r["pred"])
           for r in nb_classifier(docs).take_all()}

    # plain reference
    thr = int(NB_TRAIN_RATE * SAMPLE_MOD)
    is_train = (hash_str(ids.astype("U")) % np.uint64(SAMPLE_MOD)
                ) < np.uint64(thr)
    c1, c0 = {}, {}
    for i in range(n):
        if not is_train[i]:
            continue
        tgt = c1 if langs[i] == "en" else c0
        for w in word_lists[i]:
            tgt[w] = tgt.get(w, 0) + 1
    v = len(set(c1) | set(c0))
    k1 = max(sum(c1.values()) + v, 1)
    k0 = max(sum(c0.values()) + v, 1)
    r_pos, r_neg = (k0 * NB_SCALE) // k1, (k1 * NB_SCALE) // k0
    want = {}
    for i in range(n):
        if is_train[i] or not word_lists[i]:
            continue
        sp = sum((c1.get(w, 0) + 1) * r_pos // (c0.get(w, 0) + 1)
                 for w in word_lists[i])
        sn = sum((c0.get(w, 0) + 1) * r_neg // (c1.get(w, 0) + 1)
                 for w in word_lists[i])
        want[i] = (len(word_lists[i]), sp, sn, int(sp > sn))
    assert got == want


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 40)),
                min_size=1, max_size=60),
       st.sampled_from([2, 4, 8, 4096]))
def test_out_of_order_matches_reference(ray_session, rows, block_events):
    """Distributed out_of_order_counts (block shards + prefix-max merge +
    candidate re-exchange) agrees with a plain running-max scan for every
    block size, including blocks smaller than a user's history."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import out_of_order_counts

    eids = list(range(len(rows)))
    users = [u for u, _ in rows]
    tss = [t for _, t in rows]
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array(eids, pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(tss, pa.int64()),
    })).repartition(3)
    got = {r["user_id"]: (r["n_events"], r["n_late"])
           for r in out_of_order_counts(ev,
                                        block_events=block_events).take_all()}

    want = {}
    seen_max = {}
    for e in eids:
        u, t = users[e], tss[e]
        n, late = want.get(u, (0, 0))
        if u in seen_max and t < seen_max[u]:
            late += 1
        seen_max[u] = max(seen_max.get(u, t), t)
        want[u] = (n + 1, late)
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=40), st.text(max_size=40))
def test_levenshtein_matches_python_reference(a, b):
    """The min-plus-prefix row-vectorized DP (dedup._levenshtein) equals a
    plain O(n*m) scalar Wagner-Fischer on arbitrary unicode, including
    empties, NULs and astral-plane chars (utf-32 codepoint units)."""
    from fhir_data_validation_ray.stages.dedup import _levenshtein

    ca, cb = list(a), list(b)
    prev = list(range(len(cb) + 1))
    for i, ch in enumerate(ca, 1):
        cur = [i]
        for j, cj in enumerate(cb, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ch != cj)))
        prev = cur
    assert _levenshtein(a, b) == prev[-1]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                min_size=0, max_size=60))
def test_triangle_counts_matches_bruteforce(ray_session, raw_edges):
    """Degree-ordered wedge checking counts each triangle exactly once per
    corner on arbitrary graphs — hubs, ties in degree, isolated edges."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import (
        triangle_counts_from_pairs,
    )

    edges = sorted({(min(a, b), max(a, b))
                    for a, b in raw_edges if a != b})
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in edges], pa.int64()),
        "doc_b": pa.array([b for _, b in edges], pa.int64()),
    })).repartition(3)
    got = {r["doc_id"]: r["n_triangles"]
           for r in triangle_counts_from_pairs(
               pairs, deg_buckets=4, pair_buckets=4).take_all()}

    es = set(edges)
    want = {}
    for a, b in edges:
        for c in range(16):
            if c > b and (a, c) in es and (b, c) in es:
                for v in (a, b, c):
                    want[v] = want.get(v, 0) + 1
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50),
                          st.integers(0, 3)),
                min_size=1, max_size=60),
       st.integers(2, 9), st.integers(3, 20), st.integers(1, 4))
def test_session_paths_matches_python_reference(ray_session, rows, gap,
                                                block, k):
    """The block-sharded session-path mining (interior paths close locally,
    boundary sessions stitch via capped-prefix concatenation) equals plain
    per-user sessionization + first-k path counting for ANY event multiset,
    gap, block size and k — including equal timestamps (event_id
    tie-break) and sessions spanning many blocks."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import session_paths

    scale = 1_000_000
    types = ["a", "b", "cc", "d"]
    ev = [(u, off * scale + 10 * block * scale, types[ti], i)
          for i, (u, off, ti) in enumerate(rows)]
    events = rd.from_arrow(pa.table({
        "event_id": pa.array([e[3] for e in ev], pa.int64()),
        "user_id": pa.array([e[0] for e in ev], pa.int64()),
        "ts": pa.array([e[1] for e in ev], pa.timestamp("us")),
        "event_type": pa.array([e[2] for e in ev], pa.string()),
    })).repartition(3)
    got_t = session_paths(events, gap_us=gap * scale, k=k,
                          block_us=block * scale)
    got = dict(zip(got_t["path"].to_pylist(),
                   got_t["n_sessions"].to_pylist()))

    want: dict[str, int] = {}
    by_user: dict[int, list] = {}
    for u, t, ty, eid in ev:
        by_user.setdefault(u, []).append((t, eid, ty))
    for seq in by_user.values():
        seq.sort()
        sessions: list[list[str]] = []
        prev_t = None
        for t, _, ty in seq:
            if prev_t is None or t - prev_t > gap * scale:
                sessions.append([])
            sessions[-1].append(ty)
            prev_t = t
        for s in sessions:
            p = ">".join(s[:k])
            want[p] = want.get(p, 0) + 1
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c", "dd"]),
                         max_size=8),
                min_size=1, max_size=12))
def test_novel_grams_matches_python_reference(ray_session, doc_words):
    """Distributed first-occurrence bigram novelty (gram-bucket min fold +
    doc-bucket sum) equals plain per-doc set arithmetic for arbitrary
    corpora — repeated grams inside a doc, ties broken by min doc_id,
    gram-less short docs absent."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import novel_gram_counts

    texts = [" ".join(w) for w in doc_words]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"])
           for r in novel_gram_counts(docs, n=2, num_buckets=4).take_all()}

    first: dict[tuple, int] = {}
    gsets = []
    for i, w in enumerate(doc_words):
        w = [x for x in w if x]
        gs = {(w[j], w[j + 1]) for j in range(len(w) - 1)}
        gsets.append(gs)
        for g in gs:
            first.setdefault(g, i)
    want = {i: (len(gs), sum(1 for g in gs if first[g] == i))
            for i, gs in enumerate(gsets) if gs}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["a", "b", "ab", "c"]),
                         max_size=10),
                min_size=1, max_size=10))
def test_lrs_matches_python_reference(ray_session, doc_words):
    """Distributed prefix-doubling longest-repeated-substring (equality
    classes + binary-search probes) equals brute-force substring counting
    for arbitrary corpora — within-doc overlaps, cross-doc repeats,
    all-unique corpora (lrs 0), whole-doc duplicates."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import (
        longest_repeated_substring,
    )

    texts = [" ".join(w) for w in doc_words]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)
    got = longest_repeated_substring(docs, num_buckets=4).to_pydict()

    counts: dict[tuple, int] = {}
    for w in doc_words:
        w = [x for x in w if x]
        for i in range(len(w)):
            for j in range(i + 1, len(w) + 1):
                t = tuple(w[i:j])
                counts[t] = counts.get(t, 0) + 1
    dup_lens = [len(t) for t, c in counts.items() if c >= 2]
    lrs = max(dup_lens, default=0)
    nocc = sum(c for t, c in counts.items()
               if len(t) == lrs and c >= 2) if lrs else 0
    assert got["lrs_words"] == [lrs]
    assert got["n_occurrences"] == [nocc]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["a", "b", "ab", "c"]),
                         max_size=10),
                min_size=1, max_size=10))
def test_dup_profile_matches_python_reference(ray_session, doc_words):
    """Per-k duplicate-window counts from the shared doubling tables +
    two-power probes equal brute-force window counting, including
    non-power k and k past the duplicate-free width (exact zeros)."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import duplication_profile

    ks = (1, 2, 3, 5, 8)
    texts = [" ".join(w) for w in doc_words]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)
    got = duplication_profile(docs, ks, num_buckets=4).to_pydict()

    rows = []
    for k in ks:
        counts: dict[tuple, int] = {}
        for w in doc_words:
            w = [x for x in w if x]
            for i in range(len(w) - k + 1):
                t = tuple(w[i:i + k])
                counts[t] = counts.get(t, 0) + 1
        dups = {t: c for t, c in counts.items() if c >= 2}
        rows.append((k, len(dups), sum(dups.values())))
    assert got == {"k": [r[0] for r in rows],
                   "n_dup_windows": [r[1] for r in rows],
                   "n_dup_positions": [r[2] for r in rows]}


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100),
                          st.sampled_from(["view", "purchase", "x"])),
                min_size=1, max_size=40))
def test_conversion_lag_matches_python_reference(ray_session, rows):
    """The (user, anchor) min-ts fold + adjacent-key pairing equals plain
    per-user first-event arithmetic, and the exact-quantile finish matches
    the ceil-rank rule, for arbitrary event multisets."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.windows import (
        conversion_lag_quantiles,
    )

    scale = 1_000_000
    events = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * scale for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(3)
    got = conversion_lag_quantiles(events, num_buckets=4).to_pydict()

    fv: dict[int, int] = {}
    fp: dict[int, int] = {}
    for u, t, ty in rows:
        if ty == "view":
            fv[u] = min(fv.get(u, t), t)
        elif ty == "purchase":
            fp[u] = min(fp.get(u, t), t)
    lags = sorted(fp[u] - fv[u] for u in fv if u in fp and fp[u] >= fv[u])
    assert got["n"] == [len(lags)]
    for q, name in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                    (0.95, "p95")):
        want = lags[max(math.ceil(q * len(lags)), 1) - 1] if lags else 0
        assert got[name] == [want], (q, lags, got)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 20), min_size=1, max_size=50),
       st.integers(1, 5))
def test_cusum_closed_form_matches_recursion(ns, k):
    """The vectorized CUSUM closed form (P - min(0, running min of P))
    equals the defining recursion S_t = max(0, S_{t-1} + n_t - k) for any
    count series — the identity both the engine and the SQL oracle rest
    on."""
    n = np.array(ns, dtype=np.int64)
    p = np.cumsum(n - k)
    closed = p - np.minimum(np.minimum.accumulate(p), 0)
    s, ref = 0, []
    for x in ns:
        s = max(0, s + x - k)
        ref.append(s)
    assert closed.tolist() == ref


def test_kcore_duplicate_edges_raise(ray_session):
    """Duplicate input edges would silently inflate degrees AND h-indexes
    — the guard must fail loudly (triangle_counts_from_pairs precedent)."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import kcore_from_pairs

    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([1, 1, 2], pa.int64()),
        "doc_b": pa.array([2, 2, 3], pa.int64()),
    }))
    with pytest.raises(Exception, match="duplicate"):
        kcore_from_pairs(pairs, iters=1, num_buckets=2).take_all()


def _h_index(values):
    """max h such that at least h of ``values`` are >= h."""
    vs = sorted(values, reverse=True)
    return max((min(v, i + 1) for i, v in enumerate(vs)), default=0)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                min_size=1, max_size=60),
       st.integers(1, 4))
def test_kcore_matches_h_iteration_reference(ray_session, raw_edges, iters):
    """The distributed value-count run fold equals a plain per-node
    h-index iteration round for round on arbitrary graphs (hubs, degree
    ties, disconnected components) — and the fixpoint of that iteration is
    the classic peeling coreness (the algorithm's published semantics)."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.dedup import kcore_from_pairs

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_edges if a != b})
    if not edges:
        return
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in edges], pa.int64()),
        "doc_b": pa.array([b for _, b in edges], pa.int64()),
    })).repartition(3)
    got = {r["doc_id"]: r["core"]
           for r in kcore_from_pairs(pairs, iters=iters,
                                     num_buckets=4).take_all()}

    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    c = {v: len(ns) for v, ns in nbrs.items()}
    for _ in range(iters):
        c = {v: _h_index([c[u] for u in ns]) for v, ns in nbrs.items()}
    assert got == c

    # fixpoint == peeling coreness (theory check, pure Python only)
    while True:
        c2 = {v: _h_index([c[u] for u in ns]) for v, ns in nbrs.items()}
        if c2 == c:
            break
        c = c2
    core = {}
    deg = {v: len(ns) for v, ns in nbrs.items()}
    live = dict(deg)
    k = 0
    while live:
        k_next = min(live.values())
        k = max(k, k_next)
        peel = [v for v, d in live.items() if d <= k]
        for v in peel:
            core[v] = k
            del live[v]
            for u in nbrs[v]:
                if u in live:
                    live[u] -= 1
    assert c == core


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(
    alphabet=st.sampled_from(list("abXY 7.é世")), max_size=60),
    min_size=1, max_size=8))
def test_cdc_chunks_match_scalar_reference(texts):
    """The zero-copy ASCII lane and the codepoint fallback both reproduce a
    plain per-doc scalar chunker (same cuts, same tiling) — including docs
    shorter than the window, empty docs, and mixed-unicode batches that
    force the fallback."""
    import pyarrow as pa

    from fhir_data_validation_ray.stages.dedup import (
        CDC_MASK,
        CDC_POW,
        CDC_WINDOW,
        _cdc_chunks,
    )

    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    doc, chunks = _cdc_chunks(t, "text")
    got = list(zip(doc.tolist(), chunks.to_pylist()))

    want = []
    for did, s in enumerate(texts):
        if not s:
            continue
        cp = [ord(c) for c in s]
        cuts = []
        for i in range(CDC_WINDOW - 1, len(cp) - 1):
            h = sum(cp[i - j] * int(CDC_POW[j]) for j in range(CDC_WINDOW))
            if h % CDC_MASK == 0:
                cuts.append(i + 1)
        b = [0, *cuts, len(cp)]
        for lo, hi in zip(b[:-1], b[1:]):
            want.append((did, s[lo:hi]))
    assert got == want
    # chunks must tile each doc exactly
    rebuilt = {}
    for did, ch in got:
        rebuilt[did] = rebuilt.get(did, "") + ch
    assert rebuilt == {i: s for i, s in enumerate(texts) if s}


@settings(max_examples=12, deadline=None)
@given(st.lists(st.text(alphabet="ab ", max_size=12), min_size=1,
                max_size=20),
       st.integers(1, 4))
def test_pareto_frontier_matches_bruteforce(ray_session, texts, blocks):
    """pareto_frontier (local-prune partials + per-x groupby + driver
    sweep) equals the O(n^2) dominance definition for arbitrary corpora
    and block splits — the associative-merge claim, including all-space
    and empty docs (excluded on both sides) and duplicate points
    (multiplicity summed)."""
    import ray.data as rd

    from fhir_data_validation_ray.pipelines.curation import pareto_frontier

    pts: dict = {}
    for s in texts:
        ws = [w for w in s.split(" ") if w != ""]
        if not ws:
            continue
        p = (len(ws), 1000 * len(set(ws)) // len(ws))
        pts[p] = pts.get(p, 0) + 1
    want = sorted(
        (x, y, c) for (x, y), c in pts.items()
        if not any((bx >= x and by >= y and (bx, by) != (x, y))
                   for (bx, by) in pts))

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })).repartition(blocks)
    out = pareto_frontier(ds, batch_size=3)
    got = list(zip(out["n_words"].to_pylist(), out["diversity"].to_pylist(),
                   out["n_docs"].to_pylist()))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(st.integers(-8, 8), min_size=0, max_size=12),
                min_size=2, max_size=4),
       st.integers(1, 3))
def test_ind_discovery_matches_set_reference(ray_session, cols, blocks):
    """ind_discovery (shared value-bucketed exchange + per-bucket Gram
    matrix) equals plain set containment for arbitrary small columns —
    negative values, empty columns, duplicate values, any block split."""
    import ray.data as rd

    from fhir_data_validation_ray.stages.stats import ind_discovery

    inputs = []
    for i, vals in enumerate(cols):
        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
        inputs.append((f"t{i}.v", ds.repartition(blocks), "v"))
    got = ind_discovery(inputs, num_buckets=4).to_pandas()

    sets = [set(v) for v in cols]
    for _, row in got.iterrows():
        i = int(row["lhs"][1:-2])
        j = int(row["rhs"][1:-2])
        assert row["n_lhs"] == len(sets[i])
        assert row["n_overlap"] == len(sets[i] & sets[j])
        assert row["included"] == (1 if sets[i] <= sets[j] else 0)
    assert len(got) == len(cols) * (len(cols) - 1)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="ab ", max_size=14), min_size=1,
                max_size=16),
       st.integers(1, 4))
def test_kn_counts_matches_python_reference(ray_session, texts, blocks):
    """kn_continuation_counts (dual-keyed bigram exchange, fd_violations
    sharding, cross-batch pair dedup) equals the plain per-word
    count/set reference for arbitrary corpora and block splits."""
    from collections import Counter, defaultdict

    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import (
        kn_continuation_counts,
    )

    cnt: Counter = Counter()
    lefts: dict = defaultdict(set)
    rights: dict = defaultdict(set)
    for s in texts:
        ws = [w for w in s.split(" ") if w != ""]
        cnt.update(ws)
        for a, b in zip(ws, ws[1:]):
            lefts[b].add(a)
            rights[a].add(b)
    want = sorted(((w, n, len(lefts[w]), len(rights[w]))
                   for w, n in cnt.items()),
                  key=lambda r: (-r[1], r[0]))[:30]
    want = [(w, n, l, r, i + 1) for i, (w, n, l, r) in enumerate(want)]

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })).repartition(blocks)
    got = [(r["word"], r["n"], r["n_left"], r["n_right"], r["rank"])
           for r in kn_continuation_counts(
               ds, num_buckets=4, batch_size=3).take_all()]
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["s0", "s1", "s2"]),
                          st.text(alphabet="ab ", max_size=12)),
                min_size=1, max_size=16),
       st.integers(1, 3))
def test_keyness_matches_python_reference(ray_session, rows, blocks):
    """keyness_terms (materialized one-pass partials, totals broadcast,
    bucket-local top-k) equals the plain two-source contrast reference —
    including corpora with <2 sources (empty result) and words unique to
    either side."""
    from collections import Counter

    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import keyness_terms

    srcs = sorted({s for s, text in rows
                   if any(w != "" for w in text.split(" "))})[:2]
    want = []
    if len(srcs) == 2:
        a, b = srcs
        ca: Counter = Counter()
        cb: Counter = Counter()
        for s, text in rows:
            ws = [w for w in text.split(" ") if w != ""]
            if s == a:
                ca.update(ws)
            elif s == b:
                cb.update(ws)
        na_tot, nb_tot = sum(ca.values()), sum(cb.values())
        vocab = sorted(set(ca) | set(cb))
        scored = [(w, ca[w], cb[w], ca[w] * nb_tot - cb[w] * na_tot)
                  for w in vocab]
        for side, key in (("a", lambda r: (-r[3], r[0])),
                          ("b", lambda r: (r[3], r[0]))):
            for i, (w, x, y, sc) in enumerate(sorted(scored, key=key)[:10]):
                want.append((side, w, x, y, sc, i + 1))

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "source": pa.array([r[0] for r in rows]),
        "text": pa.array([r[1] for r in rows]),
    })).repartition(blocks)
    got = [(r["side"], r["word"], r["n_a"], r["n_b"], r["score"], r["rank"])
           for r in keyness_terms(ds, num_buckets=4,
                                  batch_size=3).take_all()]
    assert sorted(got) == sorted(want)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**52), min_size=1, max_size=40))
def test_oracle_isqrt_correction_matches_isqrt(ns):
    """The c_temperature_mix oracle computes integer sqrt as floor(sqrt)
    plus a ±1 correction; verify the SQL formula equals math.isqrt for
    arbitrary int64 token counts (float sqrt alone is off-by-one near
    perfect squares)."""
    import math

    import duckdb

    con = duckdb.connect()
    got = con.execute(
        "SELECT (s0 + (CASE WHEN (s0+1)*(s0+1) <= n THEN 1 ELSE 0 END)"
        "      - (CASE WHEN s0*s0 > n THEN 1 ELSE 0 END))::BIGINT"
        " FROM (SELECT n, CAST(floor(sqrt(n::DOUBLE)) AS BIGINT) AS s0"
        "       FROM (SELECT unnest(?::BIGINT[]) AS n))",
        [ns]).fetchall()
    assert [r[0] for r in got] == [math.isqrt(n) for n in ns]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["x", "y", None]),
                          st.sampled_from(["p", "*", None]),
                          st.integers(-5, 50)),
                min_size=1, max_size=20),
       st.integers(1, 3), st.booleans())
def test_rollup_cube_matches_python_reference(ray_session, rows, blocks,
                                              cube):
    """rollup_counts (both modes) equals a plain grouped reference with
    the '*' null-coalesce applied pre-grouping — exercises the null path
    the parquet fixtures never hit, plus literal '*' values colliding
    with the rollup marker (disambiguated by lvl)."""
    from collections import defaultdict

    import ray.data as rd

    from fhir_data_validation_ray.stages.stats import rollup_counts

    fin: dict = defaultdict(lambda: [0, 0])
    for a, b, v in rows:
        key = (a or "*", b or "*")
        fin[key][0] += 1
        fin[key][1] += v
    want = []
    for (a, b), (n, s) in fin.items():
        want.append((a, b, 0, n, s))
    per_a: dict = defaultdict(lambda: [0, 0])
    per_b: dict = defaultdict(lambda: [0, 0])
    for (a, b), (n, s) in fin.items():
        per_a[a][0] += n
        per_a[a][1] += s
        per_b[b][0] += n
        per_b[b][1] += s
    want += [(a, "*", 1, n, s) for a, (n, s) in per_a.items()]
    if cube:
        want += [("*", b, 2, n, s) for b, (n, s) in per_b.items()]
    grand_lvl = 3 if cube else 2
    want.append(("*", "*", grand_lvl,
                 sum(n for n, _ in fin.values()),
                 sum(s for _, s in fin.values())))

    ds = rd.from_arrow(pa.table({
        "a": pa.array([r[0] for r in rows], pa.string()),
        "b": pa.array([r[1] for r in rows], pa.string()),
        "v": pa.array([r[2] for r in rows], pa.int64()),
    })).repartition(blocks)
    out = rollup_counts(ds, "a", "b", "v", cube=cube)
    got = list(zip(out["a"].to_pylist(), out["b"].to_pylist(),
                   out["lvl"].to_pylist(), out["n"].to_pylist(),
                   out["sum_val"].to_pylist()))
    assert sorted(got) == sorted(want)


def test_lrs_sampled_lane_equivalence_and_template_detection(ray_session):
    """VERDICT r4 #6: sample_docs=1 is byte-identical to the exact lane;
    under real sampling, high-multiplicity template boilerplate (the
    operational target) is still found at full length, and the sampled
    result never exceeds the exact one."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.functions.hashing import hash_str
    from fhir_data_validation_ray.stages.dedup import (
        duplication_profile,
        longest_repeated_substring,
    )

    template = "the quick brown fox jumps over the lazy dog again"  # 10 words
    texts, ids = [], []
    for i in range(40):
        ids.append(i)
        filler = f"u{i}a u{i}b u{i}c"
        # template planted in 3 of every 4 docs -> survives 1-in-2 sampling
        texts.append(f"{filler} {template}" if i % 4 else filler)
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(4)

    exact = longest_repeated_substring(docs, num_buckets=8).to_pydict()
    same = longest_repeated_substring(docs, num_buckets=8,
                                      sample_docs=1).to_pydict()
    assert same == exact and exact["lrs_words"] == [10]

    # sampling keeps >= 2 template carriers (deterministic hash split)
    import numpy as np
    kept = hash_str(np.array([str(i) for i in ids], dtype="U")) \
        % np.uint64(2) == 0
    carriers = sum(1 for i in ids if kept[i] and i % 4)
    assert carriers >= 2  # precondition of the bound, not luck
    sampled = longest_repeated_substring(docs, num_buckets=8,
                                         sample_docs=2).to_pydict()
    assert sampled["lrs_words"] == [10]
    assert sampled["n_occurrences"][0] <= exact["n_occurrences"][0]

    # duplication profile: sampled counts are bounded by exact counts
    ks = (1, 2, 4, 8)
    ep = duplication_profile(docs, ks, num_buckets=8).to_pydict()
    sp = duplication_profile(docs, ks, num_buckets=8,
                             sample_docs=2).to_pydict()
    assert sp["k"] == ep["k"]
    assert all(s <= e for s, e in
               zip(sp["n_dup_positions"], ep["n_dup_positions"]))
    assert duplication_profile(docs, ks, num_buckets=8,
                               sample_docs=1).to_pydict() == ep


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                          st.integers(min_value=0, max_value=40)),
                min_size=1, max_size=60))
def test_drift_fp_ks_matches_bruteforce(ray_session, rows):
    """ks_fp is the EXACT two-sample ECDF gap (group vs whole corpus) in
    pure integers: floor(1e6 * max_v |c_g(<=v)*N - c_all(<=v)*n_g|
    / (n_g*N)) — pinned against a brute-force Python reference with
    Fraction arithmetic."""
    from fractions import Fraction

    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.drift import drift_fp_by_group

    ds = rd.from_arrow(pa.table({
        "source": pa.array([g for g, _ in rows], pa.string()),
        "n_chars": pa.array([v for _, v in rows], pa.int64()),
    })).repartition(3)
    got = drift_fp_by_group(ds, "n_chars", "source", lo=0, hi=41, nbins=5)
    by = {g: k for g, k in zip(got["group"].to_pylist(),
                               got["ks_fp"].to_pylist())}
    vals = sorted({v for _, v in rows})
    N = len(rows)
    for grp in {g for g, _ in rows}:
        gv = [v for g, v in rows if g == grp]
        n_g = len(gv)
        best = Fraction(0)
        for v in vals:
            cg = sum(1 for x in gv if x <= v)
            ca = sum(1 for _, x in rows if x <= v)
            best = max(best, abs(Fraction(cg, n_g) - Fraction(ca, N)))
        want = (1_000_000 * best.numerator) // best.denominator
        assert by[grp] == want, (grp, by[grp], want, rows)


def test_r5_driver_window_composition_pinned():
    """The driver verifies exactly the first 50 queries() entries; pin the
    round-5 composition (crosslang red + 5 new oracle queries + the 44
    never-driver-checked backlog) so an accidental reorder can't silently
    push a never-verified query out of the window."""
    import __ray_entry__ as E

    qs = list(E.queries().keys())
    oracles = set(E.oracle_sql().keys())
    window = qs[:50]
    assert window[0] == "d_crosslang_dups"
    for q in ("a_drift_psi", "a_kind_psi", "a_profile_quantiles",
              "v_terminology", "t_char_entropy"):
        assert q in window, q
    assert all(q in oracles for q in window), [
        q for q in window if q not in oracles]
    assert len(set(window)) == 50


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x10FFFF,
                           blacklist_categories=("Cs",)),
    max_size=30), min_size=1, max_size=8))
def test_char_entropy_matches_python_reference(ray_session, texts):
    """Vectorized UCS-4 entropy == per-doc scalar reference (Counter +
    math.log2, same floored-contribution fixed point) for arbitrary
    unicode incl. CJK and astral-plane codepoints."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.textops import char_entropy

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)
    got = {r["doc_id"]: r for r in char_entropy(docs).take_all()}
    for i, s in enumerate(texts):
        if not s:
            assert i not in got
            continue
        c = Counter(s)
        n = sum(c.values())
        want = sum(math.floor(-1_000_000.0 * (k / n) * math.log2(k / n))
                   for k in c.values())
        assert got[i]["n_chars_counted"] == n
        assert got[i]["entropy_fp"] == want, (s, got[i], want)
