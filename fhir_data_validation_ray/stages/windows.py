"""Event-time operators over the ``events`` table — the custom-operator
family Ray Data has no built-in for (windowed aggregates, sessionization,
as-of joins), each expressed as a composition of ``map_batches`` +
``groupby().map_groups`` per the build brief's custom-operator ladder.

Skew handling: a HOT user (90%+ of all events) must never require one
worker to hold all their rows, so every per-user operator shards by
``(user_id, time-block)`` and merges small per-block summaries in a second,
cheap per-user groupby:

- ``sessionize``: per-block session partials carry (first/last ts,
  first/last session size, interior max); a sequential merge over the
  user's block summaries stitches boundary sessions — the classic
  segmented-reduce shape.
- ``range_join_counts``: overlap banding — each row lands in its own block
  plus a neighbor block when within ``window_us`` of the boundary; anchors
  count only in their home block, so each group sees a bounded time slice.
- ``asof_join_prev_event``: two stages — rows with an in-block earlier
  match resolve locally; unresolved rows + one (latest purchase) summary
  per block meet in a per-user group whose size is blocks + unresolved
  rows, not all events.

Pass ``block_us=None`` to fall back to plain ``groupby(user_id)`` (tiny
corpora / debugging). Defaults shard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

US_PER_HOUR = 3_600_000_000

# (user, block) composite group key; user ids and block ids fit comfortably
_UB = np.int64(1 << 26)


def _ts_np(t: pa.Table) -> np.ndarray:
    return pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)


def _codes_with_null_group(arr: pa.Array) -> tuple[np.ndarray, list]:
    """Dictionary-encode a string column routing NULLs to their OWN group
    (name None) — null indices materialize as float NaN and a bare
    astype(int64) turns them into garbage keys (the
    ``tumbling_distinct_by_type`` convention, shared per ADVICE r4).
    Returns (int64 codes, dictionary names incl. trailing None if any)."""
    da = pc.dictionary_encode(arr)
    idx = da.indices.to_numpy(zero_copy_only=False)
    names = da.dictionary.to_pylist()
    if idx.dtype.kind == "f":  # nulls present
        nullm = idx != idx
        codes = np.where(nullm, len(names), idx).astype(np.int64)
        names = names + [None]
    else:
        codes = idx.astype(np.int64)
    return codes, names


def tumbling_window_counts(events, *, window_us: int = US_PER_HOUR):
    """Tumbling-window event counts by type: window_id = floor(epoch_us / w).
    Per-batch partial counts -> one LOW-cardinality groupby merge (windows x
    types, not events). Returns Dataset[window_id, event_type, n]."""

    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        win = ts // window_us
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes, names = _codes_with_null_group(et)
        uw, wi = np.unique(win, return_inverse=True)
        key = wi * len(names) + codes
        counts = np.bincount(key, minlength=len(uw) * len(names))
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "window_id": pa.array(uw[nz // len(names)]),
                "event_type": pa.array([names[i] for i in nz % len(names)], pa.string()),
                "n": pa.array(counts[nz].astype(np.int64)),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes, names = _codes_with_null_group(et)
        total = np.bincount(codes, weights=np.asarray(g["n"]),
                            minlength=len(names)).astype(np.int64)
        wid = int(g["window_id"][0].as_py())
        return pa.table(
            {
                "window_id": pa.array(np.full(len(names), wid, dtype=np.int64)),
                "event_type": pa.array(names, pa.string()),
                "n": pa.array(total),
            }
        )

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("window_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def tumbling_window_distinct(events, *, col: str = "user_id",
                             window_us: int = US_PER_HOUR):
    """Exact per-window distinct count of ``col``: per-batch (window, value)
    UNIQUE pairs -> groupby(window) -> per-group unique count. The shuffle
    moves pre-deduplicated pairs, never raw events.
    Returns Dataset[window_id, n_distinct]."""

    def pairs(t: pa.Table) -> pa.Table:
        win = _ts_np(t) // window_us
        v = np.asarray(t[col]).astype(np.int64)
        # the packed (window, value) key reserves 26 bits for the value; a
        # raw input id outside [0, 2^26) would silently bleed into the window
        # id and corrupt distinct counts — validate, don't assume (unlike
        # block ids, this bound is on user data)
        if len(v) and (v.min() < 0 or v.max() >= _UB):
            raise ValueError(
                f"tumbling_window_distinct: {col} values must be in [0, {int(_UB)}) "
                f"for packed dedup (got range [{int(v.min())}, {int(v.max())}]); "
                "remap ids or dedup on a two-column key"
            )
        key = np.unique(win * _UB + v)
        return pa.table(
            {"window_id": pa.array(key // _UB), "v": pa.array(key % _UB)}
        )

    def count(g: pa.Table) -> pa.Table:
        wid = int(g["window_id"][0].as_py())
        n = len(np.unique(np.asarray(g["v"])))
        return pa.table({"window_id": pa.array([wid], pa.int64()),
                         "n_distinct": pa.array([n], pa.int64())})

    return (
        events.select_columns([col, "ts"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("window_id")
        .map_groups(count, batch_format="pyarrow")
    )


def hopping_window_counts(events, *, window_us: int = US_PER_HOUR,
                          hop_us: int = US_PER_HOUR // 4):
    """Hopping (sliding) window event counts by type: windows of length
    ``window_us`` starting every ``hop_us`` (must divide ``window_us``);
    each event lands in ``window_us / hop_us`` windows. Same plan as
    tumbling: per-batch partial counts with the replication applied
    vectorized, then one LOW-cardinality groupby merge — the shuffle moves
    (window, type, count) partials, never events.
    Returns Dataset[window_id, event_type, n]; window w covers
    ``[w * hop, w * hop + window)``."""
    assert window_us % hop_us == 0, "hop must divide window"
    k = window_us // hop_us

    def partial(t: pa.Table) -> pa.Table:
        ts = _ts_np(t)
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes, names = _codes_with_null_group(et)
        base = ts // hop_us
        win = np.concatenate([base - j for j in range(k)])
        code_r = np.tile(codes, k)
        keep = win >= 0
        win, code_r = win[keep], code_r[keep]
        uw, wi = np.unique(win, return_inverse=True)
        key = wi * len(names) + code_r
        counts = np.bincount(key, minlength=len(uw) * len(names))
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "window_id": pa.array(uw[nz // len(names)]),
                "event_type": pa.array([names[i] for i in nz % len(names)], pa.string()),
                "n": pa.array(counts[nz].astype(np.int64)),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes, names = _codes_with_null_group(et)
        total = np.bincount(codes, weights=np.asarray(g["n"]),
                            minlength=len(names)).astype(np.int64)
        wid = int(g["window_id"][0].as_py())
        return pa.table(
            {
                "window_id": pa.array(np.full(len(names), wid, dtype=np.int64)),
                "event_type": pa.array(names, pa.string()),
                "n": pa.array(total),
            }
        )

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("window_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def stitch_block_summaries(cols: dict, gap_us: int) -> tuple[int, int, int]:
    """Sequential stitch of one user's TIME-ORDERED block summaries into
    (n_sessions, n_events, max_session_events). ``carry`` tracks the size of
    the currently-open trailing session; a block whose first event is within
    ``gap_us`` of the previous block's last event merges its first session
    into the carry. Pure function — property-tested against plain
    sessionization for arbitrary event multisets."""
    n_closed = 0
    max_size = 0
    carry = 0
    prev_last = None
    total_events = 0
    n = len(cols["first_ts"])
    for i in range(n):
        k = int(cols["n_sessions"][i])
        total_events += int(cols["n_events"][i])
        if prev_last is not None and int(cols["first_ts"][i]) - prev_last <= gap_us:
            carry += int(cols["first_count"][i])
            if k > 1:
                max_size = max(max_size, carry, int(cols["interior_max"][i]))
                n_closed += k - 1  # merged-first + interior sessions close
                carry = int(cols["last_count"][i])
        else:
            if prev_last is not None:
                max_size = max(max_size, carry)
                n_closed += 1
            if k == 1:
                carry = int(cols["n_events"][i])
            else:
                n_closed += k - 1
                max_size = max(
                    max_size, int(cols["first_count"][i]), int(cols["interior_max"][i])
                )
                carry = int(cols["last_count"][i])
        prev_last = int(cols["last_ts"][i])
    return n_closed + 1, total_events, max(max_size, carry)


def sessionize(events, *, gap_us: int = 30 * 60 * 1_000_000,
               block_us: int | None = 6 * US_PER_HOUR):
    """Gap-based sessionization per user: a new session starts when the gap
    to the previous event exceeds ``gap_us``.
    Returns Dataset[user_id, n_sessions, n_events, max_session_events].

    Skew-safe plan (default): shard by (user, ts // block_us); each shard
    computes its local sessions plus the boundary metadata needed to stitch
    (first/last ts, first/last session size, interior max); a per-user
    groupby over BLOCK SUMMARIES merges sequentially — a hot user costs one
    small summary row per block, never all events in one worker.
    ``block_us=None`` = plain groupby(user_id)."""

    def block_sessions(g: pa.Table) -> pa.Table:
        """One (user, block) shard -> one summary row."""
        ts = np.sort(_ts_np(g))
        new = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sizes = np.bincount(np.cumsum(new) - 1)
        uid = int(g["user_id"][0].as_py())
        interior = int(sizes[1:-1].max()) if sizes.size > 2 else 0
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "first_ts": pa.array([int(ts[0])], pa.int64()),
                "last_ts": pa.array([int(ts[-1])], pa.int64()),
                "n_events": pa.array([len(ts)], pa.int64()),
                "n_sessions": pa.array([int(sizes.size)], pa.int64()),
                "first_count": pa.array([int(sizes[0])], pa.int64()),
                "last_count": pa.array([int(sizes[-1])], pa.int64()),
                "interior_max": pa.array([interior], pa.int64()),
            }
        )

    def merge_blocks(g: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(g["first_ts"]), kind="stable")
        cols = {c: np.asarray(g[c])[order] for c in g.column_names}
        n_sessions, n_events, max_size = stitch_block_summaries(cols, gap_us)
        return pa.table(
            {
                "user_id": pa.array([int(cols["user_id"][0])], pa.int64()),
                "n_sessions": pa.array([n_sessions], pa.int64()),
                "n_events": pa.array([n_events], pa.int64()),
                "max_session_events": pa.array([max_size], pa.int64()),
            }
        )

    base = events.select_columns(["user_id", "ts"])
    if block_us is None:

        def sessions(g: pa.Table) -> pa.Table:
            s = block_sessions(g)
            return pa.table(
                {
                    "user_id": s["user_id"],
                    "n_sessions": s["n_sessions"],
                    "n_events": s["n_events"],
                    "max_session_events": pa.array(
                        [max(int(s["first_count"][0].as_py()),
                             int(s["last_count"][0].as_py()),
                             int(s["interior_max"][0].as_py()))], pa.int64()
                    ),
                }
            )

        return base.groupby("user_id").map_groups(sessions, batch_format="pyarrow")

    def add_ub(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"]).astype(np.int64)
        b = _ts_np(t) // block_us
        return t.append_column("ub", pa.array(u * _UB + b))

    return (
        base.map_batches(add_ub, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(block_sessions, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(merge_blocks, batch_format="pyarrow")
    )


def range_join_counts(events, *, anchor_type: str = "purchase",
                      window_us: int = 5 * 60 * 1_000_000,
                      block_us: int | None = US_PER_HOUR):
    """Range join: for each ``anchor_type`` event, count the same user's
    events within ``[ts - window, ts + window]`` (inclusive, excluding the
    anchor itself). Returns Dataset[event_id, n_nearby].

    Skew-safe plan (default): OVERLAP BANDING on (user, ts // block_us) —
    every row lands in its home block and is replicated into the adjacent
    block when within ``window_us`` of the boundary (replication factor
    <= 1 + 2*window/block); anchors count only in their home block, so each
    group holds one bounded time slice of one user, never a hot user's full
    history. ``block_us=None`` = plain groupby(user_id)."""
    assert block_us is None or block_us >= window_us, "block must cover the window"

    def ranges(g: pa.Table) -> pa.Table:
        ts = _ts_np(g)
        eid = np.asarray(g["event_id"]).astype(np.int64)
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        is_anchor = pc.equal(et, anchor_type).to_numpy(zero_copy_only=False)
        if "home" in g.column_names:
            is_anchor &= np.asarray(g["home"])
        order = np.argsort(ts, kind="stable")
        ts_s = ts[order]
        a_idx = np.flatnonzero(is_anchor)
        lo = np.searchsorted(ts_s, ts[a_idx] - window_us, side="left")
        hi = np.searchsorted(ts_s, ts[a_idx] + window_us, side="right")
        n = (hi - lo - 1).astype(np.int64)  # exclude the anchor itself
        return pa.table(
            {"event_id": pa.array(eid[a_idx]), "n_nearby": pa.array(n)}
        )

    base = events.select_columns(["event_id", "user_id", "ts", "event_type"])
    if block_us is None:
        return base.groupby("user_id").map_groups(ranges, batch_format="pyarrow")

    def band(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"]).astype(np.int64)
        ts = _ts_np(t)
        b = ts // block_us
        off = ts - b * block_us
        near_lo = (off < window_us) & (b >= 1)  # replicate into previous block
        near_hi = off >= block_us - window_us   # replicate into next block
        parts = [(np.arange(len(u)), b, True)]
        parts.append((np.flatnonzero(near_lo), b[near_lo] - 1, False))
        parts.append((np.flatnonzero(near_hi), b[near_hi] + 1, False))
        idx = np.concatenate([p[0] for p in parts])
        blk = np.concatenate([p[1] for p in parts])
        home = np.concatenate(
            [np.full(len(p[0]), p[2], dtype=bool) for p in parts]
        )
        taken = pa.array(idx)
        return pa.table(
            {
                "ub": pa.array(u[idx] * _UB + blk),
                "home": pa.array(home),
                "event_id": pc.take(t["event_id"], taken),
                "user_id": pc.take(t["user_id"], taken),
                "ts": pc.take(t["ts"], taken),
                "event_type": pc.take(t["event_type"], taken),
            }
        )

    return (
        base.map_batches(band, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(ranges, batch_format="pyarrow")
    )


def _asof_local(ts, eid, is_right):
    """(matched event_ids + matches, unresolved row mask). Tie-break:
    equal right timestamps resolve to the HIGHEST event_id."""
    r_order = np.lexsort((eid[is_right], ts[is_right]))
    r_ts = ts[is_right][r_order]
    r_id = eid[is_right][r_order]
    pos = np.searchsorted(r_ts, ts, side="left") - 1  # strictly earlier
    hit = pos >= 0
    return r_id[pos[hit]] if r_ts.size else np.empty(0, np.int64), hit


def asof_join_prev_event(events, *, right_type: str = "purchase",
                         block_us: int | None = 6 * US_PER_HOUR):
    """As-of join of every event against the SAME user's most recent
    strictly-earlier event of ``right_type`` — the "attach latest state as of
    time T" operator. INNER semantics (events with no earlier match are
    dropped). Returns Dataset[event_id, matched_id]. Deterministic
    tie-break: equal right timestamps resolve to the highest event_id.

    Skew-safe plan (default): two stages over (user, ts // block_us) shards.
    Rows with an in-block earlier match resolve locally and pass through;
    each block forwards only its UNRESOLVED rows plus one latest-purchase
    summary to a per-user group — a purchase in any earlier block is
    strictly earlier than every timestamp of a later block, so the latest
    earlier-block summary is the correct match. The per-user group holds
    blocks + unresolved rows, never a hot user's full history (assumption:
    events cluster so most rows resolve in-block; a user with zero
    right-type events forwards all rows but emits nothing).
    ``block_us=None`` = plain groupby(user_id)."""
    base = events.select_columns(["event_id", "user_id", "ts", "event_type"])

    def asof(g: pa.Table) -> pa.Table:
        ts = _ts_np(g)
        eid = np.asarray(g["event_id"]).astype(np.int64)
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        is_right = pc.equal(et, right_type).to_numpy(zero_copy_only=False)
        matched, hit = _asof_local(ts, eid, is_right)
        return pa.table(
            {"event_id": pa.array(eid[hit]), "matched_id": pa.array(matched)}
        )

    if block_us is None:
        return base.groupby("user_id").map_groups(asof, batch_format="pyarrow")

    def add_ub(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"]).astype(np.int64)
        b = _ts_np(t) // block_us
        return t.append_column("ub", pa.array(u * _UB + b))

    # stage-1 output rows, discriminated by ``kind``; ``g2`` routes matched
    # rows straight through pass-through groups (ub + 1 — always distinct
    # from the user's merge-group key user * _UB, even at block 0) while
    # unresolved rows + block summaries meet in the user's merge group
    K_MATCH, K_UNRES, K_SUMMARY = 0, 1, 2

    def block_asof(g: pa.Table) -> pa.Table:
        ts = _ts_np(g)
        eid = np.asarray(g["event_id"]).astype(np.int64)
        uid = int(g["user_id"][0].as_py())
        ub = int(g["ub"][0].as_py())
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        is_right = pc.equal(et, right_type).to_numpy(zero_copy_only=False)
        matched, hit = _asof_local(ts, eid, is_right)
        out_g2 = [np.full(int(hit.sum()), ub + 1, dtype=np.int64)]
        out_kind = [np.zeros(int(hit.sum()), dtype=np.int8)]
        out_a = [eid[hit]]
        out_b = [matched]
        unres = ~hit
        n_u = int(unres.sum())
        if n_u:
            out_g2.append(np.full(n_u, uid * _UB, dtype=np.int64))
            out_kind.append(np.full(n_u, K_UNRES, dtype=np.int8))
            out_a.append(eid[unres])
            out_b.append(ts[unres])
        if is_right.any():
            rts, rid = ts[is_right], eid[is_right]
            best = np.lexsort((rid, rts))[-1]
            out_g2.append(np.array([uid * _UB], dtype=np.int64))
            out_kind.append(np.array([K_SUMMARY], dtype=np.int8))
            out_a.append(np.array([rid[best]], dtype=np.int64))
            out_b.append(np.array([rts[best]], dtype=np.int64))
        return pa.table(
            {
                "g2": pa.array(np.concatenate(out_g2)),
                "kind": pa.array(np.concatenate(out_kind)),
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
            }
        )

    def merge_user(g: pa.Table) -> pa.Table:
        kind = np.asarray(g["kind"])
        a = np.asarray(g["a"]).astype(np.int64)
        b = np.asarray(g["b"]).astype(np.int64)
        if not (kind != K_MATCH).any():  # pass-through group of matched rows
            return pa.table({"event_id": pa.array(a), "matched_id": pa.array(b)})
        s = kind == K_SUMMARY
        u = kind == K_UNRES
        out_e = [a[kind == K_MATCH]]
        out_m = [b[kind == K_MATCH]]
        if s.any() and u.any():
            # summaries sorted by ts; the latest strictly-earlier purchase for
            # an unresolved row is the latest summary with ts < row ts
            order = np.lexsort((a[s], b[s]))
            s_ts, s_id = b[s][order], a[s][order]
            pos = np.searchsorted(s_ts, b[u], side="left") - 1
            hit = pos >= 0
            out_e.append(a[u][hit])
            out_m.append(s_id[pos[hit]])
        return pa.table(
            {
                "event_id": pa.array(np.concatenate(out_e)),
                "matched_id": pa.array(np.concatenate(out_m)),
            }
        )

    return (
        base.map_batches(add_ub, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(block_asof, batch_format="pyarrow")
        .groupby("g2")
        .map_groups(merge_user, batch_format="pyarrow")
    )


RETENTION_HORIZONS = (0, 1, 2, 3)
_WIN_BITS = 20  # packed (user, window) key reserves 20 bits for the window


def retention_cohorts(events, *, window_us: int = US_PER_HOUR,
                      horizons: tuple[int, ...] = RETENTION_HORIZONS,
                      num_buckets: int = 64):
    """Cohort retention — the classic at-scale events rollup: for every
    activity window w and horizon k, how many users active in w were ALSO
    active in w+k (horizon 0 = the cohort's active-user base). Feeds
    retention curves / DAU-overlap matrices.

    Plan: per-batch DISTINCT (user, window) pairs (packed int key, same
    guard discipline as ``tumbling_window_distinct``) -> one user-bucket
    groupby where each user's complete window set resolves membership for
    every horizon via one searchsorted per horizon (a hot user contributes
    at most n_windows rows — per-user state is bounded by the CALENDAR, not
    the event count) -> per-bucket (window, horizon) partial counts ->
    one tiny (window, horizon) groupby sum.

    Returns Dataset[window_id, horizon, n_users] (rows with n_users > 0)."""
    from ..stages.dedup import _intmix

    wincap = np.int64(1 << _WIN_BITS)

    def pairs(t: pa.Table) -> pa.Table:
        win = _ts_np(t) // window_us
        u = np.asarray(t["user_id"]).astype(np.int64)
        # strict headroom: win + max(horizon) must stay inside the packed
        # field or a +k probe would bleed into the next user's key space
        cap = int(wincap) - max(horizons)
        if len(win) and (win.min() < 0 or win.max() >= cap):
            raise ValueError(
                f"retention_cohorts: window ids must fit [0, {cap}) "
                f"(got [{int(win.min())}, {int(win.max())}]); raise _WIN_BITS "
                "or enlarge window_us")
        key = np.unique(u * wincap + win)
        uu = key // wincap
        return pa.table({
            "bucket": pa.array(_intmix(uu, num_buckets).astype(np.int32)),
            "u": pa.array(uu),
            "win": pa.array(key % wincap),
        })

    def horizon_partials(g: pa.Table) -> pa.Table:
        u = np.asarray(g["u"]).astype(np.int64)
        w = np.asarray(g["win"]).astype(np.int64)
        key = np.unique(u * wincap + w)  # re-dedup across batches
        out_w, out_h = [], []
        for k in horizons:
            if k == 0:
                hit = np.ones(len(key), dtype=bool)
            else:
                probe = key + k
                pos = np.searchsorted(key, probe)
                pos = np.clip(pos, 0, max(len(key) - 1, 0))
                # same user only: +k never crosses users (win + k < wincap
                # after the pairs() guard unless k spills a user boundary —
                # reject horizons that could)
                hit = (key[pos] == probe) if len(key) else np.zeros(0, bool)
            out_w.append((key % wincap)[hit])
            out_h.append(np.full(int(hit.sum()), k, dtype=np.int64))
        w_all = np.concatenate(out_w) if out_w else np.zeros(0, np.int64)
        h_all = np.concatenate(out_h) if out_h else np.zeros(0, np.int64)
        wh, cnt = np.unique(w_all * 8 + h_all, return_counts=True)
        return pa.table({
            "wh": pa.array(wh),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def final(g: pa.Table) -> pa.Table:
        wh = int(g["wh"][0].as_py())
        n = int(np.asarray(g["n"]).sum())
        return pa.table({
            "window_id": pa.array([wh // 8], pa.int64()),
            "horizon": pa.array([wh % 8], pa.int64()),
            "n_users": pa.array([n], pa.int64()),
        })

    if any(k < 0 or k >= 8 for k in horizons):
        raise ValueError("horizons must be in [0, 8) for the packed key")

    return (
        events.select_columns(["user_id", "ts"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(horizon_partials, batch_format="pyarrow")
        .groupby("wh")
        .map_groups(final, batch_format="pyarrow")
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_levels(events, *, steps: tuple[str, ...] = FUNNEL_STEPS,
                  block_us: int = 6 * US_PER_HOUR):
    """First-touch funnel — per user, the deepest step reached walking the
    ordered sequence steps[0] -> steps[1] -> ... where each step's event
    must be STRICTLY later than the previous step's match (the standard
    product-analytics funnel; greedy earliest-match is optimal for this
    semantics). Returns Dataset[level, n_users]: level 0 = users who never
    did steps[0], level len(steps) = full conversions.

    Skew-safe plan (sessionize's shard-and-stitch, with a twist): a
    per-user funnel scan is ORDER-dependent, but because time blocks are
    disjoint, a later block's events are all strictly later than any
    earlier block's match — so a (user, block) shard's whole effect is the
    finite map entry_level -> exit_level (S+1 small ints, no timestamps).
    That map is associative under composition: shard scans run bounded and
    parallel, then a per-user groupby composes one tiny map per block in
    block order. A hot user costs one map row per CALENDAR block, never all
    events in one worker. Per-batch-distinct identity presence rows keep
    never-stepping users in the level-0 denominator without shipping
    non-step events anywhere."""
    S = len(steps)
    step_lut = {s: i for i, s in enumerate(steps)}

    def step_rows(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        da = pc.dictionary_encode(et)
        lut = np.array([step_lut.get(v, -1) for v in da.dictionary.to_pylist()],
                       dtype=np.int64)
        step = lut[np.asarray(da.indices, dtype=np.int64)]
        u = np.asarray(t["user_id"]).astype(np.int64)
        ts = _ts_np(t)
        m = step >= 0
        return pa.table({
            "ub": pa.array(u[m] * _UB + ts[m] // block_us),
            "ts": pa.array(ts[m]),
            "step": pa.array(step[m]),
        })

    def block_map(g: pa.Table) -> pa.Table:
        ub = int(g["ub"][0].as_py())
        ts = np.asarray(g["ts"]).astype(np.int64)
        step = np.asarray(g["step"]).astype(np.int64)
        by_step = [np.sort(ts[step == s]) for s in range(S)]
        exits = []
        for j in range(S):
            lvl, t = j, -(1 << 62)
            while lvl < S:
                arr = by_step[lvl]
                pos = np.searchsorted(arr, t, side="right")
                if pos >= len(arr):
                    break
                t = int(arr[pos])
                lvl += 1
            exits.append(lvl)
        return pa.table({
            "user_id": pa.array([ub // int(_UB)], pa.int64()),
            "block": pa.array([ub % int(_UB)], pa.int64()),
            "exits": pa.array([exits], pa.list_(pa.int64())),
        })

    def presence(t: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(t["user_id"]).astype(np.int64))
        ident = [list(range(S))] * len(u)
        return pa.table({
            "user_id": pa.array(u),
            "block": pa.array(np.full(len(u), -1, dtype=np.int64)),
            "exits": pa.array(ident, pa.list_(pa.int64())),
        })

    def compose(g: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(g["block"]), kind="stable")
        ex = g["exits"]
        if isinstance(ex, pa.ChunkedArray):
            ex = ex.combine_chunks()
        flat = np.asarray(ex.values).astype(np.int64).reshape(-1, S)[order]
        lvl = 0
        for row in flat:
            lvl = int(row[lvl]) if lvl < S else S
        return pa.table({
            "user_id": pa.array([int(g["user_id"][0].as_py())], pa.int64()),
            "level": pa.array([lvl], pa.int64()),
        })

    def count_partial(t: pa.Table) -> pa.Table:
        lv = np.asarray(t["level"]).astype(np.int64)
        ul, cnt = np.unique(lv, return_counts=True)
        return pa.table({"level": pa.array(ul),
                         "n": pa.array(cnt.astype(np.int64))})

    def count_final(g: pa.Table) -> pa.Table:
        return pa.table({
            "level": pa.array([int(g["level"][0].as_py())], pa.int64()),
            "n_users": pa.array([int(np.asarray(g["n"]).sum())], pa.int64()),
        })

    base = events.select_columns(["user_id", "ts", "event_type"])
    maps = (base.map_batches(step_rows, batch_format="pyarrow")
            .groupby("ub").map_groups(block_map, batch_format="pyarrow"))
    pres = base.map_batches(presence, batch_format="pyarrow")
    return (
        maps.union(pres)
        .groupby("user_id").map_groups(compose, batch_format="pyarrow")
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("level").map_groups(count_final, batch_format="pyarrow")
    )


def interarrival_histogram(events, *, bucket_us: int = 60_000_000,
                           max_bucket: int = 128,
                           block_us: int = US_PER_HOUR):
    """Histogram of per-user inter-arrival times (consecutive-event ts
    deltas, ordered by (ts, event_id) per user) in linear ``bucket_us``
    buckets capped at ``max_bucket`` — the distribution the sessionize gap
    parameter and bot-burst detectors are read off.

    Skew-safe plan (the sessionize skeleton, split so nothing rides an
    exchange it doesn't need): shard (user, ts//block_us); each block
    emits its INTERNAL delta histogram (pre-aggregated; equal-ts runs
    contribute zero deltas, identical to SQL's lag multiset) plus one
    boundary summary row. The reduced stage-1 output MATERIALIZES (it is
    O(buckets + 1) per block, far smaller than the events), then only the
    summary rows flow through the per-user merge that adds cross-block
    deltas — last event of a block to the first event of the user's next
    non-empty block (always positive: blocks partition time) — so a hot
    user's merge group holds per-BLOCK summaries, never events, exactly
    like sessionize. A per-task combine + driver fold return the
    <= max_bucket+1 rows.

    Returns a pyarrow Table (bucket, n), nonzero buckets only."""
    import pyarrow.dataset  # noqa: F401

    from ..functions.collect import collect_table

    base = events.select_columns(["event_id", "user_id", "ts"])

    def add_ub(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"]).astype(np.int64)
        b = _ts_np(t) // block_us
        if len(u) and (u.min() < 0 or u.max() >= _UB):
            raise ValueError(
                f"interarrival_histogram: user_id must be in [0, {int(_UB)})")
        return t.append_column("ub", pa.array(u * _UB + b))

    def _bucketize(deltas: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        bucket = np.minimum(deltas // bucket_us, max_bucket)
        ub_, cnt = np.unique(bucket, return_counts=True)
        return ub_.astype(np.int64), cnt.astype(np.int64)

    def block_partial(g: pa.Table) -> pa.Table:
        ts = np.sort(_ts_np(g))
        user = int(np.asarray(g["user_id"])[0])
        block = int(np.asarray(g["ub"])[0]) % int(_UB)
        if len(ts) > 1:
            hb, hn = _bucketize(np.diff(ts))
        else:
            hb = hn = np.empty(0, np.int64)
        k = len(hb)
        return pa.table({
            "role": pa.array(np.r_[np.zeros(k, np.int8), np.int8(1)]),
            "user_id": pa.array(np.r_[np.zeros(k, np.int64), user]),
            "bucket": pa.array(np.r_[hb, np.int64(block)]),
            "n": pa.array(np.r_[hn, np.int64(ts[0])]),
            "last_ts": pa.array(np.r_[np.zeros(k, np.int64), np.int64(ts[-1])]),
        })

    def user_merge(g: pa.Table) -> pa.Table:
        blk = np.asarray(g["bucket"]).astype(np.int64)
        fts = np.asarray(g["n"]).astype(np.int64)
        lts = np.asarray(g["last_ts"]).astype(np.int64)
        order = np.argsort(blk)
        deltas = fts[order][1:] - lts[order][:-1]
        if not len(deltas):
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        hb, hn = _bucketize(deltas)
        return pa.table({"bucket": pa.array(hb), "n": pa.array(hn)})

    def combine(t: pa.Table) -> pa.Table:
        b = np.asarray(t["bucket"]).astype(np.int64)
        n = np.asarray(t["n"]).astype(np.int64)
        ub_, inv = np.unique(b, return_inverse=True)
        tot = np.zeros(len(ub_), np.int64)
        np.add.at(tot, inv, n)
        return pa.table({"bucket": pa.array(ub_), "n": pa.array(tot)})

    stage1 = (base.map_batches(add_ub, batch_format="pyarrow")
              .groupby("ub").map_groups(block_partial, batch_format="pyarrow")
              ).materialize()

    def only_hist(t: pa.Table) -> pa.Table:
        m = pc.equal(t["role"], 0)
        f = t.filter(m)
        return pa.table({"bucket": f["bucket"], "n": f["n"]})

    def only_summaries(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["role"], 1))

    boundary = (stage1.map_batches(only_summaries, batch_format="pyarrow")
                .groupby("user_id")
                .map_groups(user_merge, batch_format="pyarrow"))
    hist = stage1.map_batches(only_hist, batch_format="pyarrow")

    parts = collect_table(
        hist.union(boundary)
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([("bucket", pa.int64()), ("n", pa.int64())]),
    )
    return combine(parts) if parts.num_rows else parts


def transition_counts(events, *, block_us: int = US_PER_HOUR):
    """Per-user event-type transition matrix (Markov counts): for every
    consecutive event pair per user — ordered by (ts, event_id), the order
    ties MATTER here unlike the inter-arrival deltas — count (type_from,
    type_to). The behavioral-modeling companion to funnel_levels.

    Same split sessionize skeleton as ``interarrival_histogram``: in-block
    transition counts pre-aggregate per (user, time-block) group and bypass
    the per-user merge; one summary row per block (first/last event type
    under the same order) rides the merge for the cross-block transitions.
    Event types are low-cardinality, so every exchange row is a bounded
    (from, to, n) triple.

    Returns a pyarrow Table (type_from, type_to, n)."""
    from ..functions.collect import collect_table

    base = events.select_columns(["event_id", "user_id", "ts", "event_type"])

    def add_ub(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"]).astype(np.int64)
        b = _ts_np(t) // block_us
        if len(u) and (u.min() < 0 or u.max() >= _UB):
            raise ValueError(
                f"transition_counts: user_id must be in [0, {int(_UB)})")
        return t.append_column("ub", pa.array(u * _UB + b))

    def _pair_rows(tf: np.ndarray, tt: np.ndarray) -> pa.Table:
        keys = np.char.add(np.char.add(tf, "|"), tt)
        uk, cnt = np.unique(keys, return_counts=True)
        # reshape(-1, 3): empty uk would otherwise be 1-D (r5 probe)
        parts = np.char.partition(uk, "|").reshape(-1, 3)
        return pa.table({
            "role": pa.array(np.zeros(len(uk), np.int8)),
            "user_id": pa.array(np.zeros(len(uk), np.int64)),
            "type_from": pa.array(parts[:, 0].tolist(), pa.string()),
            "type_to": pa.array(parts[:, 2].tolist(), pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
            "block": pa.array(np.zeros(len(uk), np.int64)),
        })

    def block_partial(g: pa.Table) -> pa.Table:
        ts = _ts_np(g)
        eid = np.asarray(g["event_id"]).astype(np.int64)
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        types = et.to_numpy(zero_copy_only=False).astype("U")
        order = np.lexsort((eid, ts))
        types = types[order]
        user = int(np.asarray(g["user_id"])[0])
        block = int(np.asarray(g["ub"])[0]) % int(_UB)
        rows = _pair_rows(types[:-1], types[1:]) if len(types) > 1 else None
        summary = pa.table({
            "role": pa.array([np.int8(1)]),
            "user_id": pa.array([user], pa.int64()),
            "type_from": pa.array([str(types[0])], pa.string()),
            "type_to": pa.array([str(types[-1])], pa.string()),
            "n": pa.array([0], pa.int64()),
            "block": pa.array([block], pa.int64()),
        })
        return pa.concat_tables([rows, summary]) if rows is not None else summary

    def user_merge(g: pa.Table) -> pa.Table:
        blk = np.asarray(g["block"]).astype(np.int64)
        tf = np.asarray(g["type_from"]).astype("U")
        tt = np.asarray(g["type_to"]).astype("U")
        order = np.argsort(blk)
        # cross-block transition: last type of block i -> first type of i+1
        frm, to = tt[order][:-1], tf[order][1:]
        if not len(frm):
            return pa.table({"type_from": pa.array([], pa.string()),
                             "type_to": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = _pair_rows(frm, to)
        return pa.table({"type_from": t["type_from"],
                         "type_to": t["type_to"], "n": t["n"]})

    def combine(t: pa.Table) -> pa.Table:
        tf = np.asarray(t["type_from"]).astype("U")
        tt = np.asarray(t["type_to"]).astype("U")
        n = np.asarray(t["n"]).astype(np.int64)
        keys = np.char.add(np.char.add(tf, "|"), tt)
        order = np.argsort(keys, kind="stable")
        keys, n = keys[order], n[order]
        uk, start = np.unique(keys, return_index=True)
        tot = np.add.reduceat(n, start) if len(n) else np.empty(0, np.int64)
        # reshape(-1, 3): empty uk would otherwise be 1-D (r5 probe)
        parts = np.char.partition(uk, "|").reshape(-1, 3)
        return pa.table({
            "type_from": pa.array(parts[:, 0].tolist(), pa.string()),
            "type_to": pa.array(parts[:, 2].tolist(), pa.string()),
            "n": pa.array(tot.astype(np.int64)),
        })

    stage1 = (base.map_batches(add_ub, batch_format="pyarrow")
              .groupby("ub").map_groups(block_partial, batch_format="pyarrow")
              ).materialize()

    def only_pairs(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["role"], 0))
        return pa.table({"type_from": f["type_from"],
                         "type_to": f["type_to"], "n": f["n"]})

    def only_summaries(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["role"], 1))

    boundary = (stage1.map_batches(only_summaries, batch_format="pyarrow")
                .groupby("user_id")
                .map_groups(user_merge, batch_format="pyarrow"))
    pairs = stage1.map_batches(only_pairs, batch_format="pyarrow")

    parts = collect_table(
        pairs.union(boundary)
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([("type_from", pa.string()),
                                ("type_to", pa.string()),
                                ("n", pa.int64())]),
    )
    return combine(parts) if parts.num_rows else parts


def burst_windows(events, *, window_us: int = 10 * 60 * 1_000_000,
                  block_us: int | None = None):
    """Per-user burst detection: the maximum number of events inside ANY
    sliding ``window_us`` window anchored at an event — the abuse/bot dial
    of an event pipeline (count of events with ts in [t_i, t_i + W],
    inclusive, maximized over the user's events t_i; matches SQL
    ``count(*) OVER (... RANGE BETWEEN CURRENT ROW AND W FOLLOWING)``).

    Skew-safe shape (the (user, time-block) shard + boundary-duplication
    ladder): each event lands in its home block; an event within W of its
    block's START is ADDITIONALLY shipped to the previous block as
    countable-only (origin = 0) — a forward window anchored in block b can
    only reach into b+1 because block_us >= window_us is enforced. Per
    (user, block) group: one sort + two vectorized searchsorteds give every
    anchored count; per-user max folds through a second tiny groupby whose
    input is one row per (user, block).

    Returns Dataset[user_id, burst]."""
    if block_us is None:
        block_us = max(64 * window_us, US_PER_HOUR)
    if block_us < window_us:
        raise ValueError("burst_windows: block_us must be >= window_us "
                         "(a window may span at most two blocks)")

    def shard(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"]).astype(np.int64)
        ts = _ts_np(t)
        # +1 offset keeps the block-0 lookback key (b - 1) inside THIS
        # user's key range — u*_UB - 1 would collide with user u-1's
        # last block
        b = ts // block_us + 1
        if len(u) and (u.min() < 0 or u.max() >= _UB
                       or ts.min() < 0 or b.max() >= _UB):
            raise ValueError(
                "burst_windows: user_id must be in [0, 2**26) and ts "
                "nonnegative with ts // block_us < 2**26 - 1 for the "
                "packed (user, block) shard key")
        dup = (ts % block_us) < window_us
        ub = np.concatenate([u * _UB + b, (u[dup] * _UB + b[dup] - 1)])
        return pa.table({
            "ub": pa.array(ub),
            "user_id": pa.array(np.concatenate([u, u[dup]])),
            "ts": pa.array(np.concatenate([ts, ts[dup]])),
            "origin": pa.array(np.concatenate([
                np.ones(len(u), dtype=np.int8),
                np.zeros(int(dup.sum()), dtype=np.int8)])),
        })

    def block_burst(g: pa.Table) -> pa.Table:
        ts = np.sort(np.asarray(g["ts"]).astype(np.int64))
        origin = np.asarray(g["origin"]).astype(bool)
        anchors = np.asarray(g["ts"]).astype(np.int64)[origin]
        if anchors.size == 0:  # lookback-only group (no home events)
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "burst": pa.array([], pa.int64())})
        counts = (np.searchsorted(ts, anchors + window_us, side="right")
                  - np.searchsorted(ts, anchors, side="left"))
        return pa.table({
            "user_id": pa.array([int(g["user_id"][0].as_py())], pa.int64()),
            "burst": pa.array([int(counts.max())], pa.int64()),
        })

    def user_max(g: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pa.array([int(g["user_id"][0].as_py())], pa.int64()),
            "burst": pa.array([int(np.asarray(g["burst"]).max())], pa.int64()),
        })

    return (
        events.map_batches(shard, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(block_burst, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(user_max, batch_format="pyarrow")
    )


def out_of_order_counts(events, *, block_events: int = 4096):
    """Per-user out-of-order arrival audit — the ingest-quality dial that
    decides whether event-time operators (sessionize, asof, windows) can
    trust arrival order or need a watermark/reorder buffer: arrival order
    is ``event_id`` (the ingest sequence), and an event is LATE iff its
    ``ts`` is strictly below the running max ts of earlier-arriving events
    of the SAME user. Returns Dataset[user_id, n_events, n_late].

    Skew-safe plan over (user, event_id-block) shards: locally-late rows
    resolve inside their block; only one summary per block (block max ts)
    rides the per-user merge, which computes each block's INCOMING prefix
    max; still-candidate rows then meet their block's prefix max in a
    second block-keyed exchange — no group ever holds a hot user's full
    history even when the stream is perfectly ordered (the common case,
    where every row is a candidate). Stage-1 output materializes once and
    is filtered by role (the dedup-pipeline precedent), so nothing
    re-executes."""
    base = events.select_columns(["event_id", "user_id", "ts"])
    R_CAND, R_SUM, R_CNT, R_PFX = 0, 1, 2, 3
    NEG_INF = np.iinfo(np.int64).min

    def add_ub(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"]).astype(np.int64)
        e = np.asarray(t["event_id"]).astype(np.int64)
        b = e // block_events
        if len(u) and (u.min() < 0 or u.max() >= _UB or b.max() >= _UB - 1):
            raise ValueError(
                "out_of_order_counts: user_id must be in [0, 2**26) and "
                "event_id // block_events < 2**26 - 1; raise block_events")
        return t.append_column("ub", pa.array(u * _UB + b))

    def stage1(g: pa.Table) -> pa.Table:
        ts = _ts_np(g)
        eid = np.asarray(g["event_id"]).astype(np.int64)
        ub = int(g["ub"][0].as_py())
        uid = ub // int(_UB)
        block = ub % int(_UB)
        order = np.argsort(eid)  # event_id unique -> deterministic
        ts_o = ts[order]
        run = np.maximum.accumulate(ts_o)
        prev_max = np.concatenate(([NEG_INF], run[:-1]))
        late_local = ts_o < prev_max
        cand = ts_o[~late_local]
        keys = [np.full(len(cand), ub, dtype=np.int64),
                np.array([uid, uid], dtype=np.int64)]
        roles = [np.full(len(cand), R_CAND, dtype=np.int8),
                 np.array([R_SUM, R_CNT], dtype=np.int8)]
        a = [cand, np.array([block, len(ts_o)], dtype=np.int64)]
        b = [np.zeros(len(cand), dtype=np.int64),
             np.array([int(run[-1]), int(late_local.sum())], dtype=np.int64)]
        return pa.table({
            "key": pa.array(np.concatenate(keys)),
            "role": pa.array(np.concatenate(roles)),
            "a": pa.array(np.concatenate(a)),
            "b": pa.array(np.concatenate(b)),
        })

    s1 = (base.map_batches(add_ub, batch_format="pyarrow")
          .groupby("ub").map_groups(stage1, batch_format="pyarrow")
          .materialize())

    def only(role):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["role"], role))
        return f

    def prefix_rows(g: pa.Table) -> pa.Table:
        # one user's block summaries -> (ub, incoming prefix max) rows for
        # every block except the user's first
        uid = int(g["key"][0].as_py())
        blk = np.asarray(g["a"]).astype(np.int64)
        mx = np.asarray(g["b"]).astype(np.int64)
        order = np.argsort(blk)
        pfx = np.maximum.accumulate(mx[order])
        out_ub = uid * int(_UB) + blk[order][1:]
        return pa.table({
            "key": pa.array(out_ub),
            "role": pa.array(np.full(len(out_ub), R_PFX, dtype=np.int8)),
            "a": pa.array(pfx[:-1]),
            "b": pa.array(np.zeros(len(out_ub), dtype=np.int64)),
        })

    pfx = (s1.map_batches(only(R_SUM), batch_format="pyarrow")
           .groupby("key").map_groups(prefix_rows, batch_format="pyarrow"))

    def late_fold(g: pa.Table) -> pa.Table:
        role = np.asarray(g["role"])
        a = np.asarray(g["a"]).astype(np.int64)
        p = a[role == R_PFX]
        if len(p) == 0:  # first block of its user: nothing can be late
            return pa.table({"user": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_late": pa.array([], pa.int64())})
        late = int((a[role == R_CAND] < p[0]).sum())
        user = int(g["key"][0].as_py()) // int(_UB)
        return pa.table({"user": pa.array([user], pa.int64()),
                         "n_events": pa.array([0], pa.int64()),
                         "n_late": pa.array([late], pa.int64())})

    cand_late = (s1.map_batches(only(R_CAND), batch_format="pyarrow")
                 .union(pfx)
                 .groupby("key").map_groups(late_fold,
                                            batch_format="pyarrow"))

    def cnt_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["role"], R_CNT))
        return pa.table({
            "user": t["key"].cast(pa.int64()),
            "n_events": t["a"].cast(pa.int64()),
            "n_late": t["b"].cast(pa.int64()),
        })

    def user_fold(g: pa.Table) -> pa.Table:
        u = np.asarray(g["user"]).astype(np.int64)
        return pa.table({
            "user_id": pa.array([int(u[0])], pa.int64()),
            "n_events": pa.array([int(np.asarray(g["n_events"]).sum())],
                                 pa.int64()),
            "n_late": pa.array([int(np.asarray(g["n_late"]).sum())],
                               pa.int64()),
        })

    return (s1.map_batches(cnt_rows, batch_format="pyarrow")
            .union(cand_late)
            .groupby("user").map_groups(user_fold, batch_format="pyarrow"))


def tumbling_distinct_by_type(events, *, col: str = "user_id",
                              window_us: int = US_PER_HOUR):
    """Per-(window, event_type) exact distinct count of ``col`` — the
    per-feature DAU/engagement breakdown next to the global
    ``tumbling_window_distinct``. Same pre-deduplicated exchange: per
    batch, for each event type present (low-cardinality), UNIQUE packed
    (window, value) pairs; the groupby key is the composite
    "window|type" string so no global type-id table is needed.
    Returns Dataset[window_id, event_type, n_distinct]."""

    def pairs(t: pa.Table) -> pa.Table:
        win = _ts_np(t) // window_us
        v = np.asarray(t[col]).astype(np.int64)
        if len(v) and (v.min() < 0 or v.max() >= _UB):
            raise ValueError(
                f"tumbling_distinct_by_type: {col} values must be in "
                f"[0, {int(_UB)}) for packed dedup")
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        da = pc.dictionary_encode(et)
        idx = da.indices.to_numpy(zero_copy_only=False)
        # a NULL event_type yields null indices (float NaN after to_numpy);
        # SQL GROUP BY keeps a NULL group, so route them to their own
        # (-1, None) group instead of silently dropping (or worse,
        # int64-min-casting) them
        if idx.dtype.kind == "f":
            nullm = idx != idx
            codes = np.where(nullm, -1.0, idx).astype(np.int64)
        else:
            nullm = np.zeros(len(idx), dtype=bool)
            codes = idx.astype(np.int64)
        groups = list(enumerate(da.dictionary.to_pylist()))
        if nullm.any():
            groups.append((-1, None))
        out_key, out_win, out_type, out_v = [], [], [], []
        for ci, tname in groups:
            m = codes == ci
            key = np.unique(win[m] * _UB + v[m])
            # 'T'-prefixed real types vs the bare 'N' null tag — no name
            # can collide with the null group
            tag = "N" if tname is None else "T" + tname
            out_key.append(np.char.add(
                (key // _UB).astype("U"), f"|{tag}"))
            out_win.append(key // _UB)
            out_type.extend([tname] * len(key))
            out_v.append(key % _UB)
        return pa.table({
            "g": pa.array(np.concatenate(out_key) if out_key else
                          np.array([], dtype="U1")),
            "window_id": pa.array(
                np.concatenate(out_win) if out_win else
                np.array([], dtype=np.int64)),
            "event_type": pa.array(out_type, pa.string()),
            "v": pa.array(np.concatenate(out_v) if out_v else
                          np.array([], dtype=np.int64)),
        })

    def count(g: pa.Table) -> pa.Table:
        n = len(np.unique(np.asarray(g["v"])))
        tv = g["event_type"][0].as_py()  # may be None (NULL-type group)
        return pa.table({
            "window_id": pa.array([int(g["window_id"][0].as_py())],
                                  pa.int64()),
            "event_type": pa.array([tv], pa.string()),
            "n_distinct": pa.array([n], pa.int64()),
        })

    return (
        events.select_columns([col, "ts", "event_type"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("g")
        .map_groups(count, batch_format="pyarrow")
    )


def props_rollup(events, *, key: str = "k"):
    """Typed JSON property extraction + per-event-type rollup: pull the
    integer property ``key`` out of the flat JSON ``props`` string column
    with ONE vectorized regex (``pc.extract_regex``; the scan is
    specialized to the flat ``{"key": int}`` property-bag shape — a nested
    path would need a real JSON kernel) and aggregate per event_type.
    Missing/unparseable keys count into ``n_events`` but not into
    ``n_with_key``/``sum_v``/``min_v``/``max_v`` (SQL aggregate-over-NULL
    semantics; a NULL event_type keeps its own group, like
    ``tumbling_distinct_by_type``).

    Per batch the rows collapse to one partial per event type present
    (low-cardinality), so the exchange carries O(n_batches x types) rows;
    the final groupby folds sums and nullable min/max.

    Returns Dataset[event_type, n_events, n_with_key, sum_v, min_v,
    max_v]."""
    import re as _re

    pat = rf'"{_re.escape(key)}"\s*:\s*(?P<v>-?\d+)'

    def partial(t: pa.Table) -> pa.Table:
        props = t["props"]
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        v = pc.cast(pc.struct_field(pc.extract_regex(props, pat), "v"),
                    pa.int64())
        vnp = v.to_numpy(zero_copy_only=False)
        if vnp.dtype.kind == "f":
            valid = vnp == vnp
            vi = np.where(valid, np.nan_to_num(vnp), 0).astype(np.int64)
        else:
            valid = np.ones(len(vnp), dtype=bool)
            vi = vnp.astype(np.int64)
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        da = pc.dictionary_encode(et)
        idx = da.indices.to_numpy(zero_copy_only=False)
        if idx.dtype.kind == "f":
            nullm = idx != idx
            codes = np.where(nullm, -1.0, idx).astype(np.int64)
        else:
            nullm = np.zeros(len(idx), dtype=bool)
            codes = idx.astype(np.int64)
        groups = list(enumerate(da.dictionary.to_pylist()))
        if nullm.any():
            groups.append((-1, None))
        g_key, g_type = [], []
        n_ev, n_wk, s_v, mn_v, mx_v = [], [], [], [], []
        for ci, tname in groups:
            m = codes == ci
            mv = m & valid
            g_key.append("N" if tname is None else "T" + tname)
            g_type.append(tname)
            n_ev.append(int(m.sum()))
            n_wk.append(int(mv.sum()))
            s_v.append(int(vi[mv].sum()))
            mn_v.append(int(vi[mv].min()) if mv.any() else None)
            mx_v.append(int(vi[mv].max()) if mv.any() else None)
        return pa.table({
            "g": pa.array(g_key, pa.string()),
            "event_type": pa.array(g_type, pa.string()),
            "n_events": pa.array(n_ev, pa.int64()),
            "n_with_key": pa.array(n_wk, pa.int64()),
            "sum_v": pa.array(s_v, pa.int64()),
            "min_v": pa.array(mn_v, pa.int64()),
            "max_v": pa.array(mx_v, pa.int64()),
        })

    def fold(g: pa.Table) -> pa.Table:
        tv = g["event_type"][0].as_py()
        mins = [x for x in g["min_v"].to_pylist() if x is not None]
        maxs = [x for x in g["max_v"].to_pylist() if x is not None]
        return pa.table({
            "event_type": pa.array([tv], pa.string()),
            "n_events": pa.array(
                [int(np.asarray(g["n_events"]).sum())], pa.int64()),
            "n_with_key": pa.array(
                [int(np.asarray(g["n_with_key"]).sum())], pa.int64()),
            "sum_v": pa.array(
                [int(np.asarray(g["sum_v"]).sum())], pa.int64()),
            "min_v": pa.array([min(mins) if mins else None], pa.int64()),
            "max_v": pa.array([max(maxs) if maxs else None], pa.int64()),
        })

    return (
        events.select_columns(["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )


def upsert_latest(events, *, num_buckets: int = 256,
                  batch_size: int | None = None):
    """Latest-state compaction — the CDC / upsert-merge primitive: one
    surviving row per user, the event with the greatest (ts, event_id).

    Per-batch argmax partials cut the exchange to <= n_distinct_users rows
    per batch (a change-log where one key updates often compacts near the
    source); a user-hash-bucket groupby then picks the global winner with
    the same deterministic event_id tie-break, so the result is independent
    of partitioning. Returns Dataset[user_id, event_id, ts_us, event_type,
    value] — the full latest row per key, ts as epoch micros."""

    def _winners(t: pa.Table, tag_bucket: bool) -> pa.Table:
        user = np.asarray(t["user_id"]).astype(np.int64)
        ts = np.asarray(t["ts_us"] if "ts_us" in t.column_names
                        else pc.cast(t["ts"], pa.int64())).astype(np.int64)
        eid = np.asarray(t["event_id"]).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u_s = user[order]
        last = np.ones(len(u_s), dtype=bool)
        last[:-1] = u_s[1:] != u_s[:-1]
        take = pa.array(order[last])
        cols = {
            "user_id": pa.array(u_s[last]),
            "event_id": pa.array(eid[order][last]),
            "ts_us": pa.array(ts[order][last]),
            "event_type": pc.take(t["event_type"], take),
            "value": pc.take(t["value"], take),
        }
        if tag_bucket:
            cols["bucket"] = pa.array(
                (u_s[last] % num_buckets).astype(np.int32))
        return pa.table(cols)

    def partial(t: pa.Table) -> pa.Table:
        return _winners(t, True)

    def final(g: pa.Table) -> pa.Table:
        return _winners(g, False)

    return (
        events.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size)
        .groupby("bucket")
        .map_groups(final, batch_format="pyarrow")
    )


def session_paths(events, *, gap_us: int = 30 * 60 * 1_000_000,
                  k: int = 3, block_us: int = 6 * US_PER_HOUR):
    """Session-prefix path mining: for every gap-based session (the
    ``sessionize`` definition), the path is the session's first ``k`` event
    types ordered by (ts, event_id), joined by ``>``; returns global path
    frequencies — the product-analytics "top user journeys" rollup.

    Skew-safe plan (the split sessionize skeleton): shard by
    (user, ts // block_us); each shard closes its INTERIOR sessions locally
    and emits their paths pre-aggregated (role 0), plus one boundary
    summary row (role 1) carrying the first/last session's capped path —
    a path is at most ``k`` short type names, so summaries stay bounded no
    matter how hot the user. The per-user merge walks block summaries in
    time order, stitching boundary sessions by the same gap rule and
    concatenating capped paths (a carry shorter than ``k`` types is the
    session's exact prefix, so extension is lossless). Path cardinality is
    bounded by the event-type vocabulary ** k, so the final fold is a
    value-count exchange, never corpus-sized.

    Returns a pyarrow Table (path, n_sessions)."""
    from ..functions.collect import collect_table

    base = events.select_columns(["event_id", "user_id", "ts", "event_type"])

    def add_ub(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"]).astype(np.int64)
        b = _ts_np(t) // block_us
        if len(u) and (u.min() < 0 or u.max() >= _UB):
            raise ValueError(
                f"session_paths: user_id must be in [0, {int(_UB)})")
        return t.append_column("ub", pa.array(u * _UB + b))

    def _session_paths_arr(types: pa.Array, starts: np.ndarray,
                           sizes: np.ndarray) -> pa.Array:
        """Vectorized per-session prefix paths: k fixed take+concat passes
        over the sorted type column (no per-session Python loop)."""
        pieces = []
        for j in range(k):
            valid = sizes > j
            idx = np.where(valid, starts + j, 0)
            tj = types.take(pa.array(idx, pa.int64()))
            if j > 0:
                tj = pc.binary_join_element_wise(
                    pa.scalar(">"), tj, pa.scalar(""))
            pieces.append(pc.if_else(pa.array(valid), tj, pa.scalar("")))
        if len(pieces) == 1:
            return pieces[0]
        return pc.binary_join_element_wise(*pieces, pa.scalar(""))

    def _path_rows(paths: pa.Array) -> dict:
        vc = pc.value_counts(paths)
        up = vc.field("values")
        cnt = np.asarray(vc.field("counts")).astype(np.int64)
        z = np.zeros(len(up), np.int64)
        return {
            "role": pa.array(np.zeros(len(up), np.int8)),
            "user_id": pa.array(z),
            "path": up.cast(pa.string()),
            "n": pa.array(cnt),
            "block": pa.array(z),
            "first_ts": pa.array(z),
            "last_ts": pa.array(z),
            "first_path": pa.array([""] * len(up), pa.string()),
            "last_path": pa.array([""] * len(up), pa.string()),
            "n_sessions": pa.array(z),
        }

    def block_partial(g: pa.Table) -> pa.Table:
        ts = _ts_np(g)
        eid = np.asarray(g["event_id"]).astype(np.int64)
        order = np.lexsort((eid, ts))
        ts = ts[order]
        types = g["event_type"]
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        types = types.take(pa.array(order, pa.int64()))
        new = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(new) - 1
        sizes = np.bincount(sid)
        starts = np.zeros(len(sizes), np.int64)
        np.cumsum(sizes[:-1], out=starts[1:])
        paths = _session_paths_arr(types, starts, sizes)
        ns = len(sizes)
        interior = _path_rows(paths.slice(1, ns - 2) if ns > 2
                              else paths.slice(0, 0))
        user = int(np.asarray(g["user_id"])[0])
        block = int(np.asarray(g["ub"])[0]) % int(_UB)
        summary = {
            "role": pa.array([1], pa.int8()),
            "user_id": pa.array([user], pa.int64()),
            "path": pa.array([""], pa.string()),
            "n": pa.array([0], pa.int64()),
            "block": pa.array([block], pa.int64()),
            "first_ts": pa.array([int(ts[0])], pa.int64()),
            "last_ts": pa.array([int(ts[-1])], pa.int64()),
            "first_path": paths.slice(0, 1),
            "last_path": paths.slice(ns - 1, 1),
            "n_sessions": pa.array([ns], pa.int64()),
        }
        return pa.concat_tables([pa.table(interior), pa.table(summary)])

    def _extend(carry: str, nxt: str) -> str:
        """Concatenate capped prefix paths, re-capping at k types. A carry
        with fewer than k types is the exact session prefix so far, so
        appending the next fragment's leading types is lossless."""
        have = carry.split(">")
        if len(have) >= k:
            return carry
        more = nxt.split(">")[: k - len(have)]
        return ">".join(have + more)

    def user_merge(g: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(g["first_ts"]).astype(np.int64),
                           kind="stable")
        fts = np.asarray(g["first_ts"]).astype(np.int64)[order]
        lts = np.asarray(g["last_ts"]).astype(np.int64)[order]
        ns = np.asarray(g["n_sessions"]).astype(np.int64)[order]
        fp = g["first_path"].to_pylist()
        lp = g["last_path"].to_pylist()
        fp = [fp[i] for i in order]
        lp = [lp[i] for i in order]
        closed: dict[str, int] = {}
        carry: str | None = None
        prev_last = None
        for i in range(len(fts)):
            if carry is not None and fts[i] - prev_last <= gap_us:
                merged = _extend(carry, fp[i])
                if ns[i] == 1:
                    carry = merged
                else:
                    closed[merged] = closed.get(merged, 0) + 1
                    carry = lp[i]
            else:
                if carry is not None:
                    closed[carry] = closed.get(carry, 0) + 1
                if ns[i] == 1:
                    carry = fp[i]
                else:
                    closed[fp[i]] = closed.get(fp[i], 0) + 1
                    carry = lp[i]
            prev_last = lts[i]
        if carry is not None:
            closed[carry] = closed.get(carry, 0) + 1
        return pa.table({
            "path": pa.array(list(closed.keys()), pa.string()),
            "n": pa.array(list(closed.values()), pa.int64()),
        })

    def combine(t: pa.Table) -> pa.Table:
        p = t["path"]
        if isinstance(p, pa.ChunkedArray):
            p = p.combine_chunks()
        da = pc.dictionary_encode(p)
        gi = np.asarray(da.indices, dtype=np.int64)
        n = np.asarray(t["n"]).astype(np.int64)
        tot = np.zeros(len(da.dictionary), np.int64)
        np.add.at(tot, gi, n)
        return pa.table({"path": da.dictionary, "n": pa.array(tot)})

    stage1 = (base.map_batches(add_ub, batch_format="pyarrow")
              .groupby("ub").map_groups(block_partial, batch_format="pyarrow")
              ).materialize()

    def only_paths(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["role"], 0))
        return pa.table({"path": f["path"], "n": f["n"]})

    def only_summaries(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["role"], 1))

    boundary = (stage1.map_batches(only_summaries, batch_format="pyarrow")
                .groupby("user_id")
                .map_groups(user_merge, batch_format="pyarrow"))
    local = stage1.map_batches(only_paths, batch_format="pyarrow")

    parts = collect_table(
        local.union(boundary)
        .map_batches(combine, batch_format="pyarrow", batch_size=64),
        empty_schema=pa.schema([("path", pa.string()), ("n", pa.int64())]),
    )
    out = combine(parts) if parts.num_rows else parts
    return out.rename_columns(["path", "n_sessions"])


def conversion_lag_quantiles(events, *, from_type: str = "view",
                             to_type: str = "purchase",
                             unit_us: int = 1_000_000,
                             num_buckets: int = 64):
    """Exact quantiles of the per-user conversion lag: first ``to_type``
    timestamp minus first ``from_type`` timestamp (non-negative lags only
    — a purchase observed before any view is attribution noise), in
    ``unit_us`` units — the funnel-latency companion to ``funnel_levels``
    (how LONG conversion takes, not how many convert).

    Scale shape: per-batch min-ts partials per (user, which-anchor) bound
    the exchange at 2 rows per user per batch; one user-bucket groupby
    resolves global firsts and emits one integer lag per converting user;
    the exact-quantile value-count fold (``stats.exact_int_quantiles``)
    finishes — state bounded by the lag cardinality in units, never user
    count.

    Returns a one-row pyarrow Table (col, n, p25, p50, p75, p95)."""
    from .stats import exact_int_quantiles

    def partial(t: pa.Table) -> pa.Table:
        ty = t["event_type"]
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        is_a = np.asarray(pc.equal(ty, from_type)).astype(bool)
        is_b = np.asarray(pc.equal(ty, to_type)).astype(bool)
        keep = is_a | is_b
        u = np.asarray(t["user_id"]).astype(np.int64)[keep]
        ts = _ts_np(t)[keep]
        r = is_b[keep].astype(np.int64)
        key = u * 2 + r
        uk, inv = np.unique(key, return_inverse=True)
        mn = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, ts)
        return pa.table({
            "bucket": pa.array(
                ((uk // 2) % num_buckets).astype(np.int32)),
            "key": pa.array(uk),
            "ts_min": pa.array(mn),
        })

    def lag_fold(g: pa.Table) -> pa.Table:
        key = np.asarray(g["key"]).astype(np.int64)
        ts = np.asarray(g["ts_min"]).astype(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        mn = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, ts)
        # converting users: key 2u (first from_type) and 2u+1 (first
        # to_type) adjacent in the sorted unique keys
        both = (uk[:-1] % 2 == 0) & (uk[1:] == uk[:-1] + 1) \
            if len(uk) > 1 else np.zeros(0, bool)
        lag = mn[1:][both] - mn[:-1][both]
        lag = lag[lag >= 0] // unit_us
        return pa.table({"lag": pa.array(lag.astype(np.int64))})

    lags = (events.select_columns(["user_id", "ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").map_groups(lag_fold, batch_format="pyarrow"))
    return exact_int_quantiles(lags, "lag")


def cusum_alarms(events, *, window_us: int = US_PER_HOUR, h_mult: int = 3):
    """Integer CUSUM change-point detection per event type over tumbling
    windows — the rate-shift / incident dial on an event stream: with
    per-present-window drift allowance k = ceil(mean count), the CUSUM
    statistic S_t = max(0, S_{t-1} + n_t - k) rises only under sustained
    above-mean rates and alarms at S_t >= h_mult * k.

    No recursion anywhere: S_t has the closed form P_t - min(0, running
    min of P) with P = cumsum(n - k), so both the engine (one vectorized
    pass per type group) and the oracle (two window functions) are
    integer-exact. The exchange is the LOW-cardinality
    ``tumbling_window_counts`` fold (windows x types, never events); the
    per-type series group is bounded by the window count. Windows with
    zero events are absent from the series (documented: gaps are skipped,
    matching the counts-derived oracle).

    Returns Dataset[event_type, window_id, n, s, alarm]."""

    counts = tumbling_window_counts(events, window_us=window_us)

    def per_type(g: pa.Table) -> pa.Table:
        w = np.asarray(g["window_id"]).astype(np.int64)
        n = np.asarray(g["n"]).astype(np.int64)
        order = np.argsort(w)
        w, n = w[order], n[order]
        total, nw = int(n.sum()), len(n)
        k = -(-total // nw)  # ceil mean per present window
        p = np.cumsum(n - k)
        s = p - np.minimum(np.minimum.accumulate(p), 0)
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        return pa.table({
            "event_type": pa.array([et[0].as_py()] * nw, pa.string()),
            "window_id": pa.array(w),
            "n": pa.array(n),
            "s": pa.array(s),
            "alarm": pa.array((s >= h_mult * k).astype(np.int64)),
        })

    return counts.groupby("event_type").map_groups(
        per_type, batch_format="pyarrow")


def k_anonymity_audit(events, *, window_us: int = US_PER_HOUR,
                      ks: tuple[int, ...] = (2, 5, 10)):
    """k-anonymity audit over the (event_type, hour-window) quasi-identifier
    combination — the re-identification-risk dial on an event stream: a
    combo observed on fewer than k rows isolates its users; the audit
    reports, per threshold k, how many combos and how many underlying rows
    sit below it (Sweeney 2002 semantics at combo granularity).

    Rides the LOW-cardinality ``tumbling_window_counts`` fold (windows x
    types, never events); each counts batch emits one partial row per k
    and a k-groupby sums them — O(|ks|) result, O(1) driver state.

    Returns Dataset[k, groups_below, rows_below]."""
    counts = tumbling_window_counts(events, window_us=window_us)
    ks_arr = np.asarray(sorted(ks), np.int64)

    def partial(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"]).astype(np.int64)
        below = n[:, None] < ks_arr[None, :]
        return pa.table({
            "k": pa.array(ks_arr),
            "groups_below": pa.array(below.sum(axis=0).astype(np.int64)),
            "rows_below": pa.array((n[:, None] * below).sum(axis=0)
                                   .astype(np.int64)),
        })

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["k"],
                         "groups_below": t["sum(groups_below)"],
                         "rows_below": t["sum(rows_below)"]})

    return (counts.map_batches(partial, batch_format="pyarrow")
            .groupby("k").sum(["groups_below", "rows_below"])
            .map_batches(rename, batch_format="pyarrow"))


def autocorr_windows(events, *, window_us: int = US_PER_HOUR,
                     lags: tuple[int, ...] = (1, 2, 24)):
    """Integer lag-k autocovariance numerators of the per-type tumbling
    window-count series — the periodicity / burst-cycle dial (a daily
    cycle shows as a positive lag-24 numerator on hourly windows): for
    each event type and lag k, over the P aligned pairs (t, t+k) BOTH
    present in the counts series,
    ``num`` = P·Σ n_t·n_{t+k} − (Σ n_t)·(Σ n_{t+k}) — the cross-scaled
    covariance numerator, sign-exact and division-free, so the oracle is
    bitwise. Absent (zero-event) windows are skipped, matching the
    counts-derived series on both sides (the ``cusum_alarms`` gap
    semantics).

    Rides the LOW-cardinality ``tumbling_window_counts`` fold; each
    bounded type group sorts its own series once and matches t+k by
    searchsorted for all lags — O(|series|·|lags|) per type, no
    corpus-sized state anywhere.

    Returns Dataset[event_type, lag, n_pairs, num]."""
    counts = tumbling_window_counts(events, window_us=window_us)
    lags_arr = tuple(int(x) for x in lags)

    def per_type(g: pa.Table) -> pa.Table:
        w = np.asarray(g["window_id"]).astype(np.int64)
        n = np.asarray(g["n"]).astype(np.int64)
        order = np.argsort(w)
        w, n = w[order], n[order]
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        rows_lag, rows_p, rows_num = [], [], []
        for k in lags_arr:
            pos = np.searchsorted(w, w + k)
            ok = (pos < len(w))
            ok[ok] &= w[pos[ok]] == (w + k)[ok]
            x, y = n[ok], n[pos[ok]]
            p = int(ok.sum())
            rows_lag.append(k)
            rows_p.append(p)
            rows_num.append(int(p * int((x * y).sum())
                                - int(x.sum()) * int(y.sum())))
        return pa.table({
            "event_type": pa.array([et[0].as_py()] * len(lags_arr),
                                   pa.string()),
            "lag": pa.array(np.asarray(rows_lag, np.int64)),
            "n_pairs": pa.array(np.asarray(rows_p, np.int64)),
            "num": pa.array(np.asarray(rows_num, np.int64)),
        })

    return counts.groupby("event_type").map_groups(
        per_type, batch_format="pyarrow")


def l_diversity_audit(events, *, window_us: int = US_PER_HOUR,
                      ls: tuple[int, ...] = (2, 5, 10)):
    """l-diversity audit over the (event_type, hour-window) quasi-identifier
    combination — the sensitive-attribute companion to
    ``k_anonymity_audit`` (Machanavajjhala et al. 2007 semantics at combo
    granularity): a combo whose rows belong to fewer than l DISTINCT users
    lets an observer who locates a target in the combo narrow them to
    under l candidates, however many rows it holds. Per threshold l,
    report how many combos carry fewer than l distinct users.

    Rides the pre-deduplicated ``tumbling_distinct_by_type`` exchange
    (batch-unique (window, user) pairs per type — never event rows); each
    distinct-count batch emits one O(|ls|) partial row and an l-groupby
    sums them. Returns Dataset[l, combos_below]."""
    counts = tumbling_distinct_by_type(events, window_us=window_us)
    ls_arr = np.asarray(sorted(ls), np.int64)

    def partial(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_distinct"]).astype(np.int64)
        below = n[:, None] < ls_arr[None, :]
        return pa.table({
            "l": pa.array(ls_arr),
            "combos_below": pa.array(below.sum(axis=0).astype(np.int64)),
        })

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"l": t["l"],
                         "combos_below": t["sum(combos_below)"]})

    return (counts.map_batches(partial, batch_format="pyarrow")
            .groupby("l").sum("combos_below")
            .map_batches(rename, batch_format="pyarrow"))
