"""Event-time operators over the ``events`` table — the custom-operator
family Ray Data has no built-in for (windowed aggregates, sessionization,
as-of joins), each expressed as a composition of ``map_batches`` +
``groupby().map_groups`` per the build brief's custom-operator ladder.

Partitioning assumption (stated per the brief): one key's rows (one user's
events; one window's partials) fit in a worker. Keys here are ``user_id``;
hot users would be salted the same way as hot media_refs in
``stages/reference.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

US_PER_HOUR = 3_600_000_000


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
        da = pc.dictionary_encode(et)
        codes = np.asarray(da.indices).astype(np.int64)
        names = da.dictionary.to_pylist()
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
        da = pc.dictionary_encode(et)
        codes = np.asarray(da.indices).astype(np.int64)
        names = da.dictionary.to_pylist()
        total = np.bincount(codes, weights=np.asarray(g["n"])).astype(np.int64)
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


def sessionize(events, *, gap_us: int = 30 * 60 * 1_000_000):
    """Gap-based sessionization per user: a new session starts when the gap
    to the previous event exceeds ``gap_us``. One groupby(user_id) co-locates
    each user's events; within the group a sort + diff computes sessions.
    Returns Dataset[user_id, n_sessions, n_events, max_session_events]."""

    def sessions(g: pa.Table) -> pa.Table:
        ts = np.sort(pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False))
        new = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sess_id = np.cumsum(new) - 1
        sizes = np.bincount(sess_id)
        uid = int(g["user_id"][0].as_py())
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_sessions": pa.array([int(sizes.size)], pa.int64()),
                "n_events": pa.array([len(ts)], pa.int64()),
                "max_session_events": pa.array([int(sizes.max())], pa.int64()),
            }
        )

    return (
        events.select_columns(["user_id", "ts"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pyarrow")
    )


def range_join_counts(events, *, anchor_type: str = "purchase",
                      window_us: int = 5 * 60 * 1_000_000):
    """Range join: for each ``anchor_type`` event, count the same user's
    events within ``[ts - window, ts + window]`` (inclusive, excluding the
    anchor itself). One groupby(user_id); within the group a sorted-timestamp
    searchsorted answers every anchor's interval in O(log n).
    Returns Dataset[event_id, n_nearby]."""

    def ranges(g: pa.Table) -> pa.Table:
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = np.asarray(g["event_id"]).astype(np.int64)
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        is_anchor = pc.equal(et, anchor_type).to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts_s = ts[order]
        a_idx = np.flatnonzero(is_anchor)
        lo = np.searchsorted(ts_s, ts[a_idx] - window_us, side="left")
        hi = np.searchsorted(ts_s, ts[a_idx] + window_us, side="right")
        n = (hi - lo - 1).astype(np.int64)  # exclude the anchor itself
        return pa.table(
            {"event_id": pa.array(eid[a_idx]), "n_nearby": pa.array(n)}
        )

    return (
        events.select_columns(["event_id", "user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(ranges, batch_format="pyarrow")
    )


def asof_join_prev_event(events, *, right_type: str = "purchase"):
    """As-of join of every event against the SAME user's most recent
    strictly-earlier event of ``right_type`` — the "attach latest state as of
    time T" operator. One groupby(user_id); within the group both sides sort
    by ts and a searchsorted probes the right side. INNER semantics (events
    with no earlier match are dropped). Returns Dataset[event_id, matched_id].
    Deterministic tie-break: equal right timestamps resolve to the highest
    event_id (stable sort by (ts, event_id))."""

    def asof(g: pa.Table) -> pa.Table:
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = np.asarray(g["event_id"]).astype(np.int64)
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        is_right = pc.equal(et, right_type).to_numpy(zero_copy_only=False)
        r_order = np.lexsort((eid[is_right], ts[is_right]))
        r_ts = ts[is_right][r_order]
        r_id = eid[is_right][r_order]
        if r_ts.size == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "matched_id": pa.array([], pa.int64())})
        pos = np.searchsorted(r_ts, ts, side="left") - 1  # strictly earlier
        hit = pos >= 0
        return pa.table(
            {
                "event_id": pa.array(eid[hit]),
                "matched_id": pa.array(r_id[pos[hit]]),
            }
        )

    return (
        events.select_columns(["event_id", "user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(asof, batch_format="pyarrow")
    )
