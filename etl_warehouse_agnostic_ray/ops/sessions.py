"""Gap-based sessionization over an event stream.

The canonical web-analytics operator the reference's event tables
imply but never compute (its dbt models stop at per-day rollups,
e.g. dbt/models/curated/repsly/visits.sql groups by date only):
assign each event a per-user session number, where a new session
starts after `gap` of inactivity.

Ray-Data shape (100-TB discipline):
- ONE keyed exchange: events are hash-partitioned by a coarse
  user-bucket key computed in the batch (splitmix64(user_id) % P), so
  the shuffle moves (event_id, user_id, ts) triples only — never the
  payload columns.
- Inside each coarse partition, session assignment is ONE vectorized
  lexsort + diff pass over every user in the bucket (no per-user
  Python, no O(users) native aggregate — see the coarse-partition
  pattern in ops/dedup.py).
- The partitioning assumption: all events of one user land in one
  task (guaranteed by keying on user_id). Skewed single users are
  bounded by per-user event counts, not corpus size.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa

_SPLITMIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + _SPLITMIX_GAMMA) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _assign_sessions(g: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """One vectorized pass over a coarse user bucket: lexsort by
    (user, ts, event_id); a session break is a user change or an
    in-user gap > gap_us; session_num = 1-based running break count
    within the user (cumsum minus the cumsum carried in at the user's
    first row)."""
    users = g["user_id"].to_numpy()
    ts = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    ids = g["event_id"].to_numpy()
    order = np.lexsort((ids, ts, users))
    u, t, i = users[order], ts[order], ids[order]
    new_user = np.ones(len(u), dtype=bool)
    new_user[1:] = u[1:] != u[:-1]
    brk = new_user.copy()
    brk[1:] |= (t[1:] - t[:-1]) > gap_us
    cum = np.cumsum(brk)
    # forward-fill (cum - 1) from each user's first row: cum is
    # nondecreasing, so maximum.accumulate IS the forward fill
    start = np.maximum.accumulate(np.where(new_user, cum - 1, 0))
    return pd.DataFrame({"event_id": i, "user_id": u, "session_num": cum - start})


def _keyed(
    ds,
    num_buckets: int,
    id_col: str = "event_id",
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """Project to (event_id, user_id, ts, coarse user bucket) — the
    only columns the session exchange ever moves."""

    def key(b: pa.Table) -> pa.Table:
        uid = b.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_splitmix64(uid.view(np.uint64)) % np.uint64(num_buckets)).astype(
            np.int64
        )
        return pa.table(
            {
                "event_id": b.column(id_col),
                "user_id": b.column(user_col),
                "ts": b.column(ts_col),
                "_bk": pa.array(bucket),
            }
        )

    return ds.map_batches(key, batch_format="pyarrow")


def sessionize(
    ds,
    gap_minutes: int = 30,
    num_buckets: int = 64,
    id_col: str = "event_id",
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """Returns (event_id, user_id, session_num) with session_num
    1-based per user in (ts, event_id) order. `num_buckets` is the
    coarse-shuffle width — size it to cluster cores, not user
    cardinality."""
    gap_us = int(gap_minutes) * 60_000_000
    fn = functools.partial(_assign_sessions, gap_us=gap_us)
    return (
        _keyed(ds, num_buckets, id_col, user_col, ts_col)
        .groupby("_bk")
        .map_groups(fn, batch_format="pandas")
    )


def _session_rollup(g: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """Same lexsort + break pass as ``_assign_sessions``, but reduce to
    per-user (n_events, n_sessions) from the run boundaries directly —
    a user lives wholly in one bucket, so no second exchange is needed
    and the output is user-cardinality-sized."""
    users = g["user_id"].to_numpy()
    ts = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    ids = g["event_id"].to_numpy()
    order = np.lexsort((ids, ts, users))
    u, t = users[order], ts[order]
    new_user = np.ones(len(u), dtype=bool)
    new_user[1:] = u[1:] != u[:-1]
    brk = new_user.copy()
    brk[1:] |= (t[1:] - t[:-1]) > gap_us
    starts = np.flatnonzero(new_user)
    n_events = np.diff(np.append(starts, len(u)))
    # sessions per user = breaks within the user's run
    cumbrk = np.cumsum(brk)
    ends = np.append(starts[1:], len(u)) - 1
    n_sessions = cumbrk[ends] - cumbrk[starts] + 1
    return pd.DataFrame(
        {
            "user_id": u[starts],
            "n_events": n_events.astype(np.int64),
            "n_sessions": n_sessions.astype(np.int64),
        }
    )


def session_stats(ds, gap_minutes: int = 30, num_buckets: int = 64):
    """Per-user session summary (n_events, n_sessions) in the SAME
    single keyed exchange as sessionize: the rollup happens inside the
    coarse bucket pass (run-boundary arithmetic), so no second
    per-user shuffle and no per-event output ever materializes."""
    gap_us = int(gap_minutes) * 60_000_000
    keyed = _keyed(ds, num_buckets)
    fn = functools.partial(_session_rollup, gap_us=gap_us)
    return keyed.groupby("_bk").map_groups(fn, batch_format="pandas")
