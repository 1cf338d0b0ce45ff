"""Property tests for the window-function kernels in
pipelines/queries.py — `gap_table` (LAG and LEAD directions),
`moving_frame_sums` and `ntile_assign` are imported and exercised
DIRECTLY against obviously-correct pandas / closed-form references on
arbitrary (key, ts, val) frames: ties, singleton keys and duplicate
timestamps included. (The DuckDB oracle tests cover the fixture
distributions; these cover the adversarial corners hypothesis finds,
and fail if the production kernels regress — they contain no copies.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_warehouse_agnostic_ray.pipelines.queries import (
    gap_table,
    moving_frame_sums,
    ntile_assign,
)

frames = st.lists(
    st.tuples(
        st.integers(0, 5),            # key
        st.integers(0, 50),           # ts (µs) — duplicates likely
        st.integers(0, 10_000),       # value in cents
    ),
    min_size=1,
    max_size=60,
)


def _as_events(rows):
    df = pd.DataFrame(rows, columns=["k", "ts", "v"]).reset_index(names="i")
    return df, pa.table(
        {
            "user_id": pa.array(df["k"].to_numpy(np.int64)),
            "event_id": pa.array(df["i"].to_numpy(np.int64)),
            "ts": pa.array(df["ts"].to_numpy(np.int64).view("datetime64[us]")),
        }
    )


def _ref_gaps(df, forward):
    s = df.sort_values(["k", "ts", "i"])
    shifted = s.groupby("k")["ts"].shift(-1 if forward else 1)
    gap = (shifted - s["ts"]) if forward else (s["ts"] - shifted)
    return gap.to_numpy()


@settings(max_examples=150, deadline=None)
@given(rows=frames)
def test_lag_gap_table_matches_shift(rows):
    df, t = _as_events(rows)
    got = gap_table(t, "gap_us", forward=False).column("gap_us").to_pylist()
    want = _ref_gaps(df, forward=False)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert (a is None) == bool(pd.isna(b)) and (a is None or a == b)


@settings(max_examples=150, deadline=None)
@given(rows=frames)
def test_lead_gap_table_matches_shift(rows):
    df, t = _as_events(rows)
    got = gap_table(t, "next_gap_us", forward=True).column("next_gap_us").to_pylist()
    want = _ref_gaps(df, forward=True)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert (a is None) == bool(pd.isna(b)) and (a is None or a == b)


@settings(max_examples=150, deadline=None)
@given(rows=frames, preceding=st.integers(0, 5))
def test_moving_frame_sums_matches_rolling(rows, preceding):
    df = pd.DataFrame(rows, columns=["k", "ts", "cents"]).reset_index(names="i")
    s = df.sort_values(["k", "ts", "i"])
    keys = s["k"].to_numpy(np.int64)
    vals = s["cents"].to_numpy(np.int64)
    wsum, cnt = moving_frame_sums(keys, vals, preceding=preceding)
    ref = (
        s.groupby("k")["cents"]
        .rolling(window=preceding + 1, min_periods=1)
        .agg(["sum", "count"])
        .reset_index(drop=True)
    )
    assert (wsum == ref["sum"].to_numpy(np.int64)).all()
    assert (cnt == ref["count"].to_numpy(np.int64)).all()


@settings(max_examples=200, deadline=None)
@given(n=st.integers(0, 60), k=st.integers(1, 7))
def test_ntile_assign_matches_duckdb_rule(n, k):
    tile = ntile_assign(n, k)
    q, r = divmod(n, k)
    sizes = [(q + 1) if b < r else q for b in range(k)]
    ref = np.repeat(np.arange(1, k + 1), sizes)[:n]
    if q == 0:
        # fewer rows than buckets: row i gets bucket i+1
        ref = np.arange(1, n + 1)
    assert len(tile) == n and (tile == ref).all()


# ---- round-5 session kernels: transitions / forward fill / streaks ----

typed_frames = st.lists(
    st.tuples(
        st.integers(0, 5),            # user key
        st.integers(0, 50),           # ts (µs)
        st.sampled_from(["p", "q", "r"]),  # event type ('p' = purchase)
    ),
    min_size=1,
    max_size=60,
)


def _as_typed_events(rows, purchase_label="purchase"):
    df = pd.DataFrame(rows, columns=["k", "ts", "y"]).reset_index(names="i")
    types = df["y"].map(lambda y: purchase_label if y == "p" else y)
    return df.assign(t=types), pa.table(
        {
            "user_id": pa.array(df["k"].to_numpy(np.int64)),
            "event_id": pa.array(df["i"].to_numpy(np.int64)),
            "ts": pa.array(df["ts"].to_numpy(np.int64).view("datetime64[us]")),
            "event_type": pa.array(types.tolist(), pa.string()),
        }
    )


@settings(max_examples=150, deadline=None)
@given(rows=typed_frames)
def test_transition_partial_matches_pandas(rows):
    from etl_warehouse_agnostic_ray.pipelines.queries import _transition_partial

    df, t = _as_typed_events(rows)
    got = {
        (r["prev_type"], r["cur_type"]): r["n"]
        for r in _transition_partial(t).to_pylist()
    }
    s = df.sort_values(["k", "ts", "i"])
    want: dict = {}
    for _, g in s.groupby("k"):
        ts_ = g["t"].tolist()
        for a, b in zip(ts_, ts_[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


@settings(max_examples=150, deadline=None)
@given(rows=typed_frames)
def test_since_purchase_matches_pandas(rows):
    from etl_warehouse_agnostic_ray.pipelines.queries import _since_purchase

    df, t = _as_typed_events(rows)
    out = _since_purchase(t)
    got = dict(
        zip(out.column("event_id").to_pylist(),
            out.column("us_since_purchase").to_pylist())
    )
    s = df.sort_values(["k", "ts", "i"]).copy()
    s["pt"] = s["ts"].where(s["t"] == "purchase").astype(float)
    # cummax leaves NaN at non-purchase positions; carry the running
    # max forward within each user
    s["last_p"] = s.groupby("k")["pt"].transform(lambda x: x.cummax().ffill())
    for _, r in s.iterrows():
        want = None if pd.isna(r["last_p"]) else int(r["ts"] - r["last_p"])
        assert got[r["i"]] == want


day_frames = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 20)),  # (user, day)
    min_size=1,
    max_size=60,
)


@settings(max_examples=150, deadline=None)
@given(rows=day_frames)
def test_streaks_match_bruteforce(rows):
    from etl_warehouse_agnostic_ray.pipelines.queries import _streaks

    df = pd.DataFrame(rows, columns=["k", "day"]).reset_index(names="i")
    t = pa.table(
        {
            "user_id": pa.array(df["k"].to_numpy(np.int64)),
            "ts": pa.array(
                (df["day"].to_numpy(np.int64) * 86_400_000_000
                 + df["i"].to_numpy(np.int64)).view("datetime64[us]")
            ),
        }
    )
    out = {r["user_id"]: (r["max_streak"], r["n_active_days"])
           for r in _streaks(t).to_pylist()}
    for k, g in df.groupby("k"):
        days = sorted(set(g["day"]))
        best = run = 1
        for a, b in zip(days, days[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        assert out[k] == (best, len(days))
