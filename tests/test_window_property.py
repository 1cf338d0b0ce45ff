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
