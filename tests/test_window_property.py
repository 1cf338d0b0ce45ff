"""Property tests for the window-function family: the coarse-partition
+ lexsort + run-boundary kernels in pipelines/queries.py must agree
with an obviously-correct pandas reference on arbitrary (key, ts, val)
frames — ties, singleton keys, empty groups and duplicate timestamps
included. (The DuckDB oracle tests cover the fixture distributions;
these cover the adversarial corners hypothesis finds.)

The kernels are exercised DIRECTLY (pure numpy, no Ray) by lifting the
per-group function out of the query: correctness of the distributed
composition is the oracle tests' job; these pin the math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_warehouse_agnostic_ray.pipelines import queries as Q


frames = st.lists(
    st.tuples(
        st.integers(0, 5),            # key
        st.integers(0, 50),           # ts (µs) — duplicates likely
        st.integers(0, 10_000),       # value in cents
    ),
    min_size=1,
    max_size=60,
)


def _moving_ref(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for k, g in df.sort_values(["k", "ts", "i"]).groupby("k"):
        cents = g["cents"].to_numpy()
        for j in range(len(cents)):
            lo = max(0, j - 2)
            w = cents[lo : j + 1]
            out.append((k, g["i"].to_numpy()[j], float(w.sum()) / (100.0 * len(w))))
    return pd.DataFrame(out, columns=["k", "i", "mavg"])


@settings(max_examples=150, deadline=None)
@given(rows=frames)
def test_moving_avg_kernel_matches_reference(rows):
    df = pd.DataFrame(rows, columns=["k", "ts", "cents"]).reset_index(names="i")
    # replicate q_moving_avg_orders' in-group kernel
    k = df["k"].to_numpy(np.int64)
    okey = df["i"].to_numpy(np.int64)
    ts = df["ts"].to_numpy(np.int64)
    cents = df["cents"].to_numpy(np.int64)
    order = np.lexsort((okey, ts, k))
    ks, cs = k[order], cents[order]
    n = len(ks)
    start = np.ones(n, dtype=bool)
    start[1:] = ks[1:] != ks[:-1]
    starts = np.flatnonzero(start)
    lengths = np.diff(np.append(starts, n))
    run_start = np.repeat(starts, lengths)
    pos = np.arange(n, dtype=np.int64)
    lo = np.maximum(run_start, pos - 2)
    cum = np.concatenate(([0], np.cumsum(cs)))
    wsum = cum[pos + 1] - cum[lo]
    cnt = pos - lo + 1
    got = pd.DataFrame(
        {
            "k": ks,
            "i": okey[order],
            "mavg": wsum.astype(np.float64) / (100.0 * cnt.astype(np.float64)),
        }
    ).sort_values(["k", "i"]).reset_index(drop=True)
    want = _moving_ref(df).sort_values(["k", "i"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


@settings(max_examples=150, deadline=None)
@given(rows=frames)
def test_lag_gap_kernel_matches_shift(rows):
    df = pd.DataFrame(rows, columns=["k", "ts", "v"]).reset_index(names="i")
    u = df["k"].to_numpy(np.int64)
    eid = df["i"].to_numpy(np.int64)
    t = df["ts"].to_numpy(np.int64)
    order = np.lexsort((eid, t, u))
    us, ts_s = u[order], t[order]
    n = len(us)
    gap = np.empty(n, dtype=np.int64)
    first = np.ones(n, dtype=bool)
    gap[0] = 0
    gap[1:] = ts_s[1:] - ts_s[:-1]
    first[1:] = us[1:] != us[:-1]
    gap[first] = 0
    got = pd.Series(
        pa.array(gap, mask=first).to_pandas(),
        name="gap",
    )
    ref = (
        df.sort_values(["k", "ts", "i"])
        .groupby("k")["ts"]
        .transform(lambda s: s - s.shift())
        .reset_index(drop=True)
    )
    # align: got is in (k, ts, i) order, ref too after the same sort
    want = ref.rename("gap")
    got_vals = got.to_numpy(dtype=object)
    want_vals = want.to_numpy(dtype=object)
    for a, b in zip(got_vals, want_vals):
        if pd.isna(b):
            assert a is None or pd.isna(a)
        else:
            assert float(a) == float(b)


@settings(max_examples=150, deadline=None)
@given(rows=frames, k=st.integers(2, 5))
def test_ntile_kernel_matches_duckdb_rule(rows, k):
    df = pd.DataFrame(rows, columns=["g", "bal", "key"])
    for _, grp in df.groupby("g"):
        bal = grp["bal"].to_numpy(np.int64)
        key = grp["key"].to_numpy(np.int64)
        order = np.lexsort((key, bal))
        n = len(order)
        q, r = divmod(n, k)
        pos = np.arange(n, dtype=np.int64)
        thresh = r * (q + 1)
        if q == 0:
            tile = pos + 1
        else:
            tile = np.where(pos < thresh, pos // (q + 1) + 1, r + (pos - thresh) // q + 1)
        # reference: distribute n rows into k buckets, first r get q+1
        sizes = [(q + 1) if b < r else q for b in range(k)]
        ref = np.repeat(np.arange(1, k + 1), sizes)[:n]
        assert (tile == ref).all()
