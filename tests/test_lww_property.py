"""Property-based tests (hypothesis) for the LWW compaction kernel —
the algebraic facts the whole engine leans on:

1. determinism: same multiset of rows (any order) → same winners;
2. associativity: compact(compact(A) ∪ compact(B)) == compact(A ∪ B)
   — this is what makes pre-compaction combiners, salted two-level
   merges and incremental replay all converge;
3. oracle equivalence vs a plain-python LWW.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_warehouse_agnostic_ray.schemas import LSN_COL, OP_COL, PID_COL
from etl_warehouse_agnostic_ray.stages.lww import lww_compact_table

# WAL contract: lsn identifies an event — rows sharing (url, warc_ts,
# lsn) are byte-identical redeliveries. The generator honors that by
# deriving op (and the kernel's text payload) from the key triple.
_OPS = ["insert", "update", "delete"]


def _with_op(t):
    u, ts, lsn = t
    return (u, ts, lsn, _OPS[(u + ts + lsn) % 3])


rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # url index (small keyspace → collisions)
        st.integers(0, 3),  # warc_ts (ties likely)
        st.integers(0, 50),  # lsn
    ).map(_with_op),
    min_size=0,
    max_size=40,
)


def to_table(rows) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([f"u{r[0]}" for r in rows], pa.string()),
            "warc_ts": pa.array(
                np.array([r[1] for r in rows], dtype="int64")
            ).cast(pa.timestamp("us")),
            "text": pa.array([f"t-{r[0]}-{r[1]}-{r[2]}" for r in rows], pa.large_string()),
            LSN_COL: pa.array([r[2] for r in rows], pa.int64()),
            OP_COL: pa.array([r[3] for r in rows], pa.string()),
            PID_COL: pa.array([0] * len(rows), pa.int64()),
        }
    )


def python_lww(rows):
    """Plain-python oracle: winner per url by (warc_ts, lsn) max."""
    best = {}
    for u, ts, lsn, op in rows:
        k = f"u{u}"
        if k not in best or (ts, lsn) > (best[k][0], best[k][1]):
            best[k] = (ts, lsn, op)
    return {k: v for k, v in best.items()}


def winners_of(t: pa.Table):
    return {
        u: (ts, lsn, op)
        for u, ts, lsn, op in zip(
            t.column("url").to_pylist(),
            [int(x.value) for x in t.column("warc_ts")],
            t.column(LSN_COL).to_pylist(),
            t.column(OP_COL).to_pylist(),
        )
    }


@settings(max_examples=200, deadline=None)
@given(rows=rows_strategy)
def test_matches_python_oracle(rows):
    got = winners_of(lww_compact_table(to_table(rows)))
    assert got == python_lww(rows)


@settings(max_examples=200, deadline=None)
@given(rows=rows_strategy, seed=st.integers(0, 1000))
def test_order_invariance(rows, seed):
    rng = np.random.default_rng(seed)
    perm = list(rng.permutation(len(rows)))
    shuffled = [rows[i] for i in perm]
    a = winners_of(lww_compact_table(to_table(rows)))
    b = winners_of(lww_compact_table(to_table(shuffled)))
    assert a == b


@settings(max_examples=200, deadline=None)
@given(rows=rows_strategy, split=st.integers(0, 40))
def test_associativity(rows, split):
    split = min(split, len(rows))
    a, b = rows[:split], rows[split:]
    ca = lww_compact_table(to_table(a))
    cb = lww_compact_table(to_table(b))
    recombined = lww_compact_table(pa.concat_tables([ca, cb]))
    direct = lww_compact_table(to_table(rows))
    assert winners_of(recombined) == winners_of(direct)
