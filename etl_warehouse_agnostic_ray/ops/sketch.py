"""HyperLogLog approximate distinct counting (Flajolet et al. 2007).

The constant-memory cardinality sketch every corpus profiler runs:
"how many distinct users / URLs / n-grams?" over 100 TB without a
distinct shuffle. (Reference analogue: the validation rollups' exact
``count(DISTINCT ..)`` checks, dbt/models/curated/repsly/visits.sql —
semantics generalized to the sketch that stays cheap at corpus scale.)

Determinism is the whole design: registers are a PURE FUNCTION of the
data through the repo's shared hash family (poly64 → splitmix64
finalizer), so the register table — integers only — is value-verified
by a DuckDB twin that replays hash, bucket split, and rank with exact
HUGEINT arithmetic (``hash_sql.splitmix64_expr`` + a powers-table
bit-length; no float anywhere). The float ESTIMATE stays driver-side
and is accuracy-tested in pytest rather than oracle-compared.

Ray-Data shape (100-TB discipline):
- Per-batch combiner: ONE vectorized pass hashes the batch, splits
  (bucket, rank), and reduces to the batch's dense m-register max
  vector via ``np.maximum.at`` — each batch contributes at most m
  (bucket, rank) rows regardless of row count.
- Merge is elementwise max — done on the DRIVER over ≤ blocks × m
  integer rows (the same bounded-driver-reduction contract as
  ops/contamination.py); NO shuffle anywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .texthash import poly_hash_array, splitmix64


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 values (0 -> 0)."""
    r = np.zeros(x.shape, np.int64)
    v = x.copy()
    for sh in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << sh)
        r[m] += sh
        v[m] >>= np.uint64(sh)
    return r + (v > 0)


def hll_registers(ds, col: str, p: int = 10) -> pa.Table:
    """HLL register table (bucket, max_rank) for the NON-EMPTY buckets
    of ``col`` (values cast to string, nulls skipped). ``p`` is the
    precision: m = 2^p registers, relative error ~1.04/sqrt(m)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    rest_bits = np.uint64(64 - p)
    rest_mask = np.uint64((1 << (64 - p)) - 1)

    def partial(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column(col), pa.large_string())
        s = s.drop_null()
        regs = np.zeros(m, np.int64)
        if len(s):
            h = splitmix64(poly_hash_array(s))
            bucket = (h >> rest_bits).astype(np.int64)
            rest = h & rest_mask
            rank = (64 - p) - _bit_length_u64(rest) + 1
            np.maximum.at(regs, bucket, rank)
        nz = np.flatnonzero(regs)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "max_rank": pa.array(regs[nz]),
            }
        )

    regs = np.zeros(m, np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        nz = b.column("bucket").to_numpy(zero_copy_only=False)
        rk = b.column("max_rank").to_numpy(zero_copy_only=False)
        np.maximum.at(regs, nz, rk)
    nz = np.flatnonzero(regs)
    return pa.table(
        {
            "bucket": pa.array(nz.astype(np.int64)),
            "max_rank": pa.array(regs[nz]),
        }
    )


def hll_estimate(registers: pa.Table, p: int = 10) -> float:
    """Cardinality estimate from a register table (standard HLL with
    the small-range linear-counting correction). Float — accuracy is
    pytest-verified (~1.04/sqrt(m) relative error), not oracle-hashed."""
    m = 1 << p
    regs = np.zeros(m, np.int64)
    regs[registers.column("bucket").to_numpy(zero_copy_only=False)] = (
        registers.column("max_rank").to_numpy(zero_copy_only=False)
    )
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    return float(e)


def hll_registers_sql(src: str, col: str, p: int = 10) -> str:
    """DuckDB twin: identical hash (poly64 of the string form →
    splitmix64 finalizer in exact HUGEINT arithmetic), identical
    bucket/rank split (bit length via a 64-row powers table — integer
    comparisons only), identical group-max."""
    from ..pipelines.hash_sql import poly64_expr, splitmix64_expr

    rest_bits = 64 - p
    # exact integer power-of-two literals: DuckDB's ** returns DOUBLE,
    # which off-by-ones the bucket split near 2^53
    div = 1 << rest_bits
    pw_rows = ", ".join(f"({i}, {1 << i}::HUGEINT)" for i in range(rest_bits))
    return f"""
WITH pw(i, v) AS (VALUES {pw_rows}),
h0 AS (
  SELECT {poly64_expr(f"CAST({col} AS VARCHAR)")} AS hv
  FROM {src} WHERE {col} IS NOT NULL
),
h AS (SELECT {splitmix64_expr("hv")} AS x FROM h0),
parts AS (
  SELECT (x // {div}::HUGEINT)::BIGINT AS bucket,
         x % {div}::HUGEINT AS rest
  FROM h
),
ranked AS (
  SELECT bucket,
         ({rest_bits} - (SELECT coalesce(max(p2.i + 1), 0) FROM pw p2
                         WHERE parts.rest >= p2.v) + 1)::BIGINT AS rank
  FROM parts
)
SELECT bucket, max(rank) AS max_rank FROM ranked GROUP BY bucket
"""


# ------------------------------------------------------- count-min
# Row seeds: fixed odd constants (data, like the minhash permutation
# table) so the DuckDB twin regenerates from the same values.
_CMS_SEEDS = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
)


def cms_sketch(ds, col: str, depth: int = 4, width: int = 1024) -> pa.Table:
    """Count-Min sketch of ``col`` (values as strings, nulls skipped):
    a depth × width counter matrix where row j counts occurrences at
    column splitmix64(poly64(x) XOR seed_j) % width. Frequency upper
    bound for any item = min over rows (``cms_query``); error ≤
    2·N/width with prob 1 − 2^−depth (Cormode-Muthukrishnan 2005).

    Distribution: per-batch partials are ONE vectorized ``np.add.at``
    pass into a dense matrix; partial matrices merge by elementwise SUM
    on the driver (≤ blocks × depth × width integer cells) — zero
    shuffle, any batch order. Returns the non-zero (row, col, count)
    cells — pure integers, replayed exactly by ``cms_sketch_sql``."""
    if depth > len(_CMS_SEEDS):
        raise ValueError(f"depth must be <= {len(_CMS_SEEDS)}, got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")

    def partial(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column(col), pa.large_string()).drop_null()
        mat = np.zeros((depth, width), np.int64)
        if len(s):
            hv = poly_hash_array(s)
            for j in range(depth):
                cj = (splitmix64(hv ^ np.uint64(_CMS_SEEDS[j])) % np.uint64(width)).astype(
                    np.int64
                )
                np.add.at(mat[j], cj, 1)
        r, c = np.nonzero(mat)
        return pa.table(
            {
                "row": pa.array(r.astype(np.int64)),
                "col": pa.array(c.astype(np.int64)),
                "count": pa.array(mat[r, c]),
            }
        )

    mat = np.zeros((depth, width), np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        # np.add.at, NOT fancy-index += — one iterated block can hold
        # several task partials, so (row, col) cells repeat within it
        np.add.at(
            mat,
            (
                b.column("row").to_numpy(zero_copy_only=False),
                b.column("col").to_numpy(zero_copy_only=False),
            ),
            b.column("count").to_numpy(zero_copy_only=False),
        )
    r, c = np.nonzero(mat)
    return pa.table(
        {
            "row": pa.array(r.astype(np.int64)),
            "col": pa.array(c.astype(np.int64)),
            "count": pa.array(mat[r, c]),
        }
    )


def cms_query(sketch: pa.Table, items, depth: int = 4, width: int = 1024) -> np.ndarray:
    """Estimated frequency (upper bound) per item: min over rows of
    the item's counter. Integer-exact given the sketch."""
    mat = np.zeros((depth, width), np.int64)
    mat[
        sketch.column("row").to_numpy(zero_copy_only=False),
        sketch.column("col").to_numpy(zero_copy_only=False),
    ] = sketch.column("count").to_numpy(zero_copy_only=False)
    hv = poly_hash_array(pa.array([str(x) for x in items], pa.large_string()))
    est = np.full(len(hv), np.iinfo(np.int64).max, np.int64)
    for j in range(depth):
        cj = (splitmix64(hv ^ np.uint64(_CMS_SEEDS[j])) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, mat[j, cj])
    return est


def cms_sketch_sql(src: str, col: str, depth: int = 4, width: int = 1024) -> str:
    """DuckDB twin: same hash chain (poly64 → XOR row seed →
    splitmix64, exact HUGEINT arithmetic), same row/col/count cells."""
    from ..pipelines.hash_sql import poly64_expr, splitmix64_expr

    rows = "\nUNION ALL\n".join(
        f"SELECT {j} AS row, ({splitmix64_expr(f'xor(hv, {_CMS_SEEDS[j]}::HUGEINT)')}) "
        f"% {width} AS col FROM h0"
        for j in range(depth)
    )
    return f"""
WITH h0 AS (
  SELECT {poly64_expr(f"CAST({col} AS VARCHAR)")} AS hv
  FROM {src} WHERE {col} IS NOT NULL
),
cells AS ({rows})
SELECT row::BIGINT AS row, col::BIGINT AS col, count(*)::BIGINT AS count
FROM cells GROUP BY row, col
"""


def hll_registers_grouped(ds, group_col: str, col: str, p: int = 10):
    """Per-GROUP HLL register tables — "distinct users per event type"
    over 100 TB with no distinct shuffle and UNBOUNDED group
    cardinality: one (group, bucket, max_rank) row set per group value,
    still a pure function of the data through the shared hash family
    (same SQL-twin contract as the global sketch).

    Per batch: hash once, np.unique the batch's group values, ONE
    ``np.maximum.at`` scatter into a (groups_in_batch × m) dense
    matrix — each batch contributes at most groups_in_batch × m rows
    regardless of row count. Cross-batch merge is ONE (group, bucket)
    groupby exchange reduced by native Max (map-side combining); the
    former driver dict-merge and its ``max_groups`` guard are gone —
    the exchange carries only the already-combined partials, never the
    raw rows. Returns a Dataset of (group, bucket, max_rank)."""
    from ray.data.aggregate import Max

    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    rest_bits = np.uint64(64 - p)
    rest_mask = np.uint64((1 << (64 - p)) - 1)

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([group_col, col]).drop_null()
        empty = pa.table(
            {
                group_col: pa.array([], pa.large_string()),
                "bucket": pa.array([], pa.int64()),
                "_rank": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        g = np.asarray(pc.cast(t.column(group_col), pa.large_string()))
        s = pc.cast(t.column(col), pa.large_string())
        h = splitmix64(poly_hash_array(s))
        bucket = (h >> rest_bits).astype(np.int64)
        rank = (64 - p) - _bit_length_u64(h & rest_mask) + 1
        ug, inv = np.unique(g, return_inverse=True)
        regs = np.zeros((len(ug), m), np.int64)
        np.maximum.at(regs, (inv, bucket), rank)
        gi, nz = np.nonzero(regs)
        return pa.table(
            {
                group_col: pa.array(ug[gi], pa.large_string()),
                "bucket": pa.array(nz.astype(np.int64)),
                "_rank": pa.array(regs[gi, nz]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "bucket"])
        .aggregate(Max("_rank", alias_name="max_rank"))
    )


def hll_registers_grouped_sql(src: str, group_col: str, col: str, p: int = 10) -> str:
    """DuckDB twin of the grouped register table: hash/bucket/rank in
    exact HUGEINT arithmetic, grouped by the (stringified) group value."""
    from ..pipelines.hash_sql import poly64_expr, splitmix64_expr

    rest_bits = 64 - p
    div = 1 << rest_bits
    pw_rows = ", ".join(f"({i}, {1 << i}::HUGEINT)" for i in range(rest_bits))
    return f"""
WITH pw(i, v) AS (VALUES {pw_rows}),
h0 AS (
  SELECT CAST({group_col} AS VARCHAR) AS grp,
         {poly64_expr(f"CAST({col} AS VARCHAR)")} AS hv
  FROM {src} WHERE {col} IS NOT NULL AND {group_col} IS NOT NULL
),
h AS (SELECT grp, {splitmix64_expr("hv")} AS x FROM h0),
parts AS (
  SELECT grp, (x // {div}::HUGEINT)::BIGINT AS bucket,
         x % {div}::HUGEINT AS rest
  FROM h
),
ranked AS (
  SELECT grp, bucket,
         ({rest_bits} - (SELECT coalesce(max(p2.i + 1), 0) FROM pw p2
                         WHERE parts.rest >= p2.v) + 1)::BIGINT AS rank
  FROM parts
)
SELECT grp AS {group_col}, bucket, max(rank) AS max_rank
FROM ranked GROUP BY grp, bucket
"""
