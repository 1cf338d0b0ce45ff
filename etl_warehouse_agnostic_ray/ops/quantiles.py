"""Exact distributed quantiles (discrete order statistics).

Computes exact ``quantile_disc`` values (rank = ceil(q·n), 1-based —
DuckDB's formula) over a numeric column WITHOUT a global sort: the
all-to-all exchange a naive ``ds.sort(col)`` would cost is replaced
by histogram rank-finding:

1. one aggregate pass → (n, min, max);
2. ONE shared map_batches pass → per-batch histogram partials over
   ``n_bins`` bins, reduced by a native groupby (≤ n_bins groups —
   tiny); every requested quantile reads this histogram;
3. each target rank maps to a bin via the cumulative counts; one
   filter pass per DISTINCT candidate bin pulls its values to the
   driver (expected n/n_bins rows);
4. if ties/skew make a bin exceed ``max_driver_rows``, that bin is
   re-histogrammed within its own range (the range shrinks
   geometrically; a range collapsed to a single float IS the answer).

At 100 TB this is two streaming passes + ≤ max_driver_rows pulled
values, vs a full-corpus sort shuffle. (The reference computes no
quantiles; semantics follow SQL ``quantile_disc``.)

Binning is COMPARISON-based (explicit np.linspace edges +
searchsorted), never floor-division: bin membership is therefore
bitwise-identical to range membership, so histogram counts, candidate
pulls, and recursive range narrowing can never disagree at a float
edge.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import pyarrow as pa

_MAX_REFINE = 64  # float64 ranges collapse in ≤ ~52 halvings


def _mask(v: np.ndarray, lo: float, hi: float, inclusive_hi: bool) -> np.ndarray:
    m = (v >= lo) & ((v <= hi) if inclusive_hi else (v < hi))
    if v.dtype.kind == "f":
        m &= ~np.isnan(v)
    return m


def _bin_of(v: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Bin index via comparisons: bin i ⟺ edges[i] ≤ v < edges[i+1]
    (v == edges[-1] folds into the last bin)."""
    return np.clip(np.searchsorted(edges, v, side="right") - 1, 0, len(edges) - 2)


def _hist_partial(
    b: pa.Table, col: str, edges: np.ndarray, inclusive_hi: bool
) -> pa.Table:
    v = b.column(col).to_numpy(zero_copy_only=False)
    v = v[_mask(v, edges[0], edges[-1], inclusive_hi)]
    bins, counts = np.unique(_bin_of(v, edges), return_counts=True)
    return pa.table({"bin": pa.array(bins), "cnt": pa.array(counts.astype(np.int64))})


def _histogram(ds, col: str, edges: np.ndarray, inclusive_hi: bool) -> np.ndarray:
    """Dense bin counts. One streaming pass; the reduce is a native
    groupby over ≤ n_bins keys."""
    from ray.data.aggregate import Sum

    part = functools.partial(
        _hist_partial, col=col, edges=edges, inclusive_hi=inclusive_hi
    )
    red = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    out = np.zeros(len(edges) - 1, dtype=np.int64)
    for b in red.iter_batches(batch_format="pyarrow"):
        out[b.column("bin").to_numpy()] += b.column("cnt").to_numpy()
    return out


def _pull_range(
    ds, col: str, lo: float, hi: float, inclusive_hi: bool
) -> np.ndarray:
    """All values in the range, as one driver array — callers bound the
    row count first (same mask as the histogram: counts always agree)."""

    def keep(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False)
        return pa.table({col: pa.array(v[_mask(v, lo, hi, inclusive_hi)])})

    parts = [
        b.column(col).to_numpy(zero_copy_only=False)
        for b in ds.map_batches(keep, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    return np.concatenate(parts) if parts else np.zeros(0, dtype=np.float64)


def _edges(lo: float, hi: float, n_bins: int) -> np.ndarray:
    e = np.linspace(lo, hi, n_bins + 1)
    e[0], e[-1] = lo, hi
    return e


def _locate(counts: np.ndarray, rank: int) -> tuple[int, int]:
    """(bin index, 1-based rank within that bin) for a 1-based rank."""
    cum = np.cumsum(counts)
    b = int(np.searchsorted(cum, rank, side="left"))
    return b, rank - (int(cum[b - 1]) if b else 0)


def _rank_in_range(
    ds,
    col: str,
    lo: float,
    hi: float,
    inclusive_hi: bool,
    rank: int,
    n_bins: int,
    max_driver_rows: int,
) -> float:
    """Exact rank-th (1-based) value in the range, refining until the
    candidate bin fits on the driver."""
    for _ in range(_MAX_REFINE):
        if not (lo < hi):  # collapsed to one float → the answer
            return lo
        edges = _edges(lo, hi, n_bins)
        if len(np.unique(edges)) < 3:  # range spans ≤ 1 ulp: can't split
            break
        counts = _histogram(ds, col, edges, inclusive_hi)
        b, rank_in_bin = _locate(counts, rank)
        blo, bhi = float(edges[b]), float(edges[b + 1])
        b_incl = inclusive_hi and b == n_bins - 1
        if counts[b] <= max_driver_rows:
            vals = _pull_range(ds, col, blo, bhi, b_incl)
            if len(vals) != counts[b]:  # fail loud: the passes must agree
                raise RuntimeError(
                    f"quantile candidate mismatch: hist={counts[b]} pulled={len(vals)}"
                )
            return float(np.partition(vals, rank_in_bin - 1)[rank_in_bin - 1])
        lo, hi, inclusive_hi, rank = blo, bhi, b_incl, rank_in_bin
    # range stopped shrinking before meeting the row bound (massive
    # ties within one ulp) — finish exactly on the driver
    vals = _pull_range(ds, col, lo, hi, inclusive_hi)
    return float(np.partition(vals, rank - 1)[rank - 1])


def quantiles_exact(
    ds,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.95, 0.99),
    n_bins: int = 2048,
    max_driver_rows: int = 1_000_000,
) -> pa.Table:
    """Exact discrete quantiles of ``col`` (nulls ignored) as a
    (q, value) table; value is an actual element of the column, so it
    is bitwise-equal to SQL ``quantile_disc``."""
    from ray.data.aggregate import Count, Max, Min

    pruned = ds.map_batches(
        lambda b: b.select([col]).drop_null(), batch_format="pyarrow"
    )
    stats = pruned.aggregate(
        Count(alias_name="n"), Min(col, alias_name="lo"), Max(col, alias_name="hi")
    )
    n = int(stats["n"])
    if n == 0:
        raise ValueError(f"quantiles_exact: column {col!r} has no non-null rows")
    lo, hi = float(stats["lo"]), float(stats["hi"])
    ranks = [max(1, min(n, math.ceil(q * n))) for q in qs]

    if lo == hi:
        return pa.table(
            {"q": pa.array(list(qs), pa.float64()),
             "value": pa.array([lo] * len(qs), pa.float64())}
        )

    # one shared top-level histogram serves every quantile
    edges = _edges(lo, hi, n_bins)
    counts = _histogram(pruned, col, edges, inclusive_hi=True)
    by_bin: dict[int, list[tuple[int, int]]] = {}
    for i, rank in enumerate(ranks):
        b, rib = _locate(counts, rank)
        by_bin.setdefault(b, []).append((i, rib))

    values: list[float] = [math.nan] * len(qs)
    for b, wanted in by_bin.items():
        blo, bhi = float(edges[b]), float(edges[b + 1])
        b_incl = b == n_bins - 1
        if counts[b] <= max_driver_rows:
            vals = _pull_range(pruned, col, blo, bhi, b_incl)
            if len(vals) != counts[b]:
                raise RuntimeError(
                    f"quantile candidate mismatch: hist={counts[b]} pulled={len(vals)}"
                )
            vals.sort()
            for i, rib in wanted:
                values[i] = float(vals[rib - 1])
        else:  # skew path: refine the oversized bin per rank
            for i, rib in wanted:
                values[i] = _rank_in_range(
                    pruned, col, blo, bhi, b_incl, rib, n_bins, max_driver_rows
                )
    return pa.table(
        {"q": pa.array(list(qs), pa.float64()), "value": pa.array(values, pa.float64())}
    )
