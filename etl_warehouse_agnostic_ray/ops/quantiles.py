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

    # pin: the stats pass, the histogram pass, and every per-bin
    # candidate pull each consume `pruned`; unpinned, each consumption
    # re-reads the source (up to ~2 + bins-touched full scans). The
    # pinned set is ONE numeric column, nulls dropped — the smallest
    # projection of the input.
    pruned = ds.map_batches(
        lambda b: b.select([col]).drop_null(), batch_format="pyarrow"
    ).materialize()
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


def grouped_quantiles(
    ds,
    col: str,
    group_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.95, 0.99),
    n_bins: int = 512,
    max_driver_rows: int = 1_000_000,
    interp: str = "disc",
) -> pa.Table:
    """Per-group exact quantiles, in a CONSTANT number of passes
    independent of group count: one stats groupby, one shared
    histogram pass (composite group×bin key, reduced by a native
    groupby over ≤ groups·n_bins keys), one candidate-pull pass for
    every needed (group, bin) at once. Group cardinality is assumed
    small enough that groups·n_bins count rows fit the driver (the
    per-key-rollup regime — event types, languages, tenants); the
    per-batch kernel loops over groups PRESENT IN THE BATCH, not over
    rows. Skewed bins recurse per group via _rank_in_range on a
    group-filtered view.

    ``interp="disc"`` (default) returns SQL ``quantile_disc`` order
    statistics (rank ceil(q·n)). ``interp="cont"`` returns ANSI
    PERCENTILE_CONT: h = (n−1)·q, and the value interpolates the two
    adjacent order statistics v⌊h⌋₊₁, v⌈h⌉₊₁ as
    v_lo·(⌈h⌉−h) + v_hi·(h−⌊h⌋) — BOTH ranks resolve through the same
    exact histogram machinery, so the only float arithmetic beyond the
    order statistics themselves is that one textbook expression, whose
    op order an SQL twin can replay verbatim. (DuckDB's built-in
    quantile_cont aggregate evaluates the same definition with a
    measured ≤3-ulp internal wobble, so twins must replay the explicit
    expression rather than call the aggregate.)"""
    import ray
    from ray.data.aggregate import Count, Max, Min, Sum

    if interp not in ("disc", "cont"):
        raise ValueError(f"interp must be 'disc' or 'cont', got {interp!r}")

    def prune(b: pa.Table) -> pa.Table:
        return b.select([group_col, col]).drop_null()

    pruned = ds.map_batches(prune, batch_format="pyarrow").materialize()
    gstats = pa.concat_tables(
        pruned.groupby(group_col)
        .aggregate(Count(alias_name="n"), Min(col, alias_name="lo"), Max(col, alias_name="hi"))
        .iter_batches(batch_format="pyarrow")
    )
    groups = gstats.column(group_col).to_pylist()
    gn = dict(zip(groups, (int(x) for x in gstats.column("n").to_pylist())))
    glo = dict(zip(groups, (float(x) for x in gstats.column("lo").to_pylist())))
    ghi = dict(zip(groups, (float(x) for x in gstats.column("hi").to_pylist())))
    gidx = {g: i for i, g in enumerate(groups)}
    edges_by_g = {g: _edges(glo[g], ghi[g], n_bins) for g in groups}
    spec_ref = ray.put((gidx, edges_by_g))

    def hist_part(b: pa.Table) -> pa.Table:
        gmap, edges_map = ray.get(spec_ref)
        gv = b.column(group_col).to_numpy(zero_copy_only=False)
        vv = b.column(col).to_numpy(zero_copy_only=False)
        keys, cnts = [], []
        for g in np.unique(gv):
            e = edges_map[g]
            v = vv[gv == g]
            v = v[_mask(v, e[0], e[-1], True)]
            bins, counts = np.unique(_bin_of(v, e), return_counts=True)
            keys.append(bins + gmap[g] * n_bins)
            cnts.append(counts)
        k = np.concatenate(keys) if keys else np.zeros(0, np.int64)
        c = np.concatenate(cnts) if cnts else np.zeros(0, np.int64)
        return pa.table({"gb": pa.array(k.astype(np.int64)), "cnt": pa.array(c.astype(np.int64))})

    hist = np.zeros(len(groups) * n_bins, dtype=np.int64)
    red = (
        pruned.map_batches(hist_part, batch_format="pyarrow")
        .groupby("gb")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    for b in red.iter_batches(batch_format="pyarrow"):
        hist[b.column("gb").to_numpy()] += b.column("cnt").to_numpy()

    # per-(group, q) rank spec: disc needs one rank; cont needs the
    # two adjacent order statistics around h = (n-1)·q plus h itself
    spec: dict[object, list[tuple[float, int, int, float]]] = {}
    want: dict[object, set[int]] = {}
    for g in groups:
        n = gn[g]
        for q in qs:
            if interp == "cont":
                h = (n - 1) * q
                r_lo = max(1, min(n, int(math.floor(h)) + 1))
                r_hi = max(1, min(n, int(math.ceil(h)) + 1))
            else:
                h = 0.0
                r_lo = r_hi = max(1, min(n, math.ceil(q * n)))
            spec.setdefault(g, []).append((q, r_lo, r_hi, h))
            want.setdefault(g, set()).update((r_lo, r_hi))

    # locate every needed (group, rank); collect needed bins per group
    need: dict[object, dict[int, list[tuple[int, int]]]] = {}
    for g in groups:
        counts = hist[gidx[g] * n_bins : (gidx[g] + 1) * n_bins]
        for rank in sorted(want[g]):
            b, rib = _locate(counts, rank)
            need.setdefault(g, {}).setdefault(b, []).append((rank, rib))

    # one pass pulls every needed small (group, bin); big bins recurse
    pull_bins = {
        g: [b for b in bs if hist[gidx[g] * n_bins + b] <= max_driver_rows]
        for g, bs in need.items()
    }
    pull_ref = ray.put(pull_bins)

    def pull(b: pa.Table) -> pa.Table:
        gmap, edges_map = ray.get(spec_ref)
        wanted = ray.get(pull_ref)
        gv = b.column(group_col).to_numpy(zero_copy_only=False)
        vv = b.column(col).to_numpy(zero_copy_only=False)
        out_g, out_b, out_v = [], [], []
        for g in np.unique(gv):
            bins = wanted.get(g)
            if not bins:
                continue
            e = edges_map[g]
            v = vv[gv == g]
            v = v[_mask(v, e[0], e[-1], True)]
            bi = _bin_of(v, e)
            m = np.isin(bi, bins)
            out_g.append(np.full(int(m.sum()), gmap[g], np.int64))
            out_b.append(bi[m])
            out_v.append(v[m])
        if not out_g:
            return pa.table(
                {"gi": pa.array([], pa.int64()), "bin": pa.array([], pa.int64()),
                 "val": pa.array([], pa.float64())}
            )
        return pa.table(
            {"gi": pa.array(np.concatenate(out_g)),
             "bin": pa.array(np.concatenate(out_b).astype(np.int64)),
             "val": pa.array(np.concatenate(out_v).astype(np.float64))}
        )

    cand: dict[tuple[int, int], list[np.ndarray]] = {}
    for t in pruned.map_batches(pull, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        gi = t.column("gi").to_numpy()
        bi = t.column("bin").to_numpy()
        va = t.column("val").to_numpy()
        for key in {*zip(gi.tolist(), bi.tolist())}:
            m = (gi == key[0]) & (bi == key[1])
            cand.setdefault(key, []).append(va[m])

    resolved: dict[tuple[object, int], float] = {}
    for g in groups:
        counts = hist[gidx[g] * n_bins : (gidx[g] + 1) * n_bins]
        edges = edges_by_g[g]
        for b, wanted in need[g].items():
            if counts[b] <= max_driver_rows:
                parts = cand.get((gidx[g], b), [])
                vals = np.concatenate(parts) if parts else np.zeros(0, np.float64)
                if len(vals) != counts[b]:
                    raise RuntimeError(
                        f"grouped quantile mismatch g={g!r} bin={b}: "
                        f"hist={counts[b]} pulled={len(vals)}"
                    )
                vals.sort()
                for rank, rib in wanted:
                    resolved[(g, rank)] = float(vals[rib - 1])
            else:  # skew: refine within the group's oversized bin
                gview = pruned.map_batches(
                    functools.partial(_group_select, group_col=group_col, g=g, col=col),
                    batch_format="pyarrow",
                )
                for rank, rib in wanted:
                    resolved[(g, rank)] = _rank_in_range(
                        gview, col, float(edges[b]), float(edges[b + 1]),
                        b == n_bins - 1, rib, n_bins, max_driver_rows,
                    )

    out_rows: list[tuple[object, float, float]] = []
    for g in groups:
        for q, r_lo, r_hi, h in spec[g]:
            v_lo = resolved[(g, r_lo)]
            if r_hi == r_lo:
                v = v_lo
            else:  # the one float expression an SQL twin replays verbatim
                v = v_lo * (math.ceil(h) - h) + resolved[(g, r_hi)] * (
                    h - math.floor(h)
                )
            out_rows.append((g, q, v))
    out_rows.sort(key=lambda r: (str(r[0]), r[1]))
    return pa.table(
        {
            group_col: pa.array([r[0] for r in out_rows]),
            "q": pa.array([r[1] for r in out_rows], pa.float64()),
            "value": pa.array([r[2] for r in out_rows], pa.float64()),
        }
    )


def _group_select(b: pa.Table, group_col: str, g, col: str) -> pa.Table:
    import pyarrow.compute as pc

    return b.filter(pc.equal(b.column(group_col), g)).select([col])
