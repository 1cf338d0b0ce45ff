"""Post-load validation aggregates → run report.

Reference: the post-run integrity task re-queries the warehouse per
endpoint — row counts, duplicate keys (count(*) - count(DISTINCT key)),
null-rate on critical fields, freshness — and fails the pipeline on
critical issues (``airflow/dags/repsly_dag.py:39-270``; thresholds
``config/sources/repsly.yml:137-167``). Here the same metrics run as
Ray aggregates over the lake's logical view, with partial per-batch
combiners so no full shuffle is needed.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _partials(batch: pa.Table, key: str, critical: list[str], fresh_col: str | None, fresh_after_us: int | None) -> pa.Table:
    """Per-batch partial counters (combiner) — one output row."""
    n = batch.num_rows
    out = {
        "rows": [n],
        # distinct-per-batch overcounts across batches, so the exact
        # duplicate check reduces key hashes instead: emit them
    }
    for c in critical:
        out[f"null_{c}"] = [n - pc.count(batch.column(c)).as_py()]
    if fresh_col and fresh_after_us is not None:
        ts = pc.cast(batch.column(fresh_col), pa.int64())
        out["fresh_rows"] = [
            pc.sum(pc.cast(pc.greater_equal(ts, pa.scalar(fresh_after_us)), pa.int64())).as_py()
            or 0
        ]
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def validate_dataset(
    ds,
    key: str = "url",
    critical: list[str] | None = None,
    fresh_col: str | None = None,
    fresh_after_us: int | None = None,
    max_null_rate: float = 0.5,
) -> dict:
    """Compute the reference's validation metrics over a Dataset.

    Exact duplicate-key count uses ``groupby(key).count()`` streamed and
    reduced per-batch (counts >1) — the only shuffle, over (key,count)
    pairs, not payloads.
    """
    critical = critical or []

    import functools

    part = ds.map_batches(
        functools.partial(
            _partials,
            key=key,
            critical=critical,
            fresh_col=fresh_col,
            fresh_after_us=fresh_after_us,
        ),
        batch_format="pyarrow",
    )
    totals: dict[str, int] = {}
    for b in part.iter_batches(batch_format="pyarrow"):
        for c in b.column_names:
            totals[c] = totals.get(c, 0) + (pc.sum(b.column(c)).as_py() or 0)
    rows = totals.get("rows", 0)

    # exact duplicate keys: shuffle only 8-byte key hashes, coarse
    # partitioned, counted with one vectorized sort/run pass per
    # partition (a native groupby(key).count() pays O(distinct keys)
    # per-group Python AND ships the key payload)
    import numpy as np

    from ..ops.texthash import poly_hash_array

    from ..ops.texthash import POLY_B2

    def key_hashes(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column(key), pa.large_string())
        h1 = poly_hash_array(s)
        h2 = poly_hash_array(s, base=POLY_B2)  # 128-bit identity: no false dups
        return pa.table(
            {
                "_h1": pa.array(h1.view(np.int64)),
                "_h2": pa.array(h2.view(np.int64)),
                "_pk": pa.array((h1 & np.uint64(255)).astype(np.int64)),
            }
        )

    def dup_stats(g) -> "pa.Table":
        import pandas as pd

        h1 = g["_h1"].to_numpy()
        h2 = g["_h2"].to_numpy()
        order = np.lexsort((h2, h1))
        h1s, h2s = h1[order], h2[order]
        first = np.ones(len(h1s), dtype=bool)
        first[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(h1s)))
        over = sizes[sizes > 1]
        return pd.DataFrame(
            {"dup_keys": [len(over)], "dup_rows": [int((over - 1).sum())]}
        )

    dup_rows = 0
    dup_keys = 0
    for b in (
        ds.map_batches(key_hashes, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(dup_stats, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")
    ):
        dup_keys += pc.sum(b.column("dup_keys")).as_py() or 0
        dup_rows += pc.sum(b.column("dup_rows")).as_py() or 0

    report = {
        "rows": rows,
        "duplicate_keys": dup_keys,
        "duplicate_rows": dup_rows,
        "null_rates": {
            c: (totals.get(f"null_{c}", 0) / rows if rows else 0.0) for c in critical
        },
        "issues": [],
    }
    if fresh_col and fresh_after_us is not None:
        report["fresh_rows"] = totals.get("fresh_rows", 0)
        report["stale_rows"] = rows - report["fresh_rows"]
    if dup_keys:
        report["issues"].append(f"{dup_keys} duplicate {key} keys ({dup_rows} extra rows)")
    for c, r in report["null_rates"].items():
        if r > max_null_rate:
            report["issues"].append(f"null rate {r:.2%} on critical column {c}")
    report["passed"] = not report["issues"]
    return report
