"""Deterministic hash sampling + dataset splitting.

A 100-TB training pipeline needs reproducible train/val/test splits and
down-samples that require ZERO coordination: membership must be a pure
function of the record id, so any worker, any re-run, any subset of the
corpus computes the same assignment (no shuffle, no state, no RNG
sequence to keep in sync). The bucket is the repo's canonical poly64
hash of the stringified id, mod ``n_buckets`` — replayable in the
DuckDB oracle via pipelines/hash_sql.poly64_expr, so split assignments
are value-verified, not just size-checked.

Reference semantics generalized: the reference samples nothing (its
tables are small); deterministic id-hash splitting is the standard
web-corpus practice this engine's scale demands.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .texthash import poly_hash_array

N_BUCKETS = 100


def id_buckets(col, n_buckets: int = N_BUCKETS) -> np.ndarray:
    """Stable bucket in [0, n_buckets) per id — poly64 over the DECIMAL
    STRING form of the id (ASCII, so the SQL twin reproduces it
    bit-for-bit)."""
    s = pc.cast(col, pa.large_string())
    return (poly_hash_array(s) % np.uint64(n_buckets)).astype(np.int64)


def hash_split(
    ds,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = (("train", 80), ("val", 10), ("test", 10)),
):
    """Append a ``split`` column assigning each row to a named split by
    its id bucket. Percentages must sum to ``N_BUCKETS`` (= exact
    bucket ranges: train [0,80), val [80,90), test [90,100) for the
    default). Pure map — no shuffle, no state, idempotent across runs
    and corpus subsets."""
    total = sum(p for _, p in splits)
    if total != N_BUCKETS:
        raise ValueError(f"split percentages must sum to {N_BUCKETS}, got {total}")
    names = [n for n, _ in splits]
    bounds = np.cumsum([p for _, p in splits])  # right-exclusive uppers

    def body(b: pa.Table) -> pa.Table:
        buckets = id_buckets(b.column(id_col))
        idx = np.searchsorted(bounds, buckets, side="right")
        vals = np.asarray(names, dtype=object)[idx]
        return b.append_column("split", pa.array(vals, pa.string()))

    return ds.map_batches(body, batch_format="pyarrow")


def stratified_hash_sample(
    ds,
    id_col: str = "doc_id",
    strat_col: str = "lang",
    rates: dict[str, int] | None = None,
    default_pct: int = 100,
):
    """Per-stratum deterministic down-sample — the language-rebalancing
    step of a web-corpus mix (e.g. keep 5% of English, all of the
    low-resource tail). Each row's keep/drop is a pure function of
    (id bucket, stratum rate): no shuffle, no RNG state, identical
    membership on every worker / re-run / corpus subset. ``rates`` maps
    stratum value -> keep percentage in [0, 100]; unlisted strata use
    ``default_pct``. Replayable in SQL as a CASE ladder over the same
    poly64 bucket, so assignments are value-verified."""
    rates = dict(rates or {})
    for k, v in rates.items():
        if not 0 <= v <= N_BUCKETS:
            raise ValueError(f"rate for {k!r} must be in [0, {N_BUCKETS}], got {v}")
    if not 0 <= default_pct <= N_BUCKETS:
        raise ValueError(f"default_pct must be in [0, {N_BUCKETS}]")

    def body(b: pa.Table) -> pa.Table:
        buckets = id_buckets(b.column(id_col))
        strata = b.column(strat_col).to_numpy(zero_copy_only=False)
        # vectorized rate lookup: map each distinct stratum in the
        # batch once, then scatter — no per-row dict probes
        uniq, inv = np.unique(strata, return_inverse=True)
        uniq_rates = np.asarray([rates.get(s, default_pct) for s in uniq], np.int64)
        return b.filter(pa.array(buckets < uniq_rates[inv]))

    return ds.map_batches(body, batch_format="pyarrow")


def hash_sample(ds, id_col: str = "doc_id", keep_pct: int = 10):
    """Keep rows whose id bucket < ``keep_pct`` — a deterministic,
    reproducible ~keep_pct% sample (the same ids survive on every run
    and on every shard of the corpus)."""
    if not 0 <= keep_pct <= N_BUCKETS:
        raise ValueError(f"keep_pct must be in [0, {N_BUCKETS}]")

    def body(b: pa.Table) -> pa.Table:
        m = id_buckets(b.column(id_col)) < keep_pct
        return b.filter(pa.array(m))

    return ds.map_batches(body, batch_format="pyarrow")
