"""Per-domain quota sampling (web-corpus domain balancing).

A raw web crawl is dominated by a handful of giant hosts; standard
corpus practice (C4, RefinedWeb, CCNet) caps each domain's
contribution so no source swamps the mix. Semantics here: keep at most
``cap`` documents per group (source/host), and make the kept subset a
PURE FUNCTION of the data — priority = poly64 of the decimal doc id,
ties by id — so any re-run, any shard, any cluster size selects the
same documents (no RNG state, replayable in the DuckDB oracle via
``row_number() OVER (PARTITION BY source ORDER BY prio, id)``).

Distributed shape (the pattern proven by ops/dedup.exact_dedup):
  1. pure map projects (id, group-hash pair, prio) — the exchange
     moves ~32-byte rows, never document bodies;
  2. coarse hash partitions on the group (1024 buckets, NOT a
     per-group native aggregate — that is O(distinct groups) Python);
     within each partition ONE vectorized lexsort/run pass ranks every
     row inside its group and keeps rank < cap;
  3. survivors recovered by broadcast id-set (≤5M) else a distributed
     hash join (ops/dedup.recover_rows_by_id).

Group identity inside the rank pass is a PAIR of independent 64-bit
hashes of the group string (collision ~n_groups²/2¹²⁸ — vanishing), so
arbitrarily long host names never ride the shuffle.

Reference semantics generalized: the reference ingests per-tenant
tables and never needs balancing; at 100 TB of webtext the cap is what
keeps one domain from being 30 % of the training mix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import recover_rows_by_id
from .texthash import POLY_B2, poly_hash_array

N_COARSE = 1024


def domain_quota_sample(
    ds,
    group_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 10,
    broadcast_limit: int = 5_000_000,
    join_partitions: int = 32,
    keep_cols: list[str] | None = None,
):
    """Keep at most ``cap`` rows per ``group_col`` value; returns
    (id_col, group_col) for the kept rows. Deterministic: the kept rows
    are the ``cap`` lowest poly64(str(id)) in each group (ties by id).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")

    def project(b: pa.Table) -> pa.Table:
        g = b.column(group_col)
        g1 = poly_hash_array(pc.cast(g, pa.large_string()))
        g2 = poly_hash_array(pc.cast(g, pa.large_string()), base=POLY_B2)
        prio = poly_hash_array(pc.cast(b.column(id_col), pa.large_string()))
        return pa.table(
            {
                id_col: b.column(id_col),
                "_g1": pa.array(g1.view(np.int64)),
                "_g2": pa.array(g2.view(np.int64)),
                "_prio": pa.array(prio.view(np.int64)),
                "_pk": pa.array((g1 % np.uint64(N_COARSE)).astype(np.int64)),
            }
        )

    def rank_and_cap(g: pd.DataFrame) -> pd.DataFrame:
        g1 = g["_g1"].to_numpy()
        g2 = g["_g2"].to_numpy()
        # sort by UNSIGNED priority so the SQL twin's non-negative
        # HUGEINT ORDER BY matches bit-for-bit
        prio = g["_prio"].to_numpy().view(np.uint64)
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, prio, g2, g1))
        g1s, g2s = g1[order], g2[order]
        n = len(ids)
        first = np.ones(n, dtype=bool)
        first[1:] = (g1s[1:] != g1s[:-1]) | (g2s[1:] != g2s[:-1])
        run_id = np.cumsum(first) - 1
        rank = np.arange(n) - np.flatnonzero(first)[run_id]
        return pd.DataFrame({id_col: ids[order][rank < cap]})

    survivors = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(rank_and_cap, batch_format="pandas")
    ).materialize()

    return recover_rows_by_id(
        ds,
        survivors,
        id_col,
        keep_cols if keep_cols is not None else [id_col, group_col],
        broadcast_limit,
        join_partitions,
    )
