"""Corpus vocabulary building: global token frequencies + top-k.

The tokenizer-training precursor every LLM data pipeline runs before
BPE: count every whitespace token across the corpus, keep the top-k.
(The reference has no corpus-level text op — its closest analogue is
the per-table aggregate rollups in dbt/models/curated/; semantics
generalized to the documents table.)

Ray-Data shape (100-TB discipline):
- Map-side COMBINING: each batch emits its distinct (token, count)
  partials via one np.unique pass over the Arrow token buffer — the
  exchange moves distinct-tokens-per-batch rows, not one row per
  token occurrence (Zipf makes this a ~10-100× shrink on web text).
- The reduce is the coarse-partition pattern (ops/dedup.py): tokens
  hash into `num_buckets` groups; each group does ONE lexsort +
  run-length-sum pass, then keeps its local top-k. A token lives
  wholly in one bucket, so the global top-k is a subset of the
  union of per-bucket top-k — the driver only ever sees
  num_buckets × k candidate rows.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .texthash import poly_hash_array, tokenize_ws


def _token_partials(b: pa.Table, text_col: str, num_buckets: int) -> pa.Table:
    """Per-batch combiner: distinct lowered tokens + occurrence counts
    + coarse hash bucket."""
    lowered = pc.utf8_lower(pc.cast(b.column(text_col), pa.large_string()))
    flat, _ = tokenize_ws(lowered)
    if len(flat) == 0:
        return pa.table(
            {
                "tok": pa.array([], pa.large_string()),
                "cnt": pa.array([], pa.int64()),
                "_bk": pa.array([], pa.int64()),
            }
        )
    toks, counts = np.unique(np.asarray(flat), return_counts=True)
    tok_arr = pa.array(toks, pa.large_string())
    bucket = (poly_hash_array(tok_arr) % np.uint64(num_buckets)).astype(np.int64)
    return pa.table(
        {
            "tok": tok_arr,
            "cnt": pa.array(counts.astype(np.int64)),
            "_bk": pa.array(bucket),
        }
    )


def _bucket_topk(g: pd.DataFrame, k: int) -> pd.DataFrame:
    """Reduce one token bucket: sum partial counts per token (one
    sort + run-length pass), keep the bucket's top-k by
    (count desc, token asc)."""
    toks = g["tok"].to_numpy()
    cnts = g["cnt"].to_numpy()
    order = np.argsort(toks, kind="stable")
    t_s, c_s = toks[order], cnts[order]
    first = np.ones(len(t_s), dtype=bool)
    first[1:] = t_s[1:] != t_s[:-1]
    starts = np.flatnonzero(first)
    totals = np.add.reduceat(c_s, starts)
    uniq = t_s[starts]
    top = np.lexsort((uniq, -totals))[:k]
    return pd.DataFrame({"tok": uniq[top], "cnt": totals[top]})


def vocab_topk(
    ds,
    text_col: str = "text",
    k: int = 50,
    num_buckets: int = 64,
) -> pa.Table:
    """Global top-k (token, count) over the corpus, ordered by
    (count desc, token asc). Returns a small pa.Table (≤ k rows) —
    the only driver materialization is num_buckets × k candidates."""
    part = functools.partial(_token_partials, text_col=text_col, num_buckets=num_buckets)
    red = functools.partial(_bucket_topk, k=k)
    cand = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(red, batch_format="pandas")
    )
    t = pa.concat_tables(cand.iter_batches(batch_format="pyarrow"))
    if t.num_rows == 0:
        return pa.table({"tok": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    toks = np.asarray(t.column("tok"))
    cnts = t.column("cnt").to_numpy()
    top = np.lexsort((toks, -cnts))[:k]
    return pa.table(
        {
            "tok": pa.array(toks[top], pa.string()),
            "cnt": pa.array(cnts[top], pa.int64()),
        }
    )


def _bigram_partials(b: pa.Table, text_col: str, num_buckets: int) -> pa.Table:
    """Per-batch combiner for ADJACENT token pairs: the whole batch's
    bigrams come from two zero-copy slices of the flat token array
    joined by one C kernel, masked so pairs never straddle a document
    boundary (row ids, not offset arithmetic — empty documents make
    boundary offsets collide)."""
    lowered = pc.utf8_lower(pc.cast(b.column(text_col), pa.large_string()))
    flat, offsets = tokenize_ws(lowered)
    n = len(flat)
    empty = pa.table(
        {
            "tok": pa.array([], pa.large_string()),
            "cnt": pa.array([], pa.int64()),
            "_bk": pa.array([], pa.int64()),
        }
    )
    if n < 2:
        return empty
    rid = np.repeat(
        np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets)
    )
    valid = rid[:-1] == rid[1:]
    if not valid.any():
        return empty
    pairs = pc.binary_join_element_wise(
        flat.slice(0, n - 1), flat.slice(1), pa.scalar(" ", pa.large_string())
    ).filter(pa.array(valid))
    toks, counts = np.unique(np.asarray(pairs), return_counts=True)
    tok_arr = pa.array(toks, pa.large_string())
    bucket = (poly_hash_array(tok_arr) % np.uint64(num_buckets)).astype(np.int64)
    return pa.table(
        {
            "tok": tok_arr,
            "cnt": pa.array(counts.astype(np.int64)),
            "_bk": pa.array(bucket),
        }
    )


def bigram_topk(
    ds,
    text_col: str = "text",
    k: int = 20,
    num_buckets: int = 64,
) -> pa.Table:
    """Global top-k adjacent-token pairs — same coarse-bucket reduce
    and ≤ num_buckets × k driver materialization as ``vocab_topk``,
    with the bigram emitted as one space-joined string column."""
    part = functools.partial(
        _bigram_partials, text_col=text_col, num_buckets=num_buckets
    )
    red = functools.partial(_bucket_topk, k=k)
    cand = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(red, batch_format="pandas")
    )
    t = pa.concat_tables(cand.iter_batches(batch_format="pyarrow"))
    if t.num_rows == 0:
        return pa.table(
            {"bigram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    toks = np.asarray(t.column("tok"))
    cnts = t.column("cnt").to_numpy()
    top = np.lexsort((toks, -cnts))[:k]
    return pa.table(
        {
            "bigram": pa.array(toks[top], pa.string()),
            "cnt": pa.array(cnts[top], pa.int64()),
        }
    )
