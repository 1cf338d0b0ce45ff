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
import math

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


def _bucket_minsup(g: pd.DataFrame, min_count: int) -> pd.DataFrame:
    """Reduce one bigram bucket to EXACT counts (a pair lives wholly
    in its bucket) and keep only pairs at or above the support floor —
    the pruning that makes the PMI candidate set driver-sized."""
    toks = g["tok"].to_numpy()
    cnts = g["cnt"].to_numpy()
    order = np.argsort(toks, kind="stable")
    t_s, c_s = toks[order], cnts[order]
    first = np.ones(len(t_s), dtype=bool)
    first[1:] = t_s[1:] != t_s[:-1]
    starts = np.flatnonzero(first)
    totals = np.add.reduceat(c_s, starts)
    uniq = t_s[starts]
    keep = totals >= min_count
    return pd.DataFrame({"tok": uniq[keep], "cnt": totals[keep]})


def pmi_bigrams(
    ds,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 100,
    num_buckets: int = 64,
) -> pa.Table:
    """Top-k collocations by pointwise mutual information —
    PMI(a, b) = ln(n_ab·N / (n_a·n_b)) over adjacent lowered tokens,
    support floor ``min_count`` (PMI is noise below it). Two bounded
    passes: (1) exact bigram counts via the shared bucket reduce,
    pruned to the support floor (the candidate set is driver-sized by
    construction); (2) unigram counts for ONLY the candidate tokens —
    the needed-token set rides each task's closure and every bucket
    also ships its total token mass, so N and every n_a arrive in one
    exchange. The PMI float expression (one double product, one
    division of exact-integer doubles < 2^53, libm ln) is replayed
    verbatim by the SQL twin; ties order by bigram asc."""
    part = functools.partial(
        _bigram_partials, text_col=text_col, num_buckets=num_buckets
    )
    red = functools.partial(_bucket_minsup, min_count=min_count)
    cand = pa.concat_tables(
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(red, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")
    )
    empty = pa.table(
        {
            "bigram": pa.array([], pa.string()),
            "n_ab": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64()),
        }
    )
    if cand.num_rows == 0:
        return empty
    bigrams = np.asarray(cand.column("tok"))
    n_ab = cand.column("cnt").to_numpy()
    toks_a = np.asarray([s.split(" ", 1)[0] for s in bigrams], dtype=object)
    toks_b = np.asarray([s.split(" ", 1)[1] for s in bigrams], dtype=object)
    needed = np.unique(np.concatenate([toks_a, toks_b]))

    tok_part = functools.partial(
        _token_partials, text_col=text_col, num_buckets=num_buckets
    )

    def uni_reduce(g: pd.DataFrame) -> pd.DataFrame:
        toks = g["tok"].to_numpy()
        cnts = g["cnt"].to_numpy()
        order = np.argsort(toks, kind="stable")
        t_s, c_s = toks[order], cnts[order]
        first = np.ones(len(t_s), dtype=bool)
        first[1:] = t_s[1:] != t_s[:-1]
        starts = np.flatnonzero(first)
        totals = np.add.reduceat(c_s, starts)
        uniq = t_s[starts]
        keep = np.isin(uniq, needed)
        return pd.DataFrame(
            {
                "tok": np.concatenate([uniq[keep], ["\x00total"]]),
                "cnt": np.concatenate([totals[keep], [totals.sum()]]).astype(
                    np.int64
                ),
            }
        )

    uni = pa.concat_tables(
        ds.map_batches(tok_part, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(uni_reduce, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")
    )
    ut = np.asarray(uni.column("tok"))
    uc = uni.column("cnt").to_numpy()
    total_mask = ut == "\x00total"
    n_total = int(uc[total_mask].sum())
    lut = dict(zip(ut[~total_mask].tolist(), uc[~total_mask].tolist()))
    n_a = np.asarray([lut[t] for t in toks_a], dtype=np.int64)
    n_b = np.asarray([lut[t] for t in toks_b], dtype=np.int64)
    pmi = np.asarray(
        [
            math.log(float(ab) * float(n_total) / float(int(aa) * int(bb)))
            for ab, aa, bb in zip(n_ab, n_a, n_b)
        ],
        dtype=np.float64,
    )
    top = np.lexsort((bigrams, -pmi))[:k]
    return pa.table(
        {
            "bigram": pa.array(bigrams[top], pa.string()),
            "n_ab": pa.array(n_ab[top].astype(np.int64)),
            "n_a": pa.array(n_a[top]),
            "n_b": pa.array(n_b[top]),
            "pmi": pa.array(pmi[top], pa.float64()),
        }
    )
