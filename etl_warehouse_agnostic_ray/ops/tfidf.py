"""Inverted index + TF-IDF: the retrieval-side corpus operators.

An LLM data pipeline needs term→document structure twice: an inverted
index for contamination lookups / targeted filtering, and TF-IDF
weights for cheap relevance scoring and keyword extraction. (The
reference has no corpus-level text op — its nearest analogue is the
per-table rollups in dbt/models/curated/; semantics generalized to the
documents table, tokenizer shared with ops/vocab.py so all three
agree on what a token is.)

Ray-Data shape (100-TB discipline):
- The (doc, term) pair stream is combined IN the batch: one
  tokenize + np.unique-per-doc pass emits (doc_id, tok, tf) rows —
  the exchange moves distinct-terms-per-doc, never raw occurrences.
- The inverted index reduces pairs in coarse token-hash buckets
  (a term lives wholly in one bucket): ONE argsort + run-boundary
  pass per bucket, then per-term posting strings. Output is the
  index itself — any engine pays O(index bytes) to build it; at
  full corpus scale callers shard hot terms by (tok, doc-range)
  before export rather than capping lists silently.
- TF-IDF joins the pair stream against the term-document-frequency
  table with a distributed hash join ON THE TOKEN (both sides
  shuffle once, 8-byte-hash-keyed); document frequencies are never
  collected on the driver. Per-doc top-k then reuses the coarse
  doc-hash partition + single-lexsort pattern.
- Money-grade determinism: tf/df are exact ints; the only float is
  round(tf · ln(N/df), 6), computed identically (libm double) by
  numpy and the DuckDB twin, and ranking sorts the ROUNDED score so
  both sides break ties on the same key.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .texthash import poly_hash_array, tokenize_ws


def _doc_term_partials(
    b: pa.Table, id_col: str, text_col: str, num_buckets: int
) -> pa.Table:
    """Per-batch combiner: (doc_id, tok, tf) for each distinct term of
    each non-null doc, plus the term's coarse hash bucket."""
    mask = pc.is_valid(b.column(text_col))
    b = b.filter(mask)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "tok": pa.array([], pa.large_string()),
            "tf": pa.array([], pa.int64()),
            "_bk": pa.array([], pa.int64()),
        }
    )
    if b.num_rows == 0:
        return empty
    lowered = pc.utf8_lower(pc.cast(b.column(text_col), pa.large_string()))
    flat, offsets = tokenize_ws(lowered)
    if len(flat) == 0:
        return empty
    doc_ids = b.column(id_col).to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    docrep = np.repeat(np.arange(b.num_rows, dtype=np.int64), counts)
    toks_u, inv = np.unique(np.asarray(flat), return_inverse=True)
    # exact distinct (term, doc) pairs: composite int key, no hashing
    key = inv.astype(np.int64) * np.int64(b.num_rows) + docrep
    uniq, tf = np.unique(key, return_counts=True)
    tok_idx = uniq // b.num_rows
    doc_idx = uniq % b.num_rows
    tok_arr = pa.array(toks_u[tok_idx], pa.large_string())
    bucket = (poly_hash_array(tok_arr) % np.uint64(num_buckets)).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[doc_idx]),
            # plain string: per-batch distinct-token bytes are far
            # below the 2 GB offset limit, and groupby/join stages
            # emit string — keeping both sides identical
            "tok": pc.cast(tok_arr, pa.string()),
            "tf": pa.array(tf.astype(np.int64)),
            "_bk": pa.array(bucket),
        }
    )


def doc_term_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                   num_buckets: int = 64):
    """Lazy Dataset of (doc_id, tok, tf, _bk) — the shared precursor."""
    part = functools.partial(
        _doc_term_partials, id_col=id_col, text_col=text_col, num_buckets=num_buckets
    )
    return ds.map_batches(part, batch_format="pyarrow")


def _bucket_postings(g: pd.DataFrame) -> pd.DataFrame:
    """Reduce one token bucket to (tok, df, postings): one argsort on
    (tok, doc_id) + run boundaries; the per-term ','-join is the
    output-string materialization itself (O(index bytes))."""
    toks = g["tok"].to_numpy()
    docs = g["doc_id"].to_numpy()
    order = np.lexsort((docs, toks))
    t_s, d_s = toks[order], docs[order]
    first = np.ones(len(t_s), dtype=bool)
    first[1:] = t_s[1:] != t_s[:-1]
    starts = np.flatnonzero(first)
    ends = np.append(starts[1:], len(t_s))
    d_str = d_s.astype("U20")
    return pd.DataFrame(
        {
            "tok": t_s[starts],
            "df": (ends - starts).astype(np.int64),
            "postings": [",".join(d_str[s:e]) for s, e in zip(starts, ends)],
        }
    )


def inverted_index(ds, id_col: str = "doc_id", text_col: str = "text",
                   num_buckets: int = 64):
    """term → (document frequency, sorted ','-joined doc-id posting
    list) over the corpus. Lazy; one shuffle of combined pairs."""
    return (
        doc_term_pairs(ds, id_col, text_col, num_buckets)
        .groupby("_bk")
        .map_groups(_bucket_postings, batch_format="pandas")
    )


def _doc_topk(g: pd.DataFrame, k: int) -> pd.DataFrame:
    """Per-doc top-k by (rounded score desc, tok asc): one lexsort +
    run-offset pass over the whole partition."""
    docs = g["doc_id"].to_numpy()
    toks = g["tok"].to_numpy()
    score = g["tfidf_w"].to_numpy()
    order = np.lexsort((toks, -score, docs))
    d_s = docs[order]
    n = len(d_s)
    start = np.ones(n, dtype=bool)
    start[1:] = d_s[1:] != d_s[:-1]
    starts = np.flatnonzero(start)
    lengths = np.diff(np.append(starts, n))
    seq = np.arange(n, dtype=np.int64) - np.repeat(starts, lengths) + 1
    keep = seq <= k
    sel = order[keep]
    return pd.DataFrame(
        {
            "doc_id": docs[sel],
            "tok": toks[sel],
            "tf": g["tf"].to_numpy()[sel],
            "tfidf_w": score[sel],
            "rank": seq[keep],
        }
    )


def _bucket_score(g: pd.DataFrame, n_f: float) -> pd.DataFrame:
    """Score one token bucket: df per token via ONE sort + run-length
    pass (a token's (doc, term) pair rows live wholly in its hash
    bucket, so the bucket-local count IS the global document
    frequency), then tfidf_w = round(tf·ln(N/df), 6) per pair row."""
    toks = g["tok"].to_numpy()
    tf = g["tf"].to_numpy()
    order = np.argsort(toks, kind="stable")
    t_s = toks[order]
    first = np.ones(len(t_s), dtype=bool)
    first[1:] = t_s[1:] != t_s[:-1]
    starts = np.flatnonzero(first)
    lengths = np.diff(np.append(starts, len(t_s)))
    df = np.empty(len(toks), np.int64)
    df[order] = np.repeat(lengths, lengths)
    docs = g["doc_id"].to_numpy()
    return pd.DataFrame(
        {
            "doc_id": docs,
            "tok": toks,
            "tf": tf,
            "tfidf_w": np.round(tf * np.log(n_f / df), 6),
            "pk": docs & 255,
        }
    )


def tfidf_topk(ds, id_col: str = "doc_id", text_col: str = "text",
               k: int = 3, num_buckets: int = 64):
    """Top-k TF-IDF terms per document: score = round(tf·ln(N/df), 6).

    N counts non-null-text docs (one column-pruned pass). df is
    computed INSIDE each token-hash bucket of the pair stream — a
    token's pair rows are co-located by construction, so no join is
    needed at all (one exchange fewer than the pairs ⋈ df formulation;
    also sidesteps Ray's hash-join failing on low-cardinality keys,
    where num_partitions > distinct keys leaves schema-less empty
    right partitions that Acero rejects)."""
    n_docs = ds.map_batches(
        lambda b: pa.table(
            {"n": pa.array([pc.sum(pc.cast(pc.is_valid(b.column(text_col)),
                                           pa.int64())).as_py() or 0])}
        ),
        batch_format="pyarrow",
    ).sum("n")

    pairs = doc_term_pairs(ds, id_col, text_col, num_buckets)
    scored = pairs.groupby("_bk").map_groups(
        functools.partial(_bucket_score, n_f=float(n_docs)), batch_format="pandas"
    )
    red = functools.partial(_doc_topk, k=k)
    return scored.groupby("pk").map_groups(red, batch_format="pandas")
