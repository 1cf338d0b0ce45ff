"""Unigram language-model quality scoring (CCNet-style perplexity filter).

The canonical LLM-corpus quality gate (Wenzek et al. 2019, "CCNet":
score each document by LM negative log-likelihood and keep the
low-perplexity tail) reduced to its distributable core: fit a unigram
LM over the corpus itself, then score every document by its mean
per-token surprisal. (The reference has no corpus-level text op — its
closest analogue is the validation-score rollups in
``airflow/dags/repsly_dag.py:39-270``; semantics generalized to the
``documents`` table like the rest of ops/text.py.)

Ray-Data shape (100-TB discipline):
- **Fit pass** reuses the vocabulary combiner (ops/vocab.py): each
  batch emits distinct (token, count) partials via one np.unique pass,
  so the exchange moves distinct-tokens-per-batch rows, not one row
  per occurrence. The coarse-bucket reduce sums counts per token with
  ONE lexsort + run-length pass, keeps tokens with ``count >=
  min_count`` (the model), and emits its bucket's pre-filter total as
  a sentinel row — the driver sums sentinels to the exact corpus token
  count N without a second pass.
- **Model broadcast**: the (token, count) vocabulary goes into the
  object store ONCE via ``ray.put``; every scoring task reads the same
  immutable copy (never re-shipped per batch). Above
  ``broadcast_limit`` vocab rows the fit fails LOUDLY — the scale path
  for a >100M-type vocabulary is a token-keyed hash join (the
  ops/tfidf.py pattern) rather than a silent OOM.
- **Scoring pass** is a zero-shuffle map_batches: tokenize the Arrow
  buffer, np.unique the batch's tokens, binary-search the unique set
  against the sorted vocab, then scatter per-token costs back through
  the inverse index and reduce per document with np.add.reduceat.

Determinism contract (what makes the DuckDB oracle replay value-for-
value): per-token cost is the INTEGER floor(ln(N / count) * 1e6)
micro-nats — integer sums are order-independent, so the only floating
point shared with SQL is one ln + one final division, both bit-stable
across DuckDB and numpy (same libm doubles; the tfidf oracle already
relies on this).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .texthash import tokenize_ws
from .vocab import _token_partials

MICRO = 1_000_000.0


def _bucket_lm_reduce(g: pd.DataFrame, min_count: int) -> pd.DataFrame:
    """Reduce one token bucket: exact per-token counts (one sort +
    run-length pass); rows with count >= min_count form the model. The
    bucket's TOTAL token count (pre-filter) rides along as a sentinel
    row (tok = None) so the driver gets exact N for free."""
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
    return pd.DataFrame(
        {
            "tok": np.append(uniq[keep], [None]),
            "cnt": np.append(totals[keep], [int(c_s.sum())]).astype(np.int64),
        }
    )


def fit_unigram_lm(
    ds,
    text_col: str = "text",
    min_count: int = 5,
    num_buckets: int = 64,
    broadcast_limit: int = 50_000_000,
) -> tuple[pa.Table, int]:
    """Fit the unigram model: returns (vocab table sorted by token with
    columns tok/cnt, exact corpus token count N). Driver materializes
    only the min_count-filtered vocabulary (Zipf-bounded) + one
    sentinel row per bucket."""
    part = functools.partial(
        _token_partials, text_col=text_col, num_buckets=num_buckets
    )
    red = functools.partial(_bucket_lm_reduce, min_count=min_count)
    rows = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(red, batch_format="pandas")
    )
    t = pa.concat_tables(rows.iter_batches(batch_format="pyarrow"))
    if t.num_rows == 0:
        return pa.table({"tok": pa.array([], pa.large_string()), "cnt": pa.array([], pa.int64())}), 0
    tok = t.column("tok")
    is_sent = pc.is_null(tok)
    total = int(pc.sum(pc.filter(t.column("cnt"), is_sent)).as_py() or 0)
    vocab = t.filter(pc.invert(is_sent))
    if vocab.num_rows > broadcast_limit:
        raise RuntimeError(
            f"unigram vocab has {vocab.num_rows} rows > broadcast_limit="
            f"{broadcast_limit}; raise min_count or switch to the "
            "token-keyed join scoring path (ops/tfidf.py pattern)"
        )
    toks_np = np.asarray(vocab.column("tok"))
    order = np.argsort(toks_np, kind="stable")
    return (
        pa.table(
            {
                "tok": pa.array(toks_np[order], pa.large_string()),
                "cnt": pa.array(vocab.column("cnt").to_numpy()[order]),
            }
        ),
        total,
    )


def _score_batch(
    b: pa.Table,
    model_ref,
    total: int,
    text_col: str,
    id_col: str,
) -> pa.Table:
    import ray

    vocab_toks, vocab_cnts = ray.get(model_ref)
    lowered = pc.utf8_lower(pc.cast(b.column(text_col), pa.large_string()))
    flat, offs = tokenize_ws(lowered)
    n_tok = np.diff(offs)
    flat_np = np.asarray(flat)
    if len(flat_np):
        uniq, inv = np.unique(flat_np, return_inverse=True)
        pos = np.searchsorted(vocab_toks, uniq)
        pos_c = np.minimum(pos, max(len(vocab_toks) - 1, 0))
        found = (
            (vocab_toks[pos_c] == uniq) if len(vocab_toks) else np.zeros(len(uniq), bool)
        )
        ucnt = np.where(found, vocab_cnts[pos_c] if len(vocab_cnts) else 1, 1)
        # integer micro-nat surprisal: floor(ln(N/cnt)*1e6) — exact
        # integer sums below make the doc score order-independent
        ucost = np.floor(np.log(float(total) / ucnt) * MICRO).astype(np.int64)
        cost = ucost[inv]
        sums = np.add.reduceat(
            np.append(cost, 0), np.minimum(offs[:-1], len(cost))
        )
        sums[n_tok == 0] = 0
    else:
        sums = np.zeros(len(n_tok), dtype=np.int64)
    keep = n_tok > 0
    # mean surprisal in INTEGER micro-nats per token (floor division):
    # the whole score path is exact integer arithmetic, so replay and
    # the SQL twin agree bit-for-bit with no float-rounding boundary
    score = sums[keep] // n_tok[keep]
    return pa.table(
        {
            id_col: b.column(id_col).filter(pa.array(keep)),
            "n_tokens": pa.array(n_tok[keep].astype(np.int64)),
            "lm_score_micro": pa.array(score.astype(np.int64)),
        }
    )


def unigram_lm_scores(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    num_buckets: int = 64,
) -> "object":
    """Two-pass corpus scoring: fit (one combining shuffle of distinct-
    token partials) then score (zero-shuffle streaming map over the
    broadcast model). Returns a lazy Dataset of
    (id_col, n_tokens, lm_score_micro) — mean per-token surprisal in
    integer micro-nats (lower = more in-distribution, the CCNet keep
    criterion); tokenless documents are excluded."""
    import ray

    vocab, total = fit_unigram_lm(
        ds, text_col=text_col, min_count=min_count, num_buckets=num_buckets
    )
    model_ref = ray.put(
        (np.asarray(vocab.column("tok")), vocab.column("cnt").to_numpy())
    )
    score = functools.partial(
        _score_batch,
        model_ref=model_ref,
        total=total,
        text_col=text_col,
        id_col=id_col,
    )
    return ds.map_batches(score, batch_format="pyarrow")
