"""Sequence packing — assign every document its slot in the packed
token stream a pretraining data loader reads.

The GPT-style concat-and-chunk step: documents are concatenated in a
deterministic global order and the stream is cut into fixed-length
sequences; each document needs (seq_id, seq_offset) = where its first
token lands. That is a GLOBAL PREFIX SUM over per-doc token counts —
the textbook two-pass distributed scan:

- **Pass 1 (combine):** per batch, one vectorized regex count gives
  per-doc token counts; map-side partial sums per contiguous id RANGE
  (``range = doc_id // range_size``) reduce to one tiny (range, sum)
  table — the driver sees #ranges rows (corpus/range_size, ~10^5 at
  10^10 docs), never per-doc data.
- **Driver:** exclusive prefix over the sorted range sums → one
  broadcast offsets array (``ray.put`` once).
- **Pass 2 (scan):** ONE co-partitioning exchange by range key; each
  group sorts its docs by id, local cumsum + its range's global offset
  → (seq_id, seq_offset). Only (doc_id, n_tokens, range) rows move —
  16 bytes/doc, never text.

Determinism contract: order is ``doc_id`` ascending and token counts
are intrinsic to the text, so re-runs, resumes and any cluster size
produce the identical packing — the property a resumable training run
needs. The SQL twin replays it as a window cumsum
(``sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)``),
all-integer, so values match exactly.

(The reference has no pretraining analogue; nearest is the
deterministic ordering of its curated exports. This op pairs with
``q_train_order_documents`` — run packing over the shuffled order by
passing that key as ``id_col``.)
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _count_and_range(
    b: pa.Table, text_col: str, id_col: str, range_size: int
) -> pa.Table:
    n = pc.cast(
        pc.count_substring_regex(pc.cast(b.column(text_col), pa.string()), r"\S+"),
        pa.int64(),
    )
    n = pc.fill_null(n, 0)
    ids = b.column(id_col)
    rng = pc.divide(ids, pa.scalar(range_size, pa.int64()))
    return pa.table({id_col: ids, "n_tokens": n, "_rng": rng})


def _range_partials(b: pa.Table) -> pa.Table:
    rng = b.column("_rng").to_numpy(zero_copy_only=False)
    tok = b.column("n_tokens").to_numpy(zero_copy_only=False)
    vals, inv = np.unique(rng, return_inverse=True)
    sums = np.bincount(inv, weights=tok).astype(np.int64)
    return pa.table({"_rng": pa.array(vals), "tok": pa.array(sums)})


def _assign(
    g: pd.DataFrame, offsets_ref, seq_len: int, id_col: str
) -> pd.DataFrame:
    import ray

    rng_ids, rng_offs = ray.get(offsets_ref)
    r = int(g["_rng"].iloc[0])
    base = int(rng_offs[np.searchsorted(rng_ids, r)])
    order = np.argsort(g[id_col].to_numpy(), kind="stable")
    ids = g[id_col].to_numpy()[order]
    toks = g["n_tokens"].to_numpy()[order]
    before = base + np.concatenate([[0], np.cumsum(toks)[:-1]])
    return pd.DataFrame(
        {
            id_col: ids,
            "n_tokens": toks,
            "seq_id": before // seq_len,
            "seq_offset": before % seq_len,
        }
    )


def pack_sequences(
    ds,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    range_size: int = 100_000,
    counter: str = "whitespace",
):
    """Lazy Dataset of (id_col, n_tokens, seq_id, seq_offset): where
    each document's first token lands when the corpus is concatenated
    in id order and cut into ``seq_len``-token sequences.

    ``counter``: "whitespace" (one regex pass, the SQL-twinnable
    fallback) or "bpe" (real merges-table BPE via ops/bpe's cached
    actor pool — the count a trained tokenizer would produce, which is
    the contract packing actually needs)."""
    import ray

    if counter == "bpe":
        from .bpe import bpe_token_count_ds

        def add_range(b: pa.Table) -> pa.Table:
            rng = pc.divide(b.column(id_col), pa.scalar(range_size, pa.int64()))
            return pa.table(
                {
                    id_col: b.column(id_col),
                    "n_tokens": b.column("n_tokens"),
                    "_rng": rng,
                }
            )

        counted = (
            bpe_token_count_ds(ds, col=text_col, out="n_tokens")
            .map_batches(add_range, batch_format="pyarrow")
            .materialize()
        )
    elif counter == "whitespace":
        counted = ds.map_batches(
            functools.partial(
                _count_and_range, text_col=text_col, id_col=id_col, range_size=range_size
            ),
            batch_format="pyarrow",
        ).materialize()
    else:
        raise ValueError(f"unknown counter {counter!r}")

    # pass 1: tiny per-range totals -> exclusive prefix on the driver
    partial = counted.select_columns(["_rng", "n_tokens"]).map_batches(
        lambda b: _range_partials(b), batch_format="pyarrow"
    )
    sums: dict[int, int] = {}
    for b in partial.iter_batches(batch_format="pyarrow"):
        for r, t in zip(b.column("_rng").to_pylist(), b.column("tok").to_pylist()):
            sums[r] = sums.get(r, 0) + t
    rng_ids = np.array(sorted(sums), dtype=np.int64)
    totals = np.array([sums[r] for r in rng_ids], dtype=np.int64)
    rng_offs = np.concatenate([[0], np.cumsum(totals)[:-1]])
    offsets_ref = ray.put((rng_ids, rng_offs))

    # pass 2: one co-partitioning exchange of 16-byte rows, in-group scan
    return counted.groupby("_rng").map_groups(
        functools.partial(
            _assign, offsets_ref=offsets_ref, seq_len=seq_len, id_col=id_col
        ),
        batch_format="pandas",
    )
