"""Cross-document line-level deduplication (boilerplate removal).

Web pages share nav bars, cookie banners, and footers; CCNet /
RefinedWeb practice removes any line whose document frequency across
the corpus reaches a threshold. Semantics here: split ``text`` on
newline; a NON-EMPTY line occurring in >= ``min_df`` distinct
documents is removed from EVERY document; empty and below-threshold
lines are kept in their original order; output is
(id, text, n_lines, n_removed) — replayable in the DuckDB oracle as
unnest -> count(DISTINCT doc) -> anti-join -> string_agg.

(Reference analogue: the staging models' repeated-header stripping,
dbt/models/staging/repsly/stg_repsly__visits.sql — semantics
generalized from per-table artifacts to corpus-level line frequency.)

Ray-Data shape (100-TB discipline):
- DF pass: each batch does ONE vectorized pass — split lines, hash
  each line to a 128-bit pair (two independent poly64s; a collision
  merging two distinct lines is ~n²/2¹²⁸ — vanishing), reduce to
  per-doc DISTINCT pairs, then to per-batch (pair, doc-count)
  partials. The exchange moves 24-byte rows, never line text, and the
  map-side combine collapses within-batch repeats (Zipf shrink).
- The reduce is the coarse-bucket pattern (ops/dedup.py): pairs hash
  into ``N_COARSE`` groups by h1 (a pair lives wholly in one bucket),
  each group runs ONE lexsort + run-sum pass and keeps df >= min_df.
- Rewrite pass (broadcast tier): the dup-pair set — small by nature,
  boilerplate is the head of the Zipf curve — is ``ray.put`` ONCE as
  a sorted structured array; every rewrite task tests its lines with
  a vectorized searchsorted, rebuilds kept-list offsets with bincount
  + cumsum, and reassembles text with ``pc.binary_join``. No Python
  per row, no second shuffle.
- Above ``broadcast_limit`` dup pairs, the fully distributed path:
  line rows (id, ord, line, h1, h2) LEFT ANTI join the dup pairs,
  then per-doc reassembly in coarse buckets (one lexsort +
  binary_join per bucket). A per-doc anchor row (ord = -1, empty
  line) survives the anti join by construction, so all-boilerplate
  docs still emit text = ''.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.typed import with_schema
from .texthash import POLY_B2, poly_hash_array, splitmix64

N_COARSE = 1024
_PAIR_DT = np.dtype([("h1", "<u8"), ("h2", "<u8")])


def split_lines(col, delimiter: str = "\n") -> tuple[pa.Array, np.ndarray]:
    """Split a string column on ``delimiter`` (newline by default;
    "\n\n" gives paragraph units). Returns (flat segment array,
    per-row offsets int64[n+1]). '' rows yield one empty segment,
    exactly like DuckDB's string_split."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.fill_null(pc.cast(col, pa.large_string()), "")
    lst = pc.split_pattern(s, pattern=delimiter)
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = lst.flatten()
    off_dtype = np.int64 if pa.types.is_large_list(lst.type) else np.int32
    loff = np.frombuffer(lst.buffers()[1], dtype=off_dtype)[
        lst.offset : lst.offset + len(lst) + 1
    ]
    return flat, (loff - loff[0]).astype(np.int64)


def _pair_hashes(flat: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    return poly_hash_array(flat), poly_hash_array(flat, POLY_B2)


def _df_partials(
    b: pa.Table, text_col: str, num_buckets: int, delimiter: str = "\n"
) -> pa.Table:
    """Per-batch combiner: (h1, h2, cnt) where cnt = number of docs in
    this batch containing the (non-empty) line."""
    flat, offs = split_lines(b.column(text_col), delimiter)
    h1, h2 = _pair_hashes(flat)
    lens = pc.binary_length(flat).to_numpy(zero_copy_only=False)
    seg = np.repeat(np.arange(len(b), dtype=np.int64), np.diff(offs))
    m = lens > 0
    h1, h2, seg = h1[m], h2[m], seg[m]
    empty = pa.table(
        {
            "h1": pa.array([], pa.int64()),
            "h2": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "_bk": pa.array([], pa.int64()),
        }
    )
    if len(h1) == 0:
        return empty
    # per-doc distinct pairs, then per-pair doc counts — one lexsort
    order = np.lexsort((seg, h2, h1))
    a, c, s = h1[order], h2[order], seg[order]
    first = np.ones(len(a), dtype=bool)
    first[1:] = (a[1:] != a[:-1]) | (c[1:] != c[:-1]) | (s[1:] != s[:-1])
    a, c = a[first], c[first]
    pf = np.ones(len(a), dtype=bool)
    pf[1:] = (a[1:] != a[:-1]) | (c[1:] != c[:-1])
    starts = np.flatnonzero(pf)
    cnt = np.diff(np.append(starts, len(a)))
    a, c = a[starts], c[starts]
    return pa.table(
        {
            "h1": pa.array(a.view(np.int64)),
            "h2": pa.array(c.view(np.int64)),
            "cnt": pa.array(cnt.astype(np.int64)),
            "_bk": pa.array((a % np.uint64(num_buckets)).astype(np.int64)),
        }
    )


def _bucket_df(g: pd.DataFrame, min_df: int) -> pd.DataFrame:
    """Reduce one pair bucket: sum partial doc counts per (h1, h2) in
    one lexsort + reduceat pass; keep pairs with df >= min_df."""
    h1 = g["h1"].to_numpy()
    h2 = g["h2"].to_numpy()
    cnt = g["cnt"].to_numpy()
    order = np.lexsort((h2, h1))
    a, c, n = h1[order], h2[order], cnt[order]
    first = np.ones(len(a), dtype=bool)
    first[1:] = (a[1:] != a[:-1]) | (c[1:] != c[:-1])
    starts = np.flatnonzero(first)
    totals = np.add.reduceat(n, starts)
    keep = totals >= min_df
    return pd.DataFrame({"h1": a[starts][keep], "h2": c[starts][keep]})


def _dup_pairs_array(dup) -> np.ndarray:
    """Pull the (bounded) dup-pair dataset into one SORTED structured
    array for searchsorted membership."""
    parts = []
    for b in dup.iter_batches(batch_format="pyarrow"):
        x = np.empty(b.num_rows, _PAIR_DT)
        x["h1"] = b.column("h1").to_numpy(zero_copy_only=False).view(np.uint64)
        x["h2"] = b.column("h2").to_numpy(zero_copy_only=False).view(np.uint64)
        parts.append(x)
    if not parts:
        return np.empty(0, _PAIR_DT)
    return np.sort(np.concatenate(parts))


def _rewrite_broadcast(
    b: pa.Table, ref, text_col: str, id_col: str, passthrough: tuple = (),
    delimiter: str = "\n",
) -> pa.Table:
    import ray

    dupset = ray.get(ref)
    flat, offs = split_lines(b.column(text_col), delimiter)
    h1, h2 = _pair_hashes(flat)
    lens = pc.binary_length(flat).to_numpy(zero_copy_only=False)
    n = len(b)
    seg = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    if len(dupset) and len(h1):
        q = np.empty(len(h1), _PAIR_DT)
        q["h1"], q["h2"] = h1, h2
        idx = np.searchsorted(dupset, q)
        idx_c = np.minimum(idx, len(dupset) - 1)
        member = (
            (dupset["h1"][idx_c] == h1)
            & (dupset["h2"][idx_c] == h2)
            & (idx < len(dupset))
        )
    else:
        member = np.zeros(len(h1), dtype=bool)
    remove = member & (lens > 0)
    keep = ~remove
    kept_counts = np.bincount(seg[keep], minlength=n)
    new_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=new_off[1:])
    lst = pa.LargeListArray.from_arrays(
        pa.array(new_off), flat.filter(pa.array(keep))
    )
    cols = {
        id_col: b.column(id_col),
        "text": pc.binary_join(lst, pa.scalar(delimiter, pa.large_string())),
        "n_lines": pa.array(np.diff(offs).astype(np.int64)),
        "n_removed": pa.array(
            np.bincount(seg[remove], minlength=n).astype(np.int64)
        ),
    }
    for c in passthrough:
        cols[c] = b.column(c)
    return pa.table(cols)


def _project_lines(
    b: pa.Table, text_col: str, id_col: str, num_buckets: int,
    passthrough: tuple = (), delimiter: str = "\n",
) -> pa.Table:
    """Scale-path projection: one row per line PLUS one anchor row per
    doc (ord = -1, never matches the dup set) so all-boilerplate docs
    survive the anti join."""
    flat, offs = split_lines(b.column(text_col), delimiter)
    h1, h2 = _pair_hashes(flat)
    ids = b.column(id_col).to_numpy(zero_copy_only=False)
    nl = np.diff(offs)
    seg = np.repeat(np.arange(len(b), dtype=np.int64), nl)
    ord_ = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], nl)
    # anchors: h pair = (-1, -1) — poly hashes of real lines are
    # uniform uint64; the all-ones pair never collides with the dup set
    # except at ~2^-128
    a_ids = ids
    cat_ids = np.concatenate([ids[seg], a_ids])
    cat_ord = np.concatenate([ord_, np.full(len(b), -1, np.int64)])
    cat_nl = np.concatenate([nl[seg], nl]).astype(np.int64)
    cat_h1 = np.concatenate([h1.view(np.int64), np.full(len(b), -1, np.int64)])
    cat_h2 = np.concatenate([h2.view(np.int64), np.full(len(b), -1, np.int64)])
    line_cat = pa.concat_arrays(
        [flat, pa.array([""] * len(b), type=flat.type)]
    )
    pk = (splitmix64(cat_ids.astype(np.int64).view(np.uint64)) % np.uint64(num_buckets)).astype(np.int64)
    cols = {
        id_col: pa.array(cat_ids),
        "_ord": pa.array(cat_ord),
        "_line": line_cat,
        "h1": pa.array(cat_h1),
        "h2": pa.array(cat_h2),
        "_nl": pa.array(cat_nl),
        "_pk": pa.array(pk),
    }
    for c in passthrough:
        v = b.column(c)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        cols[c] = pa.concat_arrays([v.take(pa.array(seg)), v])
    return pa.table(cols)


def _reassemble(
    g: pd.DataFrame, id_col: str, passthrough: tuple = (),
    delimiter: str = "\n",
) -> pd.DataFrame:
    """Reduce one doc bucket: sort by (id, ord) once, rebuild each
    doc's text via list offsets + binary_join."""
    ids = g[id_col].to_numpy()
    ord_ = g["_ord"].to_numpy()
    lines = g["_line"].to_numpy()
    nl = g["_nl"].to_numpy()
    order = np.lexsort((ord_, ids))
    ids_s, ord_s, nl_s = ids[order], ord_[order], nl[order]
    real = ord_s >= 0
    first = np.ones(len(ids_s), dtype=bool)
    first[1:] = ids_s[1:] != ids_s[:-1]
    uniq = ids_s[first]
    n_lines = nl_s[first]
    ids_real = ids_s[real]
    counts = np.searchsorted(ids_real, uniq, "right") - np.searchsorted(
        ids_real, uniq, "left"
    )
    off = np.zeros(len(uniq) + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    lst = pa.LargeListArray.from_arrays(
        pa.array(off), pa.array(lines[order][real], pa.large_string())
    )
    text = pc.binary_join(lst, pa.scalar(delimiter, pa.large_string())).to_numpy(zero_copy_only=False)
    out = {
        id_col: uniq,
        "text": text,
        "n_lines": n_lines,
        "n_removed": n_lines - counts,
    }
    for c in passthrough:
        out[c] = g[c].to_numpy()[order][first]
    return pd.DataFrame(out)


def line_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    broadcast_limit: int = 5_000_000,
    join_partitions: int = 8,
    num_buckets: int = N_COARSE,
    passthrough: tuple = (),
    delimiter: str = "\n",
):
    """Remove every non-empty line appearing in >= ``min_df`` distinct
    documents. Returns (id_col, text, n_lines, n_removed) plus any
    ``passthrough`` columns copied from the input (so the op chains
    into downstream stages without a recovery join). ``delimiter``
    picks the dedup unit: "\n" = lines (default), "\n\n" =
    paragraphs."""
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    import ray

    dup = (
        ds.map_batches(
            functools.partial(
                _df_partials, text_col=text_col, num_buckets=num_buckets,
                delimiter=delimiter,
            ),
            batch_format="pyarrow",
        )
        .groupby("_bk")
        .map_groups(
            functools.partial(_bucket_df, min_df=min_df), batch_format="pandas"
        )
    ).materialize()

    if dup.count() <= broadcast_limit:
        ref = ray.put(_dup_pairs_array(dup))
        return ds.map_batches(
            functools.partial(
                _rewrite_broadcast, ref=ref, text_col=text_col,
                id_col=id_col, passthrough=tuple(passthrough),
                delimiter=delimiter,
            ),
            batch_format="pyarrow",
        )

    # distributed path: anti-join line rows against the dup pairs
    kept = ds.map_batches(
        functools.partial(
            _project_lines,
            text_col=text_col,
            id_col=id_col,
            num_buckets=num_buckets,
            passthrough=tuple(passthrough),
            delimiter=delimiter,
        ),
        batch_format="pyarrow",
    ).join(
        with_schema(dup, pa.schema([("h1", pa.int64()), ("h2", pa.int64())])),
        join_type="left_anti",
        num_partitions=join_partitions,
        on=("h1", "h2"),
    )
    return (
        kept.groupby("_pk")
        .map_groups(
            functools.partial(
                _reassemble, id_col=id_col, passthrough=tuple(passthrough),
                delimiter=delimiter,
            ),
            batch_format="pandas",
        )
    )
