"""Record flattening / normalization stages (map_batches bodies).

Re-expresses the reference's per-record flatteners as vectorized Arrow
struct operations:

- generic nested-dict flatten → ``a_b`` columns, lists → JSON strings
  (``extractors/repsly/extractor.py:338-356``) — here ``Table.flatten``
  keeps real types instead of stringifying;
- LeafLink special cases: money struct → ``*_amount``/``*_currency``,
  arrays → ``_json`` + ``_count`` + primary-element extraction
  (``extractors/leaflink/extractor.py:592-740``);
- Acumatica ``{"value": v}`` envelope unwrap
  (``extractors/acumatica/extractor.py:85-98``);
- Google-Sheets ragged-grid cleaner: pad rows, drop empty rows/cols,
  de-dupe header names with ``_i`` suffix, add ``_row_number``
  (``extractors/google_sheets/extractor.py:193-248``).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.string_fns import sanitize_column_name


def flatten_structs(batch: pa.Table, sep: str = "_", max_depth: int = 8) -> pa.Table:
    """Recursively flatten struct columns to ``parent{sep}child``;
    list columns serialize to JSON strings (the reference's rule)."""
    depth = 0
    while depth < max_depth and any(
        pa.types.is_struct(f.type) for f in batch.schema
    ):
        cols, names = [], []
        for f in batch.schema:
            col = batch.column(f.name)
            if pa.types.is_struct(f.type):
                for sub in f.type:
                    names.append(f"{f.name}{sep}{sub.name}")
                    cols.append(pc.struct_field(col, sub.name))
            else:
                names.append(f.name)
                cols.append(col)
        batch = pa.table(dict(zip(names, cols)))
        depth += 1
    # lists → JSON strings
    out = {}
    for f in batch.schema:
        col = batch.column(f.name)
        if pa.types.is_list(f.type) or pa.types.is_large_list(f.type):
            vals = col.to_pylist()
            out[f.name] = pa.array(
                [None if v is None else json.dumps(v, default=str) for v in vals],
                pa.string(),
            )
        else:
            out[f.name] = col
    return pa.table(out)


def flatten_money(batch: pa.Table, col: str) -> pa.Table:
    """struct<amount,currency> → ``{col}_amount`` (float64) +
    ``{col}_currency``; original column dropped."""
    c = batch.column(col)
    amount = pc.cast(pc.struct_field(c, "amount"), pa.float64())
    currency = pc.cast(pc.struct_field(c, "currency"), pa.string())
    out = batch.drop([col])
    out = out.append_column(f"{col}_amount", amount)
    return out.append_column(f"{col}_currency", currency)


def flatten_array_summary(batch: pa.Table, col: str, primary_field: str | None = None) -> pa.Table:
    """list column → ``{col}_json`` + ``{col}_count`` (+ first element's
    ``primary_field`` as ``{col}_primary_{field}``)."""
    c = batch.column(col)
    count = pc.fill_null(pc.list_value_length(c), 0)
    vals = c.to_pylist()
    js = pa.array(
        [None if v is None else json.dumps(v, default=str) for v in vals], pa.string()
    )
    out = batch.drop([col])
    out = out.append_column(f"{col}_json", js)
    out = out.append_column(f"{col}_count", pc.cast(count, pa.int64()))
    if primary_field is not None:
        first = pc.list_element(c, 0) if len(c) else c
        prim = pc.struct_field(first, primary_field)
        out = out.append_column(f"{col}_primary_{primary_field}", prim)
    return out


def unwrap_value_envelopes(batch: pa.Table) -> pa.Table:
    """Acumatica-style ``{"value": v}`` struct columns → plain ``v``."""
    out = {}
    for f in batch.schema:
        col = batch.column(f.name)
        if pa.types.is_struct(f.type) and f.type.num_fields == 1 and f.type.field(0).name == "value":
            out[f.name] = pc.struct_field(col, "value")
        else:
            out[f.name] = col
    return pa.table(out)


def clean_ragged_rows(
    rows: list[list],
    header: list[str] | None = None,
) -> pa.Table:
    """Google-Sheets-shaped grid → typed-as-string table: first row =
    header (unless given), ragged rows padded, fully-empty rows/columns
    dropped, duplicate/empty header names de-duped with ``_i``,
    ``_row_number`` added (1-based data rows)."""
    if not rows:
        return pa.table({"_row_number": pa.array([], pa.int64())})
    if header is None:
        header, rows = rows[0], rows[1:]
    width = max(len(header), max((len(r) for r in rows), default=0))
    header = [str(h) if h not in (None, "") else f"col_{i}" for i, h in enumerate(header + [""] * (width - len(header)))]
    names, seen = [], {}
    for h in header:
        n = sanitize_column_name(h)
        if n in seen:
            seen[n] += 1
            n = f"{n}_{seen[n]}"
        else:
            seen[n] = 0
        names.append(n)
    padded = [r + [None] * (width - len(r)) for r in rows]
    keep_rows = [
        (i, r)
        for i, r in enumerate(padded)
        if any(v not in (None, "") for v in r)
    ]
    cols: dict[str, list] = {n: [] for n in names}
    rownums = []
    for i, r in keep_rows:
        rownums.append(i + 1)
        for n, v in zip(names, r):
            cols[n].append(None if v in (None, "") else str(v))
    # drop fully-empty columns
    out = {
        n: pa.array(v, pa.string()) for n, v in cols.items() if any(x is not None for x in v)
    }
    out["_row_number"] = pa.array(rownums, pa.int64())
    return pa.table(out)
