"""JSON-array explode with per-parent ordinal.

Reference: ``dbt/models/staging/repsly/forms_items.sql:13-72`` —
``arrayJoin`` over an ``Items`` JSON array producing one row per item,
with ``row_number() OVER (PARTITION BY form_id)`` ordinals and
JSONExtract'd item fields; invalid JSON yields zero rows.

Because the ordinal is per-parent-row (not per-key across the dataset),
this is a pure per-batch operation — no shuffle. Emitting more rows
than input is exactly what map_batches allows.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa


def explode_json_array(
    batch: pa.Table,
    col: str,
    fields: list[str],
    parent_cols: list[str],
    ordinal_name: str = "item_number",
) -> pa.Table:
    """One output row per element of the JSON array in ``col``; carries
    ``parent_cols`` through, extracts ``fields`` from each element (as
    strings), numbers elements 1..k per parent."""
    vals = batch.column(col).to_pylist()
    parent_idx: list[int] = []
    ordinals: list[int] = []
    extracted: dict[str, list] = {f: [] for f in fields}
    for i, v in enumerate(vals):
        if not v:
            continue
        try:
            arr = json.loads(v)
        except (ValueError, TypeError):
            continue
        if not isinstance(arr, list):
            continue
        for k, item in enumerate(arr):
            parent_idx.append(i)
            ordinals.append(k + 1)
            for f in fields:
                x = item.get(f) if isinstance(item, dict) else None
                extracted[f].append(None if x is None else str(x))
    idx = pa.array(np.asarray(parent_idx, dtype=np.int64))
    out = {}
    for p in parent_cols:
        out[p] = batch.column(p).take(idx)
    out[ordinal_name] = pa.array(ordinals, pa.int64())
    for f in fields:
        out[f"item_{f.lower()}"] = pa.array(extracted[f], pa.string())
    return pa.table(out)
