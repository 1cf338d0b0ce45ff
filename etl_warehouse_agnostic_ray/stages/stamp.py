"""Lineage metadata stamping + bronze projection.

Reference: every extracted row gets ``_extracted_at / _source_system /
_endpoint`` (``extractors/repsly/extractor.py:1433-1436``); bronze raw
models project+rename every column and add a ``record_hash``
(``dbt/models/raw/repsly/clients_raw.sql:14-65``).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hash_fns import record_hash64
from ..functions.string_fns import sanitize_column_name
from ..schemas import BATCH_COL, INGEST_TS_COL


def stamp_lineage(batch: pa.Table, batch_id: str, ingest_ts_us: int, source: str | None = None) -> pa.Table:
    n = batch.num_rows
    out = batch.append_column(BATCH_COL, pa.array([batch_id] * n, pa.string()))
    out = out.append_column(
        INGEST_TS_COL, pa.array([ingest_ts_us] * n, pa.int64()).cast(pa.timestamp("us"))
    )
    if source is not None:
        out = out.append_column("_source_system", pa.array([source] * n, pa.string()))
    return out


def bronze_project(
    batch: pa.Table,
    mapping: dict[str, str] | None = None,
    hash_cols: list[str] | None = None,
) -> pa.Table:
    """Select+rename (ApiField → snake_name), sanitize names, and stamp
    ``record_hash`` over ``hash_cols`` (cityHash64 analogue)."""
    if mapping:
        cols = {new: batch.column(old) for old, new in mapping.items()}
        out = pa.table(cols)
    else:
        out = batch.rename_columns([sanitize_column_name(c) for c in batch.column_names])
    if hash_cols:
        out = out.append_column("record_hash", record_hash64(out, hash_cols))
    return out
