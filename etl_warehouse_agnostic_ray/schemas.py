"""Arrow schemas for the engine's data model.

The reference stores every bronze column as ClickHouse ``String``
(``extractors/repsly/extractor.py:633-647``) and applies types later in
SQL. We do NOT copy that: the lake uses real Arrow types per
``BASELINE.json input_hint``.

All timestamps are tz-naive UTC microseconds (Arrow and DuckDB default;
keeps oracle comparison exact).
"""

from __future__ import annotations

import pyarrow as pa

# --- base lake table: one row per live web page (LWW-latest per url) ---
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.large_binary()),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
    ]
)

# --- WAL/binlog-shaped change-event stream (engine input) ---
# lsn        : strictly increasing per original event; duplicate deliveries
#              re-use an existing lsn (the reference's replayed-batch case,
#              extractors/repsly/extractor.py:704-718).
# op         : insert | update | delete | schema_change
# schema_*   : only set for op == schema_change (kind add|widen|rename)
# fetch_status: example payload column that appears mid-stream via an
#              `add` schema op (backfill-null for earlier rows).
CHANGE_EVENT_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.large_binary()),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
        pa.field("fetch_status", pa.int32()),
        pa.field("schema_kind", pa.string()),
        pa.field("schema_column", pa.string()),
        pa.field("schema_type", pa.string()),
    ]
)

OPS = ("insert", "update", "delete", "schema_change")

# Internal columns the engine stamps / uses.
LSN_COL = "_lsn"           # lineage: event lsn that produced the row
PID_COL = "_pid"           # hash partition id (shuffle key)
OP_COL = "_op"             # normalized op carried into the merge
BATCH_COL = "_batch_id"    # lineage: ingest batch id
INGEST_TS_COL = "_ingest_ts"

# Payload columns (physical names in the event stream). The logical lake
# schema may diverge via rename/add/widen ops (state/schema_registry.py).
PAYLOAD_COLS = ["url", "warc_ts", "html", "text", "lang"]


def arrow_type_from_name(name: str) -> pa.DataType:
    """Map the small set of type names used by schema-change ops."""
    return {
        "int32": pa.int32(),
        "int64": pa.int64(),
        "float32": pa.float32(),
        "float64": pa.float64(),
        "string": pa.string(),
        "large_string": pa.large_string(),
        "binary": pa.large_binary(),
        "timestamp[us]": pa.timestamp("us"),
    }[name]
