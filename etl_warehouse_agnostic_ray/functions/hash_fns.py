"""Row-identity hashing.

The reference stamps ``record_hash = cityHash64(concat(key, ts,
_extracted_at))`` on every raw row (``dbt/models/raw/repsly/
clients_raw.sql:51-57``) as dedup identity + LWW tie-break. We produce a
deterministic 64-bit hash from any set of columns, vectorized via
pandas' stable siphash (fixed key — process/machine independent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def record_hash64(table: pa.Table, cols: list[str]) -> pa.Array:
    parts = []
    for c in cols:
        col = pc.cast(table.column(c), pa.string())
        parts.append(pc.fill_null(col, "\x00"))
    joined = parts[0]
    for p in parts[1:]:
        joined = pc.binary_join_element_wise(joined, p, "\x1f")
    h = pd.util.hash_pandas_object(joined.to_pandas(), index=False).to_numpy()
    return pa.array(h.view(np.int64))
