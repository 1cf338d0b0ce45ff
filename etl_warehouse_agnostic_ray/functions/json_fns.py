"""JSON kernels (the reference's JSONExtract / isValidJSON / arrayJoin
surface, ``dbt/models/staging/repsly/forms_items.sql:13-72``).

Arrow has no JSON-path kernel, so extraction uses a compiled regex for
the flat `"key": value` case (covers the reference's usage — flat
stringified dicts) and a per-batch ``json.loads`` fallback for nested
payloads. The explode (one row per array element with per-group
ordinal) lives in stages/explode.py since it changes row counts.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def json_extract_string(arr: pa.Array, key: str) -> pa.Array:
    """JSONExtractString(x, key) for flat objects; null if absent."""
    s = pc.cast(arr, pa.string())
    pat = r'"' + key + r'"\s*:\s*(?:"(?P<s>(?:[^"\\]|\\.)*)"|(?P<n>-?\d+(?:\.\d+)?|true|false|null))'
    ext = pc.extract_regex(s, pat)
    # non-participating groups come back as "" (not null): prefer the
    # bare-token group when it matched, else the quoted-string group
    sval = pc.struct_field(ext, "s")
    nval = pc.struct_field(ext, "n")
    use_n = pc.not_equal(pc.fill_null(nval, ""), "")
    out = pc.if_else(use_n, nval, sval)
    return pc.if_else(
        pc.equal(pc.fill_null(out, "\x00"), "null"), pa.scalar(None, pa.string()), out
    )


def json_valid(arr: pa.Array) -> pa.Array:
    """isValidJSON — per-batch python json.loads (no Arrow kernel);
    vectorized over the batch's unique values to bound cost."""
    vals = arr.to_pylist()
    out = np.empty(len(vals), dtype=bool)
    cache: dict[str, bool] = {}
    for i, v in enumerate(vals):
        if v is None:
            out[i] = False
            continue
        hit = cache.get(v)
        if hit is None:
            try:
                json.loads(v)
                hit = True
            except (ValueError, TypeError):
                hit = False
            cache[v] = hit
        out[i] = hit
    return pa.array(out)
