"""Date/time kernels.

Conformance targets (semantics, not code): the reference's Microsoft
JSON date parser ``/Date(1665059530000+0000)/`` → UTC datetime with ISO
and date-only fallbacks (``extractors/repsly/extractor.py:512-555``; SQL
twin ``dbt/models/curated/repsly/purchase_orders.sql:73-97``), sentinel
dates → null (``daily_working_time.sql:76``), toHour/toDayOfWeek/toYear
and dateDiff derivations (``purchase_orders.sql:263-271``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def parse_ms_json_date(arr: pa.Array) -> pa.Array:
    """``/Date(ms[±zzzz])/`` | ISO[ Z] | YYYY-MM-DD → timestamp[us] (null
    on garbage). Vectorized: regex extract for the MS form, cast
    fallbacks for the rest."""
    arr = pc.cast(arr, pa.string())
    ms = pc.extract_regex(arr, r"^/Date\((?P<ms>-?\d+)")
    ms_val = pc.struct_field(ms, "ms")  # string or null
    ms_int = pc.cast(ms_val, pa.int64())
    ms_ts = pc.cast(pc.multiply(ms_int, pa.scalar(1000, pa.int64())), pa.timestamp("us"))
    # ISO / date-only fallback: strptime-like via cast (invalid → null)
    iso_norm = pc.replace_substring_regex(arr, r"Z$", "")
    iso_norm = pc.replace_substring_regex(iso_norm, r"^(\d{4}-\d{2}-\d{2})$", r"\1 00:00:00")
    iso_ts = _cast_ts_or_null(iso_norm)
    return pc.if_else(pc.is_valid(ms_ts), ms_ts, iso_ts)


def _cast_ts_or_null(arr: pa.Array) -> pa.Array:
    """Cast string→timestamp[us], invalid → null (the OrNull discipline)."""
    ok = pc.match_substring_regex(
        arr, r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?$"
    )
    safe = pc.if_else(pc.fill_null(ok, False), arr, pa.scalar(None, pa.string()))
    return pc.cast(safe, pa.timestamp("us"))


def parse_datetime_best_effort(arr: pa.Array) -> pa.Array:
    """parseDateTimeBestEffortOrNull analogue (purchase_orders.sql:30)."""
    return parse_ms_json_date(arr)


def sentinel_date_to_null(ts: pa.Array, sentinels: list[str]) -> pa.Array:
    """Specific sentinel instants (e.g. the reference's ongoing-work
    marker) → null (daily_working_time.sql:76)."""
    out = ts
    for s in sentinels:
        out = pc.if_else(pc.equal(out, pa.scalar(np.datetime64(s, "us"), pa.timestamp("us"))),
                         pa.scalar(None, pa.timestamp("us")), out)
    return out


def to_hour(ts: pa.Array) -> pa.Array:
    return pc.hour(ts)


def to_dow(ts: pa.Array) -> pa.Array:
    """ISO day of week 1=Mon..7=Sun (ClickHouse toDayOfWeek)."""
    return pc.day_of_week(ts, count_from_zero=False, week_start=1)


def to_year(ts: pa.Array) -> pa.Array:
    return pc.year(ts)


def date_trunc_day(ts: pa.Array) -> pa.Array:
    return pc.floor_temporal(ts, unit="day")


def date_diff_days(a: pa.Array, b: pa.Array) -> pa.Array:
    """dateDiff('day', a, b) — whole days between calendar dates."""
    return pc.days_between(a, b)


def time_of_day_bucket(ts: pa.Array) -> pa.Array:
    """CASE ladder: morning/afternoon/evening/night (visits.sql:274-343
    style categorical derivation)."""
    h = pc.hour(ts)
    return pc.case_when(
        pc.make_struct(
            pc.and_(pc.greater_equal(h, 6), pc.less(h, 12)),
            pc.and_(pc.greater_equal(h, 12), pc.less(h, 18)),
            pc.and_(pc.greater_equal(h, 18), pc.less(h, 22)),
        ),
        "morning",
        "afternoon",
        "evening",
        "night",
    )
