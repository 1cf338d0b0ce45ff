"""Numeric / boolean / geo kernels.

Conformance targets: toInt64OrNull/toFloat64OrNull (``bills.sql:103-119``),
bool multiIf(lower(x) IN ('true','1','t','yes')) (``visits.sql:63-73``),
GPS bounds validation (``visits.sql:84-129``, ``daily_working_time.sql:
110-142``), percent = part/whole (``purchase_orders.sql:276-285``),
equirectangular GPS distance (``visits.sql:264-267``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TRUE = ("true", "1", "t", "yes", "y")
_FALSE = ("false", "0", "f", "no", "n")


def to_int_or_null(arr: pa.Array, bits: int = 64) -> pa.Array:
    """String → integer; anything non-conforming (incl. 'NULL', 'nan',
    '<NA>', '', '12abc', floats) → null."""
    s = pc.utf8_trim_whitespace(pc.cast(arr, pa.string()))
    ok = pc.fill_null(pc.match_substring_regex(s, r"^-?\d+$"), False)
    safe = pc.if_else(ok, s, pa.scalar(None, pa.string()))
    return pc.cast(safe, pa.int32() if bits == 32 else pa.int64())


def to_float_or_null(arr: pa.Array) -> pa.Array:
    s = pc.utf8_trim_whitespace(pc.cast(arr, pa.string()))
    ok = pc.fill_null(
        pc.match_substring_regex(s, r"^-?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"), False
    )
    safe = pc.if_else(ok, s, pa.scalar(None, pa.string()))
    return pc.cast(safe, pa.float64())


def parse_bool(arr: pa.Array) -> pa.Array:
    """multiIf(lower(trim(x)) IN true-set, 1, IN false-set, 0, NULL)."""
    low = pc.utf8_lower(pc.utf8_trim_whitespace(pc.cast(arr, pa.string())))
    is_t = pc.is_in(low, value_set=pa.array(_TRUE))
    is_f = pc.is_in(low, value_set=pa.array(_FALSE))
    return pc.if_else(is_t, pa.scalar(True), pc.if_else(is_f, pa.scalar(False), pa.scalar(None, pa.bool_())))


def validate_lat(arr: pa.Array) -> pa.Array:
    """Numeric and in [-90, 90] and not the 0-sentinel → value else null."""
    v = to_float_or_null(arr) if pa.types.is_string(arr.type) else pc.cast(arr, pa.float64())
    ok = pc.and_(
        pc.and_(pc.greater_equal(v, pa.scalar(-90.0)), pc.less_equal(v, pa.scalar(90.0))),
        pc.not_equal(v, pa.scalar(0.0)),
    )
    return pc.if_else(pc.fill_null(ok, False), v, pa.scalar(None, pa.float64()))


def validate_lon(arr: pa.Array) -> pa.Array:
    v = to_float_or_null(arr) if pa.types.is_string(arr.type) else pc.cast(arr, pa.float64())
    ok = pc.and_(
        pc.and_(pc.greater_equal(v, pa.scalar(-180.0)), pc.less_equal(v, pa.scalar(180.0))),
        pc.not_equal(v, pa.scalar(0.0)),
    )
    return pc.if_else(pc.fill_null(ok, False), v, pa.scalar(None, pa.float64()))


def pct_of(part: pa.Array, whole: pa.Array, digits: int = 2) -> pa.Array:
    """100*part/whole, null where whole is 0/null (safe divide)."""
    w = pc.cast(whole, pa.float64())
    p = pc.cast(part, pa.float64())
    w_ok = pc.if_else(pc.equal(w, pa.scalar(0.0)), pa.scalar(None, pa.float64()), w)
    return pc.round(pc.multiply(pc.divide(p, w_ok), pa.scalar(100.0)), ndigits=digits)


def geo_distance_m(lat1, lon1, lat2, lon2) -> pa.Array:
    """Equirectangular approximation: 111320*sqrt(Δlat² + (Δlon·cosφ)²)
    meters (the reference's formula, visits.sql:264-267). Numpy kernel."""
    a1 = np.asarray(pc.cast(lat1, pa.float64()))
    o1 = np.asarray(pc.cast(lon1, pa.float64()))
    a2 = np.asarray(pc.cast(lat2, pa.float64()))
    o2 = np.asarray(pc.cast(lon2, pa.float64()))
    phi = np.radians((a1 + a2) / 2.0)
    d = 111320.0 * np.sqrt((a2 - a1) ** 2 + ((o2 - o1) * np.cos(phi)) ** 2)
    return pa.array(d, pa.float64())
