"""Vectorized scalar-function library (the reference's SQL/flatten surface).

Every function here is Arrow-array in / Arrow-array out (pyarrow.compute
kernels, numpy where needed) — usable directly inside ``map_batches``
with ``batch_format="pyarrow"``. No Python-per-row loops.
"""

from .datetime_fns import (  # noqa: F401
    date_diff_days,
    date_trunc_day,
    parse_datetime_best_effort,
    parse_ms_json_date,
    sentinel_date_to_null,
    time_of_day_bucket,
    to_dow,
    to_hour,
    to_year,
)
from .hash_fns import record_hash64  # noqa: F401
from .json_fns import json_extract_string, json_valid  # noqa: F401
from .numeric_fns import (  # noqa: F401
    geo_distance_m,
    parse_bool,
    pct_of,
    to_float_or_null,
    to_int_or_null,
    validate_lat,
    validate_lon,
)
from .string_fns import (  # noqa: F401
    email_domain,
    email_valid,
    first_name,
    last_name,
    normalize_url,
    phone_normalize_us,
    pipe_join_list,
    sanitize_column_name,
    split_territory,
    squash_whitespace,
    trim_nullif,
    url_host,
)
