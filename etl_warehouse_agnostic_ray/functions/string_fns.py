"""String kernels.

Conformance targets: trimBoth+NULLIF (``visits.sql:50``), email regex
validate + domain extract (``representatives.sql:84-123``), phone
digit-strip / US normalize (``representatives.sql:90-116``), name split
first/last (``users.sql:87-149``), territory split on ``>``
(``visits.sql:244-254``), pipe-join of list fields
(``extractors/leaflink/extractor.py:675``), newline squash in notes
(``purchase_orders.sql:190-194``), column-name sanitizer
(``extractors/repsly/extractor.py:734``).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_EMAIL_RE = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def trim_nullif(arr: pa.Array) -> pa.Array:
    """NULLIF(trimBoth(x), '') — empty/whitespace-only → null."""
    t = pc.utf8_trim_whitespace(pc.cast(arr, pa.string()))
    return pc.if_else(pc.equal(t, pa.scalar("")), pa.scalar(None, pa.string()), t)


def email_valid(arr: pa.Array) -> pa.Array:
    """Boolean validity mask (regex; case-insensitive handled by lowering)."""
    low = pc.utf8_lower(pc.cast(arr, pa.string()))
    return pc.fill_null(pc.match_substring_regex(low, _EMAIL_RE), False)


def email_domain(arr: pa.Array) -> pa.Array:
    """Domain of valid emails, lowercased; null otherwise."""
    low = pc.utf8_lower(pc.cast(arr, pa.string()))
    ok = email_valid(arr)
    dom = pc.struct_field(pc.extract_regex(low, r"@(?P<d>[A-Za-z0-9.-]+)$"), "d")
    return pc.if_else(ok, dom, pa.scalar(None, pa.string()))


def phone_normalize_us(arr: pa.Array) -> pa.Array:
    """Strip non-digits; drop a leading '1' on 11-digit numbers; null
    unless the result is exactly 10 digits."""
    s = pc.cast(arr, pa.string())
    digits = pc.replace_substring_regex(s, r"\D", "")
    eleven = pc.and_(
        pc.equal(pc.utf8_length(digits), 11),
        pc.starts_with(digits, "1"),
    )
    digits = pc.if_else(eleven, pc.utf8_slice_codeunits(digits, 1, 12), digits)
    ok = pc.equal(pc.utf8_length(digits), 10)
    return pc.if_else(pc.fill_null(ok, False), digits, pa.scalar(None, pa.string()))


def first_name(full: pa.Array) -> pa.Array:
    """Text before the first space (trimmed); whole string if no space."""
    t = trim_nullif(full)
    return pc.struct_field(pc.extract_regex(t, r"^(?P<f>\S+)"), "f")


def last_name(full: pa.Array) -> pa.Array:
    """Text after the last space; null if single token."""
    t = trim_nullif(full)
    return pc.struct_field(pc.extract_regex(t, r"\s(?P<l>\S+)$"), "l")


def split_territory(arr: pa.Array) -> pa.Array:
    """'A > B > C' → list<string> of trimmed levels (visits.sql:244-254)."""
    t = pc.cast(arr, pa.string())
    parts = pc.split_pattern(t, ">")
    # trim each element via list flatten/rebuild
    flat = pc.utf8_trim_whitespace(pc.list_flatten(parts))
    return _rebuild_list(parts, flat)


def _rebuild_list(original: pa.Array, new_values: pa.Array) -> pa.Array:
    if isinstance(original, pa.ChunkedArray):
        original = original.combine_chunks()
    if isinstance(new_values, pa.ChunkedArray):
        new_values = new_values.combine_chunks()
    return pa.ListArray.from_arrays(original.offsets, new_values)


def pipe_join_list(arr: pa.Array) -> pa.Array:
    """list<string> → 'a|b|c' (LeafLink tag-name join)."""
    return pc.binary_join(arr, "|")


def squash_whitespace(arr: pa.Array) -> pa.Array:
    """Embedded CR/LF/tabs and runs of spaces → single space, trimmed."""
    s = pc.cast(arr, pa.string())
    s = pc.replace_substring_regex(s, r"[\r\n\t]+", " ")
    s = pc.replace_substring_regex(s, r" {2,}", " ")
    return pc.utf8_trim_whitespace(s)


_SANITIZE_RE = re.compile(r"[^0-9a-zA-Z_]+")


def sanitize_column_name(name: str) -> str:
    """Spaces/dashes/dots → '_', collapse repeats, lowercase."""
    out = _SANITIZE_RE.sub("_", name.strip()).strip("_").lower()
    return re.sub(r"_{2,}", "_", out) or "_col"


_URL_SPLIT_RE = r"^(?P<head>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<rest>.*)$"
_URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?(?P<h>[^/:?#]+)"


def normalize_url(arr: pa.Array) -> pa.Array:
    """Web-corpus URL canonicalization, the key-normalization step
    before any URL-keyed dedup/merge: lowercase the scheme+authority
    (path/query stay case-sensitive per RFC 3986), strip the fragment.
    URLs without a scheme pass through unchanged (conservative — never
    invent structure). Pure RE2 kernels, so the DuckDB twin replays it
    with the same patterns."""
    s = pc.cast(arr, pa.string())
    s = pc.replace_substring_regex(s, r"#.*$", "")  # fragment never reaches the server
    m = pc.fill_null(pc.match_substring_regex(s, _URL_SPLIT_RE), False)
    parts = pc.extract_regex(s, _URL_SPLIT_RE)
    head = pc.utf8_lower(pc.struct_field(parts, "head"))
    rest = pc.struct_field(parts, "rest")
    joined = pc.binary_join_element_wise(head, rest, "")
    return pc.if_else(m, joined, s)


def url_host(arr: pa.Array) -> pa.Array:
    """Lowercased host of a URL (userinfo and port stripped, leading
    ``www.`` removed — the grouping key for per-site stats/quotas);
    null when no ``scheme://host`` structure exists."""
    s = pc.cast(arr, pa.string())
    h = pc.utf8_lower(pc.struct_field(pc.extract_regex(s, _URL_HOST_RE), "h"))
    h = pc.replace_substring_regex(h, r"^www\.", "")
    # extract_regex yields null struct on no match → null host ✓
    return h


def coalesce_business_key(*arrs: pa.Array) -> pa.Array:
    """Dedup-key normalization: first non-empty (trimmed) value across
    candidate key columns — ``coalesce(nullif(guid,''),
    nullif(natural_key,''))`` (``dbt/models/curated/acumatica/
    bills.sql:66-76``). The result is the LWW shuffle key."""
    cleaned = [trim_nullif(a) for a in arrs]
    out = cleaned[0]
    for c in cleaned[1:]:
        out = pc.if_else(pc.is_valid(out), out, c)
    return out
