"""PII redaction: scrub emails / IPv4 addresses / phone numbers from a
text column before the corpus ships to training.

(The reference's closest analogue is the scalar normalizer family —
``dbt/models/staging/repsly/clients.sql`` cleans emails/phones into
canonical form; a training-data pipeline needs the inverse: REMOVE
them. Semantics generalized to the documents/web-corpus table.)

Ray-Data shape: a stateless vectorized ``map_batches`` body — three
RE2 kernels (`pc.count_substring_regex` + `pc.replace_substring_regex`)
per batch, no shuffle, no Python-per-row work. DuckDB's regexp engine
is RE2 as well, so the oracle replays the exact same patterns in the
exact same sequence (counts are taken on the text as it exists at each
step: email → ip → phone), value-for-value.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Patterns are module DATA so pii_sql() regenerates the DuckDB twin in
# lockstep. RE2 syntax only (no backrefs/lookaround) — portable across
# pyarrow and DuckDB.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = (
    r"\+?\d{1,3}[ \-]\d{3}[ \-]\d{3}[ \-]\d{4}\b"
    r"|\b\d{3}[ \-]\d{3}[ \-]\d{4}\b"
)

# (pattern, replacement) in application order. Order is part of the
# contract: counts for stage k are computed on the output of stage k-1
# (an IPv4-looking run inside an email must not double-count).
_STAGES: tuple[tuple[str, str, str], ...] = (
    (EMAIL_RE, "[EMAIL]", "n_emails"),
    (IPV4_RE, "[IP]", "n_ips"),
    (PHONE_RE, "[PHONE]", "n_phones"),
)


def pii_redact(
    batch: pa.Table,
    col: str = "text",
    id_col: str = "rec_id",
    out: str = "text_redacted",
) -> pa.Table:
    """Vectorized map_batches body: id, redacted text, per-category
    match counts (int64). Null texts are dropped (SQL twin filters
    WHERE col IS NOT NULL)."""
    batch = batch.filter(pc.is_valid(batch.column(col)))
    s = pc.cast(batch.column(col), pa.large_string())
    cols: dict[str, pa.Array | pa.ChunkedArray] = {id_col: batch.column(id_col)}
    counts: dict[str, pa.Array] = {}
    for pat, rep, cnt_name in _STAGES:
        counts[cnt_name] = pc.cast(pc.count_substring_regex(s, pat), pa.int64())
        s = pc.replace_substring_regex(s, pat, rep)
    cols[out] = s
    cols.update(counts)
    return pa.table(cols)


def pii_sql(src: str, col: str = "text", id_col: str = "rec_id") -> str:
    """DuckDB twin: the same patterns in the same sequence. ``src`` is
    a table/view name or a read_parquet(...) expression."""

    def q(pat: str) -> str:
        # DuckDB '...' literals are standard SQL: no backslash escaping
        # — the regex goes through verbatim; only quotes need doubling.
        return pat.replace("'", "''")

    expr = col
    selects = [id_col]
    count_sels = []
    for pat, rep, cnt_name in _STAGES:
        count_sels.append(
            f"len(regexp_extract_all({expr}, '{q(pat)}'))::BIGINT AS {cnt_name}"
        )
        expr = f"regexp_replace({expr}, '{q(pat)}', '{rep}', 'g')"
    selects.append(f"{expr} AS text_redacted")
    selects.extend(count_sels)
    return (
        f"SELECT {', '.join(selects)} FROM {src} WHERE {col} IS NOT NULL"
    )
