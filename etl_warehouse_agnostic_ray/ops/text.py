"""Text analysis operators (documents table).

All are stateless vectorized map_batches bodies; none shuffle. The
quality/token formulas are deliberately SQL-expressible so the DuckDB
oracle can verify them value-for-value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
    "es": ("el", "la", "de", "que", "los", "es", "una"),
}


def token_count(batch: pa.Table, col: str = "text", out: str = "n_tokens") -> pa.Table:
    """Whitespace tokens (runs of non-space) — SQL twin:
    ``length(regexp_replace(trim(text),'\\S+','x','g'))`` counts, or
    duckdb ``array_length(regexp_split_to_array(trim(text),'\\s+'))``."""
    n = pc.count_substring_regex(pc.cast(batch.column(col), pa.string()), r"\S+")
    return batch.append_column(out, pc.cast(n, pa.int64()))


def quality_score(batch: pa.Table, col: str = "text", out: str = "quality") -> pa.Table:
    """0-100 heuristic (length + alpha ratio + terminal punctuation),
    mirroring the reference's additive completeness scoring style
    (``dbt/models/curated/repsly/visits.sql:328-340``). Components are
    integer/ratio arithmetic a SQL oracle reproduces exactly:

      len_score   = least(length(text), 500) / 500            (0..1)
      alpha_ratio = alpha_chars / nullif(length(text),0)      (0..1)
      punct_bonus = 1 if text ends with . ! or ?, else 0
      quality     = round(100 * (0.5*len_score + 0.4*alpha_ratio
                                  + 0.1*punct_bonus), 2)
    """
    s = pc.cast(batch.column(col), pa.string())
    length = pc.cast(pc.utf8_length(s), pa.float64())
    len_score = pc.divide(pc.min_element_wise(length, pa.scalar(500.0)), pa.scalar(500.0))
    alpha = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(s, r"[^A-Za-z]", "")), pa.float64()
    )
    safe_len = pc.if_else(pc.equal(length, pa.scalar(0.0)), pa.scalar(None, pa.float64()), length)
    alpha_ratio = pc.fill_null(pc.divide(alpha, safe_len), 0.0)
    punct = pc.cast(
        pc.fill_null(pc.match_substring_regex(s, r"[.!?]\s*$"), False), pa.float64()
    )
    q = pc.round(
        pc.multiply(
            pa.scalar(100.0),
            pc.add(
                pc.add(
                    pc.multiply(pa.scalar(0.5), len_score),
                    pc.multiply(pa.scalar(0.4), alpha_ratio),
                ),
                pc.multiply(pa.scalar(0.1), punct),
            ),
        ),
        ndigits=2,
        round_mode="half_towards_infinity",  # match SQL ROUND (half away from zero)
    )
    return batch.append_column(out, q)


def lang_id(batch: pa.Table, col: str = "text", out: str = "lang_pred") -> pa.Table:
    """Stopword-profile language ID: per language, count word-boundary
    stopword hits; argmax wins, 'und' (undetermined) when nothing hits."""
    s = pc.utf8_lower(pc.cast(batch.column(col), pa.string()))
    scores = []
    langs = list(_LANG_PROFILES)
    for lg in langs:
        pat = r"\b(" + "|".join(_LANG_PROFILES[lg]) + r")\b"
        scores.append(
            pc.fill_null(pc.count_substring_regex(s, pat), 0).to_numpy(zero_copy_only=False)
        )
    m = np.stack(scores, axis=1)  # (n, n_langs)
    best = m.argmax(axis=1)
    hit = m.max(axis=1) > 0
    pred = np.where(hit, np.asarray(langs, dtype=object)[best], "und")
    return batch.append_column(out, pa.array(pred, pa.string()))


def doc_fingerprint(batch: pa.Table, col: str = "text", out: str = "fingerprint") -> pa.Table:
    """64-bit polynomial hash over the normalized (lowered,
    whitespace-squashed) byte stream — a stable whole-document
    fingerprint: equal normalized text ⇔ equal fingerprint. One
    vectorized pass over the batch's Arrow string buffer (no per-doc
    loop); value-for-value SQL twin in ``pipelines/hash_sql.py``.
    Null/empty docs fingerprint to 0."""
    from .texthash import poly_hash_array

    s = pc.utf8_lower(pc.cast(batch.column(col), pa.large_string()))
    s = pc.replace_substring_regex(s, r"\s+", " ")
    outv = poly_hash_array(s)
    return batch.append_column(out, pa.array(outv.view(np.int64)))
