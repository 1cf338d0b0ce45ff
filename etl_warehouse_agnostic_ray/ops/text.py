"""Text analysis operators (documents table).

All are stateless vectorized map_batches bodies; none shuffle. The
quality/token formulas are deliberately SQL-expressible so the DuckDB
oracle can verify them value-for-value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Per-language stopword profiles (function words) for the token-
# membership heuristic. Kept as DATA: pipelines/hash_sql.lang_id_sql
# regenerates the DuckDB oracle from this dict, so growing a profile
# (or adding a language) keeps the oracle in lockstep automatically.
# Order matters: argmax ties resolve to the earlier declaration.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "was",
           "for", "on", "with", "as", "this", "be"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "eine", "mit",
           "von", "den", "zu", "im", "auf", "für", "sich"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans", "que",
           "pour", "qui", "pas", "sur", "avec", "du", "au"),
    "es": ("el", "la", "de", "que", "los", "es", "una", "en", "por", "con",
           "para", "las", "del", "no", "se", "su"),
    "it": ("il", "di", "che", "e", "un", "una", "per", "con", "del", "sono",
           "non", "le", "si", "della", "nel", "più"),
    "pt": ("o", "de", "que", "e", "um", "uma", "para", "com", "os", "as",
           "do", "da", "não", "em", "uns", "pelo"),
    "nl": ("de", "het", "een", "en", "van", "is", "dat", "op", "te", "met",
           "voor", "niet", "zijn", "aan", "ook", "maar"),
    "sv": ("och", "att", "det", "som", "en", "på", "är", "av", "för", "med",
           "den", "till", "inte", "har", "om", "ett"),
    "da": ("og", "at", "det", "en", "den", "til", "er", "som", "på", "de",
           "med", "han", "af", "ikke", "der", "var"),
    "no": ("og", "i", "at", "det", "en", "til", "er", "som", "på", "de",
           "med", "av", "for", "den", "ikke", "å"),
    "pl": ("i", "w", "na", "z", "do", "się", "że", "jest", "nie", "to",
           "jak", "po", "co", "tak", "ale", "od"),
    "cs": ("a", "se", "na", "je", "že", "o", "s", "z", "do", "k", "ale",
           "jako", "za", "by", "jsem", "není"),
    "ro": ("și", "în", "de", "la", "cu", "pe", "este", "un", "o", "care",
           "nu", "se", "din", "mai", "sau", "dar"),
    "tr": ("ve", "bir", "bu", "da", "de", "için", "ile", "olarak", "çok",
           "daha", "en", "gibi", "sonra", "kadar", "ama", "ne"),
    "id": ("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini",
           "dari", "dalam", "akan", "pada", "juga", "ke", "adalah", "bisa"),
    "ru": ("и", "в", "не", "на", "что", "с", "он", "как", "это", "по",
           "но", "они", "к", "из", "его", "она"),
    "el": ("και", "το", "να", "του", "η", "της", "που", "με", "για", "από",
           "την", "στο", "είναι", "τα", "δεν", "ο"),
}

_SW_HASHES: dict[str, np.ndarray] = {}


def _stopword_hashes(lang: str) -> np.ndarray:
    h = _SW_HASHES.get(lang)
    if h is None:
        from .texthash import poly_hash_array

        h = np.sort(
            poly_hash_array(pa.array(list(_LANG_PROFILES[lang]), pa.large_string()))
        )
        _SW_HASHES[lang] = h
    return h


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
    """Stopword-profile language ID by whitespace-token MEMBERSHIP:
    lower → strip punctuation (keep letters/digits/whitespace) →
    tokenize; per language, count tokens in its stopword set; argmax in
    declaration order wins, 'und' when nothing hits.

    Token membership (not the old ``\\b``-regex count) is what makes
    non-Latin profiles work at all: RE2 word boundaries are ASCII-only,
    so ``\\b(и)\\b`` can never match Cyrillic text. Vectorized: the
    batch's tokens are hashed once off the flat Arrow token buffer,
    then each profile is one sorted-array ``np.isin`` + segment-sum —
    no per-row Python. The DuckDB twin performs the same lower → strip
    → split → IN-list counting (pipelines/hash_sql.lang_id_sql)."""
    from .texthash import poly_hash_array, tokenize_ws

    s = pc.utf8_lower(pc.cast(batch.column(col), pa.large_string()))
    s = pc.replace_substring_regex(s, r"[^\pL\pN\s]", "")
    tokens, offsets = tokenize_ws(s)
    th = poly_hash_array(tokens)
    langs = list(_LANG_PROFILES)
    m = np.zeros((batch.num_rows, len(langs)), dtype=np.int64)
    cs = np.zeros(len(th) + 1, dtype=np.int64)
    for j, lg in enumerate(langs):
        hits = np.isin(th, _stopword_hashes(lg))
        np.cumsum(hits, out=cs[1:])
        m[:, j] = cs[offsets[1:]] - cs[offsets[:-1]]
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
