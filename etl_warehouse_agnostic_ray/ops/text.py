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


def _flat_rows(lst: pa.ListArray | pa.LargeListArray) -> tuple[pa.Array, np.ndarray]:
    """Flatten a (large_)list<string> array → (flat values, row index
    per value), both empty-string-filtered. Offsets come from the Arrow
    buffer, no Python iteration."""
    flat = lst.flatten()
    off_dtype = np.int64 if pa.types.is_large_list(lst.type) else np.int32
    loff = np.frombuffer(lst.buffers()[1], dtype=off_dtype)[
        lst.offset : lst.offset + len(lst) + 1
    ].astype(np.int64)
    loff = loff - loff[0]
    rows = np.repeat(np.arange(len(lst), dtype=np.int64), np.diff(loff))
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    keep_np = np.nan_to_num(keep_np.astype(bool)) if keep_np.dtype == object else keep_np
    return flat.filter(keep), rows[keep_np]


def _per_row_runs(
    hashes: np.ndarray, rows: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(total, distinct, top-run-count) per row from flat value hashes:
    ONE lexsort + run-length pass — the same coarse-reduction kernel as
    ops/dedup._sorted_run_pairs, applied per batch (no shuffle)."""
    total = np.bincount(rows, minlength=n_rows)
    if len(hashes) == 0:
        z = np.zeros(n_rows, np.int64)
        return total, z, z
    order = np.lexsort((hashes, rows))
    rh, hh = rows[order], hashes[order]
    change = np.empty(len(hh), bool)
    change[0] = True
    change[1:] = (rh[1:] != rh[:-1]) | (hh[1:] != hh[:-1])
    run_counts = np.diff(np.append(np.nonzero(change)[0], len(hh)))
    run_row = rh[change]
    distinct = np.bincount(run_row, minlength=n_rows)
    top = np.zeros(n_rows, np.int64)
    np.maximum.at(top, run_row, run_counts)
    return total, distinct, top


def repetition_signals(
    batch: pa.Table, col: str = "text", id_col: str = "rec_id"
) -> pa.Table:
    """Gopher-style repetition quality signals, one vectorized pass:

    - ``n_lines`` / ``dup_line_frac``: non-empty '\\n' lines; fraction
      that are duplicates of an earlier line (1 - distinct/total).
    - ``n_words`` / ``top_word_frac``: lowered whitespace tokens; share
      of the single most frequent token.

    Repetitive boilerplate (nav bars, footer spam, keyword stuffing)
    scores high on both — the standard web-corpus filter signals
    (Gopher, Rae et al. 2021, public). Fractions are double divisions
    of exact int counts, so the DuckDB twin is bitwise-identical."""
    from .texthash import poly_hash_array, tokenize_ws

    batch = batch.filter(pc.is_valid(batch.column(col)))
    s = pc.cast(batch.column(col), pa.large_string())
    n = len(batch)

    lines = pc.split_pattern(s, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lflat, lrows = _flat_rows(lines)
    lt, ld, _ = _per_row_runs(poly_hash_array(lflat), lrows, n)

    flat, off = tokenize_ws(pc.utf8_lower(s))
    wrows = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    wt, _, wtop = _per_row_runs(poly_hash_array(flat), wrows, n)

    dup_line_frac = np.where(lt > 0, 1.0 - ld / np.maximum(lt, 1), 0.0)
    top_word_frac = np.where(wt > 0, wtop / np.maximum(wt, 1), 0.0)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_lines": pa.array(lt.astype(np.int64)),
            "dup_line_frac": pa.array(dup_line_frac),
            "n_words": pa.array(wt.astype(np.int64)),
            "top_word_frac": pa.array(top_word_frac),
        }
    )
