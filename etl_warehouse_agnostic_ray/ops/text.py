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

# Per-language characteristic character trigrams — the FALLBACK tier
# for short / stopword-free texts (a single word has no function words
# to hit, but its character n-grams still carry the language signal —
# the Cavnar-Trenkle 1994 n-gram profile idea reduced to a fixed data
# table). Counted over the normalized, whitespace-squashed text;
# space-anchored trigrams (" th") are word-boundary features. Kept as
# DATA in declaration order, same oracle-lockstep contract as
# _LANG_PROFILES.
_LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("the", " th", "he ", "ing", "and", "ion", " of", "ed "),
    "de": ("der", "sch", "ein", "ich", "und", "cht", "die", "gen"),
    "fr": ("les", " de", "ent", "que", "eau", "ais", "eur", " le"),
    "es": (" de", "que", "ión", "los", "ado", " la", "nte", "cia"),
    "it": ("che", " di", "zio", "lla", "ato", "gli", "ere", "zza"),
    "pt": (" de", "ção", "são", "ado", " da", "ndo", "lho", "os "),
    "nl": ("een", "het", " de", "van", "aar", "ijk", "oek", "den"),
    "sv": ("och", "att", "det", "för", "ing", "are", " på", "en "),
    "da": (" og", "det", "der", "ede", "til", " på", "ger", "ske"),
    "no": (" og", "det", "til", " på", "ikk", "ene", "sjo", "ett"),
    "pl": ("nie", "prz", "ach", "ego", "ych", "owa", " po", "rze"),
    "cs": (" se", "ní ", "ch ", "pro", "ost", "ova", " na", "ení"),
    "ro": (" de", "are", "ulu", "și ", " în", "ate", "ntr", "ște"),
    "tr": ("lar", "ler", "bir", " ve", "iyo", "ın ", "da ", "an "),
    "id": ("ang", "kan", " di", "yan", "men", "ber", " ke", "nya"),
    "ru": (" и ", "ого", "ать", "ени", "ост", " на", "тся", "ние"),
    "el": ("και", " το", "της", "ται", "ους", "ική", " να", "ων "),
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
    """Two-tier language ID:

    1. Stopword-profile token MEMBERSHIP: lower → strip punctuation
       (keep letters/digits/whitespace) → tokenize; per language, count
       tokens in its stopword set; argmax in declaration order.
    2. FALLBACK for rows with zero stopword hits (short or
       function-word-free text): per-language characteristic character
       TRIGRAM occurrence counts over the whitespace-squashed
       normalized text; argmax in declaration order. 'und' only when
       both tiers are silent.

    Token membership (not the old ``\\b``-regex count) is what makes
    non-Latin profiles work at all: RE2 word boundaries are ASCII-only,
    so ``\\b(и)\\b`` can never match Cyrillic text. Vectorized: the
    batch's tokens are hashed once off the flat Arrow token buffer,
    each stopword profile is one sorted-array ``np.isin`` + segment-sum,
    and each trigram is one Arrow count_substring kernel — no per-row
    Python. The DuckDB twin performs the same two-tier scoring
    (pipelines/hash_sql.lang_id_sql)."""
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
    stop_hit = m.max(axis=1) > 0
    lang_arr = np.asarray(langs, dtype=object)
    pred = np.where(stop_hit, lang_arr[best], "und")
    need = ~stop_hit
    if need.any():
        # trigram scans run over ONLY the rows tier 1 missed (long web
        # docs nearly always hit a stopword, so the 17×8 substring
        # kernels touch just the short-text tail, not the whole batch)
        sq = pc.replace_substring_regex(s.filter(pa.array(need)), r"\s+", " ")
        t = np.zeros((int(need.sum()), len(langs)), dtype=np.int64)
        for j, lg in enumerate(langs):
            for tri in _LANG_TRIGRAMS[lg]:
                c = pc.fill_null(pc.count_substring(sq, tri), 0)
                t[:, j] += c.to_numpy(zero_copy_only=False)
        tri_best = t.argmax(axis=1)
        tri_hit = t.max(axis=1) > 0
        pred[need] = np.where(tri_hit, lang_arr[tri_best], "und")
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


# Gopher quality-rule battery (Rae et al. 2021, public): the standard
# doc-level web-text filters. Required-stopword set kept as DATA so the
# SQL twin regenerates from it.
_GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    batch: pa.Table,
    col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> pa.Table:
    """Gopher-style document quality rules, one vectorized pass per
    batch (no shuffle): word-count bounds, mean word length 3-10,
    '#' / ellipsis symbol-to-word ratios <= 0.1, bullet-start line
    fraction <= 0.9, ellipsis-end line fraction <= 0.3, alphabetic-word
    fraction >= 0.8, and >= 2 distinct required English stopwords.
    Emits every signal plus the combined ``gopher_pass`` flag; all
    arithmetic is exact-int division replayed bitwise by the SQL twin
    (``gopher_sql``).

    (Reference analogue: the additive completeness/validity scoring in
    ``dbt/models/curated/repsly/visits.sql:328-340`` — semantics
    generalized to the published web-corpus rule set.)
    """
    from .texthash import poly_hash_array, tokenize_ws

    s = pc.fill_null(pc.cast(batch.column(col), pa.large_string()), "")
    n = len(batch)

    # words
    flat, off = tokenize_ws(s)
    n_words = np.diff(off).astype(np.int64)
    wrows = np.repeat(np.arange(n, dtype=np.int64), n_words)
    nonspace = pc.utf8_length(
        pc.replace_substring_regex(s, r"\s", "")
    ).to_numpy(zero_copy_only=False).astype(np.float64)
    mean_word_len = np.where(n_words > 0, nonspace / np.maximum(n_words, 1), 0.0)

    alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(zero_copy_only=False)
    alpha_words = np.bincount(wrows[alpha], minlength=n)
    alpha_word_frac = np.where(n_words > 0, alpha_words / np.maximum(n_words, 1), 0.0)

    # distinct required stopwords present (lowered token membership)
    th = poly_hash_array(pc.utf8_lower(flat))
    stop_set = np.sort(
        poly_hash_array(pa.array(list(_GOPHER_STOPWORDS), pa.large_string()))
    )
    hits = np.isin(th, stop_set)
    _, stop_hits, _ = _per_row_runs(th[hits], wrows[hits], n)

    # symbol-to-word ratios (leftmost non-overlapping counts, both sides)
    hash_cnt = pc.count_substring(s, "#").to_numpy(zero_copy_only=False)
    ell_cnt = (
        pc.count_substring(s, "...").to_numpy(zero_copy_only=False)
        + pc.count_substring(s, "…").to_numpy(zero_copy_only=False)
    )
    hash_word_ratio = np.where(n_words > 0, hash_cnt / np.maximum(n_words, 1), 0.0)
    ellipsis_word_ratio = np.where(n_words > 0, ell_cnt / np.maximum(n_words, 1), 0.0)

    # line fractions (ALL lines, like the published rules)
    from .linededup import split_lines

    lflat, loff = split_lines(s)
    n_lines = np.diff(loff).astype(np.int64)
    lrows = np.repeat(np.arange(n, dtype=np.int64), n_lines)
    bullet = pc.match_substring_regex(lflat, r"^[-*•]").to_numpy(zero_copy_only=False)
    ell_end = pc.match_substring_regex(lflat, r"(\.\.\.|…)$").to_numpy(
        zero_copy_only=False
    )
    bullet_line_frac = np.where(
        n_lines > 0, np.bincount(lrows[bullet], minlength=n) / np.maximum(n_lines, 1), 0.0
    )
    ellipsis_line_frac = np.where(
        n_lines > 0, np.bincount(lrows[ell_end], minlength=n) / np.maximum(n_lines, 1), 0.0
    )

    ok = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (hash_word_ratio <= 0.1)
        & (ellipsis_word_ratio <= 0.1)
        & (bullet_line_frac <= 0.9)
        & (ellipsis_line_frac <= 0.3)
        & (alpha_word_frac >= 0.8)
        & (stop_hits >= 2)
    )
    # APPEND signals (original columns survive), so the battery chains
    # into downstream stages — filter on any signal, keep the text
    for name, arr in (
        ("n_words", pa.array(n_words)),
        ("mean_word_len", pa.array(mean_word_len)),
        ("hash_word_ratio", pa.array(hash_word_ratio)),
        ("ellipsis_word_ratio", pa.array(ellipsis_word_ratio)),
        ("bullet_line_frac", pa.array(bullet_line_frac)),
        ("ellipsis_line_frac", pa.array(ellipsis_line_frac)),
        ("alpha_word_frac", pa.array(alpha_word_frac)),
        ("stop_hits", pa.array(stop_hits.astype(np.int64))),
        ("gopher_pass", pa.array(ok)),
    ):
        batch = batch.append_column(name, arr)
    return batch


def gopher_sql(
    doc_src: str = "documents",
    min_words: int = 50,
    max_words: int = 100_000,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``gopher_rules`` — identical tokenization
    (``\\s+`` split of trimmed text), identical exact-int divisions,
    stopword list injected from the same ``_GOPHER_STOPWORDS`` data."""
    stop_list = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)
    return f"""
WITH tk AS (
  -- coalesce mirrors gopher_rules' fill_null(text, ''): a NULL text row
  -- must score n_words=0 / gopher_pass=false, not NULL/NULL
  SELECT {id_col}, coalesce(text, '') AS text,
         CASE WHEN trim(coalesce(text, '')) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(coalesce(text, '')), '\\s+') END AS toks
  FROM {doc_src}
),
w AS (
  SELECT {id_col}, text,
         array_length(toks)::BIGINT AS n_words,
         length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
         array_length(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS alpha_words,
         array_length(list_intersect(
             list_distinct(list_transform(toks, t -> lower(t))),
             [{stop_list}])) AS stop_hits,
         length(text) - length(replace(text, '#', '')) AS hash_cnt,
         (length(text) - length(replace(text, '...', ''))) / 3
           + length(text) - length(replace(text, '…', '')) AS ell_cnt
  FROM tk
),
l AS (
  SELECT {id_col}, count(*)::BIGINT AS n_lines,
         sum(CASE WHEN regexp_matches(line, '^[-*•]') THEN 1 ELSE 0 END) AS bullets,
         sum(CASE WHEN regexp_matches(line, '(\\.\\.\\.|…)$') THEN 1 ELSE 0 END) AS ells
  FROM (SELECT {id_col}, unnest(string_split(coalesce(text, ''), chr(10))) AS line FROM {doc_src})
  GROUP BY {id_col}
),
j AS (
  SELECT w.{id_col}, w.n_words,
         CASE WHEN w.n_words > 0 THEN w.nonspace / w.n_words::DOUBLE ELSE 0.0 END AS mean_word_len,
         CASE WHEN w.n_words > 0 THEN w.hash_cnt / w.n_words::DOUBLE ELSE 0.0 END AS hash_word_ratio,
         CASE WHEN w.n_words > 0 THEN w.ell_cnt / w.n_words::DOUBLE ELSE 0.0 END AS ellipsis_word_ratio,
         CASE WHEN l.n_lines > 0 THEN l.bullets / l.n_lines::DOUBLE ELSE 0.0 END AS bullet_line_frac,
         CASE WHEN l.n_lines > 0 THEN l.ells / l.n_lines::DOUBLE ELSE 0.0 END AS ellipsis_line_frac,
         CASE WHEN w.n_words > 0 THEN w.alpha_words / w.n_words::DOUBLE ELSE 0.0 END AS alpha_word_frac,
         coalesce(w.stop_hits, 0)::BIGINT AS stop_hits
  FROM w LEFT JOIN l USING ({id_col})
)
SELECT {id_col}, n_words, mean_word_len, hash_word_ratio, ellipsis_word_ratio,
       bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stop_hits,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND hash_word_ratio <= 0.1 AND ellipsis_word_ratio <= 0.1
        AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
        AND alpha_word_frac >= 0.8 AND stop_hits >= 2) AS gopher_pass
FROM j
"""


# GPT-2-style pre-tokenizer, simplified to RE2 (no lookahead): letter
# runs, digit runs, punctuation runs, each with an optional leading
# space. Leftmost-first alternation — identical in Arrow and DuckDB
# (both RE2), so the SQL twin counts bitwise the same.
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(
    batch: pa.Table, col: str = "text", out: str = "n_bpe_tokens"
) -> pa.Table:
    """BPE-ish token count (the pre-merge segment count a GPT-2-style
    tokenizer would start from) — one vectorized RE2 pass. SQL twin:
    ``array_length(regexp_extract_all(text, BPE_TOKEN_PATTERN))``."""
    n = pc.count_substring_regex(
        pc.cast(batch.column(col), pa.string()), BPE_TOKEN_PATTERN
    )
    return batch.append_column(out, pc.cast(n, pa.int64()))


def char_entropy(
    batch: pa.Table,
    col: str = "text",
) -> pa.Table:
    """Per-document character (code-point) Shannon entropy in nats —
    the classic gibberish / low-diversity filter (a page of "aaaa…" or
    base64 noise sits at the entropy extremes; natural prose clusters
    near ~2.8–3.2 nats/char). Stateless, shuffle-free, one pass.

    Vectorized shape: the batch's texts become ONE code-point array
    (utf-32 view) tagged with a (doc, code-point) composite uint64 key;
    a single sort + run-length pass yields every per-document character
    count — no per-row Python, no per-document dict.

    Determinism contract (DuckDB twin replays value-for-value):
    H = ln(L) - (1/L)·Σ n_c·ln(n_c) is computed over INTEGER
    micro-nats — per-char cost floor(ln(n_c)·1e6) — so every sum is
    order-independent; the only floats shared with SQL are libm ln and
    ONE final division of exact-integer-valued doubles (< 2^53), both
    bit-stable across numpy and DuckDB (the ops/lm.py contract).
    Appends ``n_cp`` (code-point length), ``n_distinct_chars``, and
    ``char_entropy`` (nats/char; 0.0 for empty text).
    """
    texts = pc.cast(batch.column(col), pa.string()).fill_null("").to_pylist()
    n_docs = len(texts)
    lens = np.fromiter((len(t) for t in texts), np.int64, n_docs)
    cp = np.frombuffer("".join(texts).encode("utf-32-le"), np.uint32)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.uint64), lens)
    key = (doc_idx << np.uint64(32)) | cp.astype(np.uint64)
    key.sort()
    first = np.ones(len(key), bool)
    first[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(first)
    runs = np.diff(np.append(starts, len(key))).astype(np.int64)
    # exact-integer-valued doubles throughout: runs ≤ 2^31, ln·1e6 ≤ 2^36
    ln_cost = np.floor(np.log(runs) * 1e6)
    doc_of_run = (key[starts] >> np.uint64(32)).astype(np.int64)
    sub = np.bincount(doc_of_run, weights=runs * ln_cost, minlength=n_docs)
    n_distinct = np.bincount(doc_of_run, minlength=n_docs).astype(np.int64)
    ln_len = np.floor(np.log(np.maximum(lens, 1)) * 1e6)
    # denominator clamped only where lens == 0 (masked to 0.0 anyway),
    # so the lens > 0 lanes keep the oracle's exact single division
    entropy = np.where(
        lens > 0, (lens * ln_len - sub) / (np.maximum(lens, 1) * 1e6), 0.0
    )
    return (
        batch.append_column("n_cp", pa.array(lens))
        .append_column("n_distinct_chars", pa.array(n_distinct))
        .append_column("char_entropy", pa.array(entropy, pa.float64()))
    )


def type_token_ratio(
    batch: pa.Table,
    col: str = "text",
) -> pa.Table:
    """Per-document lexical diversity (type-token ratio): distinct
    lowered whitespace tokens / total tokens — the standard companion
    to [char_entropy] in webtext quality filtering (template/boilerplate
    pages repeat a tiny vocabulary; TTR → 0 as text degenerates).

    Vectorized shape: the whole batch tokenizes through the shared
    Arrow split kernel (ops/texthash.tokenize_ws), token identity is
    the canonical poly64 hash, and per-document distinct counts come
    from ONE lexsort + run-length pass over (doc, hash) — no per-row
    Python, no shuffle.

    Determinism contract: the SQL twin counts DISTINCT over the SAME
    poly64 hash (pipelines/hash_sql.poly64_expr), so both sides agree
    even in the astronomically-unlikely collision case; ``ttr`` is ONE
    division of exact-integer-valued doubles (< 2^53). Appends
    ``n_tokens``, ``n_types``, ``ttr`` (0.0 for token-free text).
    """
    from .texthash import _unique_per_segment, token_hashes

    th, offs = token_hashes(batch.column(col), lower=True)
    n_tok = np.diff(offs).astype(np.int64)
    _, _, starts = _unique_per_segment(th, offs)
    n_typ = np.diff(starts).astype(np.int64)
    ttr = np.where(n_tok > 0, n_typ / np.maximum(n_tok, 1), 0.0)
    return (
        batch.append_column("n_tokens", pa.array(n_tok))
        .append_column("n_types", pa.array(n_typ))
        .append_column("ttr", pa.array(ttr, pa.float64()))
    )
