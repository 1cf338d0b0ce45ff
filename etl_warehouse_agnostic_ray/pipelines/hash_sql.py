"""DuckDB SQL twins of the ``ops/texthash.py`` hash family.

The repo's canonical string hash is poly64(bytes) = Σ byte·B^(L-1-j)
mod 2^64 with B = 1099511628211 (< 2^41), chosen so every Horner step
fits in DuckDB's HUGEINT — these generators emit plain SQL that
reproduces the numpy values bit-for-bit on ASCII text (codepoint ==
UTF-8 byte). That turns the previously "rows-only" operators
(fingerprint, simhash, minhash-LSH) into value-verified oracle rows:
the SQL replays the ALGORITHM, not just an invariant.

All functions return SQL strings; the minhash permutation table is
inlined as VALUES rows generated from the same seeded PCG64 stream the
Ray-side actors use, so both sides share one parameterization.
"""

from __future__ import annotations

import numpy as np

B = 1099511628211
M64 = 18446744073709551616  # 2^64
M61 = 2305843009213693951  # 2^61 - 1
I64_HALF = 9223372036854775808  # 2^63

# poly64 over the codepoints of a token/string expression
def poly64_expr(s_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0::HUGEINT, "
        f"[unicode(c)::HUGEINT for c in str_split({s_expr}, '')]), "
        f"(h, x) -> (h * {B} + x) % {M64})"
    )


def as_int64(h_expr: str) -> str:
    """Two's-complement view of a 0..2^64-1 HUGEINT value (numpy
    ``.view(np.int64)`` twin)."""
    return (
        f"(CASE WHEN ({h_expr}) >= {I64_HALF} THEN ({h_expr}) - {M64} "
        f"ELSE ({h_expr}) END)::BIGINT"
    )


def fingerprint_sql(doc_src: str) -> str:
    """Per-doc fingerprint = poly64 of the whitespace-squashed lowered
    text (ops/text.py doc_fingerprint twin)."""
    return f"""
WITH src AS (SELECT doc_id, text FROM {doc_src}),
nrm AS (SELECT doc_id, regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g') AS t
        FROM src),
h AS (SELECT doc_id, CASE WHEN t = '' THEN 0::HUGEINT ELSE {poly64_expr('t')} END AS v
      FROM nrm)
SELECT doc_id, {as_int64('v')} AS fingerprint FROM h
"""


def _bitpow_values() -> str:
    return ", ".join(f"({b}, {1 << b}::HUGEINT)" for b in range(64))


def simhash_cte(doc_src: str) -> str:
    """CTE chain ending in ``sim(doc_id, simhash BIGINT)`` — the
    ops/texthash.simhash_batch twin (distinct lowered tokens → per-bit
    ±1 votes → sign-packed 64-bit)."""
    return f"""
src AS (SELECT doc_id, text FROM {doc_src}),
tl AS (SELECT doc_id,
         CASE WHEN trim(lower(coalesce(text,''))) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS toks
       FROM src),
tok AS (SELECT DISTINCT doc_id, unnest(toks) AS tok FROM tl),
th AS (SELECT doc_id, {poly64_expr('tok')} AS h FROM tok),
bitpow(b, p) AS (VALUES {_bitpow_values()}),
votes AS (SELECT doc_id, p, sum(CASE WHEN (h // p) % 2 = 1 THEN 1 ELSE -1 END) AS v
          FROM th CROSS JOIN bitpow GROUP BY doc_id, p),
acc AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN p ELSE 0::HUGEINT END) AS u
        FROM votes GROUP BY doc_id),
sim AS (SELECT s.doc_id, coalesce({as_int64('u')}, 0) AS simhash
        FROM src s LEFT JOIN acc USING (doc_id))"""


def simhash_documents_sql(doc_src: str = "documents") -> str:
    return f"WITH {simhash_cte(doc_src)}\nSELECT doc_id, simhash FROM sim"


def simhash_pairs_sql(doc_src: str = "documents", max_hamming: int = 3) -> str:
    return f"""WITH {simhash_cte(doc_src)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def minhash_perms(n_perm: int = 64, seed: int = 13) -> tuple[np.ndarray, np.ndarray]:
    """The shared (a, b) permutation parameters — seeded PCG64, same
    stream on the Ray side (ops/dedup.MinHashSignatures)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, M61, n_perm, dtype=np.uint64)
    b = rng.integers(0, M61, n_perm, dtype=np.uint64)
    return a, b


def _shingle_fold(k: int) -> str:
    """Horner fold over h, lead1..lead(k-1) with mod-2^64 at each step."""
    expr = "h"
    for i in range(1, k):
        expr = f"(({expr}) * {B} % {M64} + h{i}) % {M64}"
    return expr


def shingle_cte(doc_src: str, k: int) -> str:
    """CTE chain ending in ``shingle(doc_id, s)`` — DISTINCT k-token
    shingle hashes per doc (ops/texthash.shingle_hashes twin, including
    the zero-padding of docs shorter than k)."""
    leads = ",\n         ".join(
        f"coalesce(lead(h, {i}) OVER w, 0) AS h{i}" for i in range(1, k)
    )
    return f"""src AS (SELECT doc_id, text FROM {doc_src}),
tl AS (SELECT doc_id,
         CASE WHEN trim(coalesce(text,'')) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
       FROM src),
tokpos AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos FROM tl),
th AS (SELECT doc_id, pos, {poly64_expr('tok')} AS h FROM tokpos),
win AS (SELECT doc_id, pos, h,
         {leads},
         count(*) OVER (PARTITION BY doc_id) AS n_tok
        FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
shingle AS (SELECT DISTINCT doc_id, {_shingle_fold(k)} AS s
            FROM win WHERE pos <= greatest(n_tok - {k - 1}, 1))"""


def ngram_jaccard_pairs_sql(
    doc_src: str = "documents", n: int = 3, threshold: float = 0.5
) -> str:
    """Exact n-gram Jaccard pairs twin (ops/dedup.ngram_jaccard_pairs):
    shared-gram counts via a self-join on the shingle hashes, union by
    inclusion-exclusion, integral output columns."""
    return f"""
WITH {shingle_cte(doc_src, n)},
counts AS (SELECT doc_id, count(*) AS n FROM shingle GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
          FROM shingle a JOIN shingle b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b, i.n_common,
       (ca.n + cb.n - i.n_common)::BIGINT AS n_union
FROM inter i
JOIN counts ca ON ca.doc_id = i.doc_a
JOIN counts cb ON cb.doc_id = i.doc_b
WHERE i.n_common >= {threshold} * (ca.n + cb.n - i.n_common)
"""


def minhash_pairs_sql(
    doc_src: str = "documents",
    n_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    jaccard_threshold: float = 0.6,
    seed: int = 13,
) -> str:
    """Full LSH replay: shingles → 64 minhashes → band buckets →
    candidate pairs → per-pair equal-minhash count. Output
    (doc_a, doc_b, n_equal) with n_equal ≥ ceil(threshold · n_perm)."""
    a, b = minhash_perms(n_perm, seed)
    perm_rows = ", ".join(
        f"({p}, {int(a[p])}::HUGEINT, {int(b[p])}::HUGEINT)" for p in range(n_perm)
    )
    rpb = n_perm // bands
    min_equal = int(np.ceil(jaccard_threshold * n_perm - 1e-9))
    return f"""
WITH {shingle_cte(doc_src, k)},
perms(p, pa, pb) AS (VALUES {perm_rows}),
mh AS (SELECT doc_id, p,
        min((((s * pa) % {M64} + pb) % {M64}) % {M61}) AS v
       FROM shingle CROSS JOIN perms GROUP BY doc_id, p),
sig AS (SELECT d.doc_id, pm.p, coalesce(mh.v, 0::HUGEINT) AS v
        FROM (SELECT DISTINCT doc_id FROM src) d
        CROSS JOIN perms pm
        LEFT JOIN mh ON mh.doc_id = d.doc_id AND mh.p = pm.p),
bnd AS (SELECT doc_id, p // {rpb} AS band, list(v ORDER BY p) AS vs
        FROM sig GROUP BY doc_id, p // {rpb}),
bh AS (SELECT doc_id, band,
        list_reduce(list_prepend(0::HUGEINT, vs), (h, x) -> (h * {B} + x) % {M64}) AS band_hash
       FROM bnd),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bh a JOIN bh b
           ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
eq AS (SELECT c.doc_a, c.doc_b,
        sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END)::BIGINT AS n_equal
       FROM cand c
       JOIN sig sa ON sa.doc_id = c.doc_a
       JOIN sig sb ON sb.doc_id = c.doc_b AND sb.p = sa.p
       GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b, n_equal FROM eq WHERE n_equal >= {min_equal}
"""


def lang_id_sql(
    doc_src: str,
    profiles: dict[str, tuple[str, ...]],
    trigrams: dict[str, tuple[str, ...]] | None = None,
) -> str:
    """Two-tier argmax with numpy-argmax (first max wins) tie semantics,
    in declaration order of ``profiles``. Tier 1 is token MEMBERSHIP —
    lower → strip non-letter/digit/space → split on whitespace → count
    tokens IN the profile — the exact twin of ops/text.lang_id (which
    does the same with hashed tokens); plain string equality here, so
    non-ASCII profiles (ru, el) verify too. Tier 2 (rows with zero
    stopword hits) counts each language's characteristic trigrams over
    the whitespace-squashed normalized text via the replace-length
    trick (non-overlapping occurrences, same as Arrow count_substring)."""
    if trigrams is None:
        from ..ops.text import _LANG_TRIGRAMS as trigrams
    langs = list(profiles)

    def score(lg: str) -> str:
        words = ", ".join("'" + w + "'" for w in profiles[lg])
        return (
            "coalesce(len(list_filter(regexp_split_to_array(norm, "
            f"'\\s+'), t -> t IN ({words}))), 0) AS s_{lg}"
        )

    def tri_score(lg: str) -> str:
        terms = " + ".join(
            f"(length(sq) - length(replace(sq, '{t}', ''))) // {len(t)}"
            for t in trigrams[lg]
        )
        return f"coalesce({terms}, 0) AS t_{lg}"

    score_cols = ",\n  ".join(score(lg) for lg in langs)
    tri_cols = ",\n  ".join(tri_score(lg) for lg in langs)
    all_s = ", ".join(f"s_{lg}" for lg in langs)
    all_t = ", ".join(f"t_{lg}" for lg in langs)

    def ladder(prefix: str) -> str:
        rungs = []
        for i, lg in enumerate(langs):
            rest = [f"{prefix}_{lg} >= {prefix}_{other}" for other in langs[i + 1 :]]
            cond = " AND ".join(rest) if rest else "TRUE"
            rungs.append(f"WHEN {cond} THEN '{lg}'")
        return "\n      ".join(rungs[:-1]) + f"\n      ELSE '{langs[-1]}'"

    return f"""
WITH n AS (
  SELECT doc_id,
         regexp_replace(lower(text), '[^\\pL\\pN\\s]', '', 'g') AS norm,
         regexp_replace(regexp_replace(lower(text), '[^\\pL\\pN\\s]', '', 'g'),
                        '\\s+', ' ', 'g') AS sq
  FROM {doc_src}),
sc AS (SELECT doc_id, {score_cols},
  {tri_cols}
  FROM n)
SELECT doc_id,
  CASE WHEN greatest({all_s}) > 0 THEN
    CASE {ladder("s")} END
  WHEN greatest({all_t}) > 0 THEN
    CASE {ladder("t")} END
  ELSE 'und' END AS lang_pred
FROM sc
"""


def multimodal_decode_sql(pages_path: str) -> str:
    """ops/multimodal.DecodeImageBatch fake-decode twin: width/height
    from byte sums of the (ASCII) html payload."""
    sum8 = (
        "list_sum([unicode(c)::BIGINT for c in "
        "str_split(substring(decode(html), 1, 8), '')])"
    )
    sum16 = (
        "list_sum([unicode(c)::BIGINT for c in "
        "str_split(substring(decode(html), 9, 8), '')])"
    )
    return f"""
SELECT url,
  (CASE WHEN html IS NULL OR octet_length(html) = 0 THEN 0
        ELSE 1 + ({sum8} % 1920) END)::BIGINT AS width,
  (CASE WHEN html IS NULL OR octet_length(html) = 0 THEN 0
        WHEN octet_length(html) > 8 THEN 1 + (coalesce({sum16}, 0) % 1080)
        ELSE 1 END)::BIGINT AS height,
  CASE WHEN html IS NULL OR octet_length(html) = 0 THEN 'none' ELSE 'RGB' END AS mode
FROM read_parquet('{pages_path}')
"""


# SplitMix64 finalizer twin (ops/texthash.splitmix64: xor-shift 30,
# * C1, xor-shift 27, * C2, xor-shift 31 — no gamma add). Mod-2^64
# multiplication splits the >2^63 constants into 32-bit halves so no
# intermediate exceeds HUGEINT range: a*c mod 2^64 =
# (a*c_lo + ((a*c_hi) mod 2^32) * 2^32) mod 2^64.
_SM_C1 = 0xBF58476D1CE4E5B9
_SM_C2 = 0x94D049BB133111EB


def _mulmod64(a_expr: str, c: int) -> str:
    c_hi, c_lo = c >> 32, c & 0xFFFFFFFF
    return (
        f"((({a_expr}) * {c_lo} + ((({a_expr}) * {c_hi}) % 4294967296) "
        f"* 4294967296) % {M64})"
    )


def splitmix64_expr(x_expr: str) -> str:
    """SQL twin of ``texthash.splitmix64`` over a 0..2^64-1 HUGEINT
    expression. ``x_expr`` should be a simple column reference — it is
    substituted repeatedly."""
    z1 = _mulmod64(f"xor(({x_expr})::HUGEINT, ({x_expr})::HUGEINT // 1073741824)", _SM_C1)
    return (
        f"(SELECT xor(z2, z2 // 2147483648) FROM ("
        f"SELECT {_mulmod64('xor(z1, z1 // 134217728)', _SM_C2)} AS z2 FROM ("
        f"SELECT {z1} AS z1) ) )"
    )
