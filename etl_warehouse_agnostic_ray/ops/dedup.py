"""Deduplication operators — exact and near-duplicate.

Scale shapes (the part that matters at 100 TB):
- exact: hash column in map_batches → groupby(hash) → keep min-id.
  Only the 64-bit hash + id shuffle; payload stays put until the final
  semi-join filter (broadcast keep-set for small survivor counts, or a
  second hash-join pass at scale).
- MinHash-LSH: per-doc signatures in map_batches (vectorized) →
  explode to (band, band_hash, doc_id) rows → groupby bucket →
  within-bucket candidate pairs → Jaccard verify. The shuffle moves
  only (int, int, id) triples — never document text.
- SimHash: 64-bit signatures per batch; near-dup = Hamming distance on
  bucketed prefixes.
- embedding near-dup: sign-LSH buckets → within-bucket cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = np.uint64((1 << 61) - 1)


_TOKEN_HASH_CACHE: dict[str, int] = {}


def _word_shingles(text: str, k: int) -> np.ndarray:
    """k-word shingle hashes, vectorized: token → cached 64-bit hash,
    then a sliding polynomial combine over the token-hash array (numpy),
    instead of hashing each joined shingle string."""
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    cache = _TOKEN_HASH_CACHE
    th = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = int(hash64_str(t))
            if len(cache) < 1_000_000:
                cache[t] = h
        th[i] = h
    if len(th) < k:
        pad = np.zeros(k - len(th), dtype=np.uint64)
        th = np.concatenate([th, pad])
    n = len(th) - k + 1
    with np.errstate(over="ignore"):
        A = np.uint64(0x9E3779B97F4A7C15)
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(k):  # k is small (≈5); inner op fully vectorized
            acc = acc * A + th[j : j + n]
    return np.unique(acc)


def hash64_str(s: str) -> np.uint64:
    """Deterministic FNV-1a (process-independent; no PYTHONHASHSEED)."""
    h = np.uint64(0xCBF29CE484222325)
    data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    with np.errstate(over="ignore"):
        B = np.uint64(0x100000001B3)
        pw = np.full(len(data), B, dtype=np.uint64)
        if len(pw):
            pw[0] = 1
            pw = np.cumprod(pw, dtype=np.uint64)[::-1]
            h = np.uint64(np.sum(data * pw, dtype=np.uint64)) ^ h
    return h


# ---------------------------------------------------------------- exact
def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per exact text. Returns the survivors as
    (id, text) — a NATIVE grouped aggregate (Min), no per-group Python:
    thousands of tiny groups through map_groups cost ~10× more. At
    100 TB, group on a 64-bit content hash instead of the text so the
    shuffle moves 8-byte keys (collision-check inside the group)."""
    from ray.data.aggregate import Min

    out = ds.groupby(text_col).aggregate(Min(id_col, alias_name=id_col))
    return out.select_columns([id_col, text_col])


# ------------------------------------------------------------- minhash
class MinHashSignatures:
    """Actor-pool stage: k-word-shingle MinHash signatures.

    Permutation parameters are built ONCE per actor in __init__
    (SURVEY.md §2.4 actor-pool rule), then applied per batch.
    """

    def __init__(self, n_perm: int = 64, k: int = 5, seed: int = 13):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, _MERSENNE, n_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _word_shingles(text or "", self.k)
        if not len(sh):
            return np.zeros(self.n_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (s, p) = (a*h + b) mod M, column-min per permutation
            m = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return m.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.cast(batch.column("text"), pa.string()).to_pylist()
        sigs = np.stack([self.signature(t) for t in texts])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array(list(sigs.astype(np.int64)), pa.list_(pa.int64())),
            }
        )


def minhash_lsh_pairs(
    ds,
    n_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    jaccard_threshold: float = 0.6,
    seed: int = 13,
):
    """Candidate generation + verification. Returns a Dataset of
    (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard ≥ threshold.

    Pipeline: signatures (actor pool) → explode to (band, band_hash,
    doc_id) → groupby(band, band_hash) → within-bucket pairs →
    signature-Jaccard verify (estimate over n_perm minhashes).
    """
    rows_per_band = n_perm // bands

    sig_ds = ds.map_batches(
        MinHashSignatures(n_perm=n_perm, k=k, seed=seed),
        batch_format="pyarrow",
        concurrency=4,
    ).materialize()  # reused twice (bucket explode + verify lookup)

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = np.asarray(batch.column("sig").to_pylist(), dtype=np.int64)
        n = len(ids)
        band_ids = np.repeat(np.arange(bands, dtype=np.int64), n)
        doc_ids = np.tile(ids, bands)
        bh = np.empty(n * bands, dtype=np.int64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band].astype(np.uint64)
                acc = np.uint64(0xCBF29CE484222325) * np.ones(n, dtype=np.uint64)
                for c in range(seg.shape[1]):
                    acc = (acc ^ seg[:, c]) * np.uint64(0x100000001B3)
                bh[b * n : (b + 1) * n] = acc.view(np.int64)
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(bh),
                "doc_id": pa.array(doc_ids),
            }
        )

    buckets = sig_ds.map_batches(explode_bands, batch_format="pyarrow")

    # Coarse-group the LSH buckets (band_hash mod G) so each map_groups
    # task handles MANY buckets with a vectorized pandas groupby inside —
    # one task per (band, band_hash) would mean ~n_docs×bands tiny
    # Python tasks (measured ~10× slower).
    def add_coarse(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        coarse = _pc.bit_wise_and(b.column("band_hash"), pa.scalar(255, pa.int64()))
        return b.append_column("coarse", coarse)

    def bucket_pairs_many(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_, _), sub in g.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(sub["doc_id"].to_numpy())
            if len(ids) < 2:
                continue
            if len(ids) > 1000:  # skew guard: degenerate all-identical bucket
                ids = ids[:1000]
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        )

    pairs = (
        buckets.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(bucket_pairs_many, batch_format="pandas")
    )

    # dedupe candidate pairs across bands, then verify with signature
    # jaccard. The signature matrix is broadcast (n_docs × n_perm ints —
    # small relative to text); at 10^9-doc scale this becomes a hash
    # join of pairs against sig_ds on doc id instead of a broadcast.
    sig_rows = sig_ds.take_all()
    sig_map = {r["doc_id"]: np.asarray(r["sig"], dtype=np.int64) for r in sig_rows}

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        jac = np.empty(len(a), dtype=np.float64)
        for i in range(len(a)):
            sa, sb = sig_map[a[i]], sig_map[b[i]]
            jac[i] = float(np.mean(sa == sb))
        t = pa.table(
            {"doc_a": batch.column("doc_a"), "doc_b": batch.column("doc_b"),
             "jaccard": pa.array(jac)}
        )
        return t.filter(pc.greater_equal(t.column("jaccard"), pa.scalar(jaccard_threshold)))

    uniq = pairs.groupby(["doc_a", "doc_b"]).count()
    return uniq.map_batches(verify, batch_format="pyarrow")


# -------------------------------------------------------------- simhash
def simhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id"):
    """64-bit SimHash per doc: sign of per-bit weighted sums of token
    hashes. Returns (id, simhash) Dataset."""

    def body(batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(pc.cast(batch.column(text_col), pa.string())).to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        bit_idx = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            hs = np.fromiter((hash64_str(w) for w in set(toks)), dtype=np.uint64)
            bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            out[i] = np.uint64(
                np.sum((v > 0).astype(np.uint64) << bit_idx, dtype=np.uint64)
            )
        return pa.table(
            {id_col: batch.column(id_col), "simhash": pa.array(out.view(np.int64))}
        )

    return ds.map_batches(body, batch_format="pyarrow")


# ------------------------------------------------------- ngram jaccard
def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Word n-gram Jaccard between two documents (exact verifier used on
    candidate pairs)."""
    def grams(t):
        toks = (t or "").split()
        return set(tuple(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1)))

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / len(ga | gb)


# ------------------------------------------- embedding cosine near-dup
def embedding_neardup_pairs(
    ds,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Sign-LSH bucketing (random hyperplanes) → within-bucket exact
    cosine. Pairs with cosine ≥ threshold, doc_a < doc_b. Recall is
    bucket-bounded (near-identical vectors share all signs w.h.p.)."""

    def bucketize(batch: pa.Table, planes: np.ndarray) -> pa.Table:
        V = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        nrm = np.linalg.norm(V, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        Vn = V / nrm
        signs = (Vn @ planes.T) > 0  # (n, planes)
        bucket = np.zeros(len(V), dtype=np.int64)
        for j in range(planes.shape[0]):
            bucket = (bucket << 1) | signs[:, j].astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(bucket),
                "vec": pa.array(list(Vn), pa.list_(pa.float64())),
            }
        )

    rng = np.random.Generator(np.random.PCG64(seed))
    dim = len(ds.take(1)[0][vec_col])
    planes = rng.standard_normal((n_planes, dim))

    import functools

    bucketed = ds.map_batches(
        functools.partial(bucketize, planes=planes), batch_format="pyarrow"
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "cosine": []})
        ids = g[id_col].to_numpy()
        V = np.asarray(list(g["vec"]), dtype=np.float64)
        order = np.argsort(ids)
        ids, V = ids[order], V[order]
        S = V @ V.T
        ia, ib = np.triu_indices(len(ids), k=1)
        m = S[ia, ib] >= threshold
        return pd.DataFrame(
            {"doc_a": ids[ia][m], "doc_b": ids[ib][m], "cosine": S[ia, ib][m]}
        )

    return bucketed.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")
