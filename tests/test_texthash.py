"""Property tests for the vectorized hash core (ops/texthash.py):
every batch kernel must agree with a trivial per-row reference
implementation, including on sliced / chunked / null-bearing / unicode
Arrow arrays (the shapes Ray Data actually delivers to map_batches)."""

import numpy as np
import pyarrow as pa
import pytest

from etl_warehouse_agnostic_ray.ops import texthash as TH

B = TH.POLY_B


def ref_poly(s: str | None) -> int:
    """Per-row reference: Σ byte·B^(L-1-j) mod 2^64."""
    if not s:
        return 0
    h = 0
    for by in s.encode("utf-8"):
        h = (h * int(B) + by) % (1 << 64)
    return h


def ref_lower(s: str) -> str:
    """Per-character (context-free) lowercase — matches utf8proc /
    DuckDB ``lower()``, which the engine's Arrow kernels use. Python's
    str.lower() diverges on context-sensitive Greek final sigma
    (word-final Σ → ς; utf8proc always gives σ)."""
    return "".join(c.lower() for c in s)


def ref_simhash(s: str | None) -> int:
    toks = set(ref_lower(s or "").split())
    if not toks:
        return 0
    out = 0
    for b in range(64):
        v = sum(1 if (ref_poly(t) >> b) & 1 else -1 for t in toks)
        if v > 0:
            out |= 1 << b
    return out


def ref_shingles(s: str | None, k: int = 5) -> set[int]:
    toks = (s or "").split()
    if not toks:
        return set()
    th = [ref_poly(t) for t in toks]
    th += [0] * max(0, k - len(th))
    out = set()
    for i in range(len(th) - k + 1):
        acc = 0
        for j in range(k):
            acc = (acc * int(B) + th[i + j]) % (1 << 64)
        out.add(acc)
    return out


CASES = [
    "hello world",
    "",
    None,
    "  leading and trailing   ",
    "one",
    "a b c d e f g h",
    "ünicøde tøkens 文章 here",
    "tabs\tand\nnewlines mixed   spaces",
    "x" * 3000,
    "short doc",
    "repeat repeat repeat repeat repeat repeat",
]


def _variants(values):
    """The same logical column as: plain, sliced, and chunked arrays."""
    plain = pa.array(values, pa.large_string())
    padded = pa.array(["PAD1", *values, "PAD2"], pa.large_string())
    sliced = padded.slice(1, len(values))
    half = len(values) // 2
    chunked = pa.chunked_array(
        [pa.array(values[:half], pa.large_string()),
         pa.array(values[half:], pa.large_string())]
    )
    small = pa.array(values, pa.string())  # 32-bit offsets
    return {"plain": plain, "sliced": sliced, "chunked": chunked, "string32": small}


@pytest.mark.parametrize("shape", ["plain", "sliced", "chunked", "string32"])
def test_poly_hash_matches_reference(shape):
    arr = _variants(CASES)[shape]
    got = TH.poly_hash_array(arr)
    want = [ref_poly(v) for v in CASES]
    assert [int(g) for g in got] == want


@pytest.mark.parametrize("shape", ["plain", "sliced", "chunked"])
def test_simhash_matches_reference(shape):
    arr = _variants(CASES)[shape]
    got = TH.simhash_batch(arr)
    want = [ref_simhash(v) for v in CASES]
    assert [int(g) for g in got] == want


def test_shingles_match_reference():
    vals, segs, starts = TH.shingle_hashes(pa.array(CASES, pa.large_string()), k=5)
    for i, c in enumerate(CASES):
        got = set(int(v) for v in vals[starts[i] : starts[i + 1]])
        assert got == ref_shingles(c, 5), f"case {i}: {c!r}"


def test_minhash_identical_docs_equal_sigs_random():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    docs = [" ".join(rng.choice(vocab, 30)) for _ in range(20)]
    docs += docs[:5]  # exact dups
    from etl_warehouse_agnostic_ray.pipelines.hash_sql import minhash_perms

    a, b = minhash_perms(64, 13)
    sigs = TH.minhash_batch(pa.array(docs, pa.large_string()), a, b, k=5)
    for i in range(5):
        assert (sigs[i] == sigs[20 + i]).all()
    # distinct docs overwhelmingly differ
    assert not (sigs[0] == sigs[1]).all()


def test_minhash_perm_chunking_invariant():
    from etl_warehouse_agnostic_ray.pipelines.hash_sql import minhash_perms

    a, b = minhash_perms(64, 13)
    arr = pa.array(CASES, pa.large_string())
    full = TH.minhash_batch(arr, a, b, k=5, perm_chunk=64)
    chunked = TH.minhash_batch(arr, a, b, k=5, perm_chunk=7)
    assert (full == chunked).all()


def test_tokenize_ws_matches_python_split():
    arr = pa.array(CASES, pa.large_string())
    flat, offs = TH.tokenize_ws(arr)
    toks = flat.to_pylist()
    for i, c in enumerate(CASES):
        assert toks[offs[i] : offs[i + 1]] == (c or "").split()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.text(max_size=200)),
            min_size=1,
            max_size=30,
        )
    )
    def test_poly_hash_fuzz(values):
        arr = pa.array(values, pa.large_string())
        got = [int(g) for g in TH.poly_hash_array(arr)]
        assert got == [ref_poly(v) for v in values]

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            # cap the alphabet below exotic case-mapping territory where
            # utf8proc (Arrow) and Python str.lower could diverge
            st.one_of(
                st.none(),
                # exclude U+0130 İ: utf8proc simple-maps it to 'i',
                # Python full-maps to 'i'+combining-dot — the one
                # cp ≤ 0x4FF where even per-char lowering diverges
                st.text(
                    alphabet=st.characters(
                        max_codepoint=0x04FF, exclude_characters="İ"
                    ),
                    max_size=120,
                ),
            ),
            min_size=1,
            max_size=12,
        )
    )
    def test_simhash_fuzz(values):
        arr = pa.array(values, pa.large_string())
        got = [int(g) for g in TH.simhash_batch(arr)]
        assert got == [ref_simhash(v) for v in values]
except ImportError:  # pragma: no cover
    pass


def test_sorted_run_pairs_vs_bruteforce():
    """The shared bucket-pair enumerator must equal the brute-force
    per-bucket triu across random multi-key inputs, including caps."""
    from etl_warehouse_agnostic_ray.ops.dedup import _sorted_run_pairs

    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(0, 200))
        k1 = rng.integers(0, 6, n)
        k2 = rng.integers(0, 4, n)
        ids = rng.permutation(10_000)[:n].astype(np.int64)
        cap = int(rng.integers(2, 12))
        ia, ib, _, dropped = _sorted_run_pairs([k1, k2], ids, cap)
        got = set(zip(ids[ia], ids[ib]))
        want = set()
        want_drop = 0
        import itertools

        for key in set(zip(k1, k2)):
            bucket = sorted(
                ids[i] for i in range(n) if (k1[i], k2[i]) == key
            )
            want_drop += max(0, len(bucket) - cap)
            for a, b in itertools.combinations(bucket[:cap], 2):
                want.add((a, b))
        assert got == want, f"trial {trial}"
        assert dropped == want_drop
        assert all(a < b for a, b in got)


def test_popcount64():
    x = np.array([0, 1, 0xFFFFFFFFFFFFFFFF, 0x8000000000000001], dtype=np.uint64)
    assert list(TH.popcount64(x)) == [0, 1, 64, 2]


def test_list_col_to_matrix_shapes():
    col = pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float64()))
    m = TH.list_col_to_matrix(col)
    assert m.shape == (2, 2) and m[1, 0] == 3.0
    ch = pa.chunked_array([col, col])
    assert TH.list_col_to_matrix(ch).shape == (4, 2)
