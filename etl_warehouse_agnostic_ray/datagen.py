"""Deterministic synthetic data generators (pure functions of (seed, n)).

Produces the two engine inputs per FIXTURES.md:
- F1 ``pages``: base web-page snapshots (url, warc_ts, html, text, lang)
- F2 ``change_events``: WAL/binlog-shaped stream with zipf-hot keys,
  out-of-order event times, ties on (url, warc_ts), ~2% duplicate
  deliveries and interleaved schema-change ops.

The ``text`` of every (url, lsn) is a deterministic token stream so
byte-identical-text-per-url is checkable after any replay (FIXTURES.md
"Oracle / invariants" #2). No external data; numpy PCG64 seeded.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schemas import CHANGE_EVENT_SCHEMA, PAGES_SCHEMA

_VOCAB = np.array(
    (
        "the of and to a in data web page crawl text hash merge key value "
        "stream event change table lake row batch shuffle arrow ray block "
        "index quick brown fox jumps lazy dog alpha beta gamma delta news "
        "shop wiki blog forum cloud edge graph node link title body head"
    ).split()
)

_EPOCH_US = np.int64(1_704_067_200_000_000)  # 2024-01-01T00:00:00 in us


def _urls(n_urls: int) -> np.ndarray:
    """Deterministic key space: mixed-length urls incl. unicode and a few
    very long paths (>2KB), per FIXTURES.md F1."""
    idx = np.arange(n_urls)
    domains = np.char.add("https://site-", np.char.mod("%03d", idx % 97))
    urls = np.char.add(np.char.add(domains, ".example/p/"), np.char.mod("%d", idx))
    urls = urls.astype(object)
    if n_urls > 10:
        urls[7] = urls[7] + "/ünicøde/文章"
        urls[3] = urls[3] + "/" + "x" * 2100  # >2KB url
    return np.asarray(urls, dtype=object)


def _texts(rng_rows: np.ndarray, n_tokens: int = 24) -> list[str]:
    """One deterministic token stream per row seed (vectorized draw)."""
    # rng_rows: per-row uint64 seeds -> index matrix into vocab
    m = len(_VOCAB)
    # simple splitmix-ish expansion, fully vectorized and stable
    seeds = rng_rows.astype(np.uint64)
    cols = []
    x = seeds.copy()
    for _ in range(n_tokens):
        x = (x * np.uint64(6364136223846793005) + np.uint64(1442695040888963407))
        cols.append(((x >> np.uint64(33)) % np.uint64(m)).astype(np.int64))
    # single-pass vectorized join via Arrow (np.char.add and per-row
    # Python joins both measured 10-40× slower at 10^6+ rows)
    import pyarrow.compute as _pc

    dict_cols = [
        pa.DictionaryArray.from_arrays(pa.array(c), pa.array(_VOCAB)).dictionary_decode()
        for c in cols
    ]
    joined = _pc.binary_join_element_wise(*dict_cols, pa.scalar(" "))
    return joined.to_pylist()


def _row_seed(urls: np.ndarray, lsns: np.ndarray) -> np.ndarray:
    """Stable per-row seed from (url hash, lsn) — vectorized via pandas'
    fixed-key siphash (process/machine independent)."""
    import pandas as pd

    h = pd.util.hash_pandas_object(pd.Series(urls, dtype="object"), index=False).to_numpy()
    return h.astype(np.uint64) ^ (lsns.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))


def hash_str64(s: str) -> int:
    """Deterministic 64-bit FNV-1a over utf-8 (process-independent)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def gen_pages(n_urls: int, seed: int = 42) -> pa.Table:
    """Initial lake snapshot: one row per url at version lsn=-1 era."""
    urls = _urls(n_urls)
    rng = np.random.Generator(np.random.PCG64(seed))
    ts = _EPOCH_US + rng.integers(0, 86_400_000_000, n_urls)
    seeds = _row_seed(urls, np.zeros(n_urls, dtype=np.int64))
    texts = _texts(seeds)
    tb = np.asarray(texts, dtype=np.bytes_)
    html = np.char.add(np.char.add(b"<html>", tb), b"</html>").tolist()
    langs = rng.choice(np.array(["en", "de", "fr", "es", "zz"], dtype=object), n_urls)
    langs = langs.astype(object)
    langs[rng.random(n_urls) < 0.05] = None
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts).cast(pa.timestamp("us")),
            "html": pa.array(html, pa.large_binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def gen_change_events(
    n_events: int,
    n_urls: int,
    seed: int = 42,
    dup_frac: float = 0.02,
    schema_change_frac: float = 0.002,
    zipf_a: float = 1.1,
    lookback_us: int = 1_800_000_000,  # 30 min out-of-order window
) -> pa.Table:
    """WAL-shaped stream. lsn strictly increasing & gap-free for original
    events; a dup_frac tail of re-delivered (identical) events is appended
    then interleaved, mirroring the reference's watermark-lookback
    redelivery (config/sources/repsly.yml:48)."""
    rng = np.random.Generator(np.random.PCG64(seed + 1))
    urls_pool = _urls(n_urls)
    lsn = np.arange(n_events, dtype=np.int64)

    # zipf-hot key choice, clipped into the pool
    zipf_draw = rng.zipf(zipf_a, n_events) - 1
    key_idx = zipf_draw % n_urls
    urls = urls_pool[key_idx]

    # event time: monotone-ish base + jitter within lookback; coarse
    # rounding on 10% of rows manufactures (url, warc_ts) ties so the
    # lsn tie-break is exercised (FIXTURES.md F2).
    base = _EPOCH_US + 86_400_000_000 + lsn * np.int64(1_000_000)
    jitter = rng.integers(-lookback_us, lookback_us, n_events)
    ts = base + jitter
    coarse = rng.random(n_events) < 0.10
    ts[coarse] = (ts[coarse] // np.int64(3_600_000_000)) * np.int64(3_600_000_000)

    op = np.where(
        rng.random(n_events) < 0.08,
        "delete",
        np.where(rng.random(n_events) < 0.333, "insert", "update"),
    ).astype(object)

    # interleave schema-change ops at deterministic lsns
    n_schema = max(0, int(n_events * schema_change_frac))
    schema_ops = [
        ("add", "fetch_status", "int32"),
        ("widen", "fetch_status", "int64"),
        ("rename", "lang", "language"),
    ]
    schema_kind = np.full(n_events, None, dtype=object)
    schema_column = np.full(n_events, None, dtype=object)
    schema_type = np.full(n_events, None, dtype=object)
    if n_schema:
        pos = np.linspace(n_events // 10, n_events - 2, num=min(n_schema, 3), dtype=np.int64)
        for i, p in enumerate(pos):
            k, c, t = schema_ops[i % len(schema_ops)]
            op[p] = "schema_change"
            schema_kind[p], schema_column[p], schema_type[p] = k, c, t
    add_lsn = int(pos[0]) if n_schema else None

    seeds = _row_seed(urls, lsn)
    texts = np.asarray(_texts(seeds), dtype=object)
    tb = texts.astype(np.bytes_)
    html = np.char.add(np.char.add(b"<html>", tb), b"</html>").astype(object)
    langs = np.asarray(rng.choice(["en", "de", "fr", "es", "zz"], n_events), dtype=object)
    fetch_status = np.full(n_events, None, dtype=object)
    if add_lsn is not None:
        after = lsn > add_lsn
        fetch_status[after] = (200 + (lsn[after] % 5) * 100).astype(object)

    # null out payload for delete / schema_change ops (FIXTURES.md F2)
    blank = (op == "delete") | (op == "schema_change")
    texts = texts.copy()
    texts[blank] = None
    html[blank] = None
    langs[blank] = None
    fetch_status[blank] = None

    cols = {
        "lsn": lsn,
        "op": op,
        "url": urls.copy(),
        "warc_ts": ts,
        "html": html,
        "text": texts,
        "lang": langs,
        "fetch_status": fetch_status,
        "schema_kind": schema_kind,
        "schema_column": schema_column,
        "schema_type": schema_type,
    }

    # duplicate deliveries: repeat rows with identical content incl. lsn,
    # re-delivered shortly AFTER their original (bounded redelivery lag) —
    # the stream stays LSN-ordered modulo that lag, as a WAL replay with
    # lookback overlap would be (FIXTURES.md F2; repsly.yml:48 lookback).
    n_dup = int(n_events * dup_frac)
    if n_dup:
        dup_idx = rng.choice(n_events, n_dup, replace=False)
        dup_idx = dup_idx[cols["op"][dup_idx] != "schema_change"]
        lag = max(2.0, n_events * 0.01)
        key = np.concatenate(
            [lsn.astype(np.float64), lsn[dup_idx] + rng.uniform(0.5, lag, len(dup_idx))]
        )
        order = np.argsort(key, kind="stable")
        for k, v in cols.items():
            ext = np.concatenate(
                [np.asarray(v, dtype=object), np.asarray(v, dtype=object)[dup_idx]]
            )
            cols[k] = ext[order]

    return pa.table(
        {
            "lsn": pa.array(cols["lsn"].astype(np.int64)),
            "op": pa.array(cols["op"], pa.string()),
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"].astype(np.int64)).cast(pa.timestamp("us")),
            "html": pa.array(list(cols["html"]), pa.large_binary()),
            "text": pa.array(cols["text"], pa.large_string()),
            "lang": pa.array(cols["lang"], pa.string()),
            "fetch_status": pa.array(cols["fetch_status"], pa.int32()),
            "schema_kind": pa.array(cols["schema_kind"], pa.string()),
            "schema_column": pa.array(cols["schema_column"], pa.string()),
            "schema_type": pa.array(cols["schema_type"], pa.string()),
        },
        schema=CHANGE_EVENT_SCHEMA,
    )


def write_fixture(
    out_dir: str,
    n_events: int,
    n_urls: int,
    seed: int = 42,
    n_files: int = 4,
    **kwargs,
) -> dict:
    """Write pages.parquet + an LSN-range-sliced change_events/ directory
    (the stream arrives as LSN-ordered file slices, SURVEY.md §2.1).
    Idempotent: skips if the _SUCCESS marker exists."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return {"dir": out_dir, "cached": True}
    os.makedirs(os.path.join(out_dir, "change_events"), exist_ok=True)
    pages = gen_pages(n_urls, seed=seed)
    pq.write_table(pages, os.path.join(out_dir, "pages.parquet"))
    events = gen_change_events(n_events, n_urls, seed=seed, **kwargs)
    # slice by row order (≈ lsn order modulo dup interleave) into n_files
    n = events.num_rows
    step = max(1, n // n_files)
    i = 0
    f = 0
    while i < n:
        sl = events.slice(i, step)
        pq.write_table(sl, os.path.join(out_dir, "change_events", f"events-{f:05d}.parquet"))
        i += step
        f += 1
    with open(marker, "w") as fh:
        fh.write("ok")
    return {"dir": out_dir, "cached": False, "n_events": n, "n_urls": n_urls}
