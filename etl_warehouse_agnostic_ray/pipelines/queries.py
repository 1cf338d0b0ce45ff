"""Driver-facing query registry: one entry per operator/pipeline from
SURVEY.md §2 (+ training-data ops), each with a DuckDB oracle where the
semantics are SQL-expressible.

Every callable takes ``sf_dir`` and returns a Dataset / pyarrow Table.
Column names are chosen to match the oracle SQL exactly (the driver
hashes values after sorting columns by name).

Ray is initialised by the caller (driver / bench / tests) — nothing
here calls ray.init().
"""

from __future__ import annotations

import functools
import math
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .. import functions as F
from ..datagen import write_fixture
from ..ops.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    simhash_neardup_pairs,
    simhash_signatures,
)
from ..ops.multimodal import DecodeImageBatch
from ..ops.similarity import topk_cosine
from ..ops.text import _LANG_PROFILES, doc_fingerprint, lang_id, quality_score, token_count
from . import hash_sql
from ..stages.explode import explode_json_array
from .cdc import CDCEngine

FIX_ROOT = "/tmp/graft_fix"

_SF_SIZES = {  # events, urls per sf tier
    "sf0.001": (2_000, 300),
    "sf0.01": (20_000, 3_000),
    "sf0.1": (200_000, 30_000),
}


def fixture_dir(sf_dir: str) -> str:
    """Deterministic input_hint-shaped fixture for this sf tier
    (pages.parquet + LSN-sliced change_events/, no schema ops so the
    DuckDB oracle can window over it), plus a forms.parquet for the
    JSON-explode operator. Idempotent."""
    name = os.path.basename(os.path.normpath(sf_dir))
    n_events, n_urls = _SF_SIZES.get(name, (20_000, 3_000))
    d = os.path.join(FIX_ROOT, name)
    write_fixture(d, n_events, n_urls, seed=42, schema_change_frac=0.0)
    forms_path = os.path.join(d, "forms.parquet")
    if not os.path.exists(forms_path):
        _write_forms(forms_path, n_rows=500)
    dirty_path = os.path.join(d, "dirty_records.parquet")
    if not os.path.exists(dirty_path):
        _write_dirty(dirty_path)
    images_path = os.path.join(d, "images.parquet")
    if not os.path.exists(images_path):
        _write_images(images_path)
    audio_path = os.path.join(d, "audio.parquet")
    if not os.path.exists(audio_path):
        _write_audio(audio_path)
    video_path = os.path.join(d, "video.parquet")
    if not os.path.exists(video_path):
        _write_video(video_path)
    urls_path = os.path.join(d, "urls.parquet")
    if not os.path.exists(urls_path):
        _write_urls(urls_path)
    pii_path = os.path.join(d, "pii.parquet")
    if not os.path.exists(pii_path):
        _write_pii(pii_path)
    return d


def _write_urls(path: str, n_rows: int = 300) -> None:
    """Dirty-URL fixture: every canonicalization edge case (mixed-case
    scheme/host, fragments, ports, userinfo, www, schemeless, null)."""
    variants = [
        "HTTPS://EXAMPLE.com/Path/Page?Q=CaseKept#frag",
        "http://WWW.Example.COM:8080/a/b#x",
        "https://user:pw@Sub.Host.ORG/deep?k=v",
        "ftp://Files.example.net/pub/",
        "example.com/no-scheme",
        "https://plain.example.io",
        "HTTP://trailing.example.de/path#",
        None,
    ]
    urls = [
        (f"{variants[i % len(variants)][:-1]}{i}"
         if variants[i % len(variants)] and i % 3 == 0
         else variants[i % len(variants)])
        for i in range(n_rows)
    ]
    pq.write_table(
        pa.table(
            {
                "url_id": pa.array(range(n_rows), pa.int64()),
                "url": pa.array(urls, pa.string()),
            }
        ),
        path,
    )


def _write_pii(path: str, n_rows: int = 400) -> None:
    """Web-page-ish fixture for PII redaction + repetition signals:
    emails/phones/IPv4 embedded in prose, repeated nav/footer lines
    (boilerplate), keyword-stuffed rows, clean rows, empties, nulls.
    Deterministic in i — no RNG."""
    rows: list[str | None] = []
    for i in range(n_rows):
        k = i % 8
        if k == 0:
            rows.append(
                f"nav home about contact\nnav home about contact\n"
                f"reach us at user{i}@example{i % 7}.com or "
                f"+1 555-{i % 900 + 100}-{1000 + i}\n"
                f"copyright footer {i % 3}\ncopyright footer {i % 3}"
            )
        elif k == 1:
            rows.append(
                f"server log: client 10.{i % 256}.{(i * 7) % 256}.{i % 250} "
                f"connected; admin{i}@host.example.org notified\n"
                f"status ok status ok status ok"
            )
        elif k == 2:
            rows.append(
                f"buy cheap buy cheap buy cheap widgets widgets widgets "
                f"call 555-{i % 900 + 100}-{2000 + i} now"
            )
        elif k == 3:
            rows.append(
                f"a clean paragraph about topic {i} with varied words "
                f"and no personal information at all."
            )
        elif k == 4:
            rows.append(
                f"mixed: {i}@not-an-email, ip 999.999.1.1 almost, "
                f"and a real one 192.168.{i % 100}.{i % 50} plus "
                f"sales.team+{i}@shop-{i % 5}.co.uk"
            )
        elif k == 5:
            rows.append("")
        elif k == 6:
            rows.append(None)
        else:
            rows.append(
                f"line one of doc {i}\nline two of doc {i}\n"
                f"line one of doc {i}\nunique tail {i * 31}"
            )
    pq.write_table(
        pa.table(
            {
                "rec_id": pa.array(range(n_rows), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        ),
        path,
    )


def _write_video(path: str, n_rows: int = 200) -> None:
    """Header-valid ISO-BMFF (MP4) blobs with truth columns (frame data
    would need an encoder; container metadata is a complete real
    parse), plus non-video and null payloads."""
    from ..ops.multimodal import tiny_mp4

    blobs, ts, dur, ws, hs = [], [], [], [], []
    for i in range(n_rows):
        scale = (600, 1000, 24000, 90000)[i % 4]
        d_units = 100 + (i * 131) % 100_000
        w = 160 + 16 * (i % 30)
        h = 90 + 9 * (i % 30)
        k = i % 5
        if k == 4:
            blob, scale, d_units, w, h = f"<html>no video {i}</html>".encode(), 0, 0, 0, 0
        elif k == 3:
            blob = tiny_mp4(timescale=scale, duration=d_units)  # audio-only: no track dims
            w = h = 0
        else:
            blob = tiny_mp4(timescale=scale, duration=d_units, width=w, height=h)
        if i % 31 == 0:
            blob, scale, d_units, w, h = None, 0, 0, 0, 0
        blobs.append(blob)
        ts.append(scale)
        dur.append(d_units)
        ws.append(w)
        hs.append(h)
    pq.write_table(
        pa.table(
            {
                "video_id": pa.array(range(n_rows), pa.int64()),
                "video": pa.array(blobs, pa.large_binary()),
                "true_timescale": pa.array(ts, pa.int64()),
                "true_duration": pa.array(dur, pa.int64()),
                "true_width": pa.array(ws, pa.int64()),
                "true_height": pa.array(hs, pa.int64()),
            }
        ),
        path,
    )


def _write_audio(path: str, n_rows: int = 200) -> None:
    """Real PCM WAV blobs (sine tones; WAV is uncompressed, so these are
    complete real audio files) with generation-time truth columns, plus
    non-audio and null payloads."""
    from ..ops.multimodal import tiny_wav

    blobs, rates, chans, frames = [], [], [], []
    for i in range(n_rows):
        rate = (8000, 16000, 22050, 44100)[i % 4]
        nf = 100 + (i * 97) % 4000
        ch = 1 + (i % 2)
        k = i % 5
        if k == 4:
            blob, rate, ch, nf = f"not audio {i}".encode(), 0, 0, 0
        else:
            blob = tiny_wav(sample_rate=rate, n_frames=nf, freq_hz=220.0 + i, channels=ch)
        if i % 23 == 0:
            blob, rate, ch, nf = None, 0, 0, 0
        blobs.append(blob)
        rates.append(rate)
        chans.append(ch)
        frames.append(nf)
    pq.write_table(
        pa.table(
            {
                "audio_id": pa.array(range(n_rows), pa.int64()),
                "audio": pa.array(blobs, pa.large_binary()),
                "true_sample_rate": pa.array(rates, pa.int64()),
                "true_channels": pa.array(chans, pa.int64()),
                "true_n_frames": pa.array(frames, pa.int64()),
            }
        ),
        path,
    )


def _write_images(path: str, n_rows: int = 300) -> None:
    """Real tiny image blobs (valid PNG/GIF, header-valid JPEG) with the
    generation-time truth columns the real-decode oracle compares
    against — plus non-image and null payloads for the unknown/none
    branches."""
    from ..ops.multimodal import tiny_gif, tiny_jpeg, tiny_png

    blobs, tw, th, tm = [], [], [], []
    for i in range(n_rows):
        w = 1 + (i * 37) % 480
        h = 1 + (i * 53) % 360
        k = i % 6
        if k == 0:
            blob, mode = tiny_png(w, h, color_type=2), "RGB"
        elif k == 1:
            blob, mode = tiny_png(w, h, color_type=6), "RGBA"
        elif k == 2:
            blob, mode = tiny_gif(w, h), "P"
        elif k == 3:
            blob, mode = tiny_jpeg(w, h, n_components=3), "RGB"
        elif k == 4:
            blob, mode = tiny_jpeg(w, h, n_components=1), "L"
        else:
            blob, w, h, mode = f"<html>not an image {i}</html>".encode(), 0, 0, "unknown"
        if i % 29 == 0:
            blob, w, h, mode = None, 0, 0, "none"
        blobs.append(blob)
        tw.append(w)
        th.append(h)
        tm.append(mode)
    pq.write_table(
        pa.table(
            {
                "img_id": pa.array(range(n_rows), pa.int64()),
                "image": pa.array(blobs, pa.large_binary()),
                "true_width": pa.array(tw, pa.int64()),
                "true_height": pa.array(th, pa.int64()),
                "true_mode": pa.array(tm, pa.string()),
            }
        ),
        path,
    )


def _write_forms(path: str, n_rows: int) -> None:
    import json

    form_ids, items = [], []
    for i in range(n_rows):
        form_ids.append(f"f{i:05d}")
        if i % 13 == 0:
            items.append(None)
        elif i % 10 == 0:
            items.append("not json {")
        else:
            arr = [
                {"Field": f"field_{j}", "Value": str((i * 7 + j) % 100)}
                for j in range(i % 4)
            ]
            items.append(json.dumps(arr))
    pq.write_table(
        pa.table({"form_id": pa.array(form_ids), "items": pa.array(items, pa.string())}),
        path,
    )



def _write_dirty(path: str, n_rows: int = 400) -> None:
    """F3 dirty_records fixture: every scalar-normalizer edge case."""
    ms = []
    nums, bools, lats, lons, emails, phones, notes = [], [], [], [], [], [], []
    ms_variants = [
        "/Date(1665059530000+0000)/", "/Date(1665059530000)/",
        "2023-04-06T10:30:00Z", "2023-04-06 10:30:00", "2023-04-06",
        "garbage", "", None,
    ]
    num_variants = ["42", "-7", "3.14", "NULL", "nan", "<NA>", "", "12abc", None]
    bool_variants = ["true", "1", "t", "yes", "false", "0", "no", "None", None]
    lat_variants = ["40.7", "91", "-91", "0", "abc", "-89.9", None]
    lon_variants = ["-74.0", "181", "0", "179.9", "x", None]
    email_variants = ["A.User@Example.COM", "bad@", "x@y.zz", "", None]
    phone_variants = ["(555) 123-4567", "15551234567", "555123", "5551234567", None]
    note_variants = ["a\r\nb\t c   d ", "  trim me  ", "", None]
    for i in range(n_rows):
        ms.append(ms_variants[i % len(ms_variants)])
        nums.append(num_variants[i % len(num_variants)])
        bools.append(bool_variants[i % len(bool_variants)])
        lats.append(lat_variants[i % len(lat_variants)])
        lons.append(lon_variants[i % len(lon_variants)])
        emails.append(email_variants[i % len(email_variants)])
        phones.append(phone_variants[i % len(phone_variants)])
        notes.append(note_variants[i % len(note_variants)])
    pq.write_table(
        pa.table(
            {
                "row_id": pa.array(list(range(n_rows)), pa.int64()),
                "ms_json_date": pa.array(ms, pa.string()),
                "num_str": pa.array(nums, pa.string()),
                "bool_str": pa.array(bools, pa.string()),
                "lat": pa.array(lats, pa.string()),
                "lon": pa.array(lons, pa.string()),
                "email": pa.array(emails, pa.string()),
                "phone": pa.array(phones, pa.string()),
                "note": pa.array(notes, pa.string()),
            }
        ),
        path,
    )


def _round2(batch: pa.Table, cols: list[str]) -> pa.Table:
    for c in cols:
        batch = batch.set_column(
            batch.column_names.index(c),
            c,
            pc.round(
                pc.cast(batch.column(c), pa.float64()),
                ndigits=2,
                round_mode="half_towards_infinity",
            ),
        )
    return batch


def _rd():
    import ray.data as rd

    return rd


def _coarse_pk(key_col: str):
    """map_batches fn appending ``pk = key & 255`` — the coarse hash
    co-partitioning shared by every per-key window / journey query
    (256 groups keeps the per-group vectorized pass large while giving
    the scheduler ample parallelism at any cluster size)."""

    def fn(b: pa.Table) -> pa.Table:
        return b.append_column(
            "pk", pc.bit_wise_and(b.column(key_col), pa.scalar(255, pa.int64()))
        )

    return fn



# ===================================================================
# CDC pipelines (the engine itself)
# ===================================================================


def q_cdc_events_lww(sf_dir: str):
    """Full engine run over a WAL mapped from the ``events`` table:
    lsn=event_id, key=user_id, version-ts=ts, delete when
    event_type='error'. Exercises read→normalize→shuffle→LWW-merge→
    commit→read-back (SURVEY.md §2.8 exact LWW dedup)."""
    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet")

    def to_wal(b: pa.Table) -> pa.Table:
        op = pc.if_else(
            pc.equal(b.column("event_type"), pa.scalar("error")),
            pa.scalar("delete"),
            pa.scalar("update"),
        )
        return pa.table(
            {
                "lsn": b.column("event_id"),
                "op": op,
                "url": pc.cast(b.column("user_id"), pa.string()),
                "warc_ts": b.column("ts"),
                "text": pc.cast(b.column("props"), pa.large_string()),
                "lang": b.column("event_type"),
            }
        )

    wal = ev.map_batches(to_wal, batch_format="pyarrow")
    root = tempfile.mkdtemp(prefix="lake_events_", dir="/tmp")
    try:
        eng = CDCEngine(root, num_partitions=16)
        eng.init_empty()
        eng.apply(wal, batch_id="events-replay")
        t = eng.lake.to_arrow(include_lineage=True)
        t = t.select(["url", "warc_ts", "text", "lang", "_lsn"]).rename_columns(
            ["url", "warc_ts", "text", "lang", "lsn"]
        )
        return t
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_CDC_EVENTS_LWW = """
WITH ranked AS (
  SELECT CAST(user_id AS VARCHAR) AS url, ts AS warc_ts, props AS text,
         event_type AS lang, event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS op,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT url, warc_ts, text, lang, lsn FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def q_cdc_pages_replay(sf_dir: str):
    """Flagship: input_hint-shaped pages + change stream → lake upsert,
    returning the final logical table (minus html for compare size)."""
    d = fixture_dir(sf_dir)
    root = tempfile.mkdtemp(prefix="lake_pages_", dir="/tmp")
    try:
        eng = CDCEngine(root, num_partitions=16)
        eng.bootstrap(os.path.join(d, "pages.parquet"))
        eng.apply(os.path.join(d, "change_events"), batch_id="replay")
        return eng.lake.to_arrow(columns=["url", "warc_ts", "text", "lang"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_CDC_PAGES_REPLAY = f"""
WITH unioned AS (
  SELECT url, warc_ts, text, lang, CAST(-1 AS BIGINT) AS lsn, 'insert' AS op
  FROM read_parquet('{FIX_ROOT}/sf0.01/pages.parquet')
  UNION ALL
  SELECT url, warc_ts, text, lang, lsn, op
  FROM read_parquet('{FIX_ROOT}/sf0.01/change_events/*.parquet')
  WHERE op <> 'schema_change'
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
  FROM unioned)
SELECT url, warc_ts, text, lang FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def q_cdc_schema_evolution(sf_dir: str):
    """Engine run over a stream WITH interleaved add/widen/rename ops
    (the fixture's deterministic DDL: add fetch_status int32 → widen to
    int64 → rename lang→language). Returns the final logical DATA —
    verified against a DuckDB oracle that replays the same DDL + LWW
    window over the raw stream (VERDICT r1 task 1c: data-level oracle
    instead of a rows-only schema listing)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    n_events, n_urls = _SF_SIZES.get(name, (20_000, 3_000))
    d = os.path.join(FIX_ROOT, name + "_schema")
    write_fixture(d, n_events, n_urls, seed=43, schema_change_frac=0.002)
    root = tempfile.mkdtemp(prefix="lake_schema_", dir="/tmp")
    try:
        eng = CDCEngine(root, num_partitions=8)
        eng.bootstrap(os.path.join(d, "pages.parquet"))
        eng.apply(os.path.join(d, "change_events"), batch_id="replay")
        return eng.lake.to_arrow(
            columns=["url", "warc_ts", "text", "language", "fetch_status"]
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_CDC_SCHEMA_EVOLUTION = f"""
WITH unioned AS (
  SELECT url, warc_ts, text, lang AS language, CAST(NULL AS BIGINT) AS fetch_status,
         CAST(-1 AS BIGINT) AS lsn, 'insert' AS op
  FROM read_parquet('{FIX_ROOT}/sf0.01_schema/pages.parquet')
  UNION ALL
  SELECT url, warc_ts, text, lang AS language, CAST(fetch_status AS BIGINT), lsn, op
  FROM read_parquet('{FIX_ROOT}/sf0.01_schema/change_events/*.parquet')
  WHERE op <> 'schema_change'
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
  FROM unioned)
SELECT url, warc_ts, text, language, fetch_status
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


_SCRATCH_ROOTS: list[str] = []


def _scratch_dir(prefix: str) -> str:
    """mkdtemp registered for atexit cleanup. Memoized lakes / indexes
    (and the per-call incremental-dedup scratch) outlive their query by
    design; without the registration, repeated bench/correctness sweeps
    accumulate full lake copies and IVF indexes in /tmp across
    processes (ADVICE r4)."""
    root = tempfile.mkdtemp(prefix=prefix, dir="/tmp")
    _SCRATCH_ROOTS.append(root)
    return root


def _cleanup_scratch() -> None:
    for r in _SCRATCH_ROOTS:
        shutil.rmtree(r, ignore_errors=True)


import atexit  # noqa: E402  (placed with the machinery it serves)

atexit.register(_cleanup_scratch)


_MOR_LAKE_CACHE: dict[str, str] = {}


def _mor_lake(sf_dir: str) -> "CDCEngine":
    """Drain the fixture WAL into a merge-on-read lake as 1-file
    micro-batches (the commit-per-micro-batch regime both MOR queries
    measure), memoized per fixture dir: the drained lake is read-only
    to its consumers, so the second query in a sweep reopens instead
    of re-paying the ~64-commit drain. P sized so a single WAL-file
    micro-batch stays under the big-delta footer shortcut (512·P) at
    every sf tier — the shortcut correctly forces cow for table-sized
    batches, and these queries' purpose is the small-batch delta
    regime."""
    d = fixture_dir(sf_dir)
    root = _MOR_LAKE_CACHE.get(d)
    if root is not None and os.path.isdir(root):
        return CDCEngine(
            root, num_partitions=128, delta_max_files=64, delta_max_ratio=1e9
        )
    root = _scratch_dir("lake_mor_")
    eng = CDCEngine(
        root, num_partitions=128, delta_max_files=64, delta_max_ratio=1e9
    )
    eng.bootstrap(os.path.join(d, "pages.parquet"))
    eng.apply_stream(
        os.path.join(d, "change_events"), max_files_per_batch=1, mode="delta"
    )
    if eng.lake.stats()["delta_files"] == 0:
        raise RuntimeError("merge-on-read path was not exercised")
    _MOR_LAKE_CACHE[d] = root
    return eng


def q_cdc_delta_replay(sf_dir: str):
    """The flagship replay in MERGE-ON-READ mode: the WAL is drained in
    single-file micro-batches with ``apply(mode="delta")`` — each apply
    writes only O(delta) bytes as per-partition side files, never
    rewriting the base — and the final table is produced by the
    distributed merge-on-read reader (one task per partition folds
    base ∪ deltas in place, no shuffle). Verified value-for-value
    against the SAME LWW oracle as the copy-on-write replay: LWW
    associativity makes the deferred fold equivalent."""
    eng = _mor_lake(sf_dir)
    return (
        eng.lake.dataset(columns=["url", "warc_ts", "text", "lang"])
        .to_pandas()
    )


SQL_CDC_DELTA_REPLAY = SQL_CDC_PAGES_REPLAY  # identical final state by contract


def q_point_lookup_pages(sf_dir: str):
    """Point lookups against the merge-on-read lake: each key routes to
    exactly ONE partition (hash routing from the manifest) and pushes a
    ``url =`` predicate into the base + delta reads (row-group pruning)
    — never a scan. Keys: the 8 lexicographically-smallest snapshot
    urls; LWW-deleted ones must come back empty."""
    d = fixture_dir(sf_dir)
    eng = _mor_lake(sf_dir)
    import pyarrow.parquet as pq

    pages = pq.read_table(os.path.join(d, "pages.parquet"), columns=["url"])
    keys = sorted(set(pages.column("url").to_pylist()))[:8]
    hits = [eng.lake.lookup(u) for u in keys]
    return pa.concat_tables(hits).select(["url", "warc_ts", "text", "lang"])


SQL_POINT_LOOKUP_PAGES = f"""
WITH unioned AS (
  SELECT url, warc_ts, text, lang, CAST(-1 AS BIGINT) AS lsn, 'insert' AS op
  FROM read_parquet('{FIX_ROOT}/sf0.01/pages.parquet')
  UNION ALL
  SELECT url, warc_ts, text, lang, lsn, op
  FROM read_parquet('{FIX_ROOT}/sf0.01/change_events/*.parquet')
  WHERE op <> 'schema_change'
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
  FROM unioned)
SELECT url, warc_ts, text, lang FROM ranked
WHERE rn = 1 AND op <> 'delete'
  AND url IN (
    SELECT url FROM (
      SELECT DISTINCT url FROM read_parquet('{FIX_ROOT}/sf0.01/pages.parquet')
      ORDER BY url LIMIT 8))
"""


def _stream_halves(d: str) -> tuple[list[str], list[str]]:
    """The fixture's LSN-sliced WAL files split into two apply batches
    (first half / second half of the deterministic 4-file layout)."""
    cdir = os.path.join(d, "change_events")
    files = sorted(
        os.path.join(cdir, f) for f in os.listdir(cdir) if f.endswith(".parquet")
    )
    mid = len(files) // 2
    return files[:mid], files[mid:]


def q_time_travel_pages(sf_dir: str):
    """Versioned-lake time travel: bootstrap → apply half the WAL (v₁)
    → apply the rest (v₂), then read the table AS OF v₁ *after* v₂ has
    committed — the lakehouse snapshot-isolation read (manifest pins
    the file set; newer commits never mutate old versions' files, so
    the old state is byte-stable until vacuum). The reference has no
    equivalent (ClickHouse tables are mutate-in-place); this is the
    capability its `system.parts` + backup dance approximates."""
    d = fixture_dir(sf_dir)
    first, rest = _stream_halves(d)
    root = tempfile.mkdtemp(prefix="lake_tt_", dir="/tmp")
    try:
        eng = CDCEngine(root, num_partitions=16)
        eng.bootstrap(os.path.join(d, "pages.parquet"))
        eng.apply(first, batch_id="tt-half-1")
        v1 = eng.lake.current_version()
        eng.apply(rest, batch_id="tt-half-2")
        assert eng.lake.current_version() > v1
        return eng.lake.to_arrow(
            version=v1, columns=["url", "warc_ts", "text", "lang"]
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


_DIFF_LAKE_CACHE: dict[str, tuple[str, int]] = {}


def _diff_lake(sf_dir: str) -> tuple["CDCEngine", int]:
    """Two-version lake for the snapshot diff (bootstrap → half the
    WAL = v₁ → the rest = v₂), memoized per fixture dir under the
    atexit-cleaned scratch root — the same disclosed read-only-reuse
    pattern as ``_mor_lake``; the first call in a process still pays
    the full build."""
    d = fixture_dir(sf_dir)
    hit = _DIFF_LAKE_CACHE.get(d)
    if hit is not None and os.path.isdir(hit[0]):
        return CDCEngine(hit[0], num_partitions=16), hit[1]
    first, rest = _stream_halves(d)
    root = _scratch_dir("lake_diff_")
    eng = CDCEngine(root, num_partitions=16)
    eng.bootstrap(os.path.join(d, "pages.parquet"))
    eng.apply(first, batch_id="sd-half-1")
    v1 = eng.lake.current_version()
    eng.apply(rest, batch_id="sd-half-2")
    _DIFF_LAKE_CACHE[d] = (root, v1)
    return eng, v1


def q_snapshot_diff_pages(sf_dir: str):
    """Version-to-version snapshot diff (the lakehouse audit query):
    classify every url as added / removed / changed between v₁ (half
    the WAL applied) and v₂ (all of it), without ever joining the two
    snapshots through a shuffle of payloads. Each side streams through
    the SAME versioned lake reader as time travel, reduced map-side to
    (url, flags, warc_ts-int, payload-hash) rows — the wide text/html
    never rides the exchange — then ONE grouped Max per url merges the
    two sides (keys are unique per snapshot) and a vectorized
    classifier keeps only the difference rows. Payload equality is a
    poly64 over text⊕lang with a null sentinel; the oracle compares
    the raw columns with IS DISTINCT FROM — same classification,
    value-verified."""
    from ray.data.aggregate import Max

    from ..ops.texthash import poly_hash_array

    eng, v1 = _diff_lake(sf_dir)
    cols = ["url", "warc_ts", "text", "lang"]
    MIN64 = np.iinfo(np.int64).min

    def tag(is_a: bool):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            ts = (
                b.column("warc_ts")
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .view("int64")
            )
            txt = pc.fill_null(pc.cast(b.column("text"), pa.large_string()), "\x00")
            lng = pc.fill_null(pc.cast(b.column("lang"), pa.large_string()), "\x00")
            h = poly_hash_array(
                pc.binary_join_element_wise(
                    txt, lng, pa.scalar("\x01", pa.large_string())
                )
            ).view(np.int64)
            absent = np.full(n, MIN64, dtype=np.int64)
            one = np.ones(n, dtype=np.int64)
            zero = np.zeros(n, dtype=np.int64)
            return pa.table(
                {
                    "url": b.column("url"),
                    "in_a": pa.array(one if is_a else zero),
                    "in_b": pa.array(zero if is_a else one),
                    "wa": pa.array(ts if is_a else absent),
                    "wb": pa.array(absent if is_a else ts),
                    "ha": pa.array(h if is_a else absent),
                    "hb": pa.array(absent if is_a else h),
                }
            )

        return fn

    va = eng.lake.dataset(version=v1, columns=cols).map_batches(
        tag(True), batch_format="pyarrow"
    )
    vb = eng.lake.dataset(columns=cols).map_batches(
        tag(False), batch_format="pyarrow"
    )

    def classify(b: pa.Table) -> pa.Table:
        ina = b.column("in_a").to_numpy(zero_copy_only=False) == 1
        inb = b.column("in_b").to_numpy(zero_copy_only=False) == 1
        wa = b.column("wa").to_numpy(zero_copy_only=False)
        wb = b.column("wb").to_numpy(zero_copy_only=False)
        ha = b.column("ha").to_numpy(zero_copy_only=False)
        hb = b.column("hb").to_numpy(zero_copy_only=False)
        changed = ina & inb & ((wa != wb) | (ha != hb))
        label = np.where(
            ~ina, "added", np.where(~inb, "removed", "changed")
        ).astype(object)
        keep = changed | (ina ^ inb)
        return pa.table(
            {
                "url": b.column("url").filter(pa.array(keep)),
                "change": pa.array(label[keep], pa.string()),
            }
        )

    out = (
        va.union(vb)
        .groupby("url")
        .aggregate(
            *[
                Max(c, alias_name=c)
                for c in ("in_a", "in_b", "wa", "wb", "ha", "hb")
            ]
        )
        .map_batches(classify, batch_format="pyarrow")
    )
    # materialize before the lake dir is removed (lazy lineage)
    return pa.concat_tables(out.iter_batches(batch_format="pyarrow"))


SQL_SNAPSHOT_DIFF_PAGES = f"""
WITH u1 AS (
  SELECT url, warc_ts, text, lang, CAST(-1 AS BIGINT) AS lsn, 'insert' AS op
  FROM read_parquet('{FIX_ROOT}/sf0.01/pages.parquet')
  UNION ALL
  SELECT url, warc_ts, text, lang, lsn, op
  FROM read_parquet(['{FIX_ROOT}/sf0.01/change_events/events-00000.parquet',
                     '{FIX_ROOT}/sf0.01/change_events/events-00001.parquet'])
  WHERE op <> 'schema_change'
), r1 AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
  FROM u1),
v1 AS (SELECT url, warc_ts, text, lang FROM r1 WHERE rn = 1 AND op <> 'delete'),
u2 AS (
  SELECT url, warc_ts, text, lang, CAST(-1 AS BIGINT) AS lsn, 'insert' AS op
  FROM read_parquet('{FIX_ROOT}/sf0.01/pages.parquet')
  UNION ALL
  SELECT url, warc_ts, text, lang, lsn, op
  FROM read_parquet('{FIX_ROOT}/sf0.01/change_events/*.parquet')
  WHERE op <> 'schema_change'
), r2 AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
  FROM u2),
v2 AS (SELECT url, warc_ts, text, lang FROM r2 WHERE rn = 1 AND op <> 'delete')
SELECT COALESCE(v1.url, v2.url) AS url,
       CASE WHEN v1.url IS NULL THEN 'added'
            WHEN v2.url IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM v1 FULL OUTER JOIN v2 ON v1.url = v2.url
WHERE v1.url IS NULL OR v2.url IS NULL
   OR v1.warc_ts IS DISTINCT FROM v2.warc_ts
   OR v1.text IS DISTINCT FROM v2.text
   OR v1.lang IS DISTINCT FROM v2.lang
"""


SQL_TIME_TRAVEL_PAGES = f"""
WITH unioned AS (
  SELECT url, warc_ts, text, lang, CAST(-1 AS BIGINT) AS lsn, 'insert' AS op
  FROM read_parquet('{FIX_ROOT}/sf0.01/pages.parquet')
  UNION ALL
  SELECT url, warc_ts, text, lang, lsn, op
  FROM read_parquet(['{FIX_ROOT}/sf0.01/change_events/events-00000.parquet',
                     '{FIX_ROOT}/sf0.01/change_events/events-00001.parquet'])
  WHERE op <> 'schema_change'
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
  FROM unioned)
SELECT url, warc_ts, text, lang FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def _lang_counts(ds) -> dict[str, int]:
    """Per-lang live-row counts, map-side combined: each task emits its
    partial (lang, n) table; the driver folds the ≤langs×blocks rows.
    No shuffle — the groupby key has ~5 distinct values."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = pa.table(
            {
                "lang": pc.cast(b.column("lang"), pa.string()),
                # count ROWS, not non-null langs: NULL lang is a group too
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by("lang").aggregate([("one", "sum")])
        return pa.table({"lang": g.column("lang"),
                         "n": pc.cast(g.column("one_sum"), pa.int64())})

    out: dict[str, int] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for lang, n in zip(b.column("lang").to_pylist(), b.column("n").to_pylist()):
            out[lang] = out.get(lang, 0) + n
    return out


def q_incremental_rollup_pages(sf_dir: str):
    """Incremental materialized-view maintenance off the change feed:
    a per-lang page-count rollup is computed ONCE at v₁, then — after
    the second WAL batch commits v₂ — updated by reading ONLY the
    partitions the manifest diff says changed (old state subtracted,
    new state added). Never rescans the unchanged partitions: the
    downstream-refresh pattern the reference schedules as full dbt
    re-runs per DAG cycle (`airflow/dags/repsly_dag.py`), done as a
    delta. The oracle recomputes the rollup from scratch over the
    fully-replayed stream — if the maintenance math or the manifest
    diff missed a partition, values mismatch."""
    d = fixture_dir(sf_dir)
    first, rest = _stream_halves(d)
    root = tempfile.mkdtemp(prefix="lake_ivm_", dir="/tmp")
    try:
        eng = CDCEngine(root, num_partitions=16)
        eng.bootstrap(os.path.join(d, "pages.parquet"))
        eng.apply(first, batch_id="ivm-half-1")
        v1 = eng.lake.current_version()
        rollup = _lang_counts(eng.lake.dataset(version=v1))
        eng.apply(rest, batch_id="ivm-half-2")
        v2 = eng.lake.current_version()
        changed = eng.lake.changed_partition_ids(v1, v2)
        if changed:
            for lang, n in _lang_counts(
                eng.lake.dataset(version=v1, pids=changed)
            ).items():
                rollup[lang] = rollup.get(lang, 0) - n
            for lang, n in _lang_counts(
                eng.lake.dataset(version=v2, pids=changed)
            ).items():
                rollup[lang] = rollup.get(lang, 0) + n
        langs = sorted(
            (k for k, v in rollup.items() if v > 0),
            key=lambda k: (k is None, k),
        )
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_pages": pa.array([rollup[k] for k in langs], pa.int64()),
            }
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_INCREMENTAL_ROLLUP_PAGES = f"""
WITH unioned AS (
  SELECT url, warc_ts, lang, CAST(-1 AS BIGINT) AS lsn, 'insert' AS op
  FROM read_parquet('{FIX_ROOT}/sf0.01/pages.parquet')
  UNION ALL
  SELECT url, warc_ts, lang, lsn, op
  FROM read_parquet('{FIX_ROOT}/sf0.01/change_events/*.parquet')
  WHERE op <> 'schema_change'
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
  FROM unioned)
SELECT lang, count(*)::BIGINT AS n_pages
FROM ranked WHERE rn = 1 AND op <> 'delete'
GROUP BY lang
"""


def q_scd2_history_pages(sf_dir: str):
    """SCD Type-2 dimension history built from the raw WAL: every
    insert/update becomes a version row with ``[valid_from, valid_to)``
    effectivity, deletes close the prior version without emitting one,
    and the open version per url is flagged current. The warehouse
    pattern the reference's ReplacingMergeTree LWW tables throw away
    (only the latest row survives there) and dbt snapshot models
    rebuild per run — here it is ONE pass: coarse hash partition on
    poly64(url) co-locates each url's history, then a single vectorized
    lexsort + run-boundary scan per partition computes next-event
    timestamps and per-url version numbers with no per-url Python.
    The WAL is at-least-once (replayed events appear verbatim twice);
    versions are exactly-once, so identical (url, warc_ts, lsn) rows
    are collapsed in the same sorted pass before versioning — this
    also makes (warc_ts, lsn) a unique order key per url, keeping the
    history deterministic."""
    import pandas as pd

    from ..ops.texthash import poly_hash_array

    d = fixture_dir(sf_dir)
    rd = _rd()
    base = rd.read_parquet(
        os.path.join(d, "pages.parquet"), columns=["url", "warc_ts", "lang"]
    )

    def stamp_base(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "url": b.column("url"),
                "warc_ts": b.column("warc_ts"),
                "lang": b.column("lang"),
                "lsn": pa.repeat(pa.scalar(-1, pa.int64()), n),
                "op": pa.repeat(pa.scalar("insert"), n),
            }
        )

    ev = rd.read_parquet(
        os.path.join(d, "change_events"),
        columns=["url", "warc_ts", "lang", "lsn", "op"],
    )

    def keep_dml(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b.column("op"), pa.scalar("schema_change")))

    def add_pk(b: pa.Table) -> pa.Table:
        h = poly_hash_array(pc.cast(b.column("url"), pa.large_string()))
        return b.append_column("pk", pa.array((h & np.uint64(255)).view(np.int64)))

    unioned = (
        base.map_batches(stamp_base, batch_format="pyarrow")
        .union(ev.map_batches(keep_dml, batch_format="pyarrow"))
        .map_batches(add_pk, batch_format="pyarrow")
    )

    def scd2(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g["url"], sort=False)
        ts = g["warc_ts"].to_numpy().view("int64")
        lsn = g["lsn"].to_numpy()
        order = np.lexsort((lsn, ts, codes))
        c = codes[order]
        t = ts[order]
        l_s = lsn[order]
        # collapse at-least-once replays: identical (url, ts, lsn)
        # sort adjacent; keep the first of each run
        fresh = np.ones(len(c), dtype=bool)
        fresh[1:] = (c[1:] != c[:-1]) | (t[1:] != t[:-1]) | (l_s[1:] != l_s[:-1])
        order = order[fresh]
        c = c[fresh]
        t = t[fresh]
        op = g["op"].to_numpy()[order]
        n = len(c)
        # next event of the SAME url closes this version
        same_next = np.zeros(n, dtype=bool)
        same_next[:-1] = c[1:] == c[:-1]
        nxt = np.empty(n, dtype="int64")
        nxt[:-1] = t[1:]
        nxt[-1] = 0
        valid_to = np.where(
            same_next, nxt.astype("datetime64[us]"), np.datetime64("NaT")
        )
        keep = op != "delete"
        # per-url 1-based version number among kept rows: cumulative
        # kept-count minus the url run's starting offset
        kept_cum = np.cumsum(keep)
        run_start = np.ones(n, dtype=bool)
        run_start[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(run_start)
        base_off = kept_cum[starts] - keep[starts]
        lengths = np.diff(np.append(starts, n))
        seq = kept_cum - np.repeat(base_off, lengths)
        return pd.DataFrame(
            {
                "url": g["url"].to_numpy()[order][keep],
                "lang": g["lang"].to_numpy()[order][keep],
                "valid_from": t[keep].astype("datetime64[us]"),
                "valid_to": valid_to[keep],
                "change_lsn": lsn[order][keep],
                "version_seq": seq[keep].astype(np.int64),
                "is_current": ~same_next[keep],
            }
        )

    return unioned.groupby("pk").map_groups(scd2, batch_format="pandas")


SQL_SCD2_HISTORY_PAGES = f"""
WITH unioned AS (
  SELECT DISTINCT url, warc_ts, lang, lsn, op FROM (
    SELECT url, warc_ts, lang, CAST(-1 AS BIGINT) AS lsn, 'insert' AS op
    FROM read_parquet('{FIX_ROOT}/sf0.01/pages.parquet')
    UNION ALL
    SELECT url, warc_ts, lang, lsn, op
    FROM read_parquet('{FIX_ROOT}/sf0.01/change_events/*.parquet')
    WHERE op <> 'schema_change')
), seq AS (
  SELECT *, lead(warc_ts) OVER w AS valid_to
  FROM unioned WINDOW w AS (PARTITION BY url ORDER BY warc_ts, lsn)
), vers AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts, lsn) AS vs
  FROM seq WHERE op <> 'delete')
SELECT url, lang, warc_ts AS valid_from, valid_to, lsn AS change_lsn,
       vs::BIGINT AS version_seq, (valid_to IS NULL) AS is_current
FROM vers
"""


# ===================================================================
# Aggregations / sorts / set ops (SURVEY.md §2.6-2.8 generic surface)
# ===================================================================


def q_agg_pricing_summary(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def add_disc(b: pa.Table) -> pa.Table:
        # exact integer units end to end (gold/rollup rule): quantity in
        # hundredths, price in cents, discounted price in 1e-4 dollars
        # (cents x integer 100-discount_pct) — float Sums drift with
        # block order and can cross the round(,2) boundary
        q100 = np.round(
            b.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        cents = np.round(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d100 = np.round(
            b.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "_q100": pa.array(q100),
                "_cents": pa.array(cents),
                "_dm": pa.array(cents * (100 - d100)),
            }
        )

    out = (
        ds.map_batches(add_disc, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("_q100", alias_name="_q100"),
            Sum("_cents", alias_name="_cents"),
            Sum("_dm", alias_name="_dm"),
            Count(alias_name="count_order"),
        )
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    sq = pc.divide(pc.cast(t.column("_q100"), pa.float64()), 100.0)
    sb = pc.divide(pc.cast(t.column("_cents"), pa.float64()), 100.0)
    sd = pc.round(
        pc.divide(pc.cast(t.column("_dm"), pa.float64()), 10000.0),
        ndigits=2,
        round_mode="half_towards_infinity",
    )
    avg = pc.round(
        pc.divide(sq, pc.cast(t.column("count_order"), pa.float64())),
        ndigits=2,
        round_mode="half_towards_infinity",
    )
    t = t.drop(["_q100", "_cents", "_dm"])
    t = t.append_column("sum_qty", sq)
    t = t.append_column("sum_base_price", sb)
    t = t.append_column("sum_disc_price", sd)
    return t.append_column("avg_qty", avg)


SQL_AGG_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 2)
         AS sum_disc_price,
       count(*) AS count_order,
       round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 / count(*), 2)
         AS avg_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_filter_project_revenue(sf_dir: str):
    """Per-order revenue — an UNBOUNDED-group aggregate (one group per
    order), so it uses the coarse-partition + vectorized in-group
    reduction pattern rather than a native per-group aggregate (which
    costs O(groups) Python — minutes at 10⁶+ orders)."""
    import pandas as pd

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def body(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b.column("l_shipdate"), pa.scalar(np.datetime64("1996-01-01", "us"))),
            pc.less(b.column("l_shipdate"), pa.scalar(np.datetime64("1997-01-01", "us"))),
        )
        f = b.filter(m)
        # exact integer 1e-4-dollar units (cents x integer discount
        # complement): per-group float reduceat order is deterministic
        # here, but the cross-engine product association is not — the
        # all-integer form removes the question (gold/rollup rule)
        cents = np.round(
            f.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d100 = np.round(
            f.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        pk = pc.bit_wise_and(f.column("l_orderkey"), pa.scalar(255, pa.int64()))
        return pa.table(
            {
                "l_orderkey": f.column("l_orderkey"),
                "_dm": pa.array(cents * (100 - d100)),
                "pk": pk,
            }
        )

    def sum_per_order(g: pd.DataFrame) -> pd.DataFrame:
        k = g["l_orderkey"].to_numpy()
        v = g["_dm"].to_numpy()
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(vs, starts) if len(vs) else vs
        return pd.DataFrame({"l_orderkey": ks[first], "_dm": sums})

    out = (
        ds.map_batches(body, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(sum_per_order, batch_format="pandas")
    )
    t = pa.concat_tables([b for b in out.iter_batches(batch_format="pyarrow")])
    rev = pc.round(
        pc.divide(pc.cast(t.column("_dm"), pa.float64()), 10000.0),
        ndigits=2,
        round_mode="half_towards_infinity",
    )
    return t.drop(["_dm"]).append_column("revenue", rev)


SQL_FILTER_PROJECT_REVENUE = """
SELECT l_orderkey,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 2)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_orderkey
"""


def q_sort_topk_orders(sf_dir: str):
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


SQL_SORT_TOPK_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_join_revenue_by_nation_segment(sf_dir: str):
    """The two canonical join shapes in ONE pipeline (SURVEY.md §2.5):
    a DISTRIBUTED hash join for the large×large side (orders ⋈ customer
    on custkey — both sides shuffle once on a uniform 8-byte key) and a
    BROADCAST lookup for the small dim (nation: 25 rows, ``ray.put``
    once, read in every task — never re-shipped per batch, never
    shuffled). Group count is tiny (nations × segments), so the rollup
    uses Ray's native map-side-combining aggregates."""
    import ray
    from ray.data.aggregate import Count, Sum

    rd = _rd()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    # dense lookup array indexed by nationkey: one ray.put, vectorized
    # np.take in every task (no per-row Python dict probes)
    nk = nation.column("n_nationkey").to_numpy()
    dense = np.empty(int(nk.max()) + 1, dtype=object)
    dense[nk] = nation.column("n_name").to_numpy(zero_copy_only=False)
    nmap_ref = ray.put(dense)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
    )
    # partition count scales with input size, bounded by cluster CPUs:
    # hash-join aggregator actors cost ~fixed startup each, so small
    # inputs want few partitions while a 100-TB join wants ~cores
    n_parts = max(8, min(int(ray.cluster_resources().get("CPU", 8)),
                         2 * len(orders.input_files())))
    joined = orders.join(
        customer,
        join_type="inner",
        num_partitions=n_parts,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def add_nation(b: pa.Table) -> pa.Table:
        nmap = ray.get(nmap_ref)
        keys = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        # money summed as exact integer cents: float64 Sum order is
        # block-nondeterministic, and a sub-ulp drift that crosses the
        # round(,2) boundary is a wrong answer (the gold/rollup rule)
        cents = np.round(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "n_name": pa.array(nmap[keys], pa.string()),
                "c_mktsegment": b.column("c_mktsegment"),
                "_cents": pa.array(cents),
            }
        )

    out = (
        joined.map_batches(add_nation, batch_format="pyarrow")
        .groupby(["n_name", "c_mktsegment"])
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("_cents", alias_name="_cents"),
        )
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    rev = pc.divide(pc.cast(t.column("_cents"), pa.float64()), 100.0)
    return t.drop(["_cents"]).append_column("revenue", rev)


SQL_JOIN_REVENUE_BY_NATION_SEGMENT = """
SELECT n.n_name, c.c_mktsegment, count(*) AS n_orders,
       sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name, c.c_mktsegment
"""


def q_latest_order_per_customer(sf_dir: str):
    """Window-function analogue: ``row_number() OVER (PARTITION BY
    o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1`` as a
    coarse hash partition + ONE vectorized lexsort/first-occurrence
    pass per partition — the unbounded-group pattern (one group per
    customer; never a native per-group aggregate)."""
    import pandas as pd

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )


    def first_per_customer(g: pd.DataFrame) -> pd.DataFrame:
        k = g["o_custkey"].to_numpy()
        ts = g["o_orderdate"].to_numpy().view("int64")
        okey = g["o_orderkey"].to_numpy()
        order = np.lexsort((-okey, -ts, k))
        ks = k[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        sel = order[first]
        return pd.DataFrame(
            {
                "o_custkey": k[sel],
                "o_orderkey": okey[sel],
                "o_orderdate": g["o_orderdate"].to_numpy()[sel],
            }
        )

    return (
        ds.map_batches(_coarse_pk("o_custkey"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(first_per_customer, batch_format="pandas")
    )


SQL_LATEST_ORDER_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_orderdate FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders) WHERE rn = 1
"""


def q_windowed_event_counts(sf_dir: str):
    """Tumbling-window aggregate (1-hour windows): count + revenue per
    (event_type, window). The window key is computed IN the batch
    (floor_temporal — no shuffle to assign windows); group cardinality
    is windows × types, so the rollup uses native map-side-combining
    aggregates. The streaming-window operator of SURVEY.md §2.10 in
    batch form."""
    from ray.data.aggregate import Count, Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def win(b: pa.Table) -> pa.Table:
        # values summed as exact integer micro-units (round(v*1e6)) so
        # the block-order-nondeterministic float Sum can never drift a
        # result across the round(,2) boundary
        micro = np.round(
            b.column("value").to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "window_start": pc.floor_temporal(b.column("ts"), unit="hour"),
                "_micro": pa.array(micro),
            }
        )

    out = (
        ds.map_batches(win, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("_micro", alias_name="_micro"))
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    tv = pc.round(
        pc.divide(pc.cast(t.column("_micro"), pa.float64()), 1e6),
        ndigits=2,
        round_mode="half_towards_infinity",
    )
    return t.drop(["_micro"]).append_column("total_value", tv)


SQL_WINDOWED_EVENT_COUNTS = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n_events,
       round(sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 2)
         AS total_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def q_asof_join_signup(sf_dir: str):
    """AS-OF JOIN (an operator Ray Data lacks natively): for every
    purchase event, the latest signup event of the SAME user with
    signup.ts <= purchase.ts. Implemented as a composition the Dataset
    API allows: coarse hash partition on the join key co-locates each
    user's rows, then ONE vectorized lexsort + run-aware forward-fill
    per partition (no per-user Python). Partitioning assumption: all
    rows of a user fit one group — holds because per-key history is
    bounded; a whale key would need the salted pattern from the CDC
    merge. Ties at equal ts count the signup as visible (<=).

    Output encoding matters for value-level parity: the result column
    is emitted as a plain Arrow int64-with-nulls array (NOT a pandas
    nullable ``Int64`` extension array, which hashes differently from
    the oracle's int64-with-nulls under Arrow value hashing)."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )


    def asof(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False).view("int64")
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        etype = g.column("event_type").to_numpy(zero_copy_only=False)
        kind = (etype != "signup").astype(np.int8)  # signup sorts first on ties
        order = np.lexsort((eid, kind, ts, u))
        us, eids, ks, types = u[order], eid[order], kind[order], etype[order]
        n = len(us)
        first = np.ones(n, dtype=bool)
        first[1:] = us[1:] != us[:-1]
        run_id = np.cumsum(first) - 1
        # run-aware forward-fill of the last signup position: encode
        # signup rows as base+pos+1 with a per-run base that dominates
        # every previous run's values; maximum.accumulate then never
        # leaks a signup across user boundaries
        base = run_id.astype(np.int64) * np.int64(n + 1)
        pos = np.arange(n, dtype=np.int64)
        marked = np.where(ks == 0, base + pos + 1, np.int64(0))
        acc = np.maximum.accumulate(np.maximum(marked, base))
        has = acc > base
        src = np.clip(acc - base - 1, 0, None)
        asof_id = eids[src]
        m = types == "purchase"
        signup_col = pa.array(
            np.where(has[m], asof_id[m], 0).astype(np.int64),
            type=pa.int64(),
            mask=~has[m],
        )  # mask=True → NULL (no prior signup), matching the SQL NULL
        return pa.table(
            {"event_id": pa.array(eids[m], pa.int64()), "signup_event_id": signup_col}
        )

    return (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(asof, batch_format="pyarrow")
    )


SQL_ASOF_JOIN_SIGNUP = """
SELECT event_id, signup_event_id FROM (
  SELECT event_id, event_type,
         last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_event_id
  FROM events)
WHERE event_type = 'purchase'
"""


def q_range_join_signup_follow(sf_dir: str):
    """Banded RANGE join (an operator Ray Data lacks natively): for
    every signup event, how many purchases the SAME user made inside
    the window [signup.ts, signup.ts + 1 hour). Composition: coarse
    hash partition on the join key co-locates each user's rows, then
    per partition ONE structured-array sort of the purchase side and
    two vectorized ``searchsorted`` probes per signup batch (window
    start side='left', window end side='left') — no per-row Python, no
    quadratic band expansion. Partitioning assumption: a user's rows
    fit one group (same contract as the as-of join); a whale key needs
    the CDC merge's salting. Window start is INCLUSIVE, end EXCLUSIVE,
    mirroring the oracle's ``>= / <`` band."""
    import ray

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    HOUR_US = np.int64(3_600_000_000)  # ts is timestamp[us]
    # bucket count derived from the cluster, not hardcoded (VERDICT r4
    # task 5): ~4 groups per core keeps every core busy through the
    # merge stage while each group remains a per-user-bucket slice
    # that fits one task; floor of 16 avoids giant groups on tiny
    # test clusters
    n_buckets = max(16, 4 * int(ray.cluster_resources().get("CPU", 8)))

    def add_pk(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("pk", pa.array(u % np.int64(n_buckets)))

    def band_count(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False).view("int64")
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        etype = g.column("event_type").to_numpy(zero_copy_only=False)
        is_s = etype == "signup"
        is_p = etype == "purchase"
        dt = np.dtype([("u", "<i8"), ("t", "<i8")])
        purch = np.empty(int(is_p.sum()), dt)
        purch["u"], purch["t"] = u[is_p], ts[is_p]
        purch.sort()
        ns = int(is_s.sum())
        lo_k = np.empty(ns, dt)
        lo_k["u"], lo_k["t"] = u[is_s], ts[is_s]
        hi_k = np.empty(ns, dt)
        with np.errstate(over="ignore"):
            hi_k["u"], hi_k["t"] = u[is_s], ts[is_s] + HOUR_US
        lo = np.searchsorted(purch, lo_k, side="left")
        hi = np.searchsorted(purch, hi_k, side="left")
        return pa.table(
            {
                "event_id": pa.array(eid[is_s], pa.int64()),
                "n_follow_purchases": pa.array((hi - lo).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(band_count, batch_format="pyarrow")
    )


SQL_RANGE_JOIN_SIGNUP_FOLLOW = """
SELECT s.event_id, count(p.event_id)::BIGINT AS n_follow_purchases
FROM events s
LEFT JOIN events p
  ON p.user_id = s.user_id AND p.event_type = 'purchase'
 AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 1 HOUR
WHERE s.event_type = 'signup'
GROUP BY s.event_id
"""


def q_antijoin_customers_urgent(sf_dir: str):
    """Distributed ANTI-join (NOT EXISTS): customers with no URGENT
    order. The probe side is reduced BEFORE the shuffle — a map-side
    per-batch unique over the filtered key column (column-pruned read,
    predicate applied in the batch) — then distinct keys come from a
    distributed groupby, and the anti step is a left_outer hash join
    with a null-marker filter. Nothing materializes on the driver, so
    the shape holds when both sides are 100 TB; the key shuffle carries
    8 bytes per surviving row."""
    import ray
    from ray.data.aggregate import Count

    rd = _rd()
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def urgent_keys(b: pa.Table) -> pa.Table:
        keys = b.filter(
            pc.equal(b.column("o_orderpriority"), pa.scalar("1-URGENT"))
        ).column("o_custkey")
        return pa.table({"o_custkey": np.unique(keys.to_numpy(zero_copy_only=False))})

    from ..stages.typed import with_schema

    urgent = with_schema(
        orders.map_batches(urgent_keys, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_hits")),
        pa.schema([("o_custkey", pa.int64()), ("n_hits", pa.int64())]),
    )
    customer = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    n_parts = max(8, min(int(ray.cluster_resources().get("CPU", 8)),
                         2 * len(customer.input_files())))
    joined = customer.join(
        urgent,
        join_type="left_outer",
        num_partitions=n_parts,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def keep_missing(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_null(b.column("n_hits")))
        return b.select(["c_custkey", "c_mktsegment"])

    return joined.map_batches(keep_missing, batch_format="pyarrow")


SQL_ANTIJOIN_CUSTOMERS_URGENT = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


_PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


def q_pivot_docs_lang_source(sf_dir: str):
    """PIVOT (long → wide): per-source document counts spread across
    one column per language. The wide columns are built IN the batch
    (vectorized one-hot against the fixed lang list — a pivot's column
    set must be declared, same as SQL), pre-aggregated per batch by
    source, then reduced by native map-side-combining Sum aggregates —
    the shuffle carries one short row per (batch, source), never the
    documents."""
    import pandas as pd

    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "lang"])
    cols = [f"{l}_docs" for l in _PIVOT_LANGS]

    def partial_pivot(df: pd.DataFrame) -> pd.DataFrame:
        oh = pd.DataFrame(
            (df["lang"].to_numpy()[:, None] == np.array(_PIVOT_LANGS)).astype("int64"),
            columns=cols,
        )
        oh["n_docs"] = np.int64(1)
        oh["source"] = df["source"].to_numpy()
        return oh.groupby("source", as_index=False, sort=False).sum()

    return (
        ds.map_batches(partial_pivot, batch_format="pandas")
        .groupby("source")
        .aggregate(*[Sum(c, alias_name=c) for c in cols + ["n_docs"]])
    )


SQL_PIVOT_DOCS_LANG_SOURCE = """
SELECT source,
       {filters},
       count(*) AS n_docs
FROM documents GROUP BY source
""".format(filters=",\n       ".join(
    f"count(*) FILTER (lang = '{l}') AS {l}_docs" for l in _PIVOT_LANGS))


def _fine_nation_segment_cents(sf_dir: str):
    """Shared finest-grain aggregate for the grouping-set queries
    (ROLLUP / CUBE): revenue per (nation, segment) as exact integer
    cents. Only this grain touches the big tables — the same
    distributed hash join + broadcast dim as the plain join query —
    so every coarser grouping-set level is derived from this tiny
    (nations × segments rows) pandas frame on the driver with no
    second pass over the fact table."""
    import ray
    from ray.data.aggregate import Count, Sum

    rd = _rd()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk = nation.column("n_nationkey").to_numpy()
    dense = np.empty(int(nk.max()) + 1, dtype=object)
    dense[nk] = nation.column("n_name").to_numpy(zero_copy_only=False)
    nmap_ref = ray.put(dense)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    customer = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_mktsegment"]
    )
    n_parts = max(8, min(int(ray.cluster_resources().get("CPU", 8)),
                         2 * len(orders.input_files())))
    joined = orders.join(
        customer,
        join_type="inner",
        num_partitions=n_parts,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def add_nation_cents(b: pa.Table) -> pa.Table:
        nmap = ray.get(nmap_ref)
        keys = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        cents = np.round(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "n_name": pa.array(nmap[keys], pa.string()),
                "c_mktsegment": b.column("c_mktsegment"),
                "cents": pa.array(cents),
            }
        )

    return (
        joined.map_batches(add_nation_cents, batch_format="pyarrow")
        .groupby(["n_name", "c_mktsegment"])
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="cents"))
        .to_pandas()  # nations × segments rows — tiny by construction
    )


def q_rollup_revenue_nation_segment(sf_dir: str):
    """GROUP BY ROLLUP (grouping sets): revenue at (nation, segment),
    (nation) and grand-total levels, derived from the one distributed
    finest-grain aggregate (``_fine_nation_segment_cents``). Money is
    summed as exact integer cents so every level reproduces the SQL
    bit-for-bit (no float association-order drift on the grand
    total)."""
    import pandas as pd

    fine = _fine_nation_segment_cents(sf_dir)
    by_nation = fine.groupby("n_name", as_index=False)[["n_orders", "cents"]].sum()
    by_nation["c_mktsegment"] = None
    total = pd.DataFrame(
        {
            "n_name": [None],
            "c_mktsegment": [None],
            "n_orders": [fine["n_orders"].sum()],
            "cents": [fine["cents"].sum()],
        }
    )
    out = pd.concat([fine, by_nation, total], ignore_index=True)
    out["revenue"] = out.pop("cents").to_numpy().astype(np.float64) / 100.0
    return out[["n_name", "c_mktsegment", "n_orders", "revenue"]]


SQL_ROLLUP_REVENUE_NATION_SEGMENT = """
SELECT n.n_name, c.c_mktsegment, count(*) AS n_orders,
       sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP(n.n_name, c.c_mktsegment)
"""


def q_cube_revenue_nation_segment(sf_dir: str):
    """GROUP BY CUBE (all grouping sets): revenue at (nation, segment),
    (nation), (segment) and grand-total levels. Same scale shape as the
    rollup — ONE distributed pass builds the finest grain
    (``_fine_nation_segment_cents``), and all 2^k − 1 coarser cube
    levels are pandas reductions of that tiny frame on the driver (a
    cube never re-reads the fact table). Exact integer cents keep every
    level bit-equal to the SQL."""
    import pandas as pd

    fine = _fine_nation_segment_cents(sf_dir)
    by_nation = fine.groupby("n_name", as_index=False)[["n_orders", "cents"]].sum()
    by_nation["c_mktsegment"] = None
    by_segment = fine.groupby("c_mktsegment", as_index=False)[
        ["n_orders", "cents"]
    ].sum()
    by_segment["n_name"] = None
    total = pd.DataFrame(
        {
            "n_name": [None],
            "c_mktsegment": [None],
            "n_orders": [fine["n_orders"].sum()],
            "cents": [fine["cents"].sum()],
        }
    )
    out = pd.concat([fine, by_nation, by_segment, total], ignore_index=True)
    out["revenue"] = out.pop("cents").to_numpy().astype(np.float64) / 100.0
    return out[["n_name", "c_mktsegment", "n_orders", "revenue"]]


SQL_CUBE_REVENUE_NATION_SEGMENT = """
SELECT n.n_name, c.c_mktsegment, count(*) AS n_orders,
       sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY CUBE(n.n_name, c.c_mktsegment)
"""


def q_running_total_orders(sf_dir: str):
    """Per-key cumulative window aggregate: running order count and
    running revenue per customer in (o_orderdate, o_orderkey) order —
    ``sum(...) OVER (PARTITION BY ... ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``. Coarse hash partition co-locates each customer's
    orders, then ONE lexsort + cumsum-minus-run-offset pass per
    partition computes every customer's running series with no
    per-customer Python. Cents-int accumulation keeps the running sum
    exact, so ours and the SQL window agree at every prefix, not just
    in the limit."""
    import pandas as pd

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )


    def running(g: pd.DataFrame) -> pd.DataFrame:
        k = g["o_custkey"].to_numpy()
        ts = g["o_orderdate"].to_numpy().view("int64")
        okey = g["o_orderkey"].to_numpy()
        cents = np.round(g["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        order = np.lexsort((okey, ts, k))
        ks, cs = k[order], cents[order]
        n = len(ks)
        start = np.ones(n, dtype=bool)
        start[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(start)
        lengths = np.diff(np.append(starts, n))
        cum = np.cumsum(cs)
        offset = np.repeat(cum[starts] - cs[starts], lengths)
        pos = np.arange(n, dtype=np.int64)
        seq = pos - np.repeat(starts, lengths) + 1
        return pd.DataFrame(
            {
                "o_custkey": ks,
                "o_orderkey": okey[order],
                "o_orderdate": g["o_orderdate"].to_numpy()[order],
                "order_seq": seq,
                "run_total": (cum - offset).astype(np.float64) / 100.0,
            }
        )

    return (
        ds.map_batches(_coarse_pk("o_custkey"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(running, batch_format="pandas")
    )


SQL_RUNNING_TOTAL_ORDERS = """
SELECT o_custkey, o_orderkey, o_orderdate,
       row_number() OVER w AS order_seq,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w / 100.0 AS run_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_distinct_segments(sf_dir: str):
    from ray.data.aggregate import Count

    rd = _rd()
    return (
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_customers"))
    )


SQL_DISTINCT_SEGMENTS = """
SELECT c_mktsegment, count(*) AS n_customers FROM customer GROUP BY c_mktsegment
"""


def q_union_counts(sf_dir: str):
    """ds.union (bronze append semantics, SURVEY.md §2.8): orders ∪
    orders restricted — row multiset preserved."""
    from ray.data.aggregate import Count

    rd = _rd()
    a = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderstatus"])
    b = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderstatus"])
    return a.union(b).groupby("o_orderstatus").aggregate(Count(alias_name="n"))


SQL_UNION_COUNTS = """
SELECT o_orderstatus, count(*) AS n FROM (
  SELECT o_orderstatus FROM orders UNION ALL SELECT o_orderstatus FROM orders)
GROUP BY o_orderstatus
"""


# ===================================================================
# Scalar-function pipelines (SURVEY.md §2.3 / §2.9)
# ===================================================================


def q_case_ladder_order_tiers(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice", "o_orderpriority"]
    )

    def body(b: pa.Table) -> pa.Table:
        p = b.column("o_totalprice")
        tier = pc.case_when(
            pc.make_struct(
                pc.less(p, pa.scalar(50_000.0)),
                pc.less(p, pa.scalar(150_000.0)),
                pc.less(p, pa.scalar(300_000.0)),
            ),
            "small",
            "medium",
            "large",
            "jumbo",
        )
        urgent = pc.is_in(
            pc.utf8_slice_codeunits(b.column("o_orderpriority"), 0, 1),
            value_set=pa.array(["1", "2"]),
        )
        cents = np.round(
            p.to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)  # exact integer cents (gold/rollup rule)
        return pa.table(
            {"value_tier": tier, "is_urgent": urgent, "_cents": pa.array(cents)}
        )

    def finalize(t: pa.Table) -> pa.Table:
        tp = pc.divide(pc.cast(t.column("_cents"), pa.float64()), 100.0)
        return t.drop(["_cents"]).append_column("total_price", tp)

    return (
        ds.map_batches(body, batch_format="pyarrow")
        .groupby(["value_tier", "is_urgent"])
        .aggregate(Count(alias_name="n_orders"), Sum("_cents", alias_name="_cents"))
        .map_batches(finalize, batch_format="pyarrow")
    )


SQL_CASE_LADDER_ORDER_TIERS = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            WHEN o_totalprice < 300000 THEN 'large'
            ELSE 'jumbo' END AS value_tier,
       substring(o_orderpriority, 1, 1) IN ('1','2') AS is_urgent,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM orders GROUP BY 1, 2
"""


def q_date_derivations_events(sf_dir: str):
    from ray.data.aggregate import Count

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def body(b: pa.Table) -> pa.Table:
        ts = b.column("ts")
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "event_hour": pc.cast(F.to_hour(ts), pa.int64()),
                "event_dow": pc.cast(F.to_dow(ts), pa.int64()),
                "tod_bucket": F.time_of_day_bucket(ts),
            }
        )

    return (
        ds.map_batches(body, batch_format="pyarrow")
        .groupby(["event_type", "tod_bucket"])
        .aggregate(Count(alias_name="n"))
    )


SQL_DATE_DERIVATIONS_EVENTS = """
SELECT event_type,
       CASE WHEN hour(ts) >= 6 AND hour(ts) < 12 THEN 'morning'
            WHEN hour(ts) >= 12 AND hour(ts) < 18 THEN 'afternoon'
            WHEN hour(ts) >= 18 AND hour(ts) < 22 THEN 'evening'
            ELSE 'night' END AS tod_bucket,
       count(*) AS n
FROM events GROUP BY 1, 2
"""


def q_string_funcs_customers(sf_dir: str):
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    )

    def body(b: pa.Table) -> pa.Table:
        num = pc.struct_field(
            pc.extract_regex(b.column("c_name"), r"(?P<n>\d+)$"), "n"
        )
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "cust_num": F.to_int_or_null(num),
                "seg_lower": pc.utf8_lower(b.column("c_mktsegment")),
                "name_clean": F.squash_whitespace(b.column("c_name")),
            }
        )

    return ds.map_batches(body, batch_format="pyarrow")


SQL_STRING_FUNCS_CUSTOMERS = """
SELECT c_custkey,
       CAST(regexp_extract(c_name, '(\\d+)$', 1) AS BIGINT) AS cust_num,
       lower(c_mktsegment) AS seg_lower,
       trim(regexp_replace(regexp_replace(c_name, '[\\r\\n\\t]+', ' ', 'g'), ' {2,}', ' ', 'g')) AS name_clean
FROM customer
"""


def q_json_extract_events(sf_dir: str):
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])

    def body(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "k_val": F.json_extract_string(b.column("props"), "k"),
            }
        )

    return ds.map_batches(body, batch_format="pyarrow")


SQL_JSON_EXTRACT_EVENTS = """
SELECT event_id, json_extract_string(props, '$.k') AS k_val FROM events
"""


def q_explode_form_items(sf_dir: str):
    d = fixture_dir(sf_dir)
    rd = _rd()
    ds = rd.read_parquet(os.path.join(d, "forms.parquet"))
    return ds.map_batches(
        functools.partial(
            explode_json_array,
            col="items",
            fields=["Field", "Value"],
            parent_cols=["form_id"],
        ),
        batch_format="pyarrow",
    )


SQL_EXPLODE_FORM_ITEMS = f"""
SELECT form_id, i AS item_number,
       arr[i]."Field" AS item_field, arr[i]."Value" AS item_value
FROM (SELECT form_id,
             json_transform(items, '[{{"Field":"VARCHAR","Value":"VARCHAR"}}]') AS arr
      FROM read_parquet('{FIX_ROOT}/sf0.01/forms.parquet')
      WHERE items IS NOT NULL AND json_valid(items)
        AND json_type(items) = 'ARRAY') t
CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) g
"""


def q_watermark_max_ts(sf_dir: str):
    """Watermark advance = max(event time) per source (SURVEY.md §2.6)."""
    from ray.data.aggregate import Count, Max

    rd = _rd()
    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
        .groupby("event_type")
        .aggregate(Max("ts", alias_name="watermark_ts"), Count(alias_name="n_events"))
    )


SQL_WATERMARK_MAX_TS = """
SELECT event_type, max(ts) AS watermark_ts, count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_validation_documents(sf_dir: str):
    """The reference's post-load integrity metrics as one result row
    (counts / duplicates / null-rate, repsly_dag.py:39-270)."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rows_total": pa.array([b.num_rows], pa.int64()),
                "null_lang": pa.array(
                    [b.num_rows - pc.count(b.column("lang")).as_py()], pa.int64()
                ),
            }
        )

    rows_total = 0
    null_lang = 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        rows_total += pc.sum(b.column("rows_total")).as_py() or 0
        null_lang += pc.sum(b.column("null_lang")).as_py() or 0
    # distinct-text count via 128-bit content hashes + coarse partition
    # + vectorized per-partition distinct (ds.unique on the payload
    # would shuffle every text byte AND pay the O(groups) aggregate)
    from ..ops.texthash import POLY_B2, poly_hash_array

    def hash_rows(b: pa.Table) -> pa.Table:
        # NULL texts are excluded to match SQL count(DISTINCT text),
        # which ignores NULLs (a 0-hash row would count as one value)
        col = b.column("text")
        if col.null_count:
            b = b.filter(pc.is_valid(col))
            col = b.column("text")
        h1 = poly_hash_array(col)
        h2 = poly_hash_array(col, base=POLY_B2)
        return pa.table(
            {
                "_h1": pa.array(h1.view(np.int64)),
                "_h2": pa.array(h2.view(np.int64)),
                "_pk": pa.array((h1 & np.uint64(255)).astype(np.int64)),
            }
        )

    def distinct_in_part(g):
        import pandas as pd

        h1 = g["_h1"].to_numpy()
        h2 = g["_h2"].to_numpy()
        order = np.lexsort((h2, h1))
        h1s, h2s = h1[order], h2[order]
        first = np.ones(len(h1s), dtype=bool)
        first[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        return pd.DataFrame({"n": [int(first.sum())]})

    n_distinct = 0
    for b in (
        ds.map_batches(hash_rows, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(distinct_in_part, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")
    ):
        n_distinct += pc.sum(b.column("n")).as_py() or 0
    return pa.table(
        {
            "rows_total": pa.array([rows_total], pa.int64()),
            "distinct_texts": pa.array([n_distinct], pa.int64()),
            "duplicate_rows": pa.array([rows_total - n_distinct], pa.int64()),
            "null_lang": pa.array([null_lang], pa.int64()),
        }
    )


SQL_VALIDATION_DOCUMENTS = """
SELECT count(*) AS rows_total,
       count(DISTINCT text) AS distinct_texts,
       count(*) - count(DISTINCT text) AS duplicate_rows,
       count(*) - count(lang) AS null_lang
FROM documents
"""


def q_silver_orders(sf_dir: str):
    """The worked silver model (pipelines/silver.py): dedup → casts →
    quality flags → CASE ladders → date derivations, composed as
    registered steps through PipelineRegistry — the dbt-model extension
    surface, value-verified (purchase_orders.sql:15-389 analogue)."""
    from .silver import silver_orders

    return silver_orders(sf_dir)


def q_gold_segment_summary(sf_dir: str):
    """Silver→gold model CHAIN through the registry (VERDICT r2 task 4):
    gold_segment_summary's source is the silver_orders OUTPUT via the
    ``source_pipeline`` (dbt ``ref()``) edge; per-(year, tier) revenue
    rollup — the raw→staging→curated dependency graph of
    ``airflow/dags/repsly_dag.py:722-785`` done natively."""
    from .silver import gold_segment_summary

    return gold_segment_summary(sf_dir)


SQL_SILVER_ORDERS = """
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY o_orderdate DESC) AS rn
  FROM orders)
SELECT o_orderkey, o_custkey,
  CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'fulfilled'
       WHEN 'P' THEN 'pending' ELSE 'unknown' END AS order_status,
  CASE WHEN o_totalprice < 50000 THEN 'small'
       WHEN o_totalprice < 150000 THEN 'medium'
       WHEN o_totalprice < 300000 THEN 'large'
       ELSE 'jumbo' END AS value_tier,
  substring(o_orderpriority, 1, 1) IN ('1','2') AS is_urgent,
  CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS priority_rank,
  o_totalprice > 0 AS is_valid_price,
  year(o_orderdate) AS order_year,
  month(o_orderdate) AS order_month,
  isodow(o_orderdate) AS order_dow,
  round(o_totalprice, 2) AS total_price
FROM ranked WHERE rn = 1
"""


SQL_GOLD_SEGMENT_SUMMARY = f"""
WITH silver AS ({SQL_SILVER_ORDERS})
SELECT order_year, value_tier,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN is_urgent THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders,
       sum(CAST(round(total_price * 100) AS BIGINT)) / 100.0 AS revenue,
       round(sum(CAST(round(total_price * 100) AS BIGINT)) / 100.0 / count(*), 2)
         AS avg_order_value
FROM silver GROUP BY order_year, value_tier
"""


# ===================================================================
# Training-data ops
# ===================================================================


def q_dedup_exact_documents(sf_dir: str):
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(ds).select_columns(["doc_id", "text"])


SQL_DEDUP_EXACT_DOCUMENTS = """
SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
"""


def q_text_quality_tokens(sf_dir: str):
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ..ops.text import bpe_token_count

    return (
        ds.map_batches(token_count, batch_format="pyarrow")
        .map_batches(bpe_token_count, batch_format="pyarrow")
        .map_batches(quality_score, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens", "n_bpe_tokens", "quality"])
    )


SQL_TEXT_QUALITY_TOKENS = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       array_length(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))::BIGINT
         AS n_bpe_tokens,
       round(100*(0.5*least(length(text), 500)/500.0
           + 0.4*coalesce(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                 / nullif(length(text), 0)::DOUBLE, 0)
           + 0.1*(CASE WHEN regexp_matches(text, '[.!?]\\s*$') THEN 1 ELSE 0 END)), 2)
         AS quality
FROM documents
"""


def q_lm_quality_documents(sf_dir: str):
    """CCNet-style unigram-LM quality score: fit the model over the
    corpus (map-side combined token partials, coarse-bucket reduce,
    min_count=5), broadcast it once, then a zero-shuffle scoring pass
    — mean per-token surprisal in micro-nat integer arithmetic so the
    SQL twin replays bit-for-bit (ops/lm.py)."""
    from ..ops.lm import unigram_lm_scores

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return unigram_lm_scores(ds, min_count=5)


SQL_LM_QUALITY_DOCUMENTS = """
WITH tt AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
    FROM documents WHERE text IS NOT NULL)
  WHERE tok <> ''),
vocab AS (SELECT tok, count(*)::BIGINT AS cnt FROM tt GROUP BY tok HAVING count(*) >= 5),
costs AS (
  SELECT t.doc_id,
         CAST(floor(ln((SELECT count(*)::DOUBLE FROM tt) / coalesce(v.cnt, 1))
              * 1000000) AS BIGINT) AS c
  FROM tt t LEFT JOIN vocab v USING (tok))
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       CAST(sum(c) // count(*) AS BIGINT) AS lm_score_micro
FROM costs GROUP BY doc_id
"""


def q_lang_id_documents(sf_dir: str):
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(lang_id, batch_format="pyarrow").select_columns(
        ["doc_id", "lang_pred"]
    )


SQL_LANG_ID_DOCUMENTS = hash_sql.lang_id_sql("documents", _LANG_PROFILES)


def q_fingerprint_documents(sf_dir: str):
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(doc_fingerprint, batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"]
    )


SQL_FINGERPRINT_DOCUMENTS = hash_sql.fingerprint_sql("documents")


def q_minhash_neardup_pairs(sf_dir: str):
    """LSH near-dup pairs at signature-jaccard ≥ 0.8 — the DuckDB twin
    replays the WHOLE algorithm (shingles → 64 minhashes → band buckets
    → pair verify) in HUGEINT arithmetic, so values match exactly."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, jaccard_threshold=0.8)


SQL_MINHASH_NEARDUP_PAIRS = hash_sql.minhash_pairs_sql(
    "documents", jaccard_threshold=0.8
)


SQL_NEARDUP_DEDUP_DOCUMENTS = f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({SQL_MINHASH_NEARDUP_PAIRS.strip()}) q),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS component
         FROM reach GROUP BY a)
SELECT d.doc_id
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
WHERE c.component IS NULL OR c.component = d.doc_id
"""


def q_neardup_dedup_documents(sf_dir: str):
    """GROUP near-dup dedup — the sink users actually run after pair
    generation: minhash pairs → connected components (transitive
    closure, min-id representative) → survivors = representatives +
    untouched docs. The corpus streams; only the loser-id set (pair-
    bounded) broadcasts. Oracle: recursive-CTE transitive closure over
    the value-exact minhash pair SQL."""
    from ..ops.components import neardup_survivors
    from ..ops.dedup import minhash_lsh_pairs

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, jaccard_threshold=0.8)
    return neardup_survivors(ds, pairs).select_columns(["doc_id"])


def q_ngram_jaccard_pairs(sf_dir: str):
    """EXACT word-trigram Jaccard near-dup pairs (the precise verifier
    tier of the dedup family) — value-matched against a DuckDB shingle
    self-join."""
    from ..ops.dedup import ngram_jaccard_pairs

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, n=3, threshold=0.5)


SQL_NGRAM_JACCARD_PAIRS = hash_sql.ngram_jaccard_pairs_sql(
    "documents", n=3, threshold=0.5
)


def q_simhash_documents(sf_dir: str):
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_signatures(ds)


SQL_SIMHASH_DOCUMENTS = hash_sql.simhash_documents_sql("documents")


def q_simhash_neardup_pairs(sf_dir: str):
    """Pigeonhole-blocked Hamming-≤3 SimHash pairs; recall is exact, so
    the all-pairs bit_count(xor) self-join in SQL matches exactly."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_neardup_pairs(ds, max_hamming=3)


SQL_SIMHASH_NEARDUP_PAIRS = hash_sql.simhash_pairs_sql("documents", max_hamming=3)


def q_corpus_clean(sf_dir: str):
    """The composed training-data cleaning pipeline — what a user runs
    end-to-end at 100 TB: language ID → quality floor → exact dedup,
    chained lazily so blocks stream through all three stages. Oracle
    replays each formula in SQL (lang argmax ladder, quality arithmetic,
    min-id-per-text dedup) over the same filter."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    scored = ds.map_batches(lang_id, batch_format="pyarrow").map_batches(
        quality_score, batch_format="pyarrow"
    )

    def keep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(b.column("lang_pred"), pa.scalar("en")),
            pc.greater_equal(b.column("quality"), pa.scalar(55.0)),
        )
        return b.filter(m).select(["doc_id", "text"])

    # pin: exact_dedup consumes its input twice (hash pass + survivor
    # recovery) — without the pin the lang-id/quality chain re-executes
    filtered = scored.map_batches(keep, batch_format="pyarrow").materialize()
    return exact_dedup(filtered).select_columns(["doc_id", "text"])


SQL_CORPUS_CLEAN = f"""
WITH lang AS ({hash_sql.lang_id_sql('documents', _LANG_PROFILES).strip()}),
q AS (
  SELECT doc_id,
         round(100*(0.5*least(length(text), 500)/500.0
             + 0.4*coalesce(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   / nullif(length(text), 0)::DOUBLE, 0)
             + 0.1*(CASE WHEN regexp_matches(text, '[.!?]\\s*$') THEN 1 ELSE 0 END)), 2)
           AS quality
  FROM documents),
kept AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN lang l ON l.doc_id = d.doc_id
  JOIN q ON q.doc_id = d.doc_id
  WHERE l.lang_pred = 'en' AND q.quality >= 55.0)
SELECT min(doc_id) AS doc_id, text FROM kept GROUP BY text
"""


def q_embedding_topk(sf_dir: str):
    rd = _rd()
    q = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mask = pc.less(q.column("vec_id"), pa.scalar(3))
    queries = np.asarray(q.filter(mask).column("embedding").to_pylist(), dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = topk_cosine(ds, queries, k=5)
    return t.select(["query_id", "rank", "vec_id"])


SQL_EMBEDDING_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 3)
SELECT q.query_id,
       row_number() OVER (
         PARTITION BY q.query_id
         ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id ASC
       ) AS rank,
       e.vec_id
FROM q CROSS JOIN embeddings e
QUALIFY rank <= 5
"""


_IVF_CACHE: dict[str, str] = {}


def _ivf_index(sf_dir: str):
    """Build-once-per-fixture persistent IVF index (the embeddings
    table is static per sf_dir, so reopening is correct); the scratch
    root is atexit-registered instead of leaking one index per call
    (ADVICE r4)."""
    from ..ops.similarity import IVFIndex

    root = _IVF_CACHE.get(sf_dir)
    if root is not None and os.path.isdir(os.path.join(root, "cells")):
        return IVFIndex(root)
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    root = _scratch_dir("ivf_")
    idx = IVFIndex.build(ds, root, n_clusters=8)
    _IVF_CACHE[sf_dir] = root
    return idx


def q_embedding_topk_ivf(sf_dir: str):
    """IVF ANN through the PERSISTENT inverted-file index: vectors are
    partitioned by centroid cell once at build (lake-style dir), and a
    probe reads ONLY the probed cells' files — at full probe this is
    exactly brute force (same oracle as embedding_topk)."""
    q = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mask = pc.less(q.column("vec_id"), pa.scalar(3))
    queries = np.asarray(q.filter(mask).column("embedding").to_pylist(), dtype=np.float64)
    idx = _ivf_index(sf_dir)
    t = idx.search(queries, k=5, n_probe=8)
    return t.select(["query_id", "rank", "vec_id"])


_IVF_EXT_CACHE: dict[str, str] = {}


def q_embedding_topk_ivf_extend(sf_dir: str):
    """Incremental IVF maintenance (VERDICT r4 task 3 driver row): the
    index is BUILT on the first half of the embeddings and EXTENDED
    with the second half — new vectors assigned to the existing
    centroids, appended as a stamped, marker-committed generation — and
    a full-probe search over the extended index must equal brute force
    over the union (the same oracle as ``embedding_topk``)."""
    from ..ops.similarity import IVFIndex

    rdm = _rd()
    full = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mask = pc.less(full.column("vec_id"), pa.scalar(3))
    queries = np.asarray(
        full.filter(mask).column("embedding").to_pylist(), dtype=np.float64
    )
    root = _IVF_EXT_CACHE.get(sf_dir)
    if root is not None and os.path.isdir(os.path.join(root, "extends")):
        idx = IVFIndex(root)
    else:
        half = full.num_rows // 2
        root = _scratch_dir("ivf_ext_")
        idx = IVFIndex.build(rdm.from_arrow(full.slice(0, half)), root, n_clusters=8)
        idx.extend(rdm.from_arrow(full.slice(half)), batch_id=f"second-half-{sf_dir}")
        _IVF_EXT_CACHE[sf_dir] = root
    t = idx.search(queries, k=5, n_probe=8)
    return t.select(["query_id", "rank", "vec_id"])


def q_embedding_neardup(sf_dir: str):
    """Near-duplicate pairs at cosine ≥ 0.99 over embeddings ∪ an
    id-shifted exact copy (the base table has no near-dups — max pairwise
    cosine ≈ 0.51 — so the expected pair set is exactly {(i, i+10000)}:
    a deterministic, SQL-expressible check of the sign-LSH + verify path)."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def shift(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": pc.add(b.column("vec_id"), pa.scalar(10_000, pa.int64())),
                "embedding": b.column("embedding"),
            }
        )

    both = ds.union(ds.map_batches(shift, batch_format="pyarrow"))
    pairs = embedding_neardup_pairs(both, threshold=0.99)
    out = pa.concat_tables(
        list(pairs.iter_batches(batch_format="pyarrow")) or
        [pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                   "cosine": pa.array([], pa.float64())})]
    )
    return out.select(["doc_a", "doc_b"])


SQL_EMBEDDING_NEARDUP = """
SELECT vec_id AS doc_a, vec_id + 10000 AS doc_b FROM embeddings
"""


def q_multimodal_decode(sf_dir: str):
    """Actor-pool decode plumbing over the binary html payload; the
    deterministic fake-decode arithmetic (byte-sum dims) is replayed by
    a DuckDB oracle over the same blob column."""
    d = fixture_dir(sf_dir)
    rd = _rd()
    ds = rd.read_parquet(os.path.join(d, "pages.parquet"), columns=["url", "html"])
    out = ds.map_batches(
        DecodeImageBatch, batch_format="pyarrow", batch_size=512, concurrency=2
    )
    return out.select_columns(["url", "width", "height", "mode"])


SQL_MULTIMODAL_DECODE = hash_sql.multimodal_decode_sql(
    f"{FIX_ROOT}/sf0.01/pages.parquet"
)


def q_multimodal_decode_real(sf_dir: str):
    """REAL-bytes image decode: actor-pool header parsing (PNG IHDR /
    JPEG SOF / GIF — ops/multimodal.parse_image_header, no codec lib)
    over genuine image blobs; the oracle compares against the dims/mode
    recorded at blob-generation time (VERDICT r2 task 2)."""
    d = fixture_dir(sf_dir)
    rd = _rd()
    ds = rd.read_parquet(os.path.join(d, "images.parquet"), columns=["img_id", "image"])
    out = ds.map_batches(
        DecodeImageBatch,
        fn_constructor_kwargs={"fake": False},
        batch_format="pyarrow",
        batch_size=512,
        concurrency=2,
    )
    return out.select_columns(["img_id", "width", "height", "mode"])


SQL_MULTIMODAL_DECODE_REAL = f"""
SELECT img_id, true_width AS width, true_height AS height, true_mode AS mode
FROM read_parquet('{FIX_ROOT}/sf0.01/images.parquet')
"""


def q_multimodal_audio_real(sf_dir: str):
    """REAL-bytes audio decode: pure-Python RIFF/WAVE parsing over
    genuine PCM WAV blobs (ops/multimodal.parse_wav_header — WAV is
    uncompressed, so this is a complete decode, no codec lib); oracle
    compares against generation-time truth. Non-audio / null payloads
    decode to zeros."""
    from ..ops.multimodal import parse_wav_header

    d = fixture_dir(sf_dir)
    rd = _rd()
    ds = rd.read_parquet(os.path.join(d, "audio.parquet"), columns=["audio_id", "audio"])

    def body(b: pa.Table) -> pa.Table:
        rates, chans, frames = [], [], []
        for data in b.column("audio").to_pylist():
            hdr = parse_wav_header(data)
            if hdr is None:
                rates.append(0)
                chans.append(0)
                frames.append(0)
            else:
                rates.append(hdr["sample_rate"])
                chans.append(hdr["channels"])
                frames.append(hdr["n_frames"])
        return pa.table(
            {
                "audio_id": b.column("audio_id"),
                "sample_rate": pa.array(rates, pa.int64()),
                "channels": pa.array(chans, pa.int64()),
                "n_frames": pa.array(frames, pa.int64()),
            }
        )

    return ds.map_batches(body, batch_format="pyarrow", batch_size=512)


SQL_MULTIMODAL_AUDIO_REAL = f"""
SELECT audio_id, true_sample_rate AS sample_rate, true_channels AS channels,
       true_n_frames AS n_frames
FROM read_parquet('{FIX_ROOT}/sf0.01/audio.parquet')
"""


def q_multimodal_video_real(sf_dir: str):
    """REAL-bytes video container parsing: pure-Python ISO-BMFF box
    walk (ops/multimodal.parse_mp4_header → timescale, duration,
    track dims); oracle compares against generation-time truth."""
    from ..ops.multimodal import parse_mp4_header

    d = fixture_dir(sf_dir)
    rd = _rd()
    ds = rd.read_parquet(os.path.join(d, "video.parquet"), columns=["video_id", "video"])

    def body(b: pa.Table) -> pa.Table:
        ts, dur, ws, hs = [], [], [], []
        for data in b.column("video").to_pylist():
            hdr = parse_mp4_header(data)
            if hdr is None:
                ts.append(0)
                dur.append(0)
                ws.append(0)
                hs.append(0)
            else:
                ts.append(hdr["timescale"])
                dur.append(hdr["duration"])
                ws.append(hdr["width"])
                hs.append(hdr["height"])
        return pa.table(
            {
                "video_id": b.column("video_id"),
                "timescale": pa.array(ts, pa.int64()),
                "duration": pa.array(dur, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
            }
        )

    return ds.map_batches(body, batch_format="pyarrow", batch_size=512)


SQL_MULTIMODAL_VIDEO_REAL = f"""
SELECT video_id, true_timescale AS timescale, true_duration AS duration,
       true_width AS width, true_height AS height
FROM read_parquet('{FIX_ROOT}/sf0.01/video.parquet')
"""


def q_url_normalize(sf_dir: str):
    """Web-corpus URL canonicalization + host extraction (the key-
    normalization step before URL-keyed dedup, and the per-site
    grouping key) — pure RE2 kernels with a DuckDB twin using the same
    patterns."""
    d = fixture_dir(sf_dir)
    rd = _rd()
    ds = rd.read_parquet(os.path.join(d, "urls.parquet"))

    def body(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url_id": b.column("url_id"),
                "url_norm": F.normalize_url(b.column("url")),
                "host": F.url_host(b.column("url")),
            }
        )

    return ds.map_batches(body, batch_format="pyarrow")


SQL_URL_NORMALIZE = f"""
SELECT url_id,
  CASE WHEN regexp_matches(u2, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')
       THEN lower(regexp_extract(u2, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
            || regexp_extract(u2, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1)
       ELSE u2 END AS url_norm,
  CASE WHEN regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?[^/:?#]+')
       THEN regexp_replace(
              lower(regexp_extract(url,
                '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^/:?#]+)', 1)),
              '^www\\.', '')
       ELSE NULL END AS host
FROM (SELECT url_id, url, regexp_replace(url, '#.*$', '') AS u2
      FROM read_parquet('{FIX_ROOT}/sf0.01/urls.parquet'))
"""


def q_normalize_dirty_records(sf_dir: str):
    """F3 conformance: the full scalar-normalizer surface (SURVEY.md
    §2.3/§2.9) applied in one vectorized map_batches pass over the dirty
    fixture — MS-JSON dates, OrNull casts, bool parse, GPS bounds,
    email validate+domain, US phone normalize, whitespace squash —
    value-matched against a DuckDB oracle."""
    d = fixture_dir(sf_dir)
    rd = _rd()
    ds = rd.read_parquet(os.path.join(d, "dirty_records.parquet"))

    def body(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "row_id": b.column("row_id"),
                "parsed_ts": F.parse_ms_json_date(b.column("ms_json_date")),
                "num_val": F.to_float_or_null(b.column("num_str")),
                "int_val": F.to_int_or_null(b.column("num_str")),
                "bool_val": F.parse_bool(b.column("bool_str")),
                "lat_val": F.validate_lat(b.column("lat")),
                "lon_val": F.validate_lon(b.column("lon")),
                "email_ok": F.email_valid(b.column("email")),
                "email_domain": F.email_domain(b.column("email")),
                "phone_norm": F.phone_normalize_us(b.column("phone")),
                "note_clean": F.squash_whitespace(b.column("note")),
            }
        )

    return ds.map_batches(body, batch_format="pyarrow")


SQL_NORMALIZE_DIRTY_RECORDS = f"""
SELECT row_id,
  CASE
    WHEN regexp_matches(ms_json_date, '^/Date\\(-?\\d+')
      THEN to_timestamp(CAST(regexp_extract(ms_json_date, '^/Date\\((-?\\d+)', 1) AS BIGINT) / 1000.0)::TIMESTAMP
    WHEN regexp_matches(regexp_replace(ms_json_date, 'Z$', ''), '^\\d{{4}}-\\d{{2}}-\\d{{2}}[ T]\\d{{2}}:\\d{{2}}(:\\d{{2}}(\\.\\d+)?)?$')
      THEN CAST(replace(regexp_replace(ms_json_date, 'Z$', ''), 'T', ' ') AS TIMESTAMP)
    WHEN regexp_matches(ms_json_date, '^\\d{{4}}-\\d{{2}}-\\d{{2}}$')
      THEN CAST(ms_json_date || ' 00:00:00' AS TIMESTAMP)
    ELSE NULL END AS parsed_ts,
  CASE WHEN regexp_matches(trim(num_str), '^-?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?$')
       THEN CAST(trim(num_str) AS DOUBLE) ELSE NULL END AS num_val,
  CASE WHEN regexp_matches(trim(num_str), '^-?\\d+$')
       THEN CAST(trim(num_str) AS BIGINT) ELSE NULL END AS int_val,
  CASE WHEN lower(trim(bool_str)) IN ('true','1','t','yes','y') THEN TRUE
       WHEN lower(trim(bool_str)) IN ('false','0','f','no','n') THEN FALSE
       ELSE NULL END AS bool_val,
  CASE WHEN TRY_CAST(lat AS DOUBLE) BETWEEN -90 AND 90 AND TRY_CAST(lat AS DOUBLE) <> 0
       THEN TRY_CAST(lat AS DOUBLE) ELSE NULL END AS lat_val,
  CASE WHEN TRY_CAST(lon AS DOUBLE) BETWEEN -180 AND 180 AND TRY_CAST(lon AS DOUBLE) <> 0
       THEN TRY_CAST(lon AS DOUBLE) ELSE NULL END AS lon_val,
  coalesce(regexp_matches(lower(email), '^[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}$'), FALSE) AS email_ok,
  CASE WHEN regexp_matches(lower(email), '^[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}$')
       THEN regexp_extract(lower(email), '@([a-z0-9.-]+)$', 1) ELSE NULL END AS email_domain,
  CASE WHEN length(p10.d) = 10 THEN p10.d ELSE NULL END AS phone_norm,
  trim(regexp_replace(regexp_replace(note, '[\r\n\t]+', ' ', 'g'), ' {{2,}}', ' ', 'g')) AS note_clean
FROM read_parquet('{FIX_ROOT}/sf0.01/dirty_records.parquet'),
LATERAL (SELECT CASE WHEN length(regexp_replace(phone, '\\D', '', 'g')) = 11
                      AND regexp_replace(phone, '\\D', '', 'g') LIKE '1%'
                     THEN substring(regexp_replace(phone, '\\D', '', 'g'), 2)
                     ELSE regexp_replace(phone, '\\D', '', 'g') END AS d) p10
"""


def q_hash_split_documents(sf_dir: str):
    """Deterministic train/val/test assignment: split = pure function
    of poly64(doc_id-as-string) mod 100, so any worker / re-run /
    corpus subset computes identical membership with zero coordination
    (the property that matters at 100 TB). Value-verified: the oracle
    replays the hash in HUGEINT arithmetic."""
    from ..ops.sampling import hash_split

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return hash_split(ds, id_col="doc_id").select_columns(["doc_id", "split"])


_SQL_DOC_BUCKET = (
    f"({hash_sql.poly64_expr('CAST(doc_id AS VARCHAR)')}) % 100"
)

SQL_HASH_SPLIT_DOCUMENTS = f"""
WITH h AS (SELECT doc_id, {_SQL_DOC_BUCKET} AS b FROM documents)
SELECT doc_id,
       CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split
FROM h
"""


def q_hash_sample_documents(sf_dir: str):
    """Reproducible ~10% down-sample: keep doc ids whose hash bucket
    < 10 — the same ids survive on every run and every shard."""
    from ..ops.sampling import hash_sample

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return hash_sample(ds, id_col="doc_id", keep_pct=10)


SQL_HASH_SAMPLE_DOCUMENTS = f"""
SELECT doc_id FROM documents WHERE {_SQL_DOC_BUCKET} < 10
"""


_STRAT_RATES = {"en": 10, "de": 50}  # keep-% per language; tail kept whole


def q_stratified_sample_documents(sf_dir: str):
    """Language-rebalancing down-sample: per-stratum keep rates (10% of
    English, 50% of German, 100% of the low-resource tail) applied as a
    pure function of the id bucket — no shuffle, no RNG state, the same
    documents survive on every run, worker and corpus subset. The
    standard web-corpus mix step (the reference's closest analogue is
    its per-tenant filter fan-out, ``config/tenants.yml``); value-
    verified by replaying the bucket + CASE ladder in the oracle."""
    from ..ops.sampling import stratified_hash_sample

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return stratified_hash_sample(
        ds, id_col="doc_id", strat_col="lang", rates=_STRAT_RATES, default_pct=100
    )


SQL_STRATIFIED_SAMPLE_DOCUMENTS = f"""
SELECT doc_id, lang FROM documents
WHERE {_SQL_DOC_BUCKET} < CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 50 ELSE 100 END
"""


def q_topk_docs_per_lang(sf_dir: str):
    """Grouped top-k (top 3 documents per language by length, doc_id
    tiebreak) in the scale-right shape: every batch reduces to AT MOST
    langs x k candidate rows map-side (one lexsort + first-k-per-group
    mask), so the exchange carries blocks x langs x k tiny rows and the
    final per-group selection runs over that bounded stream on the
    driver — the full table never shuffles and is read two columns
    wide. The same pattern serves per-domain / per-bucket exemplar
    selection at 100 TB (k rows per group per block is the invariant,
    independent of corpus size)."""
    rd = _rd()
    K = 3
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])

    def topk_with_rank(b: pa.Table) -> pa.Table:
        lang = b.column("lang").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nch, lang))  # lang asc, n_chars desc, id asc
        ls, ns, ids = lang[order], nch[order], did[order]
        new_grp = np.ones(len(ls), dtype=bool)
        new_grp[1:] = ls[1:] != ls[:-1]
        idx = np.arange(len(ls))
        rank = idx - np.maximum.accumulate(np.where(new_grp, idx, 0)) + 1
        keep = rank <= K
        return pa.table(
            {
                "lang": pa.array(ls[keep]),
                "doc_id": pa.array(ids[keep].astype(np.int64)),
                "n_chars": pa.array(ns[keep].astype(np.int64)),
                "rk": pa.array(rank[keep].astype(np.int64)),
            }
        )

    parts = ds.map_batches(
        lambda b: topk_with_rank(b).drop_columns(["rk"]), batch_format="pyarrow"
    )
    # bounded driver-side finish: <= blocks x langs x K candidate rows
    t = pa.concat_tables(parts.iter_batches(batch_format="pyarrow"))
    return topk_with_rank(t)


SQL_TOPK_DOCS_PER_LANG = """
SELECT lang, doc_id, n_chars, rk FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents)
WHERE rk <= 3
"""


def q_intersect_signup_purchasers(sf_dir: str):
    """Set INTERSECT: users with BOTH a signup and a purchase event.
    Map-side each batch reduces to distinct (user_id, had_signup,
    had_purchase) flag rows (per-batch groupby max), then ONE tiny
    grouped max per user picks users holding both flags — the classic
    audience-overlap query, shuffled as 17-byte flag rows instead of
    raw events."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])

    def flags(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        keep = (et == "signup") | (et == "purchase")
        t = pa.table(
            {
                "user_id": pc.cast(b.column("user_id").filter(pa.array(keep)), pa.int64()),
                "s": pa.array((et[keep] == "signup").astype(np.int64)),
                "p": pa.array((et[keep] == "purchase").astype(np.int64)),
            }
        )
        return (
            t.group_by("user_id").aggregate([("s", "max"), ("p", "max")])
            .rename_columns(["user_id", "s", "p"])
        )

    from ray.data.aggregate import Max

    def both(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b.column("s"), 1), pc.equal(b.column("p"), 1))
        return b.filter(m).select(["user_id"])

    return (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("s", alias_name="s"), Max("p", alias_name="p"))
        .map_batches(both, batch_format="pyarrow")
    )


SQL_INTERSECT_SIGNUP_PURCHASERS = """
SELECT user_id FROM events WHERE event_type = 'signup'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def q_doclen_histogram(sf_dir: str):
    """Corpus length distribution in power-of-two buckets (the standard
    pre-training length histogram): bucket = floor(log2(n_chars)),
    computed exactly via the float64 exponent (``np.frexp`` — n_chars
    << 2^53 so the mantissa is exact; no log rounding at bucket
    edges), partial (bucket, count, chars) triples combined map-side,
    one tiny grouped sum. The oracle replays the bucket as
    length(bin(n)) - 1 — pure integer arithmetic on both sides."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        n = b.column("n_chars").to_numpy(zero_copy_only=False)
        n = n[n > 0]
        bucket = (np.frexp(n.astype(np.float64))[1] - 1).astype(np.int64)
        t = pa.table(
            {
                "len_bucket": pa.array(bucket),
                "n_docs": pa.array(np.ones(len(bucket), np.int64)),
                "chars": pa.array(n.astype(np.int64)),
            }
        )
        return (
            t.group_by("len_bucket")
            .aggregate([("n_docs", "sum"), ("chars", "sum")])
            .rename_columns(["len_bucket", "n_docs", "chars"])
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("len_bucket")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("chars", alias_name="chars"))
    )


SQL_DOCLEN_HISTOGRAM = """
SELECT (length(bin(n_chars)) - 1)::BIGINT AS len_bucket,
       count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS chars
FROM documents WHERE n_chars > 0 GROUP BY 1
"""


def q_mode_source_per_lang(sf_dir: str):
    """MODE aggregate: the most frequent source per language (count
    desc, source asc tiebreak). Two-level: map-side partial
    (lang, source) counts collapse each batch to at most
    langs x sources rows, one small grouped sum, then the arg-max per
    lang runs over that bounded aggregate on the driver. The shape that
    answers 'dominant domain per language bucket' without ever
    shuffling document rows."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": b.column("lang"),
                "source": b.column("source"),
                "n": pa.array(np.ones(len(b), np.int64)),
            }
        )
        return (
            t.group_by(["lang", "source"]).aggregate([("n", "sum")])
            .rename_columns(["lang", "source", "n"])
        )

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
    )
    t = pa.concat_tables(counts.iter_batches(batch_format="pyarrow"))
    if t.num_rows == 0:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    lang = t.column("lang").to_numpy(zero_copy_only=False)
    src = t.column("source").to_numpy(zero_copy_only=False)
    n = t.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((src, -n, lang))  # lang asc, count desc, source asc
    first = np.ones(len(order), dtype=bool)
    first[1:] = lang[order][1:] != lang[order][:-1]
    sel = order[first]
    return pa.table(
        {
            "lang": pa.array(lang[sel]),
            "source": pa.array(src[sel]),
            "n": pa.array(n[sel].astype(np.int64)),
        }
    )


SQL_MODE_SOURCE_PER_LANG = """
SELECT lang, source, n FROM (
  SELECT lang, source, count(*)::BIGINT AS n,
         row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, source) AS rk
  FROM documents GROUP BY lang, source)
WHERE rk = 1
"""


def q_orc_ingest_documents(sf_dir: str):
    """ORC source path (a second columnar wire format beside parquet —
    the reference's warehouse seam is format-agnostic file staging,
    ``extractors/acumatica/extractor.py:397-419``): stage documents as
    sharded ORC once (one file per input block, written task-side),
    read it back ONE TASK PER FILE via pyarrow.orc inside map_batches
    (Ray Data 2.49 has no read_orc; this is the custom-datasource-lite
    pattern — paths flow as rows, stripes decode in-task, nothing
    driver-side), and roll up per-source doc counts + char sums,
    value-verified against the parquet view."""
    rd = _rd()
    from pyarrow import orc as paorc

    stage = os.path.join(
        tempfile.gettempdir(),
        f"orc_stage_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    done = os.path.join(stage, "_STAGED")
    if not os.path.exists(done):
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage, exist_ok=True)

        def write_shard(b: pa.Table) -> pa.Table:
            # content-addressed shard name: idempotent under re-execution
            import hashlib

            h = hashlib.sha1(
                np.ascontiguousarray(
                    b.column("doc_id").to_numpy(zero_copy_only=False)
                ).tobytes()
            ).hexdigest()[:16]
            paorc.write_table(b, os.path.join(stage, f"part-{h}.orc"))
            return pa.table({"n": pa.array([len(b)], pa.int64())})

        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        ).map_batches(write_shard, batch_format="pyarrow").materialize()
        with open(done, "w") as f:
            f.write("ok")

    paths = sorted(
        os.path.join(stage, f) for f in os.listdir(stage) if f.endswith(".orc")
    )

    def read_and_reduce(b: pa.Table) -> pa.Table:
        tables = [paorc.read_table(p) for p in b.column("path").to_pylist()]
        t = pa.concat_tables(tables)
        agg = pa.table(
            {
                "source": t.column("source"),
                "n_docs": pa.array(np.ones(len(t), np.int64)),
                "chars": pc.cast(t.column("n_chars"), pa.int64()),
            }
        )
        return (
            agg.group_by("source").aggregate([("n_docs", "sum"), ("chars", "sum")])
            .rename_columns(["source", "n_docs", "chars"])
        )

    from ray.data.aggregate import Sum

    files = rd.from_arrow(pa.table({"path": pa.array(paths, pa.string())}))
    out = (
        files.repartition(max(1, len(paths)))
        .map_batches(read_and_reduce, batch_format="pyarrow", batch_size=1)
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("chars", alias_name="chars"))
    )
    return pa.concat_tables(out.iter_batches(batch_format="pyarrow"))


SQL_ORC_INGEST_DOCUMENTS = """
SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS chars
FROM documents GROUP BY source
"""


# ===================================================================
# Round-5 session 3: window functions (LAG / moving frame / NTILE) and
# exact distributed statistical aggregates (stddev / correlation).
# Reference parity: the warehouse models lean on ClickHouse window SQL
# (reference models/*.sql use lagInFrame / windowed sums); here each
# window is the coarse-hash-partition + ONE lexsort + run-boundary
# vectorized pass proven by q_running_total_orders — no per-key Python.
# ===================================================================


def gap_table(g: pa.Table, gap_col: str, forward: bool = False) -> pa.Table:
    """Per-group LAG/LEAD gap kernel, shared by `q_lag_event_gap` and
    `q_lead_event_gap` (and pinned directly by the window property
    tests): one lexsort by (user, ts, id), shifted int64-µs diff, and
    a run-boundary mask nulling the first (LAG) or last (LEAD) row of
    each user's run."""
    uid = g.column("user_id").to_numpy(zero_copy_only=False)
    eid = g.column("event_id").to_numpy(zero_copy_only=False)
    ts = g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
    us = ts.view("int64")
    order = np.lexsort((eid, us, uid))
    u, t = uid[order], us[order]
    n = len(u)
    gap = np.zeros(n, dtype=np.int64)
    edge = np.ones(n, dtype=bool)
    if n > 1:
        if forward:
            gap[:-1] = t[1:] - t[:-1]
            edge[:-1] = u[1:] != u[:-1]
        else:
            gap[1:] = t[1:] - t[:-1]
            edge[1:] = u[1:] != u[:-1]
        gap[edge] = 0
    return pa.table(
        {
            "user_id": pa.array(u),
            "event_id": pa.array(eid[order]),
            "ts": pa.array(ts[order]),
            gap_col: pa.array(gap, mask=edge),
        }
    )


def moving_frame_sums(
    keys: np.ndarray, vals: np.ndarray, preceding: int
) -> tuple[np.ndarray, np.ndarray]:
    """ROWS-frame window sums over key-sorted arrays: for each row i,
    the sum and count of vals over [max(run_start, i−preceding), i]
    within i's key run — cumsum[i+1] − cumsum[lo] with lo clamped to
    each run's start. Shared by `q_moving_avg_orders` and pinned
    directly by the window property tests. Inputs MUST already be
    sorted with keys contiguous (the callers lexsort first)."""
    n = len(keys)
    start = np.ones(n, dtype=bool)
    if n:
        start[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(start)
    lengths = np.diff(np.append(starts, n))
    run_start = np.repeat(starts, lengths)
    pos = np.arange(n, dtype=np.int64)
    lo = np.maximum(run_start, pos - preceding)
    cum = np.concatenate(([0], np.cumsum(vals)))
    return cum[pos + 1] - cum[lo], pos - lo + 1


def ntile_assign(n: int, k: int) -> np.ndarray:
    """NTILE bucket per rank position (DuckDB rule: the first n mod k
    buckets take the extra row), closed-form — shared by
    `q_ntile_customers` and pinned by the window property tests."""
    q, r = divmod(n, k)
    pos = np.arange(n, dtype=np.int64)
    if q == 0:
        return pos + 1
    thresh = r * (q + 1)
    return np.where(pos < thresh, pos // (q + 1) + 1, r + (pos - thresh) // q + 1)


def _lineitem_moment_partials(b: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    """Per-batch exact-integer moment partials over lineitem — x =
    quantity units, y = whole dollars, floor(v+0.5) matching SQL
    round()'s half-away-from-zero on .50 ties — reduced map-side to
    ≤ flags rows per batch. Shared by the Pearson-correlation and
    regression queries (one rounding/overflow rule to maintain)."""
    x = np.floor(b.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5).astype(
        np.int64
    )
    y = np.floor(
        b.column("l_extendedprice").to_numpy(zero_copy_only=False) + 0.5
    ).astype(np.int64)
    moments = {
        "n": np.ones(len(x), dtype=np.int64),
        "sx": x,
        "sy": y,
        "sxx": x * x,
        "syy": y * y,
        "sxy": x * y,
    }
    t = pa.table(
        {"l_returnflag": b.column("l_returnflag")}
        | {c: pa.array(moments[c]) for c in cols}
    )
    return (
        t.group_by("l_returnflag")
        .aggregate([(c, "sum") for c in cols])
        .rename_columns(["l_returnflag", *cols])
    )


def _lag_gaps(g: pa.Table) -> pa.Table:
    return gap_table(g, "gap_us", forward=False)


def q_lag_event_gap(sf_dir: str):
    """LAG window: microseconds since each user's PREVIOUS event
    (NULL for the first) — ``lag(ts) OVER (PARTITION BY user_id ORDER
    BY ts, event_id)``. Coarse hash partition (user_id & 255)
    co-locates each user's events; inside a partition the shared
    `gap_table` kernel (one lexsort + shifted-diff with run-boundary
    masking) computes every user's gaps vectorized. Gap stays integer
    µs end to end, emitted as an Arrow null-masked int64 like the
    as-of join, so ours and the SQL window hash bit-equal."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    return (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_lag_gaps, batch_format="pyarrow")
    )


SQL_LAG_EVENT_GAP = """
SELECT user_id, event_id, ts,
       epoch_us(ts) - lag(epoch_us(ts))
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
"""


def q_moving_avg_orders(sf_dir: str):
    """Bounded-frame window: 3-order moving average of order value per
    customer — ``avg(...) OVER (PARTITION BY o_custkey ORDER BY
    o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT
    ROW)``. Same coarse-partition single-lexsort machinery as the
    running total; the sliding frame is cumsum[i] − cumsum[lo−1] with
    lo clamped to each customer's run start, all vectorized. Integer
    cents ride the frame sum; the ONLY float op is the final
    double(cents)/(100·cnt) division, mirrored verbatim in the SQL, so
    every window value is bit-equal."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )


    def mavg(g: pa.Table) -> pa.Table:
        k = g.column("o_custkey").to_numpy(zero_copy_only=False)
        okey = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        od = g.column("o_orderdate").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        )
        cents = np.round(
            g.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.lexsort((okey, od.view("int64"), k))
        wsum, cnt = moving_frame_sums(k[order], cents[order], preceding=2)
        return pa.table(
            {
                "o_custkey": pa.array(k[order]),
                "o_orderkey": pa.array(okey[order]),
                "o_orderdate": pa.array(od[order]),
                "mavg_price": pa.array(
                    wsum.astype(np.float64) / (100.0 * cnt.astype(np.float64))
                ),
            }
        )

    return (
        ds.map_batches(_coarse_pk("o_custkey"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(mavg, batch_format="pyarrow")
    )


SQL_MOVING_AVG_ORDERS = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS DOUBLE)
         / (100.0 * count(*) OVER w) AS mavg_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def q_ntile_customers(sf_dir: str):
    """NTILE(4) per nation over customers ordered by (acctbal,
    custkey) — equal-frequency quartile assignment, the standard
    feature-bucketing window. One group per nation key (bounded ~25
    groups, each fits one task — same contract as the range join);
    inside a group the DuckDB NTILE rule (first n mod k buckets take
    the extra row) is computed closed-form from each row's rank, no
    loop. Ordering is by raw parquet doubles with custkey tiebreak, so
    no float arithmetic exists to drift."""
    import pandas as pd

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def ntile(g: pd.DataFrame) -> pd.DataFrame:
        bal = g["c_acctbal"].to_numpy()
        key = g["c_custkey"].to_numpy()
        order = np.lexsort((key, bal))
        tile = ntile_assign(len(order), 4)
        return pd.DataFrame(
            {
                "c_custkey": key[order],
                "c_nationkey": g["c_nationkey"].to_numpy()[order].astype(np.int64),
                "c_acctbal": bal[order],
                "quartile": tile.astype(np.int64),
            }
        )

    return ds.groupby("c_nationkey").map_groups(ntile, batch_format="pandas")


SQL_NTILE_CUSTOMERS = """
SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal,
       CAST(ntile(4) OVER (PARTITION BY c_nationkey
                           ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
FROM customer
"""


def q_stddev_order_status(sf_dir: str):
    """Exact distributed sample standard deviation per order status.
    Per-batch partials reduce each block to one (status, n, Σx, Σx²)
    row with x = whole DOLLARS as int64 (cents² would overflow int64
    at ~10⁵ rows per group; dollars² holds to ~sf500, i.e. ~5·10⁸
    orders — shard the group or widen to two-limb sums past that), so
    the shuffle carries
    3 tiny rows per block and the sums are order-independent exact
    integers. The final sqrt((Σx² − (Σx)²/n)/(n−1)) runs once on the
    driver with the identical operation order as the SQL, making the
    float result bit-equal, not just close."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_totalprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        # floor(x+0.5), not np.round: whole-dollar rounding hits exact
        # .50 ties, where numpy rounds half-to-even but SQL round()
        # rounds half away from zero (prices are positive)
        dollars = np.floor(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "o_orderstatus": b.column("o_orderstatus"),
                "n": pa.array(np.ones(len(dollars), dtype=np.int64)),
                "s": pa.array(dollars),
                "ss": pa.array(dollars * dollars),
            }
        )
        return (
            t.group_by("o_orderstatus")
            .aggregate([("n", "sum"), ("s", "sum"), ("ss", "sum")])
            .rename_columns(["o_orderstatus", "n", "s", "ss"])
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    s = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
    ss = t.column("ss").to_numpy(zero_copy_only=False).astype(np.float64)
    std = np.sqrt((ss - s * s / n) / (n - 1.0))
    return pa.table(
        {
            "o_orderstatus": t.column("o_orderstatus"),
            "n_orders": t.column("n"),
            "stddev_dollars": pa.array(std),
        }
    )


SQL_STDDEV_ORDER_STATUS = """
WITH p AS (
  SELECT o_orderstatus, count(*)::BIGINT AS n,
         sum(CAST(round(o_totalprice) AS BIGINT)) AS s,
         sum(CAST(round(o_totalprice) AS BIGINT)
             * CAST(round(o_totalprice) AS BIGINT)) AS ss
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, n AS n_orders,
       sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS stddev_dollars
FROM p
"""


def q_corr_qty_price(sf_dir: str):
    """Exact distributed Pearson correlation of quantity vs extended
    price per return flag. Same shape as the stddev: per-batch
    partials carry (flag, n, Σx, Σy, Σx², Σy², Σxy) as int64 (x =
    quantity units, y = whole dollars — the worst product y²·rows
    stays < 2⁶³ past sf100), one tiny grouped sum merges them, and
    the closed-form corr is evaluated once with the same float
    operation order as the SQL so the doubles match bit-for-bit."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    import functools

    cols = ("n", "sx", "sy", "sxx", "syy", "sxy")
    out = (
        ds.map_batches(
            functools.partial(_lineitem_moment_partials, cols=cols),
            batch_format="pyarrow",
        )
        .groupby("l_returnflag")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    f = {
        c: t.column(c).to_numpy(zero_copy_only=False).astype(np.float64) for c in cols
    }
    num = f["sxy"] - f["sx"] * f["sy"] / f["n"]
    den = np.sqrt(
        (f["sxx"] - f["sx"] * f["sx"] / f["n"])
        * (f["syy"] - f["sy"] * f["sy"] / f["n"])
    )
    return pa.table(
        {
            "l_returnflag": t.column("l_returnflag"),
            "n_lines": t.column("n"),
            "corr_qty_price": pa.array(num / den),
        }
    )


SQL_CORR_QTY_PRICE = """
WITH p AS (
  SELECT l_returnflag, count(*)::BIGINT AS n,
         sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
         sum(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
         sum(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_quantity) AS BIGINT)) AS sxx,
         sum(CAST(round(l_extendedprice) AS BIGINT)
             * CAST(round(l_extendedprice) AS BIGINT)) AS syy,
         sum(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n AS n_lines,
       (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        / CAST(n AS DOUBLE))
       / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
               / CAST(n AS DOUBLE))
              * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                 / CAST(n AS DOUBLE))) AS corr_qty_price
FROM p
"""


def q_except_silent_customers(sf_dir: str):
    """Cross-table set EXCEPT: customers with NO event activity —
    the INTERSECT query's complement, same shape across two tables:
    each side map-reduces its batches to distinct tagged key rows
    (customer keys tag c=1, event users tag e=1), one tiny grouped Max
    unions them, and the EXCEPT is the c=1 ∧ e=0 filter. Neither table
    rides the shuffle — only ~17-byte flag rows — so the shape holds
    when both sides are 100 TB."""
    rd = _rd()
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def tag(col: str, is_cust: int):
        def fn(b: pa.Table) -> pa.Table:
            keys = np.unique(b.column(col).to_numpy(zero_copy_only=False))
            one = np.full(len(keys), is_cust, dtype=np.int64)
            return pa.table(
                {
                    "key": pa.array(keys.astype(np.int64)),
                    "c": pa.array(one),
                    "e": pa.array(1 - one),
                }
            )

        return fn

    from ray.data.aggregate import Max

    def only_cust(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b.column("c"), 1), pc.equal(b.column("e"), 0))
        return pa.table({"c_custkey": b.filter(m).column("key")})

    tagged = cust.map_batches(tag("c_custkey", 1), batch_format="pyarrow").union(
        ev.map_batches(tag("user_id", 0), batch_format="pyarrow")
    )
    return (
        tagged.groupby("key")
        .aggregate(Max("c", alias_name="c"), Max("e", alias_name="e"))
        .map_batches(only_cust, batch_format="pyarrow")
    )


SQL_EXCEPT_SILENT_CUSTOMERS = """
SELECT c_custkey FROM customer
EXCEPT
SELECT user_id FROM events
"""


def q_unpivot_lineitem(sf_dir: str):
    """Distributed UNPIVOT (wide → long): each lineitem row's four
    measure columns melt into four (key, metric, value) rows. Melting
    is per-batch and shuffle-free — a batch of n rows emits one long
    table of 4n rows built from four zero-copy column slices plus a
    dictionary-cheap repeated metric label; no row loop, no exchange,
    and the values are the raw parquet doubles untouched."""
    rd = _rd()
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber"] + measures,
    )

    def melt(b: pa.Table) -> pa.Table:
        n = b.num_rows
        lnum = pc.cast(b.column("l_linenumber"), pa.int64())
        parts = []
        for m in measures:
            # constant string column via C kernels (fill_null on a null
            # array) — a np.full object array costs a Python object per
            # row and dominated this stage's profile
            parts.append(
                pa.table(
                    {
                        "l_orderkey": b.column("l_orderkey"),
                        "l_linenumber": lnum,
                        "metric": pc.fill_null(pa.nulls(n, pa.string()), m),
                        "value": pc.cast(b.column(m), pa.float64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


SQL_UNPIVOT_LINEITEM = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       'l_quantity' AS metric, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_extendedprice', l_extendedprice
FROM lineitem
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_discount', l_discount
FROM lineitem
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_tax', l_tax FROM lineitem
"""


def q_string_agg_segments(sf_dir: str):
    """Grouped string aggregation: the sorted, comma-joined distinct
    market segments present per nation. Map-side per-batch distinct
    pairs collapse the input to ≤ nations×segments rows before the
    shuffle; the bounded key space (~25 nations) then uses the
    group-fits-one-task contract, where each group's join is one
    sorted-unique + str.join. The heavy table never leaves its blocks."""
    import pandas as pd

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_mktsegment"]
    )

    def distinct_pairs(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
                "seg": b.column("c_mktsegment"),
            }
        )
        return t.group_by(["c_nationkey", "seg"]).aggregate([])

    def join_segs(g: pd.DataFrame) -> pd.DataFrame:
        segs = sorted(set(g["seg"]))
        return pd.DataFrame(
            {
                "c_nationkey": [int(g["c_nationkey"].iloc[0])],
                "segments": [",".join(segs)],
                "n_segments": [len(segs)],
            }
        )

    return (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("c_nationkey")
        .map_groups(join_segs, batch_format="pandas")
    )


SQL_STRING_AGG_SEGMENTS = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       string_agg(seg, ',' ORDER BY seg) AS segments,
       count(*)::BIGINT AS n_segments
FROM (SELECT DISTINCT c_nationkey, c_mktsegment AS seg FROM customer)
GROUP BY c_nationkey
"""


def q_date_spine_events(sf_dir: str):
    """Gap-filled daily counts (date spine): events per calendar day
    with ZERO rows materialized for silent days — the standard
    freshness/completeness series a warehouse model builds over a
    generate_series spine. The count is a distributed partial
    aggregate (each batch pre-reduces to ≤ distinct-days rows); only
    the tiny (day, n) table reaches the driver, where the spine is an
    np.arange over [min, max] day — O(date-range), independent of row
    count."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def per_day(b: pa.Table) -> pa.Table:
        days = (
            b.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
        )
        u, c = np.unique(days, return_counts=True)
        return pa.table(
            {"day": pa.array(u.astype("datetime64[us]")), "n": pa.array(c)}
        )

    out = (
        ds.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    day = t.column("day").to_numpy(zero_copy_only=False).astype("datetime64[D]")
    n = t.column("n").to_numpy(zero_copy_only=False)
    spine = np.arange(day.min(), day.max() + np.timedelta64(1, "D"))
    filled = np.zeros(len(spine), dtype=np.int64)
    filled[(day - spine[0]).astype(np.int64)] = n
    return pa.table(
        {"day": pa.array(spine.astype("datetime64[us]")), "n_events": pa.array(filled)}
    )


SQL_DATE_SPINE_EVENTS = """
WITH b AS (SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
           FROM events),
d AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS TIMESTAMP) AS day
      FROM b),
c AS (SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, count(*)::BIGINT AS n
      FROM events GROUP BY 1)
SELECT d.day, COALESCE(c.n, 0)::BIGINT AS n_events
FROM d LEFT JOIN c USING (day)
"""


BROADCAST_SEMI_MAX_KEYS = 50_000_000  # ≈400 MB of int64 keys per worker


def q_semi_join_orders_building(sf_dir: str, strategy: str = "auto"):
    """SEMI-join (EXISTS) with an automatic strategy switch: revenue
    by priority for orders whose customer sits in the BUILDING
    segment. The dimension side is filtered map-side to distinct keys;
    if the surviving key count fits a worker heap
    (``BROADCAST_SEMI_MAX_KEYS``), the sorted int64 array is ray.put
    ONCE and probed per batch with np.isin — zero shuffle of the fact
    table. Past that bound (a 100-TB dimension) the same distinct-key
    dataset instead feeds the antijoin's left_outer hash join with the
    null-marker test INVERTED — both paths produce identical rows
    (``TestSemiJoinStrategies``). The small count() pass that picks
    the strategy scans only the pruned dimension column. Revenue stays
    integer cents until the single final division, mirrored in the
    SQL."""
    import ray
    from ray.data.aggregate import Sum

    rd = _rd()
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def building_keys(b: pa.Table) -> pa.Table:
        keys = b.filter(
            pc.equal(b.column("c_mktsegment"), pa.scalar("BUILDING"))
        ).column("c_custkey")
        return pa.table({"k": np.unique(keys.to_numpy(zero_copy_only=False))})

    key_ds = cust.map_batches(building_keys, batch_format="pyarrow")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    )

    if strategy == "auto":
        # pin the pruned key dataset so the count and the consuming
        # path share one scan (file convention: any dataset consumed
        # twice is materialized); count() over per-batch-distinct rows
        # is an UPPER bound on global distinct keys, so broadcast is
        # chosen only when even the overcount fits a worker heap
        key_ds = key_ds.materialize()
        strategy = (
            "broadcast"
            if key_ds.count() <= BROADCAST_SEMI_MAX_KEYS
            else "shuffle"
        )

    if strategy == "shuffle":
        from ray.data.aggregate import Count

        from ..stages.typed import with_schema

        distinct = with_schema(
            key_ds.groupby("k").aggregate(Count(alias_name="n_hits")),
            pa.schema([("k", pa.int64()), ("n_hits", pa.int64())]),
        )
        n_parts = max(
            8,
            min(
                int(ray.cluster_resources().get("CPU", 8)),
                2 * len(orders.input_files()),
            ),
        )
        joined = orders.join(
            distinct,
            join_type="left_outer",
            num_partitions=n_parts,
            on=("o_custkey",),
            right_on=("k",),
        )

        def keep_hit(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b.column("n_hits")))
            cents = np.round(
                b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            t = pa.table(
                {
                    "o_orderpriority": b.column("o_orderpriority"),
                    "n": pa.array(np.ones(len(cents), dtype=np.int64)),
                    "cents": pa.array(cents),
                }
            )
            return (
                t.group_by("o_orderpriority")
                .aggregate([("n", "sum"), ("cents", "sum")])
                .rename_columns(["o_orderpriority", "n", "cents"])
            )

        out = (
            joined.map_batches(keep_hit, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(
                Sum("n", alias_name="n_orders"), Sum("cents", alias_name="cents")
            )
        )
        t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
        rev = pc.divide(pc.cast(t.column("cents"), pa.float64()), 100.0)
        return t.drop(["cents"]).append_column("revenue", rev)

    key_parts = [
        t.column("k").to_numpy(zero_copy_only=False)
        for t in key_ds.iter_batches(batch_format="pyarrow")
    ]
    keys_ref = ray.put(np.sort(np.unique(np.concatenate(key_parts))))

    class SemiAgg:
        def __init__(self, ref):
            self.keys = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            hit = np.isin(
                b.column("o_custkey").to_numpy(zero_copy_only=False),
                self.keys,
                assume_unique=False,
            )
            b = b.filter(pa.array(hit))
            cents = np.round(
                b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            t = pa.table(
                {
                    "o_orderpriority": b.column("o_orderpriority"),
                    "n": pa.array(np.ones(len(cents), dtype=np.int64)),
                    "cents": pa.array(cents),
                }
            )
            return (
                t.group_by("o_orderpriority")
                .aggregate([("n", "sum"), ("cents", "sum")])
                .rename_columns(["o_orderpriority", "n", "cents"])
            )

    out = (
        orders.map_batches(
            SemiAgg,
            fn_constructor_args=(keys_ref,),
            concurrency=(1, 8),
            batch_format="pyarrow",
        )
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n_orders"), Sum("cents", alias_name="cents"))
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    rev = pc.divide(pc.cast(t.column("cents"), pa.float64()), 100.0)
    return t.drop(["cents"]).append_column("revenue", rev)


SQL_SEMI_JOIN_ORDERS_BUILDING = """
SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
GROUP BY o_orderpriority
"""


def q_first_last_event(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE windows collapsed to one row per key:
    each user's first event type, last event type, and event count in
    (ts, event_id) order. Coarse hash partition + ONE lexsort, then
    run boundaries pick both window extremes per user with pure
    indexing — the distinct-over-window SQL costs n² worst case in a
    naive engine; here it is O(n log n) in-partition and the shuffle
    carries the raw rows once."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    )


    def extremes(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        us = (
            g.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view("int64")
        )
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        u, t = uid[order], et[order]
        n = len(u)
        start = np.ones(n, dtype=bool)
        start[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(start)
        ends = np.append(starts[1:], n) - 1
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "first_type": pa.array(t[starts], pa.string()),
                "last_type": pa.array(t[ends], pa.string()),
                "n_events": pa.array(np.diff(np.append(starts, n))),
            }
        )

    return (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(extremes, batch_format="pyarrow")
    )


SQL_FIRST_LAST_EVENT = """
SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING) AS last_type,
       CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_rank_customers_acctbal(sf_dir: str):
    """RANK and DENSE_RANK with REAL tie semantics: customers ranked
    by account balance (descending) within nation, ties sharing a rank
    (rank skips, dense_rank doesn't). One group per nation key (same
    bounded-group contract as NTILE); inside a group the sort is by
    the raw parquet doubles (no arithmetic to drift) and both ranks
    fall out of one value-change flag scan."""
    import pandas as pd

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        bal = g["c_acctbal"].to_numpy()
        key = g["c_custkey"].to_numpy()
        order = np.lexsort((key, -bal))
        b = bal[order]
        n = len(b)
        new = np.ones(n, dtype=bool)
        new[1:] = b[1:] != b[:-1]
        rnk = np.maximum.accumulate(np.where(new, np.arange(n) + 1, 0))
        drnk = np.cumsum(new)
        return pd.DataFrame(
            {
                "c_custkey": key[order],
                "c_nationkey": g["c_nationkey"].to_numpy()[order].astype(np.int64),
                "c_acctbal": b,
                "rnk": rnk.astype(np.int64),
                "drnk": drnk.astype(np.int64),
            }
        )

    return ds.groupby("c_nationkey").map_groups(ranks, batch_format="pandas")


SQL_RANK_CUSTOMERS_ACCTBAL = """
SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
"""


def q_percent_rank_customers(sf_dir: str):
    """PERCENT_RANK and CUME_DIST: each customer's relative standing
    by balance within nation — (rank−1)/(n−1) and rows-≤-current/n,
    both honoring ties (every member of a tie shares one percent_rank
    and one cume_dist). Same bounded-group + single value-change scan
    as RANK; cume_dist's numerator is each tie run's END boundary,
    found by one reverse maximum-accumulate. Both divisions run in the
    oracle's op order on exact integers, so the doubles hash equal."""
    import pandas as pd

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def pranks(g: pd.DataFrame) -> pd.DataFrame:
        bal = g["c_acctbal"].to_numpy()
        key = g["c_custkey"].to_numpy()
        order = np.lexsort((key, bal))
        b = bal[order]
        n = len(b)
        new = np.ones(n, dtype=bool)
        new[1:] = b[1:] != b[:-1]
        rnk = np.maximum.accumulate(np.where(new, np.arange(n) + 1, 0))
        # end of each tie run = the next run's start (or n for the last)
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        ends = np.append(starts[1:], n)[run_id]
        pr = (
            (rnk - 1).astype(np.float64) / float(n - 1)
            if n > 1
            else np.zeros(n, dtype=np.float64)
        )
        return pd.DataFrame(
            {
                "c_custkey": key[order],
                "c_nationkey": g["c_nationkey"].to_numpy()[order].astype(np.int64),
                "c_acctbal": b,
                "pct_rank": pr,
                "cume_dist": ends.astype(np.float64) / float(n),
            }
        )

    return ds.groupby("c_nationkey").map_groups(pranks, batch_format="pandas")


SQL_PERCENT_RANK_CUSTOMERS = """
SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
"""


def q_debounce_events(sf_dir: str):
    """Proximity dedup (debounce): drop events that repeat the same
    (user, type) within 60 s of the PREVIOUS such event — the standard
    click-stream de-noising rule. Same coarse-partition single-lexsort
    machinery as LAG, with runs keyed on the composite (user, type)
    boundary; the keep mask is one vectorized compare, and the time
    arithmetic stays integer µs so membership is bit-stable."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )


    def debounce(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        us = ts.view("int64")
        order = np.lexsort((eid, us, et, uid))
        u, e, t = uid[order], et[order], us[order]
        n = len(u)
        first = np.ones(n, dtype=bool)
        if n:
            first[1:] = (u[1:] != u[:-1]) | (e[1:] != e[:-1])
        gap = np.zeros(n, dtype=np.int64)
        if n > 1:
            gap[1:] = t[1:] - t[:-1]
        keep = first | (gap > 60_000_000)
        return pa.table(
            {
                "event_id": pa.array(eid[order][keep]),
                "user_id": pa.array(u[keep]),
                "ts": pa.array(ts[order][keep]),
            }
        )

    return (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(debounce, batch_format="pyarrow")
    )


SQL_DEBOUNCE_EVENTS = """
SELECT event_id, user_id, ts FROM (
  SELECT event_id, user_id, ts,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id, event_type
                 ORDER BY ts, event_id) AS gap
  FROM events)
WHERE gap IS NULL OR gap > 60000000
"""


def q_filtered_agg_customers(sf_dir: str):
    """Conditional aggregates (the SQL FILTER clause): per nation,
    total customers, customers with balance > 5000, and their share.
    Map-side each batch pre-reduces to ≤ nations rows carrying both
    the unconditional and the predicate-gated counts (one boolean sum
    — no second scan), so the FILTER costs nothing extra at 100 TB;
    the share division runs in the oracle's op order."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )

    def partial(b: pa.Table) -> pa.Table:
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
                "n": pa.array(np.ones(len(bal), dtype=np.int64)),
                "rich": pa.array((bal > 5000.0).astype(np.int64)),
            }
        )
        return (
            t.group_by("c_nationkey")
            .aggregate([("n", "sum"), ("rich", "sum")])
            .rename_columns(["c_nationkey", "n", "rich"])
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("n", alias_name="n_customers"), Sum("rich", alias_name="n_rich"))
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    share = pc.divide(
        pc.cast(t.column("n_rich"), pa.float64()),
        pc.cast(t.column("n_customers"), pa.float64()),
    )
    return t.append_column("rich_share", share)


SQL_FILTERED_AGG_CUSTOMERS = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       count(*)::BIGINT AS n_customers,
       count(*) FILTER (WHERE c_acctbal > 5000)::BIGINT AS n_rich,
       CAST(count(*) FILTER (WHERE c_acctbal > 5000) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS rich_share
FROM customer GROUP BY c_nationkey
"""


def q_mad_event_value(sf_dir: str):
    """Median absolute deviation — the robust dispersion statistic —
    as TWO exact distributed quantile passes (ops/quantiles.py's
    histogram rank-finding; no global sort either pass): median m of
    value, then the median of |value − m| over a derived column. Both
    medians are actual column elements (quantile_disc semantics), and
    the |v − m| doubles are computed identically on both sides, so the
    result is bit-exact, not approximate."""
    from ..ops.quantiles import quantiles_exact

    rd = _rd()
    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["value"])
    med = float(quantiles_exact(ds, "value", qs=(0.5,)).column("value")[0].as_py())

    def absdev(b: pa.Table) -> pa.Table:
        # drop nulls HERE: to_numpy turns them into NaN floats, which
        # the quantile pass cannot drop_null (oracle: WHERE NOT NULL)
        v = b.drop_null().column("value").to_numpy(zero_copy_only=False)
        return pa.table({"ad": pa.array(np.abs(v - med))})

    dev = rd.read_parquet(path, columns=["value"]).map_batches(
        absdev, batch_format="pyarrow"
    )
    mad = float(quantiles_exact(dev, "ad", qs=(0.5,)).column("value")[0].as_py())
    return pa.table(
        {"median": pa.array([med], pa.float64()), "mad": pa.array([mad], pa.float64())}
    )


SQL_MAD_EVENT_VALUE = """
WITH m AS (SELECT quantile_disc(value, 0.5) AS md FROM events
           WHERE value IS NOT NULL),
d AS (SELECT abs(value - (SELECT md FROM m)) AS ad FROM events
      WHERE value IS NOT NULL)
SELECT (SELECT md FROM m)::DOUBLE AS median,
       quantile_disc(ad, 0.5)::DOUBLE AS mad
FROM d
"""


def q_active_users_events(sf_dir: str):
    """DAU + trailing-7-day WAU: per calendar day, the exact distinct
    user counts for that day and for the 7-day window ending on it —
    the canonical engagement series, which naive SQL computes by
    re-scanning the fact table per day. Here ONE pass reduces batches
    to distinct (day, user) pairs (map-side set partial); the window
    is a 7× np.repeat EXPANSION of those tiny pairs (days × users
    rows, independent of event count), deduped by the same grouped
    pass. Nothing but pairs ever shuffles."""
    from ray.data.aggregate import Count

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def day_pairs(b: pa.Table) -> pa.Table:
        days = (
            b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[D]")
        ).view("int64")
        users = b.column("user_id").to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([days, users], axis=1), axis=0)
        return pa.table({"day": pa.array(pairs[:, 0]), "user_id": pa.array(pairs[:, 1])})

    pairs = (
        ds.map_batches(day_pairs, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="_n"))
    )

    def expand(b: pa.Table) -> pa.Table:
        day = b.column("day").to_numpy(zero_copy_only=False)
        usr = b.column("user_id").to_numpy(zero_copy_only=False)
        win = np.repeat(day, 7) + np.tile(np.arange(7, dtype=np.int64), len(day))
        return pa.table(
            {
                "day": pa.array(win),
                "user_id": pa.array(np.repeat(usr, 7)),
                "is_today": pa.array(
                    (np.tile(np.arange(7, dtype=np.int64), len(day)) == 0).astype(
                        np.int64
                    )
                ),
            }
        )

    from ray.data.aggregate import Max, Sum

    windowed = (
        pairs.map_batches(expand, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Max("is_today", alias_name="is_today"))
        .map_batches(
            lambda b: (
                b.group_by("day")
                .aggregate([("is_today", "sum"), ("user_id", "count")])
                .rename_columns(["day", "dau", "wau"])
            ),
            batch_format="pyarrow",
        )
        .groupby("day")
        .aggregate(Sum("dau", alias_name="dau"), Sum("wau", alias_name="wau"))
    )
    t = pa.concat_tables(windowed.iter_batches(batch_format="pyarrow"))
    # the expansion manufactures up to 6 trailing window-days past real
    # data; a day is real iff some pair has is_today=1 there (dau > 0)
    t = t.filter(pc.greater(t.column("dau"), 0))
    return pa.table(
        {
            "day": pa.array(
                t.column("day")
                .to_numpy(zero_copy_only=False)
                .view("datetime64[D]")
                .astype("datetime64[us]")
            ),
            "dau": t.column("dau"),
            "wau": t.column("wau"),
        }
    )


SQL_ACTIVE_USERS_EVENTS = """
WITH p AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM p)
SELECT CAST(d.day AS TIMESTAMP) AS day,
       count(DISTINCT CASE WHEN p.day = d.day THEN p.user_id END)::BIGINT AS dau,
       count(DISTINCT p.user_id)::BIGINT AS wau
FROM days d
JOIN p ON p.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
"""


def q_sliding_window_counts(sf_dir: str):
    """SLIDING (hopping) window aggregate — 1-hour windows sliding
    every 15 minutes: each event belongs to 4 overlapping windows, so
    the batch EXPANDS 4× into (window_start, 1) rows map-side and one
    grouped sum finishes. Completes the window triad (tumbling =
    `windowed_event_counts`, session = `sessionize_events`). Window
    membership is pure integer µs arithmetic — the last aligned slide
    at-or-before ts, then 3 earlier slides, windows clipped to those
    actually covering the event (always 4 here since 4×15 m = 1 h)."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    SLIDE = 15 * 60 * 1_000_000  # 15 min in µs
    K = 4  # windows covering each event (1h / 15min)

    def expand(b: pa.Table) -> pa.Table:
        us = (
            b.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view("int64")
        )
        anchor = (us // SLIDE) * SLIDE
        starts = np.repeat(anchor, K) - np.tile(
            np.arange(K, dtype=np.int64) * SLIDE, len(us)
        )
        u, c = np.unique(starts, return_counts=True)
        return pa.table(
            {"window_start": pa.array(u), "n": pa.array(c.astype(np.int64))}
        )

    out = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n", alias_name="n_events"))
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return pa.table(
        {
            "window_start": pa.array(
                t.column("window_start")
                .to_numpy(zero_copy_only=False)
                .view("datetime64[us]")
            ),
            "n_events": t.column("n_events"),
        }
    )


SQL_SLIDING_WINDOW_COUNTS = """
WITH e AS (
  -- time_bucket FLOORS (also pre-epoch), matching numpy's // which
  -- floors toward -inf; a bare epoch_us // slide would TRUNCATE
  -- toward zero and shift pre-1970 events one slide up
  SELECT epoch_us(time_bucket(INTERVAL '15 minutes', ts)) AS anchor FROM events
), w AS (
  SELECT anchor - CAST(s.i AS BIGINT) * 900000000 AS ws
  FROM e, (SELECT unnest([0, 1, 2, 3]) AS i) s
)
SELECT make_timestamp(ws) AS window_start, count(*)::BIGINT AS n_events
FROM w GROUP BY ws
"""


def q_regression_slope(sf_dir: str):
    """Grouped simple linear regression (price explained by quantity,
    per return flag): slope and intercept from the SAME exact int64
    (n, Σx, Σy, Σx², Σxy) partials as the Pearson query — 3 tiny rows
    per block on the shuffle, closed form evaluated once in the
    oracle's float op order. slope = (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²),
    intercept = (Σy − slope·Σx)/n; n·Σxy ≈ 10⁹·10¹² overflows int64,
    so the numerators are combined in DOUBLES of exact ints on both
    sides (deterministic — same two products, same subtraction)."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    import functools

    cols = ("n", "sx", "sy", "sxx", "sxy")
    out = (
        ds.map_batches(
            functools.partial(_lineitem_moment_partials, cols=cols),
            batch_format="pyarrow",
        )
        .groupby("l_returnflag")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    f = {
        c: t.column(c).to_numpy(zero_copy_only=False).astype(np.float64) for c in cols
    }
    slope = (f["n"] * f["sxy"] - f["sx"] * f["sy"]) / (
        f["n"] * f["sxx"] - f["sx"] * f["sx"]
    )
    intercept = (f["sy"] - slope * f["sx"]) / f["n"]
    return pa.table(
        {
            "l_returnflag": t.column("l_returnflag"),
            "n_lines": t.column("n"),
            "slope": pa.array(slope),
            "intercept": pa.array(intercept),
        }
    )


SQL_REGRESSION_SLOPE = """
WITH p AS (
  SELECT l_returnflag, count(*)::BIGINT AS n,
         sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
         sum(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
         sum(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_quantity) AS BIGINT)) AS sxx,
         sum(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n AS n_lines,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
       (CAST(sy AS DOUBLE)
        - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
          * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
FROM p
"""


def q_char_entropy_documents(sf_dir: str):
    """Per-document character-entropy quality signal (ops/text.
    char_entropy): the gibberish / low-diversity filter every webtext
    cleaning recipe runs alongside the Gopher battery. Shuffle-free
    vectorized map over pruned columns; integer micro-nat sums keep the
    DuckDB twin value-exact (see the op's determinism contract)."""
    from ..ops.text import char_entropy

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def ent(b: pa.Table) -> pa.Table:
        return char_entropy(b).drop(["text"])

    return ds.map_batches(ent, batch_format="pyarrow")


SQL_CHAR_ENTROPY_DOCUMENTS = """
WITH pos AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
  FROM documents
), counts AS (
  SELECT doc_id, substr(text, i, 1) AS ch, COUNT(*)::BIGINT AS n
  FROM pos GROUP BY doc_id, substr(text, i, 1)
), per_doc AS (
  SELECT doc_id,
         SUM(n)::BIGINT AS n_cp,
         COUNT(*)::BIGINT AS n_distinct_chars,
         SUM(n * CAST(floor(ln(n) * 1e6) AS BIGINT))::BIGINT AS sub
  FROM counts GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_cp, 0) AS n_cp,
       COALESCE(p.n_distinct_chars, 0) AS n_distinct_chars,
       CASE WHEN COALESCE(p.n_cp, 0) > 0
            THEN CAST(p.n_cp * CAST(floor(ln(p.n_cp) * 1e6) AS BIGINT)
                      - p.sub AS DOUBLE)
                 / CAST(p.n_cp * 1000000 AS DOUBLE)
            ELSE 0.0 END AS char_entropy
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def q_winsorized_mean_events(sf_dir: str):
    """Per-event-type winsorized mean: clip values at the group's exact
    p10/p90 (quantile_disc order statistics — the shared-histogram
    grouped-quantile op, constant passes regardless of group count),
    then ONE zero-shuffle clip + integer-cent sum pass with the tiny
    (group → bounds) map broadcast in the task closure. The standard
    robust-mean rollup for metric pipelines where a few runaway values
    (bot sessions, logging bugs) would otherwise dominate a plain AVG.
    Determinism: cents = round(value·100) AFTER clipping — clip bounds
    are actual data values, round is monotone, and the final division
    runs in the oracle's float op order."""
    from ray.data.aggregate import Count, Sum

    from ..ops.quantiles import grouped_quantiles

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    qt = grouped_quantiles(ds, "value", "event_type", qs=(0.1, 0.9), n_bins=256)
    bounds: dict[str, list[float]] = {}
    for g, q, v in zip(
        qt.column("event_type").to_pylist(),
        qt.column("q").to_pylist(),
        qt.column("value").to_pylist(),
    ):
        bounds.setdefault(g, [0.0, 0.0])[0 if q == 0.1 else 1] = v

    def clip_cents(b: pa.Table) -> pa.Table:
        gv = b.column("event_type").to_numpy(zero_copy_only=False)
        vv = b.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(vv)
        lo = np.empty(len(gv))
        hi = np.empty(len(gv))
        for g in np.unique(gv):
            gb = bounds.get(g)
            if gb is None:  # group with no non-null value anywhere
                ok[gv == g] = False
                continue
            m = gv == g
            lo[m], hi[m] = gb
        clipped = np.minimum(np.maximum(vv, lo), hi)
        cents = np.zeros(len(gv), np.int64)
        cents[ok] = np.round(clipped[ok] * 100.0).astype(np.int64)
        return pa.table(
            {
                "event_type": b.column("event_type").filter(pa.array(ok)),
                "_cents": pa.array(cents[ok]),
            }
        )

    out = (
        ds.map_batches(clip_cents, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n_events"), Sum("_cents", alias_name="_cents"))
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    s = t.column("_cents").to_numpy(zero_copy_only=False).astype(np.float64)
    n = t.column("n_events").to_numpy(zero_copy_only=False)
    wm = pa.array(s / (100.0 * n), pa.float64())
    return t.drop(["_cents"]).append_column("winsor_mean", wm)


SQL_WINSORIZED_MEAN_EVENTS = """
WITH b AS (
  SELECT event_type,
         quantile_disc(value, 0.1) AS lo,
         quantile_disc(value, 0.9) AS hi
  FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT e.event_type,
       count(*)::BIGINT AS n_events,
       CAST(sum(CAST(round(least(greatest(e.value, b.lo), b.hi) * 100)
                     AS BIGINT)) AS DOUBLE)
       / (100.0 * count(*)) AS winsor_mean
FROM events e JOIN b USING (event_type)
WHERE e.value IS NOT NULL
GROUP BY e.event_type
"""


def q_quantile_cont_events(sf_dir: str):
    """Per-event-type ANSI PERCENTILE_CONT (p25/p50/p75): both
    bracketing order statistics resolve through the shared-histogram
    grouped-quantile machinery (constant passes regardless of group
    count), then the textbook interpolation v_lo·(⌈h⌉−h)+v_hi·(h−⌊h⌋)
    with h=(n−1)·q. The oracle replays that exact expression from
    row_number order statistics rather than calling DuckDB's
    quantile_cont aggregate, whose internal evaluation wobbles ≤3 ulp
    off any closed formula (measured on 1.0.0) — the explicit
    interpolation IS the ANSI definition, mirrored op for op."""
    from ..ops.quantiles import grouped_quantiles

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_quantiles(
        ds, "value", "event_type", qs=(0.25, 0.5, 0.75), n_bins=256, interp="cont"
    )


SQL_QUANTILE_CONT_EVENTS = """
WITH v AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
), spec AS (
  SELECT event_type, n, q, CAST(n - 1 AS DOUBLE) * q AS h
  FROM (SELECT DISTINCT event_type, n FROM v)
  CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75])::DOUBLE AS q)
), j AS (
  SELECT s.event_type, s.q, s.h, lo.value AS vlo, hi.value AS vhi
  FROM spec s
  JOIN v lo ON lo.event_type = s.event_type
           AND lo.rk = CAST(floor(s.h) AS BIGINT) + 1
  JOIN v hi ON hi.event_type = s.event_type
           AND hi.rk = CAST(ceil(s.h) AS BIGINT) + 1
)
SELECT event_type, q,
       CASE WHEN floor(h) = ceil(h) THEN vlo
            ELSE vlo * (ceil(h) - h) + vhi * (h - floor(h)) END AS value
FROM j ORDER BY event_type, q
"""


def q_ttr_documents(sf_dir: str):
    """Per-document type-token ratio (ops/text.type_token_ratio): the
    lexical-diversity quality filter. Shuffle-free vectorized map over
    pruned columns; token identity is the canonical poly64 hash so the
    DuckDB twin's COUNT(DISTINCT) replays value-exact."""
    from ..ops.text import type_token_ratio

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def ttr(b: pa.Table) -> pa.Table:
        return type_token_ratio(b).drop(["text"])

    return ds.map_batches(ttr, batch_format="pyarrow")


SQL_TTR_DOCUMENTS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), t AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
h AS (SELECT doc_id, {poly} AS v FROM t),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         count(DISTINCT v)::BIGINT AS n_types
  FROM h GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.n_types, 0) AS n_types,
       CASE WHEN COALESCE(a.n_tokens, 0) > 0
            THEN CAST(a.n_types AS DOUBLE) / a.n_tokens
            ELSE 0.0 END AS ttr
FROM documents d LEFT JOIN agg a USING (doc_id)
"""
SQL_TTR_DOCUMENTS = SQL_TTR_DOCUMENTS.format(poly=hash_sql.poly64_expr("tok"))


def q_dup_ratio_by_source(sf_dir: str):
    """Per-source exact-duplicate audit: n_docs, distinct normalized
    fingerprints, and the dup ratio — the first number a curation run
    reports per crawl/source. Per-batch fingerprints (the shared
    poly64 kernel) pre-reduce to distinct (source, fp, count) partials
    before ONE pair groupby, then a tiny per-source rollup; no driver
    materialization of the fingerprint table at any point."""
    from ray.data.aggregate import Count, Sum

    from ..ops.text import doc_fingerprint

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def fp_pairs(b: pa.Table) -> pa.Table:
        t = doc_fingerprint(b, "text").select(["source", "fingerprint"])
        return t.group_by(["source", "fingerprint"]).aggregate([("fingerprint", "count")])

    pairs = (
        ds.map_batches(fp_pairs, batch_format="pyarrow")
        .groupby(["source", "fingerprint"])
        .aggregate(Sum("fingerprint_count", alias_name="cnt"))
    )
    out = pa.concat_tables(
        pairs.groupby("source")
        .aggregate(Count(alias_name="n_distinct"), Sum("cnt", alias_name="n_docs"))
        .iter_batches(batch_format="pyarrow")
    )
    n = out.column("n_docs").to_numpy(zero_copy_only=False)
    d = out.column("n_distinct").to_numpy(zero_copy_only=False)
    ratio = pa.array((n - d) / n, pa.float64())
    return out.select(["source", "n_docs", "n_distinct"]).append_column(
        "dup_ratio", ratio
    )


SQL_DUP_RATIO_BY_SOURCE = """
WITH f AS ({fp})
SELECT d.source,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT f.fingerprint)::BIGINT AS n_distinct,
       CAST(count(*) - count(DISTINCT f.fingerprint) AS DOUBLE) / count(*)
         AS dup_ratio
FROM documents d JOIN f USING (doc_id)
GROUP BY d.source
"""
SQL_DUP_RATIO_BY_SOURCE = SQL_DUP_RATIO_BY_SOURCE.format(
    fp=hash_sql.fingerprint_sql("documents")
)


def q_benford_orders(sf_dir: str):
    """Benford first-significant-digit audit over order totals — the
    classic fraud / synthetic-data screen. The leading digit comes
    from pure int64 arithmetic (cents = floor(x·100+0.5), then integer
    division by 10 until < 10 — a loop over DIGITS, not rows), one
    9-bucket bincount partial per batch, one tiny groupby. Rows whose
    cent value is ≤ 0 have no first SIGNIFICANT digit and are excluded
    on BOTH sides (Benford is defined over positive magnitudes).
    Expected Benford mass ln(1+1/d)/ln(10) is computed in the oracle's
    exact float op order."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])

    def digit_counts(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        c = np.floor(v * 100.0 + 0.5).astype(np.int64)
        c = c[c > 0]
        while True:
            m = c >= 10
            if not m.any():
                break
            c[m] //= 10
        cnt = np.bincount(c, minlength=10)[1:10]
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"digit": pa.array(nz + 1), "n": pa.array(cnt[nz].astype(np.int64))}
        )

    out = pa.concat_tables(
        ds.map_batches(digit_counts, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .iter_batches(batch_format="pyarrow")
    )
    n = out.column("n").to_numpy(zero_copy_only=False)
    total = int(n.sum())
    frac = pa.array(n / total, pa.float64())
    # math.log (libm) — np.log's SIMD path differs from DuckDB ln by ulps
    expected = pa.array(
        [
            math.log(1 + 1.0 / int(dd)) / math.log(10)
            for dd in out.column("digit").to_pylist()
        ],
        pa.float64(),
    )
    return out.append_column("frac", frac).append_column("benford_expected", expected)


SQL_BENFORD_ORDERS = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE floor(o_totalprice * 100 + 0.5) > 0
), c AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit)
SELECT digit, n,
       CAST(n AS DOUBLE) / (SELECT sum(n) FROM c) AS frac,
       ln(1 + 1.0 / digit) / ln(10) AS benford_expected
FROM c ORDER BY digit
"""


def q_chisq_lang_source(sf_dir: str):
    """Chi-square contingency audit over (lang × source): per-cell
    observed count, Benford-style expected mass row_tot·col_tot/N, and
    the chi-square contribution (o−e)²/e — the standard independence
    screen for "does this crawl's language mix depend on the source?".
    Emitting the PER-CELL contributions (not the scalar χ² total)
    keeps every float op deterministic: the only reduction is the
    exact-integer count groupby; expected and contribution are
    per-row expressions whose op order the oracle replays verbatim
    (int products < 2^53 convert to double exactly; Python int/int
    true division IS IEEE double division there)."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": b.column("lang"),
                "source": b.column("source"),
                "n": pa.array(np.ones(len(b), np.int64)),
            }
        )
        return (
            t.group_by(["lang", "source"]).aggregate([("n", "sum")])
            .rename_columns(["lang", "source", "n"])
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="observed"))
    )
    t = pa.concat_tables(counts.iter_batches(batch_format="pyarrow"))
    if t.num_rows == 0:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "observed": pa.array([], pa.int64()),
                "expected": pa.array([], pa.float64()),
                "chisq_contrib": pa.array([], pa.float64()),
            }
        )
    lang = t.column("lang").to_numpy(zero_copy_only=False)
    src = t.column("source").to_numpy(zero_copy_only=False)
    o = t.column("observed").to_numpy(zero_copy_only=False)
    n_total = o.sum()
    ul, li = np.unique(lang, return_inverse=True)
    us_, si = np.unique(src, return_inverse=True)
    rt = np.zeros(len(ul), np.int64)
    np.add.at(rt, li, o)
    ct = np.zeros(len(us_), np.int64)
    np.add.at(ct, si, o)
    e = (rt[li] * ct[si]).astype(np.float64) / np.float64(n_total)
    d = o.astype(np.float64) - e
    contrib = d * d / e
    return pa.table(
        {
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(src, pa.string()),
            "observed": pa.array(o.astype(np.int64)),
            "expected": pa.array(e, pa.float64()),
            "chisq_contrib": pa.array(contrib, pa.float64()),
        }
    )


SQL_CHISQ_LANG_SOURCE = """
WITH c AS (
  SELECT lang, source, count(*)::BIGINT AS observed
  FROM documents GROUP BY lang, source
), tot AS (SELECT sum(observed)::BIGINT AS n FROM c),
rt AS (SELECT lang, sum(observed)::BIGINT AS rn FROM c GROUP BY lang),
ct AS (SELECT source, sum(observed)::BIGINT AS cn FROM c GROUP BY source),
e AS (
  SELECT c.lang, c.source, c.observed,
         CAST(rt.rn * ct.cn AS DOUBLE) / CAST(tot.n AS DOUBLE) AS expected
  FROM c JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN tot
)
SELECT lang, source, observed, expected,
       (CAST(observed AS DOUBLE) - expected)
         * (CAST(observed AS DOUBLE) - expected) / expected AS chisq_contrib
FROM e
"""


def _transition_partial(g: pa.Table) -> pa.Table:
    """Per-pk-partition Markov transition partials: one lexsort by
    (user, ts, event_id), adjacent-pair extraction masked at user run
    boundaries, then a within-task (prev, cur) count rollup — each
    task ships at most |types|² rows regardless of partition size."""
    uid = g.column("user_id").to_numpy(zero_copy_only=False)
    eid = g.column("event_id").to_numpy(zero_copy_only=False)
    us = (
        g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        .view("int64")
    )
    et = g.column("event_type").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, us, uid))
    u, s = uid[order], et[order]
    same = u[1:] == u[:-1] if len(u) > 1 else np.zeros(0, dtype=bool)
    prev, cur = s[:-1][same], s[1:][same]
    t = pa.table(
        {
            "prev_type": pa.array(prev, pa.string()),
            "cur_type": pa.array(cur, pa.string()),
            "n": pa.array(np.ones(len(prev), np.int64)),
        }
    )
    return (
        t.group_by(["prev_type", "cur_type"]).aggregate([("n", "sum")])
        .rename_columns(["prev_type", "cur_type", "n"])
    )


def q_transition_matrix_events(sf_dir: str):
    """Event-type transition (Markov) matrix: for every consecutive
    event pair within a user's (ts, event_id)-ordered stream, count
    (prev_type → cur_type) — the behavioral fingerprint behind funnel
    and journey analytics, and a pure LAG window in SQL. Coarse hash
    co-partition by user (the shared `_coarse_pk` contract), one
    lexsort per partition, map-side (prev, cur) partials, one tiny
    grouped sum. Integer counts only — nothing can drift."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )
    return (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_transition_partial, batch_format="pyarrow")
        .groupby(["prev_type", "cur_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


SQL_TRANSITION_MATRIX_EVENTS = """
WITH s AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type AS cur_type, count(*)::BIGINT AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, cur_type
"""


def _bitmask_intersections(
    distinct, labels_np: np.ndarray, label_col: str, h_col: str = "h"
) -> np.ndarray:
    """Distinct (label, hash) Dataset → L×L pairwise intersection
    matrix (L = len(labels) ≤ 62): per-row label bit, ONE Sum exchange
    keyed by hash, then the driver reduces a bounded mask stream with
    an L×n 0/1 matmul per batch — all pairwise intersections at once,
    the label universe never materializes driver-side. Shared by the
    vocabulary- and shingle-overlap queries."""
    from ray.data.aggregate import Sum

    L = len(labels_np)

    def to_bits(b: pa.Table) -> pa.Table:
        lv = b.column(label_col).to_numpy(zero_copy_only=False)
        li = np.searchsorted(labels_np, lv).astype(np.int64)
        return pa.table(
            {"h": b.column(h_col), "bit": pa.array(np.int64(1) << li)}
        )

    masks = (
        distinct.map_batches(to_bits, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("bit", alias_name="mask"))
    )
    inter = np.zeros((L, L), np.int64)
    for b in masks.iter_batches(batch_format="pyarrow"):
        m = b.column("mask").to_numpy(zero_copy_only=False)
        H = np.stack([(m >> i) & 1 for i in range(L)])
        inter += H @ H.T
    return inter


def q_vocab_overlap_langs(sf_dir: str):
    """Pairwise Jaccard overlap between language VOCABULARIES (distinct
    lowered whitespace tokens, poly64 identity) — "how much lexicon do
    two language buckets share?", the cross-lingual contamination /
    mislabeling screen. Scale shape: per-batch distinct (lang, hash)
    partials → ONE global distinct groupby → lang-index bitmask per
    hash via a Sum exchange keyed by hash → the driver reduces a
    bounded stream of masks with one L×n 0/1 matmul per batch (all
    pairwise intersections at once; L = #langs, guarded ≤ 62). Nothing
    driver-side ever holds the vocabulary. Jaccard is ONE int/int
    division (exact operands < 2^53), mirrored in the oracle."""
    from ray.data.aggregate import Count

    from ..ops.texthash import token_hashes

    rd = _rd()
    langs = sorted(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"]).unique("lang")
    )
    if len(langs) > 62:
        raise ValueError(
            f"{len(langs)} languages exceed the 62-bit mask budget — "
            "run per-language-block"
        )
    langs_np = np.array(langs)

    def pair_partial(b: pa.Table) -> pa.Table:
        th, offs = token_hashes(b.column("text"), lower=True)
        lens = np.diff(offs)
        lv = np.repeat(b.column("lang").to_numpy(zero_copy_only=False), lens)
        t = pa.table(
            {
                "lang": pa.array(lv, pa.string()),
                "h": pa.array(th.view(np.int64)),
            }
        )
        return t.group_by(["lang", "h"]).aggregate([])

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    distinct = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["lang", "h"])
        .aggregate(Count(alias_name="_c"))
    )
    L = len(langs)
    inter = _bitmask_intersections(distinct, langs_np, label_col="lang")
    rows = [
        (langs[i], langs[j], int(inter[i, i]), int(inter[j, j]), int(inter[i, j]))
        for i in range(L)
        for j in range(i + 1, L)
        if inter[i, j] > 0
    ]
    return pa.table(
        {
            "lang_a": pa.array([r[0] for r in rows], pa.string()),
            "lang_b": pa.array([r[1] for r in rows], pa.string()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "n_inter": pa.array([r[4] for r in rows], pa.int64()),
            "jaccard": pa.array(
                [r[4] / (r[2] + r[3] - r[4]) for r in rows], pa.float64()
            ),
        }
    )


SQL_VOCAB_OVERLAP_LANGS = """
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), t AS (
  SELECT DISTINCT lang, {poly} AS h FROM toks WHERE tok <> ''
), sz AS (SELECT lang, count(*)::BIGINT AS n FROM t GROUP BY lang),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, count(*)::BIGINT AS n_inter
  FROM t a JOIN t b USING (h) WHERE a.lang < b.lang
  GROUP BY a.lang, b.lang
)
SELECT i.lang_a, i.lang_b, sa.n AS n_a, sb.n AS n_b, i.n_inter,
       CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) AS jaccard
FROM inter i
JOIN sz sa ON sa.lang = i.lang_a
JOIN sz sb ON sb.lang = i.lang_b
"""
SQL_VOCAB_OVERLAP_LANGS = SQL_VOCAB_OVERLAP_LANGS.format(
    poly=hash_sql.poly64_expr("tok")
)


def q_shingle_overlap_sources(sf_dir: str):
    """Cross-source 3-token-shingle containment — the mirror-site /
    shared-boilerplate detector: for every source pair, how much of
    source A's distinct shingle set appears in B (and vice versa, plus
    Jaccard). Exact full-document fingerprints miss near-mirrors; the
    shingle grain is what CCNet-style pipelines actually compare.
    Scale shape (rebuilt after the sf0.1 sweep showed the two-exchange
    vocabulary-overlap path costing 7 s here): per-batch distinct
    (source-idx, shingle) partials hash-bucket by shingle, ONE groupby
    co-locates every copy of a shingle, and the per-bucket kernel
    dedupes, ORs the source bits per shingle, and reduces its masks to
    one L×L partial intersection matrix task-side — the driver sums
    256 tiny matrices; neither the shingle universe NOR a mask stream
    ever reaches it. Containments are single int/int divisions
    mirrored in the oracle."""
    from ..ops.texthash import shingle_hashes

    rd = _rd()
    srcs = sorted(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"]).unique(
            "source"
        )
    )
    if len(srcs) > 62:
        raise ValueError(
            f"{len(srcs)} sources exceed the 62-bit mask budget — "
            "run per-source-block"
        )
    srcs_np = np.array(srcs)
    L = len(srcs)

    def _dedupe(h: np.ndarray, si: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        order = np.lexsort((si, h))
        hs, ss = h[order], si[order]
        keep = np.ones(len(hs), dtype=bool)
        keep[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
        return hs[keep], ss[keep]

    def pair_partial(b: pa.Table) -> pa.Table:
        sh, seg, _starts = shingle_hashes(b.column("text"), 3)
        sv = b.column("source").to_numpy(zero_copy_only=False)[seg]
        si = np.searchsorted(srcs_np, sv).astype(np.int64)
        hs, ss = _dedupe(sh.view(np.int64), si)
        return pa.table(
            {
                "si": pa.array(ss),
                "h": pa.array(hs),
                "hb": pa.array(hs & np.int64(255)),
            }
        )

    def bucket_matrix(g: pa.Table) -> pa.Table:
        hs, ss = _dedupe(
            g.column("h").to_numpy(zero_copy_only=False),
            g.column("si").to_numpy(zero_copy_only=False),
        )
        bits = np.int64(1) << ss
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        gid = np.cumsum(first) - 1
        masks = np.zeros(int(gid[-1]) + 1 if len(gid) else 0, np.int64)
        np.bitwise_or.at(masks, gid, bits)
        # compress to UNIQUE masks first: the bit matrix then scales
        # with distinct source COMBINATIONS (≤ a few thousand), not
        # with the bucket's shingle count (review fix — the L×M stack
        # grew linearly with corpus size)
        um, cnt = np.unique(masks, return_counts=True)
        Hu = np.stack([(um >> i) & 1 for i in range(L)])
        # explicit cell indices: Ray may re-block map_groups output, so
        # positional alignment across the stream cannot be assumed
        return pa.table(
            {
                "idx": pa.array(np.arange(L * L, dtype=np.int64)),
                "cell": pa.array(((Hu * cnt) @ Hu.T).ravel()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    inter = np.zeros(L * L, np.int64)
    for b in (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(bucket_matrix, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        np.add.at(
            inter,
            b.column("idx").to_numpy(zero_copy_only=False),
            b.column("cell").to_numpy(zero_copy_only=False),
        )
    inter = inter.reshape(L, L)
    rows = [
        (srcs[i], srcs[j], int(inter[i, i]), int(inter[j, j]), int(inter[i, j]))
        for i in range(L)
        for j in range(i + 1, L)
        if inter[i, j] > 0
    ]
    return pa.table(
        {
            "source_a": pa.array([r[0] for r in rows], pa.string()),
            "source_b": pa.array([r[1] for r in rows], pa.string()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "n_inter": pa.array([r[4] for r in rows], pa.int64()),
            "contain_a": pa.array(
                [r[4] / r[2] for r in rows], pa.float64()
            ),
            "contain_b": pa.array(
                [r[4] / r[3] for r in rows], pa.float64()
            ),
            "jaccard": pa.array(
                [r[4] / (r[2] + r[3] - r[4]) for r in rows], pa.float64()
            ),
        }
    )


SQL_SHINGLE_OVERLAP_SOURCES = """
WITH {shingles},
t AS (
  SELECT DISTINCT d.source, s.s AS h
  FROM documents d JOIN shingle s USING (doc_id)
), sz AS (SELECT source, count(*)::BIGINT AS n FROM t GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*)::BIGINT AS n_inter
  FROM t a JOIN t b USING (h) WHERE a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.source_a, i.source_b, sa.n AS n_a, sb.n AS n_b, i.n_inter,
       CAST(i.n_inter AS DOUBLE) / sa.n AS contain_a,
       CAST(i.n_inter AS DOUBLE) / sb.n AS contain_b,
       CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) AS jaccard
FROM inter i
JOIN sz sa ON sa.source = i.source_a
JOIN sz sb ON sb.source = i.source_b
"""
SQL_SHINGLE_OVERLAP_SOURCES = SQL_SHINGLE_OVERLAP_SOURCES.format(
    shingles=hash_sql.shingle_cte("documents", 3)
)


def _cheapest_rows(t: pa.Table) -> pa.Table:
    """First row per l_partkey under the total order (l_extendedprice,
    l_suppkey, l_orderkey, l_linenumber) — one lexsort + first-per-run
    mask, shared by the batch partial and the per-partition final (the
    ordering compares RAW parquet doubles, no arithmetic to drift)."""
    pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
    price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
    sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
    ok_ = t.column("l_orderkey").to_numpy(zero_copy_only=False)
    ln = t.column("l_linenumber").to_numpy(zero_copy_only=False)
    order = np.lexsort((ln, ok_, sk, price, pk))
    first = np.ones(len(order), dtype=bool)
    pks = pk[order]
    first[1:] = pks[1:] != pks[:-1]
    return t.take(pa.array(order[first]))


def _cheapest_final(g: pa.Table) -> pa.Table:
    return _cheapest_rows(g).drop(["pk"])


def q_cheapest_supplier_part(sf_dir: str):
    """Grouped ARG-MIN with full-row attribution: for every part, the
    cheapest lineitem (supplier, order, line, price) under a total
    tie-break order — the generic 'which row achieved the group's
    minimum' join (TPC-H Q2's core move). Map-side partial arg-min
    collapses each batch to ≤ distinct-parts rows BEFORE the exchange,
    then the shared coarse-pk lexsort finalizes per partition. The
    ordering key is raw parquet doubles + integer tiebreaks, so no
    float op exists anywhere."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_partkey",
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
        ],
    )
    return (
        ds.map_batches(_cheapest_rows, batch_format="pyarrow")
        .map_batches(_coarse_pk("l_partkey"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_cheapest_final, batch_format="pyarrow")
    )


SQL_CHEAPEST_SUPPLIER_PART = """
SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_extendedprice
FROM (
  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_partkey
             ORDER BY l_extendedprice, l_suppkey, l_orderkey, l_linenumber)
           AS rk
  FROM lineitem
) WHERE rk = 1
"""


def _daily_type_counts_partial(b: pa.Table) -> pa.Table:
    """Map-side (day, event_type) count partial — day = µs truncated
    to the UTC day (the date_trunc twin). Shared by the share-of-day
    and day-over-day queries; each batch collapses to ≤ days × types
    rows before the exchange."""
    day_us = np.int64(86_400_000_000)
    us = (
        b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        .view("int64")
    )
    t = pa.table(
        {
            "day": pa.array((us - us % day_us).view("datetime64[us]")),
            "event_type": b.column("event_type"),
            "n": pa.array(np.ones(len(b), np.int64)),
        }
    )
    return (
        t.group_by(["day", "event_type"]).aggregate([("n", "sum")])
        .rename_columns(["day", "event_type", "n"])
    )


def _daily_type_counts(sf_dir: str) -> pa.Table:
    """The bounded (day, event_type, n) aggregate both daily-window
    queries start from: one map-side partial, one small grouped sum."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    return pa.concat_tables(
        ds.map_batches(_daily_type_counts_partial, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .iter_batches(batch_format="pyarrow")
    )


def _daily_counts(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Per-day total event counts (day-sorted µs timestamps + int64
    counts) derived from the shared `_daily_type_counts` aggregate —
    the type dimension sums away driver-side (the day × type table is
    bounded), so every daily-series query truncates days in exactly
    ONE place (review fix: three inline copies collapsed here)."""
    t = _daily_type_counts(sf_dir)
    d = (
        t.column("day").to_numpy(zero_copy_only=False)
        .astype("datetime64[us]").view("int64")
    )
    n = t.column("n").to_numpy(zero_copy_only=False)
    ud, di = np.unique(d, return_inverse=True)
    tot = np.zeros(len(ud), np.int64)
    np.add.at(tot, di, n)
    return ud, tot


def q_event_share_by_day(sf_dir: str):
    """Ratio-to-report window: each event type's share of its DAY's
    traffic — ``n / sum(n) OVER (PARTITION BY day)``, the canonical
    mix-shift monitor. Map-side (day, type) count partials, one small
    grouped sum, then day totals and shares computed over the bounded
    (days × types) aggregate on the driver — integer counts end to
    end, ONE int/int division per row mirrored in the oracle."""
    out = _daily_type_counts(sf_dir)
    d = out.column("day").to_numpy(zero_copy_only=False).view("int64")
    n = out.column("n").to_numpy(zero_copy_only=False)
    ud, di = np.unique(d, return_inverse=True)
    tot = np.zeros(len(ud), np.int64)
    np.add.at(tot, di, n)
    day_total = tot[di]
    return (
        out.append_column("day_total", pa.array(day_total))
        .append_column("share", pa.array(n / day_total, pa.float64()))
    )


SQL_EVENT_SHARE_BY_DAY = """
WITH c AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY day, event_type
)
SELECT day, event_type, n,
       sum(n) OVER (PARTITION BY day)::BIGINT AS day_total,
       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY day) AS share
FROM c
"""


def _streaks(g: pa.Table) -> pa.Table:
    """Gaps-and-islands kernel per pk partition: distinct (user, day)
    via one lexsort + unique mask, island boundaries where the user
    changes or the day step ≠ 1, run lengths by diff over boundary
    starts, then a within-task (user → max, sum) rollup. Users are
    co-located by the coarse pk, so per-partition results are final."""
    uid = g.column("user_id").to_numpy(zero_copy_only=False)
    us = (
        g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        .view("int64")
    )
    day = us // np.int64(86_400_000_000)
    order = np.lexsort((day, uid))
    u, d = uid[order], day[order]
    keep = np.ones(len(u), dtype=bool)
    keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
    u, d = u[keep], d[keep]
    boundary = np.ones(len(u), dtype=bool)
    boundary[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] != 1)
    starts = np.flatnonzero(boundary)
    lengths = np.diff(np.append(starts, len(u)))
    t = pa.table(
        {
            "user_id": pa.array(u[starts]),
            "len": pa.array(lengths.astype(np.int64)),
        }
    )
    return (
        t.group_by("user_id").aggregate([("len", "max"), ("len", "sum")])
        .rename_columns(["user_id", "max_streak", "n_active_days"])
    )


def q_streak_days_users(sf_dir: str):
    """Longest consecutive-active-day streak per user — the classic
    gaps-and-islands pattern (distinct days, anchor = day − rank,
    island lengths, max). One coarse-pk co-partition by user, one
    lexsort per partition, pure integer day arithmetic throughout."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_streaks, batch_format="pyarrow")
    )


SQL_STREAK_DAYS_USERS = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), i AS (
  SELECT user_id,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS anchor
  FROM d
), s AS (
  SELECT user_id, count(*)::BIGINT AS len FROM i GROUP BY user_id, anchor
)
SELECT user_id, max(len)::BIGINT AS max_streak,
       sum(len)::BIGINT AS n_active_days
FROM s GROUP BY user_id
"""


def q_outlier_fence_events(sf_dir: str):
    """Tukey-fence outlier audit per event type: exact q1/q3 from the
    shared-histogram grouped-quantile op, fences q1 − 1.5·(q3 − q1) /
    q3 + 1.5·(q3 − q1) computed ONCE per group in the oracle's float
    op order, then one zero-shuffle counting pass with the tiny fence
    map in the task closure (the winsorized-mean shape). The standard
    'how much of this metric is garbage' report — only comparisons
    touch the data, so nothing can drift."""
    from ray.data.aggregate import Count, Sum

    from ..ops.quantiles import grouped_quantiles

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    qt = grouped_quantiles(ds, "value", "event_type", qs=(0.25, 0.75), n_bins=256)
    quart: dict[str, list[float]] = {}
    for g, q, v in zip(
        qt.column("event_type").to_pylist(),
        qt.column("q").to_pylist(),
        qt.column("value").to_pylist(),
    ):
        quart.setdefault(g, [0.0, 0.0])[0 if q == 0.25 else 1] = v
    fences = {
        g: (q1, q3, q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
        for g, (q1, q3) in quart.items()
    }

    def count_fences(b: pa.Table) -> pa.Table:
        gv = b.column("event_type").to_numpy(zero_copy_only=False)
        vv = b.column("value").to_numpy(zero_copy_only=False)
        ok = ~np.isnan(vv)
        below = np.zeros(len(gv), np.int64)
        above = np.zeros(len(gv), np.int64)
        for g in np.unique(gv):
            f = fences.get(g)
            if f is None:
                ok[gv == g] = False
                continue
            m = (gv == g) & ok
            below[m] = vv[m] < f[2]
            above[m] = vv[m] > f[3]
        t = pa.table(
            {
                "event_type": b.column("event_type").filter(pa.array(ok)),
                "one": pa.array(np.ones(int(ok.sum()), np.int64)),
                "n_below": pa.array(below[ok]),
                "n_above": pa.array(above[ok]),
            }
        )
        return (
            t.group_by("event_type")
            .aggregate([("one", "sum"), ("n_below", "sum"), ("n_above", "sum")])
            .rename_columns(["event_type", "n", "n_below", "n_above"])
        )

    out = pa.concat_tables(
        ds.map_batches(count_fences, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_below", alias_name="n_below"),
            Sum("n_above", alias_name="n_above"),
        )
        .iter_batches(batch_format="pyarrow")
    )
    gs = out.column("event_type").to_pylist()
    cols = {
        "q1": [fences[g][0] for g in gs],
        "q3": [fences[g][1] for g in gs],
        "lo_fence": [fences[g][2] for g in gs],
        "hi_fence": [fences[g][3] for g in gs],
    }
    for name, vals in cols.items():
        out = out.append_column(name, pa.array(vals, pa.float64()))
    return out.select(
        ["event_type", "q1", "q3", "lo_fence", "hi_fence", "n", "n_below", "n_above"]
    )


SQL_OUTLIER_FENCE_EVENTS = """
WITH b AS (
  SELECT event_type,
         quantile_disc(value, 0.25) AS q1,
         quantile_disc(value, 0.75) AS q3
  FROM events WHERE value IS NOT NULL GROUP BY event_type
), f AS (
  SELECT event_type, q1, q3,
         q1 - 1.5 * (q3 - q1) AS lo_fence,
         q3 + 1.5 * (q3 - q1) AS hi_fence
  FROM b
)
SELECT e.event_type, f.q1, f.q3, f.lo_fence, f.hi_fence,
       count(*)::BIGINT AS n,
       sum(CASE WHEN e.value < f.lo_fence THEN 1 ELSE 0 END)::BIGINT AS n_below,
       sum(CASE WHEN e.value > f.hi_fence THEN 1 ELSE 0 END)::BIGINT AS n_above
FROM events e JOIN f USING (event_type)
WHERE e.value IS NOT NULL
GROUP BY e.event_type, f.q1, f.q3, f.lo_fence, f.hi_fence
"""


def _above_avg(g: pa.Table) -> pa.Table:
    """Correlated-subquery kernel per pk partition: per-customer order
    count / cent total via one unique+scatter pass, then the EXACT
    integer comparison cents·n > Σcents (equivalent to value > AVG but
    with zero float arithmetic anywhere)."""
    ck = g.column("o_custkey").to_numpy(zero_copy_only=False)
    cents = np.round(
        g.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
    ).astype(np.int64)
    uc, ci = np.unique(ck, return_inverse=True)
    n = np.zeros(len(uc), np.int64)
    np.add.at(n, ci, 1)
    s = np.zeros(len(uc), np.int64)
    np.add.at(s, ci, cents)
    above = (cents * n[ci] > s[ci]).astype(np.int64)
    na = np.zeros(len(uc), np.int64)
    np.add.at(na, ci, above)
    return pa.table(
        {
            "o_custkey": pa.array(uc),
            "n_orders": pa.array(n),
            "n_above_avg": pa.array(na),
        }
    )


def q_above_avg_orders(sf_dir: str):
    """Correlated subquery: per customer, how many of their orders
    exceed their OWN average order value — ``o.value > (SELECT avg(..)
    .. WHERE custkey = o.custkey)``, the canonical correlated-scalar
    pattern. One coarse-pk co-partition; the comparison is lifted to
    exact integers (cents·n > Σcents), so the whole query has NO float
    op at all — the strongest determinism class in the registry."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    return (
        ds.map_batches(_coarse_pk("o_custkey"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_above_avg, batch_format="pyarrow")
    )


SQL_ABOVE_AVG_ORDERS = """
WITH o AS (
  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), t AS (
  SELECT o_custkey, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s
  FROM o GROUP BY o_custkey
)
SELECT t.o_custkey, t.n AS n_orders,
       sum(CASE WHEN o.cents * t.n > t.s THEN 1 ELSE 0 END)::BIGINT
         AS n_above_avg
FROM o JOIN t USING (o_custkey)
GROUP BY t.o_custkey, t.n
"""


_GAP_BUCKET = 4096


def _bucket_gaps(g: pa.Table) -> pa.Table:
    """Within-bucket gap kernel: sort the bucket's distinct keys, emit
    every internal missing run (prev+1 … next−1), plus ONE marker row
    carrying the bucket's (min, max) so the driver can close gaps that
    span bucket boundaries. Range bucketing (key // B) means adjacent
    keys co-locate — the whole-sequence sort the SQL twin needs never
    happens; cross-bucket stitching costs one tiny row per bucket."""
    k = np.unique(g.column("k").to_numpy(zero_copy_only=False))
    d = np.diff(k)
    gi = np.flatnonzero(d > 1)
    return pa.table(
        {
            "gap_start": pa.array(
                np.concatenate([k[gi] + 1, [k[0]]]).astype(np.int64)
            ),
            "gap_end": pa.array(
                np.concatenate([k[gi + 1] - 1, [k[-1]]]).astype(np.int64)
            ),
            "marker": pa.array(
                np.concatenate([np.zeros(len(gi), bool), [True]])
            ),
        }
    )


def q_orderkey_gaps(sf_dir: str):
    """Sequence-gap detection (missing-record audit): the maximal runs
    of orderkeys absent from the URGENT feed — 'which ID ranges never
    arrived' for a filtered/partial stream, the classic ingest
    reconciliation query. Scale shape: distinct keys range-bucket by
    key // 4096 so consecutive keys co-locate; each bucket finds its
    internal gaps locally and ships one (min, max) marker; the driver
    stitches ONLY the bounded bucket-boundary stream (gaps spanning
    empty buckets merge correctly since markers exist only for
    non-empty buckets). Pure integer arithmetic."""
    import pyarrow.compute as _pc

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def keys(b: pa.Table) -> pa.Table:
        t = b.filter(_pc.equal(b.column("o_orderpriority"), "1-URGENT"))
        k = t.column("o_orderkey")
        return pa.table(
            {"k": k, "bucket": _pc.divide(k, pa.scalar(_GAP_BUCKET, pa.int64()))}
        )

    parts = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_bucket_gaps, batch_format="pyarrow")
    )
    gaps: list[tuple[int, int]] = []
    marks: list[tuple[int, int]] = []
    for b in parts.iter_batches(batch_format="pyarrow"):
        gs = b.column("gap_start").to_numpy(zero_copy_only=False)
        ge = b.column("gap_end").to_numpy(zero_copy_only=False)
        mk = b.column("marker").to_numpy(zero_copy_only=False)
        gaps.extend(zip(gs[~mk].tolist(), ge[~mk].tolist()))
        marks.extend(zip(gs[mk].tolist(), ge[mk].tolist()))
    marks.sort()
    for (lo1, hi1), (lo2, hi2) in zip(marks, marks[1:]):
        if lo2 > hi1 + 1:
            gaps.append((hi1 + 1, lo2 - 1))
    gaps.sort()
    return pa.table(
        {
            "gap_start": pa.array([g[0] for g in gaps], pa.int64()),
            "gap_end": pa.array([g[1] for g in gaps], pa.int64()),
        }
    )


SQL_ORDERKEY_GAPS = """
WITH k AS (
  SELECT DISTINCT o_orderkey AS k FROM orders
  WHERE o_orderpriority = '1-URGENT'
), i AS (
  SELECT k, k - row_number() OVER (ORDER BY k) AS anchor FROM k
), s AS (
  SELECT anchor, min(k) AS lo, max(k) AS hi FROM i GROUP BY anchor
), g AS (
  SELECT hi + 1 AS gap_start,
         lead(lo) OVER (ORDER BY lo) - 1 AS gap_end
  FROM s
)
SELECT gap_start, gap_end FROM g WHERE gap_end IS NOT NULL
"""


def _user_entropy(g: pa.Table) -> pa.Table:
    """Per-user event-type Shannon entropy kernel (integer micro-nats,
    the ops/text.char_entropy contract): one lexsort over (user, type
    index), run lengths = per-(user, type) counts, per-user reduction
    by unique+scatter — every sum order-free integers, ONE final
    division shared with the oracle."""
    uid = g.column("user_id").to_numpy(zero_copy_only=False)
    _, ti = np.unique(
        g.column("event_type").to_numpy(zero_copy_only=False), return_inverse=True
    )
    order = np.lexsort((ti, uid))
    u, t = uid[order], ti[order]
    first = np.ones(len(u), bool)
    first[1:] = (u[1:] != u[:-1]) | (t[1:] != t[:-1])
    starts = np.flatnonzero(first)
    runs = np.diff(np.append(starts, len(u))).astype(np.int64)
    ru = u[starts]
    uu, ui = np.unique(ru, return_inverse=True)
    n_events = np.zeros(len(uu), np.int64)
    np.add.at(n_events, ui, runs)
    n_types = np.zeros(len(uu), np.int64)
    np.add.at(n_types, ui, 1)
    ln_cost = np.floor(np.log(runs) * 1e6).astype(np.int64)
    sub = np.zeros(len(uu), np.int64)
    np.add.at(sub, ui, runs * ln_cost)
    ln_n = np.floor(np.log(n_events) * 1e6).astype(np.int64)
    ent = (n_events * ln_n - sub).astype(np.float64) / (
        n_events.astype(np.float64) * 1e6
    )
    return pa.table(
        {
            "user_id": pa.array(uu),
            "n_events": pa.array(n_events),
            "n_types": pa.array(n_types),
            "type_entropy": pa.array(ent, pa.float64()),
        }
    )


def q_user_event_entropy(sf_dir: str):
    """Behavioral-diversity score: Shannon entropy of each user's
    event-type mix — bots and single-purpose scripts sit near 0, broad
    organic users near ln(|types|); the standard per-entity diversity
    feature. One coarse-pk co-partition by user, then the shared
    integer micro-nat entropy contract (ops/text.char_entropy): every
    reduction is an order-free integer sum, libm ln and ONE division
    are the only floats, both replayed verbatim by the oracle."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_user_entropy, batch_format="pyarrow")
    )


SQL_USER_EVENT_ENTROPY = """
WITH c AS (
  SELECT user_id, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY user_id, event_type
), p AS (
  SELECT user_id, sum(n)::BIGINT AS n_events, count(*)::BIGINT AS n_types,
         sum(n * CAST(floor(ln(n) * 1e6) AS BIGINT))::BIGINT AS sub
  FROM c GROUP BY user_id
)
SELECT user_id, n_events, n_types,
       CAST(n_events * CAST(floor(ln(n_events) * 1e6) AS BIGINT) - sub
            AS DOUBLE)
         / CAST(n_events * 1000000 AS DOUBLE) AS type_entropy
FROM p
"""


def q_robust_scale_events(sf_dir: str):
    """Robust scaling (median/IQR — the outlier-immune cousin of the
    z-score): every event's value scaled as (v − median)/(q3 − q1)
    with the group's EXACT order statistics from the shared-histogram
    quantile op. Zero-shuffle map with the tiny (group → constants)
    table in the closure; the scale expression is the oracle's float
    op order verbatim; zero-IQR groups yield NULL (NULLIF twin)."""
    from ..ops.quantiles import grouped_quantiles

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    qt = grouped_quantiles(
        ds, "value", "event_type", qs=(0.25, 0.5, 0.75), n_bins=256
    )
    stats: dict[str, list[float]] = {}
    for g, q, v in zip(
        qt.column("event_type").to_pylist(),
        qt.column("q").to_pylist(),
        qt.column("value").to_pylist(),
    ):
        stats.setdefault(g, [0.0, 0.0, 0.0])[{0.25: 0, 0.5: 1, 0.75: 2}[q]] = v

    def scale(b: pa.Table) -> pa.Table:
        gv = b.column("event_type").to_numpy(zero_copy_only=False)
        vv = b.column("value").to_numpy(zero_copy_only=False)
        out = np.full(len(gv), np.nan)
        valid = np.zeros(len(gv), bool)
        for g in np.unique(gv):
            st = stats.get(g)
            if st is None:
                continue
            q1, med, q3 = st
            iqr = q3 - q1
            m = (gv == g) & ~np.isnan(vv)
            if iqr != 0.0:
                out[m] = (vv[m] - med) / iqr
                valid |= m
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "value": b.column("value"),
                "robust_z": pa.array(out, pa.float64(), mask=~valid),
            }
        )

    return ds.map_batches(scale, batch_format="pyarrow")


SQL_ROBUST_SCALE_EVENTS = """
WITH b AS (
  SELECT event_type,
         quantile_disc(value, 0.25) AS q1,
         quantile_disc(value, 0.5) AS med,
         quantile_disc(value, 0.75) AS q3
  FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - b.med) / NULLIF(b.q3 - b.q1, 0) AS robust_z
FROM events e LEFT JOIN b USING (event_type)
"""


def q_dod_change_events(sf_dir: str):
    """Day-over-day traffic change per event type — LAG over the daily
    count series, pct_change = (n − prev)/prev. Map-side (day, type)
    count partials, one small grouped sum, then the window runs over
    the bounded (days × types) aggregate on the driver: one lexsort,
    a shifted compare masked at type boundaries. Counts are integers;
    the division is mirrored in the oracle."""
    out = _daily_type_counts(sf_dir)
    d = out.column("day").to_numpy(zero_copy_only=False).astype("datetime64[us]")
    et = out.column("event_type").to_numpy(zero_copy_only=False)
    n = out.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((d.view("int64"), et))
    d, et, n = d[order], et[order], n[order]
    prev = np.zeros(len(n), np.int64)
    has_prev = np.zeros(len(n), bool)
    if len(n) > 1:
        prev[1:] = n[:-1]
        has_prev[1:] = et[1:] == et[:-1]
    pct = np.where(has_prev, (n - prev) / np.maximum(prev, 1), 0.0)
    return pa.table(
        {
            "day": pa.array(d),
            "event_type": pa.array(et, pa.string()),
            "n": pa.array(n.astype(np.int64)),
            "prev_n": pa.array(prev, mask=~has_prev),
            "pct_change": pa.array(pct, pa.float64(), mask=~has_prev),
        }
    )


SQL_DOD_CHANGE_EVENTS = """
WITH c AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY day, event_type
)
SELECT day, event_type, n,
       lag(n) OVER w AS prev_n,
       CAST(n - lag(n) OVER w AS DOUBLE) / lag(n) OVER w AS pct_change
FROM c WINDOW w AS (PARTITION BY event_type ORDER BY day)
"""


def _since_purchase(g: pa.Table) -> pa.Table:
    """Conditional forward-fill kernel: for every event, µs since the
    user's latest 'purchase' AT OR BEFORE it in (ts, event_id) order.
    One lexsort; the running 'latest purchase position' is a plain
    maximum.accumulate over per-row purchase indices, and cross-user
    leakage is voided by the run-start comparison (a previous user's
    purchase index is always < this run's first index) — no loop, no
    per-user reset pass."""
    uid = g.column("user_id").to_numpy(zero_copy_only=False)
    eid = g.column("event_id").to_numpy(zero_copy_only=False)
    ts = g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
    us = ts.view("int64")
    et = g.column("event_type").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, us, uid))
    u, t, e = uid[order], us[order], et[order]
    n = len(u)
    idx = np.arange(n, dtype=np.int64)
    pidx = np.where(e == "purchase", idx, np.int64(-1))
    last_p = np.maximum.accumulate(pidx) if n else pidx
    start = np.ones(n, dtype=bool)
    if n > 1:
        start[1:] = u[1:] != u[:-1]
    starts = np.flatnonzero(start)
    lengths = np.diff(np.append(starts, n))
    run_start = np.repeat(starts, lengths)
    valid = last_p >= run_start
    gap = np.zeros(n, np.int64)
    gap[valid] = t[valid] - t[last_p[valid]]
    return pa.table(
        {
            "user_id": pa.array(u),
            "event_id": pa.array(eid[order]),
            "ts": pa.array(ts[order]),
            "event_type": pa.array(e, pa.string()),
            "us_since_purchase": pa.array(gap, mask=~valid),
        }
    )


def q_since_purchase_events(sf_dir: str):
    """Time since each user's last PURCHASE at every event — the
    conditional forward-fill ('fill down the last matching row')
    window, NULL before the first purchase, 0 on purchases themselves.
    In SQL this is a running conditional MAX over the ordered frame;
    distributed it is the shared coarse-pk lexsort plus ONE
    maximum.accumulate. Integer µs end to end."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )
    return (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_since_purchase, batch_format="pyarrow")
    )


SQL_SINCE_PURCHASE_EVENTS = """
SELECT user_id, event_id, ts, event_type,
       epoch_us(ts) - max(CASE WHEN event_type = 'purchase'
                               THEN epoch_us(ts) END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS us_since_purchase
FROM events
"""


def _kl_bucket(g: pa.Table) -> pa.Table:
    """Per-hash-bucket KL partial: the bucket holds EVERY (source, n)
    row of its hashes, so per-token corpus totals n_t are exact here.
    Emits one integer partial per source present: Σ n_st·(mln n_st −
    mln n_t) plus the source's token mass in this bucket — both
    order-free integer sums under the shared micro-nat contract."""
    src = g.column("source").to_numpy(zero_copy_only=False)
    h = g.column("h").to_numpy(zero_copy_only=False)
    n = g.column("n").to_numpy(zero_copy_only=False)
    _, hi = np.unique(h, return_inverse=True)
    nt = np.zeros(hi.max() + 1 if len(hi) else 0, np.int64)
    np.add.at(nt, hi, n)
    term = n * (
        np.floor(np.log(n) * 1e6).astype(np.int64)
        - np.floor(np.log(nt[hi]) * 1e6).astype(np.int64)
    )
    us_, si = np.unique(src, return_inverse=True)
    sub = np.zeros(len(us_), np.int64)
    np.add.at(sub, si, term)
    ns = np.zeros(len(us_), np.int64)
    np.add.at(ns, si, n)
    return pa.table(
        {
            "source": pa.array(us_, pa.string()),
            "sub": pa.array(sub),
            "ns": pa.array(ns),
        }
    )


def q_kl_divergence_sources(sf_dir: str):
    """Lexical drift per source: KL(source ‖ corpus) over unigram
    token distributions — the CCNet/Gopher-style 'which domain looks
    nothing like the rest of the crawl' screen. Decomposition keeps it
    exact: KL_s = [Σ_t n_st·(mln n_st − mln n_t) + N_s·(mln N −
    mln N_s)] / (N_s·10⁶) with mln(x) = floor(ln(x)·10⁶) — the
    h-dependent part reduces inside hash buckets (each bucket owns all
    rows of its hashes, so corpus totals are exact locally), the rest
    is driver arithmetic over one tiny per-source table. Every sum is
    an order-free integer; the single division casts both sides to
    double first, exactly as the oracle does."""
    from ray.data.aggregate import Sum

    from ..ops.texthash import token_hashes

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def pair_counts(b: pa.Table) -> pa.Table:
        th, offs = token_hashes(b.column("text"), lower=True)
        lens = np.diff(offs)
        sv = np.repeat(b.column("source").to_numpy(zero_copy_only=False), lens)
        t = pa.table(
            {
                "source": pa.array(sv, pa.string()),
                "h": pa.array(th.view(np.int64)),
                "n": pa.array(np.ones(len(th), np.int64)),
            }
        )
        return (
            t.group_by(["source", "h"]).aggregate([("n", "sum")])
            .rename_columns(["source", "h", "n"])
        )

    def bucketed(b: pa.Table) -> pa.Table:
        return b.append_column(
            "hb", pc.bit_wise_and(b.column("h"), pa.scalar(255, pa.int64()))
        )

    partials = pa.concat_tables(
        ds.map_batches(pair_counts, batch_format="pyarrow")
        .groupby(["source", "h"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(_kl_bucket, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    src = partials.column("source").to_numpy(zero_copy_only=False)
    us_, si = np.unique(src, return_inverse=True)
    sub = np.zeros(len(us_), np.int64)
    np.add.at(sub, si, partials.column("sub").to_numpy(zero_copy_only=False))
    ns = np.zeros(len(us_), np.int64)
    np.add.at(ns, si, partials.column("ns").to_numpy(zero_copy_only=False))
    n_total = ns.sum()
    mln_n = np.int64(np.floor(np.log(n_total) * 1e6)) if n_total else np.int64(0)
    mln_ns = np.floor(np.log(np.maximum(ns, 1)) * 1e6).astype(np.int64)
    num = (sub + ns * (mln_n - mln_ns)).astype(np.float64)
    kl = num / (ns.astype(np.float64) * 1e6)
    return pa.table(
        {
            "source": pa.array(us_, pa.string()),
            "n_tokens": pa.array(ns),
            "kl_nats": pa.array(kl, pa.float64()),
        }
    )


SQL_KL_DIVERGENCE_SOURCES = """
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), t AS (
  SELECT source, {poly} AS h FROM toks WHERE tok <> ''
), c AS (
  SELECT source, h, count(*)::BIGINT AS n FROM t GROUP BY source, h
), g AS (SELECT h, sum(n)::BIGINT AS nt FROM c GROUP BY h),
ns AS (SELECT source, sum(n)::BIGINT AS n_tokens FROM c GROUP BY source),
tot AS (SELECT sum(n)::BIGINT AS nn FROM c),
sub AS (
  SELECT c.source,
         sum(c.n * (CAST(floor(ln(c.n) * 1e6) AS BIGINT)
                    - CAST(floor(ln(g.nt) * 1e6) AS BIGINT)))::BIGINT AS sub
  FROM c JOIN g USING (h) GROUP BY c.source
)
SELECT ns.source, ns.n_tokens,
       CAST(sub.sub + ns.n_tokens
              * (CAST(floor(ln(tot.nn) * 1e6) AS BIGINT)
                 - CAST(floor(ln(ns.n_tokens) * 1e6) AS BIGINT)) AS DOUBLE)
         / CAST(ns.n_tokens * 1000000 AS BIGINT) AS kl_nats
FROM ns JOIN sub USING (source) CROSS JOIN tot
"""
SQL_KL_DIVERGENCE_SOURCES = SQL_KL_DIVERGENCE_SOURCES.format(
    poly=hash_sql.poly64_expr("tok")
)


def q_division_priority_customers(sf_dir: str):
    """Relational DIVISION — customers who have placed at least one
    order under EVERY priority present in the table: the classic
    universal quantifier ('suppliers who supply ALL parts') no join
    type expresses directly. Map-side batch-distinct (customer,
    priority) partials → ONE global distinct groupby → a distributed
    per-customer Count compared against the divisor's cardinality (a
    tiny one-column unique scan); the pair table never lands on the
    driver (review fix). Pure integers."""
    from ray.data.aggregate import Count

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def partial(b: pa.Table) -> pa.Table:
        return (
            b.select(["o_custkey", "o_orderpriority"])
            .group_by(["o_custkey", "o_orderpriority"])
            .aggregate([])
        )

    n_divisor = len(ds.unique("o_orderpriority"))

    def keep_full(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(b.column("n_priorities"), pa.scalar(n_divisor, pa.int64()))
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_custkey", "o_orderpriority"])
        .aggregate(Count(alias_name="_c"))
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_priorities"))
        .map_batches(keep_full, batch_format="pyarrow")
    )


SQL_DIVISION_PRIORITY_CUSTOMERS = """
WITH p AS (SELECT DISTINCT o_custkey, o_orderpriority FROM orders),
c AS (SELECT o_custkey, count(*)::BIGINT AS n_priorities
      FROM p GROUP BY o_custkey)
SELECT o_custkey, n_priorities FROM c
WHERE n_priorities = (SELECT count(DISTINCT o_orderpriority) FROM orders)
"""


def _view_to_purchase(g: pa.Table) -> pa.Table:
    """Time-bounded adjacency motif kernel: per user, count ordered
    consecutive (view → purchase) pairs with gap ≤ 1 hour — the shared
    transition lexsort plus ONE gap comparison; ships one row per user
    present."""
    uid = g.column("user_id").to_numpy(zero_copy_only=False)
    eid = g.column("event_id").to_numpy(zero_copy_only=False)
    us = (
        g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        .view("int64")
    )
    et = g.column("event_type").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, us, uid))
    u, t, e = uid[order], us[order], et[order]
    if len(u) > 1:
        hit = (
            (u[1:] == u[:-1])
            & (e[:-1] == "view")
            & (e[1:] == "purchase")
            & (t[1:] - t[:-1] <= np.int64(3_600_000_000))
        )
    else:
        hit = np.zeros(0, dtype=bool)
    uu = np.unique(u)
    n = np.zeros(len(uu), np.int64)
    if hit.any():
        np.add.at(n, np.searchsorted(uu, u[:-1][hit]), 1)
    return pa.table(
        {"user_id": pa.array(uu), "n_view_to_purchase": pa.array(n)}
    )


def q_view_to_purchase_events(sf_dir: str):
    """Sequence-motif count (MATCH_RECOGNIZE-lite): per user, how many
    times a view is IMMEDIATELY followed by a purchase within one hour
    — the adjacency-with-deadline conversion signal funnels over
    longer windows miss. Shared coarse-pk transition machinery plus
    one integer gap comparison; LAG twin in SQL. Every user appears
    (zero-count users included via the partition's user set)."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    )
    return (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_view_to_purchase, batch_format="pyarrow")
    )


SQL_VIEW_TO_PURCHASE_EVENTS = """
WITH s AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         lag(event_type) OVER w AS prev_type,
         lag(epoch_us(ts)) OVER w AS prev_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       sum(CASE WHEN prev_type = 'view' AND event_type = 'purchase'
                AND us - prev_us <= 3600000000 THEN 1 ELSE 0 END)::BIGINT
         AS n_view_to_purchase
FROM s GROUP BY user_id
"""


def q_ref_integrity_audit(sf_dir: str):
    """Referential-integrity audit: orphan fact rows whose foreign key
    has no dimension row — ``orders.o_custkey → customer`` and
    ``events.user_id → customer`` in one report. Each side map-reduces
    to per-key tagged partials (facts pre-count map-side, the
    dimension ships one flag row per key), ONE grouped sum over
    distinct keys, then a bounded orphan scan — the anti-join-as-audit
    shape, never materializing fact rows. Output is a single summary
    row of exact integers."""
    from ray.data.aggregate import Sum

    rd = _rd()
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def tag(col: str, dim: int, n_ord: int, n_ev: int):
        def fn(b: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "key": b.column(col),
                    "is_dim": pa.array(np.full(len(b), dim, np.int64)),
                    "n_ord": pa.array(np.full(len(b), n_ord, np.int64)),
                    "n_ev": pa.array(np.full(len(b), n_ev, np.int64)),
                }
            )
            return (
                t.group_by("key")
                .aggregate([("is_dim", "max"), ("n_ord", "sum"), ("n_ev", "sum")])
                .rename_columns(["key", "is_dim", "n_ord", "n_ev"])
            )

        return fn

    from ray.data.aggregate import Max

    merged = (
        cust.map_batches(tag("c_custkey", 1, 0, 0), batch_format="pyarrow")
        .union(orders.map_batches(tag("o_custkey", 0, 1, 0), batch_format="pyarrow"))
        .union(events.map_batches(tag("user_id", 0, 0, 1), batch_format="pyarrow"))
        .groupby("key")
        .aggregate(
            Max("is_dim", alias_name="is_dim"),
            Sum("n_ord", alias_name="n_ord"),
            Sum("n_ev", alias_name="n_ev"),
        )
    )
    n_orders = n_events = orph_ord = orph_ev = 0
    for b in merged.iter_batches(batch_format="pyarrow"):
        d = b.column("is_dim").to_numpy(zero_copy_only=False)
        no = b.column("n_ord").to_numpy(zero_copy_only=False)
        ne = b.column("n_ev").to_numpy(zero_copy_only=False)
        n_orders += int(no.sum())
        n_events += int(ne.sum())
        miss = d == 0
        orph_ord += int(no[miss].sum())
        orph_ev += int(ne[miss].sum())
    return pa.table(
        {
            "n_orders": pa.array([n_orders], pa.int64()),
            "n_orphan_orders": pa.array([orph_ord], pa.int64()),
            "n_events": pa.array([n_events], pa.int64()),
            "n_orphan_events": pa.array([orph_ev], pa.int64()),
        }
    )


SQL_REF_INTEGRITY_AUDIT = """
SELECT
  (SELECT count(*) FROM orders)::BIGINT AS n_orders,
  (SELECT count(*) FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey))::BIGINT
    AS n_orphan_orders,
  (SELECT count(*) FROM events)::BIGINT AS n_events,
  (SELECT count(*) FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = e.user_id))::BIGINT
    AS n_orphan_events
"""


def _median_gap(g: pa.Table) -> pa.Table:
    """Per-customer median inter-order gap kernel: one lexsort by
    (customer, date, orderkey) builds the integer-day gaps with
    run-boundary masking, a second lexsort by (customer, gap) makes
    every customer's gaps contiguous-sorted, and the quantile_disc
    rank ceil(k/2) is picked per run by pure indexing — exact local
    order statistics for UNBOUNDED key cardinality (each key lives in
    one partition), the complement of the bounded-group shared
    histogram in ops/quantiles."""
    ck = g.column("o_custkey").to_numpy(zero_copy_only=False)
    ok_ = g.column("o_orderkey").to_numpy(zero_copy_only=False)
    day = (
        g.column("o_orderdate").to_numpy(zero_copy_only=False)
        .astype("datetime64[D]").view("int64")
    )
    order = np.lexsort((ok_, day, ck))
    c, d = ck[order], day[order]
    n = len(c)
    same = c[1:] == c[:-1] if n > 1 else np.zeros(0, dtype=bool)
    gap_c = c[1:][same]
    gaps = (d[1:] - d[:-1])[same]
    if len(gap_c) == 0:
        return pa.table(
            {
                "o_custkey": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
                "median_gap_days": pa.array([], pa.int64()),
            }
        )
    o2 = np.lexsort((gaps, gap_c))
    gc, gv = gap_c[o2], gaps[o2]
    start = np.ones(len(gc), dtype=bool)
    start[1:] = gc[1:] != gc[:-1]
    starts = np.flatnonzero(start)
    lens = np.diff(np.append(starts, len(gc)))
    med_idx = starts + np.ceil(lens / 2).astype(np.int64) - 1
    return pa.table(
        {
            "o_custkey": pa.array(gc[starts]),
            "n_gaps": pa.array(lens.astype(np.int64)),
            "median_gap_days": pa.array(gv[med_idx]),
        }
    )


def q_median_gap_customers(sf_dir: str):
    """Median days between consecutive orders, per customer — the
    repurchase-cadence feature. This is the HIGH-CARDINALITY quantile
    shape the shared-histogram op deliberately excludes: keys are
    unbounded, so each customer's exact order statistic is computed
    LOCALLY inside its coarse-pk partition (two lexsorts + indexing,
    no histogram, no driver state). Integer days end to end; the twin
    replays quantile_disc over the LAG gaps."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )
    return (
        ds.map_batches(_coarse_pk("o_custkey"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_median_gap, batch_format="pyarrow")
    )


SQL_MEDIAN_GAP_CUSTOMERS = """
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap
  FROM orders
)
SELECT o_custkey, count(gap)::BIGINT AS n_gaps,
       quantile_disc(gap, 0.5)::BIGINT AS median_gap_days
FROM g WHERE gap IS NOT NULL
GROUP BY o_custkey
"""


def q_pareto_customers(sf_dir: str):
    """Revenue concentration (the 80/20 report): how many customers —
    ranked by revenue desc, custkey tiebreak — does it take to cover
    80 % of total revenue, plus the exact cents covered at that point.
    Per-customer integer-cent partials, one grouped sum (bounded by
    customer count), then the ranked cumulative scan over that
    aggregate. The threshold compare is lifted to exact integers:
    5·cum ≥ 4·total ⟺ cum/total ≥ 0.8 — no float op anywhere."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        cents = np.round(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table({"o_custkey": b.column("o_custkey"), "c": pa.array(cents)})
        return (
            t.group_by("o_custkey").aggregate([("c", "sum")])
            .rename_columns(["o_custkey", "c"])
        )

    agg = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("c", alias_name="c"))
        .iter_batches(batch_format="pyarrow")
    )
    ck = agg.column("o_custkey").to_numpy(zero_copy_only=False)
    c = agg.column("c").to_numpy(zero_copy_only=False)
    order = np.lexsort((ck, -c))
    cum = np.cumsum(c[order])
    total = int(cum[-1]) if len(cum) else 0
    k = int(np.searchsorted(5 * cum, 4 * total) + 1) if total > 0 else 0
    covered = int(cum[k - 1]) if k else 0
    return pa.table(
        {
            "n_customers_80pct": pa.array([k], pa.int64()),
            "n_customers_total": pa.array([len(c)], pa.int64()),
            "cents_covered": pa.array([covered], pa.int64()),
            "cents_total": pa.array([total], pa.int64()),
        }
    )


SQL_PARETO_CUSTOMERS = """
WITH a AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY o_custkey
), r AS (
  SELECT c, sum(c) OVER (ORDER BY c DESC, o_custkey
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
  FROM a
), t AS (SELECT sum(c)::BIGINT AS total, count(*)::BIGINT AS n FROM a)
SELECT (SELECT count(*) + 1 FROM r, t WHERE 5 * r.cum < 4 * t.total)::BIGINT
         AS n_customers_80pct,
       t.n AS n_customers_total,
       (SELECT min(cum) FROM r, t WHERE 5 * cum >= 4 * t.total)::BIGINT
         AS cents_covered,
       t.total AS cents_total
FROM t
"""


def q_hhi_lang_sources(sf_dir: str):
    """Herfindahl–Hirschman concentration index per language: Σ over
    sources of (share of that language's docs)² — 'is this language
    bucket dominated by one domain?', the monoculture screen beside
    the chi-square audit. HHI = Σ n_ls² / N_l² needs only integer
    count sums (squares < 2^53) and ONE division of exact-integer
    doubles, mirrored in the oracle."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": b.column("lang"),
                "source": b.column("source"),
                "n": pa.array(np.ones(len(b), np.int64)),
            }
        )
        return (
            t.group_by(["lang", "source"]).aggregate([("n", "sum")])
            .rename_columns(["lang", "source", "n"])
        )

    out = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .iter_batches(batch_format="pyarrow")
    )
    # Python ints (arbitrary precision, the HUGEINT twin) over the tiny
    # langs × sources aggregate: n² and ΣN² can pass 2^63 at extreme
    # per-language cardinalities where int64 would wrap silently; the
    # final float casts match SQL's HUGEINT → DOUBLE conversion exactly
    lang = out.column("lang").to_pylist()
    n = out.column("n").to_pylist()
    tot: dict[str, int] = {}
    sq: dict[str, int] = {}
    ns: dict[str, int] = {}
    for g, v in zip(lang, n):
        tot[g] = tot.get(g, 0) + v
        sq[g] = sq.get(g, 0) + v * v
        ns[g] = ns.get(g, 0) + 1
    ul = sorted(tot)
    return pa.table(
        {
            "lang": pa.array(ul, pa.string()),
            "n_docs": pa.array([tot[g] for g in ul], pa.int64()),
            "n_sources": pa.array([ns[g] for g in ul], pa.int64()),
            "hhi": pa.array(
                [float(sq[g]) / float(tot[g] * tot[g]) for g in ul], pa.float64()
            ),
        }
    )


SQL_HHI_LANG_SOURCES = """
WITH c AS (
  SELECT lang, source, count(*)::BIGINT AS n
  FROM documents GROUP BY lang, source
)
SELECT lang, sum(n)::BIGINT AS n_docs, count(*)::BIGINT AS n_sources,
       CAST(sum(n * n) AS DOUBLE) / CAST(sum(n) * sum(n) AS DOUBLE) AS hhi
FROM c GROUP BY lang
"""


def _basket_pairs(g: pa.Table) -> pa.Table:
    """Market-basket pair kernel: distinct parts per order (lexsort +
    unique mask), then ALL unordered within-order pairs via a loop
    over SHIFT DISTANCES (d = 1 … max basket size − 1, ~7 for
    lineitem) — never over rows or orders; each shift d pairs row i
    with row i+d when both sit in the same order run. Ships a
    within-task (part_a, part_b) count rollup."""
    ok_ = g.column("l_orderkey").to_numpy(zero_copy_only=False)
    pk = g.column("l_partkey").to_numpy(zero_copy_only=False)
    order = np.lexsort((pk, ok_))
    o, p = ok_[order], pk[order]
    keep = np.ones(len(o), dtype=bool)
    keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
    o, p = o[keep], p[keep]
    n = len(o)
    pa_list, pb_list = [], []
    d = 1
    while True:
        if d >= n:
            break
        same = o[d:] == o[:-d]
        if not same.any():
            break
        pa_list.append(p[:-d][same])
        pb_list.append(p[d:][same])
        d += 1
    if pa_list:
        a = np.concatenate(pa_list)
        b = np.concatenate(pb_list)
    else:
        a = b = np.zeros(0, np.int64)
    t = pa.table(
        {
            "part_a": pa.array(a.astype(np.int64)),
            "part_b": pa.array(b.astype(np.int64)),
            "n": pa.array(np.ones(len(a), np.int64)),
        }
    )
    return (
        t.group_by(["part_a", "part_b"]).aggregate([("n", "sum")])
        .rename_columns(["part_a", "part_b", "n"])
    )


def q_basket_pairs_parts(sf_dir: str):
    """Market-basket support counting: the top-50 part pairs bought
    together in one order (count desc, part keys asc tiebreak) — the
    frequent-itemset / co-purchase primitive. Orders co-locate via the
    coarse pk, each partition emits bounded (part_a, part_b) count
    partials (baskets are small, so the shift-distance loop runs ~7
    iterations regardless of data size). Pairs rarely repeat across
    partitions, so a full sort-based pair groupby would shuffle the
    whole pair table for almost no reduction (measured 12 s of a 16-s
    query at sf0.1); instead the packed pair key hash-buckets into 64
    COARSE groups — each bucket owns every copy of its pairs, sums and
    takes its exact local top-50 in one numpy kernel — and the driver
    merges only 64 × 50 candidates (4.7 s). Pure integer counts."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def bucketed(b: pa.Table) -> pa.Table:
        a = b.column("part_a").to_numpy(zero_copy_only=False)
        bb = b.column("part_b").to_numpy(zero_copy_only=False)
        pair = (a << np.int64(32)) | bb
        hb = (
            (pair.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(58)
        ).astype(np.int64)
        return pa.table(
            {"pair": pa.array(pair), "n": b.column("n"), "hb": pa.array(hb)}
        )

    def bucket_top(g: pa.Table) -> pa.Table:
        p = g.column("pair").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        up, pi = np.unique(p, return_inverse=True)
        tot = np.zeros(len(up), np.int64)
        np.add.at(tot, pi, n)
        a = up >> np.int64(32)
        bb = up & np.int64(0xFFFFFFFF)
        sel = np.lexsort((bb, a, -tot))[:50]
        return pa.table(
            {
                "part_a": pa.array(a[sel]),
                "part_b": pa.array(bb[sel]),
                "n": pa.array(tot[sel]),
            }
        )

    out = pa.concat_tables(
        ds.map_batches(_coarse_pk("l_orderkey"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_basket_pairs, batch_format="pyarrow")
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(bucket_top, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    a = out.column("part_a").to_numpy(zero_copy_only=False)
    b = out.column("part_b").to_numpy(zero_copy_only=False)
    n = out.column("n").to_numpy(zero_copy_only=False)
    sel = np.lexsort((b, a, -n))[:50]
    return pa.table(
        {
            "part_a": pa.array(a[sel]),
            "part_b": pa.array(b[sel]),
            "n": pa.array(n[sel].astype(np.int64)),
        }
    )


SQL_BASKET_PAIRS_PARTS = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*)::BIGINT AS n
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT part_a, part_b, n FROM p
ORDER BY n DESC, part_a, part_b LIMIT 50
"""


def _day_pairs(g: pa.Table) -> pa.Table:
    """Per-partition day-retention partial: distinct (user, day), then
    per day d the users active on d (sized) and those ALSO active on
    d+1 (consecutive-day mask) — two bounded per-day count rollups
    shipped as one tagged table."""
    uid = g.column("user_id").to_numpy(zero_copy_only=False)
    us = (
        g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        .view("int64")
    )
    day = us // np.int64(86_400_000_000)
    order = np.lexsort((day, uid))
    u, d = uid[order], day[order]
    keep = np.ones(len(u), dtype=bool)
    keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
    u, d = u[keep], d[keep]
    ret = (u[1:] == u[:-1]) & (d[1:] - d[:-1] == 1) if len(u) > 1 else np.zeros(0, bool)
    t = pa.table(
        {
            "day": pa.array(d.astype(np.int64)),
            "n_users": pa.array(np.ones(len(d), np.int64)),
            "n_retained": pa.array(
                np.concatenate([ret, [False]]).astype(np.int64)
            ),
        }
    )
    return (
        t.group_by("day").aggregate([("n_users", "sum"), ("n_retained", "sum")])
        .rename_columns(["day", "n_users", "n_retained"])
    )


def q_day_retention_events(sf_dir: str):
    """Next-day retention curve: for every day, how many distinct
    active users return the NEXT day, and the retention rate — the
    first health metric any event pipeline reports. Users co-locate
    via the coarse pk so the consecutive-day membership test is a
    shifted compare over each partition's distinct (user, day) rows;
    per-day integer partials, one tiny grouped sum, one mirrored
    division. The last observed day reports 0 retained (no next day),
    matching the twin's LEFT-join-missing semantics."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    out = pa.concat_tables(
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_day_pairs, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("n_retained", alias_name="n_retained"),
        )
        .iter_batches(batch_format="pyarrow")
    )
    d = out.column("day").to_numpy(zero_copy_only=False)
    nu = out.column("n_users").to_numpy(zero_copy_only=False)
    nr = out.column("n_retained").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "day": pa.array(
                (d * np.int64(86_400_000_000)).view("datetime64[us]")
            ),
            "n_users": pa.array(nu.astype(np.int64)),
            "n_retained": pa.array(nr.astype(np.int64)),
            "retention": pa.array(nr / nu, pa.float64()),
        }
    )


SQL_DAY_RETENTION_EVENTS = """
WITH d AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), r AS (
  SELECT a.day, count(*)::BIGINT AS n_users,
         sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_retained
  FROM d a LEFT JOIN d b
    ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
  GROUP BY a.day
)
SELECT day, n_users, n_retained,
       CAST(n_retained AS DOUBLE) / n_users AS retention
FROM r
"""


def q_multi_distinct_nation(sf_dir: str):
    """Multiple DISTINCT aggregates in one query — per nation, the
    distinct customer count AND distinct market-segment count (the
    shape SQL engines special-case because each DISTINCT needs its own
    dedup). Here both ride ONE exchange: batch-distinct (nation,
    custkey, segment) triples dedupe globally, then per-nation counts
    of distinct values in each column derive from two within-kernel
    unique passes per coarse partition. Pure integers."""
    from ray.data.aggregate import Count

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_custkey", "c_mktsegment"],
    )

    def partial(b: pa.Table) -> pa.Table:
        return (
            b.select(["c_nationkey", "c_custkey", "c_mktsegment"])
            .group_by(["c_nationkey", "c_custkey", "c_mktsegment"])
            .aggregate([])
        )

    def per_nation(g: pa.Table) -> pa.Table:
        nk = g.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ck = g.column("c_custkey").to_numpy(zero_copy_only=False)
        seg = g.column("c_mktsegment").to_numpy(zero_copy_only=False)
        un, ni = np.unique(nk, return_inverse=True)
        n_cust = np.zeros(len(un), np.int64)
        ok1 = np.lexsort((ck, nk))
        first = np.ones(len(ok1), dtype=bool)
        first[1:] = (nk[ok1][1:] != nk[ok1][:-1]) | (ck[ok1][1:] != ck[ok1][:-1])
        np.add.at(n_cust, ni[ok1[first]], 1)
        n_seg = np.zeros(len(un), np.int64)
        ok2 = np.lexsort((seg, nk))
        first2 = np.ones(len(ok2), dtype=bool)
        first2[1:] = (nk[ok2][1:] != nk[ok2][:-1]) | (seg[ok2][1:] != seg[ok2][:-1])
        np.add.at(n_seg, ni[ok2[first2]], 1)
        return pa.table(
            {
                "c_nationkey": pa.array(un),
                "n_customers": pa.array(n_cust),
                "n_segments": pa.array(n_seg),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_custkey", "c_mktsegment"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(_coarse_pk("c_nationkey"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(per_nation, batch_format="pyarrow")
    )


SQL_MULTI_DISTINCT_NATION = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       count(DISTINCT c_custkey)::BIGINT AS n_customers,
       count(DISTINCT c_mktsegment)::BIGINT AS n_segments
FROM customer GROUP BY c_nationkey
"""


def _major_suppliers(g: pa.Table) -> pa.Table:
    """Nested-aggregate-threshold kernel per pk partition: the
    partition owns EVERY per-batch (part, supplier) partial of its
    parts, so one lexsort + run reduce combines them into exact
    (part, supplier) sums, per-part totals follow by unique+scatter,
    and the EXACT integer dominance test 8·q_ps > q_p — 'this
    supplier shipped more than an eighth of the part's volume' —
    filters in place. ONE exchange end to end (the former up-front
    global (part, supp) groupby re-shuffled the pair table for
    nothing — 6.8 s of the sf0.1 query)."""
    pk0 = g.column("l_partkey").to_numpy(zero_copy_only=False)
    sk0 = g.column("l_suppkey").to_numpy(zero_copy_only=False)
    q0 = g.column("q").to_numpy(zero_copy_only=False)
    order = np.lexsort((sk0, pk0))
    pks, sks, qs_ = pk0[order], sk0[order], q0[order]
    first = np.ones(len(pks), dtype=bool)
    first[1:] = (pks[1:] != pks[:-1]) | (sks[1:] != sks[:-1])
    gid = np.cumsum(first) - 1
    q = np.zeros(int(gid[-1]) + 1 if len(gid) else 0, np.int64)
    np.add.at(q, gid, qs_)
    pk, sk = pks[first], sks[first]
    up, pi = np.unique(pk, return_inverse=True)
    tot = np.zeros(len(up), np.int64)
    np.add.at(tot, pi, q)
    keep = 8 * q > tot[pi]
    return pa.table(
        {
            "l_partkey": pa.array(pk[keep]),
            "l_suppkey": pa.array(sk[keep]),
            "qty_units": pa.array(q[keep]),
            "part_total_units": pa.array(tot[pi][keep]),
        }
    )


def q_major_suppliers_part(sf_dir: str):
    """Nested aggregate threshold (the TPC-H Q20 shape): suppliers who
    shipped more than an EIGHTH of a part's total quantity — an aggregate
    compared against a coarser aggregate of the same fact table.
    Map-side (part, supplier) integer-unit partials shuffle ONCE by
    coarse part partition; the kernel combines the partials, derives
    part totals, and applies the dominance test in place — the
    comparison is lifted to exact integers (8·q_ps > q_p), so no
    float op exists anywhere."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    )

    def partial(b: pa.Table) -> pa.Table:
        units = np.floor(
            b.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "l_suppkey": b.column("l_suppkey"),
                "q": pa.array(units),
            }
        )
        return (
            t.group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])
            .rename_columns(["l_partkey", "l_suppkey", "q"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(_coarse_pk("l_partkey"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_major_suppliers, batch_format="pyarrow")
    )


SQL_MAJOR_SUPPLIERS_PART = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(floor(l_quantity + 0.5) AS BIGINT))::BIGINT AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey
), p AS (
  SELECT l_partkey, sum(q)::BIGINT AS tot FROM ps GROUP BY l_partkey
)
SELECT ps.l_partkey, ps.l_suppkey, ps.q AS qty_units,
       p.tot AS part_total_units
FROM ps JOIN p USING (l_partkey)
WHERE 8 * ps.q > p.tot
"""


def q_stopword_rate_langs(sf_dir: str):
    """Function-word (stopword) rate per language bucket: the fraction
    of normalized tokens that are the language's OWN function words —
    Gopher's required-stopword idea lifted from per-doc filter to
    per-bucket audit (a language bucket with a collapsing stopword
    rate is full of boilerplate, code, or mislabeled text). Reuses the
    lang-id machinery end to end: the same normalization, the same
    hashed profile membership (one sorted ``np.isin`` per language per
    batch), and an oracle GENERATED from the same ``_LANG_PROFILES``
    data, so growing a profile keeps both sides in lockstep.
    Profile-less languages (e.g. zh here) report honestly with rate
    0. Integer counts, one mirrored division."""
    from ray.data.aggregate import Sum

    from ..ops.text import _LANG_PROFILES, _stopword_hashes
    from ..ops.texthash import poly_hash_array, tokenize_ws

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        s = pc.utf8_lower(pc.cast(b.column("text"), pa.large_string()))
        s = pc.replace_substring_regex(s, r"[^\pL\pN\s]", "")
        tokens, offsets = tokenize_ws(s)
        th = poly_hash_array(tokens)
        lv = b.column("lang").to_numpy(zero_copy_only=False)
        n_tok_row = np.diff(offsets)
        sw_row = np.zeros(len(lv), np.int64)
        cs = np.zeros(len(th) + 1, dtype=np.int64)
        for lg in np.unique(lv):
            if lg not in _LANG_PROFILES:
                continue
            hits = np.isin(th, _stopword_hashes(lg))
            np.cumsum(hits, out=cs[1:])
            row_hits = cs[offsets[1:]] - cs[offsets[:-1]]
            m = lv == lg
            sw_row[m] = row_hits[m]
        t = pa.table(
            {
                "lang": b.column("lang"),
                "n_tokens": pa.array(n_tok_row.astype(np.int64)),
                "n_stopwords": pa.array(sw_row),
            }
        )
        return (
            t.group_by("lang").aggregate([("n_tokens", "sum"), ("n_stopwords", "sum")])
            .rename_columns(["lang", "n_tokens", "n_stopwords"])
        )

    out = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_stopwords", alias_name="n_stopwords"),
        )
        .iter_batches(batch_format="pyarrow")
    )
    # a lang whose docs ALL normalize to zero tokens never reaches the
    # oracle's GROUP BY (its toks CTE unnests nothing) — drop it here
    # too so the row sets agree (review fix)
    out = out.filter(pc.greater(out.column("n_tokens"), 0))
    nt = out.column("n_tokens").to_numpy(zero_copy_only=False)
    sw = out.column("n_stopwords").to_numpy(zero_copy_only=False)
    return out.append_column("stopword_rate", pa.array(sw / nt, pa.float64()))


def _stopword_rate_sql() -> str:
    from ..ops.text import _LANG_PROFILES

    arms = "\n         ".join(
        "WHEN lang = '{lg}' AND tok IN ({ws}) THEN 1".format(
            lg=lg, ws=", ".join("'" + w + "'" for w in ws)
        )
        for lg, ws in _LANG_PROFILES.items()
    )
    return f"""
WITH n AS (
  SELECT lang, regexp_replace(lower(text), '[^\\pL\\pN\\s]', '', 'g') AS norm
  FROM documents WHERE text IS NOT NULL
), toks AS (
  SELECT lang, unnest(regexp_split_to_array(norm, '\\s+')) AS tok FROM n
), t AS (SELECT lang, tok FROM toks WHERE tok <> ''),
a AS (
  SELECT lang, count(*)::BIGINT AS n_tokens,
         sum(CASE {arms} ELSE 0 END)::BIGINT AS n_stopwords
  FROM t GROUP BY lang
)
SELECT lang, n_tokens, n_stopwords,
       CASE WHEN n_tokens > 0
            THEN CAST(n_stopwords AS DOUBLE) / n_tokens ELSE 0.0 END
         AS stopword_rate
FROM a
"""


SQL_STOPWORD_RATE_LANGS = _stopword_rate_sql()


def _rare_bucket(g: pa.Table) -> pa.Table:
    """Per-hash-bucket rare-token partial: the bucket owns every
    (source, n) partial row of its hashes, so it FIRST combines the
    per-batch partials into exact (source, h) counts in-kernel (one
    lexsort + run reduce — this absorbed what used to be a full
    (source, h) sort-shuffle of the dominant table, the same redundant
    exchange the shingle-overlap rebuild removed), then global token
    counts n_t are exact here; a token is RARE when n_t ≤ 2 (hapax /
    dis legomena). Emits per-source integer partials: occurrences and
    distinct types, total and rare."""
    src0 = g.column("source").to_numpy(zero_copy_only=False)
    h0 = g.column("h").to_numpy(zero_copy_only=False)
    n0 = g.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((src0, h0))
    hs, ss, ns = h0[order], src0[order], n0[order]
    first = np.ones(len(hs), dtype=bool)
    first[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
    gid = np.cumsum(first) - 1
    n = np.zeros(int(gid[-1]) + 1 if len(gid) else 0, np.int64)
    np.add.at(n, gid, ns)
    h, src = hs[first], ss[first]
    _, hi = np.unique(h, return_inverse=True)
    nt = np.zeros(hi.max() + 1 if len(hi) else 0, np.int64)
    np.add.at(nt, hi, n)
    rare = nt[hi] <= 2
    us_, si = np.unique(src, return_inverse=True)
    cols = {}
    for name, vals in (
        ("n_occ", n),
        ("rare_occ", np.where(rare, n, 0)),
        ("n_types", np.ones(len(n), np.int64)),
        ("rare_types", rare.astype(np.int64)),
    ):
        acc = np.zeros(len(us_), np.int64)
        np.add.at(acc, si, vals)
        cols[name] = acc
    return pa.table(
        {"source": pa.array(us_, pa.string())}
        | {k: pa.array(v) for k, v in cols.items()}
    )


def q_rare_token_rate_sources(sf_dir: str):
    """Rare-token (hapax + dis-legomena) rate per source: what share
    of a source's token occurrences — and of its distinct vocabulary —
    comes from tokens seen ≤ 2 times in the WHOLE corpus. High rates
    flag OCR noise, codebases, and spam; collapsed rates flag
    templates. Same bucket decomposition as the KL drift op, but in
    ONE exchange: per-batch (source, hash) count partials shuffle
    straight to hash buckets, and each bucket both combines the
    partials AND resolves its tokens' exact global counts in-kernel,
    shipping tiny per-source integer partials; two mirrored divisions
    at the end (review fix: the former up-front global (source, h)
    groupby re-shuffled the dominant table for nothing)."""
    from ray.data.aggregate import Sum

    from ..ops.texthash import token_hashes

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def pair_counts(b: pa.Table) -> pa.Table:
        th, offs = token_hashes(b.column("text"), lower=True)
        lens = np.diff(offs)
        sv = np.repeat(b.column("source").to_numpy(zero_copy_only=False), lens)
        t = pa.table(
            {
                "source": pa.array(sv, pa.string()),
                "h": pa.array(th.view(np.int64)),
                "n": pa.array(np.ones(len(th), np.int64)),
            }
        )
        t = (
            t.group_by(["source", "h"]).aggregate([("n", "sum")])
            .rename_columns(["source", "h", "n"])
        )
        return t.append_column(
            "hb", pc.bit_wise_and(t.column("h"), pa.scalar(255, pa.int64()))
        )

    out = pa.concat_tables(
        ds.map_batches(pair_counts, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(_rare_bucket, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_occ", alias_name="n_occ"),
            Sum("rare_occ", alias_name="rare_occ"),
            Sum("n_types", alias_name="n_types"),
            Sum("rare_types", alias_name="rare_types"),
        )
        .iter_batches(batch_format="pyarrow")
    )
    no = out.column("n_occ").to_numpy(zero_copy_only=False)
    ro = out.column("rare_occ").to_numpy(zero_copy_only=False)
    ny = out.column("n_types").to_numpy(zero_copy_only=False)
    ry = out.column("rare_types").to_numpy(zero_copy_only=False)
    return (
        out.append_column("rate_occ", pa.array(ro / no, pa.float64()))
        .append_column("rate_types", pa.array(ry / ny, pa.float64()))
    )


SQL_RARE_TOKEN_RATE_SOURCES = """
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), t AS (
  SELECT source, {poly} AS h FROM toks WHERE tok <> ''
), c AS (
  SELECT source, h, count(*)::BIGINT AS n FROM t GROUP BY source, h
), g AS (SELECT h, sum(n)::BIGINT AS nt FROM c GROUP BY h),
a AS (
  SELECT c.source,
         sum(c.n)::BIGINT AS n_occ,
         sum(CASE WHEN g.nt <= 2 THEN c.n ELSE 0 END)::BIGINT AS rare_occ,
         count(*)::BIGINT AS n_types,
         sum(CASE WHEN g.nt <= 2 THEN 1 ELSE 0 END)::BIGINT AS rare_types
  FROM c JOIN g USING (h) GROUP BY c.source
)
SELECT source, n_occ, rare_occ, n_types, rare_types,
       CAST(rare_occ AS DOUBLE) / n_occ AS rate_occ,
       CAST(rare_types AS DOUBLE) / n_types AS rate_types
FROM a
"""
SQL_RARE_TOKEN_RATE_SOURCES = SQL_RARE_TOKEN_RATE_SOURCES.format(
    poly=hash_sql.poly64_expr("tok")
)


def q_dupcluster_size_hist(sf_dir: str):
    """Duplicate-cluster size histogram: for each exact-duplicate
    cluster size k (over normalized-text fingerprints), how many
    clusters and how many documents — the one-table summary of 'how
    duplicated is this corpus' that sits atop every dedup report.
    Per-batch fingerprint partials → one (fingerprint) count groupby →
    a SECOND tiny map-side histogram partial per block → one bounded
    (size → counts) groupby. Pure integers."""
    from ray.data.aggregate import Sum

    from ..ops.text import doc_fingerprint

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def fp_partial(b: pa.Table) -> pa.Table:
        t = doc_fingerprint(b, "text").select(["fingerprint"])
        t = t.append_column("n", pa.array(np.ones(len(t), np.int64)))
        return (
            t.group_by("fingerprint").aggregate([("n", "sum")])
            .rename_columns(["fingerprint", "n"])
        )

    def hist_partial(b: pa.Table) -> pa.Table:
        k = b.column("n").to_numpy(zero_copy_only=False)
        uk, ki = np.unique(k, return_inverse=True)
        nc = np.zeros(len(uk), np.int64)
        np.add.at(nc, ki, 1)
        nd = np.zeros(len(uk), np.int64)
        np.add.at(nd, ki, k)
        return pa.table(
            {
                "cluster_size": pa.array(uk.astype(np.int64)),
                "n_clusters": pa.array(nc),
                "n_docs": pa.array(nd),
            }
        )

    return (
        ds.map_batches(fp_partial, batch_format="pyarrow")
        .groupby("fingerprint")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(
            Sum("n_clusters", alias_name="n_clusters"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )


SQL_DUPCLUSTER_SIZE_HIST = """
WITH f AS ({fp}),
c AS (SELECT fingerprint, count(*)::BIGINT AS k FROM f GROUP BY fingerprint)
SELECT k AS cluster_size, count(*)::BIGINT AS n_clusters,
       sum(k)::BIGINT AS n_docs
FROM c GROUP BY k
"""
SQL_DUPCLUSTER_SIZE_HIST = SQL_DUPCLUSTER_SIZE_HIST.format(
    fp=hash_sql.fingerprint_sql("documents")
)


def q_rfm_segments_customers(sf_dir: str):
    """RFM segmentation (Recency / Frequency / Monetary) — the classic
    composite: per-customer last-order day, order count, and lifetime
    cents reduce in ONE grouped aggregate; each dimension's exact
    quartile BOUNDS come from the distributed shared-histogram
    quantile op over that bounded aggregate (no global sort, no NTILE
    rank pass — value-based binning 1 + Σ(v > qᵢ), which the oracle
    replays verbatim with quantile_disc bounds); one final tiny rollup
    counts customers per (r, f, m) cell. Integers throughout — the
    float quartile bounds are exact column elements. All THREE
    dimensions' bounds resolve through ONE melted grouped-quantile
    pass (three sequential single-column passes measured 15 s of Ray
    job overhead at sf0.1; the shared histogram does it in one)."""
    from ray.data.aggregate import Max, Sum

    from ..ops.quantiles import grouped_quantiles

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[D]").view("int64")
        )
        cents = np.round(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "last_day": pa.array(day),
                "f": pa.array(np.ones(len(b), np.int64)),
                "m": pa.array(cents),
            }
        )
        return (
            t.group_by("o_custkey")
            .aggregate([("last_day", "max"), ("f", "sum"), ("m", "sum")])
            .rename_columns(["o_custkey", "last_day", "f", "m"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Max("last_day", alias_name="last_day"),
            Sum("f", alias_name="f"),
            Sum("m", alias_name="m"),
        )
        .materialize()
    )
    def melt(b: pa.Table) -> pa.Table:
        return pa.concat_tables(
            pa.table(
                {
                    "dim": pa.array([dim] * len(b), pa.string()),
                    "v": pc.cast(b.column(dim), pa.float64()),
                }
            )
            for dim in ("last_day", "f", "m")
        )

    qt = grouped_quantiles(
        agg.map_batches(melt, batch_format="pyarrow"),
        "v",
        "dim",
        qs=(0.25, 0.5, 0.75),
        n_bins=512,
    )
    bounds: dict[str, list[float]] = {d: [0.0, 0.0, 0.0] for d in ("last_day", "f", "m")}
    for dim, q, v in zip(
        qt.column("dim").to_pylist(),
        qt.column("q").to_pylist(),
        qt.column("value").to_pylist(),
    ):
        bounds[dim][{0.25: 0, 0.5: 1, 0.75: 2}[q]] = v

    def code(v: np.ndarray, qs: list[float]) -> np.ndarray:
        c = np.ones(len(v), np.int64)
        for q in qs:
            c += (v > q).astype(np.int64)
        return c

    def binify(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "r_code": pa.array(
                    code(
                        b.column("last_day").to_numpy(zero_copy_only=False),
                        bounds["last_day"],
                    )
                ),
                "f_code": pa.array(
                    code(b.column("f").to_numpy(zero_copy_only=False), bounds["f"])
                ),
                "m_code": pa.array(
                    code(b.column("m").to_numpy(zero_copy_only=False), bounds["m"])
                ),
                "n": pa.array(np.ones(len(b), np.int64)),
            }
        )
        return (
            t.group_by(["r_code", "f_code", "m_code"]).aggregate([("n", "sum")])
            .rename_columns(["r_code", "f_code", "m_code", "n_customers"])
        )

    return (
        agg.map_batches(binify, batch_format="pyarrow")
        .groupby(["r_code", "f_code", "m_code"])
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )


SQL_RFM_SEGMENTS_CUSTOMERS = """
WITH a AS (
  SELECT o_custkey,
         max(CAST(o_orderdate AS DATE)) AS last_day,
         count(*)::BIGINT AS f,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS m
  FROM orders GROUP BY o_custkey
), q AS (
  SELECT quantile_disc(last_day, [0.25, 0.5, 0.75]) AS ql,
         quantile_disc(f, [0.25, 0.5, 0.75]) AS qf,
         quantile_disc(m, [0.25, 0.5, 0.75]) AS qm
  FROM a
), c AS (
  SELECT (1 + (a.last_day > q.ql[1])::INT + (a.last_day > q.ql[2])::INT
            + (a.last_day > q.ql[3])::INT)::BIGINT AS r_code,
         (1 + (a.f > q.qf[1])::INT + (a.f > q.qf[2])::INT
            + (a.f > q.qf[3])::INT)::BIGINT AS f_code,
         (1 + (a.m > q.qm[1])::INT + (a.m > q.qm[2])::INT
            + (a.m > q.qm[3])::INT)::BIGINT AS m_code
  FROM a CROSS JOIN q
)
SELECT r_code, f_code, m_code, count(*)::BIGINT AS n_customers
FROM c GROUP BY r_code, f_code, m_code
"""


def q_anomaly_days_events(sf_dir: str):
    """Aggregate-over-aggregate anomaly screen: daily event counts,
    their median, their MAD (median absolute deviation), and a flag
    for days where |n − med| > 3·MAD — the robust volume-anomaly
    monitor. The daily-count table is bounded (one row per day), so
    both order statistics and the flags run driver-side over the
    shared `_daily_counts` integer aggregate; everything is integer
    arithmetic (day counts, integer median/MAD of integers, an
    integer threshold compare — no float op at all)."""
    ud, n = _daily_counts(sf_dir)
    d = ud.view("datetime64[us]")
    k = len(n)
    sn = np.sort(n)
    med = int(sn[max(1, math.ceil(0.5 * k)) - 1])
    dev = np.abs(n - med)
    sd = np.sort(dev)
    mad = int(sd[max(1, math.ceil(0.5 * k)) - 1])
    flag = dev > 3 * mad
    return pa.table(
        {
            "day": pa.array(d),
            "n": pa.array(n.astype(np.int64)),
            "med": pa.array(np.full(k, med, np.int64)),
            "mad": pa.array(np.full(k, mad, np.int64)),
            "is_anomaly": pa.array(flag),
        }
    )


SQL_ANOMALY_DAYS_EVENTS = """
WITH c AS (
  SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
  FROM events GROUP BY day
), m AS (SELECT quantile_disc(n, 0.5)::BIGINT AS med FROM c),
d AS (SELECT c.day, c.n, m.med, abs(c.n - m.med)::BIGINT AS dev
      FROM c CROSS JOIN m),
md AS (SELECT quantile_disc(dev, 0.5)::BIGINT AS mad FROM d)
SELECT d.day, d.n, d.med, md.mad, d.dev > 3 * md.mad AS is_anomaly
FROM d CROSS JOIN md
"""


def q_weekday_hour_heatmap_events(sf_dir: str):
    """Traffic heatmap rollup: event counts by (ISO weekday, hour of
    day) with each cell's share of the week — the seasonality view
    every ops dashboard opens with. Map-side integer partials over the
    7 × 24 bounded grid, one tiny grouped sum, one mirrored division.
    Weekday follows ISO (Mon = 1), matching DuckDB's isodow."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    day_us = np.int64(86_400_000_000)
    hour_us = np.int64(3_600_000_000)

    def partial(b: pa.Table) -> pa.Table:
        us = (
            b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
            .view("int64")
        )
        day = us // day_us
        # 1970-01-01 was a Thursday (isodow 4)
        dow = (day + 3) % 7 + 1
        hour = (us % day_us) // hour_us
        t = pa.table(
            {
                "dow": pa.array(dow.astype(np.int64)),
                "hour": pa.array(hour.astype(np.int64)),
                "n": pa.array(np.ones(len(b), np.int64)),
            }
        )
        return (
            t.group_by(["dow", "hour"]).aggregate([("n", "sum")])
            .rename_columns(["dow", "hour", "n"])
        )

    out = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dow", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .iter_batches(batch_format="pyarrow")
    )
    n = out.column("n").to_numpy(zero_copy_only=False)
    total = n.sum()
    return out.append_column("share", pa.array(n / total, pa.float64()))


SQL_WEEKDAY_HOUR_HEATMAP_EVENTS = """
WITH c AS (
  SELECT isodow(ts)::BIGINT AS dow, hour(ts)::BIGINT AS hour,
         count(*)::BIGINT AS n
  FROM events GROUP BY dow, hour
)
SELECT dow, hour, n,
       CAST(n AS DOUBLE) / (SELECT sum(n) FROM c) AS share
FROM c
"""


def q_daily_p95_events(sf_dir: str):
    """Daily p50/p95 trend of event values — 'is the metric's tail
    drifting day over day', the standard latency/size trend panel.
    Days are a BOUNDED group universe, so the shared-histogram grouped
    quantile op applies directly (constant passes regardless of day
    count, exact order statistics); day stays integer µs until the
    final column."""
    from ..ops.quantiles import grouped_quantiles

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    day_us = np.int64(86_400_000_000)

    def to_day(b: pa.Table) -> pa.Table:
        us = (
            b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
            .view("int64")
        )
        return pa.table(
            {
                "day": pa.array(us - us % day_us),
                "value": b.column("value"),
            }
        )

    qt = grouped_quantiles(
        ds.map_batches(to_day, batch_format="pyarrow"),
        "value",
        "day",
        qs=(0.5, 0.95),
        n_bins=256,
    )
    d = np.asarray(qt.column("day").to_pylist(), dtype=np.int64)
    return pa.table(
        {
            "day": pa.array(d.view("datetime64[us]")),
            "q": qt.column("q"),
            "value": qt.column("value"),
        }
    )


SQL_DAILY_P95_EVENTS = """
SELECT date_trunc('day', ts) AS day,
       unnest([0.5, 0.95])::DOUBLE AS q,
       unnest(quantile_disc(value, [0.5, 0.95]))::DOUBLE AS value
FROM events WHERE value IS NOT NULL
GROUP BY day
"""


def q_autocorr_daily_events(sf_dir: str):
    """Lag-1 autocorrelation of the daily event-count series — the
    one-number time-series diagnostic ('is today's volume predictive
    of tomorrow's'). The daily counts are a bounded integer aggregate;
    the lag-1 Pearson runs over consecutive-day pairs (gaps excluded)
    in exact integer moments, with the one float expression replayed
    verbatim by the oracle — the regression-slope contract applied to
    a self-join of the series."""
    ud, n = _daily_counts(sf_dir)  # day-sorted (np.unique) already
    d = ud // np.int64(86_400_000_000)
    adj = d[1:] - d[:-1] == 1
    x, y = n[:-1][adj], n[1:][adj]
    k = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx = int((x * x).sum())
    syy = int((y * y).sum())
    sxy = int((x * y).sum())
    num = float(k * sxy - sx * sy)
    den = math.sqrt(float(k * sxx - sx * sx)) * math.sqrt(float(k * syy - sy * sy))
    return pa.table(
        {
            "n_pairs": pa.array([k], pa.int64()),
            "autocorr_lag1": pa.array(
                [num / den if den != 0.0 else None], pa.float64()
            ),
        }
    )


SQL_AUTOCORR_DAILY_EVENTS = """
WITH c AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS day,
         count(*)::BIGINT AS n
  FROM events GROUP BY day
), p AS (
  SELECT a.n AS x, b.n AS y
  FROM c a JOIN c b ON b.day = a.day + 1
), m AS (
  SELECT count(*)::BIGINT AS k, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
         sum(x * y)::BIGINT AS sxy
  FROM p
)
SELECT k AS n_pairs,
       CASE WHEN (k * sxx - sx * sx) > 0 AND (k * syy - sy * sy) > 0 THEN
         CAST(k * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(k * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(k * syy - sy * sy AS DOUBLE)))
       END AS autocorr_lag1
FROM m
"""


def q_transition_probs_events(sf_dir: str):
    """Row-stochastic Markov transition probabilities: the transition
    counts (the shared `_transition_partial` lexsort machinery) plus
    each row's share of its PREV-type total — P(cur | prev). Counts
    stay integers through both groupbys; the one division per row is
    computed over the bounded types × types aggregate on the driver
    and mirrored in the oracle."""
    # the count pipeline IS q_transition_matrix_events — reuse it
    # (review fix: the ~20 duplicated pipeline lines are gone)
    out = pa.concat_tables(
        q_transition_matrix_events(sf_dir).iter_batches(batch_format="pyarrow")
    )
    prev = out.column("prev_type").to_numpy(zero_copy_only=False)
    n = out.column("n").to_numpy(zero_copy_only=False)
    up, pi = np.unique(prev, return_inverse=True)
    tot = np.zeros(len(up), np.int64)
    np.add.at(tot, pi, n)
    return (
        out.append_column("prev_total", pa.array(tot[pi]))
        .append_column("prob", pa.array(n / tot[pi], pa.float64()))
    )


SQL_TRANSITION_PROBS_EVENTS = """
WITH s AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), c AS (
  SELECT prev_type, event_type AS cur_type, count(*)::BIGINT AS n
  FROM s WHERE prev_type IS NOT NULL
  GROUP BY prev_type, cur_type
)
SELECT prev_type, cur_type, n,
       sum(n) OVER (PARTITION BY prev_type)::BIGINT AS prev_total,
       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS prob
FROM c
"""


def _coverage_bucket(g: pa.Table) -> pa.Table:
    """Per-hash-bucket coverage partial: combine the per-batch token
    count partials (the bucket owns every copy of its hashes), then
    emit the bucket's top-1000 counts plus one total-mass marker row
    (count = bucket total, is_total = true). Any global top-1000 token
    is in its bucket's top-1000, so the driver's merge is exact."""
    h0 = g.column("h").to_numpy(zero_copy_only=False)
    n0 = g.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((h0,))
    hs, ns = h0[order], n0[order]
    first = np.ones(len(hs), dtype=bool)
    first[1:] = hs[1:] != hs[:-1]
    gid = np.cumsum(first) - 1
    n = np.zeros(int(gid[-1]) + 1 if len(gid) else 0, np.int64)
    np.add.at(n, gid, ns)
    top = np.sort(n)[::-1][:1000]
    return pa.table(
        {
            "cnt": pa.array(np.concatenate([top, [n.sum()]]).astype(np.int64)),
            "is_total": pa.array(
                np.concatenate([np.zeros(len(top), bool), [True]])
            ),
        }
    )


def q_coverage_curve_docs(sf_dir: str):
    """Zipf coverage curve: what share of ALL token occurrences the
    top-10 / top-100 / top-1000 corpus vocabulary covers — the
    head-heaviness audit behind tokenizer-vocab and stopword budgeting
    decisions. Per-batch (hash, n) partials shuffle ONCE by hash
    bucket; each bucket combines its partials and ships its top-1000
    counts + a total-mass marker (exact: a global top-k element is in
    its bucket's top-k, and count-tied tokens contribute identical
    mass, so the curve is tie-order-free). Integer masses, mirrored
    divisions."""
    from ..ops.texthash import token_hashes

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def counts(b: pa.Table) -> pa.Table:
        th, _offs = token_hashes(b.column("text"), lower=True)
        h = th.view(np.int64)
        uh, hi = np.unique(h, return_inverse=True)
        n = np.zeros(len(uh), np.int64)
        np.add.at(n, hi, 1)
        return pa.table(
            {
                "h": pa.array(uh),
                "n": pa.array(n),
                "hb": pa.array(uh & np.int64(255)),
            }
        )

    cnt_all: list[np.ndarray] = []
    total = 0
    for b in (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(_coverage_bucket, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        c = b.column("cnt").to_numpy(zero_copy_only=False)
        m = b.column("is_total").to_numpy(zero_copy_only=False)
        total += int(c[m].sum())
        cnt_all.append(c[~m])
    merged = np.sort(np.concatenate(cnt_all))[::-1] if cnt_all else np.zeros(0)
    ks = (10, 100, 1000)
    mass = [int(merged[: min(k, len(merged))].sum()) for k in ks]
    return pa.table(
        {
            "k": pa.array(list(ks), pa.int64()),
            "top_k_mass": pa.array(mass, pa.int64()),
            "total_mass": pa.array([total] * len(ks), pa.int64()),
            "coverage": pa.array(
                [m / total if total else 0.0 for m in mass], pa.float64()
            ),
        }
    )


SQL_COVERAGE_CURVE_DOCS = """
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), t AS (SELECT {poly} AS h FROM toks WHERE tok <> ''),
c AS (SELECT h, count(*)::BIGINT AS n FROM t GROUP BY h),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, h) AS rn FROM c),
tot AS (SELECT sum(n)::BIGINT AS total FROM c)
SELECT k, (SELECT sum(n) FROM r WHERE rn <= k)::BIGINT AS top_k_mass,
       tot.total AS total_mass,
       CAST((SELECT sum(n) FROM r WHERE rn <= k) AS DOUBLE) / tot.total
         AS coverage
FROM (SELECT unnest([10, 100, 1000])::BIGINT AS k) CROSS JOIN tot
"""
SQL_COVERAGE_CURVE_DOCS = SQL_COVERAGE_CURVE_DOCS.format(
    poly=hash_sql.poly64_expr("tok")
)


def q_null_profile_tables(sf_dir: str):
    """Column null-profile (the first data-profiling query every
    warehouse runs): per (table, column), row count and null count
    over the documents and events tables. Per-batch vectorized null
    tallies collapse each block to one row per column before the tiny
    grouped sum; integer counts plus one mirrored rate division."""
    from ray.data.aggregate import Sum

    rd = _rd()
    out_parts: list[pa.Table] = []
    for tbl in ("documents", "events"):
        ds = rd.read_parquet(f"{sf_dir}/{tbl}.parquet")
        cols = ds.schema().names

        def prof(b: pa.Table, tbl: str = tbl, cols: tuple = tuple(cols)) -> pa.Table:
            return pa.table(
                {
                    "tbl": pa.array([tbl] * len(cols), pa.string()),
                    "col": pa.array(list(cols), pa.string()),
                    "n_rows": pa.array(
                        np.full(len(cols), len(b), np.int64)
                    ),
                    "n_nulls": pa.array(
                        np.array(
                            [b.column(c).null_count for c in cols], np.int64
                        )
                    ),
                }
            )

        out_parts.append(
            pa.concat_tables(
                ds.map_batches(prof, batch_format="pyarrow")
                .groupby(["tbl", "col"])
                .aggregate(
                    Sum("n_rows", alias_name="n_rows"),
                    Sum("n_nulls", alias_name="n_nulls"),
                )
                .iter_batches(batch_format="pyarrow")
            )
        )
    out = pa.concat_tables(out_parts)
    nr = out.column("n_rows").to_numpy(zero_copy_only=False)
    nn = out.column("n_nulls").to_numpy(zero_copy_only=False)
    return out.append_column("null_rate", pa.array(nn / nr, pa.float64()))


SQL_NULL_PROFILE_TABLES = """
WITH p AS (
  SELECT 'documents' AS tbl, c.col,
         (SELECT count(*) FROM documents)::BIGINT AS n_rows,
         CASE c.col
           WHEN 'doc_id' THEN (SELECT count(*) - count(doc_id) FROM documents)
           WHEN 'text' THEN (SELECT count(*) - count(text) FROM documents)
           WHEN 'lang' THEN (SELECT count(*) - count(lang) FROM documents)
           WHEN 'source' THEN (SELECT count(*) - count(source) FROM documents)
           WHEN 'n_chars' THEN (SELECT count(*) - count(n_chars) FROM documents)
         END::BIGINT AS n_nulls
  FROM (SELECT unnest(['doc_id', 'text', 'lang', 'source', 'n_chars']) AS col) c
  UNION ALL
  SELECT 'events' AS tbl, c.col,
         (SELECT count(*) FROM events)::BIGINT AS n_rows,
         CASE c.col
           WHEN 'event_id' THEN (SELECT count(*) - count(event_id) FROM events)
           WHEN 'ts' THEN (SELECT count(*) - count(ts) FROM events)
           WHEN 'user_id' THEN (SELECT count(*) - count(user_id) FROM events)
           WHEN 'event_type' THEN (SELECT count(*) - count(event_type) FROM events)
           WHEN 'value' THEN (SELECT count(*) - count(value) FROM events)
           WHEN 'props' THEN (SELECT count(*) - count(props) FROM events)
         END::BIGINT AS n_nulls
  FROM (SELECT unnest(['event_id', 'ts', 'user_id', 'event_type', 'value',
                       'props']) AS col) c
)
SELECT tbl, col, n_rows, n_nulls,
       CAST(n_nulls AS DOUBLE) / n_rows AS null_rate
FROM p
"""


def q_pmi_bigrams_documents(sf_dir: str):
    """Top-100 collocations by pointwise mutual information over
    adjacent lowered tokens (support ≥ 5) — the statistical
    collocation extractor (Church & Hanks) behind multi-word-entity
    vocabularies. ops/vocab.pmi_bigrams: two bounded bucket exchanges
    (exact bigram counts pruned at the support floor, then unigram
    counts for only the candidate tokens + total mass), one libm ln
    per candidate in the oracle's float op order."""
    from ..ops.vocab import pmi_bigrams

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return pmi_bigrams(ds, min_count=5, k=100)


SQL_PMI_BIGRAMS_DOCUMENTS = """
WITH a AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents WHERE text IS NOT NULL
), uni AS (SELECT unnest(l) AS tok FROM a),
uc AS (SELECT tok, count(*)::BIGINT AS n FROM uni GROUP BY tok),
tot AS (SELECT sum(n)::BIGINT AS nn FROM uc),
bg AS (
  SELECT unnest(list_transform(
           l, (x, i) -> CASE WHEN i < len(l) THEN x || ' ' || l[i + 1] END
         )) AS bigram
  FROM a
), bc AS (
  SELECT bigram, count(*)::BIGINT AS n_ab
  FROM bg WHERE bigram IS NOT NULL
  GROUP BY bigram HAVING count(*) >= 5
)
SELECT b.bigram, b.n_ab, ua.n AS n_a, ub.n AS n_b,
       ln(CAST(b.n_ab AS DOUBLE) * tot.nn / (ua.n * ub.n)) AS pmi
FROM bc b CROSS JOIN tot
JOIN uc ua ON ua.tok = split_part(b.bigram, ' ', 1)
JOIN uc ub ON ub.tok = split_part(b.bigram, ' ', 2)
ORDER BY pmi DESC, b.bigram LIMIT 100
"""


def _conversion_delays(g: pa.Table) -> pa.Table:
    """Per-user funnel-latency kernel: first signup µs, then the first
    purchase AT OR AFTER it — two unique+scatter min passes over the
    partition, no sort of the event stream."""
    uid = g.column("user_id").to_numpy(zero_copy_only=False)
    us = (
        g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        .view("int64")
    )
    et = g.column("event_type").to_numpy(zero_copy_only=False)
    uu, ui = np.unique(uid, return_inverse=True)
    BIG = np.int64(2**62)
    s_min = np.full(len(uu), BIG, np.int64)
    m = et == "signup"
    np.minimum.at(s_min, ui[m], us[m])
    p_min = np.full(len(uu), BIG, np.int64)
    m = (et == "purchase") & (us >= s_min[ui])
    np.minimum.at(p_min, ui[m], us[m])
    ok = (s_min < BIG) & (p_min < BIG)
    return pa.table({"delay_us": pa.array((p_min - s_min)[ok])})


def q_signup_to_purchase_delay(sf_dir: str):
    """Funnel latency distribution: quantiles of each converting
    user's time from FIRST signup to the first purchase at-or-after it
    — 'how long does conversion take', the funnel's companion metric.
    Coarse-pk user co-partition → per-user delays (two scatter-min
    passes, no event-stream sort) → the exact distributed quantile op
    over the one-row-per-converting-user derived dataset. Integer µs
    order statistics, bitwise-equal to quantile_disc."""
    from ..ops.quantiles import quantiles_exact

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    delays = (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_conversion_delays, batch_format="pyarrow")
    )
    return quantiles_exact(delays, "delay_us", qs=(0.25, 0.5, 0.75, 0.9), n_bins=256)


SQL_SIGNUP_TO_PURCHASE_DELAY = """
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.s_us
  GROUP BY e.user_id
), d AS (
  SELECT CAST(p.p_us - s.s_us AS BIGINT) AS delay FROM p JOIN s USING (user_id)
)
SELECT unnest([0.25, 0.5, 0.75, 0.9])::DOUBLE AS q,
       unnest(quantile_disc(delay, [0.25, 0.5, 0.75, 0.9]))::DOUBLE AS value
FROM d
"""


def q_full_outer_customer_activity(sf_dir: str):
    """Explicit FULL OUTER join: every key on EITHER side — customers
    with their event counts, event-only users with null customer
    fields, silent customers with zero events. Completes the join-type
    matrix (inner/left/anti/semi/as-of/range elsewhere). Same
    flag-row shape as the EXCEPT query: each side map-reduces to
    tagged per-key partials (events pre-count map-side, so the fact
    table ships one row per (batch, user)), one grouped aggregate
    merges, and the null-field semantics fall out of the flags —
    no payload ever waits on the other side."""
    from ray.data.aggregate import Max, Sum

    rd = _rd()
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def cust_side(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pc.cast(b.column("c_custkey"), pa.int64()),
                "seg": b.column("c_mktsegment"),
                "is_cust": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "n_events": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            }
        )

    def ev_side(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            b.column("user_id").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "key": pa.array(u.astype(np.int64)),
                "seg": pa.nulls(len(u), pa.string()),
                "is_cust": pa.array(np.zeros(len(u), dtype=np.int64)),
                "n_events": pa.array(c.astype(np.int64)),
            }
        )

    merged = (
        cust.map_batches(cust_side, batch_format="pyarrow")
        .union(ev.map_batches(ev_side, batch_format="pyarrow"))
        .groupby("key")
        .aggregate(
            Max("is_cust", alias_name="is_cust"),
            Max("seg", alias_name="c_mktsegment"),
            Sum("n_events", alias_name="n_events"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        is_cust = pc.equal(b.column("is_cust"), 1)
        return pa.table(
            {
                "key": b.column("key"),
                "c_mktsegment": b.column("c_mktsegment"),
                "has_customer": pc.cast(is_cust, pa.int64()),
                "n_events": b.column("n_events"),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


SQL_FULL_OUTER_CUSTOMER_ACTIVITY = """
WITH e AS (SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY user_id)
SELECT COALESCE(c.c_custkey, e.user_id) AS key,
       c.c_mktsegment,
       CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END::BIGINT AS has_customer,
       COALESCE(e.n, 0)::BIGINT AS n_events
FROM customer c FULL OUTER JOIN e ON c.c_custkey = e.user_id
"""


def _lead_gaps(g: pa.Table) -> pa.Table:
    return gap_table(g, "next_gap_us", forward=True)


def q_lead_event_gap(sf_dir: str):
    """LEAD window (forward gap): microseconds until each user's NEXT
    event, NULL for the last — the LAG query's shared `gap_table`
    kernel with the direction flag reversed (one boundary-mask
    implementation for both, the bug class the window property tests
    guard). Integer µs end to end, null-masked int64 out."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    return (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_lead_gaps, batch_format="pyarrow")
    )


SQL_LEAD_EVENT_GAP = """
SELECT user_id, event_id, ts,
       lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - epoch_us(ts) AS next_gap_us
FROM events
"""


def q_cumulative_users(sf_dir: str):
    """Accumulating snapshot: per day, NEW users (first ever activity
    that day) and the cumulative users-to-date — the growth-curve
    query. New-user counts come from each partition's per-user run
    starts (one lexsort, no distinct set); the cumulative sum runs
    once over the tiny per-day table on the driver (O(days)). A naive
    SQL needs a window over a distinct-first-day subquery; the
    distributed shape ships only (day, count) partials."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def firsts(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        day = (
            g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[D]")
        ).view("int64")
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        n = len(u)
        start = np.ones(n, dtype=bool)
        if n:
            start[1:] = u[1:] != u[:-1]
        fd, counts = np.unique(d[start], return_counts=True)
        return pa.table(
            {"day": pa.array(fd), "n_new": pa.array(counts.astype(np.int64))}
        )

    out = (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(firsts, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n_new", alias_name="new_users"))
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    day = t.column("day").to_numpy(zero_copy_only=False)
    order = np.argsort(day, kind="stable")
    new = t.column("new_users").to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            "day": pa.array(
                day[order].view("datetime64[D]").astype("datetime64[us]")
            ),
            "new_users": pa.array(new),
            "cum_users": pa.array(np.cumsum(new)),
        }
    )


SQL_CUMULATIVE_USERS = """
WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events
           GROUP BY user_id),
d AS (SELECT day, count(*)::BIGINT AS new_users FROM f GROUP BY day)
SELECT CAST(day AS TIMESTAMP) AS day, new_users,
       sum(new_users) OVER (ORDER BY day
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_users
FROM d
"""


def q_retention_cohorts(sf_dir: str):
    """Weekly retention cohorts: users grouped by FIRST active day,
    counted per weeks-since-cohort — the standard retention triangle.
    Users are hash-co-partitioned so each partition resolves its
    users' whole history locally: one lexsort finds each user's cohort
    day (run start) and the distinct (user, week-offset) memberships
    (a keep mask over the sorted run — offsets are nondecreasing, so
    dedup is one shifted compare, no set); partitions emit pre-counted
    (cohort, offset) partials and ONE tiny grouped sum finishes. Every
    arithmetic step is integer days, bit-stable at any partitioning."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def cohort_partial(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        day = (
            g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[D]")
        ).view("int64")
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        n = len(u)
        start = np.ones(n, dtype=bool)
        if n:
            start[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(start)
        lengths = np.diff(np.append(starts, n))
        cohort = np.repeat(d[start], lengths)
        wo = (d - cohort) // 7
        keep = start.copy()
        if n > 1:
            keep[1:] |= wo[1:] != wo[:-1]
        t = pa.table(
            {
                "cohort": pa.array(cohort[keep]),
                "week_offset": pa.array(wo[keep]),
                "n": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
            }
        )
        return (
            t.group_by(["cohort", "week_offset"])
            .aggregate([("n", "sum")])
            .rename_columns(["cohort", "week_offset", "n"])
        )

    out = (
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(cohort_partial, batch_format="pyarrow")
        .groupby(["cohort", "week_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return pa.table(
        {
            "cohort_day": pa.array(
                t.column("cohort")
                .to_numpy(zero_copy_only=False)
                .view("datetime64[D]")
                .astype("datetime64[us]")
            ),
            "week_offset": t.column("week_offset"),
            "n_users": t.column("n_users"),
        }
    )


SQL_RETENTION_COHORTS = """
WITH p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
f AS (SELECT user_id, min(day) AS cohort FROM p GROUP BY user_id),
r AS (SELECT DISTINCT p.user_id, f.cohort,
             CAST(date_diff('day', f.cohort, p.day) // 7 AS BIGINT) AS week_offset
      FROM p JOIN f USING (user_id))
SELECT CAST(cohort AS TIMESTAMP) AS cohort_day, week_offset,
       count(*)::BIGINT AS n_users
FROM r GROUP BY cohort, week_offset
"""


def q_quantile_bucket_events(sf_dir: str):
    """Global quantile-bucket feature binning: every event labeled
    with its value quartile (q1..q4) — the equal-frequency
    discretization step before feature hashing. Thresholds come from
    ONE exact distributed quantile pass (actual column elements, no
    sort); the labeling pass is a pure searchsorted map against the
    3-element broadcast boundary array. Buckets are
    (lo, hi]-style: value ≤ p25 → q1, ≤ p50 → q2, ≤ p75 → q3, else
    q4 — replayed verbatim by the oracle's CASE ladder."""
    from ..ops.quantiles import quantiles_exact

    rd = _rd()
    path = f"{sf_dir}/events.parquet"
    qt = quantiles_exact(
        rd.read_parquet(path, columns=["value"]), "value", qs=(0.25, 0.5, 0.75)
    )
    edges = np.sort(qt.column("value").to_numpy(zero_copy_only=False))

    labels = np.asarray(["q1", "q2", "q3", "q4"], dtype=object)

    def bucket(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        # side='left' counts edges STRICTLY below v, so v == edge lands
        # in the lower bucket — exactly the CASE ladder's ≤ semantics
        idx = np.searchsorted(edges, v, side="left")
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "value": b.column("value"),
                "bucket": pa.array(labels[idx], pa.string()),
            }
        )

    return rd.read_parquet(path, columns=["event_id", "value"]).map_batches(
        bucket, batch_format="pyarrow"
    )


SQL_QUANTILE_BUCKET_EVENTS = """
WITH t AS (
  SELECT quantile_disc(value, 0.25) AS p25,
         quantile_disc(value, 0.50) AS p50,
         quantile_disc(value, 0.75) AS p75
  FROM events WHERE value IS NOT NULL
)
SELECT e.event_id, e.value,
       CASE WHEN e.value <= t.p25 THEN 'q1'
            WHEN e.value <= t.p50 THEN 'q2'
            WHEN e.value <= t.p75 THEN 'q3'
            ELSE 'q4' END AS bucket
FROM events e, t
"""


def q_sentence_stats_documents(sf_dir: str):
    """Per-document sentence statistics: terminal-punctuation run
    count ('[.!?]+' — both engines are RE2, so counts agree exactly)
    and average sentence length in chars. Pure shuffle-free map over
    pruned columns; the regex runs in Arrow's C kernel
    (count_substring_regex), not Python, and the single division runs
    in the oracle's op order. The standard text-quality signal feeding
    corpus filters alongside the Gopher battery."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )

    def stats(b: pa.Table) -> pa.Table:
        n_sent = pc.cast(
            pc.count_substring_regex(b.column("text"), "[.!?]+"), pa.int64()
        )
        denom = pc.cast(pc.max_element_wise(n_sent, 1), pa.float64())
        avg_chars = pc.divide(pc.cast(b.column("n_chars"), pa.float64()), denom)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_sentences": n_sent,
                "avg_sentence_chars": avg_chars,
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


SQL_SENTENCE_STATS_DOCUMENTS = """
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
       CAST(n_chars AS DOUBLE)
         / CAST(greatest(length(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE)
         AS avg_sentence_chars
FROM documents
"""


def q_funnel_events(sf_dir: str):
    """Ordered 3-step funnel: users who signed up, then purchased AT OR
    AFTER their first signup, then clicked at or after that first
    qualifying purchase. Users are hash-co-partitioned, so each
    partition resolves its users' whole journey locally: one lexsort,
    then each step is a filtered first-per-user (np.unique on the
    sorted run) gated on the previous step's time via searchsorted —
    no joins, no per-user Python. Partitions emit one 3-count partial
    row; the driver sums ≤256 of them."""
    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )


    def funnel(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        us = (
            g.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view("int64")
        )
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((us, uid))
        u, t, e = uid[order], us[order], et[order]

        def first_after(step_mask, gate_u, gate_t):
            su, st = u[step_mask], t[step_mask]
            if gate_u is None:
                uu, idx = np.unique(su, return_index=True)
                return uu, st[idx]
            pos = np.searchsorted(gate_u, su)
            pos_c = np.minimum(pos, len(gate_u) - 1) if len(gate_u) else pos
            ok = (
                (pos < len(gate_u))
                & (gate_u[pos_c] == su)
                & (st >= gate_t[pos_c])
                if len(gate_u)
                else np.zeros(len(su), dtype=bool)
            )
            uu, idx = np.unique(su[ok], return_index=True)
            return uu, st[ok][idx]

        u1, t1 = first_after(e == "signup", None, None)
        u2, t2 = first_after(e == "purchase", u1, t1)
        u3, _ = first_after(e == "click", u2, t2)
        return pa.table(
            {
                "n_signup": pa.array([len(u1)]),
                "n_purchase": pa.array([len(u2)]),
                "n_click": pa.array([len(u3)]),
            }
        )

    parts = pa.concat_tables(
        ds.map_batches(_coarse_pk("user_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(funnel, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    return pa.table(
        {
            c: pa.array([pc.sum(parts.column(c)).as_py() or 0], pa.int64())
            for c in ("n_signup", "n_purchase", "n_click")
        }
    )


SQL_FUNNEL_EVENTS = """
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
       JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1
       WHERE e.event_type = 'purchase' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
       JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2
       WHERE e.event_type = 'click' GROUP BY e.user_id)
SELECT (SELECT count(*) FROM s1)::BIGINT AS n_signup,
       (SELECT count(*) FROM s2)::BIGINT AS n_purchase,
       (SELECT count(*) FROM s3)::BIGINT AS n_click
"""


def q_zscore_events(sf_dir: str):
    """Two-pass distributed feature normalization: z-score of each
    event's value against its event-type population. Pass 1 reduces
    every batch to (type, n, Σv, Σv²) partials in exact integer
    centi-units (2-decimal values; v²·rows holds int64 past 10⁹
    rows), merged by one tiny grouped sum; the ≤types-row stats table
    is captured by value into the pass-2 closure (broadcast once per
    task, not per batch). Pass 2 is a pure map — the z formula runs in
    the oracle's float op order, so every score is bit-equal."""
    from ray.data.aggregate import Sum

    rd = _rd()
    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        # nulls are excluded from the stats, like SQL sum()/count():
        # a NaN would otherwise integerize to INT64_MIN garbage
        b = b.drop_null()
        vu = np.round(b.column("value").to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "n": pa.array(np.ones(len(vu), dtype=np.int64)),
                "s": pa.array(vu),
                "ss": pa.array(vu * vu),
            }
        )
        return (
            t.group_by("event_type")
            .aggregate([("n", "sum"), ("s", "sum"), ("ss", "sum")])
            .rename_columns(["event_type", "n", "s", "ss"])
        )

    stats_t = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"), Sum("ss", alias_name="ss")
        )
        .iter_batches(batch_format="pyarrow")
    )
    stats = {}
    for i in range(stats_t.num_rows):
        n = float(stats_t.column("n")[i].as_py())
        s = float(stats_t.column("s")[i].as_py())
        ss = float(stats_t.column("ss")[i].as_py())
        stats[stats_t.column("event_type")[i].as_py()] = (
            s / n,
            np.sqrt((ss - s * s / n) / n),
        )

    full = rd.read_parquet(path, columns=["event_id", "event_type", "value"])

    def zmap(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        valid = pc.is_valid(b.column("value")).to_numpy(zero_copy_only=False)
        vu = np.round(
            np.nan_to_num(b.column("value").to_numpy(zero_copy_only=False)) * 100.0
        )
        # NaN init: a type absent from the stats (possible only when
        # every one of its values was null) must not read uninitialized
        # memory
        mu = np.full(len(et), np.nan, dtype=np.float64)
        sd = np.full(len(et), np.nan, dtype=np.float64)
        for k, (m, d) in stats.items():
            sel = et == k
            mu[sel] = m
            sd[sel] = d
        # a null value yields a null z, matching the SQL expression
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "z": pa.array((vu - mu) / sd, mask=~valid),
            }
        )

    return full.map_batches(zmap, batch_format="pyarrow")


SQL_ZSCORE_EVENTS = """
WITH st AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(CAST(round(value * 100) AS BIGINT)) AS s,
         sum(CAST(round(value * 100) AS BIGINT)
             * CAST(round(value * 100) AS BIGINT)) AS ss
  FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       (CAST(round(e.value * 100) AS BIGINT)
        - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
       / sqrt((CAST(st.ss AS DOUBLE)
               - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)
                 / CAST(st.n AS DOUBLE)) / CAST(st.n AS DOUBLE)) AS z
FROM events e JOIN st USING (event_type)
"""


def q_grid_nation_segment(sf_dir: str):
    """CROSS-JOIN grid with zero-fill: every (nation, segment) cell,
    including empty ones — the dimensional completeness query behind
    cohort heatmaps. The fact scan is a distributed partial count; the
    grid itself is the cartesian product of the two distinct axes,
    built on the driver from the TINY aggregate (every distinct axis
    value appears in some count row, so no second scan is needed) —
    O(cells), independent of fact rows."""
    import pandas as pd
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_mktsegment"]
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
                "c_mktsegment": b.column("c_mktsegment"),
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        return (
            t.group_by(["c_nationkey", "c_mktsegment"])
            .aggregate([("n", "sum")])
            .rename_columns(["c_nationkey", "c_mktsegment", "n"])
        )

    counts = (
        pa.concat_tables(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["c_nationkey", "c_mktsegment"])
            .aggregate(Sum("n", alias_name="n"))
            .iter_batches(batch_format="pyarrow")
        )
        .to_pandas()
    )
    nations = np.sort(counts["c_nationkey"].unique())
    segs = np.sort(counts["c_mktsegment"].unique())
    grid = pd.MultiIndex.from_product(
        [nations, segs], names=["c_nationkey", "c_mktsegment"]
    ).to_frame(index=False)
    out = grid.merge(counts, how="left", on=["c_nationkey", "c_mktsegment"])
    out["n_customers"] = out.pop("n").fillna(0).astype(np.int64)
    return out


SQL_GRID_NATION_SEGMENT = """
WITH n AS (SELECT DISTINCT c_nationkey FROM customer),
s AS (SELECT DISTINCT c_mktsegment FROM customer),
c AS (SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n_customers
      FROM customer GROUP BY 1, 2)
SELECT CAST(n.c_nationkey AS BIGINT) AS c_nationkey, s.c_mktsegment,
       COALESCE(c.n_customers, 0)::BIGINT AS n_customers
FROM n CROSS JOIN s
LEFT JOIN c ON c.c_nationkey = n.c_nationkey AND c.c_mktsegment = s.c_mktsegment
"""


def q_weighted_sample_documents(sf_dir: str):
    """Weight-proportional deterministic sampling: P(keep) ∝ n_chars
    (longer documents more likely kept — the standard length-weighted
    corpus draw), with ZERO floats and zero RNG state: keep ⟺
    bucket(doc_id)·max_chars < 10000·n_chars, all int64. The only
    coordination is one tiny distributed max broadcast into the
    filter; membership stays a pure function of (id, weight), so every
    re-run, shard and cluster size keeps the same documents."""
    rd = _rd()
    path = f"{sf_dir}/documents.parquet"
    maxc = int(rd.read_parquet(path, columns=["n_chars"]).max("n_chars"))

    from ..ops.sampling import id_buckets

    ds = rd.read_parquet(path, columns=["doc_id", "n_chars"])

    def keep(b: pa.Table) -> pa.Table:
        buckets = id_buckets(b.column("doc_id"), n_buckets=10000)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(buckets * maxc < 10000 * nc)).select(
            ["doc_id", "n_chars"]
        )

    return ds.map_batches(keep, batch_format="pyarrow")


SQL_WEIGHTED_SAMPLE_DOCUMENTS = f"""
SELECT doc_id, n_chars FROM documents,
     (SELECT max(n_chars) AS maxc FROM documents) m
WHERE (({hash_sql.poly64_expr("CAST(doc_id AS VARCHAR)")}) % 10000) * maxc
      < 10000 * n_chars
"""


def q_domain_quota_documents(sf_dir: str):
    """Web-corpus domain balancing: keep at most 10 documents per
    source, deterministically (the 10 lowest poly64(doc_id) per
    source) — no domain can swamp the training mix, and every re-run /
    shard / cluster size keeps the same documents. Only ~32-byte
    (id, group-hash, prio) rows ride the shuffle; payload recovered by
    broadcast id-set (scale path: hash join)."""
    from ..ops.quota import domain_quota_sample

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return domain_quota_sample(ds, group_col="source", id_col="doc_id", cap=10)


SQL_DOMAIN_QUOTA_DOCUMENTS = f"""
WITH pr AS (
  SELECT doc_id, source,
         {hash_sql.poly64_expr("CAST(doc_id AS VARCHAR)")} AS prio
  FROM documents
), r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY prio, doc_id) AS rn
  FROM pr
)
SELECT doc_id, source FROM r WHERE rn <= 10
"""


def q_line_dedup_documents(sf_dir: str):
    """Cross-document line dedup (CCNet/RefinedWeb boilerplate
    removal): reshape each doc into 8-word lines (same RE2 regex in
    Arrow and DuckDB), then remove every line appearing in >= 2
    distinct documents. The DF exchange moves 24-byte hash-pair rows,
    never line text; the dup set broadcasts once (scale path: LEFT
    ANTI join + bucketed reassembly)."""
    from ..ops.linededup import line_dedup

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_lines(b):
        import pyarrow.compute as _pc

        return b.set_column(
            b.schema.get_field_index("text"),
            "text",
            _pc.replace_substring_regex(
                b.column("text"),
                pattern=r"((?:\S+ ){7}\S+) ",
                replacement="\\1\n",
            ),
        )

    return line_dedup(ds.map_batches(to_lines, batch_format="pyarrow"), min_df=2)


SQL_LINE_DEDUP_DOCUMENTS = r"""
WITH ml AS (
  SELECT doc_id,
         regexp_replace(text, '((?:\S+ ){7}\S+) ', '\1' || chr(10), 'g') AS text
  FROM documents
),
l AS (
  SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS ord
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM ml)
),
df AS (SELECT line, count(DISTINCT doc_id) AS df FROM l WHERE length(line) > 0 GROUP BY line),
dup AS (SELECT line FROM df WHERE df >= 2),
kept AS (SELECT l.doc_id, l.line, l.ord FROM l LEFT JOIN dup p ON l.line = p.line WHERE p.line IS NULL),
agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS text, count(*) AS n_kept FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id)
SELECT t.doc_id, coalesce(a.text, '') AS text, t.n_lines::BIGINT AS n_lines,
       (t.n_lines - coalesce(a.n_kept, 0))::BIGINT AS n_removed
FROM tot t LEFT JOIN agg a USING (doc_id)
"""


def q_gopher_quality_documents(sf_dir: str):
    """Gopher quality-rule battery (Rae et al. 2021): word-count
    bounds, mean word length, symbol-to-word ratios, bullet/ellipsis
    line fractions, alphabetic-word fraction, required-stopword count,
    and the combined pass flag. Pure vectorized map_batches — zero
    shuffle; every signal is exact-int arithmetic replayed bitwise by
    the SQL twin."""
    import functools

    from ..ops.text import gopher_rules

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        functools.partial(gopher_rules, min_words=25, max_words=100_000),
        batch_format="pyarrow",
    ).select_columns(
        [
            "doc_id",
            "n_words",
            "mean_word_len",
            "hash_word_ratio",
            "ellipsis_word_ratio",
            "bullet_line_frac",
            "ellipsis_line_frac",
            "alpha_word_frac",
            "stop_hits",
            "gopher_pass",
        ]
    )


def _sql_gopher() -> str:
    from ..ops.text import gopher_sql

    return gopher_sql("documents", min_words=25, max_words=100_000)


def q_corpus_curate(sf_dir: str):
    """The full C4/RefinedWeb-style curation chain, composed from the
    engine's own stages and verified END-TO-END by one SQL oracle:

      1. Gopher quality gate (word bounds, mean word length,
         alpha-word fraction) — vectorized signals appended in-stream,
         filtered, dropped; zero shuffle.
      2. cross-document line dedup (boilerplate removal) over 8-word
         reshaped lines — 24-byte hash-pair DF exchange, broadcast
         rewrite; ``source`` rides through as a passthrough column
         (no recovery join).
      3. exact dedup on the post-scrub text — 128-bit content-hash
         shuffle, min-id survivor per text.
      4. per-source domain quota (cap 15, deterministic lowest
         poly64(id)) — final mix balancing.

    Blocks stream through all four stages; the only materializations
    are the two small survivor/dup-set reductions each stage documents.
    """
    import functools

    from ..ops.dedup import exact_dedup
    from ..ops.linededup import line_dedup
    from ..ops.quota import domain_quota_sample
    from ..ops.text import gopher_rules

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def gate_and_reshape(b: pa.Table) -> pa.Table:
        b = gopher_rules(b, min_words=30, max_words=100_000)
        m = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(b.column("n_words"), 30),
                    pc.less_equal(b.column("n_words"), 100_000),
                ),
                pc.and_(
                    pc.greater_equal(b.column("mean_word_len"), 3.0),
                    pc.less_equal(b.column("mean_word_len"), 10.0),
                ),
            ),
            pc.greater_equal(b.column("alpha_word_frac"), 0.8),
        )
        b = b.filter(m).select(["doc_id", "text", "source"])
        return b.set_column(
            b.schema.get_field_index("text"),
            "text",
            pc.replace_substring_regex(
                b.column("text"),
                pattern=r"((?:\S+ ){7}\S+) ",
                replacement="\\1\n",
            ),
        )

    # Each dedup stage consumes its input TWICE (survivor reduction +
    # payload recovery); without a pin the lazy upstream chain would
    # re-execute once per consumption (~5× for the first stage).
    # materialize() pins each stage's output in the object store —
    # blocks spill under pressure; at 100 TB this is the standard
    # persist-between-stages checkpoint (equivalently write_parquet +
    # re-read on a real pipeline).
    gated = ds.map_batches(gate_and_reshape, batch_format="pyarrow").materialize()
    scrubbed = (
        line_dedup(gated, min_df=2, passthrough=("source",))
        .select_columns(["doc_id", "text", "source"])
        .materialize()
    )
    unique = exact_dedup(
        scrubbed, keep_cols=["doc_id", "text", "source"]
    ).materialize()
    return domain_quota_sample(
        unique,
        group_col="source",
        id_col="doc_id",
        cap=15,
        keep_cols=["doc_id", "source", "text"],
    )


SQL_CORPUS_CURATE = f"""
WITH tk AS (
  SELECT doc_id, source, text,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
  FROM documents
),
gsig AS (
  SELECT doc_id, source, text,
         array_length(toks)::BIGINT AS n_words,
         CASE WHEN array_length(toks) > 0
              THEN length(regexp_replace(text, '\\s', '', 'g')) / array_length(toks)::DOUBLE
              ELSE 0.0 END AS mwl,
         CASE WHEN array_length(toks) > 0
              THEN array_length(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) / array_length(toks)::DOUBLE
              ELSE 0.0 END AS awf
  FROM tk
),
g AS (
  SELECT doc_id, source,
         regexp_replace(text, '((?:\\S+ ){{7}}\\S+) ', '\\1' || chr(10), 'g') AS text
  FROM gsig
  WHERE n_words >= 30 AND n_words <= 100000
    AND mwl >= 3.0 AND mwl <= 10.0 AND awf >= 0.8
),
l AS (
  SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS ord
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM g)
),
df AS (SELECT line, count(DISTINCT doc_id) AS df FROM l WHERE length(line) > 0 GROUP BY line),
dup AS (SELECT line FROM df WHERE df >= 2),
kept AS (SELECT l.doc_id, l.line, l.ord FROM l LEFT JOIN dup p ON l.line = p.line WHERE p.line IS NULL),
agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS text FROM kept GROUP BY doc_id),
ld AS (
  SELECT g.doc_id, g.source, coalesce(a.text, '') AS text
  FROM g LEFT JOIN agg a USING (doc_id)
),
ed AS (SELECT min(doc_id) AS doc_id, text FROM ld GROUP BY text),
edd AS (SELECT e.doc_id, l2.source, e.text FROM ed e JOIN ld l2 USING (doc_id)),
pr AS (
  SELECT doc_id, source, text,
         {hash_sql.poly64_expr("CAST(doc_id AS VARCHAR)")} AS prio
  FROM edd
),
r AS (
  SELECT doc_id, source, text,
         row_number() OVER (PARTITION BY source ORDER BY prio, doc_id) AS rn
  FROM pr
)
SELECT doc_id, source, text FROM r WHERE rn <= 15
"""


def q_hll_distinct_customers(sf_dir: str):
    """HyperLogLog distinct-customer sketch over orders (p=10, 1024
    registers): per-batch dense register maxima, elementwise-max merge
    on bounded driver rows, zero shuffle. The register table is a pure
    function of the data through the shared poly64→splitmix64 hash
    family, so the DuckDB twin replays it bit-for-bit in exact HUGEINT
    arithmetic (ops/sketch.py)."""
    from ..ops.sketch import hll_registers

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    return hll_registers(ds, "o_custkey", p=10)


def _sql_hll() -> str:
    from ..ops.sketch import hll_registers_sql

    return hll_registers_sql("orders", "o_custkey", p=10)


def q_hll_grouped_event_users(sf_dir: str):
    """Per-event-type distinct-user HLL sketches ("distinct users per
    event type" telemetry without a distinct shuffle): grouped register
    tables, per-batch dense scatter + bounded driver max-merge, the
    same bit-exact HUGEINT SQL-twin contract as the global sketch
    (ops/sketch.hll_registers_grouped)."""
    from ..ops.sketch import hll_registers_grouped

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return hll_registers_grouped(ds, "event_type", "user_id", p=10)


def _sql_hll_grouped() -> str:
    from ..ops.sketch import hll_registers_grouped_sql

    return hll_registers_grouped_sql("events", "event_type", "user_id", p=10)


def q_cms_event_users(sf_dir: str):
    """Count-Min frequency sketch over events.user_id (depth 4 ×
    width 1024): per-batch dense counter partials, elementwise-sum
    driver merge over bounded integer cells, zero shuffle. The cell
    table is a pure function of the data through poly64 → XOR row
    seed → splitmix64, replayed exactly by the DuckDB twin."""
    from ..ops.sketch import cms_sketch

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return cms_sketch(ds, "user_id", depth=4, width=1024)


def _sql_cms() -> str:
    from ..ops.sketch import cms_sketch_sql

    return cms_sketch_sql("events", "user_id", depth=4, width=1024)


def q_jsonl_ingest_documents(sf_dir: str):
    """JSONL source path (the other wire format web corpora arrive in,
    WARC-extract → JSONL): stage the documents table as partitioned
    JSONL once (deterministic, content-keyed scratch dir), ingest it
    back with ``ray.data.read_json`` — schema inferred per block, no
    driver parsing — and roll up per-source doc counts + char sums.
    Verifies the JSON round trip value-for-value against the parquet
    view. (Reference analogue: the CSV file-staged variant,
    extractors/acumatica/extractor.py:397-419.)"""
    import ray

    rd = _rd()
    stage = os.path.join(
        tempfile.gettempdir(),
        f"jsonl_stage_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    done = os.path.join(stage, "_STAGED")
    if not os.path.exists(done):
        shutil.rmtree(stage, ignore_errors=True)
        rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "source", "n_chars"],
        ).write_json(stage)
        with open(done, "w") as f:
            f.write("ok")
    ds = rd.read_json(
        [os.path.join(stage, f) for f in sorted(os.listdir(stage)) if f.endswith(".json")]
    )

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        src = b.column("source")
        tbl = pa.table(
            {
                "source": src,
                "n_docs": pa.array(np.ones(len(b), np.int64)),
                "chars": _pc.cast(b.column("n_chars"), pa.int64()),
            }
        )
        return tbl.group_by("source").aggregate(
            [("n_docs", "sum"), ("chars", "sum")]
        ).rename_columns(["source", "n_docs", "chars"])

    # map-side combine then a tiny native groupby (source cardinality
    # is small — the per-key-rollup regime)
    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("chars", alias_name="chars"))
    )
    return pa.concat_tables(out.iter_batches(batch_format="pyarrow"))


SQL_JSONL_INGEST_DOCUMENTS = """
SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS chars
FROM documents GROUP BY source
"""


def q_csv_ingest_documents(sf_dir: str):
    """CSV source path — the reference's actual file-staged wire format
    (CSV staging, ``extractors/acumatica/extractor.py:397-419``; CSV
    debug sink §2.2): stage the documents table as partitioned CSV once
    (deterministic scratch dir), ingest it back with
    ``ray.data.read_csv`` (Arrow CSV reader per block, typed via
    explicit convert_options — never driver-parsed), and roll up
    per-language doc counts + char sums, verified value-for-value
    against the parquet view."""
    rd = _rd()
    from pyarrow import csv as pacsv

    stage = os.path.join(
        tempfile.gettempdir(),
        f"csv_stage_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    done = os.path.join(stage, "_STAGED")
    if not os.path.exists(done):
        shutil.rmtree(stage, ignore_errors=True)
        rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "lang", "n_chars"],
        ).write_csv(stage)
        with open(done, "w") as f:
            f.write("ok")
    ds = rd.read_csv(
        [os.path.join(stage, f) for f in sorted(os.listdir(stage)) if f.endswith(".csv")],
        convert_options=pacsv.ConvertOptions(
            column_types={"doc_id": pa.int64(), "lang": pa.string(), "n_chars": pa.int64()}
        ),
    )

    def partial(b: pa.Table) -> pa.Table:
        tbl = pa.table(
            {
                "lang": b.column("lang"),
                "n_docs": pa.array(np.ones(len(b), np.int64)),
                "chars": pc.cast(b.column("n_chars"), pa.int64()),
            }
        )
        return (
            tbl.group_by("lang")
            .aggregate([("n_docs", "sum"), ("chars", "sum")])
            .rename_columns(["lang", "n_docs", "chars"])
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("chars", alias_name="chars"))
    )
    return pa.concat_tables(out.iter_batches(batch_format="pyarrow"))


SQL_CSV_INGEST_DOCUMENTS = """
SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS chars
FROM documents GROUP BY lang
"""


def q_incremental_dedup_documents(sf_dir: str):
    """Incremental exact dedup (daily-drop regime): the first half of
    documents is already ingested (its content hashes live in a
    partitioned on-disk hash index); the second half arrives as a new
    batch and is deduped against itself AND the corpus by probing ONLY
    the matching index partitions in-task — the accepted corpus is
    never rescanned or shuffled (ops/incdedup.py). Output = the new
    batch's truly-new documents."""
    import ray.data as _rdm

    from ..ops.incdedup import IncrementalDeduper

    rd = _rd()
    full = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    half = len(full) // 2
    dedup = IncrementalDeduper(_scratch_dir("incdedup_"), num_parts=16)
    dedup.add(_rdm.from_arrow(full.slice(0, half)))
    return dedup.add(_rdm.from_arrow(full.slice(half)))


SQL_INCREMENTAL_DEDUP_DOCUMENTS = """
WITH f AS (SELECT doc_id, text FROM documents
           WHERE doc_id < (SELECT count(*) // 2 FROM documents)),
s AS (SELECT doc_id, text FROM documents
      WHERE doc_id >= (SELECT count(*) // 2 FROM documents))
SELECT min(doc_id) AS doc_id, text FROM s
WHERE text NOT IN (SELECT text FROM f)
GROUP BY text
"""


def q_incremental_neardup_documents(sf_dir: str):
    """Incremental NEAR-dup dedup (the fuzzy twin of
    incremental_dedup_documents): the first half of documents is
    accepted into a persistent LSH band index; the second half arrives
    as a new batch and is dropped when it (a) MinHash-matches an
    accepted doc (shared band bucket + ≥ threshold signature agreement,
    probed against ONLY the matching index partitions in-task) or (b)
    has a smaller-id near-dup within the batch. The accepted corpus is
    never rescanned or re-signed (ops/incneardup.py). Output = the new
    batch's accepted documents."""
    import ray.data as _rdm

    from ..ops.incneardup import IncrementalNearDeduper

    rd = _rd()
    full = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    half = len(full) // 2
    dd = IncrementalNearDeduper(
        _scratch_dir("incneardup_"), num_parts=8, jaccard_threshold=0.8
    )
    _consume_all(dd.add(_rdm.from_arrow(full.slice(0, half))))
    return dd.add(_rdm.from_arrow(full.slice(half)))


def _consume_all(ds) -> int:
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        n += b.num_rows
    return n


def _sql_incremental_neardup() -> str:
    pairs = hash_sql.minhash_pairs_sql("documents", jaccard_threshold=0.8).strip()
    return f"""
WITH allp AS ({pairs}),
mid AS (SELECT count(*) // 2 AS m FROM documents),
keptf AS (
  SELECT d.doc_id FROM documents d, mid
  WHERE d.doc_id < mid.m
    AND NOT EXISTS (SELECT 1 FROM allp p, mid m2
                    WHERE p.doc_b = d.doc_id AND p.doc_a < m2.m))
SELECT d.doc_id, d.text FROM documents d, mid
WHERE d.doc_id >= mid.m
  AND NOT EXISTS (SELECT 1 FROM allp p JOIN keptf kf ON p.doc_a = kf.doc_id
                  WHERE p.doc_b = d.doc_id)
  AND NOT EXISTS (SELECT 1 FROM allp p, mid m2
                  WHERE p.doc_b = d.doc_id AND p.doc_a >= m2.m)
"""


def q_pack_sequences_documents(sf_dir: str):
    """Pretraining sequence packing (concat-and-chunk): where each
    document's first token lands when the corpus is concatenated in
    doc_id order and cut into 512-token sequences — a distributed
    two-pass prefix sum (map-side range partials → driver exclusive
    prefix → one 16-byte-row co-partitioning exchange; ops/pack.py).
    The oracle replays it as an all-integer window cumsum."""
    from ..ops.pack import pack_sequences

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_sequences(ds, seq_len=512, range_size=200)


SQL_PACK_SEQUENCES_DOCUMENTS = """
WITH t AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR trim(text) = '' THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END
           AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS before
  FROM t)
SELECT doc_id, n_tokens::BIGINT AS n_tokens,
       (before // 512)::BIGINT AS seq_id,
       (before % 512)::BIGINT AS seq_offset
FROM c
"""


def q_bpe_token_count_documents(sf_dir: str):
    """REAL BPE token counts (merges applied, not just pre-tokenizer
    segments): the committed 64-merge table (ops/bpe.py, trained on the
    synthetic corpus) is loaded once per actor and applied per DISTINCT
    word through a persistent cache. The oracle replays every merge
    rank independently in SQL — one chained window-function CTE per
    rank performing the left-to-right non-overlapping merge."""
    from ..ops.bpe import bpe_token_count_ds

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bpe_token_count_ds(ds).select_columns(["doc_id", "n_bpe_tokens"])


def _sql_bpe_token_count() -> str:
    from ..ops.bpe import bpe_token_count_sql

    return bpe_token_count_sql("documents")


def q_pack_bpe_documents(sf_dir: str):
    """Sequence packing over REAL BPE token counts — the faithful
    packing contract (ops/pack.py counter="bpe"): same two-pass
    distributed prefix sum, token counts from the merges table."""
    from ..ops.pack import pack_sequences

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_sequences(ds, seq_len=512, range_size=200, counter="bpe")


def _sql_pack_bpe() -> str:
    from ..ops.bpe import bpe_token_count_sql

    inner = bpe_token_count_sql("documents", out="n_tokens")
    return f"""
WITH wc AS ({inner}),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS before
  FROM wc)
SELECT doc_id, n_tokens::BIGINT AS n_tokens,
       (before // 512)::BIGINT AS seq_id,
       (before % 512)::BIGINT AS seq_offset
FROM c
"""


def q_train_order_documents(sf_dir: str):
    """Deterministic training-order shuffle: a reproducible global
    pseudo-random ordering of the corpus (ORDER BY
    splitmix64(poly64(doc_id))) — what a data loader needs so every
    re-run, resume, and cluster size reads examples in the SAME order
    without materializing an index. Exercises Ray's distributed sort
    over a computed 8-byte key (the only shuffled columns are id +
    key); the oracle replays the key in exact HUGEINT arithmetic and
    the driver's row-order hash verifies the ORDER itself."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def key(b: pa.Table) -> pa.Table:
        from ..ops.texthash import poly_hash_array, splitmix64

        h = splitmix64(
            poly_hash_array(pc.cast(b.column("doc_id"), pa.large_string()))
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "shuffle_key": pa.array(h.view(np.int64)),
            }
        )

    # tie-break on doc_id to match the oracle's ORDER BY sk, doc_id
    # (64-bit key collisions are ~never, but the contract is exact order)
    out = ds.map_batches(key, batch_format="pyarrow").sort(
        ["shuffle_key", "doc_id"]
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    # rank = explicit order column so the oracle comparison checks the
    # ordering, not just the set
    return t.append_column(
        "rank", pa.array(np.arange(t.num_rows, dtype=np.int64))
    )


def _sql_train_order() -> str:
    poly = hash_sql.poly64_expr("CAST(doc_id AS VARCHAR)")
    sm = hash_sql.splitmix64_expr("hv")
    return f"""
WITH h0 AS (SELECT doc_id, {poly} AS hv FROM documents),
h AS (SELECT doc_id, {hash_sql.as_int64(sm)} AS sk FROM h0)
SELECT doc_id, sk AS shuffle_key,
       (row_number() OVER (ORDER BY sk, doc_id) - 1)::BIGINT AS rank
FROM h
"""


def q_sessionize_events(sf_dir: str):
    """Gap-based sessionization (30-min inactivity): per-user 1-based
    session numbers over the events stream. One coarse keyed exchange
    of (event_id, user_id, ts) triples; in-bucket assignment is a
    single vectorized lexsort+diff pass (ops/sessions.py)."""
    from ..ops.sessions import sessionize

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return sessionize(ds, gap_minutes=30)


SQL_SESSIONIZE_EVENTS = """
SELECT event_id, user_id,
       (SUM(CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                 THEN 1 ELSE 0 END)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
         AS session_num
FROM (SELECT event_id, user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events)
"""


def q_session_stats_events(sf_dir: str):
    """Per-user session rollup (n_events + n_sessions) over the same
    single-exchange sessionization plan."""
    from ..ops.sessions import session_stats

    rd = _rd()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return session_stats(ds, gap_minutes=30)


SQL_SESSION_STATS_EVENTS = f"""
WITH s AS ({SQL_SESSIONIZE_EVENTS})
SELECT user_id, count(*)::BIGINT AS n_events,
       max(session_num)::BIGINT AS n_sessions
FROM s GROUP BY user_id
"""


def q_vocab_topk_documents(sf_dir: str):
    """Corpus vocabulary top-50: global lowered-token frequencies with
    map-side combining + coarse-bucket reduce; the driver sees only
    buckets × k candidate rows (ops/vocab.py)."""
    from ..ops.vocab import vocab_topk

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return vocab_topk(ds, k=50)


SQL_VOCAB_TOPK_DOCUMENTS = """
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
)
SELECT tok, count(*)::BIGINT AS cnt
FROM toks WHERE tok <> ''
GROUP BY tok ORDER BY cnt DESC, tok LIMIT 50
"""


def q_bigram_topk_documents(sf_dir: str):
    """Corpus top-20 adjacent-token pairs (the n-gram LM / collocation
    statistic): the whole batch's bigrams come from TWO zero-copy
    slices of the flat token buffer joined by one Arrow kernel (pairs
    masked at document boundaries by row id), map-side combined to
    distinct (pair, count) partials, then the vocab module's
    coarse-bucket reduce — a pair lives wholly in one bucket, so the
    driver sees only buckets × k candidates."""
    from ..ops.vocab import bigram_topk

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bigram_topk(ds, k=20)


SQL_BIGRAM_TOPK_DOCUMENTS = """
WITH a AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents WHERE text IS NOT NULL
), b AS (
  SELECT unnest(list_transform(
           l, (x, i) -> CASE WHEN i < len(l) THEN x || ' ' || l[i + 1] END
         )) AS bigram
  FROM a
)
SELECT bigram, count(*)::BIGINT AS cnt
FROM b WHERE bigram IS NOT NULL
GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20
"""


def q_centroid_embeddings(sf_dir: str):
    """Grouped VECTOR aggregate: the per-label centroid of the
    embedding corpus — the k-means M-step / class-prototype query.
    Each batch reshapes the fixed-dim list column to an (n, d) matrix
    zero-copy and np.add.at-scatters per-label integer sums (floats
    quantized by floor(v·2²⁰ + 0.5), exactly replayed in SQL, so the
    distributed sum is order-independent); the exchange carries only
    labels × dims rows per batch. A 100-TB corpus reduces to one tiny
    (label, dim) grouped sum — no vector ever crosses the wire twice."""
    from ray.data.aggregate import Sum

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
    SCALE = 1048576.0  # 2^20

    def partial(b: pa.Table) -> pa.Table:
        from ..ops.texthash import list_col_to_matrix

        # the shared helper is offset-safe (flatten, not .values) and
        # validates ragged/null embedding rows loudly
        m = list_col_to_matrix(b.column("embedding"), dtype=np.float64)
        d = m.shape[1]
        q = np.floor(m * SCALE + 0.5).astype(np.int64)
        labels = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
                "n": pa.array(np.repeat(counts, d)),
                "s": pa.array(sums.ravel()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    )
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    nf = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    sf = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table(
        {
            "label": t.column("label"),
            "dim": t.column("dim"),
            "n_vectors": t.column("n"),
            "centroid": pa.array(sf / (SCALE * nf)),
        }
    )


SQL_CENTROID_EMBEDDINGS = """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label,
         unnest(list_transform(embedding,
                               (x, i) -> CAST(i - 1 AS BIGINT))) AS dim,
         unnest(list_transform(embedding,
                               (x, i) -> CAST(floor(CAST(x AS DOUBLE)
                                                    * 1048576.0 + 0.5)
                                              AS BIGINT))) AS q
  FROM embeddings
)
SELECT label, dim, count(*)::BIGINT AS n_vectors,
       CAST(sum(q) AS DOUBLE) / (1048576.0 * CAST(count(*) AS DOUBLE)) AS centroid
FROM e GROUP BY label, dim
"""


def q_inverted_index_documents(sf_dir: str):
    """Inverted index (term → df + sorted doc-id posting list) over
    the corpus: in-batch (doc, term, tf) combining, coarse token-hash
    bucket reduce, one argsort + run-boundary pass per bucket
    (ops/tfidf.inverted_index)."""
    from ..ops.tfidf import inverted_index

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return inverted_index(ds)


SQL_INVERTED_INDEX_DOCUMENTS = """
WITH pairs AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
    FROM documents WHERE text IS NOT NULL)
  WHERE tok <> '')
SELECT tok, count(*)::BIGINT AS df,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY tok
"""


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top-3 TF-IDF terms: distributed df reduce, pair ⋈
    df hash join ON THE TOKEN, score = round(tf·ln(N/df), 6), per-doc
    top-k via coarse doc-hash partition + one lexsort pass
    (ops/tfidf.tfidf_topk)."""
    from ..ops.tfidf import tfidf_topk

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tfidf_topk(ds, k=3)


SQL_TFIDF_TOP_TERMS = """
WITH docs AS (
  SELECT doc_id, lower(text) AS text FROM documents WHERE text IS NOT NULL
), pairs AS (
  SELECT doc_id, tok, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok FROM docs)
  WHERE tok <> '' GROUP BY doc_id, tok
), dft AS (
  SELECT tok, count(*)::BIGINT AS df FROM pairs GROUP BY tok
), scored AS (
  SELECT p.doc_id, p.tok, p.tf,
         round(p.tf * ln((SELECT count(*)::DOUBLE FROM docs) / dft.df), 6) AS tfidf_w
  FROM pairs p JOIN dft USING (tok)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_w DESC, tok) AS rank
  FROM scored)
SELECT doc_id, tok, tf, tfidf_w, rank::BIGINT AS rank
FROM ranked WHERE rank <= 3
"""


def q_quantiles_event_value(sf_dir: str):
    """Exact distributed quantiles (p25..p99) of events.value without
    a global sort: shared histogram rank-finding + per-bin candidate
    pull (ops/quantiles.py). Values are actual column elements —
    bitwise-equal to quantile_disc."""
    from ..ops.quantiles import quantiles_exact

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return quantiles_exact(ds, "value", qs=(0.25, 0.5, 0.75, 0.9, 0.95, 0.99))


SQL_QUANTILES_EVENT_VALUE = """
WITH v AS (SELECT value FROM events WHERE value IS NOT NULL)
SELECT 0.25::DOUBLE AS q, quantile_disc(value, 0.25)::DOUBLE AS value FROM v
UNION ALL SELECT 0.5::DOUBLE, quantile_disc(value, 0.5)::DOUBLE FROM v
UNION ALL SELECT 0.75::DOUBLE, quantile_disc(value, 0.75)::DOUBLE FROM v
UNION ALL SELECT 0.9::DOUBLE, quantile_disc(value, 0.9)::DOUBLE FROM v
UNION ALL SELECT 0.95::DOUBLE, quantile_disc(value, 0.95)::DOUBLE FROM v
UNION ALL SELECT 0.99::DOUBLE, quantile_disc(value, 0.99)::DOUBLE FROM v
"""


def q_grouped_quantiles_events(sf_dir: str):
    """Per-event-type exact quantiles in a constant number of passes
    (shared composite-key histogram + one candidate-pull pass for all
    groups — ops/quantiles.grouped_quantiles)."""
    from ..ops.quantiles import grouped_quantiles

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_quantiles(
        ds, "value", "event_type", qs=(0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
    )


SQL_GROUPED_QUANTILES_EVENTS = """
SELECT event_type,
       unnest([0.25,0.5,0.75,0.9,0.95,0.99])::DOUBLE AS q,
       unnest(quantile_disc(value, [0.25,0.5,0.75,0.9,0.95,0.99]))::DOUBLE AS value
FROM events WHERE value IS NOT NULL
GROUP BY event_type
"""


def q_pii_redact_docs(sf_dir: str):
    """PII scrub (emails → [EMAIL], IPv4 → [IP], phones → [PHONE]) with
    per-category match counts — three RE2 kernels per batch, no
    shuffle (ops/redact.py); DuckDB twin regenerated from the same
    pattern table by redact.pii_sql."""
    from ..ops.redact import pii_redact

    d = fixture_dir(sf_dir)
    rd = _rd()
    ds = rd.read_parquet(os.path.join(d, "pii.parquet"))
    return ds.map_batches(pii_redact, batch_format="pyarrow")


def q_repetition_signals_docs(sf_dir: str):
    """Gopher-style repetition filters (dup-line fraction, top-word
    fraction) — per-batch lexsort/run-length kernels, no shuffle
    (ops/text.repetition_signals)."""
    from ..ops.text import repetition_signals

    d = fixture_dir(sf_dir)
    rd = _rd()
    ds = rd.read_parquet(os.path.join(d, "pii.parquet"))
    return ds.map_batches(repetition_signals, batch_format="pyarrow")


SQL_REPETITION_SIGNALS_DOCS = f"""
WITH src AS (
  SELECT rec_id, text FROM read_parquet('{FIX_ROOT}/sf0.01/pii.parquet')
  WHERE text IS NOT NULL
), L AS (
  SELECT rec_id, ln FROM (
    SELECT rec_id, unnest(string_split(text, chr(10))) AS ln FROM src
  ) WHERE ln <> ''
), lstat AS (
  SELECT rec_id, count(*) AS n_lines, count(DISTINCT ln) AS d_lines
  FROM L GROUP BY rec_id
), W AS (
  SELECT rec_id, w FROM (
    SELECT rec_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
    FROM src
  ) WHERE w <> ''
), wcnt AS (
  SELECT rec_id, w, count(*) AS c FROM W GROUP BY rec_id, w
), wstat AS (
  SELECT rec_id, sum(c) AS n_words, max(c) AS top_c FROM wcnt GROUP BY rec_id
)
SELECT s.rec_id,
       coalesce(l.n_lines, 0)::BIGINT AS n_lines,
       coalesce(1.0 - l.d_lines / l.n_lines::DOUBLE, 0.0) AS dup_line_frac,
       coalesce(w.n_words, 0)::BIGINT AS n_words,
       coalesce(w.top_c / w.n_words::DOUBLE, 0.0) AS top_word_frac
FROM src s LEFT JOIN lstat l USING (rec_id) LEFT JOIN wstat w USING (rec_id)
"""


def q_chunk_documents(sf_dir: str):
    """Overlapping fixed-window chunking of the documents table
    (size=200 chars, stride=150) — explode inside map_batches,
    vectorized over chunk ordinals, no shuffle (ops/chunk.py)."""
    from ..ops.chunk import chunk_documents

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(chunk_documents, batch_format="pyarrow")


def q_contamination_check(sf_dir: str):
    """Benchmark decontamination: flag train docs whose 3-gram shingles
    overlap the eval subset (doc_id % 17 == 0 stands in for a held-out
    benchmark). Eval reduces to a broadcast sorted hash set; the train
    stream scores against it with zero shuffle (ops/contamination.py)."""
    from ..ops.contamination import contamination_check

    rd = _rd()
    train = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    eval_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_eval_subset, batch_format="pyarrow")
    return contamination_check(train, eval_ds, k=3, threshold=0.8)


def _eval_subset(b: pa.Table) -> pa.Table:
    """Deterministic stand-in eval corpus: doc_id % 17 == 0."""
    ids = b.column("doc_id").to_numpy(zero_copy_only=False)
    return b.filter(pa.array(ids % 17 == 0))


def q_corpus_prepare(sf_dir: str):
    """The composed chunk-ready training-data pipeline: repetition
    filter (top_word_frac <= 0.12) → benchmark decontamination
    (3-gram overlap < 0.8 vs the eval subset) → overlapping chunking —
    ALL inside ONE map_batches stage, so at 100 TB every block streams
    through filter+decontam+chunk with zero shuffle; the only
    non-streaming work is the one-time broadcast of the eval shingle
    set (ops/contamination.eval_shingle_set)."""
    import numpy as np
    import ray

    from ..ops.chunk import chunk_documents
    from ..ops.contamination import eval_shingle_set
    from ..ops.text import repetition_signals
    from ..ops.texthash import shingle_hashes

    rd = _rd()
    eval_ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_eval_subset, batch_format="pyarrow")
    ref = ray.put(eval_shingle_set(eval_ds, k=3))

    def prepare(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        sig = repetition_signals(b, id_col="doc_id")
        rep_ok = np.asarray(sig.column("top_word_frac")) <= 0.12
        ev = ray.get(ref)
        vals, segs, starts = shingle_hashes(b.column("text"), k=3)
        n_sh = np.diff(starts)
        n_hit = np.zeros(len(b), np.int64)
        if len(vals) and len(ev):
            pos = np.searchsorted(ev, vals)
            pos[pos == len(ev)] = 0
            hit = ev[pos] == vals
            n_hit = np.bincount(segs[hit], minlength=len(b))
        frac = np.where(n_sh > 0, n_hit / np.maximum(n_sh, 1), 0.0)
        kept = b.filter(pa.array(rep_ok & (frac < 0.8)))
        return chunk_documents(kept, size=200, stride=150)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(prepare, batch_format="pyarrow")


_SQL_REP_CTES = """
W AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
    FROM documents WHERE text IS NOT NULL
  ) WHERE w <> ''
), wcnt AS (
  SELECT doc_id, w, count(*) AS c FROM W GROUP BY doc_id, w
), wstat AS (
  SELECT doc_id, sum(c) AS n_words, max(c) AS top_c FROM wcnt GROUP BY doc_id
)"""


def _corpus_prepare_sql() -> str:
    from ..ops.contamination import contamination_sql  # noqa: F401  (twin family)
    from ..pipelines.hash_sql import shingle_cte

    return f"""
WITH {shingle_cte('documents', 3)},
ev AS (SELECT DISTINCT s FROM shingle WHERE doc_id % 17 = 0),
cnt AS (
  SELECT t.doc_id, count(*) AS n_sh,
         sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM shingle t LEFT JOIN ev USING (s)
  GROUP BY t.doc_id
),{_SQL_REP_CTES},
kept AS (
  SELECT d.doc_id, d.text
  FROM documents d
  LEFT JOIN cnt c USING (doc_id)
  LEFT JOIN wstat r USING (doc_id)
  WHERE d.text IS NOT NULL
    AND coalesce(r.top_c / r.n_words::DOUBLE, 0.0) <= 0.12
    AND coalesce(c.n_hit / c.n_sh::DOUBLE, 0.0) < 0.8
),
base AS (
  SELECT doc_id, text AS t,
         (greatest(length(text), 1) - 1) // 150 AS maxi
  FROM kept
), e AS (
  SELECT doc_id, t, unnest(generate_series(0, maxi)) AS chunk_id FROM base
)
SELECT doc_id, chunk_id,
       substr(t, chunk_id * 150 + 1, 200) AS chunk_text,
       length(substr(t, chunk_id * 150 + 1, 200))::BIGINT AS chunk_len
FROM e
"""


# ===================================================================
# registry
# ===================================================================

QUERIES = {
    # ------ driver-checked head (the driver sweeps the first ~50
    # registry entries under a count budget). Composition is chosen so
    # (r4-checked ∪ r5-checked) covers EVERY registry entry exactly
    # once: 2 flagship cdc_* re-checks, the 30 queries the r3/r4
    # sweeps never reached (VERDICT r4 task 1), then all 18 round-5
    # additions = 50. Everything below position 50 was driver-green in
    # CORRECTNESS_r04 and stays oracle-tested by tests/test_entry.py.
    "cdc_events_lww": q_cdc_events_lww,
    "cdc_pages_replay": q_cdc_pages_replay,
    # -- never-driver-checked until r5 (r3/r4 tail):
    "hash_sample_documents": q_hash_sample_documents,
    "domain_quota_documents": q_domain_quota_documents,
    "line_dedup_documents": q_line_dedup_documents,
    "gopher_quality_documents": q_gopher_quality_documents,
    "corpus_curate": q_corpus_curate,
    "hll_distinct_customers": q_hll_distinct_customers,
    "hll_grouped_event_users": q_hll_grouped_event_users,
    "cms_event_users": q_cms_event_users,
    "jsonl_ingest_documents": q_jsonl_ingest_documents,
    "csv_ingest_documents": q_csv_ingest_documents,
    "incremental_dedup_documents": q_incremental_dedup_documents,
    "incremental_neardup_documents": q_incremental_neardup_documents,
    "pack_sequences_documents": q_pack_sequences_documents,
    "train_order_documents": q_train_order_documents,
    "time_travel_pages": q_time_travel_pages,
    "incremental_rollup_pages": q_incremental_rollup_pages,
    "scd2_history_pages": q_scd2_history_pages,
    "sessionize_events": q_sessionize_events,
    "session_stats_events": q_session_stats_events,
    "vocab_topk_documents": q_vocab_topk_documents,
    "quantiles_event_value": q_quantiles_event_value,
    "grouped_quantiles_events": q_grouped_quantiles_events,
    "pii_redact_docs": q_pii_redact_docs,
    "repetition_signals_docs": q_repetition_signals_docs,
    "chunk_documents": q_chunk_documents,
    "contamination_check": q_contamination_check,
    "corpus_prepare": q_corpus_prepare,
    "bpe_token_count_documents": q_bpe_token_count_documents,
    "pack_bpe_documents": q_pack_bpe_documents,
    "range_join_signup_follow": q_range_join_signup_follow,
    # -- round-5 additions (session 1): incremental ANN + CUBE
    "embedding_topk_ivf_extend": q_embedding_topk_ivf_extend,
    "cube_revenue_nation_segment": q_cube_revenue_nation_segment,
    # -- round-5 additions (session 2): mix/rebalance + set/window ops
    # + a second columnar wire format
    "stratified_sample_documents": q_stratified_sample_documents,
    "topk_docs_per_lang": q_topk_docs_per_lang,
    "intersect_signup_purchasers": q_intersect_signup_purchasers,
    "doclen_histogram": q_doclen_histogram,
    "mode_source_per_lang": q_mode_source_per_lang,
    "orc_ingest_documents": q_orc_ingest_documents,
    # -- round-5 additions (session 3): window functions + exact stats
    "lag_event_gap": q_lag_event_gap,
    "moving_avg_orders": q_moving_avg_orders,
    "ntile_customers": q_ntile_customers,
    "stddev_order_status": q_stddev_order_status,
    "corr_qty_price": q_corr_qty_price,
    "except_silent_customers": q_except_silent_customers,
    "unpivot_lineitem": q_unpivot_lineitem,
    "string_agg_segments": q_string_agg_segments,
    "date_spine_events": q_date_spine_events,
    "semi_join_orders_building": q_semi_join_orders_building,
    # ------ post-head round-5 additions (position 51+; added after the
    # head froze at 50 — oracle-tested by test_entry like the tail):
    "first_last_event": q_first_last_event,
    "rank_customers_acctbal": q_rank_customers_acctbal,
    "funnel_events": q_funnel_events,
    "zscore_events": q_zscore_events,
    "grid_nation_segment": q_grid_nation_segment,
    "weighted_sample_documents": q_weighted_sample_documents,
    "percent_rank_customers": q_percent_rank_customers,
    "sentence_stats_documents": q_sentence_stats_documents,
    "snapshot_diff_pages": q_snapshot_diff_pages,
    "bigram_topk_documents": q_bigram_topk_documents,
    "centroid_embeddings": q_centroid_embeddings,
    "debounce_events": q_debounce_events,
    "filtered_agg_customers": q_filtered_agg_customers,
    "mad_event_value": q_mad_event_value,
    "active_users_events": q_active_users_events,
    "quantile_bucket_events": q_quantile_bucket_events,
    "retention_cohorts": q_retention_cohorts,
    "full_outer_customer_activity": q_full_outer_customer_activity,
    "lead_event_gap": q_lead_event_gap,
    "cumulative_users": q_cumulative_users,
    "sliding_window_counts": q_sliding_window_counts,
    "regression_slope": q_regression_slope,
    "char_entropy_documents": q_char_entropy_documents,
    "winsorized_mean_events": q_winsorized_mean_events,
    "quantile_cont_events": q_quantile_cont_events,
    "ttr_documents": q_ttr_documents,
    "dup_ratio_by_source": q_dup_ratio_by_source,
    "benford_orders": q_benford_orders,
    "chisq_lang_source": q_chisq_lang_source,
    "transition_matrix_events": q_transition_matrix_events,
    "vocab_overlap_langs": q_vocab_overlap_langs,
    "cheapest_supplier_part": q_cheapest_supplier_part,
    "event_share_by_day": q_event_share_by_day,
    "streak_days_users": q_streak_days_users,
    "outlier_fence_events": q_outlier_fence_events,
    "above_avg_orders": q_above_avg_orders,
    "orderkey_gaps": q_orderkey_gaps,
    "user_event_entropy": q_user_event_entropy,
    "robust_scale_events": q_robust_scale_events,
    "dod_change_events": q_dod_change_events,
    "since_purchase_events": q_since_purchase_events,
    "kl_divergence_sources": q_kl_divergence_sources,
    "shingle_overlap_sources": q_shingle_overlap_sources,
    "division_priority_customers": q_division_priority_customers,
    "view_to_purchase_events": q_view_to_purchase_events,
    "ref_integrity_audit": q_ref_integrity_audit,
    "median_gap_customers": q_median_gap_customers,
    "pareto_customers": q_pareto_customers,
    "hhi_lang_sources": q_hhi_lang_sources,
    "basket_pairs_parts": q_basket_pairs_parts,
    "day_retention_events": q_day_retention_events,
    "multi_distinct_nation": q_multi_distinct_nation,
    "major_suppliers_part": q_major_suppliers_part,
    "stopword_rate_langs": q_stopword_rate_langs,
    "rare_token_rate_sources": q_rare_token_rate_sources,
    "dupcluster_size_hist": q_dupcluster_size_hist,
    "rfm_segments_customers": q_rfm_segments_customers,
    "anomaly_days_events": q_anomaly_days_events,
    "weekday_hour_heatmap_events": q_weekday_hour_heatmap_events,
    "daily_p95_events": q_daily_p95_events,
    "autocorr_daily_events": q_autocorr_daily_events,
    "transition_probs_events": q_transition_probs_events,
    "coverage_curve_docs": q_coverage_curve_docs,
    "null_profile_tables": q_null_profile_tables,
    "pmi_bigrams_documents": q_pmi_bigrams_documents,
    "signup_to_purchase_delay": q_signup_to_purchase_delay,
    # ------ rotated-out tail: every entry below was
    # driver-green in CORRECTNESS_r04 (rows+schema+hash), kept
    # oracle-verified at sf0.001 by the full test_entry sweep
    "cdc_delta_replay": q_cdc_delta_replay,
    "point_lookup_pages": q_point_lookup_pages,
    "cdc_schema_evolution": q_cdc_schema_evolution,
    "embedding_topk_ivf": q_embedding_topk_ivf,
    "embedding_topk": q_embedding_topk,
    "embedding_neardup": q_embedding_neardup,
    "antijoin_customers_urgent": q_antijoin_customers_urgent,
    "rollup_revenue_nation_segment": q_rollup_revenue_nation_segment,
    "validation_documents": q_validation_documents,
    "watermark_max_ts": q_watermark_max_ts,
    "agg_pricing_summary": q_agg_pricing_summary,
    "asof_join_signup": q_asof_join_signup,
    "gold_segment_summary": q_gold_segment_summary,
    "silver_orders": q_silver_orders,
    "windowed_event_counts": q_windowed_event_counts,
    "minhash_neardup_pairs": q_minhash_neardup_pairs,
    "join_revenue_by_nation_segment": q_join_revenue_by_nation_segment,
    "filter_project_revenue": q_filter_project_revenue,
    "sort_topk_orders": q_sort_topk_orders,
    "latest_order_per_customer": q_latest_order_per_customer,
    "pivot_docs_lang_source": q_pivot_docs_lang_source,
    "running_total_orders": q_running_total_orders,
    "inverted_index_documents": q_inverted_index_documents,
    "tfidf_top_terms": q_tfidf_top_terms,
    "distinct_segments": q_distinct_segments,
    "union_counts": q_union_counts,
    "case_ladder_order_tiers": q_case_ladder_order_tiers,
    "date_derivations_events": q_date_derivations_events,
    "string_funcs_customers": q_string_funcs_customers,
    "json_extract_events": q_json_extract_events,
    "explode_form_items": q_explode_form_items,
    "dedup_exact_documents": q_dedup_exact_documents,
    "text_quality_tokens": q_text_quality_tokens,
    "lang_id_documents": q_lang_id_documents,
    "lm_quality_documents": q_lm_quality_documents,
    "fingerprint_documents": q_fingerprint_documents,
    "neardup_dedup_documents": q_neardup_dedup_documents,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "simhash_documents": q_simhash_documents,
    "simhash_neardup_pairs": q_simhash_neardup_pairs,
    "corpus_clean": q_corpus_clean,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_decode_real": q_multimodal_decode_real,
    "multimodal_audio_real": q_multimodal_audio_real,
    "multimodal_video_real": q_multimodal_video_real,
    "normalize_dirty_records": q_normalize_dirty_records,
    "url_normalize": q_url_normalize,
    "hash_split_documents": q_hash_split_documents,
}

ORACLES = {
    "cdc_events_lww": SQL_CDC_EVENTS_LWW,
    "cdc_pages_replay": SQL_CDC_PAGES_REPLAY,
    "cdc_delta_replay": SQL_CDC_DELTA_REPLAY,
    "point_lookup_pages": SQL_POINT_LOOKUP_PAGES,
    "cdc_schema_evolution": SQL_CDC_SCHEMA_EVOLUTION,
    "lang_id_documents": SQL_LANG_ID_DOCUMENTS,
    "lm_quality_documents": SQL_LM_QUALITY_DOCUMENTS,
    "fingerprint_documents": SQL_FINGERPRINT_DOCUMENTS,
    "minhash_neardup_pairs": SQL_MINHASH_NEARDUP_PAIRS,
    "neardup_dedup_documents": SQL_NEARDUP_DEDUP_DOCUMENTS,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "simhash_documents": SQL_SIMHASH_DOCUMENTS,
    "simhash_neardup_pairs": SQL_SIMHASH_NEARDUP_PAIRS,
    "corpus_clean": SQL_CORPUS_CLEAN,
    "multimodal_decode": SQL_MULTIMODAL_DECODE,
    "multimodal_decode_real": SQL_MULTIMODAL_DECODE_REAL,
    "multimodal_audio_real": SQL_MULTIMODAL_AUDIO_REAL,
    "multimodal_video_real": SQL_MULTIMODAL_VIDEO_REAL,
    "agg_pricing_summary": SQL_AGG_PRICING_SUMMARY,
    "filter_project_revenue": SQL_FILTER_PROJECT_REVENUE,
    "sort_topk_orders": SQL_SORT_TOPK_ORDERS,
    "join_revenue_by_nation_segment": SQL_JOIN_REVENUE_BY_NATION_SEGMENT,
    "latest_order_per_customer": SQL_LATEST_ORDER_PER_CUSTOMER,
    "windowed_event_counts": SQL_WINDOWED_EVENT_COUNTS,
    "asof_join_signup": SQL_ASOF_JOIN_SIGNUP,
    "antijoin_customers_urgent": SQL_ANTIJOIN_CUSTOMERS_URGENT,
    "pivot_docs_lang_source": SQL_PIVOT_DOCS_LANG_SOURCE,
    "rollup_revenue_nation_segment": SQL_ROLLUP_REVENUE_NATION_SEGMENT,
    "cube_revenue_nation_segment": SQL_CUBE_REVENUE_NATION_SEGMENT,
    "running_total_orders": SQL_RUNNING_TOTAL_ORDERS,
    "inverted_index_documents": SQL_INVERTED_INDEX_DOCUMENTS,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "distinct_segments": SQL_DISTINCT_SEGMENTS,
    "union_counts": SQL_UNION_COUNTS,
    "case_ladder_order_tiers": SQL_CASE_LADDER_ORDER_TIERS,
    "date_derivations_events": SQL_DATE_DERIVATIONS_EVENTS,
    "string_funcs_customers": SQL_STRING_FUNCS_CUSTOMERS,
    "json_extract_events": SQL_JSON_EXTRACT_EVENTS,
    "explode_form_items": SQL_EXPLODE_FORM_ITEMS,
    "watermark_max_ts": SQL_WATERMARK_MAX_TS,
    "validation_documents": SQL_VALIDATION_DOCUMENTS,
    "silver_orders": SQL_SILVER_ORDERS,
    "gold_segment_summary": SQL_GOLD_SEGMENT_SUMMARY,
    "dedup_exact_documents": SQL_DEDUP_EXACT_DOCUMENTS,
    "text_quality_tokens": SQL_TEXT_QUALITY_TOKENS,
    "embedding_topk": SQL_EMBEDDING_TOPK,
    "embedding_topk_ivf": SQL_EMBEDDING_TOPK,
    "embedding_topk_ivf_extend": SQL_EMBEDDING_TOPK,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    "normalize_dirty_records": SQL_NORMALIZE_DIRTY_RECORDS,
    "url_normalize": SQL_URL_NORMALIZE,
    "hash_split_documents": SQL_HASH_SPLIT_DOCUMENTS,
    "hash_sample_documents": SQL_HASH_SAMPLE_DOCUMENTS,
    "domain_quota_documents": SQL_DOMAIN_QUOTA_DOCUMENTS,
    "line_dedup_documents": SQL_LINE_DEDUP_DOCUMENTS,
    "gopher_quality_documents": _sql_gopher(),
    "corpus_curate": SQL_CORPUS_CURATE,
    "hll_distinct_customers": _sql_hll(),
    "hll_grouped_event_users": _sql_hll_grouped(),
    "cms_event_users": _sql_cms(),
    "jsonl_ingest_documents": SQL_JSONL_INGEST_DOCUMENTS,
    "csv_ingest_documents": SQL_CSV_INGEST_DOCUMENTS,
    "incremental_dedup_documents": SQL_INCREMENTAL_DEDUP_DOCUMENTS,
    "incremental_neardup_documents": _sql_incremental_neardup(),
    "pack_sequences_documents": SQL_PACK_SEQUENCES_DOCUMENTS,
    "train_order_documents": _sql_train_order(),
    "time_travel_pages": SQL_TIME_TRAVEL_PAGES,
    "incremental_rollup_pages": SQL_INCREMENTAL_ROLLUP_PAGES,
    "scd2_history_pages": SQL_SCD2_HISTORY_PAGES,
    "sessionize_events": SQL_SESSIONIZE_EVENTS,
    "session_stats_events": SQL_SESSION_STATS_EVENTS,
    "vocab_topk_documents": SQL_VOCAB_TOPK_DOCUMENTS,
    "quantiles_event_value": SQL_QUANTILES_EVENT_VALUE,
    "grouped_quantiles_events": SQL_GROUPED_QUANTILES_EVENTS,
    "repetition_signals_docs": SQL_REPETITION_SIGNALS_DOCS,
    "bpe_token_count_documents": _sql_bpe_token_count(),
    "pack_bpe_documents": _sql_pack_bpe(),
    "range_join_signup_follow": SQL_RANGE_JOIN_SIGNUP_FOLLOW,
    "stratified_sample_documents": SQL_STRATIFIED_SAMPLE_DOCUMENTS,
    "topk_docs_per_lang": SQL_TOPK_DOCS_PER_LANG,
    "intersect_signup_purchasers": SQL_INTERSECT_SIGNUP_PURCHASERS,
    "doclen_histogram": SQL_DOCLEN_HISTOGRAM,
    "mode_source_per_lang": SQL_MODE_SOURCE_PER_LANG,
    "orc_ingest_documents": SQL_ORC_INGEST_DOCUMENTS,
    "lag_event_gap": SQL_LAG_EVENT_GAP,
    "moving_avg_orders": SQL_MOVING_AVG_ORDERS,
    "ntile_customers": SQL_NTILE_CUSTOMERS,
    "stddev_order_status": SQL_STDDEV_ORDER_STATUS,
    "corr_qty_price": SQL_CORR_QTY_PRICE,
    "except_silent_customers": SQL_EXCEPT_SILENT_CUSTOMERS,
    "unpivot_lineitem": SQL_UNPIVOT_LINEITEM,
    "string_agg_segments": SQL_STRING_AGG_SEGMENTS,
    "date_spine_events": SQL_DATE_SPINE_EVENTS,
    "semi_join_orders_building": SQL_SEMI_JOIN_ORDERS_BUILDING,
    "first_last_event": SQL_FIRST_LAST_EVENT,
    "rank_customers_acctbal": SQL_RANK_CUSTOMERS_ACCTBAL,
    "funnel_events": SQL_FUNNEL_EVENTS,
    "zscore_events": SQL_ZSCORE_EVENTS,
    "grid_nation_segment": SQL_GRID_NATION_SEGMENT,
    "weighted_sample_documents": SQL_WEIGHTED_SAMPLE_DOCUMENTS,
    "percent_rank_customers": SQL_PERCENT_RANK_CUSTOMERS,
    "sentence_stats_documents": SQL_SENTENCE_STATS_DOCUMENTS,
    "snapshot_diff_pages": SQL_SNAPSHOT_DIFF_PAGES,
    "bigram_topk_documents": SQL_BIGRAM_TOPK_DOCUMENTS,
    "centroid_embeddings": SQL_CENTROID_EMBEDDINGS,
    "debounce_events": SQL_DEBOUNCE_EVENTS,
    "filtered_agg_customers": SQL_FILTERED_AGG_CUSTOMERS,
    "mad_event_value": SQL_MAD_EVENT_VALUE,
    "active_users_events": SQL_ACTIVE_USERS_EVENTS,
    "quantile_bucket_events": SQL_QUANTILE_BUCKET_EVENTS,
    "retention_cohorts": SQL_RETENTION_COHORTS,
    "full_outer_customer_activity": SQL_FULL_OUTER_CUSTOMER_ACTIVITY,
    "lead_event_gap": SQL_LEAD_EVENT_GAP,
    "cumulative_users": SQL_CUMULATIVE_USERS,
    "sliding_window_counts": SQL_SLIDING_WINDOW_COUNTS,
    "regression_slope": SQL_REGRESSION_SLOPE,
    "char_entropy_documents": SQL_CHAR_ENTROPY_DOCUMENTS,
    "winsorized_mean_events": SQL_WINSORIZED_MEAN_EVENTS,
    "quantile_cont_events": SQL_QUANTILE_CONT_EVENTS,
    "ttr_documents": SQL_TTR_DOCUMENTS,
    "dup_ratio_by_source": SQL_DUP_RATIO_BY_SOURCE,
    "benford_orders": SQL_BENFORD_ORDERS,
    "chisq_lang_source": SQL_CHISQ_LANG_SOURCE,
    "transition_matrix_events": SQL_TRANSITION_MATRIX_EVENTS,
    "vocab_overlap_langs": SQL_VOCAB_OVERLAP_LANGS,
    "cheapest_supplier_part": SQL_CHEAPEST_SUPPLIER_PART,
    "event_share_by_day": SQL_EVENT_SHARE_BY_DAY,
    "streak_days_users": SQL_STREAK_DAYS_USERS,
    "outlier_fence_events": SQL_OUTLIER_FENCE_EVENTS,
    "above_avg_orders": SQL_ABOVE_AVG_ORDERS,
    "orderkey_gaps": SQL_ORDERKEY_GAPS,
    "user_event_entropy": SQL_USER_EVENT_ENTROPY,
    "robust_scale_events": SQL_ROBUST_SCALE_EVENTS,
    "dod_change_events": SQL_DOD_CHANGE_EVENTS,
    "since_purchase_events": SQL_SINCE_PURCHASE_EVENTS,
    "kl_divergence_sources": SQL_KL_DIVERGENCE_SOURCES,
    "shingle_overlap_sources": SQL_SHINGLE_OVERLAP_SOURCES,
    "division_priority_customers": SQL_DIVISION_PRIORITY_CUSTOMERS,
    "view_to_purchase_events": SQL_VIEW_TO_PURCHASE_EVENTS,
    "ref_integrity_audit": SQL_REF_INTEGRITY_AUDIT,
    "median_gap_customers": SQL_MEDIAN_GAP_CUSTOMERS,
    "pareto_customers": SQL_PARETO_CUSTOMERS,
    "hhi_lang_sources": SQL_HHI_LANG_SOURCES,
    "basket_pairs_parts": SQL_BASKET_PAIRS_PARTS,
    "day_retention_events": SQL_DAY_RETENTION_EVENTS,
    "multi_distinct_nation": SQL_MULTI_DISTINCT_NATION,
    "major_suppliers_part": SQL_MAJOR_SUPPLIERS_PART,
    "stopword_rate_langs": SQL_STOPWORD_RATE_LANGS,
    "rare_token_rate_sources": SQL_RARE_TOKEN_RATE_SOURCES,
    "dupcluster_size_hist": SQL_DUPCLUSTER_SIZE_HIST,
    "rfm_segments_customers": SQL_RFM_SEGMENTS_CUSTOMERS,
    "anomaly_days_events": SQL_ANOMALY_DAYS_EVENTS,
    "weekday_hour_heatmap_events": SQL_WEEKDAY_HOUR_HEATMAP_EVENTS,
    "daily_p95_events": SQL_DAILY_P95_EVENTS,
    "autocorr_daily_events": SQL_AUTOCORR_DAILY_EVENTS,
    "transition_probs_events": SQL_TRANSITION_PROBS_EVENTS,
    "coverage_curve_docs": SQL_COVERAGE_CURVE_DOCS,
    "null_profile_tables": SQL_NULL_PROFILE_TABLES,
    "pmi_bigrams_documents": SQL_PMI_BIGRAMS_DOCUMENTS,
    "signup_to_purchase_delay": SQL_SIGNUP_TO_PURCHASE_DELAY,
}


def _late_oracles() -> None:
    """Oracles built from the op modules' own pattern tables (kept in
    lockstep with the Ray kernels by construction)."""
    from ..ops.chunk import chunk_sql
    from ..ops.contamination import contamination_sql
    from ..ops.redact import pii_sql

    ORACLES["pii_redact_docs"] = pii_sql(
        f"read_parquet('{FIX_ROOT}/sf0.01/pii.parquet')"
    )
    ORACLES["chunk_documents"] = chunk_sql("documents")
    ORACLES["contamination_check"] = contamination_sql(
        "documents", eval_pred="doc_id % 17 = 0", k=3, threshold=0.8
    )
    ORACLES["corpus_prepare"] = _corpus_prepare_sql()


_late_oracles()
