"""End-to-end CDC replay tests against a DuckDB oracle.

Oracle semantics (FIXTURES.md "Oracle / invariants"): final lake state ==
``row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) = 1``
over (snapshot ∪ events), deletes removed — the reference's LWW dedup
(dbt/models/curated/repsly/purchase_orders.sql:15-25).
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from etl_warehouse_agnostic_ray import CDCEngine
from etl_warehouse_agnostic_ray.datagen import gen_change_events, gen_pages, write_fixture

N_EVENTS = 1200
N_URLS = 150
SEED = 42


def oracle_final_state(pages: pa.Table, events: pa.Table) -> pa.Table:
    """DuckDB LWW over snapshot ∪ data events; deletes removed."""
    con = duckdb.connect()
    con.register("pages", pages)
    con.register("events", events)
    return con.execute(
        """
        WITH unioned AS (
          SELECT url, warc_ts, html, text, lang, -1::BIGINT AS lsn, 'insert' AS op
          FROM pages
          UNION ALL
          SELECT url, warc_ts, html, text, lang, lsn, op
          FROM events WHERE op <> 'schema_change'
        ), ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
          FROM unioned
        )
        SELECT url, warc_ts, html, text, lang FROM ranked
        WHERE rn = 1 AND op <> 'delete'
        ORDER BY url
        """
    ).fetch_arrow_table()


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cdcfix"))
    write_fixture(d, N_EVENTS, N_URLS, seed=SEED, schema_change_frac=0.0)
    return d


def _norm(t: pa.Table, cols=("url", "warc_ts", "html", "text", "lang")) -> list[tuple]:
    t = t.select(list(cols)).sort_by("url")
    return list(zip(*[t.column(c).to_pylist() for c in cols]))


def test_replay_matches_oracle(fixture_dir, tmp_path):
    import pyarrow.parquet as pq

    pages = pq.read_table(os.path.join(fixture_dir, "pages.parquet"))
    events = pa.concat_tables(
        pq.read_table(os.path.join(fixture_dir, "change_events", f))
        for f in sorted(os.listdir(os.path.join(fixture_dir, "change_events")))
    )
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    rep = eng.apply(os.path.join(fixture_dir, "change_events"), batch_id="b1")
    assert not rep["skipped"]
    got = eng.to_arrow()
    want = oracle_final_state(pages, events)
    assert got.num_rows == want.num_rows
    assert _norm(got) == _norm(want)


def test_apply_accepts_ray_dataset_stream(fixture_dir, tmp_path):
    """apply() over a live ray.data.Dataset stream (not paths) must
    produce the same lake as the path-based apply — the Dataset branch
    exercises select_columns / max / filtered-projection discovery."""
    import ray.data as rd

    ev_dir = os.path.join(fixture_dir, "change_events")
    a = CDCEngine(str(tmp_path / "lake_ds"), num_partitions=8)
    a.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    a.apply(rd.read_parquet(ev_dir), batch_id="ds")

    b = CDCEngine(str(tmp_path / "lake_path"), num_partitions=8)
    b.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    b.apply(ev_dir, batch_id="path")
    assert _norm(a.to_arrow()) == _norm(b.to_arrow())


def test_idempotent_batch_replay(fixture_dir, tmp_path):
    """Applying the same batch twice ≡ once (duplicate batch_id guard +
    lsn high-water mark)."""
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    r1 = eng.apply(os.path.join(fixture_dir, "change_events"), batch_id="b1")
    v1 = eng.lake.current_version()
    state1 = _norm(eng.to_arrow())
    # same batch_id → skipped outright
    r2 = eng.apply(os.path.join(fixture_dir, "change_events"), batch_id="b1")
    assert r2["skipped"]
    # different batch_id, same events → lsn filter leaves nothing to do
    r3 = eng.apply(os.path.join(fixture_dir, "change_events"), batch_id="b2")
    assert r3["skipped"] and r3["reason"] == "no new events"
    assert _norm(eng.to_arrow()) == state1
    assert eng.lake.current_version() == v1


def test_incremental_slices_converge(fixture_dir, tmp_path):
    """Applying the stream file-by-file (overlapping lookback redelivery
    included) converges to the same state as one-shot apply."""
    import pyarrow.parquet as pq

    pages = pq.read_table(os.path.join(fixture_dir, "pages.parquet"))
    ev_dir = os.path.join(fixture_dir, "change_events")
    files = sorted(os.listdir(ev_dir))
    events = pa.concat_tables(pq.read_table(os.path.join(ev_dir, f)) for f in files)

    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    for i, f in enumerate(files):
        eng.apply(os.path.join(ev_dir, f), batch_id=f"slice-{i}")
    got = eng.to_arrow()
    want = oracle_final_state(pages, events)
    assert _norm(got) == _norm(want)


def test_resume_mid_stream(fixture_dir, tmp_path):
    """Crash after k slices + restart on the full stream == one-shot
    (checkpoint high-water mark: only lsn > applied_lsn reprocessed)."""
    import pyarrow.parquet as pq

    pages = pq.read_table(os.path.join(fixture_dir, "pages.parquet"))
    ev_dir = os.path.join(fixture_dir, "change_events")
    files = sorted(os.listdir(ev_dir))
    events = pa.concat_tables(pq.read_table(os.path.join(ev_dir, f)) for f in files)

    root = str(tmp_path / "lake")
    eng = CDCEngine(root, num_partitions=8)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    eng.apply(os.path.join(ev_dir, files[0]), batch_id="pre-crash")
    # "restart": new engine instance over the same lake root, full stream
    eng2 = CDCEngine(root, num_partitions=8)
    eng2.apply(ev_dir, batch_id="post-crash")
    got = eng2.to_arrow()
    want = oracle_final_state(pages, events)
    assert _norm(got) == _norm(want)


def test_text_byte_identical_per_url(fixture_dir, tmp_path):
    """FIXTURES.md invariant #2: byte-identical text per url across two
    independent replays (different slicing)."""
    ev_dir = os.path.join(fixture_dir, "change_events")
    files = sorted(os.listdir(ev_dir))

    a = CDCEngine(str(tmp_path / "lake_a"), num_partitions=8)
    a.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    a.apply(ev_dir, batch_id="oneshot")

    b = CDCEngine(str(tmp_path / "lake_b"), num_partitions=4)
    b.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    for i, f in enumerate(files):
        b.apply(os.path.join(ev_dir, f), batch_id=f"s{i}")

    ta = a.to_arrow().select(["url", "text"]).sort_by("url")
    tb = b.to_arrow().select(["url", "text"]).sort_by("url")
    assert ta.equals(tb)


def test_deletes_are_applied(tmp_path):
    pages = gen_pages(50, seed=7)
    events = gen_change_events(300, 50, seed=7, schema_change_frac=0.0)
    n_del_winners = 0
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(pages)
    eng.apply(events, batch_id="b1")
    got = eng.to_arrow()
    want = oracle_final_state(pages, events)
    assert _norm(got) == _norm(want)
    # sanity: the fixture actually exercises deletes
    assert pc.sum(pc.equal(events.column("op"), pa.scalar("delete"))).as_py() > 0
    assert got.num_rows < 50 + 300


def test_salted_hot_key_merge_matches_oracle(fixture_dir, tmp_path):
    """Force the two-level salted merge (salt_threshold tiny) — must be
    byte-identical to the unsalted path/oracle (LWW associativity)."""
    import pyarrow.parquet as pq

    pages = pq.read_table(os.path.join(fixture_dir, "pages.parquet"))
    ev_dir = os.path.join(fixture_dir, "change_events")
    events = pa.concat_tables(
        pq.read_table(os.path.join(ev_dir, f)) for f in sorted(os.listdir(ev_dir))
    )
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8, salt_threshold=10, n_salts=4)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    rep = eng.apply(ev_dir, batch_id="salted")
    assert not rep["skipped"]
    got = eng.to_arrow()
    want = oracle_final_state(pages, events)
    assert _norm(got) == _norm(want)


def test_full_refresh_and_stats(fixture_dir, tmp_path):
    """Full-refresh sink (drop+reload semantics) + manifest-only
    partition-health stats (system.parts analogue)."""
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    eng.apply(os.path.join(fixture_dir, "change_events"), batch_id="b1")
    v_before = eng.lake.current_version()
    new_pages = gen_pages(30, seed=99)
    eng.full_refresh(new_pages, batch_id="refresh")
    assert eng.lake.current_version() == v_before + 1
    t = eng.to_arrow()
    assert t.num_rows == 30  # old state fully replaced
    s = eng.lake.stats()
    assert s["rows"] == 30 and s["tombstones"] == 0
    assert s["partitions"] == 4 and s["bytes"] > 0
    # previous version still readable (time travel until vacuum)
    assert eng.lake.to_arrow(version=v_before).num_rows > 30


def test_apply_stream_micro_batches(fixture_dir, tmp_path):
    """Drain the WAL in LSN-ordered micro-batches (apply_stream) ==
    one-shot apply; resumable between batches."""
    import pyarrow.parquet as pq

    pages = pq.read_table(os.path.join(fixture_dir, "pages.parquet"))
    ev_dir = os.path.join(fixture_dir, "change_events")
    events = pa.concat_tables(
        pq.read_table(os.path.join(ev_dir, f)) for f in sorted(os.listdir(ev_dir))
    )
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    reports = eng.apply_stream(ev_dir, max_files_per_batch=2)
    assert len(reports) == 2  # 4 slice files / 2 per batch
    assert all(not r["skipped"] for r in reports)
    got = eng.to_arrow()
    want = oracle_final_state(pages, events)
    assert _norm(got) == _norm(want)
    # drained: another pass is a no-op
    assert eng.apply_stream(ev_dir) == []


def test_validate_run_report(fixture_dir, tmp_path):
    """Engine-level validation report: zero duplicate urls after LWW
    (the core invariant), null-rate + lake partition health included."""
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    eng.apply(os.path.join(fixture_dir, "change_events"), batch_id="b1")
    rep = eng.validate(critical=["text", "lang"])
    assert rep["duplicate_keys"] == 0  # LWW guarantees unique url
    assert rep["rows"] == rep["lake"]["live_rows"]
    assert 0 <= rep["null_rates"]["text"] <= 1
    assert rep["lake"]["partitions"] == 4
    # per-partition lineage carries a watermark
    m = eng.lake.load_manifest()
    assert all("watermark_ts" in e for e in m["partitions"].values())


def test_schema_evolution_incremental_equals_oneshot(tmp_path):
    """Schema ops interleaved mid-stream: draining the WAL in micro-
    batches (schema op lands mid-drain) must converge to the same final
    table and logical schema as a one-shot apply."""
    d = str(tmp_path / "fix")
    write_fixture(d, 2000, 200, seed=21, schema_change_frac=0.002, n_files=5)
    ev_dir = os.path.join(d, "change_events")

    a = CDCEngine(str(tmp_path / "lake_a"), num_partitions=4)
    a.bootstrap(os.path.join(d, "pages.parquet"))
    a.apply(ev_dir, batch_id="oneshot")

    b = CDCEngine(str(tmp_path / "lake_b"), num_partitions=4)
    b.bootstrap(os.path.join(d, "pages.parquet"))
    b.apply_stream(ev_dir, max_files_per_batch=1)

    ta = a.to_arrow().sort_by("url")
    tb = b.to_arrow().sort_by("url")
    assert ta.schema.equals(tb.schema)  # rename/add/widen all applied
    assert "language" in ta.schema.names and "fetch_status" in ta.schema.names
    assert ta.equals(tb)


def test_compact_conforms_stale_epochs(tmp_path):
    """compact() physically rewrites partitions left on an old schema
    epoch; logical state is byte-identical before/after, every partition
    lands on the current epoch, and a second compact is a no-op."""
    pages = gen_pages(80, seed=7)
    events = gen_change_events(600, 80, seed=7, schema_change_frac=0.01)
    # a delta with the DDL ops plus ONE url's events: most bootstrap
    # partitions stay untouched on the old (-1) epoch
    one_url = pages.column("url")[0].as_py()
    mask = pa.compute.or_(
        pa.compute.equal(events.column("op"), pa.scalar("schema_change")),
        pa.compute.equal(events.column("url"), pa.scalar(one_url)),
    )
    delta = events.filter(mask)
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.bootstrap(pages)
    eng.apply(delta, batch_id="b1")
    m = eng.lake.load_manifest()
    cur_epoch = max(o["lsn"] for o in m["schema_ops"])
    stale = [p for p, e in m["partitions"].items() if e["schema_lsn"] < cur_epoch]
    assert stale, "fixture should leave some partitions on an old epoch"
    before = eng.to_arrow().sort_by("url")

    rep = eng.compact(batch_id="c1")
    assert rep["partitions_rewritten"] == len(stale)
    after = eng.to_arrow().sort_by("url")
    assert before.equals(after)
    m2 = eng.lake.load_manifest()
    assert all(e["schema_lsn"] == cur_epoch for e in m2["partitions"].values())
    # per-partition lineage must not advance
    for pid in stale:
        assert m2["partitions"][pid]["max_lsn"] == m["partitions"][pid]["max_lsn"]
    assert eng.compact().get("skipped")


def test_changes_since_feed(tmp_path):
    """changes_since(v) streams exactly the partitions rewritten after
    v — the downstream incremental-refresh contract."""
    pages = gen_pages(60, seed=8)
    all_events = gen_change_events(400, 60, seed=8, schema_change_frac=0.0)
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.bootstrap(pages)
    v0 = eng.lake.current_version()
    # a delta touching only one url's partition
    one_url = pages.column("url")[0].as_py()
    small = all_events.filter(
        pa.compute.equal(all_events.column("url"), pa.scalar(one_url))
    )
    assert small.num_rows > 0
    eng.apply(small, batch_id="b1")
    changed = eng.lake.changed_partition_ids(v0)
    assert 0 < len(changed) <= 8
    feed = eng.changes_since(v0).to_pandas()
    want = eng.lake.dataset(pids=changed).to_pandas()
    assert sorted(feed["url"]) == sorted(want["url"])
    # rows outside changed partitions are NOT in the feed
    full = eng.to_arrow()
    assert len(feed) < full.num_rows
    # no further changes → empty typed feed
    v1 = eng.lake.current_version()
    empty = eng.changes_since(v1)
    assert empty.count() == 0
    assert "url" in empty.schema().names


def test_wide_binary_rows(tmp_path):
    """Wide rows (html ~256KB — realistic Common-Crawl page sizes):
    large_binary end-to-end, blocks split by Ray, LWW + tombstones +
    byte-identical payload after replay."""
    import numpy as np

    n_urls, n_events = 24, 60
    rng = np.random.default_rng(17)
    urls = [f"https://big-{i}.example/p" for i in range(n_urls)]
    big = [rng.integers(0, 256, size=256 * 1024, dtype=np.uint8).tobytes() for _ in range(n_urls)]
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.arange(n_urls, dtype="int64")).cast(pa.timestamp("us")),
            "html": pa.array(big, pa.large_binary()),
            "text": pa.array([f"t{i}" for i in range(n_urls)], pa.large_string()),
            "lang": pa.array(["en"] * n_urls, pa.string()),
        }
    )
    ev_urls = [urls[i % n_urls] for i in range(n_events)]
    ev_big = [rng.integers(0, 256, size=256 * 1024, dtype=np.uint8).tobytes() for _ in range(n_events)]
    events = pa.table(
        {
            "lsn": pa.array(np.arange(n_events, dtype="int64")),
            "op": pa.array(["update" if i % 5 else "delete" for i in range(n_events)], pa.string()),
            "url": pa.array(ev_urls, pa.string()),
            "warc_ts": pa.array(np.arange(100, 100 + n_events, dtype="int64")).cast(pa.timestamp("us")),
            "html": pa.array([None if i % 5 == 0 else ev_big[i] for i in range(n_events)], pa.large_binary()),
            "text": pa.array([None if i % 5 == 0 else f"e{i}" for i in range(n_events)], pa.large_string()),
            "lang": pa.array([None if i % 5 == 0 else "en" for i in range(n_events)], pa.string()),
        }
    )
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(pages)
    eng.apply(events, batch_id="wide")
    got = eng.to_arrow()
    want = oracle_final_state(pages, events)
    assert _norm(got) == _norm(want)  # includes byte-exact 256KB html
    assert str(got.schema.field("html").type) == "large_binary"


def test_schema_drop_column(tmp_path):
    """``drop`` schema op (dbt sync_all_columns removing a departed wire
    column): the logical table loses the column immediately (old files'
    bytes ignored on read), compaction physically removes it, and
    re-adding the dropped name is refused (resurrection guard)."""
    import pytest as _pytest

    from etl_warehouse_agnostic_ray.state.schema_registry import SchemaRegistry

    pages = gen_pages(60, seed=3)
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(pages)
    assert "lang" in eng.to_arrow().schema.names

    def _ev(lsn, op, url=None, kind=None, col=None, typ=None):
        return {
            "lsn": lsn, "op": op,
            "url": url, "warc_ts": pages.column("warc_ts")[0].as_py(),
            "html": None, "text": "updated", "lang": "de",
            "schema_kind": kind, "schema_column": col, "schema_type": typ,
        }

    u = pages.column("url")[0].as_py()
    delta = pa.Table.from_pylist(
        [
            _ev(10, "update", url=u),
            _ev(11, "schema_change", kind="drop", col="lang"),
            _ev(12, "update", url=pages.column("url")[1].as_py()),
        ]
    )
    eng.apply(delta, batch_id="drop-lang")
    t = eng.to_arrow()
    assert "lang" not in t.schema.names  # logical drop, old bytes ignored
    assert t.num_rows == pages.num_rows
    # compaction physically conforms every partition to the current epoch
    rep = eng.compact()
    assert not rep.get("skipped")
    import pyarrow.parquet as pq_

    for f in eng.lake.files():
        assert "lang" not in pq_.read_metadata(f).schema.to_arrow_schema().names
    # resurrection guard
    reg = SchemaRegistry.from_dict(eng.lake.load_manifest()["schema_ops"])
    with _pytest.raises(ValueError, match="resurrect"):
        reg.apply_event(99, "add", "lang", "string")
    # ...and the guard also blocks a rename whose TARGET is the dropped
    # name (same resurrection hazard through the rename path)
    with _pytest.raises(ValueError, match="resurrect"):
        reg.apply_event(99, "rename", "text", "lang")
    # dropping and adding a DIFFERENT name still works end-to-end
    delta2 = pa.Table.from_pylist(
        [
            _ev(20, "schema_change", kind="add", col="lang_v2", typ="string"),
            _ev(21, "update", url=u),
        ]
    )
    eng.apply(delta2, batch_id="add-lang-v2")
    assert "lang_v2" in eng.to_arrow().schema.names


def test_follow_tails_new_wal_files(fixture_dir, tmp_path):
    """The binlog-follower loop: drain what exists, then pick up a file
    PUBLISHED AFTER the first drain on the next poll; every yield is a
    committed state, and stopping anywhere resumes cleanly."""
    import shutil

    ev_dir = os.path.join(fixture_dir, "change_events")
    files = sorted(f for f in os.listdir(ev_dir) if f.endswith(".parquet"))
    live = str(tmp_path / "wal")
    os.makedirs(live)
    shutil.copy(os.path.join(ev_dir, files[0]), os.path.join(live, files[0]))

    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))

    published = {"done": False}

    def fake_sleep(_):
        # the producer ships the rest of the WAL between polls
        if not published["done"]:
            for f in files[1:]:
                shutil.copy(os.path.join(ev_dir, f), os.path.join(live, f))
            published["done"] = True

    reports = list(
        eng.follow(live, poll_interval=0, max_polls=3, sleep=fake_sleep)
    )
    assert sum(r["events_applied"] for r in reports if not r.get("skipped")) > 0
    # followed state == one-shot apply of the full WAL
    one = CDCEngine(str(tmp_path / "lake_oneshot"), num_partitions=4)
    one.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    one.apply(ev_dir, batch_id="oneshot")
    assert _norm(eng.to_arrow()) == _norm(one.to_arrow())


def test_history_walks_manifest_chain(fixture_dir, tmp_path):
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    eng.apply_stream(os.path.join(fixture_dir, "change_events"), max_files_per_batch=2)
    h = eng.history()
    assert h[0]["version"] == eng.lake.current_version()  # newest first
    assert h[-1]["op"] == "bootstrap"
    applies = [r for r in h if r["op"] == "apply"]
    assert applies and all(r["events_applied"] > 0 for r in applies)
    lsns = [r["applied_lsn"] for r in h]
    assert lsns == sorted(lsns, reverse=True)  # monotone lineage
    assert len(eng.history(limit=2)) == 2


def test_half_written_wal_file_fails_loud(fixture_dir, tmp_path):
    """The WAL contract requires atomic file publication; a truncated
    (half-written) parquet file must fail the footer scan LOUDLY, never
    corrupt lake state or advance the watermark."""
    import shutil

    ev_dir = os.path.join(fixture_dir, "change_events")
    files = sorted(f for f in os.listdir(ev_dir) if f.endswith(".parquet"))
    live = str(tmp_path / "wal")
    os.makedirs(live)
    shutil.copy(os.path.join(ev_dir, files[0]), os.path.join(live, files[0]))
    src = open(os.path.join(ev_dir, files[1]), "rb").read()
    with open(os.path.join(live, files[1]), "wb") as f:
        f.write(src[: len(src) // 2])  # torn write: no footer

    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    v0 = eng.lake.current_version()
    with pytest.raises(Exception):
        eng.apply(live, batch_id="torn")
    assert eng.lake.current_version() == v0  # nothing committed
    # after the producer finishes publishing, the same drain succeeds
    shutil.copy(os.path.join(ev_dir, files[1]), os.path.join(live, files[1]))
    r = eng.apply(live, batch_id="retry")
    assert not r.get("skipped") and r["events_applied"] > 0
