"""Merge-on-read delta apply (``CDCEngine.apply(mode="delta")``).

Contract under test: LWW is associative, so appending compacted delta
side files per partition and folding lazily (at read / compact / the
bounded-stack fold) must converge to byte-identical logical state with
eager copy-on-write — across micro-batching, deletes, DDL interleaving,
resume, vacuum, and the point-lookup path.

Reference semantics: the same ``ReplacingMergeTree(version)`` LWW window
(``dbt/models/curated/repsly/purchase_orders.sql:15-39``) — merge-on-read
is how ClickHouse itself defers that merge (parts merged in background);
here the deferral is explicit in the manifest.
"""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_warehouse_agnostic_ray import CDCEngine
from etl_warehouse_agnostic_ray.datagen import gen_change_events, write_fixture

N_EVENTS = 1200
N_URLS = 150
SEED = 77
TS0 = datetime.datetime(2030, 1, 1)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("morfix"))
    write_fixture(d, N_EVENTS, N_URLS, seed=SEED, schema_change_frac=0.0)
    return d


def _norm(t: pa.Table, cols=("url", "warc_ts", "html", "text", "lang")) -> list[tuple]:
    t = t.select(list(cols)).sort_by("url")
    return list(zip(*[t.column(c).to_pylist() for c in cols]))


def _slices(fixture_dir: str, n_slices: int) -> list[pa.Table]:
    """The fixture WAL re-cut into many small LSN-ordered micro-batches."""
    ev_dir = os.path.join(fixture_dir, "change_events")
    events = pa.concat_tables(
        pq.read_table(os.path.join(ev_dir, f)) for f in sorted(os.listdir(ev_dir))
    ).sort_by("lsn")
    step = (events.num_rows + n_slices - 1) // n_slices
    return [events.slice(i * step, step) for i in range(n_slices) if i * step < events.num_rows]


def _delta_tbl(lsn0: int, urls: list[str], op: str = "update") -> pa.Table:
    n = len(urls)
    return pa.table(
        {
            "lsn": pa.array(range(lsn0, lsn0 + n), pa.int64()),
            "op": pa.array([op] * n, pa.string()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [TS0 + datetime.timedelta(seconds=lsn0 + i) for i in range(n)],
                pa.timestamp("us"),
            ),
            "html": pa.array([b"x"] * n, pa.large_binary()),
            "text": pa.array([f"v{lsn0}-{u}" for u in urls], pa.large_string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )


def test_delta_mode_converges_with_cow(fixture_dir, tmp_path):
    """The same WAL micro-batched through mode='delta' (bounds relaxed so
    side files actually accumulate) equals copy-on-write replay — and the
    delta stack really was exercised."""
    engines = {}
    for mode, bounds in (("cow", {}), ("delta", {"delta_max_files": 64, "delta_max_ratio": 1e9})):
        eng = CDCEngine(str(tmp_path / f"lake_{mode}"), num_partitions=8, **bounds)
        eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
        for i, sl in enumerate(_slices(fixture_dir, 6)):
            eng.apply(sl, batch_id=f"b{i}", mode=mode)
        engines[mode] = eng
    st = engines["delta"].lake.stats()
    assert st["delta_files"] > 0, "merge-on-read path was never taken"
    assert _norm(engines["delta"].to_arrow()) == _norm(engines["cow"].to_arrow())
    # the distributed MOR reader agrees with the driver-side fold
    ds_rows = engines["delta"].table().count()
    assert ds_rows == engines["delta"].to_arrow().num_rows


def test_delta_stack_bound_folds_inline(fixture_dir, tmp_path):
    """A partition past delta_max_files is folded by the very apply that
    would overflow it (bounded read amplification by construction)."""
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8, delta_max_files=2, delta_max_ratio=1e9)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    url = eng.to_arrow().column("url")[0].as_py()
    r1 = eng.apply(_delta_tbl(10_000, [url]), batch_id="d1", mode="delta")
    r2 = eng.apply(_delta_tbl(20_000, [url]), batch_id="d2", mode="delta")
    r3 = eng.apply(_delta_tbl(30_000, [url]), batch_id="d3", mode="delta")
    assert (r1["delta_appended"], r2["delta_appended"]) == (1, 1)
    assert r3["delta_appended"] == 0 and r3["partitions_rewritten"] == 1
    assert eng.lake.stats()["delta_files"] == 0  # fold cleared the stack
    lk = eng.lake.lookup(url)
    assert lk.num_rows == 1 and lk.column("text")[0].as_py() == f"v30000-{url}"


def test_delta_ratio_bound_folds_big_batches(fixture_dir, tmp_path):
    """A delta larger than delta_max_ratio × base live rows takes the cow
    path even under mode='delta' (a table-sized batch must not become a
    side file bigger than its base)."""
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8, delta_max_ratio=0.5)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    rep = eng.apply(os.path.join(fixture_dir, "change_events"), batch_id="big", mode="delta")
    assert rep["delta_appended"] == 0 and rep["partitions_rewritten"] > 0


def test_delta_with_schema_evolution(tmp_path):
    """Delta stacks + interleaved DDL: the DDL-carrying batch folds its
    affected partitions (cow), older delta files keep their epoch and are
    conformed per file on read — final state equals cow replay."""
    events = gen_change_events(800, 100, seed=9, schema_change_frac=0.01)
    d = str(tmp_path / "fix")
    write_fixture(d, 10, 100, seed=9, schema_change_frac=0.0)  # pages only sized by urls
    step = 100
    slices = [events.slice(i, step) for i in range(0, events.num_rows, step)]
    finals = {}
    for mode in ("cow", "delta"):
        eng = CDCEngine(
            str(tmp_path / f"lake_{mode}"),
            num_partitions=4,
            delta_max_files=64,
            delta_max_ratio=1e9,
        )
        eng.bootstrap(os.path.join(d, "pages.parquet"))
        for i, sl in enumerate(slices):
            eng.apply(sl, batch_id=f"b{i}", mode=mode)
        finals[mode] = eng.to_arrow()
    assert finals["cow"].schema.names == finals["delta"].schema.names
    cols = tuple(finals["cow"].schema.names)
    assert _norm(finals["delta"], cols=cols) == _norm(finals["cow"], cols=cols)


def test_vacuum_keeps_live_delta_files(fixture_dir, tmp_path):
    """Delta side files referenced by the CURRENT manifest live in OLDER
    version dirs — vacuum must treat them as live (regression guard for
    the one-file-per-partition assumption)."""
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8, delta_max_files=64, delta_max_ratio=1e9)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    urls = eng.to_arrow().column("url").to_pylist()[:4]
    eng.apply(_delta_tbl(10_000, urls), batch_id="d1", mode="delta")
    eng.apply(_delta_tbl(20_000, urls), batch_id="d2", mode="delta")
    before = _norm(eng.to_arrow())
    removed = eng.lake.vacuum(keep_versions=1)
    assert all("delta-" not in r for r in removed)
    assert _norm(eng.to_arrow()) == before  # every referenced file still readable


def test_point_lookup_routes_one_partition(fixture_dir, tmp_path):
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8, delta_max_files=64, delta_max_ratio=1e9)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    t = eng.to_arrow()
    u_live, u_dead = t.column("url")[0].as_py(), t.column("url")[1].as_py()
    eng.apply(_delta_tbl(10_000, [u_live]), batch_id="d1", mode="delta")
    eng.apply(_delta_tbl(20_000, [u_dead], op="delete"), batch_id="d2", mode="delta")
    got = eng.lake.lookup(u_live)
    assert got.num_rows == 1 and got.column("text")[0].as_py() == f"v10000-{u_live}"
    assert eng.lake.lookup(u_dead).num_rows == 0  # delta tombstone wins
    assert eng.lake.lookup("https://no-such.example/x").num_rows == 0


def test_compact_folds_delta_stacks(fixture_dir, tmp_path):
    """compact() folds base ∪ deltas into one file per partition without
    advancing lineage (entry max_lsn preserved)."""
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8, delta_max_files=64, delta_max_ratio=1e9)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    urls = eng.to_arrow().column("url").to_pylist()[:6]
    eng.apply(_delta_tbl(10_000, urls), batch_id="d1", mode="delta")
    before = _norm(eng.to_arrow())
    m_before = eng.lake.load_manifest()
    lsn_by_pid = {p: e["max_lsn"] for p, e in m_before["partitions"].items() if e.get("deltas")}
    assert lsn_by_pid
    rep = eng.compact()
    assert not rep.get("skipped")
    m_after = eng.lake.load_manifest()
    assert eng.lake.stats()["delta_files"] == 0
    for p, lsn in lsn_by_pid.items():
        assert m_after["partitions"][p]["max_lsn"] == lsn
        assert not m_after["partitions"][p].get("deltas")
    assert _norm(eng.to_arrow()) == before


def test_delta_mode_resume_and_idempotency(fixture_dir, tmp_path):
    """Duplicate batch_id and already-applied LSNs are skipped in delta
    mode exactly as in cow mode; a crash between micro-batches resumes."""
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8, delta_max_files=64, delta_max_ratio=1e9)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    urls = eng.to_arrow().column("url").to_pylist()[:3]
    d1 = _delta_tbl(10_000, urls)
    eng.apply(d1, batch_id="d1", mode="delta")
    state = _norm(eng.to_arrow())
    assert eng.apply(d1, batch_id="d1", mode="delta")["skipped"]
    r = eng.apply(d1, batch_id="d1-again", mode="delta")
    assert r["skipped"] and r["reason"] == "no new events"
    assert _norm(eng.to_arrow()) == state
    # resume with a fresh engine object on the same root (manifest state)
    eng2 = CDCEngine(str(tmp_path / "lake"), num_partitions=8, delta_max_files=64, delta_max_ratio=1e9)
    eng2.apply(_delta_tbl(20_000, urls), batch_id="d2", mode="delta")
    assert eng2.lake.lookup(urls[0]).column("text")[0].as_py() == f"v20000-{urls[0]}"


def test_commit_verifies_delta_row_counts(fixture_dir, tmp_path):
    """The 2PC count verification covers delta side files too."""
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8, delta_max_files=64, delta_max_ratio=1e9)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    urls = eng.to_arrow().column("url").to_pylist()[:2]
    eng.apply(_delta_tbl(10_000, urls), batch_id="d1", mode="delta")
    m = eng.lake.load_manifest()
    parts = {int(p): dict(e) for p, e in m["partitions"].items()}
    pid, ent = next((p, e) for p, e in parts.items() if e.get("deltas"))
    ent["deltas"] = [dict(ent["deltas"][0], rows=ent["deltas"][0]["rows"] + 5)]
    with pytest.raises(IOError):
        eng.lake.commit(
            parts,
            batch_id="bad",
            applied_lsn=m["applied_lsn"],
            schema_ops=m["schema_ops"],
            num_partitions=m["num_partitions"],
            expected_parent=m["version"],
        )


def test_change_feed_sees_delta_appends(fixture_dir, tmp_path):
    """A delta append changes a partition's file stack — the manifest-diff
    change feed must report it even though the base file is unchanged."""
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8, delta_max_files=64, delta_max_ratio=1e9)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    v0 = eng.lake.current_version()
    urls = eng.to_arrow().column("url").to_pylist()[:1]
    eng.apply(_delta_tbl(10_000, urls), batch_id="d1", mode="delta")
    changed = eng.lake.changed_partition_ids(v0)
    assert len(changed) == 1
    feed = eng.changes_since(v0)
    urls_in_feed = set(
        u for b in feed.iter_batches(batch_format="pyarrow") for u in b.column("url").to_pylist()
    )
    assert urls[0] in urls_in_feed


def test_pruned_reads_across_epochs_and_deltas(tmp_path):
    """Projection pushdown through the lake read: dataset/to_arrow with
    ``columns=`` must return exactly the same values as the full read's
    projection — across schema epochs (renamed columns resolve to their
    per-epoch wire names) AND merge-on-read delta stacks — while never
    touching unrequested payload pages."""
    events = gen_change_events(600, 80, seed=12, schema_change_frac=0.01)
    d = str(tmp_path / "fix")
    write_fixture(d, 10, 80, seed=12, schema_change_frac=0.0)
    eng = CDCEngine(
        str(tmp_path / "lake"), num_partitions=4, delta_max_files=64, delta_max_ratio=1e9
    )
    eng.bootstrap(os.path.join(d, "pages.parquet"))
    # half cow (carries the DDL), half delta (builds MOR stacks)
    mid = events.num_rows // 2
    eng.apply(events.slice(0, mid), batch_id="b1")
    for i, s in enumerate(range(mid, events.num_rows, 100)):
        eng.apply(events.slice(s, 100), batch_id=f"d{i}", mode="delta")
    assert eng.lake.stats()["delta_files"] > 0

    full = eng.to_arrow()
    assert "language" in full.schema.names  # rename happened
    for cols in (["url", "language"], ["language"], ["url", "fetch_status"]):
        pruned = eng.to_arrow(columns=cols)
        assert pruned.schema.names == cols
        want = full.select(cols).sort_by([(c, "ascending") for c in cols])
        got = pruned.sort_by([(c, "ascending") for c in cols])
        assert got.equals(want)
    # the streaming path agrees with the driver path
    ds_rows = eng.table(columns=["url", "language"]).take_all()
    assert len(ds_rows) == full.num_rows
    assert set(ds_rows[0].keys()) == {"url", "language"}
    # change feed honours the projection too
    feed = eng.changes_since(0, columns=["url"])
    assert set(feed.take(1)[0].keys()) == {"url"}
    # unknown column fails loud
    with pytest.raises(ValueError, match="unknown columns"):
        eng.table(columns=["nope"])


def test_lookup_many_batches_keys_per_partition(fixture_dir, tmp_path):
    """Batched point reads: one pruned read per touched partition; live
    winners only (deletes and unknown keys absent); auto mode aliases
    the self-tuning delta path."""
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8, delta_max_files=64, delta_max_ratio=1e9)
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    t = eng.to_arrow()
    urls = t.column("url").to_pylist()[:10]
    eng.apply(_delta_tbl(10_000, urls[:5]), batch_id="d1", mode="auto")
    eng.apply(_delta_tbl(20_000, urls[5:6], op="delete"), batch_id="d2", mode="auto")
    assert eng.lake.stats()["delta_files"] > 0  # auto took the delta path
    got = eng.lake.lookup_many(urls + ["https://absent.example/x"])
    by_url = {r["url"]: r for r in got.to_pylist()}
    assert set(by_url) == set(urls) - {urls[5]}  # delete wins, absent missing
    for u in urls[:5]:
        assert by_url[u]["text"] == f"v10000-{u}"
    assert eng.lake.lookup_many([]).num_rows == 0


def test_routing_hash_contract_not_laundered(fixture_dir, tmp_path):
    """The routing-hash stamp is a persisted-layout contract. A lake laid
    out by a different (or legacy-unstamped) hash must refuse hash-routed
    operations — apply AND point lookups — and incremental commits
    (compaction folds, delta appends) must carry the parent's stamp
    forward VERBATIM rather than silently upgrading it, which would let
    the next apply() route deltas into wrong partitions and accumulate
    duplicate keys."""
    import json

    eng = CDCEngine(
        str(tmp_path / "lake"), num_partitions=8,
        delta_max_files=64, delta_max_ratio=1e9,
    )
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    urls = eng.to_arrow().column("url").to_pylist()[:2]
    eng.apply(_delta_tbl(10_000, urls), batch_id="d1", mode="delta")
    # simulate a lake bootstrapped under an older routing hash
    mpath = eng.lake.manifest_path(eng.lake.current_version())
    m = json.load(open(mpath))
    m["routing_hash"] = "legacy-v0"
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(RuntimeError, match="routing hash"):
        eng.lake.lookup(urls[0])
    with pytest.raises(RuntimeError, match="routing hash"):
        eng.lake.lookup_many(urls)
    with pytest.raises(RuntimeError, match="routing hash"):
        eng.apply(_delta_tbl(20_000, urls), batch_id="d2")
    # compaction (folds the delta stack, no re-routing) must succeed but
    # must NOT launder the stamp back to current
    eng.compact()
    assert eng.lake.load_manifest()["routing_hash"] == "legacy-v0"
    with pytest.raises(RuntimeError, match="routing hash"):
        eng.apply(_delta_tbl(30_000, urls), batch_id="d3")
    # a layout-creating commit re-routes and re-stamps: apply works again
    eng2 = CDCEngine(str(tmp_path / "lake"), num_partitions=8)
    eng2.full_refresh(os.path.join(fixture_dir, "pages.parquet"))
    assert eng2.apply(_delta_tbl(40_000, urls), batch_id="d4")["skipped"] is False


def test_stats_sees_delta_tombstones(fixture_dir, tmp_path):
    """A delete-heavy merge-on-read WAL must move the manifest health
    metrics (tombstones, completeness) the same direction cow mode
    would — delta side files carry rows/live_rows/bytes of their own."""
    eng = CDCEngine(
        str(tmp_path / "lake"), num_partitions=8,
        delta_max_files=64, delta_max_ratio=1e9,
    )
    eng.bootstrap(os.path.join(fixture_dir, "pages.parquet"))
    base = eng.lake.stats()
    assert base["tombstones"] == 0 and base["delta_bytes"] == 0
    urls = eng.to_arrow().column("url").to_pylist()[:20]
    eng.apply(_delta_tbl(10_000, urls, op="delete"), batch_id="del", mode="delta")
    s = eng.lake.stats()
    assert s["delta_files"] > 0
    assert s["tombstones"] >= len(urls)  # the delta deletes are visible
    assert s["completeness_ratio"] < 1.0
    assert s["delta_bytes"] > 0 and s["bytes"] > base["bytes"]
