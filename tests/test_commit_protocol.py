"""Exactly-once commit protocol under failure: crashes between 2PC
steps must leave the previous version intact; count verification must
refuse to flip the pointer over corrupt writes (the reference's
insert→verify→advance discipline, extractors/repsly/extractor.py:
668-759, 1441-1488)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_warehouse_agnostic_ray import CDCEngine
from etl_warehouse_agnostic_ray.datagen import gen_change_events, gen_pages
from etl_warehouse_agnostic_ray.stages.bloom import DedupGuard


@pytest.fixture()
def lake_with_data(tmp_path, ray_session):
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.bootstrap(gen_pages(60, seed=5))
    eng.apply(gen_change_events(300, 60, seed=5, schema_change_frac=0.0), batch_id="b1")
    return eng


def test_crash_before_manifest_leaves_old_version_live(lake_with_data, tmp_path):
    """Simulate a merge that wrote data files but died before the
    manifest (2PC step 1 done, step 2 not): reader still sees the old
    committed version; vacuum removes the orphans."""
    eng = lake_with_data
    v = eng.lake.current_version()
    state = eng.to_arrow().sort_by("url")
    # fake a half-finished next version: data files, no manifest
    orphan_dir = eng.lake.data_dir(v + 1)
    os.makedirs(orphan_dir, exist_ok=True)
    pq.write_table(pa.table({"url": ["junk"]}), os.path.join(orphan_dir, "part-00000.parquet"))

    assert eng.lake.current_version() == v  # pointer untouched
    assert eng.to_arrow().sort_by("url").equals(state)
    removed = eng.lake.vacuum(keep_versions=10)
    assert any("part-00000" in r for r in removed)
    assert eng.to_arrow().sort_by("url").equals(state)


def test_routing_hash_mismatch_refused(lake_with_data):
    """Partition routing is a persisted-format contract: a lake laid
    out by a DIFFERENT routing hash must refuse apply() (deltas would
    land in the wrong partitions and LWW would duplicate keys)."""
    eng = lake_with_data
    mpath = eng.lake.manifest_path(eng.lake.current_version())
    with open(mpath) as fh:
        m = json.load(fh)
    assert "routing_hash" in m  # stamped at commit
    m["routing_hash"] = "legacy-siphash-v1"
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    with pytest.raises(RuntimeError, match="routing hash"):
        eng.apply(gen_change_events(50, 60, seed=6, schema_change_frac=0.0),
                  batch_id="b2")
    # an UNSTAMPED (pre-stamp legacy) manifest must refuse too — those
    # are exactly the lakes that may have been laid out by an old hash
    del m["routing_hash"]
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    with pytest.raises(RuntimeError, match="unstamped"):
        eng.apply(gen_change_events(50, 60, seed=6, schema_change_frac=0.0),
                  batch_id="b3")


def test_count_verification_refuses_corrupt_commit(lake_with_data):
    """commit() re-reads every listed file's footer; a row-count
    mismatch aborts BEFORE the pointer flips."""
    eng = lake_with_data
    v = eng.lake.current_version()
    good = eng.lake.load_manifest()["partitions"]
    bad = {int(p): dict(e, rows=e["rows"] + 7) for p, e in good.items()}
    with pytest.raises(IOError, match="rows"):
        eng.lake.commit(
            bad,
            batch_id="corrupt",
            applied_lsn=999999,
            schema_ops=[],
            num_partitions=4,
        )
    assert eng.lake.current_version() == v  # no new version
    assert "corrupt" not in eng.lake.load_manifest()["applied_batch_ids"]


def test_missing_file_refuses_commit(lake_with_data):
    eng = lake_with_data
    good = eng.lake.load_manifest()["partitions"]
    bad = {int(p): dict(e, file="data/v999999/part-99999.parquet") for p, e in good.items()}
    with pytest.raises(Exception):
        eng.lake.commit(
            bad, batch_id="ghost", applied_lsn=1, schema_ops=[], num_partitions=4
        )


def test_optimistic_concurrency_conflict_detected(lake_with_data):
    """A commit planned against a version that is no longer CURRENT must
    raise (lakehouse optimistic-concurrency check) instead of silently
    building on state the merge never saw."""
    eng = lake_with_data
    v = eng.lake.current_version()
    parts = {
        int(p): dict(e) for p, e in eng.lake.load_manifest()["partitions"].items()
    }
    # another writer advances CURRENT first
    eng.lake.commit(parts, batch_id="other-writer", applied_lsn=10**6,
                    schema_ops=[], num_partitions=4)
    with pytest.raises(RuntimeError, match="commit conflict"):
        eng.lake.commit(parts, batch_id="stale-writer", applied_lsn=10**6 + 1,
                        schema_ops=[], num_partitions=4, expected_parent=v)
    # planning against the NEW current succeeds
    eng.lake.commit(parts, batch_id="fresh-writer", applied_lsn=10**6 + 2,
                    schema_ops=[], num_partitions=4,
                    expected_parent=eng.lake.current_version())


def test_injected_pyarrow_filesystem_end_to_end(tmp_path, ray_session):
    """The storage seam: the whole bootstrap→apply→read→vacuum cycle
    runs against an explicitly injected pyarrow filesystem (LocalFS
    here; S3/GCS/HDFS slot in the same way), and the resulting table is
    byte-identical to the default os-path lake."""
    from pyarrow.fs import LocalFileSystem

    pages = gen_pages(60, seed=5)
    events = gen_change_events(300, 60, seed=5, schema_change_frac=0.0)

    eng_fs = CDCEngine(str(tmp_path / "lake_fs"), num_partitions=4,
                       filesystem=LocalFileSystem())
    eng_fs.bootstrap(pages)
    r = eng_fs.apply(events, batch_id="b1")
    assert not r.get("skipped") and r["events_applied"] > 0

    eng_os = CDCEngine(str(tmp_path / "lake_os"), num_partitions=4)
    eng_os.bootstrap(pages)
    eng_os.apply(events, batch_id="b1")

    a = eng_fs.to_arrow().sort_by("url")
    b = eng_os.to_arrow().sort_by("url")
    assert a.equals(b)
    # streaming read + maintenance + change feed through the fs too
    assert eng_fs.table().count() == a.num_rows
    assert eng_fs.changes_since(0).count() > 0
    eng_fs.lake.vacuum(keep_versions=1)
    assert eng_fs.to_arrow().sort_by("url").equals(b)


def test_full_refresh_resets_duplicate_batch_namespace(lake_with_data):
    """After a watermark-resetting full refresh the refreshed lake no
    longer contains batch b1's events, so re-applying under the SAME
    batch_id must run (not be skipped as a duplicate)."""
    eng = lake_with_data
    eng.full_refresh(gen_pages(60, seed=5), batch_id="fr")
    r = eng.apply(
        gen_change_events(300, 60, seed=5, schema_change_frac=0.0), batch_id="b1"
    )
    assert not r.get("skipped"), r
    assert r["events_applied"] > 0


def test_dedup_guard_in_pipeline(ray_session):
    """DedupGuard as an actor-pool stage inside a real Dataset pipeline:
    redelivered lsns shed before the (mock) sink; totals exact."""
    import ray.data as rd

    events = gen_change_events(500, 80, seed=6, dup_frac=0.1, schema_change_frac=0.0)
    ds = rd.from_arrow(events)
    out = ds.map_batches(
        DedupGuard, fn_constructor_kwargs={"applied_lsn": 99},
        batch_format="pyarrow", concurrency=1, batch_size=200,
    )
    lsns = []
    for b in out.iter_batches(batch_format="pyarrow"):
        lsns.extend(b.column("lsn").to_pylist())
    assert min(lsns) == 100           # HWM shed
    assert len(lsns) == len(set(lsns))  # in-actor duplicate shed


def _small_delta(eng, lsn0: int, n: int = 3) -> pa.Table:
    import datetime

    urls = eng.to_arrow().column("url").to_pylist()[:n]
    ts = datetime.datetime(2031, 1, 1)
    return pa.table(
        {
            "lsn": pa.array(range(lsn0, lsn0 + n), pa.int64()),
            "op": pa.array(["update"] * n, pa.string()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([ts] * n, pa.timestamp("us")),
            "html": pa.array([b"y"] * n, pa.large_binary()),
            "text": pa.array([f"d{lsn0}"] * n, pa.large_string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )


def test_delta_crash_before_manifest_leaves_old_version_live(lake_with_data):
    """Merge-on-read 2PC: delta side files written but no manifest (step
    1 done, crash before step 2) — readers still see the committed
    state, point lookups ignore the orphan, vacuum removes it, and the
    SAME batch re-applies cleanly afterwards."""
    eng = lake_with_data
    v = eng.lake.current_version()
    state = eng.to_arrow().sort_by("url")
    orphan_dir = eng.lake.data_dir(v + 1)
    os.makedirs(orphan_dir, exist_ok=True)
    pq.write_table(
        pa.table({"url": ["junk"]}), os.path.join(orphan_dir, "delta-00001.parquet")
    )
    assert eng.lake.current_version() == v
    assert eng.to_arrow().sort_by("url").equals(state)
    removed = eng.lake.vacuum(keep_versions=10)
    assert any("delta-00001" in r for r in removed)
    # the interrupted batch re-applies (fresh delta mode run) cleanly
    eng2 = CDCEngine(
        eng.lake.root, num_partitions=4, delta_max_files=64, delta_max_ratio=1e9
    )
    r = eng2.apply(_small_delta(eng, 10_000), batch_id="retry", mode="delta")
    assert not r.get("skipped") and r["delta_appended"] >= 1


def test_delta_count_verification_refuses_corrupt_commit(lake_with_data):
    """A truncated/corrupt delta side file must fail the pre-flip count
    verification — the pointer never advances over bad bytes. Default
    commits verify only files INTRODUCED by the commit (carried-forward
    entries were verified when introduced — O(delta), not O(P)); the
    ``verify_all=True`` scrub re-checks every listed file."""
    eng = CDCEngine(
        lake_with_data.lake.root,
        num_partitions=4,
        delta_max_files=64,
        delta_max_ratio=1e9,
    )
    eng.apply(_small_delta(lake_with_data, 20_000), batch_id="d-ok", mode="delta")
    m = eng.lake.load_manifest()
    v_before = m["version"]
    # (1) default path: a NEW dent whose file is corrupt must refuse
    parts_new = {int(p): dict(e) for p, e in m["partitions"].items()}
    pid, ent_new = next(
        (p, e) for p, e in parts_new.items() if e.get("deltas")
    )
    good = ent_new["deltas"][0]
    bad_rel = good["file"] + ".bad.parquet"
    with open(os.path.join(eng.lake.root, bad_rel), "wb") as f:
        f.write(b"not parquet")
    ent_new["deltas"] = list(ent_new["deltas"]) + [dict(good, file=bad_rel)]
    with pytest.raises(Exception):
        eng.lake.commit(
            parts_new,
            batch_id="bad-new-dent",
            applied_lsn=m["applied_lsn"],
            schema_ops=m["schema_ops"],
            num_partitions=m["num_partitions"],
            expected_parent=v_before,
        )
    assert eng.lake.current_version() == v_before  # pointer untouched
    # (2) scrub path: corrupt a CARRIED-FORWARD delta; default commit
    # skips it (verified at introduction), verify_all=True refuses
    ent = next(e for e in m["partitions"].values() if e.get("deltas"))
    victim = os.path.join(eng.lake.root, ent["deltas"][0]["file"])
    with open(victim, "wb") as f:
        f.write(b"not parquet")
    with pytest.raises(Exception):
        eng.lake.commit(
            {int(p): e for p, e in m["partitions"].items()},
            batch_id="bad-commit",
            applied_lsn=m["applied_lsn"],
            schema_ops=m["schema_ops"],
            num_partitions=m["num_partitions"],
            expected_parent=v_before,
            verify_all=True,
        )
    assert eng.lake.current_version() == v_before  # pointer untouched
