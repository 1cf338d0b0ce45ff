"""Sources (LSN slicing / watermark windows / ragged grids) + pipeline
registry tests."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_warehouse_agnostic_ray.datagen import write_fixture
from etl_warehouse_agnostic_ray.pipelines.registry import (
    STEP_REGISTRY,
    PipelineRegistry,
    PipelineSpec,
    register_step,
)
from etl_warehouse_agnostic_ray.sources import (
    ChangeStreamSource,
    IncrementalTableSource,
    RaggedGridSource,
)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("src"))
    write_fixture(d, 2000, 200, seed=9, schema_change_frac=0.0, n_files=5)
    return os.path.join(d, "change_events")


class TestChangeStream:
    def test_lsn_ranges_and_pruning(self, stream_dir, ray_session):
        src = ChangeStreamSource(stream_dir)
        ranges = src.file_lsn_ranges()
        assert len(ranges) == 5
        assert all(lo <= hi for _, lo, hi in ranges)
        # cursor beyond 3rd file's max: earlier files never read
        cursor = ranges[2][2]
        ds = src.read_from(cursor)
        assert ds.count() == src.count_remaining(cursor)
        assert src.read_from(ranges[-1][2]) is None  # fully consumed

    def test_micro_batches_cover_stream(self, stream_dir):
        src = ChangeStreamSource(stream_dir)
        batches = list(src.batches(cursor=-1, max_files=2))
        assert sum(len(fs) for _, fs in batches) == 5
        assert len(batches) == 3

    def test_statless_file_conservatively_included(self, tmp_path, ray_session):
        """A parquet slice written with statistics disabled must still be
        read — missing footer min/max means 'could contain anything',
        not 'empty' (silent-data-loss guard)."""
        d = str(tmp_path / "nostat")
        os.makedirs(d)
        t = pa.table({"lsn": pa.array([5, 6, 7], pa.int64()),
                      "url": ["a", "b", "c"]})
        pq.write_table(t, os.path.join(d, "events-0.parquet"),
                       write_statistics=False)
        src = ChangeStreamSource(d)
        (f, lo, hi), = src.file_lsn_ranges()
        assert lo is None and hi is None
        ds = src.read_from(0)
        assert ds is not None and ds.count() == 3
        batches = list(src.batches(cursor=0))
        assert sum(len(fs) for _, fs in batches) == 1

    def test_batch_ids_content_unique_and_stable(self, tmp_path):
        """Batch ids hash the chunk's file basenames: two chunks of
        STAT-LESS files must get distinct ids (lsn-endpoint ids
        collided → the second chunk was silently skipped as a duplicate
        and its events lost), while re-listing the same files yields
        the same id (replay idempotency)."""
        d = str(tmp_path / "nostat2")
        os.makedirs(d)
        for i in range(4):
            t = pa.table({"lsn": pa.array([10 * i, 10 * i + 1], pa.int64()),
                          "url": ["a", "b"]})
            pq.write_table(t, os.path.join(d, f"events-{i}.parquet"),
                           write_statistics=False)
        src = ChangeStreamSource(d)
        ids1 = [bid for bid, _ in src.batches(cursor=-1, max_files=2)]
        assert len(ids1) == 2
        assert len(set(ids1)) == 2  # distinct chunks → distinct ids
        ids2 = [bid for bid, _ in src.batches(cursor=-1, max_files=2)]
        assert ids1 == ids2  # same files → same ids

    def test_batch_ids_differ_for_regenerated_content(self, tmp_path):
        """Two stream dirs reusing the SAME basenames but holding
        different events must yield different batch ids (else the
        applier's seen-batch guard drops the second stream's events)."""
        ids_by_dir = []
        for d_i, lsns in enumerate(([1, 2, 3], [50, 60, 70])):
            d = str(tmp_path / f"dir{d_i}")
            os.makedirs(d)
            t = pa.table({"lsn": pa.array(lsns, pa.int64()),
                          "url": ["a", "b", "c"]})
            pq.write_table(t, os.path.join(d, "events-0.parquet"))
            src = ChangeStreamSource(d)
            ids_by_dir.append([bid for bid, _ in src.batches(cursor=-1)])
        assert ids_by_dir[0] != ids_by_dir[1]


class TestIncremental:
    def test_watermark_window(self, tmp_path, ray_session):
        path = str(tmp_path / "t.parquet")
        ts = [dt.datetime(2024, 1, 1) + dt.timedelta(hours=h) for h in range(10)]
        pq.write_table(pa.table({"id": list(range(10)), "mtime": pa.array(ts, pa.timestamp("us"))}), path)
        src = IncrementalTableSource(path, "mtime", lookback=dt.timedelta(hours=1))
        assert src.read(None).count() == 10  # first run: full extract
        wm = dt.datetime(2024, 1, 1, 5)
        ds = src.read(wm)
        assert ds.count() == 6  # hours 4..9 (wm − 1h lookback overlap)
        assert IncrementalTableSource.next_watermark(ds, "mtime") == ts[-1]


class TestRagged:
    def test_grid(self, ray_session):
        src = RaggedGridSource([["A", "B"], ["1", "2"], ["3"]])
        ds = src.to_dataset()
        assert ds.count() == 2
        assert set(ds.schema().names) == {"a", "b", "_row_number"}


class TestRegistry:
    def test_topo_and_run(self, ray_session):
        import ray.data as rd

        reg = PipelineRegistry()
        calls = []

        @register_step("double_value_test")
        def double_value(ds):
            return ds.map_batches(
                lambda t: t.set_column(
                    t.column_names.index("v"), "v", pa.compute.multiply(t.column("v"), 2)
                ),
                batch_format="pyarrow",
            )

        reg.add(
            PipelineSpec(
                name="b",
                source=lambda: rd.from_arrow(pa.table({"v": [1, 2]})),
                steps=["double_value_test"],
                sink=lambda ds: (calls.append("b"), ds.to_pandas())[1],
                depends_on=["a"],
            )
        )
        reg.add(
            PipelineSpec(
                name="a",
                source=lambda: rd.from_arrow(pa.table({"v": [5]})),
                sink=lambda ds: (calls.append("a"), ds.to_pandas())[1],
            )
        )
        reg.add(PipelineSpec(name="off", source=lambda: None, enabled=False))
        out = reg.run()
        assert calls == ["a", "b"]  # dependency order
        assert out["b"]["v"].tolist() == [2, 4]
        assert "off" not in out

    def test_unknown_step_rejected(self):
        reg = PipelineRegistry()
        with pytest.raises(ValueError):
            reg.add(PipelineSpec(name="x", source=lambda: None, steps=["nope"]))

    def test_cycle_detected(self):
        reg = PipelineRegistry()
        reg.add(PipelineSpec(name="p", source=lambda: None, depends_on=["q"]))
        reg.add(PipelineSpec(name="q", source=lambda: None, depends_on=["p"]))
        with pytest.raises(ValueError, match="cycle"):
            reg.topo_order()

    def test_source_pipeline_chains_results(self, ray_session):
        """The ref() edge: a pipeline whose source is another pipeline's
        RESULT — the dep is implied, execution is ordered, and asking
        for only the downstream model pulls the upstream in."""
        import ray.data as rd

        calls = []
        reg = PipelineRegistry()
        reg.add(
            PipelineSpec(
                name="up",
                source=lambda: rd.from_arrow(pa.table({"v": [1, 2, 3]})),
                sink=lambda ds: (calls.append("up"), ds)[1],
            )
        )
        reg.add(
            PipelineSpec(
                name="down",
                source_pipeline="up",
                sink=lambda ds: (calls.append("down"), ds.to_pandas()["v"].sum())[1],
            )
        )
        out = reg.run(only=["down"])  # dependency closure runs "up" too
        assert calls == ["up", "down"]
        assert out["down"] == 6
        assert reg.pipelines["down"].depends_on == ["up"]

    def test_source_xor_source_pipeline_enforced(self):
        reg = PipelineRegistry()
        with pytest.raises(ValueError, match="exactly one"):
            reg.add(PipelineSpec(name="neither"))
        with pytest.raises(ValueError, match="exactly one"):
            reg.add(
                PipelineSpec(name="both", source=lambda: None, source_pipeline="x")
            )

    def test_disabled_upstream_fails_loud(self):
        """A ref() edge into a DISABLED pipeline must raise a clear
        error, not a bare KeyError (topo_order drops disabled specs)."""
        reg = PipelineRegistry()
        reg.add(PipelineSpec(name="up", source=lambda: None, enabled=False))
        reg.add(PipelineSpec(name="down", source_pipeline="up"))
        with pytest.raises(ValueError, match="disabled or did not execute"):
            reg.run(only=["down"])


class TestSilverModel:
    def test_silver_orders_through_registry(self, ray_session):
        """The worked dbt-model analogue: registered steps compose into
        a silver model via PipelineSpec and produce the projected
        columns; dedup keeps one row per business key."""
        from etl_warehouse_agnostic_ray.pipelines.silver import (
            SILVER_ORDERS_COLUMNS,
            silver_orders,
        )

        out = silver_orders("/root/testdata/sf0.001").to_pandas()
        assert list(out.columns) == SILVER_ORDERS_COLUMNS
        assert out["o_orderkey"].is_unique
        assert set(out["order_status"]) <= {"open", "fulfilled", "pending", "unknown"}
        assert set(out["value_tier"]) <= {"small", "medium", "large", "jumbo"}
        assert out["order_dow"].between(1, 7).all()

    def test_silver_model_is_drop_in(self, ray_session):
        """A user extends the same registry with another model reusing
        the registered steps — no engine changes needed."""
        import ray.data as rd

        from etl_warehouse_agnostic_ray.pipelines.silver import (
            build_silver_orders_registry,
        )

        reg = build_silver_orders_registry(
            lambda: rd.read_parquet("/root/testdata/sf0.001/orders.parquet")
        )
        reg.add(
            PipelineSpec(
                name="urgent_orders",
                source=lambda: rd.read_parquet(
                    "/root/testdata/sf0.001/orders.parquet"
                ),
                steps=["orders.categorize"],
                sink=lambda ds: ds.filter(lambda r: r["is_urgent"]).count(),
                depends_on=["silver_orders"],
            )
        )
        res = reg.run()
        assert res["urgent_orders"] > 0
        assert reg.topo_order().index("silver_orders") < reg.topo_order().index(
            "urgent_orders"
        )


class TestTenants:
    def test_per_tenant_isolation_and_gating(self, tmp_path, ray_session):
        from etl_warehouse_agnostic_ray.datagen import gen_change_events, gen_pages
        from etl_warehouse_agnostic_ray.pipelines.tenants import TenantedCDC

        multi = TenantedCDC(
            str(tmp_path / "tenants"),
            ["ny", "nj"],
            num_partitions=4,
            gate=lambda t: t != "nj",  # nj cron-gated off
        )
        multi.bootstrap(
            {"ny": gen_pages(40, seed=1), "nj": gen_pages(40, seed=2)}
        )
        out = multi.apply(
            {
                "ny": gen_change_events(200, 40, seed=1, schema_change_frac=0.0),
                "nj": gen_change_events(200, 40, seed=2, schema_change_frac=0.0),
            },
            batch_id="b1",
        )
        assert not out["ny"]["skipped"]
        assert out["nj"] == {"skipped": True, "reason": "gated"}
        # isolated state: nj unchanged since bootstrap, ny advanced
        assert multi.engine("nj").lake.load_manifest()["applied_lsn"] == -1
        assert multi.engine("ny").lake.load_manifest()["applied_lsn"] > 0
        # tenant data spaces are disjoint directories
        assert (tmp_path / "tenants" / "ny" / "CURRENT").exists()
        assert (tmp_path / "tenants" / "nj" / "CURRENT").exists()


class TestWalOrdering:
    @staticmethod
    def _ev(lsns, urls=None):
        n = len(lsns)
        urls = urls or [f"https://s.example/p{i}" for i in range(n)]
        return pa.table(
            {
                "lsn": pa.array(lsns, pa.int64()),
                "op": pa.array(["update"] * n, pa.string()),
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(
                    [dt.datetime(2030, 1, 1) + dt.timedelta(seconds=int(l)) for l in lsns],
                    pa.timestamp("us"),
                ),
                "html": pa.array([b"<p>"] * n, pa.large_binary()),
                "text": pa.array([f"t{l}" for l in lsns], pa.large_string()),
                "lang": pa.array(["en"] * n, pa.string()),
            }
        )

    def test_batches_follow_footer_lsn_not_filename(self, tmp_path):
        """A producer writing events-2 … events-10 without zero-padding
        lists events-10 lexicographically before events-2; chunking in
        NAME order would apply the high-LSN slice first, advance the
        applied-LSN cursor, and permanently drop the low slices. Chunks
        must come out in footer-LSN order regardless of names."""
        d = str(tmp_path / "wal")
        os.makedirs(d)
        # file i covers lsn [i*100, i*100+9]; names NOT zero-padded
        for i in range(1, 12):
            pq.write_table(self._ev(list(range(i * 100, i * 100 + 10))),
                           os.path.join(d, f"events-{i}.parquet"))
        src = ChangeStreamSource(d)
        chunks = list(src.batches(cursor=-1, max_files=1))
        ranges = {f: (lo, hi) for f, lo, hi in src.file_lsn_ranges()}
        los = [ranges[files[0]][0] for _, files in chunks]
        assert los == sorted(los)  # LSN order, not events-1,10,11,2,...

    def test_statless_files_sort_by_resolved_range(self, tmp_path):
        """A stat-less file's range is resolved by a one-column scan so
        it sorts at its TRUE lsn position. Sorting it LAST (the old
        rule) silently dropped its events whenever they interleaved
        BELOW known ranges drained earlier in the same cycle — the
        applied-LSN filter had already moved past them (ADVICE r3)."""
        d = str(tmp_path / "wal")
        os.makedirs(d)
        pq.write_table(self._ev(list(range(100, 110))), os.path.join(d, "b.parquet"))
        pq.write_table(self._ev(list(range(200, 210))),
                       os.path.join(d, "a-nostat.parquet"), write_statistics=False)
        # the hazard case: a stat-less file BELOW every known range
        pq.write_table(self._ev(list(range(0, 10))),
                       os.path.join(d, "z-nostat-low.parquet"), write_statistics=False)
        src = ChangeStreamSource(d)
        chunks = list(src.batches(cursor=-1, max_files=1))
        assert [os.path.basename(fs[0]) for _, fs in chunks] == [
            "z-nostat-low.parquet", "b.parquet", "a-nostat.parquet"
        ]

    def test_statless_interleaved_drain_loses_nothing(self, tmp_path, ray_session):
        """End-to-end: a stat-less WAL slice whose LSNs sit below a
        known-range slice drains without losing a single event."""
        from etl_warehouse_agnostic_ray import CDCEngine

        d = str(tmp_path / "wal")
        os.makedirs(d)
        urls_hi = [f"https://s.example/hi-{j}" for j in range(10)]
        urls_lo = [f"https://s.example/lo-{j}" for j in range(10)]
        pq.write_table(self._ev(list(range(100, 110)), urls_hi),
                       os.path.join(d, "a.parquet"))
        pq.write_table(self._ev(list(range(0, 10)), urls_lo),
                       os.path.join(d, "z-nostat.parquet"), write_statistics=False)
        eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
        eng.init_empty()
        eng.apply_stream(d, max_files_per_batch=1)
        assert eng.to_arrow().num_rows == 20  # nothing dropped
        assert eng.lake.load_manifest()["applied_lsn"] == 109

    def test_randomized_statless_drain_property(self, tmp_path, ray_session):
        """Property: for a WAL of random disjoint LSN slices where a
        random subset of files carries NO footer statistics, a
        micro-batch drain (random max_files) converges to the same
        final table as applying the whole WAL in one batch — no event
        lost or double-applied regardless of which files are stat-less
        or how the slices interleave on disk."""
        import numpy as np

        from etl_warehouse_agnostic_ray import CDCEngine

        rng = np.random.default_rng(23)
        for trial in range(3):
            d = str(tmp_path / f"wal{trial}")
            os.makedirs(d)
            # random permutation of disjoint 10-event LSN slices; ~40%
            # of files stat-less; filenames shuffled relative to ranges
            slices = rng.permutation(12)
            all_urls = {}
            for fi, sl in enumerate(slices):
                lsns = list(range(int(sl) * 10, int(sl) * 10 + 10))
                urls = [f"https://s.example/u{l % 37}" for l in lsns]
                for l, u in zip(lsns, urls):
                    all_urls[u] = max(all_urls.get(u, -1), l)
                pq.write_table(
                    self._ev(lsns, urls),
                    os.path.join(d, f"events-{fi}.parquet"),
                    write_statistics=bool(rng.random() > 0.4),
                )
            mb = int(rng.integers(1, 4))
            eng = CDCEngine(str(tmp_path / f"lake{trial}"), num_partitions=4)
            eng.init_empty()
            eng.apply_stream(d, max_files_per_batch=mb)
            got = eng.to_arrow().sort_by("url")
            # oracle: ONE batch over the whole WAL into a fresh lake
            ora = CDCEngine(str(tmp_path / f"oracle{trial}"), num_partitions=4)
            ora.init_empty()
            ora.apply(d, batch_id=f"one-{trial}")
            want = ora.to_arrow().sort_by("url")
            assert got.equals(want), f"trial {trial} (max_files={mb})"
            assert got.num_rows == len(all_urls)
            assert eng.lake.load_manifest()["applied_lsn"] == 119

    def test_unpadded_wal_drains_without_loss(self, tmp_path, ray_session):
        """End-to-end: micro-batch drain of the unpadded WAL applies
        EVERY event (pre-fix, name-order chunking lost the low slices
        behind the cursor)."""
        from etl_warehouse_agnostic_ray import CDCEngine

        d = str(tmp_path / "wal")
        os.makedirs(d)
        all_urls = []
        for i in range(1, 12):
            urls = [f"https://s.example/f{i}-{j}" for j in range(10)]
            all_urls += urls
            pq.write_table(self._ev(list(range(i * 100, i * 100 + 10)), urls),
                           os.path.join(d, f"events-{i}.parquet"))
        eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4)
        eng.init_empty()
        r = eng.apply_stream(d, max_files_per_batch=1)
        assert eng.to_arrow().num_rows == len(all_urls)  # nothing dropped
        assert eng.lake.load_manifest()["applied_lsn"] == 11 * 100 + 9


class TestStatlessRetirement:
    def test_statless_file_retired_after_commit(self, tmp_path, ray_session):
        """A stat-less WAL file can never pass the cursor test, so
        pre-ledger every drain re-scanned it AND its num_rows kept
        arming the big-delta shortcut (whole-table cow on 10-row
        batches). After a committed apply drains it, the manifest
        ledger retires it: later applies skip it and small deltas take
        the delta path."""
        from etl_warehouse_agnostic_ray import CDCEngine

        P = 8
        mk = TestWalOrdering._ev
        d = str(tmp_path / "wal")
        os.makedirs(d)
        # big stat-less slice: enough rows to arm big-delta (512*P)
        n_big = 512 * P + 100
        pq.write_table(
            mk(list(range(1000, 1000 + n_big)),
               [f"https://s.example/b{j}" for j in range(n_big)]),
            os.path.join(d, "bulk-nostat.parquet"), write_statistics=False,
        )
        eng = CDCEngine(str(tmp_path / "lake"), num_partitions=P,
                        delta_max_files=64, delta_max_ratio=1e9)
        eng.init_empty()
        r1 = eng.apply(d, batch_id="b1")
        assert not r1["skipped"]
        m = eng.lake.load_manifest()
        assert any(t.startswith("bulk-nostat.parquet|") for t in m["statless_drained"])
        # re-apply the same dir: the retired file is skipped entirely
        r2 = eng.apply(d, batch_id="b2")
        assert r2["skipped"] and r2["reason"] == "no new events"
        # a small follow-up slice must take the DELTA path — pre-ledger,
        # the stat-less file's rows re-armed big-delta and forced cow
        pq.write_table(
            mk(list(range(100000, 100010)),
               [f"https://s.example/b{j}" for j in range(10)]),
            os.path.join(d, "tail.parquet"),
        )
        r3 = eng.apply(d, batch_id="b3", mode="delta")
        assert not r3["skipped"]
        assert eng.lake.stats()["delta_files"] > 0  # delta path engaged
        # logical state correct: every url's latest version wins
        t = eng.lake.lookup("https://s.example/b0")
        assert t.column("text")[0].as_py() == "t100000"
