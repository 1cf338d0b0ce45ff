"""Warehouse SQL reader, auxiliary sinks, and the refresh-interval gate."""

import glob
import os
import sqlite3

import pyarrow.parquet as pq
import pytest

from etl_warehouse_agnostic_ray.sinks import write_debug_csv, write_partitioned_parquet
from etl_warehouse_agnostic_ray.sources.warehouse import (
    read_warehouse,
    read_warehouse_table,
)
from etl_warehouse_agnostic_ray.state.checkpoint import RefreshGate


class TestWarehouseReader:
    def _db(self, tmp_path) -> str:
        db = str(tmp_path / "wh.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (id INTEGER, name TEXT)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?)", [(i, f"row{i}") for i in range(100)]
        )
        con.commit()
        con.close()
        return db

    def test_read_sql_query(self, tmp_path, ray_session):
        db = self._db(tmp_path)
        ds = read_warehouse(
            "SELECT id, name FROM t WHERE id < 10", lambda: sqlite3.connect(db)
        )
        out = ds.to_pandas().sort_values("id").reset_index(drop=True)
        assert len(out) == 10 and out["name"][3] == "row3"

    def test_read_table_column_pruned(self, tmp_path, ray_session):
        db = self._db(tmp_path)
        ds = read_warehouse_table("t", lambda: sqlite3.connect(db), columns=["id"])
        df = ds.to_pandas()
        assert list(df.columns) == ["id"] and len(df) == 100


class TestSinks:
    def test_debug_csv(self, tmp_path, ray_session):
        import ray.data as rd

        ds = rd.range(25)
        out = write_debug_csv(ds, str(tmp_path / "csv"))
        files = glob.glob(os.path.join(out, "*.csv"))
        assert files
        total = sum(len(open(f).read().strip().splitlines()) - 1 for f in files)
        assert total == 25

    def test_partitioned_parquet_resumable_layout(self, tmp_path, ray_session):
        import pyarrow as pa
        import ray.data as rd

        t = pa.table({"k": ["a", "a", "b"], "v": [1, 2, 3]})
        out = write_partitioned_parquet(
            rd.from_arrow(t), str(tmp_path / "pq"), partition_cols=["k"]
        )
        # one directory per partition value → skippable on rerun
        assert os.path.isdir(os.path.join(out, "k=a"))
        assert os.path.isdir(os.path.join(out, "k=b"))
        back = pq.read_table(out)
        assert back.num_rows == 3


class TestCLI:
    def test_cli_lifecycle(self, tmp_path, ray_session, capsys):
        """bootstrap → drain → stats → vacuum through the __main__ CLI
        (reuses the test Ray session; main() must not shut it down)."""
        import json

        import ray

        from etl_warehouse_agnostic_ray.__main__ import main
        from etl_warehouse_agnostic_ray.datagen import write_fixture

        fix = str(tmp_path / "fix")
        lake = str(tmp_path / "lake")
        write_fixture(fix, 1500, 200, seed=4, n_files=2)

        def run(*argv):
            assert main(list(argv)) == 0
            return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

        r = run("bootstrap", "--lake", lake, "--pages", f"{fix}/pages.parquet",
                "--partitions", "4")
        assert r["version"] == 0 and r["rows"] == 200
        r = run("drain", "--lake", lake, "--stream", f"{fix}/change_events")
        assert r["events_applied"] > 0
        r = run("stats", "--lake", lake)
        assert r["partitions"] == 4 and r["rows"] > 0
        # point lookup through the CLI (binary payload excluded)
        import pyarrow.parquet as _pq

        url = _pq.read_table(f"{fix}/pages.parquet", columns=["url"]).column("url")[0].as_py()
        r = run("lookup", "--lake", lake, "--url", url, "--partitions", "4")
        assert r["found"] and r["row"]["url"] == url and "html" not in r["row"]
        r = run("lookup", "--lake", lake, "--url", "https://no.example/", "--partitions", "4")
        assert not r["found"] and r["row"] is None
        r = run("vacuum", "--lake", lake, "--keep", "1")
        assert r["removed"] >= 0
        assert ray.is_initialized()  # session not stolen


    def test_cli_exit_codes(self, tmp_path, ray_session, capsys):
        """Operational errors → rc 2; failed validate report → rc 1 —
        so shell health gates can rely on the exit status."""
        import json

        import pyarrow as pa

        from etl_warehouse_agnostic_ray import CDCEngine
        from etl_warehouse_agnostic_ray.__main__ import main

        # apply against an un-bootstrapped lake: RuntimeError → rc 2
        rc = main(["apply", "--lake", str(tmp_path / "nolake"),
                   "--stream", str(tmp_path / "nostream")])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 2 and "bootstrap" in out["error"]

        # tombstone-heavy lake: completeness gate fails validate → rc 1
        n = 10
        pages = pa.table(
            {
                "url": [f"https://u{i}.example/" for i in range(n)],
                "warc_ts": pa.array(range(n), pa.int64()).cast(pa.timestamp("us")),
                "html": pa.array([b"x"] * n, pa.large_binary()),
                "text": pa.array([f"t{i}" for i in range(n)], pa.large_string()),
                "lang": ["en"] * n,
            }
        )
        events = pa.table(
            {
                "lsn": pa.array(range(6), pa.int64()),
                "op": ["delete"] * 6,
                "url": [f"https://u{i}.example/" for i in range(6)],
                "warc_ts": pa.array(range(100, 106), pa.int64()).cast(pa.timestamp("us")),
                "html": pa.array([None] * 6, pa.large_binary()),
                "text": pa.array([None] * 6, pa.large_string()),
                "lang": pa.array([None] * 6, pa.string()),
            }
        )
        lake = str(tmp_path / "lake_tomb")
        eng = CDCEngine(lake, num_partitions=2)
        eng.bootstrap(pages)
        eng.apply(events, batch_id="deletes")
        rc = main(["validate", "--lake", lake, "--partitions", "2"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["passed"] is False
        assert rc == 1


class TestRefreshGate:
    def test_interval_gating(self, tmp_path):
        g = RefreshGate(str(tmp_path))
        assert g.should_refresh("companies", 3600, now=1000.0)  # never loaded
        g.mark_refreshed("companies", now=1000.0)
        assert not g.should_refresh("companies", 3600, now=2000.0)  # fresh
        assert g.should_refresh("companies", 3600, now=4600.0)  # stale
        # independent names
        assert g.should_refresh("products", 3600, now=1001.0)

    def test_gate_callable_for_tenants(self, tmp_path):
        g = RefreshGate(str(tmp_path))
        g.mark_refreshed("t1", now=100.0)
        gate = g.gate(interval_sec=60, now=120.0)
        assert gate("t2") and not gate("t1")

    def test_cron_next_schedule_points(self):
        import datetime as dt

        from etl_warehouse_agnostic_ray.state.checkpoint import cron_next

        def ts(*args):
            return dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp()

        def nxt(expr, *args):
            return dt.datetime.fromtimestamp(
                cron_next(expr, ts(*args)), tz=dt.timezone.utc
            )

        # daily at 02:30
        assert nxt("30 2 * * *", 2024, 3, 10, 1, 0) == dt.datetime(
            2024, 3, 10, 2, 30, tzinfo=dt.timezone.utc
        )
        assert nxt("30 2 * * *", 2024, 3, 10, 2, 30) == dt.datetime(
            2024, 3, 11, 2, 30, tzinfo=dt.timezone.utc
        )  # strictly after
        # every 15 minutes
        assert nxt("*/15 * * * *", 2024, 3, 10, 1, 7) == dt.datetime(
            2024, 3, 10, 1, 15, tzinfo=dt.timezone.utc
        )
        # weekly, Sunday 03:00 (2024-03-10 is a Sunday)
        assert nxt("0 3 * * 0", 2024, 3, 9, 12, 0) == dt.datetime(
            2024, 3, 10, 3, 0, tzinfo=dt.timezone.utc
        )
        # dow alias 7 == Sunday
        assert nxt("0 3 * * 7", 2024, 3, 9, 12, 0) == dt.datetime(
            2024, 3, 10, 3, 0, tzinfo=dt.timezone.utc
        )
        # month rollover: 1st of month at midnight
        assert nxt("0 0 1 * *", 2024, 2, 15, 9, 0) == dt.datetime(
            2024, 3, 1, 0, 0, tzinfo=dt.timezone.utc
        )
        # dom/dow OR rule: day 13 OR Friday — from Wed 2024-09-11,
        # Friday the 13th matches both, but Fri 2024-09-13 is preceded
        # by dom=13 only on the same day; from 2024-09-10 next match is
        # Friday 2024-09-13 (dom 13); from 2024-09-14 it's Friday 09-20.
        assert nxt("0 0 13 * 5", 2024, 9, 10, 1, 0) == dt.datetime(
            2024, 9, 13, 0, 0, tzinfo=dt.timezone.utc
        )
        assert nxt("0 0 13 * 5", 2024, 9, 13, 1, 0) == dt.datetime(
            2024, 9, 20, 0, 0, tzinfo=dt.timezone.utc
        )
        # leap-day schedule still terminates (day-level skipping)
        assert nxt("0 0 29 2 *", 2024, 3, 1, 0, 0) == dt.datetime(
            2028, 2, 29, 0, 0, tzinfo=dt.timezone.utc
        )

    def test_cron_typos_raise_at_parse_time(self):
        from etl_warehouse_agnostic_ray.state.checkpoint import cron_next, parse_cron

        with pytest.raises(ValueError, match="empty list element"):
            parse_cron("30, 2 * * *")  # trailing-comma typo ≠ '*'
        with pytest.raises(ValueError, match="out of range"):
            parse_cron("0 0 * * 9")  # dow validates too (7 is the max alias)
        with pytest.raises(ValueError, match="out of range"):
            parse_cron("0 0 * * 5-1")  # reversed range ≠ empty set
        with pytest.raises(ValueError, match="out of range"):
            parse_cron("60 * * * *")
        with pytest.raises(ValueError, match="5 fields"):
            cron_next("* * * *", 0.0)

    def test_cron_gate_drives_tenant_fanout(self, tmp_path, ray_session):
        """The reference's per-company croniter gating
        (leaflink_dag.py:41-44) end-to-end: TenantedCDC skips tenants
        whose cron schedule hasn't fired since their last refresh."""
        import datetime as dt

        from etl_warehouse_agnostic_ray.datagen import gen_change_events, gen_pages
        from etl_warehouse_agnostic_ray.pipelines.tenants import TenantedCDC

        def ts(*args):
            return dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp()

        g = RefreshGate(str(tmp_path))
        g.mark_refreshed("acme", now=ts(2024, 3, 10, 2, 0))  # just ran
        # daily-02:00 schedule, evaluated the same evening: acme gated
        # off, fresh tenant runs
        multi = TenantedCDC(
            str(tmp_path / "lakes"), ["acme", "globex"], num_partitions=2,
            gate=g.cron_gate("0 2 * * *", now=ts(2024, 3, 10, 23, 0)),
        )
        multi.bootstrap({t: gen_pages(20, seed=1) for t in ("acme", "globex")})
        out = multi.apply(
            {t: gen_change_events(50, 20, seed=2, schema_change_frac=0.0)
             for t in ("acme", "globex")},
            batch_id="b1",
        )
        assert out["acme"] == {"skipped": True, "reason": "gated"}
        assert out["globex"]["skipped"] is False

    def test_cron_refresh_gate(self, tmp_path):
        import datetime as dt

        g = RefreshGate(str(tmp_path))

        def ts(*args):
            return dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp()

        expr = "0 2 * * *"  # daily 02:00 UTC
        assert g.should_refresh_cron("t1", expr, now=ts(2024, 3, 10, 1, 0))
        g.mark_refreshed("t1", now=ts(2024, 3, 10, 2, 0))
        # before the next fire → skip; after → run
        assert not g.should_refresh_cron("t1", expr, now=ts(2024, 3, 10, 23, 0))
        assert g.should_refresh_cron("t1", expr, now=ts(2024, 3, 11, 2, 0))
        gate = g.cron_gate(expr, now=ts(2024, 3, 10, 23, 0))
        assert gate("never_seen") and not gate("t1")
