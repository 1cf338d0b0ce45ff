"""Warehouse SQL reader, auxiliary sinks, and the refresh-interval gate."""

import glob
import os
import sqlite3

import pyarrow.parquet as pq

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
        r = run("vacuum", "--lake", lake, "--keep", "1")
        assert r["removed"] >= 0
        assert ray.is_initialized()  # session not stolen


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
