"""One end-to-end lifecycle exercising every engine feature in the
order an operator would: bootstrap → micro-batch drain (with schema
evolution + duplicate deliveries) → validate → change feed → compact →
full refresh → re-drain under reused batch ids → final oracle check.

Serves as living documentation of the operational surface; each
assertion pins a contract tested in isolation elsewhere.
"""

import os

import duckdb
import pyarrow as pa
import pytest

from etl_warehouse_agnostic_ray import CDCEngine
from etl_warehouse_agnostic_ray.datagen import write_fixture


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lifefix"))
    write_fixture(d, 3000, 300, seed=21, schema_change_frac=0.002, n_files=6)
    return d


def oracle_state(fx_dir: str) -> pa.Table:
    return duckdb.sql(
        f"""
        WITH unioned AS (
          SELECT url, warc_ts, text, lang AS language,
                 CAST(NULL AS BIGINT) AS fetch_status,
                 CAST(-1 AS BIGINT) AS lsn, 'insert' AS op
          FROM read_parquet('{fx_dir}/pages.parquet')
          UNION ALL
          SELECT url, warc_ts, text, lang AS language,
                 CAST(fetch_status AS BIGINT), lsn, op
          FROM read_parquet('{fx_dir}/change_events/*.parquet')
          WHERE op <> 'schema_change'
        ), ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
          FROM unioned)
        SELECT url, warc_ts, text, language, fetch_status
        FROM ranked WHERE rn = 1 AND op <> 'delete' ORDER BY url
        """
    ).fetch_arrow_table()


def _state(eng, like: pa.Table) -> pa.Table:
    return (
        eng.to_arrow()
        .select(["url", "warc_ts", "text", "language", "fetch_status"])
        .sort_by("url")
        .cast(like.schema)  # engine uses large_string; oracle plain string
    )


def test_full_lifecycle(fx, tmp_path, ray_session):
    want = oracle_state(fx)
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=8)

    # 1. bootstrap + LSN-ordered micro-batch drain (schema ops inline)
    eng.bootstrap(os.path.join(fx, "pages.parquet"))
    v0 = eng.lake.current_version()
    reports = eng.apply_stream(os.path.join(fx, "change_events"), max_files_per_batch=2)
    assert all(not r.get("skipped") for r in reports)
    assert _state(eng, want).equals(want)

    # 2. validation report over the final table
    rep = eng.validate(critical=["text"])
    assert rep["rows"] == want.num_rows
    assert rep["duplicate_keys"] == 0  # LWW leaves one live row per url
    assert rep["lake"]["schema_ops"] == 3

    # 3. change feed since bootstrap covers every surviving row's partition
    feed = eng.changes_since(v0)
    assert 0 < feed.count() <= want.num_rows + rep["lake"]["tombstones"]

    # 4. compact stale epochs: state invariant, epochs unified
    eng.compact(batch_id="c1")
    assert _state(eng, want).equals(want)
    m = eng.lake.load_manifest()
    epochs = {e["schema_lsn"] for e in m["partitions"].values()}
    assert len(epochs) == 1

    # 5. full refresh resets watermark + batch-id namespace; the SAME
    #    micro-batch ids re-apply cleanly and converge to the same state
    eng.full_refresh(os.path.join(fx, "pages.parquet"), batch_id="fr")
    reports2 = eng.apply_stream(os.path.join(fx, "change_events"), max_files_per_batch=2)
    assert all(not r.get("skipped") for r in reports2)
    assert _state(eng, want).equals(want)

    # 6. vacuum leaves the current state readable
    eng.lake.vacuum(keep_versions=1)
    assert _state(eng, want).equals(want)
