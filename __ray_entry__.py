"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC pipeline (pages + WAL-shaped change
stream → versioned lake upsert) at sf0.001. ``queries()`` exposes one
callable per implemented operator/pipeline from SURVEY.md §2 (+ the
training-data ops); ``oracle_sql()`` gives the DuckDB twin for every
SQL-expressible one.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in the library code these use.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from etl_warehouse_agnostic_ray.pipelines import queries as Q


def entry() -> Any:
    """Flagship pipeline: deterministic input_hint-shaped fixture sized
    for sf0.001 → bootstrap → CDC replay → final logical lake table."""
    import os
    import shutil
    import tempfile

    from etl_warehouse_agnostic_ray import CDCEngine

    d = Q.fixture_dir("/root/testdata/sf0.001")
    root = tempfile.mkdtemp(prefix="lake_entry_", dir="/tmp")
    try:
        eng = CDCEngine(root, num_partitions=8)
        eng.bootstrap(os.path.join(d, "pages.parquet"))
        eng.apply(os.path.join(d, "change_events"), batch_id="entry-replay")
        return eng.lake.to_arrow()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _ensure_fixtures() -> None:
    """Generate every /tmp fixture an oracle SQL reads, up front, so the
    driver may evaluate queries and oracles in any order."""
    from etl_warehouse_agnostic_ray.datagen import write_fixture

    Q.fixture_dir("/root/testdata/sf0.01")
    n_events, n_urls = Q._SF_SIZES["sf0.01"]
    write_fixture(
        f"{Q.FIX_ROOT}/sf0.01_schema", n_events, n_urls, seed=43,
        schema_change_frac=0.002,
    )


def queries() -> dict[str, Callable[[str], Any]]:
    _ensure_fixtures()
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure_fixtures()
    return dict(Q.ORACLES)
