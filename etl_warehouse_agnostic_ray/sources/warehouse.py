"""Warehouse (SQL database) reader — the reference's ``pd.read_sql``
source (``extractors/utils/database.py:59-66``) re-expressed as a
parallel Ray Data read.

``ray.data.read_sql`` shards the query across tasks when given a
``sharding_keys`` hint; each task opens its own connection from the
factory (never share one connection across tasks). Works against any
DB-API 2.0 driver — the test exercises it with stdlib sqlite3, a real
warehouse slots in by swapping the connection factory, exactly the
reference's ``ACTIVE_WAREHOUSE`` switch re-expressed connection-side.
"""

from __future__ import annotations

from typing import Any, Callable


def read_warehouse(
    sql: str,
    connection_factory: Callable[[], Any],
    **read_sql_kwargs,
):
    """Streaming Dataset over a SQL query result.

    ``connection_factory``: zero-arg callable returning a NEW DB-API
    connection (called per read task). Extra kwargs pass through to
    ``ray.data.read_sql`` (e.g. ``shard_keys``/``shard_hash_fn`` or
    ``override_num_blocks`` for parallel reads on large tables).
    """
    import ray.data as rd

    return rd.read_sql(sql, connection_factory, **read_sql_kwargs)


def read_warehouse_table(
    table: str,
    connection_factory: Callable[[], Any],
    columns: list[str] | None = None,
    **read_sql_kwargs,
):
    """Convenience: full-table (optionally column-pruned) read."""
    cols = ", ".join(columns) if columns else "*"
    return read_warehouse(
        f"SELECT {cols} FROM {table}", connection_factory, **read_sql_kwargs
    )
