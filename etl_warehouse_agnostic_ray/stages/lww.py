"""Last-writer-wins compaction — the core CDC upsert.

Reference semantics being matched (not copied): every silver model keeps
``row_number() OVER (PARTITION BY business_key ORDER BY dbt_loaded_at
DESC, record_hash DESC) = 1`` (``dbt/models/curated/repsly/
purchase_orders.sql:15-39``) and the engine-level twin
``ReplacingMergeTree(version)`` (``airflow/dags/acumatica_dag.py:287-301``).

Here: per hash-partition of ``url``, keep the row with the maximum
``(warc_ts, lsn)``; if that winner is a delete, the key disappears. The
total order (warc_ts, then lsn) makes the merge deterministic and
associative/commutative, which is what lets salted two-level merges and
replays converge (SURVEY.md §7.5).

Implemented on zero-copy Arrow: sort_indices + take + first-occurrence
mask — no Python-per-row work, no pandas dtype round-trip (keeps
large_binary / timestamp[us] exact).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schemas import LSN_COL, OP_COL, PID_COL

MERGE_STATS_SCHEMA = pa.schema(
    [
        ("pid", pa.int64()),
        ("rows", pa.int64()),
        ("live_rows", pa.int64()),
        ("watermark_ts", pa.timestamp("us")),
        ("max_lsn", pa.int64()),
        ("bytes", pa.int64()),
        ("file", pa.string()),
        ("is_delta", pa.bool_()),
    ]
)


def lww_compact_table(tbl: pa.Table) -> pa.Table:
    """Pure LWW compaction of one partition's (base ∪ delta) rows.

    Requires columns: url, warc_ts, _lsn, _op (+payload). Returns the
    winning row per url — INCLUDING delete winners as tombstones (null
    payload, _op='delete'), sorted by url for a deterministic layout.

    Tombstones must be retained in the partition file: with out-of-order
    event times inside the lookback window (SURVEY.md §2.10), a later
    LSN slice can carry an *older*-warc_ts update for a deleted key; if
    the tombstone were dropped, that stale update would resurrect the
    key and replay would diverge from one-shot apply. The logical table
    view filters tombstones out (LakeTable.dataset / to_arrow).
    """
    if tbl.num_rows == 0:
        return tbl
    idx = pc.sort_indices(
        tbl,
        sort_keys=[("url", "ascending"), ("warc_ts", "descending"), (LSN_COL, "descending")],
    )
    s = tbl.take(idx)
    urls = s.column("url").to_numpy(zero_copy_only=False)
    first = np.empty(len(urls), dtype=bool)
    first[0] = True
    first[1:] = urls[1:] != urls[:-1]
    return s.filter(pa.array(first))


def merge_partition_group(
    group: pa.Table,
    out_dir: str,
    base_files: dict[int, str | list[str]] | None = None,
    schema_ops: list[dict] | None = None,
    filesystem=None,
    delta_pids: set[int] | None = None,
) -> pa.Table:
    """map_groups fn: compacts one partition's delta group against its
    base partition file(s) and writes the next version's parquet file
    (2PC step 1), returning a one-row stats table for the manifest.

    The base side is NOT shuffled: lake partitions are one file per
    pid (plus any merge-on-read delta files), so the merge task reads
    its base file(s) directly (local FS / shared storage) and only the
    delta moves through the exchange — half the shuffle bytes and no
    Union barrier (measured ~2× on the merge execution). Base rows are
    conformed to the current logical schema here (rename/add/widen,
    tombstones kept); files are conformed one at a time because they
    may come from different schema epochs.

    ``delta_pids``: partitions applied in MERGE-ON-READ mode — the
    compacted delta group is written as a ``delta-*.parquet`` side file
    WITHOUT reading the base at all (zero write amplification for a
    small micro-batch against a large partition; readers/compaction
    fold base ∪ deltas later). LWW associativity makes the deferred
    fold equivalent to an eager one.

    Writing inside the task keeps the wide rows off the driver and makes
    retries idempotent (tmp file + rename; same pid → same final name).
    """
    if group.num_rows == 0:
        # typed empty stats block — keeps every block of the stats
        # dataset on ONE schema (Ray warns on schema divergence when an
        # empty untyped block mixes into take_all)
        return MERGE_STATS_SCHEMA.empty_table()
    pid = int(group.column(PID_COL)[0].as_py())
    as_delta = delta_pids is not None and pid in delta_pids
    base_path = None if as_delta else (base_files or {}).get(pid)
    if base_path is not None:
        from ..state.schema_registry import SchemaRegistry

        reg = SchemaRegistry.from_dict(schema_ops or [])
        paths = [base_path] if isinstance(base_path, str) else list(base_path)
        tables = [group]
        for p in paths:
            base = pq.read_table(p, filesystem=filesystem)
            lineage = {
                c: base.column(c)
                for c in (LSN_COL, OP_COL, PID_COL)
                if c in base.column_names
            }
            conformed = reg.conform(base.drop(list(lineage)))
            for c in (LSN_COL, OP_COL, PID_COL):
                conformed = conformed.append_column(c, lineage[c])
            tables.append(conformed)
        group = pa.concat_tables(tables)
    winners = lww_compact_table(group)
    fname = f"{'delta' if as_delta else 'part'}-{pid:05d}.parquet"
    final = os.path.join(out_dir, fname)
    tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}-{fname}")
    if filesystem is not None:
        filesystem.create_dir(out_dir, recursive=True)
        pq.write_table(winners, tmp, compression="zstd", filesystem=filesystem)
        filesystem.move(tmp, final)
        size = filesystem.get_file_info(final).size
    else:
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(winners, tmp, compression="zstd")
        # durability before the pointer flip can reference this file:
        # fsync the bytes AND the directory entry, so a power loss after
        # commit cannot leave CURRENT pointing at a vanished partition
        with open(tmp, "rb") as fh:
            os.fsync(fh.fileno())
        os.replace(tmp, final)
        from ..state.atomic import fsync_dir

        fsync_dir(out_dir)
        size = os.path.getsize(final)
    max_lsn = pc.max(group.column(LSN_COL)).as_py()
    # per-partition watermark = max event time merged into this
    # partition (the reference's per-endpoint watermark generalized,
    # extractors/repsly/extractor.py:1491-1638)
    wm = pc.max(group.column("warc_ts")).as_py()
    n_live = winners.num_rows - (
        pc.sum(pc.equal(winners.column(OP_COL), pa.scalar("delete"))).as_py() or 0
    )
    return pa.table(
        {
            "pid": pa.array([pid], pa.int64()),
            "rows": pa.array([winners.num_rows], pa.int64()),
            "live_rows": pa.array([int(n_live)], pa.int64()),
            "watermark_ts": pa.array([wm], pa.timestamp("us")),
            "max_lsn": pa.array([int(max_lsn)], pa.int64()),
            "bytes": pa.array([int(size)], pa.int64()),
            "file": pa.array(
                [os.path.join(os.path.basename(os.path.dirname(final)), fname)], pa.string()
            ),
            "is_delta": pa.array([as_delta], pa.bool_()),
        }
    )


def partition_merger(
    out_dir: str,
    base_files: dict[int, str | list[str]] | None = None,
    schema_ops: list[dict] | None = None,
    filesystem=None,
    delta_pids: set[int] | None = None,
):
    """Picklable map_groups callable bound to the target version dir,
    (optionally) the per-pid base partition files, and the lake's
    pyarrow filesystem (None = local fast path)."""
    import functools

    return functools.partial(
        merge_partition_group,
        out_dir=out_dir,
        base_files=base_files,
        schema_ops=schema_ops,
        filesystem=filesystem,
        delta_pids=delta_pids,
    )
