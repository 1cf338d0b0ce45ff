"""Auxiliary sinks.

The primary sink is the versioned lake (``lake.py``); these are the
reference's secondary outputs re-expressed Ray-Data-native.
"""

from __future__ import annotations


def write_debug_csv(ds, out_dir: str, **kwargs) -> str:
    """CSV debug dump (the reference's ``df.to_csv`` debugging sink,
    ``extractors/repsly/extractor.py`` debug path) — distributed: one
    CSV shard per block, no driver materialization. For eyeballing
    samples use ``ds.limit(n)`` first."""
    ds.write_csv(out_dir, **kwargs)
    return out_dir


def write_partitioned_parquet(ds, out_dir: str, partition_cols: list[str], **kwargs) -> str:
    """Resumable partitioned-parquet sink: one directory per partition
    value so a re-run can skip finished partitions (the repo-wide
    resumable-output rule)."""
    ds.write_parquet(out_dir, partition_cols=partition_cols, **kwargs)
    return out_dir
