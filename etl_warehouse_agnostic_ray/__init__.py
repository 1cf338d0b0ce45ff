"""Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
``mustafamammoth/ETL-Warehouse-Agnostic`` (watermark-driven incremental
ingest, schema evolution, idempotent exactly-once loads, last-writer-wins
dedup, layered bronze->silver transforms) on Ray Data:

- input: a WAL/binlog-shaped change-event stream over Common-Crawl-style
  web-page Parquet ``(url, warc_ts, html, text, lang)``;
- engine: ``ray.data.Dataset`` -> ``map_batches`` over zero-copy Arrow,
  hash-partitioned ``groupby`` shuffle, per-partition LWW compaction;
- sink: versioned Parquet lake table with a write-ahead manifest and
  atomic rename (exactly-once), per-partition applied-LSN lineage.

No code is copied from the reference; file:line citations in docstrings
point at the *behavior* being matched.
"""

__version__ = "0.1.0"

from .lake import LakeTable  # noqa: F401
from .pipelines.cdc import CDCEngine  # noqa: F401
