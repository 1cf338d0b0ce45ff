"""Checkpoint / lineage store.

The reference keeps a per-source ``{endpoint: watermark}`` JSON file,
advanced only after a verified load, with snapshot/rollback on failure
(``extractors/repsly/extractor.py:377-506, 1399-1488``). Our equivalent
is the per-table applied-LSN checkpoint: it only advances as part of a
committed lake manifest (2-phase commit step 2), so replay from any
point is safe — the sink is idempotent and the merge is LWW.

Stored per commit:
- ``applied_lsn``: high-water mark — events with lsn <= this are in the lake
- ``applied_batch_ids``: duplicate-load guard (the reference's
  duplicate ``_extracted_at`` batch skip, extractor.py:704-718)
- ``schema_ops``: the schema-evolution log (replay-stable casts)
- ``partitions``: per-partition lineage {pid: {rows, max_lsn, files}}
"""

from __future__ import annotations

import os

from .atomic import atomic_write_json, read_json


class CheckpointStore:
    def __init__(self, root: str):
        self.path = os.path.join(root, "checkpoint.json")

    def load(self) -> dict:
        state = read_json(self.path)
        if state is None:
            state = {
                "applied_lsn": -1,
                "applied_batch_ids": [],
                "schema_ops": [],
                "version": 0,
            }
        return state

    def save(self, state: dict) -> None:
        atomic_write_json(self.path, state)
