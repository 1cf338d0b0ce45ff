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


class RefreshGate:
    """Skip-if-fresh interval gate for reference-data loads.

    The reference refreshes its company/product reference tables only
    when the stored stamp is older than ``refresh_interval_hours``
    (``extractors/leaflink/extractor.py:958-982``). Here: a per-name
    last-refreshed stamp in an atomic JSON file; ``should_refresh``
    consults stamp age, ``mark_refreshed`` advances it after a verified
    load. ``now`` is injectable (epoch seconds) for determinism.
    """

    def __init__(self, root: str):
        self.path = os.path.join(root, "refresh_stamps.json")

    def _load(self) -> dict:
        return read_json(self.path) or {}

    def last_refreshed(self, name: str) -> float | None:
        return self._load().get(name)

    def should_refresh(self, name: str, interval_sec: float, now: float | None = None) -> bool:
        if now is None:
            import time

            now = time.time()
        stamp = self.last_refreshed(name)
        return stamp is None or (now - stamp) >= interval_sec

    def mark_refreshed(self, name: str, now: float | None = None) -> None:
        if now is None:
            import time

            now = time.time()
        stamps = self._load()
        stamps[name] = now
        atomic_write_json(self.path, stamps)

    def gate(self, interval_sec: float, now: float | None = None):
        """A ``Callable[[name], bool]`` suitable for ``TenantedCDC``'s
        per-tenant gate: True (run) only when the name's stamp is stale."""

        def _g(name: str) -> bool:
            return self.should_refresh(name, interval_sec, now=now)

        return _g
