"""Multi-tenant fan-out — one lake + checkpoint namespace per tenant.

The reference's LeafLink DAG loops over companies, deep-copying config
with per-company schemas and watermark files and cron-gating each
(``airflow/dags/leaflink_dag.py:41-91``; ``config/sources/leaflink.yml:
143-155``). Here each tenant gets an independent ``CDCEngine`` rooted at
``root/<tenant>/`` — separate manifests, applied-LSN checkpoints and
partition spaces — driven from one driver loop, optionally gated per
tenant.
"""

from __future__ import annotations

import os
from typing import Callable

from .cdc import CDCEngine


class TenantedCDC:
    def __init__(
        self,
        root: str,
        tenants: list[str],
        num_partitions: int = 32,
        gate: Callable[[str], bool] | None = None,
    ):
        self.root = root
        self.gate = gate or (lambda _t: True)
        self.engines = {
            t: CDCEngine(os.path.join(root, t), num_partitions=num_partitions)
            for t in tenants
        }

    def engine(self, tenant: str) -> CDCEngine:
        return self.engines[tenant]

    def bootstrap(self, snapshots: dict[str, object]) -> dict[str, dict]:
        return {
            t: self.engines[t].bootstrap(snap, batch_id=f"{t}-bootstrap")
            for t, snap in snapshots.items()
        }

    def apply(self, streams: dict[str, object], batch_id: str) -> dict[str, dict]:
        """Apply one batch per tenant; results are tenant-prefixed like
        the reference's region-prefixed XCom results. A gated-off tenant
        is skipped (cron gate analogue)."""
        out = {}
        for t, stream in streams.items():
            if not self.gate(t):
                out[t] = {"skipped": True, "reason": "gated"}
                continue
            out[t] = self.engines[t].apply(stream, batch_id=f"{t}-{batch_id}")
        return out
