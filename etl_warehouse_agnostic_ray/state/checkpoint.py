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

    # ---- cron-expression gating ----
    def should_refresh_cron(self, name: str, expr: str, now: float | None = None) -> bool:
        """Cron-cadence gate (the reference schedules each tenant DAG on
        a cron expression, ``airflow/dags/leaflink_dag.py:41-44``): run
        when a scheduled fire time has elapsed since the last refresh
        stamp. Never-refreshed names always run."""
        if now is None:
            import time

            now = time.time()
        stamp = self.last_refreshed(name)
        if stamp is None:
            return True
        return cron_next(expr, stamp) <= now

    def cron_gate(self, expr: str, now: float | None = None):
        def _g(name: str) -> bool:
            return self.should_refresh_cron(name, expr, now=now)

        return _g


# ---------------------------------------------------------------- cron
# Minimal 5-field cron (minute hour day-of-month month day-of-week), UTC.
# Supported syntax: ``*``, single values, ranges ``a-b``, steps ``*/n``
# and ``a-b/n``, comma lists; dow 0-7 with 7 ≡ Sunday ≡ 0. Standard
# dom/dow OR rule: when BOTH are restricted, a day matches if either
# does. Pure Python — no croniter in this container.

_CRON_BOUNDS = ((0, 59), (0, 23), (1, 31), (1, 12), (0, 6))


def _parse_cron_field(spec: str, lo: int, hi: int, dow: bool = False) -> set[int]:
    vals: set[int] = set()
    for part in spec.split(","):
        if part == "":
            # an empty comma-list element is a typo ("30, 2 * * *") —
            # treating it as '*' would silently match everything
            raise ValueError(f"cron field {spec!r} has an empty list element")
        step = 1
        if "/" in part:
            part, s = part.split("/", 1)
            step = int(s)
            if step < 1:
                raise ValueError(f"cron step must be >= 1, got {step}")
        if part == "*":
            a, b = lo, hi
        elif "-" in part:
            a, b = (int(x) for x in part.split("-", 1))
        else:
            a = int(part)
            b = hi if step > 1 else a  # "5/15" = 5,20,35,50
        # dow allows 7 (= Sunday = 0); every field validates bounds and
        # ordering so typos raise at parse time, never silently match
        field_hi = 7 if dow else hi
        if not (lo <= a <= b <= field_hi):
            raise ValueError(f"cron field {spec!r} out of range [{lo},{field_hi}]")
        if dow:
            vals.update(v % 7 for v in range(a, b + 1, step))
        else:
            vals.update(range(a, b + 1, step))
    return vals


def parse_cron(expr: str):
    """-> (minutes, hours, dom, months, dow, dom_restricted, dow_restricted)"""
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"cron expression needs 5 fields, got {expr!r}")
    sets = []
    for i, (f, (lo, hi)) in enumerate(zip(fields, _CRON_BOUNDS)):
        sets.append(_parse_cron_field(f, lo, hi, dow=(i == 4)))
    dom_restricted = fields[2] != "*"
    dow_restricted = fields[4] != "*"
    return (*sets, dom_restricted, dow_restricted)


def cron_next(expr: str, after: float) -> float:
    """Epoch seconds (UTC) of the first cron fire STRICTLY after
    ``after``. Day-level skipping keeps the scan bounded (~4 years of
    day steps worst case, e.g. a Feb-29 schedule)."""
    import datetime as _dt

    minutes, hours, dom, months, dow, dom_r, dow_r = parse_cron(expr)
    t = _dt.datetime.fromtimestamp(after, tz=_dt.timezone.utc).replace(
        second=0, microsecond=0
    ) + _dt.timedelta(minutes=1)
    limit = t + _dt.timedelta(days=366 * 5)
    while t < limit:
        if t.month not in months:
            # jump to the 1st of the next month
            t = (t.replace(day=1, hour=0, minute=0) + _dt.timedelta(days=32)).replace(
                day=1
            )
            continue
        cron_dow = (t.weekday() + 1) % 7  # cron: Sunday = 0
        if dom_r and dow_r:
            day_ok = t.day in dom or cron_dow in dow
        else:
            day_ok = t.day in dom and cron_dow in dow
        if not day_ok:
            t = t.replace(hour=0, minute=0) + _dt.timedelta(days=1)
            continue
        if t.hour not in hours:
            t = t.replace(minute=0) + _dt.timedelta(hours=1)
            continue
        if t.minute not in minutes:
            t += _dt.timedelta(minutes=1)
            continue
        return t.timestamp()
    raise ValueError(f"cron {expr!r}: no fire time within 5 years")
