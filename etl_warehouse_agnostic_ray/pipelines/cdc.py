"""The CDC apply pipeline: WAL-shaped change events -> lake upsert.

Dataflow (idiomatic Ray Data, streaming with backpressure):

    read_parquet(event slices, lsn > applied_lsn pushdown)
      -> map_batches(NormalizeEvents)            # zero-copy Arrow; per-batch
                                                 # LWW pre-compaction (combiner)
      -> groupby(_pid).map_groups(merge)         # the ONE shuffle — delta only
           each merge task reads + conforms its base partition file
           directly (base never shuffled; no Union barrier)
      -> manifest commit + checkpoint advance    # exactly-once (2PC)

Affected partitions come from footer stats / a column-pruned key scan;
untouched partitions carry forward by reference. At 10^10 events the
exchange moves only the pre-compacted delta — never the lake.

Lifecycle parity with the reference's flagship DAG (SURVEY.md §3.1):
extract -> load-first -> verify counts -> only-then advance state, with
a duplicate-batch guard (``extractors/repsly/extractor.py:704-718``) and
state restore on failure (nothing to restore here — state only moves in
the atomic commit).
"""

from __future__ import annotations

import os
import time
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..lake import LakeTable, partition_ids
from ..schemas import LSN_COL, OP_COL, PID_COL
from ..stages.lww import partition_merger
from ..stages.normalize import NormalizeEvents
from ..state.schema_registry import SchemaRegistry


class CDCEngine:
    def __init__(
        self,
        lake_root: str,
        num_partitions: int = 32,
        merge_concurrency: int | None = None,
        salt_threshold: int | None = 4_000_000,
        n_salts: int = 16,
        filesystem=None,
        delta_max_files: int = 8,
        delta_max_ratio: float = 0.5,
        precompact: bool = True,
    ):
        """``filesystem``: optional pyarrow.fs.FileSystem for the LAKE
        side (manifests + partition files) — see LakeTable. The change
        STREAM inputs stay plain paths/Datasets (point read_parquet at
        whatever filesystem holds them).

        ``delta_max_files`` / ``delta_max_ratio``: merge-on-read bounds
        (``apply(mode="delta")``). A partition accepts delta side files
        until it has ``delta_max_files`` of them or their accumulated
        rows exceed ``delta_max_ratio`` × its base live rows; past
        either bound the next apply folds that partition (full rewrite),
        keeping read amplification bounded by construction."""
        self.lake = LakeTable(lake_root, filesystem=filesystem)
        self.num_partitions = num_partitions
        self.merge_concurrency = merge_concurrency
        self.salt_threshold = salt_threshold
        self.n_salts = n_salts  # power of two (salt = lsn & (S-1))
        self.delta_max_files = delta_max_files
        self.delta_max_ratio = delta_max_ratio
        # the map-side LWW combiner (stages/normalize.py). True in
        # production; the off switch exists so skew benchmarks can
        # isolate what the combiner vs the salted merge contributes.
        self.precompact = precompact

    # ------------------------------------------------------------------
    def bootstrap(self, pages, batch_id: str = "bootstrap") -> dict:
        """Load the initial snapshot (a Dataset, Arrow table, or parquet
        path) as lake version 0. Unique-per-url is NOT assumed — the
        snapshot itself is LWW-compacted (base rows get _lsn = -1)."""
        import ray.data as rd

        if isinstance(pages, str):
            ds = rd.read_parquet(pages)
        elif isinstance(pages, pa.Table):
            ds = rd.from_arrow(pages)
        else:
            ds = pages
        P = self.num_partitions

        def prep(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            out = batch.append_column(LSN_COL, pa.array([-1] * n, pa.int64()))
            out = out.append_column(OP_COL, pa.array(["insert"] * n, pa.string()))
            pid = partition_ids(batch.column("url"), P)
            return out.append_column(PID_COL, pa.array(pid, pa.int64()))

        version = self.lake.current_version() + 1
        out_dir = self.lake.data_dir(version)
        stats = (
            ds.map_batches(prep, batch_format="pyarrow")
            .groupby(PID_COL, num_partitions=P)
            .map_groups(
                partition_merger(out_dir, filesystem=self.lake.fs),
                batch_format="pyarrow",
                **self._merge_opts(),
            )
            .take_all()
        )
        partitions = self._stats_to_partitions(stats)
        manifest = self.lake.commit(
            partitions,
            batch_id=batch_id,
            applied_lsn=-1,
            schema_ops=[],
            num_partitions=P,
            stats={"op": "bootstrap", "rows": sum(e["rows"] for e in partitions.values())},
            reset_batch_ids=True,
            expected_parent=version - 1,
        )
        return manifest

    # ------------------------------------------------------------------
    def apply(self, stream, batch_id: str | None = None, mode: str = "cow") -> dict:
        """Apply one batch of change events (a parquet path/dir or an
        Arrow table). Idempotent per batch_id; resumable: only events
        with lsn > applied_lsn are considered, so re-running after a
        crash (or feeding overlapping slices) converges.

        ``mode``:
        - ``"cow"`` (copy-on-write, default): every affected partition
          is fully rewritten (base ∪ delta compacted into a new file).
        - ``"delta"`` (merge-on-read): small per-partition deltas are
          LWW-compacted and written as side files WITHOUT touching the
          base — O(delta) write amplification instead of O(partition)
          per micro-batch. Readers fold base ∪ deltas per partition
          in-task (no shuffle); a partition past ``delta_max_files`` /
          ``delta_max_ratio`` is folded inline, and big batches
          (footer shortcut) or DDL-carrying batches fall back to cow
          for the affected partitions. LWW associativity guarantees
          both modes converge to the identical table.
        """
        import ray.data as rd

        t0 = time.perf_counter()
        phases: dict[str, float] = {}

        def _mark(name: str, since: float) -> float:
            now = time.perf_counter()
            phases[name] = round(now - since, 3)
            return now

        manifest = self.lake.load_manifest()
        if manifest is None:
            raise RuntimeError("bootstrap() the lake before apply()")
        # routing-hash contract check: merging deltas routed by a
        # different hash than the one that laid out the base partitions
        # would silently duplicate keys (see lake.ROUTING_HASH_VERSION)
        from ..lake import ROUTING_HASH_VERSION

        stamped = manifest.get("routing_hash")
        if stamped != ROUTING_HASH_VERSION:
            # an ABSENT stamp must also refuse: pre-stamp manifests are
            # exactly the lakes that may have been laid out by an older
            # hash — defaulting them to "current" would silently
            # duplicate keys, the failure this guard exists to prevent
            raise RuntimeError(
                f"lake was partitioned with routing hash {stamped!r} (None = "
                f"unstamped legacy manifest) but this engine routes with "
                f"{ROUTING_HASH_VERSION!r} — deltas would land in the wrong "
                "partitions. Re-bootstrap or full_refresh() the lake to "
                "re-route it."
            )
        # validate mode BEFORE any early return — an operator's typo'd
        # mode on a quiet/duplicate batch must fail loud, not be masked
        # by a {"skipped": True} result
        if mode == "auto":
            # the per-partition bounds already make "delta" self-tuning:
            # small batches append, big/overflowing partitions fold
            mode = "delta"
        if mode not in ("cow", "delta"):
            raise ValueError(
                f"apply mode must be 'cow', 'delta' or 'auto', got {mode!r}"
            )
        if batch_id is None:
            batch_id = f"batch-{uuid.uuid4().hex[:12]}"
        if batch_id in manifest["applied_batch_ids"]:
            return {"skipped": True, "reason": "duplicate batch_id", "batch_id": batch_id}
        applied_lsn = manifest["applied_lsn"]
        P = manifest["num_partitions"]

        # --- ONE footer pass per file (was three serial loops: schema
        # precheck, big-delta check, max-lsn) — fixed driver cost at
        # many-file micro-batches cut ~3x ---
        stream_files = self._resolve_stream_files(stream)
        footstats = self._scan_footers(stream_files) if stream_files is not None else None
        if stream_files is None and not isinstance(stream, pa.Table):
            # a Dataset stream (e.g. a transformed upstream pipeline) is
            # consumed by up to four passes below (schema scan, key
            # discovery, max-lsn, merge) — pin its blocks ONCE in the
            # object store instead of re-executing the upstream per pass.
            # Path streams don't need this: footers serve the first three.
            stream = stream.materialize()

        # --- stat-less file retirement. A WAL file without lsn footer
        # statistics can never pass the cursor test (its range is
        # unknown), so every drain re-includes it: without a ledger it
        # would be re-scanned forever AND its full num_rows would keep
        # arming the big-delta shortcut (forcing whole-table cow merges
        # on 10-row incremental batches). The manifest records
        # basename|size tokens of stat-less files drained by a COMMITTED
        # apply; later applies drop them from the footer set and the
        # read list. (A stat-less file whose events were all already
        # below the cursor at first sight never commits and is
        # re-scanned on each drain — rare, and merely wasteful.) ---
        # kept in INSERTION order: the commit below appends new tokens
        # so lake.py's [-BATCH_ID_WINDOW:] trim evicts oldest-first —
        # a lexicographic order would evict a just-drained token past
        # 10k entries and re-arm the big-delta shortcut on its re-scan
        drained_statless_list = list(manifest.get("statless_drained", ()))
        drained_statless = set(drained_statless_list)
        statless_tokens: list[str] = []
        if footstats is not None:
            kept = []
            for f in footstats:
                if f["lsn_max"] is None:
                    tok = f"{os.path.basename(f['path'])}|{os.path.getsize(f['path'])}"
                    if tok in drained_statless:
                        continue
                    statless_tokens.append(tok)
                kept.append(f)
            if len(kept) < len(footstats):
                footstats = kept
                if not footstats:
                    return {
                        "skipped": True,
                        "reason": "no new events",
                        "batch_id": batch_id,
                    }
                stream = [f["path"] for f in footstats]

        # --- schema-change ops: tiny pushdown read, driver-side registry ---
        reg = SchemaRegistry.from_dict(manifest["schema_ops"])
        schema_rows = self._read_schema_events(stream, applied_lsn, footstats)
        for r in schema_rows:
            reg.apply_event(r["lsn"], r["schema_kind"], r["schema_column"], r["schema_type"])
        schema_ops = reg.to_dict()
        t_ = _mark("schema_scan", t0)

        # --- affected partitions + per-pid row counts, from a CHEAP
        # column-pruned scan (url + lsn only — parquet reads just those
        # pages; the payload is untouched). Drives base-partition pruning
        # and skew detection without materializing the delta.
        # Shortcut: when footer statistics alone prove the delta is large
        # (≫ P partitions' worth of keys), every partition will be
        # touched — skip the scan and merge all partitions. Pruning only
        # pays off for small incremental batches. ---
        big_delta_rows: int | None = None
        if footstats is not None:
            approx = sum(
                f["num_rows"]
                for f in footstats
                if f["lsn_max"] is None or f["lsn_max"] > applied_lsn
            )
            if approx >= 512 * P:
                big_delta_rows = approx

        def pid_counts_of(batch: pa.Table) -> pa.Table:
            pid = partition_ids(batch.column("url"), P)
            import numpy as np

            vals, counts = np.unique(pid, return_counts=True)
            return pa.table(
                {"pid": pa.array(vals, pa.int64()), "n": pa.array(counts, pa.int64())}
            )

        if isinstance(stream, (str, list)):
            keys = rd.read_parquet(
                stream,
                columns=["url", "lsn", "op"],
                filter=pc.greater(pc.field("lsn"), pa.scalar(applied_lsn, pa.int64())),
            )
        elif isinstance(stream, pa.Table):
            keys = rd.from_arrow(stream.select(["url", "lsn", "op"]))
        else:
            keys = stream.select_columns(["url", "lsn", "op"])

        def prune_keys(b: pa.Table) -> pa.Table:
            m = pc.greater(b.column("lsn"), pa.scalar(applied_lsn, pa.int64()))
            if "op" in b.column_names:
                m = pc.and_(m, pc.not_equal(b.column("op"), pa.scalar("schema_change")))
            return b.filter(m).select(["url"])

        pid_counts: dict[int, int] = {}
        if big_delta_rows is None:
            for b in keys.map_batches(prune_keys, batch_format="pyarrow").map_batches(
                pid_counts_of, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow"):
                for p, n in zip(b.column("pid").to_pylist(), b.column("n").to_pylist()):
                    pid_counts[p] = pid_counts.get(p, 0) + n
            affected = set(pid_counts)
            delta_rows = sum(pid_counts.values())
        else:
            affected = set(range(P))
            delta_rows = big_delta_rows
        t_ = _mark("discovery", t_)
        if delta_rows == 0 and not schema_rows:
            return {"skipped": True, "reason": "no new events", "batch_id": batch_id}

        # --- normalized delta: LAZY — executes exactly once, streaming
        # straight into the merge shuffle (no object-store round-trip) ---
        if isinstance(stream, (str, list)):
            ev = rd.read_parquet(
                stream, filter=pc.greater(pc.field("lsn"), pa.scalar(applied_lsn, pa.int64()))
            )
        elif isinstance(stream, pa.Table):
            ev = rd.from_arrow(stream)
        else:
            ev = stream
        delta = ev.map_batches(
            NormalizeEvents(
                schema_ops, P, min_lsn=applied_lsn, precompact=self.precompact
            ),
            batch_format="pyarrow",
            batch_size=65536,  # bigger batches → better pre-compaction ratio
        )
        # high-water mark MUST come from the raw stream, not the
        # pre-compacted delta: LWW compaction can drop the max-lsn row
        # (an older-lsn, newer-warc_ts row wins its key), and a
        # regressed watermark would re-apply events forever
        max_event_lsn = self._max_lsn(stream, applied_lsn, footstats)
        if max_event_lsn is None:
            max_event_lsn = applied_lsn
        if schema_rows:
            max_event_lsn = max(max_event_lsn, max(r["lsn"] for r in schema_rows))
        t_ = _mark("max_lsn", t_)

        # --- base side: NOT shuffled. Lake partitions are one file per
        # pid, so each merge task reads its own base partition file
        # directly (shared storage) and conforms it in-task — only the
        # delta moves through the exchange (half the bytes, no Union
        # barrier; measured ~2× on the merge execution). ---
        version = self.lake.current_version() + 1
        out_dir = self.lake.data_dir(version)

        # --- merge-on-read partition selection. A partition takes the
        # delta path only while bounded: base must exist, the stack must
        # stay under delta_max_files, accumulated delta rows under
        # delta_max_ratio × base live rows — past either bound this very
        # apply folds it (cow). DDL batches and footer-shortcut big
        # deltas always fold: the former so schema epochs don't stack
        # unboundedly, the latter because a table-sized delta rewrites
        # everything anyway. ---
        delta_pids: set[int] = set()
        if mode == "delta" and big_delta_rows is None and not schema_rows:
            for pid in affected:
                ent = manifest["partitions"].get(str(pid))
                if ent is None:
                    continue  # fresh partition: its first file IS a base file
                dents = ent.get("deltas", [])
                acc = sum(d["rows"] for d in dents) + pid_counts.get(pid, 0)
                if (
                    len(dents) + 1 > self.delta_max_files
                    or acc > max(1, ent.get("live_rows", ent["rows"])) * self.delta_max_ratio
                ):
                    continue  # fold now — bounds read amplification
                delta_pids.add(pid)

        # cow partitions merge against base + any existing delta stack
        # (each file conformed separately — epochs may differ)
        base_file_map: dict[int, list[str]] = {
            int(pid): [os.path.join(self.lake.root, ent["file"])]
            + [os.path.join(self.lake.root, d["file"]) for d in ent.get("deltas", ())]
            for pid, ent in manifest["partitions"].items()
            if int(pid) in affected and int(pid) not in delta_pids
        }

        # --- skew mitigation: salted two-level merge for hot partitions.
        # A partition whose delta exceeds salt_threshold rows (a viral
        # url with ~10^4× median churn, FIXTURES.md F2) would serialize
        # its merge task. Because LWW is associative, we first compact
        # per (pid, salt=lsn mod S) — S-way parallel — then the final
        # per-pid merge sees at most S winners per url. ---
        # pid_counts is empty when the big-delta footer shortcut fired —
        # exactly the regime where a viral-url hot partition would
        # serialize its merge task. Fall back to the average-rows-per-
        # partition signal there so skew mitigation stays armed.
        hot = bool(
            delta_rows
            and self.salt_threshold
            and (
                (pid_counts and max(pid_counts.values()) > self.salt_threshold)
                or (
                    big_delta_rows is not None
                    and delta_rows / max(P, 1) > self.salt_threshold
                )
            )
        )
        if hot:
            S = self.n_salts

            def add_salt(b: pa.Table) -> pa.Table:
                salt = pc.cast(
                    pc.bit_wise_and(b.column(LSN_COL), pa.scalar(S - 1, pa.int64())),
                    pa.int64(),
                )
                return b.append_column("_salt", salt)

            def compact_group(g: pa.Table) -> pa.Table:
                from ..stages.lww import lww_compact_table

                return lww_compact_table(g.drop(["_salt"]))

            # partition count: P·S gives every (pid, salt) cell its own
            # exchange partition, but exchange constant costs grow with
            # partition count — 4·P keeps the hot partition S-way
            # parallel (S ≤ salts share cells) without a 1000-way sort
            delta = (
                delta.map_batches(add_salt, batch_format="pyarrow")
                .groupby([PID_COL, "_salt"], num_partitions=min(P * S, 4 * P, 4096))
                .map_groups(compact_group, batch_format="pyarrow")
            )

        # --- the delta shuffle + per-partition LWW merge-write ---
        if delta_rows:
            stats = (
                delta.groupby(PID_COL, num_partitions=P)
                .map_groups(
                    partition_merger(
                        out_dir,
                        base_file_map,
                        schema_ops,
                        filesystem=self.lake.fs,
                        delta_pids=delta_pids or None,
                    ),
                    batch_format="pyarrow",
                    **self._merge_opts(),
                )
                .take_all()
            )
        else:  # pure schema-change batch: metadata-only commit
            stats = []
        t_ = _mark("merge", t_)
        cur_schema_lsn = max((o["lsn"] for o in schema_ops), default=-1)
        new_partitions = self._stats_to_partitions(
            [r for r in stats if not r.get("is_delta")], schema_lsn=cur_schema_lsn
        )
        # merge-on-read appends: old entry + one more delta side file;
        # entry-level lineage (max_lsn) advances so resume/feed remain
        # exact without opening the delta files
        delta_appended: dict[int, dict] = {}
        for r in stats:
            if not r.get("is_delta"):
                continue
            pid = int(r["pid"])
            ent = dict(manifest["partitions"][str(pid)])
            dents = list(ent.get("deltas", []))
            dents.append(
                {
                    "file": os.path.join("data", r["file"]),
                    "rows": int(r["rows"]),
                    "live_rows": int(r.get("live_rows", r["rows"])),
                    "max_lsn": int(r["max_lsn"]),
                    "watermark_ts": str(r.get("watermark_ts")),
                    "bytes": int(r["bytes"]),
                    "schema_lsn": int(cur_schema_lsn),
                }
            )
            ent["deltas"] = dents
            ent["max_lsn"] = max(int(ent["max_lsn"]), int(r["max_lsn"]))
            # entry-level watermark = max event time across base + deltas
            # (ISO timestamp strings compare lexicographically; "None"
            # sorts above digits so guard it explicitly)
            old_wm, new_wm = ent.get("watermark_ts"), str(r.get("watermark_ts"))
            if new_wm != "None" and (old_wm in (None, "None") or new_wm > old_wm):
                ent["watermark_ts"] = new_wm
            delta_appended[pid] = ent

        # --- carry forward by reference: untouched partitions, plus any
        # "affected" pid that produced no merge group (possible under the
        # big-delta shortcut when a partition had no delta rows) ---
        partitions = {
            int(pid): ent
            for pid, ent in manifest["partitions"].items()
            if int(pid) not in affected
            or (int(pid) not in new_partitions and int(pid) not in delta_appended)
        }
        partitions.update(new_partitions)
        partitions.update(delta_appended)

        committed = self.lake.commit(
            partitions,
            batch_id=batch_id,
            applied_lsn=max_event_lsn,
            schema_ops=schema_ops,
            num_partitions=P,
            expected_parent=manifest["version"],
            statless_drained=(
                drained_statless_list + statless_tokens
                if statless_tokens
                else None
            ),
            stats={
                "events_applied": delta_rows,
                "schema_ops_applied": len(schema_rows),
                "partitions_rewritten": len(new_partitions),
                "partitions_delta_appended": len(delta_appended),
                "partitions_total": len(partitions),
                "wall_sec": round(time.perf_counter() - t0, 3),
            },
        )
        _mark("commit", t_)
        return {
            "skipped": False,
            "batch_id": batch_id,
            "version": committed["version"],
            "events_applied": delta_rows,
            "applied_lsn": max_event_lsn,
            "partitions_rewritten": len(new_partitions),
            "delta_appended": len(delta_appended),
            "phase_sec": phases,
            "wall_sec": round(time.perf_counter() - t0, 3),
        }

    # ------------------------------------------------------------------
    def apply_stream(
        self, stream_dir: str, max_files_per_batch: int = 8, mode: str = "cow"
    ) -> list[dict]:
        """Consume a WAL directory to completion in LSN-ordered
        micro-batches — the reference's scheduled extraction loop
        (cron cadence, SURVEY.md §1.1) collapsed into a drain: each
        micro-batch is one exactly-once apply, resumable between any
        two of them."""
        from ..sources.change_stream import ChangeStreamSource

        src = ChangeStreamSource(stream_dir)
        reports = []
        cursor = self.lake.load_manifest()["applied_lsn"] if self.lake.load_manifest() else -1
        for batch_id, files in src.batches(cursor=cursor, max_files=max_files_per_batch):
            reports.append(self.apply(files, batch_id=batch_id, mode=mode))
        return reports

    # ------------------------------------------------------------------
    def follow(
        self,
        stream_dir: str,
        poll_interval: float = 5.0,
        max_files_per_batch: int = 8,
        mode: str = "cow",
        max_polls: int | None = None,
        sleep=None,
    ):
        """Tail the WAL directory continuously — the binlog-follower
        daemon: drain whatever is present, sleep, re-list, drain again.
        Yields one report per applied micro-batch (a generator, so the
        caller decides when to stop; ``max_polls`` bounds the loop for
        scripted runs and tests, ``sleep`` is injectable for tests).
        Every yield point is a committed, resumable state — killing the
        follower anywhere loses nothing (the next ``follow`` or
        ``apply_stream`` resumes from applied_lsn). Files must be
        published ATOMICALLY into the directory (write elsewhere +
        rename), the standard WAL-shipping contract; a half-written
        file would fail its footer read loudly, not corrupt state."""
        import time as _time

        sleep = sleep or _time.sleep
        polls = 0
        while True:
            for rep in self.apply_stream(
                stream_dir, max_files_per_batch=max_files_per_batch, mode=mode
            ):
                yield rep
            polls += 1
            if max_polls is not None and polls >= max_polls:
                return
            sleep(poll_interval)

    # ------------------------------------------------------------------
    def history(self, limit: int | None = None) -> list[dict]:
        """The commit log: per-version operational metrics walked from
        the manifest chain (version, batch, applied_lsn, events applied,
        partitions rewritten / delta-appended, wall seconds) — the
        north-rule 'per-partition lineage + metrics' surfaced without
        reading any data file. Newest first."""
        cur = self.lake.current_version()
        out = []
        v = cur
        while v >= 0 and (limit is None or len(out) < limit):
            m = self.lake.load_manifest(v)
            if m is None:
                break
            st = m.get("stats", {})
            out.append(
                {
                    "version": m["version"],
                    "batch_id": m["batch_id"],
                    "applied_lsn": m["applied_lsn"],
                    "op": st.get("op", "apply"),
                    "events_applied": st.get("events_applied"),
                    "partitions_rewritten": st.get("partitions_rewritten"),
                    "partitions_delta_appended": st.get("partitions_delta_appended"),
                    "wall_sec": st.get("wall_sec"),
                    "schema_ops": len(m.get("schema_ops", [])),
                }
            )
            v = m.get("parent", v - 1)
        return out

    # ------------------------------------------------------------------
    def validate(
        self,
        critical: list[str] | None = None,
        fresh_after_us: int | None = None,
        max_null_rate: float = 0.5,
        min_completeness: float | None = 0.8,
    ) -> dict:
        """Post-load integrity report over the logical table — the
        reference's validation task as a library call (row counts,
        duplicate keys, null rates on critical columns, freshness;
        ``airflow/dags/repsly_dag.py:39-270``) plus the manifest
        partition-health stats. ``min_completeness`` gates the
        silver/raw layer ratio (live rows ÷ physical rows — the
        reference's ≥ 80 % health check,
        ``airflow/dags/repsly_dag.py:1352-1494``)."""
        from ..stages.validate import validate_dataset

        report = validate_dataset(
            self.table(),
            key="url",
            critical=critical or ["text"],
            fresh_col="warc_ts" if fresh_after_us is not None else None,
            fresh_after_us=fresh_after_us,
            max_null_rate=max_null_rate,
        )
        report["lake"] = self.lake.stats()
        ratio = report["lake"].get("completeness_ratio")
        if min_completeness is not None and ratio is not None and ratio < min_completeness:
            report["issues"].append(
                f"completeness {ratio:.2%} below {min_completeness:.0%} "
                "(tombstone-heavy table — compact or investigate delete volume)"
            )
            report["passed"] = False
        return report

    # ------------------------------------------------------------------
    def table(self, include_lineage: bool = False, columns: list[str] | None = None):
        return self.lake.dataset(include_lineage=include_lineage, columns=columns)

    def to_arrow(
        self, include_lineage: bool = False, columns: list[str] | None = None
    ) -> pa.Table:
        return self.lake.to_arrow(include_lineage=include_lineage, columns=columns)

    # ------------------------------------------------------------------
    def _merge_opts(self) -> dict:
        opts = {}
        if self.merge_concurrency:
            opts["concurrency"] = self.merge_concurrency
        return opts

    @staticmethod
    def _stats_to_partitions(stats_rows: list[dict], schema_lsn: int = -1) -> dict[int, dict]:
        out = {}
        for r in stats_rows:
            out[int(r["pid"])] = {
                "file": os.path.join("data", r["file"]),
                "rows": int(r["rows"]),
                "live_rows": int(r.get("live_rows", r["rows"])),
                "max_lsn": int(r["max_lsn"]),
                "watermark_ts": str(r.get("watermark_ts")),
                "bytes": int(r["bytes"]),
                "schema_lsn": int(schema_lsn),
            }
        return out

    @staticmethod
    def _resolve_stream_files(stream) -> list[str] | None:
        """File list for a path-like stream; None for Table/Dataset."""
        if isinstance(stream, list):
            return list(stream)
        if isinstance(stream, str):
            if os.path.isdir(stream):
                return [
                    os.path.join(stream, f)
                    for f in sorted(os.listdir(stream))
                    if f.endswith(".parquet")
                ]
            return [stream]
        return None

    @staticmethod
    def _scan_footers(files: list[str]) -> list[dict]:
        """ONE parquet-footer read per file, shared by the schema-event
        precheck, the big-delta shortcut and the max-lsn HWM (previously
        three separate serial loops — the dominant fixed driver cost on
        many-file micro-batches at low CPU counts).

        Per file: num_rows, exact lsn min/max from row-group statistics
        (None when stats are absent → callers treat as "unknown, must
        read"), and whether any row group can contain schema_change rows
        (schema_kind not all-null by its null-count statistic)."""
        import pyarrow.parquet as _pq

        out = []
        for fpath in files:
            md = _pq.read_metadata(fpath)
            sch = md.schema.to_arrow_schema()
            lsn_idx = sch.get_field_index("lsn")
            sk_idx = sch.get_field_index("schema_kind") if "schema_kind" in sch.names else -1
            lo = hi = None
            schema_possible = False
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(lsn_idx).statistics
                if st is not None and st.has_min_max:
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if sk_idx >= 0 and not schema_possible:
                    sst = md.row_group(rg).column(sk_idx).statistics
                    if (
                        sst is None
                        or sst.null_count is None
                        or sst.null_count < md.row_group(rg).num_rows
                    ):
                        schema_possible = True
            out.append(
                {
                    "path": fpath,
                    "num_rows": md.num_rows,
                    "lsn_min": lo,
                    "lsn_max": hi,
                    "schema_possible": schema_possible if sk_idx >= 0 else False,
                }
            )
        return out

    @staticmethod
    def _max_lsn(stream, applied_lsn: int, footstats: list[dict] | None = None) -> int | None:
        """Max lsn in the stream beyond the HWM. Footer statistics are
        EXACT for integer columns, so for path streams this needs no
        data pages at all (stat-less files fall back to a column-pruned
        scan of just those files)."""
        if isinstance(stream, pa.Table):
            m = pc.max(stream.column("lsn")).as_py()
            return m if m is not None and m > applied_lsn else None
        if footstats is None and isinstance(stream, (str, list)):
            footstats = CDCEngine._scan_footers(CDCEngine._resolve_stream_files(stream))
        if footstats is not None:
            best = None
            statless = []
            for f in footstats:
                if f["lsn_max"] is None:
                    if f["num_rows"]:
                        statless.append(f["path"])
                elif best is None or f["lsn_max"] > best:
                    best = f["lsn_max"]
            if statless:  # must-read files without stats
                dset = pads.dataset(statless, format="parquet")
                for frag_batch in dset.to_batches(columns=["lsn"]):
                    if frag_batch.num_rows:
                        # pc.max over an all-null lsn batch returns None —
                        # guard before comparing, else None > int raises
                        m = pc.max(frag_batch.column("lsn")).as_py()
                        if m is not None and (best is None or m > best):
                            best = m
            return best if best is not None and best > applied_lsn else None
        m = stream.max("lsn")  # ray Dataset (column-pruned projection)
        return int(m) if m is not None and m > applied_lsn else None

    def full_refresh(self, pages, batch_id: str | None = None) -> dict:
        """Drop-and-reload semantics (the reference's full-refresh sink,
        ``extractors/google_sheets/extractor.py:370-377``): write a brand
        new snapshot version and flip the pointer — the previous version
        stays readable until ``vacuum`` (safe, atomic overwrite)."""
        import ray.data as rd

        if batch_id is None:
            batch_id = f"refresh-{uuid.uuid4().hex[:12]}"
        if isinstance(pages, str):
            ds = rd.read_parquet(pages)
        elif isinstance(pages, pa.Table):
            ds = rd.from_arrow(pages)
        else:
            ds = pages
        P = self.num_partitions

        def prep(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            out = batch.append_column(LSN_COL, pa.array([-1] * n, pa.int64()))
            out = out.append_column(OP_COL, pa.array(["insert"] * n, pa.string()))
            pid = partition_ids(batch.column("url"), P)
            return out.append_column(PID_COL, pa.array(pid, pa.int64()))

        version = self.lake.current_version() + 1
        out_dir = self.lake.data_dir(version)
        stats = (
            ds.map_batches(prep, batch_format="pyarrow")
            .groupby(PID_COL, num_partitions=P)
            .map_groups(
                partition_merger(out_dir, filesystem=self.lake.fs),
                batch_format="pyarrow",
                **self._merge_opts(),
            )
            .take_all()
        )
        return self.lake.commit(
            self._stats_to_partitions(stats),
            batch_id=batch_id,
            applied_lsn=-1,  # fresh snapshot: watermark resets
            schema_ops=[],
            num_partitions=P,
            stats={"op": "full_refresh"},
            reset_batch_ids=True,
            expected_parent=version - 1,
        )

    def changes_since(
        self,
        version: int,
        include_lineage: bool = False,
        columns: list[str] | None = None,
    ):
        """Change feed: the current state of every partition REWRITTEN
        since ``version`` — a downstream consumer incrementally refreshes
        by replacing exactly these partitions (manifest diff picks them;
        only their files are read, and ``columns`` prunes the read to
        the consumer's projection). Returns a conformed Dataset; empty
        typed Dataset when nothing changed."""
        changed = self.lake.changed_partition_ids(version)
        # empty feed: lake.dataset() with a no-match pids filter returns
        # the typed empty Dataset, with the SAME lineage columns the
        # non-empty path carries — a quiet-cycle consumer projecting
        # ["url", "_lsn"] must not hit a schema that dropped them
        return self.lake.dataset(
            include_lineage=include_lineage, pids=changed, columns=columns
        )

    def compact(self, batch_id: str | None = None) -> dict:
        """Physically rewrite partitions whose files predate the current
        schema epoch OR carry merge-on-read delta side files, conforming
        them to the latest logical schema and folding base ∪ deltas into
        one file per partition (the engine otherwise resolves both
        lazily on read and only rewrites a partition when a delta next
        touches it). ClickHouse ``OPTIMIZE`` analogue; a no-op commit is
        skipped. LWW-idempotent: re-compacting an already-compacted
        partition is byte-stable."""
        manifest = self.lake.load_manifest()
        if manifest is None:
            raise RuntimeError("bootstrap() the lake before compact()")
        cur_schema_lsn = max((o["lsn"] for o in manifest["schema_ops"]), default=-1)
        stale = {
            int(pid): ent
            for pid, ent in manifest["partitions"].items()
            if int(ent.get("schema_lsn", -1)) < cur_schema_lsn or ent.get("deltas")
        }
        if not stale:
            return {"skipped": True, "reason": "no stale-epoch or delta-bearing partitions"}
        if batch_id is None:
            batch_id = f"compact-{uuid.uuid4().hex[:12]}"
        import ray.data as rd

        schema_ops = manifest["schema_ops"]
        # group stale files by THEIR epoch: files from different epochs
        # have different physical schemas and must not share one
        # read_parquet (column mis-unification), same rule as
        # LakeTable.dataset. Delta side files carry their own epoch.
        by_epoch: dict[int, list[str]] = {}
        for ent in stale.values():
            by_epoch.setdefault(int(ent.get("schema_lsn", -1)), []).append(
                os.path.join(self.lake.root, ent["file"])
            )
            for dent in ent.get("deltas", ()):
                by_epoch.setdefault(int(dent.get("schema_lsn", -1)), []).append(
                    os.path.join(self.lake.root, dent["file"])
                )

        def conform_keep_lineage(batch: pa.Table) -> pa.Table:
            reg = SchemaRegistry.from_dict(schema_ops)
            lineage = {
                c: batch.column(c)
                for c in (LSN_COL, OP_COL, PID_COL)
                if c in batch.column_names
            }
            out = reg.conform(batch.drop(list(lineage)))
            for c, col in lineage.items():
                out = out.append_column(c, col)
            return out

        version = self.lake.current_version() + 1
        out_dir = self.lake.data_dir(version)
        ds = None
        for _, epoch_files in sorted(by_epoch.items()):
            d = rd.read_parquet(epoch_files, filesystem=self.lake.fs).map_batches(
                conform_keep_lineage, batch_format="pyarrow"
            )
            ds = d if ds is None else ds.union(d)
        stats = (
            ds.groupby(PID_COL, num_partitions=max(1, len(stale)))
            .map_groups(
                partition_merger(out_dir, filesystem=self.lake.fs),
                batch_format="pyarrow",
                **self._merge_opts(),
            )
            .take_all()
        )
        new_parts = self._stats_to_partitions(stats, schema_lsn=cur_schema_lsn)
        # preserve each rewritten partition's recorded max_lsn: compaction
        # must not advance lineage (no new events were applied)
        for pid, ent in new_parts.items():
            ent["max_lsn"] = stale[pid]["max_lsn"]
        partitions = {
            int(pid): ent
            for pid, ent in manifest["partitions"].items()
            if int(pid) not in new_parts
        }
        partitions.update(new_parts)
        self.lake.commit(
            partitions,
            batch_id=batch_id,
            applied_lsn=manifest["applied_lsn"],
            schema_ops=schema_ops,
            num_partitions=manifest["num_partitions"],
            stats={"op": "compact", "partitions_rewritten": len(new_parts)},
            expected_parent=manifest["version"],
        )
        return {
            "skipped": False,
            "batch_id": batch_id,
            "partitions_rewritten": len(new_parts),
        }

    def init_empty(self, batch_id: str = "init") -> dict:
        """Start a lake with no snapshot (pure change-stream ingest)."""
        return self.lake.commit(
            {},
            batch_id=batch_id,
            applied_lsn=-1,
            schema_ops=[],
            num_partitions=self.num_partitions,
            stats={"op": "init_empty"},
            reset_batch_ids=True,
        )

    @staticmethod
    def _read_schema_events(
        stream, applied_lsn: int, footstats: list[dict] | None = None
    ) -> list[dict]:
        """Schema-change rows are rare (~0.2%); read them with parquet
        predicate pushdown (row-group pruning) — never a full scan on the
        driver."""
        if not isinstance(stream, (str, list, pa.Table)):
            # a ray.data.Dataset: tiny filtered projection
            if "schema_kind" not in stream.schema().names:
                return []
            sel = stream.select_columns(
                ["lsn", "op", "schema_kind", "schema_column", "schema_type"]
            ).map_batches(
                lambda t: t.filter(
                    pc.and_(
                        pc.equal(t.column("op"), pa.scalar("schema_change")),
                        pc.greater(t.column("lsn"), pa.scalar(applied_lsn, pa.int64())),
                    )
                ).drop(["op"]),
                batch_format="pyarrow",
            )
            rows = sel.take_all()
            rows.sort(key=lambda r: r["lsn"])
            return rows
        if isinstance(stream, pa.Table):
            if "schema_kind" not in stream.column_names:
                return []
            t = stream.filter(
                pc.and_(
                    pc.equal(stream.column("op"), pa.scalar("schema_change")),
                    pc.greater(stream.column("lsn"), pa.scalar(applied_lsn, pa.int64())),
                )
            )
        else:
            # footer-stats precheck: if schema_kind is null in every row
            # group (the overwhelmingly common no-DDL batch), skip the
            # column read entirely — pure metadata, shared with the
            # apply() footer pass via ``footstats``
            if footstats is None:
                footstats = CDCEngine._scan_footers(
                    CDCEngine._resolve_stream_files(stream)
                )
            if not any(f["schema_possible"] for f in footstats):
                return []
            dset = pads.dataset(stream, format="parquet")
            t = dset.to_table(
                columns=["lsn", "schema_kind", "schema_column", "schema_type"],
                filter=(pads.field("op") == "schema_change")
                & (pads.field("lsn") > applied_lsn),
            )
        rows = t.to_pylist()
        rows.sort(key=lambda r: r["lsn"])
        return rows
