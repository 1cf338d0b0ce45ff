"""Versioned, hash-partitioned Parquet lake table with exactly-once commits.

Layout (all paths under a single root; local FS or any fuse/NFS mount —
on a real cluster this is shared storage):

    root/
      CURRENT                      # {"version": N} — atomic pointer flip
      manifests/v000012.json       # write-ahead manifest (source of truth)
      data/v000012/part-00007.parquet

A commit is: (1) merge tasks write the new partition files under the
next version's data dir (tmp name + rename inside the task), (2) the
driver writes the manifest listing every live partition file + counts +
per-partition max LSN, fsynced + checksum-verified + renamed, (3) the
CURRENT pointer flips. A crash before (3) leaves the previous version
intact; orphan files are GC'd by ``vacuum``. This is the Ray-native
equivalent of the reference's verified idempotent load — insert, verify
count, only then advance state, restore on failure
(``extractors/repsly/extractor.py:668-759, 1441-1488``).

Partitions unaffected by a batch are carried forward by reference (their
file entries point into older version dirs) — at 100 TB a CDC batch
rewrites only the key ranges it touches, never the whole table.

The versioned-manifest + pointer-flip protocol follows the published
lakehouse transaction pattern (Delta Lake, VLDB 2020: write-ahead log
of file adds/removes + an atomically advanced version pointer),
specialized to hash-partitioned single-writer CDC.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .schemas import LSN_COL, OP_COL, PID_COL
from .state.atomic import atomic_write_json, read_json
from .state.schema_registry import SchemaRegistry

# Deterministic, process-independent 64-bit ROUTING hash over the Arrow
# string buffer. Partition routing needs O(rows) work and uniform
# spread — not collision-resistance: it samples a bounded window of each
# key (first 8 + middle 8 + last 8 bytes + length) with masked numpy
# gathers, then a splitmix64 finalizer. Keys equal on all four samples
# collide, which merely co-locates them in one partition (no
# correctness impact). A full per-byte hash here costs O(total_bytes)
# intermediates per batch and measurably throttles the normalize stage
# on long-url corpora; content identity uses ops/texthash.poly64
# instead. Zero-copy Arrow — no pandas object round-trip.

_SAMPLE_BYTES = 8

# Partition routing is a PERSISTED-FORMAT contract: every committed
# manifest records which routing hash laid out its partitions. If the
# hash function ever changes (as it did between rounds 1 and 2), a lake
# bootstrapped under the old hash would route new deltas to different
# pids — LWW merge would never see the base row and the table would
# silently accumulate duplicate keys. Bump this id on ANY change to
# partition_ids(); apply() refuses to merge into a lake stamped with a
# different id (the fix is a full_refresh / re-bootstrap, which re-routes).
ROUTING_HASH_VERSION = "sample8-splitmix64-v2"

# duplicate-batch guard window: manifests keep only the most recent ids
# (the applied-LSN high-water mark backstops anything older — see
# commit()); bounds per-manifest bytes for long-running followers
BATCH_ID_WINDOW = 10_000


def partition_ids(urls, num_partitions: int):
    """Vectorized url -> partition id in [0, num_partitions).

    ``urls`` may be an Arrow (Chunked)Array or any sequence of strings.
    """
    from .ops.texthash import string_bytes

    if not isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = pa.array(list(urls), pa.large_string())
    data, offsets = string_bytes(urls)
    starts, ends = offsets[:-1], offsets[1:]
    lens = (ends - starts).astype(np.int64)
    n = len(lens)
    mids = starts + (lens // 2)
    pref = np.zeros(n, dtype=np.uint64)
    midw = np.zeros(n, dtype=np.uint64)
    suff = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(_SAMPLE_BYTES):
            m = lens > i
            pref[m] = (pref[m] << np.uint64(8)) | data[starts[m] + i]
            suff[m] = (suff[m] << np.uint64(8)) | data[ends[m] - 1 - i]
            m2 = mids + i < ends
            midw[m2] = (midw[m2] << np.uint64(8)) | data[mids[m2] + i]
        h = (
            pref * np.uint64(0x9E3779B97F4A7C15)
            ^ midw * np.uint64(0xC2B2AE3D27D4EB4F)
            ^ suff * np.uint64(0x165667B19E3779F9)
            ^ lens.astype(np.uint64) * np.uint64(0x27D4EB2F165667C5)
        )
    from .ops.texthash import splitmix64

    # finalizer for uniform bucket spread (shared definition; its
    # constants are part of ROUTING_HASH_VERSION's persisted contract)
    h = splitmix64(h)
    with np.errstate(over="ignore"):
        return (h % np.uint64(num_partitions)).astype("int64")


def _read_compact_partition(
    root: str,
    rel_files: list[str],
    schema_ops: list[dict],
    fs=None,
    compact: bool = True,
    url_filter: str | None = None,
    columns: list[str] | None = None,
    file_lsns: list[int] | None = None,
) -> pa.Table:
    """Read one partition's base file + merge-on-read delta files and
    LWW-compact them to the winning row per url (tombstones retained).
    Files are conformed ONE AT A TIME (they may come from different
    schema epochs); lineage columns survive for the compaction order.
    ``url_filter`` pushes an equality predicate into each parquet read
    (row-group pruning via column statistics). ``columns`` pushes a
    PROJECTION into each read (``file_lsns`` gives each file's schema
    epoch so renamed columns resolve to their wire name) — only those
    pages leave storage; the LWW keys (url, warc_ts) are added when
    compacting."""
    import pyarrow.parquet as pq

    from .stages.lww import lww_compact_table

    reg = SchemaRegistry.from_dict(schema_ops)
    needed = None
    if columns is not None:
        needed = list(
            dict.fromkeys((["url", "warc_ts"] if compact else []) + list(columns))
        )
    tables = []
    for i, rel in enumerate(rel_files):
        kw = {}
        if url_filter is not None:
            kw["filters"] = [("url", "=", url_filter)]
        if needed is not None:
            epoch = file_lsns[i] if file_lsns is not None else -1
            kw["columns"] = reg.physical_columns(needed, epoch) + [
                LSN_COL,
                OP_COL,
                PID_COL,
            ]
        t = pq.read_table(os.path.join(root, rel), filesystem=fs, **kw)
        lineage = {
            c: t.column(c) for c in (LSN_COL, OP_COL, PID_COL) if c in t.column_names
        }
        conf = reg.conform(t.drop(list(lineage)), columns=needed)
        for c, col in lineage.items():
            conf = conf.append_column(c, col)
        tables.append(conf)
    merged = pa.concat_tables(tables)
    return lww_compact_table(merged) if compact else merged


def _logical_view(
    t: pa.Table,
    reg: SchemaRegistry,
    include_lineage: bool,
    columns: list[str] | None = None,
) -> pa.Table:
    """Compacted physical rows -> logical table: tombstones out, lineage
    columns dropped (or appended when requested)."""
    import pyarrow.compute as pc

    if OP_COL in t.column_names:
        t = t.filter(pc.not_equal(t.column(OP_COL), pa.scalar("delete")))
    extras = [c for c in (LSN_COL, PID_COL, OP_COL) if c in t.column_names]
    out = reg.conform(t.drop(extras), columns=columns)
    if include_lineage:
        for c in extras:
            out = out.append_column(c, t.column(c))
    return out


class _MorPartitionRead:
    """map_batches callable resolving merge-on-read partitions: each
    input row names one partition's file stack (base + deltas,
    newline-joined rel paths); the task reads them directly from shared
    storage — no shuffle — compacts, and emits the logical rows."""

    def __init__(
        self,
        root: str,
        schema_ops: list[dict],
        fs,
        include_lineage: bool,
        columns: list[str] | None = None,
    ):
        self.root = root
        self.schema_ops = schema_ops
        self.fs = fs
        self.include_lineage = include_lineage
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        reg = SchemaRegistry.from_dict(self.schema_ops)
        out = []
        for stack in batch.column("files").to_pylist():
            rels, epochs = [], []
            for line in stack.split("\n"):
                rel, _, ep = line.partition("|")
                rels.append(rel)
                epochs.append(int(ep) if ep else -1)
            t = _read_compact_partition(
                self.root,
                rels,
                self.schema_ops,
                self.fs,
                columns=self.columns,
                file_lsns=epochs,
            )
            out.append(_logical_view(t, reg, self.include_lineage, self.columns))
        if not out:
            empty = reg.conform(pa.table({}), columns=self.columns)
            if self.include_lineage:
                for c, typ in (
                    (LSN_COL, pa.int64()),
                    (PID_COL, pa.int64()),
                    (OP_COL, pa.string()),
                ):
                    empty = empty.append_column(c, pa.array([], typ))
            return empty
        return pa.concat_tables(out)


class LakeTable:
    def __init__(self, root: str, filesystem=None):
        """``filesystem``: an optional ``pyarrow.fs.FileSystem`` — the
        reference's warehouse-plugin seam (``config/warehouse_config.py:
        25-45``) re-expressed storage-side: the same lake code runs on
        local disk (default, with atomic rename + fsync), NFS/Fuse
        mounts, or any pyarrow filesystem (S3/GCS/HDFS) by injection.
        The object is pickled into merge tasks, so it must be a plain
        pyarrow filesystem (they serialize cleanly)."""
        self.root = root
        self.fs = filesystem
        if filesystem is None:
            os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
            os.makedirs(os.path.join(root, "data"), exist_ok=True)
        else:
            filesystem.create_dir(os.path.join(root, "manifests"), recursive=True)
            filesystem.create_dir(os.path.join(root, "data"), recursive=True)

    # ---- pointers / manifests ----
    def current_version(self) -> int:
        cur = read_json(os.path.join(self.root, "CURRENT"), fs=self.fs)
        return -1 if cur is None else int(cur["version"])

    def manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "manifests", f"v{version:06d}.json")

    def load_manifest(self, version: int | None = None) -> dict | None:
        v = self.current_version() if version is None else version
        if v < 0:
            return None
        return read_json(self.manifest_path(v), fs=self.fs)

    def data_dir(self, version: int) -> str:
        return os.path.join(self.root, "data", f"v{version:06d}")

    # ---- commit (2PC steps 2+3; step 1 = tasks wrote the files) ----
    def commit(
        self,
        partitions: dict[int, dict],
        batch_id: str,
        applied_lsn: int,
        schema_ops: list[dict],
        num_partitions: int,
        stats: dict | None = None,
        reset_batch_ids: bool = False,
        expected_parent: int | None = None,
        verify_all: bool = False,
        statless_drained: list[str] | None = None,
    ) -> dict:
        """``reset_batch_ids=True`` starts a fresh duplicate-batch
        namespace — used by watermark-resetting commits (bootstrap /
        full_refresh): after a refresh the lake no longer contains the
        old batches' events, so re-applying a previously-used batch_id
        must NOT be skipped as a duplicate.

        ``expected_parent``: optimistic-concurrency check (the lakehouse
        pattern) — the version the writer planned its batch against. If
        another writer committed meanwhile, raise instead of silently
        building on (and clobbering the lineage of) state the merge
        never saw. The engine is single-writer by design; this turns an
        operator error into a loud ConflictError-style failure."""
        prev = self.load_manifest()
        version = self.current_version() + 1
        if expected_parent is not None and version - 1 != expected_parent:
            raise RuntimeError(
                f"commit conflict: planned against version {expected_parent} "
                f"but current is {version - 1} — another writer committed; "
                "re-read the lake and re-apply"
            )
        applied_batch_ids = (
            [] if reset_batch_ids else (list(prev["applied_batch_ids"]) if prev else [])
        )
        if batch_id in set(applied_batch_ids):
            raise ValueError(f"batch {batch_id!r} already committed")  # guard; callers skip earlier
        applied_batch_ids.append(batch_id)
        # the ledger is a sliding window, not an unbounded log: a
        # follow() daemon committing millions of micro-batches would
        # otherwise rewrite an ever-growing id list in EVERY manifest
        # (O(N²) cumulative manifest bytes). Replays older than the
        # window are still safe — their events are ≤ the applied-LSN
        # high-water mark and drain to "no new events".
        if len(applied_batch_ids) > BATCH_ID_WINDOW:
            applied_batch_ids = applied_batch_ids[-BATCH_ID_WINDOW:]
        # ledger of stat-less WAL files fully drained by committed
        # applies (basename|size tokens, see CDCEngine.apply): carried
        # forward unless the caller supplies an updated list; reset by
        # layout-creating commits along with the batch-id namespace
        if statless_drained is None:
            statless_drained = (
                [] if reset_batch_ids else list((prev or {}).get("statless_drained", ()))
            )
        if len(statless_drained) > BATCH_ID_WINDOW:
            statless_drained = statless_drained[-BATCH_ID_WINDOW:]
        # count verification before the pointer flips (reference:
        # extractors/repsly/extractor.py:741-752): every file THIS commit
        # introduces (or whose recorded count changed) must exist with the
        # row count the merge tasks reported. Entries carried forward
        # verbatim from the parent manifest — same file, same count —
        # were verified by the commit that introduced them and are
        # skipped, so a merge-on-read micro-batch pays O(delta) footer
        # reads here, not O(P + Σ stack sizes). ``verify_all=True``
        # re-verifies every listed file (the full scrub — for audits or
        # suspected on-disk corruption, not the hot commit path).
        import pyarrow.parquet as pq

        prev_parts = {} if verify_all else (prev or {}).get("partitions", {})
        for pid, ent in partitions.items():
            pent = prev_parts.get(str(pid))
            if (
                pent is None
                or pent["file"] != ent["file"]
                or pent["rows"] != ent["rows"]
            ):
                fpath = os.path.join(self.root, ent["file"])
                md = pq.read_metadata(fpath, filesystem=self.fs)  # raises if missing
                if md.num_rows != ent["rows"]:
                    raise IOError(
                        f"partition {pid}: wrote {md.num_rows} rows, expected {ent['rows']}"
                    )
            carried = {
                (d["file"], d["rows"]) for d in (pent or {}).get("deltas", ())
            }
            for dent in ent.get("deltas", ()):  # merge-on-read side files
                if (dent["file"], dent["rows"]) in carried:
                    continue
                dmd = pq.read_metadata(
                    os.path.join(self.root, dent["file"]), filesystem=self.fs
                )
                if dmd.num_rows != dent["rows"]:
                    raise IOError(
                        f"partition {pid} delta {dent['file']}: wrote "
                        f"{dmd.num_rows} rows, expected {dent['rows']}"
                    )
        # routing_hash is a persisted-layout contract: incremental commits
        # (delta appends, compaction, epoch folds) never re-route rows, so
        # they must carry the parent's stamp forward VERBATIM — stamping
        # the current version here would launder apply()'s guard on a lake
        # laid out by an older hash. Only layout-creating commits
        # (bootstrap / full_refresh, the reset_batch_ids=True callers,
        # which route every row with the current hash) stamp fresh.
        routing = (
            ROUTING_HASH_VERSION
            if prev is None or reset_batch_ids
            else prev.get("routing_hash")
        )
        manifest = {
            "version": version,
            "parent": version - 1,
            "routing_hash": routing,
            "batch_id": batch_id,
            "num_partitions": num_partitions,
            "applied_lsn": int(applied_lsn),
            "applied_batch_ids": applied_batch_ids,
            "statless_drained": statless_drained,
            "schema_ops": schema_ops,
            "partitions": {str(pid): ent for pid, ent in sorted(partitions.items())},
            "stats": stats or {},
        }
        atomic_write_json(self.manifest_path(version), manifest, fs=self.fs)
        atomic_write_json(os.path.join(self.root, "CURRENT"), {"version": version}, fs=self.fs)
        return manifest

    # ---- read ----
    def files(self, version: int | None = None) -> list[str]:
        """Every live data file — base partition files AND any
        merge-on-read delta side files."""
        m = self.load_manifest(version)
        if not m:
            return []
        out = []
        for e in m["partitions"].values():
            out.append(os.path.join(self.root, e["file"]))
            out.extend(os.path.join(self.root, d["file"]) for d in e.get("deltas", ()))
        return out

    def files_by_epoch(
        self, version: int | None = None, pids: set[int] | None = None
    ) -> dict[int, list[str]]:
        """Live files grouped by the schema epoch (max schema-op lsn) they
        were written under. Files within one epoch share a physical
        schema; mixing epochs in one ``read_parquet`` would mis-unify
        renamed columns, so readers take one group at a time.
        ``pids`` restricts to those partition ids."""
        m = self.load_manifest(version)
        if not m:
            raise FileNotFoundError(f"no committed version in {self.root}")
        groups: dict[int, list[str]] = {}
        for pid, e in m["partitions"].items():
            if pids is not None and int(pid) not in pids:
                continue
            groups.setdefault(int(e.get("schema_lsn", -1)), []).append(
                os.path.join(self.root, e["file"])
            )
        return groups

    def changed_partition_ids(self, v_from: int, v_to: int | None = None) -> set[int]:
        """Partition ids whose live file changed between two versions —
        the change-feed seam: a downstream consumer re-reads ONLY these
        (manifest diff, no data IO)."""
        m_new = self.load_manifest(v_to)
        if not m_new:
            raise FileNotFoundError(f"no committed version in {self.root}")
        m_old = self.load_manifest(v_from) if v_from >= 0 else None
        old = {} if m_old is None else m_old["partitions"]
        changed = set()

        def _sig(ent: dict | None) -> tuple | None:
            if ent is None:
                return None
            return (ent["file"], tuple(d["file"] for d in ent.get("deltas", ())))

        for pid, ent in m_new["partitions"].items():
            if _sig(old.get(pid)) != _sig(ent):
                changed.add(int(pid))
        return changed

    def dataset(
        self,
        version: int | None = None,
        include_lineage: bool = False,
        pids: set[int] | None = None,
        columns: list[str] | None = None,
    ):
        """Current table state as a streaming ray.data.Dataset, conformed
        to the latest logical schema (older partition files may predate a
        schema op; conform renames/casts/backfills per file batch).
        ``pids`` restricts the read to those partitions (change feed).
        ``columns`` pushes a PROJECTION all the way into the parquet
        reads (per-epoch wire names resolved through the registry) — a
        consumer wanting (url, text) from a 100-TB lake never pages in
        html.

        Partitions carrying merge-on-read delta side files are resolved
        by a per-partition task that reads base ∪ deltas directly and
        LWW-compacts in place (same no-shuffle shape as the apply merge:
        one task per partition, nothing moves through an exchange);
        delta-free partitions stream through plain ``read_parquet``."""
        import ray.data as rd

        m = self.load_manifest(version)
        if not m:
            raise FileNotFoundError(f"no committed version in {self.root}")
        reg_ops = m["schema_ops"]
        if columns is not None:
            legal = set(SchemaRegistry.from_dict(reg_ops).logical_schema().names)
            bad = [c for c in columns if c not in legal]
            if bad:
                raise ValueError(f"unknown columns {bad}; logical schema has {sorted(legal)}")
        sel = {
            int(p): e
            for p, e in m["partitions"].items()
            if pids is None or int(p) in pids
        }
        plain = {p for p, e in sel.items() if not e.get("deltas")}
        mor = {p: e for p, e in sel.items() if e.get("deltas")}

        def conform(batch: pa.Table) -> pa.Table:
            # same tombstone-filter + conform + lineage semantics as the
            # mor read path — one implementation, not two that can drift
            return _logical_view(
                batch, SchemaRegistry.from_dict(reg_ops), include_lineage, columns
            )

        ds = None
        if plain:
            reg = SchemaRegistry.from_dict(reg_ops)
            for epoch, files in sorted(
                self.files_by_epoch(version, pids=plain).items()
            ):
                kw = {}
                if columns is not None:
                    kw["columns"] = reg.physical_columns(columns, epoch) + [
                        LSN_COL,
                        OP_COL,
                        PID_COL,
                    ]
                d = rd.read_parquet(files, filesystem=self.fs, **kw).map_batches(
                    conform, batch_format="pyarrow"
                )
                ds = d if ds is None else ds.union(d)
        if mor:
            items = [
                {
                    "files": "\n".join(
                        [f"{e['file']}|{int(e.get('schema_lsn', -1))}"]
                        + [
                            f"{d['file']}|{int(d.get('schema_lsn', -1))}"
                            for d in e["deltas"]
                        ]
                    )
                }
                for _, e in sorted(mor.items())
            ]
            d = rd.from_items(items, override_num_blocks=len(items)).map_batches(
                _MorPartitionRead(
                    self.root, reg_ops, self.fs, include_lineage, columns=columns
                ),
                batch_format="pyarrow",
            )
            ds = d if ds is None else ds.union(d)
        if ds is None:
            # a COMMITTED empty lake (init_empty, or a pids filter that
            # matches nothing) is a legitimate empty table, not an error
            # — mirror to_arrow()'s typed empty result so callers can
            # tell "empty" from "missing/corrupt" (which raised above)
            reg = SchemaRegistry.from_dict(reg_ops)
            empty = reg.conform(pa.table({}), columns=columns)
            if include_lineage:  # keep the lineage schema stable too
                for c, typ in (
                    (LSN_COL, pa.int64()),
                    (PID_COL, pa.int64()),
                    (OP_COL, pa.string()),
                ):
                    empty = empty.append_column(c, pa.array([], typ))
            return rd.from_arrow(empty)
        return ds

    def to_arrow(
        self,
        version: int | None = None,
        include_lineage: bool = False,
        columns: list[str] | None = None,
    ) -> pa.Table:
        """Small-table convenience (tests / validation only)."""
        m = self.load_manifest(version)
        if not m:
            raise FileNotFoundError(f"no committed version in {self.root}")
        reg = SchemaRegistry.from_dict(m["schema_ops"])
        parts = []
        for _, ent in sorted(m["partitions"].items()):
            rels = [ent["file"]] + [d["file"] for d in ent.get("deltas", ())]
            epochs = [int(ent.get("schema_lsn", -1))] + [
                int(d.get("schema_lsn", -1)) for d in ent.get("deltas", ())
            ]
            t = _read_compact_partition(
                self.root,
                rels,
                m["schema_ops"],
                self.fs,
                compact=len(rels) > 1,
                columns=columns,
                file_lsns=epochs,
            )
            parts.append(_logical_view(t, reg, include_lineage, columns))
        if not parts:
            return reg.conform(pa.table({}), columns=columns)
        return pa.concat_tables(parts)

    def check_routing(self, manifest: dict) -> None:
        """Refuse to hash-route keys against a lake laid out by a
        different (or unstamped legacy) routing hash — routing with the
        CURRENT hash would read/merge the wrong partition and silently
        return wrong answers. Same contract apply() enforces."""
        stamped = manifest.get("routing_hash")
        if stamped != ROUTING_HASH_VERSION:
            raise RuntimeError(
                f"lake was partitioned with routing hash {stamped!r} (None = "
                f"unstamped legacy manifest) but this engine routes with "
                f"{ROUTING_HASH_VERSION!r} — hash routing would touch the "
                "wrong partition. Re-bootstrap or full_refresh() the lake."
            )

    def lookup(self, url: str, version: int | None = None) -> pa.Table:
        """Point lookup: the live LWW row for one key, touching exactly
        ONE partition (hash routing) and pushing a ``url =`` predicate
        into the parquet reads (row-group pruning via column stats) —
        never a table scan. Returns 0 or 1 logical rows."""
        m = self.load_manifest(version)
        if not m:
            raise FileNotFoundError(f"no committed version in {self.root}")
        self.check_routing(m)
        reg = SchemaRegistry.from_dict(m["schema_ops"])
        pid = int(partition_ids([url], m["num_partitions"])[0])
        ent = m["partitions"].get(str(pid))
        if ent is None:
            return _logical_view(
                reg.conform(pa.table({})), reg, include_lineage=False
            )
        rels = [ent["file"]] + [d["file"] for d in ent.get("deltas", ())]
        t = _read_compact_partition(
            self.root,
            rels,
            m["schema_ops"],
            self.fs,
            compact=True,
            url_filter=url,
        )
        return _logical_view(t, reg, include_lineage=False)

    def lookup_many(self, urls: list[str], version: int | None = None) -> pa.Table:
        """Batched point lookups: keys are grouped by their hash
        partition and each TOUCHED partition is read exactly once with
        an ``url IN (...)`` predicate pushed into the base + delta reads
        — len(distinct partitions) reads total, never a table scan.
        Returns the live LWW rows (absent / deleted keys yield no row)."""
        m = self.load_manifest(version)
        if not m:
            raise FileNotFoundError(f"no committed version in {self.root}")
        self.check_routing(m)
        reg = SchemaRegistry.from_dict(m["schema_ops"])
        if not urls:
            return _logical_view(reg.conform(pa.table({})), reg, include_lineage=False)
        import pyarrow.parquet as pq

        from .stages.lww import lww_compact_table

        pids = partition_ids(list(urls), m["num_partitions"])
        by_pid: dict[int, list[str]] = {}
        for u, p in zip(urls, pids):
            by_pid.setdefault(int(p), []).append(u)
        out = []
        for pid, keys in sorted(by_pid.items()):
            ent = m["partitions"].get(str(pid))
            if ent is None:
                continue
            rels = [ent["file"]] + [d["file"] for d in ent.get("deltas", ())]
            tables = []
            for rel in rels:
                tables.append(
                    pq.read_table(
                        os.path.join(self.root, rel),
                        filesystem=self.fs,
                        filters=[("url", "in", keys)],
                    )
                )
            # files may span schema epochs: conform each before concat
            confs = []
            for t in tables:
                lineage = {
                    c: t.column(c)
                    for c in (LSN_COL, OP_COL, PID_COL)
                    if c in t.column_names
                }
                conf = reg.conform(t.drop(list(lineage)))
                for c, col in lineage.items():
                    conf = conf.append_column(c, col)
                confs.append(conf)
            winners = lww_compact_table(pa.concat_tables(confs))
            out.append(_logical_view(winners, reg, include_lineage=False))
        if not out:
            return _logical_view(reg.conform(pa.table({})), reg, include_lineage=False)
        return pa.concat_tables(out)

    # ---- observability ----
    def stats(self, version: int | None = None) -> dict:
        """Partition-health rollup — the reference's ``system.parts``
        monitoring (``airflow/dags/repsly_dag.py:1560-1628``) from the
        manifest alone (no data read)."""
        m = self.load_manifest(version)
        if not m:
            return {"version": None, "partitions": 0}
        parts = m["partitions"]
        dents = [d for e in parts.values() for d in e.get("deltas", ())]
        # merge-on-read side files carry rows/live_rows/bytes of their own
        # — fold them into the physical totals, or a delete-heavy
        # mode="delta" lake would sail past the tombstone health gate that
        # the identical workload in mode="cow" trips. (live is an upper
        # bound under deltas: a delta row superseding a base row leaves
        # the base row counted live until compaction folds it — exact
        # liveness needs a read, and stats() is manifest-only by design.)
        rows = sum(e["rows"] for e in parts.values()) + sum(d["rows"] for d in dents)
        live = sum(e.get("live_rows", e["rows"]) for e in parts.values()) + sum(
            d.get("live_rows", d["rows"]) for d in dents
        )
        sizes = [e.get("bytes", 0) for e in parts.values()]
        delta_bytes = sum(d.get("bytes", 0) for d in dents)
        return {
            "delta_files": len(dents),
            "delta_rows": sum(d["rows"] for d in dents),
            "delta_bytes": delta_bytes,
            "version": m["version"],
            "batch_id": m["batch_id"],
            "applied_lsn": m["applied_lsn"],
            "partitions": len(parts),
            "rows": rows,
            "live_rows": live,
            "tombstones": rows - live,
            # completeness = silver(live)/physical rows — the reference's
            # silver-vs-raw layer ratio check (repsly_dag.py completeness
            # task) from the manifest alone
            "completeness_ratio": round(live / rows, 6) if rows else None,
            "bytes": sum(sizes) + delta_bytes,
            "max_partition_bytes": max(sizes, default=0),
            "min_partition_bytes": min(sizes, default=0),
            "schema_ops": len(m["schema_ops"]),
            "applied_batches": len(m["applied_batch_ids"]),
        }

    # ---- maintenance ----
    def vacuum(self, keep_versions: int = 2) -> list[str]:
        """Delete data files not referenced by the last ``keep_versions``
        manifests (orphans from failed commits, superseded partitions)."""
        cur = self.current_version()
        live: set[str] = set()
        for v in range(max(0, cur - keep_versions + 1), cur + 1):
            m = self.load_manifest(v)
            if m:
                for e in m["partitions"].values():
                    live.add(e["file"])
                    live.update(d["file"] for d in e.get("deltas", ()))
        removed = []
        data_root = os.path.join(self.root, "data")
        if self.fs is not None:
            from pyarrow.fs import FileSelector, FileType

            infos = self.fs.get_file_info(
                FileSelector(data_root, recursive=True, allow_not_found=True)
            )
            for info in infos:
                if info.type != FileType.File:
                    continue
                rel = os.path.relpath(info.path, self.root)
                if rel not in live:
                    self.fs.delete_file(info.path)
                    removed.append(rel)
            return removed
        for dirpath, _, names in os.walk(data_root):
            for n in names:
                full = os.path.join(dirpath, n)
                rel = os.path.relpath(full, self.root)
                if rel not in live:
                    os.remove(full)
                    removed.append(rel)
        return removed
