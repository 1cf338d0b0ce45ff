"""Incremental exact dedup against an already-ingested corpus.

A 100-TB corpus is not deduped in one batch job: ingestion arrives in
daily drops, and each drop must be deduped BOTH against itself and
against everything already accepted — without rescanning the
accepted corpus. (Reference analogue: the per-batch duplicate guard
that skips already-loaded batch ids, ``airflow/dags/repsly_dag.py``;
membership here is content-defined per document.)

Design (the CDC lake pattern applied to dedup state):
- The accepted-corpus state is a HASH INDEX: 16-byte content-hash
  pairs (the ``ops/dedup.exact_dedup`` key family — collisions
  ~n²/2¹²⁸), hash-partitioned into ``num_parts`` parquet files. The
  index is ~1/1000th the corpus size and is the ONLY thing the
  incremental path ever reads.
- ``add(ds)``: (1) within-batch exact dedup (min-id per pair, coarse
  bucket + lexsort pass); (2) anti-join the batch's pairs against the
  index — each task reads ONLY the index partitions matching its hash
  range (partition pruning by file, no shuffle of the index); (3)
  survivors' pairs are appended to the index partitions (rewrite of
  touched partitions only, tmp+rename).
- Crash safety: with ``survivors_out`` set, ``add`` persists the
  survivors and a ``_SUCCESS`` marker BEFORE extending the index; a
  replayed ``add`` that finds the marker re-extends idempotently from
  the persisted rows and returns them — no crash window loses
  documents. Without it, replay is idempotent ONLY once the caller
  has durably consumed the returned survivors: the index is extended
  eagerly, so a crash before the output lands would leave the batch's
  hashes blocking a re-add.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .dedup import recover_rows_by_id
from .texthash import POLY_B2, poly_hash_array, splitmix64

N_COARSE = 1024


def batch_stamp(ds, id_col: str = "doc_id", text_col: str | None = "text") -> str:
    """Order-free content stamp of a batch's (id, content) MULTISET —
    count, XOR, and wrapping SUM of splitmix64-mixed ids combined with
    the poly-hash of each row's text, one column-pruned pass. Stamped
    into the ``_SUCCESS`` marker so a replayed ``add`` can tell "same
    batch, finish the protocol" from "caller reused the output dir for
    a DIFFERENT batch" (silently returning the previous batch's
    survivors would lose every document of the new one). XOR alone is
    not multiset-safe — duplicate ids cancel pairwise, so two distinct
    batches of doubled ids would collide; the sum component breaks
    that. The content component (ADVICE r4) breaks the narrower replay
    corner: same ids, DIFFERENT texts must not match the old stamp.
    ``text_col`` is skipped if absent from the schema.

    The stamp carries a FORMAT PREFIX (``v2:``): when the stamp
    algorithm changes, a marker persisted by the previous format must
    not silently compare unequal — the "different batch" path rmtrees
    and recomputes the survivors dir, destroying the only persisted
    copy of the prior batch's survivors. Callers detect the prefix
    mismatch and fail loudly instead (see ``stamp_format_guard``)."""
    cols = [id_col]
    if text_col is not None and text_col in (ds.schema().names or ()):
        cols.append(text_col)
    else:
        text_col = None

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(ids):
            h = splitmix64(ids)
            if text_col is not None:
                h = h ^ poly_hash_array(b.column(text_col))
            x = np.bitwise_xor.reduce(h)
            with np.errstate(over="ignore"):
                s = np.add.reduce(h)
        else:
            x = s = np.uint64(0)
        return pa.table(
            {
                "n": pa.array([len(ids)], pa.int64()),
                "x": pa.array([int(x)], pa.uint64()),
                "s": pa.array([int(s)], pa.uint64()),
            }
        )

    rows = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow"
    ).take_all()
    n, x, s = 0, 0, 0
    for r in rows:
        n += int(r["n"])
        x ^= int(r["x"])
        s = (s + int(r["s"])) & 0xFFFFFFFFFFFFFFFF
    return f"{STAMP_FORMAT}:{n}-{x:016x}-{s:016x}"


STAMP_FORMAT = "v2"
_OLD_STAMP_RX = re.compile(r"^\d+-[0-9a-f]{16}-[0-9a-f]{16}$")


def stamp_format_guard(prev_marker: str) -> None:
    """Refuse to compare a marker written by an OLDER auto-stamp format
    against a freshly computed stamp: formats differ, so "same batch"
    and "different batch" are indistinguishable — and the different-
    batch path is destructive (it overwrites the survivors dir).
    Explicit caller-supplied batch ids are unaffected (they do not
    match the old auto-stamp shape)."""
    if _OLD_STAMP_RX.match(prev_marker):
        raise RuntimeError(
            f"survivors marker {prev_marker!r} was written by an older "
            f"batch-stamp format (current: {STAMP_FORMAT!r}) — replay "
            "detection cannot compare across formats. Pass an explicit "
            "batch_id, or delete the marker AND its survivors dir if "
            "this is genuinely a new batch."
        )


class HashIndex:
    """Partitioned on-disk set of 128-bit content-hash pairs."""

    def __init__(self, root: str, num_parts: int = 64):
        self.root = root
        self.num_parts = num_parts
        os.makedirs(root, exist_ok=True)

    def _path(self, part: int) -> str:
        return os.path.join(self.root, f"idx-{part:05d}.parquet")

    def load_part(self, part: int) -> np.ndarray:
        """Sorted structured (h1, h2) array of one partition (empty if
        the partition file does not exist yet)."""
        p = self._path(part)
        dt = np.dtype([("h1", "<u8"), ("h2", "<u8")])
        if not os.path.exists(p):
            return np.empty(0, dt)
        t = pq.read_table(p)
        x = np.empty(t.num_rows, dt)
        x["h1"] = t.column("h1").to_numpy(zero_copy_only=False).view(np.uint64)
        x["h2"] = t.column("h2").to_numpy(zero_copy_only=False).view(np.uint64)
        return np.sort(x)

    def append_part(self, part: int, h1: np.ndarray, h2: np.ndarray) -> None:
        """Union new pairs into a partition (tmp+rename rewrite)."""
        cur = self.load_part(part)
        dt = cur.dtype
        new = np.empty(len(h1), dt)
        new["h1"], new["h2"] = h1, h2
        merged = np.unique(np.concatenate([cur, new]))
        t = pa.table(
            {
                "h1": pa.array(merged["h1"].view(np.int64)),
                "h2": pa.array(merged["h2"].view(np.int64)),
            }
        )
        tmp = self._path(part) + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, self._path(part))

    def count(self) -> int:
        n = 0
        for f in os.listdir(self.root):
            if f.endswith(".parquet"):
                n += pq.read_metadata(os.path.join(self.root, f)).num_rows
        return n


class IncrementalDeduper:
    """Dedup successive document batches against a persistent corpus
    hash index. Each ``add`` returns the batch's NEW-to-the-corpus
    survivors and extends the index."""

    def __init__(self, index_dir: str, num_parts: int = 64):
        self.index = HashIndex(index_dir, num_parts)

    def add(
        self,
        ds,
        text_col: str = "text",
        id_col: str = "doc_id",
        broadcast_limit: int = 5_000_000,
        join_partitions: int = 8,
        survivors_out: str | None = None,
        batch_id: str | None = None,
    ):
        """Returns the (id, text) rows of ``ds`` that are new to the
        corpus: within-batch min-id per content hash, then not present
        in the index. Extends the index with the survivors' hashes.

        ``survivors_out`` (optional) enables the crash-safe two-phase
        protocol: survivors are persisted there and a ``_SUCCESS``
        marker committed BEFORE the index is extended; a replayed
        ``add`` that finds the marker re-extends idempotently from the
        persisted rows and returns them — no crash window loses
        documents. Without it, the caller must durably consume the
        returned survivors before trusting replay (the index is
        extended eagerly)."""
        import ray

        num_parts = self.index.num_parts
        index_root = self.index.root

        def read_out() -> "ray.data.Dataset":
            """Read persisted survivors; a zero-survivor batch may have
            written no parquet files at all."""
            data_dir = os.path.join(survivors_out, "data")
            files = (
                sorted(
                    os.path.join(data_dir, f)
                    for f in os.listdir(data_dir)
                    if f.endswith(".parquet")
                )
                if os.path.isdir(data_dir)
                else []
            )
            empty = pa.table(
                {id_col: pa.array([], pa.int64()),
                 text_col: pa.array([], pa.string())}
            )
            if not files:
                return ray.data.from_arrow(empty)
            d = ray.data.read_parquet(files)
            names = set(d.schema().names or ())
            if not {id_col, text_col} <= names:  # schema-less 0-row write
                return ray.data.from_arrow(empty)
            return d.select_columns([id_col, text_col])

        marker = (
            os.path.join(survivors_out, "_SUCCESS") if survivors_out else None
        )
        if marker and os.path.exists(marker):
            stamp = batch_id if batch_id is not None else batch_stamp(ds, id_col, text_col)
            prev = open(marker).read().strip()
            stamp_format_guard(prev)
            if prev == stamp:
                surv = read_out()
                self._extend_from_texts(surv, text_col, id_col)
                return surv
            # the marker belongs to a DIFFERENT batch (caller reused
            # survivors_out): finish ITS index extension (idempotent
            # union), then clear and compute the new batch — silently
            # replaying the old survivors would drop every new document
            self._extend_from_texts(read_out(), text_col, id_col)
            os.remove(marker)

        def project(b: pa.Table) -> pa.Table:
            h1 = poly_hash_array(b.column(text_col))
            h2 = poly_hash_array(b.column(text_col), base=POLY_B2)
            return pa.table(
                {
                    id_col: b.column(id_col),
                    "_h1": pa.array(h1.view(np.int64)),
                    "_h2": pa.array(h2.view(np.int64)),
                    "_pk": pa.array((h1 % np.uint64(num_parts)).astype(np.int64)),
                }
            )

        def min_id_and_probe(g: pd.DataFrame) -> pd.DataFrame:
            """One index partition's worth of work: within-batch min-id
            per pair, then a sorted probe against the partition's index
            slice (read in-task — the index never shuffles)."""
            part = int(g["_pk"].iloc[0])
            h1 = g["_h1"].to_numpy().view(np.uint64)
            h2 = g["_h2"].to_numpy().view(np.uint64)
            ids = g[id_col].to_numpy()
            order = np.lexsort((ids, h2, h1))
            h1s, h2s, ids_s = h1[order], h2[order], ids[order]
            first = np.ones(len(ids_s), dtype=bool)
            first[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
            h1u, h2u, idu = h1s[first], h2s[first], ids_s[first]
            idx = HashIndex(index_root, num_parts).load_part(part)
            if len(idx):
                q = np.empty(len(h1u), idx.dtype)
                q["h1"], q["h2"] = h1u, h2u
                pos = np.searchsorted(idx, q)
                posc = np.minimum(pos, len(idx) - 1)
                seen = (
                    (idx["h1"][posc] == h1u)
                    & (idx["h2"][posc] == h2u)
                    & (pos < len(idx))
                )
            else:
                seen = np.zeros(len(h1u), dtype=bool)
            keep = ~seen
            return pd.DataFrame(
                {
                    id_col: idu[keep],
                    "_h1": h1u[keep].view(np.int64),
                    "_h2": h2u[keep].view(np.int64),
                    "_pk": np.full(int(keep.sum()), part, np.int64),
                }
            )

        survivors = (
            ds.map_batches(project, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(min_id_and_probe, batch_format="pandas")
        ).materialize()

        result = recover_rows_by_id(
            ds,
            survivors.select_columns([id_col]),
            id_col,
            [id_col, text_col],
            broadcast_limit,
            join_partitions,
        )
        if survivors_out:
            # phase 1: persist survivors, THEN the marker, THEN (phase 2)
            # extend the index — a crash at any point either replays from
            # scratch (no marker, this batch never extended the index) or
            # finds the marker and re-extends idempotently
            data_dir = os.path.join(survivors_out, "data")
            if os.path.isdir(data_dir):  # partial earlier attempt
                import shutil

                shutil.rmtree(data_dir)
            result.write_parquet(data_dir)
            stamp = batch_id if batch_id is not None else batch_stamp(ds, id_col, text_col)
            with open(marker, "w") as f:
                f.write(stamp)

        # phase 2 — extend the index: touched partitions only, one task
        # per partition appending ITS file in-task (driver stays O(1))
        self._extend_from_pairs(survivors.select_columns(["_pk", "_h1", "_h2"]))

        if survivors_out:
            return read_out()
        return result

    def _extend_from_pairs(self, hashed) -> None:
        """Distributed index extension: shuffle the batch's survivor
        (partition, h1, h2) rows by index partition — batch-bounded,
        never the corpus — and let ONE task per partition union-append
        its file in-task. Replaces the former driver-side sequential
        append loop: driver memory is O(1) and partition rewrites run
        in parallel. Assumes the index root is shared storage on a
        multi-node cluster (same contract as the lake)."""
        index_root, num_parts = self.index.root, self.index.num_parts

        def extend_one(g: pa.Table) -> pa.Table:
            part = int(g.column("_pk")[0].as_py())
            h1 = g.column("_h1").to_numpy(zero_copy_only=False).view(np.uint64)
            h2 = g.column("_h2").to_numpy(zero_copy_only=False).view(np.uint64)
            HashIndex(index_root, num_parts).append_part(part, h1, h2)
            return pa.table({"_pk": pa.array([part], pa.int64())})

        hashed.groupby("_pk").map_groups(extend_one, batch_format="pyarrow").count()

    def _extend_from_texts(self, docs, text_col: str, id_col: str) -> None:
        """Replay path: re-hash persisted survivors and union their
        (h1, h2) pairs into the index (append_part dedupes)."""
        num_parts = self.index.num_parts

        def project(b: pa.Table) -> pa.Table:
            h1 = poly_hash_array(b.column(text_col))
            h2 = poly_hash_array(b.column(text_col), base=POLY_B2)
            return pa.table(
                {
                    "_h1": pa.array(h1.view(np.int64)),
                    "_h2": pa.array(h2.view(np.int64)),
                    "_pk": pa.array((h1 % np.uint64(num_parts)).astype(np.int64)),
                }
            )

        self._extend_from_pairs(
            docs.map_batches(project, batch_format="pyarrow")
        )
