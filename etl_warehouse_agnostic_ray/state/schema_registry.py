"""Arrow schema-evolution registry.

Generalizes the reference's additive evolution — ``ALTER TABLE ADD
COLUMN`` on unseen fields (``extractors/leaflink/extractor.py:1061-1082``),
dbt ``on_schema_change='append_new_columns'`` / ``sync_all_columns``
(``dbt/models/raw/repsly/clients_raw.sql:4``) — into an ordered log of
{add, widen, rename} ops versioned by the LSN that introduced them, so
replay from any checkpoint reapplies identical casts (SURVEY.md §7.5).

Semantics:
- ``add(column, type)``: column joins the logical schema; rows earlier
  than the op (and files written before it) read as null (backfill).
- ``widen(column, type)``: column type is cast losslessly (e.g.
  int32 -> int64); existing files cast on read/compaction.
- ``rename(old, new)``: logical rename; physical payload columns keep
  their wire name and are mapped at normalize/conform time.
- ``drop(column)``: column leaves the logical schema (dbt
  ``sync_all_columns`` removes departed wire columns); physical files
  keep the bytes until compaction rewrites them — readers just stop
  projecting the column (conform ignores physical columns outside the
  logical schema). Re-ADDING a dropped name is REFUSED: files written
  before the drop still hold the old values under that name, and
  without per-file column-mapping ids a re-add would silently
  resurrect them on read — use a new name or full_refresh.
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import PAGES_SCHEMA, arrow_type_from_name


class SchemaRegistry:
    def __init__(self, ops: list[dict] | None = None):
        # each op: {"lsn": int, "kind": str, "column": str, "type": str|None}
        self.ops: list[dict] = sorted(ops or [], key=lambda o: o["lsn"])

    # ---- mutation ----
    def apply_event(self, lsn: int, kind: str, column: str, type_name: str | None):
        if any(o["lsn"] == lsn for o in self.ops):
            return  # idempotent redelivery
        if kind not in ("add", "widen", "rename", "drop"):
            raise ValueError(f"unknown schema op kind {kind!r}")
        # re-introducing a previously dropped NAME is refused whether it
        # arrives as an add or as a rename TARGET: either way, files
        # written before the drop still hold the old values under that
        # name and conform would collide them with the new data
        target = column if kind == "add" else type_name if kind == "rename" else None
        if target is not None and any(
            o["kind"] == "drop" and o["column"] == target for o in self.ops
        ):
            raise ValueError(
                f"column {target!r} was dropped earlier; re-adding it would "
                "resurrect pre-drop values from old partition files — use a "
                "new name or full_refresh the table"
            )
        self.ops.append({"lsn": int(lsn), "kind": kind, "column": column, "type": type_name})
        self.ops.sort(key=lambda o: o["lsn"])

    # ---- serialization (checkpoint/manifest) ----
    def to_dict(self) -> list[dict]:
        return list(self.ops)

    @classmethod
    def from_dict(cls, ops: list[dict] | None) -> "SchemaRegistry":
        return cls(ops or [])

    # ---- schema derivation ----
    def logical_schema(self, upto_lsn: int | None = None) -> pa.Schema:
        """Logical lake schema after applying ops with lsn <= upto_lsn."""
        fields: list[tuple[str, pa.DataType]] = [(f.name, f.type) for f in PAGES_SCHEMA]
        for o in self.ops:
            if upto_lsn is not None and o["lsn"] > upto_lsn:
                break
            if o["kind"] == "add":
                if all(n != o["column"] for n, _ in fields):
                    fields.append((o["column"], arrow_type_from_name(o["type"])))
            elif o["kind"] == "widen":
                fields = [
                    (n, arrow_type_from_name(o["type"]) if n == o["column"] else t)
                    for n, t in fields
                ]
            elif o["kind"] == "rename":
                # rename ops carry the target name in the "type" slot
                fields = [(o["type"], t) if n == o["column"] else (n, t) for n, t in fields]
            elif o["kind"] == "drop":
                fields = [(n, t) for n, t in fields if n != o["column"]]
        return pa.schema([pa.field(n, t) for n, t in fields])

    def rename_map(self, upto_lsn: int | None = None) -> dict[str, str]:
        """physical/wire name -> current logical name (transitively)."""
        m: dict[str, str] = {}
        for o in self.ops:
            if upto_lsn is not None and o["lsn"] > upto_lsn:
                break
            if o["kind"] == "rename":
                old, new = o["column"], o["type"]
                # chase any earlier rename chain
                for k, v in list(m.items()):
                    if v == old:
                        m[k] = new
                m.setdefault(old, new)
        return m

    def physical_columns(
        self, requested: list[str], file_lsn: int
    ) -> list[str]:
        """The FILE column names (for a file written at schema epoch
        ``file_lsn``) that carry the ``requested`` CURRENT logical
        columns — the projection-pushdown seam: a reader that wants
        (url, text) from a 100-TB lake must not page in html. Renames
        after the file's epoch are unwound new→old; columns added after
        the epoch are absent (the conform step backfills them null)."""
        # name-at-epoch: walk renames NEWER than the file backwards
        name_map = {r: r for r in requested}
        for o in reversed(self.ops):
            if o["kind"] == "rename" and o["lsn"] > file_lsn:
                old, new = o["column"], o["type"]
                for r, cur in name_map.items():
                    if cur == new:
                        name_map[r] = old
        file_names = {
            f.name for f in self.logical_schema(upto_lsn=file_lsn)
        }
        return [name_map[r] for r in requested if name_map[r] in file_names]

    def conform(
        self,
        table: pa.Table,
        upto_lsn: int | None = None,
        columns: list[str] | None = None,
    ) -> pa.Table:
        """Cast/rename/backfill an Arrow table (a lake file or normalized
        event payload) to the logical schema. Extra columns are dropped;
        missing columns are backfilled null; mismatched types cast.
        ``columns`` restricts the target to that subset of the logical
        schema (projection pushdown: callers read only those file
        columns via ``physical_columns`` and conform the slice)."""
        target = self.logical_schema(upto_lsn)
        if columns is not None:
            by_name = {f.name: f for f in target}
            target = pa.schema([by_name[c] for c in columns])
        renames = self.rename_map(upto_lsn)
        cols = {}
        present = {renames.get(n, n): table.column(n) for n in table.column_names}
        n = table.num_rows
        for f in target:
            col = present.get(f.name)
            if col is None:
                cols[f.name] = pa.nulls(n, f.type)
            elif col.type != f.type:
                cols[f.name] = col.cast(f.type)
            else:
                cols[f.name] = col
        return pa.table(cols, schema=target)
