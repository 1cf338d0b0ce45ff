"""Event-normalization stage (stateless, zero-copy Arrow map_batches).

Per batch of raw change events:
- drop schema_change rows (handled driver-side from a tiny pushdown read)
- map wire column names -> current logical schema (rename ops), add
  backfill-null columns (add ops), cast widened columns (widen ops)
- carry op/lsn as internal columns, compute the hash partition id

This is the engine's analogue of the reference's flatten+stamp step
(``extractors/repsly/extractor.py:338-356, 1433-1436``) — but typed,
vectorized, and schema-registry-aware.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..lake import partition_ids
from ..schemas import LSN_COL, OP_COL, PID_COL
from ..state.schema_registry import SchemaRegistry


class NormalizeEvents:
    """Callable for map_batches. Plain-function-cheap, but written as a
    class so the registry/logical schema is built once per actor/task
    rather than per batch.

    With ``precompact=True`` (default) each batch is LWW-compacted
    before the shuffle — the classic combiner: LWW is associative and
    commutative under the (warc_ts, lsn) total order, so batch-winner →
    partition-winner equals global winner, and delete winners survive as
    tombstone rows. On zipf-hot CDC streams this cuts shuffled rows by
    the within-batch churn factor (SURVEY.md §4 skew row: pre-aggregate
    before the groupby)."""

    def __init__(
        self,
        schema_ops: list[dict],
        num_partitions: int,
        min_lsn: int = -1,
        precompact: bool = True,
    ):
        self.reg = SchemaRegistry.from_dict(schema_ops)
        self.target = self.reg.logical_schema()
        self.renames = self.reg.rename_map()
        self.num_partitions = num_partitions
        self.min_lsn = min_lsn
        self.precompact = precompact

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._empty()
        mask = pc.and_(
            pc.not_equal(batch.column("op"), pa.scalar("schema_change")),
            pc.greater(batch.column("lsn"), pa.scalar(self.min_lsn, pa.int64())),
        )
        b = batch.filter(mask)
        n = b.num_rows
        cols = {}
        present = {self.renames.get(name, name): b.column(name) for name in b.column_names}
        for f in self.target:
            col = present.get(f.name)
            if col is None:
                cols[f.name] = pa.nulls(n, f.type)
            elif col.type != f.type:
                cols[f.name] = col.cast(f.type)
            else:
                cols[f.name] = col
        out = pa.table(cols)
        out = out.append_column(LSN_COL, b.column("lsn"))
        out = out.append_column(OP_COL, b.column("op"))
        pid = partition_ids(b.column("url"), self.num_partitions)
        out = out.append_column(PID_COL, pa.array(pid, pa.int64()))
        if self.precompact and out.num_rows:
            from .lww import lww_compact_table

            out = lww_compact_table(out)
        return out

    def _empty(self) -> pa.Table:
        fields = list(self.target) + [
            pa.field(LSN_COL, pa.int64()),
            pa.field(OP_COL, pa.string()),
            pa.field(PID_COL, pa.int64()),
        ]
        schema = pa.schema(fields)
        return schema.empty_table()
