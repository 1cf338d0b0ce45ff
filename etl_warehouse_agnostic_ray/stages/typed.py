"""Block-schema normalization for exchange outputs.

Ray's groupby exchanges emit SCHEMA-LESS empty blocks for empty
partitions — ``map_groups`` never calls the UDF there, so a typed
empty return cannot help — and a schema-less block reaching either
side of ``Dataset.join`` makes Acero's key-field resolution fail
NONDETERMINISTICALLY ("No match or multiple matches for key field
reference ..."), depending on which block the join samples first.
Observed in the wild on the tfidf pair ⋈ df join at sf0.1.

``with_schema(ds, schema)`` pins every block to one explicit schema:
schema-less empties become typed empties, real blocks are projected +
cast (also unifying string/large_string drift). Use it on any join
input that passed through a groupby/aggregate.
"""

from __future__ import annotations

import pyarrow as pa


def with_schema(ds, schema: pa.Schema):
    def _fix(b: pa.Table) -> pa.Table:
        if b.num_columns == 0:
            return schema.empty_table()
        return b.select(schema.names).cast(schema)

    return ds.map_batches(_fix, batch_format="pyarrow")
