"""Document chunking: split long texts into fixed-size overlapping
windows — the pre-tokenization sharding step of an LLM training
pipeline (context-window packing, embedding-model input limits).

(The reference's analogue is row-level pagination of long API payloads
— ``extractors/acumatica/extractor.py`` pages records in fixed-size
slices; here the slicing is intra-document over characters.)

Ray-Data shape: a stateless ``map_batches`` body that EXPLODES each
batch (1 doc → ceil(len/stride) chunks) with no shuffle. Variable
per-doc chunk counts are vectorized by iterating over the chunk
ORDINAL (bounded by max_len/stride — ~a dozen for web pages), not over
documents: ordinal i slices every doc long enough to own chunk i with
one `utf8_slice_codeunits` kernel call. Chunks start at 0, stride,
2·stride, …; the last chunk may be short; empty docs yield one empty
chunk (so every input id survives — count invariants hold downstream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_documents(
    batch: pa.Table,
    col: str = "text",
    id_col: str = "doc_id",
    size: int = 200,
    stride: int = 150,
) -> pa.Table:
    """Map_batches body: (id, chunk_id, chunk_text, chunk_len) rows.
    Requires 0 < stride <= size (every character lands in ≥1 chunk)."""
    if not (0 < stride <= size):
        raise ValueError(f"need 0 < stride <= size, got {stride=} {size=}")
    batch = batch.filter(pc.is_valid(batch.column(col)))
    s = pc.cast(batch.column(col), pa.large_string())
    lens = pc.fill_null(pc.utf8_length(s), 0).to_numpy(zero_copy_only=False)
    n_chunks = (np.maximum(lens, 1) - 1) // stride + 1
    pieces = []
    for i in range(int(n_chunks.max(initial=0))):
        mask = pa.array(n_chunks > i)
        sub = s.filter(mask)
        txt = pc.utf8_slice_codeunits(sub, start=i * stride, stop=i * stride + size)
        pieces.append(
            pa.table(
                {
                    id_col: batch.column(id_col).filter(mask),
                    "chunk_id": pa.array(
                        np.full(len(sub), i, dtype=np.int64)
                    ),
                    "chunk_text": txt,
                    "chunk_len": pc.cast(pc.utf8_length(txt), pa.int64()),
                }
            )
        )
    if not pieces:
        return pa.table(
            {
                id_col: pa.array([], batch.column(id_col).type),
                "chunk_id": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.large_string()),
                "chunk_len": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(pieces)


def chunk_sql(
    src: str,
    col: str = "text",
    id_col: str = "doc_id",
    size: int = 200,
    stride: int = 150,
) -> str:
    """DuckDB twin: per-doc generate_series over chunk ordinals +
    substr — identical start/length arithmetic (1-based substr)."""
    return f"""
WITH base AS (
  SELECT {id_col}, {col} AS t,
         (greatest(length({col}), 1) - 1) // {stride} AS maxi
  FROM {src} WHERE {col} IS NOT NULL
), e AS (
  SELECT {id_col}, t, unnest(generate_series(0, maxi)) AS chunk_id FROM base
)
SELECT {id_col}, chunk_id,
       substr(t, chunk_id * {stride} + 1, {size}) AS chunk_text,
       length(substr(t, chunk_id * {stride} + 1, {size}))::BIGINT AS chunk_len
FROM e
"""
