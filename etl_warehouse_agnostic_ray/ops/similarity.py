"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (``ray.put`` once; every task reads the same
object-store copy, zero re-shipping). Scale path: IVF — coarse
centroids (seeded k-means on a sample), search only the nearest
``n_probe`` cells; same per-batch kernel, smaller candidate set.
"""

from __future__ import annotations

import functools
import heapq

import numpy as np
import pyarrow as pa


def _topk_partials(
    batch: pa.Table,
    queries_ref,
    k: int,
    id_col: str,
    vec_col: str,
) -> pa.Table:
    import ray

    Q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
    V = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
    nrm = np.linalg.norm(V, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    S = (V / nrm) @ Q.T  # (n, q)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    n_take = min(k, S.shape[0])
    out_q, out_id, out_s = [], [], []
    for qi in range(Q.shape[0]):
        part = np.argpartition(-S[:, qi], n_take - 1)[:n_take]
        out_q.extend([qi] * n_take)
        out_id.extend(ids[part])
        out_s.extend(S[part, qi])
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(np.asarray(out_id, dtype=np.int64)),
            "cosine": pa.array(np.asarray(out_s, dtype=np.float64)),
        }
    )


def topk_cosine(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Global top-k per query: per-batch partial top-k (map_batches) →
    tiny driver-side heap merge over ≤ (blocks × k × q) rows. The full
    dataset is never materialized; queries are normalized once and
    broadcast via ray.put."""
    import ray

    Q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qref = ray.put(Q / qn)

    partials = ds.map_batches(
        functools.partial(
            _topk_partials, queries_ref=Qref, k=k, id_col=id_col, vec_col=vec_col
        ),
        batch_format="pyarrow",
    )
    heaps: dict[int, list] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for qi, vid, s in zip(
            b.column("query_id").to_pylist(),
            b.column("vec_id").to_pylist(),
            b.column("cosine").to_pylist(),
        ):
            h = heaps.setdefault(qi, [])
            if len(h) < k:
                heapq.heappush(h, (s, vid))
            elif s > h[0][0]:
                heapq.heapreplace(h, (s, vid))
    rows_q, rows_id, rows_s, rows_rank = [], [], [], []
    for qi in sorted(heaps):
        ranked = sorted(heaps[qi], key=lambda t: (-t[0], t[1]))
        for r, (s, vid) in enumerate(ranked, 1):
            rows_q.append(qi)
            rows_id.append(vid)
            rows_s.append(round(s, 6))
            rows_rank.append(r)
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "rank": pa.array(rows_rank, pa.int64()),
            "vec_id": pa.array(rows_id, pa.int64()),
            "cosine": pa.array(rows_s, pa.float64()),
        }
    )
