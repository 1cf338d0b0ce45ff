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

from .texthash import list_col_to_matrix

_PARTIAL_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("vec_id", pa.int64()), ("cosine", pa.float64())]
)


def _topk_partials(
    batch: pa.Table,
    queries_ref,
    k: int,
    id_col: str,
    vec_col: str,
) -> pa.Table:
    import ray

    if batch.num_rows == 0:  # Ray Data can deliver empty blocks
        return _PARTIAL_SCHEMA.empty_table()
    Q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
    V = list_col_to_matrix(batch.column(vec_col))
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


# ------------------------------------------------------------------ IVF
def train_ivf_centroids(
    ds,
    n_clusters: int = 16,
    sample_rows: int = 20_000,
    n_iter: int = 8,
    seed: int = 11,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Coarse quantizer for IVF: seeded k-means (Lloyd) on a driver-side
    sample. The sample is bounded (limit), the model is tiny (k × dim)
    and gets broadcast — the classic small-side pattern."""
    sample = ds.limit(sample_rows).take_all()
    V = np.asarray([r[vec_col] for r in sample], dtype=np.float64)
    nrm = np.linalg.norm(V, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    V = V / nrm
    rng = np.random.Generator(np.random.PCG64(seed))
    C = V[rng.choice(len(V), size=min(n_clusters, len(V)), replace=False)]
    for _ in range(n_iter):
        assign = (V @ C.T).argmax(axis=1)  # cosine on unit vectors
        for j in range(len(C)):
            m = assign == j
            if m.any():
                c = V[m].mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    C[j] = c / n
    return C


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF approximate top-k: assign each row to its nearest coarse
    centroid inside map_batches (one small matmul), search only the
    ``n_probe`` cells nearest each query. With n_probe == n_clusters
    this is exactly brute force; smaller n_probe trades recall for a
    candidate set ~n_probe/n_clusters the size. Scale shape: the
    centroid matrix is broadcast once; no shuffle — per-batch partial
    top-k then driver heap merge, same as the exact path."""
    import ray

    C = train_ivf_centroids(
        ds, n_clusters=n_clusters, seed=seed, vec_col=vec_col
    )
    Q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn
    # per query: the set of probed cells
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, : min(n_probe, len(C))]
    Cref = ray.put(C)
    Qref = ray.put(Qn)
    probe_ref = ray.put(probe)

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        Cm = ray.get(Cref)
        Qm = ray.get(Qref)
        pr = ray.get(probe_ref)
        V = list_col_to_matrix(batch.column(vec_col))
        nrm = np.linalg.norm(V, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        Vn = V / nrm
        cell = (Vn @ Cm.T).argmax(axis=1)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi in range(Qm.shape[0]):
            mask = np.isin(cell, pr[qi])
            if not mask.any():
                continue
            sub = Vn[mask]
            s = sub @ Qm[qi]
            take = min(k, len(s))
            part = np.argpartition(-s, take - 1)[:take]
            out_q.extend([qi] * take)
            out_id.extend(ids[mask][part])
            out_s.extend(s[part])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(np.asarray(out_id, dtype=np.int64)),
                "cosine": pa.array(np.asarray(out_s, dtype=np.float64)),
            }
        )

    heaps: dict[int, list] = {}
    for b in ds.map_batches(partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
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
