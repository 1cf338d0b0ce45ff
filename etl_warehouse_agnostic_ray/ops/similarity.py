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
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

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


def _heap_merge(partials, k: int) -> pa.Table:
    """Driver-side global top-k over the tiny per-batch partial stream
    (≤ blocks × k × q rows): per-query min-heap, ties broken by lower
    vec_id (matches the oracle's ORDER BY cosine DESC, vec_id ASC)."""
    heaps: dict[int, list] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for qi, vid, s in zip(
            b.column("query_id").to_pylist(),
            b.column("vec_id").to_pylist(),
            b.column("cosine").to_pylist(),
        ):
            h = heaps.setdefault(qi, [])
            if len(h) < k:
                heapq.heappush(h, (s, -vid))
            elif (s, -vid) > h[0]:
                heapq.heapreplace(h, (s, -vid))
    rows_q, rows_id, rows_s, rows_rank = [], [], [], []
    for qi in sorted(heaps):
        ranked = sorted(heaps[qi], key=lambda t: (-t[0], -t[1]))
        for r, (s, nvid) in enumerate(ranked, 1):
            rows_q.append(qi)
            rows_id.append(-nvid)
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
    return _heap_merge(partials, k)


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

    return _heap_merge(ds.map_batches(partials, batch_format="pyarrow"), k)


class IVFIndex:
    """Persistent inverted-file ANN index — the real 100-TB shape for
    approximate similarity search (the ephemeral ``ivf_topk`` above
    still assigns every row per query run; this one pays assignment
    ONCE at build and a probe then reads only n_probe cells' files).

    Lake-style layout (same persisted-format contract discipline as
    ``ops/incneardup``'s band index):

      root/params.json          — stamped build contract (n_clusters,
                                  seed, dim, column names, version);
                                  reopening with different params
                                  refuses loudly
      root/centroids.parquet    — the coarse quantizer (k × dim)
      root/cells/cell-NNNNN.parquet — one file per non-empty cell,
                                  rows = (vec_id, cell, NORMALIZED
                                  vector)

    Build: one Ray pipeline — centroids broadcast once, each batch
    assigned vectorized in map_batches, then ONE task per cell writes
    that cell's file (groupby shuffle on cell id; tmp+rename). Search:
    per query rank centroids, take the union of the probed cells across
    queries, ``read_parquet`` ONLY those files, and run the same
    partial-top-k + driver heap merge — rows from a cell outside a
    given query's probe set are masked out per batch. At full probe
    this is exactly brute force."""

    FORMAT_VERSION = 1

    def __init__(self, root: str):
        pfile = os.path.join(root, "params.json")
        if not os.path.exists(pfile):
            raise FileNotFoundError(
                f"no IVF index at {root} (missing params.json) — build one "
                "with IVFIndex.build(...)"
            )
        self.root = root
        self.p = json.load(open(pfile))
        ct = pq.read_table(os.path.join(root, "centroids.parquet"))
        self.C = list_col_to_matrix(ct.column("centroid"))
        self.last_probe_files: list[str] = []

    @staticmethod
    def _cell_path(root: str, cell: int) -> str:
        return os.path.join(root, "cells", f"cell-{cell:05d}.parquet")

    @classmethod
    def build(
        cls,
        ds,
        root: str,
        n_clusters: int = 16,
        seed: int = 11,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IVFIndex":
        params = {
            "version": cls.FORMAT_VERSION,
            "n_clusters": n_clusters,
            "seed": seed,
            "id_col": id_col,
            "vec_col": vec_col,
        }
        pfile = os.path.join(root, "params.json")
        if os.path.exists(pfile):
            stamped = json.load(open(pfile))
            if stamped != params:
                raise RuntimeError(
                    f"IVF index at {root} was built with {stamped}, rebuild "
                    f"requested with {params} — delete the index directory "
                    "to change parameters."
                )
        import ray

        C = train_ivf_centroids(ds, n_clusters=n_clusters, seed=seed, vec_col=vec_col)
        # a rebuild (or a crashed earlier build) may leave cell files
        # whose cells are EMPTY in the new data — start from a clean
        # cells/ dir so probes can never read stale rows
        import shutil

        shutil.rmtree(os.path.join(root, "cells"), ignore_errors=True)
        os.makedirs(os.path.join(root, "cells"), exist_ok=True)
        pq.write_table(
            pa.table({"centroid": pa.array([list(c) for c in C], pa.list_(pa.float64()))}),
            os.path.join(root, "centroids.parquet"),
        )
        Cref = ray.put(C)

        def assign(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "cell": pa.array([], pa.int64()),
                        "embedding": pa.array([], pa.list_(pa.float64())),
                    }
                )
            Cm = ray.get(Cref)
            V = list_col_to_matrix(b.column(vec_col))
            nrm = np.linalg.norm(V, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            Vn = V / nrm
            cell = (Vn @ Cm.T).argmax(axis=1).astype(np.int64)
            n, dim = Vn.shape
            emb = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)),
                pa.array(np.ascontiguousarray(Vn).ravel()),
            )
            return pa.table(
                {
                    "vec_id": pa.array(
                        b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
                    ),
                    "cell": pa.array(cell),
                    "embedding": emb,
                }
            )

        def write_cell(g: pa.Table) -> pa.Table:
            cell = int(g.column("cell")[0].as_py())
            path = cls._cell_path(root, cell)
            tmp = path + ".tmp"
            pq.write_table(g, tmp)
            os.replace(tmp, path)
            return pa.table(
                {
                    "cell": pa.array([cell], pa.int64()),
                    "n": pa.array([g.num_rows], pa.int64()),
                }
            )

        (
            ds.map_batches(assign, batch_format="pyarrow")
            .groupby("cell")
            .map_groups(write_cell, batch_format="pyarrow")
            .count()
        )
        # params.json lands LAST — it is the index's commit marker
        with open(pfile, "w") as f:
            json.dump(params, f)
        return cls(root)

    def search(self, queries: np.ndarray, k: int = 10, n_probe: int = 4) -> pa.Table:
        import ray

        Q = np.asarray(queries, dtype=np.float64)
        qn = np.linalg.norm(Q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        Qn = Q / qn
        n_probe = min(n_probe, len(self.C))
        probe = np.argsort(-(Qn @ self.C.T), axis=1)[:, :n_probe]
        cells = np.unique(probe)
        files = [
            self._cell_path(self.root, int(c))
            for c in cells
            if os.path.exists(self._cell_path(self.root, int(c)))
        ]
        self.last_probe_files = files
        if not files:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        Qref = ray.put(Qn)
        probe_ref = ray.put(probe)

        def partials(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _PARTIAL_SCHEMA.empty_table()
            Qm = ray.get(Qref)
            pr = ray.get(probe_ref)
            Vn = list_col_to_matrix(batch.column("embedding"))  # already unit
            cell = batch.column("cell").to_numpy(zero_copy_only=False)
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            out_q, out_id, out_s = [], [], []
            for qi in range(Qm.shape[0]):
                mask = np.isin(cell, pr[qi])
                if not mask.any():
                    continue
                s = Vn[mask] @ Qm[qi]
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

        ds = ray.data.read_parquet(files)
        return _heap_merge(ds.map_batches(partials, batch_format="pyarrow"), k)
