"""Benchmark decontamination: flag training documents whose k-token
shingles overlap an evaluation corpus — the standard "did the test set
leak into the training data" check every LLM pipeline runs before
training (n-gram overlap decontamination, GPT-3 appendix C / PaLM
practice, public).

(The reference's closest analogue is the batch-level duplicate guard —
``airflow/dags/repsly_dag.py`` skips already-loaded batches by id;
here membership is content-defined at the n-gram level against a
reference corpus.)

Ray-Data shape (100-TB discipline):
- The EVAL side is small by definition (benchmarks: 10⁴-10⁶ docs), the
  TRAIN side is the 100-TB stream. So: reduce the eval corpus to its
  distinct shingle-hash set ONCE (distributed per-batch distincts →
  driver union), `ray.put` the sorted array, and stream train batches
  against it with a vectorized searchsorted — zero shuffle on the
  train side, the broadcast read is zero-copy from the object store.
- The driver-side eval set is bounded by ``eval_shingle_limit``
  (uint64 hashes: 8 bytes each → the default 200M ≈ 1.6 GB). Above
  it the op fails LOUDLY rather than OOM — a join-based fallback would
  shuffle the full train shingle stream, which is the wrong default
  for a decontamination pass; shard the eval set instead.
- Shingle semantics are ``texthash.shingle_hashes`` (distinct k-token
  polynomial hashes per doc, short docs zero-padded), so the DuckDB
  twin replays membership exactly via ``hash_sql.shingle_cte``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .texthash import shingle_hashes


def eval_shingle_set(
    eval_ds,
    text_col: str = "text",
    k: int = 3,
    eval_shingle_limit: int = 200_000_000,
) -> np.ndarray:
    """Distinct shingle hashes of the eval corpus, sorted uint64.
    Per-batch distincts reduce in the cluster; the driver unions the
    (much smaller) partials."""

    def batch_distinct(b: pa.Table) -> pa.Table:
        vals, _, _ = shingle_hashes(b.column(text_col), k=k)
        return pa.table({"s": pa.array(np.unique(vals).view(np.int64))})

    parts = []
    total = 0
    for b in eval_ds.map_batches(batch_distinct, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        a = b.column("s").to_numpy(zero_copy_only=False).view(np.uint64)
        total += len(a)
        if total > eval_shingle_limit:
            raise ValueError(
                f"eval corpus exceeds eval_shingle_limit={eval_shingle_limit} "
                "distinct shingles; shard the eval set and run per shard"
            )
        parts.append(a)
    if not parts:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(parts))


def contamination_check(
    train_ds,
    eval_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    eval_shingle_limit: int = 200_000_000,
):
    """Per train doc: distinct-shingle count, eval-overlap count,
    overlap fraction, and a ``contaminated`` flag (frac >= threshold).
    Docs with no shingles (empty text) report 0 / false."""
    import ray

    sset = eval_shingle_set(
        eval_ds, text_col=text_col, k=k, eval_shingle_limit=eval_shingle_limit
    )
    ref = ray.put(sset)

    def score(b: pa.Table) -> pa.Table:
        ev = ray.get(ref)
        vals, segs, starts = shingle_hashes(b.column(text_col), k=k)
        n = len(b)
        n_sh = np.diff(starts)
        if len(vals) and len(ev):
            pos = np.searchsorted(ev, vals)
            pos[pos == len(ev)] = 0
            hit = ev[pos] == vals
            n_hit = np.bincount(segs[hit], minlength=n)
        else:
            n_hit = np.zeros(n, np.int64)
        frac = np.where(n_sh > 0, n_hit / np.maximum(n_sh, 1), 0.0)
        return pa.table(
            {
                id_col: b.column(id_col),
                "n_shingles": pa.array(n_sh.astype(np.int64)),
                "n_overlap": pa.array(n_hit.astype(np.int64)),
                "contam_frac": pa.array(frac),
                "contaminated": pa.array(frac >= threshold),
            }
        )

    return train_ds.map_batches(score, batch_format="pyarrow")


def contamination_sql(
    doc_src: str = "documents",
    eval_pred: str = "doc_id % 17 = 0",
    k: int = 3,
    threshold: float = 0.8,
) -> str:
    """DuckDB twin: same shingles (hash_sql.shingle_cte), eval set =
    ``doc_src`` rows satisfying ``eval_pred``, LEFT JOIN membership."""
    from ..pipelines.hash_sql import shingle_cte

    return f"""
WITH {shingle_cte(doc_src, k)},
ev AS (SELECT DISTINCT s FROM shingle WHERE {eval_pred}),
cnt AS (
  SELECT t.doc_id, count(*) AS n_sh,
         sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM shingle t LEFT JOIN ev USING (s)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       coalesce(c.n_sh, 0)::BIGINT AS n_shingles,
       coalesce(c.n_hit, 0)::BIGINT AS n_overlap,
       coalesce(c.n_hit / c.n_sh::DOUBLE, 0.0) AS contam_frac,
       coalesce(c.n_hit / c.n_sh::DOUBLE, 0.0) >= {threshold} AS contaminated
FROM {doc_src} d LEFT JOIN cnt c USING (doc_id)
"""
