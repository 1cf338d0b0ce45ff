"""Connected components over near-duplicate pair graphs + survivor
selection — the operator a training-data pipeline actually runs AFTER
pair generation: transitively-linked near-dups form one group, one
representative (the min doc id) survives.

Reference semantics generalized: the reference's dedup keeps exactly one
row per business key (``dbt/models/curated/repsly/purchase_orders.sql:
15-39``); near-dup GROUP dedup is the web-corpus extension where the
"key" is the transitive closure of the similarity relation.

Scale shape:
- The PAIR set is orders of magnitude smaller than the corpus (it is
  the near-dup subgraph only; singletons never appear). Components over
  it use a driver union-find when the pair count is bounded
  (``pair_limit``, loud failure above — the pairs themselves were
  produced by capped/accounted operators), else distributed min-label
  propagation (iterated joins) — each iteration is two hash joins and a
  coarse-partition min-reduction; label propagation converges in
  O(component diameter) rounds, and near-dup components are shallow
  (most are cliques from identical/near-identical content).
- Survivor filtering over the CORPUS is one broadcast of the loser id
  set (len ≤ |pairs|) — the corpus itself streams, nothing
  materializes.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

logger = logging.getLogger(__name__)


def _union_find_components(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    """{doc_id: component_min_id} for every id appearing in an edge."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by min id keeps the root the component representative
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    return {x: find(x) for x in parent.keys() | set(a.tolist()) | set(b.tolist())}


def connected_components(
    pairs,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    pair_limit: int = 50_000_000,
    max_rounds: int = 64,
):
    """(doc_id, component) for every id that appears in ``pairs``;
    component = min doc id reachable through the pair graph.

    ``pairs`` is a Dataset (or pyarrow Table) of undirected edges.
    Returns a pyarrow Table (the component map is pair-bounded — small
    relative to the corpus by construction).
    """
    import ray

    if isinstance(pairs, pa.Table):
        edge_tbl = pairs.select([a_col, b_col])
    else:
        edge_tbl = pa.concat_tables(
            list(pairs.select_columns([a_col, b_col]).iter_batches(batch_format="pyarrow"))
            or [pa.table({a_col: pa.array([], pa.int64()), b_col: pa.array([], pa.int64())})]
        )
    n_edges = edge_tbl.num_rows
    if n_edges > pair_limit:
        raise ValueError(
            f"connected_components: {n_edges} pairs exceeds pair_limit="
            f"{pair_limit}; raise the limit or pre-partition the graph "
            "(near-dup pair sets this large usually mean the similarity "
            "threshold is too low)"
        )
    a = edge_tbl.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
    b = edge_tbl.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
    comp = _union_find_components(a, b)
    if not comp:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
        )
    ids = np.fromiter(comp.keys(), dtype=np.int64, count=len(comp))
    labels = np.fromiter(comp.values(), dtype=np.int64, count=len(comp))
    order = np.argsort(ids)
    return pa.table(
        {"doc_id": pa.array(ids[order]), "component": pa.array(labels[order])}
    )


def connected_components_distributed(
    pairs, a_col: str = "doc_a", b_col: str = "doc_b", max_rounds: int = 64,
    num_partitions: int = 8,
):
    """Min-label propagation entirely in Dataset operations — the scale
    path when the pair set itself exceeds driver memory. Each round:
    every node's label becomes min(own, neighbours' labels), via an
    edge⋈label join and a coarse-partition vectorized min-reduction;
    stops when a round changes nothing (diameter-bounded).

    Returns a Dataset of (doc_id, component).
    """
    import pyarrow.compute as pc
    import ray.data as rd

    if isinstance(pairs, pa.Table):
        pairs = rd.from_arrow(pairs.select([a_col, b_col]))
    else:
        pairs = pairs.select_columns([a_col, b_col])

    def to_edges(t: pa.Table) -> pa.Table:
        # undirected → both directions
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [t.column(a_col).combine_chunks(), t.column(b_col).combine_chunks()]
                ).cast(pa.int64()),
                "dst": pa.concat_arrays(
                    [t.column(b_col).combine_chunks(), t.column(a_col).combine_chunks()]
                ).cast(pa.int64()),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("src"), "component": t.column("src")})

    def min_per_key(g: pd.DataFrame, key: str, val: str) -> pd.DataFrame:
        k = g[key].to_numpy()
        v = g[val].to_numpy()
        order = np.lexsort((v, k))
        ks, vs = k[order], v[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        return pd.DataFrame({"doc_id": ks[first], "component": vs[first]})

    def dedup_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return min_per_key(g, "doc_id", "component")

    def add_pk(t: pa.Table, col: str) -> pa.Table:
        return t.append_column(
            "pk", pc.bit_wise_and(t.column(col), pa.scalar(255, pa.int64()))
        )

    import functools

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .map_batches(functools.partial(add_pk, col="doc_id"), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(dedup_nodes, batch_format="pandas")
        .materialize()
    )

    def relabel(t: pa.Table) -> pa.Table:
        # neighbour candidate: dst takes src's current label
        return pa.table({"doc_id": t.column("dst"), "component": t.column("component")})

    def checksum(t: pa.Table) -> pa.Table:
        # per-row hash must be NON-linear in (doc_id, component): with a
        # linear mix like (doc·C) ^ component, two rows making the same
        # label transition cancel under the xor aggregate (delta =
        # old^new twice = 0) — and label propagation moves many nodes to
        # the same new label each round, so the "fingerprint unchanged"
        # test fired while labels were still moving. splitmix64 of the
        # combined pair breaks the linearity; the aggregate stays xor
        # (partition-independent).
        from .texthash import splitmix64

        with np.errstate(over="ignore"):
            h = (
                t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                + t.column("component").to_numpy(zero_copy_only=False).astype(np.uint64)
                * np.uint64(0xC2B2AE3D27D4EB4F)
            )
        s = np.bitwise_xor.reduce(splitmix64(h), initial=np.uint64(0))
        return pa.table({"x": pa.array([int(s)], pa.uint64())})

    def _combine(ds) -> int:
        # xor across batches too: xor is commutative/associative, so the
        # fingerprint is independent of how Ray partitioned the rows (a
        # sum of per-batch xors is NOT — it varies with batch boundaries
        # and falsely signalled convergence). iter_batches coalesces the
        # one-row checksum outputs into larger batches — fold EVERY row,
        # not just row 0.
        x = 0
        for b in ds.map_batches(checksum, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            for v in b.column("x").to_pylist():
                x ^= v
        return x

    old_sum = _combine(labels)
    for round_no in range(max_rounds):
        # neighbour labels: edges ⋈ labels on src
        from ..stages.typed import with_schema

        prop = edges.join(
            with_schema(
                labels,
                pa.schema([("doc_id", pa.int64()), ("component", pa.int64())]),
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("doc_id",),
        ).map_batches(relabel, batch_format="pyarrow")
        new_labels = (
            labels.union(prop)
            .map_batches(functools.partial(add_pk, col="doc_id"), batch_format="pyarrow")
            .groupby("pk")
            .map_groups(dedup_nodes, batch_format="pandas")
            .materialize()
        )
        # convergence: did any label change? One fingerprint pass per
        # round — the previous round's fingerprint carries forward
        # (recomputing it doubled the checksum scans)
        new_sum = _combine(new_labels)
        labels = new_labels
        if old_sum == new_sum:
            break
        old_sum = new_sum
    else:
        logger.warning(
            "connected_components_distributed: no convergence in %d rounds "
            "(component diameter exceeds the bound); labels are an upper "
            "approximation", max_rounds,
        )
    return labels


def neardup_survivors(
    docs,
    pairs,
    id_col: str = "doc_id",
    pair_limit: int = 50_000_000,
    broadcast_limit: int = 5_000_000,
    join_partitions: int = 8,
):
    """Keep one representative (min id) per near-dup component plus all
    untouched docs: the GROUP-dedup sink. ``docs`` streams either way;
    a small loser-id set (≤ ``broadcast_limit``) is ``ray.put`` once
    and filtered in-task, a large one becomes a distributed LEFT ANTI
    join (each worker sees only its hash partition of the loser ids
    instead of a full broadcast copy)."""
    import ray

    comp = connected_components(pairs, pair_limit=pair_limit)
    ids = comp.column("doc_id").to_numpy(zero_copy_only=False)
    labels = comp.column("component").to_numpy(zero_copy_only=False)
    losers = np.sort(ids[ids != labels])  # non-representatives

    if len(losers) <= broadcast_limit:
        losers_ref = ray.put(losers)

        def keep(b: pa.Table) -> pa.Table:
            drop = ray.get(losers_ref)
            m = ~np.isin(b.column(id_col).to_numpy(zero_copy_only=False), drop)
            return b.filter(pa.array(m))

        return docs.map_batches(keep, batch_format="pyarrow")

    import ray.data as rd

    losers_ds = rd.from_arrow(pa.table({"_loser_id": pa.array(losers)}))
    return docs.join(
        losers_ds,
        join_type="left_anti",
        num_partitions=join_partitions,
        on=(id_col,),
        right_on=("_loser_id",),
    )
