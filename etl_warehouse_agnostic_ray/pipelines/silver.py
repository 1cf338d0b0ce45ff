"""A worked "silver model" composed through the step registry.

The reference's transform layer is a set of dbt models that each chain
dedup → typed casts → derived dates → categorization → quality flags
over a bronze table (``dbt/models/curated/repsly/purchase_orders.sql:
15-389`` is the canonical example: row_number()=1 dedup, CAST ladders,
CASE categorization, date_part derivations). This module proves the
repo's extension surface does the same job: each stage is a
``register_step``'d Dataset→Dataset transform, the model is a
``PipelineSpec`` naming them in order, and the whole thing runs through
``PipelineRegistry.run`` — drop-in extension, verified value-for-value
by a DuckDB oracle (``silver_orders`` in pipelines/queries.py).

Every step is a vectorized Arrow map_batches; the dedup step is the
only shuffle (hash partition by business key, first-row-per-key inside
each partition — the engine's LWW pattern applied to a silver model).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import functions as F
from ..lake import partition_ids
from .registry import STEP_REGISTRY, PipelineRegistry, PipelineSpec, register_step

_P = 8  # dedup hash partitions (tiny silver tables; raise at scale)


def _register(name: str):
    """Idempotent register_step (modules can be re-imported)."""

    def deco(fn):
        if name not in STEP_REGISTRY:
            register_step(name)(fn)
        return fn

    return deco


@_register("orders.dedup_latest")
def step_dedup_latest(ds):
    """row_number() OVER (PARTITION BY o_orderkey ORDER BY o_orderdate
    DESC, o_orderkey DESC) = 1 — the purchase_orders.sql:15-39 dedup,
    as a hash-partitioned Arrow sort+first-occurrence mask."""

    def add_pid(b: pa.Table) -> pa.Table:
        pid = partition_ids(
            pc.cast(b.column("o_orderkey"), pa.string()), _P
        )
        return b.append_column("_pid", pa.array(pid, pa.int64()))

    def first_per_key(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("o_orderkey", "ascending"),
                ("o_orderdate", "descending"),
            ],
        )
        s = g.take(idx)
        keys = s.column("o_orderkey").to_numpy(zero_copy_only=False)
        first = np.empty(len(keys), dtype=bool)
        first[0] = True
        first[1:] = keys[1:] != keys[:-1]
        return s.filter(pa.array(first)).drop(["_pid"])

    return (
        ds.map_batches(add_pid, batch_format="pyarrow")
        .groupby("_pid", num_partitions=_P)
        .map_groups(first_per_key, batch_format="pyarrow")
    )


@_register("orders.casts")
def step_casts(ds):
    """Typed casts + rounding (the model's CAST/round ladder)."""

    def body(b: pa.Table) -> pa.Table:
        price = pc.round(
            pc.cast(b.column("o_totalprice"), pa.float64()),
            ndigits=2,
            round_mode="half_towards_infinity",
        )
        return b.append_column("total_price", price)

    return ds.map_batches(body, batch_format="pyarrow")


@_register("orders.quality_flags")
def step_quality_flags(ds):
    """Validation masks (GPS-bounds-style predicate family applied to
    the order domain: positive price)."""

    def body(b: pa.Table) -> pa.Table:
        return b.append_column(
            "is_valid_price",
            pc.greater(b.column("o_totalprice"), pa.scalar(0.0)),
        )

    return ds.map_batches(body, batch_format="pyarrow")


@_register("orders.categorize")
def step_categorize(ds):
    """CASE ladders: status decode, value tier, urgency flag,
    priority rank (purchase_orders.sql categorization style)."""

    def body(b: pa.Table) -> pa.Table:
        p = b.column("o_totalprice")
        tier = pc.case_when(
            pc.make_struct(
                pc.less(p, pa.scalar(50_000.0)),
                pc.less(p, pa.scalar(150_000.0)),
                pc.less(p, pa.scalar(300_000.0)),
            ),
            "small",
            "medium",
            "large",
            "jumbo",
        )
        st = b.column("o_orderstatus")
        status = pc.case_when(
            pc.make_struct(
                pc.equal(st, pa.scalar("O")),
                pc.equal(st, pa.scalar("F")),
                pc.equal(st, pa.scalar("P")),
            ),
            "open",
            "fulfilled",
            "pending",
            "unknown",
        )
        pr1 = pc.utf8_slice_codeunits(b.column("o_orderpriority"), 0, 1)
        urgent = pc.is_in(pr1, value_set=pa.array(["1", "2"]))
        rank = F.to_int_or_null(pr1)
        out = b.append_column("value_tier", tier)
        out = out.append_column("order_status", status)
        out = out.append_column("is_urgent", urgent)
        return out.append_column("priority_rank", rank)

    return ds.map_batches(body, batch_format="pyarrow")


@_register("orders.date_derivations")
def step_date_derivations(ds):
    """Derived date parts (year/month/dow) from the order date."""

    def body(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate")
        out = b.append_column("order_year", pc.cast(pc.year(ts), pa.int64()))
        out = out.append_column("order_month", pc.cast(pc.month(ts), pa.int64()))
        return out.append_column("order_dow", pc.cast(F.to_dow(ts), pa.int64()))

    return ds.map_batches(body, batch_format="pyarrow")


SILVER_ORDERS_COLUMNS = [
    "o_orderkey",
    "o_custkey",
    "order_status",
    "value_tier",
    "is_urgent",
    "priority_rank",
    "is_valid_price",
    "order_year",
    "order_month",
    "order_dow",
    "total_price",
]


def build_silver_orders_registry(source) -> PipelineRegistry:
    """Declarative model spec: source → ordered step names → projection
    sink, exactly how a user would plug a new silver model in."""
    reg = PipelineRegistry()
    reg.add(
        PipelineSpec(
            name="silver_orders",
            source=source,
            steps=[
                "orders.dedup_latest",
                "orders.casts",
                "orders.quality_flags",
                "orders.categorize",
                "orders.date_derivations",
            ],
            sink=functools.partial(_project, cols=SILVER_ORDERS_COLUMNS),
        )
    )
    return reg


def _project(ds, cols):
    return ds.select_columns(cols)


def silver_orders(sf_dir: str):
    """Run the registered silver_orders model over the sf tier's orders
    table; returns the silver Dataset."""
    import ray.data as rd

    reg = build_silver_orders_registry(
        lambda: rd.read_parquet(f"{sf_dir}/orders.parquet")
    )
    return reg.run(only=["silver_orders"])["silver_orders"]


# ---------------------------------------------------------------- gold
@_register("gold.segment_rollup")
def step_segment_rollup(ds):
    """Per (order_year, value_tier) rollup over the SILVER output —
    order count, urgent count, revenue. Group cardinality is tiny
    (years × tiers), so Ray's native map-side-combining aggregates are
    the right shape (the O(groups) per-group cost that rules them out
    for unbounded keys is irrelevant here). Money is summed as exact
    integer cents — float64 Sum order is block-nondeterministic across
    runs, and a sub-ulp drift that crosses the round(…,2) boundary is
    a wrong answer (the q_rollup_revenue_nation_segment pattern)."""
    from ray.data.aggregate import Count, Sum

    def prep(b: pa.Table) -> pa.Table:
        cents = np.round(
            b.column("total_price").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        b = b.append_column(
            "_urgent_i", pc.cast(b.column("is_urgent"), pa.int64())
        )
        return b.append_column("_cents", pa.array(cents))

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["order_year", "value_tier"])
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("_urgent_i", alias_name="urgent_orders"),
            Sum("_cents", alias_name="_cents"),
        )
    )


GOLD_SEGMENT_COLUMNS = [
    "order_year",
    "value_tier",
    "n_orders",
    "urgent_orders",
    "revenue",
    "avg_order_value",
]


def _gold_finalize(ds) -> pa.Table:
    """Tiny-result sink: derive revenue from the exact cents sum
    (deterministic — no float association drift) and the average via
    the oracle's round(revenue / count, 2) arithmetic."""
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    rev = pc.divide(pc.cast(t.column("_cents"), pa.float64()), 100.0)
    avg = pc.round(
        pc.divide(rev, pc.cast(t.column("n_orders"), pa.float64())),
        ndigits=2,
        round_mode="half_towards_infinity",
    )
    t = t.drop(["_cents"]).append_column("revenue", rev)
    t = t.append_column("avg_order_value", avg)
    return t.select(GOLD_SEGMENT_COLUMNS)


def build_orders_models_registry(source) -> PipelineRegistry:
    """silver_orders → gold_segment_summary chained through the
    registry's ``source_pipeline`` (= dbt ``ref()``) edge: the gold
    model's input IS the silver model's output, and asking for gold
    runs silver first via the dependency closure."""
    reg = build_silver_orders_registry(source)
    reg.add(
        PipelineSpec(
            name="gold_segment_summary",
            source_pipeline="silver_orders",
            steps=["gold.segment_rollup"],
            sink=_gold_finalize,
        )
    )
    return reg


def gold_segment_summary(sf_dir: str):
    """Run the silver→gold chain; returns the gold summary table."""
    import ray.data as rd

    reg = build_orders_models_registry(
        lambda: rd.read_parquet(f"{sf_dir}/orders.parquet")
    )
    return reg.run(only=["gold_segment_summary"])["gold_segment_summary"]
