"""Query registry — the driver contract surface.

One entry per implemented operator from SURVEY.md §2 (+ north-star
extensions). Each entry pairs a Spark plan-builder ``(spark, sf_dir) ->
DataFrame`` with a DuckDB-runnable ANSI-SQL oracle string (or None for
non-SQL-expressible operators → rows-only check).

Cross-engine determinism rules used throughout (so the driver's
order-insensitive value-hash matches):
- every computed column is aliased identically in Spark and SQL;
- double aggregates are summed as DECIMAL (exact, associative — immune to
  partition-order float drift), with derived averages computed by a single
  double division of those exact sums;
- top-k queries always carry a unique tiebreak key in the ordering;
- date-part extractions are cast to INTEGER on the SQL side to match
  Spark's IntegerType.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators import relational as R
from etl_s3_to_redshift_spark.sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    """A registered query: Spark builder + optional DuckDB oracle SQL."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ===========================================================================
# Reference surface (SURVEY.md §2b) on the driver testdata
# ===========================================================================


@register(
    "r1_projection",
    """
    SELECT o_orderkey AS order_id,
           o_custkey  AS customer_id,
           o_totalprice AS total_price,
           o_orderpriority AS priority
    FROM orders
    """,
    doc="R1 projection+aliasing (reference sql_queries.py:135-143).",
)
def r1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.project(
        _t(spark, sf_dir, "orders"),
        {
            "order_id": "o_orderkey",
            "customer_id": "o_custkey",
            "total_price": "o_totalprice",
            "priority": "o_orderpriority",
        },
    )


@register(
    "r2_multikey_left_join",
    """
    SELECT c.c_custkey  AS customer_id,
           c.c_name     AS customer_name,
           s.s_suppkey  AS supplier_id,
           s.s_name     AS supplier_name
    FROM customer c
    LEFT OUTER JOIN supplier s
      ON s.s_nationkey = c.c_nationkey
     AND s.s_acctbal   = c.c_acctbal
    """,
    doc=(
        "R2 multi-key left outer join with a low match rate — the shape of "
        "the reference's 3-key songplay join (sql_queries.py:144-151): "
        "conjunctive equi-keys incl. a numeric equality, unmatched left rows "
        "kept with NULLs. Right side broadcast (diststyle all analogue)."
    ),
)
def r2_multikey_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    joined = R.multi_key_left_join(
        customer,
        supplier,
        on=[("c_nationkey", "s_nationkey"), ("c_acctbal", "s_acctbal")],
        broadcast_right=True,
    )
    return joined.select(
        customer["c_custkey"].alias("customer_id"),
        customer["c_name"].alias("customer_name"),
        supplier["s_suppkey"].alias("supplier_id"),
        supplier["s_name"].alias("supplier_name"),
    )


@register(
    "r2_broadcast_enrich",
    """
    SELECT o.o_orderkey AS order_id,
           o.o_totalprice AS total_price,
           c.c_name AS customer_name,
           c.c_mktsegment AS segment,
           n.n_name AS nation,
           r.r_name AS region,
           CAST(extract(year  FROM o.o_orderdate) AS INTEGER) AS order_year,
           CAST(extract(month FROM o.o_orderdate) AS INTEGER) AS order_month
    FROM orders o
    LEFT OUTER JOIN customer c ON c.c_custkey = o.o_custkey
    LEFT OUTER JOIN nation n   ON n.n_nationkey = c.c_nationkey
    LEFT OUTER JOIN region r   ON r.r_regionkey = n.n_regionkey
    """,
    doc=(
        "Flagship: fact enriched through a broadcast dimension chain "
        "(orders→customer→nation→region) + date-part extraction — the "
        "reference's songplay build recast (R1+R2+R6; diststyle-all dims "
        "= broadcast, README.md:75). The fact side never shuffles."
    ),
)
def r2_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"], "left_outer")
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"], "left_outer")
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"], "left_outer")
    )
    return joined.select(
        orders["o_orderkey"].alias("order_id"),
        orders["o_totalprice"].alias("total_price"),
        customer["c_name"].alias("customer_name"),
        customer["c_mktsegment"].alias("segment"),
        nation["n_name"].alias("nation"),
        region["r_name"].alias("region"),
        F.year(orders["o_orderdate"]).alias("order_year"),
        F.month(orders["o_orderdate"]).alias("order_month"),
    )


@register(
    "r4_distinct_projection",
    """
    SELECT DISTINCT c_nationkey AS nation_id, c_mktsegment AS segment
    FROM customer
    """,
    doc="R4 DISTINCT on the projected tuple (reference sql_queries.py:157).",
)
def r4_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.distinct_projection(
        _t(spark, sf_dir, "customer"),
        {"nation_id": "c_nationkey", "segment": "c_mktsegment"},
    )


@register(
    "r5_notnull_filter",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id IS NOT NULL AND event_type = 'click'
    """,
    doc=(
        "R5 IS-NOT-NULL filter (reference sql_queries.py:159,167,176) plus a "
        "selective predicate so pushdown does real work."
    ),
)
def r5_notnull_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & (F.col("event_type") == "click"))
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "r6_time_dim",
    """
    SELECT DISTINCT
           o_orderdate AS start_time,
           CAST(extract(hour  FROM o_orderdate) AS INTEGER) AS hour,
           CAST(extract(day   FROM o_orderdate) AS INTEGER) AS day,
           CAST(extract(week  FROM o_orderdate) AS INTEGER) AS week,
           CAST(extract(month FROM o_orderdate) AS INTEGER) AS month,
           CAST(extract(year  FROM o_orderdate) AS INTEGER) AS year
    FROM orders
    """,
    doc=(
        "R6+R4 — the reference's time-dimension build (sql_queries.py:180-189) "
        "on o_orderdate: DISTINCT timestamps + extract(hour/day/week/month/"
        "year). Both engines use ISO week."
    ),
)
def r6_time_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    parts = R.date_parts("o_orderdate")
    return orders.select(
        F.col("o_orderdate").alias("start_time"),
        parts["hour"].alias("hour"),
        parts["day"].alias("day"),
        parts["week"].alias("week"),
        parts["month"].alias("month"),
        parts["year"].alias("year"),
    ).distinct()


@register(
    "r8_count_rows",
    "SELECT count(*) AS n_rows FROM lineitem",
    doc="R8 count(*) (reference test_etl.ipynb verification probes).",
)
def r8_count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.count_rows(_t(spark, sf_dir, "lineitem"))


@register(
    "r9_top_k",
    """
    SELECT o_orderkey AS order_id, o_totalprice AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc=(
        "R9 LIMIT, made deterministic as top-k with a unique tiebreak. "
        "Physically TakeOrderedAndProject: per-partition heaps, no full sort."
    ),
)
def r9_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return R.top_k(
        orders.select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").alias("total_price"),
        ),
        [F.col("total_price").desc(), F.col("order_id").asc()],
        10,
    )


# ---------------------------------------------------------------------------
# Driver-contract exports
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
