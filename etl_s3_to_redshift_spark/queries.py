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
    """A registered query: Spark builder + optional DuckDB oracle SQL.

    ``oracle_sf`` marks a PRECOMPUTED-EXPECTATION oracle (a VALUES table
    derived by an independent implementation) that is only valid at one
    scale factor — the driver's correctness gate runs at sf0.01, which is
    what these pin. tools/check_oracle.py downgrades such queries to a
    rows-only check at any other sf_dir instead of reporting a bogus
    mismatch."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    oracle_sf: str | None = None


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", oracle_sf: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(spark=fn, oracle=oracle, doc=doc, oracle_sf=oracle_sf)
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
        "= broadcast, README.md:75). Bounded dims (nation/region) carry "
        "pinned hints; customer — which grows with SF, like the "
        "reference's users dim grows with the log — is size-driven: AQE "
        "broadcasts it while it fits (every test SF, so the fact side "
        "never shuffles here) and falls back to a shuffle join at the "
        "scale where replication would OOM, exactly the call a Redshift "
        "DBA would make by switching diststyle all→key."
    ),
)
def r2_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"], "left_outer")
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


# ===========================================================================
# Analytics extensions (SURVEY.md §2c ★ / §7 M2): aggregation, windows,
# set-ops, sessionization — the bench-relevant surface
# ===========================================================================


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag AS return_flag,
           l_linestatus AS line_status,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))
                    * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)      AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "TPC-H Q1 shape: scan-heavy groupBy with 6 aggregates. All money "
        "arithmetic in DECIMAL (operands are 2-decimal values, so the "
        "operand cast is unambiguous and every product/sum is exact and "
        "partition-order-independent); final values surface as DOUBLE. "
        "Catalyst does map-side partial agg; only 4 groups cross the "
        "shuffle."
    ),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.analytics import money, ratio

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    disc_price = money("l_extendedprice") * (1 - money("l_discount"))
    charge = disc_price * (1 + money("l_tax"))
    agg = li.groupBy(
        F.col("l_returnflag").alias("return_flag"),
        F.col("l_linestatus").alias("line_status"),
    ).agg(
        F.sum(money("l_quantity")).alias("sum_qty_d"),
        F.sum(money("l_extendedprice")).alias("sum_base_d"),
        F.sum(disc_price).alias("sum_disc_d"),
        F.sum(charge).alias("sum_charge_d"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "return_flag",
        "line_status",
        F.col("sum_qty_d").cast("double").alias("sum_qty"),
        F.col("sum_base_d").cast("double").alias("sum_base_price"),
        F.col("sum_disc_d").cast("double").alias("sum_disc_price"),
        F.col("sum_charge_d").cast("double").alias("sum_charge"),
        ratio(F.col("sum_qty_d"), F.col("count_order")).alias("avg_qty"),
        ratio(F.col("sum_base_d"), F.col("count_order")).alias("avg_price"),
        "count_order",
    )


@register(
    "q3_top_revenue_orders",
    """
    SELECT l.l_orderkey AS order_id,
           o.o_orderdate AS order_date,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, order_id
    LIMIT 10
    """,
    doc=(
        "TPC-H Q3 shape: selective dim filter → join → group → top-k. "
        "orders and (filtered) customer both grow with the dataset, so no "
        "broadcast hint is pinned — AQE broadcasts at small SF and falls "
        "back to shuffle joins at fact scale (diststyle-even analogue, "
        "reference sql_queries.py:76). Final top-k is TakeOrderedAndProject "
        "(no global sort)."
    ),
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.analytics import money

    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * (1 - money("l_discount"))
    # Pre-aggregate revenue per orderkey BEFORE the join: orders x
    # customer is 1:1 per order, so the per-order sum is join-invariant,
    # and the join's lineitem side shrinks to one row per order (the
    # pre-agg shuffle replaces the join shuffle on the same key — the
    # exchange is reused, not added). Decimal partials keep exactness.
    rev = li.groupBy(li["l_orderkey"].alias("order_id")).agg(
        F.sum(revenue).alias("__rev_dec")
    )
    joined = rev.join(
        o.join(c, o["o_custkey"] == c["c_custkey"], "inner"),
        rev["order_id"] == o["o_orderkey"],
        "inner",
    )
    agg = joined.select(
        "order_id",
        o["o_orderdate"].alias("order_date"),
        F.col("__rev_dec").cast("double").alias("revenue"),
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("order_id").asc()).limit(10)


@register(
    "q5_nation_revenue",
    """
    SELECT n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc=(
        "TPC-H Q5 shape: 5-table star join with a region filter. Only the "
        "bounded dimensions (nation×region: 25×5 rows at every SF) are "
        "broadcast; customer/orders/lineitem all grow with the dataset, so "
        "their joins are left to AQE — broadcast at small SF, shuffle "
        "(sort-merge) at fact scale. Diststyle-all for true dims, "
        "diststyle-even for facts (reference sql_queries.py:76)."
    ),
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.analytics import money

    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"], "inner")),
               c["c_nationkey"] == n["n_nationkey"], "inner")
    )
    ord_dim = o.join(dims, o["o_custkey"] == c["c_custkey"], "inner")
    joined = li.join(ord_dim, li["l_orderkey"] == o["o_orderkey"], "inner")
    revenue = money("l_extendedprice") * (1 - money("l_discount"))
    return joined.groupBy(n["n_name"].alias("nation")).agg(
        F.sum(revenue).cast("double").alias("revenue")
    )


@register(
    "w1_top_orders_per_customer",
    """
    SELECT customer_id, order_id, total_price, rn
    FROM (
      SELECT o_custkey AS customer_id,
             o_orderkey AS order_id,
             o_totalprice AS total_price,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
    doc=(
        "Window top-k per group (row_number over partition). One shuffle "
        "on the group key; unique tiebreak makes it deterministic."
    ),
)
def w1_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.analytics import top_k_per_group

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.col("o_totalprice").alias("total_price"),
    )
    return top_k_per_group(
        o,
        ["customer_id"],
        [F.col("total_price").desc(), F.col("order_id").asc()],
        3,
    )


@register(
    "w2_running_user_value",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events
    """,
    doc=(
        "Running aggregate window over the event stream (batch form). "
        "Decimal accumulator keeps the running sum exact at every prefix."
    ),
)
def w2_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double").alias("running_value"),
    )


@register(
    "t1_hourly_event_rollup",
    """
    SELECT date_trunc('hour', ts) AS bucket,
           event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    doc=(
        "Tumbling-window aggregate over the event table (batch twin of the "
        "streaming hourly rollup in streaming/windows.py): hypertable-style "
        "time-bucket rollup via date_trunc."
    ),
)
def t1_hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
    )


@register(
    "sessionize_events",
    """
    WITH g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) >= 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts,
           CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM g
    """,
    doc=(
        "Gap-based sessionization (30-min gap): lag + flag + running sum — "
        "the islands pattern (operators/analytics.sessionize). Streaming "
        "twin: F.session_window. One shuffle on user_id."
    ),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.analytics import sessionize

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return sessionize(ev, "user_id", "ts", gap_minutes=30)


@register(
    "semi_join_active_customers",
    """
    SELECT c_custkey AS customer_id, c_name AS customer_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    doc=(
        "Left semi join (EXISTS): customers having a >300k order. The semi "
        "join short-circuits per probe row — no fact duplication."
    ),
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
    )


@register(
    "anti_join_dormant_customers",
    """
    SELECT c_custkey AS customer_id, c_name AS customer_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Left anti join (NOT EXISTS): customers with no urgent orders.",
)
def anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
    )


@register(
    "rollup_revenue",
    """
    SELECT l_returnflag AS return_flag,
           l_linestatus AS line_status,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
           count(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc=(
        "Hierarchical ROLLUP aggregate (subtotals + grand total) — "
        "grouping-sets family; Catalyst expands to a single shuffle."
    ),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup(F.col("l_returnflag").alias("return_flag"), F.col("l_linestatus").alias("line_status"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "json_extract_props",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS prop_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
    doc=(
        "JSON scalar extraction from a string column (the reference's "
        "semi-structured ingestion surface, applied at query time)."
    ),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    prop = F.get_json_object(F.col("props"), "$.k")
    return ev.select("event_id", prop.alias("prop_k")).filter(F.col("prop_k").isNotNull())


@register(
    "set_op_priority_orders",
    """
    SELECT o_orderkey AS order_id FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
    EXCEPT
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
          AND o_totalprice <= 400000
    """,
    doc="Set operations: UNION (dedup) + EXCEPT chained, ANSI semantics.",
)
def set_op_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_orderkey").alias("order_id"))
    big = o.filter(F.col("o_totalprice") > 400000).select(F.col("o_orderkey").alias("order_id"))
    excl = o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") <= 400000)
    ).select(F.col("o_orderkey").alias("order_id"))
    # (A UNION B) EXCEPT C, left-to-right as in ANSI; subtract == EXCEPT DISTINCT
    return urgent.union(big).distinct().subtract(excl)


@register(
    "full_outer_reconcile",
    """
    SELECT coalesce(c.c_custkey, s.s_suppkey) AS entity_id,
           c.c_name AS customer_name,
           s.s_name AS supplier_name
    FROM customer c
    FULL OUTER JOIN supplier s ON c.c_custkey = s.s_suppkey
    """,
    doc=(
        "Full outer join (id-space reconciliation): rows surviving from "
        "either side with NULLs opposite — completes the outer-join family "
        "(left outer is R2)."
    ),
)
def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    joined = c.join(s, c["c_custkey"] == s["s_suppkey"], "full_outer")
    return joined.select(
        F.coalesce(c["c_custkey"], s["s_suppkey"]).alias("entity_id"),
        c["c_name"].alias("customer_name"),
        s["s_name"].alias("supplier_name"),
    )


@register(
    "cross_join_region_nation",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           (n.n_regionkey = r.r_regionkey) AS is_home
    FROM region r CROSS JOIN nation n
    """,
    doc=(
        "Explicit cross join of two tiny dims (the only legitimate cross "
        "join shape: bounded × bounded) — planned as a broadcast nested "
        "loop, never a partitioned cartesian."
    ),
)
def cross_join_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_home"),
    )


@register(
    "q4_order_priority_check",
    """
    SELECT o_orderpriority AS priority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape: correlated EXISTS with an inequality on the "
        "correlated columns → left semi join with a residual condition, "
        "then count per priority."
    ),
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    matched = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return matched.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "q6_revenue_forecast",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6 shape: pure filter-scan aggregate — every predicate "
        "pushes to the parquet scan; the whole query is one codegen stage."
    ),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.analytics import money

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(money("l_extendedprice") * money("l_discount")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q10_top_returners",
    """
    SELECT c.c_custkey AS customer_id,
           c.c_name AS customer_name,
           n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, customer_id
    LIMIT 20
    """,
    doc=(
        "TPC-H Q10 shape: returned-item revenue per customer, top-20. "
        "lineitem filtered at the scan on returnflag; only nation (25 rows "
        "at every SF) keeps a broadcast hint — orders and customer are "
        "fact-scale, their join strategy is AQE's call."
    ),
)
def q10_top_returners(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.analytics import money

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    revenue = money("l_extendedprice") * (1 - money("l_discount"))
    # Two-stage partial aggregation: per-order sums BEFORE the orders
    # join (join-invariant — orders are unique per orderkey), then
    # per-customer sums BEFORE the dim joins, so customer/nation join
    # one row per customer instead of per returned lineitem. Decimal
    # addition is associative, so staging the sum is exact.
    rev = li.groupBy("l_orderkey").agg(F.sum(revenue).alias("__rev"))
    per_cust = (
        rev.join(o, rev["l_orderkey"] == o["o_orderkey"])
        .groupBy(o["o_custkey"].alias("__ck"))
        .agg(F.sum("__rev").alias("__rev_c"))
    )
    agg = (
        per_cust.join(c, F.col("__ck") == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            c["c_custkey"].alias("customer_id"),
            c["c_name"].alias("customer_name"),
            n["n_name"].alias("nation"),
            F.col("__rev_c").cast("double").alias("revenue"),
        )
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("customer_id").asc()).limit(20)


@register(
    "q14_promo_share",
    """
    SELECT 100.0 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                    THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                    ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
           / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS promo_share_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1995-07-01 00:00:00'
    """,
    doc=(
        "TPC-H Q14 shape: conditional aggregation ratio (promo revenue "
        "share). Both sums exact decimal; one double division at the end. "
        "part grows with SF (200k rows/SF) so it carries no broadcast "
        "hint — AQE broadcasts while it fits and shuffle-joins beyond."
    ),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.analytics import money

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    joined = li.join(p, li["l_partkey"] == p["p_partkey"])
    rev = money("l_extendedprice") * (1 - money("l_discount"))
    promo = F.when(p["p_type"].like("PROMO%"), rev).otherwise(F.lit(0).cast("decimal(25,4)"))
    agg = joined.agg(
        F.sum(promo).cast("double").alias("promo_rev"),
        F.sum(rev).cast("double").alias("total_rev"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_share_pct")
    )


@register(
    "q18_large_orders",
    """
    SELECT o.o_orderkey AS order_id,
           o.o_custkey AS customer_id,
           o.o_totalprice AS total_price,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey, o.o_totalprice
    HAVING sum(CAST(l.l_quantity AS DECIMAL(12,2))) > 150
    ORDER BY total_qty DESC, order_id
    LIMIT 20
    """,
    doc=(
        "TPC-H Q18 shape: GROUP BY + HAVING on an aggregate + top-k. "
        "Scale plan: lineitem is pre-aggregated on the join key FIRST "
        "(map-side partial agg, then HAVING shrinks it to the few "
        "qualifying orders) and only that residue joins orders — "
        "equivalent to the grouped fact-fact join because o_orderkey is "
        "unique in orders. The aggregated residue carries a SHUFFLE_HASH "
        "hint: AQE still upgrades it to broadcast when the HAVING output "
        "is small, but when it is not (sf100: 29M qualifying orders) the "
        "hint avoids sort-merge's full sort of the orders fact — the "
        "build side per reduce partition is residue/numShufflePartitions, "
        "bounded on a real cluster where partitions scale with data "
        "(measured sf100 local[32]: 142.6s SMJ -> 74.6s SHJ)."
    ),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("__qty"))
        .filter(F.col("__qty") > 150)
    )
    joined = o.join(qty.hint("shuffle_hash"), o["o_orderkey"] == qty["l_orderkey"])
    return (
        joined.select(
            o["o_orderkey"].alias("order_id"),
            o["o_custkey"].alias("customer_id"),
            o["o_totalprice"].alias("total_price"),
            F.col("__qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("order_id").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Driver-contract exports
# ---------------------------------------------------------------------------


def _load_extensions() -> None:
    """Import side-registering query modules (idempotent)."""
    from etl_s3_to_redshift_spark import (  # noqa: F401
        queries_data,
        queries_ops2,
        queries_ops3,
        queries_ops4,
        queries_ops5,
        queries_ops6,
        queries_ops7,
        queries_ops8,
        queries_ops9,
        queries_ops10,
        queries_ops11,
        queries_ops12,
        queries_scalar,
        queries_tpch2,
    )


# The external driver verifies at most the first 50 ``queries()`` entries
# per round.  Cumulative r1|..|r8 coverage is 185/185 registered queries,
# every checked row a triple match.  The 50-per-round cap means driver
# rows go stale, so each round rotates the slate by freshness: queries
# REGISTERED this round (no driver evidence at all) outrank every
# refresh, then the cohort whose newest driver row is OLDEST.  After
# round 8 the freshness census (CORRECTNESS_r0*.json keys) is r5:35,
# r6:50, r7:50, r8:50 — so the round-9 slate is the queries registered
# this round (the staged BM25 probe and the all-saved hybrid), the full
# 35-query r5 remainder (exactly the cohort VERDICT r8 prescribed),
# then the oldest-registered r6-cohort entries up to the cap.  Every
# query stays verifiable locally via tools/check_oracle.py (no cap).
_DRIVER_FIRST = [
    # registered round 10 (zero driver evidence yet): the URL-level
    # curation funnel and the PSL registered-domain lookup
    "web_curation_funnel",
    "web_psl_domains",
    # r6 cohort: all 41 queries whose newest driver row is round 6
    # (CORRECTNESS_r06 minus every later slate — the freshness rotation)
    "agg_bool_bit_suite",
    "agg_corr_regression",
    "approx_heavy_hitters",
    "approx_sketches",
    "data_curation_funnel",
    "data_dsir_weights",
    "data_token_budget",
    "data_training_order",
    "dedup_exact_substrings",
    "dedup_groups_incremental",
    "dedup_keep_best_quality",
    "dedup_lines_keepfirst",
    "dedup_repeated_chunks",
    "dedup_semantic_clusters",
    "emb_bitext_margin",
    "emb_bitext_margin_ann",
    "emb_hard_negatives",
    "emb_kcenter_coreset",
    "emb_label_centroids",
    "emb_prototypes_prune",
    "grouping_sets_orders",
    "hist_equidepth_deciles",
    "mm_resize_thumbs",
    "null_safe_join_events",
    "regex_suite",
    "rollup_incremental_merge",
    "scalar_datetime_suite",
    "scalar_math_conditional",
    "scalar_try_safe_suite",
    "sim_hybrid_rrf",
    "skew_key_profile",
    "text_bm25_topk",
    "text_c4_rules",
    "text_decontaminate",
    "text_gopher_rules",
    "text_ngram_novelty",
    "text_perplexity_buckets",
    "text_tokenizer_report",
    "ts_gapfill_hourly",
    "udf_minmax_normalize",
    "w4_value_range_frames",
    # r7 cohort head: fills the slate to the 50-cap; the remainder
    # leads round 11
    "agg_mode_median",
    "anti_join_dormant_customers",
    "array_map_suite",
    "asof_next_purchase",
    "attr_multi_touch",
    "cohort_retention_weekly",
    "cross_join_region_nation",
]


def _export_order() -> list[str]:
    _load_extensions()
    first = [n for n in _DRIVER_FIRST if n in REGISTRY]
    middle = [n for n, s in REGISTRY.items() if n not in first and s.oracle is not None]
    last = [n for n, s in REGISTRY.items() if n not in first and s.oracle is None]
    return first + middle + last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].spark for name in _export_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _export_order()
        if REGISTRY[name].oracle is not None
    }
