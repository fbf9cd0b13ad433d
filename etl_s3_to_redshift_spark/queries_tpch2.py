"""Round-2 TPC-H-shaped registry queries — the join/subquery shapes the
round-1 suite did not yet exercise.

Each query is the standard TPC-H shape adapted to the driver testdata
schema (no partsupp table; lineitem has l_shipdate only, so "late" is
re-expressed against o_orderdate; p_container/l_shipmode predicates map
onto p_brand/p_size/l_linestatus):

- q7  disjunctive two-nation join filter (OR of nation pairs)
- q8  market-share: conditional CASE aggregate over a 7-table join
- q9  profit: LIKE-filtered multi-join with a decimal difference measure
- q12 CASE-counting aggregate with date arithmetic in the join filter
- q13 outer join with ON-clause predicate + two-level aggregation
- q15 scalar-max selection over a derived revenue view
- q16 count(DISTINCT) + NOT IN anti-join on a secondary table
- q17 correlated scalar subquery (per-part average) re-expressed as a
      pre-aggregated self-join
- q19 OR-of-ANDs pushdown across a join boundary
- q21 self-join EXISTS + NOT EXISTS (semi + anti on the same fact)
- q22 global scalar subquery + anti-join (dormant high-balance accounts)
- q11 group + self-referential scalar threshold (important stock)
- q20 nested semi-joins with a correlated grouped threshold

Scale notes (100 TB design point): none of these broadcast a fact-scale
side — nation/region (25/5 rows at every SF) are the only hinted
broadcasts; supplier/part/customer/orders/lineitem joins are left to AQE
statistics (sort-merge at scale, broadcast only when a filtered side
measures small at runtime). The q21 self-joins are equi-joins on
l_orderkey, so all three branches hash to the same shuffle partitioning
and the semi/anti stages reuse it without a second shuffle.

Exactness rules (see queries.py module docstring): decimal operand
casts before arithmetic, single double division of exact sums, count ->
BIGINT on both engines.

Reference anchor: the reference executes fixed SQL text over Redshift
(/root/reference/sql_queries.py:121-190); these queries are the Spark
re-expression of the analytical-shape coverage its warehouse would serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.analytics import money, ratio
from etl_s3_to_redshift_spark.queries import _t, register

_REV = """CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)"""


def _rev_col() -> F.Column:
    return money("l_extendedprice") * (F.lit(1) - money("l_discount"))


@register(
    "q7_nation_trade_volume",
    f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(extract(year FROM l.l_shipdate) AS INTEGER) AS ship_year,
           {_REV} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, ship_year
    """,
    doc=(
        "TPC-H Q7 shape: trade volume between two nations, either "
        "direction, by ship year. The nation-pair disjunction sits above "
        "two broadcast nation joins; supplier/orders/customer joins are "
        "AQE's call (all grow with SF)."
    ),
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    j = (
        l.join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n1, s["s_nationkey"] == F.col("s_nk"))
        .join(n2, c["c_nationkey"] == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(F.sum(_rev_col()).cast("double").alias("revenue"))


@register(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(extract(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(12,2))) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n2.n_regionkey
      WHERE r.r_name = 'EUROPE'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) allsales
    GROUP BY o_year
    """,
    doc=(
        "TPC-H Q8 shape: one nation's share of a part segment's revenue "
        "in a region, by order year — conditional CASE aggregate over a "
        "7-table join. Share is a single double division of two exact "
        "decimal sums. nation/region broadcast; everything else AQE."
    ),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")))
    j = (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n1, s["s_nationkey"] == F.col("s_nk"))
        .join(n2, c["c_nationkey"] == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r["r_regionkey"])
    )
    vol = _rev_col()
    agg = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0))).alias("__num"),
        F.sum(vol).alias("__den"),
    )
    return agg.select("o_year", ratio(F.col("__num"), F.col("__den")).alias("mkt_share"))


@register(
    "q9_product_profit",
    """
    SELECT n.n_name AS supp_nation,
           CAST(extract(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                    - CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY supp_nation, o_year
    """,
    doc=(
        "TPC-H Q9 shape: profit (revenue minus cost, both exact decimal "
        "products) per supplier nation per year, for LIKE-matched parts. "
        "p_retailprice*l_quantity stands in for the reference schema's "
        "ps_supplycost (no partsupp table in the testdata). The LIKE "
        "filter prunes part before the join; nation broadcasts."
    ),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = _rev_col() - money("p_retailprice") * money("l_quantity")
    j = (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    return j.groupBy(
        F.col("n_name").alias("supp_nation"), F.year("o_orderdate").alias("o_year")
    ).agg(F.sum(amount).cast("double").alias("profit"))


@register(
    "q12_late_shipment_priority",
    """
    SELECT l.l_linestatus AS linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY linestatus
    """,
    doc=(
        "TPC-H Q12 shape: late shipments (shipped >60 days after order "
        "date — the testdata has no commit/receipt dates) counted by "
        "line status, split into high/low order priority via CASE "
        "counting. Date arithmetic sits in the join filter; the shipdate "
        "range pushes to the scan."
    ),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return j.groupBy(F.col("l_linestatus").alias("linestatus")).agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


@register(
    "q13_order_count_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc=(
        "TPC-H Q13 shape: distribution of per-customer order counts, "
        "with a non-key predicate inside the outer-join ON clause (it "
        "must null-extend, not filter). Two-level aggregation: the first "
        "groups on the join key (reuses the join's hash partitioning), "
        "the second is a 1500-group shuffle of an already-tiny input."
    ),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o["o_custkey"] == c["c_custkey"]) & (o["o_orderpriority"] != "1-URGENT"),
            "left_outer",
        )
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))


@register(
    "q15_top_revenue_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS supplier_id,
           s.s_name AS supplier_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc=(
        "TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue "
        "— a derived revenue view consumed twice (once for the max, once "
        "for the equality selection). The max is exact decimal, so the "
        "equality is safe cross-engine. Spark computes the view once and "
        "self-joins against its 1-row max aggregate (broadcast)."
    ),
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_col()).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("__max_rev"))
        .join(s, F.col("supplier_no") == s["s_suppkey"])
        .select(
            s["s_suppkey"].alias("supplier_id"),
            s["s_name"].alias("supplier_name"),
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_part_count",
    """
    SELECT p.p_brand AS brand,
           p.p_type AS type,
           p.p_size AS size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY brand, type, size
    """,
    doc=(
        "TPC-H Q16 shape: distinct supplier count per part attribute "
        "group, excluding a NOT IN supplier set (negative balance stands "
        "in for the reference's complaint filter; lineitem is the "
        "part-supplier bridge — no partsupp table). NOT IN on a non-null "
        "key compiles to a left-anti join; count(DISTINCT) expands to a "
        "two-phase exact aggregate."
    ),
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    # No broadcast hint on the excluded-supplier set: supplier grows with
    # SF (unlike nation/region), so the anti-join strategy is AQE's call.
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    j = (
        l.join(bad_supp, l["l_suppkey"] == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("l_partkey") == p["p_partkey"])
    )
    return j.groupBy(
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("type"),
        F.col("p_size").alias("size"),
    ).agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
      )
    """,
    doc=(
        "TPC-H Q17 shape: revenue from below-one-fifth-of-average-"
        "quantity orders. The correlated per-part average is re-expressed "
        "as a pre-aggregated self-join on l_partkey — the scale-correct "
        "plan (one map-side-combinable aggregate + one equi-join) vs a "
        "per-row subquery. Quantities are small integers stored as "
        "doubles, so avg is exact in both engines and the threshold "
        "comparison is deterministic."
    ),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part = l.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("__qty_thresh")
    )
    j = (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(per_part, l["l_partkey"] == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qty_thresh"))
    )
    return j.agg(
        (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


@register(
    "q19_bracketed_revenue",
    f"""
    SELECT {_REV} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc=(
        "TPC-H Q19 shape: OR-of-ANDs bracketed predicate spanning both "
        "join sides (brand/size from part, quantity from lineitem). "
        "Catalyst factors the single-side conjuncts out of the "
        "disjunction and pushes them below the join: the part scan gets "
        "brand-OR + size<=15, lineitem gets the quantity range union — "
        "the residual OR evaluates only on join survivors."
    ),
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, l["l_partkey"] == p["p_partkey"]).filter(
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.agg(
        F.sum(_rev_col()).cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


@register(
    "q21_waiting_supplier",
    """
    SELECT s.s_name AS supplier_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY supplier_name
    ORDER BY numwait DESC, supplier_name
    LIMIT 20
    """,
    doc=(
        "TPC-H Q21 shape: suppliers who were the sole late shipper in "
        "finished multi-supplier orders (late = shipped >60 days after "
        "order date). The EXISTS/NOT EXISTS pair is computed WITHOUT "
        "self-joins: one lineitem-orders('F') equi-join produces "
        "(orderkey, suppkey, late) rows, and per-order windows over the "
        "join's own orderkey partitioning (exchange reused, zero extra "
        "shuffle) take size(collect_set(suppkey)) and the late-supplier "
        "set — EXISTS(other supplier) == n_supp >= 2; NOT EXISTS(other "
        "late supplier) == exactly one distinct late supplier, which a "
        "late row already is. One wide shuffle of lineitem total, vs "
        "three for the literal semi+anti formulation (measured ~2x at "
        "sf1); per-order sets are bounded by suppliers-per-order."
    ),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_suppkey", late.alias("__late")
    )
    w = Window.partitionBy("l_orderkey")
    waited = (
        j.withColumn("__n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "__late_supps",
            F.collect_set(F.when(F.col("__late"), F.col("l_suppkey"))).over(w),
        )
        .filter(
            F.col("__late")
            & (F.col("__n_supp") >= 2)
            & (F.size("__late_supps") == 1)
        )
    )
    agg = waited.join(s, F.col("l_suppkey") == s["s_suppkey"]).groupBy(
        F.col("s_name").alias("supplier_name")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    return agg.orderBy(F.col("numwait").desc(), F.col("supplier_name").asc()).limit(20)


@register(
    "q22_dormant_value_customers",
    """
    SELECT c.c_nationkey AS nation_id,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 / count(*)
        FROM customer c2
        WHERE c2.c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY nation_id
    """,
    doc=(
        "TPC-H Q22 shape: above-average-balance customers with no recent "
        "orders (the testdata's order density makes 'no orders ever' "
        "empty, so dormancy is 'none since 2000-01-01'), grouped by "
        "nation. The global average is an exact-decimal-sum scalar "
        "(1-row broadcast cross join); the NOT EXISTS is a left-anti "
        "against date-filtered orders."
    ),
)
def q22_dormant_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o_recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("__avg_bal")
        )
    )
    kept = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o_recent, c["c_custkey"] == o_recent["o_custkey"], "left_anti")
    )
    return kept.groupBy(F.col("c_nationkey").alias("nation_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("numcust"),
        F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
    )


@register(
    "q11_important_part_value",
    """
    WITH v AS (
      SELECT l.l_partkey AS partkey,
             sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT partkey, CAST(val AS DOUBLE) AS part_value
    FROM v
    WHERE CAST(val AS DOUBLE) > (SELECT CAST(sum(val) AS DOUBLE) * 0.001 FROM v)
    """,
    doc=(
        "TPC-H Q11 shape (important stock): per-part supplied value from "
        "one nation's suppliers, kept only when it exceeds a fraction of "
        "the nation's total — a global scalar subquery over the same "
        "aggregate. No partsupp table in the testdata, so value is the "
        "discounted lineitem revenue rather than supplycost*availqty; the "
        "plan shape (group + self-referential scalar threshold) is "
        "identical. The per-part aggregate is computed ONCE and reused "
        "for both the rows and the threshold (the scalar total is a "
        "1-row broadcast cross join, never a recompute); threshold "
        "compare is double-vs-double of exact decimal sums on both "
        "engines. Nation filter broadcasts (25 rows at every SF); the "
        "lineitem-supplier join is AQE's call."
    ),
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    s_keys = s.join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]
    ).select("s_suppkey")
    v = (
        l.join(s_keys, l["l_suppkey"] == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_rev_col()).alias("__val"))
    )
    thr = v.agg((F.sum("__val").cast("double") * F.lit(0.001)).alias("__thr"))
    return (
        v.crossJoin(F.broadcast(thr))
        .filter(F.col("__val").cast("double") > F.col("__thr"))
        .select("partkey", F.col("__val").cast("double").alias("part_value"))
    )


@register(
    "q20_prolific_part_suppliers",
    """
    WITH pair AS (
      SELECT l.l_suppkey AS suppkey, l.l_partkey AS partkey,
             sum(l.l_quantity) AS win_qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY l.l_suppkey, l.l_partkey
    ),
    pavg AS (
      SELECT partkey, CAST(sum(win_qty) AS DOUBLE) / count(*) AS avg_qty
      FROM pair GROUP BY partkey
    ),
    qual AS (
      SELECT DISTINCT pair.suppkey
      FROM pair JOIN pavg ON pair.partkey = pavg.partkey
      WHERE pair.win_qty > 2.0 * pavg.avg_qty
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS s_name, n.n_name AS nation_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT suppkey FROM qual)
    """,
    doc=(
        "TPC-H Q20 shape (potential part promotion): suppliers in one "
        "region who shipped more than 2x the per-part average quantity "
        "of a LIKE-named part family during 1995. No partsupp.availqty "
        "in the testdata, so the original 'availqty > 0.5 * shipped' "
        "correlated threshold becomes 'pair quantity > 2.0 * per-part "
        "average pair quantity' — the same nested shape: LIKE-filtered "
        "join, grouped pair aggregate, correlated scalar re-expressed as "
        "a pre-aggregated equi-join (q17's pattern), DISTINCT semi-join "
        "up to supplier. Quantities are small integers stored as "
        "doubles, so sum/count division is exact and the 2.0x compare "
        "is deterministic. nation/region broadcast; the pair aggregate "
        "and its per-part rollup share the l_partkey-prefixed grouping, "
        "and the final IN is a left-semi on s_suppkey."
    ),
)
def q20_prolific_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    pair = (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.col("l_suppkey").alias("suppkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(F.sum("l_quantity").alias("win_qty"))
    )
    pavg = pair.groupBy(F.col("partkey").alias("__pk")).agg(
        (F.sum("win_qty").cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    qual = (
        pair.join(pavg, pair["partkey"] == F.col("__pk"))
        .filter(F.col("win_qty") > F.lit(2.0) * F.col("avg_qty"))
        .select("suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(qual, s["s_suppkey"] == qual["suppkey"], "left_semi")
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("s_name"),
            F.col("n_name").alias("nation_name"),
        )
    )
