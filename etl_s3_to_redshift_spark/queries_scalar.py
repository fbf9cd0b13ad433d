"""Scalar-function, temporal-join, pivot, percentile, and UDF queries —
rounding out the engine surface beyond SURVEY.md §2 (reference §2c lists
these as absent; the north star requires them).

Registered into the driver-contract REGISTRY (queries.py imports this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.queries import _t, register

# ===========================================================================
# Temporal joins
# ===========================================================================


@register(
    "asof_last_purchase",
    """
    SELECT e.event_id, e.user_id, e.ts,
           p.ts AS asof_ts,
           p.value AS asof_value
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    doc=(
        "As-of join (backward, inclusive): each event matched to the same "
        "user's latest purchase at-or-before it — operators/temporal."
        "as_of_join (union + tagged sort + last-ignorenulls window: one "
        "shuffle, no range explosion). Oracle: DuckDB native ASOF JOIN."
    ),
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.temporal import as_of_join

    ev = _t(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    return as_of_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts", payload=["value"]
    ).select("event_id", "user_id", "ts", "asof_ts", F.col("asof_value"))


@register(
    "range_join_shipments",
    """
    SELECT o.o_orderkey AS order_id,
           count(*) AS n_quick_ships
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey
    """,
    doc=(
        "Equi+range join: lineitems shipped within 30 days of their order. "
        "Catalyst plans the equi key as a hash join and evaluates the range "
        "as a post-join predicate — the right plan (the pure non-equi case "
        "is operators/temporal.interval_bucket_join, unit-tested)."
    ),
)
def range_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = li.join(
        o,
        (li["l_orderkey"] == o["o_orderkey"])
        & (li["l_shipdate"] >= o["o_orderdate"])
        & (li["l_shipdate"] < o["o_orderdate"] + F.expr("INTERVAL 30 DAY")),
        "inner",
    )
    return joined.groupBy(o["o_orderkey"].alias("order_id")).agg(
        F.count(F.lit(1)).alias("n_quick_ships")
    )


@register(
    "sql_api_min_cost_supplier",
    """
    SELECT s.s_suppkey AS supplier_id,
           s.s_name AS supplier_name,
           n.n_name AS nation,
           p.p_partkey AS part_id,
           l.l_extendedprice AS price
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE l.l_extendedprice = (
      SELECT min(l2.l_extendedprice) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    )
    AND p.p_size <= 5
    """,
    doc=(
        "TPC-H Q2 shape via the SQL API (spark.sql over temp views — same "
        "Catalyst plan as the DataFrame API): correlated scalar subquery "
        "(min price per part) rewritten by Catalyst into an aggregate + "
        "join; dims broadcast."
    ),
)
def sql_api_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("lineitem", "supplier", "nation", "part"))
    return spark.sql(
        """
        SELECT s.s_suppkey AS supplier_id,
               s.s_name AS supplier_name,
               n.n_name AS nation,
               p.p_partkey AS part_id,
               l.l_extendedprice AS price
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN part p     ON p.p_partkey = l.l_partkey
        WHERE l.l_extendedprice = (
          SELECT min(l2.l_extendedprice) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
        )
        AND p.p_size <= 5
        """
    )


# ===========================================================================
# Pivot / percentile / sketches
# ===========================================================================


@register(
    "pivot_event_counts",
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events
    GROUP BY user_id
    """,
    doc=(
        "Pivot: per-user event-type counts as columns. Explicit pivot "
        "values keep the schema static (no extra distinct pass) — "
        "mandatory at scale."
    ),
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "percentile_order_value",
    """
    SELECT o_orderpriority AS priority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc=(
        "Exact percentiles (linear interpolation) per group — Spark "
        "``percentile`` == DuckDB ``quantile_cont`` bit-for-bit (same "
        "interpolation formula on the same doubles)."
    ),
)
def percentile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("median_price"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "approx_sketches",
    # Sketch outputs are engine-specific (DuckDB's HLL/quantile sketches
    # produce different estimates), so no cross-engine SQL twin exists —
    # but Spark's OWN sketch results are deterministic: HLL++ register
    # merge is exactly commutative/associative (max per register), and
    # the GK percentile summary came out bit-identical across plain
    # local[5/8/16/32] sessions and 10 repeated runs (round-5 probes).
    # Committed expectation at the driver's sf0.01 gate
    # (tools/gen_committed_oracle.py; REGRESSION PIN generated under
    # Spark 4.1.2 — sketch internals are not contractually stable
    # across engine upgrades, regenerate the pin before reading a red
    # gate as a regression); error bounds vs exact values stay
    # pinned in tests. Valid only at sf0.01; rows-only elsewhere.
    """
    SELECT CAST("approx_orders" AS BIGINT) AS "approx_orders",
           CAST("approx_parts" AS BIGINT) AS "approx_parts",
           CAST("approx_median_price" AS DOUBLE) AS "approx_median_price"
    FROM (VALUES
        (14206, 1947, CAST('53020.59' AS DOUBLE))
    ) AS t("approx_orders", "approx_parts", "approx_median_price")
    """,
    oracle_sf="sf0.01",
    doc=(
        "Approximate aggregates: HyperLogLog++ distinct counts and GK "
        "quantile sketches (approx_count_distinct / percentile_approx) — "
        "the sub-linear-memory path for 100 TB cardinality/quantile "
        "estimation. No oracle: sketch results are algorithm-specific; "
        "tests pin relative error against exact."
    ),
)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
    )


@register(
    "agg_collect_ordered",
    """
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
           CAST(count(DISTINCT event_type) AS INTEGER) AS n_types
    FROM events
    GROUP BY user_id
    """,
    doc=(
        "Collect-style aggregation: per-user sorted distinct set rendered "
        "as a string (collect_set + array_sort + array_join) — sorted so "
        "the result is partition-order-independent."
    ),
)
def agg_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("event_types"),
        F.size(F.collect_set("event_type")).alias("n_types"),
    )


@register(
    "agg_argminmax",
    """
    SELECT o_custkey AS customer_id,
           arg_max(o_orderkey, o_totalprice) AS biggest_order_id,
           max(o_totalprice) AS biggest_order_value,
           arg_min(o_orderkey, o_totalprice) AS smallest_order_id,
           min(o_totalprice) AS smallest_order_value
    FROM orders
    GROUP BY o_custkey
    """,
    doc=(
        "Argmin/argmax aggregates (max_by/min_by): each customer's "
        "biggest/smallest order. o_totalprice values are distinct within "
        "customers in this data, so the arg result is unambiguous."
    ),
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order_id"),
        F.max("o_totalprice").alias("biggest_order_value"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order_id"),
        F.min("o_totalprice").alias("smallest_order_value"),
    )


@register(
    "agg_exact_moments",
    """
    WITH m AS (
      SELECT l_returnflag AS flag,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT flag, n,
           s1 / n AS mean_qty,
           (s2 - s1 * s1 / n) / (n - 1) AS var_qty,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std_qty
    FROM m
    """,
    doc=(
        "Variance/stddev from exact decimal moments: sum and sum-of-squares "
        "accumulate exactly (order-independent), then one deterministic "
        "double evaluation of the textbook formula — built-in stddev would "
        "drift with partition order and never hash-match an oracle."
    ),
)
def agg_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(12,2)")
    m = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return m.select(
        "flag",
        "n",
        (F.col("s1") / F.col("n")).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("std_qty"),
    )


@register(
    "lateral_posexplode",
    """
    SELECT doc_id, CAST(s.pos AS INTEGER) AS pos, s.term FROM (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(string_split_regex(trim(text), '\\s+'), x -> x != ''),
               (x, i) -> {'pos': i - 1, 'term': x})) AS s
      FROM documents WHERE doc_id < 50
    )
    """,
    doc=(
        "Lateral generator: posexplode of the token array with ordinality "
        "— one output row per (doc, position, token). The generator runs "
        "inside the scan stage; no shuffle."
    ),
)
def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.functions.text import words

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos", "term")
    )


@register(
    "regex_suite",
    r"""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_numbers,
           regexp_matches(text, 'data.*table') AS mentions_data_table,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_prefix
    FROM documents
    WHERE doc_id < 100
    """,
    doc=(
        "Regex scalar suite: extract, extract-all count, boolean match, "
        "global replace — restricted to the regex subset Java and RE2 "
        "interpret identically (char classes, literals, quantifiers)."
    ),
)
def regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.regexp_extract(F.col("text"), r"([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]+"), 0)).alias("n_numbers"),
        F.col("text").rlike(r"data.*table").alias("mentions_data_table"),
        F.regexp_replace(F.col("text"), r"[aeiou]", "_").alias("devoweled_prefix"),
    )


@register(
    "cube_order_stats",
    """
    SELECT o_orderstatus AS status,
           o_orderpriority AS priority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc=(
        "CUBE grouping sets (all 4 combinations incl. grand total) — with "
        "ROLLUP (rollup_revenue) this completes the grouping-sets family; "
        "Catalyst expands the sets into one shuffle."
    ),
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total_value"),
    )


@register(
    "array_map_suite",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(list_max(embedding) AS DOUBLE) AS max_val,
           CAST(list_min(embedding) AS DOUBLE) AS min_val,
           array_to_string(
               list_transform(
                   list_slice(embedding, 1, 4),
                   x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS VARCHAR)
               ), ',') AS head4,
           CAST(list_reverse_sort(embedding)[1] AS DOUBLE) AS sorted_last,
           list_contains(embedding, 0.0) AS has_zero,
           CAST(label AS BIGINT) AS label_key,
           map { 'label': CAST(label AS BIGINT), 'dim': CAST(len(embedding) AS BIGINT) }['label'][1] AS from_map
    FROM embeddings
    """,
    doc=(
        "Array + map scalar suite over the embedding column: size, "
        "indexing, min/max, slice, sort, containment, map construction and "
        "lookup — the nested-type surface (reference has none, SURVEY §1)."
    ),
)
def array_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    m = F.create_map(
        F.lit("label"), F.col("label").cast("long"),
        F.lit("dim"), F.size("embedding").cast("long"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.array_min("embedding").cast("double").alias("min_val"),
        # head4 is emitted as a scalar string, not array<double>: the external
        # driver's canonicalizer sorts result columns with pandas and dies on
        # list-typed cells (unhashable).  floor(x*1e6) -> bigint -> string is
        # bit-identical across Spark and DuckDB (IEEE double multiply + floor
        # + integer formatting), unlike shortest-round-trip float JSON repr.
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 4),
                lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast("bigint").cast("string"),
            ),
            ",",
        ).alias("head4"),
        F.element_at(F.sort_array("embedding", asc=False), 1).cast("double").alias("sorted_last"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
        F.col("label").cast("long").alias("label_key"),
        F.element_at(m, "label").alias("from_map"),
    )


# ===========================================================================
# UDF surface: grouped-map Pandas (Arrow) with an exactly-checkable kernel
# ===========================================================================


@register(
    "udf_minmax_normalize",
    """
    SELECT o_orderkey AS order_id,
           o_orderpriority AS priority,
           CASE WHEN max(o_totalprice) OVER (PARTITION BY o_orderpriority)
                   = min(o_totalprice) OVER (PARTITION BY o_orderpriority)
                THEN 0.0
                ELSE (o_totalprice - min(o_totalprice) OVER (PARTITION BY o_orderpriority))
                     / (max(o_totalprice) OVER (PARTITION BY o_orderpriority)
                        - min(o_totalprice) OVER (PARTITION BY o_orderpriority))
           END AS price_norm
    FROM orders
    """,
    doc=(
        "Grouped-map Pandas UDF (applyInPandas over Arrow batches): "
        "per-priority min-max normalization. Min/max/divide are exact on "
        "doubles, so the Python kernel matches the window-SQL oracle "
        "bit-for-bit — demonstrating the vectorized UDF path with a "
        "correctness gate."
    ),
)
def udf_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["o_totalprice"].min(), pdf["o_totalprice"].max()
        span = hi - lo
        norm = (pdf["o_totalprice"] - lo) / span if span > 0 else pdf["o_totalprice"] * 0.0
        return pd.DataFrame(
            {
                "order_id": pdf["o_orderkey"],
                "priority": pdf["o_orderpriority"],
                "price_norm": norm,
            }
        )

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
    return o.groupBy("o_orderpriority").applyInPandas(
        kernel, schema="order_id long, priority string, price_norm double"
    )


# ===========================================================================
# Scalar function suites
# ===========================================================================


@register(
    "scalar_string_suite",
    """
    SELECT p_partkey AS part_id,
           upper(p_type) AS type_upper,
           lower(p_brand) AS brand_lower,
           substr(p_name, 1, 12) AS name_prefix,
           CAST(length(p_name) AS INTEGER) AS name_len,
           replace(p_brand, '#', '-') AS brand_slug,
           concat(p_brand, ':', p_type) AS brand_type,
           CAST(levenshtein(p_brand, 'Brand#13') AS INTEGER) AS lev_to_b13,
           CAST(strpos(p_type, 'AND') AS INTEGER) AS and_pos,
           trim(CAST(p_size AS VARCHAR)) AS size_str,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
    FROM part
    WHERE p_type LIKE '%AND%' OR p_name LIKE 's%'
    """,
    doc=(
        "String scalar suite: case, substring, length, replace, concat, "
        "levenshtein, position, pad, LIKE predicates — all JVM codegen'd."
    ),
)
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%AND%") | F.col("p_name").like("s%")
    ).select(
        F.col("p_partkey").alias("part_id"),
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_slug"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#13")).alias("lev_to_b13"),
        F.instr(F.col("p_type"), "AND").alias("and_pos"),
        F.trim(F.col("p_size").cast("string")).alias("size_str"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@register(
    "scalar_math_conditional",
    """
    SELECT l_orderkey AS order_id,
           l_linenumber AS line_no,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(12,2)) AS DOUBLE) AS tax_amount,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(l_partkey % 16 AS BIGINT) AS part_bucket,
           CAST(sign(l_discount - l_tax) AS DOUBLE) AS disc_vs_tax,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'standard'
                ELSE 'small' END AS qty_class
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
    doc=(
        "Math + conditional scalar suite: abs/ceil/floor/round/sqrt/mod/"
        "sign/greatest/least/coalesce/nullif/CASE — IEEE-exact operations "
        "only, so the oracle matches bit-for-bit."
    ),
)
def scalar_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_tax").cast("decimal(12,2)")).cast("double").alias("tax_amount"),
        F.sqrt(F.col("l_quantity")).alias("qty_sqrt"),
        (F.col("l_partkey") % 16).alias("part_bucket"),
        F.signum(F.col("l_discount") - F.col("l_tax")).alias("disc_vs_tax"),
        F.greatest(F.col("l_discount"), F.col("l_tax")).alias("max_rate"),
        F.least(F.col("l_discount"), F.col("l_tax")).alias("min_rate"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "standard")
        .otherwise("small")
        .alias("qty_class"),
    )


@register(
    "scalar_datetime_suite",
    """
    SELECT o_orderkey AS order_id,
           o_orderdate + INTERVAL 90 DAY AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_sec,
           date_trunc('month', o_orderdate) AS month_start
    FROM orders
    """,
    doc=(
        "Date/time scalar suite: interval arithmetic, datediff, last_day, "
        "quarter/dow/doy, formatting, epoch, truncation. DuckDB dayofweek "
        "is 0=Sunday vs Spark 1=Sunday — the oracle shifts by one; "
        "everything else maps 1:1."
    ),
)
def scalar_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.last_day(F.col("o_orderdate")).cast("timestamp").alias("month_end"),
        F.quarter(F.col("o_orderdate")).alias("qtr"),
        F.dayofweek(F.col("o_orderdate")).alias("dow"),
        F.dayofyear(F.col("o_orderdate")).alias("doy"),
        F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("ym"),
        F.unix_timestamp(F.col("o_orderdate")).alias("epoch_sec"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    )
