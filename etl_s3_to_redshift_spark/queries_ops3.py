"""Round-3 operator-coverage queries: regression/correlation aggregates,
value-RANGE window frames, GROUPING SETS with grouping flags, and
incremental (mergeable-partial) rollup maintenance — each with an exact
DuckDB oracle.

Exactness rules follow queries.py: decimal casts before summation,
counts BIGINT on both engines, doubles only where both engines divide
or multiply identical operands; statistics whose partial-aggregation
summation order can drift sub-ulp (corr/covar/regr_*) are rounded at a
scale 8+ orders of magnitude above the drift.

Reference anchor: the reference's analytics surface is five full-refresh
star-schema tables (/root/reference/sql_queries.py:18-33,132-190); these
queries extend it with the statistical, frame-based and incremental
shapes that replace full refresh at warehouse scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.queries import _t, register

# ---------------------------------------------------------------------------
# Regression / correlation aggregate family
# ---------------------------------------------------------------------------


@register(
    "agg_corr_regression",
    """
    SELECT l_returnflag AS flag,
           count(*) AS n,
           round(corr(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6)
               AS corr_price_qty,
           round(covar_samp(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 2)
               AS covar_price_qty,
           round(regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 4)
               AS slope,
           round(regr_intercept(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 2)
               AS intercept,
           round(regr_r2(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6)
               AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "Bivariate statistics family: corr, covar_samp, and the regr_* "
        "least-squares aggregates (slope/intercept/r2) of extendedprice "
        "on quantity per returnflag. All run as single-pass algebraic "
        "aggregates (partial moments merge map-side — one shuffle of "
        "per-task moment states, same scale shape as any groupBy sum); "
        "results are rounded 8+ orders above the sub-ulp drift that "
        "partial-summation order can introduce, so both engines "
        "canonicalize identically. The reference has no statistical "
        "surface at all; this is table-stakes for corpus analytics."
    ),
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    y = F.col("l_extendedprice").cast("double")
    x = F.col("l_quantity").cast("double")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr(y, x), 6).alias("corr_price_qty"),
        F.round(F.covar_samp(y, x), 2).alias("covar_price_qty"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Value-RANGE window frames
# ---------------------------------------------------------------------------


@register(
    "w4_value_range_frames",
    """
    SELECT o_orderkey AS order_id,
           o_custkey AS customer_id,
           CAST(o_totalprice AS DOUBLE) AS total_price,
           count(*) OVER w AS n_within_5k,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_within_5k,
           count(*) OVER w2 AS n_cheaper_half
    FROM orders
    WINDOW
      w AS (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DOUBLE)
            RANGE BETWEEN 5000.0 PRECEDING AND 5000.0 FOLLOWING),
      w2 AS (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DOUBLE)
             RANGE BETWEEN UNBOUNDED PRECEDING AND 5000.0 PRECEDING)
    """,
    doc=(
        "Value-based RANGE window frames (vs the ROWS frames of "
        "w2_running_user_value): per customer, how many orders and how "
        "much value sit within ±5000 of each order's price, and how many "
        "sit more than 5000 below it. RANGE frames are tie-stable — every "
        "row with an equal order-by value shares one frame — so the result "
        "is deterministic without a unique tiebreaker, unlike ROWS. One "
        "shuffle on the partition key, one per-key sort, all three frames "
        "share it. Decimal sums keep the frame totals exact."
    ),
)
def w4_value_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    w = Window.partitionBy("o_custkey").orderBy(price).rangeBetween(-5000, 5000)
    w2 = Window.partitionBy("o_custkey").orderBy(price).rangeBetween(
        Window.unboundedPreceding, -5000
    )
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        price.alias("total_price"),
        F.count(F.lit(1)).over(w).alias("n_within_5k"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double")
            .alias("sum_within_5k"),
        F.count(F.lit(1)).over(w2).alias("n_cheaper_half"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS with grouping flags (SQL API)
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_orders",
    """
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
           CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc=(
        "Explicit GROUPING SETS — two independent 1-D breakdowns plus the "
        "grand total in ONE pass (cube_order_stats materializes the full "
        "cross; here the (status,priority) cell is deliberately absent). "
        "grouping() flags disambiguate real NULL keys from superaggregate "
        "rows, the standard way downstream consumers route rollup rows. "
        "Catalyst expands the sets before the shuffle, so partial "
        "aggregation still applies per set — the exchange carries "
        "|status| + |priority| + 1 state rows per task, not fact rows. "
        "Runs through spark.sql to exercise the SQL front end."
    ),
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '<all>') AS status,
               coalesce(o_orderpriority, '<all>') AS priority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# Incremental rollup maintenance (mergeable partial aggregates)
# ---------------------------------------------------------------------------


@register(
    "rollup_incremental_merge",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
           CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "Incremental rollup maintenance (operators/incremental.py): the "
        "daily per-type rollup is computed as TWO independent partial "
        "states — events before / after a mid-month cutoff, standing in "
        "for 'yesterday's rollup table' and 'today's batch' — merged with "
        "the algebraic monoid (n and decimal-sum add, min/max fold) and "
        "finalized. The oracle is the flat one-shot GROUP BY over all "
        "events: merged partials must equal the full recompute exactly, "
        "which is precisely the contract that lets a 100 TB pipeline "
        "append per-batch partials and never rescan the fact history "
        "(the reference instead drops and fully refreshes its analytics "
        "tables on every load, sql_queries.py:18-33). Decimal sums make "
        "the merge order-insensitive; avg divides identical double "
        "operands on both engines."
    ),
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.incremental import (
        finalize_rollup,
        merge_rollups,
        partial_rollup,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        "event_type",
        "value",
        F.col("ts"),
    )
    cutoff = F.lit("2024-01-15").cast("timestamp")
    old = partial_rollup(ev.filter(F.col("ts") < cutoff).drop("ts"), ["day", "event_type"])
    new = partial_rollup(ev.filter(F.col("ts") >= cutoff).drop("ts"), ["day", "event_type"])
    return finalize_rollup(merge_rollups(old, new))


# ---------------------------------------------------------------------------
# Incremental dedup-group maintenance (connected components over batches)
# ---------------------------------------------------------------------------


def _groups_oracle() -> str:
    from etl_s3_to_redshift_spark.queries_data import SQL_SHINGLES, SQL_WORDS

    return f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, {SQL_SHINGLES.format(w=SQL_WORDS.format(t='text'))} AS sh
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM tok a JOIN tok b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
    ), edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), cc(vertex, component) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, c.component FROM edges e JOIN cc c ON c.vertex = e.v
    )
    SELECT min(component) AS component,
           vertex AS member,
           (vertex = min(component)) AS is_keeper
    FROM cc GROUP BY vertex
    """


@register(
    "dedup_groups_incremental",
    _groups_oracle(),
    doc=(
        "Incremental dedup-group maintenance (operators/components."
        "incremental_components): the corpus arrives as two batches "
        "(even doc ids, then odd), the first batch's pair list is "
        "labeled once, and the second batch's pairs UPDATE that labeling "
        "— only components touched by a new edge are re-run (as star "
        "edges member->representative plus the new pairs), untouched "
        "components pass through as two semi-joins with zero iteration. "
        "The oracle is the full-recompute recursive-CTE reachability "
        "over ALL pairs: incremental maintenance must be exactly "
        "invisible in the result, the contract that lets a 100 TB dedup "
        "graph absorb a daily batch without re-clustering the corpus "
        "(pairs with both ids even = batch 1; the rest = batch 2, same "
        "LSH parameters as dedup_groups_connected)."
    ),
)
def dedup_groups_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.components import (
        connected_components,
        incremental_components,
    )
    from etl_s3_to_redshift_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8, num_hashes=32, bands=16
    )
    both_even = (F.col("id_a") % 2 == 0) & (F.col("id_b") % 2 == 0)
    labeling = connected_components(pairs.filter(both_even))
    merged = incremental_components(labeling, pairs.filter(~both_even))
    return merged.select(
        F.col("component"),
        F.col("vertex").alias("member"),
        (F.col("vertex") == F.col("component")).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# Bitwise / boolean aggregate family
# ---------------------------------------------------------------------------


@register(
    "agg_bool_bit_suite",
    """
    SELECT l_linestatus AS status,
           bit_and(CAST(l_orderkey AS BIGINT)) AS key_bit_and,
           bit_or(CAST(l_orderkey AS BIGINT)) AS key_bit_or,
           bit_xor(CAST(l_orderkey AS BIGINT)) AS key_bit_xor,
           bool_and(l_quantity > 1) AS all_multi,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
           count(*) AS n
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc=(
        "Bitwise and boolean aggregate family: bit_and / bit_or / bit_xor "
        "over the key domain, bool_and / bool_or predicates, and a "
        "conditional count — all algebraic (bitwise ops and boolean "
        "monoids merge map-side like any sum), one shuffle of tiny "
        "per-task states. Completes the aggregate surface alongside the "
        "moments/collect/argminmax suites."
    ),
)
def agg_bool_bit_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey").cast("long")
    return li.groupBy(F.col("l_linestatus").alias("status")).agg(
        F.bit_and(key).alias("key_bit_and"),
        F.bit_or(key).alias("key_bit_or"),
        F.bit_xor(key).alias("key_bit_xor"),
        F.bool_and(F.col("l_quantity") > 1).alias("all_multi"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Safe (try_) arithmetic / casting
# ---------------------------------------------------------------------------


@register(
    "scalar_try_safe_suite",
    """
    SELECT o_orderkey AS order_id,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS priority_rank,
           TRY_CAST(o_orderstatus AS INTEGER) AS status_as_int,
           CAST(o_totalprice AS DOUBLE) / NULLIF(CAST(o_orderkey % 3 AS DOUBLE), 0.0)
               AS price_per_key_residue,
           CAST(o_totalprice AS DOUBLE) / NULLIF(CAST(length(o_orderpriority) - 8 AS DOUBLE), 0.0)
               AS price_per_extra_char
    FROM orders
    """,
    doc=(
        "ANSI-safe scalar family: try_cast on strings that may not parse "
        "(digit prefix parses; a letter status yields NULL, not a crash) "
        "and try_divide where the denominator hits zero (the key residue "
        "is 0 for every third order; the length-8 denominator is zero "
        "exactly when the priority label is 8 chars). Spark's try_* "
        "functions map exactly onto DuckDB TRY_CAST / NULLIF-guarded "
        "division — NULL-on-failure semantics, no ANSI exceptions in "
        "either engine. Pure per-row projection: no shuffle, whole-stage "
        "codegen end to end."
    ),
)
def scalar_try_safe_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("priority_rank"),
        F.col("o_orderstatus").try_cast("int").alias("status_as_int"),
        F.try_divide(
            F.col("o_totalprice").cast("double"),
            (F.col("o_orderkey") % 3).cast("double"),
        ).alias("price_per_key_residue"),
        F.try_divide(
            F.col("o_totalprice").cast("double"),
            (F.length("o_orderpriority") - 8).cast("double"),
        ).alias("price_per_extra_char"),
    )


# ---------------------------------------------------------------------------
# Null-safe equality join
# ---------------------------------------------------------------------------


@register(
    "null_safe_join_events",
    """
    WITH tagged AS (
      SELECT user_id,
             CASE WHEN value < 1.0 THEN NULL ELSE event_type END AS quality_key
      FROM events
    ), a AS (
      SELECT quality_key, count(*) AS n_even
      FROM tagged WHERE user_id % 2 = 0 GROUP BY quality_key
    ), b AS (
      SELECT quality_key, count(*) AS n_odd
      FROM tagged WHERE user_id % 2 = 1 GROUP BY quality_key
    )
    SELECT a.quality_key AS quality_key, a.n_even, b.n_odd
    FROM a JOIN b ON a.quality_key IS NOT DISTINCT FROM b.quality_key
    """,
    doc=(
        "Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL "
        "group — here 'low-signal events', a derived key that nulls out "
        "below a value threshold — must MATCH across the two sides, where "
        "a plain equi-join would silently drop it. Still a hash-joinable "
        "equi-condition in Spark (EqualNullSafe keys shuffle like any "
        "other key; no fallback to a nested-loop join), which is what "
        "makes it usable at scale."
    ),
)
def null_safe_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("value") < 1.0, F.lit(None)).otherwise(F.col("event_type"))
            .alias("quality_key"),
    )
    a = ev.filter(F.col("user_id") % 2 == 0).groupBy("quality_key").agg(
        F.count(F.lit(1)).alias("n_even")
    )
    b = ev.filter(F.col("user_id") % 2 == 1).groupBy("quality_key").agg(
        F.count(F.lit(1)).alias("n_odd")
    )
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.quality_key").eqNullSafe(F.col("b.quality_key")))
        .select(F.col("a.quality_key").alias("quality_key"), "n_even", "n_odd")
    )


# ---------------------------------------------------------------------------
# Key-skew diagnostics
# ---------------------------------------------------------------------------


@register(
    "skew_key_profile",
    """
    WITH c1 AS (
      SELECT count(*) AS c FROM events GROUP BY user_id
    ), c2 AS (
      SELECT count(*) AS c FROM events GROUP BY event_type
    )
    SELECT 'user_id' AS key_col,
           sum(c)::BIGINT AS n_rows,
           count(*)::BIGINT AS n_keys,
           max(c)::BIGINT AS max_key_rows,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top1_share,
           round(CAST(sum(c) AS DOUBLE) / count(*), 2) AS mean_rows_per_key,
           round(-sum((CAST(c AS DOUBLE) / (SELECT sum(c) FROM c1))
                      * log2(CAST(c AS DOUBLE) / (SELECT sum(c) FROM c1))), 6)
               AS entropy_bits
    FROM c1
    UNION ALL
    SELECT 'event_type',
           sum(c)::BIGINT,
           count(*)::BIGINT,
           max(c)::BIGINT,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6),
           round(CAST(sum(c) AS DOUBLE) / count(*), 2),
           round(-sum((CAST(c AS DOUBLE) / (SELECT sum(c) FROM c2))
                      * log2(CAST(c AS DOUBLE) / (SELECT sum(c) FROM c2))), 6)
    FROM c2
    """,
    doc=(
        "Key-skew diagnostics (operators/skew.key_skew_profile): per "
        "candidate shuffle key — cardinalities, hottest-key share, mean "
        "rows/key, and the Shannon entropy of the key distribution — the "
        "measurement that decides between plain hash join, AQE skew "
        "handling, salting, or hot-key isolation BEFORE launching a "
        "100 TB shuffle. One two-level aggregate per profiled column; "
        "the whole-frame entropy window runs over the per-key counts "
        "(keys-cardinality rows), never facts."
    ),
)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.skew import key_skew_profile

    return key_skew_profile(_t(spark, sf_dir, "events"), ["user_id", "event_type"])


# ---------------------------------------------------------------------------
# Equi-depth histogram (exact deciles)
# ---------------------------------------------------------------------------


@register(
    "hist_equidepth_deciles",
    """
    WITH ranked AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT decile,
           count(*) AS n_orders,
           CAST(min(o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o_totalprice) AS DOUBLE) AS hi,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM ranked GROUP BY decile
    """,
    doc=(
        "Equi-depth histogram: exact deciles of the order-value "
        "distribution via ntile over a unique total order (value + key "
        "tiebreak -> deterministic bucket membership on both engines), "
        "then per-bucket count/bounds/decimal sum — the equi-depth "
        "complement to hist_order_values' fixed-width buckets. SCALE "
        "PLAN: no unpartitioned ntile window — operators/prefix."
        "ranked_running computes the global row_number with a range-"
        "partitioned two-pass scheme (parallel at every scale), and the "
        "ntile bucket is derived arithmetically from (rank, total "
        "count) with the SQL-standard split (first n%k buckets get "
        "ceil(n/k) rows) — bit-identical to ntile over the same total "
        "order, but the only single-task frame anywhere is the "
        "#partitions-row offset table. floor(x/y) on doubles is exact "
        "here (counts < 2^53)."
    ),
)
def hist_equidepth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.prefix import ranked_running

    o = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked = ranked_running(
        o,
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        count_col="__n_total",
    )
    k = F.lit(10).cast("long")
    n = F.col("__n_total")
    rk = F.col("rk")
    base = F.floor(n / k)  # rows per small bucket
    rem = n % k  # number of big (base+1-row) buckets, assigned first
    big = base + F.lit(1)
    base_safe = F.greatest(base, F.lit(1))  # n<k guard: otherwise-branch unused then
    decile = (
        F.when(rk <= rem * big, F.floor((rk + big - F.lit(1)) / big))
        .otherwise(rem + F.floor((rk - rem * big + base_safe - F.lit(1)) / base_safe))
        .cast("int")
    )
    return (
        ranked.select("o_totalprice", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double")
                .alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Quality-aware dedup keeper (keep-the-best curation policy)
# ---------------------------------------------------------------------------


def _groups_best_oracle() -> str:
    from etl_s3_to_redshift_spark.queries_data import SQL_SHINGLES, SQL_WORDS

    return f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, {SQL_SHINGLES.format(w=SQL_WORDS.format(t='text'))} AS sh
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM tok a JOIN tok b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
    ), edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), cc(vertex, component) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, c.component FROM edges e JOIN cc c ON c.vertex = e.v
    ), labeled AS (
      SELECT vertex AS member, min(component) AS component FROM cc GROUP BY vertex
    )
    SELECT l.component,
           l.member,
           CAST(d.n_chars AS BIGINT) AS score,
           (row_number() OVER (PARTITION BY l.component
                               ORDER BY d.n_chars DESC, l.member ASC) = 1)
               AS is_keeper
    FROM labeled l JOIN documents d ON d.doc_id = l.member
    """


@register(
    "dedup_keep_best_quality",
    _groups_best_oracle(),
    doc=(
        "Quality-aware dedup keeper (operators/components."
        "dedup_groups_by_score): near-dup groups from the LSH pair list, "
        "but each group KEEPS its highest-scoring member (here: longest "
        "document, the keep-the-longest policy of C4-style pipelines; id "
        "breaks ties) instead of dedup_groups' lowest-id convention. One "
        "hash join of the labeling against the score frame + one "
        "per-component window. Oracle: full recursive-CTE reachability "
        "re-ranked by the same score."
    ),
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.components import dedup_groups_by_score
    from etl_s3_to_redshift_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.8, num_hashes=32, bands=16)
    scores = docs.select("doc_id", F.col("n_chars").cast("long").alias("score"))
    return dedup_groups_by_score(pairs, scores, id_col="doc_id", score_col="score")


# ---------------------------------------------------------------------------
# Forward as-of join (next event at-or-after)
# ---------------------------------------------------------------------------


@register(
    "asof_next_purchase",
    """
    SELECT e.event_id, e.user_id, e.ts,
           p.ts AS asof_ts,
           p.value AS asof_value
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
    doc=(
        "As-of join, FORWARD direction (operators/temporal.as_of_join "
        "direction='forward'): each event matched to the same user's "
        "EARLIEST purchase at-or-after it — the time-to-next-conversion "
        "shape. Same single-shuffle tagged-union-window plan as the "
        "backward variant, mirrored (first-ignorenulls over an "
        "unbounded-following frame; right rows sort after left at equal "
        "ts so equal timestamps still match). Oracle: DuckDB native "
        "ASOF JOIN with the <= inequality."
    ),
)
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.temporal import as_of_join

    ev = _t(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    return as_of_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        payload=["value"], direction="forward",
    ).select("event_id", "user_id", "ts", "asof_ts", F.col("asof_value"))
