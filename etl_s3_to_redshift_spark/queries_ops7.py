"""Round-4 registered queries: ANN recall auditing and further
LLM-pipeline / analytics operators.

Reference anchor: the reference has no ANN or curation surface
(/root/reference/sql_queries.py is the full query inventory); everything
here is north-star extension, verified per-query against DuckDB oracles
where SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.queries import _t, register


# ---------------------------------------------------------------------------
# ANN recall report — approximation quality as a queryable table
# ---------------------------------------------------------------------------


@register(
    "sim_ann_recall_report",
    None,  # rows-only: IVF/PQ involve k-means training no SQL engine
    # reproduces; the recall floors ARE the row values (audited in
    # tests/test_ops7.py against the pinned per-method minimums)
    doc=(
        "Recall@10 of every ANN path (LSH, IVF, PQ-rerank, IVF-PQ) "
        "against the exact brute-force top-k, as a 4-row table "
        "(method, k, n_queries, n_hits, recall). Makes approximation "
        "quality externally auditable instead of living only in pytest "
        "floors: the driver records the row VALUES, so a recall "
        "regression shows up as a changed artifact even without an SQL "
        "oracle. Each method runs with exactly the parameters of its "
        "registered query (sim_ann_lsh / sim_ann_ivf / sim_ann_pq / "
        "sim_ann_ivfpq), all seeded-deterministic; the ground truth is "
        "the sim_topk_cosine exact query. Scale shape: each method is "
        "its own bucketed plan; the recall join is a candidate-sized "
        "semi-join against the k*n_queries truth set — negligible next "
        "to the searches themselves."
    ),
)
def sim_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_s3_to_redshift_spark.operators.similarity import (
        brute_force_topk,
        build_ivf_index,
        ivf_probe,
        ivfpq_topk,
        lsh_topk,
        pq_encode,
        pq_topk_rerank,
        train_pq_codebooks,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    truth = brute_force_topk(emb, queries, k=10, round_to=6).select(
        "query_id", "vec_id"
    )

    index = build_ivf_index(emb, n_lists=16)
    books = train_pq_codebooks(emb, dim=64, m=8, n_codes=16)
    codes = pq_encode(emb, books)
    methods = {
        "lsh": lsh_topk(emb, queries, dim=64, k=10, round_to=6),
        # ivf_probe on the shared index == sim_ann_ivf's ivf_topk output
        # (same n_lists/n_probe/seed) without training k-means twice
        "ivf": ivf_probe(index, queries, k=10, n_probe=4),
        "pq": pq_topk_rerank(codes, books, emb, queries, k=10, shortlist_factor=4),
        "ivfpq": ivfpq_topk(
            index, codes, books, queries, k=10, n_probe=4, shortlist_factor=4
        ),
    }

    n_truth = truth.count()
    reports = []
    for name, topk in methods.items():
        hits = topk.select("query_id", "vec_id").join(
            truth, ["query_id", "vec_id"], "left_semi"
        )
        reports.append(
            hits.agg(F.count(F.lit(1)).alias("n_hits")).select(
                F.lit(name).alias("method"),
                F.lit(10).alias("k"),
                F.lit(5).alias("n_queries"),
                F.col("n_hits").cast("int").alias("n_hits"),
                F.round(F.col("n_hits") / F.lit(float(n_truth)), 4).alias("recall"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# Write-audit-publish snapshot table (atomic-commit seam)
# ---------------------------------------------------------------------------


@register(
    "delta_snapshot_read",
    """
    WITH b1 AS (
        SELECT c_custkey, c_mktsegment, 1 AS ver
        FROM customer WHERE c_custkey % 3 = 0
    ),
    b2 AS (
        SELECT c_custkey, 'MOVED' AS c_mktsegment, 2 AS ver
        FROM customer WHERE c_custkey % 6 = 0
        UNION ALL
        SELECT c_custkey + 500000, 'NEWSEG', 2
        FROM customer WHERE c_custkey % 50 = 0
    ),
    all_rows AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
    SELECT c_custkey, c_mktsegment, ver FROM (
        SELECT c_custkey, c_mktsegment, ver,
               row_number() OVER (PARTITION BY c_custkey
                                  ORDER BY ver DESC, c_mktsegment DESC) AS rn
        FROM all_rows
    ) WHERE rn = 1
    """,
    doc=(
        "Write-audit-publish snapshot table end-to-end "
        "(operators/table_commit.SnapshotTable + streaming/upsert."
        "upsert_table): two CDC batches committed as immutable v=<n> "
        "snapshot dirs behind an atomically swapped _CURRENT pointer, "
        "then read back through the pointer. Latest version per key "
        "wins (version-aware merge, replay-safe); concurrent readers "
        "see complete old-or-new snapshots, never torn directories — "
        "crash-injection pinned in tests/test_table_commit.py. On a "
        "lakehouse this sink is Delta/Iceberg MERGE; the operators are "
        "unchanged."
    ),
)
def delta_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_s3_to_redshift_spark.operators.table_commit import SnapshotTable
    from etl_s3_to_redshift_spark.streaming.upsert import upsert_table

    cust = _t(spark, sf_dir, "customer")
    b1 = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", "c_mktsegment", F.lit(1).alias("ver")
    )
    b2 = (
        cust.filter(F.col("c_custkey") % 6 == 0)
        .select("c_custkey", F.lit("MOVED").alias("c_mktsegment"), F.lit(2).alias("ver"))
        .unionByName(
            cust.filter(F.col("c_custkey") % 50 == 0).select(
                (F.col("c_custkey") + 500000).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
                F.lit(2).alias("ver"),
            )
        )
    )
    table = SnapshotTable(tempfile.mkdtemp(prefix="wap_table_"))
    upsert_table(spark, b1, table, "c_custkey", "ver")
    upsert_table(spark, b2, table, "c_custkey", "ver")
    return table.read(spark).select("c_custkey", "c_mktsegment", "ver")


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit — corpus health diagnostic
# ---------------------------------------------------------------------------


@register(
    "text_zipf_fit",
    """
    WITH vocab AS (
        SELECT token, count(*) AS n
        FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
            FROM documents
        ) WHERE length(token) >= 1
        GROUP BY token
    ),
    ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, token ASC) AS rank
        FROM vocab
    ),
    fitted AS (SELECT ln(CAST(rank AS DOUBLE)) AS lr, ln(CAST(n AS DOUBLE)) AS lf
               FROM ranked WHERE rank <= 1000)
    SELECT CAST((SELECT count(*) FROM vocab) AS BIGINT) AS n_vocab,
           CAST((SELECT sum(n) FROM vocab) AS BIGINT) AS n_tokens,
           round(regr_slope(lf, lr), 6) AS zipf_slope,
           round(regr_intercept(lf, lr), 6) AS zipf_intercept,
           round(regr_r2(lf, lr), 6) AS zipf_r2
    FROM fitted
    """,
    doc=(
        "Zipf law fit over the corpus vocabulary: least-squares slope/"
        "intercept/R^2 of ln(frequency) vs ln(rank) for the top-1000 "
        "ranks — the rank-frequency diagnostic that flags template-heavy "
        "or boilerplate-polluted corpora (natural text fits slope ~ -1; "
        "a flat head or cliff means duplication or truncation artifacts "
        "upstream). Same [a-z]+ tokenization as text_vocab_topk. Scale "
        "shape: ONE vocabulary-sized map-side-combined groupBy; the "
        "ranking windows over the vocab frame, never corpus rows, and "
        "the regression is Spark's built-in regr_* aggregates over 1000 "
        "points (a scalar fold, no collect). Tie order (n desc, token "
        "asc) makes ranks — hence the fit — deterministic cross-engine."
    ),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("token"))
        .filter(F.length("token") >= 1)
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    totals = vocab.agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.sum("n").cast("long").alias("n_tokens"),
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    fitted = (
        vocab.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 1000)
        .select(
            F.log(F.col("rank").cast("double")).alias("lr"),
            F.log(F.col("n").cast("double")).alias("lf"),
        )
        .agg(
            F.round(F.regr_slope("lf", "lr"), 6).alias("zipf_slope"),
            F.round(F.regr_intercept("lf", "lr"), 6).alias("zipf_intercept"),
            F.round(F.regr_r2("lf", "lr"), 6).alias("zipf_r2"),
        )
    )
    return totals.crossJoin(fitted)


# ---------------------------------------------------------------------------
# Market-basket co-purchase pairs
# ---------------------------------------------------------------------------


@register(
    "basket_copurchase_pairs",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
    ORDER BY n_orders DESC, part_a ASC, part_b ASC
    LIMIT 50
    """,
    doc=(
        "Market-basket co-purchase mining: the 50 part pairs most often "
        "bought in the same order — the association-rule seed "
        "(recommendations, bundle detection). Scale shape: the pair "
        "generation is a self-equi-join on l_orderkey, quadratic only "
        "WITHIN an order, and basket size is bounded (~7 lineitems in "
        "TPC-H, small constants in any retail schema), so the candidate "
        "set is O(rows x basket), not O(rows^2); the groupBy shuffles "
        "pair-sized partials with map-side combine and the top-50 is "
        "TakeOrderedAndProject (per-task heaps, no global sort). Tie "
        "order (count desc, part_a asc, part_b asc) pins the cut."
    ),
)
def basket_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(50)
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------


@register(
    "customer_rfm_segments",
    """
    WITH rfm AS (
        SELECT o_custkey AS custkey,
               CAST(date_diff('day', DATE '1990-01-01', CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(o_totalprice) AS DOUBLE) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    bounds AS (
        SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rb,
               quantile_cont(frequency,    [0.2, 0.4, 0.6, 0.8]) AS fb,
               quantile_cont(monetary,     [0.2, 0.4, 0.6, 0.8]) AS mb
        FROM rfm
    ),
    scored AS (
        SELECT
          1 + CAST(recency_days > rb[1] AS INT) + CAST(recency_days > rb[2] AS INT)
            + CAST(recency_days > rb[3] AS INT) + CAST(recency_days > rb[4] AS INT) AS r_q,
          1 + CAST(frequency > fb[1] AS INT) + CAST(frequency > fb[2] AS INT)
            + CAST(frequency > fb[3] AS INT) + CAST(frequency > fb[4] AS INT) AS f_q,
          1 + CAST(monetary > mb[1] AS INT) + CAST(monetary > mb[2] AS INT)
            + CAST(monetary > mb[3] AS INT) + CAST(monetary > mb[4] AS INT) AS m_q,
          monetary
        FROM rfm, bounds
    )
    SELECT r_q, f_q, m_q,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(monetary), 2) AS total_monetary
    FROM scored GROUP BY r_q, f_q, m_q
    """,
    doc=(
        "RFM segmentation: per-customer recency (days since epoch of "
        "last order) / frequency / monetary, bucketed into quintiles by "
        "EXACT interpolated percentile boundaries, aggregated to the "
        "<=125 (r,f,m) segments with customer counts and value. "
        "Deliberately NOT a global ntile — ranking every customer in one "
        "window partition is a single-node sort at 10^9 customers. "
        "Instead: one fact shuffle groups orders by customer, one tiny "
        "aggregate computes 12 boundary scalars (broadcast back as "
        "literals via a 1-row cross join), and bucketing is an in-scan "
        "comparison — the same plan shape as winsorize. Spark percentile "
        "== DuckDB quantile_cont (linear interpolation) on integer/"
        "double inputs, so boundaries are bit-identical cross-engine."
    ),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(F.max("o_orderdate"), F.lit("1990-01-01").cast("date"))
        .cast("long")
        .alias("recency_days"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum("o_totalprice").cast("double").alias("monetary"),
    )
    probs = [0.2, 0.4, 0.6, 0.8]
    bounds = rfm.agg(
        *[
            F.percentile(F.col(c), F.lit(p)).alias(f"{c}_{i}")
            for c in ("recency_days", "frequency", "monetary")
            for i, p in enumerate(probs)
        ]
    )
    scored = rfm.crossJoin(F.broadcast(bounds))

    def quintile(c: str):
        q = F.lit(1)
        for i in range(4):
            q = q + (F.col(c) > F.col(f"{c}_{i}")).cast("int")
        return q

    return (
        scored.select(
            quintile("recency_days").alias("r_q"),
            quintile("frequency").alias("f_q"),
            quintile("monetary").alias("m_q"),
            "monetary",
        )
        .groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("monetary"), 2).alias("total_monetary"),
        )
    )
