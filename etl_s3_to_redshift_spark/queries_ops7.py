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
