"""Temporal joins (as-of, interval bucket), approx sketches, and the fast
top-k path — semantics pinned against exact baselines."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.similarity import brute_force_topk, brute_force_topk_np
from etl_s3_to_redshift_spark.operators.temporal import as_of_join, interval_bucket_join
from etl_s3_to_redshift_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE, SF_SMOKE


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_as_of_join_semantics(spark):
    """Backward inclusive: latest right at-or-before left; ties at equal ts
    match (right sorts first); no match → NULLs."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00")), (1, ts("2024-01-01 11:00:00")),
         (1, ts("2024-01-01 09:00:00")), (2, ts("2024-01-01 10:30:00"))],
        "key long, t timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 100.0), (1, ts("2024-01-01 10:30:00"), 200.0),
         (3, ts("2024-01-01 00:00:00"), 999.0)],
        "key long, rt timestamp, v double",
    )
    out = {
        (r.key, r.t): (r.asof_ts, r.asof_v)
        for r in as_of_join(left, right, "key", "t", "rt", ["v"]).collect()
    }
    assert out[(1, ts("2024-01-01 09:00:00"))] == (None, None)  # nothing before
    assert out[(1, ts("2024-01-01 10:00:00"))] == (ts("2024-01-01 10:00:00"), 100.0)  # inclusive
    assert out[(1, ts("2024-01-01 11:00:00"))] == (ts("2024-01-01 10:30:00"), 200.0)  # latest
    assert out[(2, ts("2024-01-01 10:30:00"))] == (None, None)  # key with no right rows


def test_interval_bucket_join_equals_brute_force(spark):
    """Bucketized non-equi join must equal the naive BETWEEN cross join."""
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "ts").limit(300)
    base = ts("2024-01-01 00:00:00")
    intervals = spark.createDataFrame(
        [
            (i, base + dt.timedelta(minutes=37 * i), base + dt.timedelta(minutes=37 * i + 25))
            for i in range(20)
        ],
        "ivl_id long, start timestamp, end timestamp",
    )
    fast = {
        (r.event_id, r.ivl_id)
        for r in interval_bucket_join(events, intervals, "ts", "start", "end", 600).collect()
    }
    naive = {
        (r.event_id, r.ivl_id)
        for r in events.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
        .collect()
    }
    assert fast == naive and len(naive) > 0


def test_approx_sketches_error_bounds(spark):
    li = load_table(spark, SF_ORACLE, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey").alias("a_ord"),
        F.countDistinct("l_orderkey").alias("e_ord"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a_med"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("e_med"),
    ).first()
    assert abs(row.a_ord - row.e_ord) / row.e_ord < 0.05  # HLL++ default rsd 5%
    assert abs(row.a_med - row.e_med) / row.e_med < 0.01

    # cross-engine sanity band: DuckDB's HLL estimate over the same
    # parquet must land in the same 5%-of-exact window — guards against a
    # systematically-biased sketch passing the intra-engine check (the
    # registry row is rows-only forever, so this is its external anchor)
    import duckdb

    d_approx, d_exact = duckdb.sql(
        "SELECT approx_count_distinct(l_orderkey), count(DISTINCT l_orderkey) "
        f"FROM '{SF_ORACLE}/lineitem.parquet'"
    ).fetchone()
    assert d_exact == row.e_ord
    assert abs(d_approx - d_exact) / d_exact < 0.05
    assert abs(row.a_ord - d_approx) / d_exact < 0.10


def test_ivf_topk_recall_floor(spark):
    from etl_s3_to_redshift_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {(r.query_id, r.vec_id) for r in brute_force_topk(emb, queries, k=10).collect()}
    ivf = {(r.query_id, r.vec_id) for r in ivf_topk(emb, queries, dim=64, k=10).collect()}
    # probing 4/16 cells on weakly-clustered random vectors: conservative floor
    assert len(bf & ivf) / len(bf) >= 0.25
    assert len(ivf) == len(bf)


def test_fast_topk_matches_exact_ids(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r.query_id, r.vec_id) for r in brute_force_topk(emb, queries, k=10).collect()}
    fast = {(r.query_id, r.vec_id) for r in brute_force_topk_np(emb, queries, k=10).collect()}
    assert exact == fast


def test_ivf_index_save_load_probe(spark, tmp_path):
    """Index-once / probe-many: build -> save -> load -> probe equals the
    one-shot ivf_topk, and the saved layout is partitioned by cell so the
    probe's scan can prune (dynamic partition pruning on the broadcast
    side's cell keys)."""
    from etl_s3_to_redshift_spark.operators.similarity import (
        build_ivf_index, ivf_probe, ivf_topk, IvfIndex,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    one_shot = {
        (r.query_id, r.vec_id, r.rank)
        for r in ivf_topk(emb, queries, dim=64, k=10).collect()
    }

    idx = build_ivf_index(emb)
    path = str(tmp_path / "ivf_index")
    idx.save(path)
    loaded = IvfIndex.load(spark, path)
    assert loaded.centroids == idx.centroids  # exact doubles through JSON
    probed = {
        (r.query_id, r.vec_id, r.rank)
        for r in ivf_probe(loaded, queries, k=10).collect()
    }
    assert probed == one_shot and len(probed) == 50

    # the on-disk layout IS the inverted file: one directory per cell
    import os

    from etl_s3_to_redshift_spark.operators.table_commit import resolve_index_root

    root = resolve_index_root(path)
    cell_dirs = [d for d in os.listdir(f"{root}/cells") if d.startswith("cell=")]
    assert len(cell_dirs) == 16


def test_ivf_train_fraction_subsample(spark):
    """Quantizer trained on a sample still assigns every corpus row a cell
    (full-pass assignment is decoupled from training)."""
    from etl_s3_to_redshift_spark.operators.similarity import build_ivf_index

    emb = load_table(spark, SF_ORACLE, "embeddings")
    idx = build_ivf_index(emb, train_fraction=0.5)
    assert idx.cells.count() == emb.count()
    assert idx.cells.filter(F.col("cell").isNull()).count() == 0


def test_ivf_saved_probe_prunes_partitions(spark, tmp_path):
    """The 100 TB contract of the saved index: a probe over the
    cell-partitioned layout plans DYNAMIC PARTITION PRUNING on the cell
    key — the scan reads only the n_probe/n_lists probed cells'
    files, not the corpus (plan-pinned, the same evidence measured at
    the sf100 probe: PartitionFilters carries a dynamicpruning
    subquery fed by the broadcast query side)."""
    from etl_s3_to_redshift_spark.operators.similarity import (
        IvfIndex,
        build_ivf_index,
        ivf_probe,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings")
    path = str(tmp_path / "ivf_index_dpp")
    build_ivf_index(emb).save(path)
    loaded = IvfIndex.load(spark, path)
    queries = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = ivf_probe(loaded, queries, k=10, n_probe=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert df.count() == 10
