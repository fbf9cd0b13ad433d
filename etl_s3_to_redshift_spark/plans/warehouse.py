"""Catalog/namespace lifecycle — the Spark mapping of the reference's
schema management (SURVEY.md §2a S4-S8):

- S4 CREATE SCHEMA         (reference sql_queries.py:14)   → CREATE DATABASE
- S5 CREATE TABLE typed    (reference sql_queries.py:28-117) → saveAsTable /
                                                             catalog schemas
- S6 DROP TABLE IF EXISTS  (reference sql_queries.py:18-24) → DROP TABLE
- S7 drop staging cleanup  (reference etl.py:31-34)         → drop temp views
- S8 SET search_path       (reference etl.py:49)            → setCurrentDatabase
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_schema(spark: SparkSession, name: str) -> None:
    """S4: idempotent namespace creation (reference sql_queries.py:14)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def use_schema(spark: SparkSession, name: str) -> None:
    """S8: search-path equivalent (reference etl.py:49)."""
    spark.catalog.setCurrentDatabase(name)


def drop_tables(spark: SparkSession, names: list[str]) -> None:
    """S6: idempotent full-refresh reset (reference sql_queries.py:18-24,
    one statement per table, fail-fast like etl.py:24-29)."""
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def save_table(
    df: DataFrame,
    name: str,
    sort_key: str | None = None,
    bucket_by: tuple[int, str] | None = None,
) -> None:
    """S5+S3: managed-table sink with the reference's physical hints.

    ``bucket_by=(n, col)`` is the Spark analogue of ``diststyle key``: two
    tables bucketed identically on their join key co-locate, and Catalyst
    elides the shuffle on later joins between them (verified in
    tests/test_plans_and_scale.py::test_bucketed_join_elides_shuffle). ``sort_key`` mirrors Redshift sortkey →
    parquet row-group stats pruning."""
    writer = df.write.mode("overwrite")
    if bucket_by is not None:
        n, col = bucket_by
        writer = writer.bucketBy(n, col)
        if sort_key:
            writer = writer.sortBy(sort_key)
    elif sort_key:
        writer = df.sortWithinPartitions(sort_key).write.mode("overwrite")
    writer.saveAsTable(name)


def drop_staging_views(spark: SparkSession, names: list[str]) -> None:
    """S7: staging cleanup (reference etl.py:31-34) — temp views carry no
    storage, dropping them just frees the name."""
    for t in names:
        spark.catalog.dropTempView(t)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_key: str | None = None,
) -> tuple[int, int]:
    """Small-file compaction — the table-maintenance job every streaming /
    incremental sink eventually needs (foreachBatch upserts and per-batch
    appends accrete files far below the scan-efficient size; at 100 TB a
    million 1 MB files costs more in listing + task scheduling than the
    scan itself).

    Reads the table, sizes the output at ceil(total_bytes /
    target_file_bytes) files, optionally re-sorts within partitions so
    row-group min/max stats stay tight (the sortkey analogue), and writes
    to ``dst_path``. The swap (point readers at dst / rename) is the
    caller's step: renames are not atomic on object stores, so the safe
    pattern everywhere is write-new-prefix + flip the reader's pointer —
    same shape as the reference's full-refresh staging swap
    (/root/reference/etl.py:22-34).

    A flat (unpartitioned) table directory is required: compaction reads
    the whole table and repartitions, which would flatten a
    partitionBy(...) directory layout — compact partitioned tables one
    partition directory at a time (each partition IS a flat parquet dir).
    Raises ValueError if ``src_path`` contains subdirectories.

    Returns (n_files_before, n_files_after).
    """
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()

    def parquet_files(p: str) -> tuple[list, list]:
        path = jvm.org.apache.hadoop.fs.Path(p)
        fs = path.getFileSystem(conf)
        statuses = list(fs.listStatus(path))
        files = [
            s
            for s in statuses
            if s.isFile() and s.getPath().getName().endswith(".parquet")
        ]
        dirs = [s for s in statuses if s.isDirectory()]
        return files, dirs

    files, dirs = parquet_files(src_path)
    if dirs:
        raise ValueError(
            f"{src_path} contains subdirectories (a partitioned layout?) — "
            "compact each partition directory separately; whole-table "
            "compaction would flatten the partitioning"
        )
    total_bytes = sum(s.getLen() for s in files)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(src_path)
    out = df.repartition(n_out)
    if sort_key:
        out = out.sortWithinPartitions(sort_key)
    out.write.mode("overwrite").parquet(dst_path)
    n_after = len(parquet_files(dst_path)[0])
    return len(files), n_after
