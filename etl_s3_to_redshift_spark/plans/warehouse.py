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
