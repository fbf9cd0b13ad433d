"""Parquet table loader for the driver testdata lake (TESTDATA.md).

One function to load all tables of a scale-factor directory and one to
register them as temp views so operators can be written in either the
DataFrame or SQL API (same Catalyst plan either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Must hold for any caller-supplied session (the driver builds its
        # own): TIMESTAMP(NANOS) parquet is unreadable without this conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark has no nanosecond
        # timestamp type, so (with spark.sql.legacy.parquet.nanosAsLong=true,
        # set in session.py) it arrives as epoch-nanos long. Truncate to
        # microseconds — the values are µs-granular, so this is lossless and
        # matches DuckDB's TIMESTAMP_NS view of the same file.
        # integer division: epoch-nanos (~1.7e18) exceeds double's 53-bit
        # mantissa, so float division would corrupt the low microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
