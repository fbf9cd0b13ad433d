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
        # Harmless when the lake carries µs timestamps instead.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # The driver lake's timestamp layout has varied across rounds:
    # TIMESTAMP(NANOS) (arrives as epoch-nanos long under nanosAsLong) vs
    # naive TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ). Normalize both to
    # session-local TimestampType so every downstream comparison/window sees
    # one type; the session is pinned to UTC (session.py), so the NTZ cast
    # is value-preserving and matches DuckDB's naive reading of the file.
    for col, dtype in df.dtypes:
        if name == "events" and col == "ts" and dtype == "bigint":
            # integer division: epoch-nanos (~1.7e18) exceeds double's 53-bit
            # mantissa, so float division would corrupt the low microseconds.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def load_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose batches were written under EVOLVING
    schemas (columns added over time — the normal life of a long-lived
    lake table). ``mergeSchema`` unions the footers' schemas; batches
    written before a column existed surface NULL for it. Spark skips the
    footer-merge pass by default because at 100 TB it reads every file's
    footer — so this loader is the explicit opt-in for tables known to
    evolve, rather than a global config flip. Columns can only be ADDED:
    parquet has no merge story for a column whose type changed — that
    migration is a rewrite, not a read option."""
    return spark.read.option("mergeSchema", "true").parquet(path)
