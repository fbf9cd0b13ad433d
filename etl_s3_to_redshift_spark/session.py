"""SparkSession factory.

The reference delegates all physical execution to a provisioned Redshift
cluster (reference: redshift_cluster_generator.py:112-171). Here the
"cluster" is a SparkSession; this module centralizes the configuration we
rely on everywhere:

- AQE on (runtime coalescing, skew-join handling) — the moral equivalent of
  Redshift re-distributing slices at scale.
- ``spark.sql.shuffle.partitions`` sized to cores for local runs; a real
  1000-executor deployment would raise it (or let AQE coalesce from a high
  initial number).
- UTC session timezone so timestamp semantics match the oracle (DuckDB is
  UTC-naive) and are stable across machines.
- Arrow enabled for the Pandas-UDF paths (vectors/multimodal operators).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "etl_s3_to_redshift_spark",
    cpus: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this container.

    On a real cluster you would drop ``master`` and let spark-submit supply
    it; everything else carries over unchanged.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # Defaults to cores for the local lakes; a data-bound run sizes it
        # to the data instead (the sf100 probe sets 256 so a 600M-row
        # shuffle partition stays ~100MB — the same knob a real cluster
        # deployment turns, per the module docstring). AQE coalesces the
        # excess back down for the small-SF queries.
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(n)),
        )
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The local testdata lake ships single small parquet files (a
        # 600k-row lineitem is one ~10MB file): the default 128MB split
        # size leaves a 32-core session scanning on 1 task. 4MB splits the
        # files across cores (measured ~2× on scan-bound queries). On a
        # real cluster with properly-sized files keep the 128MB default.
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_GRAFT_SPLIT_BYTES", "4m"))
        # Some lake generations carry TIMESTAMP(NANOS), which Spark refuses
        # by default; read as long and convert in the loader
        # (sources/tables.py, dtype-driven — harmless for µs lakes).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
