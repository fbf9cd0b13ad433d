"""Sinks — the Spark-first replacement for the reference's INSERT-SELECT
into Redshift tables (S3, reference sql_queries.py:132-190) and its
physical-design hints (diststyle / sortkey, sql_queries.py:66-117).

Mapping of the reference's storage decisions (SURVEY.md §4):

- full refresh (DROP + CREATE + reload, reference etl.py:22-29)
  → ``mode('overwrite')`` — idempotent, atomic per-table.
- ``sortkey(col)`` → ``sortWithinPartitions(col)`` before write: parquet
  row-group min/max stats then give readers the same pruning a Redshift
  sort key gives (zone-map skipping).
- ``diststyle even`` on the fact → ``repartition(n)`` round-robin;
  ``diststyle key`` would be ``repartition(n, key)``.
- partition-by-date on big facts: at 100 TB a date-partitioned layout is
  what makes partition pruning possible; expose ``partition_by``.

The Redshift JDBC writer is kept thin and untested-by-CI (no warehouse in
the container) — the reference's own COPY/INSERT pathway is a warehouse
detail, not query semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    sort_key: str | list[str] | None = None,
    partition_by: str | list[str] | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink emulating the reference's sortkey/diststyle hints."""
    out = df
    if num_files:
        out = out.repartition(num_files)
    if sort_key:
        keys = [sort_key] if isinstance(sort_key, str) else list(sort_key)
        out = out.sortWithinPartitions(*keys)
    writer = out.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.parquet(path)


def stage_for_copy(
    df: DataFrame,
    staging_path: str,
    table: str,
    iam_role: str = "${REDSHIFT_COPY_ROLE}",
    num_files: int | None = None,
) -> str:
    """The scalable Redshift load path: write parquet to a staging prefix
    and return the COPY statement that loads it — the warehouse pulls the
    files in parallel, data never transits the Spark driver or a JDBC
    row stream.

    This is the engine-side half of the reference's COPY pipeline
    (reference sql_queries.py:121-128 loads raw JSON; post-Spark the
    staged data is typed parquet, so the options collapse to
    ``FORMAT AS PARQUET``). The returned SQL is what an orchestrator
    executes against the warehouse; generation is pure and unit-testable
    without one.
    """
    write_parquet(df, staging_path, num_files=num_files)
    return (
        f"COPY {table}\n"
        f"FROM '{staging_path}'\n"
        f"IAM_ROLE '{iam_role}'\n"
        f"FORMAT AS PARQUET;"
    )


def write_redshift_jdbc(
    df: DataFrame,
    jdbc_url: str,
    table: str,
    user: str,
    password: str,
    mode: str = "append",
    batchsize: int = 10_000,
) -> None:
    """Thin JDBC sink for an actual Redshift target (reference S3 sink,
    sql_queries.py:132-190). Requires the Redshift/Postgres JDBC driver jar
    on the classpath. Contract-tested against any pg-protocol endpoint via
    tests/test_jdbc_sink.py (skips cleanly where no endpoint/jar is
    configured, as in the CI sandbox).

    At scale prefer the copy-based connector pattern (write parquet to S3,
    issue COPY) over row-wise JDBC inserts; this method exists for parity.
    """
    (
        df.write.format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )
