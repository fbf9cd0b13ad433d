"""Range-partitioned two-pass prefix aggregation.

A global ``row_number()`` / running ``sum()`` window with no PARTITION BY
funnels the entire frame through ONE window task — the classic
scale-killer (WindowExec single-partition warning). This module computes
the same exact results with the standard distributed two-pass scheme:

  pass 1  ``repartitionByRange`` on the order key: contiguous key ranges
          map to ascending partition ids, so global order ==
          (partition id asc, within-partition order). Each partition
          then computes its LOCAL row_number / running sum in parallel
          under a window partitioned by the materialized partition id.
  pass 2  per-partition (row count, value sum) — a ``#partitions``-row
          frame — gets exclusive prefix offsets and the grand total via
          a window over that tiny frame, then broadcast-equi-joins back
          on the partition id (BroadcastHashJoin, never a
          BroadcastNestedLoopJoin/cartesian: the 1-row "total" rides the
          same equi-join instead of a crossJoin).

Exactness: identical to the global window PROVIDED the order key is a
total order (unique tuple). With ties, rows with equal keys may straddle
a range boundary and their relative rank becomes partition-placement
dependent — the same caveat an unpartitioned window already has for
non-deterministic tie order. All running sums are computed in the value
column's own type (DECIMAL stays DECIMAL — exact, order-independent).

Scale shape at 100 TB: one range shuffle (Spark's own global-sort
machinery, balanced by sampled boundaries), one hash shuffle on the
partition id for the local windows, one tiny aggregate + broadcast.
No single task ever sees more than one partition's rows.

Reference parity note: the reference engine has no windowed analytics at
all (SURVEY §2 R1–R9 are scan/join/distinct shapes); this operator backs
the extension queries (Pareto concentration, exact equi-depth
histograms) that a Redshift user of the reference would express with
``SUM(...) OVER (ORDER BY ...)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["ranked_running"]


def ranked_running(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str | None = None,
    *,
    rank_col: str = "rk",
    cum_col: str = "cum",
    total_col: str = "total",
    count_col: str | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """Global rank (and optional running total) without a global window.

    Appends to ``df``:
      * ``rank_col``   — global 1-based ``row_number`` over ``order_cols``
                         (LongType).
      * ``cum_col``    — running sum of ``value_col`` up to and including
                         the current row (only if ``value_col`` given).
      * ``total_col``  — grand total of ``value_col``, same on every row
                         (only if ``value_col`` given).
      * ``count_col``  — total row count, same on every row (only if
                         requested; e.g. for exact ntile bucketing).

    ``order_cols`` must define a TOTAL order (include a unique tiebreak
    key) for deterministic ranks — the same contract as a global window.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    # Pass 1: range shuffle → ascending partition ids follow the global
    # order; materialize the id BEFORE any further shuffle.
    ranged = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    # Both passes below re-read ``ranged``; correctness requires they see
    # the SAME range boundaries. Exchange reuse normally guarantees that,
    # but repartitionByRange samples boundaries with a per-RDD seed, so if
    # reuse is disabled (spark.sql.exchange.reuse=false) or AQE replans
    # one branch, the two passes could get DIFFERENT boundaries and the
    # broadcast offsets would silently misalign with the local ranks.
    # Pin one materialized partitioning (same pattern as components.py /
    # bpe.py lineage cuts). DISK_ONLY: this frame is FACT-sized, and a
    # memory-resident localCheckpoint block that gets evicted under
    # pressure is unrecoverable (lineage is gone) — observed as OOM +
    # "Block does not exist" on 600M-row inputs at sf100.
    ranged = ranged.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    local_cols = [F.row_number().over(w_local).cast("long").alias("__lrk")]
    if value_col is not None:
        local_cols.append(
            F.sum(value_col)
            .over(w_local.rowsBetween(Window.unboundedPreceding, 0))
            .alias("__lcum")
        )
    local = ranged.select("*", *local_cols)

    # Pass 2: per-partition stats → exclusive prefix offsets + totals.
    # This frame has at most ``n_parts`` rows; the ordered window over it
    # is single-partition BY DESIGN and bounded at every scale.
    aggs = [F.count(F.lit(1)).alias("__n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("__s"))
    parts = ranged.groupBy("__pid").agg(*aggs)
    # partitionBy(pmod(__pid, 1)): always 0 — same single-partition
    # execution (the frame is ≤ n_parts rows, bounded at every scale) —
    # but a non-foldable partition key so WindowExec doesn't emit its
    # global-window warning for a frame that is small BY DESIGN.
    w_one = Window.partitionBy(F.pmod(F.col("__pid"), F.lit(1))).orderBy("__pid")
    w_run = w_one.rowsBetween(Window.unboundedPreceding, 0)
    w_all = w_one.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.col("__pid"),
        (F.sum("__n").over(w_run) - F.col("__n")).alias("__rk_off"),
    ]
    if count_col is not None:
        off_cols.append(F.sum("__n").over(w_all).alias(count_col))
    if value_col is not None:
        off_cols.append((F.sum("__s").over(w_run) - F.col("__s")).alias("__cum_off"))
        off_cols.append(F.sum("__s").over(w_all).alias(total_col))
    offsets = parts.select(*off_cols)

    out = local.join(F.broadcast(offsets), "__pid")
    result_cols = [c for c in df.columns] + [
        (F.col("__rk_off") + F.col("__lrk")).alias(rank_col)
    ]
    if count_col is not None:
        result_cols.append(F.col(count_col))
    if value_col is not None:
        result_cols.append((F.col("__cum_off") + F.col("__lcum")).alias(cum_col))
        result_cols.append(F.col(total_col))
    return out.select(*result_cols)
