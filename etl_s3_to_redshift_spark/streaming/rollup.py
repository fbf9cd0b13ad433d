"""Streaming rollup maintenance: foreachBatch + mergeable partials.

The streaming twin of ``operators/incremental.py``: each micro-batch
computes its own partial aggregate state (one pass over the batch only)
and lands it under ``partials_path/batch_id=N/``. Writing the partial
into a directory KEYED BY THE BATCH ID is what makes the sink
exactly-once: Structured Streaming replays a failed micro-batch with the
same batch id, the overwrite hits the same directory, and the merged
rollup is unchanged — no double counting, no sink-side transaction log
needed. (An append-mode partials table would double-count replays; a
read-merge-rewrite sink would race concurrent readers.)

Readers fold the partials table with the same algebraic monoid
(``merge_rollups``) at read time; a maintenance job can periodically
compact thousands of per-batch directories into one folded partial
(``compact_partials``) — the fold is associative, so compaction is
invisible to readers. The fact stream is aggregated exactly once, ever;
nothing rescans history. At 100 TB the partials table is
keys-cardinality × batches — compaction keeps it at keys-cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_s3_to_redshift_spark.operators.incremental import (
    finalize_rollup,
    merge_rollups,
    partial_rollup,
)


def write_batch_partial(
    batch_df: DataFrame,
    batch_id: int,
    partials_path: str,
    keys: list[str],
    value_col: str = "value",
) -> None:
    """One micro-batch → one partial-state directory. Idempotent under
    replay: the same batch id overwrites the same directory."""
    if batch_df.isEmpty():
        return
    partial_rollup(batch_df, keys, value_col).write.mode("overwrite").parquet(
        f"{partials_path}/batch_id={batch_id}"
    )


def start_rollup_stream(
    stream: DataFrame,
    partials_path: str,
    keys: list[str],
    checkpoint: str,
    value_col: str = "value",
):
    """Wire a streaming frame into the partials sink. Returns the running
    StreamingQuery; callers drive it (processAllAvailable) or let it run."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_partial(batch_df, batch_id, partials_path, keys, value_col)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_rollup(spark: SparkSession, partials_path: str) -> DataFrame:
    """Fold every per-batch partial into the finalized rollup. The
    ``batch_id`` partition column is dropped before the merge — it is
    provenance, not a rollup key."""
    parts = spark.read.parquet(partials_path).drop("batch_id")
    return finalize_rollup(merge_rollups(parts))


def compact_partials(spark: SparkSession, partials_path: str, dst_path: str) -> None:
    """Fold all per-batch partials into one partial-state table at
    ``dst_path`` (still mergeable — future batches keep appending next to
    it). Associativity makes compaction invisible to ``read_rollup``."""
    parts = spark.read.parquet(partials_path).drop("batch_id")
    merge_rollups(parts).write.mode("overwrite").parquet(dst_path)
