"""Streaming load gate: per-micro-batch expectation checks with
quarantine routing — the production shape of "validate on ingest".

Each micro-batch is split by the ROW-LEVEL rules of
``operators/quality`` (not-null / range / accepted-set / regex): rows
violating any rule append to the dead-letter path with a ``__failed``
column naming the rules they broke; clean rows append to the clean
path. foreachBatch itself is only AT-LEAST-ONCE (a crash between the
clean write and the checkpoint commit replays the batch), so the gate
makes the replay idempotent by writing every batch to a deterministic
``batch_id=<n>`` subdirectory with mode=overwrite: a replayed batch
overwrites its own previous (possibly partial) output instead of
appending duplicates. Readers see a standard partition-discovered
layout (``spark.read.parquet(clean_path)`` exposes ``batch_id`` as a
partition column — free per-batch lineage).

Aggregate rules (unique, references) are deliberately NOT evaluated
per batch: a key unique within every batch can still collide across
batches, so cross-batch invariants belong to the batch auditor
(``expectations_report`` over the accumulated table, or the MERGE
sink's key semantics) — running them here would give a false pass.

Reference anchor: the reference loads first and verifies afterwards
with notebook row counts (test_etl.ipynb); this gate moves the check
into the load path, which is what COPY MAXERROR + stl_load_errors
approximate on the warehouse."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.quality import Rule, _row_violation


def split_by_rules(df: DataFrame, rules: list[Rule]) -> tuple[DataFrame, DataFrame]:
    """(clean, dead) split by row-level rules; dead rows carry
    ``__failed`` = comma-joined names of the rules they violate."""
    row_rules = [r for r in rules if r.kind in ("not_null", "range", "in_set", "regex")]
    failed = F.concat_ws(
        ",",
        *[F.when(_row_violation(r), F.lit(r.name)) for r in row_rules],
    )
    tagged = df.withColumn("__failed", failed)
    clean = tagged.filter(F.col("__failed") == "").drop("__failed")
    dead = tagged.filter(F.col("__failed") != "")
    return clean, dead


def gate_batch(
    batch_df: DataFrame,
    batch_id: int,
    rules: list[Rule],
    clean_path: str,
    dead_path: str,
) -> None:
    """One micro-batch through the gate. Idempotent under foreachBatch's
    at-least-once replay: each batch owns a deterministic
    ``batch_id=<n>`` subdir and overwrites it wholesale, so a replayed
    batch replaces its own previous (possibly partial) output instead of
    appending duplicates."""
    if batch_df.isEmpty():
        return
    clean, dead = split_by_rules(batch_df, rules)
    clean.write.mode("overwrite").parquet(f"{clean_path}/batch_id={batch_id}")
    dead.write.mode("overwrite").parquet(f"{dead_path}/batch_id={batch_id}")


def start_quality_gated_stream(
    stream: DataFrame,
    rules: list[Rule],
    clean_path: str,
    dead_path: str,
    checkpoint: str,
):
    """Wire a stream through the gate: clean rows to ``clean_path``,
    violating rows (with ``__failed``) to ``dead_path``."""

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        gate_batch(batch_df, batch_id, rules, clean_path, dead_path)

    return (
        stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint)
        .start()
    )
