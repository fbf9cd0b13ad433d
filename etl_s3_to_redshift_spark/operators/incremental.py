"""Incremental (mergeable-partial) aggregate maintenance.

The reference pipeline is full-refresh: every load drops and rebuilds the
analytics tables (/root/reference/sql_queries.py:18-33,132-190). At 100 TB
a nightly full rescan of the fact history is the single most expensive
thing a warehouse can do, and it is unnecessary for the aggregate shapes
those tables hold: counts, sums, mins and maxes are *algebraic* — partial
states merge associatively, so yesterday's rollup plus today's partial
equals a full recompute, bit for bit.

These operators factor a rollup into that shape:

- ``partial_rollup``     — one map-side-combinable groupBy producing the
                           mergeable state (n, decimal sum, min, max).
- ``merge_rollups``      — union any number of partial states and combine
                           them with the same monoid (sum/sum/min/max).
                           Union is shuffle-free; the merge groupBy
                           shuffles only rollup rows (keys-cardinality,
                           not fact-cardinality).
- ``finalize_rollup``    — derive the non-mergeable outputs (avg) from the
                           merged state at read time.

The 100 TB flow: each ingest batch computes its own ``partial_rollup``
(one pass over the batch only) and appends it to a partials table; readers
``merge_rollups`` + ``finalize_rollup`` over the tiny partials table, or a
compaction job periodically folds the partials into one row per key. The
fact history is never rescanned. Exactness comes from the decimal sum —
double summation would drift with merge order and break the
merged-equals-full-recompute contract (pinned against a flat-SQL oracle
in the ``rollup_incremental_merge`` registry query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mergeable-state column names (the partial schema contract).
N_COL = "n_events"
SUM_COL = "sum_value"
MIN_COL = "min_value"
MAX_COL = "max_value"


def partial_rollup(
    df: DataFrame,
    keys: list[str | Column],
    value_col: str = "value",
    precision: int = 18,
    scale: int = 2,
) -> DataFrame:
    """One-pass mergeable aggregate state per key: count, exact decimal
    sum, min, max. Partial aggregation (map-side combine) applies — the
    shuffle carries one state row per (task, key), not fact rows."""
    v = F.col(value_col).cast(f"decimal({precision},{scale})")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(N_COL),
        F.sum(v).alias(SUM_COL),
        F.min(v).alias(MIN_COL),
        F.max(v).alias(MAX_COL),
    )


def merge_rollups(*partials: DataFrame) -> DataFrame:
    """Combine partial states with the same monoid: n and sum add, min
    and max fold. Associative and commutative, so any merge tree —
    nightly folds, region-parallel folds, recovery replays — yields the
    identical table. Input frames must share the partial schema (key
    columns + the four state columns)."""
    if not partials:
        raise ValueError("merge_rollups needs at least one partial frame")
    unioned = partials[0]
    for p in partials[1:]:
        unioned = unioned.unionByName(p)
    keys = [c for c in unioned.columns if c not in (N_COL, SUM_COL, MIN_COL, MAX_COL)]
    return unioned.groupBy(*keys).agg(
        F.sum(N_COL).cast("long").alias(N_COL),
        F.sum(SUM_COL).cast(dict(unioned.dtypes)[SUM_COL]).alias(SUM_COL),
        F.min(MIN_COL).alias(MIN_COL),
        F.max(MAX_COL).alias(MAX_COL),
    )


def finalize_rollup(merged: DataFrame) -> DataFrame:
    """Derive the presentation columns from the merged state: the exact
    decimal sum and min/max surface as doubles, avg is the IEEE double
    division of the (exactly-converted) sum by the exact count —
    identical operands in any engine, so the result is reproducible
    bit for bit (a decimal division would round at engine-specific
    scales before the double cast)."""
    return merged.select(
        *[c for c in merged.columns if c not in (N_COL, SUM_COL, MIN_COL, MAX_COL)],
        F.col(N_COL),
        F.col(SUM_COL).cast("double").alias("total_value"),
        F.col(MIN_COL).cast("double").alias("min_value"),
        F.col(MAX_COL).cast("double").alias("max_value"),
        (F.col(SUM_COL).cast("double") / F.col(N_COL)).alias("avg_value"),
    )
