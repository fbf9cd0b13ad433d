"""Analytics operators — the aggregation/window/set-op surface the
reference lacks (SURVEY.md §2c) but the north star requires. All pure
built-ins: whole-stage-codegen'd, map-side partial aggregation, AQE-sized
shuffles.

Cross-engine determinism: monetary aggregates are summed as DECIMAL —
decimal addition is exact and associative, so the result is independent of
partitioning/merge order (a float sum is not, and would flap the driver's
value-hash). Derived averages divide the exact sums once, in double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def money(col: Column | str) -> Column:
    """A monetary double → DECIMAL(12,2). The raw columns carry 2-decimal
    values, so this cast is unambiguous under any rounding mode; all
    downstream arithmetic on the decimals is exact and engine-independent.
    Precision 12 keeps two chained multiplications within DECIMAL(38,6) in
    both Spark and DuckDB (wider operands would overflow 38 and silently
    degrade to double in DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def dec_sum(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """Order-insensitive exact sum of a double column: per-row cast to
    DECIMAL(18,scale) (deterministic rounding of the same IEEE double in
    every engine), then exact decimal addition."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})"))
    return out.alias(alias) if alias else out


def ratio(num: Column, den: Column) -> Column:
    """Single double division of two exact values — deterministic."""
    return num.cast("double") / den.cast("double")


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_alias: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number. ``order_by`` must totally order
    rows within a group (include a unique tiebreak) or results are
    nondeterministic. Physically: one hash shuffle on the group keys, then
    per-partition sort — no global sort."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int,
    session_alias: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization (batch): a new session starts when the gap
    to the previous event of the same user is >= the threshold — the same
    boundary rule as ``F.session_window`` (a session covers [ts, ts+gap);
    an event at exactly ts+gap starts a new one), so batch and streaming
    sessionization agree on events spaced exactly at the gap.

    lag + conditional flag + running sum — the classic islands pattern;
    identical SQL runs on any ANSI engine (the oracle uses the same text).
    One shuffle on user_col; within-group sort by ts. The streaming twin is
    ``F.session_window`` (streaming/windows.py).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_sec = gap_minutes * 60
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) >= gap_sec),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn("__new_sess", is_new).withColumn(
        session_alias,
        F.sum("__new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("__new_sess")
