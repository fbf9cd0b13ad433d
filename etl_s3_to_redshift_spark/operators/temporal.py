"""Temporal join operators Spark lacks natively: as-of join and
interval/range join — composed from built-ins (union + window, bucket
equi-join), never driver-side loops or per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the nearest right row of the same
    key — ``direction="backward"`` (default) takes the latest right row
    with right_ts <= left_ts (pd.merge_asof / DuckDB ASOF JOIN
    semantics, inclusive); ``direction="forward"`` takes the EARLIEST
    right row with right_ts >= left_ts (the "next event after" shape:
    next purchase, next maintenance window, next price revision).

    Implementation: tag and union both sides, sort each key's timeline
    once. Backward puts right rows before left at equal ts and carries
    the last non-null right payload forward over an unbounded-preceding
    window; forward mirrors it — right rows AFTER left at equal ts (so
    an equal-timestamp match is still inclusive) and ``first(...,
    ignorenulls=True)`` over an unbounded-following window. Returns all
    left columns + ``asof_ts`` (the matched right timestamp, NULL if
    none) + ``asof_<payload>`` columns.

    Scale: ONE shuffle on the key + a per-key sort — the same cost as any
    window aggregate; no range explosion; skew only from the key
    distribution. A merge_asof-per-group via applyInPandas pays the same
    shuffle plus Arrow+Python — use this instead.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward'; got {direction!r}")
    # at equal ts the right row must sort on the INCLUSIVE side of the
    # left row: before it (0 < 1) for backward, after it (2 > 1) forward
    r_side = 0 if direction == "backward" else 2
    left_rest = [c for c in left.columns if c != on]
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_rest],
    )
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload],
        *[F.col(c) for c in left_rest],
    )
    base = Window.partitionBy(on).orderBy("__ts", "__side")
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first
    carried = (
        r_tagged.unionByName(l_tagged)
        .select(
            "*",
            pick(F.when(F.col("__side") == r_side, F.col("__ts")), ignorenulls=True)
            .over(w)
            .alias("asof_ts"),
            *[
                pick(F.when(F.col("__side") == r_side, F.col(f"__p_{c}")), ignorenulls=True)
                .over(w)
                .alias(f"asof_{c}")
                for c in payload
            ],
        )
        .filter(F.col("__side") == 1)
    )
    return carried.select(
        F.col(on), *left_rest, "asof_ts", *[f"asof_{c}" for c in payload]
    )


def interval_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width_seconds: int,
) -> DataFrame:
    """Pure non-equi interval join (point BETWEEN start AND end, no equi
    key) made scalable: explode each interval to the bucket-grid cells it
    overlaps, bucket each point, equi-join on the cell, then apply the
    exact range predicate.

    Inner-join semantics only, by construction: the range predicate is
    applied as a post-join filter, which would silently drop the
    null-extended rows of any outer mode (they fail BETWEEN) — so the
    API does not offer one. For a left-outer interval join, run this and
    re-join the result to ``points``.

    Without this, Spark's only plan is a broadcast-nested-loop (O(n·m)).
    Pick ``bucket_width_seconds`` near the typical interval length: cost is
    O(points + intervals · (len/width) + true_matches).
    """
    w = bucket_width_seconds
    p_b = points.withColumn("__cell", F.floor(F.unix_timestamp(F.col(point_col)) / w))
    i_b = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / w),
                F.floor(F.unix_timestamp(F.col(end_col)) / w),
            )
        ),
    )
    return (
        p_b.join(i_b, "__cell", "inner")
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col)))
        .drop("__cell")
    )


def resample_gapfill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_hours: int = 1,
) -> DataFrame:
    """Regularize an event stream onto a fixed time grid per key: bucket
    events, generate the dense bucket spine between each key's first and
    last bucket (data-side via ``sequence``+``explode`` — the spine is
    never driver-materialized), left-join the observed buckets onto it,
    and forward-fill the last observed bucket total across gaps.

    Returns (key, bucket_start, n_events, bucket_value, carried_value):
    empty buckets carry n_events=0, bucket_value=0.0, and carried_value =
    the most recent non-empty bucket's total (never NULL — the spine
    starts at each key's first observation).

    Scale: one shuffle for the bucket aggregate, one tiny per-key bounds
    aggregate, and a window sort per key for the fill — the same cost
    profile as any per-key windowed aggregate. Spine size is bounded by
    keys x (span/step); pick the step so that product stays row-like
    (hourly grid over months, not millisecond grid over years). The
    bucket aggregate sums exact decimals; doubles appear only in the
    final projection.
    """
    step = F.expr(f"INTERVAL {step_hours} HOURS")
    # bucket on the step grid itself (epoch-aligned floor to step_hours),
    # NOT date_trunc('hour'): an hour-truncated bucket off the step grid
    # would match no spine row in the left join and its events would
    # silently vanish for any step_hours != 1
    step_sec = step_hours * 3600
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_sec).cast("long") * step_sec
    )
    hourly = (
        events.groupBy(F.col(key_col), bucket.alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col(value_col).cast("decimal(12,2)")).alias("__v"),
        )
    )
    bounds = hourly.groupBy(key_col).agg(
        F.min("bucket_start").alias("__b0"), F.max("bucket_start").alias("__b1")
    )
    spine = bounds.select(
        key_col, F.explode(F.sequence("__b0", "__b1", step)).alias("bucket_start")
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, [key_col, "bucket_start"], "left")
        .select(
            key_col,
            "bucket_start",
            F.coalesce(F.col("__n"), F.lit(0).cast("long")).alias("n_events"),
            F.coalesce(F.col("__v"), F.lit(0)).cast("double").alias("bucket_value"),
            F.last("__v", ignorenulls=True).over(w).cast("double").alias("carried_value"),
        )
    )


def interpolate_gaps(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    step_hours: int = 1,
) -> DataFrame:
    """Linear-interpolation gap fill: bucket events onto a fixed per-key
    time grid (as ``resample_gapfill``) and fill EMPTY buckets with the
    straight line between the nearest observed buckets on either side —
    the time-series companion to forward-fill for rate-like metrics
    where carrying the last value misstates the trend.

    Returns (key, bucket_start, n_events, value): observed buckets keep
    their exact aggregate; empty buckets get
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)`` rounded
    to 6 dp. The spine spans each key's own [first, last] observed
    bucket, so both neighbors always exist and the output is never NULL.

    Scale shape: identical to ``resample_gapfill`` — one bucket-aggregate
    shuffle, a tiny per-key bounds aggregate, a data-side
    ``sequence``+``explode`` spine, and ONE per-key window sort that
    computes both the backward (last non-null) and forward (first
    non-null) neighbor in the same sort via a mirrored frame. No
    self-join of the spine against observations, no driver
    materialization; cost is the same windowed-aggregate profile at any
    key x span/step size.
    """
    step_sec = step_hours * 3600
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_sec).cast("long") * step_sec
    )
    hourly = events.groupBy(F.col(key_col), bucket.alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast("decimal(12,2)")).alias("__v"),
    )
    bounds = hourly.groupBy(key_col).agg(
        F.min("bucket_start").alias("__b0"), F.max("bucket_start").alias("__b1")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.sequence("__b0", "__b1", F.expr(f"INTERVAL {step_hours} HOURS"))
        ).alias("bucket_start"),
    )
    grid = spine.join(hourly, [key_col, "bucket_start"], "left")
    wb = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.unix_timestamp("bucket_start").cast("double")
    obs_t = F.when(F.col("__v").isNotNull(), t)
    prev_v = F.last(F.col("__v").cast("double"), ignorenulls=True).over(wb)
    prev_t = F.last(obs_t, ignorenulls=True).over(wb)
    next_v = F.first(F.col("__v").cast("double"), ignorenulls=True).over(wf)
    next_t = F.first(obs_t, ignorenulls=True).over(wf)
    interp = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
    return grid.select(
        key_col,
        "bucket_start",
        F.coalesce(F.col("__n"), F.lit(0).cast("long")).alias("n_events"),
        F.round(
            F.when(F.col("__v").isNotNull(), F.col("__v").cast("double")).otherwise(
                interp
            ),
            6,
        ).alias("value"),
    )
