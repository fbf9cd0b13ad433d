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


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel progression: for each user, the earliest time they
    completed step k AFTER their step-(k-1) completion (first matching
    event at-or-after the previous step's time). Returns one row per
    user who completed step 1, with nullable ``t1..tN`` timestamps.

    Shape: N-1 equi-joins on the user key, each with a residual ``ts >=
    prev`` predicate and a min-aggregate — every join is a plain hash
    join on ``user_col`` (the range bound is a post-join filter, never a
    cross product), and every aggregate combines map-side. All stages
    share the same key, so a co-partitioned layout (or AQE) reuses one
    exchange. Step frames are pre-filtered scans of the same events
    table — at 100 TB each is a pushed-down predicate read, and users
    who never did step 1 are dropped before any later join.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        # The range bound lives IN the left join (equi on user + residual
        # ts >= prev), so a user whose step-i events all precede step
        # i-1 keeps their row with a null t_i instead of vanishing.
        cur = (
            cur.join(
                nxt,
                (F.col(user_col) == F.col("__u")) & (F.col("__ts") >= F.col(f"t{i-1}")),
                "left",
            )
            .groupBy(user_col, *[f"t{j}" for j in range(1, i)])
            .agg(F.min("__ts").alias(f"t{i}"))
        )
    return cur


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic weekly cohort-retention matrix: cohort = Monday-truncated
    week of the user's first event; for each (cohort_week, week_offset)
    count the distinct users active that week. Week offsets are exact
    integer day-diffs div 7 from the cohort Monday, so any ANSI engine
    lands every event in the same cell.

    Shape: one groupBy(user) min(ts) for first-touch (map-side
    combined), broadcast-or-shuffle equi-join back (user cardinality ≪
    events), then countDistinct over (cohort, offset) — Spark plans
    distinct-aggregate as a two-phase expand, both phases partial. No
    window functions, no per-user sort.
    """
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__first"))
    cohort = F.date_trunc("week", F.col("__first")).cast("date")
    return (
        events.join(first, user_col)
        .withColumn("cohort_week", cohort)
        .withColumn(
            "week_offset",
            F.expr(f"datediff(CAST({ts_col} AS DATE), cohort_week) div 7").cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("active_users"))
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts/probabilities between event
    types along each user's timeline (ordered by ``ts`` with the id as a
    total-order tiebreak, so ties are deterministic cross-engine).

    Shape: one window shuffle on ``user_col`` (lag), then a groupBy on
    the (prev, next) pair — 25 cells here, map-side combined. The row
    probability divides two exact BIGINTs once, in double. At 100 TB the
    window partitions by user (bounded per-user history); no global sort.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    pairs = (
        events.withColumn("prev_type", F.lag(type_col).over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col(type_col).alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return pairs.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(wp), 6)
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
) -> DataFrame:
    """Percentile winsorization (robust feature scaling): clamp
    ``value_col`` to its exact [p_lo, p_hi] percentile band, per group
    when ``group_cols`` is given — the standard outlier-taming transform
    before quality-score calibration or regression features.

    Appends ``p_lo_v`` / ``p_hi_v`` (the exact linear-interpolation
    percentiles, the same definition as SQL ``quantile_cont``) and
    ``winsorized`` (6-dp) to the input columns.

    Scale shape: percentiles come from ONE groupBy aggregate over the
    groups (exact percentile needs the group's sorted values — at 100 TB
    use bounded-error ``percentile_approx`` instead; this operator keeps
    the exact form because its contract is oracle-equality), then a
    broadcast-sized join back (group-count rows). The clamp itself is a
    narrow projection. No window over the full table, no global sort.
    """
    gcols = group_cols or []
    pcts = df.groupBy(*gcols).agg(
        F.percentile(value_col, F.lit(p_lo)).alias("p_lo_v"),
        F.percentile(value_col, F.lit(p_hi)).alias("p_hi_v"),
    )
    joined = df.join(F.broadcast(pcts), gcols) if gcols else df.crossJoin(F.broadcast(pcts))
    v = F.col(value_col)
    return joined.withColumn(
        "winsorized",
        F.round(F.least(F.greatest(v, F.col("p_lo_v")), F.col("p_hi_v")), 6),
    ).withColumn("p_lo_v", F.round("p_lo_v", 6)).withColumn("p_hi_v", F.round("p_hi_v", 6))


def rolling_zscore_anomalies(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_buckets: int = 24,
    z_threshold: float = 3.0,
    step_hours: int = 1,
) -> DataFrame:
    """Time-series anomaly flags: bucket events per key onto the hourly
    grid, then score each bucket's count against the mean/stddev of the
    PRECEDING ``window_buckets`` buckets (trailing window excluding the
    current row — the score must not see the value it judges). Returns
    every scored bucket with its z-score and an ``is_anomaly`` flag;
    buckets with fewer than 2 trailing points or zero variance score
    NULL and never flag.

    z = (n - mean_trailing) / stddev_trailing, 6 dp — stddev is the
    sample form (N-1), matching SQL ``stddev``/``stddev_samp``.

    Scale shape: one bucket-aggregate shuffle (map-side combined), then
    ONE per-key window sort computing count/mean/stddev over the same
    trailing frame. State is bounded by keys x window_buckets; nothing
    driver-side. The same cost profile as any windowed aggregate —
    applies unchanged to a 1000-executor run because the window
    partitions by key.
    """
    step_sec = step_hours * 3600
    bucket_epoch = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_sec).cast("long") * step_sec
    )
    hourly = events.groupBy(
        F.col(key_col), bucket_epoch.alias("bucket_epoch")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_epoch")
        .rowsBetween(-window_buckets, -1)
    )
    mean_t = F.avg(F.col("n_events").cast("double")).over(w)
    sd_t = F.stddev_samp(F.col("n_events").cast("double")).over(w)
    n_t = F.count(F.lit(1)).over(w)
    z = F.when(
        (n_t >= 2) & (sd_t > 0),
        F.round((F.col("n_events") - mean_t) / sd_t, 6),
    )
    return hourly.select(
        key_col,
        "bucket_epoch",
        "n_events",
        n_t.alias("n_trailing"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) >= z_threshold, F.lit(False)).alias("is_anomaly"),
    )


def attribution_u_shaped(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_hours: int = 168,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Multi-touch marketing attribution with U-shaped (position-based)
    credit: for every conversion event, find the user's touch events in
    the preceding ``lookback_hours`` window and split the conversion's
    value across them — 100% to a lone touch, 50/50 across two, else
    40% first + 40% last + 20% shared equally by the middles.
    Conversions with no touch in the window credit a synthetic
    ``unattributed`` channel, so total credited value always equals
    total conversion value (conservation is the operator's invariant —
    pinned in tests).

    Returns one row per (channel) with ``credited_value`` (6 dp),
    ``n_credits`` (touch-credit rows), and ``n_conversions`` touched.

    Scale shape: the touch window is ONE per-user LEFT equi-join
    (touches and conversions both shuffle once on the user key) with
    the time bound inside the join condition — per-user activity is
    bounded, so the join output tracks true (conversion ×
    in-window-touch) pairs, never a cross product, and a conversion
    with no in-window touch emits exactly one null-touch row, which IS
    the 'unattributed' credit (its window set has n=1 → weight 1.0 →
    full value). The earlier form derived 'unattributed' with an
    anti-join against the credit frame, which — Spark having no
    subplan sharing — re-ran the whole join+window pipeline a second
    time (measured sf100 86.6 → 47.8 s, sf10 7.4 → 5.7 s from folding
    it away, output identical). Position weights come from ONE window sort per
    conversion set; the channel rollup is a map-side-combined
    aggregate over credit-sized rows.
    """
    ev = events
    conv = ev.filter(F.col("event_type") == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col("event_id").alias("conv_id"),
        F.col(ts_col).alias("__cts"),
        F.col(value_col).cast("double").alias("__val"),
    )
    touch = ev.filter(F.col("event_type").isin(*touch_types)).select(
        F.col(user_col).alias("__tu"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.col(ts_col).alias("__tts"),
    )
    lb = F.expr(f"INTERVAL {lookback_hours} HOURS")
    pairs = conv.join(
        touch,
        (F.col("__u") == F.col("__tu"))
        & (F.col("__tts") <= F.col("__cts"))
        & (F.col("__tts") >= F.col("__cts") - lb),
        "left",
    )
    w = Window.partitionBy("conv_id").orderBy(F.col("__tts").asc(), F.col("touch_id").asc())
    ranked = (
        pairs.withColumn("__pos", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("conv_id")))
    )
    weight = (
        F.when(F.col("__n") == 1, F.lit(1.0))
        .when(F.col("__n") == 2, F.lit(0.5))
        .when(F.col("__pos") == 1, F.lit(0.4))
        .when(F.col("__pos") == F.col("__n"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("__n") - 2))
    )
    # per-credit doubles are computed identically on any engine (same IEEE
    # ops per row); rounding each credit at 9 dp and summing as DECIMAL
    # makes the rollup exact and order-independent — a raw double sum's
    # merge-order drift would sit within one 6-dp grain of the total.
    # A lone null-touch row has n=1 → weight 1.0 → round(val, 9),
    # exactly the credit the anti-join branch used to emit.
    credit9 = F.round(weight * F.col("__val"), 9).cast("decimal(20,9)")
    credits = ranked.select(
        "conv_id",
        F.coalesce(F.col("channel"), F.lit("unattributed")).alias("channel"),
        credit9.alias("__credit"),
    )
    return (
        credits.groupBy("channel")
        .agg(
            F.round(F.sum("__credit").cast("double"), 6).alias("credited_value"),
            F.count(F.lit(1)).alias("n_credits"),
            F.countDistinct("conv_id").alias("n_conversions"),
        )
    )
