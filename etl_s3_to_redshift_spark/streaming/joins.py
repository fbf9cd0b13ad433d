"""Stream-stream joins with event-time range bounds and batch twins.

The canonical Structured Streaming join: two streams equi-joined on a key
with an event-time interval condition (right event within [left_ts,
left_ts + upper]). The range bound is what makes the join feasible on
unbounded streams — combined with watermarks it tells Spark exactly when
buffered state on each side can be dropped (left rows older than
watermark - upper, right rows older than watermark). Without the time
bound a stream-stream join would buffer both streams forever.

Like streaming/windows.py, each operator runs identically on batch frames
(oracle-checkable ANSI SQL twin) and ``readStream`` frames — one plan,
two execution modes.

Outer-mode caveat (documented, pinned in tests): streaming left-outer
emits null-extended rows only once the watermark passes the join bound,
so a bounded test source leaves tail rows unemitted under
``processAllAvailable`` — the streaming equivalence test therefore runs
the inner join; outer correctness is covered by the batch twin, where the
range predicate lives INSIDE the join condition (a post-join filter would
silently drop null-extended rows — see operators/temporal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    upper_seconds: int,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    watermark: str = "1 hour",
    how: str = "inner",
    streaming: bool = False,
) -> DataFrame:
    """Join right-side events landing within ``[left_ts, left_ts +
    upper_seconds]`` of a left event with the same key.

    State bound (streaming): left buffers ``watermark + upper`` of data,
    right buffers ``watermark``. The interval is closed on both ends and
    expressed with an exact integer-seconds arithmetic both engines
    (Spark, DuckDB) evaluate identically.
    """
    l = left.withWatermark(left_ts, watermark) if streaming else left
    r = right.withWatermark(right_ts, watermark) if streaming else right
    cond = (
        (l[key_col] == r[key_col])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    joined = l.join(r, cond, how)
    return joined.drop(r[key_col])


def view_to_purchase_funnel(
    events: DataFrame,
    window_seconds: int = 1800,
    streaming_views: DataFrame | None = None,
    streaming_purchases: DataFrame | None = None,
) -> DataFrame:
    """Conversion funnel: each view paired with the same user's purchases
    in the following ``window_seconds`` — the classic stream-stream join
    workload (attribution). Pass pre-split ``readStream`` frames for the
    streaming run; otherwise both sides derive from the one batch frame.

    Output: (user_id, view_id, purchase_id, secs_to_purchase), exact
    integer second gaps.
    """
    if streaming_views is not None:
        views, purchases = streaming_views, streaming_purchases
        streaming = True
    else:
        views, purchases = events, events
        streaming = False
    v = views.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"), F.col("ts").alias("l_ts")
    )
    p = purchases.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("r_ts")
    )
    joined = interval_join_streams(
        v, p, "user_id", window_seconds, watermark="1 hour", streaming=streaming
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias("secs_to_purchase"),
    )


def enrich_stream(stream, dim, keys: list[str], how: str = "left"):
    """Stream-static enrichment: join a streaming frame against a batch
    dimension. Spark re-plans the static side per micro-batch, so a dim
    refreshed in place (or a SnapshotTable read re-resolved per batch)
    is picked up without restarting the query; the broadcast keeps the
    stream side shuffle-free — the streaming twin of the reference's
    diststyle-all enrichment (sql_queries.py:144-151).

    State: none — stream-static joins buffer nothing, unlike
    stream-stream joins; at 100 TB this is the default way to decorate
    an event stream with dimension attributes."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), keys, how)
