"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windows (streaming/windows.py) cover time-bucketed state; this
module is the escape hatch for *arbitrary* per-key state machines — here a
per-user running profile (event count, exact running value sum, last-seen
timestamp) that emits an updated row per key per micro-batch.

State is a tuple held by the state store (RocksDB/HDFS-backed on a real
cluster); a processing-time timeout expires idle keys so state stays
bounded — the applyInPandasWithState contract for unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)


def make_profile_updater(idle_timeout_ms: int | None):
    """Build the per-key update function; ``idle_timeout_ms`` expires idle
    keys (None = no timeout)."""

    def _update_user_profile(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Fold each micro-batch's rows for this user into the running
        profile.

        Money is accumulated in integer cents and time in integer micros —
        integer state is exact and replay-stable (a float accumulator would
        drift with batch boundaries)."""
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, cents, last = state.get if state.exists else (0, 0, 0)
        for pdf in batches:
            n += len(pdf)
            # per-row rounding (matches the batch twin's round-then-sum; a
            # round-of-sum would disagree once per-row noise accumulates).
            # HALF_UP via copysign-floor — pandas .round() is half-to-even
            # and diverges from the batch twin's F.round (HALF_UP) exactly
            # on .5 cents (e.g. value 0.125).
            v = pdf["value"].to_numpy() * 100
            cents += int(np.copysign(np.floor(np.abs(v) + 0.5), v).astype("int64").sum())
            if len(pdf):
                micros = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
                last = max(last, int(micros.max()))
        state.update((n, cents, last))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value_cents": [cents],
                "last_ts_micros": [last],
            }
        )

    return _update_user_profile


def running_user_profile(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Streaming: continuously-updated per-user profile. Input must be a
    streaming DataFrame with (user_id, ts, value).

    ``idle_timeout_ms`` bounds state for unbounded key spaces (expired keys
    are dropped). Note the harness interplay: with a processing-time
    timeout the engine schedules state-cleanup batches indefinitely, so
    ``processAllAvailable()`` never quiesces — bounded smoke tests must
    either poll the sink or run with no timeout."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        make_profile_updater(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def batch_user_profile(events: DataFrame) -> DataFrame:
    """Batch twin with identical semantics (exact integer accumulation) for
    correctness comparison."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_value_cents"),
        F.max(F.unix_micros(F.col("ts"))).alias("last_ts_micros"),
    )
