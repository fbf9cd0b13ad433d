"""Streaming rolling z-score anomaly detection via
``applyInPandasWithState`` — the streaming twin of
``operators/analytics.rolling_zscore_anomalies``.

Per key (event type) the state is the map bucket_epoch → count of every
bucket still inside the scoring horizon. Each micro-batch folds its rows
into the map and re-emits the scores of every bucket whose trailing
window could have changed (update semantics: the LAST row emitted per
(key, bucket) is the current truth, and once the source is drained it
equals the batch operator's output exactly — pinned in tests).

State bounding: the map is trimmed to the newest ``retain_buckets``
buckets (window + slack). A bucket that has already slid out of every
live trailing window can never change another bucket's score, so
trimming is lossless for the emitted stream going forward — the
standard watermark argument, applied to a custom operator. Integer
counts keep the state exact and replay-stable; all double math
(mean/stddev/z) happens at emit time, never in state.

Trim watermark: once trimming has occurred, the oldest retained
buckets have trailing frames that conceptually extend into the trimmed
region — re-scoring them from the truncated map would be wrong (and in
update mode would overwrite their earlier, correct emissions). The
state therefore carries the max epoch ever trimmed, and a bucket is
re-emitted only when its whole trailing frame lies strictly above that
watermark. Each bucket is scored with its full frame before it can age
into the suppressed horizon (``retain_buckets >= window + slack``, the
same in-order-within-slack assumption a time watermark makes), so the
last emission per (key, bucket) still equals the batch twin.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ZSCORE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("bucket_epoch", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_trailing", T.LongType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

ZSCORE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bucket_epochs", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        # max epoch ever trimmed from this key's map (-1 = never trimmed);
        # buckets whose trailing frame reaches it are not re-emitted
        T.StructField("trim_watermark", T.LongType()),
    ]
)


def score_buckets(
    buckets: dict[int, int], window_buckets: int, z_threshold: float
) -> pd.DataFrame:
    """Score every bucket against its trailing ``window_buckets`` observed
    buckets — the same math as the batch operator (sample stddev, score
    excludes the judged bucket, 6-dp rounding, NULL below 2 trailing
    points or at zero variance)."""
    epochs = sorted(buckets)
    rows = []
    for i, ep in enumerate(epochs):
        trail = [buckets[e] for e in epochs[max(0, i - window_buckets) : i]]
        n_t = len(trail)
        z = None
        if n_t >= 2:
            mean = sum(trail) / n_t
            var = sum((c - mean) ** 2 for c in trail) / (n_t - 1)
            if var > 0:
                z = round((buckets[ep] - mean) / math.sqrt(var), 6)
        rows.append((ep, buckets[ep], n_t, z, bool(z is not None and abs(z) >= z_threshold)))
    return pd.DataFrame(
        rows, columns=["bucket_epoch", "n_events", "n_trailing", "zscore", "is_anomaly"]
    )


def make_zscore_updater(
    window_buckets: int, z_threshold: float, step_seconds: int, retain_buckets: int
):
    def _update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            epochs, counts, watermark = state.get
            buckets = dict(zip(epochs, counts))
        else:
            buckets, watermark = {}, -1
        for pdf in batches:
            if not len(pdf):
                continue
            secs = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
            eps = (secs // step_seconds) * step_seconds
            for ep, n in eps.value_counts().items():
                buckets[int(ep)] = buckets.get(int(ep), 0) + int(n)
        # trim to the newest retain_buckets observed buckets — older ones
        # are outside every live trailing window and can't change a score
        if len(buckets) > retain_buckets:
            trimmed = sorted(buckets)[: len(buckets) - retain_buckets]
            watermark = max(watermark, trimmed[-1])
            for ep in trimmed:
                del buckets[ep]
        epochs = sorted(buckets)
        state.update((epochs, [buckets[e] for e in epochs], watermark))
        out = score_buckets(buckets, window_buckets, z_threshold)
        if watermark >= 0:
            # suppress buckets whose trailing frame touches the trimmed
            # region: frame of index i is epochs[i-window:i], so it is
            # intact only when it starts strictly above the watermark.
            # Their earlier full-frame emissions remain the last truth.
            intact = [
                i >= window_buckets and epochs[i - window_buckets] > watermark
                for i in range(len(epochs))
            ]
            out = out[pd.Series(intact, index=out.index)]
        out.insert(0, "event_type", event_type)
        yield out

    return _update


def streaming_zscore(
    events: DataFrame,
    window_buckets: int = 24,
    z_threshold: float = 3.0,
    step_seconds: int = 3600,
    retain_buckets: int | None = None,
) -> DataFrame:
    """Streaming per-type rolling z-score; input is a streaming DataFrame
    with (event_type, ts). Emits updated scores for a key's buckets each
    micro-batch; last emission per (key, bucket) equals the batch twin.

    ``retain_buckets`` bounds state (default: window + 8 slack over the
    horizon you still want re-emitted); production streams with true
    late data should size it like a watermark delay."""
    retain = retain_buckets if retain_buckets is not None else window_buckets * 2 + 8
    return events.groupBy("event_type").applyInPandasWithState(
        make_zscore_updater(window_buckets, z_threshold, step_seconds, retain),
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
