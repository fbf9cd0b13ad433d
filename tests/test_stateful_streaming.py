"""Custom stateful streaming operator (applyInPandasWithState): the
streamed per-user profile must converge to the exact batch twin."""

from __future__ import annotations

import pytest

from etl_s3_to_redshift_spark.sources.tables import load_table
from etl_s3_to_redshift_spark.streaming.stateful import (
    batch_user_profile,
    running_user_profile,
)
from tests.conftest import SF_SMOKE


def test_stateful_profile_converges_to_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    events = load_table(spark, SF_SMOKE, "events").select("user_id", "ts", "value")
    # plant exact half-cent values: HALF_UP (F.round, and the kernel's
    # copysign-floor) gives 13/-13 cents where pandas' half-to-even .round()
    # would give 12/-12 — the divergence this test exists to catch
    halfway = events.limit(2).select(
        (F.col("user_id") + 1_000_000).alias("user_id"),
        "ts",
        F.when(F.col("user_id") % 2 == 0, F.lit(0.125))
        .otherwise(F.lit(-0.125))
        .alias("value"),
    )
    events = events.unionByName(halfway)
    # restage as µs parquet so the stream source can read it
    path = str(tmp_path / "events")
    events.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(events.schema).parquet(path)

    # each state partition is a separate HDFS-backed store whose
    # checksum-managed commits cost seconds apiece in local mode — size the
    # stateful shuffle to a handful of partitions for the smoke test
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            running_user_profile(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("profiles")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)

    # update mode appends one row per key per batch: last row per key wins
    streamed = {
        r.user_id: (r.n_events, r.total_value_cents, r.last_ts_micros)
        for r in spark.sql("SELECT * FROM profiles").collect()
    }
    batch = {
        r.user_id: (r.n_events, r.total_value_cents, r.last_ts_micros)
        for r in batch_user_profile(events).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_zscore_converges_to_batch(spark, tmp_path):
    from etl_s3_to_redshift_spark.operators.analytics import rolling_zscore_anomalies
    from etl_s3_to_redshift_spark.streaming.anomaly import streaming_zscore

    events = load_table(spark, SF_SMOKE, "events").select("event_type", "ts")
    path = str(tmp_path / "zs_events")
    # several files -> several micro-batches with maxFilesPerTrigger
    events.repartition(5).write.mode("overwrite").parquet(path)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(path)
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            streaming_zscore(stream, retain_buckets=10**6)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("zscores")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)

    # update mode re-emits per batch: the LAST row per (key, bucket) wins
    streamed = {}
    for r in spark.sql(
        "SELECT * FROM zscores"
    ).collect():  # memory sink preserves append order
        streamed[(r.event_type, r.bucket_epoch)] = (
            r.n_events,
            r.n_trailing,
            r.zscore,
            r.is_anomaly,
        )
    batch = {
        (r["event_type"], r["bucket_epoch"]): (
            r["n_events"],
            r["n_trailing"],
            r["zscore"],
            r["is_anomaly"],
        )
        for r in rolling_zscore_anomalies(
            load_table(spark, SF_SMOKE, "events")
        ).collect()
    }
    assert set(streamed) == set(batch)
    for k in batch:
        sb, bb = streamed[k], batch[k]
        assert sb[0] == bb[0] and sb[1] == bb[1] and sb[3] == bb[3], k
        if bb[2] is None:
            assert sb[2] is None, k
        else:
            assert sb[2] == pytest.approx(bb[2], abs=2e-6), k


class _FakeGroupState:
    """Minimal stand-in for pyspark's GroupState: just exists/get/update."""

    def __init__(self):
        self._value = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = value


def test_streaming_zscore_trim_does_not_overwrite_aged_scores():
    """Once trimming fires, aged buckets must NOT be re-emitted with
    truncated trailing frames (update mode: last row per bucket wins, so
    a late truncated re-emission would permanently corrupt the score).
    Drive the updater through in-order micro-batches with a small retain
    horizon and assert the last emission per bucket equals the batch twin
    computed over the FULL history."""
    import pandas as pd

    from etl_s3_to_redshift_spark.streaming.anomaly import (
        make_zscore_updater,
        score_buckets,
    )

    step, window, retain = 3600, 10, 25
    n_buckets = 100
    counts = {step * i: 3 + (i * 7) % 11 for i in range(n_buckets)}
    expected = score_buckets(counts, window, 3.0).set_index("bucket_epoch")

    updater = make_zscore_updater(window, 3.0, step, retain)
    state = _FakeGroupState()
    last = {}
    # 10 in-order micro-batches of 10 buckets each -> trimming fires often
    epochs = sorted(counts)
    for b in range(0, n_buckets, 10):
        rows = []
        for ep in epochs[b : b + 10]:
            rows.extend([pd.Timestamp(ep, unit="s")] * counts[ep])
        pdf = pd.DataFrame({"ts": rows})
        for out in updater(("song",), iter([pdf]), state):
            for r in out.itertuples(index=False):
                last[r.bucket_epoch] = (
                    r.n_events,
                    r.n_trailing,
                    r.zscore,
                    r.is_anomaly,
                )
    # every bucket was emitted at least once, and the LAST emission per
    # bucket matches the batch twin exactly (no truncated-frame overwrite)
    assert set(last) == set(counts)
    for ep in counts:
        exp = expected.loc[ep]
        got = last[ep]
        assert got[0] == exp["n_events"], ep
        assert got[1] == exp["n_trailing"], ep
        if exp["zscore"] is None or pd.isna(exp["zscore"]):
            assert got[2] is None or pd.isna(got[2]), ep
        else:
            assert got[2] == pytest.approx(exp["zscore"], abs=1e-9), ep
        assert got[3] == exp["is_anomaly"], ep


def test_streaming_zscore_state_trimming():
    from etl_s3_to_redshift_spark.streaming.anomaly import score_buckets

    # trimming is lossless for the newest window: scores of the retained
    # horizon computed from a trimmed map equal those from the full map
    full = {3600 * i: 10 + (i % 3) for i in range(100)}
    window = 10
    retain = 30
    trimmed = {e: full[e] for e in sorted(full)[-retain:]}
    f = score_buckets(full, window, 3.0).set_index("bucket_epoch")
    t = score_buckets(trimmed, window, 3.0).set_index("bucket_epoch")
    newest = sorted(full)[-(retain - window):]
    for ep in newest:
        assert f.loc[ep].equals(t.loc[ep])
