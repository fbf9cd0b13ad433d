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
    events = load_table(spark, SF_SMOKE, "events").select("user_id", "ts", "value")
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
