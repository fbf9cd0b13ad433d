"""Streaming SEMANTICS under real StreamingQuery execution — not batch
twins (VERDICT r5 item 3). Each test drives a file-source stream through
controlled micro-batches (one file per trigger, ordered by mtime) and
OBSERVES the behavior only a live stream has:

  * append-mode window finalization when the watermark passes,
  * late-data DROP after the watermark,
  * session merge across micro-batches,
  * stream-stream join state eviction,
  * dropDuplicatesWithinWatermark state expiry,
  * applyInPandasWithState processing-time timeout.

The watermark engine's contract (used throughout): the watermark applied
to micro-batch N is computed from data seen through batch N-1 (max event
time - delay), so a window/session finalizes in the FIRST batch that runs
after its end falls below the watermark — tests always feed one more
advancing file to flush emissions.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.streaming.dedup import dedup_events
from etl_s3_to_redshift_spark.streaming.joins import interval_join_streams
from etl_s3_to_redshift_spark.streaming.stateful import running_user_profile
from etl_s3_to_redshift_spark.streaming.windows import (
    session_aggregate,
    sliding_counts,
    tumbling_counts,
)

_FILE_SEQ = [0]


def add_file(df, watched_dir: str, staging_root: str, seq: int) -> None:
    """Land ``df`` as ONE parquet file in ``watched_dir`` with an mtime
    strictly increasing in ``seq`` — the file source processes files in
    mtime order, so with maxFilesPerTrigger=1 each call is one future
    micro-batch."""
    _FILE_SEQ[0] += 1
    stage = os.path.join(staging_root, f"stage_{_FILE_SEQ[0]}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    os.makedirs(watched_dir, exist_ok=True)
    dest = os.path.join(watched_dir, f"f{seq:03d}.parquet")
    shutil.copy(part, dest)
    base = 1_600_000_000
    os.utime(dest, (base + seq * 10, base + seq * 10))


def ts_rows(spark, rows):
    """rows: [(ts_str, event_type, user_id, value)] -> events frame."""
    return spark.createDataFrame(
        [(t, e, u, v) for t, e, u, v in rows],
        "ts_s string, event_type string, user_id long, value double",
    ).select(
        F.to_timestamp("ts_s").alias("ts"), "event_type", "user_id", "value"
    )


def run_to_memory(spark, stream_df, name, output_mode):
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


@pytest.fixture()
def small_shuffle(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", before)


def test_tumbling_append_finalizes_on_watermark_and_drops_late(
    spark, tmp_path, small_shuffle
):
    """Append mode emits a 15-min window only once the watermark (5 min
    delay) passes its end; a late row arriving after that is DROPPED —
    the already-emitted count must not change and no duplicate window row
    may appear."""
    src, stage = str(tmp_path / "in"), str(tmp_path / "stage")
    D = "2024-01-01 "
    # batch 1: four on-time rows -> windows 10:00(2), 10:15(1), 10:30(1)
    add_file(
        ts_rows(spark, [
            (D + "10:00:01", "a", 1, 1.0),
            (D + "10:05:00", "a", 1, 1.0),
            (D + "10:20:00", "a", 1, 1.0),
            (D + "10:40:00", "a", 1, 1.0),
        ]), src, stage, 1,
    )
    # batch 2: advance event time to 12:00 (wm after batch: 11:55)
    add_file(ts_rows(spark, [(D + "12:00:00", "a", 1, 1.0)]), src, stage, 2)
    # batch 3: a LATE row for the closed 10:00 window + a 13:00 advancer
    add_file(
        ts_rows(spark, [
            (D + "10:03:00", "a", 1, 1.0),   # late: wm is 11:55
            (D + "13:00:00", "a", 1, 1.0),
        ]), src, stage, 3,
    )
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = run_to_memory(
        spark,
        tumbling_counts(stream, "15 minutes", watermark="5 minutes", streaming=True),
        "tumb_sem",
        "append",
    )
    got = {
        (str(r.bucket_start)[11:16], r.n_events) for r in out.collect()
    }
    # every window whose end fell below the final watermark (12:55 —
    # Spark runs a no-data finalize batch when the watermark advances),
    # with the ORIGINAL counts: the late 10:03 row added nothing, and
    # the 13:00 window (end 13:15 > wm) stays open/unemitted
    assert got == {("10:00", 2), ("10:15", 1), ("10:30", 1), ("12:00", 1)}


def test_sliding_append_emits_closed_hops_only(spark, tmp_path, small_shuffle):
    """30/15-min hopping windows: each event lands in 2 windows; append
    emits a hop only when closed. The 12:00 advancer's own hops stay
    unemitted (watermark never passes them before the source drains)."""
    src, stage = str(tmp_path / "in"), str(tmp_path / "stage")
    D = "2024-01-01 "
    add_file(
        ts_rows(spark, [(D + "10:05:00", "a", 1, 1.0), (D + "10:20:00", "a", 1, 1.0)]),
        src, stage, 1,
    )
    add_file(ts_rows(spark, [(D + "12:00:00", "a", 1, 1.0)]), src, stage, 2)
    add_file(ts_rows(spark, [(D + "13:00:00", "a", 1, 1.0)]), src, stage, 3)
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = run_to_memory(
        spark,
        sliding_counts(
            stream, "30 minutes", "15 minutes", watermark="5 minutes", streaming=True
        ),
        "slide_sem",
        "append",
    )
    got = {(str(r.bucket_start)[11:16], r.n_events) for r in out.collect()}
    # final wm 12:55 (no-data finalize batch): the 12:00 advancer's own
    # hops (ends 12:15/12:30) close too; 13:00's (ends 13:15/13:30) don't
    assert got == {("09:45", 1), ("10:00", 2), ("10:15", 1), ("11:45", 1), ("12:00", 1)}


def test_session_merges_across_batches_then_finalizes(
    spark, tmp_path, small_shuffle
):
    """A session split across micro-batches (10:00, 10:20 | 10:35) must
    merge into ONE session row when finalized — observable only in a real
    stream, where the 10:35 event arrives after the first two were
    already in session state. A late 10:05 event after the watermark adds
    nothing."""
    src, stage = str(tmp_path / "in"), str(tmp_path / "stage")
    D = "2024-01-01 "
    add_file(
        ts_rows(spark, [(D + "10:00:00", "a", 1, 1.0), (D + "10:20:00", "a", 1, 1.0)]),
        src, stage, 1,
    )
    add_file(ts_rows(spark, [(D + "10:35:00", "a", 1, 1.0)]), src, stage, 2)
    # advance watermark past session end (11:05): 13:00 - 10min = 12:50
    add_file(ts_rows(spark, [(D + "13:00:00", "a", 99, 1.0)]), src, stage, 3)
    # flush batch: session [10:00, 11:05) emits during this batch
    add_file(ts_rows(spark, [(D + "14:00:00", "a", 99, 1.0)]), src, stage, 4)
    # NOW a late 10:05 event arrives: its session [10:05, 10:35) ends far
    # below the watermark (13:50) and the original session was already
    # emitted and evicted — the row must vanish. (Fed only after the
    # session finalizes: a late event merging into a STILL-OPEN session
    # is accepted by Spark's session operator — observed r6 — so feeding
    # it earlier would legitimately yield n=4.)
    add_file(
        ts_rows(spark, [(D + "10:05:00", "a", 1, 1.0), (D + "15:00:00", "a", 99, 1.0)]),
        src, stage, 5,
    )
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = run_to_memory(
        spark,
        session_aggregate(
            stream, gap="30 minutes", watermark="10 minutes", streaming=True
        ),
        "sess_sem",
        "append",
    )
    u1 = [
        (str(r.session_start)[11:16], r.n_events)
        for r in out.collect()
        if r.user_id == 1
    ]
    # exactly ONE merged session for user 1 with all three on-time
    # events — no split session, no late-event resurrection
    assert u1 == [("10:00", 3)]


def test_interval_join_evicts_state_past_watermark(spark, tmp_path, small_shuffle):
    """Stream-stream interval join: an on-time (view, purchase) pair
    emits; a purchase replayed AFTER the watermark passed the view's join
    bound finds no buffered state and silently produces nothing — the
    state-eviction contract that makes the join feasible unbounded."""
    lsrc, rsrc = str(tmp_path / "views"), str(tmp_path / "purch")
    stage = str(tmp_path / "stage")
    D = "2024-01-01 "

    def view_rows(rows):
        return spark.createDataFrame(rows, "user_id long, view_id long, l_s string").select(
            "user_id", "view_id", F.to_timestamp("l_s").alias("l_ts")
        )

    def purch_rows(rows):
        return spark.createDataFrame(rows, "user_id long, purchase_id long, r_s string").select(
            "user_id", "purchase_id", F.to_timestamp("r_s").alias("r_ts")
        )

    # batch 1: V1 at 10:00 + P1 at 10:05 (inside the 10-min bound)
    add_file(view_rows([(1, 101, D + "10:00:00")]), lsrc, stage, 1)
    add_file(purch_rows([(1, 201, D + "10:05:00")]), rsrc, stage, 1)
    # batch 2: both sides advance to 12:00 (global wm -> 11:55);
    # V2/P3 pair is on-time and must emit
    add_file(view_rows([(2, 102, D + "12:00:00")]), lsrc, stage, 2)
    add_file(purch_rows([(2, 202, D + "12:00:30")]), rsrc, stage, 2)
    # batch 3: advance both sides again — join-state EVICTION uses the
    # watermark lazily (applied at the end of the batch AFTER the one
    # whose data advanced it), so this batch is where V1's buffered row
    # (l_ts 10:00 < wm 11:55 - 10min bound) actually leaves the state
    # store (observed r6: probing in this batch still matched)
    add_file(view_rows([(3, 103, D + "13:00:00")]), lsrc, stage, 3)
    add_file(purch_rows([(4, 204, D + "13:00:00")]), rsrc, stage, 3)
    # batch 4: P2 for user 1 at 10:08 — inside V1's interval but WAY
    # below the watermark: V1's state is evicted, row is late -> nothing
    add_file(purch_rows([(1, 203, D + "10:08:00")]), rsrc, stage, 4)

    lstream = (
        spark.readStream.schema("user_id long, view_id long, l_ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(lsrc)
    )
    rstream = (
        spark.readStream.schema("user_id long, purchase_id long, r_ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(rsrc)
    )
    joined = interval_join_streams(
        lstream, rstream, "user_id", 600, watermark="5 minutes", streaming=True
    ).select("view_id", "purchase_id")
    out = run_to_memory(spark, joined, "join_sem", "append")
    got = {(r.view_id, r.purchase_id) for r in out.collect()}
    assert got == {(101, 201), (102, 202)}


def test_dedup_within_watermark_expires_key_state(spark, tmp_path, small_shuffle):
    """dropDuplicatesWithinWatermark: a duplicate inside the horizon is
    suppressed; the SAME key re-arriving after its state expired is
    emitted again — exactly the bounded-state contract (state is
    O(horizon), not O(keys ever))."""
    src, stage = str(tmp_path / "in"), str(tmp_path / "stage")
    D = "2024-01-01 "
    # batch 1: event E1 + its duplicate (same event_id) inside horizon
    add_file(
        ts_rows(spark, [(D + "10:00:00", "k1", 7, 1.0), (D + "10:02:00", "k1", 7, 1.0)]),
        src, stage, 1,
    )
    # batch 2: advance far past the 10-minute horizon
    add_file(ts_rows(spark, [(D + "12:00:00", "adv", 8, 1.0)]), src, stage, 2)
    # batch 3: advance again — dedup state eviction (like join state) is
    # applied lazily at the end of the batch that RUNS under the advanced
    # watermark, so k1's entry leaves the store here (observed r6: a
    # revival in this batch is still suppressed)
    add_file(ts_rows(spark, [(D + "12:30:00", "adv", 8, 1.0)]), src, stage, 3)
    # batch 4: k1 re-arrives — its dedup state is gone, row emits again
    add_file(ts_rows(spark, [(D + "12:31:00", "k1", 7, 1.0)]), src, stage, 4)
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = run_to_memory(
        spark,
        dedup_events(stream, ["event_type"], watermark="10 minutes", streaming=True),
        "dedup_sem",
        "append",
    )
    n_k1 = out.filter(F.col("event_type") == "k1").count()
    assert n_k1 == 2  # once per horizon: dup suppressed, revival emitted


def test_stateful_processing_timeout_expires_profile(spark, tmp_path, small_shuffle):
    """applyInPandasWithState with a processing-time timeout: an idle
    key's state is REMOVED after the timeout, so its next event restarts
    the profile from zero — observed end-to-end (n_events back to 1, not
    continuing at 3). processAllAvailable never quiesces with a timeout
    configured (cleanup batches schedule forever), so the test polls the
    sink with a deadline instead."""
    src, stage = str(tmp_path / "in"), str(tmp_path / "stage")
    D = "2024-01-01 "
    add_file(
        ts_rows(spark, [(D + "10:00:00", "a", 1, 1.0), (D + "10:01:00", "a", 1, 2.0)]),
        src, stage, 1,
    )
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    ).select("user_id", "ts", "value")
    q = (
        running_user_profile(stream, idle_timeout_ms=2000)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("timeout_sem")
        .start()
    )

    def wait_for(predicate, deadline_s=60):
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            if predicate():
                return True
            time.sleep(0.5)
        return False

    try:
        assert wait_for(
            lambda: any(
                r.user_id == 1 and r.n_events == 2
                for r in spark.sql("SELECT * FROM timeout_sem").collect()
            )
        ), "initial profile (n=2) never appeared"
        # let the idle timeout fire (cleanup batches run on their own)
        time.sleep(4)
        # user 1 returns: if state was expired, the profile restarts at 1
        add_file(ts_rows(spark, [(D + "10:30:00", "a", 1, 5.0)]), src, stage, 2)
        assert wait_for(
            lambda: any(
                r.user_id == 1 and r.n_events == 1 and r.total_value_cents == 500
                for r in spark.sql("SELECT * FROM timeout_sem").collect()
            )
        ), "profile did not restart after state timeout"
    finally:
        q.stop()
