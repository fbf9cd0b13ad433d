"""Write-audit-publish SnapshotTable: atomic commits, crash injection
(readers see old-or-new, never mixed), audit veto, pinned-version
isolation, and the versioned upsert sink (batch + streaming)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.table_commit import (
    AuditRejected,
    SnapshotTable,
)
from etl_s3_to_redshift_spark.streaming import upsert as SU


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def snapshots(spark):
    v0 = spark.createDataFrame([(1, "a0"), (2, "b0")], "k int, attr string")
    v1 = spark.createDataFrame([(1, "a1"), (2, "b0"), (3, "c0")], "k int, attr string")
    return v0, v1


def test_commit_publish_and_pinned_reader_isolation(spark, snapshots, tmp_path):
    v0, v1 = snapshots
    t = SnapshotTable(str(tmp_path / "t"))
    assert not t.exists()
    assert t.commit(v0) == 0
    pinned = t.read(spark)  # resolves the pointer NOW
    assert t.commit(v1) == 1
    # pinned reader keeps the version it opened; fresh reads see the new one
    assert _rows(pinned) == _rows(v0)
    assert _rows(t.read(spark)) == _rows(v1)
    assert _rows(t.read(spark, version=0)) == _rows(v0)


def test_crash_before_publish_leaves_old_snapshot_intact(spark, snapshots, tmp_path):
    v0, v1 = snapshots
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(v0)

    # crash injected between staging and the pointer swap: the write
    # completed but _CURRENT was never replaced
    boom = RuntimeError("simulated crash before pointer swap")
    real_publish = t._publish
    t._publish = lambda v: (_ for _ in ()).throw(boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.commit(v1)
    t._publish = real_publish

    # reader sees the complete OLD snapshot — not missing, not mixed
    assert _rows(t.read(spark)) == _rows(v0)
    # recovery: the next commit publishes cleanly past the orphaned stage
    v = t.commit(v1)
    assert _rows(t.read(spark)) == _rows(v1)
    assert v == 2  # the orphaned v=1 stage was skipped, never published


def test_crash_during_snapshot_write_leaves_old_snapshot_intact(
    spark, snapshots, tmp_path
):
    v0, _ = snapshots
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(v0)

    @F.udf("string")
    def explode_late(s):
        raise ValueError("simulated executor crash mid-write")

    bad = v0.withColumn("attr", explode_late(F.col("attr")))
    with pytest.raises(Exception):
        t.commit(bad)
    assert _rows(t.read(spark)) == _rows(v0)


def test_audit_veto_aborts_commit_and_removes_stage(spark, snapshots, tmp_path):
    v0, v1 = snapshots
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(v0)

    def audit(df):
        if df.filter(F.col("k") == 3).count() > 0:
            raise AuditRejected("k=3 fails the release gate")

    with pytest.raises(AuditRejected):
        t.commit(v1, audit=audit)
    assert _rows(t.read(spark)) == _rows(v0)
    # the rejected stage directory is gone
    assert not os.path.isdir(t.version_path(1))


def test_retire_keeps_last_n_versions(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), keep_versions=2)
    for i in range(4):
        t.commit(spark.createDataFrame([(i,)], "v int"))
    assert t.current_version() == 3
    assert t._staged_versions() == [2, 3]


def test_upsert_table_latest_wins_and_replay_idempotent(spark, tmp_path):
    rows = [(1, "a0", 10), (2, "b0", 10), (2, "b1", 20), (1, "a1", 5)]
    updates = spark.createDataFrame(rows, "k int, attr string, ver int")
    t = SnapshotTable(str(tmp_path / "t"))
    SU.upsert_table(spark, updates, t, "k", "ver")
    want = {1: ("a0", 10), 2: ("b1", 20)}
    got = {r.k: (r.attr, r.ver) for r in t.read(spark).collect()}
    assert got == want
    # replaying the same batch converges to the same snapshot (new version,
    # identical content)
    SU.upsert_table(spark, updates, t, "k", "ver")
    got2 = {r.k: (r.attr, r.ver) for r in t.read(spark).collect()}
    assert got2 == want and t.current_version() == 1


def test_upsert_stream_wap_converges_to_batch(spark, tmp_path):
    rows = [
        (1, "a0", 10), (2, "b0", 10), (3, "c0", 10),
        (2, "b1", 20), (4, "d0", 20),
        (2, "b2", 30), (1, "a1", 5),
    ]
    cdc = spark.createDataFrame(rows, "k int, attr string, ver int")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cdc.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(cdc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t = SnapshotTable(str(tmp_path / "t"))
    q = SU.start_upsert_stream_wap(stream, t, "k", "ver", ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.k: (r.attr, r.ver) for r in t.read(spark).collect()}
    want = {r.k: (r.attr, r.ver) for r in SU.latest_per_key(cdc, "k", "ver").collect()}
    assert got == want and len(got) == 4


def test_compaction_is_an_atomic_commit(spark, tmp_path):
    import glob

    from etl_s3_to_redshift_spark.operators.table_commit import compact_snapshot

    t = SnapshotTable(str(tmp_path / "t"))
    frag = spark.range(10_000).selectExpr("id AS k", "id * 2 AS v").repartition(64)
    t.commit(frag)
    n_before = len(glob.glob(t.version_path(0) + "/*.parquet"))
    assert n_before >= 32  # genuinely fragmented

    pinned = t.read(spark)  # reader opened before compaction
    v = compact_snapshot(spark, t, target_bytes=1 << 30)  # everything fits one file
    n_after = len(glob.glob(t.version_path(v) + "/*.parquet"))
    assert v == 1 and n_after < n_before

    # identical data, and the pinned pre-compaction reader still works
    assert _rows(t.read(spark)) == _rows(pinned)
    assert t.read(spark).count() == 10_000
