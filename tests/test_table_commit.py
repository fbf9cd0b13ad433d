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


def test_snapshot_index_atomic_multi_dataset_publish(spark, tmp_path):
    """SnapshotIndex (the multi-dataset WAP variant): datasets staged
    into v=<n> are invisible until the single pointer swap; an aborted
    second commit leaves the previous version fully readable; a
    hardlink append carries old files by reference and still publishes
    in one swap."""
    import shutil

    from etl_s3_to_redshift_spark.operators.table_commit import (
        SnapshotIndex,
        resolve_index_root,
    )

    base = str(tmp_path / "idx")
    idx = SnapshotIndex(base)
    a0 = spark.createDataFrame([(1, "x")], "k int, v string")
    b0 = spark.createDataFrame([(10,)], "n int")
    s = idx.begin()
    a0.write.parquet(os.path.join(s, "a"))
    assert not idx.exists(), "partial stage must be invisible"
    assert resolve_index_root(base) == base  # unpublished -> fallback
    b0.write.parquet(os.path.join(s, "b"))
    assert idx.publish(s) == 0
    root0 = idx.current_path()

    # crash between the two dataset writes of an append: abort leaves
    # the published version exactly as it was
    s1 = idx.begin()
    spark.createDataFrame([(2, "y")], "k int, v string").write.parquet(
        os.path.join(s1, "a")
    )
    idx.abort(s1)
    assert idx.current_path() == root0
    assert _rows(spark.read.parquet(os.path.join(root0, "a"))) == _rows(a0)

    # hardlink append: old files by reference + delta, one swap
    s2 = idx.begin()
    idx.link_from_current(s2, "a")
    spark.createDataFrame([(2, "y")], "k int, v string").write.mode(
        "append"
    ).parquet(os.path.join(s2, "a"))
    idx.link_from_current(s2, "b")
    idx.publish(s2)
    root2 = idx.current_path()
    assert root2 != root0
    assert resolve_index_root(base) == root2
    assert _rows(spark.read.parquet(os.path.join(root2, "a"))) == [
        (1, "x"),
        (2, "y"),
    ]
    assert _rows(spark.read.parquet(os.path.join(root2, "b"))) == _rows(b0)
    # pinned reader: the previous version directory is retained
    # (keep_versions=2) and untouched by the append
    assert _rows(spark.read.parquet(os.path.join(root0, "a"))) == _rows(a0)

    # publish refuses foreign directories
    alien = str(tmp_path / "alien" / "v=7")
    os.makedirs(alien)
    with pytest.raises(ValueError, match="not a staging dir"):
        idx.publish(alien)
    shutil.rmtree(str(tmp_path / "alien"))


def test_bm25_append_crash_leaves_previous_index_readable(
    spark, tmp_path, monkeypatch
):
    """VERDICT r9 #5 end-to-end: a crash at ANY point inside
    append_to_staged_bm25 — here injected at the final pointer swap,
    after postings/df/stats were all written — leaves the previously
    published index the one probes read (scores unchanged, no stale
    df/N mix), and a later append recovers cleanly."""
    from etl_s3_to_redshift_spark.operators import textops as T
    from etl_s3_to_redshift_spark.operators.table_commit import SnapshotIndex

    docs = spark.createDataFrame(
        [(1, "spark joins data"), (2, "duck pond river")],
        "doc_id INT, text STRING",
    )
    late = spark.createDataFrame(
        [(3, "spark appended later")], "doc_id INT, text STRING"
    )
    qs = spark.createDataFrame([(0, "spark")], "query_id INT, query_text STRING")
    base = str(tmp_path / "bm25")
    T.stage_bm25(docs, base, n_buckets=4)
    before = {tuple(r) for r in T.bm25_topk_staged(spark, base, qs, k=5).collect()}

    boom = RuntimeError("simulated crash before index pointer swap")
    monkeypatch.setattr(
        SnapshotIndex, "publish", lambda self, s: (_ for _ in ()).throw(boom)
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        T.append_to_staged_bm25(late, base)
    monkeypatch.undo()

    after = {tuple(r) for r in T.bm25_topk_staged(spark, base, qs, k=5).collect()}
    assert after == before, "crashed append must not be visible"
    # recovery: the next append publishes past the orphaned stage
    T.append_to_staged_bm25(late, base)
    recovered = {
        tuple(r) for r in T.bm25_topk_staged(spark, base, qs, k=5).collect()
    }
    # docs 1 and 3 contain "spark" post-append (doc 2 never did)
    assert recovered != before and len(recovered) == 2


def test_ivf_append_crash_leaves_previous_index_readable(
    spark, tmp_path, monkeypatch
):
    """Same crash-injection for IvfIndex.append_to_saved: the pointer
    swap is the only publish point, so a crash mid-append leaves the
    saved index exactly as the last save/append published it."""
    from pyspark.sql import functions as F  # noqa: F811

    from etl_s3_to_redshift_spark.operators.similarity import (
        IvfIndex,
        build_ivf_index,
        ivf_probe,
    )
    from etl_s3_to_redshift_spark.operators.table_commit import SnapshotIndex

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seed = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) != 0)
    late = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) == 0)
    built = build_ivf_index(seed, n_lists=4)
    base = str(tmp_path / "ivf")
    built.save(base)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = {
        tuple(r)
        for r in ivf_probe(IvfIndex.load(spark, base), queries, k=5).collect()
    }

    boom = RuntimeError("simulated crash before index pointer swap")
    monkeypatch.setattr(
        SnapshotIndex, "publish", lambda self, s: (_ for _ in ()).throw(boom)
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        built.append_to_saved(late, base)
    monkeypatch.undo()

    after = {
        tuple(r)
        for r in ivf_probe(IvfIndex.load(spark, base), queries, k=5).collect()
    }
    assert after == before, "crashed append must not be visible"
    built.append_to_saved(late, base)
    merged = IvfIndex.load(spark, base)
    assert merged.cells.count() == emb.count()


def _parquet_files_per_part(root: str, prefix: str) -> dict[str, int]:
    out = {}
    for d in os.listdir(root):
        if d.startswith(prefix):
            out[d] = len(
                [f for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")]
            )
    return out


def test_bm25_compaction_atomic_and_result_identical(spark, tmp_path):
    """compact_staged_bm25 (the OPTIMIZE analogue): appends accumulate
    one file per touched bucket; compaction folds them back to one,
    publishes as a new SnapshotIndex version (old version retained for
    pinned readers), and probe output is byte-identical."""
    from etl_s3_to_redshift_spark.operators import textops as T
    from etl_s3_to_redshift_spark.operators.table_commit import resolve_index_root

    docs = spark.createDataFrame(
        [(i, f"spark data words w{i}") for i in range(8)], "doc_id INT, text STRING"
    )
    base = str(tmp_path / "bm25")
    T.stage_bm25(docs.filter("doc_id < 4"), base, n_buckets=4)
    T.append_to_staged_bm25(docs.filter("doc_id in (4, 5)"), base)
    T.append_to_staged_bm25(docs.filter("doc_id in (6, 7)"), base)
    qs = spark.createDataFrame([(0, "spark words")], "query_id INT, query_text STRING")
    before = {tuple(r) for r in T.bm25_topk_staged(spark, base, qs, k=8).collect()}
    frag_root = resolve_index_root(base)
    frag = _parquet_files_per_part(os.path.join(frag_root, "postings"), "bucket=")
    assert max(frag.values()) >= 2, f"appends should fragment buckets: {frag}"

    T.compact_staged_bm25(spark, base, files_per_bucket=1)
    new_root = resolve_index_root(base)
    assert new_root != frag_root, "compaction must publish a NEW version"
    compacted = _parquet_files_per_part(os.path.join(new_root, "postings"), "bucket=")
    assert max(compacted.values()) <= 1, compacted
    after = {tuple(r) for r in T.bm25_topk_staged(spark, base, qs, k=8).collect()}
    assert after == before
    # pinned readers: the fragmented version directory is still readable
    assert os.path.isdir(os.path.join(frag_root, "postings"))


def test_ivf_compaction_atomic_and_result_identical(spark, tmp_path):
    """IvfIndex.compact_saved: same contract for the ANN inverted file."""
    from pyspark.sql import functions as F  # noqa: F811

    from etl_s3_to_redshift_spark.operators.similarity import (
        IvfIndex,
        build_ivf_index,
        ivf_probe,
    )
    from etl_s3_to_redshift_spark.operators.table_commit import resolve_index_root

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    built = build_ivf_index(emb.filter(F.pmod(F.col("vec_id"), F.lit(3)) != 0), n_lists=4)
    base = str(tmp_path / "ivf")
    built.save(base)
    built.append_to_saved(emb.filter(F.pmod(F.col("vec_id"), F.lit(3)) == 0), base)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = {
        tuple(r)
        for r in ivf_probe(IvfIndex.load(spark, base), queries, k=5).collect()
    }
    frag_root = resolve_index_root(base)

    IvfIndex.compact_saved(spark, base, files_per_cell=1)
    new_root = resolve_index_root(base)
    assert new_root != frag_root
    compacted = _parquet_files_per_part(os.path.join(new_root, "cells"), "cell=")
    assert compacted and max(compacted.values()) <= 1, compacted
    after = {
        tuple(r)
        for r in ivf_probe(IvfIndex.load(spark, base), queries, k=5).collect()
    }
    assert after == before


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
