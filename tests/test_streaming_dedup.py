"""Streaming dedup (dropDuplicatesWithinWatermark) and the foreachBatch
incremental-upsert sink, each pinned against its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.sources.tables import load_table
from etl_s3_to_redshift_spark.streaming import dedup as SD
from etl_s3_to_redshift_spark.streaming import upsert as SU
from etl_s3_to_redshift_spark.streaming.windows import run_stream_to_memory
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def dup_events(spark):
    """Events with guaranteed duplicates: the frame unioned with a
    deterministic half of itself."""
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    dups = ev.filter(F.col("event_id") % 2 == 0)
    return ev.unionByName(dups)


@pytest.fixture(scope="module")
def dup_stream(spark, dup_events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dedup_stream") / "events")
    # several files → several micro-batches, so cross-batch duplicate
    # suppression (the state-store path) is actually exercised
    dup_events.repartition(4).write.mode("overwrite").parquet(path)
    return (
        spark.readStream.schema(dup_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_streaming_dedup_equals_batch(spark, dup_events, dup_stream):
    batch_ids = {r.event_id for r in SD.dedup_events(dup_events, ["event_id"]).collect()}
    # micro-batches are random row subsets, not time-ordered: a watermark
    # wider than the whole event span keeps shuffled arrivals from being
    # dropped as late (in production the delay matches real disorder)
    streamed = run_stream_to_memory(
        spark,
        SD.dedup_events(dup_stream, ["event_id"], watermark="3650 days", streaming=True),
        "t_dedup_stream",
        output_mode="append",
    )
    got = streamed.collect()
    assert {r.event_id for r in got} == batch_ids
    assert len(got) == len(batch_ids)  # every duplicate suppressed exactly once


def test_streaming_url_dedup_equals_batch(spark, tmp_path):
    """dedup_urls: canonical-URL variants (scheme case, :443, utm
    params, fragments) collapse to ONE survivor per canonical form, in
    batch and across micro-batches (state-store path), with identical
    canonical key sets."""
    from pyspark.sql.types import StructField, StructType

    rows = []
    for i in range(40):
        variant = [
            f"https://h{i % 10}.com/p/{i % 10}",
            f"HTTPS://H{i % 10}.com:443/p/{i % 10}",
            f"https://h{i % 10}.com/p/{i % 10}?utm_source=x#frag",
        ][i % 3]
        rows.append((i, variant))
    docs = spark.createDataFrame(rows, "doc_id long, url string").withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
    )
    batch = SD.dedup_urls(docs)
    batch_keys = {r.canonical_url for r in batch.collect()}
    assert len(batch_keys) == 10 and batch.count() == 10

    path = str(tmp_path / "urls")
    docs.repartition(4).write.mode("overwrite").parquet(path)
    schema = StructType(
        [StructField(f.name, f.dataType, True) for f in docs.schema.fields]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    streamed = run_stream_to_memory(
        spark,
        SD.dedup_urls(stream, watermark="3650 days", streaming=True),
        "t_url_dedup_stream",
        output_mode="append",
    )
    got = streamed.collect()
    assert {r.canonical_url for r in got} == batch_keys
    assert len(got) == 10  # every variant suppressed exactly once


def test_distinct_keys_manifest(spark, dup_events):
    m = SD.distinct_keys(dup_events, ["user_id", "event_type"])
    assert m.count() == dup_events.select("user_id", "event_type").distinct().count()


@pytest.fixture()
def cdc_updates(spark):
    rows = [
        # key, attribute, version
        (1, "a0", 10), (2, "b0", 10), (3, "c0", 10),   # initial inserts
        (2, "b1", 20), (4, "d0", 20),                   # update + insert
        (2, "b2", 30), (1, "a1", 5),                    # late out-of-order update loses
    ]
    return spark.createDataFrame(rows, "k int, attr string, ver int")


def test_upsert_snapshot_latest_wins(spark, cdc_updates, tmp_path):
    target = str(tmp_path / "target")
    SU.upsert_snapshot(spark, cdc_updates, target, "k", "ver")
    got = {r.k: (r.attr, r.ver) for r in spark.read.parquet(target).collect()}
    # k=1 sees ver 10 then a late ver 5 in the same delta: highest version
    # wins regardless of arrival order
    assert got == {1: ("a0", 10), 2: ("b2", 30), 3: ("c0", 10), 4: ("d0", 20)}


def test_upsert_stream_converges_to_batch(spark, cdc_updates, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    # one file per micro-batch: the merge runs repeatedly against its own
    # prior snapshot, not once over the union
    cdc_updates.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(cdc_updates.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = SU.start_upsert_stream(stream, target, "k", "ver", ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.k: (r.attr, r.ver) for r in spark.read.parquet(target).collect()}
    want = {
        r.k: (r.attr, r.ver)
        for r in SU.latest_per_key(cdc_updates, "k", "ver").collect()
    }
    assert got == want and len(got) == 4


def test_quality_gated_stream_routes_violations(spark, tmp_path):
    from etl_s3_to_redshift_spark.operators.quality import Rule
    from etl_s3_to_redshift_spark.streaming.quality_gate import (
        split_by_rules,
        start_quality_gated_stream,
    )

    rows = [
        (1, 10.0, "O"),
        (2, -3.0, "O"),    # range violation
        (3, 5.0, "X"),     # set violation
        (None, 7.0, "F"),  # null violation
        (5, -1.0, "X"),    # two violations
        (6, 2.0, "F"),
    ]
    df = spark.createDataFrame(rows, "k long, price double, status string")
    rules = [
        Rule("k_not_null", "not_null", column="k"),
        Rule("price_pos", "range", column="price", lo=0.0),
        Rule("status_ok", "in_set", column="status", values=("O", "F")),
    ]
    src = str(tmp_path / "src")
    df.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    clean_p, dead_p, ckpt = (
        str(tmp_path / "clean"), str(tmp_path / "dead"), str(tmp_path / "ck")
    )
    q = start_quality_gated_stream(stream, rules, clean_p, dead_p, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    clean = {r.k for r in spark.read.parquet(clean_p).collect()}
    dead = {r.k: r["__failed"] for r in spark.read.parquet(dead_p).collect()}
    assert clean == {1, 6}
    assert dead[2] == "price_pos" and dead[3] == "status_ok"
    assert dead[None] == "k_not_null"
    assert set(dead[5].split(",")) == {"price_pos", "status_ok"}

    # streaming result == the batch split
    b_clean, b_dead = split_by_rules(df, rules)
    assert clean == {r.k for r in b_clean.collect()}

    # at-least-once replay idempotency: re-running an already-committed
    # batch must overwrite its own subdir, not duplicate rows
    from etl_s3_to_redshift_spark.streaming.quality_gate import gate_batch

    for bid in range(3):
        gate_batch(df, bid, rules, clean_p, dead_p)  # simulate full replay
    assert spark.read.parquet(clean_p).count() == 3 * len(
        {1, 6}
    )  # 3 batches × full frame's clean rows (replay replaced each subdir)
    # replaying the SAME batch ids again changes nothing
    for bid in range(3):
        gate_batch(df, bid, rules, clean_p, dead_p)
    assert spark.read.parquet(clean_p).count() == 3 * 2
    assert spark.read.parquet(dead_p).count() == 3 * 4
    assert dead == {r.k: r["__failed"] for r in b_dead.collect()}
