"""Streaming window operators driven as REAL streaming queries (readStream
→ memory sink) and multimodal Arrow-kernel plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators import multimodal as MM
from etl_s3_to_redshift_spark.sources.tables import load_table
from etl_s3_to_redshift_spark.streaming import windows as SW
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF_SMOKE, "events")


@pytest.fixture(scope="module")
def events_stream(spark, events_batch, tmp_path_factory):
    """A bounded file stream with the same rows as the batch frame (the
    nanos parquet needs the batch-side conversion, so restage as parquet
    with a µs timestamp first)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    events_batch.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(events_batch.schema).parquet(path)


def test_tumbling_stream_equals_batch(spark, events_batch, events_stream):
    batch = {
        (r.bucket_start, r.event_type): (r.n_events, r.total_value)
        for r in SW.tumbling_counts(events_batch).collect()
    }
    streamed = SW.run_stream_to_memory(
        spark, SW.tumbling_counts(events_stream, streaming=True), "t_tumble"
    )
    got = {
        (r.bucket_start, r.event_type): (r.n_events, r.total_value)
        for r in streamed.collect()
    }
    assert got == batch and len(got) > 0


def test_session_stream_equals_batch(spark, events_batch, events_stream):
    batch = {
        (r.session_start, r.user_id): (r.n_events, r.total_value)
        for r in SW.session_aggregate(events_batch).collect()
    }
    streamed = SW.run_stream_to_memory(
        spark, SW.session_aggregate(events_stream, streaming=True), "t_sess"
    )
    got = {
        (r.session_start, r.user_id): (r.n_events, r.total_value)
        for r in streamed.collect()
    }
    assert got == batch and len(got) > 0


def test_interval_join_stream_equals_batch(spark, events_batch, events_stream):
    """Stream-stream interval join (view→purchase funnel): the streaming
    run over two readStream sources must produce exactly the batch twin's
    pairs (inner joins emit eagerly — no watermark hold)."""
    from etl_s3_to_redshift_spark.streaming import joins as SJ

    batch = {
        (r.user_id, r.view_id, r.purchase_id, r.secs_to_purchase)
        for r in SJ.view_to_purchase_funnel(events_batch).collect()
    }
    streamed_df = SJ.view_to_purchase_funnel(
        events_batch,
        streaming_views=events_stream,
        streaming_purchases=events_stream,
    )
    q = (
        streamed_df.writeStream.outputMode("append")
        .format("memory")
        .queryName("funnel")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.user_id, r.view_id, r.purchase_id, r.secs_to_purchase)
        for r in spark.sql("SELECT * FROM funnel").collect()
    }
    assert streamed == batch and len(batch) > 0


def test_sliding_amplification(events_batch):
    n = events_batch.count()
    total = (
        SW.sliding_counts(events_batch, window="30 minutes", slide="15 minutes")
        .agg(F.sum("n_events"))
        .first()[0]
    )
    assert total == 2 * n  # each event lands in exactly window/slide windows


def test_rate_source_tumbling(spark):
    """The built-in rate source (offline-capable generator) drives the
    same tumbling operator — demonstrates a second streaming source
    besides files; row counts are bounded by the run window."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .withColumnRenamed("timestamp", "ts")
        .withColumn("event_type", (F.col("value") % 3).cast("string"))
        .withColumn("value", (F.col("value") % 100).cast("double"))
    )
    agg = SW.tumbling_counts(rate, window="1 seconds", streaming=True)
    q = agg.writeStream.outputMode("complete").format("memory").queryName("t_rate").start()
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            time.sleep(2)
            if spark.sql("SELECT sum(n_events) FROM t_rate").first()[0] or 0 >= 100:
                break
    finally:
        q.stop()
    total = spark.sql("SELECT coalesce(sum(n_events), 0) FROM t_rate").first()[0]
    assert total >= 100


def test_multimodal_features_roundtrip(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    media = MM.docs_as_media(docs)
    feats = {r.media_id: r for r in MM.extract_features(media).collect()}
    src = {r.doc_id: r.text for r in docs.collect()}
    assert set(feats) == set(src)
    for doc_id, text in src.items():
        payload = text.encode("utf-8")
        r = feats[doc_id]
        assert r.n_bytes == len(payload)
        assert r.sha256 == hashlib.sha256(payload).hexdigest()
        assert len(r.feature) == 8 and all(0.0 <= x < 1.0 for x in r.feature)
        assert r.feature == pytest.approx(MM.fake_image_features(payload), rel=1e-6)


def test_frame_sampling_shapes(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = MM.docs_as_media(docs)
    frames = MM.sample_frames(media, every_n_bytes=100, max_frames=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    src = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    for mid, rows in by_id.items():
        rows.sort(key=lambda r: r.frame_no)
        expect_n = min((len(src[mid]) + 99) // 100, 4)
        assert len(rows) == expect_n
        assert bytes(rows[0].frame) == src[mid][:100]


def test_decode_stub_raises_without_codec():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG\r\n")


def test_resize_pil_mode_gated_when_codec_absent(spark):
    media = spark.createDataFrame(
        [(1, b"xx", "image/png", 512, 256)],
        "media_id long, payload binary, mime string, width int, height int",
    )
    if MM.has_image_codec():
        pytest.skip("pillow present: covered by the real-codec contract test")
    with pytest.raises(NotImplementedError):
        MM.resize_media(media, max_side=128, codec="pil")
    # auto degrades to the deterministic stub and still runs end-to-end
    out = MM.resize_media(media, max_side=128, codec="auto").collect()
    assert out[0]["width"] == 128 and out[0]["height"] == 64


def test_resize_real_codec_contract(spark):
    """Real-JPEG/PNG path: decode -> resize to the JVM-computed dims ->
    re-encode. Skipped in containers without pillow; the stub path keeps
    the registered query oracle-exact either way."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    def png_bytes(w, h):
        img = Image.new("RGB", (w, h), (200, 30, 90))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    media = spark.createDataFrame(
        [
            (1, png_bytes(512, 256), "image/png", 512, 256),  # resized
            (2, png_bytes(100, 50), "image/png", 100, 50),    # within bounds
            (3, b"not an image", "application/octet-stream", None, None),
            # image/* mime with NULL dims (pandas gives NaN, not None):
            # documented passthrough, must not crash the pil kernel
            (4, png_bytes(64, 32), "image/png", None, None),
        ],
        "media_id long, payload binary, mime string, width int, height int",
    )
    out = {r["media_id"]: r for r in MM.resize_media(media, max_side=128, codec="pil").collect()}
    # metadata contract: exact integer aspect-preserving dims
    assert (out[1]["width"], out[1]["height"]) == (128, 64)
    img = Image.open(io.BytesIO(bytes(out[1]["payload"])))
    assert img.size == (128, 64) and img.format == "PNG"
    # within-bounds and non-image rows are byte-identical passthrough
    assert bytes(out[2]["payload"]) == png_bytes(100, 50)
    assert bytes(out[3]["payload"]) == b"not an image"
    assert (out[3]["width"], out[3]["height"]) == (None, None)
    assert bytes(out[4]["payload"]) == png_bytes(64, 32)
    assert (out[4]["width"], out[4]["height"]) == (None, None)


def test_stream_static_enrich_equals_batch(spark, tmp_path):
    from etl_s3_to_redshift_spark.sources.tables import load_table
    from etl_s3_to_redshift_spark.streaming.joins import enrich_stream

    events = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    dim = spark.createDataFrame(
        [(u, f"tier{u % 3}") for u in range(0, 60)], "user_id long, tier string"
    )
    path = str(tmp_path / "ev")
    events.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(events.schema).parquet(path)
    q = (
        enrich_stream(stream, dim, ["user_id"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.event_id, r.tier)
        for r in spark.sql("SELECT event_id, tier FROM enriched").collect()
    }
    want = {
        (r.event_id, r.tier)
        for r in events.join(F.broadcast(dim), ["user_id"], "left").select(
            "event_id", "tier"
        ).collect()
    }
    assert got == want and len(got) > 0
