"""Streaming deduplication — the streaming twin of the exact-dedup
family (operators/dedup.py).

Two variants, both watermark-bounded so state cannot grow forever:

- ``dedup_events``: first-event-wins exact dedup on a key set.
  Streaming uses ``dropDuplicatesWithinWatermark`` — duplicates arriving
  within the watermark horizon of the first occurrence are suppressed,
  and per-key state is dropped once the watermark passes, so total state
  is O(distinct keys per horizon), not O(distinct keys ever). That is
  the only dedup contract that works on an unbounded stream; exact
  forever-dedup needs an external key store (or the batch manifest path
  in operators/dedup.dedup_exact).
- ``distinct_keys``: the key-projection DISTINCT, for delivering a
  dedup manifest downstream.

Like streaming/windows.py, each operator runs identically on batch
frames (DISTINCT — oracle-checkable) and ``readStream`` frames — one
declaration, two execution modes. The batch twin of
within-watermark dedup IS plain ``dropDuplicates``: on a bounded input
whose duplicates all land inside the horizon the two agree exactly
(pinned in tests/test_streaming_dedup.py).

At 100 TB: dedup state lives in the state store, partitioned by key
hash across executors; the watermark is the knob trading memory for
dedup window. Reference anchor: the reference deduplicates via
SELECT DISTINCT into staging (/root/reference/sql_queries.py:145-151);
this is that semantics made incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    streaming: bool = False,
) -> DataFrame:
    """Keep one event per ``keys`` tuple (first arrival wins).

    Streaming: state-bounded within-watermark dedup. Batch: plain
    ``dropDuplicates`` over the whole frame.
    """
    if streaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def dedup_urls(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    streaming: bool = False,
) -> DataFrame:
    """Streaming twin of the URL-level dedup (operators/web
    .url_dedup_groups' keep decision): one surviving document per
    CANONICAL URL. Canonicalization is the same narrow in-scan
    expression (``web.canonical_url`` — no UDF, so it composes with the
    stateful dedup unchanged); streaming state is one entry per
    distinct canonical URL inside the watermark horizon — the bound a
    crawl-ingest pipeline wants, since the same page's URL variants
    arrive near each other in crawl time. Batch form: plain
    ``dropDuplicates`` on the canonical key (first-encountered row
    wins — the deterministic min-id REPORT form is the registered
    ``web_url_dedup``). Returns the input columns plus
    ``canonical_url``."""
    from pyspark.sql import functions as F

    from etl_s3_to_redshift_spark.operators.web import canonical_url

    canon = docs.withColumn("canonical_url", canonical_url(F.col(url_col)))
    if streaming:
        return canon.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["canonical_url"]
        )
    return canon.dropDuplicates(["canonical_url"])


def distinct_keys(events: DataFrame, keys: list[str]) -> DataFrame:
    """The dedup manifest: DISTINCT key projection (works on both batch
    and streaming frames; streaming requires a watermark upstream when
    used with append sinks)."""
    return events.select(*keys).distinct()
