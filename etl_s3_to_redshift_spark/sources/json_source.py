"""JSON sources — the Spark-first replacement for Redshift COPY.

Reference COPY statements (the only stage where lake data moves,
reference etl.py:11-14, sql_queries.py:121-128):

- S1 explicit column map: ``COPY staging_events … json '<jsonpaths>'
  timeformat 'epochmillisecs'`` (sql_queries.py:121-124). The JSONPaths
  file exists only because COPY matches columns *positionally*; Spark
  matches by name, so an explicit StructType replaces the indirection and
  the epoch-millis cast is applied per-column.
- S2 auto map: ``COPY staging_songs … json 'auto'`` (sql_queries.py:126-128).
  Name-matched load. We still pass an explicit schema by default —
  inference is an extra full pass over the data (ruinous at 100 TB) — but
  ``infer=True`` reproduces 'auto' fidelity when the shape is unknown.

Scale notes: executors read S3/file splits in parallel (data never passes
through the driver, same property as COPY); multiLine stays False so the
line-delimited JSON is splittable; explicit schemas keep the scan a single
pass and enable predicate pushdown on the staged columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark import schemas
from etl_s3_to_redshift_spark.functions import casts


def read_events_json(spark: SparkSession, path: str) -> DataFrame:
    """Load activity-log JSON → typed staging_events.

    Applies the three implicit ingestion casts of SURVEY.md §1
    (epoch-millis → timestamp for ``ts``/``registration``, ''→NULL long for
    ``userId``, number→string for ``status``).
    """
    raw = spark.read.schema(schemas.EVENTS_RAW).json(path)
    return raw.select(
        "artist",
        "auth",
        "firstName",
        "gender",
        "itemInSession",
        "lastName",
        "length",
        "level",
        "location",
        "method",
        "page",
        casts.epoch_millis_to_timestamp(F.col("registration")).alias("registration"),
        "sessionId",
        "song",
        casts.number_to_string(F.col("status")).alias("status"),
        casts.epoch_millis_to_timestamp(F.col("ts")).alias("ts"),
        "userAgent",
        casts.int_like_string_to_long(F.col("userId")).alias("userId"),
    )


def read_songs_json(spark: SparkSession, path: str, infer: bool = False) -> DataFrame:
    """Load song-metadata JSON → staging_songs (the ``json 'auto'`` mode).

    ``infer=True`` mirrors 'auto' exactly (schema discovered from data);
    default is the explicit schema for single-pass reads at scale.
    """
    if infer:
        return spark.read.json(path)
    return spark.read.schema(schemas.SONGS_RAW).json(path)
