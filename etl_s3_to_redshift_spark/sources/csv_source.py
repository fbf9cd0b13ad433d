"""CSV/delimited source — completes the lake-format surface next to JSON
(sources/json_source.py) and parquet (sources/tables.py).

The reference's only lake format is JSON (COPY … json, sql_queries.py:
121-128), but Redshift COPY equally serves delimited files; a user
switching engines expects the same. Explicit schema as everywhere:
``inferSchema`` is a full extra pass at scale and type-guesses
inconsistently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    null_value: str = "",
    timestamp_format: str | None = None,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Explicit-schema CSV read. ``mode='PERMISSIVE'`` nulls malformed
    fields (the COPY-with-MAXERROR analogue); 'FAILFAST' for strict loads.

    ``corrupt_col`` captures each unparseable raw line into a string
    column of that name (Spark's columnNameOfCorruptRecord) instead of
    silently nulling it — the quarantine pattern: load everything, then
    split on ``corrupt_col IS NULL`` into clean rows and a dead-letter
    audit table. COPY's equivalent is the stl_load_errors table."""
    read_schema = schema
    if corrupt_col is not None:
        read_schema = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
        )
    reader = (
        spark.read.schema(read_schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("nullValue", null_value)
        .option("mode", mode)
    )
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)
