"""Ingestion casts — the implicit type conversions the reference performs
during COPY (SURVEY.md §1). These are *semantics*, not cleanup:

- ``timeformat as 'epochmillisecs'`` (reference sql_queries.py:123) converts
  every numeric timestamp column of the load, including fractional
  milliseconds in ``registration``.
- ``userId`` arrives as a JSON string that may be "" (reference
  README.md:42) but lands in an int column (sql_queries.py:47): Redshift's
  COPY turns "" into NULL; Spark's ``cast`` does the same — we rely on that
  and must NOT "fix" it into an error.
- ``status`` arrives as a JSON number but lands in varchar
  (sql_queries.py:44).

All pure Column expressions — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_millis_to_timestamp(col: Column) -> Column:
    """Epoch-milliseconds number → TimestampType.

    Accepts integral or fractional millis (``registration`` is a float in
    the raw JSON); truncates sub-millisecond noise like Redshift's
    ``epochmillisecs`` parser.
    """
    return F.timestamp_millis(col.cast("long"))


def int_like_string_to_long(col: Column) -> Column:
    """String-typed integer → LongType; '' and non-numeric → NULL.

    Matches Redshift COPY's ''→NULL behavior that the downstream
    ``WHERE userId IS NOT NULL`` (reference sql_queries.py:159) depends on.
    ``try_cast`` (not ``cast``) because Spark 4's ANSI mode raises on
    malformed input — NULLing bad ids is the reference's semantic.
    """
    return col.try_cast("long")


def number_to_string(col: Column) -> Column:
    """JSON number → string column (reference ``status varchar(10)``)."""
    return col.cast("string")
