"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``etl_s3_to_redshift_spark`` package; this
module just adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_s3_to_redshift_spark import queries as Q  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
_shipped_apps: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable on Python WORKERS, not just the driver.

    cloudpickle serializes closures by value but anything they reference
    at package module level (Arrow-kernel helpers like
    operators/similarity._dense_or_zero) BY REFERENCE — workers resolve
    those by importing the package. The external driver runs from a
    neutral cwd with no PYTHONPATH, so its workers see neither the repo
    directory nor this file's sys.path insertion (which is
    driver-process-only). Ship the package once per SparkContext as a
    zip via addPyFile — the supported mechanism for exactly this.
    """
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _shipped_apps:
        return
    import tempfile
    import zipfile

    zpath = os.path.join(
        tempfile.gettempdir(), f"etl_s3_to_redshift_spark_pkg_{os.getpid()}.zip"
    )
    pkg = os.path.join(_REPO_DIR, "etl_s3_to_redshift_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, _REPO_DIR))
    sc.addPyFile(zpath)
    _shipped_apps.add(app)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    orders enriched through the broadcast dimension chain
    customer→nation→region with date-part extraction — the reference's
    songplay fact build (sql_queries.py:132-151) recast onto the testdata
    star schema.
    """
    _ship_package(spark)
    return Q.REGISTRY["r2_broadcast_enrich"].spark(spark, SF_SMOKE)


def _with_shipping(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _with_shipping(fn) for name, fn in Q.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query."""
    return Q.oracle_sql()
