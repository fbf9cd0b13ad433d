"""The external driver runs __spark_entry__ from a NEUTRAL cwd with a
plain SparkSession and no PYTHONPATH: the repo is importable on the
DRIVER (the entry module inserts its own directory into sys.path) but
not automatically on the Python WORKERS. Any Arrow/pandas kernel that
references a package-module-level helper is pickled BY REFERENCE and
resolved by import on the worker — which fails unless the entry module
ships the package (``_ship_package`` / addPyFile).

Regression for the round-6 finding: operators/similarity._dense_or_zero
(introduced by the NULL-embedding guard) broke dedup_semantic_clusters
under the real driver while every repo-cwd surface (pytest, bench,
check_oracle) stayed green.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", {entry!r})
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = mod.queries()
    # the pandas-UDF query whose kernel references a package-level
    # helper — exactly the by-reference pickle the driver's workers
    # must be able to resolve
    n = qs["dedup_semantic_clusters"](spark, "/root/testdata/sf0.001").count()
    assert n > 0, n
    print("NEUTRAL_CWD_OK", n)
    """
)


def test_pandas_udf_queries_run_from_neutral_cwd(tmp_path):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)
    }
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(entry=os.path.join(REPO, "__spark_entry__.py"))],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "NEUTRAL_CWD_OK" in proc.stdout
