"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names,
and an order-insensitive value comparison (exact string canonicalization —
stricter than any plausible driver hash). Exit code 1 on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from decimal import Decimal

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions  # noqa: E402

_load_extensions()
from etl_s3_to_redshift_spark.schemas import TESTDATA_TABLES  # noqa: E402
from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402


def canon_value(v) -> str:
    if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
        return "<NULL>"
    if isinstance(v, Decimal):
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        if s in ("-0", ""):
            s = "0"
        return s
    if isinstance(v, float):
        if v != v:
            return "<NULL>"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_df(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(canon_value(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    names = [a for a in sys.argv[1:] if not os.path.isdir(a)] or list(REGISTRY)

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        # driver testdata is one file per table; gen_sf1.py lakes are
        # Spark-written part-file directories — glob either shape
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    failures = []
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        sdf = spec.spark(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if spec.oracle is None:
            print(f"  {name:40s} rows={len(sdf):>8} (rows-only, {t_spark:.1f}s)")
            if len(sdf) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        if spec.oracle_sf is not None and os.path.basename(sf_dir.rstrip("/")) != spec.oracle_sf:
            # precomputed-expectation oracle pinned to another SF: the
            # values CANNOT match here by construction — rows-only check
            print(
                f"  {name:40s} rows={len(sdf):>8} "
                f"(rows-only here; oracle pinned to {spec.oracle_sf}, {t_spark:.1f}s)"
            )
            if len(sdf) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        odf = con.sql(spec.oracle).df()
        problems = []
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if not problems:
            srows, orows = canon_df(sdf), canon_df(odf)
            if srows != orows:
                diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
                only_s = [r for r in srows[:2000] if r not in set(orows[:2000])][:2]
                problems.append(f"values differ; first pairwise diffs={diff} spark-only-sample={only_s}")
        status = "PASS" if not problems else "FAIL"
        # A committed-expectation oracle (VALUES pin, spec.oracle_sf set)
        # is a REGRESSION PIN, not a cross-engine check: a failure may be
        # a Spark-version flake (partial-merge order), so label it so a
        # version bump is diagnosable from the log alone.
        if problems and spec.oracle_sf is not None:
            status = "FAIL [committed expectation (regression pin)]"
        print(f"  {name:40s} rows={len(sdf):>8} {status} ({t_spark:.1f}s)")
        for p in problems:
            print(f"      {p}")
            failures.append((name, p))
    print()
    if failures:
        print(f"{len(failures)} problem(s) across {len(set(f[0] for f in failures))} query(ies)")
        return 1
    print(f"all {len(names)} queries consistent with oracle at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
