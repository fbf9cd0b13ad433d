"""Simulate the driver end-to-end from a neutral cwd with a PLAIN
SparkSession: entry() smoke + every queries() entry vs its oracle_sql()
twin. This catches environment assumptions the tuned session hides
(worker sys.path, Arrow conversion differences).

Usage: python tools/driver_sim.py   (prints ENTRY/SUMMARY/MISMATCH lines)
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb

SPEC = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
MOD = importlib.util.module_from_spec(SPEC)
SPEC.loader.exec_module(MOD)


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("ENTRY rows:", MOD.entry(spark).count(), flush=True)

    sys.path.insert(0, "/root/repo")
    from tools.check_oracle import canon_df

    con = duckdb.connect()
    sfd = "/root/testdata/sf0.01"
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfd}/{t}.parquet'")
    qs, osql = MOD.queries(), MOD.oracle_sql()
    n_pass = n_rows_only = 0
    fails = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sfd).toPandas()
            if name not in osql:
                n_rows_only += 1
                if len(sdf) == 0:
                    fails.append((name, "0 rows rows-only"))
                continue
            odf = con.sql(osql[name]).df()
            if (
                sorted(sdf.columns) != sorted(odf.columns)
                or len(sdf) != len(odf)
                or canon_df(sdf) != canon_df(odf)
            ):
                fails.append((name, "mismatch"))
            else:
                n_pass += 1
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            fails.append((name, f"{type(e).__name__}: {str(e)[:120]}"))
    print(f"SUMMARY pass={n_pass} rows_only={n_rows_only} fail={len(fails)} total={len(qs)}")
    for f in fails:
        print("MISMATCH", f)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
