"""operators/prefix.ranked_running — the range-partitioned two-pass
rank + running total must be bit-identical to the global window it
replaces, and its plan must contain no global (unpartitioned-over-data)
window, no cartesian product, and no BroadcastNestedLoopJoin."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.prefix import ranked_running


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _frame(spark, n=997, seed=7):
    # deterministic pseudo-random decimals over a unique key
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(100000)) / 100.0)
        .cast("decimal(12,2)")
        .alias("v"),
    )


def test_matches_global_window_exactly(spark):
    df = _frame(spark)
    order = [F.col("v").desc(), F.col("k").asc()]
    got = (
        ranked_running(df, order, "v", n_parts=7)
        .select("k", "rk", "cum", "total")
        .collect()
    )
    w = Window.orderBy(*order)
    want = df.select(
        "k",
        F.row_number().over(w).cast("long").alias("rk"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("v").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("total"),
    ).collect()
    key = lambda r: r["k"]  # noqa: E731
    got_map = {r["k"]: r for r in got}
    assert len(got) == len(want)
    for r in want:
        g = got_map[r["k"]]
        assert g["rk"] == r["rk"], r["k"]
        assert g["cum"] == r["cum"], r["k"]
        assert g["total"] == r["total"], r["k"]


def test_count_col_and_rank_only(spark):
    df = _frame(spark, n=53)
    out = ranked_running(
        df, [F.col("k").asc()], count_col="n_total", n_parts=5
    )
    rows = out.collect()
    assert {r["n_total"] for r in rows} == {53}
    assert sorted(r["rk"] for r in rows) == list(range(1, 54))
    assert "cum" not in out.columns and "total" not in out.columns


def test_more_partitions_than_rows(spark):
    # empty range partitions must not corrupt offsets
    df = _frame(spark, n=3)
    rows = ranked_running(df, [F.col("k").asc()], "v", n_parts=16).collect()
    rows.sort(key=lambda r: r["rk"])
    run = Decimal(0)
    for i, r in enumerate(rows, start=1):
        run += r["v"]
        assert r["rk"] == i
        assert r["cum"] == run
    assert rows[-1]["total"] == run


def test_plan_has_no_global_window_or_bnlj(spark):
    df = _frame(spark)
    out = ranked_running(df, [F.col("v").desc(), F.col("k").asc()], "v", n_parts=8)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # offsets come back via equi-join
    # every Window node must carry a partition spec; an unpartitioned
    # WindowExec prints an empty partition-spec bracket group `, [], [`
    for line in plan.splitlines():
        if "Window " in line:
            assert ", [], [" not in line, line
