"""Same-session A/B for the r10 basket_association_rules rewrite.

OLD: items-level distinct + construction-time driver .count() for the
basket total + item counts from a separate distinct shuffle (3
independent fact passes).
NEW: the registry's shape — pair counts, item counts and the basket
total all derive from the shared _baskets frame (one fact exchange,
ReusedExchange at runtime) and the total crossJoins as a 1-row scalar.

Asserts identical rows first, then alternates NEW/OLD noop-sink reps.
Usage: python tools/basket_rules_ab.py SF_DIR [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions  # noqa: E402
from etl_s3_to_redshift_spark.queries_ops7 import _order_pair_counts  # noqa: E402
from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402

_load_extensions()


def old_impl(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = items.select("l_orderkey").distinct().count()
    item_n = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_a")
    )
    pair_n = _order_pair_counts(li).withColumnRenamed("n_orders", "n_ab")
    ia = item_n.select(F.col("l_partkey").alias("part_a"), F.col("n_a").alias("na"))
    ib = item_n.select(F.col("l_partkey").alias("part_b"), F.col("n_a").alias("nb"))
    return (
        pair_n.join(ia, "part_a")
        .join(ib, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.lit(n), 6).alias("support"),
            F.round(F.col("n_ab").cast("double") / F.col("na"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * F.lit(n)
                / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("n_ab").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(50)
    )


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("basket_rules_ab")
    new_fn = REGISTRY["basket_association_rules"].spark

    new_rows = [tuple(r) for r in new_fn(spark, sf_dir).collect()]
    old_rows = [tuple(r) for r in old_impl(spark, sf_dir).collect()]
    assert new_rows == old_rows, "row mismatch"
    print(f"rows identical ({len(new_rows)})")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(new_fn(spark, sf_dir).limit(1))  # warm
    ts_new, ts_old = [], []
    for _ in range(reps):
        t0 = time.time()
        spark.sparkContext.setJobDescription("basket_rules NEW")
        noop(new_fn(spark, sf_dir))
        ts_new.append(round(time.time() - t0, 3))
        t0 = time.time()
        spark.sparkContext.setJobDescription("basket_rules OLD")
        noop(old_impl(spark, sf_dir))
        ts_old.append(round(time.time() - t0, 3))
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "new_reps": ts_new,
                "old_reps": ts_old,
                "new_med": med(ts_new),
                "old_med": med(ts_old),
                "speedup": round(med(ts_old) / med(ts_new), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
