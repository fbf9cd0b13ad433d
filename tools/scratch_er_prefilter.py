"""Prototype: star-build singleton prefilter for
substitution_clique_components (round 11, VERDICT r10 #1).

The sf100 sparse-chain wall is a ~45 GB exact-key window sort of ~840M
exploded block rows, of which only ~4% belong to multi-member blocks
(the rest are singletons that produce no star edge). Instead of sorting
every wide row, aggregate block sizes on the 8-byte block hash (narrow
shuffle, hash aggregation), broadcast the multi-member hashes, and run
the exact-key window only on rows whose hash survives. Exact: equal
triples hash equal, so every true multi-member block survives entirely;
hash collisions only ADD rows, and the window still partitions by the
exact (__seg, __comp, __slen) triple.

This script asserts star-edge equality prefilter-vs-direct on the two
ER fixtures and times both at a given SF.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.fuzzy import _segment_bounds
from etl_s3_to_redshift_spark.session import get_spark


def exploded_frame(records, id_col, s_col, n_segments):
    segs = []
    for start, length in _segment_bounds(n_segments):
        segs.append(
            f"concat(substring(__s, 1, ({start}) - 1),"
            f" substring(__s, ({start}) + ({length})))"
        )
    arr = "array(" + ", ".join(segs) + ")"
    return (
        records.select(F.col(id_col).alias("__id"), F.col(s_col).alias("__s"))
        .where(
            F.assert_true(
                F.length("__s") <= F.lit(n_segments), F.lit("unit segments")
            ).isNull()
        )
        .select(
            "__id",
            F.length("__s").alias("__slen"),
            F.posexplode(F.expr(arr)).alias("__seg", "__comp"),
        )
        .withColumn("__ch", F.xxhash64("__seg", "__comp", "__slen"))
    )


def star_direct(exploded):
    w = Window.partitionBy("__ch", "__seg", "__comp", "__slen")
    return exploded.select(
        "__id", F.min("__id").over(w).alias("__bmin")
    ).filter(F.col("__id") != F.col("__bmin"))


def star_prefiltered(exploded):
    cand = (
        exploded.groupBy("__ch")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("__ch")
    )
    pruned = exploded.join(F.broadcast(cand), "__ch")
    w = Window.partitionBy("__ch", "__seg", "__comp", "__slen")
    return pruned.select(
        "__id", F.min("__id").over(w).alias("__bmin")
    ).filter(F.col("__id") != F.col("__bmin"))


def records_sparse_chain(spark, sf_dir):
    from etl_s3_to_redshift_spark.queries_ops7 import _chain_variant_name_sql
    from etl_s3_to_redshift_spark.queries import _t

    cust = _t(spark, sf_dir, "customer")
    base = cust.select(
        (F.col("c_custkey").cast("long") * 10).alias("rec_id"),
        F.expr(
            "concat(c_name, '-', substring(md5(cast(c_custkey as string)), 1, 8))"
        ).alias("name"),
        F.col("c_custkey").alias("ck"),
    )
    chain = (
        base.filter(F.col("ck") % 4 == 0)
        .select(
            "rec_id",
            "name",
            "ck",
            F.explode(
                F.sequence(F.lit(1), (F.lit(2) + F.col("ck") % 6).cast("int"))
            ).alias("j"),
        )
        .select(
            (F.col("rec_id") + F.col("j")).alias("rec_id"),
            F.expr(_chain_variant_name_sql()).alias("name"),
        )
    )
    return base.select("rec_id", "name").unionByName(chain)


def records_dense(spark, sf_dir):
    from etl_s3_to_redshift_spark.queries import _t

    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey").alias("rec_id"), F.col("c_name").alias("name")
    ).unionByName(
        cust.filter(F.col("c_custkey") % 4 == 0).select(
            (F.col("c_custkey") + 1_000_000).alias("rec_id"),
            F.expr(
                "concat(substring(c_name, 1, 9 + (c_custkey % 9)), 'x',"
                " substring(c_name, 11 + (c_custkey % 9)))"
            ).alias("name"),
        )
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    mode = sys.argv[1]  # verify | time
    sf_dir = sys.argv[2]
    which = sys.argv[3] if len(sys.argv) > 3 else "sparse"
    spark = get_spark("scratch_er_prefilter")
    recs = (records_sparse_chain if which == "sparse" else records_dense)(
        spark, sf_dir
    )
    n_seg = recs.agg(F.max(F.length("name"))).first()[0]
    ex = exploded_frame(recs, "rec_id", "name", int(n_seg))

    if mode == "verify":
        a = sorted(map(tuple, star_direct(ex).collect()))
        b = sorted(map(tuple, star_prefiltered(ex).collect()))
        assert a == b, f"MISMATCH: {len(a)} vs {len(b)} rows"
        print(f"OK {sf_dir} {which}: {len(a)} star edges identical")
    else:
        stats = (
            ex.groupBy("__ch")
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.sum("__n").alias("total"),
                F.sum(F.when(F.col("__n") >= 2, F.col("__n"))).alias("surv"),
                F.count_if(F.col("__n") >= 2).alias("n_multi"),
            )
            .first()
        )
        print(f"stats {which}: total={stats['total']} surv={stats['surv']} "
              f"n_multi={stats['n_multi']}")
        for name, fn in [("direct", star_direct), ("prefiltered", star_prefiltered)]:
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"star:{name}")
            noop(fn(ex))
            print(f"{name}: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
