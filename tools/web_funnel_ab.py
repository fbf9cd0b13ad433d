"""Same-session A/B for the r10 web_curation_funnel rewrite.

OLD: the as-introduced shape — url_dedup_groups + two corpus-keyed
left-semi joins + three independent 1-row count branches (7 subtree
evaluations of the canonical chain, 14 parquet scans).
NEW: the registry's group-dimension shape (2 subtrees, 0 corpus joins).

Alternates NEW/OLD reps back-to-back in one session (the bench's paired
protocol), noop-sink materialization, asserts both produce identical
rows first. Usage: python tools/web_funnel_ab.py SF_DIR [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions  # noqa: E402
from etl_s3_to_redshift_spark.queries_ops12 import _FUNNEL_QUOTA, _synth_url  # noqa: E402
from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402

_load_extensions()


def old_impl(spark, sf_dir):
    from etl_s3_to_redshift_spark.operators.web import (
        canonical_url,
        domain_quota_filter,
        url_dedup_groups,
    )

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "n_chars", _synth_url().alias("url"))
    )
    kept_urls = url_dedup_groups(docs, url_col="url", id_col="doc_id").select(
        F.col("kept_id").alias("doc_id")
    )
    url_level = docs.join(kept_urls, ["doc_id"], "left_semi")
    domains = url_level.select(
        "doc_id",
        F.regexp_extract(
            canonical_url(F.col("url")), "^[a-z]+://([^/?#]*)", 1
        ).alias("domain"),
        "n_chars",
    )
    capped = domains.join(
        domain_quota_filter(
            domains, "domain", _FUNNEL_QUOTA, "n_chars", id_col="doc_id"
        ),
        ["doc_id"],
        "left_semi",
    )
    one = (
        docs.agg(F.count(F.lit(1)).alias("n0"))
        .crossJoin(url_level.agg(F.count(F.lit(1)).alias("n1")))
        .crossJoin(capped.agg(F.count(F.lit(1)).alias("n2")))
    )
    c = [F.col("n0"), F.col("n1"), F.col("n2")]
    names = ["raw", "url_deduped", "domain_capped"]
    structs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(names[i]).alias("stage"),
                c[i].cast("long").alias("n_docs"),
                (c[i - 1] - c[i] if i else F.lit(0)).cast("long").alias("n_removed"),
                F.when(
                    c[0] > 0,
                    F.round(c[i].cast("double") / c[0].cast("double"), 6)
                    + F.lit(0.0),
                ).alias("pct_kept"),
            )
            for i in range(3)
        ]
    )
    return one.select(F.explode(structs).alias("st")).select("st.*")


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("web_funnel_ab")
    new_fn = REGISTRY["web_curation_funnel"].spark

    new_rows = sorted(map(tuple, new_fn(spark, sf_dir).collect()))
    old_rows = sorted(map(tuple, old_impl(spark, sf_dir).collect()))
    assert new_rows == old_rows, (new_rows, old_rows)
    print("rows identical:", new_rows)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(new_fn(spark, sf_dir).limit(1))  # warm
    ts_new, ts_old = [], []
    for _ in range(reps):
        t0 = time.time()
        spark.sparkContext.setJobDescription("web_funnel NEW")
        noop(new_fn(spark, sf_dir))
        ts_new.append(round(time.time() - t0, 3))
        t0 = time.time()
        spark.sparkContext.setJobDescription("web_funnel OLD")
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
