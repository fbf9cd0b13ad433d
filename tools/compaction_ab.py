"""Same-session A/B: what BM25-append fragmentation costs a probe, and
what atomic compaction buys back.

Protocol: stage the index on a 50% hash slice of documents, append the
other half in 8 slices (each append lands one file per touched bucket →
~9 files/bucket), probe (median of 3, warm), `compact_staged_bm25`,
probe again (median of 3). Reports file counts and wall times; the
probe rows are asserted identical across layouts (compaction is
layout-only by contract).

Usage: python tools/compaction_ab.py [sf_dir] (default testdata sf0.1)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_s3_to_redshift_spark.operators import textops as T  # noqa: E402
from etl_s3_to_redshift_spark.operators.table_commit import (  # noqa: E402
    resolve_index_root,
)
from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402
from etl_s3_to_redshift_spark.sources.tables import load_table  # noqa: E402

QUERIES = [
    (1, "data quality pipeline"),
    (2, "machine learning training"),
    (3, "duplicate document detection"),
    (4, "spark shuffle partition"),
]
N_APPENDS = int(__import__('os').environ.get('SPARK_GRAFT_AB_APPENDS', 8))


def _files_per_bucket(root: str) -> tuple[int, float]:
    counts = []
    pdir = os.path.join(root, "postings")
    for d in os.listdir(pdir):
        if d.startswith("bucket="):
            counts.append(
                len([f for f in os.listdir(os.path.join(pdir, d)) if f.endswith(".parquet")])
            )
    return max(counts), sum(counts) / len(counts)


def _probe(spark, base, qs, reps=3):
    times = []
    rows = None
    for _ in range(reps):
        t0 = time.time()
        out = {tuple(r) for r in T.bm25_topk_staged(spark, base, qs, k=10).collect()}
        times.append(time.time() - t0)
        rows = out
    return sorted(times)[len(times) // 2], rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("compaction_ab")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = os.path.join(tempfile.mkdtemp(prefix="bm25_compact_ab_"), "idx")
    qs = spark.createDataFrame(QUERIES, "query_id INT, query_text STRING")

    t0 = time.time()
    T.stage_bm25(docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0), base)
    stage_s = time.time() - t0
    t0 = time.time()
    for i in range(N_APPENDS):
        T.append_to_staged_bm25(
            docs.filter(
                (F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)
                & (F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(N_APPENDS)) == i)
            ),
            base,
        )
    append_s = time.time() - t0
    frag_max, frag_avg = _files_per_bucket(resolve_index_root(base))
    frag_t, frag_rows = _probe(spark, base, qs)

    t0 = time.time()
    T.compact_staged_bm25(spark, base)
    compact_s = time.time() - t0
    comp_max, comp_avg = _files_per_bucket(resolve_index_root(base))
    comp_t, comp_rows = _probe(spark, base, qs)

    assert comp_rows == frag_rows, "compaction must be layout-only"
    print(
        f"sf_dir={sf_dir} stage={stage_s:.1f}s appends({N_APPENDS})={append_s:.1f}s "
        f"compact={compact_s:.1f}s\n"
        f"files/bucket: fragmented max={frag_max} avg={frag_avg:.1f} -> "
        f"compacted max={comp_max} avg={comp_avg:.1f}\n"
        f"probe median-of-3: fragmented={frag_t:.2f}s compacted={comp_t:.2f}s "
        f"({frag_t / comp_t:.2f}x)"
    )
    shutil.rmtree(os.path.dirname(base), ignore_errors=True)


if __name__ == "__main__":
    main()
