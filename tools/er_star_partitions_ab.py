"""Same-session A/B of shuffle-partition count for the ER star-build
window sort (guide §2.2 — size partitions 100MB–1GB so the external
sort stops spilling). spark.sql.shuffle.partitions is a runtime conf,
so both arms run in ONE session, ABBA.

Usage: python tools/er_star_partitions_ab.py SF_DIR P1 P2 [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402
from tools.scratch_er_prefilter import (  # noqa: E402
    exploded_frame,
    records_sparse_chain,
    star_direct,
)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir, p1, p2 = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    spark = get_spark("er_star_partitions_ab")
    recs = records_sparse_chain(spark, sf_dir)
    n_seg = recs.agg(F.max(F.length("name"))).first()[0]
    ex = exploded_frame(recs, "rec_id", "name", int(n_seg))
    order = []
    for i in range(reps):
        order += [p1, p2] if i % 2 == 0 else [p2, p1]
    for p in order:
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        spark.sparkContext.setJobDescription(f"star direct [partitions={p}]")
        t0 = time.time()
        star_direct(ex).write.format("noop").mode("overwrite").save()
        print(json.dumps({"partitions": p, "sec": round(time.time() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
