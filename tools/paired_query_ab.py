"""Same-session paired A/B of ONE registered query: HEAD vs a pinned
ref (default: the r10-final commit the bench gate pins), alternating
H,P,H,P,... in one Spark session — the bench's paired protocol, pointed
at any SF dir. Optionally asserts row equality once before timing.

Usage: python tools/paired_query_ab.py SF_DIR QUERY [reps] [--check-rows]
Env: SPARK_GRAFT_PAIRED_REF overrides the pin; SPARK_GRAFT_SHUFFLE_PARTITIONS
and SPARK_GRAFT_CPUS shape the session as usual.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _pinned_registry / PAIRED_BASELINE_REF)
from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions  # noqa: E402
from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402

_load_extensions()


def main() -> None:
    sf_dir = sys.argv[1]
    query = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    check_rows = "--check-rows" in sys.argv
    ref = os.environ.get("SPARK_GRAFT_PAIRED_REF", bench.PAIRED_BASELINE_REF)
    pinned, cleanup = bench._pinned_registry(ref)
    assert pinned is not None, f"pin {ref} unavailable"
    spark = get_spark("paired_query_ab")
    head_spec, pin_spec = REGISTRY[query], pinned[query]
    print(json.dumps({"query": query, "sf_dir": sf_dir, "ref": ref,
                      "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions")}),
          flush=True)
    if check_rows:
        h = sorted(map(tuple, head_spec.spark(spark, sf_dir).collect()))
        p = sorted(map(tuple, pin_spec.spark(spark, sf_dir).collect()))
        assert h == p, f"ROWS DIFFER: {len(h)} head vs {len(p)} pin"
        print(json.dumps({"rows_equal": True, "n_rows": len(h)}), flush=True)
        spark.catalog.clearCache()
    hs, ps = [], []
    for i in range(reps):
        for arm, spec, acc in (("head", head_spec, hs), ("pin", pin_spec, ps)):
            spark.sparkContext.setJobDescription(f"{query} [{arm} rep {i}]")
            t0 = time.time()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            acc.append(round(time.time() - t0, 2))
            print(json.dumps({"arm": arm, "rep": i, "sec": acc[-1]}), flush=True)
            spark.catalog.clearCache()
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(json.dumps({"query": query, "head_median": med(hs), "pin_median": med(ps),
                      "speedup": round(med(ps) / med(hs), 3) if med(hs) else None,
                      "head_reps": hs, "pin_reps": ps}), flush=True)
    cleanup()


if __name__ == "__main__":
    main()
