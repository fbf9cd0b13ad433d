"""Same-session A/B of the r11 star-build singleton prefilter on the
registered ER queries (VERDICT r10 #1). One Spark session (shuffle
partitions from SPARK_GRAFT_SHUFFLE_PARTITIONS — set 128 for the sf100
protocol), arms alternated ABBA via the SPARK_GRAFT_STAR_PREFILTER env
knob (read at query-construction time, inside each timed rep). Prints
one JSON line per rep and asserts row equality between the arms once.

Usage: python tools/er_prefilter_ab.py SF_DIR QUERY [reps_per_arm]
  QUERY in {entity_groups_sparse_chain, entity_groups_fuzzy}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions  # noqa: E402
from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402

_load_extensions()


def main() -> None:
    sf_dir = sys.argv[1]
    query = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("er_prefilter_ab")
    print(
        json.dumps(
            {
                "query": query,
                "sf_dir": sf_dir,
                "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
            }
        ),
        flush=True,
    )
    # ABBA ordering: off, auto, auto, off, off, auto, ...
    order = []
    for i in range(reps):
        order += ["off", "auto"] if i % 2 == 0 else ["auto", "off"]
    for arm in order:
        os.environ["SPARK_GRAFT_STAR_PREFILTER"] = arm
        spark.sparkContext.setJobDescription(f"{query} [prefilter={arm}]")
        t0 = time.time()
        REGISTRY[query].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        print(
            json.dumps({"arm": arm, "sec": round(time.time() - t0, 1)}),
            flush=True,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
