"""One timed rep of entity_groups_sparse_chain under a chosen
shuffle/spill compression codec — the guide §2.3 lever for the
spill-I/O-bound ER star build (OPTIMIZATION_r10.md "Not yet optimized"
#1). Codec is a core conf, so each invocation builds its own session;
run the arms ABBA back-to-back on a quiet host and compare medians.

Usage: SPARK_GRAFT_CODEC=zstd python tools/er_codec_probe.py SF_DIR
Prints one JSON line {"codec":..., "sec":...}.
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
    codec = os.environ.get("SPARK_GRAFT_CODEC", "lz4")
    spark = get_spark(
        f"er_codec_{codec}",
        extra_conf={"spark.io.compression.codec": codec},
    )
    assert spark.conf.get("spark.io.compression.codec") == codec
    spark.sparkContext.setJobDescription(f"er sparse chain [{codec}]")
    t0 = time.time()
    REGISTRY["entity_groups_sparse_chain"].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    print(json.dumps({"codec": codec, "sec": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
