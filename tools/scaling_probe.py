"""Measure headline-query scaling across sf0.001/0.01/0.1 → SCALING_DATA.json
and a markdown table on stdout. Usage: python tools/scaling_probe.py
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

QUERIES = [
    "q1_pricing_summary",
    "q18_large_orders",
    "r2_broadcast_enrich",
    "w1_top_orders_per_customer",
    "sessionize_events",
    "dedup_minhash_lsh",
    "sim_topk_cosine_fast",
    "text_tfidf_topterms",
]
SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> None:
    spark = get_spark("scaling_probe")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()
    data: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        data[name] = {}
        for sf in SFS:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                REGISTRY[name].spark(spark, f"/root/testdata/{sf}").write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            data[name][sf] = round(best, 3)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALING_DATA.json"), "w") as f:
        json.dump(data, f, indent=2)
    print("| query | " + " | ".join(SFS) + " |")
    print("|---|" + "---|" * len(SFS))
    for name, row in data.items():
        print(f"| {name} | " + " | ".join(str(row[sf]) for sf in SFS) + " |")


if __name__ == "__main__":
    main()
