"""Same-session paired A/B of the retrieval stack: inline vs staged.

The cross-session BENCH series is unfalsifiable below the measured
±10-15% host band (SCALING.md drift study), so structural perf claims
rest on THIS protocol: one Spark session, queries interleaved
A,B,...,A,B per rep, so every variant pair shares host state. Measures:

- text_bm25_topk (inline corpus tokenize per call)
  vs text_bm25_topk_staged (bucket-pruned probe of a staged index)
- sim_hybrid_rrf (brute dense + inline sparse)
  vs sim_hybrid_rrf_ann_saved (saved dense + inline sparse)
  vs sim_hybrid_rrf_staged (saved dense + staged sparse)

Staging costs (BM25 index build/write, IVF build) are timed separately
when cold — the amortization claim needs the one-time cost alongside the
per-probe win. Results merge into RETRIEVAL_AB.json keyed by sf.

Usage: python tools/retrieval_staged_ab.py sf10 sf100 [--reps 2]
Protocol env (memory/bench-and-scaling-protocol): sf100 runs want
SPARK_GRAFT_SHUFFLE_PARTITIONS=128 and a quiet machine.
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

PAIRS = [
    "text_bm25_topk",
    "text_bm25_topk_staged",
    "sim_hybrid_rrf",
    "sim_hybrid_rrf_ann_saved",
    "sim_hybrid_rrf_staged",
]


def _sf_dir(sf: str) -> str:
    for root in ("/root/repo/.localdata", "/root/testdata"):
        p = os.path.join(root, sf)
        if os.path.isdir(p):
            return p
    raise SystemExit(f"no lake for {sf}")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    argv = sys.argv[1:]
    reps = 2
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    sfs = argv or ["sf10", "sf100"]

    spark = get_spark("retrieval_staged_ab")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(root, "RETRIEVAL_AB.json")
    data: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)

    from etl_s3_to_redshift_spark.queries_ops11 import (
        _saved_bm25_path,
        _saved_ivf_index,
    )

    for sf in sfs:
        sf_dir = _sf_dir(sf)
        row = data.setdefault(sf, {})

        # one-time staging, timed when cold (receipt-gated otherwise):
        # the denominator of the amortization claim
        t0 = time.time()
        _saved_bm25_path(spark, sf_dir)
        row["stage_bm25_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        _saved_ivf_index(spark, sf_dir)
        row["stage_ivf_sec"] = round(time.time() - t0, 2)
        spark.catalog.clearCache()

        per: dict[str, list[float]] = {n: [] for n in PAIRS}
        for _ in range(reps):
            for name in PAIRS:
                t0 = time.time()
                materialize(REGISTRY[name].spark(spark, sf_dir))
                per[name].append(round(time.time() - t0, 2))
                spark.catalog.clearCache()
        row["reps"] = per
        row["best"] = {n: min(ts) for n, ts in per.items()}
        b = row["best"]
        row["ratios"] = {
            "bm25_staged_vs_inline": round(
                b["text_bm25_topk_staged"] / b["text_bm25_topk"], 3
            ),
            "hybrid_staged_vs_brute": round(
                b["sim_hybrid_rrf_staged"] / b["sim_hybrid_rrf"], 3
            ),
            "hybrid_staged_vs_saved_dense_only": round(
                b["sim_hybrid_rrf_staged"] / b["sim_hybrid_rrf_ann_saved"], 3
            ),
        }
        with open(out_path, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"== {sf} ==")
        print(json.dumps(row, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
