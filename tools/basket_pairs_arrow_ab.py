"""A/B probe (VERDICT r10 #8): per-partition pair-count pre-aggregation
in a mapInArrow NumPy kernel vs the shipped in-row explode + map-side-
combined groupBy for the basket pair stream (Σ|b|² is the OUTPUT lower
bound; this measures whether moving the pair generation + partial count
to a vectorized Python kernel beats JVM Generate+HashAggregate).

The kernel groups baskets by length, stacks same-length baskets into a
matrix, emits all triu index pairs vectorized, packs (a, b) into one
int64 (partkeys < 2^31), and np.unique-counts per task — the shuffle
then carries (pair, partial_n) exactly like the JVM partial aggregate.

Usage: python tools/basket_pairs_arrow_ab.py SF_DIR [reps]
Prints per-arm timings + asserts equal pair counts once.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_s3_to_redshift_spark.queries import _t, _load_extensions  # noqa: E402
from etl_s3_to_redshift_spark.queries_ops7 import _baskets, _order_pair_counts  # noqa: E402
from etl_s3_to_redshift_spark.session import get_spark  # noqa: E402

_load_extensions()


def arrow_pair_counts(li):
    import pyarrow as pa

    baskets = _baskets(li).select("ps")

    def kernel(batches):
        import numpy as np

        counts: dict[int, int] = {}
        for batch in batches:
            col = batch.column(0)
            # offsets + flat values of the list<long> column
            for chunk in [col]:
                arr = chunk
                offs = arr.offsets.to_numpy(zero_copy_only=False)
                vals = arr.values.to_numpy(zero_copy_only=False)
                lens = np.diff(offs)
                for k in np.unique(lens):
                    if k < 2:
                        continue
                    rows = np.flatnonzero(lens == k)
                    if not len(rows):
                        continue
                    starts = offs[rows]
                    m = vals[(starts[:, None] + np.arange(k)[None, :])]
                    iu, ju = np.triu_indices(int(k), 1)
                    packed = (m[:, iu].astype(np.int64) << 32) | m[:, ju].astype(
                        np.int64
                    )
                    uniq, cnt = np.unique(packed.ravel(), return_counts=True)
                    for u, c in zip(uniq.tolist(), cnt.tolist()):
                        counts[u] = counts.get(u, 0) + c
        if counts:
            keys = list(counts.keys())
            import numpy as np

            ks = np.asarray(keys, dtype=np.int64)
            yield pa.record_batch(
                [
                    pa.array((ks >> 32).tolist(), pa.int64()),
                    pa.array((ks & 0xFFFFFFFF).tolist(), pa.int64()),
                    pa.array([counts[k] for k in keys], pa.int64()),
                ],
                names=["part_a", "part_b", "pn"],
            )

    partial = baskets.mapInArrow(
        kernel, "part_a long, part_b long, pn long"
    )
    return partial.groupBy("part_a", "part_b").agg(
        F.sum("pn").cast("long").alias("n_orders")
    )


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("basket_pairs_arrow_ab")
    li = _t(spark, sf_dir, "lineitem")
    jvm = _order_pair_counts(li)
    arrow = arrow_pair_counts(li)
    a = sorted(map(tuple, jvm.collect()))
    b = sorted(map(tuple, arrow.collect()))
    assert a == b, f"pair counts differ: {len(a)} vs {len(b)}"
    print(json.dumps({"rows_equal": True, "n_pairs": len(a)}), flush=True)
    spark.catalog.clearCache()
    for i in range(reps):
        for arm, df_fn in (("jvm", lambda: _order_pair_counts(li)),
                           ("arrow", lambda: arrow_pair_counts(li))):
            spark.sparkContext.setJobDescription(f"basket pairs [{arm} rep {i}]")
            t0 = time.time()
            df_fn().write.format("noop").mode("overwrite").save()
            print(json.dumps({"arm": arm, "rep": i, "sec": round(time.time() - t0, 2)}),
                  flush=True)
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
