"""Bucket-blocked candidate-pair generation shared by the LSH family
(MinHash bands, SimHash blocks).

``pairs_within_buckets`` replaces the classic bucket self-join with
groupBy-collect_set + in-row pair expansion. Two wins:

1. The (possibly expensive) subtree that produced the bucketed frame is
   evaluated ONCE — Spark has no subplan sharing, so a self-join executes
   it per side. For inline MinHash that subtree is the whole
   tokenize→shingle→hash pipeline.
2. One bucket-key shuffle carrying each row once (map-side combine),
   instead of shuffling both join sides.

Measured on the sf1 corpus (50k docs, MinHash 16 bands): 2.1 s vs 3.5 s
for the self-join, identical 21,616 candidate pairs.

Contract: bucket sizes must be BOUNDED (the banding/blocking design goal —
signature bits cap collision probability). Each bucket's members
materialize as one array row, so a pathological hot bucket would
concentrate in one task; for unbounded bucket keys use a plain self-join,
which AQE can skew-split. (The embedding near-dup path keeps the
self-join for exactly this reason: its completeness-first 2-bit bands
make buckets corpus-fraction-sized by design.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairs_within_buckets(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct (id_a < id_b) pairs co-located in ≥1 bucket.

    ``payload_cols`` ride along per side as ``<col>_a`` / ``<col>_b``
    (must be functionally dependent on the id, e.g. a signature).
    """
    if payload_cols:
        item = F.struct(F.col(id_col), *[F.col(c) for c in payload_cols])
    else:
        item = F.col(id_col)
    grp = (
        df.groupBy(*bucket_cols)
        .agg(F.collect_set(item).alias("__ids"))
        .filter(F.size("__ids") > 1)
        .select(F.array_sort("__ids").alias("__ids"))
    )
    pairs = F.flatten(
        F.transform(
            F.col("__ids"),
            lambda x, i: F.transform(
                F.slice(F.col("__ids"), i + 2, F.size(F.col("__ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    out = grp.select(F.explode(pairs).alias("p"))
    if payload_cols:
        return out.select(
            F.col(f"p.a.{id_col}").alias("id_a"),
            F.col(f"p.b.{id_col}").alias("id_b"),
            *[F.col(f"p.a.{c}").alias(f"{c}_a") for c in payload_cols],
            *[F.col(f"p.b.{c}").alias(f"{c}_b") for c in payload_cols],
        ).distinct()
    return out.select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b")).distinct()
