"""Privacy-audit operators — k-anonymity / quasi-identifier analysis.

A corpus or warehouse released for training must not let rows be
re-identified through quasi-identifier combinations (the classic
linkage attack). These operators audit that property; they complement
the content-level scrubbing in ``operators/textops.pii_scrub``.

Pure DataFrame aggregations: one hash-shuffle on the quasi-identifier
tuple, whatever the table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_violations(
    df: DataFrame,
    quasi_cols: list[str | Column],
    k: int = 5,
) -> DataFrame:
    """Quasi-identifier combinations whose group size is below ``k`` —
    the rows a linkage attack could single out. Returns one row per
    violating combination: the quasi-identifier values plus ``n_rows``.

    Pass expressions (e.g. a banded/bucketed continuous column) as
    Columns with ``.alias(...)``; generalizing a continuous attribute
    into bands is exactly how k-anonymity is normally achieved, so the
    audit should run on the banded form it intends to release.

    Scale shape: one groupBy shuffle on the quasi tuple with map-side
    combine; the violation filter runs on the aggregated (combo-sized,
    not row-sized) frame. No joins, no window.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") < k)
    )


def k_anonymity_summary(
    df: DataFrame,
    quasi_cols: list[str | Column],
    k: int = 5,
) -> DataFrame:
    """One-row audit summary: total combos, violating combos, rows at
    risk, and the table's actual k (the smallest group size) — the
    go/no-go numbers a release gate checks.

    Same single-shuffle profile as ``k_anonymity_violations``; the
    summary is a scalar aggregate over the combo-sized frame.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    groups = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_rows"))
    return groups.agg(
        F.count(F.lit(1)).alias("n_combos"),
        F.sum(F.when(F.col("n_rows") < k, 1).otherwise(0)).alias("n_violating_combos"),
        F.sum(F.when(F.col("n_rows") < k, F.col("n_rows")).otherwise(0)).alias(
            "n_rows_at_risk"
        ),
        F.min("n_rows").alias("actual_k"),
    )
