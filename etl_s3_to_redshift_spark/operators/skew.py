"""Skew-mitigation helpers.

AQE's skew-join handling (on in session.py) covers sort-merge joins at
runtime; these helpers cover the cases AQE doesn't: skewed *aggregations*
(one hot group key saturates a single reducer) and deliberate pre-salting
of known-hot join keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (keys + random salt) so a hot key's rows spread over
    ``n_salts`` reducers; phase 2 re-aggregates the partials by the true
    keys. ``aggs`` maps output column → (input column, fn) where fn ∈
    {sum, count, min, max} (the re-aggregatable functions; avg must be
    decomposed into sum+count by the caller).

    The salt is ``rand``-derived — fine because every supported function is
    salt-partition-insensitive. Phase-1 output is tiny (n_groups × n_salts)
    so phase 2 is free.
    """
    phase2_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[
            getattr(F, fn)(col).alias(f"__p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return p1.groupBy(*keys).agg(
        *[
            getattr(F, phase2_fn[fn])(f"__p_{out}").alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salt_join_skewed_keys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: Sequence,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join with explicit salting of known-hot keys: hot fact rows get
    a random salt, the dim rows for hot keys are replicated across all
    salts, and the join key becomes (key, salt). Non-hot keys use salt 0 on
    both sides — no replication cost.

    Use when a broadcast is impossible (big dim) and AQE's skew split is
    insufficient (e.g. a single key larger than an executor).
    """
    hot = F.array(*[F.lit(k) for k in hot_keys])
    f = fact.withColumn(
        "__salt",
        F.when(F.array_contains(hot, F.col(key)), (F.rand(seed=42) * n_salts).cast("int")).otherwise(
            F.lit(0)
        ),
    )
    d = dim.withColumn(
        "__salts",
        F.when(
            F.array_contains(hot, F.col(key)),
            F.sequence(F.lit(0), F.lit(n_salts - 1)),
        ).otherwise(F.array(F.lit(0))),
    ).withColumn("__salt", F.explode("__salts")).drop("__salts")
    return f.join(d, [key, "__salt"], "inner").drop("__salt")


def key_skew_profile(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Skew diagnostics for candidate join/aggregation keys — the
    measurement that DECIDES between a plain hash join, AQE skew
    handling, salting, or hot-key isolation before a 100 TB shuffle is
    ever launched.

    Per key column: row/key cardinalities, the hottest key's row count
    and share of the table, the mean rows-per-key, and the Shannon
    entropy of the key distribution in bits (log2; uniform keys →
    log2(n_keys), one dominant key → near 0). Each profiled column costs
    one two-level aggregate (groupBy key → tiny stats fold); columns are
    unioned into one diagnostics frame. Entropy is rounded (sub-ulp sum
    drift); everything else is exact integer/ratio arithmetic.
    """
    out = None
    whole = Window.partitionBy()
    for col in key_cols:
        counts = df.groupBy(F.col(col).alias("__k")).agg(F.count(F.lit(1)).alias("__c"))
        # the whole-frame window runs over the keys-cardinality counts
        # frame (one row per key), never over fact rows
        with_p = counts.withColumn(
            "__p", F.col("__c").cast("double") / F.sum("__c").over(whole)
        )
        prof = with_p.agg(
            F.lit(col).alias("key_col"),
            F.sum("__c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("__c").cast("long").alias("max_key_rows"),
            F.round(F.max("__c").cast("double") / F.sum("__c"), 6).alias("top1_share"),
            F.round(F.sum("__c").cast("double") / F.count(F.lit(1)), 2).alias("mean_rows_per_key"),
            F.round(-F.sum(F.col("__p") * F.log2("__p")), 6).alias("entropy_bits"),
        )
        out = prof if out is None else out.unionByName(prof)
    return out
