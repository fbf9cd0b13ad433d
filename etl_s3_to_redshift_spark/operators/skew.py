"""Skew-mitigation helpers.

AQE's skew-join handling (on in session.py) covers sort-merge joins at
runtime; these helpers cover the cases AQE doesn't: skewed *aggregations*
(one hot group key saturates a single reducer) and deliberate pre-salting
of known-hot join keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
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
