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


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    phi: float,
    round_to: int = 6,
) -> DataFrame:
    """Exact φ-heavy-hitters via a Misra-Gries candidate sketch + exact
    rescore — every key whose frequency exceeds ``phi * N``, with its
    exact count and share.

    The classic two-pass production shape for frequency mining at lake
    scale (Misra & Gries 1982; mergeability per Agarwal et al. 2012):

    - **Pass 1 (bounded-memory sketch)**: each partition runs
      Misra-Gries with ``k = ceil(2/phi)`` counters over an Arrow batch
      iterator (``mapInPandas`` — state persists across batches within
      a partition, memory is O(k) regardless of partition size). A key
      with local frequency > N_p/k always survives its partition's
      summary, and a global φ-hitter must exceed φ·N_p in SOME
      partition (averaging), so the union of partition summaries is a
      guaranteed SUPERSET of the true φ-hitters — at most k·P rows
      total, P = #partitions.
    - **Pass 2 (exact rescore)**: the candidate union semi-joins back
      into the stream (broadcast — bounded by k·P), exact counts come
      from one map-side-combined groupBy of candidates only, and the
      φ·N threshold applies to EXACT counts. The sketch only prunes;
      it never decides.

    The output is therefore partition-layout-independent (any candidate
    superset yields identical final rows), cross-engine exact (plain
    GROUP BY / HAVING semantics), and safely config-invariant — unlike
    reporting raw sketch estimates, whose values depend on merge order.
    N rides a 1-row scalar broadcast (the q22 scalar-subquery pattern).

    Returns ``(key, freq, share)`` — share = freq/N rounded to
    ``round_to`` — sorted nowhere (callers order); empty when the key
    distribution is too flat to have φ-hitters, which IS the answer.
    NULL keys are excluded up front (from candidacy AND the total N):
    a semi-join never matches NULL, so leaving NULLs in would silently
    diverge from plain GROUP BY semantics on dirty data instead of
    erroring — the LSH-signature NULL-guard rationale (ADVICE r5).
    """
    import math

    k = int(math.ceil(2.0 / phi))
    key = F.col(key_col)
    df = df.filter(key.isNotNull())

    def mg_partition(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v in pdf[key_col].tolist():
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [c for c, n in counters.items() if n == 1]
                    for c in counters:
                        counters[c] -= 1
                    for c in dead:
                        del counters[c]
        yield pd.DataFrame({key_col: list(counters.keys())})

    stream = df.select(key)
    cand = stream.mapInPandas(
        mg_partition, schema=stream.schema
    ).distinct()

    totals = stream.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    exact = (
        stream.join(F.broadcast(cand), key_col, "leftsemi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .crossJoin(F.broadcast(totals))
        .filter(
            F.col("freq").cast("double") > F.lit(float(phi)) * F.col("__n").cast("double")
        )
    )
    return exact.select(
        key,
        F.col("freq"),
        (F.round(F.col("freq").cast("double") / F.col("__n").cast("double"), round_to) + F.lit(0.0)).alias(
            "share"
        ),
    )
