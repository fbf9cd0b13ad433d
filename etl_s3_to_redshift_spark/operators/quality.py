"""Data-quality expectation checks — the dbt-test / Great-Expectations
surface as plain DataFrame plans.

A rule list compiles into at most three plan shapes, whatever its size:
- all row-level rules (not-null, range, accepted-set, regex) fold into
  ONE conditional-count aggregate over a single scan;
- each uniqueness rule is one map-side-combined groupBy on its key
  (counting keys seen more than once);
- each referential rule is one anti-join against the referenced keys
  (broadcast when the dimension is small).

The report is a tiny (rule, n_violations) table — audits are REPORTS,
not filters, same contract as plans/release.py: the load gate decides,
the numbers are recorded.

Reference anchor: the reference's only checks are notebook row counts
(/root/reference/test_etl.ipynb cells 8-21); this is the north-star
generalization of that verification step.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` ∈ {'not_null', 'range', 'in_set',
    'regex', 'unique', 'references'}; params per kind."""

    name: str
    kind: str
    column: str | None = None
    lo: float | None = None
    hi: float | None = None
    values: tuple = field(default=())
    pattern: str | None = None
    ref: DataFrame | None = None
    ref_col: str | None = None


def _row_violation(r: Rule) -> Column:
    c = F.col(r.column)
    if r.kind == "not_null":
        return c.isNull()
    if r.kind == "range":
        cond = F.lit(False)
        if r.lo is not None:
            cond = cond | (c < r.lo)
        if r.hi is not None:
            cond = cond | (c > r.hi)
        return c.isNull() | cond
    if r.kind == "in_set":
        return c.isNull() | ~c.isin(list(r.values))
    if r.kind == "regex":
        return c.isNull() | ~c.rlike(r.pattern)
    raise ValueError(f"not a row-level rule: {r.kind}")


def expectations_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, n_violations) for every rule, in rule order."""
    spark = df.sparkSession
    row_rules = [r for r in rules if r.kind in ("not_null", "range", "in_set", "regex")]
    frames: list[DataFrame] = []

    if row_rules:
        # positional __v<i> aliases + the Column API (array-of-structs
        # explode instead of a stack() selectExpr) keep rule names as pure
        # DATA — a name with quotes/spaces/dots can't break the plan
        agg = df.agg(
            *[
                F.sum(_row_violation(r).cast("long")).alias(f"__v{i}")
                for i, r in enumerate(row_rules)
            ]
        )
        pairs = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.coalesce(F.col(f"__v{i}"), F.lit(0)).cast("long")
                    .alias("n_violations"),
                )
                for i, r in enumerate(row_rules)
            ]
        )
        # one row per rule out of the single-pass aggregate
        frames.append(
            agg.select(F.explode(pairs).alias("p")).select("p.rule", "p.n_violations")
        )

    for r in rules:
        if r.kind == "unique":
            # NULL keys are the not_null rule's business (dbt convention):
            # grouping them here would count all NULLs as one fake dup set
            dup = (
                df.filter(F.col(r.column).isNotNull())
                .groupBy(r.column)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("n"))
                .select(F.lit(r.name).alias("rule"), F.col("n").cast("long").alias("n_violations"))
            )
            frames.append(dup)
        elif r.kind == "references":
            orphans = (
                df.select(F.col(r.column))
                .filter(F.col(r.column).isNotNull())
                .join(
                    r.ref.select(F.col(r.ref_col).alias(r.column)).distinct(),
                    r.column,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .select(F.lit(r.name).alias("rule"), F.col("n").alias("n_violations"))
            )
            frames.append(orphans)

    if not frames:  # no rules: empty report, stable schema
        return spark.createDataFrame([], "rule string, n_violations long")
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    bucket: Column,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of the same column — THE standard drift monitor a
    training-data pipeline runs before every refresh (feature drift,
    upstream schema/source changes, seasonality breaks).

    ``bucket`` is any deterministic bucketing expression (fixed-width
    edges, hash buckets, category codes) applied identically to both
    frames. Per observed bucket: counts, Laplace-smoothed proportions
    p = (n + 1) / (N + n_buckets) (no ln(0) blowups; n_buckets = the
    OBSERVED bucket count so both engines derive it from data), the PSI
    term (p_cur − p_ref)·ln(p_cur/p_ref), and the total PSI repeated on
    every row (common read: <0.1 stable, 0.1–0.25 drifting, >0.25
    shifted). Rounded ``round_to`` dp — ln differs across libms by ~1
    ulp, orders below the grid.

    Scale shape: both frames reduce to bucket-count-sized partials in
    ONE union + map-side-combined groupBy (the only shuffle, on the
    bucket key); totals and the PSI sum run on the bounded bucket frame
    under an explicitly-keyed window (never row-scale data). Buckets
    empty on ONE side are kept (smoothing prices their disappearance);
    buckets empty on both sides would contribute exactly 0 and are
    omitted."""
    tagged = ref.select(bucket.alias("bucket")).withColumn(
        "__side", F.lit("ref")
    ).unionByName(
        cur.select(bucket.alias("bucket")).withColumn("__side", F.lit("cur"))
    )
    counts = tagged.groupBy("bucket").agg(
        F.sum((F.col("__side") == "ref").cast("long")).alias("n_ref"),
        F.sum((F.col("__side") == "cur").cast("long")).alias("n_cur"),
    )
    # bounded bucket frame: explicit constant partition key (pmod of a
    # hash — non-foldable AND type-agnostic: hash() accepts string /
    # numeric / NULL buckets alike, where pmod(bucket, 1) would need an
    # implicit numeric cast that breaks under ANSI mode for string
    # buckets) keeps WindowExec quiet, same device as operators/prefix
    from pyspark.sql import Window

    w_all = Window.partitionBy(F.pmod(F.hash(F.col("bucket")), F.lit(1))).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t_ref = F.sum("n_ref").over(w_all)
    t_cur = F.sum("n_cur").over(w_all)
    nb = F.count(F.lit(1)).over(w_all)
    p_ref = (F.col("n_ref") + F.lit(1.0)) / (t_ref + nb).cast("double")
    p_cur = (F.col("n_cur") + F.lit(1.0)) / (t_cur + nb).cast("double")
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    with_term = counts.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round(p_ref, round_to).alias("p_ref"),
        F.round(p_cur, round_to).alias("p_cur"),
        F.round(term, round_to).alias("psi_term"),
    )
    w2 = Window.partitionBy(F.pmod(F.hash(F.col("bucket")), F.lit(1))).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return with_term.select(
        "*", F.round(F.sum("psi_term").over(w2), round_to).alias("psi_total")
    )
