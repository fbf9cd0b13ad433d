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
