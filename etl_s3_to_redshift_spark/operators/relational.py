"""Relational operator library — the reference's §2b inventory as reusable,
Catalyst-friendly helpers.

Every helper returns a lazy DataFrame (a logical plan); Catalyst applies
predicate pushdown / column pruning / join selection. Nothing here calls an
action or collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, mapping: dict[str, str | Column]) -> DataFrame:
    """R1 — projection + aliasing (reference sql_queries.py:135-143).

    ``mapping`` is {output_name: input_col_or_expr}.
    """
    return df.select(
        *[
            (F.col(src) if isinstance(src, str) else src).alias(out)
            for out, src in mapping.items()
        ]
    )


def multi_key_left_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[tuple[str, str]],
    broadcast_right: bool = True,
) -> DataFrame:
    """R2 — left outer equi-join on a conjunction of key pairs
    (reference sql_queries.py:144-151: 3-key join events←songs).

    ``on`` is [(left_col, right_col), ...]. ``broadcast_right=True`` mirrors
    the reference's ``diststyle all`` replicated dimensions
    (sql_queries.py:85,95,105,116) — a broadcast hash join avoids shuffling
    the (large) left side entirely; at 100 TB the fact never moves.

    Decimal keys (R3): callers must keep DecimalType on both sides —
    Spark's decimal comparison handles differing scales exactly, whereas a
    silent double conversion changes match rates.
    """
    cond = None
    for lc, rc in on:
        clause = left[lc] == right[rc]
        cond = clause if cond is None else (cond & clause)
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, cond, "left_outer")


def distinct_projection(
    df: DataFrame,
    cols: dict[str, str | Column],
    not_null: str | None = None,
) -> DataFrame:
    """R4+R5 — the reference's dimension-build shape: project, optionally
    drop NULL-keyed rows, dedup the *projected tuple* (reference
    sql_queries.py:155-177).

    DISTINCT applies to the full projected row — not ``dropDuplicates`` on
    the key alone — so two users with the same id but differing attributes
    would both survive, exactly as in the reference (SURVEY.md §7 watch-out).

    Scale: Catalyst turns this into a hash aggregate with map-side partial
    dedup, so the shuffle carries only unique tuples per partition.
    """
    out = df
    if not_null is not None:
        out = out.filter(F.col(not_null).isNotNull())
    return project(out, cols).distinct()


def date_parts(ts: str | Column) -> dict[str, Column]:
    """R6 — EXTRACT date-parts (reference sql_queries.py:183-188).

    ``extract(week)`` in Redshift and ``weekofyear`` in Spark are both ISO
    weeks — compatible (SURVEY.md §2b R6).
    """
    col = F.col(ts) if isinstance(ts, str) else ts
    return {
        "hour": F.hour(col),
        "day": F.dayofmonth(col),
        "week": F.weekofyear(col),
        "month": F.month(col),
        "year": F.year(col),
    }


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """R9 generalized — deterministic top-k: total order (callers must
    include a tiebreak key) + limit. Physically Spark runs TakeOrderedAndProject:
    each partition keeps k rows, the driver merges — no full sort, no full
    shuffle. The reference's LIMIT probes (test_etl.ipynb) are the k-rows
    special case.
    """
    return df.orderBy(*order).limit(k)


def count_rows(df: DataFrame, alias: str = "n_rows") -> DataFrame:
    """R8 — count(*) as a one-row DataFrame (reference test_etl.ipynb)."""
    return df.agg(F.count(F.lit(1)).alias(alias))


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style single-pass column profile: per column the non-null
    count, exact distinct count, and min/max (computed on the native
    type, then cast to string for a uniform long-format output of
    ``(column_name, n_nonnull, n_distinct, min_value, max_value)``).

    One scan: all aggregates run in a single ``agg`` (Spark plans the
    multiple exact DISTINCTs with one expand — cost |cols| x rows, the
    price of exactness; swap ``approx_count_distinct`` in for the
    100 TB profile-everything sweep), then ``stack`` unpivots the 1-row
    result driver-free. This is the statistics surface behind the
    reference's implicit reliance on Redshift's ANALYZE
    (/root/reference/sql_queries.py has no stats DDL — the warehouse
    does it); here it doubles as CBO input and data-quality monitoring.
    """
    # Internal aliases are positional (__n_0, ...) and the emitted
    # column-name literal is quote-escaped, so column names containing
    # spaces/dots/quotes can't break the generated stack() expression
    # (the source column itself is referenced via F.col, which handles
    # any identifier).
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"__n_{i}"),
            F.countDistinct(F.col(c)).alias(f"__d_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{i}"),
        ]
    row = df.agg(*aggs)
    pairs = ", ".join(
        "'{lit}', __n_{i}, __d_{i}, __min_{i}, __max_{i}".format(
            lit=c.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, c in enumerate(cols)
    )
    return row.selectExpr(
        f"stack({len(cols)}, {pairs}) AS "
        "(column_name, n_nonnull, n_distinct, min_value, max_value)"
    )
