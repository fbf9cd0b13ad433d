"""MERGE / upsert / SCD2 emulation on plain parquet (no Delta/Iceberg in
this container — their jars would make these one-liners; the composed
DataFrame form keeps the semantics and the scale shape).

- ``merge_upsert``: MERGE INTO target USING source ON key WHEN MATCHED
  UPDATE WHEN NOT MATCHED INSERT — as anti-join + union. One shuffle of
  each side on the key (or broadcast when the source delta is small, the
  common CDC case).
- ``scd2_apply``: slowly-changing-dimension type 2 — closes current rows
  whose attributes changed and appends new versions, preserving history
  with [valid_from, valid_to) intervals and an is_current flag.

Both are snapshot→snapshot pure functions: write the result with
``mode('overwrite')`` for the full-refresh pattern the reference uses
(etl.py:22-29); a real lakehouse would swap in Delta MERGE with identical
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    broadcast_source: bool = True,
) -> DataFrame:
    """Upsert: source rows win on key collision; unmatched target rows
    survive. Schemas must match. ``broadcast_source`` for the typical
    small-delta CDC batch — the big target then never shuffles."""
    src = F.broadcast(source) if broadcast_source else source
    kept = target.join(src.select(key), [key], "left_anti")
    return kept.unionByName(source)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective_ts: Column,
) -> DataFrame:
    """Type-2 SCD merge.

    ``dim`` carries (key, attrs..., valid_from, valid_to, is_current) —
    ``valid_to`` NULL on current rows. ``updates`` carries (key, attrs...).
    Returns the new dimension snapshot:

    - unchanged current rows and all historical rows pass through;
    - current rows whose attrs differ from their update are closed
      (valid_to = effective_ts, is_current = false);
    - changed and brand-new keys get a fresh current row
      (valid_from = effective_ts).

    One shuffle on the key; attribute comparison is null-safe.
    """
    changed_cond = None
    for a in attrs:
        ne = ~F.col(f"d.{a}").eqNullSafe(F.col(f"u.{a}"))
        changed_cond = ne if changed_cond is None else (changed_cond | ne)

    d, u = dim.alias("d"), updates.alias("u")
    current = d.filter(F.col("d.is_current"))
    history = dim.filter(~F.col("is_current"))

    joined = current.join(u, F.col(f"d.{key}") == F.col(f"u.{key}"), "left_outer")
    # current rows with no update, or update identical → unchanged
    unchanged = joined.filter(
        F.col(f"u.{key}").isNull() | ~changed_cond
    ).select("d.*")
    # current rows with a differing update → closed
    closed = (
        joined.filter(F.col(f"u.{key}").isNotNull() & changed_cond)
        .select("d.*")
        .withColumn("valid_to", effective_ts)
        .withColumn("is_current", F.lit(False))
    )
    # differing updates + brand-new keys → fresh current rows
    cur_attrs = current.select(
        F.col(f"d.{key}").alias(key), *[F.col(f"d.{a}").alias(a) for a in attrs]
    )
    fresh_src = merge_new_and_changed(updates, cur_attrs, key, attrs)
    fresh = (
        fresh_src.withColumn("valid_from", effective_ts)
        .withColumn("valid_to", F.lit(None).cast(dim.schema["valid_to"].dataType))
        .withColumn("is_current", F.lit(True))
    )
    return history.unionByName(unchanged).unionByName(closed).unionByName(fresh)


def merge_new_and_changed(
    updates: DataFrame, current_attrs: DataFrame, key: str, attrs: list[str]
) -> DataFrame:
    """Updates that are new keys or differ from the current attributes —
    a null-safe anti-join on (key, attrs...)."""
    cond = F.col(f"u.{key}").eqNullSafe(F.col(f"c.{key}"))
    for a in attrs:
        cond = cond & F.col(f"u.{a}").eqNullSafe(F.col(f"c.{a}"))
    return (
        updates.alias("u")
        .join(current_attrs.alias("c"), cond, "left_anti")
        .select(F.col(key), *attrs)
    )


def change_feed(
    old: DataFrame,
    new: DataFrame,
    key: str,
    attrs: list[str],
) -> DataFrame:
    """Classify every key across two table states as added / removed /
    changed / unchanged — one full-outer NULL-SAFE equi-join on the key
    with null-safe attribute comparison. A NULL key is a real key value
    here (the two sides' NULL-key rows pair up, like Delta's
    table_changes over a nullable key); presence is tracked with literal
    marker columns, never by key-nullness, so NULL-key rows classify
    correctly instead of always reporting 'added'. With a versioned
    SnapshotTable this turns any two committed versions into a CDC
    stream (Delta's table_changes / Iceberg's changelog scan); with
    plain snapshots it converts full-refresh dumps into the incremental
    feed MERGE/SCD2 consume."""
    o = old.select(key, *attrs).withColumn("__in_old", F.lit(True)).alias("o")
    n = new.select(key, *attrs).withColumn("__in_new", F.lit(True)).alias("n")
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(f"o.{a}").eqNullSafe(F.col(f"n.{a}"))
    return o.join(
        n, F.col(f"o.{key}").eqNullSafe(F.col(f"n.{key}")), "full_outer"
    ).select(
        F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
        F.when(F.col("o.__in_old").isNull(), "added")
        .when(F.col("n.__in_new").isNull(), "removed")
        .when(changed, "changed")
        .otherwise("unchanged")
        .alias("change_kind"),
    )
