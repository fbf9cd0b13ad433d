"""Multi-column data-layout optimization: Z-order (Morton-curve) writes.

A single-column sort gives tight parquet min/max stats — and therefore
row-group/file skipping — on that one column only; filters on any other
column read everything. Interleaving the bits of several columns into one
Morton key and clustering the write by that key keeps EVERY participating
column's per-file range narrow, so scans filtering on any of them skip
most files. This is the lakehouse `OPTIMIZE ... ZORDER BY` capability,
built from plain DataFrame expressions (bit arithmetic + a range
repartition) — no table format required.

Scale notes: the only extra costs over a plain clustered write are one
min/max aggregate per z-column (a metadata-scale scalar collect — the
same pattern as AQE statistics) and the bit-interleave projection
(whole-stage-codegen'd shifts/masks). The write itself is
``repartitionByRange`` on the key — one shuffle, the same as any
clustered write; file count stays the caller's choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(cols: list[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of each (already scaled, non-negative)
    long column into one Morton key: output bit ``i*n + j`` is input bit
    ``i`` of column ``j``. Pure shifts/masks — codegen-friendly.

    ``len(cols) * bits`` must fit a signed 64-bit key (≤ 63) —
    ``1 << 63`` would overflow the Java long literal."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} key bits > 63; "
            f"lower bits to {63 // n} or fewer columns"
        )
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            key = key + (
                F.shiftright(c, i).bitwiseAND(F.lit(1)).cast("long")
                * F.lit(1 << (i * n + j)).cast("long")
            )
    return key


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton key over numeric columns, each min/max-scaled to
    ``[0, 2^bits)``. The min/max pass is one tiny aggregate; NULLs map to
    bucket 0 (they cluster together, which is what stats pruning wants).
    ``bits`` is auto-lowered so the interleaved key fits 63 bits.
    """
    bits = min(bits, 63 // len(cols))
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None:
            # all-NULL column: no spread to encode — constant bucket 0
            scaled.append(F.lit(0).cast("long"))
            continue
        span = (mx - mn) or 1.0
        # coalesce NULL -> 0 BEFORE least(): Spark's least() SKIPS NULL
        # operands, so least(top, NULL) would return top and silently
        # cluster NULL rows with the max-value rows
        scaled.append(
            F.least(
                F.lit(top).cast("long"),
                F.coalesce(
                    F.floor((F.col(c).cast("double") - mn) / span * top).cast("long"),
                    F.lit(0).cast("long"),
                ),
            )
        )
    return morton_interleave(scaled, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered along the Z-curve of ``cols``: range-
    partition by the Morton key into ``n_files`` output files, sort within
    each, drop the key. Every file then covers a compact hyper-rectangle
    of the z-column space — min/max stats prune on ANY of the columns."""
    keyed = df.withColumn("__z", zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
