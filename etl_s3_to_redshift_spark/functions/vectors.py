"""Vector column functions over ``array<float>`` embedding columns.

Two tiers:
- Pure Column expressions (``F.zip_with``/``F.aggregate``): JVM-side,
  no Python, fine-grained fold in index order (deterministic). Used for
  correctness paths and oracle-matched queries.
- Arrow-batched Pandas UDFs (numpy dot): the throughput path for
  brute-force scans — one BLAS call per batch instead of a per-element
  fold. Used by the ANN operators where the plan is Python-side anyway.

All math is promoted to double before accumulation: float32 folds are not
associative enough to compare across engines, and at 64-3072 dims the
widening cost is negligible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ — index-order fold in double."""
    return F.aggregate(
        F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double; NULL-safe on zero vectors (returns
    NULL rather than NaN, mirroring SQL division semantics)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
