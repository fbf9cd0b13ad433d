"""End-to-end corpus curation: the composed training-data pipeline.

The individual operators (quality features, exact dedup, MinHash-LSH
near-dup, decontamination, hash split) each exist as first-class,
oracle-checked components; this plan composes them into the standard
web-corpus cleaning flow:

    raw docs
      → URL-level pass     (optional: canonical-URL dedup + per-domain
                            quota — C4/RefinedWeb run these FIRST; they
                            are the cheapest gates in the stack)
      → quality gate       (length / alpha-ratio / stopword-ratio floor)
      → exact dedup        (keep lowest id per normalized content key)
      → near-dup removal   (MinHash-LSH pairs → connected components →
                            keep component minimum, matching exact dedup)
      → decontamination    (drop docs sharing any k-gram with the
                            benchmark set — eval-leakage guard)
      → train/val/test     (deterministic content-hash split)

Scale design (100 TB):
- Every stage is a pure DataFrame transform; between super-stages the
  plan optionally MATERIALIZES to parquet (``staging_dir``) — cutting
  lineage so the dedup self-joins re-scan a column-pruned staged table
  instead of recomputing the upstream pipeline per join branch (the
  same reasoning as operators/dedup.stage_minhash).
- Doc bodies never ride through a dedup shuffle: both dedup stages
  produce id-level verdicts (manifest / non-keeper ids) that are
  semi/anti-joined back onto the corpus, so the wide text column only
  moves in the final partitioned write.
- The quality gate is a scan-stage filter (pushable, no shuffle); the
  split is a pure per-row hash expression (no shuffle, no RNG).

Reference anchor: the reference's staging→dedup-insert flow
(/root/reference/sql_queries.py:144-190) is this pipeline's two middle
stages at warehouse scale; the quality/near-dup/decontamination stages
are the north-star extension surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.components import dedup_groups
from etl_s3_to_redshift_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from etl_s3_to_redshift_spark.operators.sampling import hash_split
from etl_s3_to_redshift_spark.operators.textops import decontaminate, quality_features


@dataclass
class CurationResult:
    """Final curated frame (with ``split`` column) + per-stage row
    accounting, in pipeline order."""

    curated: DataFrame
    stats: dict[str, int] = field(default_factory=dict)


def _maybe_stage(
    spark: SparkSession, df: DataFrame, staging_dir: str | None, name: str
) -> DataFrame:
    if staging_dir is None:
        return df
    path = f"{staging_dir}/{name}"
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 20,
    min_alpha_ratio: float = 0.5,
    min_stopword_ratio: float = 0.0,
    near_dup_threshold: float = 0.7,
    decontam_k: int = 5,
    chunk_dedup_words: int | None = None,
    split_weights: dict[str, float] | None = None,
    order_buckets: int | None = None,
    staging_dir: str | None = None,
    url_col: str | None = None,
    domain_quota: int | None = None,
) -> CurationResult:
    """Run the full curation pipeline; see module docstring for stages.

    ``staging_dir`` turns on between-stage parquet materialization (the
    100 TB configuration); ``None`` keeps the whole pipeline lazy (fine
    up to the scale where recomputing the upstream per join branch
    costs more than a staged write).

    ``url_col`` turns on the URL-level stage 0 (the C4/RefinedWeb
    order: canonical-URL dedup, then — with ``domain_quota`` — a
    per-registered-domain cap keeping the longest documents first,
    BEFORE any content-level pass: the cheapest gates run first, and at
    web scale the same page crawled under URL variants would otherwise
    reach the much costlier near-dup stage). ``domain_quota`` requires
    ``url_col``.
    """
    if domain_quota is not None and url_col is None:
        raise ValueError("domain_quota requires url_col (the domain comes from the URL)")
    stats: dict[str, int] = {"raw": docs.count()}

    # 0. URL-level pass — id-level verdicts semi-joined back, same
    # text-column discipline as every other stage
    if url_col is not None:
        from etl_s3_to_redshift_spark.operators.web import (
            canonical_url,
            domain_quota_filter,
            registered_domain,
            url_dedup_groups,
        )

        kept_urls = url_dedup_groups(docs, url_col=url_col, id_col=id_col).select(
            F.col("kept_id").alias(id_col)
        )
        docs = docs.join(kept_urls, [id_col], "left_semi")
        docs = _maybe_stage(spark, docs, staging_dir, "url_deduped")
        stats["url_deduped"] = docs.count()
        if domain_quota is not None:
            domains = docs.select(
                F.col(id_col),
                registered_domain(canonical_url(F.col(url_col))).alias("__domain"),
                # keep-longest-first: the standard quality proxy when no
                # scorer has run yet (the quota fires before stage 1)
                F.length(F.col(text_col)).alias("__len"),
            )
            keep_ids = domain_quota_filter(
                domains, "__domain", domain_quota, "__len", id_col=id_col
            )
            docs = docs.join(keep_ids, [id_col], "left_semi")
            docs = _maybe_stage(spark, docs, staging_dir, "domain_capped")
            stats["domain_capped"] = docs.count()

    # 1. quality gate — id-level verdict joined back so the text column
    # stays in its original scan stage
    feats = quality_features(docs, text_col=text_col, id_col=id_col)
    keep_ids = feats.filter(
        (F.col("n_chars") >= min_chars)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    ).select(id_col)
    gated = docs.join(keep_ids, [id_col], "left_semi")
    gated = _maybe_stage(spark, gated, staging_dir, "quality_gated")
    stats["quality_gated"] = gated.count()

    # 2. exact dedup — manifest semi-join (keep lowest id per content key)
    manifest = exact_dedup(gated, text_col=text_col, id_col=id_col)
    exact = gated.join(manifest.select(id_col), [id_col], "left_semi")
    exact = _maybe_stage(spark, exact, staging_dir, "exact_deduped")
    stats["exact_deduped"] = exact.count()

    # 3. near-dup removal — LSH pairs → components → drop non-keepers
    pairs = minhash_lsh_pairs(
        exact, threshold=near_dup_threshold, text_col=text_col, id_col=id_col
    )
    non_keepers = (
        dedup_groups(pairs.select("id_a", "id_b"))
        .filter(~F.col("is_keeper"))
        .select(F.col("member").alias(id_col))
    )
    neardup = exact.join(non_keepers, [id_col], "left_anti")
    neardup = _maybe_stage(spark, neardup, staging_dir, "neardup_removed")
    stats["neardup_removed"] = neardup.count()

    # 3b. optional span-level dedup (C4-style): rewrite each surviving
    # doc with its corpus-repeated chunks removed — document-level dedup
    # above catches whole near-copies; this catches shared boilerplate
    if chunk_dedup_words is not None:
        from etl_s3_to_redshift_spark.operators.dedup import dedup_repeated_chunks

        cleaned = dedup_repeated_chunks(
            neardup, chunk_words=chunk_dedup_words, text_col=text_col, id_col=id_col
        )
        neardup = (
            neardup.drop(text_col)
            .join(
                cleaned.select(id_col, F.col("clean_text").alias(text_col)),
                [id_col],
            )
        )
        neardup = _maybe_stage(spark, neardup, staging_dir, "chunk_deduped")
        stats["chunk_deduped"] = neardup.count()

    # 4. decontamination — anti-join on contaminated ids
    if benchmark is not None:
        contaminated = decontaminate(
            neardup, benchmark, k=decontam_k, text_col=text_col, id_col=id_col
        ).filter(F.col("n_shared_ngrams") > 0).select(id_col)
        clean = neardup.join(contaminated, [id_col], "left_anti")
    else:
        clean = neardup
    stats["decontaminated"] = clean.count()

    # 5. deterministic split
    out = hash_split(
        clean,
        split_weights or {"train": 0.98, "val": 0.01, "test": 0.01},
        id_col=id_col,
    )
    # 6. optional deterministic training order (bucketed global shuffle)
    if order_buckets is not None:
        from etl_s3_to_redshift_spark.operators.sampling import training_order

        out = training_order(out, id_col=id_col, n_buckets=order_buckets)
    stats["curated"] = stats["decontaminated"]
    return CurationResult(curated=out, stats=stats)


def write_curated(result: CurationResult, path: str) -> None:
    """Persist the curated corpus partitioned by split — downstream
    training readers prune to their split at the directory level."""
    result.curated.write.mode("overwrite").partitionBy("split").parquet(path)
