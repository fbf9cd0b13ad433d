"""The composed curation pipeline: stage accounting, dedup guarantees,
decontamination, split determinism, staged==unstaged equivalence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.dedup import minhash_lsh_pairs
from etl_s3_to_redshift_spark.plans.curation import curate_corpus, write_curated
from etl_s3_to_redshift_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


@pytest.fixture(scope="module")
def bench_docs(spark, docs):
    # a bench_docs cut from the corpus itself: guaranteed contamination hits
    return docs.orderBy("doc_id").limit(5).select("text")


@pytest.fixture(scope="module")
def result(spark, docs, bench_docs):
    return curate_corpus(spark, docs, bench_docs)


def test_stage_accounting_monotone(result):
    s = result.stats
    order = ["raw", "quality_gated", "exact_deduped", "neardup_removed", "decontaminated"]
    vals = [s[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert s["raw"] == 500 and s["curated"] > 0


def test_near_dups_actually_removed(spark, docs, result):
    """At most one member of every LSH near-dup pair survives curation."""
    pairs = minhash_lsh_pairs(docs, threshold=0.7).select("id_a", "id_b").collect()
    assert pairs, "smoke corpus should contain planted near-dups"
    survivors = {r.doc_id for r in result.curated.select("doc_id").collect()}
    for p in pairs:
        assert not ({p.id_a, p.id_b} <= survivors), (p.id_a, p.id_b)


def test_decontamination_drops_benchmark_members(result, bench_docs):
    """Docs whose text IS a benchmark doc can't survive (they share every
    k-gram)."""
    bench_texts = {r.text for r in bench_docs.collect()}
    surviving_texts = {r.text for r in result.curated.select("text").collect()}
    assert not (bench_texts & surviving_texts)


def test_split_deterministic_and_complete(spark, docs, bench_docs, result):
    splits = dict(
        result.curated.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    assert set(splits) <= {"train", "val", "test"} and splits.get("train", 0) > 0
    rerun = curate_corpus(spark, docs, bench_docs)
    a = {(r.doc_id, r.split) for r in result.curated.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in rerun.curated.select("doc_id", "split").collect()}
    assert a == b


def test_staged_equals_unstaged(spark, docs, bench_docs, result, tmp_path):
    staged = curate_corpus(
        spark, docs, bench_docs, staging_dir=str(tmp_path / "stage")
    )
    assert staged.stats == result.stats
    a = {(r.doc_id, r.split) for r in result.curated.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in staged.curated.select("doc_id", "split").collect()}
    assert a == b


def test_url_stage_accounting_and_staged_equals_unstaged(spark, docs, tmp_path):
    """Stage 0 (URL-level, VERDICT r9 #7): canonical-URL dedup collapses
    planted URL variants FIRST, then the per-domain quota caps the
    noisiest domain — stage accounting lands between raw and the
    content stages, survivors respect both gates, and the staged
    (parquet-materialized) run is row-identical."""
    # deterministic noisy URLs: two registered domains; doc_id%2 picks
    # the domain, doc_id%5 plants scheme-case/tracking-param variants
    # that canonicalize to doc_id%10's URL — each (domain, doc_id%10)
    # bucket collapses to ONE canonical URL
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 5 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(d % 2 == 0, F.lit("a.site-a.com")).otherwise(F.lit("b.site-b.org")),
        F.lit("/p/"),
        (d % 10).cast("string"),
        F.when(d % 5 == 0, F.lit("?utm_source=x")).otherwise(F.lit("")),
    )
    with_urls = docs.withColumn("url", url)
    res = curate_corpus(
        spark, with_urls, url_col="url", domain_quota=3,
        # neutralize the content gates so the URL stages are isolated
        min_chars=0, min_alpha_ratio=0.0, near_dup_threshold=0.99,
    )
    s = res.stats
    # 2 domains x (10 residues mod 10 alternating by parity -> 5 each)
    assert s["url_deduped"] == 10
    assert s["domain_capped"] == 6  # quota 3 per registered domain
    assert s["raw"] >= s["url_deduped"] >= s["domain_capped"] >= s["curated"]
    # survivors: at most quota per registered domain, and each kept doc
    # is its canonical URL's minimum id
    rows = res.curated.select("doc_id").collect()
    kept = sorted(r.doc_id for r in rows)
    assert all(i < 10 for i in kept), "kept_id is the min doc_id per canonical URL"
    per_dom = {0: 0, 1: 0}
    for i in kept:
        per_dom[i % 2] += 1
    assert all(v <= 3 for v in per_dom.values())
    staged = curate_corpus(
        spark, with_urls, url_col="url", domain_quota=3,
        min_chars=0, min_alpha_ratio=0.0, near_dup_threshold=0.99,
        staging_dir=str(tmp_path / "stage"),
    )
    assert staged.stats == s
    a = {(r.doc_id, r.split) for r in res.curated.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in staged.curated.select("doc_id", "split").collect()}
    assert a == b
    # guard: quota without a URL column is a contract error
    with pytest.raises(ValueError, match="requires url_col"):
        curate_corpus(spark, with_urls, domain_quota=3)


def test_write_curated_partitions_by_split(spark, result, tmp_path):
    out = str(tmp_path / "corpus")
    write_curated(result, out)
    parts = {d for d in os.listdir(out) if d.startswith("split=")}
    assert "split=train" in parts
    back = spark.read.parquet(out)
    assert back.count() == result.stats["curated"]
    # partition pruning: reading one split touches only its directory
    assert (
        back.filter(F.col("split") == "train").count()
        == result.curated.filter(F.col("split") == "train").count()
    )


def test_full_pipeline_with_chunk_dedup_and_order(spark, docs, bench_docs):
    """All optional stages on: span dedup rewrites text (total chars can
    only shrink), training order yields a (bucket, pos) bijection."""
    res = curate_corpus(
        spark,
        docs,
        bench_docs,
        chunk_dedup_words=15,
        order_buckets=8,
    )
    out = res.curated
    assert {"bucket", "pos", "split"} <= set(out.columns)
    rows = out.select("doc_id", "bucket", "pos").collect()
    assert len({r.doc_id for r in rows}) == len(rows)
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r.pos)
    for poss in by_bucket.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    assert res.stats["chunk_deduped"] == res.stats["neardup_removed"]  # docs kept
    # span dedup only removes text, never adds
    base_chars = dict(
        docs.select("doc_id", F.length("text").alias("n")).collect()
    )
    for r in out.select("doc_id", F.length("text").alias("n")).collect():
        assert r.n <= base_chars[r.doc_id]
