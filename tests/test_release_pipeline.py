"""Invariant tests for the composed release pipeline (plans/release.py):
scrub completeness, the exact-key-leakage-after-dedup theorem, audit
accounting, mixture bounds, and layout determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.dedup import exact_dedup
from etl_s3_to_redshift_spark.operators.sampling import hash_split, split_leakage
from etl_s3_to_redshift_spark.operators.textops import PII_RULES
from etl_s3_to_redshift_spark.plans.release import release_corpus
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def curated(spark):
    """A curated-ish corpus: real documents with synthetic PII planted in
    a third of them, exact-deduped and split — the release plan's input
    contract."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    with_pii = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" reach me at user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.test or +1-555-0101 ssn 123-45-6789 ip 10.1.2.3"),
            ),
        ).otherwise(F.col("text")),
    )
    manifest = exact_dedup(with_pii)
    deduped = with_pii.join(manifest.select("doc_id"), ["doc_id"], "left_semi")
    return hash_split(deduped, {"train": 0.8, "val": 0.1, "test": 0.1})


def test_release_scrubs_all_pii(curated):
    res = release_corpus(curated, mixture_budget=50)
    # audit trail counted what was planted
    n_pii_docs = curated.filter(F.col("doc_id") % 3 == 0).count()
    assert res.stats["n_email"] == n_pii_docs
    assert res.stats["n_ssn"] == n_pii_docs
    assert res.stats["n_phone"] == n_pii_docs
    assert res.stats["n_ipv4"] == n_pii_docs
    # and NOTHING pii-shaped survives in the released text
    txt = res.released.select("text")
    for _name, pat, _tok in PII_RULES:
        leftover = txt.filter(F.col("text").rlike(pat)).count()
        assert leftover == 0, _name


def test_exact_key_leakage_empty_after_exact_dedup(curated):
    # theorem: exact dedup keeps one doc per normalized content key, so
    # the exact-fingerprint leakage audit over any split of the deduped
    # corpus is empty by construction
    leak = split_leakage(
        curated, {"train": 0.8, "val": 0.1, "test": 0.1}, key_words=None
    )
    assert leak.count() == 0


def test_release_audits_and_mixture_bounds(curated):
    res = release_corpus(curated, mixture_budget=50)
    anon = res.anonymity.collect()[0]
    assert anon["n_combos"] >= 1
    assert 0 <= anon["n_violating_combos"] <= anon["n_combos"]
    assert anon["actual_k"] >= 1
    mix = res.mixture
    assert mix.count() <= 50
    # every selected row is from the train split's sources and within quota
    per_source = mix.groupBy("source").count().collect()
    for r in per_source:
        avail = (
            res.released.filter(
                (F.col("split") == "train") & (F.col("source") == r["source"])
            ).count()
        )
        assert r["count"] <= avail


def test_release_deterministic_across_layout(curated):
    a = release_corpus(curated, mixture_budget=40)
    b = release_corpus(curated.repartition(17), mixture_budget=40)
    ids_a = sorted(r["doc_id"] for r in a.mixture.collect())
    ids_b = sorted(r["doc_id"] for r in b.mixture.collect())
    assert ids_a == ids_b
    leak_a = sorted(r["content_key"] for r in a.leakage.collect())
    leak_b = sorted(r["content_key"] for r in b.leakage.collect())
    assert leak_a == leak_b


def test_leakage_audit_uses_shipped_split_column(curated):
    # plant a duplicate text pair and FORCE them into different splits via
    # an explicit split column no hash_split assignment would produce —
    # the audit must see the shipped split, not a re-derived hypothetical
    one = curated.limit(1)
    planted = one.withColumn("doc_id", F.col("doc_id") + 10_000_000).withColumn(
        "split", F.lit("train")
    ).unionByName(
        one.withColumn("doc_id", F.col("doc_id") + 20_000_000).withColumn(
            "split", F.lit("test")
        )
    )
    corpus = curated.unionByName(planted.select(*curated.columns))
    res = release_corpus(corpus)
    leak = res.leakage.collect()
    # the planted pair spans train+test under the SHIPPED split column
    assert any(
        r["n_splits"] >= 2 and "test" in r["splits"] and "train" in r["splits"]
        for r in leak
    ), leak


def test_release_empty_corpus_reports_zero_stats(curated):
    empty = curated.filter(F.lit(False))
    res = release_corpus(empty)
    assert res.stats["released"] == 0
    for name, _p, _t in PII_RULES:
        assert res.stats[f"n_{name}"] == 0
