"""Dataset-curation operators: deterministic splits/samples/packing and
decontamination/repetition semantics (oracle parity is covered by
tools/check_oracle; these pin the properties the oracles can't express —
stability under repartitioning, fraction targets, packing invariants)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.functions.text import token_count_ws
from etl_s3_to_redshift_spark.operators.sampling import (
    hash_split,
    pack_sequences,
    stratified_sample,
)
from etl_s3_to_redshift_spark.operators.textops import decontaminate, repetition_scores
from etl_s3_to_redshift_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_ORACLE, "documents")


def test_hash_split_fractions_and_stability(docs):
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    got = {r.doc_id: r.split for r in hash_split(docs, w).select("doc_id", "split").collect()}
    n = len(got)
    frac = {s: sum(1 for v in got.values() if v == s) / n for s in w}
    # md5 is uniform: observed fractions within a loose binomial tolerance
    assert abs(frac["train"] - 0.9) < 0.05
    assert abs(frac["val"] - 0.05) < 0.03 and abs(frac["test"] - 0.05) < 0.03
    # partition layout must not change a single assignment
    reparted = {
        r.doc_id: r.split
        for r in hash_split(docs.repartition(13), w).select("doc_id", "split").collect()
    }
    assert reparted == got


def test_hash_split_is_per_row_expression(docs):
    plan = hash_split(docs, {"a": 0.5, "b": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: survives any input scale


def test_stratified_sample_size_and_stability(docs):
    s1 = stratified_sample(docs, ["lang"], k=20)
    per_lang = {r.lang: r.n for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per_lang.items():
        assert n == min(20, full[lang])
    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in stratified_sample(docs.repartition(7), ["lang"], k=20).select("doc_id").collect()}
    assert ids1 == ids2


def test_pack_sequences_bins_are_contiguous_and_budgeted(docs):
    budget = 2048
    sized = docs.select("doc_id", "lang", token_count_ws(F.col("text")).alias("n_tokens"))
    packed = pack_sequences(sized, budget=budget).collect()
    by_lang: dict[str, list] = {}
    for r in sorted(packed, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    for rows in by_lang.values():
        # bins are non-decreasing in doc order and start at 0
        bins = [r.bin_id for r in rows]
        assert bins[0] == 0 and all(a <= b for a, b in zip(bins, bins[1:]))
        # a doc STARTS in the bin its exclusive prefix sum falls into
        acc = 0
        for r in rows:
            assert r.bin_id == acc // budget
            acc += r.n_tokens


def test_decontaminate_finds_planted_leakage(spark, docs):
    # plant an exact copy of a benchmark doc in the corpus: every one of
    # its 5-grams is shared, so n_shared == its distinct 5-gram count
    bench = docs.filter(F.col("doc_id") < 20)
    leaked = bench.limit(1).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    corpus = docs.filter(F.col("doc_id") >= 20).unionByName(leaked)
    hits = {r.doc_id: r.n_shared_ngrams for r in decontaminate(corpus, bench, k=5).collect()}
    leaked_id = leaked.collect()[0].doc_id
    assert leaked_id in hits and hits[leaked_id] > 0
    # clean docs (no shared 5-grams) are absent from the result
    assert all(n > 0 for n in hits.values())


def test_repetition_scores_bounds_and_planted_repeat(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "all distinct words entirely here"), (3, "x x x x x x")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_scores(df).collect()}
    # doc 3: 4 identical 3-gram slots ("x x x") -> 3/4 duplicated; tokens 5/6
    assert got[3].dup_3gram_frac == 0.75
    assert round(got[3].dup_token_frac, 6) == round(1 - 1 / 6, 6)
    assert got[2].dup_3gram_frac == 0.0 and got[2].dup_token_frac == 0.0
    for r in got.values():
        assert 0.0 <= r.dup_3gram_frac <= 1.0 and 0.0 <= r.dup_token_frac <= 1.0
