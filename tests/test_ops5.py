"""Edge-case tests for the round-3c operators (queries_ops5): PII scrub,
n-gram mining, linear interpolation, weighted sampling. The driver oracle
covers the happy path at sf0.01; these pin the corners the synthetic lake
never exercises.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.sampling import weighted_sample
from etl_s3_to_redshift_spark.operators.temporal import interpolate_gaps
from etl_s3_to_redshift_spark.operators.textops import ngram_top_terms, pii_scrub


# ---------------------------------------------------------------------------
# pii_scrub
# ---------------------------------------------------------------------------


def test_pii_scrub_counts_and_text(spark):
    rows = [
        (1, "mail a.b-c_d@ex-ample.co.uk and 10.0.0.1 plus +1-555-123-4567"),
        (2, "ssn 123-45-6789 then 999-88-7777 no other pii"),
        (3, "clean text with no personal data at all"),
        (4, "two mails x@y.io z@w.dev and ip 255.255.255.255"),
    ]
    out = {
        r["doc_id"]: r
        for r in pii_scrub(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    r1 = out[1]
    assert (r1["n_email"], r1["n_ssn"], r1["n_phone"], r1["n_ipv4"]) == (1, 0, 1, 1)
    assert r1["scrubbed"] == "mail <EMAIL> and <IPV4> plus <PHONE>"
    r2 = out[2]
    assert r2["n_ssn"] == 2
    assert r2["scrubbed"] == "ssn <SSN> then <SSN> no other pii"
    r3 = out[3]
    assert (r3["n_email"], r3["n_ssn"], r3["n_phone"], r3["n_ipv4"]) == (0, 0, 0, 0)
    assert r3["scrubbed"] == r3["text"]  # untouched text passes through
    r4 = out[4]
    assert r4["n_email"] == 2 and r4["n_ipv4"] == 1


def test_pii_scrub_no_double_count_across_rules(spark):
    # an SSN-shaped span inside an email's local part is consumed by the
    # email rule first and must NOT also count as an SSN; the IPv4-shaped
    # domain likewise
    rows = [(1, "odd 123-45-6789@10.0.0.1.example.com trailer")]
    r = pii_scrub(spark.createDataFrame(rows, ["doc_id", "text"])).collect()[0]
    assert r["n_email"] == 1
    assert r["n_ssn"] == 0 and r["n_ipv4"] == 0
    assert r["scrubbed"] == "odd <EMAIL> trailer"


# ---------------------------------------------------------------------------
# ngram_top_terms
# ---------------------------------------------------------------------------


def test_ngram_short_doc_guard_and_counts(spark):
    rows = [
        (1, "one"),  # 1 token -> zero bigrams (sequence(1,0) trap)
        (2, ""),  # no tokens at all
        (3, "a b a b a"),  # bigrams: ab, ba, ab, ba
        (4, "a b c"),  # ab, bc
    ]
    got = {
        r["ngram"]: r["n"]
        for r in ngram_top_terms(
            spark.createDataFrame(rows, ["doc_id", "text"]), k=10, n=2
        ).collect()
    }
    assert got == {"a b": 3, "b a": 2, "b c": 1}


def test_ngram_trigrams(spark):
    rows = [(1, "x y z w")]
    got = [
        (r["ngram"], r["n"])
        for r in ngram_top_terms(
            spark.createDataFrame(rows, ["doc_id", "text"]), k=10, n=3
        ).collect()
    ]
    assert got == [("x y z", 1), ("y z w", 1)]


# ---------------------------------------------------------------------------
# interpolate_gaps
# ---------------------------------------------------------------------------


def test_interpolate_linear_exact_values(spark):
    # key "a": observed at hours 0 (v=10) and 3 (v=40) -> hours 1,2 are
    # 20, 30; key "b": single observation -> spine is that one bucket
    rows = [
        ("a", "2024-01-01 00:15:00", 10.0),
        ("a", "2024-01-01 03:45:00", 40.0),
        ("b", "2024-01-01 05:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts_s", "value"]).select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    out = interpolate_gaps(df, key_col="k", ts_col="ts", value_col="value")
    got = {
        (r["k"], r["bucket_start"].hour): (r["n_events"], r["value"])
        for r in out.collect()
    }
    assert got[("a", 0)] == (1, 10.0)
    assert got[("a", 1)] == (0, 20.0)
    assert got[("a", 2)] == (0, 30.0)
    assert got[("a", 3)] == (1, 40.0)
    assert got[("b", 5)] == (1, 7.0)
    assert len(got) == 5


def test_interpolate_observed_buckets_sum_exactly(spark):
    # two events in one bucket -> observed value is the exact sum, not an
    # interpolation artifact
    rows = [
        ("a", "2024-01-01 00:10:00", 1.25),
        ("a", "2024-01-01 00:50:00", 2.50),
        ("a", "2024-01-01 02:00:00", 8.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts_s", "value"]).select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    got = {
        r["bucket_start"].hour: r["value"]
        for r in interpolate_gaps(df, key_col="k").collect()
    }
    assert got[0] == 3.75
    assert got[1] == pytest.approx((3.75 + 8.0) / 2)
    assert got[2] == 8.0


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_layout_free(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("w")
    )
    a = weighted_sample(df, n=100, weight_col="w")
    b = weighted_sample(df.repartition(13), n=100, weight_col="w")
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert ids_a == ids_b and len(ids_a) == 100


def test_weighted_sample_respects_weights(spark):
    # two strata: weight 100 vs weight 1 — the heavy stratum must dominate
    # the sample (E-S inclusion odds ~ w); also zero/negative weights are
    # excluded entirely
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, F.lit(100.0))
        .otherwise(F.lit(1.0))
        .alias("w"),
    )
    picked = weighted_sample(df, n=200, weight_col="w").collect()
    heavy = sum(1 for r in picked if r["doc_id"] < 500)
    assert heavy > 170  # binomial-ish; expected ~198, huge margin

    with_bad = df.withColumn(
        "w", F.when(F.col("doc_id") >= 990, F.lit(0.0)).otherwise(F.col("w"))
    )
    got = weighted_sample(with_bad, n=1000, weight_col="w").collect()
    assert len(got) == 990  # the 10 zero-weight rows never selected
    assert all(r["doc_id"] < 990 for r in got)


def test_weighted_sample_priority_formula(spark):
    # one row, weight 2: log_priority must equal ln(u)/2 for the md5-derived u
    import hashlib

    df = spark.createDataFrame([(42, 2.0)], ["doc_id", "w"])
    r = weighted_sample(df, n=1, weight_col="w").collect()[0]
    h = int(hashlib.md5(b"wsample:42").hexdigest()[:8], 16)
    u = (h + 1.0) / (16**8 + 1)
    assert r["log_priority"] == pytest.approx(round(math.log(u) / 2.0, 9), abs=1e-12)
