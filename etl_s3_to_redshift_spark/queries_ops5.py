"""Round-3c operator-coverage queries: PII scrubbing, linear-interpolation
gap fill, weighted sampling, and n-gram mining — each with an exact DuckDB
oracle.

These extend the curation surface (SURVEY §2c): PII redaction is a
mandatory pre-training compliance pass; linear interpolation is the
rate-metric companion to the forward-fill in ``resample_gapfill``;
Efraimidis–Spirakis weighted sampling is the length/quality-proportional
subsetting step between dedup and mixture assembly; bigram top-k is the
collocation/boilerplate-phrase miner next to ``vocab_top_terms``.

Exactness rules follow queries.py: regexes use only the constructs Java
regex (Spark) and RE2 (DuckDB) execute identically (character classes,
bounded repetition, ``\\b``); hash-derived uniforms come from the same
md5 prefix on both engines; ``ln``/division doubles are rounded 6–9 dp,
many orders above any libm drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.sampling import weighted_sample
from etl_s3_to_redshift_spark.operators.temporal import interpolate_gaps
from etl_s3_to_redshift_spark.operators.textops import (
    PII_RULES,
    ngram_top_terms,
    pii_scrub,
)
from etl_s3_to_redshift_spark.queries import _t, register

# ---------------------------------------------------------------------------
# PII scrubbing (compliance pass before any corpus release)
# ---------------------------------------------------------------------------

# The synthetic documents are digit-free word soup, so the query plants
# deterministic PII derived from doc_id — identically on both engines —
# and scrubs it: every row carries one email/SSN/phone/IPv4, every third
# row a second email. The oracle twin runs the same regex chain in
# DuckDB, so the value hash covers both the match COUNTS and the full
# redacted text.
_E_PAT, _S_PAT, _P_PAT, _I_PAT = (p for _n, p, _tok in PII_RULES)

_PII_ORACLE = f"""
    WITH synth AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com'
                    || CASE WHEN doc_id % 3 = 0
                            THEN ' cc bot' || CAST(doc_id AS VARCHAR) || '@test.org'
                            ELSE '' END
                    || ' ph +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                    || '.' || CAST((doc_id * 13) % 256 AS VARCHAR) AS t
        FROM documents
    ),
    s1 AS (
        SELECT doc_id,
               len(regexp_extract_all(t, '{_E_PAT}')) AS n_email,
               regexp_replace(t, '{_E_PAT}', '<EMAIL>', 'g') AS t
        FROM synth
    ),
    s2 AS (
        SELECT doc_id, n_email,
               len(regexp_extract_all(t, '{_S_PAT}')) AS n_ssn,
               regexp_replace(t, '{_S_PAT}', '<SSN>', 'g') AS t
        FROM s1
    ),
    s3 AS (
        SELECT doc_id, n_email, n_ssn,
               len(regexp_extract_all(t, '{_P_PAT}')) AS n_phone,
               regexp_replace(t, '{_P_PAT}', '<PHONE>', 'g') AS t
        FROM s2
    ),
    s4 AS (
        SELECT doc_id, n_email, n_ssn, n_phone,
               len(regexp_extract_all(t, '{_I_PAT}')) AS n_ipv4,
               regexp_replace(t, '{_I_PAT}', '<IPV4>', 'g') AS t
        FROM s3
    )
    SELECT doc_id, n_email, n_ssn, n_phone, n_ipv4, t AS scrubbed FROM s4
"""


@register(
    "text_pii_scrub",
    _PII_ORACLE,
    doc=(
        "PII redaction pass (operators/textops.pii_scrub): sequential "
        "regex scrub of emails, SSNs, phone numbers, and IPv4 addresses "
        "with per-type match counts taken on the pre-replacement text of "
        "each stage (no double counting across overlapping shapes). The "
        "synthetic corpus is digit-free, so the query plants "
        "deterministic doc_id-derived PII identically on both engines. "
        "Scale: the whole pass is one narrow codegen projection inside "
        "the scan — zero shuffles, zero UDFs; patterns restricted to the "
        "Java-regex/RE2 common subset."
    ),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    synth = _t(spark, sf_dir, "documents").select(
        d,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            d.cast("string"),
            F.lit("@example.com"),
            F.when(
                d % 3 == 0,
                F.concat(F.lit(" cc bot"), d.cast("string"), F.lit("@test.org")),
            ).otherwise(F.lit("")),
            F.lit(" ph +1-555-"),
            F.lpad(F.pmod(d, F.lit(10000)).cast("string"), 4, "0"),
            F.lit(" ssn 123-45-"),
            F.lpad(F.pmod(d, F.lit(10000)).cast("string"), 4, "0"),
            F.lit(" ip 10."),
            F.pmod(d, F.lit(256)).cast("string"),
            F.lit("."),
            F.pmod(d * 7, F.lit(256)).cast("string"),
            F.lit("."),
            F.pmod(d * 13, F.lit(256)).cast("string"),
        ).alias("text"),
    )
    return pii_scrub(synth, text_col="text", out_col="scrubbed").select(
        "doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4", "scrubbed"
    )


# ---------------------------------------------------------------------------
# Linear-interpolation gap fill (time-series regularization)
# ---------------------------------------------------------------------------


@register(
    "ts_interpolate_linear",
    """
    WITH hourly AS (
        SELECT event_type,
               CAST(floor(CAST(epoch(ts) AS DOUBLE) / 3600) AS BIGINT) * 3600
                   AS bucket_epoch,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(bucket_epoch) AS b0, max(bucket_epoch) AS b1
        FROM hourly GROUP BY 1
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(b0, b1, 3600)) AS bucket_epoch
        FROM bounds
    ),
    grid AS (
        SELECT s.event_type, s.bucket_epoch, h.n, h.v
        FROM spine s LEFT JOIN hourly h USING (event_type, bucket_epoch)
    ),
    filled AS (
        SELECT event_type, bucket_epoch, coalesce(n, 0) AS n_events, v,
               last_value(v IGNORE NULLS) OVER wb AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN bucket_epoch END
                          IGNORE NULLS) OVER wb AS pt,
               first_value(v IGNORE NULLS) OVER wf AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN bucket_epoch END
                           IGNORE NULLS) OVER wf AS nt
        FROM grid
        WINDOW
          wb AS (PARTITION BY event_type ORDER BY bucket_epoch
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY event_type ORDER BY bucket_epoch
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket_epoch, n_events,
           round(CASE WHEN v IS NOT NULL THEN v
                      ELSE pv + (nv - pv) * CAST(bucket_epoch - pt AS DOUBLE)
                                          / CAST(nt - pt AS DOUBLE)
                 END, 6) AS value
    FROM filled
    """,
    doc=(
        "Linear-interpolation gap fill over the hourly per-type grid "
        "(operators/temporal.interpolate_gaps): empty buckets get the "
        "straight line between the nearest observed buckets on either "
        "side — the rate-metric companion to resample_gapfill's "
        "forward fill. One bucket-aggregate shuffle, a data-side "
        "sequence+explode spine, and ONE per-key window sort computing "
        "both neighbors via mirrored frames; no spine-vs-observation "
        "self-join, nothing driver-materialized."
    ),
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = interpolate_gaps(
        _t(spark, sf_dir, "events"),
        key_col="event_type",
        ts_col="ts",
        value_col="value",
        step_hours=1,
    )
    return out.select(
        "event_type",
        F.unix_timestamp("bucket_start").alias("bucket_epoch"),
        "n_events",
        "value",
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis–Spirakis priorities)
# ---------------------------------------------------------------------------

_WSAMPLE_N = 150


@register(
    "data_weighted_sample",
    f"""
    WITH p AS (
        SELECT doc_id,
               CAST(n_chars AS DOUBLE) AS weight,
               round(
                   ln((CAST(('0x' || substring(
                           md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8)
                       )::BIGINT AS DOUBLE) + 1.0) / 4294967297.0)
                   / CAST(n_chars AS DOUBLE), 9) AS log_priority
        FROM documents
        WHERE n_chars > 0
    )
    SELECT doc_id, weight, log_priority
    FROM p ORDER BY log_priority DESC, doc_id ASC LIMIT {_WSAMPLE_N}
    """,
    doc=(
        "Weighted sampling without replacement "
        "(operators/sampling.weighted_sample): Efraimidis–Spirakis "
        "priority ln(u)/w with u derived from md5(doc_id) — "
        "content-addressed, RNG-free, so incremental re-runs keep every "
        "historical row's priority. Inclusion odds proportional to "
        "n_chars (length-weighted corpus subsetting). Scale: priority "
        "is a narrow in-scan projection; selection is "
        "TakeOrderedAndProject (per-task heaps), no corpus shuffle. "
        "9 dp rounding + doc_id tiebreak makes the boundary exact "
        "cross-engine."
    ),
)
def data_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample(
        _t(spark, sf_dir, "documents"),
        n=_WSAMPLE_N,
        weight_col="n_chars",
        id_col="doc_id",
        seed="wsample",
    )


# ---------------------------------------------------------------------------
# Bigram top-k (collocation / boilerplate phrase mining)
# ---------------------------------------------------------------------------


@register(
    "text_bigram_topk",
    """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           x -> len(x) >= 1) AS t
        FROM documents
    ),
    grams AS (
        SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS ngram
        FROM toks
    )
    SELECT ngram, count(*) AS n
    FROM grams GROUP BY ngram
    ORDER BY n DESC, ngram ASC
    LIMIT 50
    """,
    doc=(
        "Corpus top-50 bigrams with counts "
        "(operators/textops.ngram_top_terms): collocation mining / "
        "boilerplate-phrase detection next to the unigram "
        "vocab_top_terms. Bigrams are built INSIDE the token array via "
        "a chained zip of shifted slices — no posexplode self-join, no per-doc "
        "window sort; shuffle carries vocabulary-sized partials and the "
        "top-k is a TakeOrderedAndProject heap. Total tie order makes "
        "the k-boundary deterministic."
    ),
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_top_terms(_t(spark, sf_dir, "documents"), k=50, n=2)
