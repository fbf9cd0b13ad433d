"""Property-based tests for the round-3c/3d operators: interpolation
stays inside its neighbor envelope, PII scrub counts equal replacements,
containment dominates Jaccard, and the n-gram builder matches a pure-
Python reference on random token streams."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),  # key
        st.integers(0, 48),  # hour offset
        st.integers(1, 10000).map(lambda c: c / 100.0),  # exact 2-dp values
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(stream=events_strategy)
def test_interpolate_envelope_and_density(spark, stream):
    from etl_s3_to_redshift_spark.operators.temporal import interpolate_gaps

    df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(hours=h, minutes=7), float(v)) for k, h, v in stream],
        "k long, ts timestamp, value double",
    )
    rows = interpolate_gaps(df, key_col="k").collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    for key_rows in by_key.values():
        key_rows.sort(key=lambda r: r.bucket_start)
        # dense hourly spine with no gaps
        for prev, cur in zip(key_rows, key_rows[1:]):
            assert (cur.bucket_start - prev.bucket_start).total_seconds() == 3600
        observed = [r.value for r in key_rows if r.n_events > 0]
        lo, hi = min(observed), max(observed)
        for r in key_rows:
            # every value (observed or interpolated) lies inside the
            # observed envelope — linear interpolation cannot overshoot
            assert lo - 1e-6 <= r.value <= hi + 1e-6
        # spine endpoints are observed buckets
        assert key_rows[0].n_events > 0 and key_rows[-1].n_events > 0


texts = st.lists(
    st.text(alphabet="abc @.-0123456789", min_size=0, max_size=60),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(bodies=texts)
def test_pii_scrub_count_equals_replacements(spark, bodies):
    import re

    from etl_s3_to_redshift_spark.operators.textops import PII_RULES, pii_scrub

    df = spark.createDataFrame(list(enumerate(bodies)), ["doc_id", "text"])
    out = pii_scrub(df).collect()
    for r in out:
        # replay the scrub in Python; counts and final text must agree
        cur = r["text"]
        for name, pat, token in PII_RULES:
            assert r[f"n_{name}"] == len(re.findall(pat, cur)), (name, cur)
            cur = re.sub(pat, token, cur)
        assert r["scrubbed"] == cur
        # idempotence: scrubbing scrubbed text finds nothing
        for _name, pat, _token in PII_RULES:
            assert not re.search(pat, r["scrubbed"].replace("<EMAIL>", "").replace(
                "<SSN>", "").replace("<PHONE>", "").replace("<IPV4>", ""))


docs_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12).map(
        " ".join
    ),
    min_size=2,
    max_size=8,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(bodies=docs_strategy)
def test_containment_dominates_jaccard(spark, bodies):
    from etl_s3_to_redshift_spark.operators.dedup import containment_pairs, jaccard_pairs

    df = spark.createDataFrame(list(enumerate(bodies)), ["doc_id", "text"])
    cont = {
        frozenset((r.id_small, r.id_big)): r.containment
        for r in containment_pairs(df, threshold=0.0).collect()
    }
    jac = {
        frozenset((r.id_a, r.id_b)): r.jaccard
        for r in jaccard_pairs(df, threshold=0.0).collect()
    }
    # same candidate pairs (both are the co-shingle inverted index), and
    # containment >= jaccard always (divides by the smaller set)
    assert set(cont) == set(jac)
    for pair, c in cont.items():
        assert c >= jac[pair] - 1e-9


token_streams = st.lists(
    st.lists(st.sampled_from(list("abcde")), min_size=0, max_size=9).map(
        lambda ws: " ".join(ws)
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(bodies=token_streams, n=st.integers(2, 4))
def test_ngram_matches_python_reference(spark, bodies, n):
    from collections import Counter

    from etl_s3_to_redshift_spark.operators.textops import ngram_top_terms

    df = spark.createDataFrame(list(enumerate(bodies)), ["doc_id", "text"])
    got = {
        r["ngram"]: r["n"]
        for r in ngram_top_terms(df, k=1000, n=n).collect()
    }
    expect: Counter = Counter()
    for body in bodies:
        toks = [t for t in body.lower().split() if t]
        for i in range(len(toks) - n + 1):
            expect[" ".join(toks[i : i + n])] += 1
    assert got == dict(expect)
