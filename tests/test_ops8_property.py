"""Property-based tests for the round-6 curation operators: DSIR
weights match a pure-Python smoothed log-ratio model on arbitrary small
corpora, and n-gram novelty matches a brute-force first-occurrence scan."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# small closed vocabulary so random corpora actually share tokens
words = st.lists(st.sampled_from(["cat", "dog", "fish", "ox", "emu"]), min_size=1, max_size=8)
docs_strategy = st.lists(
    st.tuples(words, st.booleans()), min_size=1, max_size=6
)


def _py_dsir(docs):
    """docs: list of (tokens, is_target) → {doc_id: (n, avg_logratio)}."""
    from collections import Counter

    ct, ca = Counter(), Counter()
    for toks, tgt in docs:
        for t in toks:
            ca[t] += 1
            if tgt:
                ct[t] += 1
    nt, na, v = sum(ct.values()), sum(ca.values()), len(ca)
    out = {}
    for i, (toks, _) in enumerate(docs):
        s = sum(
            math.log((ct[t] + 1) / (nt + v)) - math.log((ca[t] + 1) / (na + v))
            for t in toks
        )
        out[i] = (len(toks), round(s / len(toks), 6) + 0.0)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=docs_strategy)
def test_dsir_matches_python_model(spark, docs):
    from etl_s3_to_redshift_spark.operators.textops import dsir_logratio_weights

    df = spark.createDataFrame(
        [(i, " ".join(toks), "en" if tgt else "xx") for i, (toks, tgt) in enumerate(docs)],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logratio"])
        for r in dsir_logratio_weights(df, F.col("lang") == "en").collect()
    }
    want = _py_dsir(docs)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) <= 1e-6, (i, got[i], want[i])


def _py_novelty(docs, n=3):
    """docs: list of token lists (doc_id = index) → {doc_id: (n_grams, rate)}."""
    grams_of = {}
    for i, toks in enumerate(docs):
        grams_of[i] = {tuple(toks[j : j + n]) for j in range(len(toks) - n + 1)}
    first = {}
    for i in sorted(grams_of):
        for g in grams_of[i]:
            first.setdefault(g, i)
    out = {}
    for i, gs in grams_of.items():
        if not gs:
            continue
        own = sum(1 for g in gs if first[g] == i)
        out[i] = (len(gs), round(own / len(gs), 6))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(words, min_size=1, max_size=6))
def test_novelty_matches_bruteforce(spark, docs):
    from etl_s3_to_redshift_spark.operators.textops import ngram_novelty_scores

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["novelty_rate"])
        for r in ngram_novelty_scores(df, n=3).collect()
    }
    want = _py_novelty(docs)
    assert got == want
