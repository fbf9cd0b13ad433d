"""Property-based dedup test: MinHash-LSH must find planted near-duplicates
in randomly generated corpora (not just the driver testdata)."""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_s3_to_redshift_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs

VOCAB = [f"w{i}" for i in range(50)]


def make_corpus(seed: int, n_docs: int, n_dupes: int):
    """Random word-soup docs + near-dup copies (one word substituted)."""
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(20, 40))]
        docs.append((i, " ".join(words)))
    planted = []
    for j in range(n_dupes):
        src_id, src_text = docs[rng.randrange(n_docs)]
        words = src_text.split()
        words[rng.randrange(len(words))] = rng.choice(VOCAB)
        dup_id = n_docs + j
        docs.append((dup_id, " ".join(words)))
        planted.append(tuple(sorted((src_id, dup_id))))
    return docs, planted


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10_000))
def test_minhash_lsh_equals_exact_on_random_corpora(spark, seed):
    docs, planted = make_corpus(seed, n_docs=30, n_dupes=5)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    threshold = 0.5
    exact = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in jaccard_pairs(df, threshold).collect()
    }
    lsh = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in minhash_lsh_pairs(df, threshold, num_hashes=32, bands=16).collect()
    }
    # verified-LSH equals brute force (catch prob at J>=0.5 with r=2,b=16
    # is 1-(1-0.25)^16 ≈ 0.99; one-word-substituted 20-40-word docs sit at
    # J>=0.8 where it is ≈1-1e-7)
    assert lsh == exact
    # and the planted near-dups are found
    found = set(exact)
    for pair in planted:
        assert pair in found
