"""Property-based tests for the round-2b operators: fuzzy-join recall on
random corpora, chunk-dedup reconstruction, gap-fill conservation."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.dedup import dedup_repeated_chunks
from etl_s3_to_redshift_spark.operators.fuzzy import blocked_substitution_join
from etl_s3_to_redshift_spark.operators.temporal import resample_gapfill

ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10_000))
def test_fuzzy_join_recall_one_on_random_substitutions(spark, seed):
    """Every probe built by one random substitution must recover its
    source (pigeonhole recall is exactly 1.0), for random string lengths
    and random corruption positions."""
    rng = random.Random(seed)
    refs, probes = [], []
    for i in range(30):
        length = rng.randint(9, 24)
        s = "".join(rng.choice(ALPHA) for _ in range(length))
        refs.append((i, s))
        pos = rng.randrange(length)
        corrupted = s[:pos] + "?" + s[pos + 1 :]
        probes.append((i, corrupted))
    ref = spark.createDataFrame(refs, "rid long, name string")
    pr = spark.createDataFrame(probes, "pid long, probe string")
    got = blocked_substitution_join(
        pr, ref, "pid", "probe", "rid", "name", max_dist=1, n_segments=3
    )
    pairs = {(r.pid, r.rid) for r in got.collect()}
    missing = [i for i in range(30) if (i, i) not in pairs]
    assert missing == []


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10_000))
def test_chunk_dedup_identity_on_unique_corpora(spark, seed):
    """With globally-unique words no chunk repeats, so every document must
    reconstruct byte-identical (order preserved through the explode +
    collect_list round trip)."""
    rng = random.Random(seed)
    docs = []
    counter = 0
    for i in range(12):
        n = rng.randint(1, 70)
        words = [f"u{counter + j}" for j in range(n)]
        counter += n
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_repeated_chunks(df, chunk_words=15).collect()}
    for i, text in docs:
        assert got[i].clean_text == text
        assert got[i].n_kept == got[i].n_total


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10_000))
def test_gapfill_conserves_events_and_totals(spark, seed):
    """For random event streams: n_events and bucket_value sums equal the
    input's, the spine per key is dense/contiguous, and carried_value is
    never NULL."""
    rng = random.Random(seed)
    base = datetime(2024, 1, 1)
    rows = [
        (
            rng.randint(1, 4),
            base + timedelta(minutes=rng.randint(0, 60 * 72)),
            round(rng.uniform(0, 100), 2),
        )
        for _ in range(60)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = resample_gapfill(ev).collect()
    assert sum(r.n_events for r in out) == len(rows)
    got_total = round(sum(r.bucket_value for r in out), 2)
    want_total = round(sum(v for _, _, v in rows), 2)
    assert abs(got_total - want_total) < 0.02  # decimal-exact per bucket
    by_key = {}
    for r in out:
        by_key.setdefault(r.user_id, []).append(r.bucket_start)
        assert r.carried_value is not None
    for buckets in by_key.values():
        buckets.sort()
        for a, b in zip(buckets, buckets[1:]):
            assert (b - a) == timedelta(hours=1)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10_000))
def test_clique_components_equal_bruteforce_on_random_strings(spark, seed):
    """substitution_clique_components == brute-force (same-length ∧
    Hamming ≤ 1) pairs → union-find, on random corpora mixing lengths,
    duplicates, and near-collisions (small alphabet maximizes block
    sharing — the adversarial regime for the clique argument)."""
    import itertools
    import random

    from etl_s3_to_redshift_spark.operators.fuzzy import (
        substitution_clique_components,
    )

    rng = random.Random(seed)
    n_seg = rng.choice([4, 6, 8])
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(rng.randint(1, n_seg))))
        for i in range(rng.randint(2, 40))
    ]
    df = spark.createDataFrame(rows, "rec_id long, name string")
    got = {
        (r.vertex, r.component)
        for r in substitution_clique_components(
            df, "rec_id", "name", n_segments=n_seg
        ).collect()
    }
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        if len(sa) == len(sb) and sum(x != y for x, y in zip(sa, sb)) <= 1:
            ra, rb = find(ia), find(ib)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {(v, find(v)) for v in parent}
    assert got == want
