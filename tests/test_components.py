"""Connected components vs a pure-Python union-find oracle, on fixed and
random graphs, plus the end-to-end near-dup grouping flow."""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_s3_to_redshift_spark.operators.components import connected_components, dedup_groups
from etl_s3_to_redshift_spark.operators.dedup import jaccard_pairs
from etl_s3_to_redshift_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min vertex per component
    comp = {}
    for v in list(parent):
        comp[v] = find(v)
    return comp


def test_components_chain_and_clique(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    got = {r.vertex: r.component for r in connected_components(
        spark.createDataFrame(edges, "id_a long, id_b long")).collect()}
    assert got == union_find(edges)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10_000))
def test_components_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(2, 40)
    edges = list({tuple(sorted(rng.sample(range(n), 2))) for _ in range(rng.randint(1, 60))})
    got = {r.vertex: r.component for r in connected_components(
        spark.createDataFrame(edges, "id_a long, id_b long")).collect()}
    assert got == union_find(edges)


def test_dedup_groups_end_to_end(spark):
    """pairs → groups over the planted near-dups: every member maps to the
    component minimum; keepers are exactly the component minima."""
    docs = load_table(spark, SF_ORACLE, "documents")
    pairs = jaccard_pairs(docs, 0.8)
    groups = dedup_groups(pairs).collect()
    expect = union_find([(r.id_a, r.id_b) for r in pairs.collect()])
    got = {r.member: r.component for r in groups}
    assert got == expect
    keepers = {r.member for r in groups if r.is_keeper}
    assert keepers == set(expect.values())


def test_components_raises_on_nonconvergence(spark):
    """A path graph of diameter > max_iter must raise, not return a
    silently-truncated labeling."""
    chain = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=3)
    # and enough rounds converges fine
    got = {r.vertex: r.component for r in connected_components(df, max_iter=40).collect()}
    assert set(got.values()) == {0}
