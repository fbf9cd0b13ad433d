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
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.vertex: r.component for r in connected_components(df).collect()}
    assert got == union_find(edges)
    # the adaptive driver path and the distributed pointer-jumping loop
    # must be result-identical (same canonical min labels)
    dist = {r.vertex: r.component for r in connected_components(
        df, driver_edges_max=0).collect()}
    assert dist == got


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10_000))
def test_components_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(2, 40)
    edges = list({tuple(sorted(rng.sample(range(n), 2))) for _ in range(rng.randint(1, 60))})
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.vertex: r.component for r in connected_components(df).collect()}
    assert got == union_find(edges)
    # the adaptive driver path and the distributed pointer-jumping loop
    # must be result-identical (same canonical min labels)
    dist = {r.vertex: r.component for r in connected_components(
        df, driver_edges_max=0).collect()}
    assert dist == got


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
    # force the distributed loop: the adaptive driver path has no
    # iteration bound to test
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=3, driver_edges_max=0)
    # and enough rounds converges fine
    got = {r.vertex: r.component for r in connected_components(
        df, max_iter=40, driver_edges_max=0).collect()}
    assert set(got.values()) == {0}


def test_components_beyond_broadcast_cap_result_equal(spark, monkeypatch):
    """The >cap regime — sort-merge rounds against the bucketed edge
    layout, labels shuffling, edges never — must be result-identical to
    the label-broadcast regime (VERDICT r7 #7: the cap is a tunable
    memory bet, so BOTH sides of it need the same answer). Also pins
    the SPARK_GRAFT_CC_BROADCAST_VERTICES env knob as the cap source."""
    rng = random.Random(99)
    edges = list({tuple(sorted(rng.sample(range(80), 2))) for _ in range(150)})
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    want = union_find(edges)
    over_cap = {
        r.vertex: r.component
        for r in connected_components(
            df, driver_edges_max=0, broadcast_vertices_max=0
        ).collect()
    }
    assert over_cap == want
    under_cap = {
        r.vertex: r.component
        for r in connected_components(
            df, driver_edges_max=0, broadcast_vertices_max=10**9
        ).collect()
    }
    assert under_cap == want
    # env knob: default None reads SPARK_GRAFT_CC_BROADCAST_VERTICES
    monkeypatch.setenv("SPARK_GRAFT_CC_BROADCAST_VERTICES", "0")
    via_env = {
        r.vertex: r.component
        for r in connected_components(df, driver_edges_max=0).collect()
    }
    assert via_env == want


def test_cc_edge_layout_elides_per_round_exchange(spark):
    """The mechanism the >cap regime rides: a join between the bucketed
    edge table (written exactly the way connected_components lays it
    out) and a label frame plans NO Exchange above the edge scan — the
    bucketed layout IS the hash distribution, so per-round shuffle
    traffic is vertex-sized at any vertex count."""
    from pyspark.sql import functions as F

    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = spark.createDataFrame(
        [(i, i + 1) for i in range(1000)], "u long, v long"
    )
    name = "cc_edges_plan_pin_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        sym.repartition(n_buckets, "v")
        .write.bucketBy(n_buckets, "v")
        .sortBy("v")
        .mode("overwrite")
        .saveAsTable(name)
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = spark.table(name)
        labels = spark.range(1000).select(
            F.col("id").alias("v"), F.col("id").alias("component")
        )
        j = edges.join(labels, "v").select(
            F.col("u").alias("vertex"), "component"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # exactly one Exchange: the label side; the bucketed scan feeds
        # the join directly (and, one file per bucket, pre-sorted)
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_components_topology_adaptive_switch_result_equal(spark, monkeypatch):
    """The online regime switch (VERDICT r9: broadcast rounds → bucketed
    SMJ when labels are still changing after switch_rounds) must be
    result-identical to staying on the broadcast regime, on exactly the
    high-diameter chain topology that triggers it."""
    chain = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    want = union_find(chain)
    # a chain's avg degree (<4) triggers the bucketed pre-signal; force
    # the broadcast start here so the ONLINE switch itself is exercised
    monkeypatch.setenv("SPARK_GRAFT_CC_BCAST_MIN_DEGREE", "0")
    switched = {
        r.vertex: r.component
        for r in connected_components(
            df, driver_edges_max=0, switch_rounds=1, max_iter=40
        ).collect()
    }
    stay_bcast = {
        r.vertex: r.component
        for r in connected_components(
            df, driver_edges_max=0, switch_rounds=10**6, max_iter=40
        ).collect()
    }
    assert switched == stay_bcast == want
    # default None reads the SPARK_GRAFT_CC_SWITCH_ROUNDS env knob
    monkeypatch.setenv("SPARK_GRAFT_CC_SWITCH_ROUNDS", "1")
    via_env = {
        r.vertex: r.component
        for r in connected_components(
            df, driver_edges_max=0, max_iter=40
        ).collect()
    }
    assert via_env == want
    # and the degree PRE-SIGNAL path (default env): chain-like degree
    # buckets from round 0, result-identical
    monkeypatch.delenv("SPARK_GRAFT_CC_BCAST_MIN_DEGREE")
    monkeypatch.delenv("SPARK_GRAFT_CC_SWITCH_ROUNDS")
    pre = {
        r.vertex: r.component
        for r in connected_components(
            df, driver_edges_max=0, max_iter=40
        ).collect()
    }
    assert pre == want


def test_concurrent_cc_calls_do_not_interfere(spark):
    """The ADVICE r9 scenario made live: two connected_components calls
    racing in ONE session, both on the bucketed regime (low-degree
    chains trigger the pre-signal), both creating cc_edges_* scratch
    tables and both running the entry sweep — neither may drop the
    other's live scratch mid-loop, and both labelings must be exact."""
    import threading

    chain_a = [(i, i + 1) for i in range(25)]
    chain_b = [(1000 + i, 1001 + i) for i in range(25)]
    results: dict = {}
    errors: list = []

    def run(name, edges):
        try:
            df = spark.createDataFrame(edges, "id_a long, id_b long")
            results[name] = {
                r.vertex: r.component
                for r in connected_components(
                    df, driver_edges_max=0, max_iter=40
                ).collect()
            }
        except Exception as e:  # noqa: BLE001 - surface to the assert
            errors.append((name, repr(e)))

    threads = [
        threading.Thread(target=run, args=("a", chain_a)),
        threading.Thread(target=run, args=("b", chain_b)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert results["a"] == union_find(chain_a)
    assert results["b"] == union_find(chain_b)


def test_cc_scratch_sweep_spares_live_app_tables(spark):
    """The orphan sweep must drop dead-app leftovers (including pre-r10
    names with no app token) but NEVER a table embedding the CURRENT
    applicationId — a concurrent call's live scratch (ADVICE r9) — and
    must skip temp views that happen to match the prefix."""
    from etl_s3_to_redshift_spark.operators import components as C

    token = C._app_token(spark)
    live = f"cc_edges_{token}_deadbeef0001"
    orphan = "cc_edges_aabbccddeeff"  # pre-r10 format: no app token
    one = spark.createDataFrame([(1,)], "x long")
    one.write.mode("overwrite").saveAsTable(live)
    one.write.mode("overwrite").saveAsTable(orphan)
    one.createOrReplaceTempView("cc_edges_tempview")
    try:
        C._sweep_orphan_edge_tables(spark)
        names = {t.name for t in spark.catalog.listTables()}
        assert live in names, "live-app scratch must survive the sweep"
        assert orphan not in names, "dead-app orphan must be swept"
        assert "cc_edges_tempview" in names, "temp views must be skipped"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {live}")
        spark.catalog.dropTempView("cc_edges_tempview")


def test_incremental_components_equals_full_recompute(spark):
    """For random edge sets split into batches, updating batch 1's
    labeling with batch 2's edges must equal CC over the union — across
    merge topologies (new-new edges, new-old bridges, old-old intra- and
    inter-component links)."""
    import random

    from etl_s3_to_redshift_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    rng = random.Random(7)
    for trial in range(4):
        n = 60
        all_edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(20, 50))
            }
        )
        cut = rng.randint(0, len(all_edges))
        first, second = all_edges[:cut], all_edges[cut:]
        if not first or not second:
            continue
        e1 = spark.createDataFrame(first, "id_a long, id_b long")
        e2 = spark.createDataFrame(second, "id_a long, id_b long")
        full = connected_components(
            spark.createDataFrame(all_edges, "id_a long, id_b long")
        )
        inc = incremental_components(connected_components(e1), e2)
        f = {(r.vertex, r.component) for r in full.collect()}
        i = {(r.vertex, r.component) for r in inc.collect()}
        assert f == i, f"trial {trial}: {sorted(f ^ i)}"


def test_incremental_components_untouched_skip_iteration(spark):
    """A batch touching one component must pass every other component
    through untouched (value check: labels identical, including when the
    new edge merges two old components)."""
    from etl_s3_to_redshift_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    base = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)], "id_a long, id_b long"
    )
    labeling = connected_components(base)
    # one edge bridging components {10,11} and {20,21}; {1,2,3} and
    # {30,31} must be byte-identical in the output
    inc = incremental_components(
        labeling, spark.createDataFrame([(11, 20)], "id_a long, id_b long")
    )
    got = {(r.vertex, r.component) for r in inc.collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10), (20, 10), (21, 10),
        (30, 30), (31, 30),
    }


def test_components_empty_pair_list(spark):
    """Zero edges must return an empty labeling immediately, not burn
    max_iter rounds and raise (the decimal-sum convergence check sees
    NULL == NULL forever on an empty frame — ADVICE r5). Reachable from
    dedup_groups / incremental whenever no near-dup pairs are found."""
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0
    groups = dedup_groups(empty)
    assert groups.count() == 0
    assert set(groups.columns) == {"component", "member", "is_keeper"}


def test_incremental_components_distributed_path_parity(spark):
    """The incremental merge must be exact when the recomputation runs
    the DISTRIBUTED pointer-jumping loop (driver_edges_max=0), not just
    the driver union-find fast path."""
    from etl_s3_to_redshift_spark.operators.components import (
        incremental_components,
    )

    base = [(1, 2), (2, 3), (10, 11), (20, 21)]
    newe = [(3, 10), (30, 31)]
    e1 = spark.createDataFrame(base, "id_a long, id_b long")
    e2 = spark.createDataFrame(newe, "id_a long, id_b long")
    full = {
        (r.vertex, r.component)
        for r in connected_components(
            spark.createDataFrame(base + newe, "id_a long, id_b long"),
            driver_edges_max=0,
        ).collect()
    }
    inc = {
        (r.vertex, r.component)
        for r in incremental_components(
            connected_components(e1, driver_edges_max=0),
            e2,
            driver_edges_max=0,
        ).collect()
    }
    want = set(union_find(base + newe).items())
    assert full == want and inc == want


def test_components_string_vertex_ids(spark):
    """Both CC paths must handle non-numeric vertex ids (dedup keys are
    sometimes content hashes/URIs): min-label = lexicographic min."""
    edges = [("b", "a"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    want = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    fast = {r.vertex: r.component for r in connected_components(df).collect()}
    dist = {
        r.vertex: r.component
        for r in connected_components(df, driver_edges_max=0).collect()
    }
    assert fast == dist == want
