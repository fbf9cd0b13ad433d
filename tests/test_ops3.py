"""Round-3 operator tests: incremental rollup maintenance (mergeable
partials), value-RANGE frames, grouping sets, regression aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_merge_rollups_associative_and_exact(spark):
    """Any merge tree over any batch split must equal the one-shot
    aggregate exactly — the contract that lets partials append forever
    without a fact-history rescan."""
    from etl_s3_to_redshift_spark.operators.incremental import (
        finalize_rollup,
        merge_rollups,
        partial_rollup,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        "event_type",
        "value",
        "event_id",
    )
    keys = ["day", "event_type"]
    full = finalize_rollup(partial_rollup(ev.drop("event_id"), keys))

    # three disjoint batches by id residue — a stand-in for three ingest days
    parts = [
        partial_rollup(ev.filter(F.col("event_id") % 3 == i).drop("event_id"), keys)
        for i in range(3)
    ]
    flat = finalize_rollup(merge_rollups(*parts))
    nested = finalize_rollup(merge_rollups(merge_rollups(parts[0], parts[1]), parts[2]))
    assert _canon(full) == _canon(flat) == _canon(nested)

    # merging a single partial is the identity (re-folding a compacted
    # table must not change it)
    again = finalize_rollup(merge_rollups(merge_rollups(*parts)))
    assert _canon(again) == _canon(full)


def test_merge_rollups_rejects_empty():
    import pytest as _pytest

    from etl_s3_to_redshift_spark.operators.incremental import merge_rollups

    with _pytest.raises(ValueError, match="at least one"):
        merge_rollups()


def test_w4_range_frames_single_shuffle(spark):
    """All three RANGE frames share one partition key, so the physical
    plan must contain exactly one shuffle (plus the scan) — frames are
    free once the per-key sort exists."""
    from etl_s3_to_redshift_spark.queries_ops3 import w4_value_range_frames

    df = w4_value_range_frames(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan

    # tie-stability: rows with equal (custkey, price) must report equal
    # frame aggregates
    rows = df.collect()
    seen = {}
    for r in rows:
        key = (r.customer_id, r.total_price)
        frame = (r.n_within_5k, r.sum_within_5k, r.n_cheaper_half)
        assert seen.setdefault(key, frame) == frame


def test_grouping_sets_consistency(spark):
    """Each 1-D breakdown and the grand total must each sum to the table
    row count, and grouping flags must identify the set shape."""
    from etl_s3_to_redshift_spark.queries_ops3 import grouping_sets_orders

    rows = grouping_sets_orders(spark, SF_SMOKE).collect()
    n_orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()

    by_status = [r for r in rows if r.g_status == 0 and r.g_priority == 1]
    by_prio = [r for r in rows if r.g_status == 1 and r.g_priority == 0]
    grand = [r for r in rows if r.g_status == 1 and r.g_priority == 1]
    assert len(grand) == 1 and grand[0].n_orders == n_orders
    assert sum(r.n_orders for r in by_status) == n_orders
    assert sum(r.n_orders for r in by_prio) == n_orders
    assert len(by_status) + len(by_prio) + 1 == len(rows)
    # the cross cell (status, priority) must NOT exist
    assert not [r for r in rows if r.g_status == 0 and r.g_priority == 0]


def test_regression_aggs_match_numpy(spark):
    """Spark's regr_slope/intercept/corr must agree with an independent
    numpy least-squares fit on the same rows."""
    import numpy as np

    from etl_s3_to_redshift_spark.queries_ops3 import agg_corr_regression

    got = {r.flag: r for r in agg_corr_regression(spark, SF_SMOKE).collect()}
    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append((r.l_quantity, r.l_extendedprice))
    for flag, pts in by_flag.items():
        x = np.array([p[0] for p in pts], dtype=np.float64)
        y = np.array([p[1] for p in pts], dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got[flag].slope - slope) < 1e-2, flag
        assert abs(got[flag].intercept - intercept) < 1.0, flag
        assert abs(got[flag].corr_price_qty - np.corrcoef(x, y)[0, 1]) < 1e-4, flag


def test_round3_plans_are_scale_shaped(spark):
    """Plan pins for the round-3 queries: partial aggregation before the
    exchange for the statistics family, Expand (not N scans) for grouping
    sets, and filter pushdown to the parquet scan for the incremental
    rollup's batch splits."""
    from etl_s3_to_redshift_spark.queries_ops3 import (
        agg_corr_regression,
        grouping_sets_orders,
        rollup_incremental_merge,
    )

    corr_plan = agg_corr_regression(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    # algebraic moments: map-side partial -> one exchange -> final
    assert corr_plan.count("Exchange") == 1, corr_plan
    assert "partial_corr" in corr_plan or "HashAggregate" in corr_plan

    gs_plan = grouping_sets_orders(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    # GROUPING SETS expands rows once; it must not rescan orders per set
    assert gs_plan.count("Scan parquet") == 1, gs_plan
    assert "Expand" in gs_plan
    assert gs_plan.count("Exchange") == 1, gs_plan

    ri = rollup_incremental_merge(spark, SF_SMOKE)
    optimized = ri._jdf.queryExecution().optimizedPlan().toString()
    executed = ri._jdf.queryExecution().executedPlan().toString()
    # each batch branch pushes its ts predicate into its scan
    assert executed.count("PushedFilters: [IsNotNull(ts), LessThan(ts") == 1, executed
    assert executed.count("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts") == 1, executed
    # both the per-batch partials and the merge run as hash aggregates
    assert executed.count("HashAggregate") >= 4, executed
    assert "Generate" not in optimized  # no accidental explode


def test_streaming_rollup_partials_exactly_once(spark, tmp_path):
    """The foreachBatch partials sink must (a) fold to exactly the batch
    one-shot aggregate after the stream drains, (b) be idempotent when a
    micro-batch replays (same batch_id overwrites the same directory),
    and (c) survive compaction invisibly."""
    from etl_s3_to_redshift_spark.operators.incremental import (
        finalize_rollup,
        partial_rollup,
    )
    from etl_s3_to_redshift_spark.sources.tables import load_table
    from etl_s3_to_redshift_spark.streaming.rollup import (
        compact_partials,
        read_rollup,
        start_rollup_stream,
        write_batch_partial,
    )

    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "value")
    src = str(tmp_path / "src")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    partials = str(tmp_path / "partials")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .parquet(src)
    )
    q = start_rollup_stream(
        stream, partials, ["event_type"], str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    expect = _canon(finalize_rollup(partial_rollup(ev, ["event_type"])))
    got = _canon(read_rollup(spark, partials))
    assert got == expect

    # replay: the driver re-delivers a failed micro-batch (same raw rows)
    # under the SAME batch id — the overwrite hits the same directory, so
    # the fold sees exactly one contribution for that id and the rollup
    # is unchanged. Simulated with a fresh batch id written twice.
    import os

    extra = ev.limit(200)
    write_batch_partial(extra, 99, partials, ["event_type"])
    once = _canon(read_rollup(spark, partials))
    write_batch_partial(extra, 99, partials, ["event_type"])
    n_dirs = len([d for d in os.listdir(partials) if d.startswith("batch_id=")])
    roll2 = read_rollup(spark, partials)
    assert _canon(roll2) == once != expect

    compacted = str(tmp_path / "compacted")
    compact_partials(spark, partials, compacted)
    from etl_s3_to_redshift_spark.operators.incremental import merge_rollups

    folded = _canon(finalize_rollup(merge_rollups(spark.read.parquet(compacted))))
    assert folded == _canon(roll2)
    assert n_dirs >= 2


def test_pq_codebooks_layout_independent(spark):
    """Codebook training samples by content hash, so repartitioned or
    re-sorted lakes yield byte-identical codebooks (the bare .limit()
    sample depended on file order — one shard's distribution)."""
    import numpy as np

    from etl_s3_to_redshift_spark.operators.similarity import train_pq_codebooks
    from tests.conftest import SF_ORACLE

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    b1 = train_pq_codebooks(emb, dim=64, m=8, n_codes=16)
    b2 = train_pq_codebooks(emb.repartition(13), dim=64, m=8, n_codes=16)
    b3 = train_pq_codebooks(
        emb.repartition(3).sortWithinPartitions("label"), dim=64, m=8, n_codes=16
    )
    assert np.array_equal(b1, b2) and np.array_equal(b1, b3)


def test_load_evolving_merges_added_columns(spark, tmp_path):
    """Batches written before a column existed must read back with NULL
    for it; later batches keep their values; the unified schema is the
    union in first-seen order."""
    from etl_s3_to_redshift_spark.sources.tables import load_evolving

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(3, "c", 0.5), (4, "d", 0.9)], "id long, name string, score double"
    ).write.mode("append").parquet(path)

    got = load_evolving(spark, path)
    assert set(got.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 0.5), 4: ("d", 0.9)}

    # the default (non-merging) read picks ONE footer's schema — pin the
    # hazard load_evolving exists to avoid: without mergeSchema the score
    # column may silently vanish depending on which footer wins
    plain = spark.read.parquet(path)
    assert set(plain.columns).issubset({"id", "name", "score"})


def test_null_safe_join_matches_null_group(spark):
    """The derived NULL key must survive the join (plain equi-join drops
    it), and the plan must still be a hash/sort-merge equi-join, not a
    nested loop."""
    from etl_s3_to_redshift_spark.queries_ops3 import null_safe_join_events

    df = null_safe_join_events(spark, SF_SMOKE)
    rows = df.collect()
    null_rows = [r for r in rows if r.quality_key is None]
    assert len(null_rows) == 1 and null_rows[0].n_even > 0 and null_rows[0].n_odd > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_merge_rollups_property_random_values(spark):
    """Hypothesis: for arbitrary (key, value) rows — negatives, zeros,
    boundary magnitudes — and an arbitrary 2-way split, merged partials
    equal the one-shot aggregate exactly."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from etl_s3_to_redshift_spark.operators.incremental import (
        finalize_rollup,
        merge_rollups,
        partial_rollup,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                # 2-decimal values in the decimal(18,2)-exact range
                st.integers(min_value=-10**8, max_value=10**8).map(lambda c: c / 100.0),
            ),
            min_size=1,
            max_size=40,
        ),
        cut=st.integers(min_value=0, max_value=40),
    )
    def check(rows, cut):
        df = spark.createDataFrame(rows, "k string, value double")
        full = finalize_rollup(partial_rollup(df, ["k"]))
        first, second = rows[: cut % (len(rows) + 1)], rows[cut % (len(rows) + 1):]
        parts = [
            partial_rollup(spark.createDataFrame(chunk, "k string, value double"), ["k"])
            for chunk in (first, second)
            if chunk
        ]
        merged = finalize_rollup(merge_rollups(*parts))
        assert _canon(merged) == _canon(full)

    check()


def test_key_skew_profile_bounds(spark):
    """Degenerate key -> entropy 0 and share 1; uniform keys -> entropy
    log2(n_keys) and share 1/n."""
    from etl_s3_to_redshift_spark.operators.skew import key_skew_profile

    one = spark.createDataFrame([("x",)] * 8, "k string")
    r = key_skew_profile(one, ["k"]).first()
    assert (r.n_rows, r.n_keys, r.max_key_rows) == (8, 1, 8)
    assert r.top1_share == 1.0 and r.entropy_bits == 0.0

    uni = spark.createDataFrame([(str(i % 4),) for i in range(16)], "k string")
    r = key_skew_profile(uni, ["k"]).first()
    assert (r.n_keys, r.max_key_rows) == (4, 4)
    assert r.top1_share == 0.25 and r.entropy_bits == 2.0
