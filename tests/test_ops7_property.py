"""Property-based tests for the round-4 operators: the BPE merge fold
matches a pure-Python left-to-right fuse on arbitrary symbol streams,
chunk windows exactly tile any token stream, the streak operator matches
a brute-force scan over random day sets, and the WAP pointer always
names a complete snapshot."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

symbols = st.lists(st.sampled_from(list("abc")), min_size=0, max_size=12)


def _py_fuse(syms, left, right):
    out = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(syms=symbols, left=st.sampled_from(list("abc")), right=st.sampled_from(list("abc")))
def test_merge_fold_matches_python_fuse(spark, syms, left, right):
    from etl_s3_to_redshift_spark.operators.bpe import _merge_fold

    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(_merge_fold(F.col("syms"), left, right).alias("m")).collect()[0]["m"]
    assert list(got) == _py_fuse(syms, left, right)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(n_tokens=st.integers(0, 300))
def test_chunk_windows_tile_exactly(spark, n_tokens):
    from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions

    _load_extensions()
    size, stride = 64, 32
    text = " ".join(f"t{i}" for i in range(n_tokens))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame([(1, text)], ["doc_id", "text"]).write.mode(
            "overwrite"
        ).parquet(f"{d}/documents.parquet")
        rows = sorted(
            REGISTRY["text_chunk_windows"].spark(spark, d).collect(),
            key=lambda r: r["chunk_no"],
        )
    if n_tokens == 0:
        assert rows == []
        return
    import math

    assert len(rows) == math.ceil(n_tokens / stride)
    for j, r in enumerate(rows):
        start = j * stride
        want = [f"t{i}" for i in range(start, min(start + size, n_tokens))]
        assert r["chunk_text"].split() == want
        assert r["n_chunk_tokens"] == len(want)


day_sets = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 30)), min_size=1, max_size=40
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=day_sets)
def test_streak_matches_bruteforce(spark, pairs):
    import datetime as dt
    import tempfile

    from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions

    _load_extensions()
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [(u, base + dt.timedelta(days=d)) for u, d in pairs]
    with tempfile.TemporaryDirectory() as dpath:
        spark.createDataFrame(rows, "user_id long, ts timestamp").write.mode(
            "overwrite"
        ).parquet(f"{dpath}/events.parquet")
        got = {
            r["user_id"]: (r["longest_streak"], r["n_active_days"])
            for r in REGISTRY["w9_longest_daily_streak"].spark(spark, dpath).collect()
        }
    want = {}
    by_user: dict = {}
    for u, d in pairs:
        by_user.setdefault(u, set()).add(d)
    for u, days in by_user.items():
        longest = cur = 0
        prev = None
        for d in sorted(days):
            cur = cur + 1 if prev is not None and d == prev + 1 else 1
            longest = max(longest, cur)
            prev = d
        want[u] = (longest, len(days))
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(commit_rows=st.lists(st.integers(0, 99), min_size=1, max_size=4))
def test_wap_pointer_always_names_complete_snapshot(spark, tmp_path_factory, commit_rows):
    from etl_s3_to_redshift_spark.operators.table_commit import SnapshotTable

    t = SnapshotTable(str(tmp_path_factory.mktemp("wap")))
    committed = []
    for i, n in enumerate(commit_rows):
        df = spark.range(n).selectExpr("id AS k", f"{i} AS batch")
        t.commit(df)
        committed.append((n, i))
        # invariant after every commit: the published read is EXACTLY the
        # last committed frame — never a mix of versions
        got = [(r["k"], r["batch"]) for r in t.read(spark).collect()] if n else []
        assert sorted(got) == [(k, i) for k in range(n)]


state_rows = st.lists(
    # includes a NULL key: change_feed treats NULL as a real key value
    # (null-safe join), so a NULL-key row present on both sides must
    # classify changed/unchanged, not duplicate as added+removed
    st.tuples(st.one_of(st.none(), st.integers(0, 8)), st.sampled_from(["a", "b", "c"])),
    min_size=0, max_size=10, unique_by=lambda t: t[0],
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(old=state_rows, new=state_rows)
def test_change_feed_matches_bruteforce(spark, old, new):
    from etl_s3_to_redshift_spark.operators.merge import change_feed

    if not old and not new:
        return
    odf = spark.createDataFrame(old or [(99, "z")], "k int, attr string")
    ndf = spark.createDataFrame(new or [(98, "z")], "k int, attr string")
    old_m = dict(old or [(99, "z")])
    new_m = dict(new or [(98, "z")])
    got = {
        r["k"]: r["change_kind"]
        for r in change_feed(odf, ndf, "k", ["attr"]).collect()
    }
    want = {}
    for k in set(old_m) | set(new_m):
        if k not in old_m:
            want[k] = "added"
        elif k not in new_m:
            want[k] = "removed"
        elif old_m[k] != new_m[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    assert got == want


basket_lists = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 6)), min_size=1, max_size=40
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=basket_lists)
def test_order_pair_counts_match_itertools(spark, rows):
    import itertools

    from etl_s3_to_redshift_spark.queries_ops7 import _order_pair_counts

    df = spark.createDataFrame(rows, "l_orderkey int, l_partkey int")
    got = {
        (r["part_a"], r["part_b"]): r["n_orders"]
        for r in _order_pair_counts(df).collect()
    }
    want: dict = {}
    baskets: dict = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    for parts in baskets.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


quality_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 5)),
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        st.sampled_from(["O", "F", "X", "Y"]),
    ),
    min_size=0, max_size=25,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=quality_rows)
def test_expectations_report_matches_bruteforce(spark, rows):
    from etl_s3_to_redshift_spark.operators.quality import Rule, expectations_report

    df = spark.createDataFrame(rows, "k int, price double, status string") if rows else (
        spark.createDataFrame([], "k int, price double, status string")
    )
    rules = [
        Rule("k_not_null", "not_null", column="k"),
        Rule("price_pos", "range", column="price", lo=0.0),
        Rule("status_ok", "in_set", column="status", values=("O", "F")),
        Rule("k_unique", "unique", column="k"),
    ]
    got = {r["rule"]: r["n_violations"] for r in expectations_report(df, rules).collect()}
    from collections import Counter

    ks = Counter(k for k, _p, _s in rows if k is not None)
    want = {
        "k_not_null": sum(1 for k, _p, _s in rows if k is None),
        "price_pos": sum(1 for _k, p, _s in rows if p < 0.0),
        "status_ok": sum(1 for _k, _p, s in rows if s not in ("O", "F")),
        "k_unique": sum(n - 1 for n in ks.values() if n > 1),
    }
    assert got == want
