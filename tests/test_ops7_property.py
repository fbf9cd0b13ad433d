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
