"""Property-based tests (hypothesis): the composed operators must agree
with independent reference implementations (pandas) on arbitrary inputs,
not just the driver testdata."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.analytics import sessionize
from etl_s3_to_redshift_spark.operators.temporal import as_of_join

BASE = dt.datetime(2024, 1, 1)

# (key, seconds-offset) event streams; small alphabets force collisions
events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=events_strategy, right=events_strategy)
def test_as_of_join_matches_pandas_merge_asof(spark, left, right):
    # unique timestamps per key on the right: merge_asof picks the LAST of
    # equal right timestamps, our window picks the last in (ts, tiebreak)
    # order — dedupe to sidestep the (undefined) equal-ts-right ordering
    right = list({(k, s): None for k, s in right})
    ldf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left)],
        "key long, t timestamp, row_id long",
    )
    rdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=s), float(s)) for k, s in right],
        "key long, rt timestamp, v double",
    )
    got = {
        r.row_id: (r.asof_ts, r.asof_v)
        for r in as_of_join(ldf, rdf, "key", "t", "rt", ["v"]).collect()
    }

    lpd = pd.DataFrame(
        {
            "key": [k for k, _ in left],
            "t": [BASE + dt.timedelta(seconds=s) for _, s in left],
            "row_id": range(len(left)),
        }
    ).sort_values(["t", "row_id"], kind="stable")
    rpd = pd.DataFrame(
        {
            "key": [k for k, _ in right],
            "rt": [BASE + dt.timedelta(seconds=s) for k, s in right],
            "v": [float(s) for _, s in right],
        }
    ).sort_values("rt", kind="stable")
    merged = pd.merge_asof(
        lpd, rpd, left_on="t", right_on="rt", by="key", direction="backward"
    )
    for _, row in merged.iterrows():
        expect = (
            (None, None)
            if pd.isna(row["rt"])
            else (row["rt"].to_pydatetime(), row["v"])
        )
        assert got[row["row_id"]] == expect

    # forward direction: mirror check against merge_asof(direction="forward")
    got_fwd = {
        r.row_id: (r.asof_ts, r.asof_v)
        for r in as_of_join(
            ldf, rdf, "key", "t", "rt", ["v"], direction="forward"
        ).collect()
    }
    merged_fwd = pd.merge_asof(
        lpd, rpd, left_on="t", right_on="rt", by="key", direction="forward"
    )
    for _, row in merged_fwd.iterrows():
        expect = (
            (None, None)
            if pd.isna(row["rt"])
            else (row["rt"].to_pydatetime(), row["v"])
        )
        assert got_fwd[row["row_id"]] == expect


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(stream=events_strategy, gap_minutes=st.integers(1, 30))
def test_sessionize_invariants(spark, stream, gap_minutes):
    df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(stream)],
        "user long, t timestamp, row_id long",
    )
    rows = sessionize(df, "user", "t", gap_minutes=gap_minutes).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user, []).append(r)
    gap = gap_minutes * 60
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: (r.t, r.row_id))
        # session ids start at 1, increase monotonically, and bump exactly
        # when the gap to the previous event REACHES the threshold — the
        # operator follows F.session_window's [ts, ts+gap) convention (an
        # event at exactly ts+gap starts a new session), and so does the
        # oracle; hypothesis found the exact-boundary example this
        # assertion originally got backwards
        assert user_rows[0].session_id == 1
        for prev, cur in zip(user_rows, user_rows[1:]):
            delta = (cur.t - prev.t).total_seconds()
            if delta >= gap:
                assert cur.session_id == prev.session_id + 1
            else:
                assert cur.session_id == prev.session_id
