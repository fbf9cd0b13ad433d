"""MERGE/upsert and SCD2 emulation semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_s3_to_redshift_spark.operators.merge import merge_upsert, scd2_apply

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 6, 1)


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, v string, x double"
    )
    source = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "id long, v string, x double"
    )
    got = {r.id: (r.v, r.x) for r in merge_upsert(target, source, "id").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 200.0), 3: ("c", 30.0), 4: ("d", 40.0)}


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [
            # key 1: one closed historical + one current row
            (1, "alice", "london", T0 - dt.timedelta(days=100), T0, False),
            (1, "alice", "paris", T0, None, True),
            # key 2: current only
            (2, "bob", "nyc", T0, None, True),
            # key 3: current only, will be unchanged
            (3, "carol", "tokyo", T0, None, True),
        ],
        "user_id long, name string, city string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )


def test_scd2_apply(spark, dim):
    updates = spark.createDataFrame(
        [
            (2, "bob", "berlin"),   # changed → close + new version
            (3, "carol", "tokyo"),  # identical → untouched
            (4, "dave", "sydney"),  # new key → new current row
        ],
        "user_id long, name string, city string",
    )
    out = scd2_apply(dim, updates, "user_id", ["name", "city"], F.lit(T1))
    rows = sorted(
        ((r.user_id, r.city, r.is_current, r.valid_from, r.valid_to) for r in out.collect())
    )
    assert rows == sorted(
        [
            (1, "london", False, T0 - dt.timedelta(days=100), T0),
            (1, "paris", True, T0, None),          # no update for key 1
            (2, "nyc", False, T0, T1),             # closed at T1
            (2, "berlin", True, T1, None),         # new version
            (3, "tokyo", True, T0, None),          # unchanged
            (4, "sydney", True, T1, None),         # brand new
        ]
    )
    # exactly one current row per key
    cur = out.filter("is_current").groupBy("user_id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_idempotent_on_no_changes(spark, dim):
    updates = spark.createDataFrame(
        [(2, "bob", "nyc"), (3, "carol", "tokyo")], "user_id long, name string, city string"
    )
    out = scd2_apply(dim, updates, "user_id", ["name", "city"], F.lit(T1))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, dim.collect()))
