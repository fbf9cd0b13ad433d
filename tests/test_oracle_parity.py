"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (the driver runs the same comparison at sf0.01 — tools/
check_oracle.py replicates it at any sf)."""

from __future__ import annotations

import duckdb
import pytest

from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions

_load_extensions()
from etl_s3_to_redshift_spark.schemas import TESTDATA_TABLES
from tests.conftest import SF_SMOKE
from tools.check_oracle import canon_df


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, oracle_con, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, SF_SMOKE).toPandas()
    if spec.oracle is None or (
        spec.oracle_sf is not None and spec.oracle_sf != "sf0.001"
    ):
        # rows-only, or a precomputed-expectation oracle pinned to the
        # driver's sf0.01 gate (checked there by tools/check_oracle.py)
        assert len(sdf) >= 0  # must still execute at smoke SF
        return
    odf = oracle_con.sql(spec.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert canon_df(sdf) == canon_df(odf)
