"""Config-driven pipeline entry (dwh.cfg parity), COPY staging sink, and
the fail-fast error model."""

from __future__ import annotations

import pytest

from etl_s3_to_redshift_spark.plans.config import PipelineConfig, run_from_config
from etl_s3_to_redshift_spark.sources.sinks import stage_for_copy
from etl_s3_to_redshift_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE
from tests.fixtures_sparkify import EXPECT, write_fixtures


def write_cfg(tmp_path, events, songs, out):
    p = tmp_path / "dwh.cfg"
    p.write_text(
        f"[S3]\nlog_data = {events}\nsong_data = {songs}\n"
        f"[DWH]\ndwh_schema = sparkify\n"
        f"[OUTPUT]\npath = {out}\n"
    )
    return str(p)


def test_run_from_config(spark, tmp_path):
    events, songs = write_fixtures(tmp_path)
    cfg = write_cfg(tmp_path, events, songs, tmp_path / "wh")
    paths = run_from_config(spark, cfg)
    assert spark.read.parquet(paths["songplay"]).count() == EXPECT["songplay_rows"]


def test_config_errors():
    with pytest.raises(FileNotFoundError):
        PipelineConfig.from_ini("/nonexistent/dwh.cfg")


def test_incomplete_config(tmp_path):
    p = tmp_path / "bad.cfg"
    p.write_text("[S3]\nlog_data = x\n")
    with pytest.raises(ValueError, match="incomplete"):
        PipelineConfig.from_ini(str(p))


def test_pipeline_fail_fast(spark, tmp_path):
    """Reference error model (etl.py:70-106): a failing stage stops the
    run — here surfaced as a raised error, not a print-and-continue."""
    _, songs = write_fixtures(tmp_path)
    cfg = write_cfg(tmp_path, tmp_path / "missing.json", songs, tmp_path / "wh2")
    with pytest.raises(Exception):
        run_from_config(spark, cfg)
    import os

    assert not os.path.exists(tmp_path / "wh2" / "users")  # nothing half-written


def test_stage_for_copy_sql_and_files(spark, tmp_path):
    df = load_table(spark, SF_SMOKE, "region")
    sql = stage_for_copy(df, str(tmp_path / "stage"), "analytics.region", iam_role="arn:aws:iam::1:role/copy")
    assert sql == (
        f"COPY analytics.region\nFROM '{tmp_path}/stage'\n"
        "IAM_ROLE 'arn:aws:iam::1:role/copy'\nFORMAT AS PARQUET;"
    )
    assert spark.read.parquet(str(tmp_path / "stage")).count() == df.count()
