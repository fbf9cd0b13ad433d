"""Config-driven pipeline entry — the reference's ``dwh.cfg`` surface.

The reference materializes its SQL from an INI file at import time
(reference sql_queries.py:4-11: configparser + .format()) and etl.py reads
the same file for connection/search-path (etl.py:56-64). We keep the same
INI shape so a reference user's config carries over; "query compilation"
becomes building lazy DataFrame plans instead of string interpolation.

Expected sections (superset of the reference's, unused keys ignored):

    [S3]
    log_data = s3a://.../log_data          (or local path)
    song_data = s3a://.../song_data
    [DWH]
    dwh_schema = sparkify
    [OUTPUT]
    path = /warehouse/sparkify             (ours: parquet lake root)
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class PipelineConfig:
    events_path: str
    songs_path: str
    schema_name: str
    output_path: str

    @classmethod
    def from_ini(cls, path: str) -> "PipelineConfig":
        cp = configparser.ConfigParser()
        read = cp.read(path)
        if not read:
            raise FileNotFoundError(f"config not found: {path}")
        try:
            return cls(
                events_path=cp.get("S3", "log_data"),
                songs_path=cp.get("S3", "song_data"),
                schema_name=cp.get("DWH", "dwh_schema", fallback="sparkify"),
                output_path=cp.get("OUTPUT", "path"),
            )
        except (configparser.NoSectionError, configparser.NoOptionError) as e:
            raise ValueError(f"incomplete pipeline config {path}: {e}") from e


def run_from_config(spark: SparkSession, config_path: str) -> dict[str, str]:
    """The reference's ``python etl.py`` entry (etl.py:112-113 → main):
    read config → full-refresh star build → write. Fail-fast: any stage
    error propagates (the reference prints-and-returns; raising is the
    honest Spark equivalent)."""
    from etl_s3_to_redshift_spark.plans.star_schema import run_pipeline

    cfg = PipelineConfig.from_ini(config_path)
    return run_pipeline(spark, cfg.events_path, cfg.songs_path, cfg.output_path)
