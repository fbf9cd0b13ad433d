from etl_s3_to_redshift_spark.sources.json_source import (  # noqa: F401
    read_events_json,
    read_songs_json,
)
from etl_s3_to_redshift_spark.sources.tables import load_tables, register_views  # noqa: F401
