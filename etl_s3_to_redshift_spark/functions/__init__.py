from etl_s3_to_redshift_spark.functions.casts import (  # noqa: F401
    epoch_millis_to_timestamp,
    int_like_string_to_long,
    number_to_string,
)
