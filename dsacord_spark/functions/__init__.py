from dsacord_spark.functions.parsing import (  # noqa: F401
    parse_time,
    parse_array_field,
    parse_bool,
    parse_snowflake,
    platform_uid_parts,
    url_for_day,
)
