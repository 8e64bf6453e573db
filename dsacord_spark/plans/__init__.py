from dsacord_spark.plans.catalog import queries, oracle_sql, get_registry  # noqa: F401
