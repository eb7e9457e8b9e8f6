from arc_spark.plans.validator import validate_read_only, extract_tables, SqlValidationError  # noqa: F401
