from bo_sql_spark.plans.inspect import (
    explain_str,
    has_operator,
    pushed_filters,
    read_schema_columns,
)

__all__ = ["explain_str", "has_operator", "pushed_filters", "read_schema_columns"]
