from bo_sql_spark.plans.inspect import (
    explain_str,
    pin_plan_with_confs,
    has_operator,
    pushed_filters,
    read_schema_columns,
)

__all__ = ["explain_str", "pin_plan_with_confs", "has_operator", "pushed_filters", "read_schema_columns"]
