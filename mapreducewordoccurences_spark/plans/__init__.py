from mapreducewordoccurences_spark.plans.explain import (
    formatted_plan,
    count_exchanges,
    has_pushed_filters,
    read_schema_columns,
    has_broadcast_join,
    has_python_eval,
    plan_audit,
)

__all__ = [
    "formatted_plan",
    "count_exchanges",
    "has_pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "has_python_eval",
    "plan_audit",
]
