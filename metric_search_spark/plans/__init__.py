"""Physical-plan inspection helpers (pushdown / codegen / shuffle assertions)."""

from metric_search_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    exchange_partition_keys,
    explain_text,
    has_nested_loop_join,
    has_single_partition_exchange,
    has_whole_stage_codegen,
    pushed_filters,
    read_schema_columns,
)
