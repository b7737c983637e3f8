from .inspect import (  # noqa: F401
    codegen_stage_count,
    executed_metrics,
    has_partial_aggregate,
    has_top_n,
    join_strategies,
    plan_string,
    pushed_filters,
    read_schemas,
    scan_column_counts,
)
