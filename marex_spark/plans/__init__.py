"""Physical-plan inspection utilities (SURVEY §4): assert the plans the
engine is designed around — pushed-down scans, broadcast joins, bounded
shuffle counts — so regressions in partitioning strategy fail tests
instead of silently multiplying shuffles at scale."""

from marex_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    exchange_count,
    plan_string,
    pushed_filters,
    scan_columns,
)
