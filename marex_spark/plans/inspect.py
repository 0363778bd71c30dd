"""Helpers over ``df.explain`` output for plan assertions.

Counts are derived from the pre-AQE executed plan string: AQE rewrites
at runtime (exchange reuse, coalescing, broadcast conversion) only ever
*remove* work, so these counts are upper bounds on what executes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def exchange_count(df: DataFrame, include_broadcast: bool = False) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (BroadcastExchange excluded by default — broadcasts move a small
    side, not the fact table)."""
    plan = plan_string(df)
    shuffles = len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange (?:hash|range|Single)", plan))
    if include_broadcast:
        shuffles += plan.count("BroadcastExchange")
    return shuffles


def broadcast_join_count(df: DataFrame) -> int:
    plan = plan_string(df)
    return plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan — non-empty means predicate
    pushdown reached parquet."""
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan_string(df))
    return m.group(1) if m else ""


def scan_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (ReadSchema) — fewer than
    the table's columns means pruning worked."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan_string(df))
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]
