"""Registry for driver-facing queries + DuckDB oracle SQL.

Determinism contract (the driver hashes values after sorting rows and
columns):

- every double that comes out of an aggregation is computed via exact
  DECIMAL(38,6) sums cast to double at the end (order-independent);
- any remaining float math (trig, division chains) is wrapped in
  ``round6`` — ``floor(x*1e6 + 0.5)/1e6`` — spelled identically on the
  Spark and DuckDB side so both engines run the same double ops;
- computed integer columns are cast to BIGINT on both sides (Spark
  ``year()`` yields int, DuckDB bigint);
- window frames always carry a full deterministic ORDER BY tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query, plus its
    DuckDB oracle SQL (omit for non-SQL-expressible operators — the
    driver then records a weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def round6(c: Column) -> Column:
    """Deterministic 6-decimal rounding: same formula as ROUND6_SQL."""
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def round6_sql(expr: str) -> str:
    return f"FLOOR(({expr}) * 1e6 + 0.5) / 1e6"
