"""Deterministic aggregation helpers for oracle parity.

Floating-point sums depend on partition order, so ``SUM(double)`` can
differ in the last ulp between Spark and any oracle engine. Summing in
DECIMAL is exact and order-independent; casting the final result to
double yields bit-identical values on both sides. Used by every
driver-facing query whose oracle hash must match (BASELINE.md gate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 total digits; 6 fractional is plenty for the synthetic data's ranges.
_DEC = "decimal(38,6)"


def dsum(c: Column | str, alias: str | None = None) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(c: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum / count, double division
    done once at the end (same scalar op in both engines)."""
    c = F.col(c) if isinstance(c, str) else c
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dec_sql(expr: str) -> str:
    """Oracle-side (DuckDB) rendering of :func:`dsum`'s cast chain."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr})"
