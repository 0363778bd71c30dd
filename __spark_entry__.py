"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``marex_spark.queries`` — one entry per
operator from SURVEY.md §2 plus the training-data pipeline suites
(dedup / similarity / text). Names map 1:1 to §2 IDs.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from marex_spark.queries import ORACLES, QUERIES  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full marEx slice (SURVEY §7.1) — detect extremes on a
    gridded series derived from sf0.001, then track labelled events and
    return per-event stats."""
    from marex_spark.pipeline import flagship

    return flagship(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; keys absent
    here (labelling/CC/iterative ops) get the driver's rows-only check."""
    return dict(ORACLES)
