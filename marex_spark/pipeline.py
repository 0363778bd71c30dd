"""Flagship pipeline: the SURVEY §7.1 minimum end-to-end slice.

Placeholder until operators/{detect,label,track} land (this file is
swapped to the full detect→track slice in the same round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from marex_spark.queries import QUERIES


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return QUERIES["tpch_q1"](spark, sf_dir)
