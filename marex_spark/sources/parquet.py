"""Parquet sources for the driver's star schema (TESTDATA.md).

Scans are plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown + column pruning (reference: marEx reads zarr/netcdf lazily,
detect.py:409; Spark-native equivalent is the columnar parquet scan).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark.sql import DataFrame, SparkSession

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver's events.parquet carries TIMESTAMP(NANOS), which Spark
    # rejects outright unless nanosAsLong is set.  The conf is runtime-
    # settable and idempotent, and the harness hands us a *foreign*
    # SparkSession that our own builder (session.py) never touched — so it
    # must be set here, at the read site, not only at session construction.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS); with
    # spark.sql.legacy.parquet.nanosAsLong it arrives as int64 nanos.
    # Integer-div to micros (exact; float division would lose precision at
    # 1e18) — matches DuckDB's nanos→micros truncation.
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.typeName() == "long":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_star_schema(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in STAR_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every star table as a temp view (mirrors the driver's
    DuckDB view registration, so SQL-form queries read the same names)."""
    for name in STAR_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
