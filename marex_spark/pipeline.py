"""Flagship pipeline: the SURVEY §7.1 minimum end-to-end slice —
scan → climatology → anomaly → percentile threshold → boolean extremes
→ per-time labelling → temporal overlap graph → event components →
per-event stats (reference detect.py:287-841 then track.py:1162-1232).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marex_spark.operators.detect import preprocess_data
from marex_spark.operators.track import track_events
from marex_spark.sources.parquet import load_table

NY, NX = 18, 36  # flagship grid (10° cells)


def _gridded_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense long-format (time, y, x, value) series driven by the real
    parquet data: the per-day lineitem revenue signal modulates a
    deterministic per-cell field, so every sf table row feeds the
    pipeline while the grid stays dense and regular."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").alias("d")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.avg("l_quantity").alias("qty"),
    )
    stats = daily.agg(F.avg("rev").alias("mu"), F.stddev_pop("rev").alias("sd")).first()
    mu, sd = float(stats.mu), float(stats.sd) or 1.0

    yy = spark.range(NY).select(F.col("id").cast("int").alias("y"))
    xx = spark.range(NX).select(F.col("id").cast("int").alias("x"))
    cells = yy.crossJoin(xx)

    g = daily.crossJoin(F.broadcast(cells))
    doy = F.dayofyear("d")
    seasonal = 3.0 * F.cos(2 * 3.141592653589793 * doy / 365.25)
    cell_mean = 15.0 - 0.2 * F.abs(F.col("y") * (170.0 / (NY - 1)) - 85.0)
    signal = ((F.col("rev") - mu) / sd) * 1.5
    noise = (
        F.pmod(F.xxhash64("d", "y", "x"), F.lit(1000)).cast("double") / 1000.0 - 0.5
    ) * 2.0
    return g.select(
        F.col("d").cast("timestamp").alias("time"),
        "y",
        "x",
        (cell_mean + seasonal + signal + noise).cast("float").alias("value"),
    )


def _grid_dims(spark: SparkSession):
    gy = spark.range(NY).select(
        F.col("id").cast("int").alias("y"),
        (-85.0 + F.col("id") * (170.0 / (NY - 1))).alias("lat"),
    )
    gx = spark.range(NX).select(
        F.col("id").cast("int").alias("x"),
        ((F.col("id") + 0.5) * (360.0 / NX)).alias("lon"),
    )
    return gy, gx


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full detect→track slice; returns the per-event lifetime table."""
    series = _gridded_from_lineitem(spark, sf_dir)
    det = preprocess_data(
        series,
        method_anomaly="fixed_baseline",
        method_extreme="global_extreme",
        method_percentile="exact",
        threshold_percentile=0.95,
    )
    gy, gx = _grid_dims(spark)
    res = track_events(det.extremes, nx=NX, grid_y=gy, grid_x=gx)
    return res.lifetime_stats.orderBy("event_id")


def detect_track_bench(
    spark: SparkSession,
    sf: float,
    method_anomaly: str = "fixed_baseline",
    method_extreme: str = "global_extreme",
    method_percentile: str = "histogram",
) -> int:
    """Bench-scale detect→track on the synthetic SST grid. Size scales
    with sf: sf0.1 → 3 years × 40×80 (~3.5M cell-days)."""
    from marex_spark.sources.synthetic import synthetic_sst_gridded

    n_years = max(2, int(round(30 * sf)))
    ny, nx = (40, 80) if sf >= 0.05 else (20, 40)
    series = synthetic_sst_gridded(spark, n_years=n_years, ny=ny, nx=nx)
    det = preprocess_data(
        series,
        method_anomaly=method_anomaly,
        method_extreme=method_extreme,
        method_percentile=method_percentile,
        threshold_percentile=0.95,
    )
    res = track_events(det.extremes, nx=nx, compute_stats=False)
    res.events.write.mode("overwrite").format("noop").save()
    det.unpersist()
    return 0
