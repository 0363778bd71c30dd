"""Per-event statistics (SURVEY A8-A13 + A10 spherical centroid).

Reference: regionprops + recompute passes (track.py:2332-2377,
3109-3317). All pure aggregations — one shuffle keyed (time, event_id),
map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marex_spark.functions.geometry import cartesian_to_latlon, latlon_to_cartesian


def attach_geo(
    events: DataFrame,
    grid_y: DataFrame,
    grid_x: DataFrame,
    area_col: str | None = None,
) -> DataFrame:
    """Broadcast-join the coordinate dimension tables (lat per y, lon
    per x); area defaults to cos(lat) (proportional true cell area on a
    regular grid)."""
    d = events.join(F.broadcast(grid_y), "y").join(F.broadcast(grid_x), "x")
    if area_col is None:
        d = d.withColumn("area", F.cos(F.radians("lat")))
    else:
        d = d.withColumn("area", F.col(area_col))
    return d


def event_timestep_stats(geo: DataFrame, time_col: str = "time") -> DataFrame:
    """Per (time, event): cell count, area, spherical centroid
    (A9 + A10). The Cartesian-vector mean handles the periodic
    longitude seam with no special casing (track.py:2088-2097's wrap
    logic becomes unnecessary — SURVEY M11)."""
    cx, cy, cz = latlon_to_cartesian(F.col("lat"), F.col("lon"))
    agg = geo.groupBy(time_col, "event_id").agg(
        F.count("*").alias("n_cells"),
        F.sum("area").alias("area"),
        F.sum(F.col("area") * cx).alias("sx"),
        F.sum(F.col("area") * cy).alias("sy"),
        F.sum(F.col("area") * cz).alias("sz"),
    )
    lat_c, lon_c = cartesian_to_latlon(F.col("sx"), F.col("sy"), F.col("sz"))
    return agg.select(
        time_col,
        "event_id",
        "n_cells",
        "area",
        lat_c.alias("centroid_lat"),
        ((lon_c + 360.0) % 360.0).alias("centroid_lon"),
    )


def event_lifetime_stats(ts_stats: DataFrame, time_col: str = "time") -> DataFrame:
    """Per event: presence span + aggregate stats (A13 + A14 shape:
    time_start/time_end track.py:3109-3117)."""
    return ts_stats.groupBy("event_id").agg(
        F.min(time_col).alias("time_start"),
        F.max(time_col).alias("time_end"),
        F.count("*").alias("n_timesteps"),
        F.max("area").alias("max_area"),
        F.avg("area").alias("mean_area"),
        F.sum("n_cells").alias("total_cell_days"),
    )


def area_history(
    extremes: DataFrame, time_col: str = "time", extreme_col: str = "extreme"
) -> DataFrame:
    """A8: total extreme area per timestep (track.py:1499-1518)."""
    return extremes.groupBy(time_col).agg(
        F.sum(F.when(F.col(extreme_col), 1).otherwise(0)).alias("n_extreme_cells")
    )


def episode_stats(
    extremes: DataFrame,
    keys: tuple[str, ...] = ("y", "x"),
    time_col: str = "time",
    extreme_col: str = "extreme",
    max_gap_days: int = 2,
    min_duration_days: int = 5,
    anomaly_col: str | None = None,
) -> DataFrame:
    """Per-cell extreme-episode metrics — the Hobday et al. (2016)
    marine-heatwave summary computed from a boolean detect output:
    an episode is a run of extreme days bridging gaps of up to
    ``max_gap_days`` and lasting at least ``min_duration_days``.

    Output per cell: ``n_episodes``, ``max_duration``,
    ``mean_duration``, ``total_extreme_days``; with ``anomaly_col``
    also the Hobday intensity metrics ``i_max`` (peak anomaly),
    ``i_mean`` (mean over extreme days) and ``i_cum`` (cumulative
    degree-days, the sum of anomalies over all episode days).

    Physical shape: one shuffle by cell; the lag window, running
    episode id, and both aggregations are all local to that layout —
    the same single-shuffle plan as the detect pipeline, so it runs
    directly on a 100 TB extremes table."""
    from pyspark.sql import Window

    from marex_spark.functions.temporal import epoch_day

    sel = [*keys, epoch_day(time_col).alias("de")]
    if anomaly_col is not None:
        sel.append(F.col(anomaly_col).cast("double").alias("_a"))
    ext = extremes.filter(F.col(extreme_col)).select(*sel)
    w = Window.partitionBy(*keys).orderBy("de")
    brk = F.when(
        F.col("de") - F.lag("de").over(w) <= max_gap_days + 1, F.lit(0)
    ).otherwise(F.lit(1))
    epi = ext.withColumn("brk", brk).withColumn(
        "eid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    run_aggs = [
        (F.max("de") - F.min("de") + 1).alias("duration"),
        F.count("*").alias("n_days"),
    ]
    if anomaly_col is not None:
        run_aggs += [
            F.max("_a").alias("_imax"),
            F.sum("_a").alias("_icum"),
            # non-null anomaly days: the i_mean denominator must skip
            # NULLs exactly like the numerator sum does, or gap days in
            # the anomaly table deflate the mean
            F.count("_a").alias("_na"),
        ]
    runs = (
        epi.groupBy(*keys, "eid")
        .agg(*run_aggs)
        .filter(F.col("duration") >= min_duration_days)
    )
    cell_aggs = [
        F.count("*").cast("long").alias("n_episodes"),
        F.max("duration").cast("long").alias("max_duration"),
        F.avg(F.col("duration").cast("double")).alias("mean_duration"),
        F.sum("n_days").cast("long").alias("total_extreme_days"),
    ]
    if anomaly_col is not None:
        cell_aggs += [
            F.max("_imax").alias("i_max"),
            # day-weighted: mean over ALL anomaly-valued extreme days of
            # kept episodes, not a mean of per-episode means (a 10-day
            # episode counts twice a 5-day one)
            (F.sum("_icum") / F.sum("_na")).alias("i_mean"),
            F.sum("_icum").alias("i_cum"),
        ]
    return runs.groupBy(*keys).agg(*cell_aggs)
