"""Extreme-threshold engine — Spark-native ``identify_extremes``
(reference detect.py:1119-1503): global vs hobday (per-doy) thresholds,
each in exact and histogram-approximate form.

The histogram quantile mirrors the reference's count-interpolated
asymmetric-bin scheme (detect.py:2509-2631): one bin for all
negative anomalies, uniform ``precision`` bins up to ``max_anomaly``,
threshold interpolated inside the crossing bin and clamped to the
bin's bounds. Everything is pure DataFrame — histogram + window CDF —
so it scales as one shuffle per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from marex_spark.functions.binning import clip
from marex_spark.operators.climatology import DEFAULT_KEYS, add_time_keys


def _bin_col(c, precision: float, max_anomaly: float):
    n_pos = int(round(max_anomaly / precision))
    pos = clip(F.lit(1) + F.floor(c / F.lit(float(precision))).cast("int"), 1, n_pos + 1)
    return F.when(c < 0, F.lit(0)).otherwise(pos).cast("int")


def _interpolate_threshold(cdf_df: DataFrame, group_cols: list[str], q: float, precision: float):
    """Pick the bin where the CDF crosses q·n and linearly interpolate
    inside it by counts (detect.py:2509-2559). Negative-bin crossings
    clamp to 0 (the reference clamps thresholds to ≥ the lower bin
    bound, detect.py:2708-2732).

    One shuffle total: the per-group histogram is collected into a
    sorted array (bounded: ≤ max_anomaly/precision + 2 bins per group)
    and the CDF crossing is found with a codegen'd array fold — no
    window functions, no second shuffle.
    """
    zero = F.lit(0).cast("long")
    init = F.struct(
        zero.alias("cum"), F.lit(-1).alias("bin"), zero.alias("c"), zero.alias("cdf")
    )

    grouped = cdf_df.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("bin", "c"))).alias("hist"),
        F.sum("c").alias("n"),
    )
    target = F.lit(q) * F.col("n")

    def step(acc, x):
        cum = acc["cum"] + x["c"]
        hit = F.struct(
            cum.alias("cum"),
            x["bin"].alias("bin"),
            x["c"].cast("long").alias("c"),
            cum.alias("cdf"),
        )
        miss = F.struct(
            cum.alias("cum"), F.lit(-1).alias("bin"), zero.alias("c"), zero.alias("cdf")
        )
        return F.when(acc["bin"] >= 0, acc).otherwise(
            F.when(cum >= target, hit).otherwise(miss)
        )

    d = grouped.withColumn("sel", F.aggregate("hist", init, step))
    bin_ = F.col("sel.bin")
    bin_left = (bin_ - 1).cast("double") * precision
    frac = (target - (F.col("sel.cdf") - F.col("sel.c"))) / F.col("sel.c")
    thr = F.when(bin_ == 0, F.lit(0.0)).otherwise(
        bin_left + F.lit(precision) * clip(frac, 0.0, 1.0)
    )
    return d.select(*group_cols, thr.alias("threshold"))


def global_threshold_exact(
    anom: DataFrame, keys: tuple[str, ...] = DEFAULT_KEYS, q: float = 0.95
) -> DataFrame:
    """Exact per-cell quantile over all times (detect.py:2887-2899, A6)."""
    return anom.groupBy(*keys).agg(
        F.percentile("anomaly", F.lit(q)).alias("threshold")
    )


def global_threshold_approx(
    anom: DataFrame,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    q: float = 0.95,
    accuracy: int = 10_000,
) -> DataFrame:
    """Spark-native sketch tier: per-cell approx_percentile
    (Greenwald-Khanna, JVM-side, single map-side-combinable pass).
    A third option beside exact (full sort) and the reference's
    count-interpolated histogram — at 100 TB the sketch needs no
    bounded-range assumption (the histogram's max_anomaly clamp) and
    no bin-width tuning; error ≤ 1/accuracy of rank."""
    return anom.groupBy(*keys).agg(
        F.percentile_approx("anomaly", F.lit(q), F.lit(accuracy)).alias(
            "threshold"
        )
    )


def global_threshold_hist(
    anom: DataFrame,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    q: float = 0.95,
    precision: float = 0.01,
    max_anomaly: float = 5.0,
) -> DataFrame:
    """Histogram-approximate per-cell quantile (detect.py:2737-2865, A5):
    bin → count → window CDF → count interpolation."""
    h = (
        anom.select(*keys, _bin_col(F.col("anomaly"), precision, max_anomaly).alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count("*").alias("c"))
    )
    return _interpolate_threshold(h, list(keys), q, precision)


def hobday_threshold_exact(
    anom: DataFrame,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    q: float = 0.95,
    window_days: int = 11,
) -> DataFrame:
    """Exact per-(doy, cell) windowed percentile (detect.py:1921-1956,
    A7): each sample fans out to the ±window/2 circular doy window,
    exact percentile per target doy."""
    half = window_days // 2
    d = anom if "doy" in anom.columns else add_time_keys(anom)
    offs = F.array([F.lit(o) for o in range(-half, half + 1)])
    fan = d.select(*keys, "anomaly", "doy", F.explode(offs).alias("off"))
    center = ((F.col("doy") - 1 + F.col("off") + 366) % 366 + 1).alias("doy_c")
    return (
        fan.groupBy(center, *keys)
        .agg(F.percentile("anomaly", F.lit(q)).alias("threshold"))
        .withColumnRenamed("doy_c", "doy")
    )


def hobday_threshold_hist(
    anom: DataFrame,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    q: float = 0.95,
    window_days: int = 11,
    precision: float = 0.01,
    max_anomaly: float = 5.0,
    spatial_window: int = 0,
    nx: int | None = None,
    ny: int | None = None,
) -> DataFrame:
    """Histogram hobday threshold (detect.py:2562-2734, A4+W2+W4):
    2-D (doy × bin) histogram per cell, circular doy-window pooling,
    optional 5×5 spatial pooling (x wraps), then count interpolation.

    The doy pooling is a fan-out + re-aggregate (long-format form of the
    reference's sliding_window_view) — one extra shuffle, no UDF.
    """
    d = anom if "doy" in anom.columns else add_time_keys(anom)
    h = (
        d.select(
            *keys,
            "doy",
            _bin_col(F.col("anomaly"), precision, max_anomaly).alias("bin"),
        )
        .groupBy("doy", *keys, "bin")
        .agg(F.count("*").alias("c"))
    )
    half = window_days // 2
    offs = F.array([F.lit(o) for o in range(-half, half + 1)])
    fan = h.select(*keys, "bin", "c", "doy", F.explode(offs).alias("off"))
    center = ((F.col("doy") - 1 + F.col("off") + 366) % 366 + 1).alias("doy")
    pooled = fan.groupBy(center, *keys, "bin").agg(F.sum("c").alias("c"))

    if spatial_window and {"y", "x"} <= set(keys):
        # nx/ny must be supplied by the caller — an agg+collect here
        # would put an eager job inside plan construction (the
        # anti-pattern SURVEY §3.1 flags in the reference)
        if nx is None or ny is None:
            from marex_spark.exceptions import ConfigurationError

            raise ConfigurationError(
                "spatial_window pooling needs nx and ny",
                details={"spatial_window": spatial_window},
            )
        s = spatial_window // 2
        soffs = F.array([F.lit(o) for o in range(-s, s + 1)])
        fan2 = (
            pooled.withColumn("dy", F.explode(soffs))
            .withColumn("dx", F.explode(soffs))
        )
        # x wraps (detect.py:2652-2668 lon wrap-pad); y clamps at the
        # poles — off-grid target rows are dropped
        pooled = (
            fan2.filter((F.col("y") + F.col("dy")).between(0, ny - 1))
            .groupBy(
                "doy",
                (F.col("y") + F.col("dy")).alias("y"),
                ((F.col("x") + F.col("dx") + nx) % nx).alias("x"),
                "bin",
            )
            .agg(F.sum("c").alias("c"))
        )

    return _interpolate_threshold(pooled, ["doy", *keys], q, precision)


def identify_extremes(
    anom: DataFrame,
    thresholds: DataFrame,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    broadcast_thresholds: bool | None = None,
) -> DataFrame:
    """Boolean extreme field: anomaly ≥ threshold (detect.py:2004/2915,
    P4+J2/J3). Join keys are whatever the threshold table carries
    (global: cells; hobday: doy+cells).

    Broadcast policy (SURVEY §4.2): the global table is one row per cell
    — always broadcast; the hobday table is 366× larger, so leave the
    strategy to AQE unless the caller forces it.
    """
    join_keys = [c for c in thresholds.columns if c != "threshold"]
    if broadcast_thresholds is None:
        broadcast_thresholds = "doy" not in join_keys
    d = anom if "doy" not in join_keys or "doy" in anom.columns else add_time_keys(anom)
    thr = F.broadcast(thresholds) if broadcast_thresholds else thresholds
    return d.join(thr, join_keys).withColumn(
        "extreme", F.col("anomaly") >= F.col("threshold")
    )
