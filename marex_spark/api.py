"""Reference-named standalone entry points (``marEx.__all__`` parity):
``compute_normalised_anomaly``, ``identify_extremes``,
``rolling_climatology``, ``smoothed_rolling_climatology`` — the pieces
of ``preprocess_data`` users call separately (reference detect.py:891,
1119, 1511, 1691). Thin facades over the climatology/threshold
operators; everything stays lazy DataFrames."""

from __future__ import annotations

from pyspark.sql import DataFrame

from marex_spark.exceptions import ConfigurationError
from marex_spark.operators.climatology import (
    DEFAULT_KEYS,
    add_time_keys,
    anomaly_detrend_fixed_baseline,
    anomaly_detrend_harmonic,
    anomaly_fixed_baseline,
    anomaly_shifting_baseline,
    normalise_by_doy_std,
    partition_by_cells,
    shifting_climatology,
)
from marex_spark.operators.detect import ANOMALY_METHODS, EXTREME_METHODS


def compute_normalised_anomaly(
    df: DataFrame,
    method_anomaly: str = "shifting_baseline",
    keys: tuple[str, ...] = DEFAULT_KEYS,
    window_year_baseline: int = 5,
    smooth_days_baseline: int = 21,
    std_normalise: bool = False,
    detrend_orders: tuple[int, ...] = (1,),
    force_zero_mean: bool = True,
    reference_period: tuple[int, int] | None = None,
    n_harmonics: int = 2,
    time_col: str = "time",
    value_col: str = "value",
    dimensions: dict | None = None,
) -> DataFrame:
    """Anomaly stage only (reference detect.py:891-1116): returns the
    anomaly frame; with ``std_normalise=True`` (detrend_harmonic only)
    also an ``anomaly_stn`` column — the reference's ``dat_stn``
    variable."""
    from pyspark.sql import functions as F

    if method_anomaly not in ANOMALY_METHODS:
        raise ConfigurationError(
            "unknown method_anomaly",
            details={"got": method_anomaly, "valid": ANOMALY_METHODS},
        )
    if dimensions is not None:
        from marex_spark.datamodel import apply_dimensions

        df = apply_dimensions(
            df, dimensions, unstructured=keys == ("cell",),
            require=(*keys, "time", "value"),
        )
        time_col, value_col = "time", "value"
    clean = partition_by_cells(
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(value_col)), keys
    )
    if method_anomaly == "fixed_baseline":
        anom = anomaly_fixed_baseline(
            clean, keys, value_col, reference_period=reference_period
        )
    elif method_anomaly == "shifting_baseline":
        anom = anomaly_shifting_baseline(
            clean, keys, window_year_baseline, smooth_days_baseline, value_col
        )
    elif method_anomaly == "detrend_harmonic":
        anom = anomaly_detrend_harmonic(
            clean, keys, n_harmonics, time_col=time_col, value_col=value_col,
            detrend_orders=detrend_orders, force_zero_mean=force_zero_mean,
        )
    else:
        anom = anomaly_detrend_fixed_baseline(
            clean, keys, time_col=time_col, value_col=value_col,
            reference_period=reference_period,
        )
    if std_normalise:
        if method_anomaly != "detrend_harmonic":
            raise ConfigurationError(
                "std_normalise is only supported with detrend_harmonic",
                details={"method_anomaly": method_anomaly},
            )
        stn = normalise_by_doy_std(anom, keys)
        anom = stn.withColumnRenamed("anomaly_norm", "anomaly_stn")
    return anom


def identify_extremes(
    anomalies: DataFrame,
    method_extreme: str = "hobday_extreme",
    threshold_percentile: float = 0.95,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    window_days_hobday: int = 11,
    window_spatial_hobday: int | None = None,
    method_percentile: str = "histogram",
    precision: float = 0.01,
    max_anomaly: float = 5.0,
    anomaly_col: str = "anomaly",
    time_col: str = "time",
    nx: int | None = None,
    ny: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Extreme-identification stage only (reference detect.py:1119-1203):
    anomaly frame → (boolean extremes frame, threshold table) — the
    reference's ``(extremes, thresholds)`` pair."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from marex_spark.operators.threshold import (
        global_threshold_approx,
        global_threshold_hist,
        hobday_threshold_exact,
        hobday_threshold_hist,
    )
    from marex_spark.operators.threshold import identify_extremes as _compare

    if method_extreme not in EXTREME_METHODS:
        raise ConfigurationError(
            "unknown method_extreme",
            details={"got": method_extreme, "valid": EXTREME_METHODS},
        )
    a = anomalies
    if anomaly_col != "anomaly":
        a = a.withColumnRenamed(anomaly_col, "anomaly")
    if time_col != "time":
        # the threshold operators derive (year, doy) from the canonical
        # 'time' column; rename rather than thread the name through.
        # NOTE: a pre-existing unrelated 'time' data column would be
        # ambiguous with the time axis — refuse instead of dropping it
        if "time" in a.columns:
            raise ConfigurationError(
                "input has both a 'time' column and a different "
                "time_col — rename one",
                details={"time_col": time_col},
            )
        a = a.withColumnRenamed(time_col, "time")

    def _restore(d):
        # hand the caller's column name back (review finding: the
        # output silently came back renamed to 'time')
        return (
            d.withColumnRenamed("time", time_col)
            if time_col != "time" and "time" in d.columns
            else d
        )
    exact = method_percentile == "exact"
    if method_extreme == "global_extreme" and exact:
        w = Window.partitionBy(*keys)
        ext = a.withColumn(
            "threshold",
            F.percentile("anomaly", F.lit(threshold_percentile)).over(w),
        ).withColumn("extreme", F.col("anomaly") >= F.col("threshold"))
        return _restore(ext), ext.select(*keys, "threshold").dropDuplicates(list(keys))
    if method_extreme == "global_extreme":
        t = (
            global_threshold_approx(a, keys, threshold_percentile)
            if method_percentile == "approx"
            else global_threshold_hist(
                a, keys, threshold_percentile, precision, max_anomaly
            )
        )
    else:
        t = (
            hobday_threshold_exact(a, keys, threshold_percentile, window_days_hobday)
            if exact
            else hobday_threshold_hist(
                a, keys, threshold_percentile, window_days_hobday,
                precision, max_anomaly,
                spatial_window=window_spatial_hobday or 0, nx=nx, ny=ny,
            )
        )
    return _restore(_compare(a, t, keys)), _restore(t)


def rolling_climatology(
    df: DataFrame,
    window_year_baseline: int = 5,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    value_col: str = "value",
    time_col: str = "time",
) -> DataFrame:
    """Rolling (shifting) climatology WITHOUT the day smoother
    (reference detect.py:1511-1688): per (target_year, doy, cell) mean
    of the previous N years' samples."""
    from pyspark.sql import functions as F

    d = add_time_keys(df, time_col)
    fan = d.select(
        *keys,
        "doy",
        F.col(value_col).alias("v"),
        F.explode(
            F.sequence(F.col("year") + 1, F.col("year") + window_year_baseline)
        ).alias("target_year"),
    )
    return fan.groupBy("target_year", "doy", *keys).agg(F.avg("v").alias("clim"))


def smoothed_rolling_climatology(
    df: DataFrame,
    window_year_baseline: int = 5,
    smooth_days_baseline: int = 21,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    value_col: str = "value",
    time_col: str = "time",
) -> DataFrame:
    """Rolling climatology of the day-smoothed series (reference
    detect.py:1691-1800) — the shifting-baseline method's climatology
    table."""
    if time_col != "time":
        if "time" in df.columns:
            raise ConfigurationError(
                "input has both a 'time' column and a different "
                "time_col — rename one",
                details={"time_col": time_col},
            )
        df = df.withColumnRenamed(time_col, "time")
    return shifting_climatology(
        df, keys, window_year_baseline, smooth_days_baseline, value_col
    )


__all__ = [
    "compute_normalised_anomaly",
    "identify_extremes",
    "rolling_climatology",
    "smoothed_rolling_climatology",
]
