"""Detect orchestrator — the Spark ``preprocess_data`` (reference
detect.py:287-841): raw long-format series → anomaly → percentile
threshold → boolean extreme field.

Method dispatch mirrors detect.py:1079-1099 (anomaly) and
detect.py:1119-1203 (extremes); parameter defaults follow the
reference's (q=0.95, precision=0.01, max_anomaly=5.0, window 11 days,
21-day smoother, 5-year shifting window).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Window

from marex_spark.operators.climatology import (
    DEFAULT_KEYS,
    anomaly_detrend_fixed_baseline,
    anomaly_detrend_harmonic,
    anomaly_fixed_baseline,
    anomaly_shifting_baseline,
    normalise_by_doy_std,
    partition_by_cells,
)
from marex_spark.operators.threshold import (
    global_threshold_approx,
    global_threshold_exact,
    global_threshold_hist,
    hobday_threshold_exact,
    hobday_threshold_hist,
    identify_extremes,
)

def audit_series(
    df: DataFrame,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    value_col: str = "value",
    max_invalid_fraction: float = 0.05,
) -> dict:
    """P3 validation scan (detect.py:205-279): count invalid samples per
    location; raise with a report when any cell exceeds the tolerated
    invalid fraction. One aggregation job, driver-side assert — the
    same contract as the reference's NaN audit."""
    invalid = F.sum(
        F.when(F.col(value_col).isNull() | F.isnan(value_col), 1).otherwise(0)
    )
    per_cell = df.groupBy(*keys).agg(
        invalid.alias("n_invalid"), F.count("*").alias("n_total")
    )
    bad = per_cell.filter(
        F.col("n_invalid") > max_invalid_fraction * F.col("n_total")
    )
    worst = bad.orderBy(F.desc("n_invalid")).limit(5).collect()
    summary = per_cell.agg(
        F.sum("n_invalid").alias("invalid"), F.sum("n_total").alias("total")
    ).first()
    if worst:
        from marex_spark.exceptions import DataValidationError

        raise DataValidationError(
            f"series audit failed: {len(worst)}+ cells exceed "
            f"{max_invalid_fraction:.0%} invalid",
            details={
                "worst": ", ".join(
                    f"{tuple(r[k] for k in keys)}={r.n_invalid}/{r.n_total}"
                    for r in worst
                ),
                "max_invalid_fraction": max_invalid_fraction,
            },
            suggestions=[
                "mask or fill the flagged cells before detect",
                "raise max_invalid_fraction if the gaps are expected (ice/QC)",
            ],
        )
    return {"invalid": summary.invalid, "total": summary.total}


ANOMALY_METHODS = (
    "fixed_baseline",
    "shifting_baseline",
    "detrend_harmonic",
    "detrend_fixed_baseline",
)
EXTREME_METHODS = ("global_extreme", "hobday_extreme")


@dataclass
class DetectResult:
    extremes: DataFrame  # (time, keys..., value, anomaly, threshold, extreme)
    thresholds: DataFrame
    params: dict
    # the internally persisted anomaly frame, if any — callers should
    # ``unpersist()`` once extremes are materialised, else repeated
    # preprocess_data calls in one session accumulate cached blocks
    persisted: DataFrame | None = None
    # std_normalise=True outputs (reference detect.py:686-716): the
    # same extreme identification run on the STD-normalised anomaly
    extremes_stn: DataFrame | None = None
    thresholds_stn: DataFrame | None = None

    def unpersist(self) -> None:
        if self.persisted is not None:
            self.persisted.unpersist()
            self.persisted = None


def preprocess_data(
    df: DataFrame,
    method_anomaly: str = "fixed_baseline",
    method_extreme: str = "global_extreme",
    method_percentile: str = "exact",  # exact | histogram | approx (GK sketch)
    threshold_percentile: float = 0.95,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    window_year_baseline: int = 5,
    smooth_days: int = 21,
    n_harmonics: int = 2,
    window_days_hobday: int = 11,
    precision: float = 0.01,
    max_anomaly: float = 5.0,
    time_col: str = "time",
    value_col: str = "value",
    checkpoint: bool = False,
    detrend_orders: tuple[int, ...] = (1,),
    force_zero_mean: bool = False,
    std_normalise: bool = False,
    window_spatial_hobday: int | None = None,
    nx: int | None = None,
    ny: int | None = None,
    reference_period: tuple[int, int] | None = None,
    dimensions: dict | None = None,
    validate_data: bool = False,
) -> DetectResult:
    """Raw series → boolean extremes. Drops null/NaN values first
    (P2 validity predicate, detect.py:222).

    Physical strategy: ONE shuffle for the whole pipeline. The input is
    hash-partitioned by cell up front; every later stage — climatology
    window, smoothing window, threshold aggregation, compare join — is
    partition-local (window frames / aggs whose keys contain the cell
    key, joins co-partitioned on it). Where the anomaly sub-plan feeds
    both the threshold and the compare, Catalyst's ReusedExchange
    dedupes the shuffle; ``checkpoint=True`` materialises it instead
    (the reference's post-anomaly zarr checkpoint, detect.py:646-648).
    """
    from marex_spark.exceptions import ConfigurationError

    if method_anomaly not in ANOMALY_METHODS:
        raise ConfigurationError(
            "unknown method_anomaly",
            details={"got": method_anomaly, "valid": ANOMALY_METHODS},
        )
    if method_extreme not in EXTREME_METHODS:
        raise ConfigurationError(
            "unknown method_extreme",
            details={"got": method_extreme, "valid": EXTREME_METHODS},
        )
    if window_spatial_hobday is not None:
        # reference validation (detect.py:1360-1430): hobday-only,
        # histogram-only, structured grids only
        if method_extreme != "hobday_extreme":
            raise ConfigurationError(
                "window_spatial_hobday can only be used with "
                "method_extreme='hobday_extreme'",
                details={"method_extreme": method_extreme},
            )
        if method_percentile == "exact":
            raise ConfigurationError(
                "window_spatial_hobday is not supported with "
                "method_percentile='exact'",
                details={"method_percentile": method_percentile},
            )
        if keys != ("y", "x"):
            raise ConfigurationError(
                "window_spatial_hobday is not supported for unstructured "
                "grids",
                details={"keys": keys},
            )
        if nx is None or ny is None:
            raise ConfigurationError(
                "window_spatial_hobday needs nx and ny",
                details={"nx": nx, "ny": ny},
            )

    if std_normalise and method_anomaly != "detrend_harmonic":
        # reference detect.py:299 documents std_normalise as a
        # detrend_harmonic-only knob; silently returning None outputs
        # would surface as a confusing downstream failure
        raise ConfigurationError(
            "std_normalise is only supported with "
            "method_anomaly='detrend_harmonic'",
            details={"method_anomaly": method_anomaly},
        )
    if reference_period is not None and method_anomaly not in (
        "fixed_baseline",
        "detrend_fixed_baseline",
    ):
        # reference validation (detect.py:570-577)
        raise ConfigurationError(
            f"reference_period is not supported for "
            f"method_anomaly='{method_anomaly}'",
            details={
                "reference_period": reference_period,
                "valid_methods": ("fixed_baseline", "detrend_fixed_baseline"),
            },
            suggestions=["Remove the reference_period parameter, or "
                         "use a fixed-baseline anomaly method"],
        )

    if dimensions is not None:
        # reference detect.py:131-220: canonical->actual name mapping;
        # after renaming, the canonical names drive the whole pipeline
        from marex_spark.datamodel import apply_dimensions

        df = apply_dimensions(
            df, dimensions, unstructured=keys == ("cell",),
            require=(*keys, "time", "value"),
        )
        time_col, value_col = "time", "value"

    clean = df.filter(F.col(value_col).isNotNull() & ~F.isnan(value_col))
    clean = partition_by_cells(clean, keys)

    if validate_data and method_anomaly == "shifting_baseline":
        # reference sufficiency check (detect.py:614-636): the dataset
        # must span at least window_year_baseline years or every year
        # is trimmed as baseline warm-up and the output is empty.
        # Opt-in here (validate_data=True) because the reference reads
        # the in-memory time axis for free while this is an eager
        # Spark job over the time column; the default stays lazy —
        # short inputs then yield the same empty-after-trim result the
        # shifting-climatology filter produces.
        from marex_spark.exceptions import DataValidationError

        yr = F.year(time_col)
        mn, mx = clean.agg(F.min(yr), F.max(yr)).first()
        total_years = 0 if mn is None else int(mx) - int(mn) + 1
        if total_years < window_year_baseline:
            raise DataValidationError(
                "Insufficient data for shifting_baseline method",
                details={
                    "available_years": total_years,
                    "required_years": window_year_baseline,
                },
                suggestions=[
                    "Use more years of data to meet minimum requirement",
                    f"Reduce window_year_baseline parameter "
                    f"(currently {window_year_baseline})",
                    "Consider using detrend_fixed_baseline or "
                    "detrend_harmonic method instead",
                ],
            )

    if method_anomaly == "fixed_baseline":
        anom = anomaly_fixed_baseline(
            clean, keys, value_col, reference_period=reference_period
        )
    elif method_anomaly == "shifting_baseline":
        anom = anomaly_shifting_baseline(
            clean, keys, window_year_baseline, smooth_days, value_col
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

    if checkpoint:
        anom = anom.localCheckpoint()

    exact = method_percentile == "exact"
    persisted = None
    if not (method_extreme == "global_extreme" and exact) and not checkpoint:
        # the anomaly feeds both the threshold agg and the compare join;
        # persist (lazy, partitioning-preserving) beats recompute and
        # beats an eager checkpoint — AQE's exchange reuse alone doesn't
        # dedupe the window re-evaluation above the shared shuffle
        from pyspark.storagelevel import StorageLevel

        anom = persisted = anom.persist(StorageLevel.MEMORY_AND_DISK)
    def _identify(a: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Threshold + compare for one anomaly frame — shared by the
        primary output and the std_normalise variant."""
        if method_extreme == "global_extreme" and exact:
            # Fully fused: the per-cell quantile is a full-frame window
            # over the cell partition — zero joins, zero extra shuffles.
            w = Window.partitionBy(*keys)
            ext = a.withColumn(
                "threshold",
                F.percentile("anomaly", F.lit(threshold_percentile)).over(w),
            ).withColumn("extreme", F.col("anomaly") >= F.col("threshold"))
            return ext, ext.select(*keys, "threshold").dropDuplicates(list(keys))
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
                hobday_threshold_exact(
                    a, keys, threshold_percentile, window_days_hobday
                )
                if exact
                else hobday_threshold_hist(
                    a,
                    keys,
                    threshold_percentile,
                    window_days_hobday,
                    precision,
                    max_anomaly,
                    spatial_window=window_spatial_hobday or 0,
                    nx=nx,
                    ny=ny,
                )
            )
        return identify_extremes(a, t, keys), t

    extremes, thr = _identify(anom)
    ext_stn = thr_stn = None
    if std_normalise and method_anomaly == "detrend_harmonic":
        # reference detect.py:686-716: the SAME extreme identification
        # over the STD-normalised anomaly, as additional outputs
        stn = (
            normalise_by_doy_std(anom, keys)
            .drop("anomaly", "std_doy")
            .withColumnRenamed("anomaly_norm", "anomaly")
        )
        ext_stn, thr_stn = _identify(stn)
    return DetectResult(
        extremes=extremes,
        thresholds=thr,
        params={
            "method_anomaly": method_anomaly,
            "method_extreme": method_extreme,
            "method_percentile": method_percentile,
            "threshold_percentile": threshold_percentile,
            "std_normalise": std_normalise,
        },
        persisted=persisted,
        extremes_stn=ext_stn,
        thresholds_stn=thr_stn,
    )
