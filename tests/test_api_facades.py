"""Reference-named standalone entry points (marEx.__all__ parity):
compute_normalised_anomaly / identify_extremes / rolling_climatology /
smoothed_rolling_climatology / wrap_exception."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import marex_spark as mx
from marex_spark.api import (
    compute_normalised_anomaly,
    identify_extremes,
    rolling_climatology,
    smoothed_rolling_climatology,
)
from marex_spark.operators.detect import preprocess_data
from marex_spark.sources.synthetic import synthetic_sst_gridded


@pytest.fixture(scope="module")
def sst(spark):
    return synthetic_sst_gridded(spark, n_years=4, ny=6, nx=8).localCheckpoint()


def test_two_stage_equals_fused_pipeline(spark, sst):
    """compute_normalised_anomaly + identify_extremes == preprocess_data."""
    anom = compute_normalised_anomaly(sst, method_anomaly="fixed_baseline")
    ext, thr = identify_extremes(
        anom, method_extreme="global_extreme", method_percentile="exact",
        threshold_percentile=0.9,
    )
    two_stage = {
        (r.time, r.y, r.x)
        for r in ext.filter(F.col("extreme")).select("time", "y", "x").collect()
    }
    det = preprocess_data(
        sst, method_anomaly="fixed_baseline", method_extreme="global_extreme",
        method_percentile="exact", threshold_percentile=0.9,
    )
    fused = {
        (r.time, r.y, r.x)
        for r in det.extremes.filter(F.col("extreme"))
        .select("time", "y", "x").collect()
    }
    det.unpersist()
    assert two_stage == fused and len(fused) > 0
    assert thr.count() == 6 * 8


def test_std_normalise_column(spark, sst):
    anom = compute_normalised_anomaly(
        sst, method_anomaly="detrend_harmonic", std_normalise=True
    )
    assert "anomaly_stn" in anom.columns
    with pytest.raises(mx.exceptions.ConfigurationError):
        compute_normalised_anomaly(
            sst, method_anomaly="fixed_baseline", std_normalise=True
        )


def test_rolling_climatology_unsmoothed_vs_smoothed(spark, sst):
    raw = rolling_climatology(sst, window_year_baseline=2)
    sm = smoothed_rolling_climatology(
        sst, window_year_baseline=2, smooth_days_baseline=21
    )
    assert set(raw.columns) == set(sm.columns) == {"target_year", "doy", "y", "x", "clim"}
    # the smoother changes values but not the table shape
    assert raw.count() == sm.count()
    joined = raw.withColumnRenamed("clim", "c_raw").join(
        sm, ["target_year", "doy", "y", "x"]
    )
    diff = joined.filter(F.abs(F.col("c_raw") - F.col("clim")) > 1e-9).count()
    assert diff > 0


def test_wrap_exception():
    from marex_spark.exceptions import (
        DataValidationError,
        MarExError,
        ProcessingError,
        wrap_exception,
    )

    e = wrap_exception(ValueError("boom"))
    assert isinstance(e, ProcessingError)
    assert isinstance(e, MarExError)
    assert e.__cause__.__class__ is ValueError
    # typed errors pass through
    orig = DataValidationError("x")
    assert wrap_exception(orig) is orig
    # custom target type
    assert isinstance(
        wrap_exception(KeyError("k"), exception_type=DataValidationError),
        DataValidationError,
    )


def test_top_level_all_parity():
    """Every name in the reference's __all__ resolves here (modulo the
    documented dask->spark rename)."""
    names = [
        "preprocess_data", "compute_normalised_anomaly",
        "smoothed_rolling_climatology", "rolling_climatology",
        "identify_extremes", "tracker", "regional_tracker",
        "specify_grid", "PlotConfig", "MarExError", "DataValidationError",
        "CoordinateError", "ProcessingError", "ConfigurationError",
        "DependencyError", "TrackingError", "VisualisationError",
        "create_data_validation_error", "create_coordinate_error",
        "create_processing_error", "wrap_exception", "has_dependency",
        "print_dependency_status", "get_installation_profile",
        "configure_logging", "set_verbose_mode", "set_quiet_mode",
        "set_normal_logging", "get_verbosity_level", "is_verbose_mode",
        "is_quiet_mode", "get_logger",
        "configure_spark",  # the configure_dask analogue
    ]
    import marex_spark
    from marex_spark import exceptions as exc

    for n in names:
        try:
            getattr(marex_spark, n)
        except AttributeError:
            assert hasattr(exc, n), f"missing top-level name: {n}"


def test_top_level_pipeline_operator_exports():
    """The round-7 parameterised LLM-pipeline operators are first-class
    top-level API (lazy map in marex_spark/__init__.py)."""
    import marex_spark

    for n in (
        "bloom_geometry",
        "bloom_fit",
        "bloom_decontaminate",
        "semdedup",
        "bloom_decontaminate_stream",
        "domain_top_n",
        "theta_distinct",
        "theta_survivors",
        "theta_estimate",
    ):
        assert callable(getattr(marex_spark, n)), n
