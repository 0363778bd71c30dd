"""Statistical-parity tests for the detect pipeline (SURVEY §5 layer 2:
frequency ≈ tail mass within binomial tolerance — the reference's own
philosophy, tests/conftest.py:168-232)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from marex_spark.operators.detect import preprocess_data
from marex_spark.sources.synthetic import synthetic_sst_gridded


@pytest.fixture(scope="module")
def sst(spark):
    # 3 years × 10 × 20 grid = ~219k rows; cached for all method combos
    df = synthetic_sst_gridded(spark, n_years=3, ny=10, nx=20).cache()
    df.count()
    return df


def _discrete_tail(q, n_samples):
    """Expected exceedance of a type-7 (linear-interp) percentile computed
    from n samples, evaluated on those same samples: order stats strictly
    above position (n-1)q+1 all satisfy v >= threshold."""
    return (n_samples - math.floor((n_samples - 1) * q + 1)) / n_samples


def _assert_freq(extremes, q, tol_sigma=4.0, n_samples=None):
    agg = extremes.agg(
        F.count("*").alias("n"),
        F.sum(F.col("extreme").cast("int")).alias("k"),
    ).collect()[0]
    p = _discrete_tail(q, n_samples) if n_samples else 1.0 - q
    freq = agg.k / agg.n
    sigma = math.sqrt(p * (1 - p) / agg.n)
    assert abs(freq - p) < tol_sigma * sigma + 0.01, (freq, p, agg.n)


@pytest.mark.parametrize("percentile_method", ["exact", "histogram"])
def test_fixed_global_frequency(sst, percentile_method):
    res = preprocess_data(
        sst,
        method_anomaly="fixed_baseline",
        method_extreme="global_extreme",
        method_percentile=percentile_method,
        threshold_percentile=0.9,
    )
    _assert_freq(res.extremes, 0.9)


@pytest.mark.parametrize("percentile_method", ["exact", "histogram"])
def test_fixed_hobday_frequency(sst, percentile_method):
    res = preprocess_data(
        sst,
        method_anomaly="fixed_baseline",
        method_extreme="hobday_extreme",
        method_percentile=percentile_method,
        threshold_percentile=0.9,
    )
    # hobday thresholds come from 3 years × 11-day window = 33 samples;
    # the discrete tail of a 33-sample type-7 percentile is 4/33, not 0.1
    n = 3 * 11 if percentile_method == "exact" else None
    _assert_freq(res.extremes, 0.9, n_samples=n)


def test_detrend_harmonic_frequency(sst):
    res = preprocess_data(
        sst,
        method_anomaly="detrend_harmonic",
        method_extreme="global_extreme",
        threshold_percentile=0.9,
    )
    _assert_freq(res.extremes, 0.9)


def test_shifting_baseline_trims_first_years(spark):
    df = synthetic_sst_gridded(spark, n_years=4, ny=4, nx=6)
    res = preprocess_data(
        df,
        method_anomaly="shifting_baseline",
        method_extreme="global_extreme",
        threshold_percentile=0.9,
        window_year_baseline=2,
    )
    years = sorted(
        r[0] for r in res.extremes.select(F.year("time")).distinct().collect()
    )
    # first `window_year_baseline` years have no climatology → dropped
    assert years[0] == 2002
    _assert_freq(res.extremes, 0.9)


def test_hobday_threshold_has_doy_key(sst):
    res = preprocess_data(
        sst, method_extreme="hobday_extreme", threshold_percentile=0.9
    )
    assert "doy" in res.thresholds.columns
    n_doy = res.thresholds.select("doy").distinct().count()
    assert 360 <= n_doy <= 366


def test_global_threshold_spatial_key_only(sst):
    res = preprocess_data(
        sst, method_extreme="global_extreme", threshold_percentile=0.9
    )
    assert set(res.thresholds.columns) == {"y", "x", "threshold"}


def test_histogram_vs_exact_threshold_close(sst):
    """Approx-vs-exact threshold error small (BASELINE.md: ~0.005 at
    precision=0.01)."""
    exact = preprocess_data(
        sst, method_percentile="exact", threshold_percentile=0.9
    ).thresholds
    hist = preprocess_data(
        sst, method_percentile="histogram", threshold_percentile=0.9
    ).thresholds
    joined = exact.withColumnRenamed("threshold", "t_exact").join(
        hist.withColumnRenamed("threshold", "t_hist"), ["y", "x"]
    )
    stats = joined.agg(
        F.max(F.abs(F.col("t_exact") - F.col("t_hist"))).alias("max_err")
    ).collect()[0]
    assert stats.max_err < 0.05, stats.max_err


def test_invalid_method_raises(sst):
    from marex_spark.exceptions import ConfigurationError, MarexSparkError

    with pytest.raises(ConfigurationError):
        preprocess_data(sst, method_anomaly="nope")
    with pytest.raises(MarexSparkError):  # typed hierarchy: base catches
        preprocess_data(sst, method_extreme="nope")


def test_approx_threshold_close_to_exact(spark):
    """The Spark-native sketch tier (percentile_approx) must land
    within histogram-precision distance of the exact per-cell
    thresholds."""
    from marex_spark.operators.climatology import (
        anomaly_fixed_baseline,
        partition_by_cells,
    )
    from marex_spark.operators.threshold import (
        global_threshold_approx,
        global_threshold_exact,
    )
    from marex_spark.sources.synthetic import synthetic_sst_gridded

    series = synthetic_sst_gridded(spark, n_years=2, ny=6, nx=10)
    anom = anomaly_fixed_baseline(partition_by_cells(series))
    exact = {(r.y, r.x): r.threshold for r in global_threshold_exact(anom).collect()}
    approx = {(r.y, r.x): r.threshold for r in global_threshold_approx(anom).collect()}
    assert set(exact) == set(approx)
    for k in exact:
        assert abs(exact[k] - approx[k]) < 0.05, (k, exact[k], approx[k])


def test_std_normalise_outputs(spark):
    """std_normalise=True (detrend_harmonic only, reference
    detect.py:686-716): additional standardised extremes/thresholds
    alongside the primary outputs; the standardised extreme frequency
    stays in the same percentile band."""
    from marex_spark.sources.synthetic import synthetic_sst_gridded

    series = synthetic_sst_gridded(spark, n_years=2, ny=6, nx=10)
    det = preprocess_data(
        series,
        method_anomaly="detrend_harmonic",
        method_percentile="exact",
        std_normalise=True,
    )
    assert det.extremes_stn is not None and det.thresholds_stn is not None
    n_total = series.count()
    frac = det.extremes_stn.filter("extreme").count() / n_total
    assert 0.03 <= frac <= 0.07, frac
    # primary outputs unaffected
    frac0 = det.extremes.filter("extreme").count() / n_total
    assert 0.03 <= frac0 <= 0.07, frac0
    det.unpersist()


def test_decimal_year_reference_pins(spark):
    """Reference add_decimal_year pins (tests/test_detect_helpers.py:
    20-72, against detect.py:2031-2058): Jan 1 is exactly the integer
    year, Dec 31 of leap 2020 is 2020 + 365/366, Dec 31 of non-leap
    2021 is 2021 + 364/365, and mid-year lands in (year+0.4,
    year+0.5) — evaluated through the SQL decimal_year the harmonic
    design matrix uses, and cross-checked bit-for-bit against the
    blocked kernel's numpy _decimal_year."""
    import numpy as np

    from marex_spark.functions.temporal import decimal_year
    from marex_spark.operators.detect_blocked import _decimal_year

    df = spark.createDataFrame(
        [("2020-01-01",), ("2020-06-01",), ("2020-12-31",),
         ("2021-01-01",), ("2021-12-31",), ("1900-12-31",)],
        "d string",
    ).select(decimal_year(F.to_date("d")).alias("dy"))
    vals = [r.dy for r in df.collect()]
    assert np.isclose(vals[0], 2020.0, atol=1e-9)
    assert np.isclose(vals[2], 2020.0 + 365 / 366, atol=1e-9)
    assert 2020.4 < vals[1] < 2020.5
    assert np.isclose(vals[3], 2021.0, atol=1e-9)
    assert np.isclose(vals[4], 2021.0 + 364 / 365, atol=1e-9)
    # 1900: divisible by 100, not 400 → NOT leap → 364/365
    assert np.isclose(vals[5], 1900.0 + 364 / 365, atol=1e-9)

    # SQL form == blocked-kernel numpy form, same inputs
    doy0 = np.array([0, 152, 365, 0, 364, 364], dtype=float)
    years = np.array([2020, 2020, 2020, 2021, 2021, 1900], dtype=float)
    np.testing.assert_allclose(_decimal_year(doy0, years), vals, rtol=0, atol=1e-12)


def test_shifting_baseline_insufficient_data(spark, sst):
    """Reference test_shifting_baseline_insufficient_data
    (tests/test_error_handling.py:137-166, detect.py:614-636): with
    validate_data=True a dataset spanning fewer years than
    window_year_baseline raises DataValidationError naming both
    counts; the lazy default instead yields the reference's same
    empty-after-trim result."""
    from marex_spark.exceptions import DataValidationError

    with pytest.raises(DataValidationError, match="Insufficient data"):
        preprocess_data(
            sst,
            method_anomaly="shifting_baseline",
            method_extreme="global_extreme",
            window_year_baseline=15,  # 3-year fixture
            validate_data=True,
        )
    # lazy default: no error, empty extremes (all years are warm-up)
    res = preprocess_data(
        sst,
        method_anomaly="shifting_baseline",
        method_extreme="global_extreme",
        window_year_baseline=15,
    )
    assert res.extremes.count() == 0
