"""P3 audit, coordinate unification (radians auto-detect), hobday
spatial pooling, and unstructured-keys detect (reference §3.2 setup
parity: track.py:919-976, detect.py:205-279, detect.py:2652-2668)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from marex_spark.functions.geometry import unify_coordinates
from marex_spark.operators.detect import audit_series, preprocess_data
from marex_spark.operators.threshold import hobday_threshold_hist


def test_audit_passes_clean_series(spark):
    df = spark.createDataFrame(
        [(1, 1, 5.0), (1, 1, 6.0), (2, 1, 7.0)], "y int, x int, value double"
    )
    out = audit_series(df)
    assert out == {"invalid": 0, "total": 3}


def test_audit_raises_with_report(spark):
    df = spark.createDataFrame(
        [(1, 1, float("nan")), (1, 1, 6.0)], "y int, x int, value double"
    )
    from marex_spark.exceptions import DataValidationError

    with pytest.raises(DataValidationError, match="audit failed"):
        audit_series(df)


def test_radians_autodetect(spark):
    df = spark.createDataFrame([(0.5, -1.2), (1.0, 3.0)], "lat double, lon double")
    out, was_rad = unify_coordinates(df)
    assert was_rad
    got = {(round(r.lat, 2), round(r.lon, 2)) for r in out.collect()}
    assert (round(math.degrees(0.5), 2), round(math.degrees(-1.2) % 360, 2)) in got


def test_degrees_passthrough_normalises_lon(spark):
    df = spark.createDataFrame([(45.0, -120.0)], "lat double, lon double")
    out, was_rad = unify_coordinates(df)
    assert not was_rad
    assert out.first().lon == 240.0


def test_hobday_spatial_pooling_smooths(spark):
    """5×5 pooling (W4): thresholds draw on neighbour histograms, so a
    lone hot cell's threshold drops toward its neighbours'."""
    from marex_spark.sources.synthetic import synthetic_sst_gridded
    from marex_spark.operators.climatology import anomaly_fixed_baseline, partition_by_cells

    series = synthetic_sst_gridded(spark, n_years=2, ny=6, nx=10)
    anom = anomaly_fixed_baseline(partition_by_cells(series))
    plain = hobday_threshold_hist(anom)
    pooled = hobday_threshold_hist(anom, spatial_window=5, nx=10, ny=6)
    n_plain = plain.count()
    n_pooled = pooled.count()
    assert n_pooled == n_plain  # same (doy, cell) coverage
    # pooling changes thresholds (draws on 25 cells, not 1)
    j = plain.withColumnRenamed("threshold", "t1").join(
        pooled.withColumnRenamed("threshold", "t2"), ["doy", "y", "x"]
    )
    n_diff = j.filter(F.abs(F.col("t1") - F.col("t2")) > 1e-9).count()
    assert n_diff > 0


def test_hobday_pooling_requires_nx(spark):
    from marex_spark.sources.synthetic import synthetic_sst_gridded
    from marex_spark.operators.climatology import anomaly_fixed_baseline

    series = synthetic_sst_gridded(spark, n_years=1, ny=4, nx=8)
    anom = anomaly_fixed_baseline(series)
    from marex_spark.exceptions import ConfigurationError

    with pytest.raises(ConfigurationError, match="needs nx"):
        hobday_threshold_hist(anom, spatial_window=5).count()


def test_hobday_pooled_extremes_frequency(spark):
    """End-to-end hobday with 5×5 pooling keeps the statistical gate."""
    from marex_spark.sources.synthetic import synthetic_sst_gridded
    from marex_spark.operators.climatology import anomaly_fixed_baseline, partition_by_cells
    from marex_spark.operators.threshold import identify_extremes

    series = synthetic_sst_gridded(spark, n_years=2, ny=6, nx=10)
    anom = anomaly_fixed_baseline(partition_by_cells(series))
    thr = hobday_threshold_hist(anom, spatial_window=5, nx=10, ny=6)
    ext = identify_extremes(anom, thr)
    frac = ext.filter("extreme").count() / ext.count()
    assert 0.02 <= frac <= 0.08, frac


def test_detect_on_unstructured_keys(spark):
    """preprocess_data is key-agnostic: (time, cell, value) works with
    keys=('cell',) — the unstructured detect path (detect.py:17-18)."""
    t = spark.range(1095).select(
        F.timestamp_add(
            "DAY", F.col("id").cast("int"), F.lit("2020-01-01").cast("timestamp")
        ).alias("time")
    )
    cells = spark.range(30).select(F.col("id").alias("cell"))
    series = t.crossJoin(cells).withColumn(
        "value",
        (F.pmod(F.xxhash64("time", "cell"), 1000) / 100.0).cast("float"),
    )
    det = preprocess_data(series, keys=("cell",), method_percentile="exact")
    frac = det.extremes.filter("extreme").count() / det.extremes.count()
    assert 0.03 <= frac <= 0.07


class TestDimensionsMapping:
    """dimensions= canonical->actual mapping (reference detect.py:131-220,
    track.py:119-127)."""

    def test_preprocess_data_with_renamed_columns(self, spark):
        from pyspark.sql import functions as F

        from marex_spark.operators.detect import preprocess_data
        from marex_spark.sources.synthetic import synthetic_sst_gridded

        base = synthetic_sst_gridded(spark, n_years=2, ny=4, nx=8)
        renamed = (
            base.withColumnRenamed("time", "t")
            .withColumnRenamed("y", "lat_idx")
            .withColumnRenamed("x", "lon_idx")
            .withColumnRenamed("value", "sst")
        )
        det_ref = preprocess_data(base, method_percentile="exact")
        det_map = preprocess_data(
            renamed,
            method_percentile="exact",
            dimensions={"time": "t", "y": "lat_idx", "x": "lon_idx", "value": "sst"},
        )
        n_ref = det_ref.extremes.filter(F.col("extreme")).count()
        n_map = det_map.extremes.filter(F.col("extreme")).count()
        det_ref.unpersist()
        det_map.unpersist()
        assert n_ref == n_map and n_ref > 0

    def test_missing_mapped_column_raises(self, spark):
        import pytest

        from marex_spark.datamodel import apply_dimensions
        from marex_spark.exceptions import CoordinateError

        df = spark.createDataFrame([(1, 2)], "a int, b int")
        with pytest.raises(CoordinateError, match="not found"):
            apply_dimensions(df, {"time": "nope"})

    def test_tracker_dimensions(self, spark):
        from pyspark.sql import functions as F

        from marex_spark.sources.synthetic import synthetic_extremes_gridded
        from marex_spark.tracker import tracker

        ext = synthetic_extremes_gridded(spark, n_time=4, ny=8, nx=16)
        renamed = ext.withColumnRenamed("time", "t").withColumnRenamed(
            "extreme", "is_hot"
        )
        t = tracker(
            renamed, ny=8, nx=16, R_fill=0, T_fill=0,
            area_filter_quartile=0.0, allow_merging=False,
            dimensions={"time": "t", "extreme": "is_hot"},
            # cell-conservation check — the reference's first-object
            # drop (Tracker default) would delete one object
            drop_first_object=False,
        )
        assert t.run().events.count() == ext.filter(F.col("extreme")).count()
