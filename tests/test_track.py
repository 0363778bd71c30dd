"""End-to-end tracking tests (SURVEY §5 layer 3): the analytic moving
blob — centroid must follow the known path within 0.5° lon / 0.25° lat
(reference tests/test_gridded_tracking.py:587-683) — plus clumped-field
invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marex_spark.operators.track import track_events
from marex_spark.sources.synthetic import (
    grid_dims,
    synthetic_extremes_gridded,
    synthetic_moving_blob,
)

# 1° grid: fine enough that the symmetric blob's discrete centroid
# tracks the analytic path within the reference tolerances
NY, NX = 180, 360


@pytest.fixture(scope="module")
def blob_result(spark):
    blob = synthetic_moving_blob(spark, n_time=20, ny=NY, nx=NX)
    gy = spark.range(NY).select(
        F.col("id").cast("int").alias("y"),
        (-90.0 + (F.col("id") + 0.5) * (180.0 / NY)).alias("lat"),
    )
    gx = spark.range(NX).select(
        F.col("id").cast("int").alias("x"),
        ((F.col("id") + 0.5) * (360.0 / NX)).alias("lon"),
    )
    return track_events(blob, nx=NX, grid_y=gy, grid_x=gx)


def test_blob_single_event(blob_result):
    n_events = blob_result.events.select("event_id").distinct().count()
    assert n_events == 1


def test_blob_duration(blob_result):
    life = blob_result.lifetime_stats.collect()[0]
    assert life.n_timesteps == 20


def test_blob_centroid_follows_analytic_path(blob_result):
    rows = blob_result.timestep_stats.orderBy("time").collect()
    t0 = rows[0].time
    for r in rows:
        t = (r.time - t0).days
        expected_lon = (170.0 + 3.0 * t) % 360.0
        dlon = abs(r.centroid_lon - expected_lon)
        dlon = min(dlon, 360.0 - dlon)
        assert dlon <= 0.5, (t, r.centroid_lon, expected_lon)
        assert abs(r.centroid_lat - 0.0) <= 0.25, (t, r.centroid_lat)


def test_blob_crosses_dateline(blob_result):
    """The blob starts at 170°E and drifts east across 180° — the wrap
    seam must not split it (periodic-x labelling + Cartesian centroid)."""
    lons = [r.centroid_lon for r in blob_result.timestep_stats.collect()]
    assert any(l > 175.0 for l in lons) and any(l < 185.0 for l in lons)
    n_events = blob_result.events.select("event_id").distinct().count()
    assert n_events == 1


def test_clumped_field_tracks(spark):
    ext = synthetic_extremes_gridded(spark, n_time=12, ny=24, nx=48)
    res = track_events(ext, nx=48, compute_stats=False)
    n_events = res.events.select("event_id").distinct().count()
    n_objects = res.events.select("obj_id").distinct().count()
    assert 0 < n_events <= n_objects
    # every cell keeps exactly one event id
    dup = (
        res.events.groupBy("time", "y", "x")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_overlap_threshold_splits_weak_links(spark):
    ext = synthetic_extremes_gridded(spark, n_time=12, ny=24, nx=48)
    loose = track_events(ext, nx=48, compute_stats=False)
    strict = track_events(
        ext, nx=48, overlap_threshold=0.9, compute_stats=False
    )
    n_loose = loose.events.select("event_id").distinct().count()
    n_strict = strict.events.select("event_id").distinct().count()
    assert n_strict >= n_loose
