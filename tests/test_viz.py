"""plotX-equivalent data layer (marex_spark/viz.py): snapshot grids,
robust limits, dateline-unwrapped trajectories, animation frames."""

from __future__ import annotations

import datetime

import numpy as np
from pyspark.sql import functions as F

from marex_spark.viz import (
    animation_frames,
    clim_robust_limits,
    event_snapshot,
    snapshot_grid,
    trajectories,
)


def test_snapshot_grid_dense_and_gaps(spark):
    t0 = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0, 0, 0, 1.5), (t0, 1, 2, -2.0), (t0 + datetime.timedelta(days=1), 0, 1, 9.0)],
        "time timestamp, y int, x int, value double",
    )
    g = snapshot_grid(df, t0, ny=2, nx=3)
    assert g[0, 0] == 1.5 and g[1, 2] == -2.0
    assert np.isnan(g[0, 1])  # gap
    assert np.isnan(g).sum() == 4  # day-2 row excluded


def test_event_snapshot_ids(spark):
    t0 = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(t0, 0, 1, 7), (t0, 1, 0, 9)], "time timestamp, y int, x int, event_id long"
    )
    g = event_snapshot(ev, t0, ny=2, nx=2)
    assert g[0, 1] == 7 and g[1, 0] == 9 and g[0, 0] == 0


def test_clim_robust_limits_matches_numpy(spark):
    vals = [float(v) for v in range(101)]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    lo, hi = clim_robust_limits(df)
    assert abs(lo - np.percentile(vals, 2)) < 1e-9
    assert abs(hi - np.percentile(vals, 98)) < 1e-9


def test_trajectory_unwrap_dateline(spark):
    """An eastward path crossing 360→0 must unwrap monotonically."""
    t0 = datetime.datetime(2024, 1, 1)
    lons = [350.0, 358.0, 2.0, 10.0]  # crosses the seam between rows 2-3
    rows = [
        (1, t0 + datetime.timedelta(days=i), lon, 0.0)
        for i, lon in enumerate(lons)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, time timestamp, centroid_lon double, centroid_lat double"
    )
    out = {
        r.time.day: r.lon_unwrapped
        for r in trajectories(df).collect()
    }
    assert [out[d] for d in (1, 2, 3, 4)] == [350.0, 358.0, 362.0, 370.0]


def test_animation_frames_in_time_order(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (t0 + datetime.timedelta(days=d), 0, 0, float(d)) for d in (2, 0, 1)
    ]
    df = spark.createDataFrame(rows, "time timestamp, y int, x int, value double")
    frames = list(animation_frames(df, ny=1, nx=1))
    assert [t.day for t, _ in frames] == [1, 2, 3]
    assert [g[0, 0] for _, g in frames] == [0.0, 1.0, 2.0]
