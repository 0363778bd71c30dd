"""Morphology unit tests (SURVEY M1/M2/M3 + A11/P6): analytic cases
mirroring the reference's fill_holes/fill_time_gaps semantics
(track.py:1520-1726) and the small-object percentile filter
(track.py:1755-1906)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from marex_spark.operators.morphology import (
    binary_dilate,
    binary_erode,
    dilate_unstructured,
    fill_holes,
    fill_time_gaps,
    filter_small_objects,
)

T0 = datetime.datetime(2020, 1, 1)


def _grid(spark, true_cells, ny=10, nx=10, t=T0):
    rows = [(t, y, x, (y, x) in true_cells) for y in range(ny) for x in range(nx)]
    return spark.createDataFrame(rows, "time timestamp, y int, x int, extreme boolean")


def test_closing_fills_hole(spark):
    block = {(y, x) for y in range(2, 7) for x in range(2, 7)} - {(4, 4)}
    df = _grid(spark, block)
    out = fill_holes(df, radius=1, ny=10, nx=10, wrap_x=False)
    got = {(r.y, r.x) for r in out.filter("extreme").collect()}
    assert (4, 4) in got


def test_opening_removes_speck(spark):
    block = {(y, x) for y in range(2, 7) for x in range(2, 7)} | {(9, 9)}
    df = _grid(spark, block)
    out = fill_holes(df, radius=1, ny=10, nx=10, wrap_x=False)
    got = {(r.y, r.x) for r in out.filter("extreme").collect()}
    assert (9, 9) not in got
    assert (4, 4) in got


def test_dilate_wraps_longitude(spark):
    df = _grid(spark, {(5, 0)})
    cells = df.filter("extreme").select("time", "y", "x")
    out = binary_dilate(cells, 1, ny=10, nx=10, wrap_x=True)
    got = {(r.y, r.x) for r in out.collect()}
    assert (5, 9) in got  # wrapped west neighbour
    out_nw = binary_dilate(cells, 1, ny=10, nx=10, wrap_x=False)
    got_nw = {(r.y, r.x) for r in out_nw.collect()}
    assert (5, 9) not in got_nw


def test_erode_is_dilate_dual(spark):
    """erode(X) ⊆ X ⊆ dilate(X); erode shrinks a solid block by R."""
    block = {(y, x) for y in range(2, 8) for x in range(2, 8)}
    cells = _grid(spark, block).filter("extreme").select("time", "y", "x")
    er = {(r.y, r.x) for r in binary_erode(cells, 1, 10, 10, wrap_x=False).collect()}
    assert er < block
    assert (4, 4) in er and (2, 2) not in er


def test_fill_time_gaps_threshold(spark):
    rows = [
        (T0 + datetime.timedelta(days=i), 0, 0, i in (0, 4)) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "time timestamp, y int, x int, extreme boolean")
    f3 = {r.time.day: r.extreme for r in fill_time_gaps(df, 3).collect()}
    assert f3[2] and f3[3] and f3[4]
    f2 = {r.time.day: r.extreme for r in fill_time_gaps(df, 2).collect()}
    assert not f2[2]


def test_dilate_unstructured_hops(spark):
    # path graph 0-1-2-3-4; seed {0}; radius 2 → {0,1,2}
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "cell long, nbr long"
    )
    base = spark.createDataFrame([(1, 0)], "t int, cell long")
    out = {r.cell for r in dilate_unstructured(base, edges, 2, time_col="t").collect()}
    assert out == {0, 1, 2}


def test_filter_small_objects_drops_below_median(spark):
    big = {(y, x) for y in range(1, 5) for x in range(1, 5)}  # 16 cells
    small = {(8, 8)}  # 1 cell
    df = _grid(spark, big | small)
    out = filter_small_objects(df, nx=10, area_quartile=0.5, wrap_x=False)
    got = {(r.y, r.x) for r in out.filter("extreme").collect()}
    assert got == big
