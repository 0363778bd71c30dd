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


@pytest.mark.parametrize("wrap_x", [True, False])
@pytest.mark.parametrize("radius", [1, 2])
def test_blocked_morphology_matches_relational(spark, wrap_x, radius):
    """The per-slice dense kernel (morph_close_open_blocked) must equal
    the pure-relational offset-explode closing+opening cell-for-cell —
    including the shore-protection edge rule and the periodic seam."""
    from marex_spark.operators.morphology import (
        binary_dilate,
        binary_erode,
        morph_close_open_blocked,
    )
    from marex_spark.sources.synthetic import synthetic_extremes_gridded

    ext = synthetic_extremes_gridded(spark, n_time=6, ny=12, nx=24)
    tc = ext.filter("extreme").select("time", "y", "x")
    closed = binary_erode(
        binary_dilate(tc, radius, 12, 24, wrap_x), radius, 12, 24, wrap_x
    )
    opened_rel = binary_dilate(
        binary_erode(closed, radius, 12, 24, wrap_x), radius, 12, 24, wrap_x
    )
    rel = {(r.time, r.y, r.x) for r in opened_rel.collect()}
    blk = {
        (r.time, r.y, r.x)
        for r in morph_close_open_blocked(tc, radius, 12, 24, wrap_x).collect()
    }
    assert rel == blk


def test_fill_holes_sparse_input_keeps_fillins(spark):
    """A sparse True-only input must come back with hole fill-ins as
    rows (the r3 full-join fix: a left join silently dropped every cell
    absent from the input frame)."""
    import datetime

    from marex_spark.operators.morphology import fill_holes

    t0 = datetime.datetime(2021, 1, 1)
    # a 5x5 ring with the centre missing: closing fills (2,2)
    rows = [
        (t0, y, x, True)
        for y in range(1, 4)
        for x in range(1, 4)
        if not (y == 2 and x == 2)
    ]
    df = spark.createDataFrame(rows, "time timestamp, y int, x int, extreme boolean")
    out = fill_holes(df, 1, 6, 6, wrap_x=False)
    cells = {(r.y, r.x) for r in out.filter("extreme").collect()}
    assert (2, 2) in cells


def test_preprocess_sparse_equals_dense(spark):
    """preprocess_extremes is density-agnostic: a sparse True-only
    input produces the same surviving cells as the densified field —
    in particular, temporal gap days with NO input row are still
    filled (fill_time_gaps_true_set GENERATES the rows; the dense-form
    flip can only touch rows that exist)."""
    from marex_spark.operators.track import preprocess_extremes

    ny = nx = 12
    blob = {(y, x) for y in range(3, 9) for x in range(3, 9)}
    days = [0, 1, 4, 5]  # gap of 2 (days 2, 3) between runs
    rows_sparse = [
        (T0 + datetime.timedelta(days=d), y, x, True)
        for d in days
        for (y, x) in blob
    ]
    # every timestep must exist somewhere for the day→time lookup:
    # give days 2 and 3 one unrelated distant True cell
    rows_sparse += [(T0 + datetime.timedelta(days=d), 0, 0, True) for d in (2, 3)]
    schema = "time timestamp, y int, x int, extreme boolean"
    sparse = spark.createDataFrame(rows_sparse, schema)
    dense = spark.createDataFrame(
        [
            (T0 + datetime.timedelta(days=d), y, x, (y, x) in blob or ((y, x) == (0, 0) and d in (2, 3)))
            for d in range(6)
            for y in range(ny)
            for x in range(nx)
        ],
        schema,
    )
    kw = dict(ny=ny, nx=nx, r_fill=2, t_fill=2, area_quartile=0.5, wrap_x=False)
    out_sparse = preprocess_extremes(sparse, **kw)
    out_dense = preprocess_extremes(dense, **kw)
    got_sparse = {
        (r.time, r.y, r.x) for r in out_sparse.filter("extreme").collect()
    }
    got_dense = {
        (r.time, r.y, r.x) for r in out_dense.filter("extreme").collect()
    }
    assert got_sparse == got_dense
    # the blob now persists through the gap days
    gap_day = T0 + datetime.timedelta(days=2)
    assert any(t == gap_day and (y, x) in blob for t, y, x in got_sparse)
