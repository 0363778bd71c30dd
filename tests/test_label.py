"""Unit tests for the labelling kernel (SURVEY §5 layer 1: kernel unit
tests — seam stitch, connectivity, determinism)."""

from __future__ import annotations

import numpy as np

from marex_spark.operators.label import _cc_edges, label_slice


def _grid_ids(cells, nx, **kw):
    ys = np.array([c[0] for c in cells])
    xs = np.array([c[1] for c in cells])
    return label_slice(ys, xs, nx=nx, **kw)


def test_single_blob():
    ids = _grid_ids([(0, 0), (0, 1), (1, 0), (1, 1)], nx=10)
    assert set(ids) == {1}


def test_two_blobs_separate():
    ids = _grid_ids([(0, 0), (0, 1), (5, 5), (5, 6)], nx=10)
    assert set(ids) == {1, 2}
    assert ids[0] == ids[1] == 1
    assert ids[2] == ids[3] == 2


def test_diagonal_8_vs_4():
    cells = [(0, 0), (1, 1)]
    assert set(_grid_ids(cells, nx=10, connectivity=8)) == {1}
    assert set(_grid_ids(cells, nx=10, connectivity=4)) == {1, 2}


def test_wrap_x_seam():
    # blob touching both lon edges on the same row: one object when wrapped
    cells = [(3, 0), (3, 9)]
    assert set(_grid_ids(cells, nx=10, wrap_x=True)) == {1}
    assert set(_grid_ids(cells, nx=10, wrap_x=False)) == {1, 2}


def test_wrap_x_diagonal_seam():
    cells = [(3, 0), (4, 9)]
    assert set(_grid_ids(cells, nx=10, wrap_x=True, connectivity=8)) == {1}
    assert set(_grid_ids(cells, nx=10, wrap_x=True, connectivity=4)) == {1, 2}


def test_label_determinism_and_order():
    # IDs ordered by min flat index of each component
    cells = [(5, 5), (0, 0), (9, 9), (0, 1)]
    ids = _grid_ids(cells, nx=12)
    # component containing (0,0) must get ID 1
    assert ids[1] == 1 and ids[3] == 1
    assert ids[0] == 2
    assert ids[2] == 3


def test_empty_slice():
    assert len(_grid_ids([], nx=10)) == 0


def test_cc_edges_chain_and_cycle():
    n = 6
    u = np.array([0, 1, 2, 4])
    v = np.array([1, 2, 0, 5])
    roots = _cc_edges(n, u, v)
    assert roots[0] == roots[1] == roots[2] == 0
    assert roots[3] == 3
    assert roots[4] == roots[5] == 4


def test_cc_edges_long_chain():
    # worst case for naive propagation: a path graph
    n = 500
    u = np.arange(n - 1)
    v = np.arange(1, n)
    roots = _cc_edges(n, u, v)
    assert (roots == 0).all()


def test_label_components_spark(spark):
    from pyspark.sql import functions as F

    from marex_spark.operators.label import label_components

    rows = []
    # t0: blob A (2 cells) + blob B (1 cell); t1: blob A moved by 1
    for t, cells in [(0, [(1, 1), (1, 2), (5, 5)]), (1, [(1, 2), (1, 3)])]:
        for y, x in cells:
            rows.append((f"2020-01-0{t+1}", y, x, True))
    df = spark.createDataFrame(
        rows, schema="time string, y int, x int, extreme boolean"
    ).withColumn("time", F.to_timestamp("time"))
    out = label_components(df, nx=10).collect()
    by_cell = {(r.time.day, r.y, r.x): r.obj_id for r in out}
    assert by_cell[(1, 1, 1)] == by_cell[(1, 1, 2)] == 1
    assert by_cell[(1, 5, 5)] == 2
    # t1 ids offset by max of t0 (=2)
    assert by_cell[(2, 1, 2)] == by_cell[(2, 1, 3)] == 3


def test_batch_kernel_matches_per_slice():
    """label_slices_batch == label_slice per slice, for random sparse
    multi-slice fields across both connectivities and wrap modes."""
    import numpy as np

    from marex_spark.operators.label import label_slice, label_slices_batch

    rng = np.random.default_rng(3)
    nx, ny_g = 12, 9
    for conn in (4, 8):
        for wrap in (True, False):
            ts, ys, xs = [], [], []
            for t in range(7):
                k = rng.integers(0, 30)
                cells = rng.choice(ny_g * nx, size=k, replace=False)
                ts += [t] * k
                ys += list(cells // nx)
                xs += list(cells % nx)
            tidx = np.array(ts, dtype=np.int64)
            ya = np.array(ys, dtype=np.int64)
            xa = np.array(xs, dtype=np.int64)
            # shuffle input order — ids must not depend on row order
            p = rng.permutation(len(tidx))
            tidx, ya, xa = tidx[p], ya[p], xa[p]
            got = label_slices_batch(tidx, ya, xa, nx=nx, connectivity=conn, wrap_x=wrap)
            for t in np.unique(tidx):
                m = tidx == t
                want = label_slice(ya[m], xa[m], nx=nx, connectivity=conn, wrap_x=wrap)
                assert got[m].tolist() == want.tolist(), (conn, wrap, t)
