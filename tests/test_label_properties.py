"""Property-based tests (hypothesis) for the per-slice labelling kernel
— the engine's most load-bearing numpy code. Checked against a
plain BFS reference on random sparse grids, plus invariance properties
(row-order determinism, x-shift isomorphism under wrap)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from marex_spark.operators.label import label_slice

NY, NX = 8, 12


def _bfs_components(cells: set, nx: int, connectivity: int, wrap: bool) -> dict:
    """Reference labelling: BFS flood fill, components keyed by min
    (y * (nx + 2) + x) flat key, labels 1..k in key order."""
    offs = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    if connectivity == 8:
        offs += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    seen = {}
    comps = []
    for start in cells:
        if start in seen:
            continue
        comp = set()
        stack = [start]
        seen[start] = True
        while stack:
            y, x = stack.pop()
            comp.add((y, x))
            for dy, dx in offs:
                ny_, nx_ = y + dy, x + dx
                if wrap:
                    nx_ %= nx
                nb = (ny_, nx_)
                if nb in cells and nb not in seen:
                    seen[nb] = True
                    stack.append(nb)
        comps.append(comp)
    comps.sort(key=lambda c: min(y * (nx + 2) + x for y, x in c))
    return {cell: i + 1 for i, comp in enumerate(comps) for cell in comp}


cells_strategy = st.sets(
    st.tuples(st.integers(0, NY - 1), st.integers(0, NX - 1)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=120, deadline=None)
@given(cells=cells_strategy, conn=st.sampled_from([4, 8]), wrap=st.booleans())
def test_matches_bfs_reference(cells, conn, wrap):
    cl = sorted(cells)
    ys = np.array([c[0] for c in cl], dtype=np.int64)
    xs = np.array([c[1] for c in cl], dtype=np.int64)
    got = label_slice(ys, xs, nx=NX, connectivity=conn, wrap_x=wrap)
    want = _bfs_components(cells, NX, conn, wrap)
    assert [want[c] for c in cl] == list(got)


@settings(max_examples=60, deadline=None)
@given(cells=cells_strategy, seed=st.integers(0, 2**31 - 1))
def test_row_order_invariance(cells, seed):
    cl = sorted(cells)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(cl))
    ys = np.array([c[0] for c in cl], dtype=np.int64)
    xs = np.array([c[1] for c in cl], dtype=np.int64)
    a = label_slice(ys, xs, nx=NX)
    b = label_slice(ys[perm], xs[perm], nx=NX)
    assert list(a[perm]) == list(b)


@settings(max_examples=60, deadline=None)
@given(cells=cells_strategy, shift=st.integers(1, NX - 1))
def test_wrap_shift_isomorphism(cells, shift):
    """Rotating the grid in x permutes labels but preserves the
    partition structure (wrap must make x translation a symmetry)."""
    cl = sorted(cells)
    ys = np.array([c[0] for c in cl], dtype=np.int64)
    xs = np.array([c[1] for c in cl], dtype=np.int64)
    a = label_slice(ys, xs, nx=NX, wrap_x=True)
    b = label_slice(ys, (xs + shift) % NX, nx=NX, wrap_x=True)
    pairs_a = {}
    for la, lb in zip(a, b):
        pairs_a.setdefault(la, set()).add(lb)
    # bijection between label sets
    assert all(len(v) == 1 for v in pairs_a.values())
    assert len({next(iter(v)) for v in pairs_a.values()}) == len(pairs_a)


multi_slice_strategy = st.lists(
    st.sets(
        st.tuples(st.integers(0, NY - 1), st.integers(0, NX - 1)),
        min_size=0,
        max_size=25,
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=80, deadline=None)
@given(slices=multi_slice_strategy, conn=st.sampled_from([4, 8]),
       wrap=st.booleans(), seed=st.integers(0, 2**16))
def test_batch_kernel_property(slices, conn, wrap, seed):
    """label_slices_batch == per-slice label_slice on random multi-slice
    fields in random row order (the batched kernel's slice-key prefix
    must never leak labels or edges across slices)."""
    from marex_spark.operators.label import label_slices_batch

    ts, ys, xs = [], [], []
    for t, cells in enumerate(slices):
        for y, x in sorted(cells):
            ts.append(t)
            ys.append(y)
            xs.append(x)
    if not ts:
        return
    tidx = np.array(ts, dtype=np.int64)
    ya = np.array(ys, dtype=np.int64)
    xa = np.array(xs, dtype=np.int64)
    p = np.random.default_rng(seed).permutation(len(tidx))
    tidx, ya, xa = tidx[p], ya[p], xa[p]
    got = label_slices_batch(tidx, ya, xa, nx=NX, connectivity=conn, wrap_x=wrap)
    for t in np.unique(tidx):
        m = tidx == t
        want = label_slice(ya[m], xa[m], nx=NX, connectivity=conn, wrap_x=wrap)
        assert got[m].tolist() == want.tolist()
