"""Property-based kernel tests (hypothesis): the numpy labelling kernel
against a brute-force BFS reference on arbitrary small grids, and the
overlap-pair kernel under adversarial id magnitudes (the int64-overflow
regression from r2)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from marex_spark.operators.label import label_slice
from marex_spark.operators.merge import _slice_overlaps


def _bfs_components(cells: set, nx: int, wrap_x: bool, connectivity: int):
    """Brute-force reference labelling: BFS flood fill."""
    offs = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    if connectivity == 8:
        offs += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    seen: dict = {}
    comp = 0
    for start in sorted(cells):
        if start in seen:
            continue
        comp += 1
        stack = [start]
        seen[start] = comp
        while stack:
            y, x = stack.pop()
            for dy, dx in offs:
                ny2, nx2 = y + dy, x + dx
                if wrap_x:
                    nx2 %= nx
                elif not (0 <= nx2 < nx):
                    continue
                nbr = (ny2, nx2)
                if nbr in cells and nbr not in seen:
                    seen[nbr] = comp
                    stack.append(nbr)
    return seen


@settings(max_examples=60, deadline=None)
@given(
    cells=st.sets(
        st.tuples(st.integers(0, 7), st.integers(0, 9)), min_size=1, max_size=40
    ),
    wrap_x=st.booleans(),
    connectivity=st.sampled_from([4, 8]),
)
def test_label_slice_matches_bfs(cells, wrap_x, connectivity):
    nx = 10
    ys = np.array([c[0] for c in sorted(cells)], dtype=np.int64)
    xs = np.array([c[1] for c in sorted(cells)], dtype=np.int64)
    ids = label_slice(ys, xs, nx=nx, connectivity=connectivity, wrap_x=wrap_x)
    ref = _bfs_components(cells, nx, wrap_x, connectivity)
    # same partition: two cells share a label iff BFS agrees
    got = {}
    for (y, x), lbl in zip(zip(ys, xs), ids):
        got[(y, x)] = lbl
    for a in cells:
        for b in cells:
            assert (got[a] == got[b]) == (ref[a] == ref[b]), (a, b)
    # determinism requirement: ids are 1..k ordered by component min key
    assert set(ids) == set(range(1, len(set(ids)) + 1))


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 30),
    id_base=st.sampled_from([1, 10**6, 3 * 10**9, 1 << 34, (1 << 62) // 3]),
    data=st.data(),
)
def test_slice_overlaps_any_id_magnitude(n, id_base, data):
    """Pair counting must be exact for ids up to ~2^62 (the raw-id pair
    encoding overflowed above ~3e9 before r2)."""
    keys = np.arange(n, dtype=np.int64)
    ids_a = np.array(
        data.draw(st.lists(st.integers(0, 3), min_size=n, max_size=n)),
        dtype=np.int64,
    ) + id_base
    ids_b = np.array(
        data.draw(st.lists(st.integers(0, 3), min_size=n, max_size=n)),
        dtype=np.int64,
    ) + id_base + 7
    sl_a = {"key": keys, "id": ids_a}
    sl_b = {"key": keys, "id": ids_b}
    pairs = _slice_overlaps(sl_a, sl_b)
    # brute-force reference
    from collections import Counter

    ref = Counter(zip(ids_a.tolist(), ids_b.tolist()))
    got = {(int(r[0]), int(r[1])): int(r[2]) for r in pairs}
    assert got == dict(ref)
