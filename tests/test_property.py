"""Property-based kernel tests (hypothesis): the numpy labelling kernel
against a brute-force BFS reference on arbitrary small grids, and the
overlap-pair kernel under adversarial id magnitudes (the int64-overflow
regression from r2)."""

from __future__ import annotations

import numpy as np
import pytest
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


def _brute_shifting_anomaly(vals, years, doys, W, smooth_days):
    """Brute-force reference for the shifting-baseline anomaly on one
    cell: smooth by calendar-day window, climatology = mean of smoothed
    samples at the same doy over years [y-W, y-1], drop first W years."""
    n = len(vals)
    days = np.asarray(
        [int(y) * 366 + int(d) for y, d in zip(years, doys)]
    )  # synthetic monotone day axis used consistently by both sides
    half = smooth_days // 2
    sm = np.empty(n)
    for i in range(n):
        w = np.abs(days - days[i]) <= half
        w &= ~np.isnan(vals)
        sm[i] = vals[w].mean() if w.any() else np.nan
    out = np.full(n, np.nan)
    valid_years = years[~np.isnan(vals)]
    if len(valid_years) == 0:
        return out
    y0 = valid_years.min()
    for i in range(n):
        if np.isnan(vals[i]) or years[i] < y0 + W:
            continue
        sel = (
            (doys == doys[i])
            & (years >= years[i] - W)
            & (years <= years[i] - 1)
            & ~np.isnan(vals)
        )
        if sel.any():
            out[i] = vals[i] - sm[sel].mean()
    return out


@settings(max_examples=40, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(2000, 2004),  # year
            st.integers(0, 9),  # doy (small synthetic calendar)
            st.one_of(st.none(), st.floats(-5, 5, allow_nan=False)),
        ),
        min_size=4,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),
    ),
    W=st.integers(1, 3),
)
def test_shifting_anomaly_kernel_matches_brute_force(data, W):
    """_anomaly_shifting against a per-sample brute-force reference on
    arbitrary gappy single-cell series (synthetic 10-day calendar —
    the kernel only consumes (doy, year, epoch_day) ints)."""
    from marex_spark.operators.detect_blocked import _anomaly_shifting

    data = sorted(data)
    years = np.array([d[0] for d in data], dtype=np.int64)
    doys = np.array([d[1] for d in data], dtype=np.int64)
    vals = np.array(
        [np.nan if d[2] is None else d[2] for d in data], dtype=np.float64
    )
    days = years * 366 + doys
    m = vals[:, None]
    expected = _brute_shifting_anomaly(vals, years, doys, W, smooth_days=3)
    got = _anomaly_shifting(
        m, ~np.isnan(m), doys, years, days, window_year_baseline=W, smooth_days=3
    )[:, 0]
    assert np.allclose(got, expected, equal_nan=True, atol=1e-9), (
        got, expected,
    )


@settings(max_examples=40, deadline=None)
@given(
    cells=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 11)), min_size=0, max_size=50
    ),
    radius=st.integers(1, 2),
    wrap_x=st.booleans(),
)
def test_morph_kernel_matches_brute_force(cells, radius, wrap_x):
    """_dilate_np/_erode_np against brute-force set morphology with the
    shore-protection rule (off-grid counts as True for erosion)."""
    from marex_spark.operators.detect_blocked import _N_DOY  # noqa: F401
    from marex_spark.operators.morphology import (
        _dilate_np,
        _erode_np,
        disk_offsets,
    )

    ny, nx = 10, 12
    offs = disk_offsets(radius)
    g = np.zeros((ny, nx), dtype=bool)
    for y, x in cells:
        g[y, x] = True

    def inb(y, x):
        if wrap_x:
            return 0 <= y < ny
        return 0 <= y < ny and 0 <= x < nx

    def norm(y, x):
        return (y, x % nx) if wrap_x else (y, x)

    dil = np.zeros_like(g)
    for y in range(ny):
        for x in range(nx):
            dil[y, x] = any(
                inb(y - dy, x - dx) and g[norm(y - dy, x - dx)]
                for dy, dx in offs
            )
    ero = np.zeros_like(g)
    for y in range(ny):
        for x in range(nx):
            ero[y, x] = all(
                (not inb(y + dy, x + dx)) or g[norm(y + dy, x + dx)]
                for dy, dx in offs
            )
    assert np.array_equal(_dilate_np(g, offs, wrap_x), dil)
    assert np.array_equal(_erode_np(g, offs, wrap_x), ero)


class TestEpisodeStatsProperty:
    """episode_stats vs a direct python run-length model on random
    sparse day sets."""

    @pytest.mark.parametrize("seed", [3, 11, 29])
    def test_matches_python_model(self, spark, seed):
        import random

        from pyspark.sql import functions as F

        from marex_spark.operators.stats import episode_stats

        rng = random.Random(seed)
        max_gap, min_dur = 2, 5
        cells = [(0, x) for x in range(6)]
        rows, model = [], {}
        for y, x in cells:
            days = sorted(rng.sample(range(120), rng.randint(0, 40)))
            rows += [(y, x, d) for d in days]
            # python model: split runs on gap > max_gap, filter by span
            runs, cur = [], []
            for d in days:
                if cur and d - cur[-1] > max_gap + 1:
                    runs.append(cur)
                    cur = []
                cur.append(d)
            if cur:
                runs.append(cur)
            kept = [r for r in runs if r[-1] - r[0] + 1 >= min_dur]
            if kept:
                durs = [r[-1] - r[0] + 1 for r in kept]
                model[(y, x)] = (
                    len(kept), max(durs), sum(durs) / len(durs),
                    sum(len(r) for r in kept),
                )
        if not rows:
            return
        df = spark.createDataFrame(rows, "y int, x int, d int").select(
            "y", "x",
            F.timestamp_seconds(F.col("d") * 86400).alias("time"),
            F.lit(True).alias("extreme"),
        )
        got = {
            (r.y, r.x): (r.n_episodes, r.max_duration, r.mean_duration,
                         r.total_extreme_days)
            for r in episode_stats(
                df, max_gap_days=max_gap, min_duration_days=min_dur
            ).collect()
        }
        assert set(got) == set(model)
        for k in model:
            assert got[k][0] == model[k][0]
            assert got[k][1] == model[k][1]
            assert abs(got[k][2] - model[k][2]) < 1e-9
            assert got[k][3] == model[k][3]


@given(
    data=st.data(),
    wd=st.sampled_from([5, 11]),
    nx=st.integers(6, 20),
)
@settings(max_examples=40, deadline=None)
def test_spatial_hobday_dtype_paths_agree(data, wd, nx):
    """The spatial hobday threshold's uint16 fast path and the int32
    fallback are value-identical on random anomalies, halo sizes and
    window widths (the dtype/chunk choice is a pure optimisation)."""
    import numpy as np

    from marex_spark.operators import detect_blocked as db

    T = data.draw(st.sampled_from([200, 366, 500]))
    halo = data.draw(st.integers(1, 5))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**16)))
    ts = np.arange(T, dtype=np.int64) * 86_400_000_000
    doy0, _, _ = db._time_parts(ts, "us", False, "UTC")
    anoms = {
        y: np.where(
            rng.random((T, nx)) < 0.1,
            np.nan,
            rng.normal(scale=1.3, size=(T, nx)),
        )
        for y in range(halo)
    }
    args = (anoms, halo // 2, doy0, 0.9, wd, 5, 0.05, 2.0, nx)
    fast = db._thr_hobday_spatial(*args)
    budget = db._U16_BUDGET
    try:
        db._U16_BUDGET = 0
        slow = db._thr_hobday_spatial(*args)
    finally:
        db._U16_BUDGET = budget
    assert np.array_equal(fast, slow, equal_nan=True)
