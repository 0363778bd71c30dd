"""Blocked-vs-relational detect equivalence: the dense numpy fast path
must produce the same extreme set as the oracle-checked relational
path (both implement detect.py:2365-2373 + 2887-2915 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marex_spark.operators.detect import preprocess_data
from marex_spark.operators.detect_blocked import detect_extremes_blocked
from marex_spark.sources.synthetic import synthetic_sst_gridded


@pytest.fixture(scope="module")
def series(spark):
    return synthetic_sst_gridded(spark, n_years=2, ny=10, nx=20)


@pytest.mark.parametrize("mp", ["exact", "histogram"])
def test_blocked_matches_relational(spark, series, mp):
    rel = preprocess_data(
        series, method_percentile=mp, threshold_percentile=0.95
    )
    rel_cells = {
        (r.time, r.y, r.x)
        for r in rel.extremes.filter("extreme").select("time", "y", "x").collect()
    }
    blk_cells = {
        (r.time, r.y, r.x)
        for r in detect_extremes_blocked(
            series, method_percentile=mp, threshold_percentile=0.95
        ).collect()
    }
    # identical up to float-summation-order ties exactly at the
    # threshold: allow a vanishing symmetric difference
    diff = rel_cells ^ blk_cells
    assert len(diff) <= max(2, len(rel_cells) // 1000), (
        len(rel_cells), len(blk_cells), len(diff),
    )


@pytest.mark.parametrize("mp", ["exact", "histogram"])
def test_blocked_matches_relational_gappy(spark, series, mp):
    """Gaps (ice/QC masking) must match the relational drop-null
    semantics — climatology from available samples only, missing
    samples never extreme — not NaN-poison the band (ADVICE r01)."""
    gappy = series.filter(
        (F.pmod(F.xxhash64("time", "y", "x"), F.lit(13)) != 0)
    )
    rel = preprocess_data(gappy, method_percentile=mp, threshold_percentile=0.95)
    rel_cells = {
        (r.time, r.y, r.x)
        for r in rel.extremes.filter("extreme").select("time", "y", "x").collect()
    }
    blk_cells = {
        (r.time, r.y, r.x)
        for r in detect_extremes_blocked(
            gappy, method_percentile=mp, threshold_percentile=0.95
        ).collect()
    }
    assert rel_cells, "degenerate fixture: no extremes at all"
    diff = rel_cells ^ blk_cells
    assert len(diff) <= max(2, len(rel_cells) // 1000), (
        len(rel_cells), len(blk_cells), len(diff),
    )


def test_blocked_frequency(spark, series):
    """Statistical gate (reference tests/conftest.py:168-232): extreme
    frequency ≈ (100-p)% within tolerance."""
    n_total = series.count()
    n_ext = detect_extremes_blocked(series, method_percentile="exact").count()
    frac = n_ext / n_total
    assert 0.03 <= frac <= 0.07, frac


def test_blocked_matches_relational_nonutc_session(spark, series):
    """Session-timezone regression (r2 review): with a non-UTC session,
    F.dayofyear shifts midnight-UTC stamps to the PREVIOUS local day —
    the kernels must bucket climatology identically to the relational
    path, not by raw UTC epoch math."""
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # jitter hours so the UTC→local day shift is NON-uniform
        # (midnight-only stamps shift every bucket identically, which
        # any grouping would survive; mixed hours move only some
        # samples across the local-day boundary)
        jittered = series.withColumn(
            "time",
            F.timestamp_add(
                "HOUR",
                F.pmod(F.xxhash64("y", "x"), F.lit(12)).cast("int"),
                F.col("time"),
            ),
        )
        rel = preprocess_data(jittered, method_percentile="exact")
        rel_cells = {
            (r.time, r.y, r.x)
            for r in rel.extremes.filter("extreme").select("time", "y", "x").collect()
        }
        blk_cells = {
            (r.time, r.y, r.x)
            for r in detect_extremes_blocked(
                jittered, method_percentile="exact"
            ).collect()
        }
        diff = rel_cells ^ blk_cells
        assert len(diff) <= max(2, len(rel_cells) // 1000), (
            len(rel_cells), len(blk_cells), len(diff),
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_packed_source_matches_long(spark):
    """The packed generator must be value-identical to the long one."""
    from marex_spark.sources.synthetic import (
        synthetic_sst_gridded,
        synthetic_sst_gridded_packed,
    )

    long_df = synthetic_sst_gridded(spark, n_years=1, ny=4, nx=6)
    packed = synthetic_sst_gridded_packed(spark, n_years=1, ny=4, nx=6)
    a = {
        (r.time, r.y, r.x, round(r.value, 5)) for r in long_df.collect()
    }
    b = {
        (r.time, r.y, x, round(v, 5))
        for r in packed.collect()
        for x, v in enumerate(r.vals)
    }
    assert a == b


@pytest.mark.parametrize("mp", ["exact", "histogram"])
def test_packed_detect_matches_long(spark, series, mp):
    """Packed-layout detect == long-format blocked detect, dense and
    gappy (gaps land as nulls in the packed arrays → NaN in the
    kernel)."""
    from marex_spark.operators.detect_blocked import (
        detect_extremes_blocked_packed,
        pack_gridded,
    )

    gappy = series.filter(F.pmod(F.xxhash64("time", "y", "x"), F.lit(17)) != 0)
    for src in (series, gappy):
        long_cells = {
            (r.time, r.y, r.x)
            for r in detect_extremes_blocked(src, method_percentile=mp).collect()
        }
        packed_cells = {
            (r.time, r.y, r.x)
            for r in detect_extremes_blocked_packed(
                pack_gridded(src, nx=20), method_percentile=mp
            ).collect()
        }
        assert long_cells == packed_cells


@pytest.fixture(scope="module")
def series8(spark):
    """Long enough for the 5-year shifting baseline to leave 3 scored
    years."""
    return synthetic_sst_gridded(spark, n_years=8, ny=6, nx=12)


@pytest.mark.parametrize(
    "ma,me,mp",
    [
        ("shifting_baseline", "hobday_extreme", "histogram"),
        ("shifting_baseline", "hobday_extreme", "exact"),
        ("shifting_baseline", "global_extreme", "exact"),
        ("fixed_baseline", "hobday_extreme", "histogram"),
    ],
)
def test_blocked_methods_match_relational(spark, series8, ma, me, mp):
    """The blocked kernel's shifting-baseline anomaly and hobday
    threshold must reproduce the oracle-checked relational operators
    (climatology.anomaly_shifting_baseline, threshold.hobday_*) —
    reference detect.py:1617-1669, 1921-1956, 2562-2734."""
    rel = preprocess_data(
        series8, method_anomaly=ma, method_extreme=me, method_percentile=mp
    )
    rel_cells = {
        (r.time, r.y, r.x)
        for r in rel.extremes.filter("extreme").select("time", "y", "x").collect()
    }
    rel.unpersist()
    blk_cells = {
        (r.time, r.y, r.x)
        for r in detect_extremes_blocked(
            series8, method_percentile=mp, method_anomaly=ma, method_extreme=me
        ).collect()
    }
    assert rel_cells, "degenerate fixture: no extremes at all"
    diff = rel_cells ^ blk_cells
    assert len(diff) <= max(2, len(rel_cells) // 1000), (
        len(rel_cells), len(blk_cells), len(diff),
    )


def test_blocked_shifting_gappy_matches_relational(spark, series8):
    """Gaps must shrink the smoothing window / climatology sample set
    exactly like the relational drop-null semantics."""
    gappy = series8.filter(F.pmod(F.xxhash64("time", "y", "x"), F.lit(13)) != 0)
    rel = preprocess_data(
        gappy,
        method_anomaly="shifting_baseline",
        method_extreme="hobday_extreme",
        method_percentile="histogram",
    )
    rel_cells = {
        (r.time, r.y, r.x)
        for r in rel.extremes.filter("extreme").select("time", "y", "x").collect()
    }
    rel.unpersist()
    blk_cells = {
        (r.time, r.y, r.x)
        for r in detect_extremes_blocked(
            gappy,
            method_percentile="histogram",
            method_anomaly="shifting_baseline",
            method_extreme="hobday_extreme",
        ).collect()
    }
    diff = rel_cells ^ blk_cells
    assert len(diff) <= max(2, len(rel_cells) // 1000), (
        len(rel_cells), len(blk_cells), len(diff),
    )


def test_packed_methods_match_long(spark, series8):
    """Packed kernel == long kernel for the shifting/hobday configs."""
    from marex_spark.operators.detect_blocked import (
        detect_extremes_blocked_packed,
        pack_gridded,
    )

    packed = pack_gridded(series8, nx=12)
    for ma, me in [
        ("shifting_baseline", "hobday_extreme"),
        ("shifting_baseline", "global_extreme"),
    ]:
        long_cells = {
            (r.time, r.y, r.x)
            for r in detect_extremes_blocked(
                series8, method_percentile="histogram",
                method_anomaly=ma, method_extreme=me,
            ).collect()
        }
        packed_cells = {
            (r.time, r.y, r.x)
            for r in detect_extremes_blocked_packed(
                packed, method_percentile="histogram",
                method_anomaly=ma, method_extreme=me,
            ).collect()
        }
        assert long_cells == packed_cells, (ma, me)


@pytest.mark.parametrize("ma", ["detrend_harmonic", "detrend_fixed_baseline"])
def test_blocked_detrend_matches_relational(spark, ma):
    """The blocked detrend kernels must reproduce the relational
    design-matrix fit (climatology.anomaly_detrend_harmonic /
    _fixed_baseline; reference detect.py:2143-2220, 2443-2460), dense
    and gappy."""
    series = synthetic_sst_gridded(spark, n_years=4, ny=6, nx=12)
    gappy = series.filter(F.pmod(F.xxhash64("time", "y", "x"), F.lit(13)) != 0)
    for src in (series, gappy):
        rel = preprocess_data(src, method_anomaly=ma, method_percentile="exact")
        rel_cells = {
            (r.time, r.y, r.x)
            for r in rel.extremes.filter("extreme").select("time", "y", "x").collect()
        }
        rel.unpersist()
        blk_cells = {
            (r.time, r.y, r.x)
            for r in detect_extremes_blocked(
                src, method_percentile="exact", method_anomaly=ma
            ).collect()
        }
        assert rel_cells, "degenerate fixture"
        diff = rel_cells ^ blk_cells
        assert len(diff) <= max(2, len(rel_cells) // 1000), (
            len(rel_cells), len(blk_cells), len(diff),
        )


def test_blocked_detrend_orders_force_zero_mean(spark):
    """Polynomial detrend orders + force_zero_mean must match between
    the blocked kernel and the relational path (reference
    detect.py:2146-2227 detrend_orders / force_zero_mean)."""
    series = synthetic_sst_gridded(spark, n_years=4, ny=4, nx=8)
    rel = preprocess_data(
        series,
        method_anomaly="detrend_harmonic",
        method_percentile="exact",
        detrend_orders=(1, 2),
        force_zero_mean=True,
    )
    rel_cells = {
        (r.time, r.y, r.x)
        for r in rel.extremes.filter("extreme").select("time", "y", "x").collect()
    }
    rel.unpersist()
    blk_cells = {
        (r.time, r.y, r.x)
        for r in detect_extremes_blocked(
            series,
            method_percentile="exact",
            method_anomaly="detrend_harmonic",
            detrend_orders=(1, 2),
            force_zero_mean=True,
        ).collect()
    }
    assert rel_cells, "degenerate fixture"
    diff = rel_cells ^ blk_cells
    assert len(diff) <= max(2, len(rel_cells) // 1000), (
        len(rel_cells), len(blk_cells), len(diff),
    )


def test_detrend_orders_validation(spark):
    from marex_spark.exceptions import ConfigurationError

    series = synthetic_sst_gridded(spark, n_years=1, ny=2, nx=4)
    with pytest.raises(ConfigurationError, match="cannot be empty"):
        detect_extremes_blocked(
            series, method_anomaly="detrend_harmonic", detrend_orders=()
        )
    with pytest.raises(ConfigurationError, match="Invalid polynomial"):
        detect_extremes_blocked(
            series, method_anomaly="detrend_harmonic", detrend_orders=(0,)
        )


@pytest.mark.slow
def test_packed_spatial_hobday_matches_relational(spark):
    """W4 in the kernel: the y-halo fan + in-kernel 2-D pooling must
    equal the relational spatial hobday path cell-for-cell (reference
    detect.py:2562-2734 with the lon-wrap pad 2652-2668)."""
    from marex_spark.operators.detect_blocked import (
        detect_extremes_blocked_packed,
        pack_gridded,
    )

    NY, NX = 8, 14
    series = synthetic_sst_gridded(spark, n_years=7, ny=NY, nx=NX)
    packed = pack_gridded(series, nx=NX)
    for ma in ("fixed_baseline", "shifting_baseline"):
        rel = preprocess_data(
            series, method_anomaly=ma, method_extreme="hobday_extreme",
            method_percentile="histogram", window_spatial_hobday=5,
            nx=NX, ny=NY,
        )
        rel_cells = {
            (r.time, r.y, r.x)
            for r in rel.extremes.filter("extreme").select("time", "y", "x").collect()
        }
        rel.unpersist()
        blk_cells = {
            (r.time, r.y, r.x)
            for r in detect_extremes_blocked_packed(
                packed, method_percentile="histogram", method_anomaly=ma,
                method_extreme="hobday_extreme", window_spatial_hobday=5,
                ny=NY,
            ).collect()
        }
        assert rel_cells, ("degenerate fixture", ma)
        assert rel_cells == blk_cells, (ma, len(rel_cells), len(blk_cells))


def test_spatial_hobday_validation(spark):
    """Reference validation rules (detect.py:1385-1430): hobday-only,
    histogram-only, ny required."""
    from marex_spark.exceptions import ConfigurationError
    from marex_spark.operators.detect_blocked import (
        detect_extremes_blocked_packed,
        pack_gridded,
    )

    series = synthetic_sst_gridded(spark, n_years=1, ny=4, nx=6)
    packed = pack_gridded(series, nx=6)
    with pytest.raises(ConfigurationError, match="hobday_extreme"):
        detect_extremes_blocked_packed(
            packed, window_spatial_hobday=5, ny=4
        )
    with pytest.raises(ConfigurationError, match="exact"):
        detect_extremes_blocked_packed(
            packed, method_extreme="hobday_extreme",
            method_percentile="exact", window_spatial_hobday=5, ny=4,
        )
    with pytest.raises(ConfigurationError, match="needs ny"):
        detect_extremes_blocked_packed(
            packed, method_extreme="hobday_extreme",
            method_percentile="histogram", window_spatial_hobday=5,
        )
    with pytest.raises(ConfigurationError, match="hobday_extreme"):
        preprocess_data(series, window_spatial_hobday=5, nx=6, ny=4)


# ---------------------------------------------------------------------------
# Unstructured (mesh) fast path: arbitrary cell blocking, same kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "ma,me,mp",
    [
        ("fixed_baseline", "global_extreme", "exact"),
        ("shifting_baseline", "hobday_extreme", "histogram"),
    ],
)
def test_unstructured_packed_matches_relational(spark, series8, ma, me, mp):
    """Mesh cells blocked at a width UNRELATED to the source grid (37)
    must reproduce the relational preprocess_data(keys=('cell',))
    extreme set cell-for-cell."""
    from marex_spark.operators.detect_blocked import (
        detect_extremes_unstructured_packed,
    )

    nx = 12
    mesh = series8.select(
        "time",
        (F.col("y").cast("long") * nx + F.col("x")).alias("cell"),
        "value",
    )
    fast = detect_extremes_unstructured_packed(
        mesh, block_cells=37, method_anomaly=ma, method_extreme=me,
        method_percentile=mp,
    )
    rel = preprocess_data(
        mesh, keys=("cell",), method_anomaly=ma, method_extreme=me,
        method_percentile=mp,
    )
    a = {(r.time, r.cell) for r in fast.collect()}
    b = {
        (r.time, r.cell)
        for r in rel.extremes.filter("extreme").select("time", "cell").collect()
    }
    assert a == b


def test_unstructured_packed_thresholds_drop_filler(spark, series8):
    from marex_spark.operators.detect_blocked import (
        detect_extremes_unstructured_packed,
    )

    nx = 12
    n_cells = 6 * nx
    mesh = series8.select(
        "time",
        (F.col("y").cast("long") * nx + F.col("x")).alias("cell"),
        "value",
    )
    thr = detect_extremes_unstructured_packed(
        mesh, block_cells=32, output="thresholds",
        method_percentile="exact",
    )
    rows = thr.collect()
    assert len(rows) == n_cells  # 72 real cells; 3 blocks of 32 -> 96 slots
    assert all(r.cell < n_cells for r in rows)


def test_unstructured_packed_rejects_spatial(spark, series8):
    from marex_spark.exceptions import ConfigurationError
    from marex_spark.operators.detect_blocked import (
        detect_extremes_unstructured_packed,
    )

    with pytest.raises(ConfigurationError):
        detect_extremes_unstructured_packed(
            series8.select(
                "time", (F.col("y") * 12 + F.col("x")).alias("cell"), "value"
            ),
            window_spatial_hobday=5,
        )


def test_histogram_threshold_nan_for_empty_cells():
    """Review finding: all-NaN columns must get NaN thresholds on the
    histogram path (they already did on exact and hobday)."""
    import numpy as np

    from marex_spark.operators.detect_blocked import _thr_global

    anom = np.full((10, 3), 1.0)
    anom[:, 1] = np.nan  # dead cell
    thr = _thr_global(anom, 0.9, exact=False, precision=0.01, max_anomaly=5.0)
    assert np.isnan(thr[1])
    assert not np.isnan(thr[0]) and not np.isnan(thr[2])


def test_pack_gridded_integer_values(spark):
    """Review finding: non-float value columns cast up front instead of
    crashing on an Arrow schema mismatch."""
    from pyspark.sql import functions as F

    from marex_spark.operators.detect_blocked import pack_gridded

    df = spark.createDataFrame(
        [(0, 0, x, x * 10) for x in range(4)], "t int, y int, x int, value long"
    ).select(F.col("t").cast("timestamp").alias("time"), "y", "x", "value")
    packed = pack_gridded(df, nx=4)
    row = packed.first()
    assert row.vals == [0.0, 10.0, 20.0, 30.0]


def test_spatial_hobday_int32_fallback_matches_uint16(monkeypatch):
    """The spatial threshold kernel picks uint16 counts only when the
    exact worst-case intermediates fit; the int32 + 256-chunk fallback
    (very long series) must be value-identical. Force the fallback by
    zeroing the uint16 budget and compare on the same inputs."""
    import numpy as np

    from marex_spark.operators import detect_blocked as db

    T, NX = 3 * 365, 16
    rng = np.random.default_rng(5)
    ts = np.arange(T, dtype=np.int64) * 86_400_000_000
    doy0, _, _ = db._time_parts(ts, "us", False, "UTC")
    anoms = {
        y: np.where(
            rng.random((T, NX)) < 0.05, np.nan, rng.normal(scale=1.1, size=(T, NX))
        )
        for y in range(5)
    }
    args = (anoms, 2, doy0, 0.9, 11, 5, 0.01, 5.0, NX)
    fast = db._thr_hobday_spatial(*args)
    monkeypatch.setattr(db, "_U16_BUDGET", 0)
    slow = db._thr_hobday_spatial(*args)
    assert np.array_equal(fast, slow, equal_nan=True)


def test_hobday_int32_fallback_matches_uint16(monkeypatch):
    """Same dtype guarantee for the NON-spatial hobday histogram
    kernel (bin-last layout): uint16 counts only when the padded-doy
    cumsum provably fits; the int32 fallback is value-identical."""
    import numpy as np

    from marex_spark.operators import detect_blocked as db

    T, NX = 4 * 365, 40
    rng = np.random.default_rng(11)
    ts = np.arange(T, dtype=np.int64) * 86_400_000_000
    doy0, _, _ = db._time_parts(ts, "us", False, "UTC")
    anom = np.where(
        rng.random((T, NX)) < 0.07, np.nan, rng.normal(scale=1.2, size=(T, NX))
    )
    args = (anom, doy0, 0.95, False, 11, 0.01, 5.0)
    fast = db._thr_hobday(*args)
    monkeypatch.setattr(db, "_U16_BUDGET", 0)
    slow = db._thr_hobday(*args)
    assert np.array_equal(fast, slow, equal_nan=True)


def test_band_fixture_generator(spark, tmp_path):
    """The numpy packed bench fixture: correct packed schema and row
    count, values finite and latitude-shaped, reuse path hits (second
    call leaves the files untouched), and the blocked detect kernel
    consumes it end-to-end."""
    import os

    from marex_spark.operators.detect_blocked import (
        detect_extremes_blocked_packed,
        materialize_packed_band_fixture,
    )

    path = str(tmp_path / "band")
    materialize_packed_band_fixture(
        spark, path, n_years=1, ny=6, nx=8
    )
    df = spark.read.parquet(path)
    assert df.schema.simpleString() == (
        "struct<time:timestamp,y:int,vals:array<float>>"
    )
    assert df.count() == 365 * 6
    row = df.filter("y = 0").first()
    assert len(row.vals) == 8
    assert all(abs(v) < 100 for v in row.vals)
    # polar band (y=0 -> lat -85) is colder than the equator band
    import pyspark.sql.functions as F
    m = (
        df.select("y", F.explode("vals").alias("v"))
        .groupBy("y").agg(F.avg("v").alias("m"))
        .orderBy("y").collect()
    )
    # closed-form band means: base(lat) = 18 - 0.25|lat|; y=0 is
    # lat -85 (mean ≈ -3.25 + trend), y=2 is lat -17 (≈ 13.75) — the
    # ~17-degree gap must survive noise and seasonality by a margin
    assert m[0].m < m[2].m - 10  # latitude gradient binds

    mtimes = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet")
    }
    materialize_packed_band_fixture(spark, path, n_years=1, ny=6, nx=8)
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(path, f)) == t  # reused

    cells = detect_extremes_blocked_packed(
        df, method_anomaly="detrend_harmonic",
        method_extreme="global_extreme",
    )
    n = cells.count()
    assert n > 0
    assert n < 365 * 6 * 8 * 0.2  # ~5% extremes, loose bound


@pytest.mark.parametrize("ma,me", [
    ("detrend_harmonic", "global_extreme"),
    ("fixed_baseline", "hobday_extreme"),
    ("shifting_baseline", "hobday_extreme"),
])
def test_band_chunk_sweep_bit_identical(ma, me, monkeypatch):
    """The x-chunked band sweep (cache-resident temporaries) must be
    BIT-identical to one full-band pass — every stage of the kernel is
    column-separable. Forces a tiny chunk budget so a small fixture
    takes many chunks."""
    import numpy as np

    from marex_spark.operators import detect_blocked as db

    rng = np.random.default_rng(11)
    T, NX = 730, 40
    t = np.arange(T)
    m = (
        10
        + 3 * np.sin(2 * np.pi * t / 365.25)[:, None]
        + rng.normal(0, 1.0, (T, NX))
    )
    m[rng.random((T, NX)) < 0.02] = np.nan
    m = m.astype(np.float32).astype(np.float64)
    ut = (
        (np.datetime64("2000-01-01") + np.arange(T))
        .astype("datetime64[D]")
        .astype(np.int64)
    )
    doy0, years, days = db._time_parts(ut, "D", True, "UTC")
    p = db._kernel_params(
        method_anomaly=ma, method_extreme=me, method_percentile="histogram",
        threshold_percentile=0.95, precision=0.01, max_anomaly=5.0,
        window_year_baseline=5, smooth_days=21, window_days_hobday=11,
        n_harmonics=2, detrend_orders=(1,), force_zero_mean=False,
    )
    full = db._band_extremes_chunk(m, doy0, years, days, p)
    monkeypatch.setattr(db, "_BAND_CHUNK_BUDGET", 8 * T * 7)  # 7-col chunks
    ext, thr = db._band_extremes(m, doy0, years, days, p)
    assert np.array_equal(full[0], ext)
    assert np.array_equal(full[1], thr, equal_nan=True)
    # float32 input (the packed path keeps the scan dtype; promotion
    # happens per chunk and float32→float64 is exact)
    ext32, thr32 = db._band_extremes(m.astype(np.float32), doy0, years, days, p)
    assert np.array_equal(full[0], ext32)
    assert np.array_equal(full[1], thr32, equal_nan=True)


def test_thr_chunk_width_invariant(monkeypatch):
    """The hobday threshold sweeps' x-chunk cap (_THR_CHUNK_MAX, a pure
    cache-residency knob) must not change values at ANY width: per-column
    integer counts with an exact ±s halo. Pin spatial and non-spatial
    kernels equal across extreme widths (3 — forcing many chunks and
    halo-duplicated columns — vs wider than the fixture)."""
    import numpy as np

    from marex_spark.operators import detect_blocked as db

    T, NX = 3 * 365, 16
    rng = np.random.default_rng(7)
    ts = np.arange(T, dtype=np.int64) * 86_400_000_000
    doy0, _, _ = db._time_parts(ts, "us", False, "UTC")
    anoms = {
        y: np.where(
            rng.random((T, NX)) < 0.05, np.nan, rng.normal(scale=1.1, size=(T, NX))
        )
        for y in range(5)
    }
    sp_args = (anoms, 2, doy0, 0.9, 11, 5, 0.01, 5.0, NX)
    ns_args = (anoms[2], doy0, 0.95, False, 11, 0.01, 5.0)
    monkeypatch.setattr(db, "_THR_CHUNK_MAX", 1024)
    sp_wide = db._thr_hobday_spatial(*sp_args)
    ns_wide = db._thr_hobday(*ns_args)
    monkeypatch.setattr(db, "_THR_CHUNK_MAX", 3)
    sp_narrow = db._thr_hobday_spatial(*sp_args)
    ns_narrow = db._thr_hobday(*ns_args)
    assert np.array_equal(sp_wide, sp_narrow, equal_nan=True)
    assert np.array_equal(ns_wide, ns_narrow, equal_nan=True)


def test_band_shuffle_estimate_fallback(monkeypatch, spark):
    """_plan_size_estimate reads a private JVM handle (no public plan-
    stats API); ANY drift must degrade to the 2 GiB mid-scale default
    (factor 4), never raise. _band_factor pins the clamp ends too."""
    from marex_spark.operators import detect_blocked as db

    # an object with no _jdf at all = the worst possible API drift
    assert db._plan_size_estimate(object()) == 2 << 30
    assert db._band_factor(2 << 30) == 4
    assert db._band_factor(0) == 1  # clamp floor (tiny inputs)
    assert db._band_factor(1 << 40) == 8  # clamp ceiling
    # the real handle still works on this Spark version
    df = spark.range(100).withColumnRenamed("id", "y")
    assert db._plan_size_estimate(df) > 0
    # env override pins the factor without touching the estimate
    monkeypatch.setenv("MAREX_BAND_SHUFFLE_FACTOR", "2")
    monkeypatch.setattr(
        db, "_plan_size_estimate", lambda _df: (_ for _ in ()).throw(AssertionError)
    )
    out = db._band_shuffle(df, "y", 8)
    assert out.rdd.getNumPartitions() == 16
