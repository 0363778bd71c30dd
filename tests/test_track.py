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


class TestEdgeCases:
    """Reference test_track_edge_cases.py parity: absolute area filter
    + validation, single-timestep tracking, regional (no-wrap) mode."""

    def test_area_filter_absolute(self, spark):
        import datetime

        from marex_spark.operators.track import preprocess_extremes

        t0 = datetime.datetime(2021, 1, 1)
        rows = []
        # big 4x4 blob + isolated 1-cell speck, two timesteps
        for t in range(2):
            ts = t0 + datetime.timedelta(days=t)
            for y in range(4, 8):
                for x in range(4, 8):
                    rows.append((ts, y, x, True))
            rows.append((ts, 15, 30, True))
        df = spark.createDataFrame(
            rows, "time timestamp, y int, x int, extreme boolean"
        )
        out = preprocess_extremes(
            df, ny=20, nx=40, r_fill=0, t_fill=0,
            area_filter_absolute=3.0,
        )
        cells = {(r.y, r.x) for r in out.filter("extreme").collect()}
        assert (15, 30) not in cells  # speck removed by the absolute floor
        assert (5, 5) in cells

    def test_area_filter_absolute_validation(self, spark):
        from marex_spark.exceptions import ConfigurationError
        from marex_spark.operators.track import preprocess_extremes

        df = spark.createDataFrame(
            [], "time timestamp, y int, x int, extreme boolean"
        )
        with pytest.raises(ConfigurationError, match="must be positive"):
            preprocess_extremes(df, 10, 10, area_filter_absolute=-100.0)
        with pytest.raises(ConfigurationError, match="both area filtering"):
            preprocess_extremes(
                df, 10, 10, area_quartile=0.9, area_filter_absolute=10.0
            )

    def test_single_timestep(self, spark):
        """One timestep: no overlap pairs; every object is its own
        event (reference test_single_timestep_data)."""
        import datetime

        from marex_spark.operators.track import track_events

        t0 = datetime.datetime(2021, 1, 1)
        rows = [(t0, 2, x, True) for x in range(3)] + [
            (t0, 8, x, True) for x in range(10, 12)
        ]
        df = spark.createDataFrame(
            rows, "time timestamp, y int, x int, extreme boolean"
        )
        res = track_events(df, nx=20, compute_stats=False)
        assert res.events.select("event_id").distinct().count() == 2
        assert res.events.count() == 5

    def test_regional_mode_no_wrap(self, spark):
        """wrap_x=False (the reference's regional_mode): a feature
        split across the x boundary must stay TWO events; with wrap it
        is one."""
        import datetime

        from marex_spark.operators.track import track_events

        t0 = datetime.datetime(2021, 1, 1)
        rows = []
        for t in range(3):
            ts = t0 + datetime.timedelta(days=t)
            for y in range(5, 8):
                for x in (0, 1, 18, 19):  # straddles the seam of nx=20
                    rows.append((ts, y, x, True))
        df = spark.createDataFrame(
            rows, "time timestamp, y int, x int, extreme boolean"
        )
        wrapped = track_events(df, nx=20, wrap_x=True, compute_stats=False)
        regional = track_events(df, nx=20, wrap_x=False, compute_stats=False)
        assert wrapped.events.select("event_id").distinct().count() == 1
        assert regional.events.select("event_id").distinct().count() == 2


class TestEpisodeStats:
    """Per-cell Hobday-2016 episode metrics (operators/stats.episode_stats)."""

    def test_gap_bridging_and_min_duration(self, spark):
        from pyspark.sql import functions as F

        from marex_spark.operators.stats import episode_stats

        # cell A: days 0-3 extreme, gap 4-5, days 6-8 extreme
        #   -> one bridged episode days 0..8 (duration 9, 7 extreme days)
        # cell B: days 0-2 extreme only -> duration 3 < 5, filtered out
        rows = [(0, 0, d) for d in [0, 1, 2, 3, 6, 7, 8]] + [
            (0, 1, d) for d in [0, 1, 2]
        ]
        df = spark.createDataFrame(rows, "y int, x int, d int").select(
            "y", "x",
            F.timestamp_seconds(F.col("d") * 86400).alias("time"),
            F.lit(True).alias("extreme"),
        )
        out = {(r.y, r.x): r for r in episode_stats(df).collect()}
        assert (0, 1) not in out
        a = out[(0, 0)]
        assert a.n_episodes == 1
        assert a.max_duration == 9
        assert a.total_extreme_days == 7

    def test_gap_too_large_splits(self, spark):
        from pyspark.sql import functions as F

        from marex_spark.operators.stats import episode_stats

        # gap of 3 days (> max_gap 2) splits into two episodes of 5 days
        rows = [(0, 0, d) for d in list(range(0, 5)) + list(range(8, 13))]
        df = spark.createDataFrame(rows, "y int, x int, d int").select(
            "y", "x",
            F.timestamp_seconds(F.col("d") * 86400).alias("time"),
            F.lit(True).alias("extreme"),
        )
        a = episode_stats(df).collect()[0]
        assert a.n_episodes == 2
        assert a.max_duration == 5
        assert a.mean_duration == 5.0

    def test_intensity_metrics(self, spark):
        from pyspark.sql import functions as F

        from marex_spark.operators.stats import episode_stats

        rows = [(0, 0, d, 1.0 + d * 0.5) for d in range(5)]
        df = spark.createDataFrame(
            rows, "y int, x int, d int, anomaly double"
        ).select(
            "y", "x",
            F.timestamp_seconds(F.col("d") * 86400).alias("time"),
            F.lit(True).alias("extreme"),
            "anomaly",
        )
        a = episode_stats(df, anomaly_col="anomaly").collect()[0]
        assert a.i_max == 3.0
        assert a.i_mean == 2.0
        assert a.i_cum == 10.0


class TestFusedLabelling:
    """preprocess_extremes(return_labels=True) + track_events(labels=...)
    must produce the same event STRUCTURE as the two-pass form (ids are
    numbering-dependent; cell partitions are not)."""

    def _event_partition(self, events):
        """Frozenset of frozensets of (time, y, x) — id-free structure."""
        from collections import defaultdict

        groups = defaultdict(set)
        for r in events.collect():
            groups[r.event_id].add((str(r.time), r.y, r.x))
        return frozenset(frozenset(v) for v in groups.values())

    def test_structure_identical(self, spark):
        from marex_spark.operators.track import preprocess_extremes, track_events
        from marex_spark.sources.synthetic import synthetic_extremes_gridded

        ext = synthetic_extremes_gridded(spark, n_time=10, ny=20, nx=40)
        two_pass = track_events(
            preprocess_extremes(ext, ny=20, nx=40, r_fill=2, t_fill=2,
                                area_quartile=0.5),
            nx=40, compute_stats=False,
        ).events
        fused = track_events(
            ext.limit(0),  # unused when labels given
            nx=40, compute_stats=False,
            labels=preprocess_extremes(
                ext, ny=20, nx=40, r_fill=2, t_fill=2, area_quartile=0.5,
                return_labels=True,
            ),
        ).events
        assert self._event_partition(two_pass) == self._event_partition(fused)

    def test_intensity_day_weighted_across_episodes(self, spark):
        """i_mean must weight by extreme days, not average per-episode
        means (review finding): 5 days at 1.0 + 10 days at 4.0 -> 3.0."""
        from pyspark.sql import functions as F

        from marex_spark.operators.stats import episode_stats

        rows = [(0, 0, d, 1.0) for d in range(5)] + [
            (0, 0, d, 4.0) for d in range(20, 30)
        ]
        df = spark.createDataFrame(
            rows, "y int, x int, d int, anomaly double"
        ).select(
            "y", "x",
            F.timestamp_seconds(F.col("d") * 86400).alias("time"),
            F.lit(True).alias("extreme"),
            "anomaly",
        )
        a = episode_stats(df, anomaly_col="anomaly").collect()[0]
        assert a.n_episodes == 2
        assert a.i_mean == pytest.approx(3.0)
        assert a.i_cum == pytest.approx(45.0)
        assert a.i_max == 4.0


class TestExtendTrackEvents:
    """Incremental append tracking: extending a finished run with new
    timesteps must reproduce the full recompute exactly (ids included),
    because labels continue the W6 cumsum and min-root event ids are
    stable under appending larger ids."""

    def _grids(self, spark, ny, nx):
        gy = spark.range(ny).select(
            F.col("id").cast("int").alias("y"),
            (-90.0 + (F.col("id") + 0.5) * (180.0 / ny)).alias("lat"),
        )
        gx = spark.range(nx).select(
            F.col("id").cast("int").alias("x"),
            ((F.col("id") + 0.5) * (360.0 / nx)).alias("lon"),
        )
        return gy, gx

    def _split(self, ext, n_prior):
        times = sorted(
            r[0] for r in ext.select("time").distinct().collect()
        )
        cutoff = times[n_prior - 1]
        return (
            ext.filter(F.col("time") <= F.lit(cutoff)),
            ext.filter(F.col("time") > F.lit(cutoff)),
        )

    @pytest.mark.parametrize(
        "theta,n_prior",
        [(0.0, 8), (0.3, 8), (0.0, 2), (0.0, 11)],  # incl. tiny prior
        # and a single appended slice — the boundary-layout edge cases
    )
    @pytest.mark.slow
    def test_matches_full_recompute(self, spark, theta, n_prior):
        from marex_spark.operators.track import extend_track_events

        ny, nx = 24, 48
        ext = synthetic_extremes_gridded(
            spark, n_time=12, ny=ny, nx=nx, density=0.05, seed=3
        )
        gy, gx = self._grids(spark, ny, nx)
        full = track_events(
            ext, nx=nx, grid_y=gy, grid_x=gx, overlap_threshold=theta
        )
        prior_ext, new_ext = self._split(ext, n_prior)
        prior = track_events(
            prior_ext, nx=nx, grid_y=gy, grid_x=gx, overlap_threshold=theta
        )
        extd = extend_track_events(
            prior.events,
            new_ext,
            nx=nx,
            grid_y=gy,
            grid_x=gx,
            prior_timestep_stats=prior.timestep_stats,
            overlap_threshold=theta,
        )
        cols = ["time", "y", "x", "obj_id", "event_id"]
        a = sorted(map(tuple, full.events.select(*cols).collect()))
        b = sorted(map(tuple, extd.events.select(*cols).collect()))
        assert a == b
        # lifetime stats re-aggregated from the merged per-timestep
        # table match the full run's (float tolerance: partial-sum order)
        fa = {r.event_id: r for r in full.lifetime_stats.collect()}
        fb = {r.event_id: r for r in extd.lifetime_stats.collect()}
        assert set(fa) == set(fb)
        for k in fa:
            assert fa[k].n_timesteps == fb[k].n_timesteps
            assert abs(fa[k].max_area - fb[k].max_area) < 1e-9

    def test_new_bridge_merges_two_old_events(self, spark):
        """An object in the appended data overlapping two previously
        separate events must merge them, remapping prior history to the
        smaller event id — same as the full recompute."""
        from marex_spark.operators.track import extend_track_events

        nx = 32
        rows = []
        # two separate static blobs for t in {1, 2}
        for d in (1, 2):
            for xx in (2, 3):
                rows.append((d, 5, xx, True))
            for xx in (10, 11):
                rows.append((d, 5, xx, True))
        # t=3 (appended): one wide object spanning both columns
        for xx in range(2, 12):
            rows.append((3, 5, xx, True))
        df = spark.createDataFrame(rows, "d int, y int, x int, extreme boolean").select(
            F.timestamp_add(
                "DAY", F.col("d"), F.lit("2021-01-01").cast("timestamp")
            ).alias("time"),
            "y", "x", "extreme",
        )
        gy, gx = self._grids(spark, 12, nx)
        full = track_events(df, nx=nx, grid_y=gy, grid_x=gx)
        prior_ext, new_ext = self._split(df, 2)
        prior = track_events(prior_ext, nx=nx, grid_y=gy, grid_x=gx)
        assert prior.events.select("event_id").distinct().count() == 2
        extd = extend_track_events(
            prior.events, new_ext, nx=nx, grid_y=gy, grid_x=gx,
            prior_timestep_stats=prior.timestep_stats,
        )
        cols = ["time", "y", "x", "obj_id", "event_id"]
        a = sorted(map(tuple, full.events.select(*cols).collect()))
        b = sorted(map(tuple, extd.events.select(*cols).collect()))
        assert a == b
        assert extd.events.select("event_id").distinct().count() == 1
        # merged-event stats must be RECOMPUTED, not double-counted:
        # one (time, event) row per old slice covering both blobs
        fa = sorted(
            map(tuple, full.timestep_stats.select(
                "time", "event_id", "n_cells").collect())
        )
        fb = sorted(
            map(tuple, extd.timestep_stats.select(
                "time", "event_id", "n_cells").collect())
        )
        assert fa == fb
        la = {r.event_id: r for r in full.lifetime_stats.collect()}
        lb = {r.event_id: r for r in extd.lifetime_stats.collect()}
        assert set(la) == set(lb)
        for k in la:
            assert la[k].n_timesteps == lb[k].n_timesteps
            assert abs(la[k].max_area - lb[k].max_area) < 1e-9
            assert (
                abs(la[k].centroid_lat_start - lb[k].centroid_lat_start) < 1e-9
                if hasattr(la[k], "centroid_lat_start")
                else True
            )

    def test_rejects_overlapping_times(self, spark):
        from marex_spark.exceptions import ConfigurationError
        from marex_spark.operators.track import extend_track_events

        df = spark.createDataFrame(
            [(1, 0, 0, True)], "d int, y int, x int, extreme boolean"
        ).select(
            F.timestamp_add(
                "DAY", F.col("d"), F.lit("2021-01-01").cast("timestamp")
            ).alias("time"),
            "y", "x", "extreme",
        )
        res = track_events(df, nx=8, compute_stats=False)
        with pytest.raises(ConfigurationError):
            extend_track_events(res.events, df, nx=8, compute_stats=False)


class TestExtendMergeRun:
    """Merge-mode extension: the chunked resolver resumes from the
    prior run's last two slices + id counter. A from-scratch run
    renumbers (its counter seeds from the global label max), so the
    gate is id-free: identical lifetime-stat multisets and ledger
    shapes."""

    def _idfree_life(self, events, time_col="time"):
        rows = (
            events.groupBy("event_id")
            .agg(
                F.min(time_col).alias("t0"),
                F.max(time_col).alias("t1"),
                F.countDistinct(time_col).alias("nt"),
                F.count("*").alias("cells"),
            )
            .select("t0", "t1", "nt", "cells")
            .collect()
        )
        return sorted(map(tuple, rows))

    def _ledger_shape(self, ledger, time_col="time"):
        rows = ledger.select(
            time_col,
            F.size("parent_ids").alias("np"),
            F.sort_array("overlap_areas").alias("areas"),
        ).collect()
        return sorted((r[0], r.np, tuple(r.areas)) for r in rows)

    def test_matches_full_recompute_idfree(self, spark):
        from marex_spark.operators.track import extend_track_events

        ny, nx = 24, 48
        ext = synthetic_extremes_gridded(
            spark, n_time=12, ny=ny, nx=nx, density=0.07, seed=11
        )
        full = track_events(
            ext, nx=nx, overlap_threshold=0.5, compute_stats=False,
            allow_merging=True,
        )
        times = sorted(r[0] for r in ext.select("time").distinct().collect())
        cutoff = times[7]
        prior = track_events(
            ext.filter(F.col("time") <= F.lit(cutoff)),
            nx=nx, overlap_threshold=0.5, compute_stats=False,
            allow_merging=True,
        )
        extd = extend_track_events(
            prior.events,
            ext.filter(F.col("time") > F.lit(cutoff)),
            nx=nx, overlap_threshold=0.5, compute_stats=False,
            allow_merging=True,
            prior_merge_ledger=prior.extras["merge_ledger"],
        )
        assert self._idfree_life(full.events) == self._idfree_life(extd.events)
        assert self._ledger_shape(
            full.extras["merge_ledger"]
        ) == self._ledger_shape(extd.extras["merge_ledger"])
        # combined ledger ids stay unique after the append-shift
        ml = extd.extras["merge_ledger"]
        assert ml.select("merge_id").distinct().count() == ml.count()


def test_intensity_mean_skips_null_anomaly_days(spark):
    """Extreme days whose anomaly is NULL (gaps in the anomaly table)
    must not deflate i_mean: numerator and denominator both skip
    NULLs (review finding)."""
    from pyspark.sql import functions as F

    from marex_spark.operators.stats import episode_stats

    rows = [(0, 0, d, 2.0 if d % 2 == 0 else None) for d in range(10)]
    df = spark.createDataFrame(
        rows, "y int, x int, d int, anomaly double"
    ).select(
        "y", "x",
        F.timestamp_seconds(F.col("d") * 86400).alias("time"),
        F.lit(True).alias("extreme"),
        "anomaly",
    )
    a = episode_stats(df, anomaly_col="anomaly").collect()[0]
    assert a.total_extreme_days == 10
    assert a.i_mean == pytest.approx(2.0)
    assert a.i_cum == pytest.approx(10.0)


class TestOverlapFractionEdges:
    """Reference test_track_edge_cases.py:869-945 parity: pairs whose
    ids are absent from the props table yield an EMPTY result (not an
    error), and overlap fractions > 1.0 are kept without complaint."""

    def test_missing_ids_drop_to_empty(self, spark):
        from marex_spark.operators.overlap import filter_overlap_fraction

        pairs = spark.createDataFrame(
            [(999, 1000, 50.0), (1001, 1002, 60.0)],
            "id_t long, id_next long, overlap_area double",
        )
        areas = spark.createDataFrame(
            [(1, 100.0), (2, 200.0)], "obj_id long, area double"
        )
        out = filter_overlap_fraction(pairs, areas, 0.1)
        assert out.count() == 0
        assert out.columns == ["id_t", "id_next", "overlap_area"]

    def test_fraction_above_one_kept(self, spark):
        from marex_spark.operators.overlap import filter_overlap_fraction

        pairs = spark.createDataFrame(
            [(1, 2, 150.0), (3, 4, 80.0)],
            "id_t long, id_next long, overlap_area double",
        )
        areas = spark.createDataFrame(
            [(1, 100.0), (2, 120.0), (3, 200.0), (4, 300.0)],
            "obj_id long, area double",
        )
        out = {
            (r.id_t, r.id_next)
            for r in filter_overlap_fraction(pairs, areas, 0.5).collect()
        }
        assert (1, 2) in out       # fraction 1.5 — kept
        assert (3, 4) not in out   # fraction 0.4 < 0.5
