"""Sink tests (SURVEY S3/S4/S5): checkpoint round-trip, dynamic region
overwrite leaves untouched partitions intact, stats sidecar."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from marex_spark.sources.io import (
    add_time_bucket,
    checkpoint_parquet,
    read_stats_json,
    write_region,
    write_stats_json,
)


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="marex_io_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_checkpoint_roundtrip(spark, tmp):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    back = checkpoint_parquet(df, f"{tmp}/ckpt")
    assert back.count() == 100
    assert back.agg(F.sum("v")).first()[0] == 9900


def test_region_overwrite_preserves_other_partitions(spark, tmp):
    path = f"{tmp}/store"
    full = spark.createDataFrame(
        [("2024-01", 1), ("2024-02", 2), ("2024-03", 3)], "time_bucket string, v int"
    )
    write_region(full, path)
    # rewrite only Feb with a new value
    patch = spark.createDataFrame([("2024-02", 20)], "time_bucket string, v int")
    write_region(patch, path)
    got = {
        r.time_bucket: r.v for r in spark.read.parquet(path).collect()
    }
    assert got == {"2024-01": 1, "2024-02": 20, "2024-03": 3}


def test_time_bucket_derivation(spark):
    df = spark.createDataFrame(
        [("2024-03-15 12:00:00",)], "t string"
    ).select(F.col("t").cast("timestamp").alias("time"))
    assert add_time_bucket(df).first().time_bucket == "2024-03"


def test_stats_sidecar(tmp):
    write_stats_json({"area_total": 42.5, "n_events": 7}, f"{tmp}/stats.json")
    assert read_stats_json(f"{tmp}/stats.json") == {"area_total": 42.5, "n_events": 7}


class TestTrackResultRoundTrip:
    """write_track_result / read_track_result (reference annotated
    events Dataset write, track.py:1414-1468)."""

    def test_roundtrip(self, spark, tmp_path):
        from marex_spark.operators.track import track_events
        from marex_spark.sources.io import read_track_result, write_track_result
        from marex_spark.sources.synthetic import synthetic_extremes_gridded

        ext = synthetic_extremes_gridded(spark, n_time=6, ny=16, nx=32)
        res = track_events(ext, nx=32, compute_stats=False, allow_merging=True)
        meta = write_track_result(
            res, str(tmp_path / "run1"), attrs={"allow_merging": 1}
        )
        assert meta["allow_merging"] == 1
        assert "events" in meta["tables"] and "merge_ledger" in meta["tables"]

        back = read_track_result(spark, str(tmp_path / "run1"))
        assert back.events.count() == res.events.count()
        assert back.extras["attributes"]["N_events_final"] == meta["N_events_final"]
        assert back.timestep_stats is None  # not written, not invented


@pytest.mark.slow
def test_rewind_then_extend_equals_full(spark, tmp_path):
    """Late-data recovery cycle: rewind an archive to the last good
    timestep, extend forward with the corrected tail — the result must
    equal tracking the corrected series from scratch."""
    from pyspark.sql import functions as F

    from marex_spark.operators.track import track_events
    from marex_spark.sources.io import (
        extend_track_run,
        rewind_track_run,
        write_track_result,
    )
    from marex_spark.sources.synthetic import synthetic_extremes_gridded

    ny, nx = 16, 32
    good = synthetic_extremes_gridded(spark, n_time=10, ny=ny, nx=nx, seed=21)
    times = sorted(r[0] for r in good.select("time").distinct().collect())
    cut = times[6]
    # the "bad" archive: last 3 steps came from a corrupted feed
    # (different seed); the corrected series replaces them
    bad_tail = synthetic_extremes_gridded(
        spark, n_time=10, ny=ny, nx=nx, seed=99
    ).filter(F.col("time") > F.lit(cut))
    bad_series = good.filter(F.col("time") <= F.lit(cut)).unionByName(bad_tail)

    gy = spark.range(ny).select(
        F.col("id").cast("int").alias("y"),
        (-40.0 + F.col("id") * 5.0).alias("lat"),
    )
    gx = spark.range(nx).select(
        F.col("id").cast("int").alias("x"), (F.col("id") * 11.0).alias("lon")
    )
    bad_run = track_events(bad_series, nx=nx, grid_y=gy, grid_x=gx)
    write_track_result(bad_run, f"{tmp_path}/bad")

    rewind_track_run(
        spark, f"{tmp_path}/bad", cut, f"{tmp_path}/rewound",
        grid_y=gy, grid_x=gx,
    )
    extend_track_run(
        spark,
        f"{tmp_path}/rewound",
        good.filter(F.col("time") > F.lit(cut)),
        nx=nx,
        grid_y=gy,
        grid_x=gx,
        out_path=f"{tmp_path}/fixed",
    )

    full = track_events(good, nx=nx, grid_y=gy, grid_x=gx)
    cols = ["time", "y", "x", "obj_id", "event_id"]
    a = sorted(map(tuple, full.events.select(*cols).collect()))
    b = sorted(
        map(
            tuple,
            spark.read.parquet(f"{tmp_path}/fixed/events").select(*cols).collect(),
        )
    )
    assert a == b
    # lifetime stats re-aggregated through the cycle match too
    fa = {r.event_id: r.n_timesteps for r in full.lifetime_stats.collect()}
    fb = {
        r.event_id: r.n_timesteps
        for r in spark.read.parquet(f"{tmp_path}/fixed/lifetime_stats").collect()
    }
    assert fa == fb


def test_rewind_validation(spark, tmp_path):
    import datetime

    from pyspark.sql import functions as F

    from marex_spark.exceptions import ConfigurationError
    from marex_spark.operators.track import track_events
    from marex_spark.sources.io import rewind_track_run, write_track_result
    from marex_spark.sources.synthetic import synthetic_extremes_gridded

    ext = synthetic_extremes_gridded(spark, n_time=4, ny=8, nx=16, seed=5)
    res = track_events(ext, nx=16, compute_stats=False)
    write_track_result(res, f"{tmp_path}/run")
    with pytest.raises(ConfigurationError, match="differ"):
        rewind_track_run(spark, f"{tmp_path}/run", None, f"{tmp_path}/run")
    with pytest.raises(ConfigurationError, match="every timestep"):
        rewind_track_run(
            spark, f"{tmp_path}/run",
            datetime.datetime(1900, 1, 1), f"{tmp_path}/out",
        )


@pytest.mark.slow
def test_rewind_splits_tail_only_merges(spark, tmp_path):
    """The review repro: two blobs merge ONLY in the (dropped) tail.
    Min-root event ids had already been unified retroactively, so a
    bare filter would keep them fused — rewind must RE-LINK and split
    them back, equalling a run stopped at the cut."""
    from pyspark.sql import functions as F

    from marex_spark.operators.track import track_events
    from marex_spark.sources.io import rewind_track_run, write_track_result

    rows = []
    for d in (1, 2, 3):
        for xx in (2, 3):
            rows.append((d, 5, xx, True))
        for xx in (10, 11):
            rows.append((d, 5, xx, True))
    for xx in range(2, 12):  # t=4: the spanning (to-be-dropped) bridge
        rows.append((4, 5, xx, True))
    df = spark.createDataFrame(rows, "d int, y int, x int, extreme boolean").select(
        F.timestamp_add("DAY", F.col("d"), F.lit("2021-01-01").cast("timestamp")).alias("time"),
        "y", "x", "extreme",
    )
    run = track_events(df, nx=32, compute_stats=False)
    assert run.events.select("event_id").distinct().count() == 1  # fused
    write_track_result(run, f"{tmp_path}/fused")

    times = sorted(r[0] for r in df.select("time").distinct().collect())
    rewind_track_run(spark, f"{tmp_path}/fused", times[2], f"{tmp_path}/rw")

    stopped = track_events(
        df.filter(F.col("time") <= F.lit(times[2])), nx=32, compute_stats=False
    )
    cols = ["time", "y", "x", "obj_id", "event_id"]
    a = sorted(map(tuple, stopped.events.select(*cols).collect()))
    b = sorted(
        map(tuple, spark.read.parquet(f"{tmp_path}/rw/events").select(*cols).collect())
    )
    assert a == b
    assert stopped.events.select("event_id").distinct().count() == 2  # split back


class TestRewindProvenance:
    """Archived linking provenance (overlap_threshold / compact_ids)
    drives the rewind re-link; stats guards are loud, not silent."""

    def _run(self, spark, **kw):
        from pyspark.sql import functions as F

        from marex_spark.operators.track import track_events
        from marex_spark.sources.synthetic import synthetic_extremes_gridded

        ext = synthetic_extremes_gridded(spark, n_time=6, ny=12, nx=24, seed=8)
        times = sorted(r[0] for r in ext.select("time").distinct().collect())
        return track_events(ext, nx=24, **kw), times

    @pytest.mark.slow
    def test_stats_archive_requires_dims_or_optout(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from marex_spark.exceptions import ConfigurationError
        from marex_spark.sources.io import rewind_track_run, write_track_result

        gy = spark.range(12).select(
            F.col("id").cast("int").alias("y"), (F.col("id") * 1.0).alias("lat")
        )
        gx = spark.range(24).select(
            F.col("id").cast("int").alias("x"), (F.col("id") * 1.0).alias("lon")
        )
        res, times = self._run(spark, grid_y=gy, grid_x=gx)
        write_track_result(res, f"{tmp_path}/r")
        with pytest.raises(ConfigurationError, match="stats"):
            rewind_track_run(spark, f"{tmp_path}/r", times[3], f"{tmp_path}/o1")
        import os

        rewind_track_run(
            spark, f"{tmp_path}/r", times[3], f"{tmp_path}/o2", drop_stats=True
        )
        assert not os.path.isdir(f"{tmp_path}/o2/timestep_stats")
        rewind_track_run(
            spark, f"{tmp_path}/r", times[3], f"{tmp_path}/o3",
            grid_y=gy, grid_x=gx,
        )
        assert os.path.isdir(f"{tmp_path}/o3/timestep_stats")

    @pytest.mark.slow
    def test_compact_archive_rewinds_to_dense_ids(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from marex_spark.operators.track import track_events
        from marex_spark.sources.io import rewind_track_run, write_track_result
        from marex_spark.sources.synthetic import synthetic_extremes_gridded

        ext = synthetic_extremes_gridded(spark, n_time=6, ny=12, nx=24, seed=8)
        times = sorted(r[0] for r in ext.select("time").distinct().collect())
        res = track_events(ext, nx=24, compute_stats=False, compact_ids=True)
        write_track_result(res, f"{tmp_path}/c")
        rewind_track_run(spark, f"{tmp_path}/c", times[3], f"{tmp_path}/co")
        stopped = track_events(
            ext.filter(F.col("time") <= F.lit(times[3])),
            nx=24, compute_stats=False, compact_ids=True,
        )
        cols = ["time", "y", "x", "obj_id", "event_id"]
        a = sorted(map(tuple, stopped.events.select(*cols).collect()))
        b = sorted(
            map(
                tuple,
                spark.read.parquet(f"{tmp_path}/co/events").select(*cols).collect(),
            )
        )
        assert a == b
        ids = {r.event_id for r in stopped.events.select("event_id").distinct().collect()}
        assert ids == set(range(1, len(ids) + 1))  # dense 1..K preserved


class TestExtendProvenance:
    """extend_track_run guards mirror rewind_track_run: merge-mode
    archives resume the resolver by default (the ledger must survive),
    pre-provenance archives demand an explicit compact_ids assertion,
    and archived stats cannot be dropped silently."""

    def _blob_series(self, spark, n_time=5, bridge_at=None):
        from pyspark.sql import functions as F

        rows = []
        for d in range(1, n_time + 1):
            for xx in (2, 3):
                rows.append((d, 5, xx, True))
            for xx in (10, 11):
                rows.append((d, 5, xx, True))
            if bridge_at is not None and d >= bridge_at:
                for xx in range(4, 10):
                    rows.append((d, 5, xx, True))
        return spark.createDataFrame(
            rows, "d int, y int, x int, extreme boolean"
        ).select(
            F.timestamp_add(
                "DAY", F.col("d"), F.lit("2021-01-01").cast("timestamp")
            ).alias("time"),
            "y", "x", "extreme",
        )

    @pytest.mark.slow
    def test_merge_archive_resumes_resolver_by_default(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from marex_spark.operators.track import track_events
        from marex_spark.sources.io import (
            extend_track_run,
            read_stats_json,
            write_track_result,
        )

        df = self._blob_series(spark, n_time=6, bridge_at=4)
        times = sorted(r[0] for r in df.select("time").distinct().collect())
        cut = times[4]
        prior = track_events(
            df.filter(F.col("time") <= F.lit(cut)),
            nx=32, compute_stats=False, allow_merging=True,
        )
        assert prior.extras.get("merge_ledger") is not None
        n_ledger = prior.extras["merge_ledger"].count()
        assert n_ledger > 0  # the bridge produced a merge event
        write_track_result(prior, f"{tmp_path}/m")

        # NO allow_merging passed: must default from the archived ledger
        res = extend_track_run(
            spark,
            f"{tmp_path}/m",
            df.filter(F.col("time") > F.lit(cut)),
            nx=32,
            out_path=f"{tmp_path}/me",
            compute_stats=False,
        )
        assert res.extras.get("merge_ledger") is not None
        meta = read_stats_json(f"{tmp_path}/me/attributes.json")
        assert "merge_ledger" in meta["tables"]
        # every pre-append merge event survived into the new archive
        out_ledger = spark.read.parquet(f"{tmp_path}/me/merge_ledger")
        assert out_ledger.filter(F.col("time") <= F.lit(cut)).count() == n_ledger

    @pytest.mark.slow
    def test_pre_provenance_archive_requires_compact_assertion(
        self, spark, tmp_path
    ):
        import json

        from pyspark.sql import functions as F

        from marex_spark.exceptions import ConfigurationError
        from marex_spark.operators.track import track_events
        from marex_spark.sources.io import extend_track_run, write_track_result

        df = self._blob_series(spark, n_time=4)
        times = sorted(r[0] for r in df.select("time").distinct().collect())
        prior = track_events(
            df.filter(F.col("time") <= F.lit(times[2])),
            nx=32, compute_stats=False,
        )
        write_track_result(prior, f"{tmp_path}/p")
        # simulate an older engine: strip the provenance key
        ap = f"{tmp_path}/p/attributes.json"
        with open(ap) as f:
            attrs = json.load(f)
        attrs.pop("compact_ids", None)
        with open(ap, "w") as f:
            json.dump(attrs, f)

        new = df.filter(F.col("time") > F.lit(times[2]))
        with pytest.raises(ConfigurationError, match="compact_ids"):
            extend_track_run(spark, f"{tmp_path}/p", new, nx=32,
                             compute_stats=False)
        res = extend_track_run(
            spark, f"{tmp_path}/p", new, nx=32,
            compute_stats=False, compact_ids=False,
        )
        assert res.events.count() > 0

    @pytest.mark.slow
    def test_extend_stats_archive_requires_dims_or_optout(self, spark, tmp_path):
        import os

        from pyspark.sql import functions as F

        from marex_spark.exceptions import ConfigurationError
        from marex_spark.operators.track import track_events
        from marex_spark.sources.io import extend_track_run, write_track_result

        gy = spark.range(12).select(
            F.col("id").cast("int").alias("y"), (F.col("id") * 1.0).alias("lat")
        )
        gx = spark.range(32).select(
            F.col("id").cast("int").alias("x"), (F.col("id") * 1.0).alias("lon")
        )
        df = self._blob_series(spark, n_time=4)
        times = sorted(r[0] for r in df.select("time").distinct().collect())
        prior = track_events(
            df.filter(F.col("time") <= F.lit(times[2])),
            nx=32, grid_y=gy, grid_x=gx,
        )
        write_track_result(prior, f"{tmp_path}/s")
        new = df.filter(F.col("time") > F.lit(times[2]))
        with pytest.raises(ConfigurationError, match="stats"):
            extend_track_run(spark, f"{tmp_path}/s", new, nx=32,
                             out_path=f"{tmp_path}/s1")
        extend_track_run(
            spark, f"{tmp_path}/s", new, nx=32,
            out_path=f"{tmp_path}/s2", drop_stats=True,
        )
        assert not os.path.isdir(f"{tmp_path}/s2/timestep_stats")
        extend_track_run(
            spark, f"{tmp_path}/s", new, nx=32,
            grid_y=gy, grid_x=gx, out_path=f"{tmp_path}/s3",
        )
        assert os.path.isdir(f"{tmp_path}/s3/timestep_stats")


@pytest.mark.slow
def test_rewind_merge_mode_event_level(spark, tmp_path):
    """Merge-mode rewind pins EVENT-level equality with a stopped run
    (obj_id-level equality is not promised: the chunked resolver
    consolidates slice t-1 while processing t, so the cut slice can
    carry sibling-child ids already fused). Compare event partitions
    of cells, id-free."""
    from pyspark.sql import functions as F

    from marex_spark.operators.track import track_events
    from marex_spark.sources.io import rewind_track_run, write_track_result

    rows = []
    for d in (1, 2, 3):
        for xx in (2, 3):
            rows.append((d, 5, xx, True))
        for xx in (10, 11):
            rows.append((d, 5, xx, True))
    for xx in range(2, 12):  # t=4: bridge that exists only in the tail
        rows.append((4, 5, xx, True))
    df = spark.createDataFrame(rows, "d int, y int, x int, extreme boolean").select(
        F.timestamp_add("DAY", F.col("d"), F.lit("2021-01-01").cast("timestamp")).alias("time"),
        "y", "x", "extreme",
    )
    run = track_events(df, nx=32, compute_stats=False, allow_merging=True)
    write_track_result(run, f"{tmp_path}/mf")
    times = sorted(r[0] for r in df.select("time").distinct().collect())
    rewind_track_run(spark, f"{tmp_path}/mf", times[2], f"{tmp_path}/mrw")

    stopped = track_events(
        df.filter(F.col("time") <= F.lit(times[2])),
        nx=32, compute_stats=False, allow_merging=True,
    )

    def partitions(ev):
        groups = {}
        for r in ev.select("time", "y", "x", "event_id").collect():
            groups.setdefault(r.event_id, set()).add((r.time, r.y, r.x))
        return sorted(
            (sorted(g) for g in groups.values()), key=lambda g: g[0]
        )

    a = partitions(stopped.events)
    b = partitions(spark.read.parquet(f"{tmp_path}/mrw/events"))
    assert a == b
    assert len(a) == 2  # the tail-only merge split back apart


def test_extend_compact_conflict_raises(spark, tmp_path):
    """An explicit compact_ids=True against a compact_ids=False archive
    must fail loudly, not silently hand back non-compact ids."""
    from pyspark.sql import functions as F

    from marex_spark.exceptions import ConfigurationError
    from marex_spark.operators.track import track_events
    from marex_spark.sources.io import extend_track_run, write_track_result
    from marex_spark.sources.synthetic import synthetic_extremes_gridded

    ext = synthetic_extremes_gridded(spark, n_time=4, ny=8, nx=16, seed=7)
    times = sorted(r[0] for r in ext.select("time").distinct().collect())
    prior = track_events(
        ext.filter(F.col("time") <= F.lit(times[1])), nx=16, compute_stats=False
    )
    write_track_result(prior, f"{tmp_path}/cc")
    with pytest.raises(ConfigurationError, match="conflicts"):
        extend_track_run(
            spark, f"{tmp_path}/cc",
            ext.filter(F.col("time") > F.lit(times[1])),
            nx=16, compute_stats=False, compact_ids=True,
        )
