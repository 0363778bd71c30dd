"""Sinks and ingestion (SURVEY §2.1 S2-S5).

The reference checkpoints to zarr to cut the dask graph
(helper.py:642-777) and region-writes time slices back into a store
(track.py:4323-4328); the Spark-native forms are a parquet round-trip
and dynamic partition overwrite.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def checkpoint_parquet(df: DataFrame, path: str) -> DataFrame:
    """S3 (helper.py:642-777 ``checkpoint_to_zarr``): materialise to
    parquet and re-read — breaks lineage, frees shuffle state, and the
    re-read scan gets column pruning/predicate pushdown for downstream
    stages. The durable alternative to ``localCheckpoint`` (survives
    executor loss on a real cluster)."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def write_region(
    df: DataFrame,
    path: str,
    partition_col: str = "time_bucket",
) -> None:
    """S4 (track.py:4323-4328 zarr region write): overwrite only the
    partitions present in ``df`` (dynamic partition overwrite), leaving
    the rest of the store untouched — the idempotent re-run primitive
    for per-time-bucket outputs."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_stats_json(stats: dict, path: str) -> None:
    """S5 (track.py:1264-1277 npz stats sink): tiny scalar sidecar."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(stats, f, sort_keys=True)


def read_stats_json(path: str) -> dict:
    """S5 load (track.py:1353-1366)."""
    with open(path) as f:
        return json.load(f)


def ingest_netcdf(
    spark: SparkSession,
    nc_path: str,
    var: str,
    time_dim: str = "time",
    y_dim: str = "lat",
    x_dim: str = "lon",
    time_min=None,
    time_max=None,
) -> DataFrame:
    """S2 (detect.py:409 ``xr.open_dataset``): NetCDF → long-format
    DataFrame ingestion. Classic-format files (CDF-1/CDF-2) go through
    the stdlib distributed reader (sources/netcdf.py — one task per
    record range); NetCDF-4/HDF5 containers go through the stdlib HDF5
    subset reader (sources/hdf5.py — one task per chunk batch). Other
    containers (CDF-5, exotic HDF5 features) fall back to
    xarray+netCDF4 when installed, gated behind an import so the
    engine degrades gracefully."""
    with open(nc_path, "rb") as f:
        magic = f.read(8)
    if magic[:3] == b"CDF" and magic[3] in (1, 2):
        from marex_spark.sources.netcdf import ingest_netcdf_classic

        return ingest_netcdf_classic(
            spark, nc_path, var, time_var=time_dim,
            time_min=time_min, time_max=time_max,
        )
    if magic == b"\x89HDF\r\n\x1a\n":
        from marex_spark.exceptions import DataValidationError
        from marex_spark.sources.hdf5 import ingest_netcdf4

        try:
            return ingest_netcdf4(
                spark, nc_path, var, time_var=time_dim,
                time_min=time_min, time_max=time_max,
            )
        except (DataValidationError, NotImplementedError):
            # outside the stdlib subset (new-style groups, superblock
            # v2+, exotic filters) — fall through to the xarray path
            # below rather than regressing files that used to ingest
            pass
    try:
        import xarray as xr  # noqa: F401
    except ImportError as e:  # pragma: no cover
        from marex_spark.exceptions import DependencyError

        raise DependencyError(
            "NetCDF ingestion needs xarray+netCDF4",
            details={"path": nc_path},
            suggestions=[
                "convert to parquet offline (tools/ingest_zarr.py for zarr)",
                "install xarray + netCDF4 codecs",
            ],
        ) from e
    ds = xr.open_dataset(nc_path)  # pragma: no cover
    pdf = ds[var].to_dataframe().reset_index()  # pragma: no cover
    return spark.createDataFrame(  # pragma: no cover
        pdf.rename(columns={time_dim: "time", y_dim: "y", x_dim: "x", var: "value"})
    )


def ingest_netcdf_archive(
    spark: SparkSession,
    paths,
    var: str,
    time_dim: str = "time",
    layout: str = "long",
    time_min=None,
    time_max=None,
) -> DataFrame:
    """A multi-file NetCDF archive (the standard one-file-per-year
    layout) as one DataFrame. ``paths`` is a list or a glob pattern.

    All-HDF5 archives take the single-plan path
    (:func:`marex_spark.sources.hdf5.ingest_netcdf4_archive` — every
    file's chunks in ONE descriptor DataFrame); mixed or classic
    archives union the per-file plans, which is fine for the dozens-of-
    files case and degrades gracefully (each classic file is already
    one record-range plan)."""
    import glob as _glob
    from functools import reduce

    if isinstance(paths, str):
        paths = sorted(_glob.glob(paths))
    paths = list(paths)
    if not paths:
        from marex_spark.exceptions import DataValidationError

        raise DataValidationError("ingest_netcdf_archive: no input files")

    def _magic(p):
        with open(p, "rb") as f:
            return f.read(8)

    if all(_magic(p) == b"\x89HDF\r\n\x1a\n" for p in paths):
        from marex_spark.sources.hdf5 import ingest_netcdf4_archive

        return ingest_netcdf4_archive(
            spark, paths, var, time_var=time_dim, layout=layout,
            time_min=time_min, time_max=time_max,
        )
    dfs = [
        ingest_netcdf(
            spark, p, var, time_dim=time_dim,
            time_min=time_min, time_max=time_max,
        )
        for p in paths
    ]
    out = reduce(DataFrame.unionByName, dfs)
    if layout == "long":
        return out
    from marex_spark.operators.detect_blocked import pack_gridded

    nx = 1 + out.agg(F.max("x")).first()[0]
    return pack_gridded(out, nx=nx)


def add_time_bucket(df: DataFrame, time_col: str = "time", fmt: str = "yyyy-MM") -> DataFrame:
    """Month-bucket partition key for S4-style layouts (SURVEY §7.0:
    parquet partitioned by time bucket)."""
    return df.withColumn("time_bucket", F.date_format(time_col, fmt))


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list,
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Land a table BUCKETED by its join/group key (hash-bucketed +
    optionally sorted within buckets, Hive layout).

    This is the storage-side half of the co-located-join strategy for
    repeated joins at 100 TB: two tables bucketed the same way on the
    same keys join with ZERO exchange — the SortMergeJoin reads both
    sides' matching buckets in place (pinned by
    tests/test_plans.py::test_bucketed_join_is_shuffle_free). The
    reference has no analogue (dask aligns chunks in memory); on Spark
    the same idea lives in the table layout.

    Uses ``saveAsTable`` because bucketing metadata lives in the
    catalog, not the files; ``path`` overrides the warehouse location.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", os.path.abspath(path))
    w.saveAsTable(table)


def write_track_result(
    res,
    path: str,
    attrs: dict | None = None,
) -> dict:
    """One-call persistence of a tracking run — the Spark form of the
    reference's annotated events Dataset write (track.py:1414-1468
    run_stats_attributes + its zarr write): each component table lands
    as parquet under ``path`` and the run metadata (allow_merging
    analogue flags, table row counts, user attrs such as
    Tracker.preprocess_stats()) as a JSON sidecar.

    Layout: events/ timestep_stats/ lifetime_stats/ merge_ledger/
    parquet dirs (present when the result carries them) +
    attributes.json. Returns the attributes written."""
    parts = {
        "events": res.events,
        "timestep_stats": res.timestep_stats,
        "lifetime_stats": res.lifetime_stats,
        "merge_ledger": res.extras.get("merge_ledger"),
    }
    written = {}
    for name, df in parts.items():
        if df is not None:
            df.write.mode("overwrite").parquet(f"{path}/{name}")
            written[name] = True
    meta = dict(attrs or {})
    meta["tables"] = sorted(written)
    # linking provenance (rewind_track_run re-links with the same gate
    # and numbering); absent for results from older engine versions
    for k in ("overlap_threshold", "compact_ids"):
        if k in res.extras:
            meta[k] = res.extras[k]
    # all from the parquet just written — re-counting res.events would
    # re-execute the tracking DAG a second time. ONE scan computes the
    # event count and the archive head together (extend_track_run
    # passes the head as prior_head so the append cycle never scans
    # the archive).
    spark = res.events.sparkSession
    ev = spark.read.parquet(f"{path}/events")
    time_col = next((c for c in ("time", "d") if c in ev.columns), None)
    aggs = [F.countDistinct("event_id").alias("n")]
    if time_col is not None and "obj_id" in ev.columns:
        aggs += [F.max(time_col).alias("t"), F.max("obj_id").alias("i")]
    head = ev.agg(*aggs).collect()[0]
    meta["N_events_final"] = int(head.n)
    if len(aggs) > 1 and head.t is not None:
        meta["time_col"] = time_col
        meta["t_max"] = (
            head.t.isoformat() if hasattr(head.t, "isoformat") else head.t
        )
        meta["max_obj_id"] = int(head.i)
        # timestamps serialise session-tz-naive: record the tz so a
        # reader in a different session timezone falls back to the
        # exact aggregation instead of silently mislinking
        meta["session_tz"] = spark.conf.get(
            "spark.sql.session.timeZone", "UTC"
        )
    if written.get("merge_ledger"):
        # the reference's merge summary attrs (track.py:1477-1479):
        # total_merges = ledger length, multi_parent_merges = records
        # with more than two parents
        led = spark.read.parquet(f"{path}/merge_ledger")
        row = led.agg(
            F.count("*").alias("n"),
            F.sum(
                (F.size("parent_ids") > 2).cast("long")
            ).alias("multi"),
        ).collect()[0]
        meta["total_merges"] = int(row.n)
        meta["multi_parent_merges"] = int(row.multi or 0)
    # input-data attributes update LAST — the reference's precedence
    # (events_ds.attrs.update(self.data_attrs), track.py:1484): on a
    # key collision the user's data attrs win over the run summary
    meta.update(res.extras.get("data_attrs") or {})
    write_stats_json(meta, f"{path}/attributes.json")
    return meta


def read_track_result(spark, path: str):
    """Round-trip loader for :func:`write_track_result` — rebuilds a
    ``TrackResult`` (lazy scans; attributes from the JSON sidecar into
    ``extras['attributes']``)."""
    import os

    from marex_spark.operators.track import TrackResult

    def _maybe(name):
        p = f"{path}/{name}"
        return spark.read.parquet(p) if os.path.isdir(p) else None

    extras = {"attributes": read_stats_json(f"{path}/attributes.json")}
    ledger = _maybe("merge_ledger")
    if ledger is not None:
        extras["merge_ledger"] = ledger
    return TrackResult(
        events=spark.read.parquet(f"{path}/events"),
        timestep_stats=_maybe("timestep_stats"),
        lifetime_stats=_maybe("lifetime_stats"),
        extras=extras,
    )


def export_events_zarr(
    events: DataFrame,
    store: str,
    ny: int | None = None,
    nx: int | None = None,
    var: str = "ID_field",
    chunks: tuple[int, int, int] = (64, 180, 360),
    attrs: dict | None = None,
    zarr_format: int = 2,
):
    """Export a gridded events table (time, y, x, event_id) as the
    reference's int event-ID zarr field (track.py:4323-4328: `ID_field`
    int array, background 0) so xarray/zarr consumers of the reference's
    output can read this engine's tracking results unchanged.

    Cells not covered by any event are the implicit 0 background
    (all-background chunks write no file). Distributed executor-side
    chunk writes — see :func:`marex_spark.sources.zarr.write_zarr_gridded`.
    Returns the per-chunk receipts DataFrame."""
    from marex_spark.sources.zarr import write_zarr_gridded

    return write_zarr_gridded(
        events,
        store,
        var=var,
        value_col="event_id",
        ny=ny,
        nx=nx,
        chunks=chunks,
        attrs=attrs,
        dtype="<i4",
        fill_value=0,
        zarr_format=zarr_format,
    )


def _check_distinct_out_path(path: str, out_path: str) -> None:
    """Refuse writing an archive over its own lazy input; resolved to
    real absolute paths so relative spellings and symlink aliases of
    the same directory cannot bypass the guard (remote URIs compare
    normalised as-is)."""
    from marex_spark.exceptions import ConfigurationError

    def _canon(p: str) -> str:
        if p.startswith("file:"):
            # a file: URI names a local path — resolve it like one so
            # 'file:///x' and '/x' compare equal
            local = p[5:].lstrip("/")
            return os.path.realpath("/" + local)
        if "://" in p:
            return os.path.normpath(p)
        return os.path.realpath(os.path.abspath(p))

    if _canon(out_path) == _canon(path):
        raise ConfigurationError(
            "out_path must differ from path (lazy scans would overwrite "
            "their own input)",
            details={"path": path},
        )


def extend_track_run(
    spark,
    path: str,
    new_extremes,
    nx: int,
    grid_y=None,
    grid_x=None,
    out_path: str | None = None,
    drop_stats: bool = False,
    **track_kwargs,
):
    """Persistence-level incremental tracking: load a
    :func:`write_track_result` directory, extend it with new timesteps
    (:func:`marex_spark.operators.track.extend_track_events` — exact
    parity with a full recompute), and optionally persist the combined
    run to ``out_path``.

    ``out_path`` must differ from ``path``: the extension reads the
    prior parquet lazily, so writing over it would clobber its own
    input mid-job. A production cycle alternates two generation
    directories (or uses dated paths) and flips a pointer — the same
    pattern as any overwrite-safe parquet pipeline.

    Returns the extended ``TrackResult`` (attributes of the prior run
    stay available under ``extras['attributes']`` when persisted)."""
    from marex_spark.exceptions import ConfigurationError
    from marex_spark.operators.track import extend_track_events

    if out_path is not None:
        _check_distinct_out_path(path, out_path)
    prior = read_track_result(spark, path)
    attrs = prior.extras.get("attributes") or {}
    # linking provenance is AUTHORITATIVE (rewind_track_run trusts the
    # archived values): default the extension's gate from the archive
    # instead of silently re-linking the boundary at 0.0, and refuse
    # compact-id archives — extension's exactness argument needs
    # root-stable event ids (a full compact recompute renumbers
    # globally, so no extension can match it)
    if attrs.get("compact_ids"):
        raise ConfigurationError(
            "archive was written with compact_ids=True — extension "
            "requires root-stable event ids; re-run tracking with "
            "compact_ids=False (the default) to produce an extendable "
            "archive",
            details={"path": path},
        )
    if "compact_ids" not in attrs:
        # pre-provenance archive: the key's ABSENCE must not pass the
        # guard silently (a compact_ids=True archive written by an older
        # engine would extend and diverge from a full recompute) — mirror
        # rewind_track_run and demand the caller assert the original value
        if track_kwargs.pop("compact_ids", None) is not False:
            raise ConfigurationError(
                "archive records no compact_ids (written by an older "
                "engine version) — assert the original run used the "
                "default by passing compact_ids=False explicitly",
                details={"path": path},
            )
    else:
        explicit = track_kwargs.pop("compact_ids", None)
        if explicit is True:
            # archive records compact_ids=False — honouring the request
            # is impossible (extension requires root-stable ids), and
            # silently ignoring it would hand back non-compact ids the
            # caller believes are compacted
            raise ConfigurationError(
                "compact_ids=True conflicts with the archive's recorded "
                "compact_ids=False — extension cannot produce compacted "
                "ids; re-run tracking with compact_ids=True if dense ids "
                "are required",
                details={"path": path},
            )
    if "overlap_threshold" not in track_kwargs and "overlap_threshold" in attrs:
        track_kwargs["overlap_threshold"] = float(attrs["overlap_threshold"])
    # a merge-mode archive must resume the resolver: extending with the
    # default allow_merging=False would silently run a no-merge extension
    # and write_track_result would then DROP the prior ledger from
    # out_path (the no-merge TrackResult carries none)
    if prior.extras.get("merge_ledger") is not None and "allow_merging" not in track_kwargs:
        track_kwargs["allow_merging"] = True
    # archived stats are recomputed through the dimension tables; losing
    # them because grid_y/grid_x were omitted should be loud (mirror
    # rewind_track_run's drop_stats contract)
    if (
        not drop_stats
        and prior.timestep_stats is not None
        and (grid_y is None or grid_x is None)
        and track_kwargs.get("compute_stats", True)
    ):
        raise ConfigurationError(
            "archive carries timestep/lifetime stats but grid_y/grid_x "
            "were not supplied — the extended archive would silently "
            "lose both stats tables; pass the dimension tables or opt "
            "out explicitly with drop_stats=True",
            details={"path": path},
        )
    # the archive head from the run's metadata: the extension then
    # never runs a job over the whole prior events table
    prior_head = None
    if (
        "t_max" in attrs
        and "max_obj_id" in attrs
        and track_kwargs.get("time_col", "time") == attrs.get("time_col", "time")
    ):
        t_max = attrs["t_max"]
        usable = True
        if isinstance(t_max, str):
            import datetime

            tc = attrs.get("time_col", "time")
            t_type = prior.events.schema[tc].dataType.simpleString()
            if t_type == "date":
                # dates have no timezone — always safe to reuse
                t_max = datetime.date.fromisoformat(t_max)
            elif t_type.startswith("timestamp"):
                # serialised timestamps are session-tz-naive: a tz
                # mismatch (or a pre-metadata archive with no recorded
                # tz) would parse to a different instant, match an
                # empty boundary slice, and skip linking — fall back
                # to the exact aggregation in that case
                usable = attrs.get("session_tz") == spark.conf.get(
                    "spark.sql.session.timeZone", "UTC"
                )
                t_max = datetime.datetime.fromisoformat(t_max)
        if usable:
            prior_head = (t_max, int(attrs["max_obj_id"]))
    res = extend_track_events(
        prior.events,
        new_extremes,
        nx=nx,
        grid_y=grid_y,
        grid_x=grid_x,
        prior_timestep_stats=prior.timestep_stats,
        # a merge-mode prior run's persisted ledger must carry through,
        # or the extended run's ledger would silently lose every
        # pre-append merge event
        prior_merge_ledger=prior.extras.get("merge_ledger"),
        prior_head=prior_head,
        **track_kwargs,
    )
    if out_path is not None:
        attrs = dict(prior.extras.get("attributes") or {})
        attrs["extended_from"] = path
        write_track_result(res, out_path, attrs=attrs)
    return res


def rewind_track_run(
    spark,
    path: str,
    to_time,
    out_path: str,
    overlap_threshold: float | None = None,
    compact_ids: bool | None = None,
    grid_y=None,
    grid_x=None,
    cell_areas=None,
    cell_geo=None,
    drop_stats: bool = False,
):
    """Truncate an archived tracking run at ``to_time`` (inclusive) —
    the recovery half of the append cycle: when late-arriving or
    corrected data invalidates the tail of an archive, rewind to the
    last good timestep and :func:`extend_track_run` forward from there
    instead of recomputing the whole history.

    For no-merge archives, object labels truncate exactly (labelling
    at step t uses only information at or before t). For merge-mode
    archives the guarantee is EVENT-level only: the chunked resolver
    consolidates slice t-1 while processing slice t, so the cut slice
    may carry sibling-child obj_ids already fused that a run genuinely
    stopped at ``to_time`` would keep separate — the children share a
    parent and re-link into the same event either way, so event
    membership and stats match, but obj_id-level equality is not
    promised. EVENT ids need re-linking in both modes:
    the min-root union-find spans the whole run, so a merge link that
    existed only in the dropped tail has already retroactively unified
    earlier events' ids. Rewind therefore RE-LINKS the surviving
    labels (overlap graph + union-find over the kept timesteps, using
    the run's ARCHIVED ``overlap_threshold``/``compact_ids`` —
    write_track_result persists them; an explicit
    ``overlap_threshold`` argument overrides, and archives from
    engine versions that predate the provenance keys REQUIRE it),
    which splits tail-only merges back apart and makes the rewound
    archive equal a run that had stopped at ``to_time``. Re-linking
    reads only the stored labels: no detect, no labelling, no
    morphology is repeated.

    Per-timestep stats are recomputed from the surviving cell rows
    (prior stats rows are unusable for split events — two formerly
    unified tracks aggregated into one row): pass ``grid_y``/``grid_x``
    (+ optional ``cell_areas``) for gridded runs or ``cell_geo`` for
    meshes. When the archive CARRIES stats but the dimension tables
    are missing, rewind refuses rather than silently dropping them —
    opt out explicitly with ``drop_stats=True``. Ledger rows after
    the cut are dropped.

    Writes a fresh archive at ``out_path`` (which must differ from
    ``path``) and returns its attributes."""
    from marex_spark.exceptions import ConfigurationError
    from marex_spark.operators.components import (
        connected_components_driver,
        remap_ids,
        remap_ids_sparse,
    )
    from marex_spark.operators.overlap import (
        filter_overlap_fraction,
        object_areas,
        overlap_pairs,
    )
    from marex_spark.operators.stats import event_lifetime_stats
    from marex_spark.operators.track import (
        TrackResult,
        _mesh_timestep_stats,
        _timestep_stats_with_areas,
    )

    _check_distinct_out_path(path, out_path)
    prior = read_track_result(spark, path)
    attrs = prior.extras.get("attributes") or {}
    tc = attrs.get("time_col", "time")
    if overlap_threshold is None:
        if "overlap_threshold" not in attrs:
            raise ConfigurationError(
                "archive records no overlap_threshold (written by an "
                "older engine version) — pass the original run's value "
                "explicitly",
                details={"path": path},
            )
        overlap_threshold = float(attrs["overlap_threshold"])
    if compact_ids is None:
        if "compact_ids" not in attrs:
            raise ConfigurationError(
                "archive records no compact_ids (written by an older "
                "engine version) — pass the original run's value "
                "explicitly",
                details={"path": path},
            )
        compact_ids = bool(attrs["compact_ids"])
    compact = compact_ids
    kept = prior.events.filter(F.col(tc) <= F.lit(to_time))
    if kept.limit(1).count() == 0:
        raise ConfigurationError(
            "rewind would drop every timestep",
            details={"to_time": str(to_time)},
        )
    keys = ("cell",) if "cell" in kept.columns else ("y", "x")
    # settle the stats question BEFORE the (expensive) re-link: every
    # input to the decision is already known
    had_stats = prior.timestep_stats is not None
    dims_given = (
        keys == ("y", "x") and grid_y is not None and grid_x is not None
    ) or (keys == ("cell",) and cell_geo is not None)
    if drop_stats and dims_given:
        raise ConfigurationError(
            "contradictory request: drop_stats=True together with "
            "dimension tables — omit one",
        )
    if had_stats and not dims_given and not drop_stats:
        raise ConfigurationError(
            "archive carries stats tables but no dimension tables were "
            "given to recompute them (prior stats rows are unusable "
            "after re-linking) — pass grid_y/grid_x or cell_geo, or "
            "set drop_stats=True to write the rewound archive without "
            "stats",
            details={"path": path},
        )
    labels = kept.select(tc, *keys, "obj_id").localCheckpoint()
    pairs = overlap_pairs(labels, keys=keys, time_col=tc)
    if overlap_threshold > 0:
        areas = object_areas(labels, time_col=tc)
        pairs = filter_overlap_fraction(pairs, areas, overlap_threshold)
    # same numbering as the archived run: dense 1..K when it used
    # compact_ids, component roots otherwise (sparse mapping +
    # coalescing remap — skips the all-ids distinct pass)
    if compact:
        mapping = connected_components_driver(pairs, labels, compact=True)
        events = remap_ids(labels, mapping)
    else:
        mapping = connected_components_driver(
            pairs, labels, compact=False, include_singletons=False
        )
        events = remap_ids_sparse(labels, mapping)

    ts = life = None
    if dims_given:
        if keys == ("y", "x"):
            ts = _timestep_stats_with_areas(
                events, grid_y, grid_x, cell_areas, tc
            )
        else:
            ts = _mesh_timestep_stats(events, cell_geo, tc)
        life = event_lifetime_stats(ts, time_col=tc)
    extras = {
        "overlap_threshold": overlap_threshold,
        "compact_ids": compact,
    }
    ledger = prior.extras.get("merge_ledger")
    if ledger is not None:
        extras["merge_ledger"] = ledger.filter(F.col(tc) <= F.lit(to_time))
    res = TrackResult(
        events=events, timestep_stats=ts, lifetime_stats=life, extras=extras
    )
    new_attrs = dict(attrs)
    new_attrs["rewound_from"] = path
    new_attrs["rewound_to"] = str(to_time)
    return write_track_result(res, out_path, attrs=new_attrs)
