"""Tracker orchestration (reference ``tracker(...).run()``,
track.py:323-491/1162-1232).

v1 implements the no-merge path end-to-end (SURVEY §7.1 milestone):
label per timestep → temporal overlap graph → event components →
remap → stats. Merge/split resolution (M9/M10) follows as the
sequential driver loop documented in SURVEY §7.3.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marex_spark.operators.components import (
    connected_components_driver,
    remap_ids,
)
from marex_spark.operators.label import label_components
from marex_spark.operators.overlap import (
    filter_overlap_fraction,
    object_areas,
    overlap_pairs,
)
from marex_spark.operators.stats import (
    attach_geo,
    event_lifetime_stats,
    event_timestep_stats,
)


def preprocess_extremes(
    extremes: DataFrame,
    ny: int,
    nx: int,
    r_fill: int = 8,
    t_fill: int = 2,
    area_quartile: float = 0.5,
    wrap_x: bool = True,
    time_col: str = "time",
    extreme_col: str = "extreme",
    area_filter_absolute: float | None = None,
    return_labels: bool = False,
    connectivity: int = 8,
) -> DataFrame:
    """The tracker's run_preprocess (track.py:1234-1368): morphological
    hole-filling (M1), temporal gap-filling (M3), then the small-object
    filter (A11+P6) — by area QUARTILE (default) or an ABSOLUTE floor
    (``area_filter_absolute``, the reference's regional-mode knob;
    mutually exclusive with a non-zero quartile, and must be positive —
    reference tests/test_track_edge_cases.py:551-605). Output: cleaned
    boolean field with the input schema.

    ``return_labels=True`` returns LABELLED surviving cells
    (time, y, x, obj_id) instead — the area filter already labels the
    field, so handing its labels to ``track_events(labels=...)``
    skips tracking's own labelling pass (one full shuffle + kernel
    pass over all extreme cells saved; only obj-id numbering differs
    from the two-pass form)."""
    from marex_spark.exceptions import ConfigurationError
    from marex_spark.operators.morphology import (
        fill_holes,
        fill_time_gaps,
        filter_small_objects,
    )

    if area_filter_absolute is not None:
        if area_filter_absolute <= 0:
            raise ConfigurationError(
                "area_filter_absolute must be positive",
                details={"got": area_filter_absolute},
            )
        if area_quartile not in (0, 0.5):
            raise ConfigurationError(
                "Cannot specify both area filtering parameters "
                "(area_quartile and area_filter_absolute)",
                details={
                    "area_quartile": area_quartile,
                    "area_filter_absolute": area_filter_absolute,
                },
            )

    d = extremes
    if r_fill > 0:
        d = fill_holes(d, r_fill, ny, nx, wrap_x, time_col, extreme_col)
    if t_fill > 0:
        d = fill_time_gaps(d, t_fill, time_col, extreme_col)
        # re-fill spatial holes opened by the temporal closing with R/2
        # (track.py:1717-1726)
        if r_fill > 1:
            d = fill_holes(d, r_fill // 2, ny, nx, wrap_x, time_col, extreme_col)
    if area_filter_absolute is not None:
        d = d.localCheckpoint()
        d = filter_small_objects(
            d, nx, 0.0, time_col, extreme_col, wrap_x,
            min_area=area_filter_absolute, return_labels=return_labels,
            connectivity=connectivity,
        )
    elif area_quartile > 0:
        d = d.localCheckpoint()
        d = filter_small_objects(
            d, nx, area_quartile, time_col, extreme_col, wrap_x,
            return_labels=return_labels, connectivity=connectivity,
        )
    elif return_labels:
        from marex_spark.operators.label import label_components

        d = label_components(
            d, nx=nx, time_col=time_col, extreme_col=extreme_col,
            wrap_x=wrap_x, connectivity=connectivity,
        )
    return d


@dataclass
class TrackResult:
    """Labelled events + property tables (the Spark form of the
    reference's output Dataset, track.py:210-221)."""

    events: DataFrame  # (time, y, x, obj_id, event_id)
    timestep_stats: DataFrame | None = None
    lifetime_stats: DataFrame | None = None
    extras: dict = field(default_factory=dict)


def track_events(
    extremes: DataFrame,
    nx: int,
    grid_y: DataFrame | None = None,
    grid_x: DataFrame | None = None,
    overlap_threshold: float = 0.0,
    connectivity: int = 8,
    wrap_x: bool = True,
    time_col: str = "time",
    extreme_col: str = "extreme",
    compute_stats: bool = True,
    allow_merging: bool = False,
    nn_partitioning: bool = False,
    max_distance: float | None = None,
    merge_chunk_steps: int | None = 64,
    merge_parallel: bool = True,
    compact_ids: bool = False,
    labels: DataFrame | None = None,
    cell_areas: DataFrame | None = None,
) -> TrackResult:
    """Boolean extreme field → globally labelled events with stats.

    ``compact_ids=False`` (default) keeps event_id = the component-root
    object id: stable, deterministic, and computed with NO global-order
    window. ``True`` renumbers events densely 1..K — a single-partition
    dense_rank over every object id (the reference's in-memory dict
    renumber, track.py:2888-2897); opt in only when dense ids are
    actually needed, it is the one non-scalable step in the plan.

    overlap_threshold=0 reproduces the reference's no-merge 3-D
    connectivity (M5 via J5+M7: any overlap links two objects); >0
    applies the overlap/min-area fraction gate (track.py:2506-2552)
    before linking.

    allow_merging=True runs the reference's split/merge resolution
    (track.py:3337-3802): multi-parent children are partitioned among
    parents by nearest parent centroid, merges are recorded in the
    ledger (``extras["merge_ledger"]``), and partition-boundary
    fragments are re-consolidated (M10) before event linking.

    The wall-clock-parallel time-block resolver is the DEFAULT
    (``merge_parallel=True``: blocks of ``merge_chunk_steps`` timesteps
    resolved concurrently with a Jacobi carry fixpoint — 3× the chunked
    tier's throughput at sf0.1, byte-identical output per
    tests/test_merge.py::test_parallel_matches_oneshot). Fallbacks:
    ``merge_parallel=False`` for the serial chunked resolver (driver
    memory O(chunk)), plus ``merge_chunk_steps=None`` for the one-shot
    collect.
    """
    if labels is None:
        labels = label_components(
            extremes,
            nx=nx,
            time_col=time_col,
            connectivity=connectivity,
            wrap_x=wrap_x,
            extreme_col=extreme_col,
        )
        # label_components already checkpoints its output, so the
        # self-join below reads materialised rows rather than
        # re-running the UDF.
    else:
        # pre-labelled input (e.g. filter_small_objects
        # return_labels=True): skip the labelling pass entirely; the
        # merge/overlap stages need materialised rows
        labels = labels.localCheckpoint()
    extras: dict = {}
    if allow_merging:
        from marex_spark.operators.merge import (
            split_merge_events,
            split_merge_events_chunked,
            split_merge_events_parallel,
        )

        if merge_parallel:
            labels, ledger = split_merge_events_parallel(
                labels,
                nx=nx,
                block_steps=merge_chunk_steps or 64,
                overlap_threshold=overlap_threshold,
                wrap_x=wrap_x,
                time_col=time_col,
                nn_partitioning=nn_partitioning,
                max_distance=max_distance,
                labels_materialized=True,
            )
        elif merge_chunk_steps:
            labels, ledger = split_merge_events_chunked(
                labels,
                nx=nx,
                chunk_steps=merge_chunk_steps,
                overlap_threshold=overlap_threshold,
                wrap_x=wrap_x,
                time_col=time_col,
                nn_partitioning=nn_partitioning,
                max_distance=max_distance,
                labels_materialized=True,  # label_components checkpoints
            )
        else:
            labels, ledger = split_merge_events(
                labels,
                nx=nx,
                overlap_threshold=overlap_threshold,
                wrap_x=wrap_x,
                time_col=time_col,
                nn_partitioning=nn_partitioning,
                max_distance=max_distance,
            )
        labels = labels.localCheckpoint()
        extras["merge_ledger"] = ledger

    pairs = overlap_pairs(labels, keys=("y", "x"), time_col=time_col)
    if overlap_threshold > 0:
        areas = object_areas(labels, time_col=time_col)
        pairs = filter_overlap_fraction(pairs, areas, overlap_threshold)

    mapping = connected_components_driver(pairs, labels, compact=compact_ids)
    events = remap_ids(labels, mapping)

    ts_stats = life = None
    if compute_stats and grid_y is not None and grid_x is not None:
        # area precedence (reference track.py:131-135): a cell_area
        # column on the y dimension table (grid_resolution /
        # cell_areas_from_resolution) wins; else a user (y, x, area)
        # table; else the cos(lat) proxy
        area_col = "cell_area" if "cell_area" in grid_y.columns else None
        ev = events
        if area_col is None and cell_areas is not None:
            ev = events.join(
                F.broadcast(
                    cell_areas.select("y", "x", F.col("area").alias("_user_area"))
                ),
                ["y", "x"],
                "left",
            )
        geo = attach_geo(ev, grid_y, grid_x, area_col=area_col)
        if area_col is None and cell_areas is not None:
            geo = geo.withColumn(
                "area", F.coalesce(F.col("_user_area"), F.col("area"))
            ).drop("_user_area")
        ts_stats = event_timestep_stats(geo, time_col=time_col)
        life = event_lifetime_stats(ts_stats, time_col=time_col)
    return TrackResult(
        events=events, timestep_stats=ts_stats, lifetime_stats=life, extras=extras
    )


def track_events_unstructured(
    extremes: DataFrame,
    edges: DataFrame,
    cell_geo: DataFrame | None = None,
    overlap_threshold: float = 0.0,
    time_col: str = "time",
    extreme_col: str = "extreme",
    compute_stats: bool = True,
    allow_merging: bool = False,
    nn_partitioning: bool = False,
    max_distance: float | None = None,
    merge_parallel: bool = True,
    merge_block_steps: int = 64,
    compact_ids: bool = False,
    labels: DataFrame | None = None,
) -> TrackResult:
    """Unstructured-mesh tracking (reference unstructured path,
    track.py:1023-1117 setup + M6/M2 kernels): boolean (time, cell)
    field + (cell, nbr) edge table → labelled events.

    ``cell_geo``: (cell, lat, lon[, area]) dimension table — needed for
    stats and for merge partitioning (haversine to parent centroids).

    ``labels``: pre-labelled (time, cell, obj_id) input (e.g. from the
    mesh area filter) — skips the labelling pass.
    """
    from marex_spark.operators.label import label_components_unstructured

    if labels is None:
        labels = label_components_unstructured(
            extremes, edges, time_col=time_col, extreme_col=extreme_col
        )
    labels = labels.localCheckpoint()

    extras: dict = {}
    if allow_merging:
        if cell_geo is None:
            from marex_spark.exceptions import TrackingError

            raise TrackingError(
                "allow_merging needs cell_geo",
                details={"expected_columns": "(cell, lat, lon)"},
                suggestions=["pass cell_geo=grid dimension table"],
            )
        from marex_spark.operators.merge import (
            split_merge_events_parallel,
            split_merge_events_unstructured,
        )

        if merge_parallel:
            labels, ledger = split_merge_events_parallel(
                labels,
                block_steps=merge_block_steps,
                overlap_threshold=overlap_threshold,
                time_col=time_col,
                nn_partitioning=nn_partitioning,
                max_distance=max_distance,
                geometry="sphere",
                cell_geo=cell_geo,
            )
        else:
            labels, ledger = split_merge_events_unstructured(
                labels,
                cell_geo,
                overlap_threshold=overlap_threshold,
                time_col=time_col,
                nn_partitioning=nn_partitioning,
                max_distance=max_distance,
            )
        labels = labels.localCheckpoint()
        extras["merge_ledger"] = ledger

    pairs = overlap_pairs(labels, keys=("cell",), time_col=time_col)
    if overlap_threshold > 0:
        areas = object_areas(labels, time_col=time_col)
        pairs = filter_overlap_fraction(pairs, areas, overlap_threshold)

    mapping = connected_components_driver(pairs, labels, compact=compact_ids)
    events = remap_ids(labels, mapping)

    ts_stats = life = None
    if compute_stats and cell_geo is not None:
        geo = events.join(F.broadcast(cell_geo), "cell")
        if "area" not in geo.columns:
            geo = geo.withColumn("area", F.lit(1.0))
        ts_stats = event_timestep_stats(geo, time_col=time_col)
        life = event_lifetime_stats(ts_stats, time_col=time_col)
    return TrackResult(
        events=events, timestep_stats=ts_stats, lifetime_stats=life, extras=extras
    )
