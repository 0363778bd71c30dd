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
    remap_ids_sparse,
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
    mask: DataFrame | None = None,
    drop_first_object: bool = False,
) -> DataFrame:
    """The tracker's run_preprocess (track.py:1234-1368): morphological
    hole-filling (M1), temporal gap-filling (M3), then the small-object
    filter (A11+P6) — by area QUARTILE (default) or an ABSOLUTE floor
    (``area_filter_absolute``, the reference's regional-mode knob;
    mutually exclusive with a non-zero quartile, and must be positive —
    reference tests/test_track_edge_cases.py:551-605). Output: cleaned
    boolean field; rows = input rows ∪ surviving cells. The input may
    be a dense boolean field OR a sparse True-only set — the chain
    runs on the True set and temporal gaps are GENERATED, not flipped,
    so both densities produce the same surviving cells.

    ``mask`` (valid (y, x) rows): the reference applies the valid-cell
    mask AFTER each spatial closing/opening, never to the input —
    extremes on invalid cells (land) participate in the morphology
    (bridging gaps, shoring up the opening) and are zeroed afterwards
    (track.py:1671 is fill_holes' LAST step; data_bin is never
    pre-masked). Masking the input instead measurably diverges on the
    reference's own fixture (tests/test_reference_parity.py).

    ``return_labels=True`` returns LABELLED surviving cells
    (time, y, x, obj_id) instead — the area filter already labels the
    field, so handing its labels to ``track_events(labels=...)``
    skips tracking's own labelling pass (one full shuffle + kernel
    pass over all extreme cells saved; only obj-id numbering differs
    from the two-pass form)."""
    from marex_spark.exceptions import ConfigurationError
    from marex_spark.operators.morphology import (
        fill_time_gaps_true_set,
        filter_small_objects,
        morph_close_open_blocked,
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

    # The whole chain runs on the TRUE SET only — closing/opening,
    # temporal gap GENERATION (fill_time_gaps_true_set: gap rows are
    # created, not flipped, so a sparse-True input gets the same
    # temporal closing a dense field does) and the area filter are all
    # fully determined by the True cells. No full-field joins between
    # stages (the boolean form paid one per stage); the dense boolean
    # output is reassembled once at the end when asked for.
    def _mask(df):
        if mask is None:
            return df
        keys = mask.select("y", "x")
        return df.join(F.broadcast(keys), ["y", "x"], "leftsemi")

    d_true = extremes.filter(F.col(extreme_col)).select(time_col, "y", "x")
    if r_fill > 0:
        d_true = morph_close_open_blocked(
            d_true, r_fill, ny, nx, wrap_x, time_col
        )
    # fill_holes masks at its end even when R=0 skips the morphology
    d_true = _mask(d_true)
    if t_fill > 0:
        d_true = fill_time_gaps_true_set(
            d_true, t_fill, extremes, time_col, keys=("y", "x")
        )
        # re-fill spatial holes opened by the temporal closing with R/2
        # (track.py:1717-1726), masked again at the stage's end
        if r_fill > 1:
            d_true = _mask(
                morph_close_open_blocked(
                    d_true, r_fill // 2, ny, nx, wrap_x, time_col
                )
            )
    field = d_true.withColumn(extreme_col, F.lit(True))
    labels = None
    if area_filter_absolute is not None:
        labels = filter_small_objects(
            field, nx, 0.0, time_col, extreme_col, wrap_x,
            min_area=area_filter_absolute, return_labels=True,
            connectivity=connectivity, drop_first_object=drop_first_object,
        )
    elif area_quartile > 0 or drop_first_object:
        # the reference's filter runs even at quartile 0 (threshold =
        # min area keeps everything) — significant only for its
        # first-object drop (track.py:1891-1892), which applies there
        # too
        labels = filter_small_objects(
            field, nx, area_quartile, time_col, extreme_col, wrap_x,
            return_labels=True, connectivity=connectivity,
            drop_first_object=drop_first_object,
        )
    elif return_labels:
        from marex_spark.operators.label import label_components

        labels = label_components(
            field, nx=nx, time_col=time_col, extreme_col=extreme_col,
            wrap_x=wrap_x, connectivity=connectivity,
        )
    if return_labels:
        return labels
    kept = labels.select(time_col, "y", "x") if labels is not None else d_true
    return (
        extremes.drop(extreme_col)
        .join(
            kept.withColumn("_t", F.lit(True)), [time_col, "y", "x"], "full"
        )
        .withColumn(extreme_col, F.coalesce(F.col("_t"), F.lit(False)))
        .drop("_t")
    )


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
    ny: int = 0,
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
    merge_block_steps: int | None = None,
    compact_ids: bool = False,
    labels: DataFrame | None = None,
    cell_areas: DataFrame | None = None,
    max_driver_cells: int | None = None,
    link_adjacency: bool = False,
) -> TrackResult:
    """Boolean extreme field → globally labelled events with stats.

    ``link_adjacency=True`` links objects that merely TOUCH between
    consecutive steps (±1 neighbourhood incl. diagonals) instead of
    sharing cells — the reference's no-merge semantics, whose 3-D
    labelling uses an all-ones 3×3×3 structure ("edges can touch",
    track.py:2013); ``overlap_threshold`` is ignored in that mode, as
    the reference's no-merge path never gates. Mutually exclusive with
    ``allow_merging`` (the resolver's transitions are exact-cell
    overlap by definition, track.py:2396-2452).

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
    (``merge_parallel=True``: time blocks resolved concurrently with a
    Jacobi carry fixpoint — byte-identical output for ANY block size
    per tests/test_merge.py::test_parallel_matches_oneshot).
    ``merge_block_steps`` sets the block size; ``None`` (default)
    auto-sizes it from parallelism and a per-block cell budget (see
    split_merge_events_parallel). Fallbacks: ``merge_parallel=False``
    for the serial chunked resolver (driver memory O(chunk), paged by
    ``merge_chunk_steps`` / its cell budget), plus
    ``merge_chunk_steps=None`` there for the one-shot collect.
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
    extras: dict = {
        # linking provenance — rewind_track_run re-links with the
        # SAME gate and numbering (persisted via write_track_result)
        "overlap_threshold": overlap_threshold,
        "compact_ids": compact_ids,
    }
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
                ny=ny,
                block_steps=merge_block_steps,
                overlap_threshold=overlap_threshold,
                wrap_x=wrap_x,
                time_col=time_col,
                nn_partitioning=nn_partitioning,
                max_distance=max_distance,
                labels_materialized=True,
                max_driver_cells=max_driver_cells,
            )
        elif merge_chunk_steps:
            labels, ledger = split_merge_events_chunked(
                labels,
                nx=nx,
                ny=ny,
                chunk_steps=merge_chunk_steps,
                target_chunk_cells=2_000_000,
                overlap_threshold=overlap_threshold,
                wrap_x=wrap_x,
                time_col=time_col,
                nn_partitioning=nn_partitioning,
                max_distance=max_distance,
                labels_materialized=True,  # label_components checkpoints
                max_driver_cells=max_driver_cells,
            )
        else:
            labels, ledger = split_merge_events(
                labels,
                nx=nx,
                ny=ny,
                overlap_threshold=overlap_threshold,
                wrap_x=wrap_x,
                time_col=time_col,
                nn_partitioning=nn_partitioning,
                max_distance=max_distance,
                max_driver_cells=max_driver_cells,
            )
        # every resolver tier returns MATERIALIZED labels (the parallel
        # tier's cells_out localCheckpoint, the chunked/one-shot tiers'
        # own checkpoints) — re-checkpointing here paid a second full
        # materialization of the cell set per tracking run
        extras["merge_ledger"] = ledger

    if link_adjacency:
        if allow_merging:
            from marex_spark.exceptions import ConfigurationError

            raise ConfigurationError(
                "link_adjacency applies to no-merge tracking only "
                "(merge-mode transitions are exact-cell overlap)",
            )
        from marex_spark.operators.overlap import adjacency_pairs

        pairs = adjacency_pairs(
            labels, nx=nx, wrap_x=wrap_x, time_col=time_col,
            connectivity=connectivity,
        )
    else:
        pairs = overlap_pairs(labels, keys=("y", "x"), time_col=time_col)
        if overlap_threshold > 0:
            areas = object_areas(labels, time_col=time_col)
            pairs = filter_overlap_fraction(pairs, areas, overlap_threshold)

    if compact_ids:
        mapping = connected_components_driver(pairs, labels, compact=True)
        events = remap_ids(labels, mapping)
    else:
        # root-id numbering: the sparse mapping + coalescing remap skip
        # the all-ids distinct pass over the cell table (identical rows)
        mapping = connected_components_driver(
            pairs, labels, compact=False, include_singletons=False
        )
        events = remap_ids_sparse(labels, mapping)

    ts_stats = life = None
    if compute_stats and grid_y is not None and grid_x is not None:
        ts_stats = _timestep_stats_with_areas(
            events, grid_y, grid_x, cell_areas, time_col
        )
        life = event_lifetime_stats(ts_stats, time_col=time_col)
    return TrackResult(
        events=events, timestep_stats=ts_stats, lifetime_stats=life, extras=extras
    )


def _mesh_timestep_stats(events, cell_geo, time_col: str):
    """Per-timestep stats on a mesh: broadcast the (cell, lat, lon
    [, area]) geometry, defaulting area to 1. Shared by
    track_events_unstructured, the mesh extension, and rewind."""
    geo = events.join(F.broadcast(cell_geo), "cell")
    if "area" not in geo.columns:
        geo = geo.withColumn("area", F.lit(1.0))
    return event_timestep_stats(geo, time_col=time_col)


def _timestep_stats_with_areas(
    events: DataFrame,
    grid_y: DataFrame,
    grid_x: DataFrame,
    cell_areas: DataFrame | None,
    time_col: str,
) -> DataFrame:
    """Per-timestep stats with the area-precedence rule (reference
    track.py:131-135): a cell_area column on the y dimension table
    (grid_resolution / cell_areas_from_resolution) wins; else a user
    (y, x, area) table; else the cos(lat) proxy. Shared by
    track_events and extend_track_events."""
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
    return event_timestep_stats(geo, time_col=time_col)


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
    merge_block_steps: int | None = None,
    compact_ids: bool = False,
    labels: DataFrame | None = None,
    max_driver_cells: int | None = None,
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
        # label_components_unstructured checkpoints its final output
        labels = label_components_unstructured(
            extremes, edges, time_col=time_col, extreme_col=extreme_col
        )
    else:
        labels = labels.localCheckpoint()

    extras: dict = {
        # linking provenance — rewind_track_run re-links with the
        # SAME gate and numbering (persisted via write_track_result)
        "overlap_threshold": overlap_threshold,
        "compact_ids": compact_ids,
    }
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
                max_driver_cells=max_driver_cells,
                # reference hop-BFS NN (partition_nn_unstructured):
                # max_distance is in HOPS on the mesh path
                mesh_edges=edges if nn_partitioning else None,
            )
        else:
            labels, ledger = split_merge_events_unstructured(
                labels,
                cell_geo,
                overlap_threshold=overlap_threshold,
                time_col=time_col,
                nn_partitioning=nn_partitioning,
                max_distance=max_distance,
                max_driver_cells=max_driver_cells,
                mesh_edges=edges if nn_partitioning else None,
            )
        # every resolver tier returns MATERIALIZED labels (the parallel
        # tier's cells_out localCheckpoint, the chunked/one-shot tiers'
        # own checkpoints) — re-checkpointing here paid a second full
        # materialization of the cell set per tracking run
        extras["merge_ledger"] = ledger

    pairs = overlap_pairs(labels, keys=("cell",), time_col=time_col)
    if overlap_threshold > 0:
        areas = object_areas(labels, time_col=time_col)
        pairs = filter_overlap_fraction(pairs, areas, overlap_threshold)

    if compact_ids:
        mapping = connected_components_driver(pairs, labels, compact=True)
        events = remap_ids(labels, mapping)
    else:
        mapping = connected_components_driver(
            pairs, labels, compact=False, include_singletons=False
        )
        events = remap_ids_sparse(labels, mapping)

    ts_stats = life = None
    if compute_stats and cell_geo is not None:
        ts_stats = _mesh_timestep_stats(events, cell_geo, time_col)
        life = event_lifetime_stats(ts_stats, time_col=time_col)
    return TrackResult(
        events=events, timestep_stats=ts_stats, lifetime_stats=life, extras=extras
    )


def extend_track_events(
    prior_events: DataFrame,
    new_extremes: DataFrame,
    nx: int,
    ny: int = 0,
    grid_y: DataFrame | None = None,
    grid_x: DataFrame | None = None,
    prior_timestep_stats: DataFrame | None = None,
    overlap_threshold: float = 0.0,
    connectivity: int = 8,
    wrap_x: bool = True,
    time_col: str = "time",
    extreme_col: str = "extreme",
    compute_stats: bool = True,
    cell_areas: DataFrame | None = None,
    allow_merging: bool = False,
    nn_partitioning: bool = False,
    max_distance: float | None = None,
    merge_chunk_steps: int = 64,
    prior_merge_ledger: DataFrame | None = None,
    prior_head: tuple | None = None,
) -> TrackResult:
    """Incremental append tracking: extend a finished run with new
    timesteps WITHOUT recomputing history — the operation a
    production pipeline runs per ingest cycle, where the archive is
    100 TB and the new month is a rounding error.

    ``prior_events`` is a previous :func:`track_events` output
    (``compact_ids=False`` — root-stable ids are what make extension
    possible). Only the new slices plus the single boundary slice are
    touched:

    - new slices are labelled with ids offset past the prior maximum —
      exactly the ids a full re-run would assign (per-slice labels are
      dense 1..n and W6 offsets are prefix sums, so continuing the
      cumsum from ``max(obj_id)`` reproduces it);
    - the overlap graph is built over (boundary slice ∪ new slices)
      only; boundary objects enter the union-find collapsed to their
      prior event_id. Because every old event_id (a component-min) is
      smaller than every new obj_id, the min-root rule yields the same
      event ids as a full recompute — including the case where a new
      object bridges TWO old events, which merges them (their prior
      rows are remapped);
    - equality with the full recompute is pinned in
      tests/test_track.py (any overlap_threshold, either
      connectivity).

    Stats: per-timestep stats are computed for the new slices only and
    unioned with ``prior_timestep_stats`` (remapped through any old-old
    merges); lifetime stats are re-aggregated from the (small) combined
    per-timestep table. Without ``prior_timestep_stats`` the returned
    stats are None.

    Caveats (documented, not silent): the input must be the
    *preprocessed* boolean field — morphological time-gap closing
    (T_fill) spans the boundary, so run ``preprocess_extremes`` over
    the new slices plus the trailing ``t_fill`` old slices first if
    gap-bridging across the append boundary matters; and a prior run
    made with a global area QUARTILE froze that quantile — extension
    keeps it (pass ``area_filter_absolute`` workflows for exactness).

    ``allow_merging=True`` extends a split/merge run: the chunked
    resolver resumes from (carry = the prior run's last two resolved
    slices, rebuilt from ``prior_events``; id counter past the prior
    max), which is the complete between-chunk sequencing state. The
    resulting partition STRUCTURE and ledger match a from-scratch run,
    but id VALUES are a consistent relabelling rather than numerically
    identical — a full recompute reseeds its id counter from the
    global label maximum, so it does not even preserve the prior run's
    own ids (tests pin id-free lifetime-stat and ledger-shape
    equality). New merge events land in ``extras['merge_ledger']``,
    appended to ``prior_merge_ledger`` when given.
    """
    prior_max_time, prior_max_id = _extend_head(
        prior_events, new_extremes, time_col, prior_head
    )

    labels_new = label_components(
        new_extremes,
        nx=nx,
        time_col=time_col,
        connectivity=connectivity,
        wrap_x=wrap_x,
        extreme_col=extreme_col,
    ).withColumn("obj_id", (F.col("obj_id") + F.lit(prior_max_id)).cast("long"))
    labels_new = labels_new.localCheckpoint()

    extras: dict = {
        "prior_max_time": prior_max_time,
        "prior_max_obj_id": prior_max_id,
        "overlap_threshold": overlap_threshold,
        "compact_ids": False,
    }
    if allow_merging:
        labels_new, extras["merge_ledger"] = _extend_resume_merge(
            prior_events, labels_new, prior_max_id, time_col,
            overlap_threshold, nn_partitioning, max_distance,
            merge_chunk_steps, prior_merge_ledger,
            nx=nx, ny=ny, wrap_x=wrap_x, cell_geo=None,
        )

    events, events_new, events_old, ev_remap = _extend_link(
        prior_events, labels_new, ("y", "x"), time_col,
        prior_max_time, overlap_threshold,
    )

    ts_stats = life = None
    if (
        compute_stats
        and grid_y is not None
        and grid_x is not None
        and prior_timestep_stats is not None
    ):
        ts_stats = _extend_stats(
            prior_timestep_stats, events_new, events_old, ev_remap,
            prior_max_id, time_col,
            lambda ev: _timestep_stats_with_areas(
                ev, grid_y, grid_x, cell_areas, time_col
            ),
        )
        life = event_lifetime_stats(ts_stats, time_col=time_col)
    return TrackResult(
        events=events,
        timestep_stats=ts_stats,
        lifetime_stats=life,
        extras=extras,
    )


def _extend_head(
    prior_events: DataFrame,
    new_extremes: DataFrame,
    time_col: str,
    prior_head: tuple | None,
):
    """Shared extension preamble: resolve (max time, max obj_id) of the
    prior run — from the archive metadata when given (skipping the one
    job that would scan the whole prior events table), else by
    aggregation — and reject appended data that overlaps the prior
    window."""
    from marex_spark.exceptions import ConfigurationError

    if prior_head is not None:
        prior_max_time, prior_max_id = prior_head[0], int(prior_head[1])
    else:
        head = prior_events.agg(
            F.max(time_col).alias("t_max"), F.max("obj_id").alias("id_max")
        ).collect()[0]
        if head.t_max is None:
            raise ConfigurationError(
                "prior_events is empty — run tracking first"
            )
        prior_max_time, prior_max_id = head.t_max, int(head.id_max)

    bad = new_extremes.filter(F.col(time_col) <= F.lit(prior_max_time)).limit(1)
    if bad.count() > 0:
        raise ConfigurationError(
            "new_extremes overlaps the prior run — extension needs "
            "strictly later timesteps",
            details={"prior_max_time": str(prior_max_time)},
        )
    return prior_max_time, prior_max_id


def _extend_resume_merge(
    prior_events: DataFrame,
    labels_new: DataFrame,
    prior_max_id: int,
    time_col: str,
    overlap_threshold: float,
    nn_partitioning: bool,
    max_distance: float | None,
    merge_chunk_steps: int,
    prior_merge_ledger: DataFrame | None,
    nx: int = 0,
    ny: int = 0,
    wrap_x: bool = True,
    cell_geo: DataFrame | None = None,
    mesh_edges: DataFrame | None = None,
):
    """Shared merge-mode resumption for both extension paths: rebuild
    the resolver carry from the prior run's last two resolved slices
    (prior events ARE the post-resolution labels, put back into the
    resolver's slice layout by the same build_slices pass), resume the
    chunked resolver over the new labels only, and append the new
    ledger after the prior one with dense merge ids.
    ``cell_geo=None`` selects grid geometry; a (cell, lat, lon) table
    selects the sphere form. Returns (resolved labels, ledger)."""
    from marex_spark.exceptions import ConfigurationError
    from marex_spark.operators.merge import (
        _Resolver,
        _collect_mesh_adj,
        split_merge_events_chunked,
    )

    grid = cell_geo is None
    mesh_adj = (
        _collect_mesh_adj(mesh_edges, cell_geo)
        if (not grid and nn_partitioning and mesh_edges is not None)
        else None
    )
    tail_times = [
        r[0]
        for r in prior_events.select(time_col)
        .distinct()
        .orderBy(F.desc(time_col))
        .limit(2)
        .collect()
    ]
    if not tail_times:
        # reachable only via an explicit prior_head over an empty
        # events table (e.g. clobbered archive with a surviving
        # attributes.json) — _extend_head's agg path catches it earlier
        raise ConfigurationError(
            "prior_events has no timesteps — cannot resume the merge "
            "resolver",
        )
    tail = prior_events.filter(F.col(time_col) >= F.lit(min(tail_times)))
    if grid:
        tail_pdf = tail.select(time_col, "y", "x", "obj_id").toPandas()
    else:
        tail_pdf = (
            tail.select(time_col, "cell", "obj_id")
            .join(F.broadcast(cell_geo.select("cell", "lat", "lon")), "cell")
            .select(time_col, "cell", "lat", "lon", "obj_id")
            .toPandas()
        )
    seed = _Resolver(
        nx=nx, wrap_x=wrap_x if grid else False,
        overlap_threshold=overlap_threshold,
        max_iter_per_step=10, grid=grid,
        nn_partitioning=nn_partitioning, max_distance=max_distance,
    )
    c_slices, c_times = seed.build_slices(tail_pdf, time_col)
    resume = {
        "carry": [(c_times[i], c_slices[i]) for i in range(len(c_times))],
        "next_new_id": prior_max_id + 1,
    }
    resolved, new_ledger = split_merge_events_chunked(
        labels_new,
        nx=nx,
        ny=ny,
        chunk_steps=merge_chunk_steps,
        target_chunk_cells=2_000_000,
        overlap_threshold=overlap_threshold,
        wrap_x=wrap_x if grid else False,
        time_col=time_col,
        nn_partitioning=nn_partitioning,
        max_distance=max_distance,
        labels_materialized=grid,  # the sphere path re-joins geometry
        resume_state=resume,
        geometry="grid" if grid else "sphere",
        cell_geo=cell_geo,
        mesh_adj=mesh_adj,
    )
    ledger = (
        prior_merge_ledger.unionByName(
            new_ledger.withColumn(
                "merge_id",
                (F.col("merge_id") + F.lit(prior_merge_ledger.count())).cast(
                    "long"
                ),
            )
        )
        if prior_merge_ledger is not None
        else new_ledger
    )
    return resolved, ledger


def _extend_link(
    prior_events: DataFrame,
    labels_new: DataFrame,
    keys: tuple,
    time_col: str,
    prior_max_time,
    overlap_threshold: float,
):
    """Shared boundary-linking core of the extension path: overlap
    graph over (boundary slice ∪ new labels), boundary objects
    collapsed to their prior event ids, min-root union-find, remap.
    Returns (events, events_new, events_old, ev_remap)."""
    boundary = prior_events.filter(F.col(time_col) == F.lit(prior_max_time))
    if boundary.limit(1).count() == 0:
        # a mis-parsed prior_head (wrong type/timezone) would match an
        # empty boundary and silently skip linking — refuse instead
        from marex_spark.exceptions import ConfigurationError

        raise ConfigurationError(
            "boundary slice is empty — prior_head does not match any "
            "timestep of prior_events",
            details={"prior_max_time": str(prior_max_time)},
        )
    cols = [time_col, *keys, "obj_id"]
    combined = boundary.select(*cols).unionByName(labels_new.select(*cols))

    pairs = overlap_pairs(combined, keys=keys, time_col=time_col)
    if overlap_threshold > 0:
        areas = object_areas(combined, time_col=time_col)
        pairs = filter_overlap_fraction(pairs, areas, overlap_threshold)

    # collapse boundary objects to their prior event id; new ids pass
    # through (broadcast: one slice's objects)
    b_map = boundary.select("obj_id", "event_id").distinct()
    pairs_n = (
        pairs.join(
            F.broadcast(b_map.select(F.col("obj_id").alias("id_t"),
                                     F.col("event_id").alias("_ev_t"))),
            "id_t",
            "left",
        )
        .select(
            F.coalesce("_ev_t", F.col("id_t")).alias("id_t"),
            "id_next",
            *(["overlap_area"] if "overlap_area" in pairs.columns else []),
        )
    )
    nodes = (
        b_map.select(F.col("event_id").alias("obj_id")).distinct()
        .unionByName(labels_new.select("obj_id").distinct())
    )
    mapping = connected_components_driver(pairs_n, nodes, compact=False)

    events_new = remap_ids(labels_new, mapping)
    # old events touched by a merge get remapped; everything else is
    # identity (left join keeps untouched history untouched)
    ev_remap = mapping.select(
        F.col("obj_id").alias("event_id"), F.col("event_id").alias("_ev2")
    )
    events_old = (
        prior_events.join(F.broadcast(ev_remap), "event_id", "left")
        .withColumn("event_id", F.coalesce("_ev2", F.col("event_id")))
        .drop("_ev2")
    )
    out_cols = [*cols, "event_id"]
    events = events_old.select(*out_cols).unionByName(
        events_new.select(*out_cols)
    )
    return events, events_new, events_old, ev_remap


def _extend_stats(
    prior_timestep_stats: DataFrame,
    events_new: DataFrame,
    events_old: DataFrame,
    ev_remap: DataFrame,
    prior_max_id: int,
    time_col: str,
    stats_fn,
) -> DataFrame:
    """Combined per-timestep stats for an extension. Old events that
    MERGED (a new object bridged them) would leave duplicate
    (time, event_id) rows after a bare remap — and the
    weighted-centroid recombination is not recoverable from the stats
    rows (each row keeps only the unit direction, not the cartesian
    sum). The merged set is tiny, so recompute those events' old-slice
    stats exactly from their cell rows; untouched events keep their
    prior rows verbatim. Only OLD event nodes (ids <= prior max) whose
    root changed indicate an old-old merge; a NEW obj id mapping to an
    old root is an ordinary continuation and touches no old stats."""
    ts_new = stats_fn(events_new)
    merged = ev_remap.filter(
        (F.col("event_id") != F.col("_ev2"))
        & (F.col("event_id") <= F.lit(prior_max_id))
    )
    merged_roots = merged.select(F.col("_ev2").alias("event_id")).distinct()
    ts_keep = prior_timestep_stats.join(
        F.broadcast(merged.select("event_id").unionByName(merged_roots)),
        "event_id",
        "left_anti",
    )
    ts_merged = stats_fn(
        events_old.join(F.broadcast(merged_roots), "event_id", "semi")
    )
    return ts_keep.unionByName(ts_merged).unionByName(ts_new)


def extend_track_events_unstructured(
    prior_events: DataFrame,
    new_extremes: DataFrame,
    edges: DataFrame,
    cell_geo: DataFrame | None = None,
    prior_timestep_stats: DataFrame | None = None,
    overlap_threshold: float = 0.0,
    time_col: str = "time",
    extreme_col: str = "extreme",
    compute_stats: bool = True,
    prior_head: tuple | None = None,
    allow_merging: bool = False,
    nn_partitioning: bool = False,
    max_distance: float | None = None,
    merge_chunk_steps: int = 64,
    prior_merge_ledger: DataFrame | None = None,
) -> TrackResult:
    """Incremental append tracking on an unstructured mesh — the
    (time, cell) form of :func:`extend_track_events`, same exactness
    argument (labels continue the W6 cumsum; boundary objects collapse
    to prior event ids; min-root numbering reproduces the full
    recompute).

    ``allow_merging=True`` resumes the sphere-geometry chunked resolver
    from the prior run's last two resolved slices (joined with
    ``cell_geo``, which is required) — same structural-parity contract
    as the gridded merge extension (id values are a consistent
    relabelling, partition structure and ledger match a from-scratch
    run)."""
    from marex_spark.operators.label import label_components_unstructured

    if allow_merging and cell_geo is None:
        from marex_spark.exceptions import TrackingError

        raise TrackingError(
            "allow_merging extension needs cell_geo",
            details={"expected_columns": "(cell, lat, lon)"},
        )
    prior_max_time, prior_max_id = _extend_head(
        prior_events, new_extremes, time_col, prior_head
    )

    labels_new = label_components_unstructured(
        new_extremes, edges, time_col=time_col, extreme_col=extreme_col
    ).withColumn("obj_id", (F.col("obj_id") + F.lit(prior_max_id)).cast("long"))
    labels_new = labels_new.localCheckpoint()

    extras: dict = {
        "prior_max_time": prior_max_time,
        "prior_max_obj_id": prior_max_id,
        "overlap_threshold": overlap_threshold,
        "compact_ids": False,
    }
    if allow_merging:
        labels_new, extras["merge_ledger"] = _extend_resume_merge(
            prior_events, labels_new, prior_max_id, time_col,
            overlap_threshold, nn_partitioning, max_distance,
            merge_chunk_steps, prior_merge_ledger,
            cell_geo=cell_geo,
            mesh_edges=edges if nn_partitioning else None,
        )

    events, events_new, events_old, ev_remap = _extend_link(
        prior_events, labels_new, ("cell",), time_col,
        prior_max_time, overlap_threshold,
    )

    ts_stats = life = None
    if compute_stats and cell_geo is not None and prior_timestep_stats is not None:

        def _mesh_stats(ev):
            return _mesh_timestep_stats(ev, cell_geo, time_col)

        ts_stats = _extend_stats(
            prior_timestep_stats, events_new, events_old, ev_remap,
            prior_max_id, time_col, _mesh_stats,
        )
        life = event_lifetime_stats(ts_stats, time_col=time_col)
    return TrackResult(
        events=events,
        timestep_stats=ts_stats,
        lifetime_stats=life,
        extras=extras,
    )
