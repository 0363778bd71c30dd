"""Morphological preprocessing (SURVEY M1/M2/M3 + A11/P6 filtering) —
Spark-native re-expression of the reference's ``fill_holes`` /
``fill_time_gaps`` / ``filter_small_objects`` (track.py:1520-1906).

The reference runs C-backed ``binary_closing``/``binary_opening`` per
chunk (track.py:1630-1634). In long format, both primitives are
relational: **dilation** of the True set by a structuring element is an
offset-explode + distinct; **erosion** keeps cells whose whole SE
neighbourhood is True (a join + count). No UDF, no per-slice memory
limit, and the plans are plain shuffles Catalyst can schedule at any
scale. Longitude wraps (track.py:1617-1625 pad mode="wrap"); rows off
the y edge are treated as present (edge padding) so coastal/polar cells
are not eroded away — the reference's shore-protection rule
(track.py:1566-1577).

Unstructured (M2): dilation = R rounds of frontier-join over the
(cell, nbr) edge table — the relational form of the reference's sparse
boolean matrix power (track.py:5422-5468); erosion is its dual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from marex_spark.functions.temporal import epoch_day

# Sub-batch budget (bools) for the stacked dense-morphology kernel —
# cache-residency sized; see the comment at its use in
# morph_close_open_blocked and tools/ab_morph_batch_mp.py. The 2M
# default assumes ~32 concurrent single-thread tasks sharing one L3
# (the measured host profile); deployments with fewer task slots or
# larger caches can raise it via MAREX_MORPH_BATCH_BOOLS.
import os as _os

_MORPH_BATCH_BOOLS = int(
    _os.environ.get("MAREX_MORPH_BATCH_BOOLS", "2000000")
)


def disk_offsets(radius: int) -> list[tuple[int, int]]:
    """Disk structuring element: all (dy, dx) with dy²+dx² ≤ R²
    (the reference's ``disk(R)`` SE, track.py:1627)."""
    r2 = radius * radius
    return [
        (dy, dx)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
        if dy * dy + dx * dx <= r2
    ]


def _offsets_df(df: DataFrame, offsets: list[tuple[int, int]]):
    return F.explode(
        F.array(*[F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx")) for dy, dx in offsets])
    )


def binary_dilate(
    cells: DataFrame,
    radius: int,
    ny: int,
    nx: int,
    wrap_x: bool = True,
    time_col: str = "time",
) -> DataFrame:
    """Dilate the True-cell set by a disk SE: every cell within the SE
    of a True cell becomes True. (time, y, x) in → (time, y, x) out."""
    fan = cells.select(time_col, "y", "x", _offsets_df(cells, disk_offsets(radius)).alias("o"))
    yy = F.col("y") + F.col("o.dy")
    xx = (
        F.pmod(F.col("x") + F.col("o.dx"), F.lit(nx))
        if wrap_x
        else F.col("x") + F.col("o.dx")
    )
    out = fan.select(
        time_col, yy.cast("int").alias("y"), xx.cast("int").alias("x")
    ).filter((F.col("y") >= 0) & (F.col("y") < ny))
    if not wrap_x:
        out = out.filter((F.col("x") >= 0) & (F.col("x") < nx))
    return out.dropDuplicates([time_col, "y", "x"])


def binary_erode(
    cells: DataFrame,
    radius: int,
    ny: int,
    nx: int,
    wrap_x: bool = True,
    time_col: str = "time",
) -> DataFrame:
    """Erode the True-cell set: keep cells whose entire disk SE
    neighbourhood is True. Off-grid y neighbours count as True (edge
    padding — the shore-protection rule, track.py:1566-1577).

    Relational form: scatter each True cell to the SE positions it
    supports, then keep positions whose support count equals the number
    of in-bounds SE cells."""
    offsets = disk_offsets(radius)
    fan = cells.select(time_col, "y", "x", _offsets_df(cells, offsets).alias("o"))
    yy = F.col("y") + F.col("o.dy")
    xx = (
        F.pmod(F.col("x") + F.col("o.dx"), F.lit(nx))
        if wrap_x
        else F.col("x") + F.col("o.dx")
    )
    support = fan.select(
        time_col, yy.cast("int").alias("y"), xx.cast("int").alias("x")
    ).filter((F.col("y") >= 0) & (F.col("y") < ny))
    if not wrap_x:
        support = support.filter((F.col("x") >= 0) & (F.col("x") < nx))
    counts = support.groupBy(time_col, "y", "x").agg(F.count("*").alias("supp"))

    # required support at (y, x): SE cells that land in-bounds
    need_y = None
    for dy, dx in offsets:
        ok_y = (F.col("y") + F.lit(dy) >= 0) & (F.col("y") + F.lit(dy) < ny)
        ok = ok_y if wrap_x else ok_y & (F.col("x") + F.lit(dx) >= 0) & (
            F.col("x") + F.lit(dx) < nx
        )
        term = F.when(ok, 1).otherwise(0)
        need_y = term if need_y is None else need_y + term
    return (
        counts.join(cells.select(time_col, "y", "x"), [time_col, "y", "x"], "left_semi")
        .filter(F.col("supp") >= need_y)
        .select(time_col, "y", "x")
    )


def _dilate_np(g, offsets, wrap_x: bool):
    """Dense dilation by the SE offsets: zero padding in y (and x when
    not wrapping), np.roll for the periodic x. ``g`` is (ny, nx) or a
    (T, ny, nx) stack — rolls apply to the trailing two axes, so a
    whole partition of slices dilates in one pass (per-slice rolls were
    the preprocess stage's dominant Python overhead).

    A disk SE is row-separable: each dy contributes the contiguous dx
    run [-w(dy), +w(dy)], so the dilation is (shared incremental
    horizontal run-ORs) ∘ (one y-roll per dy) — ~16 array passes at
    R=4 instead of 49 offset rolls (and 38 vs 197 at the reference's
    default R=8), for the identical set union. Non-separable offset
    sets (never produced by disk_offsets) fall back to the plain
    shift-OR loop."""
    import numpy as np

    R = max(max(abs(dy), abs(dx)) for dy, dx in offsets)
    ny, nx = g.shape[-2:]
    lead = g.shape[:-2]
    ax_y, ax_x = g.ndim - 2, g.ndim - 1
    if wrap_x:
        p = np.zeros(lead + (ny + 2 * R, nx), dtype=bool)
        p[..., R : R + ny, :] = g
    else:
        p = np.zeros(lead + (ny + 2 * R, nx + 2 * R), dtype=bool)
        p[..., R : R + ny, R : R + nx] = g

    by_dy: dict[int, set] = {}
    for dy, dx in offsets:
        by_dy.setdefault(dy, set()).add(dx)
    separable = all(
        dxs == set(range(-max(dxs), max(dxs) + 1)) for dxs in by_dy.values()
    )
    if separable:
        widths = {dy: max(dxs) for dy, dxs in by_dy.items()}
        need = sorted(set(widths.values()))
        # horizontal run dilations, built incrementally: H[w] = p OR'd
        # with its x-shifts up to ±w (each width reuses the previous)
        H: dict[int, np.ndarray] = {}
        if need == [0]:
            H[0] = p
        else:
            acc = p.copy()
            if 0 in need:
                H[0] = p
            for w in range(1, need[-1] + 1):
                acc |= np.roll(p, w, axis=ax_x)
                acc |= np.roll(p, -w, axis=ax_x)
                if w in need:
                    H[w] = acc.copy() if w != need[-1] else acc
        out = np.zeros_like(p)
        for dy, w in widths.items():
            if dy == 0:
                out |= H[w]
            else:
                out |= np.roll(H[w], dy, axis=ax_y)
    else:
        out = np.zeros_like(p)
        for dy, dx in offsets:
            out |= np.roll(p, (dy, dx), axis=(ax_y, ax_x))
    if wrap_x:
        return out[..., R : R + ny, :]
    return out[..., R : R + ny, R : R + nx]


def _erode_np(g, offsets, wrap_x: bool):
    """Dense erosion via the complement identity erode(X) = ¬dilate(¬X):
    the dilation's zero padding makes off-grid cells count as PRESENT
    for erosion — exactly the relational form's shore-protection rule
    (in-bounds SE support only, track.py:1566-1577)."""
    return ~_dilate_np(~g, offsets, wrap_x)


def morph_close_open_blocked(
    true_cells: DataFrame,
    radius: int,
    ny: int,
    nx: int,
    wrap_x: bool = True,
    time_col: str = "time",
) -> DataFrame:
    """Closing-then-opening over sparse True cells, one dense numpy
    kernel per timestep (the scale form of the M1 pair: the reference
    runs C-backed binary_closing/opening per dask chunk,
    track.py:1630-1634; the relational offset-explode form pays a
    49-197× row fan-out per morphology op — measured 350 s for a
    35M-cell-day preprocess at R=4 vs ~seconds here). One shuffle by
    time; every slice is an independent kernel, same parallelism model
    as labelling. Semantics pinned equal to
    binary_erode(binary_dilate(...)) + the opening in
    tests/test_morphology.py."""
    from collections.abc import Iterator

    import numpy as np
    import pyarrow as pa

    offsets = disk_offsets(radius)
    spark = true_cells.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    time_type = true_cells.schema[time_col].dataType.simpleString()

    def _run(batches) -> Iterator:
        blist = list(batches)
        if not blist or sum(b.num_rows for b in blist) == 0:
            return
        tbl = pa.Table.from_batches(blist).combine_chunks()
        ts_type = tbl.schema.field(time_col).type
        ts = tbl[time_col].cast(pa.int64()).to_numpy()
        ys = tbl["y"].to_numpy()
        xs = tbl["x"].to_numpy()
        ut, t_inv = np.unique(ts, return_inverse=True)
        # Stacked (T, ny, nx) kernel: the 4 morphology stages roll the
        # whole sub-batch of slices at once instead of per-timestep
        # (49 rolls/stage at R=4 — per-slice loops were pure overhead).
        # Sub-batch budget sized for CACHE RESIDENCY, not just peak
        # memory: each roll pass re-touches the whole padded stack, so
        # a 64 MB stack is pure DRAM traffic and 32 concurrent tasks
        # thrash each other — at production dims (720×1440) the
        # 32-way kernel wave measured 9.7-16.4 s/task at a 64 MB budget
        # vs 1.8-2.6 s at 2 MB (~1 slice/stack there), identical
        # outputs (tools/ab_morph_batch_mp.py). Slices stay batched
        # where they are small (625/stack at the 40×80 bench grid), so
        # the per-slice Python overhead this stacking removed does not
        # return; slices remain fully independent.
        per = max(1, _MORPH_BATCH_BOOLS // (ny * nx))
        # rows sorted by slice index once, sub-batches sliced as
        # contiguous ranges — at production dims per=1, so the old
        # per-sub-batch boolean mask re-scanned every partition row
        # once per TIMESTEP (O(T·n_rows) scatter prep)
        order = np.argsort(t_inv, kind="stable")
        t_srt, ys_srt, xs_srt = t_inv[order], ys[order], xs[order]
        starts = np.searchsorted(t_srt, np.arange(len(ut) + 1))
        for lo in range(0, len(ut), per):
            hi = min(lo + per, len(ut))
            r0, r1 = starts[lo], starts[hi]
            g = np.zeros((hi - lo, ny, nx), dtype=bool)
            g[t_srt[r0:r1] - lo, ys_srt[r0:r1], xs_srt[r0:r1]] = True
            closed = _erode_np(_dilate_np(g, offsets, wrap_x), offsets, wrap_x)
            opened = _dilate_np(
                _erode_np(closed, offsets, wrap_x), offsets, wrap_x
            )
            tt, yy, xx = np.nonzero(opened)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ut[tt + lo]).cast(ts_type),
                    pa.array(yy.astype(np.int32)),
                    pa.array(xx.astype(np.int32)),
                ],
                names=[time_col, "y", "x"],
            )

    out_schema = f"{time_col} {time_type}, y int, x int"
    return true_cells.repartition(parallelism, time_col).mapInArrow(
        _run, schema=out_schema
    )


def fill_holes(
    extremes: DataFrame,
    radius: int,
    ny: int,
    nx: int,
    wrap_x: bool = True,
    time_col: str = "time",
    extreme_col: str = "extreme",
    blocked: bool = True,
) -> DataFrame:
    """M1 (track.py:1520-1673): binary closing (fill holes ≤ R) then
    opening (remove specks ≤ R). Input: boolean long field (dense or
    sparse-True); output rows = input rows ∪ filled-in cells, so a
    sparse input keeps its fill-ins (a plain left join silently dropped
    them). ``blocked=True`` (default) runs the per-slice dense kernel;
    ``False`` keeps the pure-relational offset-explode form (the
    oracle-replayable algebra trk_m1 pins)."""
    true_cells = extremes.filter(F.col(extreme_col)).select(time_col, "y", "x")
    if blocked:
        opened = morph_close_open_blocked(
            true_cells, radius, ny, nx, wrap_x, time_col
        )
    else:
        closed = binary_erode(
            binary_dilate(true_cells, radius, ny, nx, wrap_x, time_col),
            radius, ny, nx, wrap_x, time_col,
        )
        opened = binary_dilate(
            binary_erode(closed, radius, ny, nx, wrap_x, time_col),
            radius, ny, nx, wrap_x, time_col,
        )
    marked = opened.withColumn("_t", F.lit(True))
    return (
        extremes.drop(extreme_col)
        .join(marked, [time_col, "y", "x"], "full")
        .withColumn(extreme_col, F.coalesce(F.col("_t"), F.lit(False)))
        .drop("_t")
    )


def fill_time_gaps(
    extremes: DataFrame,
    t_fill: int,
    time_col: str = "time",
    extreme_col: str = "extreme",
    keys: tuple[str, ...] = ("y", "x"),
) -> DataFrame:
    """M3 temporal closing (track.py:1675-1726): per cell, False gaps of
    ≤ ``t_fill`` days between two True samples become True. Pure window
    over epoch-day — no UDF, one shuffle by cell."""
    day = epoch_day(time_col)
    w_prev = Window.partitionBy(*keys).orderBy(day).rowsBetween(Window.unboundedPreceding, -1)
    w_next = Window.partitionBy(*keys).orderBy(day).rowsBetween(1, Window.unboundedFollowing)
    true_day = F.when(F.col(extreme_col), day)
    d = extremes.withColumn("_prev", F.last(true_day, ignorenulls=True).over(w_prev)).withColumn(
        "_next", F.first(true_day, ignorenulls=True).over(w_next)
    )
    gap_ok = (
        F.col("_prev").isNotNull()
        & F.col("_next").isNotNull()
        & ((F.col("_next") - F.col("_prev") - 1) <= t_fill)
    )
    return d.withColumn(
        extreme_col, F.col(extreme_col) | gap_ok
    ).drop("_prev", "_next")


def fill_time_gaps_true_set(
    trues: DataFrame,
    t_fill: int,
    timesteps: DataFrame,
    time_col: str = "time",
    keys: tuple[str, ...] = ("y", "x"),
) -> DataFrame:
    """M3 temporal closing on a sparse True set (track.py:1675-1726):
    per cell, GENERATE rows for the ≤ ``t_fill`` missing days strictly
    between consecutive True days. Output = trues ∪ generated rows.

    Equivalent to :func:`fill_time_gaps` on the densified field — for a
    day d between nearest True days p < d < n, the dense form flips the
    row iff n − p − 1 ≤ t_fill, and (p, n) is exactly the consecutive
    True pair whose gap this form explodes — but without materialising
    a single False row, which makes it the correct temporal closing for
    sparse-True pipelines (the dense form can only flip rows that
    exist, so on sparse input it silently skips any gap day with no
    row). ``timesteps`` supplies the day → time-value mapping (distinct
    times of the ORIGINAL series); generated days with no timestep
    anywhere in the data are dropped, matching the dense form, which
    has no row to flip there either. One shuffle (the per-cell window
    over True rows) + a broadcast join with the tiny timestep table."""
    day = epoch_day(time_col)
    tsteps = timesteps.select(day.alias("_d"), time_col).distinct()
    w = Window.partitionBy(*keys).orderBy("_d")
    gaps = (
        trues.select(*keys, day.alias("_d"))
        .withColumn("_n", F.lead("_d").over(w))
        .filter(
            F.col("_n").isNotNull()
            & (F.col("_n") - F.col("_d") > 1)
            & (F.col("_n") - F.col("_d") - 1 <= t_fill)
        )
        .select(
            *keys,
            F.explode(F.sequence(F.col("_d") + 1, F.col("_n") - 1)).alias("_d"),
        )
    )
    gap_rows = gaps.join(F.broadcast(tsteps), "_d").select(time_col, *keys)
    return trues.select(time_col, *keys).unionByName(gap_rows)


def dilate_unstructured(
    cells: DataFrame,
    edges: DataFrame,
    radius: int,
    time_col: str = "time",
) -> DataFrame:
    """M2 dilation on a mesh: R rounds of frontier-join over the
    symmetric (cell, nbr) edge table (sparse_bool_power,
    track.py:5422-5468). Each round one broadcast/shuffle join +
    distinct."""
    sym = edges.select("cell", "nbr").union(
        edges.select(F.col("nbr").alias("cell"), F.col("cell").alias("nbr"))
    ).distinct()
    out = cells.select(time_col, "cell")
    for _ in range(radius):
        grown = out.join(sym, "cell").select(time_col, F.col("nbr").alias("cell"))
        out = out.union(grown).dropDuplicates([time_col, "cell"])
    return out


def erode_unstructured(
    cells: DataFrame,
    edges: DataFrame,
    radius: int,
    time_col: str = "time",
) -> DataFrame:
    """M2 erosion = ¬dilate(¬x) (track.py:1596-1606). On the sparse True
    set: a cell survives iff no missing cell lies within R hops — i.e.
    it is NOT in the dilation of the complement. Computed without
    materialising the complement: drop cells whose R-hop neighbourhood
    has any missing member, iteratively (cells adjacent to a missing
    neighbour are removed each round)."""
    sym = edges.select("cell", "nbr").union(
        edges.select(F.col("nbr").alias("cell"), F.col("cell").alias("nbr"))
    ).distinct()
    deg = sym.groupBy("cell").agg(F.count("*").alias("deg"))
    out = cells.select(time_col, "cell")
    for _ in range(radius):
        # neighbours present per cell; survives iff all neighbours present
        nbr_present = (
            out.join(sym, "cell")
            .select(time_col, F.col("nbr").alias("cell"))
            .groupBy(time_col, "cell")
            .agg(F.count("*").alias("have"))
        )
        out = (
            out.join(nbr_present, [time_col, "cell"], "left")
            .join(F.broadcast(deg), "cell", "left")
            .filter(F.coalesce(F.col("have"), F.lit(0)) >= F.coalesce(F.col("deg"), F.lit(0)))
            .select(time_col, "cell")
        )
    return out


def filter_small_objects(
    extremes: DataFrame,
    nx: int,
    area_quartile: float = 0.5,
    time_col: str = "time",
    extreme_col: str = "extreme",
    wrap_x: bool = True,
    grid_area: DataFrame | None = None,
    min_area: float | None = None,
    return_labels: bool = False,
    connectivity: int = 8,
    drop_first_object: bool = False,
) -> DataFrame:
    """Small-object filter (track.py:1755-1906): label per time (M4),
    object areas (A9), percentile threshold over object areas (A11) OR
    an absolute floor (the reference's ``area_filter_absolute``),
    semi-join keep (P6). Returns the boolean field with small objects
    switched off.

    ``drop_first_object``: replicate the reference's structured-grid
    quirk (track.py:1891-1892 ``object_ids_keep[0] = -1  # Don't keep
    ID=0``): regionprops never emits background 0, so that line
    unconditionally discards the props table's FIRST row — object ID 1,
    a real object — from the kept set. Its test pins bake the quirk in
    (e.g. q=0.0 filtering reports 1046 → 1045). The Tracker facade
    passes True for drop-in parity; the engine default keeps every
    object above threshold.

    ``return_labels=True`` returns the surviving LABELLED cells
    (time, y, x, obj_id) instead of the boolean field: dropping whole
    components never splits or merges the others, so these labels are
    valid tracking input as-is — the caller skips the second
    labelling pass ``track_events`` would otherwise run (one full
    shuffle + kernel pass over all extreme cells saved; only the
    obj-id NUMBERING differs from relabelling the filtered field)."""
    from marex_spark.operators.label import label_components
    from marex_spark.operators.overlap import object_areas

    labels = label_components(
        extremes, nx=nx, time_col=time_col, extreme_col=extreme_col,
        wrap_x=wrap_x, connectivity=connectivity,
    )
    if grid_area is not None:
        labels_a = labels.join(F.broadcast(grid_area), ["y", "x"])
        areas = object_areas(labels_a, time_col=time_col, area_col="area")
    else:
        areas = object_areas(labels, time_col=time_col)
    if min_area is not None:
        keep = areas.filter(F.col("area") >= float(min_area)).select("obj_id")
    else:
        thr = areas.agg(
            F.percentile("area", F.lit(area_quartile)).alias("thr")
        )
        keep = (
            areas.crossJoin(F.broadcast(thr))
            .filter(F.col("area") >= F.col("thr"))
            .select("obj_id")
        )
    if drop_first_object:
        first = areas.agg(F.min("obj_id").alias("_first"))
        keep = (
            keep.crossJoin(F.broadcast(first))
            .filter(F.col("obj_id") != F.col("_first"))
            .select("obj_id")
        )
    kept_cells = labels.join(keep, "obj_id", "left_semi")
    if return_labels:
        return kept_cells.select(time_col, "y", "x", "obj_id")
    kept_cells = kept_cells.withColumn("_k", F.lit(True))
    return (
        extremes.drop(extreme_col)
        .join(kept_cells.select(time_col, "y", "x", "_k"), [time_col, "y", "x"], "left")
        .withColumn(extreme_col, F.coalesce(F.col("_k"), F.lit(False)))
        .drop("_k")
    )


def morph_close_open_unstructured(
    true_cells: DataFrame,
    edges: DataFrame,
    radius: int,
    refill_radius: int = 0,
    time_col: str = "time",
    max_driver_edges: int = 50_000_000,
    symmetrize: bool = True,
) -> DataFrame:
    """Mesh closing-then-opening as ONE kernel pass (the scale form of
    the M2 chain; reference sparse_bool_power, track.py:5422-5468 —
    which likewise ships the adjacency to every worker and runs the
    boolean matvec in-process per slice).

    The frontier-join form (:func:`dilate_unstructured` /
    :func:`erode_unstructured`) pays 2-3 shuffles PER HOP — a closing +
    opening at R hops is ~10·R shuffle stages. Here the symmetric edge
    list collects once (mesh topology is static metadata — refuse above
    ``max_driver_edges``), ships in the task closure, and every slice
    runs the whole chain as E-length bincount passes: dilation adds
    cells with any present neighbour, erosion drops cells with any
    missing neighbour — identical sets to the join form (pinned in
    tests/test_unstructured.py). One shuffle by time, total.

    ``refill_radius`` > 0 appends a second closing+opening at that
    radius (the reference's post-gap-fill ``fill_holes(R_fill // 2)``)
    in the same pass.

    ``symmetrize=False`` uses the edge table AS GIVEN (directed) — the
    reference's sparse dilation matrix is built from the raw neighbour
    lists without symmetrising (track.py:1095-1115), and real mesh
    fixtures carry asymmetric boundary rows (~7% of edges on the
    reference's 405-cell mesh), so the Tracker facade passes False for
    parity. The default keeps the engine contract (one-directional
    edge tables welcome).
    """
    from collections.abc import Iterator

    import numpy as np
    import pyarrow as pa

    n_edges = edges.count()
    if n_edges > max_driver_edges:
        raise ValueError(
            f"mesh edge table ({n_edges} rows) exceeds the driver budget "
            f"({max_driver_edges}); use the frontier-join operators"
        )
    epdf = edges.select("cell", "nbr").toPandas()
    u0 = epdf["cell"].to_numpy(np.int64)
    v0 = epdf["nbr"].to_numpy(np.int64)
    if symmetrize:
        uu = np.concatenate([u0, v0])
        vv = np.concatenate([v0, u0])
    else:  # directed, as the reference's A @ p matvec uses it
        uu, vv = u0, v0
    key = uu * (max(int(uu.max()), int(vv.max())) + 2) + vv
    _, idx = np.unique(key, return_index=True)
    uu, vv = uu[idx], vv[idx]
    spark = true_cells.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    time_type = true_cells.schema[time_col].dataType.simpleString()

    def _run(batches) -> Iterator:
        blist = list(batches)
        if not blist or sum(b.num_rows for b in blist) == 0:
            return
        tbl = pa.Table.from_batches(blist).combine_chunks()
        ts_type = tbl.schema.field(time_col).type
        # date32 refuses a direct int64 cast; widen via int32
        tcol = tbl[time_col]
        if pa.types.is_date32(ts_type):
            tcol = tcol.cast(pa.int32())
        ts = tcol.cast(pa.int64()).to_numpy()
        cs = tbl["cell"].to_numpy()
        nc = max(int(uu.max()), int(vv.max()), int(cs.max()) if len(cs) else 0) + 1
        ut, t_inv = np.unique(ts, return_inverse=True)

        def dilate(p):
            grown = np.bincount(uu, weights=p[vv], minlength=nc) > 0
            return p | grown

        def erode(p):
            missing = np.bincount(uu, weights=(~p)[vv], minlength=nc) > 0
            return p & ~missing

        for ti in range(len(ut)):
            p = np.zeros(nc, dtype=bool)
            p[cs[t_inv == ti]] = True
            for r in (radius, refill_radius):
                if r <= 0:
                    continue
                for _ in range(r):
                    p = dilate(p)
                for _ in range(2 * r):
                    p = erode(p)
                for _ in range(r):
                    p = dilate(p)
            (keep,) = np.nonzero(p)
            tvals = np.full(len(keep), ut[ti])
            if pa.types.is_date32(ts_type):
                tarr = pa.array(tvals.astype(np.int32)).cast(ts_type)
            else:
                tarr = pa.array(tvals).cast(ts_type)
            yield pa.RecordBatch.from_arrays(
                [tarr, pa.array(keep.astype(np.int64))],
                names=[time_col, "cell"],
            )

    out_schema = f"{time_col} {time_type}, cell long"
    return true_cells.repartition(parallelism, time_col).mapInArrow(
        _run, schema=out_schema
    )
