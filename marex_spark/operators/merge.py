"""Split/merge event tracking (SURVEY M8-M10 + J9) — the Spark port of
the reference's ``split_and_merge_objects`` serial mode
(track.py:3337-3802) with centroid-based child partitioning
(track.py:5357-5419 / 4827-4884) and t-2→t-1 ID consolidation
(track.py:2554-2656).

Tier structure mirrors the reference: the per-timestep resolution loop
is inherently sequential in time (timestep t's labels depend on t-1's
post-partitioning labels), so — exactly like the reference, which
``.compute()``s each time chunk onto the driver (track.py:3386) — the
resolution kernel runs driver-side over the *sparse* labelled cells
(only extreme cells, id > 0), vectorised with numpy per transition.
Everything before (labelling, morphology) and after (event-graph CC,
remap, stats) stays distributed. For cluster scale the kernel is
chunk-streamable: it only ever needs three timesteps of sparse cells
plus the small props dict in memory; a batched/iterative variant
(reference track.py:3804-4814) is the v2 scale path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------- kernels


def _slice_overlaps(ids_a: dict, ids_b: dict) -> np.ndarray:
    """Overlap pairs between two sparse labelled slices
    (check_overlap_slice, track.py:2396-2452): rows [id_a, id_b,
    overlap_cells], sorted by (id_a, id_b). Each slice is a dict
    {key: flat int64 cell key array, id: int64 label array}."""
    ka, kb = ids_a["key"], ids_b["key"]
    common, ia, ib = np.intersect1d(ka, kb, assume_unique=True, return_indices=True)
    if len(common) == 0:
        return np.empty((0, 3), dtype=np.int64)
    pa = ids_a["id"][ia]
    pb = ids_b["id"][ib]
    m = max(int(pa.max()), int(pb.max())) + 1
    pair = pa * m + pb
    uniq, counts = np.unique(pair, return_counts=True)
    return np.column_stack((uniq // m, uniq % m, counts)).astype(np.int64)


def _apply_threshold(pairs: np.ndarray, areas: dict, threshold: float) -> np.ndarray:
    """M8 gate: overlap ≥ threshold · min(area_a, area_b)
    (enforce_overlap_threshold, track.py:2506-2552)."""
    if len(pairs) == 0 or threshold <= 0:
        return pairs
    a0 = np.array([areas.get(int(i), 0) for i in pairs[:, 0]], dtype=np.float64)
    a1 = np.array([areas.get(int(i), 0) for i in pairs[:, 1]], dtype=np.float64)
    keep = pairs[:, 2] >= threshold * np.minimum(a0, a1)
    return pairs[keep]


def _centroid(ys: np.ndarray, xs: np.ndarray, nx: int, wrap_x: bool) -> tuple[float, float]:
    """Pixel centroid with periodic x (M11, track.py:2050-2107): circular
    mean in x so objects straddling the seam centre correctly."""
    cy = float(ys.mean())
    if not wrap_x:
        return cy, float(xs.mean())
    ang = xs * (2 * np.pi / nx)
    cx = float(np.arctan2(np.sin(ang).mean(), np.cos(ang).mean()) * nx / (2 * np.pi)) % nx
    return cy, cx


def _wrapped_dist2(
    ys: np.ndarray, xs: np.ndarray, cy: float, cx: float, nx: int, wrap_x: bool
) -> np.ndarray:
    """Squared wrapped-Euclidean pixel distance
    (wrapped_euclidian_distance_mask_parallel, track.py:4827-4884)."""
    dy = ys - cy
    dx = np.abs(xs - cx)
    if wrap_x:
        dx = np.minimum(dx, nx - dx)
    return dy * dy + dx * dx


def _centroid_sphere(lats: np.ndarray, lons: np.ndarray) -> tuple[float, float]:
    """Spherical centroid via mean Cartesian unit vector (A10,
    track.py:2195-2230) — dateline-safe by construction."""
    la, lo = np.radians(lats), np.radians(lons)
    x = np.cos(la) * np.cos(lo)
    y = np.cos(la) * np.sin(lo)
    z = np.sin(la)
    mx, my, mz = x.mean(), y.mean(), z.mean()
    return (
        float(np.degrees(np.arctan2(mz, np.hypot(mx, my)))),
        float(np.degrees(np.arctan2(my, mx))),
    )


def _haversine2(
    lats: np.ndarray, lons: np.ndarray, clat: float, clon: float
) -> np.ndarray:
    """Haversine distance (track.py:5406-5411), squared-comparable
    (monotone), to parent centroid."""
    la1, lo1 = np.radians(lats), np.radians(lons)
    la2, lo2 = np.radians(clat), np.radians(clon)
    a = (
        np.sin((la2 - la1) / 2) ** 2
        + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2
    )
    return a  # asin/scale are monotone — argmin unchanged


def _min_dist_to_members(
    c1: np.ndarray,
    c2: np.ndarray,
    m1: np.ndarray,
    m2: np.ndarray,
    grid: bool,
    nx: int,
    wrap_x: bool,
    chunk: int = 4096,
) -> np.ndarray:
    """Distance from each child cell to the NEAREST member cell of one
    parent (the nn-partitioning metric, partition_nn_grid
    track.py:4973-5113 / partition_nn_unstructured 5117-5242).
    Vectorised pairwise blocks — no KD-tree dependency."""
    out = np.full(len(c1), np.inf)
    for s in range(0, len(m1), chunk):
        p1 = m1[s : s + chunk]
        p2 = m2[s : s + chunk]
        if grid:
            dy = c1[:, None] - p1[None, :]
            dx = np.abs(c2[:, None] - p2[None, :])
            if wrap_x:
                dx = np.minimum(dx, nx - dx)
            d = dy * dy + dx * dx
        else:
            la1 = np.radians(c1)[:, None]
            lo1 = np.radians(c2)[:, None]
            la2 = np.radians(p1)[None, :]
            lo2 = np.radians(p2)[None, :]
            d = (
                np.sin((la2 - la1) / 2) ** 2
                + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2
            )
        out = np.minimum(out, d.min(axis=1))
    return out


@dataclass
class MergeLedger:
    times: list
    child_ids: list  # list of int64 arrays
    parent_ids: list
    areas: list


class _Resolver:
    """Carry-state for the sequential resolution loop: the props dicts,
    ledger and id counter — everything except the slices themselves —
    so processing can stream over bounded time chunks exactly like the
    reference's chunk loop (track.py:3377-3420): a chunk only ever
    needs its own slices plus the previous chunk's last two."""

    def __init__(
        self,
        nx: int,
        wrap_x: bool,
        overlap_threshold: float,
        max_iter_per_step: int,
        grid: bool,
        nn_partitioning: bool,
    ):
        self.nx = nx
        self.wrap_x = wrap_x
        self.overlap_threshold = overlap_threshold
        self.max_iter_per_step = max_iter_per_step
        self.grid = grid
        self.nn_partitioning = nn_partitioning
        self.areas: dict[int, int] = {}
        self.cents: dict[int, tuple[float, float]] = {}
        self.ledger = MergeLedger([], [], [], [])
        self.next_new_id = 1

    def build_slices(self, cells: pd.DataFrame, time_col: str):
        """Sparse per-time slices via one groupby pass."""
        slices: dict[int, dict] = {}
        times: list = []
        for ti, (t, g) in enumerate(cells.groupby(time_col, sort=True)):
            times.append(t)
            if self.grid:
                ys = g["y"].to_numpy(np.int64)
                xs = g["x"].to_numpy(np.int64)
                key = ys * self.nx + xs
                order = np.argsort(key)
                slices[ti] = {
                    "key": key[order],
                    "c1": ys[order],
                    "c2": xs[order],
                    "id": g["obj_id"].to_numpy(np.int64)[order],
                }
            else:
                key = g["cell"].to_numpy(np.int64)
                order = np.argsort(key)
                slices[ti] = {
                    "key": key[order],
                    "c1": g["lat"].to_numpy(np.float64)[order],
                    "c2": g["lon"].to_numpy(np.float64)[order],
                    "id": g["obj_id"].to_numpy(np.int64)[order],
                }
        return slices, times

    def _centroid_of(self, c1, c2):
        if self.grid:
            return _centroid(c1, c2, self.nx, self.wrap_x)
        return _centroid_sphere(c1, c2)

    def _dist_to(self, c1, c2, cent):
        if self.grid:
            return _wrapped_dist2(c1, c2, cent[0], cent[1], self.nx, self.wrap_x)
        return _haversine2(c1, c2, cent[0], cent[1])

    def register_slice(self, sl: dict, only_ids=None) -> None:
        """(Re)compute area + centroid props (A9/A10) for a slice."""
        ids = sl["id"]
        targets = np.unique(ids) if only_ids is None else np.asarray(list(only_ids))
        for oid in targets:
            m = ids == oid
            n = int(m.sum())
            if n == 0:
                self.areas.pop(int(oid), None)
                self.cents.pop(int(oid), None)
                continue
            self.areas[int(oid)] = n
            self.cents[int(oid)] = self._centroid_of(sl["c1"][m], sl["c2"][m])

    def consolidate(self, sl_prev2: dict, sl_prev: dict) -> None:
        """M10 (track.py:2554-2656): children at t-1 of one t-2 parent
        are renamed to the first child."""
        back = _apply_threshold(
            _slice_overlaps(sl_prev2, sl_prev), self.areas, self.overlap_threshold
        )
        if len(back) == 0:
            return
        parents, counts = np.unique(back[:, 0], return_counts=True)
        for p in parents[counts > 1]:
            kids = back[back[:, 0] == p, 1].astype(np.int64)
            first = int(kids[0])
            if first not in self.areas:
                continue
            changed = False
            for k in kids[1:]:
                k = int(k)
                if k not in self.areas:
                    continue
                sl_prev["id"][sl_prev["id"] == k] = first
                self.areas.pop(k, None)
                self.cents.pop(k, None)
                changed = True
            if changed:
                self.register_slice(sl_prev, [first])

    def transition(self, sl_prev: dict, sl: dict, time_value) -> None:
        """One t-1 → t step: detect multi-parent children, partition
        them among parents, record merges; iterate to fixpoint."""
        pairs = _apply_threshold(
            _slice_overlaps(sl_prev, sl), self.areas, self.overlap_threshold
        )
        for _ in range(self.max_iter_per_step):
            kids, counts = (
                np.unique(pairs[:, 1], return_counts=True)
                if len(pairs)
                else (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
            )
            merging = kids[counts > 1]
            if len(merging) == 0:
                break
            for child in merging:
                grp = pairs[pairs[:, 1] == child]
                parent_ids = grp[:, 0].astype(np.int64)
                n_par = len(parent_ids)
                new_ids = np.arange(
                    self.next_new_id, self.next_new_id + n_par - 1, dtype=np.int64
                )
                self.next_new_id += n_par - 1
                child_ids = np.concatenate(([int(child)], new_ids))

                self.ledger.times.append(time_value)
                self.ledger.child_ids.append(child_ids.copy())
                self.ledger.parent_ids.append(parent_ids.copy())
                self.ledger.areas.append(grp[:, 2].astype(np.int64).copy())

                mask = sl["id"] == child
                c1m, c2m = sl["c1"][mask], sl["c2"][mask]
                cent_d = np.stack(
                    [self._dist_to(c1m, c2m, self.cents[int(p)]) for p in parent_ids],
                    axis=1,
                )
                if self.nn_partitioning:
                    # nn mode (track.py:4973-5242): nearest parent
                    # *member cell*, capped at max_distance; cells
                    # beyond the cap from every parent fall back to the
                    # nearest centroid (track.py:5224-5238)
                    prev_ids = sl_prev["id"]
                    nn_d = np.stack(
                        [
                            _min_dist_to_members(
                                c1m,
                                c2m,
                                sl_prev["c1"][prev_ids == p],
                                sl_prev["c2"][prev_ids == p],
                                self.grid,
                                self.nx,
                                self.wrap_x,
                            )
                            for p in parent_ids
                        ],
                        axis=1,
                    )
                    if self.grid:
                        max_area = max(self.areas.get(int(p), 1) for p in parent_ids)
                        cap = float(max(np.sqrt(max_area) * 3.0, 40.0)) ** 2
                    else:
                        cap = np.inf
                    best = np.argmin(nn_d, axis=1)
                    unreached = nn_d[np.arange(len(best)), best] > cap
                    best[unreached] = np.argmin(cent_d[unreached], axis=1)
                else:
                    # centroid partitioning (track.py:5357-5419): each
                    # child cell → nearest parent centroid's child id
                    best = np.argmin(cent_d, axis=1)
                sl["id"][mask] = child_ids[best]
                self.register_slice(sl, child_ids)

            pairs = _apply_threshold(
                _slice_overlaps(sl_prev, sl), self.areas, self.overlap_threshold
            )


def split_merge_serial(
    cells: pd.DataFrame,
    nx: int = 0,
    overlap_threshold: float = 0.5,
    wrap_x: bool = True,
    max_iter_per_step: int = 10,
    time_col: str = "time",
    geometry: str = "grid",
    nn_partitioning: bool = False,
) -> tuple[pd.DataFrame, MergeLedger]:
    """Sequential merge/split resolution over sparse labelled cells.

    geometry="grid": input (time_col, y, x, obj_id); pixel centroids
    with periodic x, wrapped-Euclidean partitioning (structured mode,
    track.py:4827-4884). geometry="sphere": input (time_col, cell,
    lat, lon, obj_id); spherical centroids + haversine partitioning
    (unstructured mode, track.py:5357-5419).

    Obj ids are unique across time, monotonically increasing
    (label_components output). Returns (relabelled cells, ledger).
    Semantics follow the reference serial loop: per timestep,
    consolidate t-1 against t-2 (M10), then partition multi-parent
    children among parents by nearest parent centroid (M9 + ledger),
    iterating within the timestep until no merging children remain.
    """
    resolver = _Resolver(
        nx=nx,
        wrap_x=wrap_x,
        overlap_threshold=overlap_threshold,
        max_iter_per_step=max_iter_per_step,
        grid=geometry == "grid",
        nn_partitioning=nn_partitioning,
    )
    grid = resolver.grid
    slices, times = resolver.build_slices(cells, time_col)
    for ti in range(len(times)):
        resolver.register_slice(slices[ti])
    resolver.next_new_id = int(cells["obj_id"].max()) + 1 if len(cells) else 1

    for ti in range(1, len(times)):
        if ti >= 2:
            resolver.consolidate(slices[ti - 2], slices[ti - 1])
        resolver.transition(slices[ti - 1], slices[ti], times[ti])

    # final consolidation of the last timestep (end-of-chunk rule,
    # track.py:3602-3615)
    if len(times) >= 2:
        resolver.consolidate(slices[len(times) - 2], slices[len(times) - 1])
    ledger = resolver.ledger

    def _frame(ti: int) -> pd.DataFrame:
        sl = slices[ti]
        if grid:
            return pd.DataFrame(
                {time_col: times[ti], "y": sl["c1"], "x": sl["c2"], "obj_id": sl["id"]}
            )
        return pd.DataFrame(
            {
                time_col: times[ti],
                "cell": sl["key"],
                "lat": sl["c1"],
                "lon": sl["c2"],
                "obj_id": sl["id"],
            }
        )

    out = (
        pd.concat([_frame(ti) for ti in range(len(times))], ignore_index=True)
        if len(times)
        else cells.iloc[0:0]
    )
    return out, ledger


# ------------------------------------------------------- Spark orchestration


def split_merge_events(
    labels: DataFrame,
    nx: int,
    overlap_threshold: float = 0.5,
    wrap_x: bool = True,
    time_col: str = "time",
    nn_partitioning: bool = False,
    max_iter_per_step: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Distributed-in / distributed-out wrapper around the sequential
    resolution kernel: collect the sparse labelled cells (Arrow), run
    the driver loop, return (relabelled labels, merge ledger) as
    DataFrames. The ledger uses ArrayType columns instead of the
    reference's -1-padded matrices (track.py:3776-3793 → SURVEY §1.3).
    """
    spark = labels.sparkSession
    pdf = labels.select(time_col, "y", "x", "obj_id").toPandas()
    out, ledger = split_merge_serial(
        pdf,
        nx=nx,
        overlap_threshold=overlap_threshold,
        wrap_x=wrap_x,
        time_col=time_col,
        nn_partitioning=nn_partitioning,
        max_iter_per_step=max_iter_per_step,
    )
    time_type = labels.schema[time_col].dataType.simpleString()
    out_df = spark.createDataFrame(
        out, schema=f"{time_col} {time_type}, y long, x long, obj_id long"
    )
    ledger_pdf = pd.DataFrame(
        {
            "merge_id": np.arange(1, len(ledger.times) + 1, dtype=np.int64),
            time_col: ledger.times,
            "parent_ids": [list(map(int, a)) for a in ledger.parent_ids],
            "child_ids": [list(map(int, a)) for a in ledger.child_ids],
            "overlap_areas": [list(map(int, a)) for a in ledger.areas],
        }
    )
    ledger_df = spark.createDataFrame(
        ledger_pdf,
        schema=(
            f"merge_id long, {time_col} {time_type}, parent_ids array<long>, "
            "child_ids array<long>, overlap_areas array<long>"
        ),
    )
    return out_df, ledger_df


def _ledger_df(spark, ledger: MergeLedger, time_col: str, time_type: str) -> DataFrame:
    pdf = pd.DataFrame(
        {
            "merge_id": np.arange(1, len(ledger.times) + 1, dtype=np.int64),
            time_col: ledger.times,
            "parent_ids": [list(map(int, a)) for a in ledger.parent_ids],
            "child_ids": [list(map(int, a)) for a in ledger.child_ids],
            "overlap_areas": [list(map(int, a)) for a in ledger.areas],
        }
    )
    return spark.createDataFrame(
        pdf,
        schema=(
            f"merge_id long, {time_col} {time_type}, parent_ids array<long>, "
            "child_ids array<long>, overlap_areas array<long>"
        ),
    )


def split_merge_events_chunked(
    labels: DataFrame,
    nx: int,
    chunk_steps: int = 64,
    overlap_threshold: float = 0.5,
    wrap_x: bool = True,
    time_col: str = "time",
    nn_partitioning: bool = False,
    max_iter_per_step: int = 10,
    labels_materialized: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Memory-bounded variant of :func:`split_merge_events` — the
    reference's chunk loop (track.py:3377-3420): pull ``chunk_steps``
    timesteps of sparse cells at a time (time-range filter pushed down
    to the materialised labels), resolve them against the carry (the
    previous chunk's last two post-resolution slices + the props
    dicts), emit the chunk, advance. Driver memory is O(chunk) instead
    of O(series); output and ledger are identical to the one-shot
    serial kernel (asserted in tests/test_merge.py).

    The per-chunk time-range filter re-executes the ``labels`` plan once
    per chunk, so the plan is localCheckpoint'ed here unless the caller
    declares it already materialised (``labels_materialized=True``,
    e.g. track_events passes label_components' checkpointed output) —
    otherwise a direct caller with a raw labelling plan would silently
    recompute the whole labelling per chunk."""
    spark = labels.sparkSession
    if not labels_materialized:
        labels = labels.localCheckpoint()
    times = [
        r[0]
        for r in labels.select(time_col).distinct().orderBy(time_col).collect()
    ]
    time_type = labels.schema[time_col].dataType.simpleString()
    resolver = _Resolver(
        nx=nx,
        wrap_x=wrap_x,
        overlap_threshold=overlap_threshold,
        max_iter_per_step=max_iter_per_step,
        grid=True,
        nn_partitioning=nn_partitioning,
    )
    resolver.next_new_id = (
        labels.agg(F.max("obj_id")).first()[0] or 0
    ) + 1

    out_frames: list[DataFrame] = []
    carry: list[tuple] = []  # [(time, slice)] — last two resolved slices

    for start in range(0, len(times), chunk_steps):
        chunk_times = times[start : start + chunk_steps]
        pdf = (
            labels.filter(
                (F.col(time_col) >= chunk_times[0])
                & (F.col(time_col) <= chunk_times[-1])
            )
            .select(time_col, "y", "x", "obj_id")
            .toPandas()
        )
        slices, stimes = resolver.build_slices(pdf, time_col)
        for ti in range(len(stimes)):
            resolver.register_slice(slices[ti])

        seq = carry + [(stimes[i], slices[i]) for i in range(len(stimes))]
        first_new = len(carry)
        for i in range(max(first_new, 1), len(seq)):
            # consolidation needs t-1 mutable; at a chunk's first
            # transition t-1 is the (already-emitted) carry — the
            # reference skips it there too (relative_t > 0 guard,
            # track.py:3396) because the end-of-chunk pass below
            # already consolidated it
            if i >= 2 and i - 1 >= first_new:
                resolver.consolidate(seq[i - 2][1], seq[i - 1][1])
            resolver.transition(seq[i - 1][1], seq[i][1], seq[i][0])
        if len(seq) >= 2:
            resolver.consolidate(seq[-2][1], seq[-1][1])

        chunk_pdf = pd.concat(
            [
                pd.DataFrame(
                    {
                        time_col: stimes[i],
                        "y": slices[i]["c1"],
                        "x": slices[i]["c2"],
                        "obj_id": slices[i]["id"],
                    }
                )
                for i in range(len(stimes))
            ],
            ignore_index=True,
        )
        out_frames.append(
            spark.createDataFrame(
                chunk_pdf, schema=f"{time_col} {time_type}, y long, x long, obj_id long"
            )
        )
        carry = [(stimes[i], slices[i]) for i in range(len(stimes))][-2:]

    from functools import reduce

    out_df = (
        reduce(DataFrame.unionByName, out_frames)
        if out_frames
        else labels.limit(0).select(time_col, "y", "x", "obj_id")
    )
    return out_df, _ledger_df(spark, resolver.ledger, time_col, time_type)


def split_merge_events_unstructured(
    labels: DataFrame,
    cell_geo: DataFrame,
    overlap_threshold: float = 0.5,
    time_col: str = "time",
    nn_partitioning: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Unstructured-mesh form of :func:`split_merge_events`
    (track.py:3804+ semantics, serial tier): spherical centroids +
    haversine partitioning. ``cell_geo``: (cell, lat, lon)."""
    spark = labels.sparkSession
    pdf = (
        labels.select(time_col, "cell", "obj_id")
        .join(F.broadcast(cell_geo.select("cell", "lat", "lon")), "cell")
        .toPandas()
    )
    out, ledger = split_merge_serial(
        pdf,
        overlap_threshold=overlap_threshold,
        time_col=time_col,
        geometry="sphere",
        nn_partitioning=nn_partitioning,
    )
    time_type = labels.schema[time_col].dataType.simpleString()
    out_df = spark.createDataFrame(
        out[[time_col, "cell", "obj_id"]],
        schema=f"{time_col} {time_type}, cell long, obj_id long",
    )
    return out_df, _ledger_df(spark, ledger, time_col, time_type)
