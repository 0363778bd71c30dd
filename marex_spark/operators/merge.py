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
    grid = geometry == "grid"
    # sparse per-time slices (single groupby pass, not per-time scans)
    slices: dict[int, dict] = {}
    times = []
    for ti, (t, g) in enumerate(cells.groupby(time_col, sort=True)):
        times.append(t)
        if grid:
            ys = g["y"].to_numpy(np.int64)
            xs = g["x"].to_numpy(np.int64)
            key = ys * nx + xs
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

    # initial props: area + centroid per object (A9/A10)
    areas: dict[int, int] = {}
    cents: dict[int, tuple[float, float]] = {}

    def _centroid_of(c1: np.ndarray, c2: np.ndarray) -> tuple[float, float]:
        if grid:
            return _centroid(c1, c2, nx, wrap_x)
        return _centroid_sphere(c1, c2)

    def _dist_to(c1: np.ndarray, c2: np.ndarray, cent: tuple[float, float]) -> np.ndarray:
        if grid:
            return _wrapped_dist2(c1, c2, cent[0], cent[1], nx, wrap_x)
        return _haversine2(c1, c2, cent[0], cent[1])

    def _recompute_props(sl: dict, only_ids=None) -> None:
        ids = sl["id"]
        targets = np.unique(ids) if only_ids is None else np.asarray(list(only_ids))
        for oid in targets:
            m = ids == oid
            n = int(m.sum())
            if n == 0:
                areas.pop(int(oid), None)
                cents.pop(int(oid), None)
                continue
            areas[int(oid)] = n
            cents[int(oid)] = _centroid_of(sl["c1"][m], sl["c2"][m])

    for ti in range(len(times)):
        _recompute_props(slices[ti])

    next_new_id = int(cells["obj_id"].max()) + 1 if len(cells) else 1
    ledger = MergeLedger([], [], [], [])

    def _consolidate(t_prev2: int, t_prev: int) -> None:
        """M10: children at t_prev of one t_prev2 parent → first child."""
        back = _apply_threshold(
            _slice_overlaps(slices[t_prev2], slices[t_prev]), areas, overlap_threshold
        )
        if len(back) == 0:
            return
        parents, counts = np.unique(back[:, 0], return_counts=True)
        for p in parents[counts > 1]:
            kids = back[back[:, 0] == p, 1].astype(np.int64)
            first = int(kids[0])
            if first not in areas:
                continue
            changed = False
            sl = slices[t_prev]
            for k in kids[1:]:
                k = int(k)
                if k not in areas:
                    continue
                sl["id"][sl["id"] == k] = first
                areas.pop(k, None)
                cents.pop(k, None)
                changed = True
            if changed:
                _recompute_props(sl, [first])

    for ti in range(1, len(times)):
        if ti >= 2:
            _consolidate(ti - 2, ti - 1)
        sl_prev, sl = slices[ti - 1], slices[ti]
        pairs = _apply_threshold(_slice_overlaps(sl_prev, sl), areas, overlap_threshold)

        for _ in range(max_iter_per_step):
            kids, counts = np.unique(pairs[:, 1], return_counts=True) if len(pairs) else (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
            )
            merging = kids[counts > 1]
            if len(merging) == 0:
                break
            for child in merging:
                grp = pairs[pairs[:, 1] == child]
                parent_ids = grp[:, 0].astype(np.int64)
                n_par = len(parent_ids)
                new_ids = np.arange(next_new_id, next_new_id + n_par - 1, dtype=np.int64)
                next_new_id += n_par - 1
                child_ids = np.concatenate(([int(child)], new_ids))

                ledger.times.append(times[ti])
                ledger.child_ids.append(child_ids.copy())
                ledger.parent_ids.append(parent_ids.copy())
                ledger.areas.append(grp[:, 2].astype(np.int64).copy())

                mask = sl["id"] == child
                c1m, c2m = sl["c1"][mask], sl["c2"][mask]
                cent_d = np.stack(
                    [_dist_to(c1m, c2m, cents[int(p)]) for p in parent_ids],
                    axis=1,
                )
                if nn_partitioning:
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
                                grid,
                                nx,
                                wrap_x,
                            )
                            for p in parent_ids
                        ],
                        axis=1,
                    )
                    if grid:
                        max_area = max(areas.get(int(p), 1) for p in parent_ids)
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
                _recompute_props(sl, child_ids)

            pairs = _apply_threshold(_slice_overlaps(sl_prev, sl), areas, overlap_threshold)

    # final consolidation of the last timestep (end-of-chunk rule,
    # track.py:3602-3615)
    if len(times) >= 2:
        _consolidate(len(times) - 2, len(times) - 1)

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
