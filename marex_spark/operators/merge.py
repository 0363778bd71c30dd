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


@dataclass
class MergeLedger:
    times: list
    child_ids: list  # list of int64 arrays
    parent_ids: list
    areas: list


def split_merge_serial(
    cells: pd.DataFrame,
    nx: int,
    overlap_threshold: float = 0.5,
    wrap_x: bool = True,
    max_iter_per_step: int = 10,
    time_col: str = "time",
) -> tuple[pd.DataFrame, MergeLedger]:
    """Sequential merge/split resolution over sparse labelled cells.

    Input columns: (time_col, y, x, obj_id) — obj ids unique across
    time, monotonically increasing with time (label_components output).
    Returns (relabelled cells, merge ledger). Semantics follow the
    reference serial loop: per timestep, consolidate t-1 against t-2
    (M10), then partition multi-parent children among parents by
    nearest parent centroid, recording each merge (M9 + ledger),
    iterating within the timestep until no merging children remain.
    """
    # sparse per-time slices (single groupby pass, not per-time scans)
    slices: dict[int, dict] = {}
    times = []
    for ti, (t, g) in enumerate(cells.groupby(time_col, sort=True)):
        times.append(t)
        ys = g["y"].to_numpy(np.int64)
        xs = g["x"].to_numpy(np.int64)
        key = ys * nx + xs
        order = np.argsort(key)
        slices[ti] = {
            "key": key[order],
            "y": ys[order],
            "x": xs[order],
            "id": g["obj_id"].to_numpy(np.int64)[order],
        }

    # initial props: area + centroid per object (A9/A10 pixel form)
    areas: dict[int, int] = {}
    cents: dict[int, tuple[float, float]] = {}

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
            cents[int(oid)] = _centroid(sl["y"][m], sl["x"][m], nx, wrap_x)

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

                # centroid partitioning (track.py:5357-5419 semantics):
                # each child cell → nearest parent centroid's child id
                mask = sl["id"] == child
                ys, xs = sl["y"][mask], sl["x"][mask]
                d2 = np.stack(
                    [
                        _wrapped_dist2(ys, xs, *cents[int(p)], nx, wrap_x)
                        for p in parent_ids
                    ],
                    axis=1,
                )
                sl["id"][mask] = child_ids[np.argmin(d2, axis=1)]
                _recompute_props(sl, child_ids)

            pairs = _apply_threshold(_slice_overlaps(sl_prev, sl), areas, overlap_threshold)

    # final consolidation of the last timestep (end-of-chunk rule,
    # track.py:3602-3615)
    if len(times) >= 2:
        _consolidate(len(times) - 2, len(times) - 1)

    out = pd.concat(
        [
            pd.DataFrame(
                {
                    time_col: times[ti],
                    "y": slices[ti]["y"],
                    "x": slices[ti]["x"],
                    "obj_id": slices[ti]["id"],
                }
            )
            for ti in range(len(times))
        ],
        ignore_index=True,
    ) if len(times) else cells.iloc[0:0]
    return out, ledger


# ------------------------------------------------------- Spark orchestration


def split_merge_events(
    labels: DataFrame,
    nx: int,
    overlap_threshold: float = 0.5,
    wrap_x: bool = True,
    time_col: str = "time",
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
        pdf, nx=nx, overlap_threshold=overlap_threshold, wrap_x=wrap_x, time_col=time_col
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
