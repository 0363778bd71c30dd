"""Temporal overlap graph (SURVEY J5 + M8) — the engine's load-bearing
linking step (reference ``find_overlapping_objects`` track.py:2474-2504,
overlap threshold track.py:2506-2552).

Input: labelled field (time, <cell keys>, obj_id) — label_components
output, which contains ONLY labelled (extreme) cells. Times are
compacted to a dense step index first (dense_rank over distinct times,
metadata-sized) so the "next timestep" rule is cadence-independent.

Scale: ONE hash shuffle of the labelled field by cell for the lead
window (the next row of a cell's time-ordered history is its next
active step; a t+1 gate keeps consecutive-step pairs), then a
map-side-combinable pair aggregation. Plan pinned in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_index(labels: DataFrame, time_col: str = "time") -> DataFrame:
    """Dense step index per distinct time (broadcast-sized)."""
    w = Window.orderBy(time_col)
    return (
        labels.select(time_col)
        .distinct()
        .withColumn("t", F.dense_rank().over(w).cast("long"))
    )


def overlap_pairs(
    labels: DataFrame,
    keys: tuple[str, ...] = ("y", "x"),
    time_col: str = "time",
    area_col: str | None = None,
) -> DataFrame:
    """Pairs of object IDs overlapping between consecutive steps with
    their overlap area: (id_t, id_next, overlap_area).

    track.py:2396-2452's per-chunk kernel, expressed as ONE shuffle: a
    per-cell ``lead`` window (labels are sparse, so the next row of a
    cell's time-ordered history is its next active step; the t+1 gate
    keeps only consecutive-step pairs) then the map-side-combinable
    pair aggregation. Replaces the previous (t+1, cell) self-equi-join,
    which shuffled both sides — same output, half the shuffle volume.
    """
    ti = time_index(labels, time_col)
    lab = labels.join(F.broadcast(ti), time_col)
    area = F.col(area_col) if area_col else F.lit(1.0)
    w = Window.partitionBy(*keys).orderBy("t")
    return (
        lab.select(
            "t",
            *[F.col(k) for k in keys],
            F.col("obj_id").alias("id_t"),
            area.alias("a"),
        )
        .withColumn("t_next", F.lead("t").over(w))
        .withColumn("id_next", F.lead("id_t").over(w))
        .filter(F.col("t_next") == F.col("t") + 1)
        .groupBy("id_t", "id_next")
        .agg(F.sum("a").alias("overlap_area"))
    )


def object_areas(
    labels: DataFrame,
    time_col: str = "time",
    area_col: str | None = None,
) -> DataFrame:
    """Total area per object (A9). Objects exist within one timestep, so
    no time key is needed on the output."""
    area = F.col(area_col) if area_col else F.lit(1.0)
    return labels.groupBy("obj_id").agg(
        F.sum(area).alias("area"), F.count("*").alias("n_cells")
    )


def filter_overlap_fraction(
    pairs: DataFrame,
    areas: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """M8: keep pairs with overlap / min(area_t, area_next) ≥ threshold
    (track.py:2506-2552). Two broadcast lookups against the props table
    (J6) + a filter."""
    a_t = areas.select(F.col("obj_id").alias("id_t"), F.col("area").alias("area_t"))
    a_n = areas.select(
        F.col("obj_id").alias("id_next"), F.col("area").alias("area_next")
    )
    frac = F.col("overlap_area") / F.least(F.col("area_t"), F.col("area_next"))
    return (
        pairs.join(F.broadcast(a_t), "id_t")
        .join(F.broadcast(a_n), "id_next")
        .filter(frac >= threshold)
        .select("id_t", "id_next", "overlap_area")
    )
