"""Physical-plan regression tests (SURVEY §4): the scale properties the
engine is designed around, asserted on `.explain` output so a future
change that multiplies shuffles fails here instead of at 100 TB.

AQE only removes work at runtime (reuse/coalesce/broadcast-convert), so
the pre-AQE counts asserted here are upper bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from marex_spark.operators.detect import preprocess_data
from marex_spark.plans import (
    broadcast_join_count,
    exchange_count,
    pushed_filters,
    scan_columns,
)
from marex_spark.sources.parquet import load_table
from marex_spark.sources.synthetic import synthetic_sst_gridded

SF = "/root/testdata/sf0.001"


def test_detect_exact_is_single_shuffle(spark):
    """The fused detect pipeline: exactly one hash Exchange (the
    cell repartition); climatology + threshold + compare are windows."""
    series = synthetic_sst_gridded(spark, n_years=1, ny=8, nx=16)
    det = preprocess_data(series, method_percentile="exact")
    assert exchange_count(det.extremes) == 1


def test_detect_shifting_is_single_shuffle(spark):
    """Shifting baseline (smoother + year-range climatology window)
    adds no extra shuffle over the cell partitioning."""
    series = synthetic_sst_gridded(spark, n_years=2, ny=8, nx=16)
    det = preprocess_data(
        series, method_anomaly="shifting_baseline", method_percentile="exact"
    )
    assert exchange_count(det.extremes) == 1


def test_scan_pushdown_and_pruning(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    assert "l_quantity" in pushed_filters(q)
    cols = scan_columns(q)
    assert set(cols) == {"l_orderkey", "l_quantity"}


def test_threshold_compare_is_broadcast(spark):
    """Global thresholds (one row per cell) must broadcast-join, never
    shuffle the fact table."""
    from marex_spark.operators.threshold import (
        global_threshold_hist,
        identify_extremes,
    )
    from marex_spark.operators.climatology import anomaly_fixed_baseline, partition_by_cells

    series = synthetic_sst_gridded(spark, n_years=1, ny=8, nx=16)
    anom = anomaly_fixed_baseline(partition_by_cells(series))
    thr = global_threshold_hist(anom)
    ext = identify_extremes(anom, thr)
    assert broadcast_join_count(ext) >= 1


def test_overlap_graph_is_single_data_shuffle(spark):
    """The temporal overlap graph (J5): one hash Exchange for the
    cell-partitioned lead window + one for the map-side-combinable pair
    agg — the labelled field must NOT be shuffled twice into a
    self-join (the r1 plan this replaced)."""
    from marex_spark.operators.overlap import overlap_pairs
    from marex_spark.sources.synthetic import synthetic_extremes_gridded

    ext = synthetic_extremes_gridded(spark, n_time=8, ny=8, nx=16)
    labels = ext.filter("extreme").select(
        "time", "y", "x", F.xxhash64("time", "y", "x").alias("obj_id")
    ).localCheckpoint()  # production input is checkpointed (track_events)
    pairs = overlap_pairs(labels, keys=("y", "x"))
    # 4 = time-index distinct (1) + its metadata-sized dense_rank (1)
    #   + the ONE data shuffle for the lead window (1) + pair agg (1).
    # The replaced self-join plan shuffled the labelled field twice → 5+.
    assert exchange_count(pairs) <= 4
    assert broadcast_join_count(pairs) == 1  # time index joins broadcast


def test_labelling_is_single_shuffle_per_pass(spark):
    """M4 labelling: the mapInPandas kernel pass contains exactly one
    Exchange (the time hash-partitioning); the offset join broadcasts."""
    from marex_spark.operators.label import label_components
    from marex_spark.sources.synthetic import synthetic_extremes_gridded

    ext = synthetic_extremes_gridded(spark, n_time=8, ny=8, nx=16)
    out = label_components(ext, nx=16)
    # post-checkpoint plan: the W6 offset table costs one map-side-
    # combined agg (1 row/time out) + one metadata-sized window
    # exchange; the labelled cells themselves join the offsets by
    # BROADCAST — any plan that shuffles the cell field again fails.
    assert exchange_count(out) <= 2
    assert broadcast_join_count(out) == 1


def test_small_dim_joins_broadcast(spark):
    """Star-schema dimension joins pick broadcast strategies."""
    li = load_table(spark, SF, "lineitem")
    sup = load_table(spark, SF, "supplier")
    q = li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey).groupBy(
        "s_name"
    ).count()
    assert broadcast_join_count(q) == 1
    assert exchange_count(q) <= 2  # group-by shuffle only (+AQE final)
