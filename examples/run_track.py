#!/usr/bin/env python
"""Track extreme events with the reference-parity tracker facade (the
Spark form of "batch jobs/run_track.py"): morphological preprocessing,
split/merge-aware tracking, per-event statistics, and one-call
persistence.

Run: python examples/run_track.py [out_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tempfile

from pyspark.sql import functions as F

import marex_spark as mx

NY, NX = 40, 80


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mx_track_")
    spark = mx.get_spark("example-track")

    import datetime

    from marex_spark.sources.synthetic import synthetic_extremes_gridded

    # random clumpy field + two converging blobs (collide ~day 8) so
    # the run demonstrates split/merge genealogy, not just tracking
    extremes = synthetic_extremes_gridded(spark, n_time=60, ny=NY, nx=NX, density=0.02)
    t0 = datetime.datetime(2020, 1, 1)  # generator's start date
    blob_rows = []
    for t in range(12):
        ax, bx = 20 + 2 * t, 60 - 2 * t
        for dy in range(-4, 5):
            for dx in range(-4, 5):
                blob_rows.append((t0 + datetime.timedelta(days=t), 20 + dy, (ax + dx) % NX))
                blob_rows.append((t0 + datetime.timedelta(days=t), 20 + dy, (bx + dx) % NX))
    blobs = spark.createDataFrame(
        blob_rows, "time timestamp, y int, x int"
    ).dropDuplicates().withColumn("extreme", F.lit(True))
    extremes = (
        extremes.join(blobs.select("time", "y", "x", F.col("extreme").alias("_b")),
                      ["time", "y", "x"], "left")
        .withColumn("extreme", F.col("extreme") | F.coalesce(F.col("_b"), F.lit(False)))
        .drop("_b")
    )

    gy = spark.range(NY).select(
        F.col("id").cast("int").alias("y"),
        (-85.0 + F.col("id") * (170.0 / (NY - 1))).alias("lat"),
    )
    gx = spark.range(NX).select(
        F.col("id").cast("int").alias("x"),
        ((F.col("id") + 0.5) * (360.0 / NX)).alias("lon"),
    )

    t = mx.tracker(
        extremes,
        ny=NY, nx=NX,
        R_fill=1,
        T_fill=2,
        area_filter_quartile=0.5,
        allow_merging=True,
        nn_partitioning=True,
        overlap_threshold=0.5,
        grid_y=gy, grid_x=gx,
        grid_resolution=360.0 / NX,  # true spherical km^2 cell areas
        coordinate_units="degrees",  # demo grid too coarse to auto-detect
    )
    print("preprocess stats:", t.preprocess_stats())
    res = t.run()

    n_events = res.events.select("event_id").distinct().count()
    print(f"{n_events} events tracked")
    res.lifetime_stats.orderBy(F.desc("total_cell_days")).show(5)
    ledger = res.extras["merge_ledger"]
    print(f"{ledger.count()} merge events in the ledger")

    meta = mx.write_track_result(res, out, attrs={"allow_merging": 1})
    print(f"persisted to {out}: {meta}")
    spark.stop()


if __name__ == "__main__":
    main()
