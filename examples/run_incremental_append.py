#!/usr/bin/env python
"""Incremental append tracking: run a full detect+track once, persist
it, then extend the archived run with a new month of data WITHOUT
recomputing history — the per-ingest-cycle operation of a production
deployment (operators/track.py extend_track_events).

The no-merge extension is EXACTLY the full recompute (ids included);
this script verifies that equality at the end.

Run: python examples/run_incremental_append.py [work_dir]
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from marex_spark.operators.detect_blocked import detect_extremes_blocked
    from marex_spark.operators.track import track_events
    from marex_spark.session import get_spark
    from marex_spark.sources.io import extend_track_run, write_track_result
    from marex_spark.sources.synthetic import synthetic_sst_gridded

    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="marex_append_")
    spark = get_spark(app_name="incremental-append-example")

    # a 5-year daily series; the "archive" is everything but the last month
    series = synthetic_sst_gridded(spark, n_years=5, ny=20, nx=40)
    ext = (
        detect_extremes_blocked(series)
        .withColumn("extreme", F.lit(True))
        .localCheckpoint()
    )
    days = sorted(r[0] for r in ext.select("time").distinct().collect())
    cutoff = days[-31]
    gy = spark.range(20).select(
        F.col("id").cast("int").alias("y"),
        (-50.0 + F.col("id") * 5.0).alias("lat"),
    )
    gx = spark.range(40).select(
        F.col("id").cast("int").alias("x"), (F.col("id") * 9.0).alias("lon")
    )

    print("== initial run over the archive ==")
    t0 = time.perf_counter()
    prior = track_events(
        ext.filter(F.col("time") <= F.lit(cutoff)), nx=40, grid_y=gy, grid_x=gx
    )
    write_track_result(prior, f"{work}/run_archive")
    print(f"   archived in {time.perf_counter() - t0:.1f}s -> {work}/run_archive")

    print("== a month later: extend with the new data only ==")
    t0 = time.perf_counter()
    res = extend_track_run(
        spark,
        f"{work}/run_archive",
        ext.filter(F.col("time") > F.lit(cutoff)),
        nx=40,
        grid_y=gy,
        grid_x=gx,
        out_path=f"{work}/run_extended",
    )
    t_ext = time.perf_counter() - t0
    n_events = res.events.select("event_id").distinct().count()
    print(f"   extended in {t_ext:.1f}s; {n_events} events total")

    print("== late correction: rewind two weeks, re-extend ==")
    from marex_spark.sources.io import rewind_track_run

    rewind_track_run(
        spark, f"{work}/run_extended", days[-15], f"{work}/run_rewound",
        grid_y=gy, grid_x=gx,
    )
    extend_track_run(
        spark,
        f"{work}/run_rewound",
        ext.filter(F.col("time") > F.lit(days[-15])),
        nx=40,
        grid_y=gy,
        grid_x=gx,
        out_path=f"{work}/run_final",
    )

    print("== sanity: extension == full recompute ==")
    full = track_events(ext, nx=40, grid_y=gy, grid_x=gx)
    cols = ["time", "y", "x", "obj_id", "event_id"]
    a = sorted(map(tuple, full.events.select(*cols).collect()))
    for gen in ("run_extended", "run_final"):
        b = sorted(
            map(
                tuple,
                spark.read.parquet(f"{work}/{gen}/events")
                .select(*cols)
                .collect(),
            )
        )
        assert a == b, f"{gen} diverged from the full recompute"
    print(f"   exact match on {len(a)} labelled cells (extend AND rewind+extend)")


if __name__ == "__main__":
    main()
