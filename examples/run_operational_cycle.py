#!/usr/bin/env python
"""The production daily cycle, end to end in store formats:

  1. upstream publishes a gridded zarr store (here: written by the
     engine's own distributed zarr writer from a synthetic series),
  2. the initial run builds the frozen scoring state (climatology +
     thresholds), detects and tracks history, and archives the run
     (write_track_result) plus the state tables,
  3. each ingest tick re-reads ONLY the new time slices — driver-side
     time-chunk pruning, no full-archive rescan — scores them against
     the FROZEN state (the reference's fixed-baseline contract) and
     extends the archived run (extend_track_run),
  4. the labelled result ships back out as the reference-style int
     ``ID_field`` zarr (io.export_events_zarr) for xarray consumers.

The final assert proves the cycle equals a one-shot run that scores
the full series against the same frozen state.

Run: python examples/run_operational_cycle.py [work_dir]
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from marex_spark.operators.detect import preprocess_data
    from marex_spark.operators.track import track_events
    from marex_spark.session import get_spark
    from marex_spark.sources.io import (
        export_events_zarr,
        extend_track_run,
        write_track_result,
    )
    from marex_spark.sources.synthetic import synthetic_sst_gridded
    from marex_spark.sources.zarr import ingest_zarr_gridded, write_zarr_gridded
    from marex_spark.streaming.detect import score_stream

    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="marex_cycle_")
    spark = get_spark(app_name="operational-cycle-example")
    ny, nx = 20, 40

    print("== upstream: publish the source store (distributed zarr write) ==")
    series = synthetic_sst_gridded(spark, n_years=3, ny=ny, nx=nx)
    t0 = time.perf_counter()
    store = f"{work}/sst.zarr"
    receipts = write_zarr_gridded(series, store, var="sst", chunks=(32, ny, nx))
    print(
        f"   {receipts.count()} chunks in {time.perf_counter() - t0:.1f}s "
        f"-> {store}"
    )

    days = sorted(r[0] for r in series.select("time").distinct().collect())
    cutoff = days[-11]  # archive everything but the last 10 days

    gy = spark.range(ny).select(
        F.col("id").cast("int").alias("y"),
        (-50.0 + F.col("id") * 5.0).alias("lat"),
    )
    gx = spark.range(nx).select(
        F.col("id").cast("int").alias("x"), (F.col("id") * 9.0).alias("lon")
    )

    print("== initial run: build frozen state, detect, track, archive ==")
    t0 = time.perf_counter()
    hist = ingest_zarr_gridded(
        spark, store, "sst", layout="long", time_max=str(cutoff)
    )
    det = preprocess_data(hist, method_percentile="exact")
    clim = det.extremes.select("doy", "y", "x", "clim").dropDuplicates(
        ["doy", "y", "x"]
    )
    thr = det.thresholds
    clim.write.mode("overwrite").parquet(f"{work}/state/clim")
    thr.write.mode("overwrite").parquet(f"{work}/state/thr")
    ext_hist = det.extremes.filter("extreme").select("time", "y", "x").withColumn(
        "extreme", F.lit(True)
    ).localCheckpoint()
    det.unpersist()
    prior = track_events(ext_hist, nx=nx, grid_y=gy, grid_x=gx)
    write_track_result(prior, f"{work}/run_archive")
    print(f"   archived in {time.perf_counter() - t0:.1f}s")

    print("== daily tick: pruned read, frozen-state scoring, extend ==")
    t0 = time.perf_counter()
    fresh = ingest_zarr_gridded(
        spark, store, "sst", layout="long",
        time_min=str(days[-10]),  # chunk pruning: only tail t-chunks scan
    )
    clim_s = spark.read.parquet(f"{work}/state/clim")
    thr_s = spark.read.parquet(f"{work}/state/thr")
    scored = score_stream(fresh, clim_s, thr_s)
    ext_new = scored.filter("extreme").select("time", "y", "x").withColumn(
        "extreme", F.lit(True)
    ).localCheckpoint()
    n_new = ext_new.select("time").distinct().count()
    res = extend_track_run(
        spark,
        f"{work}/run_archive",
        ext_new,
        nx=nx,
        grid_y=gy,
        grid_x=gx,
        out_path=f"{work}/run_extended",
    )
    print(
        f"   {n_new} new days tracked in {time.perf_counter() - t0:.1f}s; "
        f"{res.events.select('event_id').distinct().count()} events total"
    )

    print("== publish: reference-style int ID_field zarr ==")
    t0 = time.perf_counter()
    out_store = f"{work}/events.zarr"
    export_events_zarr(res.events, out_store, ny=ny, nx=nx, chunks=(32, ny, nx))
    print(f"   exported in {time.perf_counter() - t0:.1f}s -> {out_store}")

    # sanity: the exported store round-trips, and the cycle equals a
    # one-shot run scoring the FULL series against the same frozen state
    back = ingest_zarr_gridded(spark, out_store, "ID_field", layout="long")
    full_scored = score_stream(series, clim_s, thr_s)
    full_ext = full_scored.filter("extreme").select("time", "y", "x").withColumn(
        "extreme", F.lit(True)
    ).localCheckpoint()
    full = track_events(full_ext, nx=nx, grid_y=gy, grid_x=gx)
    a = sorted((r.time, r.y, r.x, int(r.value)) for r in back.collect())
    b = sorted(
        (r.time, r.y, r.x, int(r.event_id)) for r in full.events.collect()
    )
    assert a == b, "operational cycle diverged from the one-shot run"
    print(f"   cycle == one-shot run on {len(a)} labelled cells")


if __name__ == "__main__":
    main()
