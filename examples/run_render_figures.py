#!/usr/bin/env python
"""Figure rendering from a tracked run — the reference user's plotting
workflow (README.md:43-60: ``preprocess_data`` → ``tracker.run()`` →
``da.plotX.single_plot()`` / ``.animate()``, plotX/base.py:331-448)
driven end-to-end from the sf0.001 testdata through the Spark data
layer (viz.py) into real image artifacts:

  anomaly.png        single_plot of the anomaly field (robust clim)
  anomaly_grid.png   multi_plot, 4 timesteps, SHARED colour scale
  events.png         id_plot of tracked events (categorical palette)
  anomaly.apng       animate: one playable animated-PNG (any browser)
  events.apng        tracked event IDs animated, colours stable per ID

matplotlib is not in this image, so the pixel layer is the stdlib
renderer (render.py: numpy colormap LUT + PNG/APNG chunk writer); the
data layer is identical either way — ``snapshot_grid`` /
``event_snapshot`` / ``animation_frames`` feed matplotlib's imshow
just as well (viz.plot_snapshot is the import-gated wrapper).

Run: python examples/run_render_figures.py [out_dir]
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import marex_spark as mx
from marex_spark.operators.detect import preprocess_data
from marex_spark.operators.track import track_events
from marex_spark.pipeline import NX, NY, _grid_dims, _gridded_from_lineitem
from marex_spark.render import (
    GriddedPlotter,
    render_id_field,
    upscale,
    write_apng,
)
from marex_spark.viz import animation_frames

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mx_figs_")
    os.makedirs(out, exist_ok=True)
    spark = mx.get_spark("example-render-figures")

    # ---- the flagship tracked run on real sf0.001 parquet ------------
    series = _gridded_from_lineitem(spark, SF_DIR)
    det = preprocess_data(
        series,
        method_anomaly="fixed_baseline",
        method_extreme="global_extreme",
        method_percentile="exact",
        threshold_percentile=0.95,
    )
    gy, gx = _grid_dims(spark)
    res = track_events(det.extremes, nx=NX, grid_y=gy, grid_x=gx)
    events = res.events.cache()
    n_events = events.select("event_id").distinct().count()
    print(f"tracked {n_events} events on the {NY}x{NX} flagship grid")

    # anomalies for ONE month (keeps the collect per frame small and the
    # animation short); checkpointed to parquet so the per-frame plans
    # re-read a materialised source instead of re-running detect
    anom_path = f"{out}/_anomaly_slice"
    (
        det.extremes.selectExpr("time", "y", "x", "anomaly AS value")
        .filter("time >= '1995-01-01' AND time < '1995-02-01'")
        .write.mode("overwrite").parquet(anom_path)
    )
    anom = spark.read.parquet(anom_path)
    times = sorted(r[0] for r in anom.select("time").distinct().collect())
    print(f"rendering {len(times)} timesteps")

    # ---- single_plot / multi_plot / id_plot ---------------------------
    pl = GriddedPlotter(anom, ny=NY, nx=NX)
    clim = pl.clim_robust(issym=True)  # symmetric robust limits, one pass
    print("wrote", pl.single_plot(times[0], f"{out}/anomaly.png",
                                  clim=clim, cmap="rdbu_r", scale=8))
    print("wrote", pl.multi_plot(times[:4], f"{out}/anomaly_grid.png",
                                 clim=clim, cmap="rdbu_r", scale=8))

    # the revenue-driven flagship signal makes some timesteps one
    # full-grid event — pick the most event-DIVERSE timesteps so the
    # categorical palette actually shows structure
    from pyspark.sql import functions as F

    ev_times = [
        r["time"]
        for r in events.groupBy("time")
        .agg(F.countDistinct("event_id").alias("ids"))
        .orderBy(F.desc("ids"), "time")
        .limit(30)
        .collect()
    ]
    ep = GriddedPlotter(events, ny=NY, nx=NX, value_col="event_id")
    print("wrote", ep.id_plot(ev_times[0], f"{out}/events.png", scale=8))

    # ---- animate: ONE playable file each ------------------------------
    print("wrote", pl.animate_apng(f"{out}/anomaly.apng", fps=8,
                                   clim=clim, cmap="rdbu_r", scale=8))

    # event-ID animation straight from the data layer: same categorical
    # palette as id_plot, an event keeps its colour across frames
    from marex_spark.viz import event_snapshot

    def id_frames():
        for t in sorted(ev_times):
            g = event_snapshot(events, t, NY, NX, id_col="event_id")
            yield upscale(render_id_field(g), 8)

    print("wrote", write_apng(id_frames(), f"{out}/events.apng", fps=6))
    print("output dir:", out)
    spark.stop()


if __name__ == "__main__":
    main()
