#!/usr/bin/env python
"""Regional tracking + visualisation (the Spark form of the reference's
"regional data" notebooks 01-03 and plotX accessor): a NON-global
domain — no periodic longitude seam — tracked with the
``regional_tracker`` facade (explicit coordinate units, absolute area
floor; reference track.py:5471-5560), then rendered to PNGs with the
stdlib plotting layer (render.py: numpy colormap LUT + PNG encoder —
no matplotlib needed).

Run: python examples/run_regional_visualise.py [out_dir]
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import marex_spark as mx
from marex_spark.render import GriddedPlotter, plotX
from marex_spark.sources.synthetic import synthetic_extremes_gridded


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mx_region_")
    os.makedirs(out, exist_ok=True)
    spark = mx.get_spark("example-regional")

    # A regional domain (e.g. a Mediterranean-style box): 30 timesteps
    # of clumped boolean extremes on a 24x48 grid. Regional mode means
    # x=0 and x=47 are genuine coastlines, not a periodic seam.
    ny, nx = 24, 48
    field = synthetic_extremes_gridded(spark, n_time=30, ny=ny, nx=nx, density=0.08)

    trk = mx.regional_tracker(
        field,
        coordinate_units="degrees",
        R_fill=2,
        area_filter_absolute=4.0,   # drop objects under 4 cells
        T_fill=2,
        allow_merging=True,
        ny=ny,
        nx=nx,
    )
    res = trk.run()
    events = res.events
    n_events = events.select("event_id").distinct().count()
    ledger = res.extras.get("merge_ledger")
    n_merges = ledger.count() if ledger is not None else 0
    print(f"regional run: {n_events} events, {n_merges} recorded merges")

    # ---- visualise: event-ID snapshots + an extreme-density map
    times = sorted(r[0] for r in events.select("time").distinct().collect())
    pl = GriddedPlotter(events, ny=ny, nx=nx, value_col="event_id")
    for i, t in enumerate(times[:3]):
        p = pl.id_plot(t, f"{out}/events_{i}.png", scale=8)
        print("wrote", p)

    density = (
        events.groupBy("y", "x")
        .agg(F.count("*").cast("double").alias("value"))
        .withColumn("time", F.lit(times[0]).cast("timestamp"))
    )
    dp = plotX(density, ny=ny, nx=nx)
    p = dp.single_plot(times[0], f"{out}/event_density.png", cmap="viridis", scale=8)
    print("wrote", p)
    print("output dir:", out)
    spark.stop()


if __name__ == "__main__":
    main()
