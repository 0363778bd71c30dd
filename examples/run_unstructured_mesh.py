#!/usr/bin/env python
"""Unstructured-mesh tracking + visualisation (the Spark form of the
reference's "unstructured data" notebooks: ICON-style cell meshes,
reference track.py:122-129 mesh mode): a boolean extreme field on a
cell mesh, tracked through the same facade — mesh morphology over the
edge table, per-time labelling on the induced subgraph, split/merge
resolution with spherical (haversine) centroid partitioning — then
rendered by the distributed mesh→raster regrid plotter.

The mesh here is a lat/lon point cloud with relational neighbour
edges (a stand-in for a real mesh's topology file — at production the
edge table comes straight from the mesh definition, e.g. an ICON grid
file ingested once).

Run: python examples/run_unstructured_mesh.py [out_dir]
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import marex_spark as mx
from marex_spark.render import UnstructuredPlotter


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mx_mesh_")
    os.makedirs(out, exist_ok=True)
    spark = mx.get_spark("example-mesh")

    # ---- mesh: 20x40 points over a 40-degree box, 8-neighbour edges
    NYM, NXM = 20, 40
    cells = spark.range(NYM * NXM).select(
        F.col("id").alias("cell"),
        (10.0 + (F.col("id") / NXM).cast("int") * 1.0).alias("lat"),
        (100.0 + (F.col("id") % NXM) * 1.0).alias("lon"),
    )
    a = cells.select(F.col("cell").alias("c"), "lat", "lon")
    b = cells.select(F.col("cell").alias("n"), F.col("lat").alias("nlat"),
                     F.col("lon").alias("nlon"))
    edges = (
        a.crossJoin(b)
        .filter(
            (F.abs(F.col("lat") - F.col("nlat")) <= 1.0)
            & (F.abs(F.col("lon") - F.col("nlon")) <= 1.0)
            & (F.col("c") < F.col("n"))
        )
        .select(F.col("c").alias("cell"), F.col("n").alias("nbr"))
    )

    # ---- field: two blobs drifting east over 24 days; they collide
    days = spark.range(24).select(F.col("id").alias("t"))
    field = (
        days.crossJoin(cells)
        .withColumn(
            "extreme",
            (
                (F.abs(F.col("lat") - 20.0) <= 3.0)
                & (F.abs(F.col("lon") - (104.0 + F.col("t") * 0.9)) <= 3.0)
            )
            | (
                (F.abs(F.col("lat") - 20.0) <= 2.5)
                & (F.abs(F.col("lon") - (118.0 + F.col("t") * 0.2)) <= 2.5)
            ),
        )
        .select(
            F.expr("timestamp'2020-06-01' + make_interval(0,0,0,t,0,0,0)").alias("time"),
            "cell",
            "extreme",
        )
    )

    trk = mx.tracker(
        field,
        unstructured_grid=True,
        edges=edges,
        cell_geo=cells,
        R_fill=1,
        T_fill=2,
        area_filter_quartile=0.0,
        allow_merging=True,
        coordinate_units="degrees",  # regional mesh: no auto-detect
    )
    res = trk.run()
    events = res.events
    n_events = events.select("event_id").distinct().count()
    ledger = res.extras.get("merge_ledger")
    n_merges = ledger.count() if ledger is not None else 0
    print(f"mesh run: {n_events} events, {n_merges} recorded merges")

    # ---- visualise: regrid the mesh events to a raster and render
    ev_vals = events.withColumn("value", F.col("event_id").cast("double"))
    pl = UnstructuredPlotter(
        ev_vals, cells, ny=80, nx=160, extent=(10.0, 30.0, 100.0, 140.0)
    )
    times = sorted(r[0] for r in events.select("time").distinct().collect())
    for i, t in enumerate([times[0], times[len(times) // 2], times[-1]]):
        p = pl.single_plot(t, f"{out}/mesh_events_{i}.png", scale=4, fill=False)
        print("wrote", p)
    print("output dir:", out)
    spark.stop()


if __name__ == "__main__":
    main()
