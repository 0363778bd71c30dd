#!/usr/bin/env python
"""End-to-end detect → track → render job CLI: the reference's user
workflow (preprocess_data → tracker.run() → da.plotX.animate,
README.md:43-60 + plotX/base.py:408) as one Spark job over a packed
parquet store, rendering every timestep's event field to PNG frames
distributed (no matplotlib needed — marex_spark/render.py).

Usage:
    python tools/render_animation.py PACKED_PARQUET OUT_DIR \
        [--ny N] [--mode value|events] [--scale K]

``--mode value`` renders the anomaly input field; ``events`` (default)
runs the full pipeline and renders labelled event ids with the stable
categorical palette (an event keeps its colour across frames).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    src, out_dir = sys.argv[1:3]
    mode = "events"
    scale = 4
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
    if "--scale" in sys.argv:
        scale = int(sys.argv[sys.argv.index("--scale") + 1])

    from pyspark.sql import functions as F

    from marex_spark.operators.detect_blocked import (
        detect_extremes_blocked_packed,
    )
    from marex_spark.operators.track import track_events
    from marex_spark.render import render_frames_distributed
    from marex_spark.session import get_spark
    from marex_spark.viz import clim_robust_limits

    spark = get_spark("render_animation")
    packed = spark.read.parquet(src)
    nx = packed.selectExpr("max(size(vals)) AS n").first().n
    long_df = packed.select(
        "time", "y", F.posexplode("vals").alias("x", "value")
    ).filter(~F.isnan("value"))
    ny = long_df.agg(F.max("y")).first()[0] + 1

    if mode == "value":
        lo, hi = clim_robust_limits(long_df)
        frames = render_frames_distributed(
            long_df, out_dir, ny=ny, nx=nx, clim=(lo, hi), scale=scale
        )
    else:
        cells = detect_extremes_blocked_packed(packed)
        res = track_events(
            cells.withColumn("extreme", F.lit(True)),
            nx=nx,
            compute_stats=False,
        )
        # id field rendered through the value path with the categorical
        # palette applied per event id via render_frames' clim on ids
        from marex_spark.render import (  # local import keeps CLI lean
            render_id_field,
            upscale,
            write_png,
        )
        import numpy as np
        import pandas as pd

        os.makedirs(out_dir, exist_ok=True)

        def _render(pdf: "pd.DataFrame") -> "pd.DataFrame":
            t = pdf["time"].iloc[0]
            g = np.zeros((ny, nx), dtype=np.int64)
            g[pdf["y"].to_numpy(), pdf["x"].to_numpy()] = pdf[
                "event_id"
            ].to_numpy()
            rgb = render_id_field(g)
            if scale > 1:
                rgb = upscale(rgb, scale)
            stamp = str(t).replace(" ", "_").replace(":", "-")
            path = os.path.join(out_dir, f"frame_{stamp}.png")
            write_png(rgb, path)
            return pd.DataFrame({"time": [t], "path": [path]})

        tt = res.events.schema["time"].dataType.simpleString()
        frames = [
            (r.time, r.path)
            for r in res.events.select("time", "y", "x", "event_id")
            .groupBy("time")
            .applyInPandas(_render, schema=f"time {tt}, path string")
            .orderBy("time")
            .collect()
        ]
    print(f"rendered {len(frames)} frames to {out_dir}")


if __name__ == "__main__":
    main()
