#!/usr/bin/env python
"""Detect marine extremes end-to-end (the Spark form of the reference's
"batch jobs/run_detect.py": shifting-baseline anomalies + Hobday
day-of-year thresholds), on the synthetic SST grid.

Two equivalent paths are shown:
  1. the fully relational pipeline (preprocess_data — Catalyst plans,
     one shuffle by cell), and
  2. the packed kernel fast path (pack_gridded → mapInArrow numpy
     kernel per latitude band) — identical cells, compiled-array speed.

Run: python examples/run_detect.py [out_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tempfile

from pyspark.sql import functions as F

import marex_spark as mx


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mx_detect_")
    spark = mx.get_spark("example-detect")

    from marex_spark.sources.synthetic import synthetic_sst_gridded

    sst = synthetic_sst_gridded(spark, n_years=8, ny=40, nx=80)

    # -- 1. relational pipeline ------------------------------------
    det = mx.preprocess_data(
        sst,
        method_anomaly="shifting_baseline",
        method_extreme="hobday_extreme",
        method_percentile="histogram",
        threshold_percentile=0.95,
        window_year_baseline=5,
        smooth_days=21,
        window_days_hobday=11,
    )
    n_extreme = det.extremes.filter(F.col("extreme")).count()
    print(f"relational: {n_extreme} extreme cell-days")
    det.extremes.filter(F.col("extreme")).write.mode("overwrite").parquet(
        f"{out}/extremes"
    )
    det.unpersist()

    # -- 2. packed kernel fast path --------------------------------
    packed = mx.pack_gridded(sst, nx=80)
    cells = mx.detect_extremes_blocked_packed(
        packed,
        method_anomaly="shifting_baseline",
        method_extreme="hobday_extreme",
        method_percentile="histogram",
        threshold_percentile=0.95,
    )
    print(f"packed kernel: {cells.count()} extreme cell-days")
    print(f"outputs under {out}")
    spark.stop()


if __name__ == "__main__":
    main()
