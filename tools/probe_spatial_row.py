"""Isolated probe of the detect_only_shifting_hobday_spatial bench row:
same fixture and call as bench.py, timed N reps with a single-thread
DRAM-stream probe before each rep so weather is visible per sample.

Usage: python tools/probe_spatial_row.py [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from marex_spark.session import get_spark

    spark = get_spark(app_name="probe_spatial", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    from marex_spark.operators.detect_blocked import (
        bench_grid_size,
        detect_extremes_blocked_packed,
        materialize_packed_bench,
    )

    sf = 0.1
    path = "/tmp/marex_probe_packed_shift"
    materialize_packed_bench(spark, sf, path, n_years=8)
    _, ny, _ = bench_grid_size(sf)

    mem_buf = np.zeros(1 << 28, dtype=np.uint8)
    for rep in range(reps):
        t0 = time.perf_counter()
        float(mem_buf.sum())
        mem = time.perf_counter() - t0
        t0 = time.perf_counter()
        cells = detect_extremes_blocked_packed(
            spark.read.parquet(path),
            method_percentile="histogram",
            method_anomaly="shifting_baseline",
            method_extreme="hobday_extreme",
            window_spatial_hobday=5,
            ny=ny,
        )
        cells.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        print(f"rep {rep}: mem_probe={mem:.3f}s spatial_row={dt:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
