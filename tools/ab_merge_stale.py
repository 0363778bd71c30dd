"""A/B the parallel-merge stale-round placement: driver fast path vs
forced-distributed stale rounds.

Builds the merge10 fixture once, then interleaves arms in ONE process
(same JVM, same page cache): arm D = driver fast path as shipped
(PARALLEL_STALE_DRIVER_CELLS=4M), arm X = stale rounds stay distributed
(threshold 0). Reports per-rep resolver section timings and the min per
arm — min over interleaved reps is the only statistic that survives
this box's ambient weather.

Usage: python tools/ab_merge_stale.py [sf] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from marex_spark.session import get_spark

    spark = get_spark(app_name="ab_merge_stale", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    import marex_spark.operators.merge as M
    from marex_spark.operators.detect_blocked import detect_extremes_blocked
    from marex_spark.operators.label import label_components
    from marex_spark.sources.synthetic import synthetic_sst_gridded

    n_years = max(3, int(round(300 * sf)))
    ny, nx = (40, 80) if sf >= 0.05 else (20, 40)
    path = f"/tmp/marex_ab_stale_sf{sf}"
    series = synthetic_sst_gridded(spark, n_years=n_years, ny=ny, nx=nx)
    ext = detect_extremes_blocked(series).withColumn("extreme", F.lit(True))
    ext.write.mode("overwrite").parquet(path)
    spark.catalog.clearCache()

    arms = {"D": 4_000_000, "X": 0}
    results: dict[str, list[float]] = {k: [] for k in arms}

    for rep in range(reps):
        for arm, thresh in arms.items():
            M.PARALLEL_STALE_DRIVER_CELLS = thresh
            ext = spark.read.parquet(path)
            labels = label_components(ext, nx=nx)
            labels.count()
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"ab_stale {arm} rep{rep}")
            labels2, ledger = M.split_merge_events_parallel(
                labels, nx=nx, overlap_threshold=0.5, labels_materialized=True
            )
            labels2.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            results[arm].append(dt)
            print(
                f"rep {rep} arm {arm}: {dt:6.2f}s  rounds={M.LAST_PARALLEL_ROUNDS} "
                f"stale_log={M._PARALLEL_STALE_LOG}"
            )
            for k, v in M.LAST_PARALLEL_TIMINGS.items():
                print(f"    {k:22s} {v:6.2f}s")
            spark.catalog.clearCache()

    for arm, ts in results.items():
        print(f"arm {arm}: min={min(ts):.2f}s  all={[round(t,2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
