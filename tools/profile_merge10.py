"""Phase-level profile of the track_merge_parallel_10x bench row.

Replicates bench.py's merge10 shape (30-year daily series, 40x80
grid at sf0.1) and times each pipeline phase separately so perf work
targets the real hot spot instead of the aggregate row.

Usage: python tools/profile_merge10.py [sf] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from pyspark.sql import functions as F

    from marex_spark.session import get_spark

    spark = get_spark(app_name="profile_merge10", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    from marex_spark.operators.detect_blocked import detect_extremes_blocked
    from marex_spark.operators.label import label_components
    from marex_spark.operators.merge import split_merge_events_parallel
    from marex_spark.operators.overlap import (
        filter_overlap_fraction,
        object_areas,
        overlap_pairs,
    )
    from marex_spark.operators.components import (
        connected_components_driver,
        remap_ids_sparse,
    )
    from marex_spark.sources.synthetic import synthetic_sst_gridded

    n_years = max(3, int(round(300 * sf)))
    ny, nx = (40, 80) if sf >= 0.05 else (20, 40)
    path = f"/tmp/marex_prof_merge10_sf{sf}"
    series = synthetic_sst_gridded(spark, n_years=n_years, ny=ny, nx=nx)
    ext = detect_extremes_blocked(series).withColumn("extreme", F.lit(True))
    ext.write.mode("overwrite").parquet(path)
    spark.catalog.clearCache()

    for rep in range(reps):
        phases: list[tuple[str, float]] = []
        t0 = time.time()

        ext = spark.read.parquet(path)
        labels = label_components(ext, nx=nx)
        n = labels.count()  # checkpointed inside; count forces nothing new
        phases.append(("label_components", time.time() - t0))
        t0 = time.time()

        labels2, ledger = split_merge_events_parallel(
            labels, nx=nx, overlap_threshold=0.5, labels_materialized=True
        )
        labels2.write.mode("overwrite").format("noop").save()
        phases.append(("split_merge_parallel", time.time() - t0))
        from marex_spark.operators.merge import (
            LAST_PARALLEL_ROUNDS,
            LAST_PARALLEL_TIMINGS,
            _PARALLEL_STALE_LOG,
        )

        print(
            f"  resolver rounds={LAST_PARALLEL_ROUNDS} "
            f"stale_log={_PARALLEL_STALE_LOG} sections:"
        )
        for k, v in LAST_PARALLEL_TIMINGS.items():
            print(f"    {k:22s} {v:6.2f}s")
        t0 = time.time()

        pairs = overlap_pairs(labels2, keys=("y", "x"), time_col="time")
        areas = object_areas(labels2, time_col="time")
        pairs = filter_overlap_fraction(pairs, areas, 0.5)
        mapping = connected_components_driver(
            pairs, labels2, compact=False, include_singletons=False
        )
        events = remap_ids_sparse(labels2, mapping)
        events.write.mode("overwrite").format("noop").save()
        phases.append(("link+remap+write", time.time() - t0))

        total = sum(p[1] for p in phases)
        print(f"rep {rep}: cells={n} total={total:.2f}s")
        for name, secs in phases:
            print(f"  {name:22s} {secs:6.2f}s  {100*secs/total:5.1f}%")
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
