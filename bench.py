#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {...}, "sf": 0.1}

Execution is forced through the no-op sink (full pipeline runs JVM-side,
no driver collect overhead). The headline set covers the heavy paths:
scan+agg (tpch_q1), the overlap self-join (j5), the shifting-baseline
fan-out (a2), histogram quantile (a5), dedup LSH, ANN top-k, a window
sweep (w1), plus the flagship detect→track slice on a synthetic grid.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "tpch_q1",
    "tpch_q5_local_supplier",
    "j5_temporal_selfjoin",
    "a2_shifting_climatology",
    "a5_histogram_quantile",
    "a7_doy_window_percentile",
    "w1_rolling_mean",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_cosine_topk_fast",
    "txt_quality_score",
    "sess_sessionize",
]


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else 0.0


def _force(df) -> int:
    """Execute the full plan JVM-side; count() is cheap relative to the
    pipelines and matches what the driver's verify does."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    from marex_spark.session import get_spark
    from marex_spark.queries import QUERIES

    spark = get_spark(app_name="marex-bench", cores=int(CPUS))
    sf = _sf_from_dir(SF_DIR)

    # Warm the JVM, parquet footers, and Python UDF workers outside the
    # timed region.
    from marex_spark.sources.parquet import load_table

    load_table(spark, SF_DIR, "lineitem").count()
    _force(
        spark.range(1000)
        .selectExpr("id", "id % 7 AS g")
        .groupBy("g")
        .applyInPandas(lambda p: p, "id long, g bigint")
    )
    # warm the full detect→track code path (JIT, codegen, UDF workers,
    # broadcast machinery) on a toy grid so timed runs are steady-state
    from marex_spark.pipeline import detect_track_bench

    detect_track_bench(spark, 0.001)

    def timed(fn) -> float:
        """Min of 2 runs — the box hosts other tenants and transient
        co-load otherwise lands on whichever query it overlaps."""
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        timings[name] = timed(lambda: _force(fn(spark, SF_DIR)))

    # Flagship detect→track on a synthetic gridded series scaled with sf:
    # sf0.1 → 3 years of daily 40×80 (~3.5M cell-days).
    timings["detect_track"] = timed(
        lambda: (detect_track_bench(spark, sf), spark.catalog.clearCache())
    )

    # blocked (dense numpy per latitude band) fast path — same
    # semantics, chunk-kernel physical strategy (detect_blocked.py)
    from marex_spark.operators.detect_blocked import detect_track_blocked

    timings["detect_track_blocked"] = timed(
        lambda: (detect_track_blocked(spark, sf), spark.catalog.clearCache())
    )

    # the reference's heaviest published config (BASELINE.md row 3):
    # shifting-baseline climatology + hobday per-doy threshold
    timings["detect_track_shifting_hobday"] = timed(
        lambda: (
            detect_track_bench(
                spark,
                sf,
                method_anomaly="shifting_baseline",
                method_extreme="hobday_extreme",
            ),
            spark.catalog.clearCache(),
        )
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
