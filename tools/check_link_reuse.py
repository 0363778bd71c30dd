"""Runtime check: does AQE reuse the object_areas aggregate that
filter_overlap_fraction broadcasts twice (a_t / a_n), and what does the
link phase's executed plan look like? Prints the FINAL adaptive plan
(isFinalPlan=true) of the pairs filter — ReusedExchange / reused query
stages appear there, not in the static explain.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from marex_spark.operators.detect_blocked import detect_extremes_blocked
    from marex_spark.operators.label import label_components
    from marex_spark.operators.overlap import (
        filter_overlap_fraction,
        object_areas,
        overlap_pairs,
    )
    from marex_spark.session import get_spark
    from marex_spark.sources.synthetic import synthetic_sst_gridded

    spark = get_spark(app_name="check_link_reuse", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    series = synthetic_sst_gridded(spark, n_years=3, ny=20, nx=40)
    ext = detect_extremes_blocked(series).withColumn("extreme", F.lit(True))
    labels = label_components(ext, nx=40)

    pairs = overlap_pairs(labels, keys=("y", "x"), time_col="time")
    areas = object_areas(labels, time_col="time")
    kept = filter_overlap_fraction(pairs, areas, 0.5)
    kept.write.format("noop").mode("overwrite").save()
    plan = kept._jdf.queryExecution().executedPlan().toString()
    n_reuse = plan.count("ReusedExchange")
    n_bcast = plan.count("BroadcastExchange")
    n_agg_scan = plan.count("HashAggregate")
    print(f"ReusedExchange={n_reuse} BroadcastExchange={n_bcast} HashAggregate={n_agg_scan}")
    print(plan[:4000])
    spark.stop()


if __name__ == "__main__":
    main()
