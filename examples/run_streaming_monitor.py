#!/usr/bin/env python
"""Operational streaming monitor: a batch job trains the detection
state (day-of-year climatology + extreme thresholds), then a
Structured-Streaming query scores newly-arriving observation files
against it — the streaming form of the reference's daily
identify_extremes cycle (detect.py:1119-1503), plus a watermarked
daily extreme-area aggregate (A8) and a doy-partitioned state variant
whose per-batch scans prune to the arriving days' partitions (the 1M+
cell scale path, see streaming/detect.py::score_stream_partitioned).

Everything is a stream-static broadcast join — scoring adds NO
stream-side shuffle, so each micro-batch is a map-only pass however
wide the cluster is.

Run: python examples/run_streaming_monitor.py [work_dir]
"""

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import marex_spark as mx
from marex_spark.sources.synthetic import synthetic_sst_gridded
from marex_spark.streaming.detect import (
    score_stream,
    score_stream_partitioned,
    streaming_area_history,
    write_threshold_state,
)


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mx_stream_")
    spark = mx.get_spark("example-streaming-monitor")

    # ------ 1. batch training: three years of history -> scoring state
    history = synthetic_sst_gridded(spark, n_years=3, ny=10, nx=20)
    det = mx.preprocess_data(history, method_percentile="exact")
    clim = det.extremes.select("doy", "y", "x", "clim").dropDuplicates(
        ["doy", "y", "x"]
    )
    thresholds = det.thresholds
    det.unpersist()

    # ------ 2. "arriving" observations: the next 60 days land as files
    src = f"{work}/incoming"
    arriving = synthetic_sst_gridded(spark, n_years=1, ny=10, nx=20,
                                     start="2003-01-01")
    arriving = arriving.filter(F.dayofyear("time") <= 60)
    arriving.write.mode("overwrite").parquet(src)

    # ------ 3. stream: score + flag, append extreme cells to a sink
    stream = spark.readStream.schema(arriving.schema).parquet(src)
    scored = score_stream(stream, clim, thresholds)
    q = (
        scored.filter(F.col("extreme"))
        .writeStream.format("parquet")
        .option("path", f"{work}/extreme_cells")
        .option("checkpointLocation", f"{work}/ckpt_cells")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.read.parquet(f"{work}/extreme_cells").count()
    print(f"scored stream: {n} extreme cell-days appended")

    # ------ 4. watermarked daily extreme-area history (A8, late-tolerant)
    hist_q = (
        streaming_area_history(
            score_stream(
                spark.readStream.schema(arriving.schema).parquet(src),
                clim,
                thresholds,
            ),
            window="1 day",
            watermark="2 days",
        )
        .writeStream.format("memory")
        .queryName("area_history")
        .outputMode("append")
        .option("checkpointLocation", f"{work}/ckpt_area")
        .trigger(availableNow=True)
        .start()
    )
    hist_q.awaitTermination()
    top = spark.sql(
        "SELECT * FROM area_history ORDER BY n_extreme_cells DESC LIMIT 5"
    )
    print("peak extreme-area days:")
    for r in top.collect():
        print("  ", r)

    # ------ 5. scale path: doy-PARTITIONED state, per-batch pruning
    state_path = f"{work}/state_by_doy"
    write_threshold_state(clim, thresholds, state_path)
    rows = {"n": 0}

    def sink(batch_df, batch_id):
        rows["n"] += batch_df.filter(F.col("extreme")).count()

    pq = score_stream_partitioned(
        spark.readStream.schema(arriving.schema).parquet(src),
        state_path,
        sink,
    )
    q3 = (
        pq.option("checkpointLocation", f"{work}/ckpt_part")
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination()
    print(f"partitioned-state path: {rows['n']} extreme cell-days "
          f"(scans pruned to the batch's doy partitions)")

    spark.stop()
    if len(sys.argv) <= 1:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
