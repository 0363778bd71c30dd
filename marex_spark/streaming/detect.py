"""Streaming extreme detection (SURVEY §2.10).

Batch trains the reference model (climatology + thresholds, SURVEY
A1/A5-A7); the stream scores: each arriving (time, cell, value) row is
joined against the broadcast (doy, cell) state and flagged. This is
the Structured-Streaming form of identify_extremes (reference
detect.py:1119-1503) — a stream-static broadcast join, fully
incremental, no stream-side shuffle for the scoring itself.

``streaming_area_history`` is the A8 aggregate as a watermarked
tumbling-window count — the standard late-data-tolerant streaming
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_stream(
    stream: DataFrame,
    climatology: DataFrame,
    thresholds: DataFrame,
    keys: tuple[str, ...] = ("y", "x"),
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Score a stream of observations against batch-built state.

    climatology: (doy, *keys, clim); thresholds: (*keys, threshold) or
    (doy, *keys, threshold). Both are static (batch) DataFrames —
    Spark plans stream-static joins as broadcast against the streaming
    side, so each micro-batch is a map-only scoring pass.
    """
    d = stream.withColumn("doy", F.dayofyear(time_col))
    clim_keys = [c for c in climatology.columns if c != "clim"]
    thr_keys = [c for c in thresholds.columns if c != "threshold"]
    scored = (
        d.join(F.broadcast(climatology), clim_keys)
        .withColumn("anomaly", (F.col(value_col) - F.col("clim")).cast("double"))
        .join(F.broadcast(thresholds), thr_keys)
        .withColumn("extreme", F.col("anomaly") >= F.col("threshold"))
    )
    return scored


def streaming_area_history(
    scored: DataFrame,
    window: str = "1 day",
    watermark: str = "2 days",
    time_col: str = "time",
) -> DataFrame:
    """A8 (track.py:1499-1518) as a streaming aggregate: extreme-cell
    count per event-time window, tolerating late rows up to the
    watermark. Append-mode compatible (closed windows emit once)."""
    return (
        scored.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"))
        .agg(
            F.sum(F.when(F.col("extreme"), 1).otherwise(0)).alias("n_extreme_cells"),
            F.count("*").alias("n_cells"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_extreme_cells",
            "n_cells",
        )
    )
