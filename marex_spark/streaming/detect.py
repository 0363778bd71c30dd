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


def write_threshold_state(
    climatology: DataFrame,
    thresholds: DataFrame,
    path: str,
) -> None:
    """Persist the batch-built scoring state PARTITIONED BY doy — the
    100 TB form of the stream-static state. A hobday threshold table is
    366 × n_cells rows; at 1M cells that is ~3 GB, too big to broadcast
    into every micro-batch task. Partitioned by doy, a micro-batch
    (which spans a handful of calendar days) prunes to just its own
    doy partitions — MBs, broadcastable again.

    Join contract: EVERY non-``threshold`` column of ``thresholds``
    is a join key against ``climatology`` (doy, *keys, clim) — the
    same convention :func:`score_stream` uses. The two are joined once
    here so scoring reads ONE state table; a doy-free (global_extreme)
    threshold fans out to all 366 partitions of its climatology
    doy."""
    state = climatology.join(
        thresholds, [c for c in thresholds.columns if c != "threshold"]
    )
    (
        state.repartition("doy")
        .write.mode("overwrite")
        .partitionBy("doy")
        .parquet(path)
    )


def score_stream_partitioned(
    stream: DataFrame,
    state_path: str,
    sink,
    keys: tuple[str, ...] = ("y", "x"),
    time_col: str = "time",
    value_col: str = "value",
):
    """Scale path for :func:`score_stream`: score each micro-batch
    against doy-PARTITIONED state with per-batch partition pruning.

    ``foreachBatch`` turns every micro-batch into a normal batch job,
    where filtering the partitioned state on the batch's own doys is
    static partition pruning — the scan reads only those doy
    directories, and the pruned slice (n_cells × ~2 doys) broadcasts.
    Memory per task is bounded by cells-per-doy regardless of how many
    doys the full state covers.

    ``sink(scored_df, batch_id)`` receives the scored batch (same
    schema as score_stream's output). Returns the started query's
    writer (call ``.start()`` yourself for checkpoint/location opts)."""

    def _score_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        d = batch_df.withColumn("doy", F.dayofyear(time_col))
        doys = [r[0] for r in d.select("doy").distinct().collect()]
        if not doys:
            return
        state = spark.read.parquet(state_path).filter(F.col("doy").isin(doys))
        scored = (
            d.join(F.broadcast(state), ["doy", *keys])
            .withColumn(
                "anomaly", (F.col(value_col) - F.col("clim")).cast("double")
            )
            .withColumn("extreme", F.col("anomaly") >= F.col("threshold"))
        )
        sink(scored, batch_id)

    return stream.writeStream.foreachBatch(_score_batch)
