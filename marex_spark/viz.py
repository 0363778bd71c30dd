"""plotX-equivalent data layer (reference plotX/, ~1,500 LoC of
gridded/unstructured plotters + animate, base.py:331-571).

Rendering itself is a client-side concern — the Spark-side work plotX
actually does is data preparation: dense snapshot grids, robust colour
limits, per-event trajectory tables with dateline unwrapping, and
animation frame iterators. Those are implemented here as DataFrame
plans + small collected numpy artifacts; the thin ``plot_*`` wrappers
are import-gated on matplotlib (DependencyError otherwise), mirroring
how the reference degrades without its plot extras.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_grid(
    df: DataFrame,
    time_value,
    ny: int,
    nx: int,
    value_col: str = "value",
    time_col: str = "time",
) -> np.ndarray:
    """One timestep → dense (ny, nx) float array, NaN where absent
    (plotX base.py:331-420 single-field plot input). The filter pushes
    down to the scan; only one slice is collected."""
    rows = (
        df.filter(F.col(time_col) == time_value)
        .select("y", "x", value_col)
        .collect()
    )
    g = np.full((ny, nx), np.nan)
    for r in rows:
        g[r["y"], r["x"]] = r[value_col]
    return g


def event_snapshot(
    events: DataFrame,
    time_value,
    ny: int,
    nx: int,
    time_col: str = "time",
    id_col: str = "event_id",
) -> np.ndarray:
    """One timestep of labelled events → int (ny, nx) grid, 0 = no
    event (plotX ID-field plotting)."""
    rows = (
        events.filter(F.col(time_col) == time_value)
        .select("y", "x", id_col)
        .collect()
    )
    g = np.zeros((ny, nx), dtype=np.int64)
    for r in rows:
        g[r["y"], r["x"]] = r[id_col]
    return g


def clim_robust_limits(
    df: DataFrame, value_col: str = "value", q: tuple = (0.02, 0.98)
) -> tuple:
    """Robust colour limits (reference base.py:559-571 clim_robust):
    one aggregation job, two quantiles."""
    row = df.agg(
        F.percentile(value_col, F.lit(q[0])).alias("lo"),
        F.percentile(value_col, F.lit(q[1])).alias("hi"),
    ).first()
    return float(row.lo), float(row.hi)


def trajectories(
    timestep_stats: DataFrame,
    time_col: str = "time",
    id_col: str = "event_id",
    lon_col: str = "centroid_lon",
    lat_col: str = "centroid_lat",
) -> DataFrame:
    """Per-event centroid paths with the longitude UNWRAPPED (plotX
    trajectory plotting; dateline-crossing events otherwise draw a
    360° jump): per event ordered by time, a jump > 180° adds a ±360°
    correction carried forward by a running sum — two window functions,
    no UDF."""
    w = Window.partitionBy(id_col).orderBy(time_col)
    dlon = F.col(lon_col) - F.lag(lon_col).over(w)
    step = (
        F.when(dlon > 180.0, F.lit(-360.0))
        .when(dlon < -180.0, F.lit(360.0))
        .otherwise(F.lit(0.0))
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return timestep_stats.select(
        id_col,
        time_col,
        F.col(lat_col).alias("lat"),
        (F.col(lon_col) + F.sum(step).over(wsum)).alias("lon_unwrapped"),
    )


def animation_frames(
    df: DataFrame,
    ny: int,
    nx: int,
    value_col: str = "value",
    time_col: str = "time",
):
    """Iterator of (time, dense 2-D array) in time order (plotX
    animate). One collect per frame — the client renders frame-by-
    frame; the plan (incl. any upstream filters) re-executes against
    the materialised source, so callers should checkpoint first."""
    times = [r[0] for r in df.select(time_col).distinct().orderBy(time_col).collect()]
    for t in times:
        yield t, snapshot_grid(df, t, ny, nx, value_col, time_col)


def plot_snapshot(df: DataFrame, time_value, ny: int, nx: int, **imshow_kw):
    """Thin matplotlib wrapper (import-gated, like the reference's
    optional plot extras)."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover
        from marex_spark.exceptions import DependencyError

        raise DependencyError(
            "plot_snapshot needs matplotlib",
            suggestions=["pip install matplotlib", "use snapshot_grid + your renderer"],
        ) from e
    g = snapshot_grid(df, time_value, ny, nx)  # pragma: no cover
    fig, ax = plt.subplots()  # pragma: no cover
    im = ax.imshow(g, origin="lower", **imshow_kw)  # pragma: no cover
    fig.colorbar(im, ax=ax)  # pragma: no cover
    return fig  # pragma: no cover
