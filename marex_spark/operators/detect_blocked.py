"""Blocked (dense-array) detect fast path.

The relational detect (operators/detect.py) is the semantic reference —
every stage oracle-checked, fully declarative. For dense regular grids
its long-format rows pay per-row engine overhead that the reference's
per-chunk numpy kernels (detect.py:2365-2373, 2887-2915 vectorised over
dask chunks) never see. This module is the same chunk model expressed
Spark-natively: hash-partition by latitude band (one shuffle — the same
layout the relational path uses), then run the entire
climatology→anomaly→threshold→compare chain as ONE vectorised numpy
kernel per band inside ``applyInPandas``. Arrow moves each band's
(time × nx) block in a single batch; output is only the sparse extreme
cells, which is exactly what tracking consumes.

Semantics match ``preprocess_data`` (fixed_baseline anomaly; exact or
count-interpolated-histogram global threshold) — asserted cell-for-cell
against the relational path in tests/test_detect_blocked.py.

Scale: a 0.25° global decade is 720 bands × (3650 × 1440) floats
≈ 21 MB per band — hundreds of independent 20 MB kernels across the
cluster, the same arithmetic the reference runs per dask chunk.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _time_unit(ts_type) -> tuple[str, bool]:
    """(numpy datetime64 unit, is_date) for an arrow temporal type —
    int64-cast values are in this unit (date32 → days, timestamp → its
    unit). Dates are timezone-free; timestamps are UTC instants."""
    import pyarrow as pa

    if pa.types.is_date32(ts_type):
        return "D", True
    if pa.types.is_date64(ts_type):
        return "ms", True
    if pa.types.is_timestamp(ts_type):
        return ts_type.unit, False
    raise TypeError(f"unsupported time column type: {ts_type}")


def _doy_of(ut: np.ndarray, unit: str, is_date: bool, tz: str) -> np.ndarray:
    """0-based day-of-year per unique time, matching the relational
    path's F.dayofyear: timestamps are UTC instants interpreted in the
    SESSION timezone (Spark extracts date parts in
    spark.sql.session.timeZone — raw epoch math would shift samples
    near midnight into the wrong day for non-UTC sessions); dates are
    timezone-free."""
    idx = pd.DatetimeIndex(
        ut.astype(f"datetime64[{unit}]").astype("datetime64[us]")
    )
    if not is_date and tz and tz.upper() != "UTC":
        idx = idx.tz_localize("UTC").tz_convert(tz)
    return idx.dayofyear.to_numpy() - 1


def _detect_band(
    m: np.ndarray,
    doy_idx: np.ndarray,
    q: float,
    exact: bool,
    precision: float,
    max_anomaly: float,
) -> np.ndarray:
    """Dense kernel for one latitude band: (T × NX) values → boolean
    extremes. Mirrors detect.py:2365-2373 (doy group-mean climatology),
    2887-2899 (exact quantile) / 2737-2865 (histogram count
    interpolation, clamped at the negative bin like detect.py:2708-2732).
    """
    T, NX = m.shape
    n_doy = int(doy_idx.max()) + 1
    # NaN-aware throughout: a (time, x) gap in the band must behave like
    # the relational path (null rows dropped; climatology = mean of the
    # AVAILABLE samples; missing samples are never extreme) instead of
    # silently NaN-poisoning the whole column's climatology + threshold.
    valid = ~np.isnan(m)
    sums = np.zeros((n_doy, NX))
    counts = np.zeros((n_doy, NX))
    np.add.at(sums, doy_idx, np.where(valid, m, 0.0))
    np.add.at(counts, doy_idx, valid.astype(np.float64))
    clim = sums / np.maximum(counts, 1.0)
    anom = m - clim[doy_idx]  # NaN at the gaps, finite elsewhere

    if exact:
        if valid.all():
            thr = np.percentile(anom, q * 100.0, axis=0)
        else:
            thr = np.nanpercentile(anom, q * 100.0, axis=0)
    else:
        n_pos = int(round(max_anomaly / precision))
        safe = np.where(valid, anom, 0.0)
        bins = np.clip(1 + np.floor(safe / precision).astype(np.int64), 1, n_pos + 1)
        bins[safe < 0] = 0
        flat = (bins * NX + np.arange(NX)[None, :])[valid]
        hist = np.bincount(flat.ravel(), minlength=(n_pos + 2) * NX).reshape(
            n_pos + 2, NX
        )
        cdf = hist.cumsum(axis=0)
        target = q * valid.sum(axis=0)  # per-column valid count
        sel = (cdf >= target[None, :]).argmax(axis=0)
        c = hist[sel, np.arange(NX)]
        prev = cdf[sel, np.arange(NX)] - c
        frac = np.clip((target - prev) / np.maximum(c, 1), 0.0, 1.0)
        thr = (sel - 1) * precision + precision * frac
        thr[sel == 0] = 0.0
    with np.errstate(invalid="ignore"):
        return np.where(valid, anom >= thr[None, :], False), thr


def detect_extremes_blocked(
    series: DataFrame,
    threshold_percentile: float = 0.95,
    method_percentile: str = "exact",
    precision: float = 0.01,
    max_anomaly: float = 5.0,
    time_col: str = "time",
    value_col: str = "value",
    assume_band_partitioned: bool = False,
) -> DataFrame:
    """fixed_baseline + global_extreme over the long format, blocked by
    latitude band. Returns ONLY the extreme cells (time, y, x) — sparse,
    ready for label_components(extreme field dense not required).

    ``assume_band_partitioned=True`` skips the band shuffle — only
    valid when every input partition already holds complete bands
    (band-partitioned generation, or a scan of band-bucketed parquet);
    the kernel still groups by y inside each partition, so partial
    bands would silently produce per-fragment climatologies.
    """
    exact = method_percentile == "exact"
    spark = series.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    session_tz = spark.conf.get("spark.sql.session.timeZone", "UTC")

    def _run(batches) -> Iterator:
        # mapInArrow: skip the Arrow→pandas conversion entirely (it
        # measured ~30% of the whole pass-through cost at 37M rows) —
        # numeric columns come out of Arrow as zero-copy-ish numpy,
        # timestamps as int64 micros; only the ~unique times (tiny)
        # ever touch pandas, for the day-of-year computation.
        import pyarrow as pa

        blist = list(batches)
        if not blist or sum(b.num_rows for b in blist) == 0:
            return
        tbl = pa.Table.from_batches(blist).combine_chunks()
        ts_type = tbl.schema.field(time_col).type
        unit, is_date = _time_unit(ts_type)
        y = tbl["y"].to_numpy()
        x = tbl["x"].to_numpy().astype(np.int64, copy=False)
        ts = tbl[time_col].cast(pa.int64()).to_numpy()
        v = tbl[value_col].to_numpy().astype(np.float64, copy=False)
        for band in np.unique(y):
            mask = y == band
            ut, t_idx = np.unique(ts[mask], return_inverse=True)
            ux, x_idx = np.unique(x[mask], return_inverse=True)
            m = np.full((len(ut), len(ux)), np.nan)
            m[t_idx, x_idx] = v[mask]
            doy = _doy_of(ut, unit, is_date, session_tz)
            ext, _ = _detect_band(
                m, doy, threshold_percentile, exact, precision, max_anomaly
            )
            tt, xx = np.nonzero(ext)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ut[tt].astype(f"datetime64[{unit}]")).cast(ts_type),
                    pa.array(np.full(len(tt), band, dtype=np.int32)),
                    pa.array(ux[xx].astype(np.int32)),
                ],
                names=[time_col, "y", "x"],
            )

    time_type = series.schema[time_col].dataType.simpleString()
    out_schema = f"{time_col} {time_type}, y int, x int"
    src = series if assume_band_partitioned else series.repartition(parallelism, "y")
    return src.mapInArrow(_run, schema=out_schema)


def pack_gridded(
    series: DataFrame,
    nx: int,
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Long (time, y, x, value) → packed (time, y, vals array<float>)
    layout (the Spark analogue of the reference's zarr chunks,
    detect.py:535 chunking). Gaps become nulls in the array (→ NaN in
    the kernel, preserving the drop-null semantics). Duplicate
    (time, y, x) rows — overlapping re-ingested regions, double-landed
    files — are resolved deterministically to MAX(value) by a per-cell
    pre-aggregation (the long kernel's last-write-wins is row-order-
    dependent; map_from_entries would otherwise throw
    DUPLICATED_MAP_KEY at runtime). Ingestion jobs should land gridded
    data in this layout once and reuse it — every downstream blocked
    pass then moves plain float arrays through Arrow instead of
    per-cell tuples."""
    dedup = series.groupBy(time_col, "y", "x").agg(
        F.max(value_col).alias(value_col)
    )
    m = F.map_from_entries(F.collect_list(F.struct("x", value_col)))
    idx = F.sequence(F.lit(0), F.lit(nx - 1))
    return (
        dedup.groupBy(time_col, "y")
        .agg(m.alias("m"))
        .select(
            time_col,
            "y",
            F.transform(idx, lambda i: F.element_at(F.col("m"), i)).alias("vals"),
        )
    )


def detect_extremes_blocked_packed(
    packed: DataFrame,
    threshold_percentile: float = 0.95,
    method_percentile: str = "exact",
    precision: float = 0.01,
    max_anomaly: float = 5.0,
    time_col: str = "time",
    output: str = "extremes",
) -> DataFrame:
    """Blocked detect over the PACKED layout (time, y, vals array<float>):
    same kernel and semantics as :func:`detect_extremes_blocked`
    (parity-pinned in tests), but the band matrix is assembled by
    stacking rows' arrays — no per-cell factorize, and the shuffle +
    Arrow transfer carry ×nx fewer rows. This is the SCALE.md "array
    columns end-to-end" lever.

    ``output="thresholds"`` returns the per-cell threshold table
    (y, x, threshold) instead of the sparse extreme cells — the
    reference's thresholds output (detect.py:1119-1203), and the hook
    the oracle gate uses to check the numpy kernel against SQL
    quantile_cont."""
    exact = method_percentile == "exact"
    thresholds = output == "thresholds"
    spark = packed.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    session_tz = spark.conf.get("spark.sql.session.timeZone", "UTC")

    def _run(batches) -> Iterator:
        # mapInArrow: the packed layout's fixed-length list<float>
        # column flattens straight into the (T × NX) band matrix —
        # list offsets are uniform, so the values buffer reshapes with
        # zero per-row work (vs np.stack over an object Series).
        import pyarrow as pa

        blist = list(batches)
        if not blist or sum(b.num_rows for b in blist) == 0:
            return
        tbl = pa.Table.from_batches(blist).combine_chunks()
        ts_type = tbl.schema.field(time_col).type
        unit, is_date = _time_unit(ts_type)
        y = tbl["y"].to_numpy()
        ts = tbl[time_col].cast(pa.int64()).to_numpy()
        vcol = tbl["vals"].combine_chunks()
        widths = np.diff(vcol.offsets.to_numpy())
        if len(widths) and (widths != widths[0]).any():
            from marex_spark.exceptions import DataValidationError

            raise DataValidationError(
                "packed vals arrays must be fixed-length",
                details={"min": int(widths.min()), "max": int(widths.max())},
            )
        nx_w = int(widths[0]) if len(widths) else 0
        flat = vcol.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False
        )
        mat_all = flat.reshape(len(y), nx_w)
        for band in np.unique(y):
            mask = y == band
            order = np.argsort(ts[mask], kind="stable")
            ut = ts[mask][order]
            m = mat_all[mask][order]
            doy = _doy_of(ut, unit, is_date, session_tz)
            ext, thr = _detect_band(
                m, doy, threshold_percentile, exact, precision, max_anomaly
            )
            if thresholds:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.full(nx_w, band, dtype=np.int32)),
                        pa.array(np.arange(nx_w, dtype=np.int32)),
                        pa.array(thr.astype(np.float64)),
                    ],
                    names=["y", "x", "threshold"],
                )
            else:
                tt, xx = np.nonzero(ext)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ut[tt].astype(f"datetime64[{unit}]")).cast(ts_type),
                        pa.array(np.full(len(tt), band, dtype=np.int32)),
                        pa.array(xx.astype(np.int32)),
                    ],
                    names=[time_col, "y", "x"],
                )

    time_type = packed.schema[time_col].dataType.simpleString()
    if thresholds:
        out_schema = "y int, x int, threshold double"
    else:
        out_schema = f"{time_col} {time_type}, y int, x int"
    return packed.repartition(parallelism, "y").mapInArrow(_run, schema=out_schema)


def detect_track_blocked(
    spark,
    sf: float,
    method_percentile: str = "histogram",
) -> int:
    """Bench harness: blocked detect feeding the standard tracking
    stages (same sizes as pipeline.detect_track_bench).

    Uses the LONG generator + long-format kernel: generating packed
    arrays in-plan runs through Spark's higher-order ``transform``,
    which is interpreted per element (no whole-stage codegen) and
    measured 4-9× slower than the codegen'd long generator. The packed
    kernel itself is the right path when data arrives already packed
    (zarr ingestion, pack_gridded-landed parquet) — the Arrow
    round-trip of the packed layout measured ~free."""
    from marex_spark.operators.track import track_events
    from marex_spark.sources.synthetic import synthetic_sst_gridded

    # deliberately the SHUFFLED path: the bench must measure the plan
    # SCALE.md describes (one band shuffle) — the no-shuffle
    # band-partitioned variant is a generator-side trick real ingested
    # data only gets from a band-bucketed/packed layout
    n_years = max(2, int(round(30 * sf)))
    ny, nx = (40, 80) if sf >= 0.05 else (20, 40)
    series = synthetic_sst_gridded(spark, n_years=n_years, ny=ny, nx=nx)
    cells = detect_extremes_blocked(series, method_percentile=method_percentile)
    ext = cells.withColumn("extreme", F.lit(True))
    res = track_events(ext, nx=nx, compute_stats=False)
    res.events.write.mode("overwrite").format("noop").save()
    return 0
