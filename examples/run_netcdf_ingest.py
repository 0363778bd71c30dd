#!/usr/bin/env python
"""NetCDF/zarr ingestion tour: write the SAME field as CDF-2 classic,
NetCDF-4/HDF5 (chunked + shuffle + deflate) and a zlib zarr store, then
ingest all three through the stdlib distributed readers and verify they
agree value-for-value — plus a streaming scoring pass against
doy-partitioned threshold state (the 100 TB state layout).

Everything runs without xarray/netCDF4/h5py/numcodecs: the readers are
spec-literal stdlib implementations (sources/netcdf.py, sources/hdf5.py,
sources/zarr.py + sources/blosc.py for default-codec stores).

Run: python examples/run_netcdf_ingest.py [work_dir]
"""

import json
import os
import sys
import tempfile
import time
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def write_toy_zarr(store: str, data: np.ndarray, tvals: np.ndarray) -> None:
    """Minimal zlib zarr-v2 writer for the demo (3-D var + time)."""
    T, NY, NX = data.shape
    var = os.path.join(store, "sst")
    os.makedirs(var, exist_ok=True)
    meta = {
        "zarr_format": 2, "shape": [T, NY, NX], "chunks": [T, NY, NX],
        "dtype": "<f4", "order": "C", "fill_value": None,
        "compressor": {"id": "zlib", "level": 1}, "filters": None,
    }
    with open(os.path.join(var, ".zarray"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(var, "0.0.0"), "wb") as f:
        f.write(zlib.compress(np.ascontiguousarray(data, "<f4").tobytes()))
    tdir = os.path.join(store, "time")
    os.makedirs(tdir, exist_ok=True)
    tmeta = {
        "zarr_format": 2, "shape": [T], "chunks": [T], "dtype": "<i8",
        "order": "C", "fill_value": None,
        "compressor": {"id": "zlib", "level": 1}, "filters": None,
    }
    with open(os.path.join(tdir, ".zarray"), "w") as f:
        json.dump(tmeta, f)
    with open(os.path.join(tdir, ".zattrs"), "w") as f:
        json.dump({"units": "days since 2021-01-01"}, f)
    with open(os.path.join(tdir, "0"), "wb") as f:
        f.write(zlib.compress(tvals.astype("<i8").tobytes()))


def main() -> None:
    from pyspark.sql import functions as F

    from marex_spark.session import get_spark
    from marex_spark.sources.hdf5 import ingest_netcdf4, write_netcdf4
    from marex_spark.sources.netcdf import (
        ingest_netcdf_classic,
        write_netcdf_classic,
    )
    from marex_spark.sources.zarr import ingest_zarr_gridded

    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="marex_nc_")
    spark = get_spark()
    rng = np.random.default_rng(3)
    T, NY, NX = 730, 24, 48  # two years: climatology needs >1 sample/doy
    seasonal = 10.0 * np.sin(2 * np.pi * np.arange(T) / 365.25)
    data = (
        15.0 + seasonal[:, None, None] + rng.normal(0, 2.0, size=(T, NY, NX))
    ).astype(np.float32)
    tvals = np.arange(T, dtype=np.float64)

    pc = f"{work}/field_classic.nc"
    ph = f"{work}/field_nc4.nc"
    pz = f"{work}/field.zarr"
    write_netcdf_classic(pc, data, tvals, version=2)
    write_netcdf4(ph, data, tvals, time_units="days since 2021-01-01",
                  chunks=(8, 12, 16), compress=True, shuffle=True)
    write_toy_zarr(pz, data, tvals.astype(np.int64))
    print(f"wrote {os.path.getsize(pc):,} B classic | "
          f"{os.path.getsize(ph):,} B HDF5(chunked,shuffle,deflate)")

    def collect(df):
        # key by day RANK: the classic writer pins its own epoch, so
        # absolute timestamps differ between containers by design
        rows = df.collect()
        days = {t: i for i, t in enumerate(sorted({r.time for r in rows}))}
        return {(days[r.time], r.y, r.x): r.value for r in rows}

    t0 = time.perf_counter()
    a = collect(ingest_netcdf_classic(spark, pc, "sst"))
    b = collect(ingest_netcdf4(spark, ph, "sst"))
    c = collect(ingest_zarr_gridded(spark, pz, "sst", layout="long"))
    print(f"ingested 3 formats in {time.perf_counter() - t0:.1f}s; "
          f"{len(a):,} values each")
    assert a == b == c, "readers disagree!"
    print("classic == HDF5 == zarr: exact value agreement")

    # ---- streaming scoring against doy-partitioned state -------------
    from marex_spark.operators.detect import preprocess_data
    from marex_spark.streaming.detect import (
        score_stream_partitioned,
        write_threshold_state,
    )

    series = ingest_netcdf4(spark, ph, "sst")
    det = preprocess_data(series, method_percentile="exact")
    clim = det.extremes.select("doy", "y", "x", "clim").dropDuplicates(
        ["doy", "y", "x"]
    )
    state_path = f"{work}/state_by_doy"
    write_threshold_state(clim, det.thresholds, state_path)
    n_dirs = len([d for d in os.listdir(state_path) if d.startswith("doy=")])
    print(f"threshold state partitioned into {n_dirs} doy directories")

    src = f"{work}/stream_src"
    series.write.mode("overwrite").parquet(src)
    counts = []
    q = (
        score_stream_partitioned(
            spark.readStream.schema(series.schema).parquet(src),
            state_path,
            lambda df, bid: counts.append(
                df.agg(F.sum(F.col("extreme").cast("long"))).first()[0]
            ),
        )
        .option("checkpointLocation", f"{work}/ckpt")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    print(f"streamed scoring flagged {sum(x or 0 for x in counts):,} extremes "
          "(state read pruned to each batch's own doy partitions)")


if __name__ == "__main__":
    main()
